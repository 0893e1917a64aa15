"""Reference-format CSR text interchange (SURVEY.md §1.3/§2.1 — S4/S5,
plus the partitioned S6 and undirected-CSR+deg S7 formats).

The reference's on-disk IR is whitespace-delimited text. Unpartitioned
oriented CSR (S4/S5):
    line 1: ``Nodes Edges len(row_ptr) len(col_idx)``
    line 2: row_ptr        (space-separated)
    line 3: col_idx
(written by Med_dataset/without_part_preprocess.py:298-311, read by the
fscanf loops in src/WithoutPartition/ShareKernelTCV62_update_v1.cu:196-230).

Undirected CSR + in-degree (S7, the round-clean pipeline's input —
written by Halo_creation_preprocess.py:259-278, read by
round_clean_subgraph.cu:924-952):
    line 1: ``Nodes Edges``
    line 2: ``t_ver len(row_ptr) len(col_idx) 0``   (t_ver == Nodes)
    line 3: row_ptr
    line 4: col_idx
    line 5: in_deg          (Nodes values)

Partitioned oriented CSR (S6 — written per cleaned partition by
round_clean_subgraph.cu:849-865, read back by the per-partition fscanf
loop in src/WithPartition/Final_updated_corrected.cu:241-282):
    line 1: ``Nodes Edges``                          (global header)
    then per partition:
      ``n_local len(row_ptr) len(col_idx) t_ver``   (t_ver = #masters)
      row_ptr   (n_local + 1 values, LOCAL ids)
      col_idx
    Local node order is masters first (ascending global id) then halo
    vertices (ascending) — the kernel anchors only rows < t_ver (T3).

These helpers exist for interchange/parity-testing with reference
tooling, NOT as a scale path: positional CSR of the whole graph is a
single-machine artifact by construction, so the writers funnel through
the driver (documented; the parquet/Iceberg edge table is the real
sink, S4's Spark mapping). Vertices must already be contiguous 0..N-1.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def write_oriented_csr(oriented: DataFrame, path: str, n_vertices: int | None = None) -> None:
    """Oriented edge DataFrame → reference ``*_output.csr`` text file."""
    pdf = oriented.select("src", "dst").toPandas()
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    n = int(n_vertices if n_vertices is not None else (max(src.max(initial=-1), dst.max(initial=-1)) + 1))
    counts = np.bincount(src, minlength=n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)])
    with open(path, "w") as f:
        f.write(f"{n} {len(dst)} {len(row_ptr)} {len(dst)}\n")
        f.write(" ".join(map(str, row_ptr.tolist())) + "\n")
        f.write(" ".join(map(str, dst.tolist())) + "\n")


def read_oriented_csr(spark: SparkSession, path: str) -> DataFrame:
    """Reference CSR text file → oriented edge DataFrame[src, dst]."""
    with open(path) as f:
        header = f.readline().split()
        n, _e, len_rp, _len_ci = (int(x) for x in header)
        row_ptr = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
        col_idx = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
    assert len(row_ptr) == len_rp
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    pairs = [(int(s), int(d)) for s, d in zip(src, col_idx)]
    return spark.createDataFrame(pairs or [], "src long, dst long")


def _csr_arrays(src: np.ndarray, dst: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_ptr, col_idx) with rows 0..n-1 and sorted neighbors."""
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)])
    return row_ptr.astype(np.int64), dst.astype(np.int64)


def write_undirected_csr_deg(sym_edges: DataFrame, path: str, n_vertices: int | None = None) -> None:
    """S7 sink: symmetric edge DataFrame → reference undirected-CSR +
    in-degree text file (Halo_creation_preprocess.py:259-278 layout)."""
    pdf = sym_edges.select("src", "dst").toPandas()
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    n = int(n_vertices if n_vertices is not None else (max(src.max(initial=-1), dst.max(initial=-1)) + 1))
    row_ptr, col_idx = _csr_arrays(src, dst, n)
    in_deg = np.bincount(dst, minlength=n).astype(np.int64)
    with open(path, "w") as f:
        f.write(f"{n} {len(col_idx)}\n")
        f.write(f"{n} {len(row_ptr)} {len(col_idx)} 0\n")
        f.write(" ".join(map(str, row_ptr.tolist())) + "\n")
        f.write(" ".join(map(str, col_idx.tolist())) + "\n")
        f.write(" ".join(map(str, in_deg.tolist())) + "\n")


def read_undirected_csr_deg(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S7 scan: reference undirected CSR+deg file → (symmetric edge
    DataFrame[src, dst], degree DataFrame[v, deg])."""
    with open(path) as f:
        n, _e = (int(x) for x in f.readline().split())
        t_ver, len_rp, len_ci, _halo = (int(x) for x in f.readline().split())
        row_ptr = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
        col_idx = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
        in_deg = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
    assert t_ver == n and len(row_ptr) == len_rp and len(col_idx) == len_ci
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, col_idx)] or [], "src long, dst long"
    )
    deg = spark.createDataFrame(
        [(int(v), int(d)) for v, d in enumerate(in_deg)] or [], "v long, deg long"
    )
    return edges, deg


def write_partitioned_csr(
    oriented: DataFrame, assign: DataFrame, path: str, n_parts: int
) -> None:
    """S6 sink: oriented edge DataFrame + (v, part) assignment →
    reference partitioned-CSR text file (round_clean_subgraph.cu:849-865
    layout; Final_updated_corrected.cu:241-282 reads it back).

    Per partition: masters = all vertices assigned to it; halo = their
    out-neighbors living elsewhere (P4); adjacency of every combined
    node is restricted to the combined set (membership filter P7) and
    relabeled to local ids (P6), masters first so the kernel can anchor
    rows < t_ver only (T3).
    """
    pdf = oriented.select("src", "dst").toPandas()
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    apdf = assign.select("v", "part").toPandas()
    n = int(apdf["v"].max()) + 1 if len(apdf) else 0
    part_of = np.zeros(n, dtype=np.int64)
    part_of[apdf["v"].to_numpy(dtype=np.int64)] = apdf["part"].to_numpy(dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    with open(path, "w") as f:
        f.write(f"{n} {len(dst)}\n")
        for p in range(n_parts):
            masters = np.flatnonzero(part_of == p)
            m_edge = np.isin(src, masters)
            halo = np.setdiff1d(dst[m_edge], masters)
            combined = np.concatenate([masters, halo])
            local = {int(g): i for i, g in enumerate(combined)}
            in_comb = np.isin(src, combined) & np.isin(dst, combined)
            ls = np.array([local[int(g)] for g in src[in_comb]], dtype=np.int64)
            ld = np.array([local[int(g)] for g in dst[in_comb]], dtype=np.int64)
            row_ptr, col_idx = _csr_arrays(ls, ld, len(combined))
            f.write(f"{len(combined)} {len(row_ptr)} {len(col_idx)} {len(masters)}\n")
            f.write(" ".join(map(str, row_ptr.tolist())) + "\n")
            f.write(" ".join(map(str, col_idx.tolist())) + "\n")


def read_partitioned_csr(path: str) -> list[dict]:
    """S6 scan: partitioned-CSR text → one dict per partition
    (``t_ver, row_ptr, col_idx`` in local ids), plus the global header
    under keys ``n``/``e`` on every entry."""
    with open(path) as f:
        toks = f.read().split()
    it = iter(toks)
    n, e = int(next(it)), int(next(it))
    parts = []
    while True:
        try:
            n_local = int(next(it))
        except StopIteration:
            break
        len_rp, len_ci, t_ver = int(next(it)), int(next(it)), int(next(it))
        row_ptr = np.array([int(next(it)) for _ in range(len_rp)], dtype=np.int64)
        col_idx = np.array([int(next(it)) for _ in range(len_ci)], dtype=np.int64)
        assert len_rp == n_local + 1
        parts.append(
            {"n": n, "e": e, "t_ver": t_ver, "row_ptr": row_ptr, "col_idx": col_idx}
        )
    return parts


def triangle_count_partitioned_text(path: str) -> int:
    """Count triangles straight off an S6 partitioned-CSR file with the
    reference's per-partition anchor rule (masters only, T3; per-part
    sums accumulated, T6) — the parity check that the text interchange
    round-trips the partitioned algorithm exactly."""
    total = 0
    for part in read_partitioned_csr(path):
        rp, ci, t_ver = part["row_ptr"], part["col_idx"], part["t_ver"]
        lens = np.diff(rp)
        n_local = len(lens)
        if n_local == 0:
            continue
        # wedge expansion from master anchors only
        anchors = np.repeat(np.arange(n_local, dtype=np.int64), lens)
        mids = ci
        a_mask = anchors < t_ver
        a_u, a_v = anchors[a_mask], mids[a_mask]
        wlens = lens[a_v]
        w_idx = (
            np.arange(int(wlens.sum()))
            - np.repeat(np.concatenate([[0], np.cumsum(wlens)[:-1]]), wlens)
            + np.repeat(rp[a_v], wlens)
        )
        w = ci[w_idx]
        u_rep = np.repeat(a_u, wlens)
        # closure: (u, w) is a local edge ⇔ packed key present
        keys = np.sort((anchors.astype(np.int64) << 32) | mids)
        probe = (u_rep.astype(np.int64) << 32) | w
        pos = np.searchsorted(keys, probe)
        pos[pos == len(keys)] = 0
        total += int((keys[pos] == probe).sum())
    return total
