"""Triangle counting (SURVEY.md §2.4, T1–T7).

Two physical strategies over the same logical op, both consuming the
degree-oriented edge table from ``canonicalize.orient`` (every undirected
edge kept in exactly one direction; every triangle {a,b,c} with
a ≺ b ≺ c under (deg asc, id desc) appears as the three directed edges
a→b, a→c, b→c, so it is found exactly once at its anchor a):

1. ``triangle_count_join`` — pure DataFrame: wedge join e1(u,v)⋈e2(v,w)
   then LEFT SEMI against e(u,w). Catalyst picks sort-merge /
   shuffled-hash / broadcast per side; AQE splits skewed partitions.
   This is the declarative form we'd run at 100 TB by default.

2. ``triangle_count_kernel`` — reference-faithful partitioned form
   (the Spark analog of the CUDA pipeline in
   src/WithPartition/Final_updated_corrected.cu:57-219 +
   round_clean_subgraph.cu): anchors are hash-partitioned (the
   reference's `random` node-parts, Halo_creation_preprocess.py:288);
   each Spark partition receives its anchors' out-edges PLUS the halo
   adjacency lists of their out-neighbors (P4 halo expansion — here a
   single shuffle ships halo rows; nothing is materialized per part),
   builds a local CSR with np.cumsum (T7) and sorted rows (C6), and
   probes wedges with np.searchsorted (T1/T2). Only master anchors
   count (T3: launch <<<t_ver,...>>> — here an is_anchor flag). Hub
   anchors beyond ``salt_threshold`` out-degree are *salted*: their
   wedge seeds split over ``n_salts`` buckets, the hub's own adjacency
   replicated per bucket, partial counts summed (the Spark analog of
   the reference's shared-memory tiling loop for deg+ > 128,
   ShareKernelTCV62_update_v1.cu:100-173).

Per-vertex output attributes each triangle to its anchor (minimum
corner), matching the reference's per-vertex g_sum
(ShareKernelTCV62_update_v1.cu:185).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Strategy 1: declarative join form
# ---------------------------------------------------------------------------

def triangles_join(oriented: DataFrame) -> DataFrame:
    """All triangles as (u, v, w) rows, u ≺ v ≺ w in oriented order.

    Two shuffles: wedge join on v, closure semi-join on (u, w). The
    orientation bounds wedge fan-out by the oriented out-degree
    (≤ O(√E) amortized), which is what makes the wedge join feasible on
    power-law graphs at all.
    """
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "v")
    return wedges.join(e3, ["u", "w"], "left_semi").select("u", "v", "w")


def triangles_per_vertex_join(oriented: DataFrame) -> DataFrame:
    """Per-vertex triangle counts, anchor attribution: ``v, tri``.

    Only the anchor (minimum corner) is credited — reference g_sum
    semantics. Vertices anchoring no triangle are absent (join with the
    vertex table and coalesce(0) if a dense vector is wanted).
    """
    return (
        triangles_join(oriented)
        .groupBy(F.col("u").alias("v"))
        .agg(F.count("*").alias("tri"))
    )


def triangle_count_join(oriented: DataFrame) -> int:
    """Global triangle total (T5/T6: one agg(sum) — partial aggregation
    and cross-partition accumulation are automatic)."""
    row = triangles_join(oriented).agg(F.count("*").alias("t")).collect()[0]
    return int(row["t"])


# ---------------------------------------------------------------------------
# Strategy 1b: per-edge sorted-adjacency intersection (JVM arrays)
# ---------------------------------------------------------------------------

def triangles_per_vertex_arrays(oriented: DataFrame) -> DataFrame:
    """Per-vertex counts via per-edge adjacency intersection: ``v, tri``.

    The closest declarative analog of the reference kernel (C6 sorted
    adjacency + T1 membership probes): build N+(u) once as a sorted
    array, then for every oriented edge (u, v) count
    |N+(u) ∩ N+(v)| with JVM ``array_intersect`` — each triangle found
    exactly once at its anchor u (w ∈ N+(u) ∩ N+(v) ⟺ u→v, u→w, v→w).

    vs the wedge join: no 49M-row wedge materialization — one groupBy
    (adjacency build) + two joins whose payload is one array per row.
    Work is Σ_(u,v)∈E (d⁺(u)+d⁺(v)) hash-set operations, the same
    asymptotics as the reference's probe loop.
    """
    adj = oriented.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    a_u = adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nu"))
    a_v = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nv"))
    per_edge = (
        oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(a_u, "u")
        .join(a_v, "v")
        .select("u", F.size(F.array_intersect("nu", "nv")).alias("c"))
    )
    return (
        per_edge.groupBy(F.col("u").alias("v"))
        .agg(F.sum("c").alias("tri"))
        .where(F.col("tri") > 0)
    )


def triangle_count_arrays(oriented: DataFrame) -> int:
    row = (
        triangles_per_vertex_arrays(oriented)
        .agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("t"))
        .collect()[0]
    )
    return int(row["t"])


# ---------------------------------------------------------------------------
# Strategy 2: partitioned CSR kernel form (applyInPandas)
# ---------------------------------------------------------------------------

_KERNEL_OUT_SCHEMA = "v long, tri long"


def _csr_from_rows(srcs: np.ndarray, dsts: np.ndarray):
    """Build a local CSR over the rows present (T7: np.cumsum offsets;
    C6: per-row neighbor sort). Returns (row_ids, indptr, col_idx) where
    row_ids are the distinct sources in ascending order."""
    order = np.lexsort((dsts, srcs))
    s = srcs[order]
    d = dsts[order]
    row_ids, counts = np.unique(s, return_counts=True)
    indptr = np.empty(len(row_ids) + 1, dtype=np.int64)
    indptr[0] = 0
    np.cumsum(counts, out=indptr[1:])
    return row_ids, indptr, d


def _count_partition(pdf: pd.DataFrame) -> pd.DataFrame:
    """Count wedge closures for the anchor seeds of one group.

    Input rows: src, dst, is_anchor. Seed rows (is_anchor=True) are the
    wedge seeds (u, v) this group is responsible for — for a salted hub
    only its bucket's slice of N+(u). Halo rows (is_anchor=False) carry
    the adjacency lists needed as intersection operands, including the
    hub's own full N+(u). The same (src, dst) pair may appear as both;
    the CSR is built over the de-duplicated union, while seeds keep
    their own (deduped) pair set.

    For each seed (u, v): count |N+(v) ∩ N+(u)| by binary-searching the
    sorted N+(v) elements in the sorted full N+(u) (T1/T2). For an
    unsalted anchor the seed set equals N+(u), giving the classic
    per-anchor intersection total.
    """
    srcs = pdf["src"].to_numpy(dtype=np.int64)
    dsts = pdf["dst"].to_numpy(dtype=np.int64)
    anchor_mask = pdf["is_anchor"].to_numpy(dtype=bool)
    if not anchor_mask.any():
        return pd.DataFrame({"v": [], "tri": []}).astype({"v": "int64", "tri": "int64"})

    # de-duplicated CSR over all rows present in the group
    pairs = np.unique(np.stack([srcs, dsts], axis=1), axis=0)
    row_ids, indptr, col_idx = _csr_from_rows(pairs[:, 0], pairs[:, 1])

    # de-duplicated seed pairs (u, v)
    seed_pairs = np.unique(
        np.stack([srcs[anchor_mask], dsts[anchor_mask]], axis=1), axis=0
    )
    seed_u = seed_pairs[:, 0]
    seed_v = seed_pairs[:, 1]

    # Wedge expansion, fully vectorized (T2): for every seed (u, v),
    # enumerate all w ∈ N+(v) from the CSR...
    vpos = np.searchsorted(row_ids, seed_v)
    vpos_c = np.minimum(vpos, len(row_ids) - 1)
    has_adj = row_ids[vpos_c] == seed_v
    starts = indptr[vpos_c]
    lens = np.where(has_adj, indptr[vpos_c + 1] - starts, 0)
    total_w = int(lens.sum())
    if total_w == 0:
        return pd.DataFrame({"v": [], "tri": []}).astype({"v": "int64", "tri": "int64"})
    # gather indices: for seed i, col_idx[starts[i] .. starts[i]+lens[i])
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = np.arange(total_w) - np.repeat(offs, lens) + np.repeat(starts, lens)
    w = col_idx[idx]
    anchors_rep = np.repeat(seed_u, lens)

    # ...and probe (u, w) ∈ E via binary search over the packed sorted
    # pair set (T1). Pack (u, w) into one int64 — valid while vids fit
    # 31 bits, which holds for any per-partition relabeled id space; the
    # engine's dictionary ids are compacted so this covers graphs to 2B
    # vertices. (pairs are lexsorted, so packed keys are sorted.)
    max_id = int(max(pairs.max(), w.max()))
    assert max_id < (1 << 31), "vertex ids exceed 31 bits — repack kernel keys"
    edge_keys = (pairs[:, 0] << 32) | pairs[:, 1]
    probe_keys = (anchors_rep << 32) | w
    hit_pos = np.searchsorted(edge_keys, probe_keys)
    hit_pos[hit_pos == len(edge_keys)] = 0
    hits = edge_keys[hit_pos] == probe_keys

    # per-anchor partial sums (T4): map-side combine inside the kernel
    hit_anchors = anchors_rep[hits]
    out_v, out_t = np.unique(hit_anchors, return_counts=True)
    return pd.DataFrame({"v": out_v.astype(np.int64), "tri": out_t.astype(np.int64)})


def triangles_per_vertex_kernel(
    oriented: DataFrame,
    n_parts: int | None = None,
    salt_threshold: int = 4096,
    n_salts: int = 16,
) -> DataFrame:
    """Per-vertex triangle counts via the partitioned CSR kernel: ``v, tri``.

    Pipeline (one wide shuffle + one applyInPandas shuffle):
      1. part(u) = pmod(xxhash64(u), k)  — deterministic hash partitioning
         (the reference's `random` node-parts file, P1).
      2. anchor rows: each oriented edge tagged with its anchor's part.
      3. halo rows: the adjacency list of every out-neighbor w, shipped to
         every part that has an anchor edge into w (P4 halo expansion as a
         join — duplicated per referencing part, exactly the reference's
         halo materialization, but transient in the shuffle).
      4. per-part numpy kernel (_count_partition).

    Hub salting: anchors with out-degree > ``salt_threshold`` would make
    one group's probe work quadratic in the hub degree. Their wedge seeds
    (u, v) are split into ``n_salts`` buckets by hash(v); each bucket
    gets the hub's full adjacency (needed as the intersection target) but
    only its own seeds' halo lists; partial counts merge in a final agg.
    """
    if n_parts is None:
        n_parts = oriented.sparkSession.sparkContext.defaultParallelism

    deg_out = oriented.groupBy("src").agg(F.count("*").alias("deg_out"))
    e = oriented.join(deg_out, "src").withColumn(
        "part",
        F.when(
            F.col("deg_out") > F.lit(salt_threshold),
            # salted bucket id lives beside the hash part: (part, salt)
            F.pmod(F.xxhash64("src"), F.lit(n_parts)) * F.lit(n_salts + 1)
            + F.lit(1)
            + F.pmod(F.xxhash64("dst"), F.lit(n_salts)),
        ).otherwise(F.pmod(F.xxhash64("src"), F.lit(n_parts)) * F.lit(n_salts + 1)),
    )

    # Seeds: the anchor's out-edges, tagged with their (possibly salted)
    # group. For salted hubs the seed set is split across groups but the
    # hub's own adjacency must appear whole in every group it seeds —
    # ship it as extra halo rows keyed by each group.
    seeds = e.select("src", "dst", "part").withColumn("is_anchor", F.lit(True))

    # Halo shipping: for every group, the adjacency lists of (a) every
    # seed dst and (b) every salted hub src. distinct (vertex, part)
    # demand set, then join back to the oriented edges.
    demand_dst = seeds.select(F.col("dst").alias("hv"), "part")
    hub_groups = (
        e.where(F.col("deg_out") > F.lit(salt_threshold))
        .select(F.col("src").alias("hv"), "part")
    )
    demand = demand_dst.unionByName(hub_groups).distinct()
    adj = oriented.select(F.col("src").alias("hv"), F.col("dst").alias("adst"))
    halo = (
        demand.join(adj, "hv")
        .select(
            F.col("hv").alias("src"),
            F.col("adst").alias("dst"),
            "part",
            F.lit(False).alias("is_anchor"),
        )
    )

    rows = seeds.unionByName(halo)
    per_group = rows.groupBy("part").applyInPandas(
        lambda pdf: _count_partition(pdf), schema=_KERNEL_OUT_SCHEMA
    )
    # merge salted partials
    return per_group.groupBy("v").agg(F.sum("tri").alias("tri"))


def triangle_count_kernel(
    oriented: DataFrame,
    n_parts: int | None = None,
    salt_threshold: int = 4096,
    n_salts: int = 16,
) -> int:
    df = triangles_per_vertex_kernel(oriented, n_parts, salt_threshold, n_salts)
    row = df.agg(F.sum("tri").alias("t")).collect()[0]
    return int(row["t"] or 0)
