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

# Above this many oriented edges the closure side stops being broadcast
# and the semi-join shuffles (AQE picks the strategy). 32M packed edges
# ≈ 512 MB serialized — the practical single-executor broadcast ceiling.
_BROADCAST_EDGE_LIMIT = 32_000_000


def triangles_join(oriented: DataFrame, closure: str = "auto") -> DataFrame:
    """All triangles as (u, v, w) rows, u ≺ v ≺ w in oriented order.

    Wedge join on v, then closure semi-join of (u, w) against the edge
    set. The orientation bounds wedge fan-out by the oriented out-degree
    (≤ O(√E) amortized), which is what makes the wedge join feasible on
    power-law graphs at all.

    ``closure`` picks the physical strategy for the closure probe:
    - ``"broadcast"``: broadcast-hash semi-join — the wedge stream is
      filtered in place, never shuffled. The dominant cost of the
      declarative form is otherwise the exchange of |wedges| ≫ |E| rows;
      broadcasting the *edge* side (16 bytes/row) eliminates it. This is
      the physical analog of the reference keeping the full CSR resident
      on-device and probing it per wedge
      (ShareKernelTCV62_update_v1.cu:100-173).
    - ``"shuffle"``: shuffled semi-join — required when E itself is too
      big for one executor's memory (the 100 TB regime); AQE handles
      skew splitting.
    - ``"auto"``: broadcast iff the oriented edge count (one cheap count
      on an input that is cached in every pipeline here) is under
      ``_BROADCAST_EDGE_LIMIT``.
    """
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    if closure == "auto":
        closure = (
            "broadcast" if oriented.count() <= _BROADCAST_EDGE_LIMIT else "shuffle"
        )
    if closure == "broadcast":
        e3 = F.broadcast(e3)
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

_EMPTY = pd.DataFrame({"v": pd.Series([], dtype="int64"), "tri": pd.Series([], dtype="int64")})

# row kinds in the kernel shuffle
_K_HALO = 0          # adjacency operand: (v, full sorted N+(v))
_K_SEED = 1          # unsalted anchor: seeds == full sorted N+(u)
_K_SEED_SALTED = 2   # salted hub anchor: seeds = one bucket's slice of N+(u)


def _csr_from_arrays(vs: np.ndarray, arrs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Local CSR from (vertex, sorted-adjacency-array) rows (T7:
    np.cumsum offsets; C6 sort happened JVM-side in sort_array).
    Returns (row_ids asc, indptr, col_idx)."""
    order = np.argsort(vs)
    row_ids = vs[order]
    lists = [np.asarray(arrs[i], dtype=np.int64) for i in order]
    lens = np.fromiter((len(a) for a in lists), dtype=np.int64, count=len(lists))
    indptr = np.empty(len(row_ids) + 1, dtype=np.int64)
    indptr[0] = 0
    np.cumsum(lens, out=indptr[1:])
    col_idx = (
        np.concatenate(lists) if lists else np.empty(0, dtype=np.int64)
    )
    return row_ids, indptr, col_idx


def _count_partition(pdf: pd.DataFrame) -> pd.DataFrame:
    """Count wedge closures for the anchor seeds of one group.

    Input rows (v, part, seeds, kind): halo rows carry the full sorted
    adjacency N+(v) of every vertex the group's seeds point at (and of
    every salted hub anchored here); seed rows carry each anchor's wedge
    seeds — its full N+(u) when unsalted, one hash bucket's slice for a
    salted hub. Arrays arrive Arrow-packed: one row per (vertex, group),
    never per edge.

    For each seed (u, v): count |N+(v) ∩ T(u)| where the intersection
    target T(u) is the seed array itself (unsalted — it IS N+(u)) or the
    halo-shipped full N+(u) (salted), by binary-searching packed (u, w)
    keys (T1/T2). Per-anchor partial sums (T4) leave as (v, tri) rows.
    """
    kind = pdf["kind"].to_numpy(dtype=np.int64)
    vs = pdf["v"].to_numpy(dtype=np.int64)
    arrs = pdf["seeds"].to_numpy()
    seed_mask = kind != _K_HALO
    if not seed_mask.any():
        return _EMPTY.copy()

    # adjacency CSR over halo rows (wedge middles + salted hub targets)
    row_ids, indptr, col_idx = _csr_from_arrays(vs[kind == _K_HALO], arrs[kind == _K_HALO])
    if row_ids.size == 0:
        # no middle adjacency in this group → no wedge can close
        return _EMPTY.copy()

    # anchor targets T(u): CSR keyed by anchor id, from seed rows
    # (unsalted: the seed array; salted: dict lookup of full adjacency)
    s_v = vs[seed_mask]
    s_kind = kind[seed_mask]
    s_arr = arrs[seed_mask]
    t_lists = []
    for i in range(len(s_v)):
        if s_kind[i] == _K_SEED:
            t_lists.append(np.asarray(s_arr[i], dtype=np.int64))
        else:
            pos = np.searchsorted(row_ids, s_v[i])
            assert pos < len(row_ids) and row_ids[pos] == s_v[i], "salted hub adjacency missing"
            t_lists.append(col_idx[indptr[pos] : indptr[pos + 1]])
    t_order = np.argsort(s_v)
    t_ids = s_v[t_order]
    t_lens = np.fromiter((len(t_lists[i]) for i in t_order), dtype=np.int64, count=len(t_order))
    t_indptr = np.empty(len(t_ids) + 1, dtype=np.int64)
    t_indptr[0] = 0
    np.cumsum(t_lens, out=t_indptr[1:])
    t_col = (
        np.concatenate([t_lists[i] for i in t_order]) if len(t_order) else np.empty(0, np.int64)
    )
    assert (t_ids.size and int(max(t_ids.max(), t_col.max(initial=0))) < (1 << 31)) or not t_ids.size, (
        "vertex ids exceed 31 bits — repack kernel keys"
    )
    # packed (anchor, target) keys: globally sorted because anchors are
    # sorted and each adjacency array is sorted (C6)
    target_keys = (np.repeat(t_ids, t_lens) << 32) | t_col

    # wedge expansion (T2): seeds (u, v) → all w ∈ N+(v) from the CSR
    seed_u = np.repeat(s_v, np.fromiter((len(a) for a in s_arr), dtype=np.int64, count=len(s_arr)))
    seed_v = (
        np.concatenate([np.asarray(a, dtype=np.int64) for a in s_arr])
        if len(s_arr)
        else np.empty(0, np.int64)
    )
    vpos = np.searchsorted(row_ids, seed_v)
    vpos_c = np.minimum(vpos, max(len(row_ids) - 1, 0))
    has_adj = (row_ids[vpos_c] == seed_v) if len(row_ids) else np.zeros(len(seed_v), bool)
    starts = indptr[vpos_c]
    lens = np.where(has_adj, indptr[vpos_c + 1] - starts, 0)
    total_w = int(lens.sum())
    if total_w == 0:
        return _EMPTY.copy()
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = np.arange(total_w) - np.repeat(offs, lens) + np.repeat(starts, lens)
    w = col_idx[idx]
    anchors_rep = np.repeat(seed_u, lens)

    # closure probe (T1): (u, w) ∈ T(u) via binary search on packed keys
    probe_keys = (anchors_rep << 32) | w
    hit_pos = np.searchsorted(target_keys, probe_keys)
    hit_pos[hit_pos == len(target_keys)] = 0
    hits = target_keys[hit_pos] == probe_keys

    # per-anchor partial sums (T4): map-side combine inside the kernel
    out_v, out_t = np.unique(anchors_rep[hits], return_counts=True)
    return pd.DataFrame({"v": out_v.astype(np.int64), "tri": out_t.astype(np.int64)})


def triangles_per_vertex_kernel(
    oriented: DataFrame,
    n_parts: int | None = None,
    salt_threshold: int = 4096,
    n_salts: int = 16,
) -> DataFrame:
    """Per-vertex triangle counts via the partitioned CSR kernel: ``v, tri``.

    Pipeline (adjacency-array shuffle + one applyInPandas shuffle):
      1. part(u) = pmod(xxhash64(u), k)  — deterministic hash partitioning
         (the reference's `random` node-parts file, P1).
      2. one groupBy packs each vertex's sorted adjacency into an array
         (C6 + the CSR payload) — every later movement ships one
         Arrow-packed row per (vertex, group), never per edge.
      3. halo rows: the adjacency array of every seed target, shipped to
         every group whose seeds point at it (P4 halo expansion as a
         join — duplicated per referencing group, exactly the reference's
         halo materialization, but transient in the shuffle; distinct =
         P5 halo dedupe).
      4. per-group numpy kernel (_count_partition).

    Hub salting: anchors with out-degree > ``salt_threshold`` would make
    one group's probe work quadratic in the hub degree. Their wedge seeds
    (u, v) are split into ``n_salts`` buckets by hash(v); each bucket
    gets the hub's full adjacency (needed as the intersection target) but
    only its own seeds' halo lists; partial counts merge in a final agg.
    """
    if n_parts is None:
        n_parts = oriented.sparkSession.sparkContext.defaultParallelism

    # one shuffle: oriented edges → sorted adjacency arrays + out-degree
    # (C6 adjacency sort + the CSR payload, Arrow-packed one row per
    # vertex — never per edge)
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs"),
        F.count("*").alias("deg_out"),
    )
    is_hub = F.col("deg_out") > F.lit(salt_threshold)
    base_part = F.pmod(F.xxhash64("src"), F.lit(n_parts))

    # seed rows: unsalted anchors carry full N+(u); salted hubs explode
    # into n_salts bucket slices, each routed to its own group
    unsalted = adj.where(~is_hub).select(
        F.col("src").alias("v"),
        (base_part * (n_salts + 1)).alias("part"),
        F.col("nbrs").alias("seeds"),
        F.lit(_K_SEED).alias("kind"),
    )
    salted = (
        adj.where(is_hub)
        .select(
            F.col("src").alias("v"),
            base_part.alias("bp"),
            F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("b"),
            "nbrs",
        )
        .select(
            "v",
            (F.col("bp") * (n_salts + 1) + 1 + F.col("b")).alias("part"),
            F.expr(f"filter(nbrs, x -> pmod(xxhash64(x), {n_salts}) = b)").alias("seeds"),
            F.lit(_K_SEED_SALTED).alias("kind"),
        )
        .where(F.size("seeds") > 0)
    )
    seeds = unsalted.unionByName(salted)

    # halo shipping (P4 as a join): each group needs the adjacency array
    # of every vertex its seeds point at, plus every salted hub's own
    # full adjacency (the intersection target) — distinct per group (P5)
    demand = (
        seeds.select(F.explode("seeds").alias("v"), "part")
        .unionByName(salted.select("v", "part"))
        .distinct()
    )
    halo = demand.join(adj.select(F.col("src").alias("v"), "nbrs"), "v").select(
        "v", "part", F.col("nbrs").alias("seeds"), F.lit(_K_HALO).alias("kind")
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
