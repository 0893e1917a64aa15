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

import os
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
_BROADCAST_BYTE_LIMIT = 512 * 1024 * 1024


# For FILE-SCAN relations Catalyst's sizeInBytes is the COMPRESSED
# on-disk footprint (spark.sql.sources.fileCompressionFactor defaults to
# 1.0), which understates the deserialized/broadcast size by 3-10x for
# parquet — the one direction in which the "Catalyst only overestimates"
# regime-probe argument fails (r4 advisor). Estimates whose plan leaves
# include a file scan are therefore inflated by this factor before any
# broadcast ceiling comparison; InMemoryRelation / LocalRelation / Range
# leaves report accurate in-memory sizes and pass through unadjusted.
_FILE_SCAN_DESER_FACTOR = 4
# Optimized-plan leaf class names that denote file/table scans (probed
# on this Spark build: parquet reads = LogicalRelation; cached =
# InMemoryRelation; V2 sources / Hive names included defensively).
_SCAN_LEAF_PREFIXES = ("LogicalRelation", "DataSourceV2", "HiveTableRelation")


def _estimated_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate — a JVM call, no job.
    None when stats are unavailable (then callers fall back to count()).
    File-scan-backed plans are inflated by ``_FILE_SCAN_DESER_FACTOR``
    (compressed-footprint stats, see above)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        size = int(plan.stats().sizeInBytes())
        # Catalyst's "unknown" sentinel is Long.MaxValue-ish
        if not (0 <= size < (1 << 62)):
            return None
        leaves = plan.collectLeaves()
        for i in range(leaves.size()):
            name = leaves.apply(i).getClass().getSimpleName()
            if name.startswith(_SCAN_LEAF_PREFIXES):
                return size * _FILE_SCAN_DESER_FACTOR
        return size
    except Exception:
        return None


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
    - ``"auto"``: broadcast iff Catalyst's size estimate for the edge
      side is under ``_BROADCAST_BYTE_LIMIT`` — a plan-stats lookup, not
      a count() job (a count would add one full job per call on uncached
      inputs). Falls back to a count only when stats are unknown.
    """
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    if closure == "auto":
        est = _estimated_bytes(oriented)
        if est is not None:
            closure = "broadcast" if est <= _BROADCAST_BYTE_LIMIT else "shuffle"
        else:
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
# Strategy 2: partitioned CSR kernel form (applyInArrow)
# ---------------------------------------------------------------------------

_KERNEL_OUT_SCHEMA = "v long, tri long"

_EMPTY = pd.DataFrame({"v": pd.Series([], dtype="int64"), "tri": pd.Series([], dtype="int64")})

# row kinds in the kernel shuffle
_K_HALO = 0          # adjacency operand: (v, full sorted N+(v))
_K_SEED = 1          # unsalted anchor: seeds == full sorted N+(u)
_K_SEED_SALTED = 2   # salted hub anchor: full N+(u); the kernel expands
#                      only the group's bucket slice (dst % n_salts == b)
#                      but probes against the full array

# wedges expanded per kernel pass — caps the int64 probe-key / gather
# temporaries (~20 B/wedge) so peak kernel memory stays ~tens of MB per
# worker regardless of group size (500k vs 2M measured within noise at
# local[8]/8M edges — the cap is a memory-footprint bound, not a
# throughput tunable)
_WEDGE_CHUNK = int(os.environ.get("SPARK_GRAFT_WEDGE_CHUNK", "1000000"))


def _gather_segments(starts: np.ndarray, lens: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """Vectorized gather of variable-length segments flat[starts[i] :
    starts[i]+lens[i]] concatenated in row order (the arange trick — no
    per-row Python)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=flat.dtype)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # one repeat, not two: idx = arange + repeat(starts - offs) — each
    # wedge-length temporary is a full memory-bandwidth pass
    idx = np.arange(total, dtype=np.int64)
    idx += np.repeat(starts - offs, lens)
    return flat[idx]


def _count_partition_arrow(table, n_salts: int):
    """Count wedge closures for the anchor seeds of one group.

    Arrow-native kernel: the group's (v, part, seeds:list<long>, kind)
    rows arrive as a pyarrow Table; ``list_flatten`` /
    ``list_value_length`` expose the packed adjacency as ONE flat int64
    buffer + per-row lengths (zero-copy — the r1 applyInPandas form
    unpacked the list column into per-row numpy objects, which dominated
    its runtime). Everything below is whole-array numpy:

      - halo rows carry the full sorted adjacency N+(v) of every vertex
        the group's seeds point at; lookup structure = argsort of halo
        vertex ids — segments stay in place, only row indices are
        sorted (T7/C6).
      - seed rows carry each anchor's FULL sorted N+(u) (salted and
        unsalted alike — the plan side ships one adjacency row per
        (anchor, group), never a pre-sliced copy). The group's part id
        encodes its salt bucket: b = part % (n_salts+1) - 1; bucket
        groups (b ≥ 0) expand only the seeds with dst % n_salts == b —
        the same arithmetic the plan side used to route their halo
        rows — but probe against the full array.
      - wedge expansion (T2): seeds (u, v) → all w ∈ N+(v) via
        searchsorted + segment gather.
      - closure probe (T1): packed (u, w) int64 keys binary-searched
        against the anchor target set — all (anchor, neighbor) seed
        pairs of the group. Ids ≥ 2³¹ take a dense LOCAL relabel
        (np.unique universe) — the kernel has no global-id ceiling (a
        10^12-vertex web graph overflows the r1 raw packing).
      - per-anchor partial sums (T4) leave as (v, tri) rows.

    Bandwidth discipline (the kernel is memory-bound, not FLOP-bound —
    every wedge-scale temporary is a full pass over RAM, and N
    concurrent workers share one socket's bandwidth):
      - ids are computed in a compact int32 space (direct downcast when
        max id < 2³¹, dense relabel otherwise) — halves the bytes of
        every gather/repeat pass; only the packed probe keys are int64.
      - wedge expansion runs in bounded chunks (≤ ``_WEDGE_CHUNK``
        wedges per pass) with per-anchor counts accumulated by bincount
        — peak temporary footprint is independent of group size.
    """
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.compute as pc  # noqa: PLC0415

    empty = pa.table(
        {"v": pa.array([], pa.int64()), "tri": pa.array([], pa.int64())}
    )
    tab = table.combine_chunks()
    v = tab.column("v").to_numpy()
    kind = tab.column("kind").to_numpy()
    seeds = tab.column("seeds")
    lens = pc.list_value_length(seeds).to_numpy().astype(np.int64)
    flat = pc.list_flatten(seeds).to_numpy()
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])

    halo_rows = np.flatnonzero(kind == _K_HALO)
    seed_rows = np.flatnonzero(kind != _K_HALO)
    if not len(halo_rows) or not len(seed_rows):
        # no middle adjacency, or no seeds → no wedge can close
        return empty
    # the group's salt bucket, encoded in its part id (constant per group)
    b = int(tab.column("part")[0].as_py()) % (n_salts + 1) - 1

    # compact int32 id space: direct downcast when ids fit 2³¹, dense
    # LOCAL relabel otherwise (group-local universes are < 2³¹ — the
    # kernel has NO global-id ceiling; a 10^12-vertex web graph would
    # overflow raw packing). Every wedge-scale pass below then moves
    # half the bytes.
    hi_id = max(int(v.max(initial=0)), int(flat.max(initial=0)) if len(flat) else 0)
    if hi_id < (1 << 31):
        uni = None
        v32 = v.astype(np.int32)
        flat32 = flat.astype(np.int32)
    else:
        uni = np.unique(np.concatenate([v, flat]))
        v32 = np.searchsorted(uni, v).astype(np.int32)
        flat32 = np.searchsorted(uni, flat).astype(np.int32)

    # halo lookup: sorted vertex ids → original row index (segments are
    # never moved; T7 offsets are the Arrow list offsets themselves)
    vs_h = v32[halo_rows]
    order_h = np.argsort(vs_h, kind="stable")
    svs = vs_h[order_h]
    h_rows_sorted = halo_rows[order_h]

    # seed expansion: per-element (u, v) pairs from the packed seeds
    su = v32[seed_rows]
    s_lens = lens[seed_rows]
    sv_flat = _gather_segments(starts[seed_rows], s_lens, flat32)
    if not len(sv_flat):
        return empty
    su_rep = np.repeat(su, s_lens)

    # anchor target set T(u) = ALL (anchor, neighbor) seed pairs — the
    # seed rows carry full N+(u) in every group kind, so this is exact
    # for salted hubs too. Built ONCE per group (edge-scale).
    target_keys = np.sort((su_rep.astype(np.int64) << 32) | sv_flat)

    # bucket groups expand only their slice of the hub seeds; the mod
    # runs on ORIGINAL ids (matching the plan-side pmod(dst, n_salts)
    # halo routing), so it must precede any dense relabel
    if b >= 0:
        keep = _gather_segments(
            starts[seed_rows], s_lens, (flat % n_salts) == b
        )
        su_rep = su_rep[keep]
        sv_flat = sv_flat[keep]
        if not len(sv_flat):
            return empty

    # wedge fan-out sizes (T2): each (u, v) reaches all w ∈ N+(v)
    vpos = np.searchsorted(svs, sv_flat)
    vpos_c = np.minimum(vpos, len(svs) - 1)
    has_adj = svs[vpos_c] == sv_flat
    hrow = h_rows_sorted[vpos_c]
    wlens = np.where(has_adj, lens[hrow], 0)
    wstarts = starts[hrow]

    # chunked wedge expansion + closure probe (T1): bounded temporary
    # footprint regardless of group size; per-anchor partial sums (T4)
    # accumulate by bincount into the group's anchor table
    anchor_ids = np.unique(su)
    counts = np.zeros(len(anchor_ids), dtype=np.int64)
    cum = np.cumsum(wlens)
    total_w = int(cum[-1]) if len(cum) else 0
    if total_w == 0:
        return empty
    n_chunks = -(-total_w // _WEDGE_CHUNK)
    cuts = np.searchsorted(cum, np.arange(1, n_chunks + 1) * _WEDGE_CHUNK) + 1
    cuts[-1] = len(wlens)
    prev = 0
    for cut in cuts:
        cut = int(cut)
        if cut <= prev:
            continue
        sl = slice(prev, cut)
        prev = cut
        w = _gather_segments(wstarts[sl], wlens[sl], flat32)
        if not len(w):
            continue
        a = np.repeat(su_rep[sl], wlens[sl])
        probe_keys = (a.astype(np.int64) << 32) | w
        hit_pos = np.searchsorted(target_keys, probe_keys)
        hit_pos[hit_pos == len(target_keys)] = 0
        hits = target_keys[hit_pos] == probe_keys
        if hits.any():
            apos = np.searchsorted(anchor_ids, a[hits])
            counts += np.bincount(apos, minlength=len(anchor_ids))

    nz = counts > 0
    out_ids = anchor_ids[nz]
    out_v = uni[out_ids] if uni is not None else out_ids.astype(np.int64)
    return pa.table(
        {"v": pa.array(out_v, pa.int64()), "tri": pa.array(counts[nz], pa.int64())}
    )


def triangles_per_vertex_kernel(
    oriented: DataFrame,
    n_parts: int | None = None,
    salt_threshold: int = 4096,
    n_salts: int = 16,
    parts: DataFrame | None = None,
) -> DataFrame:
    """Per-vertex triangle counts via the partitioned CSR kernel: ``v, tri``.

    Pipeline (one adjacency-array build + one applyInArrow shuffle):
      1. part(u) = pmod(xxhash64(u), k)  — deterministic hash partitioning
         (the reference's `random` node-parts file, P1).
      2. routing assignments (v, part, kind) are derived from the RAW
         edge table + a broadcast hub set — cheap map-side-combined
         distincts over (id, part) pairs. The adjacency-array aggregation
         (C6 + the CSR payload) is then referenced by exactly ONE join,
         so it executes once; the r2 form referenced it from six
         consumers and Catalyst executed the collect_list agg six times
         (no exchange reuse across the grouped-Arrow boundary — measured
         ~40% of all task time at local[8]).
      3. halo rows: the adjacency array of every seed target, shipped to
         every group whose seeds point at it (P4 halo expansion as a
         join — duplicated per referencing group, exactly the reference's
         halo materialization, but transient in the shuffle; distinct =
         P5 halo dedupe). Every movement ships one Arrow-packed row per
         (vertex, group), never per edge (a flat per-edge shuffle was
         measured 5× more expensive).
      4. per-group Arrow-native numpy kernel (_count_partition_arrow).
         The kernel exchange is AQE-coalesced BY SIZE — for wave-granular
         scheduling at high parallelism, size the session's
         ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` so the
         coalesced task count stays ≥ ~4× the core count (an explicit
         repartition(n_parts, part) was measured WORSE: 64 hash bins for
         64 structured group ids collide balls-in-bins — max/mean task
         skew 4.8 — and 64 grouped-Arrow tasks pay ~2× the per-task
         Arrow hand-off overhead of 14 size-balanced ones).

    Hub salting: anchors with out-degree > ``salt_threshold`` would make
    one group's probe work quadratic in the hub degree. Their wedge seeds
    (u, v) are split into ``n_salts`` buckets by dst % n_salts; each
    bucket group receives the hub's full adjacency ONCE (it doubles as
    the intersection target) plus only its own slice's halo lists, and
    the kernel expands just the bucket's seeds; partial counts merge in
    the final agg.

    ``parts``: optional external anchor assignment ``(v, part)`` (P3 —
    the reference's METIS node-parts file,
    Halo_creation_preprocess.py:304-341; produce one in-engine with
    ``plans.partitioning.multilevel_partition``). Replaces the hash
    rule for SEED placement only — a locality-aware assignment puts
    adjacent anchors in the same group, so fewer distinct (halo
    vertex, group) pairs survive the dedupe and the halo shuffle (the
    job's dominant bytes) shrinks with the edge cut. Vertices absent
    from ``parts`` fall back to the hash rule; the count is invariant
    to ANY assignment (asserted by the oracle-gated query).
    """
    if n_parts is None:
        n_parts = oriented.sparkSession.sparkContext.defaultParallelism

    # compact id width for the shuffled payload: when every id fits
    # int32, ship 4-byte ids — the halo/seed array shuffle and the Arrow
    # hand-off to the kernel are the job's dominant bytes, and halving
    # them is a straight bandwidth win at every parallelism level. One
    # cheap agg on the (cached) oriented input decides; > 2³¹ ids keep
    # bigint and the kernel's dense local relabel handles them.
    hi = oriented.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("hi")
    ).collect()[0]["hi"]
    if hi is not None and hi < (1 << 31):
        oriented = oriented.select(
            F.col("src").cast("int").alias("src"), F.col("dst").cast("int").alias("dst")
        )

    # hub set (out-degree > threshold) — a count-only agg with map-side
    # partials, broadcast to annotate edges; orientation caps out-degree
    # near sqrt(2E) so this is small by construction
    deg = oriented.groupBy("src").agg(F.count("*").alias("deg_out"))
    hubs = deg.where(F.col("deg_out") > F.lit(salt_threshold)).select(
        F.col("src").alias("hub")
    )
    hash_part = F.pmod(F.xxhash64("src"), F.lit(n_parts))
    ep_in = oriented
    if parts is not None:
        # P3 external assignment: one vertex-sized join on the anchor
        # (routing only — the adjacency build below stays on the bare
        # edge table); unassigned anchors fall back to the hash rule.
        # The cast keeps the join key type stable under the int32
        # compaction above; max_by dedupes a sloppy assignment.
        ep_in = oriented.join(
            parts.groupBy(F.col("v").cast("long").alias("_pv")).agg(
                F.max(F.col("part").cast("long")).alias("_pp")
            ),
            F.col("src").cast("long") == F.col("_pv"),
            "left",
        ).drop("_pv")
        base_part = F.coalesce(F.col("_pp"), hash_part) * (n_salts + 1)
    else:
        base_part = hash_part * (n_salts + 1)
    ep = (
        ep_in.join(F.broadcast(hubs), F.col("src") == F.col("hub"), "left")
        .select(
            "src",
            "dst",
            F.when(
                F.col("hub").isNotNull(),
                base_part + 1 + F.pmod(F.col("dst").cast("long"), F.lit(n_salts)),
            )
            .otherwise(base_part)
            .alias("part"),
        )
    )

    # routing assignments, all map-side-combined distincts on (id, part):
    #   anchors — one row per (anchor, group with ≥1 of its seeds);
    #   halos   — one row per (seed target, demanding group)  (P4 + P5)
    anchors = (
        ep.select(F.col("src").alias("v"), "part")
        .distinct()
        .select(
            "v",
            "part",
            F.when(
                F.pmod("part", F.lit(n_salts + 1)) == 0, F.lit(_K_SEED)
            )
            .otherwise(F.lit(_K_SEED_SALTED))
            .alias("kind"),
        )
    )
    halos = ep.select(F.col("dst").alias("v"), "part").distinct().select(
        "v", "part", F.lit(_K_HALO).alias("kind")
    )

    # THE adjacency build (C6 sort + CSR payload), executed exactly once:
    # one groupBy packs each vertex's sorted adjacency into an array;
    # one join routes a copy of it to every (group, kind) that needs it
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("seeds")
    )
    rows = anchors.unionByName(halos).join(
        adj.withColumnRenamed("src", "v"), "v"
    )

    per_group = rows.groupBy("part").applyInArrow(
        lambda tab: _count_partition_arrow(tab, n_salts),
        schema=_KERNEL_OUT_SCHEMA,
    )
    # merge salted partials
    return per_group.groupBy("v").agg(F.sum("tri").alias("tri"))


def triangle_count_kernel(
    oriented: DataFrame,
    n_parts: int | None = None,
    salt_threshold: int = 4096,
    n_salts: int = 16,
    parts: DataFrame | None = None,
) -> int:
    df = triangles_per_vertex_kernel(
        oriented, n_parts, salt_threshold, n_salts, parts=parts
    )
    row = df.agg(F.sum("tri").alias("t")).collect()[0]
    return int(row["t"] or 0)


def weighted_triangle_total(
    raw_pairs: DataFrame, closure: str = "auto"
) -> DataFrame:
    """WEIGHTED triangle count over a raw pair table with repeats:
    weight(edge) = multiplicity, each triangle contributes
    min(w_uv, w_vw, w_uw) — bottleneck cohesion. One-row result
    ``n_triangles, weight_total`` (both BIGINT).

    Same plan as the unweighted join form (orientation prunes the wedge
    stream to Σ deg+²); the only addition is the exact-integer weight
    carried on each oriented edge and a LEAST folded at the closure
    match — no extra shuffle. ``closure`` follows ``triangles_join``'s
    strategy rule (broadcast the 24-byte/row weighted edge side under
    the size limit so the wedge stream is never exchanged; shuffle in
    the >limit regime). Reference parity: the reference's
    edge_weight.cu is weight-free despite its name (SURVEY §2.4); this
    is the [EXT] weighted semantics a co-occurrence graph wants."""
    from trianglecount_spark.operators.canonicalize import orient

    e = raw_pairs.where(F.col("src") != F.col("dst"))
    wsym = (
        e.select("src", "dst")
        .unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("wt"))
    )
    wor = orient(wsym.select("src", "dst")).join(wsym, ["src", "dst"])
    e1 = wor.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("wt").alias("w1")
    )
    e2 = wor.select(
        F.col("src").alias("v"), F.col("dst").alias("w"), F.col("wt").alias("w2")
    )
    e3 = wor.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("wt").alias("w3")
    )
    if closure == "auto":
        est = _estimated_bytes(wor)
        if est is not None:
            closure = "broadcast" if est <= _BROADCAST_BYTE_LIMIT else "shuffle"
        else:
            # stats unknown ⇒ the decision needs a count; persist first
            # so the weighted graph is built once, not once per branch
            wor = wor.persist()
            e1, e2, e3 = (
                wor.select(
                    F.col("src").alias(a), F.col("dst").alias(b),
                    F.col("wt").alias(c),
                )
                for a, b, c in (("u", "v", "w1"), ("v", "w", "w2"), ("u", "w", "w3"))
            )
            closure = (
                "broadcast" if wor.count() <= _BROADCAST_EDGE_LIMIT else "shuffle"
            )
    if closure == "broadcast":
        e3 = F.broadcast(e3)
    tri = e1.join(e2, "v").join(e3, ["u", "w"])
    return tri.agg(
        F.count("*").cast("long").alias("n_triangles"),
        F.sum(F.least("w1", "w2", "w3")).cast("long").alias("weight_total"),
    )
