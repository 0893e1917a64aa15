"""Strongly connected components of a directed graph.

Link-graph extension (north_rule breadth; the reference's pipeline is
undirected-only — without_part_preprocess.py:193-208 symmetrizes before
counting — so SCC has no reference analog). Algorithm: the
FW-BW *coloring* method (Orzan '04; Slota et al. '14), the standard
distributed SCC shape, as pure DataFrame rounds:

1. **Trim to the cyclic core**: iterate ``keep (u,v) iff u has an
   in-edge and v has an out-edge`` on the EDGE set to fixpoint. This is
   the classic per-vertex trim, but expressed as a shrinking edge
   relation — no per-level vertex bookkeeping, two semi-joins per
   round, and every vertex that falls out is a singleton SCC labeled in
   ONE batch afterward. Kills the DAG-like periphery of web graphs
   (usually most of the graph) for a few cheap rounds.
2. **Color**: min-label forward propagation to fixpoint —
   ``f(v) = min id u (among active) with u →* v``. Every SCC is
   monochromatic, and the color's root ``c`` (``f(c) = c``) is the
   minimum member id of its own SCC.
3. **Extract**: backward reach of each root through its own color
   (``v →* c`` via f-monochromatic vertices) = SCC(c), labeled ``c``
   (= min member id, same convention as connected_components).
4. Remove extracted vertices, re-trim, repeat.

Every step is joins + groupBy — no windows, no driver-side graph state.
Scale notes: one shuffle join per propagation round; round counts are
O(core diameter) inside a peel and O(#peel levels) outside — a handful
on web-shaped graphs (giant SCC + shallow periphery). The adversarial
worst case (a chain of cycles) degrades to O(n) rounds, the known cost
of every distributed SCC scheme without pointer doubling.

Job cadence: the color and extract fixpoints are deliberately written
as SINGLE-REFERENCE steps — the state DataFrame appears exactly once
per round, with the identity term folded in as self-loop edges
(``f'(v) = min over in-nbrs∪{v} of f``) instead of a second reference
(``least(f, incoming)``). That lets ``chain`` rounds compose lazily
into ONE job of ``chain`` sequential shuffle stages before each
localCheckpoint + convergence aggregate (the materialize_every
analysis in operators/iterative.py:84-97: multi-reference steps
recompute exponentially when chained; single-reference steps chain
linearly). Driver round-trips per propagation round drop from 2 to
2/chain — the knob targets real clusters, where per-job scheduling
latency (driver→scheduler→executors, typically 100ms–1s per job at
1000 executors) dominates short propagation rounds. Measured at
local[32]/sf0.1 where job launch costs ~ms, a controlled A/B of
chain=4 vs chain=1 is a wash within VM noise (256/221s vs 203/267s,
identical result hashes), so the DEFAULT stays eager (chain=1): the
overshoot shuffles (up to chain−1 no-op rounds per fixpoint, each
|V|+|E| rows) buy nothing when job launch is free. Overshoot is
idempotent either way: min-label and reach updates are monotone, so
extra rounds change nothing but shuffle volume.
The trim loop references its edge state three times per round
(src-set, dst-set, and the filtered relation), so it stays on the
eager per-round cadence — chaining it would recompute 3^K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sig(df: DataFrame) -> tuple:
    cols = ", ".join(df.columns)
    return tuple(
        df.agg(
            F.count("*"),
            F.coalesce(F.expr(f"bit_xor(xxhash64({cols}))"), F.lit(0)),
        ).collect()[0]
    )


def _trim_to_core(g: DataFrame, max_rounds: int) -> DataFrame:
    """Edge-set fixpoint of: keep (u,v) iff u ∈ dsts(g) and v ∈ srcs(g).
    Survivors are exactly the edges of the iterated-trim core."""
    n = g.count()
    for _ in range(max_rounds):
        if n == 0:
            break
        g = (
            g.join(
                g.select(F.col("dst").alias("src")).distinct(), "src", "left_semi"
            )
            .join(g.select(F.col("src").alias("dst")).distinct(), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_new = g.count()
        if n_new == n:
            break
        n = n_new
    return g


def strongly_connected_components(
    edges: DataFrame, max_outer: int = 30, max_prop: int = 60, chain: int = 1
) -> DataFrame:
    """``edges(src, dst)`` directed (any orderable vertex type; self-loops
    ignored). Returns ``(v, scc)``, scc = min vertex id in the SCC.
    ``chain`` = propagation rounds composed lazily per job (module
    docstring): 1 (default) checks convergence every round — right for
    local mode; raise to 4-8 on real clusters where job-launch latency
    dominates cheap rounds."""
    g = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    vset = (
        g.select(F.col("src").alias("v"))
        .unionByName(g.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    done = spark.createDataFrame([], vset.withColumn("scc", F.col("v")).schema)

    for _ in range(max_outer):
        # --- trim: non-core vertices are singleton SCCs, one batch -----
        g = _trim_to_core(g, max_prop)
        core_v = (
            g.select(F.col("src").alias("v"))
            .unionByName(g.select(F.col("dst").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        singletons = vset.join(core_v, "v", "left_anti").select(
            "v", F.col("v").alias("scc")
        )
        done = done.unionByName(singletons).localCheckpoint(eager=True)
        vset = core_v
        if vset.isEmpty():
            break

        # --- color: forward min-label fixpoint -------------------------
        # self-loops fold the identity into the join, so each round
        # references `labels` exactly once and `chain` rounds compose
        # into one job (module docstring)
        gplus = g.unionByName(
            vset.select(F.col("v").alias("src"), F.col("v").alias("dst"))
        ).localCheckpoint(eager=True)
        labels = vset.select("v", F.col("v").alias("f")).localCheckpoint(eager=True)
        prev = _sig(labels)
        for _ in range(-(-max_prop // chain)):
            for _k in range(chain):
                labels = (
                    gplus.join(
                        labels.select(F.col("v").alias("src"), "f"), "src"
                    )
                    .groupBy(F.col("dst").alias("v"))
                    .agg(F.min("f").alias("f"))
                )
            labels = labels.localCheckpoint(eager=True)
            cur = _sig(labels)
            if cur == prev:
                break
            prev = cur

        # --- extract: backward reach of every root within its color ----
        mono = (
            g.join(labels.select(F.col("v").alias("src"), F.col("f").alias("fs")), "src")
            .join(labels.select(F.col("v").alias("dst"), F.col("f").alias("fd")), "dst")
            .where(F.col("fs") == F.col("fd"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        # self-loops make the reach update single-reference and monotone:
        # reached' = srcs of mono∪{(v,v)} whose dst ∈ reached ⊇ reached
        monoplus = mono.unionByName(
            vset.select(F.col("v").alias("src"), F.col("v").alias("dst"))
        ).localCheckpoint(eager=True)
        reached = (
            labels.where(F.col("v") == F.col("f")).select("v").localCheckpoint(eager=True)
        )
        n_reached = reached.count()
        for _ in range(-(-max_prop // chain)):
            for _k in range(chain):
                reached = (
                    monoplus.join(reached.withColumnRenamed("v", "dst"), "dst", "left_semi")
                    .select(F.col("src").alias("v"))
                    .distinct()
                )
            reached = reached.localCheckpoint(eager=True)
            n_new = reached.count()  # monotone growth: count check suffices
            if n_new == n_reached:
                break
            n_reached = n_new
        scc_rows = labels.join(reached, "v", "left_semi").select(
            "v", F.col("f").alias("scc")
        )
        done = done.unionByName(scc_rows).localCheckpoint(eager=True)
        vset = vset.join(scc_rows.select("v"), "v", "left_anti").localCheckpoint(
            eager=True
        )
        if vset.isEmpty():
            break
        keep = vset.select("v")
        g = (
            g.join(keep.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    return done
