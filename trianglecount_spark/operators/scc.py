"""Strongly connected components of a directed graph.

Link-graph extension (north_rule breadth; the reference's pipeline is
undirected-only — without_part_preprocess.py:193-208 symmetrizes before
counting — so SCC has no reference analog). Algorithm: the *Multistep*
method (Slota, Rajamanickam & Madduri, IPDPS'14) — the standard shape
for web-scale SCC, because web graphs are one giant SCC plus a shallow
DAG periphery:

1. **Trim to the cyclic core**: iterate ``keep (u,v) iff u has an
   in-edge and v has an out-edge`` on the EDGE set (two semi-joins per
   round). Every vertex that falls out is a singleton SCC, labeled in
   ONE batch. Kills the DAG periphery (usually most of a web graph).
   Trim is an optimization, not a correctness step, so its round cap is
   safe — anything it misses is handled downstream.
2. **Local finish**: when the surviving core fits a configurable
   driver budget (``local_edges``), collect it once and run iterative
   Tarjan — exact, O(E), and microseconds at that size. This is the
   Multistep paper's own serial-finish step: after trim + giant-SCC
   extraction the remainder of real graphs is tiny, and burning one
   distributed round per small SCC is pure job-launch overhead.
3. **Pivot FW-BW** (the distributed path, while the core is still too
   big to collect): pick the max-out-degree active vertex, take its
   forward and backward *frontier-BFS* closures, and extract
   ``FW ∩ BW`` — exactly SCC(pivot), which on a web graph is the giant
   SCC on the first pull. Frontier BFS joins only newly discovered
   vertices against the edge table each round, so a whole closure
   costs O(E) shuffle TOTAL, not O(rounds·E) like label propagation.
4. **Coloring fallback** (pathological remainders only — many large
   SCCs that pivoting would extract one per round): Orzan-style
   min-label forward coloring, then backward reach of each root within
   its color extracts every SCC of that round at once. The color
   fixpoint runs to TRUE convergence (monotone min over a finite
   lattice — guaranteed to terminate): truncating it at a round cap
   can silently SPLIT an SCC whose min-label needs more rounds than
   the cap (members left behind lose paths through removed mates), so
   there is deliberately no early cut-off here.

Every distributed step is joins + groupBy — no windows, no driver-side
graph state beyond the one thresholded Tarjan collect and 1-row pivot
lookups. Round counts: O(trim cap) + O(core diameter) frontier rounds
per pivot; the adversarial worst case (a chain of cycles) degrades to
O(n) rounds, the known cost of every distributed SCC scheme without
pointer doubling.

Job cadence: the coloring fallback's color/extract fixpoints are
SINGLE-REFERENCE steps — the state DataFrame appears exactly once per
round, with the identity folded in as self-loop edges (``f'(v) = min
over in-nbrs∪{v} of f``) instead of a second reference
(``least(f, incoming)``). That lets ``chain`` rounds compose lazily
into ONE job of ``chain`` sequential shuffle stages per
localCheckpoint + convergence aggregate (multi-reference steps would
recompute exponentially when chained; see operators/iterative.py).
Measured at local[32]/sf0.1 chaining is a wash (job launch is ~free
locally), so the DEFAULT stays eager (chain=1); raise it on real
clusters where per-job scheduling latency (100ms–1s at 1000
executors) dominates short rounds.
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
    Survivors are exactly the edges of the iterated-trim core (cap-safe:
    an under-trimmed core only costs work downstream, never wrongness)."""
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


def _frontier_reach(g: DataFrame, seeds: DataFrame) -> DataFrame:
    """All vertices reachable from ``seeds`` (inclusive) along
    ``g(src → dst)`` — frontier BFS to the empty-frontier fixpoint.
    Each round joins only the new frontier, so the whole closure
    shuffles O(E) total; termination is guaranteed (the visited set
    strictly grows and is bounded by |V|)."""
    state = seeds.select("v").distinct().localCheckpoint(eager=True)
    frontier = state
    while True:
        nxt = (
            frontier.join(g.withColumnRenamed("src", "v"), "v")
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        frontier = nxt.join(state, "v", "left_anti").localCheckpoint(eager=True)
        if frontier.count() == 0:
            return state
        state = state.unionByName(frontier).localCheckpoint(eager=True)


def _tarjan_local(src: list, dst: list) -> list[tuple]:
    """Iterative Tarjan over collected edge lists (any hashable,
    orderable vertex type — web_scc runs it on url strings). Returns
    ``[(v, scc)]`` with scc = min member. Pure Python on compact int
    ids; O(V+E), fine to a few million edges on the driver."""
    verts = sorted({*src, *dst})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[idx[s]].append(idx[d])
    index = [-1] * n
    low = [0] * n
    onstk = [False] * n
    stk: list[int] = []
    comp = [0] * n
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        index[root] = low[root] = counter
        counter += 1
        stk.append(root)
        onstk[root] = True
        work = [(root, 0)]
        while work:
            v, j = work[-1]
            if j < len(adj[v]):
                w = adj[v][j]
                work[-1] = (v, j + 1)
                if index[w] == -1:
                    index[w] = low[w] = counter
                    counter += 1
                    stk.append(w)
                    onstk[w] = True
                    work.append((w, 0))
                elif onstk[w] and index[w] < low[v]:
                    low[v] = index[w]
            else:
                work.pop()
                if work and low[v] < low[work[-1][0]]:
                    low[work[-1][0]] = low[v]
                if low[v] == index[v]:
                    members = []
                    while True:
                        w = stk.pop()
                        onstk[w] = False
                        members.append(w)
                        if w == v:
                            break
                    label = min(verts[x] for x in members)
                    for x in members:
                        comp[x] = label
    return [(verts[i], comp[i]) for i in range(n)]


def strongly_connected_components(
    edges: DataFrame,
    max_outer: int = 30,
    max_prop: int = 60,
    chain: int = 1,
    local_edges: int = 2_000_000,
    local_bytes: int = 256 << 20,
) -> DataFrame:
    """``edges(src, dst)`` directed (any orderable vertex type; self-loops
    ignored). Returns ``(v, scc)``, scc = min vertex id in the SCC.

    ``local_edges``: once the trimmed core has at most this many edges
    it is collected and finished with Tarjan (Multistep serial step);
    0 forces the fully distributed path. The collect is additionally
    gated on ``local_bytes`` — an ESTIMATED payload bound (row count ×
    measured mean endpoint width), because with string url vertices
    2M edges can be hundreds of MB of driver memory where 2M longs are
    ~32 MB; the rows stream to the driver via ``toLocalIterator`` (one
    partition resident at a time, never a full JVM-side copy alongside
    the Python lists). ``chain``: coloring-fallback rounds composed
    lazily per job (module docstring) — 1 (default) checks convergence
    every round; raise to 4-8 on real clusters where job-launch latency
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
    out_schema = vset.withColumn("scc", F.col("v")).schema
    done = spark.createDataFrame([], out_schema)

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
        n_edges = g.count()
        if n_edges == 0:
            return done

        # --- local finish: Tarjan on the collected core -----------------
        if n_edges <= local_edges:
            # byte gate: estimate the collect payload from the measured
            # mean endpoint width (string urls vs longs differ ~10x)
            est = g.select(
                (
                    F.avg(F.length(F.col("src").cast("string")))
                    + F.avg(F.length(F.col("dst").cast("string")))
                    + F.lit(16.0)
                ).alias("row_bytes")
            ).collect()[0]["row_bytes"]
            if n_edges * (est or 16.0) <= local_bytes:
                srcs: list = []
                dsts: list = []
                for row in g.toLocalIterator(prefetchPartitions=False):
                    srcs.append(row[0])
                    dsts.append(row[1])
                rows = _tarjan_local(srcs, dsts)
                return done.unionByName(
                    spark.createDataFrame(rows, out_schema)
                ).localCheckpoint(eager=True)

        # --- pivot FW-BW: extract SCC(max-out-degree vertex) ------------
        pivot = (
            g.groupBy("src")
            .count()
            .orderBy(F.desc("count"), F.asc("src"))
            .limit(1)
            .select(F.col("src").alias("v"))
            .localCheckpoint(eager=True)
        )
        fw = _frontier_reach(g, pivot)
        rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        bw = _frontier_reach(rev, pivot)
        scc_v = fw.join(bw, "v", "left_semi").localCheckpoint(eager=True)
        label = scc_v.agg(F.min("v").alias("m"))
        scc_rows = scc_v.crossJoin(F.broadcast(label)).select(
            "v", F.col("m").alias("scc")
        )
        done = done.unionByName(scc_rows).localCheckpoint(eager=True)
        vset = vset.join(scc_v, "v", "left_anti").localCheckpoint(eager=True)
        if vset.isEmpty():
            return done
        keep = vset.select("v")
        g = (
            g.join(keep.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )

    # --- coloring fallback: many-large-SCC remainders ------------------
    # (reached only when max_outer pivot pulls did not exhaust the core)
    while not vset.isEmpty():
        g = _trim_to_core(g, max_prop)
        core_v = (
            g.select(F.col("src").alias("v"))
            .unionByName(g.select(F.col("dst").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        done = done.unionByName(
            vset.join(core_v, "v", "left_anti").select("v", F.col("v").alias("scc"))
        ).localCheckpoint(eager=True)
        vset = core_v
        if vset.isEmpty():
            break

        # color: forward min-label propagation to TRUE convergence (a
        # monotone min over a finite lattice — termination guaranteed;
        # truncation could split an SCC, see module docstring). The
        # self-loop fold keeps each round single-reference so `chain`
        # rounds compose into one job.
        gplus = g.unionByName(
            vset.select(F.col("v").alias("src"), F.col("v").alias("dst"))
        ).localCheckpoint(eager=True)
        labels = vset.select("v", F.col("v").alias("f")).localCheckpoint(eager=True)
        prev = _sig(labels)
        while True:
            for _k in range(chain):
                labels = (
                    gplus.join(labels.select(F.col("v").alias("src"), "f"), "src")
                    .groupBy(F.col("dst").alias("v"))
                    .agg(F.min("f").alias("f"))
                )
            labels = labels.localCheckpoint(eager=True)
            cur = _sig(labels)
            if cur == prev:
                break
            prev = cur

        # extract: backward reach of every root within its color --------
        mono = (
            g.join(labels.select(F.col("v").alias("src"), F.col("f").alias("fs")), "src")
            .join(labels.select(F.col("v").alias("dst"), F.col("f").alias("fd")), "dst")
            .where(F.col("fs") == F.col("fd"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        monoplus = mono.unionByName(
            vset.select(F.col("v").alias("src"), F.col("v").alias("dst"))
        ).localCheckpoint(eager=True)
        reached = (
            labels.where(F.col("v") == F.col("f")).select("v").localCheckpoint(eager=True)
        )
        n_reached = reached.count()
        while True:
            for _k in range(chain):
                reached = (
                    monoplus.join(
                        reached.withColumnRenamed("v", "dst"), "dst", "left_semi"
                    )
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
