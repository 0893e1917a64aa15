"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk_bruteforce`` — exact top-k by cosine. The query set is
  collected to the driver (a probe set — ~10²–10⁴ rows; the corpus is
  the big side and never leaves the executors), broadcast into an
  Arrow-batched ``mapInPandas`` kernel that computes a numpy float64
  matmul per corpus batch and keeps the per-batch top-k, then a global
  top-k merge over the ≤ n_batches·Q·k survivors. No cross join, no
  per-element SQL lambdas — the O(Q·N·d) flops run as BLAS.

- ``cosine_allpairs_blocked`` — exact all-pairs cosine ≥ threshold
  (embedding near-dup). Vectors are hash-assigned to B blocks, each
  block packed into ONE Arrow row; the B·(B+1)/2 block *pairs* fan out
  across the cluster and each task runs one numpy matmul. O(N²·d) flops
  (it is exact), but distributed over B² tasks with vectorized math —
  the correctness-gated form. The sub-quadratic scale path for near-dup
  is ``cosine_topk_lsh`` / SimHash banding (operators/dedup.py).

- ``cosine_topk_lsh`` — random-hyperplane LSH with PORTABLE integer
  arithmetic: hyperplane entries are Rademacher ±1 signs derived from
  md5 strings, vectors are quantized to integers (floor(v·1000)), so a
  bucket is a sum of int64 products — order-independent and therefore
  bit-identical in any engine (the DuckDB oracle reproduces the buckets
  exactly; no RNG, no float-summation-order divergence). Candidate
  pairs come from a (table, bucket) equi-join; exact cosines are then
  computed only on candidates with the JVM ``aggregate`` expression.

- ``ivf_topk`` — IVF ANN with the same portability discipline: seed
  centroids are the ``n_centroids`` vectors with smallest
  md5(vec_id), one Lloyd refinement pass runs in integer space
  (floor of the elementwise mean of quantized members), assignment is
  argmax of integer dot products (ties → lowest centroid index), and
  queries probe the ``n_probe`` nearest centroid lists.

Reference parity: the reference has no ANN operators — these are the
training-data-pipeline extensions (driver brief), designed Spark-first.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT_SCALE = 1000.0  # integer quantization grid for portable LSH/IVF


def _cosine_expr(qv: str = "qv", cv: str = "cv"):
    """JVM-side cosine via aggregate/zip_with — left-to-right summation,
    used on SMALL candidate sets only (ranking stability vs the DuckDB
    oracle comes from both engines summing in the same order)."""
    dot = (
        f"aggregate(zip_with({qv}, {cv}, (x, y) -> cast(x AS double) * cast(y AS double)),"
        " cast(0.0 AS double), (acc, z) -> acc + z)"
    )
    nq = (
        f"sqrt(aggregate({qv}, cast(0.0 AS double),"
        " (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
    )
    nc = (
        f"sqrt(aggregate({cv}, cast(0.0 AS double),"
        " (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
    )
    return F.expr(f"({dot}) / (({nq}) * ({nc}))")


def _topk(sims: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("nbr").asc())
    return sims.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k).drop("rk")


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: ``q, nbr, sim`` (excludes self-matches).

    Physical shape: collect Q query vectors (driver-side probe set),
    one narrow mapInPandas pass over the corpus (numpy matmul + partial
    top-k per Arrow batch), then a global top-k over the small survivor
    set. The corpus scan parallelizes perfectly and ships k·Q rows per
    batch, never the N·Q similarity matrix.
    """
    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not qrows:
        schema = "q long, nbr long, sim double"
        return queries.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    q_ids_l = q_ids.tolist()
    Qn_l = Qn.tolist()

    def partial(it):
        qid = np.asarray(q_ids_l, dtype=np.int64)
        Qm = np.asarray(Qn_l)
        for pdf in it:
            if not len(pdf):
                continue
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
            cid = pdf[id_col].to_numpy(dtype=np.int64)
            S = Qm @ Cn.T  # (Q, B)
            # self-match mask
            S[qid[:, None] == cid[None, :]] = -np.inf
            kk = min(k, S.shape[1])
            # per-batch top-k per query (ties by nbr asc: stable resolve
            # happens in the exact global window; superset here suffices
            # as long as we keep everything tied with the k-th value)
            part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            kth = S[np.arange(len(qid))[:, None], part].min(axis=1)
            keep_q, keep_c = np.where(S >= kth[:, None])
            sims = S[keep_q, keep_c]
            ok = np.isfinite(sims)
            yield pd.DataFrame(
                {
                    "q": qid[keep_q[ok]],
                    "nbr": cid[keep_c[ok]],
                    "sim": sims[ok],
                }
            )

    partials = corpus.select(id_col, vec_col).mapInPandas(
        partial, schema="q long, nbr long, sim double"
    )
    return _topk(partials, k)


def cosine_allpairs_blocked(
    df: DataFrame,
    threshold: float = 0.95,
    n_blocks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine near-dup pairs ``a, b, sim`` (a < b, round(sim) ≥
    threshold). Blocked all-pairs: every vector lands in one of
    ``n_blocks`` hash blocks, each block travels as ONE packed Arrow
    row, and the B·(B+1)/2 unordered block pairs each run one numpy
    matmul task. Exactness is blocking-invariant (every pair appears in
    exactly one block pair)."""
    packed = df.groupBy(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk")
    ).agg(
        F.collect_list(id_col).alias("ids"),
        F.collect_list(vec_col).alias("vecs"),
    )
    a = packed.select(
        F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"), F.col("vecs").alias("vecs_a")
    )
    b = packed.select(
        F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b")
    )
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    def emit(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                ia = np.asarray(row["ids_a"], dtype=np.int64)
                ib = np.asarray(row["ids_b"], dtype=np.int64)
                A = np.stack([np.asarray(v, dtype=np.float64) for v in row["vecs_a"]])
                B = np.stack([np.asarray(v, dtype=np.float64) for v in row["vecs_b"]])
                A = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
                B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
                S = np.round(A @ B.T, round_to)
                ii, jj = np.where(S >= threshold)
                if not len(ii):
                    continue
                pa, pb, ps = ia[ii], ib[jj], S[ii, jj]
                keep = pa != pb
                lo = np.minimum(pa, pb)[keep]
                hi = np.maximum(pa, pb)[keep]
                yield pd.DataFrame({"a": lo, "b": hi, "sim": ps[keep]})

    out = pairs.mapInPandas(emit, schema="a long, b long, sim double")
    # a pair inside one block (blk_a == blk_b) is emitted once by the
    # single (blk, blk) task; cross-block pairs once by (min, max) task —
    # no duplicates by construction.
    return out


def cosine_neardup_lsh(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs via the PORTABLE-LSH candidate join —
    the sub-quadratic scale path: ``a, b, sim`` (a < b) for candidate
    pairs sharing ≥ 1 (table, bucket) whose exact cosine (rounded to
    ``round_to``) is ≥ ``threshold``.

    Plan shape: one bucket-assignment pass (Arrow kernel, integer
    arithmetic), ONE self equi-join on (table, bucket) carrying only
    (id, table, bucket) — vectors do NOT travel through the bucket
    fan-out — then a pair dedupe and two id-joins to fetch the vectors
    for the exact-verify cosine on candidates only. Work is Σ
    bucket_size² per table instead of N²: with uniform md5-derived
    planes the buckets are balanced, and n_planes tunes the expected
    bucket size (2^planes buckets/table).

    Contract note (regime switch): this is the production near-dup
    contract — recall vs the exact form is the LSH collision
    probability (1−(1−(1−θ/π)^planes)^tables per pair), NOT 1.0; the
    candidate set is itself deterministic and engine-reproducible
    (md5 signs + integer quantization, see ``lsh_buckets``), so an
    oracle reproduces the SAME pairs bit-for-bit. For small corpora or
    when exactness is required, use ``cosine_allpairs_blocked`` (exact,
    O(N²/B) blocked matmul — fine to ~10⁶ vectors, quadratic beyond)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    buckets = lsh_buckets(df, id_col, vec_col, n_planes, n_tables, dim).select(
        "id", "table", "bucket"
    )
    left = buckets.select(F.col("id").alias("a"), "table", "bucket")
    right = buckets.select(F.col("id").alias("b"), "table", "bucket")
    cand = (
        left.join(right, ["table", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("qv"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("cv"))
    sims = (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", F.round(_cosine_expr(), round_to).alias("sim"))
    )
    return sims.where(F.col("sim") >= threshold)


# ---------------------------------------------------------------------------
# portable (engine-reproducible) LSH
# ---------------------------------------------------------------------------


def _rademacher_sign(tag: str) -> int:
    """+1/-1 from the first hex digit of md5(tag) — reproducible in any
    engine with md5 (DuckDB: strpos('01234567', substring(md5(tag),1,1)))."""
    return 1 if hashlib.md5(tag.encode()).hexdigest()[0] in "01234567" else -1


def rademacher_planes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    """(T, P, D) matrix of ±1 signs, entry (t,p,d) from md5('t|p|d')."""
    return np.array(
        [
            [[_rademacher_sign(f"{t}|{p}|{d}") for d in range(dim)] for p in range(n_planes)]
            for t in range(n_tables)
        ],
        dtype=np.int64,
    )


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """``id, table, bucket, vec`` — one row per (vector, table).

    bucket bit p of table t = [ Σ_d sign(t,p,d) · floor(v_d·1000) > 0 ].
    All-integer: the sum is order-independent, so numpy here and SQL in
    an oracle produce identical buckets (no float summation divergence).
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = rademacher_planes(dim, n_planes, n_tables)
    planes_l = planes.tolist()
    n_t, n_p = n_tables, n_planes

    def assign(it):
        H = np.asarray(planes_l, dtype=np.int64)  # (T, P, D)
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            IV = np.floor(V * QUANT_SCALE).astype(np.int64)  # (N, D)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            frames = []
            for t in range(n_t):
                bits = (IV @ H[t].T) > 0  # (N, P)
                buckets = (bits * (1 << np.arange(n_p, dtype=np.int64))).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "id": ids,
                            "table": t,
                            "bucket": buckets,
                            "vec": pdf[vec_col].to_numpy(),
                        }
                    )
                )
            yield pd.concat(frames)

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema="id long, table int, bucket long, vec array<float>"
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via the portable-LSH bucket join: candidates
    from any shared (table, bucket), exact cosine (JVM aggregate — the
    small candidate set only) + global top-k."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    qb = lsh_buckets(queries, id_col, vec_col, n_planes, n_tables, dim).select(
        F.col("id").alias("q"), "table", "bucket", F.col("vec").alias("qv")
    )
    cb = lsh_buckets(corpus, id_col, vec_col, n_planes, n_tables, dim).select(
        F.col("id").alias("nbr"), "table", "bucket", F.col("vec").alias("cv")
    )
    cand = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("q") != F.col("nbr"))
        .select("q", "nbr", "qv", "cv")
        .dropDuplicates(["q", "nbr"])
    )
    sims = cand.select("q", "nbr", _cosine_expr().alias("sim"))
    return _topk(sims, k)


# ---------------------------------------------------------------------------
# portable IVF
# ---------------------------------------------------------------------------


def _quantize_expr(vec_col: str):
    return F.expr(
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT))"
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_passes: int = 1,
) -> np.ndarray:
    """Integer centroid matrix (n_centroids, D), fully deterministic and
    engine-reproducible:
      seeds   = quantized vectors of the n_centroids ids with smallest
                md5(CAST(id AS STRING)) (portable pseudo-random sample);
      assign  = argmax of integer dot (ties → lowest centroid index);
      refine  = ``lloyd_passes`` rounds of elementwise
                floor(mean(quantized members)) — the distributed Lloyd
                step, one groupBy per pass (empty clusters keep their
                previous centroid).
    """
    seeds = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .select(_quantize_expr(vec_col).alias("iv"))
        .collect()
    )
    C = np.stack([np.asarray(r["iv"], dtype=np.int64) for r in seeds])
    for _ in range(lloyd_passes):
        assigned = _assign_nearest(corpus, C, id_col, vec_col, topn=1)
        means = (
            assigned.select("cent", F.posexplode("iv").alias("d", "x"))
            .groupBy("cent", "d")
            .agg(F.floor(F.avg("x")).cast("long").alias("m"))
            .collect()
        )
        newC = C.copy()  # empty clusters keep their previous centroid
        for r in means:
            newC[r["cent"], r["d"]] = r["m"]
        C = newC
    return C


def _assign_nearest(
    df: DataFrame,
    cents: np.ndarray,
    id_col: str,
    vec_col: str,
    topn: int,
) -> DataFrame:
    """``id, cent, iv, vec`` rows: each vector's ``topn`` nearest
    centroids by INTEGER dot product (desc, centroid index asc)."""
    cents_l = cents.tolist()

    def nearest(it):
        C = np.asarray(cents_l, dtype=np.int64)  # (K, D)
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            IV = np.floor(V * QUANT_SCALE).astype(np.int64)
            dots = IV @ C.T  # (N, K) int64
            # argsort by (-dot, cent asc): lexsort on (cent, -dot)
            order = np.argsort(-dots, axis=1, kind="stable")[:, :topn]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf[id_col].to_numpy(dtype=np.int64), topn),
                    "cent": order.ravel(),
                    "iv": list(IV[np.repeat(np.arange(n), topn)]),
                    "vec": pdf[vec_col].iloc[np.repeat(np.arange(n), topn)].to_numpy(),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        nearest, schema="id long, cent int, iv array<long>, vec array<float>"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_passes: int = 1,
) -> DataFrame:
    """IVF ANN: deterministic seeds + ``lloyd_passes`` integer Lloyd
    refinements (see ``ivf_centroids``), corpus bucketed by nearest
    centroid, queries probe the ``n_probe`` nearest lists; exact cosine
    on candidates, global top-k."""
    C = ivf_centroids(corpus, n_centroids, id_col, vec_col, lloyd_passes)
    c_assign = _assign_nearest(corpus, C, id_col, vec_col, topn=1).select(
        F.col("id").alias("nbr"), "cent", F.col("vec").alias("cv")
    )
    q_assign = _assign_nearest(queries, C, id_col, vec_col, topn=n_probe).select(
        F.col("id").alias("q"), "cent", F.col("vec").alias("qv")
    )
    cand = (
        q_assign.join(c_assign, "cent")
        .where(F.col("q") != F.col("nbr"))
        .dropDuplicates(["q", "nbr"])
        .select("q", "nbr", "qv", "cv")
    )
    sims = cand.select("q", "nbr", _cosine_expr().alias("sim"))
    return _topk(sims, k)


def quantize_int8_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization: ``<id_col>, qvec (array<int>), qn2``
    — per-vector scale 127/max|x|, exact integer squared norm. 4x
    memory/bandwidth reduction for the ANN scan at 100 TB, and — because
    the scale, products and round() are single IEEE ops in a fixed
    order — the quantized vectors are bit-identical on any engine, so
    downstream integer dot products are EXACTLY oracle-checkable
    (unlike float cosine, which depends on summation order)."""
    q = (
        f"transform({vec_col}, x -> cast(round(cast(x AS double) * "
        f"(127.0 / greatest(array_max(transform({vec_col}, "
        f"y -> abs(cast(y AS double)))), 1e-300))) AS int))"
    )
    qv = df.select(id_col, F.expr(q).alias("qvec"))
    n2 = "aggregate(qvec, cast(0 AS bigint), (acc, x) -> acc + cast(x AS bigint) * x)"
    return qv.select(id_col, "qvec", F.expr(n2).alias("qn2"))


def cosine_topk_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k over int8-QUANTIZED vectors: ``q, nbr, dot, sim``.

    Same scan shape as ``cosine_topk_bruteforce`` (collected probe set,
    numpy matmul per Arrow batch, partial top-k, global window) but the
    matmul runs on int64-exact quantized integers: ``dot`` is an exact
    BIGINT, and ``sim = dot / (sqrt(qn2)·sqrt(cn2))`` is three
    correctly-rounded IEEE ops on exact integers — bit-identical in any
    engine, so ranking and values hash-match a SQL oracle with no
    summation-order caveat. Zero-norm vectors (cosine undefined, 0/0)
    are excluded on both sides rather than left to engine-specific NaN
    ordering.

    REGIME SWITCH: the collected probe set bounds Q at driver memory —
    for table-sized query sets use ``cosine_topk_quantized_join``
    (block-pair fan-out, no driver collect, bit-identical results)."""
    # zero-norm vectors have no direction: cosine would be 0/0 = NaN,
    # which Spark's isfinite filter and a SQL engine's NaN ordering
    # treat DIFFERENTLY — exclude them on BOTH sides (the oracle
    # applies the identical qn2 > 0 filter)
    qq = quantize_int8_vectors(queries, id_col, vec_col).where(F.col("qn2") > 0)
    qc = quantize_int8_vectors(corpus, id_col, vec_col).where(F.col("qn2") > 0)
    qrows = qq.collect()
    if not qrows:
        return queries.sparkSession.createDataFrame(
            [], "q long, nbr long, dot long, sim double"
        )
    q_ids = [int(r[id_col]) for r in qrows]
    Q_l = [list(r["qvec"]) for r in qrows]
    qn2_l = [int(r["qn2"]) for r in qrows]

    def partial(it):
        qid = np.asarray(q_ids, dtype=np.int64)
        Qm = np.asarray(Q_l, dtype=np.int64)
        sq = np.sqrt(np.asarray(qn2_l, dtype=np.float64))
        for pdf in it:
            if not len(pdf):
                continue
            C = np.stack(pdf["qvec"].to_numpy()).astype(np.int64)
            cid = pdf["vec_id"].to_numpy(dtype=np.int64)
            sc = np.sqrt(pdf["qn2"].to_numpy(dtype=np.float64))
            D = Qm @ C.T  # exact: |dot| <= 64 * 127^2 << 2^53
            S = D / (sq[:, None] * sc[None, :])
            S[qid[:, None] == cid[None, :]] = -np.inf
            kk = min(k, S.shape[1])
            part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            kth = S[np.arange(len(qid))[:, None], part].min(axis=1)
            keep_q, keep_c = np.where(S >= kth[:, None])
            sims = S[keep_q, keep_c]
            ok = np.isfinite(sims)
            yield pd.DataFrame(
                {
                    "q": qid[keep_q[ok]],
                    "nbr": cid[keep_c[ok]],
                    "dot": D[keep_q[ok], keep_c[ok]],
                    "sim": sims[ok],
                }
            )

    partials = qc.withColumnRenamed(id_col, "vec_id").mapInPandas(
        partial, schema="q long, nbr long, dot long, sim double"
    )
    return _topk(partials, k)


def cosine_topk_quantized_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_query_blocks: int = 8,
    n_corpus_blocks: int = 8,
) -> DataFrame:
    """LARGE-Q form of ``cosine_topk_quantized``: identical results
    (exact int8-quantized top-k, same output schema ``q, nbr, dot,
    sim``), but the query set NEVER touches the driver — use when the
    probe set is itself table-sized (the collected form holds Q·dim
    ints on the driver and in every task closure; fine for 10²–10⁴
    probes, not for a corpus-vs-corpus run).

    Plan shape: both sides are hash-packed into blocks (one Arrow row
    per block, ids+vectors+norms as parallel lists — the
    ``cosine_allpairs_blocked`` packing), the B_q × B_c block pairs fan
    out through one cross-join of two tiny block tables, each task
    runs one numpy int64 matmul and keeps the per-block top-k per
    query (everything tied with the k-th value survives, so the global
    resolve is exact), then one global top-k window over ≤ B_c·k·Q
    survivor rows. Work is the same O(Q·N·d) flops as the collected
    form — distributed over block pairs instead of broadcast —
    and every value is the same exact integer arithmetic, so the two
    forms return bit-identical rows (asserted in tests)."""
    qq = (
        quantize_int8_vectors(queries, id_col, vec_col)
        .where(F.col("qn2") > 0)
        .groupBy(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_query_blocks)).alias("qblk")
        )
        .agg(
            F.collect_list(id_col).alias("q_ids"),
            F.collect_list("qvec").alias("q_vecs"),
            F.collect_list("qn2").alias("q_n2"),
        )
    )
    qc = (
        quantize_int8_vectors(corpus, id_col, vec_col)
        .where(F.col("qn2") > 0)
        .groupBy(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_corpus_blocks)).alias("cblk")
        )
        .agg(
            F.collect_list(id_col).alias("c_ids"),
            F.collect_list("qvec").alias("c_vecs"),
            F.collect_list("qn2").alias("c_n2"),
        )
    )
    pairs = qq.crossJoin(qc)

    def emit(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                qid = np.asarray(row["q_ids"], dtype=np.int64)
                Qm = np.stack([np.asarray(v, dtype=np.int64) for v in row["q_vecs"]])
                sq = np.sqrt(np.asarray(row["q_n2"], dtype=np.float64))
                cid = np.asarray(row["c_ids"], dtype=np.int64)
                C = np.stack([np.asarray(v, dtype=np.int64) for v in row["c_vecs"]])
                sc = np.sqrt(np.asarray(row["c_n2"], dtype=np.float64))
                D = Qm @ C.T  # exact: |dot| <= dim * 127^2 << 2^53
                S = D / (sq[:, None] * sc[None, :])
                S[qid[:, None] == cid[None, :]] = -np.inf
                kk = min(k, S.shape[1])
                part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
                kth = S[np.arange(len(qid))[:, None], part].min(axis=1)
                keep_q, keep_c = np.where(S >= kth[:, None])
                sims = S[keep_q, keep_c]
                ok = np.isfinite(sims)
                yield pd.DataFrame(
                    {
                        "q": qid[keep_q[ok]],
                        "nbr": cid[keep_c[ok]],
                        "dot": D[keep_q[ok], keep_c[ok]],
                        "sim": sims[ok],
                    }
                )

    partials = pairs.mapInPandas(emit, schema="q long, nbr long, dot long, sim double")
    return _topk(partials, k)


def kmeans_quantized(
    df: DataFrame,
    k: int = 8,
    rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "km",
) -> DataFrame:
    """K-means over int8-QUANTIZED vectors with EXACT integer geometry:
    ``vec_id, cluster, d2`` after ``rounds`` full Lloyd rounds
    (assign → integer-centroid update) plus a final assignment.

    Every quantity is deterministic and engine-portable:
    - seeds = the k vectors with the smallest md5 of a salted id — a
      seeded sample, no RNG state (k rows collect to the driver; k is a
      constant, never data-sized);
    - assignment = argmin of squared L2 distance Σ(x−c)², an exact
      BIGINT (int8 components, int64 accumulation), ties broken by the
      smaller centroid id via one struct-min aggregate (never a global
      window);
    - centroid update = elementwise floor(sum/count) — floor division
      agrees across engines for negative sums too (unlike truncating
      div), so updated centroids are bit-identical and the next
      assignment stays exactly oracle-checkable.

    Scale shape: centroids are k·dim values — always broadcast; one
    shuffle per update (groupBy cluster,pos). The per-element zip_with
    distance is fine for k·dim constant work per row; at extreme dims
    swap in the numpy-matmul Arrow kernel from cosine_topk_quantized —
    the plan shape (broadcast probe set, partial argmin) is the same."""
    spark = df.sparkSession
    qv = (
        quantize_int8_vectors(df, id_col, vec_col)
        .where(F.col("qn2") > 0)
        .select(F.col(id_col).alias("vid"), F.col("qvec").cast("array<long>").alias("qvec"))
        .persist()
    )
    seeds = (
        qv.select(
            "vid",
            "qvec",
            F.md5(F.concat(F.lit(salt + ":"), F.col("vid").cast("string"))).alias("h"),
        )
        .orderBy("h", "vid")
        .limit(k)
        .collect()
    )
    cents = spark.createDataFrame(
        [(i, [int(x) for x in row["qvec"]]) for i, row in enumerate(seeds)],
        "cid long, cvec array<long>",
    )

    d2 = F.expr(
        "aggregate(zip_with(qvec, cvec, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )

    def assign(centroids: DataFrame) -> DataFrame:
        scored = qv.crossJoin(F.broadcast(centroids)).select(
            "vid", "cid", d2.alias("d2")
        )
        best = scored.groupBy("vid").agg(F.min(F.struct("d2", "cid")).alias("b"))
        return best.select(
            "vid", F.col("b.cid").alias("cid"), F.col("b.d2").alias("d2")
        )

    for _ in range(rounds):
        a = assign(cents)
        upd = (
            a.join(qv, "vid")
            .select("cid", F.posexplode("qvec").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.floor(F.sum("val") * F.lit(1.0) / F.count("*"))
                .cast("long")
                .alias("cval")
            )
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, cval))), "
                    "s -> s.cval)"
                ).alias("cvec")
            )
        )
        cents = upd
    final = assign(cents)
    return final.select(
        F.col("vid").alias(id_col),
        F.col("cid").alias("cluster"),
        F.col("d2").alias("d2"),
    )
