from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from trianglecount_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
    shingles,
    simhash64,
    simhash_neardup_pairs,
)
from trianglecount_spark.operators.knn import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    ivf_topk,
)
from trianglecount_spark.operators.multimodal import (
    decode_image,
    fake_image_features,
    frame_sample_plan,
    make_fake_media,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (3, "completely different text with other words entirely here now"),
    (4, "spark engines shuffle data across many partitions quickly"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    groups = {r.keeper: r.n_docs for r in exact_dedup(docs).collect()}
    assert groups[0] == 2  # docs 0 and 2 identical, keeper = min id
    assert groups[1] == 1


def test_jaccard_near_dup(docs):
    sh = shingles(docs)
    pairs = {(r.a, r.b): r.jac for r in jaccard_pairs(sh, threshold=0.3).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0  # exact dup
    assert (0, 1) in pairs and 0.3 <= pairs[(0, 1)] < 1.0  # near dup
    assert (0, 3) not in pairs


def test_minhash_lsh_candidates(docs):
    sh = shingles(docs)
    sig = minhash_signatures(sh, n_hashes=8)
    cand = {(r.a, r.b) for r in lsh_candidates(sig, n_hashes=8, rows_per_band=2).collect()}
    assert (0, 2) in cand  # identical docs always collide in every band
    # unrelated docs should not collide
    assert (3, 4) not in cand


def test_simhash_near_dup(docs):
    sim = simhash64(docs)
    vals = {r.doc_id: r.simhash for r in sim.collect()}
    assert vals[0] == vals[2]  # identical text → identical simhash
    pairs = {
        (r.a, r.b): r.hamming
        for r in simhash_neardup_pairs(sim, max_hamming=12, n_bands=4).collect()
    }
    assert pairs.get((0, 2)) == 0


def _numpy_topk(vecs, qids, k):
    M = np.stack([v for _, v in vecs])
    ids = [i for i, _ in vecs]
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    out = {}
    for q in qids:
        qi = ids.index(q)
        order = sorted(
            (j for j in range(len(ids)) if j != qi),
            key=lambda j: (-sims[qi, j], ids[j]),
        )
        out[q] = [ids[j] for j in order[:k]]
    return out


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.Generator(np.random.Philox(key=7))
    base = rng.standard_normal((20, 8)).astype(np.float32)
    # plant: vec 21 nearly equal to vec 0
    rows = [(i, base[i].tolist()) for i in range(20)]
    near = base[0] + 0.01 * rng.standard_normal(8).astype(np.float32)
    rows.append((21, near.astype(np.float32).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    return df, rows


def test_bruteforce_topk_matches_numpy(emb):
    df, rows = emb
    vecs = [(i, np.asarray(v, dtype=np.float64)) for i, v in rows]
    want = _numpy_topk(vecs, [0, 5, 21], k=3)
    got_df = cosine_topk_bruteforce(df.where(F.col("vec_id").isin([0, 5, 21])), df, k=3)
    got = {}
    for r in got_df.orderBy("q", F.col("sim").desc()).collect():
        got.setdefault(r.q, []).append(r.nbr)
    assert got == want
    assert got[0][0] == 21  # planted near-dup is the top neighbor


def test_lsh_topk_finds_planted_neighbor(emb):
    df, _ = emb
    got = cosine_topk_lsh(
        df.where(F.col("vec_id") == 0), df, k=3, n_planes=4, n_tables=8
    ).collect()
    nbrs = [r.nbr for r in got]
    assert 21 in nbrs  # near-identical vector lands in the same buckets


def test_allpairs_blocked_exact_and_blocking_invariant(emb):
    from trianglecount_spark.operators.knn import cosine_allpairs_blocked

    df, rows = emb
    # numpy truth
    ids = [i for i, _ in rows]
    M = np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(M @ M.T, 6)
    want = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if S[i, j] >= 0.9
    }
    for nb in (1, 3, 16):
        got = {
            (r.a, r.b)
            for r in cosine_allpairs_blocked(df, threshold=0.9, n_blocks=nb).collect()
        }
        assert got == want, f"n_blocks={nb}"
    assert (0, 21) in want  # the planted pair is present


def test_topk_join_form_matches_collected_form(emb):
    """The large-Q block-join ANN form returns BIT-IDENTICAL rows to
    the collected-probe-set form (same exact integer arithmetic, no
    driver collect) — the documented regime switch for query sets that
    don't fit the driver."""
    from trianglecount_spark.operators.knn import (
        cosine_topk_quantized,
        cosine_topk_quantized_join,
    )

    df, _ = emb
    collected = {
        (r.q, r.nbr, r.dot) for r in cosine_topk_quantized(df, df, k=3).collect()
    }
    joined = {
        (r.q, r.nbr, r.dot)
        for r in cosine_topk_quantized_join(
            df, df, k=3, n_query_blocks=3, n_corpus_blocks=4
        ).collect()
    }
    assert joined == collected
    assert collected  # non-trivial fixture


def test_neardup_lsh_subset_and_planted_recall(emb):
    """The LSH near-dup route returns a SUBSET of the exact blocked
    all-pairs result (exact verify on candidates — no false positives),
    finds the planted near-identical pair (high-cosine pairs collide
    with overwhelming probability), and its sims match the exact form's
    on every pair it returns."""
    from trianglecount_spark.operators.knn import (
        cosine_allpairs_blocked,
        cosine_neardup_lsh,
    )

    df, _ = emb
    exact = {
        (r.a, r.b): r.sim
        for r in cosine_allpairs_blocked(df, threshold=0.9, n_blocks=4).collect()
    }
    got = {
        (r.a, r.b): r.sim
        for r in cosine_neardup_lsh(
            df, threshold=0.9, n_planes=4, n_tables=8
        ).collect()
    }
    assert set(got) <= set(exact)
    assert (0, 21) in got  # planted near-dup collides and verifies
    for pair, sim in got.items():
        assert sim == pytest.approx(exact[pair], abs=1e-6)
    # determinism: a second run returns the identical pair set
    again = {
        (r.a, r.b)
        for r in cosine_neardup_lsh(
            df, threshold=0.9, n_planes=4, n_tables=8
        ).collect()
    }
    assert again == set(got)


def test_ivf_topk_finds_planted_neighbor(emb):
    df, _ = emb
    got = ivf_topk(df.where(F.col("vec_id") == 0), df, k=3, n_centroids=4, n_probe=2).collect()
    assert 21 in [r.nbr for r in got]


def test_multimodal_stub_and_fake_path(spark):
    media = make_fake_media(spark, n=12)
    assert media.count() == 12
    with pytest.raises(NotImplementedError):
        decode_image(media)
    feats = fake_image_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        v = np.asarray(r.features)
        assert v.shape == (16,)
        assert ((v >= 0.0) & (v < 1.0)).all()  # hash-uniform in [0, 1)
    # deterministic
    again = {r.media_id: r.features for r in fake_image_features(media, dim=16).collect()}
    assert all(again[r.media_id] == r.features for r in rows)


def test_decode_image_real_when_pil_present(spark):
    """Real decode path — green where PIL exists, cleanly skipped
    otherwise (this container ships no codec libraries)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from trianglecount_spark.operators.multimodal import decode_image

    bufs = []
    for mid, (w, h, color) in enumerate(
        [(64, 48, (255, 0, 0)), (10, 10, (0, 128, 255))]
    ):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (w, h), color).save(buf, format="PNG")
        bufs.append((mid, "image", bytearray(buf.getvalue()), {}))
    bufs.append((9, "image", bytearray(b"not a png"), {}))
    media = spark.createDataFrame(
        bufs, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    out = {r.media_id: r for r in decode_image(media, thumb=(4, 4)).collect()}
    assert (out[0].width, out[0].height, out[0].ok) == (64, 48, True)
    assert len(out[0].thumb) == 4 * 4 * 3
    assert abs(out[0].thumb[0] - 1.0) < 1e-6  # solid red, R channel
    assert (out[1].width, out[1].height, out[1].ok) == (10, 10, True)
    assert out[9].ok is False and out[9].thumb == []  # corrupt bytes filter


def test_frame_sample_plan(spark):
    media = make_fake_media(spark, n=9)
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r.frame_idx % 10 == 0 for r in rows)
    # video rows only (kind == 'video' for media_id % 3 == 2)
    assert {r.media_id % 3 for r in rows} == {2}


def test_char_ngram_jaccard(docs, spark):
    from trianglecount_spark.operators.dedup import char_ngrams

    grams = char_ngrams(docs, n=5)
    # golden: 'abcdef' -> {'abcde', 'bcdef'}
    g = char_ngrams(
        spark.createDataFrame([(9, "abcdef")], "doc_id long, text string"), n=5
    )
    assert {r.s for r in g.collect()} == {"abcde", "bcdef"}
    # shorter than n -> no grams, not a descending-sequence crash
    short = char_ngrams(
        spark.createDataFrame([(8, "abc")], "doc_id long, text string"), n=5
    )
    assert short.count() == 0
    # exact dup pair scores 1.0; unrelated docs stay below threshold
    pairs = {(r.a, r.b): r.jac for r in jaccard_pairs(grams, threshold=0.3).collect()}
    assert pairs[(0, 2)] == 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] < 1.0
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_window_containment(spark):
    from trianglecount_spark.operators.dedup import window_containment_pairs

    quote = "alpha beta gamma delta"  # one shared 4-token window
    rows = [
        (0, quote),                                    # the whole doc IS the quote
        (1, "intro words here " + quote + " outro trailing words"),
        (2, "unrelated body with completely different tokens throughout"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.a, r.b): (r.shared, r.containment)
        for r in window_containment_pairs(docs, k=4).collect()
    }
    # doc 0 has exactly one 4-token window and it appears inside doc 1:
    # full containment of the smaller doc, invisible to symmetric Jaccard
    assert pairs == {(0, 1): (1, 1.0)}


def test_window_containment_boilerplate_cap(spark):
    from trianglecount_spark.operators.dedup import window_containment_pairs

    # the same boilerplate line in every doc; cap at max_df=3 drops it,
    # so no pairs survive even though all docs share the window
    rows = [(i, f"unique{i} token{i} legal notice applies here") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert window_containment_pairs(docs, k=4, max_df=3).count() == 0
    # raising the cap re-admits the shared window: all C(5,2) pairs
    assert window_containment_pairs(docs, k=4, max_df=10).count() == 10


def test_quantized_knn_matches_exact_ranking(spark):
    import numpy as np
    from trianglecount_spark.operators.knn import (
        cosine_topk_bruteforce,
        cosine_topk_quantized,
        quantize_int8_vectors,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(80, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).cache()
    qd = quantize_int8_vectors(df)
    rows = qd.collect()
    # quantization envelope: components in [-127, 127], max |comp| = 127
    for r in rows:
        assert max(abs(c) for c in r.qvec) == 127
        assert r.qn2 == sum(c * c for c in r.qvec)

    qs = df.where("vec_id < 8")
    exact = {(r.q, r.nbr) for r in cosine_topk_bruteforce(qs, df, k=5).collect()}
    quant = {(r.q, r.nbr) for r in cosine_topk_quantized(qs, df, k=5).collect()}
    # int8 on gaussian vectors preserves nearly all of the top-5 set
    assert len(exact & quant) / len(exact) >= 0.9


def test_cdc_chunks_realign_after_insertion(spark):
    from trianglecount_spark.operators.dedup import content_defined_chunks

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [(0, base), (1, "INSERTED PREFIX >>> " + base)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = content_defined_chunks(docs).collect()
    a = [r.chunk for r in out if r.doc_id == 0]
    b = [r.chunk for r in out if r.doc_id == 1]
    # chunks reassemble the full text in order
    assert "".join(a) == base and "".join(b) == rows[1][1]
    # content-defined boundaries re-align after the insertion: the bulk
    # of doc 0's chunks reappear verbatim in doc 1 (byte-offset blocking
    # would shift every block)
    shared = set(a) & set(b)
    assert len(shared) >= len(a) - 2, (len(shared), len(a))


def test_cdc_short_text_single_chunk(spark):
    from trianglecount_spark.operators.dedup import content_defined_chunks

    docs = spark.createDataFrame(
        [(0, "ab"), (1, ""), (2, "abcd efgh ijkl")], "doc_id long, text string"
    )
    out = content_defined_chunks(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.chunk)
    # < 4 chars: one whole-text chunk; empty text: no chunks at all
    assert by_doc[0] == ["ab"]
    assert 1 not in by_doc
    assert "".join(by_doc[2]) == "abcd efgh ijkl"


def test_kmeans_quantized_matches_numpy_lloyd(spark):
    """Differential test: the full quantize -> md5-seed -> Lloyd round ->
    assign pipeline recomputed independently in numpy must agree
    EXACTLY (integer geometry end-to-end)."""
    import hashlib
    import math

    from trianglecount_spark.operators.knn import kmeans_quantized

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: (r.cluster, r.d2)
        for r in kmeans_quantized(df, k=3, rounds=1).collect()
    }

    # independent numpy replica
    q = np.zeros((40, 8), dtype=np.int64)
    for i in range(40):
        x = vecs[i].astype(np.float64)
        s = 127.0 / max(np.abs(x).max(), 1e-300)
        # float32 -> float64 then one scaled round, matching the SQL expr
        q[i] = np.array([round(v * s) for v in x], dtype=np.int64)
    seeds = sorted(
        range(40), key=lambda i: (hashlib.md5(f"km:{i}".encode()).hexdigest(), i)
    )[:3]
    cents = [q[i].copy() for i in seeds]

    def assign(c):
        out = {}
        for i in range(40):
            best = min(
                (int(((q[i] - c[j]) ** 2).sum()), j) for j in range(len(c))
            )
            out[i] = best
        return out

    a1 = assign(cents)
    new = []
    for j in range(3):
        members = [q[i] for i in range(40) if a1[i][1] == j]
        if members:
            m = np.stack(members)
            new.append(
                np.array(
                    [math.floor(s / len(members)) for s in m.sum(axis=0)],
                    dtype=np.int64,
                )
            )
    a2 = assign(new)
    want = {i: (a2[i][1], a2[i][0]) for i in range(40)}
    assert got == want
