"""Benchmark harness (driver contract: prints ONE JSON line).

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

  tc_join      — triangle count, declarative join form (copurchase graph)
  tc_kernel    — triangle count, partitioned-CSR kernel form (same graph)
  pagerank10   — 10 PageRank rounds on the symmetric copurchase graph
  components   — connected components (large-star/small-star)
  minhash_lsh  — MinHash-LSH near-dup candidates over documents
  emb_knn      — brute-force cosine top-5 over embeddings

Derived throughputs (triangles/sec, PR iterations/min) are included under
"derived" — the BASELINE.json metric. Scaling-efficiency evidence across
parallelism levels lives in tools/scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from trianglecount_spark.operators.components import connected_components  # noqa: E402
from trianglecount_spark.operators.dedup import lsh_candidates, minhash_signatures, shingles  # noqa: E402
from trianglecount_spark.operators.knn import cosine_topk_bruteforce  # noqa: E402
from trianglecount_spark.operators.pagerank import pagerank  # noqa: E402
from trianglecount_spark.operators.triangles import (  # noqa: E402
    triangle_count_arrays,
    triangles_join,
    triangles_per_vertex_kernel,
)
from trianglecount_spark.plans.queries import copurchase_oriented, copurchase_sym  # noqa: E402
from trianglecount_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="tc-bench", cores=cpus, shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    derived: dict[str, float] = {}

    # shared inputs, materialized once so each query times its own work
    sym = copurchase_sym(spark, sf_dir).cache()
    n_und_edges = sym.count() // 2
    oriented = copurchase_oriented(spark, sf_dir).cache()
    oriented.count()

    t0 = time.time()
    n_tri = triangles_join(oriented).count()
    timings["tc_join"] = round(time.time() - t0, 3)
    derived["tc_join_triangles_per_sec"] = round(n_tri / timings["tc_join"], 1)
    derived["tc_join_edges_per_sec"] = round(n_und_edges / timings["tc_join"], 1)

    t0 = time.time()
    n_tri_k = (
        triangles_per_vertex_kernel(oriented, n_parts=cpus)
        .agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("t"))
        .collect()[0]["t"]
    )
    timings["tc_kernel"] = round(time.time() - t0, 3)
    assert n_tri_k == n_tri, (n_tri_k, n_tri)
    derived["tc_kernel_triangles_per_sec"] = round(n_tri / timings["tc_kernel"], 1)

    t0 = time.time()
    n_tri_a = triangle_count_arrays(oriented)
    timings["tc_arrays"] = round(time.time() - t0, 3)
    assert n_tri_a == n_tri, (n_tri_a, n_tri)
    derived["tc_arrays_triangles_per_sec"] = round(n_tri / timings["tc_arrays"], 1)

    t0 = time.time()
    n_iter = 10
    ranks, _log = pagerank(
        sym, tol=0.0, max_iter=n_iter, check_every=n_iter, dangling_free=True
    )
    ranks.count()
    timings["pagerank10"] = round(time.time() - t0, 3)
    derived["pagerank_iters_per_min"] = round(n_iter / (timings["pagerank10"] / 60.0), 2)

    t0 = time.time()
    comp, _ = connected_components(sym)
    n_comp = comp.select("comp").distinct().count()
    timings["components"] = round(time.time() - t0, 3)
    derived["n_components"] = n_comp

    t0 = time.time()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(shingles(docs), n_hashes=8)
    n_cand = lsh_candidates(sig, n_hashes=8, rows_per_band=2).count()
    timings["minhash_lsh"] = round(time.time() - t0, 3)
    derived["minhash_candidates"] = n_cand

    t0 = time.time()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 100)
    cosine_topk_bruteforce(qs, emb, k=5).count()
    timings["emb_knn"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    derived["n_triangles"] = n_tri
    derived["n_und_edges"] = n_und_edges
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "derived": derived,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
