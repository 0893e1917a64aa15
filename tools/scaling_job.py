"""One scaling measurement: run the headline jobs at a given core count.

Invoked by tools/scaling.py as a subprocess (fresh JVM per parallelism
level). Prints one JSON line with per-job seconds.

Input is the deterministic synthetic power-law web graph
(sources/synth.py) — large enough that distributed compute dominates
job-fixed overhead, which is the regime the north_rule's two-cluster
scaling criterion constrains (the sf0.1 testdata graph saturates in
seconds at local[32] and then measures only scheduler overhead).

The physical partitioning (spark.sql.shuffle.partitions = 64) is held
FIXED across parallelism levels: identical plans and task sets, only the
number of concurrent executor slots changes — the honest analog of the
same job on N vs 4N executors.

Timing excludes session startup and input materialization; each job's
input is cached and counted before its timer starts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trianglecount_spark.operators.canonicalize import canonicalize_edges, orient  # noqa: E402
from trianglecount_spark.operators.pagerank import pagerank  # noqa: E402
from trianglecount_spark.operators.triangles import (  # noqa: E402
    triangle_count_arrays,
    triangles_join,
    triangles_per_vertex_kernel,
)
from trianglecount_spark.session import get_spark  # noqa: E402
from trianglecount_spark.sources.synth import powerlaw_edges  # noqa: E402

# (edges, vertices) per job family — sized so local[32] runs ~1-2 min
BIG = (8_000_000, 100_000)      # tc_arrays / tc_join / pagerank
SMALL = (3_000_000, 100_000)    # tc_kernel (reference-faithful, heavier)
SHUFFLE_PARTITIONS = 64


def main() -> None:
    cpus = int(sys.argv[1])
    spark = get_spark(
        app_name=f"scaling-{cpus}", cores=cpus, shuffle_partitions=SHUFFLE_PARTITIONS
    )
    out = {"cpus": cpus, "big_edges": BIG[0], "big_vertices": BIG[1],
           "kernel_edges": SMALL[0], "kernel_vertices": SMALL[1]}

    sym = canonicalize_edges(powerlaw_edges(spark, *BIG)).cache()
    sym.count()
    oriented = orient(sym).cache()
    n_oriented = oriented.count()
    out["n_oriented_edges"] = n_oriented

    t0 = time.time()
    n_tri = triangle_count_arrays(oriented)
    out["tc_arrays"] = round(time.time() - t0, 3)

    t0 = time.time()
    n_tri_j = triangles_join(oriented, closure="broadcast").count()
    out["tc_join"] = round(time.time() - t0, 3)
    assert n_tri_j == n_tri, (n_tri_j, n_tri)
    out["n_triangles"] = n_tri

    t0 = time.time()
    ranks, _ = pagerank(sym, tol=0.0, max_iter=10, check_every=10)
    ranks.count()
    out["pagerank10"] = round(time.time() - t0, 3)
    sym.unpersist()
    oriented.unpersist()

    o_small = orient(canonicalize_edges(powerlaw_edges(spark, *SMALL))).cache()
    o_small.count()
    t0 = time.time()
    n_tri_k = (
        triangles_per_vertex_kernel(o_small, n_parts=SHUFFLE_PARTITIONS)
        .agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("t"))
        .collect()[0]["t"]
    )
    out["tc_kernel"] = round(time.time() - t0, 3)
    out["n_triangles_kernel"] = int(n_tri_k)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
