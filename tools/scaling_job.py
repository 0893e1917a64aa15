"""One scaling measurement: run ONE headline job at a given core count.

Invoked by tools/scaling.py as a subprocess — a fresh JVM per (job,
level) measurement, so no job's GC/cache residue pollutes another's
timing. Prints one JSON line: {"cpus": N, "job": name, "seconds": s, ...}.

Input is the deterministic synthetic power-law web graph
(sources/synth.py) — large enough that distributed compute dominates
job-fixed overhead, which is the regime the north_rule's two-cluster
scaling criterion constrains (the sf0.1 testdata graph saturates in
seconds at local[32] and then measures only scheduler overhead).

The physical partitioning (spark.sql.shuffle.partitions = 64) is held
FIXED across parallelism levels: identical plans and task sets, only the
number of concurrent executor slots changes — the honest analog of the
same job on N vs 4N executors.

Timing excludes session startup and input materialization; the job's
input is cached and counted before its timer starts.

Usage: scaling_job.py <cpus> <job> <n_edges> <n_vertices>
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

SHUFFLE_PARTITIONS = 64


def main() -> None:
    cpus = int(sys.argv[1])
    job = sys.argv[2]
    n_edges = int(sys.argv[3])
    n_vertices = int(sys.argv[4])
    spark = get_spark(
        app_name=f"scaling-{job}-{cpus}",
        cores=cpus,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        # the JVM must SEE only N cores, or GC/JIT/common pools at
        # the low level silently use all host cores and flatter it
        extra_confs={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cpus}"
        },
    )
    out = {"cpus": cpus, "job": job, "edges": n_edges, "vertices": n_vertices}

    sym = canonicalize_edges(powerlaw_edges(spark, n_edges, n_vertices)).cache()
    sym.count()
    if job != "pagerank10":
        oriented = orient(sym).cache()
        out["n_oriented_edges"] = oriented.count()
        sym.unpersist()

    t0 = time.time()
    if job == "tc_arrays":
        out["n_triangles"] = triangle_count_arrays(oriented)
    elif job == "tc_join":
        # shuffle closure: the broadcast build is a serial driver-side
        # step that caps measured scaling; the all-shuffle plan is the
        # form whose scaling the two-cluster criterion constrains
        out["n_triangles"] = triangles_join(oriented, closure="shuffle").count()
    elif job == "tc_kernel":
        out["n_triangles"] = int(
            triangles_per_vertex_kernel(oriented, n_parts=SHUFFLE_PARTITIONS)
            .agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("t"))
            .collect()[0]["t"]
        )
    elif job == "pagerank10":
        # the symmetric input is dangling-free: one job per round
        ranks, _ = pagerank(sym, tol=0.0, max_iter=10, check_every=10, dangling_free=True)
        ranks.count()
    else:
        raise SystemExit(f"unknown job {job}")
    out["seconds"] = round(time.time() - t0, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
