"""One scaling measurement: run the headline jobs at a given core count.

Invoked by tools/scaling.py as a subprocess (fresh JVM per parallelism
level). Prints one JSON line:
    {"cpus": N, "tc_join": s, "tc_kernel": s, "pagerank10": s}

Timing excludes session startup and shared input materialization — the
quantity under test is the throughput of the distributed compute, which
is what the north_rule's scaling-efficiency criterion constrains.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trianglecount_spark.operators.pagerank import pagerank  # noqa: E402
from trianglecount_spark.operators.triangles import (  # noqa: E402
    triangles_join,
    triangles_per_vertex_kernel,
)
from trianglecount_spark.plans.queries import copurchase_oriented, copurchase_sym  # noqa: E402
from trianglecount_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"scaling-{cpus}", cores=cpus, shuffle_partitions=cpus)

    sym = copurchase_sym(spark, sf_dir).cache()
    sym.count()
    oriented = copurchase_oriented(spark, sf_dir).repartition(cpus, "src").cache()
    oriented.count()

    out = {"cpus": cpus}
    t0 = time.time()
    n_tri = triangles_join(oriented).count()
    out["tc_join"] = round(time.time() - t0, 3)

    t0 = time.time()
    n_tri_k = (
        triangles_per_vertex_kernel(oriented, n_parts=cpus)
        .agg(F.coalesce(F.sum("tri"), F.lit(0)).alias("t"))
        .collect()[0]["t"]
    )
    out["tc_kernel"] = round(time.time() - t0, 3)
    assert n_tri == n_tri_k

    t0 = time.time()
    ranks, _ = pagerank(sym, tol=0.0, max_iter=10, check_every=10)
    ranks.count()
    out["pagerank10"] = round(time.time() - t0, 3)

    out["n_triangles"] = n_tri
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
