"""Resumable end-to-end link-graph pipeline — the north-rule job form.

The reference is driven as a shell pipeline of stage executables over
files (Scripts/auto_v72.sh: preprocess → partition → kernel); this is
the Spark-first equivalent for the driver-mandated workload: ONE
spark-submit-able job that takes a Common-Crawl-style pages table and
produces the link-graph analytics suite —

    pages(html) → mined edges + url dictionary        (stage "edges")
                → triangle count (arrays strategy)    (stage "tc")
                → PageRank                            (stage "pagerank")
                → connected components                (stage "components")
                → label propagation                   (stage "lpa")

with the three properties the north rule names:

- RESUMABLE FROM CHECKPOINT: every stage materializes to
  ``out_dir/<stage>`` parquet and is skipped on re-run when its
  ``_SUCCESS`` marker exists (the same idempotence contract as a
  restarted Airflow/Oozie DAG over an Iceberg warehouse). PageRank
  additionally resumes MID-ITERATION from ``out_dir/pr_state/round=N``
  (operators/iterative.py) — a killed 100-round job continues from its
  last check round, not from scratch.
- PER-PARTITION LINEAGE + METRICS: each iterative stage's IterationLog
  (round deltas, wall seconds, per-partition row counts + skew ratio)
  and each stage's wall time / row count land in
  ``out_dir/metrics.json``.
- CLUSTER JOB FORM: no driver-side data paths — stages exchange data
  through parquet only, so the identical invocation runs under
  ``spark-submit --py-files trianglecount_spark.zip`` on a real
  cluster (tools/submit_job.py).

Stage boundaries are parquet (not localCheckpoint) deliberately: a
resumable multi-hour job must survive DRIVER loss, which executor-local
checkpoint blocks do not.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    pr_rounds: int = 10,
    lpa_rounds: int = 5,
    resume: bool = True,
) -> dict:
    """Run (or resume) the full pipeline; returns the metrics dict that
    is also written to ``out_dir/metrics.json``."""
    from trianglecount_spark.functions.extract import edges_from_pages
    from trianglecount_spark.operators.canonicalize import canonicalize_edges, orient
    from trianglecount_spark.operators.components import connected_components
    from trianglecount_spark.operators.lpa import label_propagation
    from trianglecount_spark.operators.pagerank import pagerank
    from trianglecount_spark.operators.triangles import triangle_count_arrays

    os.makedirs(out_dir, exist_ok=True)
    edges_dir = os.path.join(out_dir, "edges")
    verts_dir = os.path.join(out_dir, "vertices")
    tc_path = os.path.join(out_dir, "tc.json")
    metrics: dict = {"stages": {}}

    def stage(name: str):
        t0 = time.time()

        def finish(**kw):
            metrics["stages"][name] = {
                "seconds": round(time.time() - t0, 3), **kw,
            }

        return finish

    # ---- stage: edges (HTML mining + url dictionary) ----------------
    fin = stage("edges")
    if resume and _done(edges_dir) and _done(verts_dir):
        fin(skipped=True)
    else:
        handles: list = []
        e, verts = edges_from_pages(pages, handles=handles)
        e.write.mode("overwrite").parquet(edges_dir)
        verts.write.mode("overwrite").parquet(verts_dir)
        for h in handles:
            h.unpersist()
        fin(skipped=False)
    edges = spark.read.parquet(edges_dir)
    sym = canonicalize_edges(edges).persist()
    n_edges = sym.count() // 2
    metrics["n_und_edges"] = n_edges
    metrics["n_vertices"] = spark.read.parquet(verts_dir).count()

    # ---- stage: triangle count --------------------------------------
    fin = stage("tc")
    if resume and os.path.exists(tc_path):
        with open(tc_path) as f:
            metrics["n_triangles"] = json.load(f)["n_triangles"]
        fin(skipped=True)
    else:
        metrics["n_triangles"] = triangle_count_arrays(orient(sym))
        with open(tc_path, "w") as f:
            json.dump({"n_triangles": metrics["n_triangles"]}, f)
        fin(skipped=False)

    # ---- stage: pagerank (mid-iteration resumable) -------------------
    fin = stage("pagerank")
    pr_dir = os.path.join(out_dir, "pagerank")
    if resume and _done(pr_dir):
        fin(skipped=True)
    else:
        ranks, log = pagerank(
            sym,
            tol=0.0,
            max_iter=pr_rounds,
            check_every=max(1, pr_rounds // 2),
            dangling_free=True,
            state_dir=os.path.join(out_dir, "pr_state"),
            resume=resume,
            partition_metrics=True,
        )
        ranks.write.mode("overwrite").parquet(pr_dir)
        fin(skipped=False, rounds=log.rounds)

    # ---- stage: connected components ---------------------------------
    fin = stage("components")
    cc_dir = os.path.join(out_dir, "components")
    if resume and _done(cc_dir):
        fin(skipped=True)
    else:
        comp, log = connected_components(sym)
        comp.write.mode("overwrite").parquet(cc_dir)
        fin(skipped=False, rounds=log.rounds)

    # ---- stage: label propagation -------------------------------------
    fin = stage("lpa")
    lpa_dir = os.path.join(out_dir, "lpa")
    if resume and _done(lpa_dir):
        fin(skipped=True)
    else:
        labels, log = label_propagation(sym, max_iter=lpa_rounds)
        labels.write.mode("overwrite").parquet(lpa_dir)
        fin(skipped=False, rounds=log.rounds)

    sym.unpersist()
    metrics["n_components"] = spark.read.parquet(cc_dir).select("comp").distinct().count()
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics
