"""Redirect-chain resolution — pointer doubling (path compression).

A crawl frontier holds an HTTP-redirect map ``(src, dst)``; fetch
scheduling and canonical-url assignment need each chain's FINAL target.
Following pointers one hop per round costs O(L) shuffle rounds for
chains of length L; pointer DOUBLING composes the partial map with
itself — after k rounds every pointer has jumped 2^k hops — so the
round count is O(log L) with the same per-round shuffle shape (one
equi-join keyed on the current target). This is the classic
parallel path-compression primitive (the same trick large-star/
small-star uses for components, operators/components.py).

Fixed-round semantics: ``doublings=k`` resolves every chain of length
≤ 2^k; a longer chain (or a redirect CYCLE — they exist in real crawls)
deterministically reports its 2^k-hop pointer, so a cross-engine oracle
unrolls the identical k compositions and matches exactly. Cycle rows
are identifiable downstream as final targets that are themselves
redirect sources.

Reference scope: the reference is triangle-counting only
(src/WithPartition/Final_updated_corrected.cu); this is driver-mandated
web-crawl breadth in the components/LPA iterative family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(redirects: DataFrame, doublings: int = 4) -> DataFrame:
    """Resolve a redirect map ``(src, dst)`` to ``(src, final, hops)``.

    ``final`` is the pointer after following up to 2^``doublings`` hops
    (the true chain end whenever the chain is that short); ``hops`` is
    the exact number of redirect edges traversed. One self-join per
    doubling, each keyed on the moving target — state never exceeds one
    row per redirect source, so 10^9 redirects resolve in ~30 rounds of
    ordinary hash joins. Inputs with duplicate ``src`` rows must be
    deduped upstream (an HTTP map has one Location per source).
    """
    m = redirects.select(
        F.col("src").alias("v"),
        F.col("dst").alias("nxt"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(doublings):
        jump = m.select(
            F.col("v").alias("nxt"),
            F.col("nxt").alias("nxt2"),
            F.col("hops").alias("hops2"),
        )
        m = (
            m.join(jump, "nxt", "left")
            .select(
                "v",
                F.coalesce("nxt2", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("hops2", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    return m.select(F.col("v").alias("src"), F.col("nxt").alias("final"), "hops")
