"""Distributed BPE merge learning ([EXT]) — the tokenizer-training step
of an LM data pipeline, as pure DataFrame programs.

Classic BPE (Sennrich et al. 2016): start from characters, repeatedly
merge the most frequent adjacent symbol pair across the corpus. The
corpus here is the word-frequency table (the standard trick — a pair's
corpus count is Σ word_count over its occurrences), so each round
touches |vocab| rows, not |corpus| tokens.

Determinism/oracle contract: this implements the NON-SELF-PAIR variant
(candidate pairs with left ≠ right symbol; ties broken by count desc,
then lexicographic pair). With left ≠ right, two matches can never
overlap (overlap at positions i, i+1 forces tok[i+1] = left = right),
so greedy leftmost merging degenerates to exact SET logic — drop the
consumed position, rewrite the head position, renumber — which a SQL
engine reproduces bit-for-bit with no sequential fold. Self-pairs
('ee' in natural text) are rare and the variant is standard practice
for exact-arithmetic replication.

Scale shape per round: one equi-join on (word, pos+1) for pair
formation, one hash agg for pair counts, a 1-row driver collect of the
winning pair (k rounds is a constant), one anti-join + renumber window
PARTITIONED BY word (never global). Reference analogy: none — the
reference has no text surface (SURVEY §2.5); this is [EXT] corpus
tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_frequency_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``w, wn`` — distinct words with corpus counts (whitespace split)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("wn"))
    )


def _char_symbols(words: DataFrame) -> DataFrame:
    """``w, wn, pos, tok`` — every word exploded to 1-based character
    positions (explicit substring transform: no engine-specific
    empty-pattern split semantics)."""
    return words.select(
        "w",
        "wn",
        F.posexplode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("pos0", "tok"),
    ).select("w", "wn", (F.col("pos0") + 1).alias("pos"), "tok")


def bpe_merges(
    docs: DataFrame, rounds: int = 2, text_col: str = "text"
) -> DataFrame:
    """Learn ``rounds`` BPE merges over a document corpus. Output: one
    row per merge step — ``step, left_sym, right_sym, merged,
    n_occurrences`` (all counts exact BIGINTs; n_occurrences is the
    pair's corpus frequency at selection time, i.e. AFTER all previous
    merges were applied — the verifiable fixpoint of each round)."""
    spark = docs.sparkSession
    toks = _char_symbols(word_frequency_table(docs, text_col)).localCheckpoint(
        eager=True
    )
    out_rows = []
    for step in range(1, rounds + 1):
        nxt = toks.select(
            F.col("w").alias("w2"),
            F.col("pos").alias("p2"),
            F.col("tok").alias("tok2"),
        )
        pairs = toks.join(
            nxt,
            (F.col("w2") == F.col("w")) & (F.col("p2") == F.col("pos") + 1),
        ).select("w", "wn", "pos", F.col("tok").alias("ta"), F.col("tok2").alias("tb"))
        best = (
            pairs.where(F.col("ta") != F.col("tb"))
            .groupBy("ta", "tb")
            .agg(F.sum("wn").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("ta").asc(), F.col("tb").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["ta"], best[0]["tb"], int(best[0]["c"])
        out_rows.append((step, a, b, a + b, c))
        matched = pairs.where((F.col("ta") == a) & (F.col("tb") == b)).select(
            "w", "pos"
        )
        consumed = matched.select("w", (F.col("pos") + 1).alias("pos"))
        rewritten = (
            toks.join(consumed, ["w", "pos"], "left_anti")
            .join(matched.withColumn("hit", F.lit(True)), ["w", "pos"], "left")
            .select(
                "w",
                "wn",
                "pos",
                F.when(F.col("hit"), F.lit(a + b)).otherwise(F.col("tok")).alias(
                    "tok"
                ),
            )
        )
        toks = rewritten.select(
            "w",
            "wn",
            F.row_number().over(Window.partitionBy("w").orderBy("pos")).alias("pos"),
            "tok",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out_rows,
        "step long, left_sym string, right_sym string, merged string, "
        "n_occurrences long",
    )
