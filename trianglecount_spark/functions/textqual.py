"""Repetition-based quality signals ([EXT] LLM training-data filtering).

Gopher-style repetition rules (Rae et al. 2021, "Scaling Language
Models: ... Gopher", Table A1) are standard pretraining-corpus filters:
a document dominated by one repeated phrase, or whose n-grams mostly
recur, is boilerplate/spam and is dropped before training. The two
signals implemented here are the published ones that are computable as
pure relational plans:

- ``top_bigram_frac``: fraction of the document's word-bigram
  occurrences taken by its single most frequent bigram;
- ``dup_trigram_frac``: fraction of word-trigram occurrences whose
  trigram occurs more than once in the document.

100 TB shape: split + n-gram expansion are JVM array expressions (no
Python), the counts are one ``(doc_id, gram)`` partial-aggregated
shuffle each, and the final per-doc reduction is a second ``doc_id``
shuffle — no UDFs, no windows, no skew (the key always carries doc_id).
All arithmetic is integer until one final round(·, 6) per signal, so an
independent SQL engine reproduces the values exactly.

The reference has no text analytics (triangle kernels only); this is
driver-mandated LLM-pipeline breadth alongside dedup/lang-id/quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(docs: DataFrame, n: int) -> DataFrame:
    """Explode ``text`` into word n-grams: rows ``(doc_id, gram)``,
    one per occurrence (duplicates preserved)."""
    # guard: sequence(0, -k) would DESCEND in Spark, so short docs must
    # short-circuit to an empty gram array, not a negative-index walk
    w = docs.select("doc_id", F.split("text", " ").alias("w")).where(
        F.size("w") >= n
    )
    grams = w.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(w) - {n}), "
                + "i -> concat_ws(' ', "
                + ", ".join(f"w[i + {j}]" for j in range(n))
                + "))"
            )
        ).alias("gram"),
    )
    return grams.where(F.col("gram").isNotNull())


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Per-doc repetition fractions: ``doc_id, n_bigrams, top_bigram_frac,
    n_trigrams, dup_trigram_frac`` (docs shorter than the n-gram width
    emit 0 counts and 0.0 fractions)."""
    bi = (
        _grams(docs, 2)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_c"),
        )
    )
    tri = (
        _grams(docs, 3)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_trigrams"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_c"),
        )
    )
    base = docs.select("doc_id")
    return (
        base.join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(
                F.coalesce(F.col("top_c") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.round(
                F.coalesce(F.col("dup_c") / F.col("n_trigrams"), F.lit(0.0)), 6
            ).alias("dup_trigram_frac"),
        )
    )
