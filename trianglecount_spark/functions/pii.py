"""PII detection and redaction ([EXT] LLM training-data curation).

Scrubbing personally identifiable information is a mandatory pass in
every published web-corpus pipeline (C4 strips lines by blocklist;
BigScience/ROOTS and RefinedWeb redact emails / IPs / phone-shaped
spans with regexes before training). The reference engine has no text
stage at all (triangle kernels only — without_part_preprocess.py
consumes an already-built edge list); this module is driver-mandated
LLM-pipeline breadth alongside dedup / lang-id / quality.

100 TB shape: every detector and the redactor are single JVM
``regexp_count`` / ``regexp_replace`` expressions inside whole-stage
codegen — no Python, no shuffle at all (row-local map), so the pass
pipelines into whatever scan precedes it and its cost is one pass over
the text bytes per pattern. That is the correct scale form: PII
scrubbing is embarrassingly parallel and must never introduce a
shuffle or a UDF.

Pattern dialect: the patterns below restrict themselves to the
intersection of Java regex (Spark) and RE2 (DuckDB/Go) — character
classes, bounded repetition, non-capturing groups, ASCII ``\\b`` — no
lookaround, no backreferences — so an independent engine replays the
same spans byte-for-byte and the oracle gate can hash-compare redacted
output exactly.

Redaction order is fixed (EMAIL, PHONE, SSN, IPV4) and matters: an
email's domain may contain digit runs, and a phone-shaped span may
embed an SSN-shaped suffix; applying the more specific patterns first
makes the composition deterministic. Replacement tokens are
``<CLASS>`` sentinels, the convention training pipelines use so the
tokenizer sees a single stable symbol.

RECALL LIMITS — read before treating this as a production scrubber:
these are SHAPE heuristics in the restricted dialect, tuned for
deterministic cross-engine replay, not recall. Phone matches
NANP/intl forms with an optional +CC, parenthesized or bare 3-digit
area code, and space/dot/dash separators (``415-555-0134``,
``(415) 555-0134``, ``+1 415 555 0134``) but NOT unseparated runs
(``4155550134`` — redacting bare 10-digit runs would eat ids and
timestamps), extensions, or non-NANP groupings; IPv4 is shape-only
(no 0-255 range check); there is no NER fallback for names/addresses.
COUNTS vs REDACTION: ``pii_counts`` runs each class pattern on the
RAW text independently, while ``pii_redact`` applies classes
sequentially — when spans of different classes overlap, a count can
disagree with the number of sentinels emitted (e.g. a phone-shaped
span inside an email is counted by the phone counter but redacted as
part of the email). The counts are per-class audit signals, not a
parse of the redacted output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# class -> (pattern, replacement); dict order IS the redaction order
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (
        r"(?:\+\d{1,2}[ .-]?)?(?:\(\d{3}\) ?|\b\d{3}[ .-])\d{3}[ .-]\d{4}\b",
        "<PHONE>",
    ),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
}


def pii_counts(text: Column) -> list[Column]:
    """One ``n_<class>`` INT column per PII class (non-overlapping
    match counts, Java/RE2-identical semantics)."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]


def pii_redact(text: Column) -> Column:
    """Redacted text: every PII span replaced by its ``<CLASS>``
    sentinel, classes applied in ``PII_PATTERNS`` order."""
    out = text
    for pat, repl in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII audit + scrub: input columns preserved, plus
    ``n_email/n_phone/n_ssn/n_ipv4`` and ``redacted`` (the scrubbed
    text). Pure row-local JVM expressions — zero shuffles."""
    t = F.col(text_col)
    return docs.select(
        "*",
        *pii_counts(t),
        pii_redact(t).alias("redacted"),
    )
