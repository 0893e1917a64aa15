"""URL canonicalization for web-crawl link mining.

The reference consumes pre-built integer edge lists and has no notion of
URLs; canonicalization is part of the Common-Crawl-style ingest this
engine adds in front of the graph pipeline (BASELINE.json input_hint:
pages keyed by url). Rules — the standard crawl-dedup set:

1. fragment stripped (``#...`` never reaches the server);
2. ``utm_*`` tracking params removed (the regex handles ``?utm_x=v`` and
   ``&utm_x=v``; a non-utm param after a removed leading ``?utm_`` would
   need a ``&``→``?`` fix-up that requires regex backreferences, whose
   syntax differs across engines — documented limitation, tracking
   params are conventionally appended last);
3. scheme+host lowercased (RFC 3986 §6.2.2.1 — case-insensitive parts);
4. default port dropped (``:80``/``:443``);
5. one trailing slash stripped.

Everything is built-in ``pyspark.sql.functions`` string/regex
expressions — whole-stage-codegen JVM path, no UDF, so the normalizer
runs at scan speed inside the mining stage at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://host[:port] prefix (the case-insensitive, port-carrying part)
_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module rules, as one JVM
    expression tree."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # 1. fragment
    u = F.regexp_replace(u, r"[?&]utm_[A-Za-z]+=[^&#]*", "")  # 2. utm_*
    hp = F.regexp_extract(u, _HOST_RE, 1)
    rest = F.substring(u, F.length(hp) + F.lit(1), F.lit(1 << 30))
    host = F.regexp_replace(F.lower(hp), r":(443|80)$", "")  # 3+4
    u = F.concat(host, rest)
    return F.regexp_replace(u, r"/$", "")  # 5. trailing slash


def messy_variant(url: Column | str) -> Column:
    """Deterministic fixture: derive one of six messy-but-equivalent
    variants of ``url`` keyed by md5(url) — the cross-engine test input
    for ``canonical_url`` (the DuckDB oracle rebuilds the same variants
    byte-identically: md5 and the string ops are engine-portable)."""
    u = F.col(url) if isinstance(url, str) else url
    k = F.pmod(F.conv(F.substring(F.md5(u), 1, 2), 16, 10).cast("long"), F.lit(6))
    hp = F.regexp_extract(u, _HOST_RE, 1)
    rest = F.substring(u, F.length(hp) + F.lit(1), F.lit(1 << 30))
    return (
        F.when(k == 0, u)
        .when(k == 1, F.concat(F.upper(hp), rest))
        .when(k == 2, F.concat(hp, F.lit(":443"), rest))
        .when(k == 3, F.concat(u, F.lit("#section-2")))
        .when(k == 4, F.concat(u, F.lit("?utm_source=feed&utm_campaign=x")))
        .otherwise(F.concat(u, F.lit("/")))
    )
