"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

The ``text`` column is the GOLDEN extraction target: the extractor in
``functions.extract`` must reproduce it byte-identically per url (the
reference-parity invariant). The link structure embedded in ``html`` is a
seeded power-law so hub pages exist (exercises the salting path), plus
relative/absolute/duplicate/self/malformed hrefs to exercise the miner.

Generation is distributed and partition-independent: every page's content
is derived purely from its page id with a counter-based RNG (numpy
Philox), so any partitioning of the id range yields identical rows — the
property that lets the same generator run at 10^12-page scale.

In production the same schema would come from an Iceberg catalog
(``spark.read.format("iceberg").load(...)``); parquet here — identical
DataFrame downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_LANGS = ["en", "de", "fr", "hi"]
_VOCAB = (
    "web page link graph crawl index rank anchor site host path query "
    "content text title body section article news blog shop wiki data"
).split()


def _page_rows(pids: np.ndarray, n_pages: int, n_sites: int, seed: int) -> pd.DataFrame:
    rows = []
    for pid in pids:
        pid = int(pid)
        rng = np.random.Generator(np.random.Philox(key=seed, counter=[0, 0, 0, pid]))
        site = pid % n_sites
        local = pid // n_sites
        url = f"https://site{site}.example/p{local}"
        title = f"Page {local} of site {site}"
        para = " ".join(
            _VOCAB[i] for i in rng.integers(0, len(_VOCAB), size=12)
        )
        text = f"{title}\n{para}"

        # power-law out-links: most pages few links, early pages are hubs
        n_links = 1 + int(7 * (rng.random() ** 3)) + (12 if pid < n_sites else 0)
        anchors = []
        for j in range(n_links):
            # skewed target choice → early page ids become high in-degree hubs
            t = int(n_pages * (rng.random() ** 3.0)) % n_pages
            t_site, t_local = t % n_sites, t // n_sites
            if t_site == site and rng.random() < 0.4:
                anchors.append(f'<a href="/p{t_local}">rel{j}</a>')
            else:
                anchors.append(
                    f'<a href="https://site{t_site}.example/p{t_local}">abs{j}</a>'
                )
        # deliberate noise: duplicate of the first link, a self-link, and
        # malformed anchors the miner must skip
        if anchors:
            anchors.append(anchors[0])
        anchors.append(f'<a href="/p{local}">self</a>')
        anchors.append("<a href=>broken</a>")
        anchors.append("<a>nohref</a>")
        anchors.append(f"<a href='/p{(local + 1)}'>squote-skipped</a>")

        html = (
            f"<html><head><title>{title}</title></head><body>\n"
            f"<p>{para}</p>\n" + "\n".join(anchors) + "\n</body></html>"
        )
        rows.append(
            (
                url,
                pd.Timestamp("2024-01-01T00:00:00Z").tz_localize(None)
                + pd.Timedelta(seconds=pid),
                html.encode("utf-8"),
                text,
                _LANGS[pid % len(_LANGS)],
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def make_pages(
    spark: SparkSession,
    n_pages: int = 64,
    n_sites: int = 8,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table: ``n_pages`` rows."""
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_pages, 1, n_partitions)

    def gen(it):
        for pdf in it:
            yield _page_rows(pdf["id"].to_numpy(), n_pages, n_sites, seed)

    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)
