"""Deterministic synthetic Common-Crawl-style web-pages table.

Schema per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Properties exercised by the engine (FIXTURES.md §1):
  * Zipf-skewed domains — hot-domain salting paths fire
  * per-url irregular crawl history with injected gaps — pad/gap-fill fires
    at every tier
  * ``text`` is a pure function of ``url`` — the per-row invariant
    "byte-identical extracted text per url" holds by construction and is
    asserted end-to-end (sha256) by tests
  * fully Spark-native generation (spark.range + xxhash64-derived
    pseudo-randomness) — no driver-side data, so the same generator scales
    to any row count on a cluster; seeded → identical output for identical
    (seed, params) at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "it", "pt", "nl", "pl"]


def _unit(col: Column, seed: int) -> Column:
    """Deterministic pseudo-uniform in [0, 1) from any column."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1_000_000_000)) / 1e9)


def generate_webpages(
    spark: SparkSession,
    n_urls: int = 1_000,
    crawls_per_url: int = 20,
    start: str = "2023-01-01",
    days: int = 60,
    n_domains: int | None = None,
    zipf_exponent: float = 3.0,
    gap_rate: float = 0.15,
    seed: int = 42,
) -> DataFrame:
    """``n_urls × crawls_per_url`` candidate crawl events, ~``gap_rate``
    dropped to create gaps. ``zipf_exponent`` > 1 concentrates urls on few
    domains (hot-domain skew: domain 0 holds ~``1-0.5^(1/ζ)`` of urls)."""
    n_domains = n_domains or max(n_urls // 50, 1)
    n_rows = n_urls * crawls_per_url
    base = spark.range(n_rows).select(
        (F.col("id") % n_urls).alias("url_id"),
        (F.col("id") / n_urls).cast("long").alias("crawl_k"),
    )

    # Zipf-ish domain: u^ζ pushes mass toward 0 → domain 0 is hot
    u_dom = _unit(F.col("url_id"), seed)
    domain_id = F.floor(F.pow(u_dom, F.lit(zipf_exponent)) * n_domains).cast("long")
    url = F.concat(
        F.lit("https://site-"),
        domain_id.cast("string"),
        F.lit(".example.com/page/"),
        F.col("url_id").cast("string"),
    )

    # irregular per-(url, crawl) timestamp inside the window
    u_ts = _unit(F.concat(F.col("url_id"), F.lit(":"), F.col("crawl_k")), seed + 1)
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.to_timestamp(F.lit(start)))
        + (u_ts * days * 86400).cast("long")
    )

    # text: pure function of url (byte-identical per url — the invariant);
    # length varies by url so length(text) is a meaningful value stream
    filler_n = (F.pmod(F.xxhash64(F.col("url_id"), F.lit(seed + 2)), F.lit(40)) + 1).cast("int")
    text = F.concat(
        F.lit("Extracted text of "),
        url,
        F.lit(" :: "),
        F.repeat(
            F.concat(F.lit("token"), F.pmod(F.col("url_id"), F.lit(97)).cast("string"), F.lit(" ")),
            filler_n,
        ),
    )
    html = F.to_binary(
        F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), F.lit("utf-8")
    )
    lang_arr = F.array(*[F.lit(x) for x in LANGS])
    lang = F.element_at(lang_arr, (F.pmod(F.xxhash64(F.col("url_id"), F.lit(seed + 3)), F.lit(len(LANGS))) + 1).cast("int"))

    # gap injection: deterministically drop ~gap_rate of crawl events
    keep = _unit(F.concat(F.col("url_id"), F.lit("#"), F.col("crawl_k")), seed + 4) >= gap_rate

    return (
        base.filter(keep)
        .select(
            url.alias("url"),
            warc_ts.alias("warc_ts"),
            html.alias("html"),
            text.alias("text"),
            lang.alias("lang"),
        )
    )
