"""HTML -> text extraction, pure Catalyst (JVM regex, zero Python).

The first step of every crawl pipeline: strip markup from raw page
bytes to get the text the quality/dedup/tokenize operators consume.
trafilatura-class DOM heuristics need an HTML parser; this is the
regex tier every large pipeline also ships (and what the synthetic
webpages source pairs with its ground-truth ``text`` column): drop
script/style/noscript/template subtrees and comments, convert
block-level closers to newlines, strip remaining tags, decode the
common entities, collapse whitespace.

All steps are chained ``regexp_replace`` on one column — Catalyst fuses
them into a single projection, so the cost is a handful of regex passes
per document inside whole-stage codegen, safe to fuse into a 100-TB
scan. (Numeric character references beyond the common named entities
would need a per-match callback — documented gap, they are rare in
body text.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_CLOSERS = (
    r"(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol|"
    r"/blockquote|/section|/article|/header|/footer|/pre)>"
)

_ENTITIES = [
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&#34;", '"'),
    ("&mdash;", "—"), ("&ndash;", "–"), ("&hellip;", "…"),
]


def _html_to_text(col: Column) -> Column:
    s = col
    # non-content subtrees first (their text must not leak)
    s = F.regexp_replace(s, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")
    s = F.regexp_replace(
        s, r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>", " "
    )
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, _BLOCK_CLOSERS, "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"[ \t\r\f\x0b]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text_extracted",
    title_col: str | None = "title",
) -> DataFrame:
    """Add ``out_col`` (extracted body text) and optionally
    ``title_col`` (first <title> content) from an HTML column that may
    be ``binary`` (decoded as UTF-8) or ``string``."""
    raw = F.col(html_col)
    dtype = dict(df.dtypes).get(html_col, "string")
    if dtype == "binary":
        raw = raw.cast("string")  # Spark renders binary as UTF-8 string
    out = df.withColumn(out_col, _html_to_text(raw))
    if title_col:
        out = out.withColumn(
            title_col,
            F.trim(F.regexp_extract(raw, r"(?is)<title[^>]*>(.*?)</title>", 1)),
        )
    return out
