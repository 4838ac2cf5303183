"""Bucketed tier tables: co-located joins/rollups ACROSS jobs.

Within one job the tier chain reuses its single url repartition
(plan-pinned in tests/test_plans.py). Across jobs that partitioning is
lost — a fresh session reading the tier parquet back must re-shuffle
before any url-keyed join or rollup. Hash-bucketing the saved tables
by url (``DataFrameWriter.bucketBy`` — the warehouse analogue of
Iceberg's ``bucket(N, url)`` partition transform named in the north
star) persists the co-location: two tables bucketed by the same key
into the same bucket count join with NO Exchange on either side, and
a url groupBy over one bucketed table aggregates without a shuffle.

At 10^12 rows this is the difference between re-shuffling 100 TB on
every downstream consumer and never shuffling the tier store at all:
url-keyed as-of joins between tiers, tier→coarser-tier rollups run by
later jobs, and per-url history reads all ride the bucket layout.
``sortBy(url, bucket_start)`` additionally lets sort-merge joins skip
their sorts and keeps per-url history contiguous for the Gorilla
codec's sequential access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key_col: str = "url",
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) table.

    ``n_buckets`` must match across every table that should co-locate
    (Spark only elides the exchange when bucket counts are equal —
    pick one per key domain, e.g. 4096 for a 100-TB url space, and
    keep it in the store's metadata)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, key_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (a plain
    ``spark.read.parquet`` of the same files would lose it)."""
    return spark.table(table)
