"""Tier store: partitioned-parquet snapshots + per-partition checkpoint
manifests with lineage and throughput metrics, enabling resume.

North rule: "resumable from checkpoint with per-partition lineage +
metrics". In this sandbox the table format is partitioned parquet laid out
Iceberg-style (``tier=1h/bucket_date=YYYY-MM-DD/``); on a real cluster the
writes map 1:1 onto ``df.writeTo(catalog.table).overwritePartitions()``
with Iceberg snapshot ids replacing the manifest's ``snapshot_id``.

Checkpoint granularity = one source day (the natural Iceberg partition of
the raw table by ``days(warc_ts)``): each completed day writes a manifest
JSON carrying {input fingerprint, partition range, row counts, points/sec}.
``run_rollup`` skips days whose manifest exists and whose fingerprint
matches — a killed job resumes from the next unprocessed partition.
"""

from __future__ import annotations

import json
import shutil
import time
import uuid
from dataclasses import asdict, dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pytimetk_spark.rollup.tiers import (
    TIER_FREQS,
    rollup_raw_to_tier,
    rollup_tier_to_tier,
)


@dataclass
class PartitionManifest:
    snapshot_id: str
    tier: str
    partition: str  # source day YYYY-MM-DD
    input_fingerprint: str
    input_rows: int
    output_rows: int
    elapsed_sec: float
    points_per_sec: float
    written_at: float


class TierStore:
    """Directory layout:
    base/
      tier=1h/bucket_date=.../part-*.parquet
      _manifests/{tier}/{partition}.json
    """

    def __init__(self, base_dir: str):
        self.base = Path(base_dir)
        (self.base / "_manifests").mkdir(parents=True, exist_ok=True)

    def tier_path(self, tier: str) -> str:
        return str(self.base / f"tier={tier}")

    def manifest_path(self, tier: str, partition: str) -> Path:
        d = self.base / "_manifests" / tier
        d.mkdir(parents=True, exist_ok=True)
        return d / f"{partition}.json"

    def read_manifest(self, tier: str, partition: str) -> PartitionManifest | None:
        p = self.manifest_path(tier, partition)
        if not p.exists():
            return None
        return PartitionManifest(**json.loads(p.read_text()))

    def write_manifest(self, m: PartitionManifest) -> None:
        self.manifest_path(m.tier, m.partition).write_text(json.dumps(asdict(m)))

    def manifests(self, tier: str) -> list[PartitionManifest]:
        d = self.base / "_manifests" / tier
        if not d.exists():
            return []
        return [
            PartitionManifest(**json.loads(p.read_text()))
            for p in sorted(d.glob("*.json"))
        ]

    def completed_partitions(self, tier: str) -> set[str]:
        return {m.partition for m in self.manifests(tier)}

    def drop_partition_dir(self, tier: str, bucket_date: str) -> bool:
        p = Path(self.tier_path(tier)) / f"bucket_date={bucket_date}"
        if p.exists():
            shutil.rmtree(p)
            return True
        return False

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.read.parquet(self.tier_path(tier))


def _fingerprint(df: DataFrame, day: str) -> tuple[str, int]:
    """Cheap deterministic lineage fingerprint of one source partition:
    row count + xor of row hashes (one aggregate, no collect of data)."""
    row = df.select(F.xxhash64(*df.columns).alias("__h__")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(__h__)").alias("h"),  # order-independent, no overflow
    ).first()
    return f"{day}:{row['n']}:{row['h']}", int(row["n"])


def run_rollup(
    spark: SparkSession,
    source: DataFrame,
    store: TierStore,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    value_col=None,
    tiers: tuple[str, ...] = ("1h", "1d", "7d"),
    salt_partials: int | None = None,
    resume: bool = True,
) -> list[PartitionManifest]:
    """Process the source day-by-day (the raw table's partition grain):
    1h from raw per day; then rebuild 1d/7d FROM the 1h tier (cheap —
    tier cardinality, and exact because stats re-aggregate).

    Returns the manifests written this run (empty entries skipped via
    resume are not re-listed).
    """
    if value_col is None:
        value_col = F.length("text")

    days = [
        r["d"]
        for r in source.select(F.to_date(ts_col).alias("d")).distinct().orderBy("d").collect()
    ]
    written: list[PartitionManifest] = []
    fine = tiers[0]
    for day in days:
        day_str = str(day)
        if resume:
            existing = store.read_manifest(fine, day_str)
        else:
            existing = None
        day_df = source.filter(F.to_date(ts_col) == F.lit(day)).cache()
        fingerprint, n_rows = _fingerprint(day_df, day_str)
        if existing and existing.input_fingerprint == fingerprint:
            day_df.unpersist()
            continue  # already rolled up, inputs unchanged → resume skips
        t0 = time.time()
        tier_df = rollup_raw_to_tier(
            day_df, url_col, ts_col, value_col, TIER_FREQS[fine], salt_partials
        ).withColumn("bucket_date", F.to_date("bucket_ts"))
        tier_df.write.mode("overwrite").partitionBy("bucket_date").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(store.tier_path(fine))
        out_rows = spark.read.parquet(store.tier_path(fine)).filter(
            F.to_date("bucket_ts") == F.lit(day)
        ).count()
        elapsed = time.time() - t0
        m = PartitionManifest(
            snapshot_id=uuid.uuid4().hex,
            tier=fine,
            partition=day_str,
            input_fingerprint=fingerprint,
            input_rows=n_rows,
            output_rows=out_rows,
            elapsed_sec=elapsed,
            points_per_sec=(out_rows / elapsed) if elapsed > 0 else 0.0,
            written_at=time.time(),
        )
        store.write_manifest(m)
        written.append(m)
        day_df.unpersist()

    # coarser tiers: rebuild from the tier below (full rewrite — tier
    # cardinality is tiny relative to raw; incremental per-partition
    # rewrite would mirror the same manifest pattern)
    prev = fine
    for tier in tiers[1:]:
        t0 = time.time()
        below = store.read_tier(spark, prev).drop("bucket_date")
        coarse = rollup_tier_to_tier(below, TIER_FREQS[tier]).withColumn(
            "bucket_date", F.to_date("bucket_ts")
        )
        coarse.write.mode("overwrite").partitionBy("bucket_date").parquet(
            store.tier_path(tier)
        )
        out_rows = spark.read.parquet(store.tier_path(tier)).count()
        elapsed = time.time() - t0
        m = PartitionManifest(
            snapshot_id=uuid.uuid4().hex,
            tier=tier,
            partition="__full__",
            input_fingerprint=f"tier:{prev}",
            input_rows=-1,
            output_rows=out_rows,
            elapsed_sec=elapsed,
            points_per_sec=(out_rows / elapsed) if elapsed > 0 else 0.0,
            written_at=time.time(),
        )
        store.write_manifest(m)
        written.append(m)
        prev = tier
    return written
