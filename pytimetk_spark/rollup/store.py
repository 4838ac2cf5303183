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

import datetime as _dt
import hashlib
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


def _day_fingerprints(source: DataFrame, ts_col: str) -> dict[str, tuple[str, int]]:
    """ONE scan over the source computes every day's lineage fingerprint
    (row count + order-independent xor of row hashes). Round-1 version
    rescanned the source once per day — O(days × table) on an
    unpartitioned source."""
    rows = (
        source.select(
            F.to_date(ts_col).alias("__d__"),
            F.xxhash64(*source.columns).alias("__h__"),
        )
        .groupBy("__d__")
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(__h__)").alias("h"))
        .collect()
    )
    return {
        str(r["__d__"]): (f"{r['__d__']}:{r['n']}:{r['h']}", int(r["n"]))
        for r in rows
    }


_EPOCH = _dt.date(1970, 1, 1)


def _coarse_date(d: _dt.date, freq: str) -> _dt.date:
    """Coarse-tier partition a below-tier partition date belongs to
    (epoch-aligned 7-day floor, same alignment as floor_date)."""
    if freq == "D":
        return d
    if freq == "7D":
        return d - _dt.timedelta(days=(d - _EPOCH).days % 7)
    raise ValueError(f"unsupported coarse tier freq: {freq}")


def _compose_fingerprint(prev_tier: str, ms: list[PartitionManifest]) -> str:
    """Deterministic lineage fingerprint of a coarse partition: digest of
    the below-tier manifests it aggregates. Fine-tier fingerprints encode
    (day, row count, content hash), so staleness propagates upward through
    every tier level."""
    payload = "|".join(
        f"{m.partition}={m.input_fingerprint}"
        for m in sorted(ms, key=lambda m: m.partition)
    )
    return f"tier:{prev_tier}:" + hashlib.sha256(payload.encode()).hexdigest()[:24]


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
    batch_days: int | None = None,
) -> list[PartitionManifest]:
    """Roll the source into the fine tier, then rebuild coarser tiers FROM
    the tier below (cheap — tier cardinality, and exact because stats
    re-aggregate).

    Scan discipline (round-2 rework): exactly TWO passes over the source
    regardless of day count — one grouped aggregate for all per-day
    fingerprints, one aggregation job covering every pending day (the
    day filter is a partition-pruning predicate when the raw table is
    laid out by ``days(warc_ts)``, the assumed Iceberg partitioning).
    ``batch_days`` restores finer checkpoint granularity: pending days are
    processed in chunks of that size (one job per chunk), trading extra
    scans for smaller redo units after a mid-batch failure. Per-day
    manifests are still written either way — a killed run resumes from
    whichever days lack a matching fingerprint.

    Returns the manifests written this run (entries skipped via resume are
    not re-listed).
    """
    if value_col is None:
        value_col = F.length("text")

    written: list[PartitionManifest] = []
    fine = tiers[0]
    day_info = _day_fingerprints(source, ts_col)
    pending = []
    for day in sorted(day_info):
        existing = store.read_manifest(fine, day) if resume else None
        if existing and existing.input_fingerprint == day_info[day][0]:
            continue  # already rolled up, inputs unchanged → resume skips
        pending.append(day)

    chunk = batch_days if batch_days else max(len(pending), 1)
    for i in range(0, len(pending), chunk):
        batch = pending[i : i + chunk]
        batch_dates = [_dt.date.fromisoformat(d) for d in batch]
        t0 = time.time()
        batch_df = source.filter(F.to_date(ts_col).isin(batch_dates))
        tier_df = rollup_raw_to_tier(
            batch_df, url_col, ts_col, value_col, TIER_FREQS[fine], salt_partials
        ).withColumn("bucket_date", F.to_date("bucket_ts"))
        tier_df.write.mode("overwrite").partitionBy("bucket_date").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(store.tier_path(fine))
        elapsed = time.time() - t0
        # per-day output rows from the written files (partition-pruned,
        # parquet count pushdown — metadata-cheap)
        out_counts = {
            str(r["bucket_date"]): r["cnt"]
            for r in spark.read.parquet(store.tier_path(fine))
            .filter(F.col("bucket_date").isin(batch_dates))
            .groupBy("bucket_date")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        total_out = sum(out_counts.values()) or 1
        now = time.time()
        for day in batch:
            out_rows = out_counts.get(day, 0)
            # amortized share of the batch job's wall-clock
            day_elapsed = elapsed * (out_rows / total_out)
            fingerprint, n_rows = day_info[day]
            m = PartitionManifest(
                snapshot_id=uuid.uuid4().hex,
                tier=fine,
                partition=day,
                input_fingerprint=fingerprint,
                input_rows=n_rows,
                output_rows=out_rows,
                elapsed_sec=day_elapsed,
                points_per_sec=(out_rows / day_elapsed) if day_elapsed > 0 else 0.0,
                written_at=now,
            )
            store.write_manifest(m)
            written.append(m)

    # coarser tiers: INCREMENTAL maintenance — only the coarse partitions
    # whose below-tier inputs changed are re-aggregated and
    # dynamic-partition-overwritten (the continuous-aggregate contract: a
    # late-arriving day reprocesses one 1d bucket and one 7d bucket, never
    # the whole tier). A fully-skipped resume run touches nothing.
    #
    # Resume reconciliation: `changed` from THIS run alone is not enough —
    # a run killed after the fine parquet+manifests but before the coarse
    # loop would leave coarse tiers permanently stale (the resumed run sees
    # all fine fingerprints matching and writes nothing). So each coarse
    # partition's manifest carries a fingerprint composed from the
    # below-tier manifests it aggregates; on resume, partitions whose
    # stored fingerprint is missing or differs from the expected one are
    # added to the work list.
    prev = fine
    changed: list[_dt.date] = [
        _dt.date.fromisoformat(m.partition) for m in written if m.tier == fine
    ]
    for tier in tiers[1:]:
        freq = TIER_FREQS[tier]
        below_manifests = store.manifests(prev)
        by_coarse: dict[_dt.date, list[PartitionManifest]] = {}
        for bm in below_manifests:
            cd = _coarse_date(_dt.date.fromisoformat(bm.partition), freq)
            by_coarse.setdefault(cd, []).append(bm)
        expected_fp = {
            cd: _compose_fingerprint(prev, ms) for cd, ms in by_coarse.items()
        }
        changed_set = {_coarse_date(d, freq) for d in changed}
        if resume:
            for cd, fp in expected_fp.items():
                ex = store.read_manifest(tier, str(cd))
                if ex is None or ex.input_fingerprint != fp:
                    changed_set.add(cd)
        coarse_dates = sorted(cd for cd in changed_set if cd in expected_fp)
        if not coarse_dates:
            prev = tier
            changed = []
            continue
        t0 = time.time()
        below = store.read_tier(spark, prev).drop("bucket_date")
        from pytimetk_spark.functions.datetime import floor_date

        coarse_key = F.to_date(floor_date(F.col("bucket_ts"), freq))
        slice_df = below.filter(coarse_key.isin(coarse_dates))
        coarse = rollup_tier_to_tier(slice_df, freq).withColumn(
            "bucket_date", F.to_date("bucket_ts")
        )
        coarse.write.mode("overwrite").partitionBy("bucket_date").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(store.tier_path(tier))
        elapsed = time.time() - t0
        out_counts = {
            str(r["bucket_date"]): r["cnt"]
            for r in spark.read.parquet(store.tier_path(tier))
            .filter(F.col("bucket_date").isin(coarse_dates))
            .groupBy("bucket_date")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        total_out = sum(out_counts.values()) or 1
        now = time.time()
        for cd in coarse_dates:
            out_rows = out_counts.get(str(cd), 0)
            day_elapsed = elapsed * (out_rows / total_out)
            m = PartitionManifest(
                snapshot_id=uuid.uuid4().hex,
                tier=tier,
                partition=str(cd),
                input_fingerprint=expected_fp[cd],
                input_rows=-1,
                output_rows=out_rows,
                elapsed_sec=day_elapsed,
                points_per_sec=(out_rows / day_elapsed) if day_elapsed > 0 else 0.0,
                written_at=now,
            )
            store.write_manifest(m)
            written.append(m)
        prev = tier
        changed = coarse_dates
    return written
