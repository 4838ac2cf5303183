"""Retention policy — tiered snapshot expiry by bucket-date cutoff.

North rule: "tiered Iceberg snapshots governed by retention policy".
Parquet layout: dropping a partition directory == Iceberg
``DELETE WHERE bucket_date < cutoff`` + ``expire_snapshots``; the manifest
record of the drop is the audit trail.
"""

from __future__ import annotations

import datetime as _dt
import json
import time
from pathlib import Path

from pytimetk_spark.rollup.store import TierStore


DEFAULT_POLICY = {
    # keep raw-resolution history short, coarse history long (classic
    # downsample-and-expire): tier → keep window in days
    "1h": 30,
    "1d": 365,
    "7d": 3650,
}


def apply_retention(
    store: TierStore,
    policy: dict[str, int] | None = None,
    now: _dt.date | None = None,
) -> dict[str, list[str]]:
    """Drop tier partitions older than each tier's keep window. Returns
    {tier: [dropped bucket_dates]} and records the expiry in
    ``_manifests/_retention.log`` (one JSON line per action)."""
    policy = dict(policy or DEFAULT_POLICY)
    now = now or _dt.date.today()
    dropped: dict[str, list[str]] = {}
    log_path = Path(store.base) / "_manifests" / "_retention.log"
    with open(log_path, "a") as log:
        for tier, keep_days in policy.items():
            cutoff = now - _dt.timedelta(days=keep_days)
            tier_dir = Path(store.tier_path(tier))
            if not tier_dir.exists():
                continue
            for part in sorted(tier_dir.glob("bucket_date=*")):
                date_str = part.name.split("=", 1)[1]
                try:
                    d = _dt.date.fromisoformat(date_str)
                except ValueError:
                    continue
                if d < cutoff:
                    store.drop_partition_dir(tier, date_str)
                    dropped.setdefault(tier, []).append(date_str)
                    log.write(
                        json.dumps(
                            {
                                "action": "expire",
                                "tier": tier,
                                "bucket_date": date_str,
                                "cutoff": str(cutoff),
                                "at": time.time(),
                            }
                        )
                        + "\n"
                    )
    return dropped
