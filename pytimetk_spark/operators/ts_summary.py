"""ts_summary — per-group date + diff + frequency summary.

Reference: /root/reference/src/pytimetk/core/ts_summary.py (_ts_summary
:204-219 concat of get_date_summary :492-540 and get_diff_summary :308-407).
Output columns: date_n, date_start, date_end, diff_{min,q25,median,mean,
q75,max}_seconds, freq_median_seconds/scale/unit. (`date_tz` is a session
constant in Spark — UTC — and is emitted as a literal.)

Spark plan: one window pass for consecutive diffs (shuffle on group key,
sort within partition) + one hash aggregate with exact percentiles. At
scale, `percentile` is exact per group; swap `percentile_approx` via
``approx=True`` for sketch-based quantiles when group cardinality is huge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pytimetk_spark.functions.windows import ordered_window


def ts_summary(
    df: DataFrame,
    date_column: str,
    group_cols: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    group_cols = list(group_cols or [])
    w = ordered_window(group_cols, date_column, "ts_summary")
    ts_sec = F.col(date_column).cast("timestamp").cast("double")
    work = df.withColumn("__diff_sec__", ts_sec - F.lag(ts_sec).over(w))

    def q(p: float):
        if approx:
            return F.percentile_approx("__diff_sec__", p)
        return F.expr(f"percentile(__diff_sec__, {p})")

    aggs = [
        F.count(date_column).alias("date_n"),
        F.count_distinct(date_column).alias("date_n_distinct"),
        F.lit("UTC").alias("date_tz"),
        F.min(date_column).alias("date_start"),
        F.max(date_column).alias("date_end"),
        F.min("__diff_sec__").alias("diff_min_seconds"),
        q(0.25).alias("diff_q25_seconds"),
        q(0.5).alias("diff_median_seconds"),
        F.avg("__diff_sec__").alias("diff_mean_seconds"),
        q(0.75).alias("diff_q75_seconds"),
        F.max("__diff_sec__").alias("diff_max_seconds"),
    ]
    out = work.groupBy(*group_cols).agg(*aggs) if group_cols else work.agg(*aggs)

    # frequency unit/scale from the median diff (same CASE chain as
    # operators/frequency.py — kept inline to avoid a second aggregation)
    from pytimetk_spark.operators.frequency import _scale_case_expr, _unit_case_expr

    sec = F.col("diff_median_seconds")
    unit, scale = _unit_case_expr(sec), _scale_case_expr(sec)
    remainder = scale - F.floor(scale)
    switch = unit.isin("M", "Q", "Y") & (remainder >= 0.1) & (remainder <= 0.9)
    out = out.withColumn(
        "freq_median_unit", F.when(switch, F.lit("D")).otherwise(unit)
    ).withColumn(
        "freq_median_scale",
        F.when(switch, F.floor(sec / 86400).cast("double")).otherwise(scale),
    )
    return out.orderBy(*group_cols) if group_cols else out
