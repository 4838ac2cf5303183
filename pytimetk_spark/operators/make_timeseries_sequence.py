"""Calendar sequence generators — weekday / weekend sequences.

Reference: /root/reference/src/pytimetk/core/make_timeseries_sequence.py:25-122
(weekdays Mon–Fri, or Sun–Thu for "Israel"-style weeks; weekends likewise).

Spark: ``sequence()`` + ``explode`` + a ``dayofweek`` filter — generated
column, nothing scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _date_seq(spark: SparkSession, start_date: str, end_date: str) -> DataFrame:
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start_date)),
                F.to_date(F.lit(end_date)),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )


def make_weekday_sequence(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    sunday_to_thursday: bool = False,
) -> DataFrame:
    """Mon–Fri (or Sun–Thu) calendar dates in [start, end]."""
    seq = _date_seq(spark, start_date, end_date)
    dow = F.dayofweek("date")  # 1=Sun..7=Sat
    cond = (
        dow.isin(1, 2, 3, 4, 5) if sunday_to_thursday else dow.isin(2, 3, 4, 5, 6)
    )
    return seq.filter(cond)


def make_weekend_sequence(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    friday_saturday: bool = False,
) -> DataFrame:
    """Sat–Sun (or Fri–Sat) calendar dates in [start, end]."""
    seq = _date_seq(spark, start_date, end_date)
    dow = F.dayofweek("date")
    cond = dow.isin(6, 7) if friday_saturday else dow.isin(7, 1)
    return seq.filter(cond)
