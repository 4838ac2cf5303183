"""Tests for holiday signature, selector DSL, frame utils, fourier."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pytimetk_spark import (
    augment_fourier,
    augment_holiday_signature,
    ceil_date,
    contains,
    drop_zero_variance,
    ends_with,
    floor_date,
    is_holiday,
    matches,
    normalize_freq,
    parse_freq,
    parse_human_duration,
    resolve_columns,
    starts_with,
    transform_columns,
)


def test_selector_dsl():
    cols = ["date", "value_a", "value_b", "other"]
    assert resolve_columns(cols, None) == cols
    assert resolve_columns(cols, "value_a") == ["value_a"]
    assert resolve_columns(cols, ["value_a", "other"]) == ["value_a", "other"]
    assert resolve_columns(cols, contains("value")) == ["value_a", "value_b"]
    assert resolve_columns(cols, starts_with("val")) == ["value_a", "value_b"]
    assert resolve_columns(cols, ends_with("_b")) == ["value_b"]
    assert resolve_columns(cols, matches("^v.*_a$")) == ["value_a"]
    with pytest.raises(KeyError):
        resolve_columns(cols, "nope")


def test_freq_parsing_and_normalization():
    assert parse_freq("15min").seconds == 900
    assert parse_freq("2h").seconds == 7200
    assert parse_freq("7D").seconds == 7 * 86400
    assert parse_freq("M").label_end and parse_freq("M").months == 1
    assert not parse_freq("MS").label_end
    assert parse_freq("Q").months == 3 and parse_freq("YS").months == 12
    assert parse_freq("W-MON").week_anchor == 2
    assert normalize_freq("H") == "h"
    assert normalize_freq("T") == "min"
    assert normalize_freq("M") == "ME"
    assert normalize_freq("2M") == "2ME"
    assert parse_human_duration("3 days").seconds == 3 * 86400
    assert parse_human_duration("2 hours").seconds == 7200
    assert parse_human_duration("3 months").months == 3
    with pytest.raises(ValueError):
        parse_human_duration("1.5 months")


def test_floor_ceil_parity_with_pandas(spark):
    dates = pd.date_range("2021-02-15 03:17:23", periods=300, freq="11h")
    pdf = pd.DataFrame({"ts": dates})
    sdf = spark.createDataFrame(pdf)
    cases = {
        "h": dates.floor("h"),
        "D": dates.floor("D"),
        "7D": dates.floor("7D"),
        "MS": dates.to_period("M").to_timestamp(),
        "QS": dates.to_period("Q").to_timestamp(),
        "YS": dates.to_period("Y").to_timestamp(),
        "W": dates.to_period("W").start_time,
    }
    for freq, expected in cases.items():
        got = (
            sdf.select(floor_date(F.col("ts"), freq).alias("f"))
            .toPandas()["f"]
        )
        np.testing.assert_array_equal(got.values, expected.values, err_msg=freq)
    # ceil = floor + 1 period
    got = sdf.select(ceil_date(F.col("ts"), "D").alias("c")).toPandas()["c"]
    np.testing.assert_array_equal(got.values, (dates.floor("D") + pd.Timedelta(days=1)).values)


def test_holiday_signature(spark):
    pdf = pd.DataFrame(
        {"date": pd.to_datetime(["2024-07-03", "2024-07-04", "2024-07-05", "2024-03-12"])}
    )
    out = (
        augment_holiday_signature(spark.createDataFrame(pdf), "date")
        .toPandas()
        .sort_values("date")
        .reset_index(drop=True)
    )
    # sorted order: 03-12, 07-03, 07-04, 07-05
    assert out["is_holiday"].tolist() == [0, 0, 1, 0]
    assert out["before_holiday"].tolist() == [0, 1, 0, 0]
    assert out["after_holiday"].tolist() == [0, 0, 0, 1]
    assert out.loc[2, "holiday_name"] == "Independence Day"

    flags = is_holiday(spark.createDataFrame(pdf), "date").toPandas().sort_values("date")
    assert flags["is_holiday"].tolist() == [False, False, True, False]


def test_fourier(spark):
    pdf = pd.DataFrame(
        {
            "date": pd.date_range("2020-01-01", periods=50, freq="D"),
            "value": np.arange(50.0),
        }
    )
    out = (
        augment_fourier(spark.createDataFrame(pdf), "date", periods=7, max_order=2)
        .toPandas()
        .sort_values("date")
        .reset_index(drop=True)
    )
    # t = (ts - min)/median_diff = 0,1,2,...; angle = 2πk t/7
    t = np.arange(50.0)
    for k in (1, 2):
        np.testing.assert_allclose(
            out[f"date_sin_{k}_7"], np.sin(2 * math.pi * k * t / 7), atol=1e-9
        )
        np.testing.assert_allclose(
            out[f"date_cos_{k}_7"], np.cos(2 * math.pi * k * t / 7), atol=1e-9
        )


def test_frame_utils(spark):
    pdf = pd.DataFrame(
        {"a": [1.0, 2.0, 3.0], "b": [5.0, 5.0, 5.0], "s": ["x", "y", "z"]}
    )
    sdf = spark.createDataFrame(pdf)
    out = drop_zero_variance(sdf)
    assert set(out.columns) == {"a", "s"}
    doubled = transform_columns(sdf, ["a"], lambda c: c * 2).toPandas()
    assert doubled["a"].tolist() == [2.0, 4.0, 6.0]
    assert doubled["b"].tolist() == [5.0, 5.0, 5.0]


def test_parse_human_duration_bare_seconds():
    from pytimetk_spark.functions.datetime import parse_human_duration

    assert parse_human_duration("3s").seconds == 3
    assert parse_human_duration("90 s").seconds == 90
    assert parse_human_duration("2 seconds").seconds == 2


def test_builtin_non_us_calendars_and_get_holiday_signature(spark):
    """Algorithmic DE/UK/FR/CA calendars (Easter computus) + the
    standalone get_holiday_signature calendar frame."""
    from pytimetk_spark.operators.signatures import _easter, holiday_dim
    from pytimetk_spark import get_holiday_signature
    import datetime as dt

    # known Easter dates (public record)
    assert _easter(2024) == dt.date(2024, 3, 31)
    assert _easter(2025) == dt.date(2025, 4, 20)
    assert _easter(2000) == dt.date(2000, 4, 23)

    de = {r["holiday_name"]: r["holiday_date"]
          for r in holiday_dim(spark, [2024], "DE").collect()}
    assert de["Karfreitag"] == dt.date(2024, 3, 29)
    assert de["Pfingstmontag"] == dt.date(2024, 5, 20)
    uk = {r["holiday_name"]: r["holiday_date"]
          for r in holiday_dim(spark, [2024], "UK").collect()}
    assert uk["Spring Bank Holiday"] == dt.date(2024, 5, 27)
    ca = {r["holiday_name"]: r["holiday_date"]
          for r in holiday_dim(spark, [2024], "CA").collect()}
    assert ca["Victoria Day"] == dt.date(2024, 5, 20)

    sig = get_holiday_signature(spark, "2024-12-20", "2024-12-31", "FR").toPandas()
    sig["d"] = pd.to_datetime(sig["date"]).dt.date
    xmas = sig[sig["d"] == dt.date(2024, 12, 25)].iloc[0]
    assert xmas["is_holiday"] == 1 and xmas["holiday_name"] == "Noël"
    eve = sig[sig["d"] == dt.date(2024, 12, 24)].iloc[0]
    assert eve["before_holiday"] == 1 and eve["is_holiday"] == 0

    with pytest.raises(NotImplementedError):
        holiday_dim(spark, [2024], "JP")
