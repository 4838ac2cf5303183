"""Datetime signature features, Fourier features, holiday signature.

Reference: /root/reference/src/pytimetk/feature_engineering/
timeseries_signature.py:312-379 (29 features; quirks replicated exactly:
``index_num`` = epoch seconds, ``weekend`` = 1 only for Sunday
(np.where(dayofweek <= 5, 0, 1) on Mon=0 dayofweek), ``am_pm`` = "am" for
hour <= 12, ``mweek`` = (day-1)//7+1), fourier.py:188-274, and
holiday_signature.py:33-81,273-303.

Spark: every signature feature is a native Catalyst expression — a pure
projection, no shuffle, fully codegen'd; safe to fuse into any scan.
Fourier needs one per-group aggregate (min ts + median diff) joined back;
holidays broadcast-join a generated dim table.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pytimetk_spark.functions.windows import ordered_window

from pytimetk_spark.functions.datetime import week_of_month


_MONTH_LBL = ["January", "February", "March", "April", "May", "June",
              "July", "August", "September", "October", "November",
              "December"]
_WDAY_LBL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]


def signature_exprs(date_column: str) -> dict[str, Column]:
    ts = F.col(date_column)
    name = date_column
    epoch = ts.cast("timestamp").cast("long")
    wday = F.expr(f"weekday({name})") + 1  # Mon=1 .. Sun=7
    leap = (F.year(ts) % 4 == 0) & (
        (F.year(ts) % 100 != 0) | (F.year(ts) % 400 == 0)
    )
    # quarter-boundary features via month/day arithmetic (r7): the
    # date_trunc('quarter') + last_day(add_months(...)) + datediff
    # formulations rebuilt calendar dates per row; these are the same
    # values from fields the projection already computes (month, day,
    # dayofyear, quarter, leapyear — subexpression elimination shares
    # them), byte-identical across the full proleptic range (A/B'd on
    # 6M rows; oracle re-checked)
    q_end_day = F.element_at(
        F.array(F.lit(31), F.lit(30), F.lit(30), F.lit(31)), F.quarter(ts)
    )
    qday = (
        F.dayofyear(ts)
        - F.element_at(
            F.array(F.lit(0), F.lit(90), F.lit(181), F.lit(273)),
            F.quarter(ts),
        )
        - F.when(leap & (F.quarter(ts) >= 2), 1).otherwise(0)
    )
    return {
        f"{name}_index_num": epoch,
        f"{name}_year": F.year(ts),
        f"{name}_year_iso": F.expr(f"extract(YEAROFWEEK FROM {name})"),
        f"{name}_yearstart": ((F.month(ts) == 1) & (F.dayofmonth(ts) == 1)).cast("int"),
        f"{name}_yearend": ((F.month(ts) == 12) & (F.dayofmonth(ts) == 31)).cast("int"),
        f"{name}_leapyear": (
            (F.year(ts) % 4 == 0) & ((F.year(ts) % 100 != 0) | (F.year(ts) % 400 == 0))
        ).cast("int"),
        f"{name}_half": F.when(F.quarter(ts) <= 2, 1).otherwise(2),
        f"{name}_quarter": F.quarter(ts),
        f"{name}_quarteryear": F.concat(
            F.year(ts).cast("string"), F.lit("Q"), F.quarter(ts).cast("string")
        ),
        f"{name}_quarterstart": (
            (F.month(ts) % 3 == 1) & (F.dayofmonth(ts) == 1)
        ).cast("int"),
        f"{name}_quarterend": (
            (F.month(ts) % 3 == 0) & (F.dayofmonth(ts) == q_end_day)
        ).cast("int"),
        f"{name}_month": F.month(ts),
        # literal-array lookup instead of date_format("MMMM"): the
        # SimpleDateFormat path is locale-machinery per row — element_at
        # over 12 literals is ~2.3× faster and byte-identical in the
        # en-US names the reference emits (r7; A/B'd on 6M rows)
        f"{name}_month_lbl": F.element_at(
            F.array(*[F.lit(m) for m in _MONTH_LBL]), F.month(ts)
        ),
        f"{name}_monthstart": (F.dayofmonth(ts) == 1).cast("int"),
        f"{name}_monthend": (ts.cast("date") == F.last_day(ts)).cast("int"),
        f"{name}_yweek": F.weekofyear(ts),
        f"{name}_mweek": week_of_month(ts),
        f"{name}_wday": wday,
        f"{name}_wday_lbl": F.element_at(
            F.array(*[F.lit(d) for d in _WDAY_LBL]), wday
        ),
        f"{name}_mday": F.dayofmonth(ts),
        f"{name}_qday": qday,
        f"{name}_yday": F.dayofyear(ts),
        # reference quirk: weekend==1 ONLY for Sunday (dayofweek<=5 → 0)
        f"{name}_weekend": (wday == 7).cast("int"),
        f"{name}_hour": F.hour(ts),
        f"{name}_minute": F.minute(ts),
        f"{name}_second": F.second(ts).cast("int"),
        # integer path (reference emits dt.microsecond in 0..999999): the
        # double round-trip loses exact microseconds at current-era epochs
        # and Spark's % keeps the dividend's sign for pre-1970 timestamps
        f"{name}_msecond": F.pmod(
            F.unix_micros(ts.cast("timestamp")), F.lit(1_000_000)
        ),
        # Spark timestamps are μs precision; ns field is always 0 (documented
        # deviation — SURVEY.md §7 risk register)
        f"{name}_nsecond": F.lit(0),
        # reference quirk: "am" for hour <= 12
        f"{name}_am_pm": F.when(F.hour(ts) <= 12, "am").otherwise("pm"),
    }


def augment_timeseries_signature(df: DataFrame, date_column: str) -> DataFrame:
    """Input + 29 signature columns (pure projection)."""
    exprs = signature_exprs(date_column)
    return df.select("*", *[c.alias(n) for n, c in exprs.items()])


def get_timeseries_signature(df: DataFrame, date_column: str) -> DataFrame:
    """Just the date column + its 29 features."""
    exprs = signature_exprs(date_column)
    return df.select(date_column, *[c.alias(n) for n, c in exprs.items()])


# ---------------------------------------------------------------------------
# Fourier


def augment_fourier(
    df: DataFrame,
    date_column: str,
    periods: int | Sequence[int] = 1,
    max_order: int = 1,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``{date}_{sin|cos}_{K}_{period}`` — angle = 2πK·t/period where
    t = (ts − min ts) / median diff seconds per group (reference
    fourier.py:188-190,253-266).

    Spark: per-group min + exact median diff via one window+aggregate pass,
    broadcast-joined back (group-cardinality rows), then native trig."""
    import math

    group_cols = list(group_cols or [])
    periods = [periods] if isinstance(periods, int) else list(periods)
    ts_sec = F.col(date_column).cast("timestamp").cast("double")
    w = ordered_window(group_cols, date_column, "augment_fourier")
    diffs = df.withColumn("__diff__", ts_sec - F.lag(ts_sec).over(w))
    stats = (
        diffs.groupBy(*group_cols) if group_cols else diffs.groupBy(F.lit(1).alias("__g__"))
    ).agg(
        F.min(F.col(date_column).cast("timestamp").cast("double")).alias("__min_ts__"),
        F.expr("percentile(__diff__, 0.5)").alias("__med_diff__"),
    )
    if group_cols:
        work = df.join(F.broadcast(stats), on=group_cols, how="left")
    else:
        work = df.crossJoin(F.broadcast(stats.drop("__g__")))
    t = (ts_sec - F.col("__min_ts__")) / F.col("__med_diff__")
    out = work
    for p in periods:
        for k in range(1, max_order + 1):
            angle = 2 * math.pi * k * t / p
            out = out.withColumn(f"{date_column}_sin_{k}_{p}", F.sin(angle))
            out = out.withColumn(f"{date_column}_cos_{k}_{p}", F.cos(angle))
    return out.drop("__min_ts__", "__med_diff__")


# ---------------------------------------------------------------------------
# Holidays (the `holidays` package is unavailable in this environment; a
# built-in algorithmic US-federal calendar stands in — same join shape)


def _us_federal_holidays(year: int) -> list[tuple[_dt.date, str]]:
    """Deterministic US federal holiday calendar (public OPM rules)."""

    def nth_weekday(year, month, weekday, n):
        d = _dt.date(year, month, 1)
        offset = (weekday - d.weekday()) % 7
        return d + _dt.timedelta(days=offset + 7 * (n - 1))

    def last_weekday(year, month, weekday):
        if month == 12:
            d = _dt.date(year, 12, 31)
        else:
            d = _dt.date(year, month + 1, 1) - _dt.timedelta(days=1)
        return d - _dt.timedelta(days=(d.weekday() - weekday) % 7)

    return [
        (_dt.date(year, 1, 1), "New Year's Day"),
        (nth_weekday(year, 1, 0, 3), "Martin Luther King Jr. Day"),
        (nth_weekday(year, 2, 0, 3), "Washington's Birthday"),
        (last_weekday(year, 5, 0), "Memorial Day"),
        (_dt.date(year, 6, 19), "Juneteenth National Independence Day"),
        (_dt.date(year, 7, 4), "Independence Day"),
        (nth_weekday(year, 9, 0, 1), "Labor Day"),
        (nth_weekday(year, 10, 0, 2), "Columbus Day"),
        (_dt.date(year, 11, 11), "Veterans Day"),
        (nth_weekday(year, 11, 3, 4), "Thanksgiving"),
        (_dt.date(year, 12, 25), "Christmas Day"),
    ]


def _easter(year: int) -> _dt.date:
    """Gregorian Easter Sunday — Anonymous Gregorian (Meeus/Jones/Butcher)
    computus, public algorithm."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    g = (8 * b + 13) // 25
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * l) // 451
    month, day = divmod(h + l - 7 * m + 114, 31)
    return _dt.date(year, month, day + 1)


def _nth_weekday(year, month, weekday, n):
    d = _dt.date(year, month, 1)
    offset = (weekday - d.weekday()) % 7
    return d + _dt.timedelta(days=offset + 7 * (n - 1))


def _last_weekday(year, month, weekday):
    if month == 12:
        d = _dt.date(year, 12, 31)
    else:
        d = _dt.date(year, month + 1, 1) - _dt.timedelta(days=1)
    return d - _dt.timedelta(days=(d.weekday() - weekday) % 7)


def _de_holidays(year):
    e = _easter(year)
    td = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "Neujahr"),
        (e - td(days=2), "Karfreitag"),
        (e + td(days=1), "Ostermontag"),
        (_dt.date(year, 5, 1), "Erster Mai"),
        (e + td(days=39), "Christi Himmelfahrt"),
        (e + td(days=50), "Pfingstmontag"),
        (_dt.date(year, 10, 3), "Tag der Deutschen Einheit"),
        (_dt.date(year, 12, 25), "Erster Weihnachtstag"),
        (_dt.date(year, 12, 26), "Zweiter Weihnachtstag"),
    ]


def _uk_holidays(year):
    e = _easter(year)
    td = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "New Year's Day"),
        (e - td(days=2), "Good Friday"),
        (e + td(days=1), "Easter Monday"),
        (_nth_weekday(year, 5, 0, 1), "May Day"),
        (_last_weekday(year, 5, 0), "Spring Bank Holiday"),
        (_last_weekday(year, 8, 0), "Summer Bank Holiday"),
        (_dt.date(year, 12, 25), "Christmas Day"),
        (_dt.date(year, 12, 26), "Boxing Day"),
    ]


def _fr_holidays(year):
    e = _easter(year)
    td = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "Jour de l'an"),
        (e + td(days=1), "Lundi de Pâques"),
        (_dt.date(year, 5, 1), "Fête du Travail"),
        (_dt.date(year, 5, 8), "Victoire 1945"),
        (e + td(days=39), "Ascension"),
        (e + td(days=50), "Lundi de Pentecôte"),
        (_dt.date(year, 7, 14), "Fête nationale"),
        (_dt.date(year, 8, 15), "Assomption"),
        (_dt.date(year, 11, 1), "Toussaint"),
        (_dt.date(year, 11, 11), "Armistice 1918"),
        (_dt.date(year, 12, 25), "Noël"),
    ]


def _ca_holidays(year):
    e = _easter(year)
    td = _dt.timedelta
    # Victoria Day: the Monday preceding May 25
    vd = _dt.date(year, 5, 24)
    vd -= td(days=(vd.weekday() - 0) % 7)
    return [
        (_dt.date(year, 1, 1), "New Year's Day"),
        (e - td(days=2), "Good Friday"),
        (vd, "Victoria Day"),
        (_dt.date(year, 7, 1), "Canada Day"),
        (_nth_weekday(year, 9, 0, 1), "Labour Day"),
        (_nth_weekday(year, 10, 0, 2), "Thanksgiving"),
        (_dt.date(year, 12, 25), "Christmas Day"),
        (_dt.date(year, 12, 26), "Boxing Day"),
    ]


_BUILTIN_CALENDARS = {
    "US": _us_federal_holidays,
    "DE": _de_holidays,
    "UK": _uk_holidays,
    "GB": _uk_holidays,
    "FR": _fr_holidays,
    "CA": _ca_holidays,
}


def holiday_dim(spark, years: Sequence[int], country: str = "US") -> DataFrame:
    """Holiday dimension (date, name). Built-in algorithmic calendars for
    US/DE/UK/FR/CA (fixed dates + Easter computus + nth-weekday rules;
    weekend-observance shifts are NOT applied — the `holidays` package is
    used instead when installed); other countries require `holidays`."""
    cc = country.upper()
    try:
        import holidays as _hol  # optional dependency — richer calendars

        rows = [
            (d, n)
            for y in years
            for d, n in sorted(_hol.country_holidays(cc, years=y).items())
        ]
    except ImportError:
        builder = _BUILTIN_CALENDARS.get(cc)
        if builder is None:
            raise NotImplementedError(
                f"country {country!r} needs the `holidays` package; built-in "
                f"algorithmic calendars: {sorted(set(_BUILTIN_CALENDARS))}"
            ) from None
        rows = [(d, n) for y in years for d, n in builder(y)]
    return spark.createDataFrame(rows, "holiday_date date, holiday_name string")


def is_holiday(
    df: DataFrame, date_column: str, country: str = "US"
) -> DataFrame:
    """Boolean ``is_holiday`` column (reference datetime_helpers
    is_holiday) — broadcast join against the generated holiday dim."""
    out = augment_holiday_signature(df, date_column, country)
    keep = [c for c in df.columns] + ["is_holiday"]
    return out.select(*keep).withColumn(
        "is_holiday", F.col("is_holiday").cast("boolean")
    )


def get_holiday_signature(
    spark,
    start_date,
    end_date,
    country: str = "US",
    freq: str = "D",
) -> DataFrame:
    """Standalone calendar frame (reference holiday_signature.py:273-303
    ``get_holiday_signature``): one row per date in [start, end] with
    ``is_holiday, before_holiday, after_holiday, holiday_name`` — built by
    generating the date sequence and running the same broadcast-join
    signature as the augment variant."""
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(str(start_date))),
                F.to_timestamp(F.lit(str(end_date))),
                F.expr(f"interval 1 {'day' if freq.upper() == 'D' else 'hour'}"),
            )
        ).alias("date")
    )
    return augment_holiday_signature(cal, "date", country)


def augment_holiday_signature(
    df: DataFrame,
    date_column: str,
    country: str = "US",
) -> DataFrame:
    """``is_holiday, before_holiday, after_holiday, holiday_name`` via a
    broadcast join against the generated holiday dim (reference
    holiday_signature.py:273-303; before/after = ±1-day shifts of
    is_holiday, computed here by joining the dim at date±1)."""
    spark = df.sparkSession
    bounds = df.agg(
        F.min(F.year(date_column)).alias("lo"), F.max(F.year(date_column)).alias("hi")
    ).first()
    years = list(range(int(bounds["lo"]) - 1, int(bounds["hi"]) + 2))
    dim = holiday_dim(spark, years, country)

    d = F.col(date_column).cast("date")
    joined = (
        df.withColumn("__d__", d)
        .join(
            F.broadcast(dim.withColumnRenamed("holiday_date", "__d__")),
            on="__d__",
            how="left",
        )
        .withColumn("is_holiday", F.col("holiday_name").isNotNull().cast("int"))
    )
    dim_next = dim.select((F.date_add("holiday_date", -1)).alias("__d__"))
    dim_prev = dim.select((F.date_add("holiday_date", 1)).alias("__d__"))
    joined = (
        joined.join(
            F.broadcast(dim_next.withColumn("before_holiday", F.lit(1))).dropDuplicates(),
            on="__d__",
            how="left",
        )
        .join(
            F.broadcast(dim_prev.withColumn("after_holiday", F.lit(1))).dropDuplicates(),
            on="__d__",
            how="left",
        )
        .fillna(0, subset=["before_holiday", "after_holiday"])
        .drop("__d__")
    )
    return joined
