"""load_dataset — schema-compatible synthetic stand-ins for the reference's
bundled demo datasets.

Reference: get_datasets.py ships 13 real CSVs (m4_*, bike_*, taylor_30_min,
walmart_sales_weekly, wikipedia_traffic_daily, stocks_daily, expedia) via
importlib.resources. Redistributing that data is out of scope for this
engine, so `load_dataset(spark, name)` generates a DETERMINISTIC synthetic
table with the SAME schema, column names, id/panel structure and sampling
frequency — enough for every example/tutorial query shape (summarize,
pad, augment, anomalize per series) to run unchanged. Values are synthetic
(seeded trend + weekly/daily seasonality + noise), not the real series.

All generation is Spark-native (spark.range + column expressions): no
driver-side loops, scales to any n_ids × periods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SPECS = {
    # name: (id_prefix, n_ids, periods, interval_expr, start)
    "m4_hourly": ("H", 4, 700, "interval 1 hour", "2015-07-01 12:00:00"),
    "m4_daily": ("D", 4, 365, "interval 1 day", "2014-07-03"),
    "m4_weekly": ("W", 4, 260, "interval 7 day", "2012-01-01"),
    "m4_monthly": ("M", 4, 96, "interval 1 month", "2010-01-01"),
    "m4_quarterly": ("Q", 4, 40, "interval 3 month", "2005-01-01"),
    "m4_yearly": ("Y", 4, 30, "interval 12 month", "1990-01-01"),
    "taylor_30_min": (None, 1, 4032, "interval 30 minute", "2000-06-05"),
    "wikipedia_traffic_daily": ("page_", 6, 550, "interval 1 day", "2015-07-01"),
}


def dataset_names() -> list[str]:
    return sorted([*_SPECS, "bike_sales_sample", "stocks_daily",
                   "bike_sharing_daily", "walmart_sales_weekly"])


def _panel(
    spark: SparkSession, prefix: str | None, n_ids: int, periods: int,
    interval: str, start: str, id_col: str = "id", date_col: str = "date",
) -> DataFrame:
    base = spark.range(n_ids * periods).select(
        (F.col("id") % n_ids).alias("__i__"),
        (F.col("id") / n_ids).cast("long").alias("__t__"),
    )
    t = F.col("__t__")
    value = (
        1000.0
        + F.col("__i__") * 250.0
        + t * (0.8 + F.col("__i__") * 0.1)
        + 120.0 * F.sin(t * (6.283185307179586 / 7.0) + F.col("__i__"))
        + 60.0 * F.sin(t * (6.283185307179586 / 24.0))
        # deterministic noise: per-(i,t) hash folded to [-30, 30]
        + (F.pmod(F.xxhash64(F.col("__i__"), t), F.lit(6000)) - 3000) / 100.0
    )
    start_lit = f"{start} 00:00:00" if len(start) == 10 else start
    out = base.select(
        F.concat(F.lit(prefix or ""), (F.col("__i__") * 10 + 10)).alias(id_col),
        F.expr(f"timestamp '{start_lit}'").alias("__s__"),
        t.alias("__t__"),
        F.round(value, 1).alias("value"),
    ).select(
        id_col,
        F.expr(f"__s__ + {interval} * __t__").alias(date_col),
        "value",
    )
    if prefix is None:
        out = out.drop(id_col)
    return out


def load_dataset(spark: SparkSession, name: str = "m4_daily") -> DataFrame:
    """Schema-compatible deterministic synthetic dataset by name."""
    if name in _SPECS:
        prefix, n_ids, periods, interval, start = _SPECS[name]
        id_col = "Page" if name == "wikipedia_traffic_daily" else "id"
        return _panel(spark, prefix, n_ids, periods, interval, start,
                      id_col=id_col)
    if name == "stocks_daily":
        syms = ["META", "AMZN", "AAPL", "NFLX", "NVDA", "GOOG"]
        n, periods = len(syms), 500
        base = spark.range(n * periods).select(
            (F.col("id") % n).alias("__i__"),
            (F.col("id") / n).cast("long").alias("__t__"),
        )
        t, i = F.col("__t__"), F.col("__i__")
        close = F.round(
            50.0 + i * 40.0 + t * 0.05
            + 5.0 * F.sin(t / 9.0 + i)
            + (F.pmod(F.xxhash64(i, t), F.lit(400)) - 200) / 100.0, 2
        )
        sym = F.element_at(F.array(*[F.lit(s) for s in syms]), i.cast("int") + 1)
        return base.select(
            sym.alias("symbol"),
            F.expr("timestamp '2013-01-02 00:00:00' + interval 1 day * __t__")
            .alias("date"),
            F.round(close * 0.995, 2).alias("open"),
            F.round(close * 1.01, 2).alias("high"),
            F.round(close * 0.99, 2).alias("low"),
            close.alias("close"),
            (F.pmod(F.xxhash64(i, t, F.lit(7)), F.lit(10_000_000))
             + 1_000_000).alias("volume"),
            close.alias("adjusted"),
        )
    if name == "bike_sales_sample":
        models = ["Jekyll Carbon 2", "Trigger Carbon 2", "Beast of the East 1",
                  "CAAD12 Red", "Scalpel-Si Black"]
        cats = ["Mountain", "Road"]
        n = 2000
        base = spark.range(n)
        i = F.col("id")
        price = (F.pmod(F.xxhash64(i, F.lit(1)), F.lit(70)) * 100 + 500)
        qty = F.pmod(F.xxhash64(i, F.lit(2)), F.lit(3)) + 1
        return base.select(
            (i + 1).alias("order_id"),
            F.lit(1).alias("order_line"),
            F.expr(
                "timestamp '2011-01-07 00:00:00' + interval 1 day * (id % 720)"
            ).alias("order_date"),
            qty.alias("quantity"),
            price.alias("price"),
            (qty * price).alias("total_price"),
            F.element_at(F.array(*[F.lit(m) for m in models]),
                         F.pmod(i, F.lit(5)).cast("int") + 1).alias("model"),
            F.element_at(F.array(*[F.lit(c) for c in cats]),
                         F.pmod(i, F.lit(2)).cast("int") + 1)
            .alias("category_1"),
        )
    if name == "bike_sharing_daily":
        # reference datasets/bike_sharing_daily.csv: 731 daily rows
        # (2011-01-01..2012-12-31), UCI bike-sharing schema — calendar
        # fields derived from the date, normalized weather covariates,
        # casual+registered = cnt invariant preserved
        base = spark.range(731)
        t = F.col("id")
        d = F.expr("date '2011-01-01' + cast(id as int)")
        noise = lambda salt, mod: (
            F.pmod(F.xxhash64(t, F.lit(salt)), F.lit(mod))
        )
        temp = F.round(
            0.5 - 0.22 * F.cos((t % 365) * (6.283185307179586 / 365.0))
            + (noise(1, 1600) - 800) / 10000.0, 6,
        )
        hum = F.round(0.63 + (noise(2, 4000) - 2000) / 10000.0, 6)
        wind = F.round(0.19 + (noise(3, 2400) - 1200) / 10000.0, 6)
        casual = (
            200 + (temp * 1500).cast("long")
            + F.when(F.dayofweek(d).isin(1, 7), 400).otherwise(0)
            + noise(4, 300)
        )
        registered = 2500 + (temp * 2500).cast("long") + t + noise(5, 600)
        return base.select(
            (t + 1).cast("int").alias("instant"),
            d.alias("dteday"),
            (((F.month(d) % 12) / 3).cast("int") + 1).alias("season"),
            (F.year(d) - 2011).cast("int").alias("yr"),
            F.month(d).alias("mnth"),
            F.when(noise(6, 100) < 3, 1).otherwise(0).alias("holiday"),
            (F.dayofweek(d) - 1).alias("weekday"),
            F.when(
                F.dayofweek(d).isin(1, 7) | (noise(6, 100) < 3), 0
            ).otherwise(1).alias("workingday"),
            (F.when(hum > 0.75, 2).otherwise(1)
             + F.when(noise(7, 100) < 5, 1).otherwise(0)).alias("weathersit"),
            temp.alias("temp"),
            F.round(temp * 0.95 + 0.03, 6).alias("atemp"),
            hum.alias("hum"),
            wind.alias("windspeed"),
            casual.alias("casual"),
            registered.alias("registered"),
            (casual + registered).alias("cnt"),
        )
    if name == "walmart_sales_weekly":
        # reference datasets/walmart_sales_weekly.csv: 7 (Store=1, Dept)
        # series × 143 Fridays from 2010-02-05; MarkDown1-5 NULL before
        # 2011-11 (as in the real frame), id = "Store_Dept" string
        depts = [1, 3, 8, 13, 38, 93, 95]
        n, periods = len(depts), 143
        base = spark.range(n * periods).select(
            (F.col("id") % n).alias("__i__"),
            (F.col("id") / n).cast("long").alias("__t__"),
        )
        t, i = F.col("__t__"), F.col("__i__")
        dept = F.element_at(
            F.array(*[F.lit(x) for x in depts]), i.cast("int") + 1
        )
        d = F.expr("date '2010-02-05' + cast(7 * __t__ as int)")
        noise = lambda salt, mod: (
            F.pmod(F.xxhash64(i, t, F.lit(salt)), F.lit(mod))
        )
        sales = F.round(
            15000.0 + dept * 300.0
            + 4000.0 * F.sin(t * (6.283185307179586 / 52.0) + i)
            + (noise(1, 600000) - 300000) / 100.0, 2,
        )
        holiday = F.weekofyear(d).isin(6, 36, 47, 52)
        md = lambda salt: F.when(
            d >= F.lit("2011-11-01").cast("date"),
            F.round(noise(salt, 500000) / 100.0, 2),
        )
        return base.select(
            F.concat(F.lit("1_"), dept).alias("id"),
            F.lit(1).alias("Store"),
            dept.alias("Dept"),
            d.alias("Date"),
            sales.alias("Weekly_Sales"),
            holiday.alias("IsHoliday"),
            F.lit("A").alias("Type"),
            F.lit(151315).alias("Size"),
            F.round(
                60.0 - 25.0 * F.cos(t * (6.283185307179586 / 52.0))
                + (noise(2, 1000) - 500) / 100.0, 2,
            ).alias("Temperature"),
            F.round(2.6 + t * 0.005 + noise(3, 60) / 100.0, 3)
            .alias("Fuel_Price"),
            md(4).alias("MarkDown1"),
            md(5).alias("MarkDown2"),
            md(6).alias("MarkDown3"),
            md(7).alias("MarkDown4"),
            md(8).alias("MarkDown5"),
            F.round(211.0 + t * 0.04, 6).alias("CPI"),
            F.round(8.1 - t * 0.004 + noise(9, 100) / 1000.0, 3)
            .alias("Unemployment"),
        )
    raise ValueError(
        f"unknown dataset {name!r}; available: {dataset_names()}"
    )
