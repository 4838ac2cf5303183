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
    if name in ("bike_sharing_daily", "walmart_sales_weekly"):
        raise NotImplementedError(
            f"{name}: multi-covariate demo table not generated; use the "
            "reference CSV directly if you need the real data."
        )
    raise ValueError(
        f"unknown dataset {name!r}; available: {dataset_names()}"
    )
