"""asof_join (pd.merge_asof differential) and sessionize (islands golden)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pytimetk_spark import asof_join, sessionize


def _mk(spark, seed=7, n_left=400, n_right=120, n_keys=5):
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-03-01")
    left = pd.DataFrame(
        {
            "sym": rng.choice([f"k{i}" for i in range(n_keys)], n_left),
            "ts": base
            + pd.to_timedelta(rng.randint(0, 500_000, n_left), unit="s"),
            "qty": rng.randint(1, 100, n_left).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "sym": rng.choice([f"k{i}" for i in range(n_keys)], n_right),
            "rts": base
            + pd.to_timedelta(
                np.sort(rng.choice(500_000, n_right, replace=False)), unit="s"
            ),
            "px": rng.randn(n_right).round(4),
        }
    )
    # merge_asof demands unique sort keys only globally-sorted frames;
    # dedupe (sym, rts) so the match is deterministic on both engines
    right = right.drop_duplicates(["sym", "rts"]).reset_index(drop=True)
    return left, right, spark.createDataFrame(left), spark.createDataFrame(right)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_matches_pandas(spark, direction):
    left, right, ldf, rdf = _mk(spark)
    got = (
        asof_join(
            ldf, rdf, "ts", right_on="rts", by=["sym"], direction=direction
        )
        .toPandas()
        .sort_values(["sym", "ts", "qty"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("rts"),
        left_on="ts",
        right_on="rts",
        by="sym",
        direction=direction,
    ).sort_values(["sym", "ts", "qty"]).reset_index(drop=True)
    assert len(got) == len(left)
    pd.testing.assert_series_equal(
        got["px"].reset_index(drop=True),
        want["px"].reset_index(drop=True),
        check_names=False,
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_tolerance(spark, direction):
    left, right, ldf, rdf = _mk(spark, seed=11)
    tol = 3600.0
    got = (
        asof_join(
            ldf, rdf, "ts", right_on="rts", by=["sym"], direction=direction,
            tolerance=tol,
        )
        .toPandas()
        .sort_values(["sym", "ts", "qty"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("rts"),
        left_on="ts",
        right_on="rts",
        by="sym",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tol),
    ).sort_values(["sym", "ts", "qty"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["px"].reset_index(drop=True),
        want["px"].reset_index(drop=True),
        check_names=False,
    )


def test_asof_join_nullable_right_values(spark):
    """A matched right row whose value column is NULL must propagate that
    NULL — not a stale value from an OLDER right row (per-column
    last(ignorenulls) would mix columns across right rows)."""
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({"ts": base + pd.to_timedelta([20, 8], unit="s"),
                         "q": [1, 2]})
    right = pd.DataFrame(
        {
            "rts": base + pd.to_timedelta([5, 15], unit="s"),
            "px": [111.0, None],
            "sz": [None, 7.0],
        }
    )
    for direction in ("backward", "forward", "nearest"):
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                "ts",
                right_on="rts",
                direction=direction,
            )
            .toPandas()
            .sort_values("ts")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts"),
            right,
            left_on="ts",
            right_on="rts",
            direction=direction,
        ).sort_values("ts").reset_index(drop=True)
        for c in ("px", "sz"):
            pd.testing.assert_series_equal(
                got[c], want[c], check_names=False
            )
    # tolerance must be judged against the matched row itself: ts=20
    # matches rts=15 (NULL px) within tol=6; px stays NULL, sz survives
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "ts",
            right_on="rts",
            direction="backward",
            tolerance=6.0,
        )
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert got.loc[0, "px"] == 111.0 and np.isnan(got.loc[0, "sz"])
    assert np.isnan(got.loc[1, "px"]) and got.loc[1, "sz"] == 7.0


def test_asof_join_suffix_and_numeric_key(spark):
    left = pd.DataFrame({"k": [1.0, 2.5, 10.0], "v": [1, 2, 3]})
    right = pd.DataFrame({"k": [0.5, 2.0, 9.0], "v": [10, 20, 30]})
    out = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right), "k"
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["k", "v", "v_right"]
    assert out["v_right"].tolist() == [10, 20, 30]


def test_sessionize_islands_golden(spark):
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "u": ["a"] * 6 + ["b"] * 3,
            "ts": [
                base,
                base + pd.Timedelta(minutes=5),
                base + pd.Timedelta(minutes=50),  # > 30min gap -> session 1
                base + pd.Timedelta(minutes=60),
                base + pd.Timedelta(minutes=200),  # session 2
                base + pd.Timedelta(minutes=201),
                base,
                base + pd.Timedelta(minutes=31),  # > gap -> session 1
                base + pd.Timedelta(minutes=32),
            ],
        }
    )
    out = (
        sessionize(
            spark.createDataFrame(pdf), "ts", gap=1800, group_cols=["u"]
        )
        .toPandas()
        .sort_values(["u", "ts"])
        .reset_index(drop=True)
    )
    assert out["session_id"].tolist() == [0, 0, 1, 1, 2, 2, 0, 1, 1]


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """session_window stream (availableNow) == batch sessionize stats."""
    from pytimetk_spark.streaming.stateful import streaming_sessionize

    rng = np.random.RandomState(5)
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "user_id": rng.randint(0, 8, 300).astype("int64"),
            "ts": base
            + pd.to_timedelta(np.sort(rng.randint(0, 400_000, 300)), unit="s"),
            "value": rng.rand(300),
        }
    )
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    out = streaming_sessionize(
        stream, "ts", gap="30 minutes", group_cols=("user_id",),
        watermark="0 seconds",
    )
    q = (
        out.writeStream.format("memory").queryName("sess_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("sess_stream").toPandas()
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )

    batch = (
        sessionize(
            spark.createDataFrame(pdf), "ts", gap=1800.0,
            group_cols=["user_id"],
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .toPandas()
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    # append mode only emits sessions the watermark has CLOSED; compare on
    # the emitted subset (availableNow + 0s watermark closes all but each
    # group's last open session)
    merged = got.merge(
        batch, on=["user_id", "session_start"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got) > 0
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["session_end_s"] == merged["session_end_b"]).all()


def test_asof_join_plan_no_driver_funnel(spark):
    """The as-of join is one window pass: no Exchange SinglePartition and
    exactly two exchanges (right-side agg + the join's partitionBy)."""
    import re

    left = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("t"),
        F.lit(1.0).alias("v"),
    )
    right = spark.range(100).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 10).cast("double").alias("rt"),
        F.lit(2.0).alias("p"),
    ).groupBy("k", "rt").agg(F.sum("p").alias("p"))
    out = asof_join(left, right, "t", right_on="rt", by=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_interval_join_matches_bruteforce(spark):
    """Bucketized interval join == brute-force pandas containment join,
    across closed modes and bucket sizes (results bucket-size invariant)."""
    from pytimetk_spark import interval_join

    rng = np.random.RandomState(9)
    base = pd.Timestamp("2024-05-01")
    pts = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 500),
            "ts": base + pd.to_timedelta(rng.randint(0, 200_000, 500), unit="s"),
            "v": np.arange(500, dtype="int64"),
        }
    )
    starts = rng.randint(0, 190_000, 40)
    ivs = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 40),
            "s": base + pd.to_timedelta(starts, unit="s"),
            "e": base
            + pd.to_timedelta(starts + rng.randint(600, 20_000, 40), unit="s"),
            "iv_id": np.arange(40, dtype="int64"),
        }
    )
    want = pts.merge(ivs, on="k")
    want = want[(want.ts >= want.s) & (want.ts <= want.e)]
    want_pairs = set(zip(want.v, want.iv_id))
    for bucket in (600.0, 3600.0, 86400.0):
        got = interval_join(
            spark.createDataFrame(pts), spark.createDataFrame(ivs),
            "ts", "s", "e", by=["k"], bucket_seconds=bucket,
        ).toPandas()
        assert set(zip(got.v, got.iv_id)) == want_pairs
    # closed='neither' drops exact-boundary hits
    strict = pts.merge(ivs, on="k")
    strict = strict[(strict.ts > strict.s) & (strict.ts < strict.e)]
    got = interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "ts", "s", "e", by=["k"], closed="neither",
    ).toPandas()
    assert set(zip(got.v, got.iv_id)) == set(zip(strict.v, strict.iv_id))


def test_interval_join_plan_is_hash_join(spark):
    """The bucket prefilter must produce a hash equi-join, never a
    broadcast-nested-loop (all-pairs) theta join."""
    from pytimetk_spark import interval_join

    pts = spark.range(1000).select(
        F.col("id").cast("double").alias("ts"), F.col("id").alias("v")
    )
    ivs = spark.range(50).select(
        (F.col("id") * 100).cast("double").alias("s"),
        (F.col("id") * 100 + 30).cast("double").alias("e"),
        F.col("id").alias("iv"),
    )
    out = interval_join(pts, ivs, "ts", "s", "e", bucket_seconds=100.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_join_hypothesis_vs_merge_asof(spark):
    """Property test: random frames (nullable right values, duplicate left
    keys, sparse groups), every direction, with/without tolerance —
    engine == pd.merge_asof. Few examples (a Spark job each), but each is
    a fresh adversarial shape."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6, deadline=None, derandomize=True,
        suppress_health_check=list(HealthCheck),
    )
    @given(st.data())
    def run(data):
        rng = np.random.RandomState(data.draw(st.integers(0, 10_000)))
        n_left = data.draw(st.integers(1, 40))
        n_right = data.draw(st.integers(1, 25))
        n_keys = data.draw(st.integers(1, 4))
        direction = data.draw(
            st.sampled_from(["backward", "forward", "nearest"])
        )
        tol = data.draw(st.sampled_from([None, 50.0, 1000.0]))
        base = pd.Timestamp("2024-05-01")
        left = pd.DataFrame(
            {
                "k": rng.randint(0, n_keys, n_left),
                "ts": base
                + pd.to_timedelta(rng.randint(0, 5000, n_left), unit="s"),
                "q": np.arange(n_left),
            }
        )
        rts = np.sort(rng.choice(5000, n_right, replace=False))
        right = pd.DataFrame(
            {
                "k": rng.randint(0, n_keys, n_right),
                "rts": base + pd.to_timedelta(rts, unit="s"),
                "px": np.where(
                    rng.rand(n_right) < 0.3, np.nan, rng.randn(n_right)
                ),
            }
        ).drop_duplicates(["k", "rts"])
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                "ts", right_on="rts", by=["k"], direction=direction,
                tolerance=tol,
            )
            .toPandas()
            .sort_values(["k", "ts", "q"])
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("rts"),
            left_on="ts", right_on="rts", by="k", direction=direction,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).sort_values(["k", "ts", "q"]).reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["px"], want["px"], check_names=False
        )

    run()


def test_asof_null_right_key_rows_ignored(spark):
    """A right row with a NULL key must never attach (pd.merge_asof rejects
    null keys outright); before the r5 fix its non-null packed struct could
    bind to left rows with no real match (ADVICE r4)."""
    left = spark.createDataFrame(
        pd.DataFrame({"sym": ["a", "a"],
                      "ts": pd.to_datetime(["2024-03-01 00:00:10",
                                            "2024-03-01 00:10:00"]),
                      "qty": [1, 2]})
    )
    right_pd = pd.DataFrame(
        {"sym": ["a", "a"],
         "rts": [pd.NaT, pd.Timestamp("2024-03-01 00:05:00")],
         "px": [99.0, 1.5]}
    )
    right = spark.createDataFrame(right_pd)
    out = (
        asof_join(left, right, left_on="ts", right_on="rts", by=["sym"])
        .orderBy("ts")
        .toPandas()
    )
    # first left row precedes every REAL right key -> no match (px null),
    # NOT the null-key row's px=99
    assert pd.isna(out["px"].iloc[0])
    assert out["px"].iloc[1] == 1.5
