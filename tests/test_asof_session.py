"""asof_join (pd.merge_asof differential) and sessionize (islands golden)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

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
