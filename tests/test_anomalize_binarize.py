"""Tests for anomalize (output contract + outlier detection + IQR parity)
and binarize/correlate."""

from __future__ import annotations

import numpy as np
import pytest
import pandas as pd

from pytimetk_spark import anomalize, binarize, correlate
from pytimetk_spark.operators.anomalize import OUTPUT_COLS


def _anomalize_fixture():
    """Reference docstring fixture (core/anomalize.py:192-201): monthly,
    seed 42, index 3 set to 100."""
    rng = np.random.RandomState(42)
    dates = pd.date_range("2021-01-01", "2024-01-01", freq="MS")
    values = rng.randn(len(dates)) * 10 + 25
    values[3] = 100
    return pd.DataFrame({"date": dates, "value": values})


def test_anomalize_output_contract(spark):
    pdf = _anomalize_fixture()
    out = anomalize(
        spark.createDataFrame(pdf), "date", "value", method="twitter", clean="min_max"
    ).toPandas()
    for c in OUTPUT_COLS:
        assert c in out.columns, c
    assert len(out) == len(pdf)
    out = out.sort_values("date").reset_index(drop=True)
    # the planted spike must be flagged
    assert out.loc[3, "anomaly"] == "Yes"
    assert out.loc[3, "anomaly_direction"] == 1
    # observed passes through exactly
    np.testing.assert_allclose(out["observed"], pdf["value"], rtol=1e-12)
    # decomposition identity: observed = seasonal + trend + remainder
    np.testing.assert_allclose(
        out["observed"],
        out["seasonal"] + out["trend"] + out["remainder"],
        rtol=1e-9,
    )
    # clean value for the spike is pulled inside the band
    assert out.loc[3, "observed_clean"] < out.loc[3, "observed"]


def test_anomalize_iqr_limits_parity(spark):
    """IQR limits formula (reference _iqr anomalize.py:755-759)."""
    pdf = _anomalize_fixture()
    out = (
        anomalize(spark.createDataFrame(pdf), "date", "value", method="twitter")
        .toPandas()
        .sort_values("date")
        .reset_index(drop=True)
    )
    rem = out["remainder"]
    q1, q3 = np.percentile(rem, [25, 75])
    iqr = q3 - q1
    l1 = -1 * (q1 + (0.15 / 0.05) * iqr)
    l2 = q3 + (0.15 / 0.05) * iqr
    np.testing.assert_allclose(
        out["recomposed_l1"], out["seasonal"] + out["trend"] + l1, rtol=1e-9
    )
    np.testing.assert_allclose(
        out["recomposed_l2"], out["seasonal"] + out["trend"] + l2, rtol=1e-9
    )
    centerline = (l1 + l2) / 2
    np.testing.assert_allclose(
        out["anomaly_score"], (rem - centerline).abs(), rtol=1e-9
    )


def test_anomalize_grouped(spark):
    pdf1 = _anomalize_fixture().assign(id="A")
    pdf2 = _anomalize_fixture().assign(id="B")
    pdf = pd.concat([pdf1, pdf2])
    out = anomalize(
        spark.createDataFrame(pdf), "date", "value", group_cols=["id"],
        method="twitter",
    ).toPandas()
    assert len(out) == len(pdf)
    assert set(out["id"]) == {"A", "B"}
    flagged = out[out["anomaly"] == "Yes"]
    assert set(flagged["id"]) == {"A", "B"}


def test_binarize_and_correlate(spark):
    rng = np.random.RandomState(0)
    n = 200
    pdf = pd.DataFrame(
        {
            "age": rng.randint(18, 70, n),
            "income": rng.lognormal(10, 0.5, n).round(2),
            "gender": rng.choice(["M", "F"], n),
            "member": rng.choice([True, False], n),
            "city": rng.choice(["NY"] * 50 + ["LA"] * 45 + ["SF"] * 4 + ["XX"], n),
        }
    )
    sdf = spark.createDataFrame(pdf)
    binned = binarize(sdf, n_bins=4)
    cols = binned.columns
    assert "member" in cols  # bool → int, unchanged name
    assert any(c.startswith("age__") for c in cols)
    assert any(c.startswith("income__") for c in cols)
    assert "gender__M" in cols and "gender__F" in cols
    assert any(c == "city__-OTHER" for c in cols)  # infrequent levels pooled
    out = binned.toPandas()
    # each numeric row falls in exactly one bin
    age_cols = [c for c in cols if c.startswith("age__")]
    assert (out[age_cols].sum(axis=1) == 1).all()

    corr = correlate(binned, target="member")
    assert list(corr.columns) == ["feature", "bin", "correlation"]
    assert (corr["correlation"].abs().diff().dropna() <= 1e-12).all() or (
        corr["correlation"].abs().is_monotonic_decreasing
    )


def test_spearman_matches_pandas_and_avoids_global_sort(spark):
    """Distributed average-rank spearman must equal pandas
    df.corr(method='spearman') including ties, and the plan must contain
    no partition-less Window sort."""
    rng = np.random.RandomState(5)
    n = 500
    pdf = pd.DataFrame(
        {
            "x": rng.randn(n).round(1),          # plenty of ties
            "y": rng.randn(n),
            "t": rng.randint(0, 3, n).astype(float),
        }
    )
    pdf["y"] = pdf["y"] + 0.5 * pdf["x"]
    sdf = spark.createDataFrame(pdf)
    got = correlate(sdf, target="t", method="spearman")
    expected = pdf.corr(method="spearman")["t"]
    for _, row in got.iterrows():
        np.testing.assert_allclose(
            row["correlation"], expected[row["feature"]], rtol=1e-9
        )

    # plan check: every Window sort is partitioned
    from pytimetk_spark.operators.binarize import _with_avg_rank

    ranked = _with_avg_rank(sdf, "x", "x__rk")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            assert "windowspecdefinition(__bkt__" in plan or "__bkt__" in line
    # pandas parity of the rank column itself
    rk = ranked.toPandas().sort_values("x").reset_index(drop=True)
    exp_rk = pdf.sort_values("x").reset_index(drop=True)["x"].rank(method="average")
    np.testing.assert_allclose(rk["x__rk"].to_numpy(), exp_rk.to_numpy())


def test_binarize_job_count(spark):
    """binarize must issue a bounded number of jobs (3-4) regardless of
    column count — round 1 issued 2 per column."""
    rng = np.random.RandomState(1)
    n = 300
    data = {f"num{i}": rng.randn(n) for i in range(8)}
    data.update({f"cat{i}": rng.choice(list("abcde"), n) for i in range(8)})
    sdf = spark.createDataFrame(pd.DataFrame(data))
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    sc.setJobGroup("binarize-count", "binarize job count probe")
    binarize(sdf, n_bins=4)  # plan construction runs the probe jobs
    jobs = len(tracker.getJobIdsForGroup("binarize-count") or [])
    sc.setJobGroup(None, None)
    # 3 logical queries; AQE may split each into ~2 jobs. Round 1 issued
    # 2 jobs PER COLUMN (32 here), so <=8 proves the single-pass design.
    assert jobs <= 8, f"binarize issued {jobs} jobs for 16 columns"


def test_correlate_kendall_tau_b(spark):
    """Contingency-table Kendall tau-b equals brute-force pair counting
    (scipy/pandas kendall is unavailable in this env)."""
    rng = np.random.RandomState(2)
    n = 150
    pdf = pd.DataFrame(
        {
            "a": rng.randint(0, 2, n).astype(float),
            "b": rng.randint(0, 4, n).astype(float),
            "t": rng.randint(0, 3, n).astype(float),
        }
    )
    pdf["b"] = np.round(pdf["b"] + pdf["t"])  # correlated with ties
    got = correlate(spark.createDataFrame(pdf), target="t", method="kendall")

    def brute_tau_b(x, y):
        n_ = len(x)
        c = d = 0
        for i in range(n_):
            for j in range(i + 1, n_):
                s = np.sign(x[i] - x[j]) * np.sign(y[i] - y[j])
                c += s > 0
                d += s < 0
        n0 = n_ * (n_ - 1) / 2
        tx = sum((x == v).sum() * ((x == v).sum() - 1) / 2 for v in set(x))
        ty = sum((y == v).sum() * ((y == v).sum() - 1) / 2 for v in set(y))
        return (c - d) / np.sqrt((n0 - tx) * (n0 - ty))

    for _, row in got.iterrows():
        exp = brute_tau_b(pdf[row["feature"]].to_numpy(), pdf["t"].to_numpy())
        np.testing.assert_allclose(row["correlation"], exp, rtol=1e-12)
    assert got["correlation"].abs().is_monotonic_decreasing


def test_correlate_spearman_bounded_jobs_and_joins(spark):
    """Round-3 rework: spearman must issue a BOUNDED number of Spark jobs
    and joins regardless of column count (round 2 ran ~2 jobs + 1 join per
    column — 200+ jobs and a 100-join plan on a 100-column funnel)."""
    rng = np.random.RandomState(7)
    n = 120

    def probe(n_cols):
        data = {f"c{i}": rng.randn(n).round(1) for i in range(n_cols)}
        data["t"] = rng.randn(n)
        sdf = spark.createDataFrame(pd.DataFrame(data))
        sc = spark.sparkContext
        group = f"spearman-count-{n_cols}"
        sc.setJobGroup(group, "spearman job count probe")
        correlate(sdf, target="t", method="spearman")
        jobs = len(sc.statusTracker().getJobIdsForGroup(group) or [])
        sc.setJobGroup(None, None)
        return jobs

    jobs_small, jobs_wide = probe(5), probe(100)
    # AQE materializes each exchange/broadcast query stage as its own job,
    # so the absolute count is ~18; the property that matters is that it
    # does NOT grow with column count (round 2: ~2 jobs PER column → 200+)
    assert jobs_wide <= 24, f"spearman issued {jobs_wide} jobs for 100 cols"
    assert jobs_wide <= jobs_small + 2

    # join count in the optimized plan is constant (3: bucket-offset
    # broadcast, rank-of-x, rank-of-target broadcast)
    data = {f"c{i}": rng.randn(n).round(1) for i in range(30)}
    data["t"] = rng.randn(n)
    sdf = spark.createDataFrame(pd.DataFrame(data))
    from pytimetk_spark.operators.binarize import _spearman_paired

    plan = (
        _spearman_paired(sdf, "t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # 3 logical joins (bucket-offset, rank-of-x, rank-of-target); the
    # offset join appears twice physically because the ranks subtree is
    # instantiated in both the rx and ry branches — still constant in
    # column count (round 2 planned ONE JOIN PER COLUMN)
    n_joins = plan.count("Join ")
    assert n_joins <= 4, f"spearman plan has {n_joins} joins"
    assert "SortMergeJoin" not in plan or n_joins <= 4


def test_correlate_kendall_guards_high_cardinality(spark):
    """kendall's contingency melt collects Σ distinct (value, target)
    pairs to the driver; a high-cardinality column must fail fast with a
    clear message instead of OOMing the driver."""
    rng = np.random.RandomState(11)
    n = 3000
    pdf = pd.DataFrame({"hc": rng.randn(n), "t": rng.randn(n)})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="max_pairs_per_column"):
        correlate(sdf, target="t", method="kendall", max_pairs_per_column=500)
    # raising the budget runs fine
    out = correlate(
        sdf, target="t", method="kendall", max_pairs_per_column=10_000
    )
    assert len(out) == 1


def test_binarize_one_hot_flag_is_reference_noop(spark):
    """Reference quirk (correlationfunnel.py:29,461-501): create_recipe
    accepts ``one_hot`` but never branches on it — pd.get_dummies is
    unconditional, so one_hot=False yields the SAME one-hot frame. Pinned
    here by replicating the reference's public recipe kernel under both
    flags, then asserting our binarize accepts the flag and matches."""

    def reference_recipe(data, n_bins, thresh_infreq, name_infreq, one_hot):
        # faithful replication of /root/reference/src/pytimetk/core/
        # correlationfunnel.py:461-501 (public MIT code, cited not copied
        # into the engine — test-only oracle)
        recipe = pd.DataFrame()
        num_cols = data.select_dtypes(include=["number"]).columns
        for col in num_cols:
            binned, bins = pd.qcut(
                data[col], q=n_bins, retbins=True, labels=False,
                duplicates="drop",
            )
            bins = bins.tolist()
            oh = pd.get_dummies(binned)
            names = [
                f"{col}__{round(a, 1)}_{round(b, 1)}"
                for a, b in zip(bins[:-1], bins[1:])
            ]
            oh.columns = [names[i] for i in oh.columns]
            data = pd.concat([data, oh], axis=1).drop(columns=[col])
        cat_cols = data.select_dtypes(include=["object", "category"]).columns
        if len(cat_cols):
            for col in cat_cols:
                vc = data[col].value_counts(normalize=True)
                infreq = vc[vc < thresh_infreq].index
                data[col] = data[col].replace(infreq, name_infreq)
            recipe = pd.get_dummies(data, prefix_sep="__")
        return recipe

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {"age": rng.randint(18, 70, 200).astype(float),
         "gender": rng.choice(["M", "F"], 200)}
    )
    ref_true = reference_recipe(pdf.copy(), 4, 0.01, "-OTHER", True)
    ref_false = reference_recipe(pdf.copy(), 4, 0.01, "-OTHER", False)
    pd.testing.assert_frame_equal(ref_true, ref_false)  # the quirk itself

    sdf = spark.createDataFrame(pdf)
    a = binarize(sdf, n_bins=4, one_hot=True).toPandas()
    b = binarize(sdf, n_bins=4, one_hot=False).toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert any(c.startswith("age__") for c in b.columns)
