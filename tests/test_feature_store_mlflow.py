"""FeatureStore MLflow integration — full contract via an injected fake
mlflow module (the real package is absent in this environment, as the
gated-import design expects)."""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pytimetk_spark.feature_store import FeatureStore


class _FakeRunData:
    def __init__(self, params):
        self.params = params


class _FakeRun:
    def __init__(self, run_id, params):
        self.info = types.SimpleNamespace(run_id=run_id)
        self.data = _FakeRunData(params)


def _fake_mlflow():
    m = types.ModuleType("mlflow")
    m.params = {}
    m.metrics = {}
    m.dicts = {}
    m._active = _FakeRun("run-1", m.params)
    m.active_run = lambda: m._active
    m.log_param = lambda k, v: m.params.__setitem__(k, str(v))
    m.log_metric = lambda k, v: m.metrics.__setitem__(k, v)
    m.log_dict = lambda d, path: m.dicts.__setitem__(path, d)

    class _Client:
        def get_run(self, run_id):
            assert run_id == "run-1"
            return _FakeRun(run_id, dict(m.params))

    m.tracking = types.SimpleNamespace(MlflowClient=_Client)
    return m


@pytest.fixture
def fake_mlflow(monkeypatch):
    m = _fake_mlflow()
    monkeypatch.setitem(sys.modules, "mlflow", m)
    return m


def test_requires_mlflow_package(monkeypatch):
    from pytimetk_spark import feature_store_mlflow as fsm

    monkeypatch.setitem(sys.modules, "mlflow", None)
    with pytest.raises(ImportError, match="requires the `mlflow` package"):
        fsm._import_mlflow()


def test_build_log_load_roundtrip(spark, tmp_path, fake_mlflow):
    from pytimetk_spark.feature_store_mlflow import (
        build_features_with_mlflow,
        load_features_from_mlflow,
    )

    store = FeatureStore(str(tmp_path / "fs"))
    store.register(
        "daily", lambda df: df.groupBy("k").agg(F.sum("v").alias("vsum"))
    )
    src = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 5.0]})
    )

    out, meta = build_features_with_mlflow(store, "daily", src)
    assert out.count() == 2
    assert fake_mlflow.params["daily_feature_version"] == meta.input_fingerprint
    assert fake_mlflow.params["daily_row_count"] == "2"
    assert fake_mlflow.metrics["daily_cache_hit"] == 0.0
    assert any("daily_metadata.json" in k for k in fake_mlflow.dicts)

    # second build with identical input: cache hit recorded
    build_features_with_mlflow(store, "daily", src)
    assert fake_mlflow.metrics["daily_cache_hit"] == 1.0

    # load the exact snapshot the run recorded
    loaded, lmeta = load_features_from_mlflow(
        store, "daily", spark, run_id="run-1"
    )
    assert lmeta.input_fingerprint == meta.input_fingerprint
    got = loaded.toPandas().sort_values("k").reset_index(drop=True)
    assert got["vsum"].tolist() == [3.0, 5.0]


def test_load_strict_missing_param(spark, tmp_path, fake_mlflow):
    from pytimetk_spark.feature_store_mlflow import load_features_from_mlflow

    store = FeatureStore(str(tmp_path / "fs2"))
    with pytest.raises(KeyError, match="did not log a parameter"):
        load_features_from_mlflow(store, "absent", spark, run_id="run-1")


def test_no_active_run(spark, tmp_path, fake_mlflow):
    from pytimetk_spark.feature_store_mlflow import build_features_with_mlflow

    fake_mlflow._active = None
    store = FeatureStore(str(tmp_path / "fs3"))
    store.register("x", lambda df: df)
    src = spark.createDataFrame(pd.DataFrame({"v": [1.0]}))
    with pytest.raises(RuntimeError, match="No active MLflow run"):
        build_features_with_mlflow(store, "x", src)
