"""MLflow integration for the FeatureStore.

Reference: /root/reference/src/pytimetk/feature_store/mlflow_integration.py
(build_features_with_mlflow / log_feature_metadata_to_mlflow /
load_features_from_mlflow — gated behind an optional ``mlflow`` import with
a clear error, run-context checks, prefixed param names). Adapted to this
engine's materialize-based store: the recorded version handle is the input
fingerprint, so a training run's exact feature snapshot is recoverable
from the tracking server alone.

``mlflow`` is not installed in this environment; the tests exercise the
full logging/loading contract through an injected fake module.
"""

from __future__ import annotations

from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession

from pytimetk_spark.feature_store import FeatureSetMetadata, FeatureStore

__all__ = [
    "build_features_with_mlflow",
    "log_feature_metadata_to_mlflow",
    "load_features_from_mlflow",
]


def _import_mlflow():
    try:
        import mlflow
    except ImportError as exc:
        raise ImportError(
            "MLflow integration requires the `mlflow` package. "
            "Install it with `pip install mlflow` or add it to your "
            "environment."
        ) from exc
    return mlflow


def _require_active_run(mlflow_module, run=None):
    if run is not None:
        return run
    active = mlflow_module.active_run()
    if active is None:
        raise RuntimeError(
            "No active MLflow run found. Start a run with "
            "`mlflow.start_run()` before invoking the feature store "
            "MLflow helpers."
        )
    return active


def _prefixed(prefix: str | None, name: str) -> str:
    if not prefix:
        return name
    return f"{prefix.rstrip('_')}_{name}"


def build_features_with_mlflow(
    store: FeatureStore,
    name: str,
    df: DataFrame,
    *,
    force: bool = False,
    params_prefix: str | None = None,
    metadata_artifact_path: str = "feature_store",
    log_metadata_artifact: bool = True,
    run=None,
) -> tuple[DataFrame, FeatureSetMetadata]:
    """Materialize (or cache-hit) a registered feature set and record its
    version handle + metadata on the active MLflow run."""
    mlflow = _import_mlflow()
    _require_active_run(mlflow, run=run)

    out, meta = store.materialize(name, df, force=force)
    # materialize records its own cache outcome — no second full-scan
    # fingerprint of the input just to compute this metric
    from_cache = bool(store.last_cache_hit)
    log_feature_metadata_to_mlflow(
        meta=meta,
        name=name,
        params_prefix=params_prefix,
        metadata_artifact_path=metadata_artifact_path,
        log_metadata_artifact=log_metadata_artifact,
    )
    mlflow.log_metric(
        _prefixed(params_prefix, f"{name}_cache_hit"),
        1.0 if from_cache else 0.0,
    )
    return out, meta


def log_feature_metadata_to_mlflow(
    *,
    meta: FeatureSetMetadata,
    name: str,
    params_prefix: str | None = None,
    metadata_artifact_path: str = "feature_store",
    log_metadata_artifact: bool = True,
) -> None:
    """Log a previously materialized feature set's version metadata."""
    mlflow = _import_mlflow()
    _require_active_run(mlflow)

    prefix_name = _prefixed(params_prefix, name)
    mlflow.log_param(f"{prefix_name}_feature_version", meta.input_fingerprint)
    mlflow.log_param(f"{prefix_name}_row_count", meta.row_count)
    mlflow.log_param(f"{prefix_name}_columns", ",".join(meta.columns))
    if log_metadata_artifact:
        artifact = (
            f"{metadata_artifact_path.rstrip('/')}/{prefix_name}_metadata.json"
        )
        mlflow.log_dict(asdict(meta), artifact)


def load_features_from_mlflow(
    store: FeatureStore,
    name: str,
    spark: SparkSession,
    *,
    run_id: str | None = None,
    params_prefix: str | None = None,
    version_param: str | None = None,
    strict: bool = True,
) -> tuple[DataFrame, FeatureSetMetadata]:
    """Load the exact feature snapshot a training run recorded."""
    mlflow = _import_mlflow()
    if run_id is None:
        active = mlflow.active_run()
        if active is None:
            raise RuntimeError(
                "No run_id provided and no active MLflow run found. Pass "
                "an explicit run_id when loading outside a tracking "
                "context."
            )
        run_id = active.info.run_id

    client = mlflow.tracking.MlflowClient()
    run = client.get_run(run_id)
    param_key = version_param or (
        f"{_prefixed(params_prefix, name)}_feature_version"
    )
    fingerprint = run.data.params.get(param_key)
    if fingerprint is None:
        message = (
            f"MLflow run '{run_id}' did not log a parameter '{param_key}'. "
            "Ensure that `build_features_with_mlflow` (or the logging "
            "helper) was invoked during training."
        )
        if strict:
            raise KeyError(message)
        return store.load(name, spark)
    return store.load(name, spark, fingerprint=fingerprint)
