"""Streaming dedup + custom stateful operators.

* ``streaming_dedup_exact`` — exact content dedup on a stream with BOUNDED
  state: ``dropDuplicatesWithinWatermark`` keeps a key's hash only until
  the watermark passes it, so state size is (arrival rate × watermark),
  not corpus size. The batch engine's ``dedup_exact`` remains the
  full-corpus path; this handles the ingest stream.
* ``streaming_running_ewm`` — the ``applyInPandasWithState`` pattern for
  operators Spark's windowed aggregates can't express: a per-url adjusted
  EWM whose numerator/denominator accumulators persist in group state
  across micro-batches. Semantics match pandas ``ewm(alpha).mean()``
  (adjust=True) over the url's full history; verified against the batch
  ``augment_ewm`` under an availableNow trigger.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving row per exact text within the watermark
    horizon. State is bounded: a seen-hash expires once event time moves
    ``watermark`` past it (exact duplicates arriving later than that are
    the batch engine's job)."""
    hashed = stream_df.withColumn(
        "__h__", F.sha2(F.col(text_col).cast("string"), 256)
    ).withWatermark(ts_col, watermark)
    return hashed.dropDuplicatesWithinWatermark(["__h__"]).drop("__h__")


def streaming_running_ewm(
    stream_df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "plen",
    alpha: float = 0.2,
    out_col: str = "ewm",
) -> DataFrame:
    """Per-url adjusted EWM over the stream via ``applyInPandasWithState``.

    State per url = (w, y): w = Σ(1-α)^i (the adjusted denominator), y =
    current EWM. Each micro-batch folds its rows (event-time order within
    the batch) into the state, so the emitted value at row t equals the
    batch EWM over the url's entire history — exactly what pandas
    ``ewm(alpha, adjust=True).mean()`` yields when the stream arrives in
    order. Out-of-order arrival within a batch is sorted; across batches
    it is the documented approximation (same contract as any
    run-once-per-arrival stateful operator)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    url_field = next(f for f in stream_df.schema.fields if f.name == url_col)
    ts_field = next(f for f in stream_df.schema.fields if f.name == ts_col)
    out_schema = T.StructType(
        [
            T.StructField("url", url_field.dataType),
            T.StructField("ts", ts_field.dataType),
            T.StructField("value", T.DoubleType()),
            T.StructField(out_col, T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("w", T.DoubleType()), T.StructField("y", T.DoubleType())]
    )
    keep = 1.0 - alpha

    def fn(key, pdfs, state):
        if state.exists:
            w, y = state.get
        else:
            w, y = 0.0, 0.0
        # one group's micro-batch rows may span several Arrow chunks;
        # materialize and sort ONCE so the fold runs in event-time order
        # across chunk boundaries (a group's per-batch rows are small)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((float(w), float(y)))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("__ts__")
        vals = pdf["__v__"].to_numpy(dtype=np.float64)
        out = np.empty(len(vals))
        for i, x in enumerate(vals):
            # adjusted-EWM fold: y_t = (w·(1-α)·y_{t-1} + x) / (w·(1-α) + 1)
            wk = w * keep
            y = (wk * y + x) / (wk + 1.0)
            w = wk + 1.0
            out[i] = y
        state.update((float(w), float(y)))
        yield pd.DataFrame(
            {
                "url": key[0],
                "ts": pdf["__ts__"].to_numpy(),
                "value": vals,
                out_col: out,
            }
        )

    src = stream_df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("__ts__"),
        F.col(value_col).cast("double").alias("__v__"),
    )
    return src.groupBy("url").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(
    stream_df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    group_cols: tuple = ("user_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions on a stream via Spark's native ``session_window``
    — the incremental twin of the batch ``sessionize`` operator
    (operators/asof_join.py): a session closes once event time moves
    ``gap`` past its last event, and its final row is emitted when the
    watermark passes. State per group = open sessions only, so state size
    tracks concurrency, not history.

    Output: group cols + session_start (min event ts), session_end (max
    event ts — ``session_window.end`` minus the gap, matching the batch
    operator's max(ts)), n_events.
    """
    w = stream_df.withWatermark(ts_col, watermark)
    return (
        w.groupBy(*group_cols, F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .drop("session_window")
    )


def streaming_sketch_tier(
    stream_df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "plen",
    freq: str = "h",
    delta: float = 100.0,
    quantiles: tuple[float, ...] = (0.5, 0.99),
) -> DataFrame:
    """Streaming twin of ``rollup.sketch.rollup_sketch_tier``: per
    (url, bucket) t-digest maintained in group state across
    micro-batches, current percentile estimates emitted each update.

    State per group = the digest's (means, weights) arrays — bounded at
    ~delta*2 centroids regardless of how many rows the bucket has seen
    (the whole point of the sketch: streaming percentiles with O(delta)
    state where exact would need every value). Late data folds into its
    bucket's digest whenever it arrives (NoTimeout: buckets stay
    mergeable until the query ends; production would add a watermark
    timeout and flush closed buckets to the batch tier store)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from pytimetk_spark.functions.datetime import floor_date
    from pytimetk_spark.rollup.sketch import (
        compress,
        digest_quantile,
        merge_digests,
    )

    qcols = [f"p{round(q * 1000) / 10:g}".replace(".", "_")
             for q in quantiles]
    out_schema = T.StructType(
        [T.StructField("url", T.StringType()),
         T.StructField("bucket_ts", T.TimestampType()),
         T.StructField("cnt", T.LongType())]
        + [T.StructField(c, T.DoubleType()) for c in qcols]
    )
    state_schema = T.StructType([
        T.StructField("cnt", T.LongType()),
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ])

    def fn(key, pdfs, state):
        if state.exists:
            cnt, means, weights = state.get
            means = np.asarray(means, float)
            weights = np.asarray(weights, float)
        else:
            cnt, means, weights = 0, np.zeros(0), np.zeros(0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((int(cnt), means.tolist(), weights.tolist()))
            return
        vals = pd.concat(chunks, ignore_index=True)["__v__"].to_numpy(
            dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        batch_m, batch_w = compress(vals, np.ones(len(vals)), delta)
        if len(means):
            means, weights = merge_digests(
                [(means, weights), (batch_m, batch_w)], delta)
        else:
            means, weights = batch_m, batch_w
        cnt = int(cnt) + len(vals)
        state.update((cnt, means.tolist(), weights.tolist()))
        row = {"url": key[0], "bucket_ts": key[1], "cnt": cnt}
        for c, q in zip(qcols, quantiles):
            row[c] = digest_quantile(means, weights, q)
        yield pd.DataFrame([row])

    src = stream_df.select(
        F.col(url_col).alias("url"),
        floor_date(F.col(ts_col), freq).alias("bucket_ts"),
        F.col(value_col).cast("double").alias("__v__"),
    )
    return src.groupBy("url", "bucket_ts").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
