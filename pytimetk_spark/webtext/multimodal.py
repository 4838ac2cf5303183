"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels (PIL/ffmpeg/torchaudio) are NOT available in this
environment — the decode step is STUBBED behind NotImplementedError (or a
deterministic byte-level fake with ``fake=True``), but the Spark-side
plumbing is REAL and tested: schemas, ``mapInPandas`` Arrow batching, batch
shapes, partition sizing. Swapping in a real decoder is a one-function
change inside the UDF.

Scale notes: media blobs are large → ``spark.sql.files.maxPartitionBytes``
governs rows/task; mapInPandas streams Arrow batches so a task never holds
more than ``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def byte_stats_features(
    df: DataFrame, binary_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """REAL (non-stub) byte-level featurizer over any binary column:
    length, shannon-entropy-ish stats from a 16-bin byte histogram, via
    mapInPandas (numpy over Arrow buffers — vectorized, no per-row Python
    objects beyond the numpy views)."""
    schema = T.StructType(
        [
            T.StructField("__id__", T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("byte_entropy", T.DoubleType()),
            T.StructField("hist16", T.ArrayType(T.DoubleType())),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # whole-batch vectorization: ONE concatenated uint8 view + ONE
            # bincount over (row*16 + bin) — no per-blob numpy calls
            blobs = [b or b"" for b in pdf["__bin__"]]
            n = len(blobs)
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
            cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n, dtype=np.int32), lens)
            flat = np.bincount(
                (row_idx << 4) | (cat >> 4).astype(np.int32), minlength=n * 16
            )
            hist = flat.reshape(n, 16).astype("float64")
            tot = hist.sum(axis=1, keepdims=True)
            p = np.divide(hist, tot, out=np.zeros_like(hist), where=tot > 0)
            plogp = np.zeros_like(p)
            np.log2(p, out=plogp, where=p > 0)
            ent = -(p * plogp).sum(axis=1)
            yield pd.DataFrame(
                {
                    "__id__": pdf["__id__"].astype("int64").to_numpy(),
                    "n_bytes": lens.astype("int32"),
                    "byte_entropy": ent,
                    "hist16": list(p),
                }
            )

    src = df.select(F.col(id_col).alias("__id__"), F.col(binary_col).alias("__bin__"))
    out = src.mapInPandas(featurize, schema=schema)
    return out.withColumnRenamed("__id__", id_col)


def decode_image_batch(
    df: DataFrame,
    binary_col: str,
    id_col: str = "doc_id",
    target_size: tuple[int, int] = (224, 224),
    fake: bool = False,
) -> DataFrame:
    """Image decode + resize + feature extraction.

    Real decoding requires PIL/opencv (absent here) → raises
    NotImplementedError unless ``fake=True``, which produces a
    DETERMINISTIC stand-in (bytes-derived pseudo-features with the real
    schema and batch shape), keeping the distributed plumbing testable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            if not have_pil and not fake:
                raise NotImplementedError(
                    "image decode requires PIL, which is not installed; "
                    "pass fake=True for the deterministic stand-in"
                )
            rows = []
            for i, blob in zip(pdf["__id__"], pdf["__bin__"]):
                data = np.frombuffer(blob or b"", dtype=np.uint8)
                if have_pil and not fake:  # pragma: no cover (no PIL here)
                    raise NotImplementedError("real decode path not wired")
                # deterministic fake: features = normalized 8-bin histogram
                h = (
                    np.bincount(data >> 5, minlength=8).astype("float32")
                    / max(data.size, 1)
                )
                rows.append(
                    (int(i), int(data.size), target_size[0], target_size[1], h.tolist())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "features"]
            )

    src = df.select(F.col(id_col).alias("__id__"), F.col(binary_col).alias("__bin__"))
    return src.mapInPandas(decode, schema=IMAGE_FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    binary_col: str,
    id_col: str = "doc_id",
    every_n_seconds: float = 1.0,
) -> DataFrame:
    """Frame sampling — requires ffmpeg/av (absent): the UDF signature,
    output schema (one row per sampled frame) and batching are defined so a
    decoder drop-in is mechanical."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_sec", T.DoubleType()),
            T.StructField("frame_png", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg/pyav, which is not installed"
        )
        yield  # pragma: no cover

    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("__bin__"))
    return src.mapInPandas(sample, schema=schema)
