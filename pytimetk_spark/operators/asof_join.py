"""As-of (nearest-key) join and gap-based sessionization.

The reference engine (pytimetk) has no as-of join; pandas users reach for
``pd.merge_asof`` (its semantics are replicated here) and every serious
timeseries store (kdb aj, QuestDB/DuckDB ASOF JOIN) treats it as core, so
this engine ships one as a first-class operator.

Spark-first design — NO range join, NO per-row Python:
the classic distributed as-of plan is union-align: tag left/right rows,
union them on a common schema, and run ONE window per group ordered by
(ts, side) where right rows sort before left rows at equal timestamps;
``last(col, ignorenulls=True)`` over the unbounded-preceding frame then
propagates the most recent right-hand values onto every left row. One
shuffle (the window partition), linear work, no candidate-pair blowup —
the same plan shape scales to 100 TB because each group's rows stay
together and the window is a single pass. A broadcast range join would
explode on dense right sides; this never materializes pairs at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pytimetk_spark.functions.windows import ordered_window, warn_single_partition


def _ord(ts_col: str) -> Column:
    """Ordering key: timestamps sort as epoch doubles so numeric and
    timestamp 'on' keys share one code path."""
    return F.col(ts_col)


def _as_double(c: Column, dtype) -> Column:
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    by: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """``pd.merge_asof`` semantics on DataFrames.

    For every left row, attach the right row whose key is the closest
    <= (backward), >= (forward), or nearest (ties -> backward, as pandas)
    within ``tolerance`` (seconds for timestamp keys, same units for
    numeric keys). Right rows must be unique per (by, right_on) for a
    deterministic result (as-of sources — quotes, sensor states — are).

    Right value columns that clash with left column names get ``suffix``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    by = list(by or [])
    right_on = right_on or left_on
    rcols = [c for c in right.columns if c != right_on and c not in by]
    mapping = {c: (c + suffix if c in left.columns else c) for c in rcols}
    out_right = [mapping[c] for c in rcols]

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltype = left.schema[left_on].dataType

    lcols = left.columns
    l2 = left.select(
        *lcols,
        *[F.lit(None).cast(rtypes[c]).alias(mapping[c]) for c in rcols],
        F.lit(None).cast(ltype).alias("__rts__"),
        F.lit(0).alias("__src__"),
    )
    # pd.merge_asof rejects null keys outright; a null right_on row would
    # otherwise sort nulls-first and its non-null packed struct could attach
    # to left rows with no real match (ADVICE r4).
    right = right.filter(F.col(right_on).isNotNull())
    r2 = right.select(
        *[
            (
                F.col(right_on).cast(ltype).alias(c)
                if c == left_on
                else (F.col(c) if c in by else F.lit(None).cast(t).alias(c))
            )
            for c, t in [(n, f.dataType) for n, f in zip(lcols, left.schema.fields)]
        ],
        *[F.col(c).alias(mapping[c]) for c in rcols],
        F.col(right_on).cast(ltype).alias("__rts__"),
        F.lit(1).alias("__src__"),
    )
    both = l2.unionByName(r2)

    lts = _as_double(F.col(left_on), ltype)

    # ONE packed struct per right row (null on left rows) so that
    # last(..., ignorenulls=True) propagates the WHOLE matched row: a
    # nullable right value column stays NULL when the matched row's field
    # is NULL instead of leaking a stale value from an older right row,
    # and tolerance is checked against the same row the values came from.
    pack = F.when(
        F.col("__src__") == 1,
        F.struct(
            F.col("__rts__").alias("__mts__"),
            *[F.col(o).alias(o) for o in out_right],
        ),
    )

    def _matched(desc: bool) -> Column:
        # right rows must be visible to left rows at the SAME key value:
        # ascending -> right (src=1) sorts first via src DESC;
        # descending (forward) -> likewise right first at equal keys
        order = [
            _ord(left_on).desc() if desc else _ord(left_on).asc(),
            F.col("__src__").desc(),
        ]
        if not by:
            warn_single_partition("asof_join")
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last(pack, ignorenulls=True).over(w)

    if direction in ("backward", "forward"):
        m = _matched(desc=(direction == "forward"))
        out = both.select(*lcols, "__src__", m.alias("__m__")).filter(
            F.col("__src__") == 0
        )
        mts = F.col("__m__").getField("__mts__")
        dist = F.abs(lts - _as_double(mts, ltype))
        # gate on the matched TIMESTAMP, not the struct: the struct is
        # non-null for any matched right row, __mts__ is the proof the match
        # carries a real key (ADVICE r4)
        keep = mts.isNotNull()
        if tolerance is not None:
            keep = keep & (dist <= F.lit(float(tolerance)))
        return out.select(
            *lcols,
            *[
                F.when(keep, F.col("__m__").getField(o)).alias(o)
                for o in out_right
            ],
        )

    # nearest: evaluate both sides, pick the closer (tie -> backward)
    sel = both.select(
        *lcols, "__src__",
        _matched(desc=False).alias("__b__"),
        _matched(desc=True).alias("__f__"),
    ).filter(F.col("__src__") == 0)
    bts = F.col("__b__").getField("__mts__")
    fts = F.col("__f__").getField("__mts__")
    bd = F.abs(lts - _as_double(bts, ltype))
    fd = F.abs(_as_double(fts, ltype) - lts)
    if tolerance is not None:
        tol = F.lit(float(tolerance))
        bd = F.when(bd <= tol, bd)
        fd = F.when(fd <= tol, fd)
    use_b = F.col("__b__").isNotNull() & bd.isNotNull() & (
        F.col("__f__").isNull() | fd.isNull() | (bd <= fd)
    )
    use_f = ~use_b & F.col("__f__").isNotNull() & fd.isNotNull()
    return sel.select(
        *lcols,
        *[
            F.when(use_b, F.col("__b__").getField(o))
            .when(use_f, F.col("__f__").getField(o))
            .alias(o)
            for o in out_right
        ],
    )


def sessionize(
    df: DataFrame,
    date_column: str,
    gap: float,
    group_cols: Sequence[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event in the group exceeds ``gap`` seconds. Adds an
    integer ``session_col`` (0-based per group, chronological).

    Same islands construction Structured Streaming's ``session_window``
    performs incrementally; batch form is one window pass (one shuffle on
    ``group_cols``) — scales linearly, no self-join.
    """
    group_cols = list(group_cols or [])
    w = ordered_window(group_cols, date_column, "sessionize")
    ts = F.col(date_column).cast("timestamp").cast("double")
    prev = F.lag(ts).over(w)
    new_sess = F.when(prev.isNull() | ((ts - prev) > float(gap)), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long")
        - 1,
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] | None = None,
    bucket_seconds: float = 3600.0,
    closed: str = "both",
) -> DataFrame:
    """Join each point row to every interval row containing its timestamp
    (``start <= ts <= end``, configurable ``closed``: 'both'|'left'|
    'right'|'neither'), optionally per ``by`` group.

    Spark-first: a naive ``points JOIN intervals ON ts BETWEEN s AND e``
    is a broadcast-nested-loop (all-pairs) theta join — quadratic at
    scale. Here both sides are mapped onto a time-bucket grid first:
    intervals explode to the buckets they overlap (``sequence()`` on the
    bucket index — intervals are assumed short relative to the data span,
    the usual shape for sessions/outages/campaigns), points map to ONE
    bucket, and the join is a hash equi-join on (by…, bucket) with the
    exact range predicate applied as a cheap post-filter. Work scales with
    true overlap density, never |points|×|intervals|.
    """
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError("closed must be 'both', 'left', 'right' or 'neither'")
    by = list(by or [])
    b = float(bucket_seconds)
    p_ts = F.col(ts_col).cast("timestamp").cast("double")
    i_s = F.col(start_col).cast("timestamp").cast("double")
    i_e = F.col(end_col).cast("timestamp").cast("double")

    iv = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.floor(i_s / F.lit(b)).cast("long"),
                F.floor(i_e / F.lit(b)).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bucket__", F.floor(p_ts / F.lit(b)).cast("long"))
    lo_ok = p_ts >= i_s if closed in ("both", "left") else p_ts > i_s
    hi_ok = p_ts <= i_e if closed in ("both", "right") else p_ts < i_e
    out = pt.join(iv, on=[*by, "__bucket__"], how="inner").filter(lo_ok & hi_ok)
    return out.drop("__bucket__")
