"""pytimetk_spark — a from-scratch, PySpark-native time-series rollup +
downsample + retention engine with the query/data capabilities of
business-science/pytimetk (reference at /root/reference, semantics only).

Design: everything is declared through the Spark DataFrame API so Catalyst
can optimize (predicate pushdown, partial aggregation, AQE skew handling);
Arrow-vectorized pandas UDFs are used only for inherently-sequential
per-series kernels (EWM recurrences, seasonal decomposition, Gorilla
bit-packing). No per-row Python anywhere.

Public surface mirrors SURVEY.md §2.
"""

from pytimetk_spark.config import get_spark, stop_spark
from pytimetk_spark.functions.datetime import (
    ceil_date,
    floor_date,
    normalize_freq,
    parse_freq,
    parse_human_duration,
    resample_label,
    week_of_month,
)
from pytimetk_spark.functions.selection import (
    contains,
    ends_with,
    matches,
    resolve_columns,
    starts_with,
)
from pytimetk_spark.operators.summarize_by_time import summarize_by_time
from pytimetk_spark.operators.asof_join import asof_join, interval_join, sessionize
from pytimetk_spark.operators.apply_by_time import apply_by_time
from pytimetk_spark.operators.pad_by_time import pad_by_time
from pytimetk_spark.operators.filter_by_time import filter_by_time, parse_end_date
from pytimetk_spark.operators.future_frame import (
    future_frame,
    make_future_timeseries,
)
from pytimetk_spark.operators.make_timeseries_sequence import (
    make_weekday_sequence,
    make_weekend_sequence,
)
from pytimetk_spark.operators.ts_summary import ts_summary
from pytimetk_spark.operators.frequency import (
    get_frequency,
    get_frequency_summary,
    get_seasonal_frequency,
    get_trend_frequency,
    median_observations_per_period,
)
from pytimetk_spark.operators.augment_shift import (
    augment_diffs,
    augment_lags,
    augment_leads,
    augment_pct_change,
)
from pytimetk_spark.operators.augment_rolling import (
    augment_expanding,
    augment_expanding_apply,
    augment_rolling,
    augment_rolling_apply,
)
from pytimetk_spark.operators.augment_ewm import augment_ewm
from pytimetk_spark.operators.signatures import (
    augment_fourier,
    augment_holiday_signature,
    augment_timeseries_signature,
    get_holiday_signature,
    get_timeseries_signature,
    holiday_dim,
    is_holiday,
)
from pytimetk_spark.functions.pandas_helpers import (
    drop_zero_variance,
    sort_dataframe,
    transform_columns,
)
from pytimetk_spark.operators.anomalize import anomalize
from pytimetk_spark.operators.binarize import binarize, correlate
from pytimetk_spark.operators import finance
from pytimetk_spark.operators.finance import (
    augment_adx,
    augment_atr,
    augment_bbands,
    augment_cmo,
    augment_drawdown,
    augment_ewma_volatility,
    augment_fip_momentum,
    augment_hurst_exponent,
    augment_macd,
    augment_ppo,
    augment_qsmomentum,
    augment_regime_detection,
    augment_roc,
    augment_rolling_risk_metrics,
    augment_rsi,
    augment_stochastic_oscillator,
)
from pytimetk_spark.operators.crossvalidation import (
    TimeSeriesCV,
    TimeSeriesCVSplitter,
)
from pytimetk_spark.operators.diagnostics import (
    acf_diagnostics,
    seasonal_diagnostics,
    stl_diagnostics,
    ts_features,
)
from pytimetk_spark.operators.transforms import (
    augment_hilbert,
    augment_spline,
    augment_wavelet,
)
from pytimetk_spark.feature_store import FeatureStore
from pytimetk_spark import rollup, sources, streaming, webtext
from pytimetk_spark.webtext import (
    cosine_topk_bruteforce,
    dedup_exact,
    document_fingerprint,
    ivf_ann,
    language_id,
    lsh_bucket_ann,
    minhash_dedup,
    quality_score,
    simhash,
    token_stats,
)
from pytimetk_spark.rollup import (
    gap_fill_tier,
    rollup_raw_to_tier,
    rollup_tier_to_tier,
    run_rollup,
    TierStore,
)

__version__ = "0.1.0"
