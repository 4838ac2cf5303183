"""pytimetk_spark — a from-scratch, PySpark-native time-series rollup +
downsample + retention engine with the query/data capabilities of
business-science/pytimetk (reference at /root/reference, semantics only).

Design: everything is declared through the Spark DataFrame API so Catalyst
can optimize (predicate pushdown, partial aggregation, AQE skew handling);
Arrow-vectorized pandas UDFs are used only for inherently-sequential
per-series kernels (EWM recurrences, seasonal decomposition, Gorilla
bit-packing). No per-row Python anywhere.

Public surface mirrors SURVEY.md §2. Exports are appended as modules land.
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

__version__ = "0.1.0"
