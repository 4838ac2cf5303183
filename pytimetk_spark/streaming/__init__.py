from pytimetk_spark.streaming.stateful import (
    streaming_dedup_exact,
    streaming_running_ewm,
)
from pytimetk_spark.streaming.tiers_stream import streaming_tier_1h
