from phoebe_spark.streaming.jobs import (
    sine_rate_source,
    stream_static_join,
    windowed_keyed_agg,
)
from phoebe_spark.streaming.metrics import ProgressMetricsListener, detect_backpressure

__all__ = [
    "sine_rate_source",
    "stream_static_join",
    "windowed_keyed_agg",
    "ProgressMetricsListener",
    "detect_backpressure",
]
