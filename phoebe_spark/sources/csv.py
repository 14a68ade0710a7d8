"""Pipe-separated time-series CSV scan/sink (SURVEY S1-S3).

The reference reads/writes ``timestamp|value`` files with literal ``null``
tokens for missing values (``structures/TimeSeries.java:53-107``;
``analytics/app/prepare_model.py:53``). Malformed rows are skipped
(``fromCSV`` catches parse errors per line) — mirrored via PERMISSIVE mode +
dropping rows whose timestamp failed to parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_SCHEMA = "timestamp LONG, value DOUBLE"


def read_timeseries_csv(
    spark: SparkSession, path: str, sep: str = "|", header: bool = True
) -> DataFrame:
    """Scan a ``timestamp{sep}value`` file into the dense-series schema.
    ``nullValue='null'`` maps the reference's literal null token; malformed
    timestamps are dropped like ``TimeSeries.fromCSV``'s per-line catch
    (``TimeSeries.java:63-80``)."""
    df = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("nullValue", "null")
        .option("mode", "PERMISSIVE")
        .schema(TS_SCHEMA)
        .csv(path)
    )
    return df.filter(F.col("timestamp").isNotNull())


def write_timeseries_csv(df: DataFrame, path: str, sep: str = "|", mode: str = "append") -> None:
    """Append-style sink mirroring ``TimeSeries.toCSV``
    (``TimeSeries.java:87-107``). Spark writes a directory of part files —
    the distributed equivalent of the reference's single append file."""
    (
        df.select("timestamp", "value")
        .write.mode(mode)
        .option("sep", sep)
        .option("header", "true")
        .option("nullValue", "null")
        .csv(path)
    )
