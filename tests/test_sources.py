"""Source/sink layer tests: pipe-separated time-series CSV round-trip
(S1-S3, TimeSeries.fromCSV/toCSV) and the profiles/predictions SQL store
(S4-S6, DataManager DDL + filtered ordered selects)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from phoebe_spark.sources.csv import read_timeseries_csv, write_timeseries_csv
from phoebe_spark.sources.tables import PROFILES_SCHEMA


def test_csv_roundtrip_with_nulls_and_malformed(spark, tmp_path):
    src = tmp_path / "ts.csv"
    src.write_text(
        "timestamp|value\n"
        "100|1.5\n"
        "101|null\n"          # literal null token (TimeSeries.toCSV writes these)
        "garbage|oops\n"      # malformed row -> skipped like fromCSV's per-line catch
        "102|3.25\n"
    )
    df = read_timeseries_csv(spark, str(src))
    rows = {r["timestamp"]: r["value"] for r in df.collect()}
    assert rows == {100: 1.5, 101: None, 102: 3.25}

    out = str(tmp_path / "out_csv")
    write_timeseries_csv(df, out, mode="overwrite")
    back = read_timeseries_csv(spark, out)
    assert {r["timestamp"]: r["value"] for r in back.collect()} == rows


def test_profile_store_sql(spark, tmp_path):
    """S4-S6: the reference's profiles table DDL + 'WHERE expId IN (...)
    AND genType = ... ORDER BY scaleOut, stopTs' select runs verbatim on a
    Spark temp view (DataManager.java:150-208)."""
    rows = [
        (1, "ADS", "profile_2_a", 2, 900.0, 20000.0, 0, 1000, 1120),
        (1, "ADS", "profile_2_b", 2, 1100.0, 40000.0, 1, 1200, 1320),
        (1, "ADS", "profile_5_a", 5, 850.0, 20000.0, 0, 1000, 1120),
        (2, "CARS", "profile_2_c", 2, 700.0, 15000.0, 0, 1000, 1120),
    ]
    df = spark.createDataFrame(rows, PROFILES_SCHEMA)
    df.createOrReplaceTempView("profiles")
    out = spark.sql(
        "SELECT * FROM profiles WHERE expId IN (1) AND genType = 'ADS' "
        "ORDER BY scaleOut ASC, stopTs ASC"
    ).collect()
    assert [r["jobName"] for r in out] == ["profile_2_a", "profile_2_b", "profile_5_a"]

    # S6 delete-equivalent on parquet: overwrite-filtered-write
    path = str(tmp_path / "profiles_store")
    df.write.mode("overwrite").parquet(path)
    kept = spark.read.parquet(path).filter(
        ~((F.col("expId") == 1) & (F.col("genType") == "ADS") & (F.col("isBckPres") == 1))
    )
    kept.write.mode("overwrite").parquet(str(tmp_path / "profiles_store2"))
    back = spark.read.parquet(str(tmp_path / "profiles_store2"))
    assert back.count() == 3
    assert back.filter("isBckPres = 1").count() == 0
