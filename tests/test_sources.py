"""Source/sink layer tests: pipe-separated time-series CSV round-trip
(S1-S3, TimeSeries.fromCSV/toCSV) and the profiles/predictions SQL store
(S4-S6, DataManager DDL + filtered ordered selects)."""

from __future__ import annotations

import os

from phoebe_spark.sources.csv import read_timeseries_csv, write_timeseries_csv


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


def test_profile_store_roundtrip(spark, tmp_path):
    """S4-S6 against the real store API: DDL, addProfile, deleteRow
    (expId/genType/isBckPres), initProfiles removePrevious (both flags),
    and the filtered ordered select (DataManager.java:148-214)."""
    from phoebe_spark.sources import tables as store

    spark.sql("DROP TABLE IF EXISTS profiles")
    spark.sql("DROP TABLE IF EXISTS predictions")
    store.create_profile_store(spark, str(tmp_path / "store"))
    rows = [
        (1, "ADS", "profile_2_a", 2, 900.0, 20000.0, 0, 1000, 1120),
        (1, "ADS", "profile_2_b", 2, 1100.0, 40000.0, 1, 1200, 1320),
        (1, "ADS", "profile_5_a", 5, 850.0, 20000.0, 0, 1000, 1120),
        (2, "CARS", "profile_2_c", 2, 700.0, 15000.0, 0, 1000, 1120),
    ]
    store.insert_profiles(spark, rows)

    out = store.select_profiles(spark, [1], "ADS").collect()
    assert [r["jobName"] for r in out] == ["profile_2_a", "profile_2_b", "profile_5_a"]
    # reference column order preserved on read-back
    assert list(out[0].asDict()) == list(store.PROFILE_COLS)

    # deleteRow: only the (1, ADS, isBckPres=1) partition is cleared
    store.delete_profiles(spark, 1, "ADS", is_bck_pres=1)
    out = store.select_profiles(spark, [1], "ADS").collect()
    assert [r["jobName"] for r in out] == ["profile_2_a", "profile_5_a"]
    assert store.select_profiles(spark, [2], "CARS").count() == 1

    # initProfiles(removePrevious): both backpressure flags go
    store.delete_profiles(spark, 1, "ADS")
    assert store.select_profiles(spark, [1], "ADS").count() == 0
    assert store.select_profiles(spark, [2], "CARS").count() == 1

    spark.sql("DROP TABLE IF EXISTS profiles")
    spark.sql("DROP TABLE IF EXISTS predictions")


def test_predictions_store_roundtrip(spark, tmp_path):
    """addPrediction / getPredictions / initPredictions(removePrevious)
    (DataManager.java:218-266)."""
    from phoebe_spark.sources import tables as store

    spark.sql("DROP TABLE IF EXISTS profiles")
    spark.sql("DROP TABLE IF EXISTS predictions")
    store.create_profile_store(spark, str(tmp_path / "store"))
    store.insert_prediction(spark, 1, "ADS", 2000, 8, 30000.0, 950.0, 120.5)
    store.insert_prediction(spark, 1, "ADS", 1000, 4, 20000.0, 900.0, 100.0)
    store.insert_prediction(spark, 2, "CARS", 1500, 6, 25000.0, 800.0, 90.0)

    out = store.select_predictions(spark, [1, 2]).collect()
    assert [(r["expId"], r["timestamp"]) for r in out] == [(1, 1000), (1, 2000), (2, 1500)]
    assert list(out[0].asDict()) == list(store.PREDICTION_COLS)

    store.delete_predictions(spark, 1, "ADS")
    assert [r["expId"] for r in store.select_predictions(spark, [1, 2]).collect()] == [2]

    spark.sql("DROP TABLE IF EXISTS profiles")
    spark.sql("DROP TABLE IF EXISTS predictions")


def test_jsonl_roundtrip_and_malformed(spark, tmp_path):
    """JSONL write/read round-trip preserves values and types; malformed
    lines surface as all-null rows in PERMISSIVE mode instead of failing
    the read."""
    from phoebe_spark.sources.jsonl import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, 'quote " and \\ backslash', 3.5), (2, "unicode é中", -1.0)],
        "id long, s string, v double",
    )
    path = str(tmp_path / "jl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, "id long, s string, v double")
    assert sorted((r["id"], r["s"], r["v"]) for r in back.collect()) == [
        (1, 'quote " and \\ backslash', 3.5),
        (2, "unicode é中", -1.0),
    ]

    # add a new part-file containing a malformed line (appending to an
    # existing part would trip Spark's cached file-size metadata)
    with open(os.path.join(path, "part-99999-manual.json"), "w") as f:
        f.write("{not json at all\n")
    spark.catalog.refreshByPath(path)
    rows = read_jsonl(spark, path, "id long, s string, v double").collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if r["id"] is None and r["s"] is None) == 1


def test_load_table_plan_cache_reuses_within_session(spark, sf_dir):
    """load_table memoizes the UNRESOLVED DataFrame per (session, dir,
    table) — same object back on a repeat call (no second schema-inference
    pass), distinct entries per table, and every action still computes
    from parquet (no data/result caching: the plan has no InMemoryRelation
    and collects fresh rows)."""
    from phoebe_spark.sources.testdata import load_table

    a = load_table(spark, sf_dir, "documents")
    b = load_table(spark, sf_dir, "documents")
    assert a is b
    c = load_table(spark, sf_dir, "orders")
    assert c is not a
    # no materialization in the cached plan
    assert "InMemoryRelation" not in a._jdf.queryExecution().optimizedPlan().toString()
    assert a.count() > 0
    # events keeps its canonical epoch-nanos BIGINT ts through the cache
    ev = load_table(spark, sf_dir, "events")
    assert ev is load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "bigint"
