"""applyInPandasWithState operator: per-key EWMA must match the batch
pandas ewm(adjust=False) result after the stream drains, and state must
persist across batches (maxFilesPerTrigger=1 forces multiple batches)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from phoebe_spark.streaming.jobs import run_to_sink
from phoebe_spark.streaming.stateful import keyed_ewma
from phoebe_spark.sources.testdata import load_table


def test_keyed_ewma_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stream_src")
    df = load_table(spark, sf_dir, "events")
    # range-partition by time so file order == event-time order: EWMA is
    # order-sensitive, and micro-batches replay files in order
    # microsecond timestamps (unique per key -> total fold order), and the
    # three time slices written sequentially: the file stream replays files
    # in modification-time order, so slice order must match time order
    import time as _time

    base = df.select(
        F.expr("timestamp_micros(ts div 1000)").alias("event_time"),
        F.col("event_type").alias("key"),
        "value",
    )
    bounds = base.selectExpr(
        "percentile(CAST(event_time AS DOUBLE), 0.33) b1",
        "percentile(CAST(event_time AS DOUBLE), 0.66) b2",
    ).collect()[0]
    slices = [
        base.filter(F.col("event_time").cast("double") <= bounds["b1"]),
        base.filter(
            (F.col("event_time").cast("double") > bounds["b1"])
            & (F.col("event_time").cast("double") <= bounds["b2"])
        ),
        base.filter(F.col("event_time").cast("double") > bounds["b2"]),
    ]
    for s in slices:
        s.coalesce(1).sortWithinPartitions("event_time").write.mode("append").parquet(src)
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema("event_time TIMESTAMP, key STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = keyed_ewma(stream, alpha=0.3)
    q = run_to_sink(out, str(tmp_path / "ck"), output_mode="update", queryName="ewma_q")
    q.awaitTermination(120)
    q.stop()

    # last emitted row per key carries the final folded state
    got = (
        spark.sql("SELECT * FROM ewma_q")
        .withColumn("_rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("key").orderBy(F.col("n_obs").desc())
        ))
        .filter("_rn = 1")
        .collect()
    )
    got_map = {r["key"]: (r["ewma"], r["n_obs"]) for r in got}

    pdf = spark.read.parquet(src).toPandas().sort_values(["key", "event_time"])
    for key, grp in pdf.groupby("key"):
        expected = grp["value"].ewm(alpha=0.3, adjust=False).mean().iloc[-1]
        ewma, n = got_map[key]
        assert n == len(grp)
        assert ewma == pytest.approx(expected, rel=1e-9), key
