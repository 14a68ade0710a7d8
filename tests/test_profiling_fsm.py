"""M9 profiling FSM (``Graph.java:51-138``): grow the workload until every
scale-out candidate drops out, recording profiles each round, evaluating
validity (clustering >2 candidates, regression otherwise), stopping
dropped-out jobs, then one capacity (backpressure) round per job."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from phoebe_spark.plans.profiling import (
    ProfilingJob,
    clustering_validity,
    evaluate_validity,
    profiling_run,
    regression_validity,
)
from phoebe_spark.sources import tables as store


def _lat(scale_out: int, rate: float) -> float:
    """Synthetic latency curve: flat at 10 ms until the job's capacity
    (300 ev/s per scale-out step), then a hard blow-up."""
    cap = 300.0 * scale_out
    return 10.0 if rate <= cap else 10.0 * (rate / cap) ** 5


@pytest.fixture
def fresh_store(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS profiles")
    spark.sql("DROP TABLE IF EXISTS predictions")
    store.create_profile_store(spark, str(tmp_path / "store"))
    yield
    spark.sql("DROP TABLE IF EXISTS profiles")
    spark.sql("DROP TABLE IF EXISTS predictions")


def test_profiling_fsm_dropout_and_capacity(spark, fresh_store):
    jobs = [ProfilingJob(f"profile_{so}", so) for so in (2, 4, 6, 8)]
    rates = (100.0 * 4**k for k in itertools.count(1))  # 400, 1600, 6400, ...
    stopped = []

    def measure(job, rate):
        stop_ts = 1000 * job.rounds + 1000 + job.scale_out
        return stop_ts - 120, stop_ts, _lat(job.scale_out, rate), min(rate, 300.0 * job.scale_out)

    def measure_capacity(job):
        return 90000, 90120, 5000.0, 300.0 * job.scale_out

    report = profiling_run(
        spark,
        jobs,
        rates,
        measure,
        exp_id=7,
        gen_type="ADS",
        measure_capacity=measure_capacity,
        stop_job=lambda j: stopped.append(j.scale_out),
    )

    # every job eventually dropped out, smaller scale-outs first
    assert all(not j.active for j in jobs)
    by_so = {j.scale_out: j.stopped_after for j in jobs}
    assert by_so[2] <= by_so[4] <= by_so[6] <= by_so[8]
    assert stopped[0] == 2 and set(stopped) == {2, 4, 6, 8}
    assert report.rounds == max(by_so.values())

    # the store holds one isBckPres=0 row per (job, survived round) and one
    # capacity row (isBckPres=1) per job
    rows = store.select_profiles(spark, [7], "ADS")
    n_profile = rows.filter(F.col("isBckPres") == 0).count()
    assert n_profile == sum(j.rounds for j in jobs)
    cap = rows.filter(F.col("isBckPres") == 1)
    assert cap.count() == 4
    assert {r["scaleOut"] for r in cap.collect()} == {2, 4, 6, 8}

    # first round had every candidate in one agreement cluster
    assert set(report.valid_history[0]) == {2, 4, 6, 8}


def test_clustering_validity_drops_outlier(spark):
    # lasts: three candidates near 100, one blown up at 5000
    rows = [
        (so, 100.0 + so, 1000 + so) for so in (2, 4, 6)
    ] + [(8, 5000.0, 1008)]
    df = spark.createDataFrame(rows, "scaleOut INT, avgLat DOUBLE, stopTs LONG")
    valid = {r["scaleOut"] for r in clustering_validity(df, distance=2.0).collect()}
    assert valid == {2, 4, 6}


def test_clustering_uses_last_observation(spark):
    # candidate 4's HISTORY is awful but its last value rejoins the cluster
    rows = [(2, 100.0, 1000), (2, 101.0, 2000),
            (4, 9000.0, 1000), (4, 99.0, 2000),
            (6, 102.0, 2000)]
    df = spark.createDataFrame(rows, "scaleOut INT, avgLat DOUBLE, stopTs LONG")
    valid = {r["scaleOut"] for r in clustering_validity(df, distance=2.0).collect()}
    assert valid == {2, 4, 6}


def test_regression_validity_extrapolation(spark):
    # candidate 2: linear history, last point on trend -> valid;
    # candidate 4: last point explodes off its own trend -> invalid
    rows = []
    for i in range(5):
        rows.append((2, 100.0 + 10 * i, 1000 + 1000 * i))
        rows.append((4, 100.0 + 10 * i, 1000 + 1000 * i))
    rows.append((2, 160.0, 7000))   # trend predicts ~160
    rows.append((4, 9000.0, 7000))  # trend predicts ~160, observed 9000
    df = spark.createDataFrame(rows, "scaleOut INT, avgLat DOUBLE, stopTs LONG")
    valid = {r["scaleOut"] for r in regression_validity(df, distance=2.0).collect()}
    assert valid == {2}


def test_evaluate_validity_switches_rule(spark):
    # 2 candidates -> regression branch; flat histories, on-trend lasts
    rows = [(so, 100.0, 1000 * i) for so in (2, 4) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "scaleOut INT, avgLat DOUBLE, stopTs LONG")
    assert set(evaluate_validity(df, 2.0)) == {2, 4}
