"""The PROFILE stage FSM (M9) — the profiling loop that surrounds the
validity math (A12/A13) and feeds the profile store.

Reference (/root/reference/src/main/java/de/tu_berlin/dos/phoebe/execution/
phoebe/Graph.java:51-138): start one profiling job per scale-out candidate,
then loop through increasing workloads; each round, record the trailing
avgLat/avgThr of every still-active job into the ``profiles`` store
(isBckPres=0), evaluate which scale-outs remain valid — pairwise
relative-distance clustering when more than two candidates survive
(``utils/Evaluate.java:13-39``), per-candidate regression extrapolation
otherwise (``:41-56``) — and stop the jobs that dropped out. When every job
has dropped out, run one capacity round per job from the earliest offset
(the job under deliberate backpressure) and record it with isBckPres=1
(``Graph.java:122-138``).

Spark-first split: measurement is pluggable (in production a Structured
Streaming job + ProgressMetricsListener per scale-out; in tests a stub),
the store writes are partitioned parquet inserts (sources/tables.py), and
the per-round validity evaluation is a DataFrame computation over the
store — ``max_by`` lasts, a self-join peer count, and covar/var OLS — so
the same code evaluates 10 candidates or 10 million rows of accumulated
profile history with partition pruning.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from phoebe_spark.sources.tables import insert_profiles, select_profiles


@dataclass
class ProfilingJob:
    """A latency-profiling job pinned to one scale-out (``execution/Job``)."""

    name: str
    scale_out: int
    active: bool = True
    rounds: int = 0
    stopped_after: int | None = None


@dataclass
class ProfilingReport:
    """What the PROFILE stage learned, for the MODEL stage that follows."""

    rounds: int
    jobs: list[ProfilingJob]
    valid_history: list[dict[int, float]] = field(default_factory=list)


def latest_per_scale_out(profiles: DataFrame) -> DataFrame:
    """Last (by stopTs) avgLat per scaleOut — ``TimeSeries.getLast`` over
    the per-candidate series, as one ``max_by`` aggregation."""
    return profiles.groupBy("scaleOut").agg(
        F.max_by("avgLat", "stopTs").alias("last_lat"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def clustering_validity(profiles: DataFrame, distance: float = 2.0) -> DataFrame:
    """A12 / ``Evaluate.clustering``: each candidate's LAST latency counts
    peers within ``distance`` relative error; candidates in the largest
    agreement group are valid. Self-join on the per-candidate lasts — the
    candidate set is the scale-out range, so the join is bounded and
    broadcastable."""
    last = latest_per_scale_out(profiles).select("scaleOut", "last_lat")
    a = last.alias("a")
    b = last.alias("b")
    peers = (
        a.join(
            F.broadcast(b),
            (F.col("a.scaleOut") != F.col("b.scaleOut"))
            & (F.abs(F.try_divide(F.col("a.last_lat") - F.col("b.last_lat"), F.col("b.last_lat"))) < distance),
            "left",
        )
        .groupBy(F.col("a.scaleOut").alias("scaleOut"), F.col("a.last_lat").alias("last_lat"))
        .agg(F.count(F.col("b.scaleOut")).alias("peers"))
    )
    mx = peers.agg(F.max("peers").alias("mx"))
    return (
        peers.join(F.broadcast(mx))
        .filter(F.col("peers") == F.col("mx"))
        .select("scaleOut", F.col("last_lat").alias("valid_lat"))
    )


def regression_validity(profiles: DataFrame, distance: float = 2.0) -> DataFrame:
    """A13 / ``Evaluate.regression``: per candidate, OLS over all
    observations but the last (x = stopTs - firstTs), extrapolate to the
    last timestamp; valid when the realized last latency is within
    ``distance`` relative error of the prediction. covar/var per group —
    one aggregation, no window over the full history."""
    w_first = F.min("stopTs").over(Window.partitionBy("scaleOut"))
    w_last = F.max("stopTs").over(Window.partitionBy("scaleOut"))
    obs = profiles.select(
        "scaleOut",
        "avgLat",
        "stopTs",
        (F.col("stopTs") - w_first).cast("double").alias("x"),
        (w_last - w_first).cast("double").alias("x_last"),
        (F.col("stopTs") == w_last).alias("is_last"),
    )
    fit = obs.filter(~F.col("is_last")).groupBy("scaleOut").agg(
        F.try_divide(F.covar_pop("x", "avgLat"), F.var_pop("x")).alias("slope"),
        F.avg("avgLat").alias("ybar"),
        F.avg("x").alias("xbar"),
    )
    last = obs.filter(F.col("is_last")).select(
        "scaleOut", F.col("avgLat").alias("last_lat"), F.col("x_last")
    )
    pred = F.when(
        F.col("slope").isNull() | F.isnan("slope"), F.col("ybar")
    ).otherwise(F.col("ybar") + F.col("slope") * (F.col("x_last") - F.col("xbar")))
    return (
        last.join(F.broadcast(fit), "scaleOut")
        .withColumn("pred", pred)
        .filter(F.abs(F.try_divide(F.col("last_lat") - F.col("pred"), F.col("pred"))) < distance)
        .select("scaleOut", F.col("last_lat").alias("valid_lat"))
    )


def evaluate_validity(profiles: DataFrame, distance: float = 2.0) -> dict[int, float]:
    """``Graph.java:120-121``: clustering when more than two candidates are
    in play, regression otherwise. Returns {scaleOut: last valid latency}."""
    n = profiles.select("scaleOut").distinct().count()
    df = clustering_validity(profiles, distance) if n > 2 else regression_validity(profiles, distance)
    return {int(r["scaleOut"]): float(r["valid_lat"]) for r in df.collect()}


def profiling_run(
    spark: SparkSession,
    jobs: list[ProfilingJob],
    workloads: Iterator,
    measure: Callable[[ProfilingJob, object], tuple[int, int, float, float]],
    exp_id: int,
    gen_type: str,
    distance: float = 2.0,
    measure_capacity: Callable[[ProfilingJob], tuple[int, int, float, float]] | None = None,
    stop_job: Callable[[ProfilingJob], None] | None = None,
    max_rounds: int = 100,
) -> ProfilingReport:
    """The PROFILE loop (``Graph.java:66-138``).

    ``measure(job, workload) -> (startTs, stopTs, avgLat, avgThr)`` is the
    evaluation-interval measurement (the reference's 300 s + avgWindow run
    followed by trailing averages); ``measure_capacity`` the
    earliest-offset backpressure run. Every round appends one profile row
    per active job, re-evaluates validity over the accumulated store rows
    for still-active scale-outs, and stops dropped-out jobs. ``max_rounds``
    bounds the loop if the workload iterator never saturates every job."""
    valid_history: list[dict[int, float]] = []
    rounds = 0
    while any(j.active for j in jobs) and rounds < max_rounds:
        try:
            workload = next(workloads)
        except StopIteration:
            break
        rounds += 1
        rows = []
        for job in jobs:
            if not job.active:
                continue
            start_ts, stop_ts, avg_lat, avg_thr = measure(job, workload)
            job.rounds += 1
            rows.append(
                (exp_id, gen_type, job.name, job.scale_out,
                 float(avg_lat), float(avg_thr), 0, int(start_ts), int(stop_ts))
            )
        insert_profiles(spark, rows)
        active_sos = [j.scale_out for j in jobs if j.active]
        stored = select_profiles(spark, [exp_id], gen_type).filter(
            (F.col("isBckPres") == 0) & F.col("scaleOut").isin(active_sos)
        )
        valid = evaluate_validity(stored, distance)
        valid_history.append(valid)
        for job in jobs:
            if job.active and job.scale_out not in valid:
                job.active = False
                job.stopped_after = rounds
                if stop_job is not None:
                    stop_job(job)
    if measure_capacity is not None:
        cap_rows = []
        for job in jobs:
            start_ts, stop_ts, avg_lat, avg_thr = measure_capacity(job)
            cap_rows.append(
                (exp_id, gen_type, job.name, job.scale_out,
                 float(avg_lat), float(avg_thr), 1, int(start_ts), int(stop_ts))
            )
        insert_profiles(spark, cap_rows)
    return ProfilingReport(rounds=rounds, jobs=jobs, valid_history=valid_history)
