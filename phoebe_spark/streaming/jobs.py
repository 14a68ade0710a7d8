"""Structured Streaming equivalents of the reference's monitored jobs.

The Flink jobs Phoebe tunes (SURVEY §2.10; /root/reference/src/main/
resources/baseline.properties:10 ``YahooStreamingBenchmark``,
phoebe.properties:13 ``TopSpeedWindowing``) define the semantics:
Kafka source -> filter/join (static campaign table) -> keyed 10 s windowed
aggregation -> sink, with checkpointing and watermark-based late-data
handling. Kafka itself is transport; these builders work over any streaming
DataFrame (rate source, file source, kafka source) so tests can drive them
with file/rate sources while production uses
``spark.readStream.format("kafka")``.

Workload generation mirrors the reference's sine-modulated generators
(execution/Workload.java:56-67; prepare_model.py:24-47): a rate source
whose value column is reshaped by the C4 sine expression.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def sine_rate_source(
    spark: SparkSession,
    rows_per_second: int = 1000,
    amplitude: float = 100_000.0,
    vertical_phase: float = 100_000.0,
    period: int = 7_200,
    noise: float = 0.01,
    seed: int = 42,
    num_keys: int = 100,
) -> DataFrame:
    """Sine-modulated workload stream: rate source -> per-event value =
    ``abs((A*sin(2*pi*t/period) + V) * (1 + N(0, noise)))``, keyed by
    ``value % num_keys`` (the generator's per-key fan-out). Columns:
    (event_time TIMESTAMP, key LONG, value DOUBLE)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    t = F.unix_timestamp("timestamp").cast("double")
    base = amplitude * F.sin(F.lit(2 * math.pi) * (t % period) / period) + vertical_phase
    noisy = F.abs(base * (F.lit(1.0) + F.randn(seed) * noise))
    return rate.select(
        F.col("timestamp").alias("event_time"),
        (F.col("value") % num_keys).alias("key"),
        noisy.alias("value"),
    )


def dataset_replay_source(
    spark: SparkSession,
    series: DataFrame,
    rows_per_second: int = 1000,
    num_keys: int = 100,
    value_col: str = "value",
) -> DataFrame:
    """DATASET generator mode (``Graph.java:190-204`` SINE|DATASET;
    ``prepare_model.py:50-72`` replays the recorded CARS trace): each
    wall-clock second draws its value from the recorded 1 Hz trace, tiled
    modulo its length. The trace is indexed once (bounded, driver-side
    count + row_number) and joined to the rate stream as a stream-static
    broadcast join per micro-batch — no stream state, no shuffle of the
    stream. Columns: (event_time TIMESTAMP, key LONG, value DOUBLE)."""
    n = series.count()
    if n == 0:
        # pmod(t, 0) is NULL, so the join would match nothing and the
        # stream would run forever silently emitting zero rows
        raise ValueError("dataset_replay_source: the recorded trace is empty")
    w = Window.orderBy("timestamp")
    indexed = series.select(
        (F.row_number().over(w) - 1).alias("_idx"),
        F.col(value_col).cast("double").alias("_v"),
    )
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    t = F.unix_timestamp("timestamp")
    return rate.join(
        F.broadcast(indexed), F.pmod(t, F.lit(n)) == F.col("_idx")
    ).select(
        F.col("timestamp").alias("event_time"),
        (F.col("value") % num_keys).alias("key"),
        F.col("_v").alias("value"),
    )


def windowed_keyed_agg(
    stream: DataFrame,
    key_col: str = "key",
    ts_col: str = "event_time",
    value_col: str = "value",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Keyed tumbling-window aggregation with watermark — the shared shape
    of both target jobs (ad-counts per campaign per 10 s; per-car windowed
    top speed). ``aggs`` maps output name -> one of count/sum/avg/max/min
    over the value column; default matches both jobs: count + max.

    Scale notes: watermark bounds state (late rows beyond it are dropped —
    the reference monitors exactly this via consumer lag); the aggregation
    state is partitioned by (key, window), the natural uniform key."""
    aggs = aggs or {"events": "count", "max_value": "max"}
    fns = {
        "count": lambda c: F.count(F.lit(1)),
        "sum": lambda c: F.sum(c),
        "avg": lambda c: F.avg(c),
        "max": lambda c: F.max(c),
        "min": lambda c: F.min(c),
    }
    exprs = [fns[kind](value_col).alias(name) for name, kind in aggs.items()]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(*exprs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            *aggs.keys(),
        )
    )


def sessionized_agg(
    stream: DataFrame,
    key_col: str = "key",
    ts_col: str = "event_time",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via Spark's native session windows — the
    streaming twin of the batch q46 sessionize (gap-based session ids by
    window lag): events for a key closer than ``gap`` merge into one
    session whose window extends until the gap passes. State is bounded by
    the watermark (sessions older than it finalize and emit). Output:
    (session_start, session_end, key, events)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "events",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "event_time",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming exact dedup: drop records whose dedup key was already
    seen, keeping state only within the watermark horizon
    (``dropDuplicatesWithinWatermark``) — the in-flight twin of the batch
    exact dedup (operators/dedup.py), for at-least-once sources that
    re-deliver (Kafka producer retries, replayed partitions).

    Scale notes: state is hash-partitioned on the dedup key (uniform if
    the key is an id/fingerprint) and BOUNDED by the watermark — the
    classic unbounded-state trap of a plain streaming dropDuplicates is
    exactly what the within-watermark variant exists to avoid. Keys
    re-delivered farther apart than the watermark are the source's
    duplicate-window contract, not state the engine should hold forever.
    """
    keys = key_cols or ["key"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_static_join(
    stream: DataFrame, static_dim: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Stream-static equi-join (the ADS job's Redis campaign lookup,
    baseline.properties:25-26). Spark broadcasts the static side per
    micro-batch — no stream state, no shuffle of the stream."""
    return stream.join(F.broadcast(static_dim), on=on, how=how)


def stream_static_anti_dedup(
    stream: DataFrame,
    history: DataFrame,
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Streaming incremental dedup against a STATIC corpus history: keep
    only stream records whose fingerprint has never been seen in the
    history frame — the in-flight twin of the batch daily-drop dedup
    (queries.py q102), for ingest pipelines where the deduped corpus
    accumulates between runs.

    Scale notes: the history reduces to its DISTINCT fingerprints (the
    only state that matters) and joins left_anti per micro-batch. Spark
    broadcasts it when small; for corpus-scale histories leave off the
    broadcast hint and let the micro-batch shuffle-join — either way no
    streaming state accrues (the history is static; within-stream
    re-deliveries are streaming_dedup's job, composable upstream)."""
    fps = history.select(fingerprint_col).distinct()
    return stream.join(fps, on=fingerprint_col, how="left_anti")


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S8 Kafka transport, source side (``execution/Job.java:94-99``
    --brokerList/--consumerTopic): value bytes + event timestamp. Requires
    a broker + the spark-sql-kafka package at runtime; semantics-only here
    (no broker in the test container)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(
            F.col("timestamp").alias("event_time"),
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
    )


def kafka_sink(result: DataFrame, brokers: str, topic: str, checkpoint_dir: str):
    """S8 Kafka transport, sink side (--producerTopic): rows serialized to
    the value column; exactly-once via the checkpoint."""
    payload = result.select(
        F.to_json(F.struct(*result.columns)).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )


def run_to_sink(
    result: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "append",
    queryName: str | None = None,
    fmt: str = "memory",
    trigger_available_now: bool = True,
    **options,
):
    """Start the query with a checkpoint (exactly-once restart point —
    the reference's ``--chkInterval`` / savepoint-restore mechanism maps to
    the checkpoint directory here; rescaling = stop + restart the same
    checkpoint with a different ``spark.sql.shuffle.partitions``)."""
    if fmt == "memory" and not queryName:
        raise ValueError(
            "run_to_sink: the memory sink requires queryName (it names the "
            "in-memory table)"
        )
    w = (
        result.writeStream.outputMode(output_mode)
        .format(fmt)
        .option("checkpointLocation", checkpoint_dir)
    )
    if queryName:
        w = w.queryName(queryName)
    for k, v in options.items():
        w = w.option(k, v)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "key",
    ts_col: str = "event_time",
    left_watermark: str = "30 seconds",
    right_watermark: str = "30 seconds",
    upper: str = "10 seconds",
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Watermarked stream-stream interval join — the canonical streaming
    enrichment shape (impression x click attribution: each left event
    matches right events with the same key inside ``(left.ts, left.ts +
    upper]``). Both sides carry watermarks plus the time-range predicate,
    which is exactly what lets Spark BOUND THE JOIN STATE: a buffered left
    row is dropped once the right watermark passes ``left.ts + upper``
    (and vice versa) instead of accumulating forever — the stream-stream
    analog of the windowed-agg state bound the reference monitors via
    consumer lag. State is partitioned by the join key, the natural
    uniform key at scale. Outer variants emit nulls only after the
    watermark proves no match can arrive.

    Value columns are suffixed; output keeps the left timestamps plus the
    matched right timestamp.
    """
    lt, rt = f"{ts_col}{suffixes[0]}", f"{ts_col}{suffixes[1]}"
    l = left.select(
        F.col(key_col),
        F.col(ts_col).alias(lt),
        *[F.col(c).alias(f"{c}{suffixes[0]}") for c in left.columns if c not in (key_col, ts_col)],
    ).withWatermark(lt, left_watermark)
    r = right.select(
        F.col(key_col).alias("_rkey"),
        F.col(ts_col).alias(rt),
        *[F.col(c).alias(f"{c}{suffixes[1]}") for c in right.columns if c not in (key_col, ts_col)],
    ).withWatermark(rt, right_watermark)
    cond = (
        (F.col(key_col) == F.col("_rkey"))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {upper}"))
    )
    joined = l.join(r, cond, how)
    # outer variants: an unmatched right row has NULL in the left-side key
    # column — restore it from the right key before dropping the alias, so
    # right_outer/full_outer rows stay attributable
    return joined.withColumn(key_col, F.coalesce(F.col(key_col), F.col("_rkey"))).drop(
        "_rkey"
    )
