"""Unit tests for the single-partition-sort plan guard — including the
injected-regression case that reproduces q321's round-8 escape (an
unpartitioned rank window over a corpus-rate frame, hidden behind an
eager localCheckpoint) and proves the guard catches it.

Note Spark's own optimizer (InferWindowGroupLimit) rewrites a
``rank <= k`` filter DIRECTLY above an unpartitioned rank window into a
TakeOrderedAndProject — so the injected regression uses the shape the
optimizer cannot save: a global rank consumed without a top-k filter
(exactly what a percentile/normalize stage does)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from phoebe_spark.plans.guard import (
    capture_checkpoints,
    explain_formatted,
    raw_single_partition_sort_violations,
    single_partition_sort_violations,
)


def test_guard_flags_unpartitioned_window_over_raw_corpus(spark, sf_dir):
    """A global rank window over raw source rows, consumed without a
    rank filter, plans as Sort over Exchange SinglePartition with an
    unbounded un-aggregated input — must be flagged as ``raw:``."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bad = emb.select(
        "vec_id",
        (
            F.row_number().over(Window.orderBy(F.col("vec_id")))
            / F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).alias("pctile"),
    )
    v = raw_single_partition_sort_violations(explain_formatted(bad))
    assert v, "guard missed the single-partition corpus sort"


def test_guard_classifies_support_window_as_agg(spark, sf_dir):
    """An unpartitioned window over a grouped support (the distinct-
    value-frame exception class) is reported as ``agg:``, not raw."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sup = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    df = sup.select(
        "event_type", F.sum("c").over(Window.orderBy("event_type")).alias("cum")
    )
    plan = explain_formatted(df)
    all_v = single_partition_sort_violations(plan)
    assert all_v and all(x.startswith("agg:") for x in all_v)
    assert raw_single_partition_sort_violations(plan) == []


def test_guard_accepts_take_ordered_then_rank(spark, sf_dir):
    """The fixed q321 shape: orderBy().limit(k) (TakeOrderedAndProject)
    then a rank window over the k-row result — the window's exchange
    input is plan-bounded, so no violation of either class."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    top = emb.orderBy(F.col("vec_id")).limit(20)
    good = top.select(
        "vec_id", F.row_number().over(Window.orderBy(F.col("vec_id"))).alias("idx")
    )
    plan = explain_formatted(good)
    assert "TakeOrderedAndProject" in plan
    assert single_partition_sort_violations(plan) == []


def test_guard_accepts_inferred_window_group_limit(spark, sf_dir):
    """``rank <= k`` directly above the window: the optimizer's own
    TakeOrderedAndProject rewrite — bounded, not flagged."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = emb.select(
        "vec_id",
        F.row_number().over(Window.orderBy(F.col("vec_id"))).alias("idx"),
    ).filter(F.col("idx") <= 20)
    plan = explain_formatted(df)
    assert single_partition_sort_violations(plan) == []


def test_guard_accepts_global_orderby_range_exchange(spark, sf_dir):
    """A plain global orderBy uses range partitioning (parallel sort),
    not SinglePartition — never flagged."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = ev.groupBy("event_type").count().orderBy("event_type")
    assert single_partition_sort_violations(explain_formatted(df)) == []


def test_guard_sees_through_eager_checkpoint(spark, sf_dir):
    """The round-8 blind spot: an eager localCheckpoint executes (and
    hides) the bad stage, so the FINAL plan shows only Scan ExistingRDD —
    the capture hook must still surface the pre-checkpoint plan."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with capture_checkpoints() as caps:
        bad = (
            emb.select(
                "vec_id",
                F.row_number().over(Window.orderBy(F.col("vec_id"))).alias("idx"),
            )
            .localCheckpoint(eager=True)
        )
        final_plan = explain_formatted(bad.select("vec_id"))
    # the final frame is blind...
    assert "Scan ExistingRDD" in final_plan
    assert raw_single_partition_sort_violations(final_plan) == []
    # ...but the captured pre-checkpoint plan is not
    assert len(caps) == 1
    assert raw_single_partition_sort_violations(caps[0]), (
        "guard failed to catch the violation hidden behind the checkpoint"
    )
