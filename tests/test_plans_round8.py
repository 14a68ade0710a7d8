"""Physical-plan assertions for the round-8 operators: the scale
properties claimed in the docstrings must be visible in the plans."""

from __future__ import annotations

import re

from phoebe_spark.queries import QUERIES


def _plan(spark, sf_dir, name) -> str:
    df = QUERIES[name](spark, sf_dir)
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _ops(plan: str, op: str) -> int:
    return len(re.findall(rf"\(\d+\) {op}", plan))


def test_q310_ks_support_collapse_and_pushdown(spark, sf_dir):
    """KS must collapse the fact table to the distinct-value support with
    a map-side partial aggregate BEFORE any window, push the null filter
    to the scan, and use WindowGroupLimit for the per-type top-1."""
    plan = _plan(spark, sf_dir, "q310_ks_two_sample")
    assert "PushedFilters: [IsNotNull(value)]" in plan
    assert "partial_sum" in plan or _ops(plan, "HashAggregate") >= 2
    assert "WindowGroupLimit" in plan
    assert _ops(plan, "CartesianProduct") == 0


def test_q313_page_hinkley_single_fold_no_iteration_joins(spark, sf_dir):
    """The 30-step PH recursion must be ONE array fold on the per-key
    aggregate — no per-iteration joins, no corpus-sized sort-merge."""
    plan = _plan(spark, sf_dir, "q313_page_hinkley")
    assert _ops(plan, "CartesianProduct") == 0
    # the dense-grid build joins the O(days) rollup; nothing corpus-sized
    assert plan.count("aggregate(") >= 1  # the codegen HOF fold
    assert _ops(plan, "SortMergeJoin") <= 2


def test_q317_markov_iteration_is_single_row(spark, sf_dir):
    """The 20-round power iteration must run on a single-row array (one
    aggregate over the K x K cells), not as 20 joins."""
    plan = _plan(spark, sf_dir, "q317_markov_stationary")
    # one window builds the per-user sequence; everything after is tiny
    assert _ops(plan, "CartesianProduct") <= 2  # 1-row broadcasts only
    assert plan.count("aggregate(") >= 1
    # no repeated corpus scans for the iterations: events feed the lead()
    # window and the share census only (grid/freq/types are checkpointed)
    assert plan.count("Scan parquet") <= 2


def test_q318_psi_grid_is_broadcast(spark, sf_dir):
    """PSI bins: one map-side-combining corpus aggregate, the 10-cell
    grid built by broadcasting the bins, zero corpus self-joins."""
    plan = _plan(spark, sf_dir, "q318_psi_drift")
    assert _ops(plan, "SortMergeJoin") == 0
    assert _ops(plan, "CartesianProduct") == 0
    # grid is checkpointed BEFORE this plan (the corpus scan with the
    # IsNotNull pushdown ran once at checkpoint build): the PSI fold
    # reads only the 10-cells-per-type RDD, zero parquet re-scans
    assert plan.count("Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 2


def test_q321_mmr_no_corpus_self_join(spark, sf_dir):
    """The 20x20 similarity matrix must come from a broadcast join of the
    checkpointed candidate set — the corpus itself never self-joins, and
    the greedy runs as an array fold (no per-pick joins)."""
    plan = _plan(spark, sf_dir, "q321_mmr_rerank")
    assert _ops(plan, "SortMergeJoin") == 0
    # candidates are localCheckpointed: the pair join reads the RDD, not
    # the parquet corpus, so embeddings scans stay bounded
    assert plan.count("Scan ExistingRDD") >= 2
    assert plan.count("aggregate(") >= 1


def test_q322_mahalanobis_two_scans_no_shuffle_join(spark, sf_dir):
    """Moments pass + broadcast-back scoring pass: the 5-row covariance
    table must broadcast; no corpus-scale sort-merge join."""
    plan = _plan(spark, sf_dir, "q322_mahalanobis_outliers")
    assert _ops(plan, "SortMergeJoin") == 0
    assert _ops(plan, "BroadcastHashJoin") >= 1
    assert _ops(plan, "CartesianProduct") == 0


def test_q323_mad_windows_on_support_only(spark, sf_dir):
    """Median/MAD come from cumulative frames over the (type, value)
    support — the corpus collapses in a partial aggregate first, and the
    stats join back broadcast."""
    plan = _plan(spark, sf_dir, "q323_robust_zscore_mad")
    assert _ops(plan, "CartesianProduct") == 0
    assert _ops(plan, "BroadcastHashJoin") >= 2
    # the (type, value) support is checkpointed: ONE corpus scan feeds
    # median, MAD, and the outlier count
    assert plan.count("Scan parquet") <= 1


def test_q320_q325_topk_is_take_ordered(spark, sf_dir):
    """Global top-k over corpus-rate frames (hybrid candidates, phrase
    census) must plan as distributed TakeOrdered, never a single-
    partition rank window over the full frame."""
    for name in ("q320_hybrid_retrieval", "q325_rake_keyphrases"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_q321_candidate_cut_is_take_ordered_pre_checkpoint(spark, sf_dir):
    """Round-8 verdict fix: q321's top-20 candidate cut over the corpus-
    rate relevance frame must plan as distributed TakeOrderedAndProject —
    and because the cut is eagerly localCheckpointed (invisible in the
    final frame's plan), the assertion runs on the PRE-checkpoint plan
    captured at checkpoint time."""
    from phoebe_spark.plans.guard import (
        capture_checkpoints,
        single_partition_sort_violations,
    )

    with capture_checkpoints() as caps:
        QUERIES["q321_mmr_rerank"](spark, sf_dir)
    assert caps, "q321 no longer checkpoints its candidate stage"
    cand_plan = caps[0]
    assert "TakeOrderedAndProject" in cand_plan
    # the only remaining unpartitioned window ranks the 20-row limit
    # result — the guard must see its input as bounded
    for p in caps:
        assert single_partition_sort_violations(p) == []
