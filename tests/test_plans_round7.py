"""Physical-plan assertions for the round-7 operators: the scale
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


def test_q301_no_cartesian_candidates(spark, sf_dir):
    """2-hop candidates must come from equi-joins; the existing-edge
    removal is a proper anti-join, never a nested-loop filter."""
    plan = _plan(spark, sf_dir, "q301_link_prediction")
    assert _ops(plan, "CartesianProduct") == 0
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_q299_counting_only_no_pair_materialization(spark, sf_dir):
    """Blocking quality is pure counting: no join wider than the scalar
    assembly, candidate pairs never expanded."""
    plan = _plan(spark, sf_dir, "q299_blocking_quality")
    # documents scanned for the three censuses; no SortMergeJoin of
    # corpus-sized sides anywhere
    assert _ops(plan, "SortMergeJoin") == 0
    # final assembly is 1-row x 1-row broadcast nested loops — bounded
    assert _ops(plan, "HashAggregate") >= 6  # partial+final per census


def test_q292_sketch_is_one_narrow_shuffle(spark, sf_dir):
    """The 128-cell histogram must map-side combine: partial+final
    HashAggregate pairs, and the exact-rank audit side is the only sort."""
    plan = _plan(spark, sf_dir, "q292_quantile_hist_sketch")
    assert _ops(plan, "CartesianProduct") == 0
    # the interpolation/audit assembly joins tiny frames — broadcast only
    assert _ops(plan, "SortMergeJoin") == 0


def test_q296_grid_is_broadcast(spark, sf_dir):
    """The classes x sources audit grid must be built by broadcasting the
    tiny global marginal, and cells join back broadcast too."""
    plan = _plan(spark, sf_dir, "q296_t_closeness")
    assert _ops(plan, "SortMergeJoin") == 0
    # documents scanned ONCE into the checkpointed cells table; every
    # branch reads the checkpoint, not the corpus
    assert _ops(plan, "Scan parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 2


def test_q293_round_is_join_plus_grouped_sum(spark, sf_dir):
    """After localCheckpoint truncation the visible plan is the LAST
    round only: one edge join + one grouped decimal sum + the norm."""
    plan = _plan(spark, sf_dir, "q293_eigencentrality")
    assert _ops(plan, "CartesianProduct") == 0
    # round-count independence: checkpointed RDD scans, not 5 chained joins
    assert plan.count("Scan ExistingRDD") >= 1
