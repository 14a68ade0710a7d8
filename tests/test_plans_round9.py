"""Physical-plan assertions for the round-9 operators: the scale
properties claimed in the docstrings must be visible in the plans —
including pre-checkpoint stages (captured via the round-9 guard, so an
eager localCheckpoint cannot hide a bad stage the way q321's did in
round 8)."""

from __future__ import annotations

import re

from phoebe_spark.plans.guard import (
    capture_checkpoints,
    explain_formatted,
    raw_single_partition_sort_violations,
)
from phoebe_spark.queries import QUERIES


def _plans(spark, sf_dir, name):
    with capture_checkpoints() as caps:
        df = QUERIES[name](spark, sf_dir)
        final = explain_formatted(df)
    return list(caps) + [final]


def _ops(plan: str, op: str) -> int:
    return len(re.findall(rf"\(\d+\) {op}", plan))


def test_round9_no_raw_single_partition_sorts(spark, sf_dir):
    """Every round-9 query, including checkpointed stages, must be free
    of unpartitioned sorts over raw corpus rows."""
    names = [n for n in QUERIES if re.match(r"q3(4[2-9]|5\d|6[0-2])_", n)]
    assert len(names) >= 20
    for name in names:
        if "streaming" in name:
            continue  # drains execute streams at build; covered by parity
        for p in _plans(spark, sf_dir, name):
            assert raw_single_partition_sort_violations(p) == [], name


def test_q342_collapses_before_rank(spark, sf_dir):
    """BH-FDR: the corpus collapses map-side to the per-type frame; the
    rank window runs over m rows, and the null filter reaches the scan."""
    plans = _plans(spark, sf_dir, "q342_bh_fdr")
    scan_plan = plans[0]
    assert "PushedFilters: [IsNotNull(value)]" in scan_plan
    assert "partial_count" in scan_plan or _ops(scan_plan, "HashAggregate") >= 2


def test_q347_single_pass_integer_moments(spark, sf_dir):
    """Brier decomposition: ONE corpus scan feeds the 10-bin integer
    moment aggregate (checkpointed); the decomposition reads only the
    bin frame — zero parquet re-scans after the checkpoint."""
    plans = _plans(spark, sf_dir, "q347_brier_decomposition")
    final = plans[-1]
    assert final.count("Scan parquet") == 0
    assert final.count("Scan ExistingRDD") >= 1
    assert _ops(final, "SortMergeJoin") == 0


def test_q348_iterations_on_checkpointed_vocab_frames(spark, sf_dir):
    """TextRank: after the edge/degree checkpoints, every round joins
    RDD-backed vocabulary frames — the final plan never re-scans the
    corpus, and the top-k is a TakeOrdered."""
    plans = _plans(spark, sf_dir, "q348_textrank")
    final = plans[-1]
    assert final.count("Scan parquet") == 0
    assert "TakeOrderedAndProject" in final


def test_q350_hits_rounds_are_edge_joins(spark, sf_dir):
    """HITS: the final plan reads only checkpointed frames (the edge
    aggregate ran once at checkpoint build), hubs cut by TakeOrdered."""
    plans = _plans(spark, sf_dir, "q350_hits")
    final = plans[-1]
    assert final.count("Scan parquet") == 0
    assert "TakeOrderedAndProject" in final


def test_q352_support_collapse_and_takeordered(spark, sf_dir):
    """ECOD: per-dim ECDF comes from a (dim, q) support aggregate with a
    map-side partial; the top-10 is a TakeOrdered, no cartesian."""
    plans = _plans(spark, sf_dir, "q352_ecod_outliers")
    final = plans[-1]
    assert "TakeOrderedAndProject" in final
    assert _ops(final, "CartesianProduct") == 0


def test_q354_one_gram_aggregate(spark, sf_dir):
    """Spectral moments: the flat view is checkpointed once; the Gram is
    one self-join + aggregate onto d^2 cells; the moment fold reads the
    cell frame with 1-row broadcasts only."""
    plans = _plans(spark, sf_dir, "q354_spectral_moments")
    final = plans[-1]
    assert final.count("Scan parquet") == 0
    assert _ops(final, "CartesianProduct") <= 3  # 1-row broadcasts only
    assert _ops(final, "SortMergeJoin") <= 1  # the d^2 Gram self-join


def test_q356_bootstrap_never_rescans_corpus(spark, sf_dir):
    """Bootstrap: replicates are drawn from the checkpointed daily
    rollup — the 200x grid join must not touch parquet."""
    plans = _plans(spark, sf_dir, "q356_bootstrap_ci")
    final = plans[-1]
    assert final.count("Scan parquet") == 0
    assert final.count("Scan ExistingRDD") >= 1


def test_q361_gesd_is_single_row_folds(spark, sf_dir):
    """GESD: all three rounds are array folds over the checkpointed
    stats row — the final plan has HOF aggregates and no joins at all."""
    plans = _plans(spark, sf_dir, "q361_gesd_outliers")
    final = plans[-1]
    assert final.count("aggregate(") >= 1
    assert _ops(final, "SortMergeJoin") == 0
    assert _ops(final, "BroadcastHashJoin") == 0
    assert final.count("Scan parquet") == 0
