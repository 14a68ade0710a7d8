"""Physical-plan assertions for the round-11 block (q448-q462): the
scale properties claimed in the docstrings must be visible in the
plans, including pre-checkpoint stages (captured via the guard, per the
round-8 q321 lesson)."""

from __future__ import annotations

import re

from phoebe_spark.plans.guard import (
    capture_checkpoints,
    explain_formatted,
    raw_single_partition_sort_violations,
)
from phoebe_spark.queries import QUERIES

BLOCK = [
    "q448_grubbs_outlier",
    "q449_hodges_lehmann",
    "q450_dft_periodogram",
    "q451_cross_correlation",
    "q452_turning_points",
    "q453_markov_entropy_rate",
    "q454_bayes_two_proportion",
    "q455_bartlett_variances",
    "q456_palma_hoover",
    "q457_gumbel_block_maxima",
    "q458_sign_wilcoxon",
    "q459_cooks_distance",
    "q460_forecastability",
    "q461_breusch_pagan",
    "q462_page_trend",
    "q463_mantel_haenszel",
    "q464_seasonal_mann_kendall",
    "q465_partial_correlation",
    "q466_granger_causality",
    "q467_diagnostic_suite",
    "q468_tukey_fences",
    "q469_delta_method_ratio",
    "q470_mde_power_audit",
]


def _plans(spark, sf_dir, name):
    with capture_checkpoints() as caps:
        df = QUERIES[name](spark, sf_dir)
        final = explain_formatted(df)
    return list(caps) + [final]


def _ops(plan: str, op: str) -> int:
    return len(re.findall(rf"\(\d+\) {op}", plan))


def _scans(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def test_round11_block_no_raw_single_partition_sorts(spark, sf_dir):
    """Every round-11 query, including checkpointed stages, must be
    free of unpartitioned sorts over raw corpus rows."""
    for name in BLOCK:
        for p in _plans(spark, sf_dir, name):
            assert raw_single_partition_sort_violations(p) == [], name


def test_q448_q455_q457_one_scan_moment_folds(spark, sf_dir):
    """Grubbs, Bartlett, Gumbel: ONE corpus scan total (q448's reused
    day rollup is checkpointed, so branches read the checkpoint, not
    the corpus); no window anywhere."""
    for name in (
        "q448_grubbs_outlier",
        "q455_bartlett_variances",
        "q457_gumbel_block_maxima",
    ):
        plans = _plans(spark, sf_dir, name)
        assert sum(_scans(p) for p in plans) == 1, name
        assert all(_ops(p, "Window") == 0 for p in plans), name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name


def test_q449_pair_join_reads_checkpointed_days(spark, sf_dir):
    """Hodges-Lehmann: the corpus collapses to the checkpointed day
    rollup (one scan); both pair joins read ONLY the checkpointed
    frame — zero parquet scans in the final plan — and the medians run
    on grouped value supports, never on per-pair rows."""
    plans = _plans(spark, sf_dir, "q449_hodges_lehmann")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1


def test_q450_broadcasts_literal_trig_table(spark, sf_dir):
    """DFT periodogram: the 464-row twiddle table joins via
    BroadcastHashJoin (never a shuffle join), and the projections are
    grouped aggregates — the only Windows run on the 29-period frame."""
    plans = _plans(spark, sf_dir, "q450_dft_periodogram")
    assert sum(_ops(p, "BroadcastHashJoin") for p in plans) >= 1
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)
    assert sum(_scans(p) for p in plans) == 1


def test_q451_lag_fanout_is_broadcast(spark, sf_dir):
    """CCF: the 15-lag literal frame is broadcast against the day
    rollup; per-lag moments are ONE grouped aggregate (no window on
    corpus-rate data)."""
    [plan] = _plans(spark, sf_dir, "q451_cross_correlation")
    assert _ops(plan, "BroadcastHashJoin") + _ops(plan, "BroadcastNestedLoopJoin") >= 1
    assert _ops(plan, "SortMergeJoin") == 0
    assert _scans(plan) == 2  # orders + lineitem rollups


def test_q453_transition_window_is_user_partitioned(spark, sf_dir):
    """Entropy rate: the only corpus-scale window is PARTITIONED by
    user_id (the q317 build); entropy folds run on the K x K grid."""
    [plan] = _plans(spark, sf_dir, "q453_markov_entropy_rate")
    m = re.search(r"Window.*user_id", plan, re.S)
    assert m is not None
    assert raw_single_partition_sort_violations(plan) == []


def test_q459_q461_no_window_no_sort(spark, sf_dir):
    """Cook's distance and Breusch-Pagan: moments + broadcast 1-row
    join + closed-form per-day arithmetic — no window, no sort-merge
    join, one parquet scan."""
    for name in ("q459_cooks_distance", "q461_breusch_pagan"):
        plans = _plans(spark, sf_dir, name)
        assert all(_ops(p, "Window") == 0 for p in plans), name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name
        assert sum(_scans(p) for p in plans) == 1, name


def test_q462_ranks_partitioned_by_week(spark, sf_dir):
    """Page trend: rank windows are PARTITIONED by the week index —
    7-row partitions, never a global sort of the day frame."""
    [plan] = _plans(spark, sf_dir, "q462_page_trend")
    assert raw_single_partition_sort_violations(plan) == []
    assert re.search(r"Window.*partition", plan, re.S | re.I) is not None


def test_q456_q458_windows_on_value_supports_only(spark, sf_dir):
    """Palma/Hoover and sign/Wilcoxon: every Window input is an
    aggregated value-support frame (the allowlisted bounded class) —
    asserted by the absence of raw-row violations plus the support
    aggregate preceding the window in the plan."""
    for name in ("q456_palma_hoover", "q458_sign_wilcoxon"):
        [plan] = _plans(spark, sf_dir, name)
        assert raw_single_partition_sort_violations(plan) == [], name
        # the support aggregate must appear before the first Window
        first_window = plan.find("Window")
        assert first_window > 0, name
        assert "HashAggregate" in plan[:first_window], name


def test_q463_q467_q470_single_fold_to_grid(spark, sf_dir):
    """MH, diagnostic suite, MDE: the corpus (orders x broadcast
    customer dim where applicable) collapses in ONE grouped aggregate;
    no window anywhere; no sort-merge join."""
    for name in (
        "q463_mantel_haenszel",
        "q467_diagnostic_suite",
        "q470_mde_power_audit",
    ):
        plans = _plans(spark, sf_dir, name)
        assert all(_ops(p, "Window") == 0 for p in plans), name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name


def test_q464_pair_join_reads_checkpointed_days(spark, sf_dir):
    """Seasonal MK: the within-weekday pair join reads ONLY the
    checkpointed day rollup (one corpus scan total, zero in the final
    plan) — the calendar-bounded O(days^2) contract."""
    plans = _plans(spark, sf_dir, "q464_seasonal_mann_kendall")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1


def test_q465_q466_one_moment_fold(spark, sf_dir):
    """Partial correlation and Granger: day-key join of two rollups,
    then ONE moment fold; the only window (q466's lag) is over the
    bounded day frame; two parquet scans total."""
    for name in ("q465_partial_correlation", "q466_granger_causality"):
        plans = _plans(spark, sf_dir, name)
        assert sum(_scans(p) for p in plans) == 2, name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name


def test_q468_census_reads_checkpointed_grid(spark, sf_dir):
    """Tukey fences: quartiles AND the outlier census both run on the
    checkpointed (flag, value) grid — one corpus scan total, zero in
    the final plan; cum windows are flag-partitioned."""
    plans = _plans(spark, sf_dir, "q468_tukey_fences")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert raw_single_partition_sort_violations(final) == []
