"""Physical-plan assertions for the round-10 block (q423-q433; q433 is
a streaming drain covered by parity): the scale properties claimed in
the docstrings must be visible in the plans, including pre-checkpoint
stages (captured via the guard, per the round-8 q321 lesson)."""

from __future__ import annotations

import re

from phoebe_spark.plans.guard import (
    capture_checkpoints,
    explain_formatted,
    raw_single_partition_sort_violations,
)
from phoebe_spark.queries import QUERIES

BLOCK = [
    "q423_jarque_bera",
    "q424_chow_break",
    "q425_gamma_somers",
    "q426_krippendorff_alpha",
    "q427_lin_ccc",
    "q428_morans_i",
    "q429_nelson_aalen",
    "q430_cochran_armitage",
    "q431_brown_forsythe",
    "q432_dickey_fuller",
    "q434_risk_ratio",
    "q435_anderson_darling",
    "q436_dagostino_k2",
    "q437_lilliefors",
    "q438_effect_sizes",
    "q439_weibull_hazard",
    "q440_kendall_w",
    "q441_ngram_novelty",
    "q442_robust_means",
    "q443_acf_bartlett",
    "q444_seasonal_decompose",
    "q445_pacf_durbin_levinson",
    "q446_capture_recapture",
    "q447_jackknife_ratio",
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


def test_round10_block_no_raw_single_partition_sorts(spark, sf_dir):
    """Every round-10 query, including checkpointed stages, must be
    free of unpartitioned sorts over raw corpus rows."""
    for name in BLOCK:
        for p in _plans(spark, sf_dir, name):
            assert raw_single_partition_sort_violations(p) == [], name


def test_q423_one_pass_four_moments(spark, sf_dir):
    """Jarque-Bera: ONE corpus scan into a per-flag aggregate with
    map-side partial aggregation; no window, no join."""
    [plan] = _plans(spark, sf_dir, "q423_jarque_bera")
    assert _scans(plan) == 1
    assert _ops(plan, "HashAggregate") >= 2
    assert _ops(plan, "Window") == 0
    assert _ops(plan, "SortMergeJoin") + _ops(plan, "BroadcastHashJoin") == 0


def test_q424_day_rollup_then_one_row(spark, sf_dir):
    """Chow: one corpus scan into the day rollup, one further fold to a
    single row; no window, no join."""
    [plan] = _plans(spark, sf_dir, "q424_chow_break")
    assert _scans(plan) == 1
    assert _ops(plan, "Window") == 0
    assert _ops(plan, "SortMergeJoin") + _ops(plan, "BroadcastHashJoin") == 0
    assert _ops(plan, "HashAggregate") >= 4  # day rollup + segment fold


def test_q425_pair_census_reads_checkpointed_grid(spark, sf_dir):
    """Gamma/Somers: the corpus collapses to the <=55-cell grid
    (checkpointed, one scan); the pair census cross-product reads only
    the checkpointed grid — zero parquet scans in the final plan."""
    plans = _plans(spark, sf_dir, "q425_gamma_somers")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _ops(final, "SortMergeJoin") == 0


def test_q426_q427_single_pass_source_moments(spark, sf_dir):
    """Krippendorff and Lin CCC: ONE corpus scan into a per-source
    integer-moment aggregate; no window, no join."""
    for name in ("q426_krippendorff_alpha", "q427_lin_ccc"):
        [plan] = _plans(spark, sf_dir, name)
        assert _scans(plan) == 1, name
        assert _ops(plan, "Window") == 0, name
        assert _ops(plan, "SortMergeJoin") + _ops(plan, "BroadcastHashJoin") == 0, name


def test_q428_edge_joins_against_checkpointed_z(spark, sf_dir):
    """Moran's I: the z frame is checkpointed once; the numerator joins
    the edge list against it with hash joins (broadcast at this scale
    via the size-aware hint), never a shuffle-sort join."""
    plans = _plans(spark, sf_dir, "q428_morans_i")
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)
    assert sum(_ops(p, "BroadcastHashJoin") for p in plans) >= 2


def test_q429_windows_run_on_gap_support(spark, sf_dir):
    """Nelson-Aalen: durations aggregate to gap values BEFORE any
    ordered risk-set / cumulative window (q282/q403's certified
    shape)."""
    [plan] = _plans(spark, sf_dir, "q429_nelson_aalen")
    assert _ops(plan, "Window") >= 1
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert 0 <= agg_pos and 0 <= win_pos
    assert raw_single_partition_sort_violations(plan) == []


def test_q430_one_pass_grid_fold(spark, sf_dir):
    """Cochran-Armitage: one corpus scan to the 5-quintile grid, one
    further fold to a single row; no window, no join."""
    [plan] = _plans(spark, sf_dir, "q430_cochran_armitage")
    assert _scans(plan) == 1
    assert _ops(plan, "Window") == 0
    assert _ops(plan, "SortMergeJoin") + _ops(plan, "BroadcastHashJoin") == 0
    assert _ops(plan, "HashAggregate") >= 4


def test_q431_medians_on_checkpointed_grid(spark, sf_dir):
    """Brown-Forsythe: one corpus scan into the checkpointed
    (flag, value) grid; medians come from PARTITIONED cumulative
    windows over the bounded support, and the final plan reads only
    checkpointed frames."""
    plans = _plans(spark, sf_dir, "q431_brown_forsythe")
    final = plans[-1]
    assert sum(_scans(c) for c in plans) == 1  # grid build only
    assert _scans(final) == 0
    assert _ops(final, "SortMergeJoin") == 0


def test_q432_lag_on_day_rollup(spark, sf_dir):
    """Dickey-Fuller: the lag window consumes the O(days) rollup (the
    HashAggregate feeds the window exchange), never raw order rows."""
    [plan] = _plans(spark, sf_dir, "q432_dickey_fuller")
    assert _scans(plan) == 1
    assert _ops(plan, "Window") == 1
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert 0 <= agg_pos and 0 <= win_pos


def test_q434_q436_single_pass_closed_forms(spark, sf_dir):
    """Risk ratio and D'Agostino K2: ONE corpus scan into a tiny
    integer aggregate; everything after is a scalar chain — no window,
    no shuffle join."""
    for name in ("q434_risk_ratio", "q436_dagostino_k2"):
        [plan] = _plans(spark, sf_dir, name)
        assert _scans(plan) == 1, name
        assert _ops(plan, "Window") == 0, name
        assert _ops(plan, "SortMergeJoin") + _ops(plan, "BroadcastHashJoin") == 0, name


def test_q435_cum_on_value_support(spark, sf_dir):
    """Two-sample AD: one corpus scan to the <=50-value grid; the
    cumulative windows and the term fold run on that bounded support
    (allowlisted)."""
    [plan] = _plans(spark, sf_dir, "q435_anderson_darling")
    assert _scans(plan) == 1
    assert _ops(plan, "Window") >= 1
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert 0 <= agg_pos and 0 <= win_pos


def test_q437_partitioned_support_windows(spark, sf_dir):
    """Lilliefors: the (flag, value) grid is checkpointed from ONE
    corpus scan; the CDF windows are PARTITIONED by flag, so no
    single-partition exchange appears for them."""
    plans = _plans(spark, sf_dir, "q437_lilliefors")
    final = plans[-1]
    assert sum(_scans(c) for c in plans) == 1
    assert _scans(final) == 0
    assert _ops(final, "SortMergeJoin") == 0


def test_q438_one_join_one_aggregate(spark, sf_dir):
    """Effect sizes: one hash join (customer dim) into ONE map-side
    aggregate to two arm rows; no window."""
    [plan] = _plans(spark, sf_dir, "q438_effect_sizes")
    assert _ops(plan, "Window") == 0
    assert _ops(plan, "SortMergeJoin") == 0
    assert _ops(plan, "BroadcastHashJoin") >= 1
    assert _ops(plan, "HashAggregate") >= 2


def test_q440_ranks_partitioned_by_metric(spark, sf_dir):
    """Kendall W: the corpus collapses to the checkpointed per-source
    metric frame in one scan; ranking windows are partitioned by
    metric over O(sources) rows."""
    plans = _plans(spark, sf_dir, "q440_kendall_w")
    final = plans[-1]
    assert sum(_scans(c) for c in plans) == 1
    assert _scans(final) == 0
    assert _ops(final, "SortMergeJoin") == 0


def test_q441_probe_joins_on_vocab_key(spark, sf_dir):
    """Trigram novelty: the corpus collapses to the distinct trigram
    vocabulary (checkpointed, one scan); the novelty probe is a hash
    join on the trigram key over the checkpointed frame."""
    plans = _plans(spark, sf_dir, "q441_ngram_novelty")
    final = plans[-1]
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _scans(final) == 0


def test_q442_trims_on_checkpointed_grid(spark, sf_dir):
    """Robust means: one corpus scan to the checkpointed (flag, value)
    grid; trims/winsorizations are partitioned support windows and
    grid folds — the final plan reads no parquet."""
    plans = _plans(spark, sf_dir, "q442_robust_means")
    final = plans[-1]
    assert sum(_scans(c) for c in plans) == 1
    assert _scans(final) == 0
    assert _ops(final, "SortMergeJoin") == 0


def test_q443_q444_windows_on_day_rollup(spark, sf_dir):
    """ACF and seasonal decomposition: the lag/MA windows consume the
    O(days) rollup (HashAggregate feeds the window), never raw order
    rows (allowlisted day support)."""
    for name in ("q443_acf_bartlett", "q444_seasonal_decompose"):
        plans = _plans(spark, sf_dir, name)
        for plan in plans:
            assert raw_single_partition_sort_violations(plan) == [], name
        joined = "\n".join(plans)
        agg_pos = joined.find("HashAggregate")
        win_pos = joined.find("Window")
        assert 0 <= agg_pos and 0 <= win_pos, name


def test_q445_ladder_on_day_rollup(spark, sf_dir):
    """PACF: one corpus scan to the day rollup; the 4 lag columns come
    from one window pass (allowlisted day support); the Durbin-Levinson
    ladder is a 1-row scalar chain — no join anywhere."""
    [plan] = _plans(spark, sf_dir, "q445_pacf_durbin_levinson")
    assert _scans(plan) == 1
    assert _ops(plan, "Window") == 1
    assert _ops(plan, "SortMergeJoin") + _ops(plan, "BroadcastHashJoin") == 0


def test_q446_q447_collapse_then_closed_form(spark, sf_dir):
    """Capture-recapture and jackknife: the corpus collapses in one
    pass (distinct / per-source aggregate); everything after runs on
    bounded frames with no shuffle join."""
    for name in ("q446_capture_recapture", "q447_jackknife_ratio"):
        plans = _plans(spark, sf_dir, name)
        assert sum(_scans(c) for c in plans) == 1, name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name
        assert all(_ops(p, "Window") == 0 for p in plans), name
