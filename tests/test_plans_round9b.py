"""Physical-plan assertions for the round-9 finale block (q401-q422; q415 is a streaming drain covered by parity):
the scale properties claimed in the docstrings must be visible in the
plans, including pre-checkpoint stages (captured via the guard so an
eager localCheckpoint cannot hide a bad stage, per the round-8 q321
lesson)."""

from __future__ import annotations

import re

from phoebe_spark.plans.guard import (
    capture_checkpoints,
    explain_formatted,
    raw_single_partition_sort_violations,
)
from phoebe_spark.queries import QUERIES

BLOCK = [
    "q401_bradley_terry",
    "q402_fleiss_kappa",
    "q403_logrank_test",
    "q404_condorcet_copeland",
    "q405_overdispersion",
    "q406_stratified_ipw_ate",
    "q407_graph_modularity",
    "q408_vif_collinearity",
    "q409_oof_target_encoding",
    "q410_gini_binned",
    "q411_cronbach_alpha",
    "q412_diff_in_diff",
    "q413_source_vocab_overlap",
    "q414_ipw_diagnostics",
    "q416_log_odds_dirichlet",
    "q417_competing_risks",
    "q418_price_elasticity",
    "q419_gehan_wilcoxon",
    "q420_rmst",
    "q421_weighted_kappa",
    "q422_stuart_maxwell",
]


def _plans(spark, sf_dir, name):
    with capture_checkpoints() as caps:
        df = QUERIES[name](spark, sf_dir)
        final = explain_formatted(df)
    return list(caps) + [final]


def _ops(plan: str, op: str) -> int:
    return len(re.findall(rf"\(\d+\) {op}", plan))


def _scans(plan: str) -> int:
    """Count physical parquet-scan NODES (the numbered detail entries,
    not the tree echo)."""
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def test_finale_block_no_raw_single_partition_sorts(spark, sf_dir):
    """Every finale query, including checkpointed stages, must be free
    of unpartitioned sorts over raw corpus rows."""
    for name in BLOCK:
        for p in _plans(spark, sf_dir, name):
            assert raw_single_partition_sort_violations(p) == [], name


def test_q401_iteration_runs_on_checkpointed_matrices(spark, sf_dir):
    """Bradley-Terry: the 20-round MM fold must read ONLY the
    checkpointed K x K matrix frames — zero parquet rescans in the
    final plan, and the duel join collapses before any checkpoint."""
    plans = _plans(spark, sf_dir, "q401_bradley_terry")
    final = plans[-1]
    assert _scans(final) == 0
    # the iteration itself is a single-row array fold: no shuffle of a
    # corpus-rate frame in the final stage (exchanges are 1-row/K-row)
    assert _ops(final, "SortMergeJoin") == 0


def test_q402_one_corpus_pass_integer_moments(spark, sf_dir):
    """Fleiss: all three gates fold inside ONE map-side-combining
    per-source aggregate — a single corpus scan, partial aggregation
    before the exchange, and no window or join anywhere."""
    [plan] = _plans(spark, sf_dir, "q402_fleiss_kappa")
    assert _scans(plan) == 1
    assert _ops(plan, "HashAggregate") >= 2  # partial + final
    assert _ops(plan, "Window") == 0
    assert _ops(plan, "SortMergeJoin") + _ops(plan, "BroadcastHashJoin") == 0


def test_q403_windows_run_on_gap_support(spark, sf_dir):
    """Log-rank: the ordered risk-set windows must consume the grouped
    gap-value frame (HashAggregate feeds the window exchange), never
    raw duration rows — q282's certified shape."""
    [plan] = _plans(spark, sf_dir, "q403_logrank_test")
    assert _ops(plan, "Window") >= 1
    # durations aggregate to gap values before any ordered window
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert 0 <= agg_pos and 0 <= win_pos
    assert raw_single_partition_sort_violations(plan) == []


def test_q405_single_scan_dense_grid(spark, sf_dir):
    """Overdispersion: ONE corpus scan (at the rollup checkpoint); the
    dense day-grid and moment arithmetic read only the checkpointed
    O(days * K) frame."""
    plans = _plans(spark, sf_dir, "q405_overdispersion")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1


def test_q406_single_scan_stratum_folds(spark, sf_dir):
    """Stratified/IPW ATE: one corpus scan into the checkpointed
    K-stratum moment frame; all three estimators are folds over it."""
    plans = _plans(spark, sf_dir, "q406_stratified_ipw_ate")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _ops(final, "SortMergeJoin") == 0


def test_q407_community_joins_are_broadcast(spark, sf_dir):
    """Modularity: community attachment uses the size-aware ``_dim``
    hint (part grows with scale factor — above the 256 MB plan-estimate
    bound the hint drops out and AQE picks the strategy at runtime).
    At test scale the estimate is far under the bound, so the plan must
    show broadcast joins and no shuffle join in any stage, including
    the checkpointed ones where the joins actually execute. At scales
    past the bound a shuffle join is the CORRECT choice, so this test
    only pins the small-dim behavior."""
    plans = _plans(spark, sf_dir, "q407_graph_modularity")
    assert sum(_ops(p, "BroadcastHashJoin") for p in plans) >= 2
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)


def test_q408_one_scan_stack_unpivot(spark, sf_dir):
    """VIF: the full 10-field moment matrix comes from ONE corpus scan
    with map-side partial aggregation; the per-variable rows come from
    stack() over the single moment row (Generate node), NOT a union
    that would re-execute the aggregate per variable."""
    [plan] = _plans(spark, sf_dir, "q408_vif_collinearity")
    assert _scans(plan) == 1
    assert _ops(plan, "HashAggregate") >= 2
    assert _ops(plan, "Generate") == 1
    assert _ops(plan, "Union") == 0


def test_q409_broadcast_encoding_join(spark, sf_dir):
    """OOF target encoding: the category-total join back onto the
    (category, fold) frame is broadcast; one corpus scan feeds the
    first rollup with partial aggregation."""
    plans = _plans(spark, sf_dir, "q409_oof_target_encoding")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _ops(final, "BroadcastHashJoin") >= 1
    assert _ops(final, "SortMergeJoin") == 0


def test_q410_lorenz_on_bounded_bins(spark, sf_dir):
    """Binned Gini: the ordered Lorenz windows run over the <=256-bin
    aggregate (the allowlisted bounded frame), and the customer-rate
    frame is reduced by hash aggregation before any window."""
    [plan] = _plans(spark, sf_dir, "q410_gini_binned")
    assert _ops(plan, "Window") >= 1
    assert raw_single_partition_sort_violations(plan) == []
    assert _ops(plan, "HashAggregate") >= 4  # spend rollup + bin rollup


def test_q411_q412_single_pass_cells(spark, sf_dir):
    """Cronbach alpha and DiD: each is ONE corpus scan into a tiny
    integer-moment frame (per-source / four cells) with partial
    aggregation; no window, no shuffle join."""
    for name in ("q411_cronbach_alpha", "q412_diff_in_diff"):
        plans = _plans(spark, sf_dir, name)
        assert all(_ops(p, "Window") == 0 for p in plans), name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name
        final = plans[-1]
        assert _ops(final, "HashAggregate") >= 2, name


def test_q413_joins_on_token_key_only(spark, sf_dir):
    """Vocab overlap: the corpus collapses to the distinct vocabulary
    (checkpointed) before the pair join; the size joins back are
    broadcast."""
    plans = _plans(spark, sf_dir, "q413_source_vocab_overlap")
    final = plans[-1]
    assert _scans(final) == 0  # pair join reads the checkpointed vocab
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _ops(final, "BroadcastHashJoin") >= 2


def test_q414_folds_on_checkpointed_strata(spark, sf_dir):
    """IPW diagnostics: both arms' folds re-read the checkpointed
    K-stratum frame, never the corpus."""
    plans = _plans(spark, sf_dir, "q414_ipw_diagnostics")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _ops(final, "SortMergeJoin") == 0
