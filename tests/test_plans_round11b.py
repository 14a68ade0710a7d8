"""Physical-plan assertions for the round-11 extension block
(q471-q495): the scale properties claimed in the docstrings must be
visible in the plans, including pre-checkpoint stages (captured via the
guard, per the round-8 q321 lesson)."""

from __future__ import annotations

import re

from phoebe_spark.plans.guard import (
    capture_checkpoints,
    explain_formatted,
    raw_single_partition_sort_violations,
)
from phoebe_spark.queries import QUERIES

BLOCK = [
    "q471_benford_audit",
    "q472_kendall_tau_b",
    "q473_cronbach_alpha",
    "q474_icc_supplier",
    "q475_theil_sen",
    "q476_moods_median",
    "q477_ansari_bradley",
    "q478_fk_readability",
    "q479_yules_k",
    "q480_gearys_c",
    "q481_gini_stump",
    "q482_gk_lambda",
    "q483_theils_u",
    "q484_kuiper_test",
    "q485_oaxaca_mix_rate",
    "q486_rank_instability",
    "q487_negbin_fit",
    "q488_breakpoint_search",
    "q489_edge_jaccard",
    "q490_fisher_price_index",
    "q491_mad_robust_z",
    "q492_winsorized_corr",
    "q493_design_effect",
    "q494_hill_numbers",
    "q497_obrien_fleming",
    "q498_direct_standardization",
    "q499_abc_xyz",
    "q500_xbar_control_chart",
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


def test_round11b_block_no_raw_single_partition_sorts(spark, sf_dir):
    """Every q471-q495 query, including checkpointed stages, must be
    free of unpartitioned sorts over raw corpus rows."""
    for name in BLOCK:
        for p in _plans(spark, sf_dir, name):
            assert raw_single_partition_sort_violations(p) == [], name


def test_q471_literal_table_broadcast_one_scan(spark, sf_dir):
    """Benford: ONE orders scan; the 9-row expectation table and both
    scalar folds join via broadcast; no window, no sort-merge join."""
    plans = _plans(spark, sf_dir, "q471_benford_audit")
    assert sum(_scans(p) for p in plans) == 1
    assert all(_ops(p, "Window") == 0 for p in plans)
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)
    assert sum(_ops(p, "BroadcastHashJoin") for p in plans) >= 1


def test_q472_pair_cross_reads_checkpointed_cells(spark, sf_dir):
    """Kendall tau-b: the 350x350 support cross and all marginals read
    ONLY the checkpointed joint histogram — one corpus scan total, zero
    in the final plan; the theta-join is broadcast nested-loop over the
    support, never a shuffle join."""
    plans = _plans(spark, sf_dir, "q472_kendall_tau_b")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _ops(final, "SortMergeJoin") == 0
    assert _ops(final, "BroadcastNestedLoopJoin") >= 1


def test_q473_q474_q487_one_scan_moment_folds(spark, sf_dir):
    """Cronbach, ICC, NB fit: one corpus scan collapsing through a
    grouped rollup into ONE moment fold; no window, no sort-merge
    join."""
    for name in (
        "q473_cronbach_alpha",
        "q474_icc_supplier",
        "q487_negbin_fit",
    ):
        plans = _plans(spark, sf_dir, name)
        assert sum(_scans(p) for p in plans) == 1, name
        assert all(_ops(p, "Window") == 0 for p in plans), name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name


def test_q475_pair_join_is_broadcast_theta(spark, sf_dir):
    """Theil-Sen: the day-pair enumeration is a broadcast theta-join of
    the aggregated day rollup with itself (never a shuffle join), run
    ONCE into the checkpointed slope histogram (2 scans in that stage);
    the slope median is the two-phase bucketed prefix sum over the
    checkpointed support — NO unpartitioned sort touches pair rows —
    and the final plan's only scan is the intercept branch's orders
    rollup, whose median window keeps the aggregate visible below it."""
    plans = _plans(spark, sf_dir, "q475_theil_sen")
    final = plans[-1]
    assert sum(_ops(p, "BroadcastNestedLoopJoin") for p in plans[:-1]) >= 1
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)
    assert sum(_scans(p) for p in plans[:-1]) == 2
    assert _scans(final) == 1
    # the former all-pairs row_number is gone: no window over pair rows
    # in the checkpointed (pre-histogram) stages
    assert all(_ops(p, "Window") == 0 for p in plans[:-1])
    for p in plans:
        assert raw_single_partition_sort_violations(p) == []


def test_q477_q481_q484_single_scan_support_windows(spark, sf_dir):
    """Ansari-Bradley, Gini stump, Kuiper: exactly ONE lineitem scan —
    frame totals come from whole-frame windows over the same support,
    not a second rollup branch; every window input has the support
    aggregate below it."""
    for name in (
        "q477_ansari_bradley",
        "q481_gini_stump",
        "q484_kuiper_test",
    ):
        plans = _plans(spark, sf_dir, name)
        assert sum(_scans(p) for p in plans) == 1, name
        final = plans[-1]
        assert raw_single_partition_sort_violations(final) == [], name


def test_q476_branches_read_checkpointed_histogram(spark, sf_dir):
    """Mood's median: the grand-median support, the per-flag counts and
    the chi-square fold all replay the checkpointed (value, flag)
    histogram — one corpus scan total, zero in the final plan."""
    plans = _plans(spark, sf_dir, "q476_moods_median")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1


def test_q478_no_token_explosion(spark, sf_dir):
    """FK readability: counts come from length arithmetic — the plan
    has NO Generate (explode) node, one documents scan, no window."""
    plans = _plans(spark, sf_dir, "q478_fk_readability")
    assert all(_ops(p, "Generate") == 0 for p in plans)
    assert sum(_scans(p) for p in plans) == 1
    assert all(_ops(p, "Window") == 0 for p in plans)


def test_q479_q494_vocab_bounded_single_explosion(spark, sf_dir):
    """Yule's K and Hill numbers: ONE token explosion into the
    (source, term) groupBy; no window; no sort-merge join (the Hill
    per-source total joins broadcast)."""
    for name in ("q479_yules_k", "q494_hill_numbers"):
        plans = _plans(spark, sf_dir, name)
        assert sum(_ops(p, "Generate") for p in plans) == 1, name
        assert all(_ops(p, "Window") == 0 for p in plans), name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name


def test_q480_edge_numerator_is_two_hash_joins(spark, sf_dir):
    """Geary's C: the numerator joins the edge list to the price frame
    twice (hash joins, no sort-merge); moments are plain aggregates; no
    window anywhere."""
    plans = _plans(spark, sf_dir, "q480_gearys_c")
    assert all(_ops(p, "Window") == 0 for p in plans)
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)


def test_q482_marginals_read_checkpointed_cells(spark, sf_dir):
    """GK lambda: row/column maxima, marginals and the modal flag all
    replay the checkpointed joint histogram — one corpus scan total,
    zero in the final plan; all joins broadcast."""
    plans = _plans(spark, sf_dir, "q482_gk_lambda")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _ops(final, "SortMergeJoin") == 0


def test_q483_entropies_read_checkpointed_cells(spark, sf_dir):
    """Theil's U: all three entropy folds replay the checkpointed
    source x lang histogram — one corpus scan total, zero in the final
    plan; no window."""
    plans = _plans(spark, sf_dir, "q483_theils_u")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert all(_ops(p, "Window") == 0 for p in plans)


def test_q485_pivot_reads_checkpointed_rollup(spark, sf_dir):
    """Oaxaca: the year totals, the pivot and the three folds replay
    the checkpointed (segment, year) rollup — one orders scan plus one
    customer-dim scan total across stages, zero scans in the final
    plan."""
    plans = _plans(spark, sf_dir, "q485_oaxaca_mix_rate")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 2  # orders + customer
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)


def test_q486_distance_fold_reads_checkpointed_ranks(spark, sf_dir):
    """Rank instability: the footrule/rho fold and the final join both
    replay the checkpointed 25-row rank frame — the dim-join chain runs
    once (one lineitem scan across stages, zero in the final plan)."""
    plans = _plans(spark, sf_dir, "q486_rank_instability")
    final = plans[-1]
    assert _scans(final) == 0
    # pre-checkpoint stage: lineitem + supplier + nation, each once
    assert sum(_scans(c) for c in plans[:-1]) == 3


def test_q488_one_scan_three_prefix_windows(spark, sf_dir):
    """Breakpoint search: ONE orders scan; prefix cums AND frame totals
    are windows over the same day rollup (no second rollup branch); the
    argmin is an aggregate and the final cut a 1-row limit."""
    plans = _plans(spark, sf_dir, "q488_breakpoint_search")
    assert sum(_scans(p) for p in plans) == 1
    final = plans[-1]
    assert _ops(final, "TakeOrderedAndProject") + _ops(final, "CollectLimit") >= 1
    assert raw_single_partition_sort_violations(final) == []


def test_q489_topk_is_take_ordered(spark, sf_dir):
    """Edge Jaccard: the top-10 cut is TakeOrderedAndProject (bounded
    output — no global sort of the edge set); the wedge join and
    degree/common joins read the checkpointed edge list (one lineitem
    scan total)."""
    plans = _plans(spark, sf_dir, "q489_edge_jaccard")
    final = plans[-1]
    assert _ops(final, "TakeOrderedAndProject") == 1
    assert _scans(final) == 0
    # pre-checkpoint edge build: the collect_set pair expansion reads
    # lineitem exactly ONCE (round-11 optimization: the former distinct
    # self-join scanned it twice and shuffled the distinct per side)
    assert sum(_scans(c) for c in plans[:-1]) == 1


def test_q490_single_scan_no_window(spark, sf_dir):
    """Fisher index: one lineitem scan through the year rollup and the
    part-key pivot; the basket folds are aggregates — no window, no
    sort-merge join."""
    plans = _plans(spark, sf_dir, "q490_fisher_price_index")
    assert sum(_scans(p) for p in plans) == 1
    assert all(_ops(p, "Window") == 0 for p in plans)
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)


def test_q491_branches_read_checkpointed_counts(spark, sf_dir):
    """MAD robust-z: the total, both median cums and the z census all
    replay the checkpointed per-customer rollup — one orders scan
    total, zero in the final plan; every support window has its
    support aggregate below it."""
    plans = _plans(spark, sf_dir, "q491_mad_robust_z")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1


def test_q492_moments_read_checkpointed_cells(spark, sf_dir):
    """Winsorized correlation: marginal cums, percentile bounds and
    both moment sets replay the checkpointed 550-cell joint support —
    one lineitem scan total, zero in the final plan."""
    plans = _plans(spark, sf_dir, "q492_winsorized_corr")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1


def test_q493_one_scan_no_window(spark, sf_dir):
    """Design effect: one documents scan to O(sources) moments (then
    checkpointed for the two folds); no window anywhere."""
    plans = _plans(spark, sf_dir, "q493_design_effect")
    assert sum(_scans(p) for p in plans) == 1
    assert all(_ops(p, "Window") == 0 for p in plans)


def test_q497_q498_single_fold_grids(spark, sf_dir):
    """OBF and standardization: the corpus (orders/lineitem x broadcast
    dim where applicable) collapses in ONE grouped aggregate; windows
    (q497's stage cums) are PARTITIONED by arm over the 8-row grid; no
    sort-merge join."""
    for name in ("q497_obrien_fleming", "q498_direct_standardization"):
        plans = _plans(spark, sf_dir, name)
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name
        for p in plans:
            assert raw_single_partition_sort_violations(p) == [], name


def test_q499_per_part_cum_is_bucket_partitioned(spark, sf_dir):
    """ABC/XYZ: the per-part revenue cum must be a window PARTITIONED by
    the $1000 bucket (the two-phase trick) — the ONLY unpartitioned sort
    runs on the aggregated bucket frame; everything reads the
    checkpointed part rollup (one lineitem scan total)."""
    plans = _plans(spark, sf_dir, "q499_abc_xyz")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert re.search(r"windowspecdefinition\(bkt", final) is not None
    assert raw_single_partition_sort_violations(final) == []


def test_q500_no_window_two_rollups(spark, sf_dir):
    """X-bar/R: day rollup -> week rollup -> folds; no window, no
    sort-merge join; census and limits read the checkpointed week frame
    (one orders scan total)."""
    plans = _plans(spark, sf_dir, "q500_xbar_control_chart")
    assert all(_ops(p, "Window") == 0 for p in plans)
    assert all(_ops(p, "SortMergeJoin") == 0 for p in plans)
    assert _scans(plans[-1]) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1


BLOCK_501 = [
    "q501_gwet_ac1",
    "q502_cohens_h",
    "q503_byar_rate_ci",
    "q504_youden_threshold",
    "q505_expected_shortfall",
    "q506_tost_equivalence",
    "q507_mean_residual_life",
    "q508_woolf_homogeneity",
]


def test_block501_no_raw_single_partition_sorts(spark, sf_dir):
    """Every q501-q508 query, including checkpointed stages, must be
    free of unpartitioned sorts over raw corpus rows."""
    for name in BLOCK_501:
        for p in _plans(spark, sf_dir, name):
            assert raw_single_partition_sort_violations(p) == [], name


def test_q501_q502_q506_single_fold_no_window(spark, sf_dir):
    """AC1, Cohen's h, TOST: ONE aggregate to a cell/pivot grid, closed
    form after — no window, no sort-merge join, one scan."""
    for name in ("q501_gwet_ac1", "q502_cohens_h", "q506_tost_equivalence"):
        plans = _plans(spark, sf_dir, name)
        assert sum(_scans(p) for p in plans) == 1, name
        assert all(_ops(p, "Window") == 0 for p in plans), name
        assert all(_ops(p, "SortMergeJoin") == 0 for p in plans), name


def test_q504_q505_single_scan_support_windows(spark, sf_dir):
    """Youden scan and expected shortfall: ONE scan; totals come from
    whole-frame windows over the same support (no second rollup
    branch)."""
    for name in ("q504_youden_threshold", "q505_expected_shortfall"):
        plans = _plans(spark, sf_dir, name)
        assert sum(_scans(p) for p in plans) == 1, name


def test_q507_grid_join_reads_checkpointed_gaps(spark, sf_dir):
    """MRL: the horizon-grid join and the total read the checkpointed
    gap support — one orders scan total, zero in the final plan; the
    only corpus window is customer-partitioned lead()."""
    plans = _plans(spark, sf_dir, "q507_mean_residual_life")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert _ops(final, "SortMergeJoin") == 0


def test_q508_folds_read_checkpointed_lor(spark, sf_dir):
    """Woolf: pooling and the dispersion fold read the checkpointed
    2-row log-OR frame; the cell grid reads the checkpointed K x 4
    table — one lineitem scan total across stages, zero in the final
    plan; no window."""
    plans = _plans(spark, sf_dir, "q508_woolf_homogeneity")
    final = plans[-1]
    assert _scans(final) == 0
    assert sum(_scans(c) for c in plans[:-1]) == 1
    assert all(_ops(p, "Window") == 0 for p in plans)
