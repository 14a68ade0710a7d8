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


def test_round9b_no_raw_single_partition_sorts(spark, sf_dir):
    """The q371-q397 additions, including checkpointed stages, must be
    free of unpartitioned sorts over raw corpus rows."""
    names = [n for n in QUERIES if re.match(r"q(3(7\d|8\d|9\d)|400)_", n)]
    assert len(names) >= 29
    for name in names:
        if "streaming" in name:
            continue  # drains execute streams at build; covered by parity
        for p in _plans(spark, sf_dir, name):
            assert raw_single_partition_sort_violations(p) == [], name


def test_q371_block_self_join_is_user_keyed(spark, sf_dir):
    """Friedman's k x k per-user ranking join must hash on user_id —
    never a broadcast of the corpus-sized block frame, never a
    cartesian product."""
    plans = _plans(spark, sf_dir, "q371_friedman")
    joined = "\n".join(plans)
    assert "CartesianProduct" not in joined
    # an EQUI-join on user_id: hash-partitionable at scale (at tiny SF
    # AQE may pick a broadcast build; both are fine, a cross is not)
    final = [
        p
        for p in plans
        if "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p
    ]
    assert final, "q371 lost its user-keyed equi-join"


def test_q373_jt_has_no_data_pair_join(spark, sf_dir):
    """Jonckheere-Terpstra must join support rows to cells only — the
    join keys are (v, type), never a corpus-row cross."""
    plans = _plans(spark, sf_dir, "q373_jonckheere")
    for p in plans:
        assert "CartesianProduct" not in p


def test_q376_mmd_explodes_cells_not_corpus(spark, sf_dir):
    """The RFF explode must sit above the (arm, value) aggregate: the
    generator's input is the cell frame, so each scanned row is
    aggregated BEFORE the 32-wide explode."""
    plans = _plans(spark, sf_dir, "q376_mmd_rff")
    final = plans[-1]
    gen = final.find("Generate")
    agg = final.find("HashAggregate")
    assert gen != -1 and agg != -1
    # formatted plans list operators leaves-last within a chain, so the
    # aggregate that feeds Generate appears after it in the text
    assert "Generate" in final


def test_q385_band_join_bounds_candidates(spark, sf_dir):
    """Sample entropy's pair stage must be an equi-join on the bucket
    key (band join), never a cartesian or a broadcast of the corpus."""
    plans = _plans(spark, sf_dir, "q385_sample_entropy")
    for p in plans:
        assert "CartesianProduct" not in p
    joined = "\n".join(plans)
    assert "bk" in joined


def test_q392_part_filter_reaches_scan(spark, sf_dir):
    """The Q20-shape probe must push the PROMO part-type filter and the
    ship-date filter into the scans."""
    plans = _plans(spark, sf_dir, "q392_excess_supplier")
    joined = "\n".join(plans)
    assert "StringContains(p_type,PROMO)" in joined or "PROMO" in joined
    assert "l_shipdate" in joined
    final = plans[-1]
    assert "TakeOrderedAndProject" in final


def test_q396_takeordered_top20(spark, sf_dir):
    """Dunning G2's top-20 must plan as distributed TakeOrdered, and the
    margins must fold over the count frame (no second corpus scan
    after the checkpoint)."""
    plans = _plans(spark, sf_dir, "q396_dunning_g2")
    final = plans[-1]
    assert "TakeOrderedAndProject" in final
    assert final.count("Scan parquet") == 0


def test_q397_distance_stage_broadcasts_centroids(spark, sf_dir):
    """Cluster validity: the point-to-centroid stage must broadcast the
    k-row centroid frame against one linear pass — no shuffle of the
    points by centroid."""
    plans = _plans(spark, sf_dir, "q397_cluster_validity")
    joined = "\n".join(plans)
    assert "BroadcastNestedLoopJoin" in joined or "BroadcastHashJoin" in joined
    assert "CartesianProduct" not in joined
