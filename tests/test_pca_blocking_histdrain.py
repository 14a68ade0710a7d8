"""Round-7 invariants: PCA power iteration (q298), blocking quality
(q299), and the streaming histogram drain (q300) against its batch twin
(q292)."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_pca_unit_loading_and_explained_ratio(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q298_pca_power_iter"](spark, SF).collect()
    assert len(rows) == 64
    norm = math.sqrt(sum(r.loading * r.loading for r in rows))
    # the 8-dp determinism policy rounds w*w terms whose scale is the
    # eigenvalue's square, so unit-norm holds to ~1e-4, not machine eps
    assert abs(norm - 1.0) < 1e-3
    lam = {r.lambda_est for r in rows}
    er = {r.explained_ratio for r in rows}
    assert len(lam) == 1 and len(er) == 1
    lam, er = lam.pop(), er.pop()
    assert lam > 0
    # one of d directions cannot explain less than 0 or more than all
    # variance; with 64 iid-ish dims it should be a modest fraction
    assert 0.0 < er <= 1.0


def test_pca_lambda_below_trace_via_rayleigh(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q298_pca_power_iter"](spark, SF).collect()
    er = rows[0].explained_ratio
    # lambda_max <= trace always; strict here since no single direction
    # carries everything
    assert er < 1.0


def test_blocking_quality_bounds(spark):
    from phoebe_spark.queries import QUERIES

    r = QUERIES["q299_blocking_quality"](spark, SF).collect()[0]
    assert r.n_docs > 0 and r.n_blocks > 0
    assert 0 <= r.cand_pairs <= r.n_docs * (r.n_docs - 1) // 2
    assert 0 <= r.true_in_block <= r.true_pairs
    assert 0.0 <= r.reduction_ratio <= 1.0
    assert 0.0 <= r.pairs_completeness <= 1.0


def test_streaming_hist_drain_equals_batch_sketch(spark):
    from phoebe_spark.queries import QUERIES

    batch = {
        r.q: r for r in QUERIES["q292_quantile_hist_sketch"](spark, SF).collect()
    }
    stream = {
        r.q: r for r in QUERIES["q300_streaming_hist_drain"](spark, SF).collect()
    }
    assert set(batch) == set(stream) == {0.5, 0.95, 0.99}
    for q in batch:
        assert batch[q] == stream[q], (q, batch[q], stream[q])
        assert stream[q].merge_exact == 1


def test_ams_sketch_sign_sums_are_mergeable_and_sane(spark):
    from phoebe_spark.queries import QUERIES

    r = QUERIES["q304_ams_f2_sketch"](spark, SF).collect()[0]
    assert r.f2 >= r.n_keys  # sum c^2 >= number of keys
    assert r.f2_est >= 0
    # 16-estimator median: E[Z^2] = F2; allow wide but meaningful slack
    assert r.rel_err < 3.0, r


def test_merkle_root_changes_iff_any_doc_changes(spark):
    from pyspark.sql import functions as F

    from phoebe_spark.queries import QUERIES, _t

    rows = QUERIES["q305_corpus_merkle"](spark, SF).collect()
    assert len(rows) == 16
    assert len({r.root_hash for r in rows}) == 1
    assert sum(r.n_docs for r in rows) == _t(spark, SF, "documents").count()
    # re-running is deterministic
    again = QUERIES["q305_corpus_merkle"](spark, SF).collect()
    assert {r.bucket: r.bucket_hash for r in rows} == {
        r.bucket: r.bucket_hash for r in again
    }
