"""Round-7 invariants for conformal intervals (q290), k-core (q291),
and the mergeable histogram quantile sketch (q292)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_conformal_coverage_near_target(spark):
    from phoebe_spark.queries import QUERIES

    r = QUERIES["q290_conformal_interval"](spark, SF).collect()[0]
    assert r.q_hat >= 0
    assert r.n_cal > 0 and r.n_test > 0
    # finite-sample conformal guarantee is >= target in expectation;
    # with ~11 test points allow wide but meaningful slack
    assert r.coverage >= r.target - 0.35
    assert 0.0 <= r.coverage <= 1.0


def test_kcore_every_member_has_core_degree(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q291_kcore"](spark, SF).collect()
    assert rows, "2-core should be non-empty at sf0.001"
    stables = {r.stable for r in rows}
    assert len(stables) == 1, "certificate is a single graph-level fact"
    for r in rows:
        assert r.core_deg >= 2, "every survivor keeps >= k neighbors in-core"


def test_quantile_sketch_brackets_exact(spark):
    from phoebe_spark.queries import QUERIES

    rows = {r.q: r for r in QUERIES["q292_quantile_hist_sketch"](spark, SF).collect()}
    assert set(rows) == {0.5, 0.95, 0.99}
    for q, r in rows.items():
        assert r.merge_exact == 1, "half-sketches must sum to the full sketch"
        # 128 bins over [0, 500k): interpolation error is bounded by one
        # bin width (3906.25)
        assert abs(r.err) <= 3906.25 + 1e-6, (q, r.err)
        assert r.rel_err >= 0.0
    assert rows[0.5].exact <= rows[0.95].exact <= rows[0.99].exact
