"""Round-7 invariants for bigram LM (q285), l-diversity (q286), and the
column-dependence audit (q287)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_bigram_lm_scores_are_probabilities(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q285_bigram_lm_score"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.avg_lp < 0.0, "mean log-prob of a smoothed LM is negative"
        assert r.ppl > 1.0
        assert abs(r.ppl - round(2.718281828459045 ** (-r.avg_lp), 6)) < 1e-3
        assert r.n_docs > 0


def test_l_diversity_entropy_bounded_by_distinct(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q286_l_diversity"](spark, SF).collect()
    assert rows
    for r in rows:
        # exp-entropy (effective number of sensitive values) is at most
        # the distinct count, at least 1
        assert 1.0 - 1e-6 <= r.l_entropy <= r.l_distinct + 1e-6
        assert r.k >= r.l_distinct
        assert r.violates_l3 == (1 if r.l_distinct < 3 else 0)


def test_column_dependence_stat_bounds(spark):
    from phoebe_spark.queries import QUERIES

    r = QUERIES["q287_column_dependence"](spark, SF).collect()[0]
    assert r.mi >= -1e-9, "mutual information is non-negative"
    assert r.chi2 >= -1e-9
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.dof == (r.r - 1) * (r.c - 1)
