"""Round-7 invariants: eigenvector centrality (q293), clustering
coefficient (q294), t-closeness (q296), Mann-Whitney U (q297)."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_eigencentrality_unit_norm_and_positive(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q293_eigencentrality"](spark, SF).collect()
    assert rows
    norm = math.sqrt(sum(r.score * r.score for r in rows))
    assert abs(norm - 1.0) < 1e-6, norm
    # Perron-Frobenius: the principal eigenvector of a connected
    # non-negative matrix is non-negative; components touched by the
    # iteration stay >= 0 from a positive start
    assert all(r.score >= 0 for r in rows)
    lam = {r.lambda_est for r in rows}
    assert len(lam) == 1 and lam.pop() > 0


def test_clustering_coeff_bounds(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q294_clustering_coeff"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.deg >= 2
        assert 0.0 <= r.cc <= 1.0 + 1e-9, r
        if r.n_tri == 0:
            assert r.cc == 0.0
        # cc == 1 iff the neighborhood is a clique
        if abs(r.cc - 1.0) < 1e-9:
            assert r.n_tri == r.deg * (r.deg - 1) // 2


def test_t_closeness_is_a_bounded_distance(spark):
    from phoebe_spark.queries import QUERIES
    from phoebe_spark.queries import _t

    rows = QUERIES["q296_t_closeness"](spark, SF).collect()
    assert rows
    n_docs = _t(spark, SF, "documents").count()
    assert sum(r.k for r in rows) == n_docs, "classes partition the corpus"
    for r in rows:
        assert 0.0 <= r.t_dist <= 1.0 + 1e-9
        assert r.violates_t02 == (1 if r.t_dist > 0.2 else 0)


def test_mann_whitney_u_range_and_symmetry(spark):
    from phoebe_spark.queries import QUERIES

    r = QUERIES["q297_mann_whitney"](spark, SF).collect()[0]
    assert r.n1 > 0 and r.n2 > 0
    assert 0.0 <= r.u1 <= r.n1 * r.n2
    assert math.isfinite(r.z)
    # synthetic values are iid across event types: |z| should not be
    # astronomically large
    assert abs(r.z) < 10.0


def test_link_prediction_candidates_are_nonedges(spark):
    from phoebe_spark.queries import QUERIES, _cograph_edges

    rows = QUERIES["q301_link_prediction"](spark, SF).collect()
    assert rows, "sf0.001 co-graph should yield candidates"
    edges = {(r.s1, r.s2) for r in _cograph_edges(spark, SF).collect()}
    for r in rows:
        assert r.u < r.w
        assert (r.u, r.w) not in edges, "candidates must be NON-edges"
        assert r.common_neighbors >= 1
        # AA term for a common neighbor (deg >= 2) is 1/ln(deg) <= 1/ln(2)
        assert 0 < r.adamic_adar <= r.common_neighbors * 1.4427


def _py_kcore(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference 2-core by repeated peeling on a plain dict: returns
    {node: within-core degree} at the fixpoint."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {n: len(adj[n] & alive) for n in alive}


def test_kcore_matches_reference_on_random_graphs(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from phoebe_spark.operators.graph import kcore_peel, symmetrize

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.sets(
            st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
                lambda p: (min(p), max(p))
            ),
            min_size=1,
            max_size=20,
        ).map(lambda es: {(a, b) for a, b in es if a != b})
    )
    def check(edge_set):
        if not edge_set:
            return
        ref = _py_kcore(edge_set, k=2)
        co = spark.createDataFrame(sorted(edge_set), "s1 long, s2 long")
        edges = symmetrize(co)
        # rounds >= node count guarantees the bounded form reaches the
        # fixpoint the reference computes
        _, _, deg = kcore_peel(edges, k=2, rounds=10)
        got = {r.src: r.deg for r in deg.collect()}
        assert got == ref, (sorted(edge_set), got, ref)

    check()


def test_isotonic_fit_is_monotone_and_pooled(spark):
    from phoebe_spark.queries import QUERIES

    rows = sorted(
        QUERIES["q302_isotonic_calibration"](spark, SF).collect(),
        key=lambda r: r.bin,
    )
    assert rows
    assert all(r.monotone_ok == 1 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b.iso >= a.iso - 1e-12, "isotonic fit must be non-decreasing"
    # the fit is a pooling of observed rates: stays inside their range
    lo = min(r.rate for r in rows)
    hi = max(r.rate for r in rows)
    for r in rows:
        assert lo - 1e-9 <= r.iso <= hi + 1e-9


def test_sprt_integer_walk_decision(spark):
    from phoebe_spark.queries import QUERIES

    r = QUERIES["q303_sprt_monitor"](spark, SF).collect()[0]
    assert r.d_threshold == 15
    assert r.decision in (-1, 0, 1)
    if r.decision != 0:
        # stopped: the boundary LLR magnitude is >= ln(19) by the
        # integer test |d| >= 15 > ln(19)/ln(11/9) ~ 14.67
        import math

        assert abs(r.llr) >= math.log(19.0) - 1e-9
    assert r.n_obs > 0


def _py_eigencentrality(edge_set: set[tuple[int, int]], iters: int = 3):
    """Reference power iteration replicating the engine's determinism
    policy EXACTLY: Decimal(x).quantize(1e-8, ROUND_HALF_UP) is what
    Spark's F.round(x, 8) computes on a double (exact binary expansion,
    half-up), decimal sums are exact, and /, sqrt are IEEE — so the
    DataFrame result must equal this float-for-float, not approximately."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r8(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("1e-8"), rounding=ROUND_HALF_UP))

    adj: dict[int, set[int]] = {}
    for a, b in edge_set:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    v = {n: r8(1.0 / math.sqrt(float(len(nodes)))) for n in nodes}
    lam = None
    for _ in range(iters):
        raw = {
            n: float(sum(Decimal(str(r8(v[m]))) for m in adj[n])) for n in nodes
        }
        lam = math.sqrt(
            float(sum(Decimal(str(r8(raw[n] * raw[n]))) for n in nodes))
        )
        v = {n: r8(raw[n] / lam) for n in nodes}
    return v, lam


def test_eigencentrality_matches_decimal_reference_exactly(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from phoebe_spark.operators.graph import eigencentrality, symmetrize

    @settings(
        max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    @given(
        st.sets(
            st.tuples(st.integers(0, 7), st.integers(0, 7)).map(
                lambda p: (min(p), max(p))
            ),
            min_size=2,
            max_size=14,
        ).map(lambda es: {(a, b) for a, b in es if a != b})
    )
    def check(edge_set):
        if not edge_set:
            return
        ref_v, ref_lam = _py_eigencentrality(edge_set, iters=3)
        co = spark.createDataFrame(sorted(edge_set), "s1 long, s2 long")
        rows = eigencentrality(symmetrize(co), iters=3).collect()
        got = {r.n: r.score for r in rows}
        assert got == ref_v, (sorted(edge_set), got, ref_v)
        assert all(r.lambda_est == ref_lam for r in rows)

    check()


def test_streaming_sprt_equals_batch_monitor(spark):
    from phoebe_spark.queries import QUERIES

    batch = QUERIES["q303_sprt_monitor"](spark, SF).collect()[0]
    stream = QUERIES["q306_streaming_sprt_drain"](spark, SF).collect()[0]
    assert (stream.n_obs, stream.decision, stream.llr, stream.d_threshold) == (
        batch.n_obs,
        batch.decision,
        batch.llr,
        batch.d_threshold,
    ), (stream, batch)


def test_grouped_conformal_one_row_per_type(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q307_grouped_conformal"](spark, SF).collect()
    assert len(rows) == 5, "one calibration per event type"
    for r in rows:
        assert r.n_cal > 0 and r.n_test > 0 and r.q_hat >= 0
        assert 0.0 <= r.coverage <= 1.0
        assert r.coverage >= r.target - 0.4  # tiny per-key test splits


def test_landmark_bfs_census_is_sane(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q308_landmark_bfs"](spark, SF).collect()
    assert rows
    seeds = {r.seed for r in rows}
    assert len(seeds) <= 4
    for s in seeds:
        mine = {r.dist: r.n_nodes for r in rows if r.seed == s}
        assert mine.get(0) == 1, "each landmark is at distance 0 from itself"
        assert all(0 <= d <= 4 for d in mine)
        assert all(n >= 1 for n in mine.values())


def test_heaps_law_curve_is_monotone_and_beta_in_range(spark):
    from phoebe_spark.queries import QUERIES

    rows = sorted(QUERIES["q309_heaps_law"](spark, SF).collect(), key=lambda r: r.k)
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        assert b.tokens >= a.tokens and b.types >= a.types
    betas = {r.heaps_beta for r in rows}
    assert len(betas) == 1
    beta = betas.pop()
    # types never grow faster than tokens; at sf0.001 the synthetic
    # vocabulary saturates inside the first prefix, so beta == 0 is the
    # honest floor there
    assert 0.0 <= beta <= 1.0
    assert rows[0].heaps_k > 0
