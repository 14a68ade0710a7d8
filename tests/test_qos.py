"""Round-7 QoS/operations analytics invariants (q276-q278).

The oracle parity for these queries is certified by scripts/driver_sim.py;
these tests pin the SEMANTIC invariants the oracle compare cannot see:
the two-window AND of the burn-rate alert, WIP non-negativity and the
Little's-law identity wiring, and the hysteresis contract of the rescale
replay (reference: phoebe's QoS-driven rescaling loop, arXiv 2206.09679
SIII — rescale only when the target moves enough to pay for the
savepoint-restore).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_burn_rate_two_window_and(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q276_slo_burn_rate"](spark, SF).collect()
    assert rows, "burn-rate result must be non-empty"
    for r in rows:
        assert r.n >= r.errs >= 0
        # a page requires BOTH windows over threshold
        if r.page:
            assert r.burn_short > 1.5 and r.burn_long > 1.1
        else:
            assert r.burn_short <= 1.5 or r.burn_long <= 1.1
    # non-vacuity: short-window burns must exceed 1x somewhere (error rate
    # is ~20% by construction, so the budget is being consumed)
    assert any(r.burn_short > 1.0 for r in rows)


def test_littles_law_wip_nonnegative_and_identity(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q277_littles_law_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.avg_wip >= 0.0, "cumulative arrivals-completions went negative"
        # pred_l/resid derive from UNROUNDED lam/mean_w/avg_wip; recomputing
        # from the 6dp-rounded outputs is only approximate
        assert abs(r.pred_l - r.lam * r.mean_w) < 1e-2 + 1e-4 * abs(r.pred_l)
        assert abs(r.resid - (r.avg_wip - r.pred_l)) < 1e-2 + 1e-4 * abs(r.resid)
        assert r.lam > 0.0, "weeks without arrivals must not appear"


def test_rescale_replay_hysteresis_contract(spark):
    from phoebe_spark.queries import QUERIES

    rows = sorted(
        QUERIES["q278_rescale_replay"](spark, SF).collect(), key=lambda r: r.t
    )
    assert [r.t for r in rows] == list(range(1, 31))
    assert rows[0].par == rows[0].target and rows[0].rescaled == 0
    cap = 12
    for prev, cur in zip(rows, rows[1:]):
        # target is ceil(previous day's count / cap)
        assert cur.target == (prev.c + cap - 1) // cap
        if abs(cur.target - prev.par) >= 2:
            assert cur.rescaled == 1 and cur.par == cur.target
        else:
            assert cur.rescaled == 0 and cur.par == prev.par
