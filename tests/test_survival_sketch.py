"""Round-7 invariants for Kaplan-Meier (q282) and HyperLogLog (q283).

Oracle parity is certified by scripts/driver_sim.py; these pin the
semantics the value-hash cannot: KM monotonicity and censoring behavior,
HLL merge exactness and error behavior.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_km_monotone_and_bounded(spark):
    from phoebe_spark.queries import QUERIES

    rows = sorted(QUERIES["q282_kaplan_meier"](spark, SF).collect(), key=lambda r: r.t)
    assert rows
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev + 2e-6, "KM curve must be non-increasing"
        assert r.d >= 1 and r.n_risk >= r.d
        prev = r.survival


def test_km_censoring_shrinks_risk_without_stepping(spark, tmp_path):
    from phoebe_spark.queries import QUERIES

    # 3 customers: A orders day 0 and 10 (event t=10); B orders day 0 only
    # (censored at t=20); C orders day 0 and 5 (event t=5). Corpus max
    # day = 20 (B's censor time). Durations: events {5,10}, censors
    # {t=10 for A's tail, t=15 for C's tail, t=20 for B}.
    days = [(1, 0), (1, 10), (2, 0), (3, 0), (3, 5), (4, 20)]
    # customer 4 anchors dmax=20 with a single order (censor t=0)
    tbl = pa.table(
        {
            "o_orderkey": pa.array(range(len(days)), pa.int64()),
            "o_custkey": pa.array([c for c, _ in days], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(days)),
            "o_totalprice": pa.array([1.0] * len(days)),
            "o_orderdate": pa.array(
                [d * 86400 * 10**6 for _, d in days], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(days)),
        }
    )
    d = tmp_path / "km"
    d.mkdir()
    pq.write_table(tbl, str(d / "orders.parquet"))
    rows = {r.t: r for r in QUERIES["q282_kaplan_meier"](spark, str(d)).collect()}
    # events only at t=5 and t=10; censor times (0, 10, 15, 20) never step
    assert set(rows) == {5, 10}
    # at t=5: at-risk = all 6 durations except the t=0 censor -> 5
    assert rows[5].n_risk == 5 and rows[5].d == 1
    assert abs(rows[5].survival - 0.8) < 2e-6
    # at t=10: remaining risk set {10(ev),10(cens),15,20} -> 4; S = 0.8*(1-1/4)
    assert rows[10].n_risk == 4 and rows[10].d == 1
    assert abs(rows[10].survival - 0.6) < 2e-6


def test_hll_merge_exact_and_error_band(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q283_hll_distinct"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.merge_exact == 1, "register-max union must be lossless"
        assert r.est == r.est_merged
        assert r.est > 0
        # m=64 -> ~13% typical error; generous band that still catches a
        # broken register/rank computation (which lands orders off)
        assert r.rel_err < 0.6, f"{r.grp}: rel_err {r.rel_err}"
    all_row = [r for r in rows if r.grp == "ALL"]
    assert len(all_row) == 1
