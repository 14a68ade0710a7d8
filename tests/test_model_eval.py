"""Round-7 model-evaluation analytics invariants (q279-q281).

Oracle parity is certified by scripts/driver_sim.py; these pin semantics
the value-hash cannot: AUC bounds and its tie-average construction,
ECE-term composition, and Welch-test antisymmetry under arm swap.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_auc_bounds_and_perfect_separation(spark, tmp_path):
    from phoebe_spark.queries import QUERIES

    out = QUERIES["q279_roc_auc"](spark, SF).collect()
    assert out
    for r in out:
        assert 0.0 <= r.auc <= 1.0
        assert abs(r.gini - round(2 * r.auc - 1, 6)) <= 2e-6
        assert r.p > 0 and r.n > 0
    # a synthetic perfectly-separating score must yield AUC exactly 1.0
    tbl = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 2, 3, 4], pa.int32()),
            "l_quantity": pa.array([1.0] * 4),
            "l_extendedprice": pa.array([1.0] * 4),
            # returned rows get the strictly larger discount-derived score
            "l_discount": pa.array([0.09, 0.10, 0.01, 0.00]),
            "l_tax": pa.array([0.0] * 4),
            "l_returnflag": pa.array(["R", "R", "N", "A"]),
            "l_linestatus": pa.array(["F", "F", "F", "F"]),
            "l_shipdate": pa.array([0] * 4, pa.timestamp("us")),
        }
    )
    d = tmp_path / "sep"
    d.mkdir()
    pq.write_table(tbl, str(d / "lineitem.parquet"))
    row = QUERIES["q279_roc_auc"](spark, str(d)).collect()[0]
    assert row.auc == 1.0 and row.gini == 1.0


def test_calibration_bins_compose_to_ece(spark):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q280_calibration_bins"](spark, SF).collect()
    assert len(rows) == 10
    ece = sum(r.ece_term for r in rows)
    assert 0.0 <= ece <= 1.0
    for r in rows:
        assert 0.0 <= r.acc <= 1.0
        assert abs(r.gap - round(r.acc - r.conf_mean, 6)) <= 2e-6
        assert r.ece_term >= 0.0


def test_welch_antisymmetric_under_arm_swap(spark, tmp_path):
    from phoebe_spark.queries import QUERIES

    # swapping arm labels (user_id parity) must flip the sign of t and
    # keep df; build a tiny events table and its parity-flipped twin
    def tbl(flip: int):
        uids = [1, 2, 3, 4, 5, 6, 7, 8]
        vals = [1.0, 5.0, 2.0, 6.0, 1.5, 5.5, 2.5, 6.5]
        return pa.table(
            {
                "event_id": pa.array(range(8), pa.int64()),
                "ts": pa.array([i * 10**9 for i in range(8)], pa.int64()),
                "user_id": pa.array([u + flip for u in uids], pa.int64()),
                "event_type": pa.array(["click"] * 8),
                "value": pa.array(vals),
                "props": pa.array(["{}"] * 8),
            }
        )

    for name, flip in (("a", 0), ("b", 1)):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl(flip), str(d / "events.parquet"))
    ra = QUERIES["q281_ab_welch_ttest"](spark, str(tmp_path / "a")).collect()[0]
    rb = QUERIES["q281_ab_welch_ttest"](spark, str(tmp_path / "b")).collect()[0]
    assert abs(ra.t_stat + rb.t_stat) <= 2e-6
    assert abs(ra.df - rb.df) <= 2e-6
    assert ra.significant == rb.significant
