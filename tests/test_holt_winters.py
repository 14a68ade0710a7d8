"""q284 Holt-Winters semantics: on an EXACTLY weekly-periodic series the
classical init makes every one-step error zero, so the state never moves
and the season of forecasts reproduces the pattern exactly — a sharp
functional check no value-hash provides (the driver gate certifies the
recursion against the CTE chain; this certifies the recursion is the
RIGHT one)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def test_hw_exact_on_periodic_series(spark, tmp_path):
    from phoebe_spark.queries import QUERIES

    pattern = [10, 14, 8, 20, 12, 16, 6]  # weekly counts, repeated 4x
    rows = []
    eid = 0
    for d in range(28):
        for j in range(pattern[d % 7]):
            rows.append((eid, (d * 86400 + j) * 10**9, j, "click"))
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    d = tmp_path / "hw"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    out = QUERIES["q284_holt_winters"](spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    mean = sum(pattern) / 7
    assert abs(r.level - mean) < 1e-6
    assert abs(r.trend) < 1e-6
    # day 29 is pattern[28 % 7] = pattern[0], etc.
    for h in range(1, 8):
        expected = pattern[(28 + h - 1) % 7]
        assert abs(getattr(r, f"f{h}") - expected) < 1e-6, (h, expected, r)
