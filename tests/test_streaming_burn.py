"""q289 streaming burn-rate drain: the streamed state-store form must
equal the batch RANGE-frame form (q276) row-for-row — the cross-batch
window ring carries across the three staged micro-batches."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_streaming_burn_equals_batch(spark):
    from phoebe_spark.queries import QUERIES

    batch = {
        r.hr: r for r in QUERIES["q276_slo_burn_rate"](spark, SF).collect()
    }
    stream = QUERIES["q289_streaming_burn_drain"](spark, SF).collect()
    assert len(stream) == len(batch)
    for r in stream:
        b = batch[r.hr]
        assert (r.n, r.errs, r.page) == (b.n, b.errs, b.page)
        assert r.burn_short == b.burn_short
        assert r.burn_long == b.burn_long
