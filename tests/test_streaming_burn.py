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


def test_burn_guard_skips_empty_and_out_of_order_hours(spark, tmp_path):
    """Round-8 hardening: an hourly row with n == 0 must not raise
    ZeroDivisionError, and a late (out-of-order) hour must be dropped
    rather than silently corrupting the monotone window ring."""
    import glob
    import os
    import shutil

    from phoebe_spark.streaming.stateful import streaming_burn_rate

    # batch 1: hours 10, 11; batch 2: hour 12 plus an empty hour (n=0),
    # a LATE replay of hour 10 with huge errors that would page if it
    # were folded into the ring, and an EQUAL-hour replay of hour 12
    # (the common at-least-once artifact) that must not double-count.
    batches = [
        [(10, 100, 1), (11, 100, 2)],
        [(12, 100, 1), (13, 0, 0), (10, 100, 99), (12, 100, 99)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches, start=1):
        df = spark.createDataFrame(rows, "hr LONG, n LONG, errs LONG")
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(stage)
        pf = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src}/{i:03d}.parquet"
        shutil.copyfile(pf, dst)
        os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

    stream = (
        spark.readStream.schema("hr LONG, n LONG, errs LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = str(tmp_path / "sink")
    q = (
        streaming_burn_rate(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda bdf, _bid: bdf.write.mode("append").parquet(sink))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    rows = spark.read.parquet(sink).collect()
    out = {r.hr: r for r in rows}
    assert len(rows) == 3                    # ONE emission per surviving hour
    assert set(out) == {10, 11, 12}          # 13 (n=0) and both replays dropped
    assert out[10].errs == 1                 # the late hr-10 row never emitted
    assert out[12].errs == 1                 # the same-hour replay never folded
    assert all(r.page == 0 for r in out.values())
