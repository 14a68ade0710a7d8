"""Streaming-drain drift attribution harness (round-10 judge ask #2).

BENCH_r08 -> BENCH_r09 showed the shared slow tail (the Structured
Streaming drains) regressing 20-40% (q229 7.18 -> 9.75 s median-of-3).
Candidate causes: (a) in-session position / JVM heap aging, (b) registry
growth putting more work before the drains, (c) driver-host delta.
This script isolates (a) and (b) on a fixed host and code version by
timing the drains at two controlled session ages with the EXACT bench
warmup and release cadence:

  --mode first : N fresh sessions, each runs every drain once right
                 after bench's standard warmup -> per-drain median of N
                 at minimal session age.
  --mode aged  : one session runs --warmup-entries cheap registry
                 queries first (release_session_state every 50, exactly
                 like bench.py), then the drains N times -> per-drain
                 median at bench-like session age.

Prints one JSON line: {"mode": ..., "medians": {q: sec}, "runs": {...}}.
Compare across modes (aging effect) and across git revisions (code
effect); the residual vs the driver's BENCH_r{N} numbers is host delta.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phoebe_spark.queries import QUERIES  # noqa: E402
from phoebe_spark.session import get_spark  # noqa: E402

DRAINS = sorted(n for n in QUERIES if "drain" in n)


def _warmup(spark, sf_dir: str) -> None:
    """bench.py's session warmup, verbatim semantics."""
    import pandas as pd
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
    spark.range(64).repartition(8).groupBy(F.col("id") % 8).applyInPandas(
        lambda pdf: pd.DataFrame({"n": [len(pdf)]}), "n long"
    ).collect()
    spark.range(1000).join(
        F.broadcast(spark.createDataFrame([(1, "x")], "id long, s string")), "id"
    ).count()


def _release(spark) -> None:
    """bench.py's release_session_state, verbatim semantics."""
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(False)
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["first", "aged"], required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warmup-entries", type=int, default=200)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--release-between",
        action="store_true",
        help="call release_session_state before EVERY drain (tests whether "
        "the back-to-back drain slowdown is releasable accumulation)",
    )
    args = ap.parse_args()

    runs: dict[str, list[float]] = {d: [] for d in DRAINS}

    if args.mode == "first":
        # fresh JVM per rep: every sample is at minimal session age
        for rep in range(args.reps):
            spark = get_spark(f"drift-first-{rep}")
            spark.sparkContext.setLogLevel("ERROR")
            _warmup(spark, args.sf_dir)
            for d in DRAINS:
                runs[d].append(_run(spark, d, args.sf_dir))
            spark.stop()
    else:
        spark = get_spark("drift-aged")
        spark.sparkContext.setLogLevel("ERROR")
        _warmup(spark, args.sf_dir)
        # age the session exactly like a bench run: cheap registry
        # entries in registry order, release every 50 like bench.py
        cheap = [n for n in sorted(QUERIES) if n not in DRAINS][
            : args.warmup_entries
        ]
        for i, name in enumerate(cheap):
            if i and i % 50 == 0:
                _release(spark)
            try:
                _run(spark, name, args.sf_dir)
            except Exception as exc:  # age anyway; report later
                print(f"warmup {name} failed: {exc}", file=sys.stderr)
        _release(spark)
        for rep in range(args.reps):
            for d in DRAINS:
                if args.release_between:
                    _release(spark)
                runs[d].append(_run(spark, d, args.sf_dir))
        spark.stop()

    medians = {d: round(statistics.median(v), 3) for d, v in runs.items()}
    print(
        json.dumps(
            {
                "mode": args.mode,
                "release_between": bool(args.release_between),
                "reps": args.reps,
                "warmup_entries": args.warmup_entries if args.mode == "aged" else 0,
                "sf_dir": args.sf_dir,
                "total_median_sum": round(sum(medians.values()), 2),
                "medians": medians,
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
