"""Optimization-round measurement harness (guide §1): isolate named
registry queries with the noop sink, report per-query seconds (median of
N samples, construction+noop timed exactly like bench.py), and dump
`.explain("formatted")` to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python scripts/opt_measure.py [--samples N] [--plans-suffix before|after]
         [--sf-dir DIR] query [query ...]

Prints one JSON line {query: median_sec} at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phoebe_spark.queries import QUERIES
from phoebe_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--plans-suffix", default="")
    ap.add_argument("--plans-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py so sample 1 is not JVM boot
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import pandas as pd
    from pyspark.sql import functions as F

    spark.range(64).repartition(8).groupBy(F.col("id") % 8).applyInPandas(
        lambda pdf: pd.DataFrame({"n": [len(pdf)]}), "n long"
    ).collect()
    spark.range(1000).join(
        F.broadcast(spark.createDataFrame([(1, "x")], "id long, s string")), "id"
    ).count()

    def release() -> None:
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    out: dict[str, float] = {}
    for name in args.queries:
        fn = QUERIES[name]
        runs = []
        for s in range(args.samples):
            release()
            spark.sparkContext.setJobDescription(f"{name} sample {s}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = round(statistics.median(runs), 3)
        print(f"# {name}: median {out[name]} runs {runs}", file=sys.stderr)
        if args.plans_suffix:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.plans_suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
