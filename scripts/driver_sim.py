"""Driver-contract simulation: run every queries() entry at a given SF dir
and compare against oracle_sql() in DuckDB (rows + sorted columns + values
rounded to 6). Mirrors the per-round CORRECTNESS gate.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
from pyspark.sql import SparkSession

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not only:
        e = mod.entry(spark)
        print(f"entry ok: {e.count()} rows")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs = mod.queries()
    osql = mod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            if name not in osql:
                print(f"{name}: no_oracle rows={len(srows)}")
                continue
            ores = con.execute(osql[name])
            ocolnames = [d[0] for d in ores.description]
            orows = ores.fetchall()
            scols, ocols = sorted(sdf.columns), sorted(ocolnames)

            def norm(rows, cols, order):
                idx = [order.index(c) for c in cols]
                out = []
                for r in rows:
                    vals = []
                    for i in idx:
                        v = r[i]
                        if isinstance(v, float):
                            v = round(v, 6)
                        vals.append(v)
                    out.append(tuple(vals))
                return sorted(out, key=str)

            ok = (
                len(srows) == len(orows)
                and scols == ocols
                and norm([tuple(r) for r in srows], scols, list(sdf.columns))
                == norm(orows, ocols, ocolnames)
            )
            if ok:
                print(f"{name}: OK ({len(srows)} rows)")
            else:
                fails.append(name)
                print(
                    f"{name}: FAIL rows {len(srows)}/{len(orows)} "
                    f"schema {scols == ocols}"
                )
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
    print("FAILS:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
