"""Driver-contract simulation: run every queries() entry at a given SF dir
and compare against oracle_sql() in DuckDB (rows + sorted columns + values
rounded to 6 + ARROW-LEVEL TYPE EQUALITY). Mirrors the per-round
CORRECTNESS gate, and is deliberately stricter than a pure value compare:
round 4 proved the driver's hash is arrow-type-sensitive (DuckDB returns
an uncast integer ``sum()`` as decimal128(38,0) where Spark emits int64 —
values equal, hash differs), so we assert the DuckDB arrow schema matches
Spark's arrow schema (via ``to_arrow_schema``) per column, with only
representation-level normalization (string==large_string, list==large_list,
timestamp unit/tz ignored). A decimal-vs-int or int32-vs-int64 deviation
FAILS here before it can fail in the driver.

Also warns on 0-row results: empty-vs-empty proves nothing about the
operator, so registry queries should be non-vacuous at the checked SF.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql.pandas.types import to_arrow_schema

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_type(t: pa.DataType):
    """Collapse representation-only differences; keep value-type differences.

    Integer WIDTHS are normalized (int32==int64): the driver's hash
    demonstrably tolerates width (q09/q52/... were driver-green with
    Spark int32 vs DuckDB int64 in r2/r3); what broke it in r4 was
    decimal128 vs int64, which stays a hard mismatch here.
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return ("list", _norm_type(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple(sorted((f.name, _norm_type(f.type)) for f in t)))
    if pa.types.is_map(t):
        return ("map", _norm_type(t.key_type), _norm_type(t.item_type))
    return str(t)


def _type_mismatches(spark_schema: pa.Schema, oracle_schema: pa.Schema) -> list[str]:
    s = {f.name: _norm_type(f.type) for f in spark_schema}
    o = {f.name: _norm_type(f.type) for f in oracle_schema}
    out = []
    for name in sorted(set(s) & set(o)):
        if s[name] != o[name]:
            out.append(f"{name}: spark={s[name]} oracle={o[name]}")
    return out


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
            oschema = con.execute(osql[name]).fetch_arrow_table().schema
            ores = con.execute(osql[name])
            ocolnames = [d[0] for d in ores.description]
            orows = ores.fetchall()
            scols, ocols = sorted(sdf.columns), sorted(ocolnames)
            tmis = _type_mismatches(to_arrow_schema(sdf.schema), oschema)
            if len(srows) == 0:
                print(f"{name}: WARN 0 rows at this SF — vacuous compare")

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
                and not tmis
                and norm([tuple(r) for r in srows], scols, list(sdf.columns))
                == norm(orows, ocols, ocolnames)
            )
            if ok:
                print(f"{name}: OK ({len(srows)} rows)")
            else:
                fails.append(name)
                print(
                    f"{name}: FAIL rows {len(srows)}/{len(orows)} "
                    f"schema {scols == ocols} types {tmis if tmis else 'ok'}"
                )
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
    print("FAILS:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
