"""Data-layout operators: Morton (Z-order) interleaving for multi-dimension
scan locality.

At 100 TB the dominant cost of a selective scan is how many parquet
row-groups survive min/max pruning. Sorting on one column gives perfect
pruning on that column and none on any other; interleaving the bits of two
(quantized) columns gives a single sort key whose contiguous ranges stay
narrow in BOTH dimensions — the same trick behind Delta/Iceberg ``ZORDER
BY`` (public: Morton 1966; Databricks/Iceberg docs describe the layout, the
implementation here is independent).

The interleave is emitted as a *literal* integer expression (div/mod bit
extraction, no engine-specific shift operators), so the identical formula
runs as Spark whole-stage codegen and as the DuckDB oracle — the same
literal-expression pattern as the Savitzky-Golay coefficient oracle.

Reference scope note: dos-group/phoebe has no layout optimizer; this module
is part of the engine-extension surface (SURVEY §2.11) a training-data
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton_expr(x: str, y: str, bits: int, div: str) -> str:
    """Literal bit-interleave of two already-quantized non-negative ints.

    ``div`` is the integer-division operator spelling (Spark SQL: ``div``;
    DuckDB: ``//``). Output has ``2*bits`` significant bits: x occupies the
    even bit positions, y the odd ones.
    """
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def quantize_expr(c: str, cmin: str, cmax: str, buckets: int, div: str) -> str:
    """Equal-width quantization of ``c`` into ``[0, buckets)`` given min/max
    expressions — ``(c - min) * buckets // (max - min + 1)`` in exact
    integer math (inputs are integer keys), identical in both engines."""
    return f"((({c}) - ({cmin})) * {buckets} {div} (({cmax}) - ({cmin}) + 1))"


def zorder_layout(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` re-laid-out for two-dimension scan locality: rows are
    range-partitioned AND sorted within partitions by the Morton code of
    the quantized ``(x, y)`` pair, so a subsequent parquet write produces
    row-groups whose min/max stats are narrow in both columns.

    Scale notes: one tiny min/max aggregate (broadcast back as scalars — no
    second scan of the fact side per Catalyst's reuse of the cross-joined
    1-row frame), then ``repartitionByRange`` (range-exchange with a sampled
    boundary pass) + ``sortWithinPartitions``. The z-value itself is pure
    codegen arithmetic. No data-dependent driver logic: boundaries come
    from Spark's range sampler, bit math is literal.
    """
    mm = df.agg(
        F.min(x).alias("__xmin"),
        F.max(x).alias("__xmax"),
        F.min(y).alias("__ymin"),
        F.max(y).alias("__ymax"),
    )
    q = 1 << bits
    xq = quantize_expr(x, "__xmin", "__xmax", q, "div")
    yq = quantize_expr(y, "__ymin", "__ymax", q, "div")
    z = morton_expr(xq, yq, bits, "div")
    with_z = (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__z", F.expr(z).cast("long"))
        .drop("__xmin", "__xmax", "__ymin", "__ymax")
    )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return with_z.repartitionByRange(n, "__z").sortWithinPartitions("__z")


def global_rank_by_value(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    descending: bool = True,
    out_col: str = "r",
) -> DataFrame:
    """EXACT global row_number over (value_col [desc], tie_col asc) WITHOUT
    a single-reducer global window — the scale trap of
    ``row_number().over(Window.orderBy(...))``, which moves every row into
    one partition.

    Two-phase value-bucketed rank (the q224/q228 family trick applied to a
    continuous sort key): per-VALUE counts (domain-bounded — token counts,
    prices, sizes) roll up map-side; their cumulative offsets are a window
    over the tiny distinct-value frame only; each row's rank is its
    value's offset plus a row_number over the value PARTITION (distributed
    — the window key is the value itself, so no partition ever holds more
    than one value's rows). Bit-identical to the naive global window, so
    oracles stay unchanged.
    """
    from pyspark.sql import Window

    v = F.col(value_col)
    vals = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__n"))
    order = v.desc() if descending else v.asc()
    offs = vals.select(
        value_col,
        (
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy(order).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
        ).cast("long").alias("__off"),
    )
    within = F.row_number().over(
        Window.partitionBy(value_col).orderBy(F.col(tie_col).asc())
    )
    return (
        df.join(F.broadcast(offs), value_col)
        .withColumn(out_col, (F.col("__off") + within).cast("long"))
        .drop("__off")
    )
