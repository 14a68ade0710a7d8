"""Hive-style partitioned table layout (write + pruned read).

The 100 TB table story: a fact table written as
``path/col=value/part-*.parquet`` lets every query that filters on the
partition column skip whole directories at PLANNING time — the scan's
``PartitionFilters`` prune before a single byte is read, unlike row-group
predicate pushdown which still opens every file's footer. The reference
persists its per-experiment profile rows into per-experiment tables for
the same reason (dos-group/phoebe
``analytics/app/common/db.py:21-38`` — one SQLite table per experiment id
is the single-node analogue of a partition directory per key).

Contract pinned here:

* partition columns must be LOW cardinality (a date, a type, a source —
  never a user id): each distinct value is a directory, and a
  high-cardinality partition key degenerates into millions of tiny files
  (the "small files problem").
* writes repartition by the partition columns first so each task writes
  at most one file per partition instead of ``tasks × partitions``
  fragments (``maxRecordsPerFile`` can re-split genuinely hot
  partitions).
* reads go through the normal parquet reader; Spark discovers the
  partition columns from the directory names and restores their type
  from the supplied schema hint or inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as a Hive-partitioned parquet table.

    Repartitions on the partition columns first — without it, every one
    of the N input tasks opens a writer for every partition value it
    sees (N×P small files); with it, rows for one partition value
    co-locate and each directory gets a handful of well-sized files.
    ``max_records_per_file`` re-splits hot partitions so a skewed value
    (one event_type carrying half the fact table) still parallelizes on
    read.
    """
    w = df.repartition(*partition_cols).write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a Hive-partitioned parquet table.

    Filters on the partition columns become ``PartitionFilters`` in the
    scan node (directory-level pruning, visible in
    ``.explain("formatted")``); filters on data columns still push down
    to parquet row groups as usual.
    """
    return spark.read.parquet(path)
