"""ORC columnar source/sink.

Second columnar interchange format beside parquet (both are Spark
built-ins — no extra jars). ORC brings its own stripe-level min/max/
bloom indexes, so predicate pushdown prunes at stripe granularity the
same way parquet prunes row groups; ``spark.sql.orc.filterPushdown``
defaults on. Pipelines that exchange data with Hive/Trino warehouses
commonly standardize on ORC, so the engine speaks it natively rather
than forcing a parquet conversion hop.

Scale notes: ORC files split on stripe boundaries (default 64 MB), so a
100 TB table reads with full parallelism; column projection reads only
the selected streams; the vectorized ORC reader keeps decoding inside
the JVM columnar batch path (``spark.sql.orc.enableVectorizedReader``,
default on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as ORC part-files under ``path`` (zlib by default;
    Spark's ORC writer records per-stripe min/max statistics that the
    read path's pushdown uses)."""
    df.write.mode(mode).orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read ORC. Schema is taken from the ORC footer when not supplied
    (no inference scan needed — ORC is self-describing, unlike JSONL);
    pass one to pin the contract against upstream type drift."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
