"""Newline-delimited JSON (JSONL) source/sink.

JSONL is the interchange format most LLM-data pipelines actually ship
(one JSON object per line, splittable, appendable). Spark's native
``json`` format IS newline-delimited by default — the module's job is to
pin the contract: writes are partitioned plain ``.json`` part-files;
reads take an EXPLICIT schema (never inference, which costs an extra full
scan and can silently widen types between runs).

Scale notes: JSONL part-files split on line boundaries, so a 100 TB
corpus reads with full parallelism; an explicit schema keeps the reader a
single pass with column pruning pushed into the parser
(``JacksonParser`` only materializes requested fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as partitioned JSONL under ``path``."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read JSONL with an explicit schema (no inference pass). Malformed
    lines surface as nulls in PERMISSIVE mode — callers that need strict
    ingestion can count them via an added ``_corrupt_record`` column."""
    return spark.read.schema(schema).json(path)
