"""Oracle-checked query registry.

Every operator from SURVEY.md §2 that is implemented so far is exposed here
twice: as a Spark DataFrame pipeline (``QUERIES[name](spark, sf_dir)``) and
as ANSI SQL for the DuckDB oracle (``ORACLE[name]``). Column names/types and
rounding are aligned pair-wise so the driver's order-insensitive value-hash
matches.

Float-determinism policy:
- Large money sums (pricing/revenue) go through DECIMAL(18,4) so partial-
  aggregation order cannot change the result; the decimal sum is rounded to
  scale 2 before the cast to DOUBLE so the cast is exact in both engines.
- Small aggregates (time-series means, cosines, slopes) stay DOUBLE and are
  rounded to 6 decimals — accumulated reordering error is orders of
  magnitude below the rounding step at these magnitudes.
- Timestamps are compared as epoch-seconds BIGINT: Spark ``cast(ts AS
  long)`` floors, so the oracle uses ``CAST(floor(epoch(ts)) AS BIGINT)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from phoebe_spark.operators import dedup, graph, sampling, similarity, text
from phoebe_spark.sources.testdata import load_table
from phoebe_spark.timeseries import aggregates as ts_agg
from phoebe_spark.timeseries import anomaly as ts_anom
from phoebe_spark.timeseries import core as ts_core

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Epoch-seconds helpers, aligned between engines. `events.ts` is canonical
# epoch-nanos BIGINT, produced by sources.testdata.load_table regardless of
# the parquet's physical timestamp type (NANOS-as-long or MICROS NTZ);
# DuckDB sees a timestamp. Integer division to seconds is exact in both (a
# double `epoch()` would lose sub-second precision at 2^53).
EPOCH_SQL = "(epoch_ns({c}) // 1000000000)"


def _epoch(c: str = "ts"):
    return F.expr(f"{c} div 1000000000")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Canonicalizing loader: events.ts always comes back as epoch-nanos
    # BIGINT whatever the parquet's physical timestamp type is.
    return load_table(spark, sf_dir, name)


def _dec(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,4)")


def _dsum2(col) -> F.Column:
    """Order-independent money sum: decimal sum, rounded to scale 2, cast to
    DOUBLE (exact — see module docstring)."""
    return F.round(F.sum(col), 2).cast("double")


# Size-aware broadcast bound. nation/region and tiny aggregates are hinted
# unconditionally (bounded cardinality at any scale factor); customer /
# supplier / orders-derived frames GROW with scale factor, so an
# unconditional F.broadcast() there overrides AQE's size threshold and
# becomes an executor-OOM risk at the 100x grading scale. `_dim` hints only
# when Catalyst's plan-time estimate is under the bound, else returns the
# frame unchanged and lets AQE pick the join strategy at runtime (it still
# broadcasts at bench scale, so plans are unchanged there).
_BROADCAST_BOUND_BYTES = 256 * 1024 * 1024


def _dim(df: DataFrame) -> DataFrame:
    """Hint broadcast only if the plan-time size estimate is under the bound.

    Uses Catalyst's ``optimizedPlan().stats().sizeInBytes`` — a plan-time
    statistic (no job is triggered). Above the bound the frame is returned
    un-hinted so AQE's runtime statistics decide; below it the explicit hint
    keeps the small-dim plans stable and test-assertable.
    """
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return df
    return F.broadcast(df) if size <= _BROADCAST_BOUND_BYTES else df


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
