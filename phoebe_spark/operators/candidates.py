"""Scale-out candidate grid + ResponseFinalizer (SURVEY W9/J4/F5).

Reference semantics (/root/reference):
- candidate grid: replicate request across ``range(min_scale_out,
  max_scale_out+1)`` — ``analytics/app/latency/models.py:141-146``
- validity: ``value < restriction AND scale_out ∈ previously_valid`` —
  ``analytics/app/common/schemes.py:47-48``
- best: first valid ordered by scale_out ascending, at most one ``is_best``
  — ``analytics/app/common/schemes.py:57-68``
- Java tolerance rule: among valid candidates prefer a smaller scale-out
  whose value is within 5% relative tolerance of the minimum —
  ``clients/analytics/responses/LatencyResponse.java:40-59``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def candidate_grid(spark: SparkSession, min_scale_out: int, max_scale_out: int) -> DataFrame:
    """Dense scale-out candidate grid (J4). ``spark.range`` is already a
    distributed source; crossJoin against a request row replicates it."""
    return spark.range(min_scale_out, max_scale_out + 1).select(
        F.col("id").cast("int").alias("scale_out")
    )


def finalize_response(
    df: DataFrame,
    restriction: float,
    previously_valid: Sequence[int] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """ResponseFinalizer: mark validity and the single best candidate
    (first valid by ascending scale_out). Pure column expressions + one
    window; the candidate set is tiny (≤23 rows) so this is driver-cheap,
    but the expression form also works inside a larger pipeline."""
    valid = F.col(value_col) < F.lit(float(restriction))
    if previously_valid is not None:
        valid = valid & F.col("scale_out").isin(*[int(s) for s in previously_valid])
    out = df.withColumn("is_valid", valid)
    w = Window.orderBy(F.col("scale_out").asc())
    first_valid = F.min(F.when(F.col("is_valid"), F.col("scale_out"))).over(
        w.rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return out.withColumn("is_best", F.col("is_valid") & (F.col("scale_out") == first_valid))


def best_with_tolerance(df: DataFrame, tolerance: float = 0.05, value_col: str = "value") -> DataFrame:
    """Java best-scale-out rule: take the minimum-value valid candidate,
    then prefer the smallest scale-out whose value is within ``tolerance``
    relative error of that minimum (``LatencyResponse.java:40-59``)."""
    valid = df.filter(F.col("is_valid"))
    w_all = Window.rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    with_min = valid.withColumn("_minv", F.min(value_col).over(Window.orderBy(F.lit(1)).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    near = with_min.filter(
        F.abs((F.col(value_col) - F.col("_minv")) / F.col("_minv")) <= tolerance
    )
    return near.orderBy(F.col("scale_out").asc()).limit(1).drop("_minv")
