"""Skew mitigation utilities for hot-key aggregations and joins.

At 100 TB a handful of hot keys (a viral campaign id, an empty-string
document, a default user id) can stall a stage on one straggler task. Two
standard remedies, packaged as composable DataFrame transforms:

- salted_aggregate: two-phase aggregation — pre-aggregate on
  (key, salt) to spread a hot key over N reducers, then combine partials.
  Works for any algebraic aggregate (sum/count/min/max and avg via
  sum+count).
- salted_broadcast_join: replicate the small side N ways so a skewed big
  side joins against salt-matched copies — equivalent results, N-way
  parallelism on the hot key.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins
automatically; these helpers cover aggregations and broadcast patterns AQE
does not rebalance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) combine. Identical results to a direct groupBy; the first
    shuffle spreads each key over ``salt_buckets`` reducers."""
    keys = list(keys)
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    partial_aggs = [F.sum(c).alias(f"_s_{c}") for c in sum_cols]
    if count:
        partial_aggs.append(F.count(F.lit(1)).alias("_s_cnt"))
    partials = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols]
    if count:
        final_aggs.append(F.sum("_s_cnt").alias("count"))
    return partials.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key join: salt the big side randomly into ``salt_buckets``,
    replicate the small side across every salt value, join on
    (key, salt). Result rows identical to the unsalted join; the hot key's
    rows land on ``salt_buckets`` tasks instead of one."""
    big_salted = big.withColumn("_salt", F.pmod(F.xxhash64(F.rand(seed=42)), F.lit(salt_buckets)).cast("int"))
    salts = small.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
    small_rep = small.crossJoin(F.broadcast(salts))
    return big_salted.join(F.broadcast(small_rep), on=[on, "_salt"], how=how).drop("_salt")
