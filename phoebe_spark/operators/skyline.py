"""Distributed 2D skyline (Pareto frontier) — preference queries.

The skyline of a point set is every point not DOMINATED by another
(b dominates a when b is >= a in both dimensions and > in at least one).
It is the multi-objective selection primitive data curation keeps
reinventing: "the users who are both most active and highest-spend",
"the documents that maximize quality without sacrificing length", "the
configs on the latency/throughput frontier" (the reference's profiling
loop walks exactly that scaleOut-vs-throughput frontier when it picks
candidate parallelisms — dos-group/phoebe
analytics/app/latency/preprocessing.py:21-38 filters profile rows to the
usable frontier before model fitting).

Naive SQL is a quadratic NOT EXISTS self-join — O(n²) comparisons that
no engine can push down. The distributed plan here is the classic
two-phase skyline (Borzsony/Kossmann/Stocker ICDE'01 "The Skyline
Operator" adapted to partitions):

1. **Local prune** — hash rows into buckets and drop every point that a
   same-bucket point dominates. A locally dominated point cannot be in
   the global skyline (its dominator survives or is itself dominated
   transitively — dominance is transitive and irreflexive on distinct
   points). One shuffle, output shrinks to O(buckets x |skyline-ish|):
   for even mildly correlated data the survivor set is tiny.
2. **Global pass** — the same dominance test over the survivors. The
   frame is small by then, so the single-partition sorted window is
   cheap and exact.

The dominance test itself is all-JVM and sort-based, not pairwise: order
by ``x``; with a value-range window, ``max(y) over (range 1 following ..
unbounded)`` is the best ``y`` among points with STRICTLY larger ``x``
(dominates when >= y), and ``max(y) over (partition by x)`` catches
equal-``x`` dominators (dominates when > y). O(n log n) per bucket, zero
self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_N_BUCKETS_DEFAULT = 64


def _prune_dominated(df: DataFrame, x: str, y: str, bucket: str | None) -> DataFrame:
    """Drop rows dominated within their bucket (whole frame if None).

    ``x`` must be numeric (the strict-greater test uses a value-range
    window frame). Maximizing both dimensions; callers negate columns to
    minimize.
    """
    w_gx = (
        (Window.partitionBy(bucket) if bucket else Window.partitionBy())
        .orderBy(F.col(x))
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_eqx = Window.partitionBy(*([bucket] if bucket else []), x)
    max_y_gx = F.max(y).over(w_gx)
    max_y_eqx = F.max(y).over(w_eqx)
    dominated = (max_y_gx >= F.col(y)) | (max_y_eqx > F.col(y))
    return df.withColumn("_dom", F.coalesce(dominated, F.lit(False))).filter(
        ~F.col("_dom")
    ).drop("_dom")


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    n_buckets: int = _N_BUCKETS_DEFAULT,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Exact 2D skyline maximizing ``x`` and ``y`` (both numeric;
    ``x`` integer-valued for the strict range frame).

    Deterministic bucketing (hash of the id columns, no RNG) keeps the
    local prune retry-stable. Duplicate (x, y) points all survive (none
    strictly dominates its twin), matching the NOT EXISTS semantics.
    """
    keys = id_cols or df.columns
    bucketed = df.withColumn(
        "_b", F.pmod(F.xxhash64(*[F.col(c) for c in keys], F.lit("skyline")), F.lit(n_buckets))
    )
    local = _prune_dominated(bucketed, x, y, "_b").drop("_b")
    return _prune_dominated(local, x, y, None)
