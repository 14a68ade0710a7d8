"""Core dense time-series transforms as DataFrame -> DataFrame functions.

Reference semantics reproduced (citations into /root/reference):

- densify          — dense grid constructor, TimeSeries.java:35-51
- fill_linear      — pandas ``interpolate(method='linear',
                     limit_direction='both')``, workload/schemes.py:50,92
- merge_overwrite  — Python ``TimeSeries.merge``: grid + overwrite-by-recency
                     + interpolate, workload/schemes.py:73-94
- merge_sum        — Java ``TimeSeries.merge``: aligned union, overlapping
                     non-null values summed, TimeSeries.java:109-138
- slice_inclusive  — ``TimeSeries.select`` pandas ``.loc[start:end]`` (both
                     ends inclusive), workload/schemes.py:96-101
- strided_subsample— Java ``resample(timestamp, sampleRate, limit)``
                     backwards-strided pick, TimeSeries.java:185-215
- rolling_mean_centered — centered rolling mean, workload/models.py:64-68
- binned_mean      — equal-width binned means (``subsample``),
                     recoverytime/models.py:33-39

All are pure column-expression pipelines (whole-stage codegen eligible); no
Python row loops. Per-series parallelism comes from ``keys`` partitioning —
at scale every window spec partitions by the series key, so no single-node
global sort is required when a key column is present.
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS = "timestamp"
VAL = "value"


class UnkeyedGlobalWindowWarning(UserWarning):
    """An unkeyed call put a global ``Window.orderBy`` (single-partition
    sort) or global densify into the plan. Safe only for bounded series —
    the reference's are ~21.6k points — never for corpus-scale input."""


def _check_unkeyed(op: str, keys: Sequence[str] | None, assume_bounded: bool) -> None:
    if not keys and not assume_bounded:
        warnings.warn(
            f"{op} called without `keys`: the time window runs as a single-"
            "partition global sort and will not scale beyond one bounded "
            "series. Pass `keys` to partition per series, or "
            "`assume_bounded=True` to assert the input is one bounded "
            "series (e.g. an already-aggregated per-interval grid).",
            UnkeyedGlobalWindowWarning,
            stacklevel=3,
        )


def _keyed_window(keys: Sequence[str] | None, order_col=None, desc: bool = False) -> Window:
    order = F.col(order_col or TS)
    if desc:
        order = order.desc()
    w = Window.orderBy(order)
    if keys:
        w = w.partitionBy(*[F.col(k) for k in keys])
    return w


def densify(
    df: DataFrame,
    step: int = 1,
    keys: Sequence[str] | None = None,
    start: int | None = None,
    end: int | None = None,
    assume_bounded: bool = False,
) -> DataFrame:
    """Expand to a dense fixed-step grid; missing points become null values.

    Mirrors the dense-grid TimeSeries constructor
    (``structures/TimeSeries.java:35-51``): the series spans
    ``[start, end]`` inclusive at ``step`` spacing, with null ``value`` for
    grid points that have no observation. With ``keys`` the grid is computed
    per series (min/max per key unless explicit bounds are given).

    Scale note: the grid is generated with ``sequence`` + ``explode`` on the
    per-key bounds row (one row per key), so grid generation is distributed
    and the join back to observations is a key+timestamp equi-join. The
    unkeyed form additionally generates the whole grid from ONE exploded
    bounds row — warned unless ``assume_bounded``.
    """
    _check_unkeyed("densify", keys, assume_bounded)
    keys = list(keys or [])
    lo = F.lit(start) if start is not None else F.min(TS)
    hi = F.lit(end) if end is not None else F.max(TS)
    if keys:
        bounds = df.groupBy(*keys).agg(lo.alias("_lo"), hi.alias("_hi"))
    else:
        bounds = df.agg(lo.alias("_lo"), hi.alias("_hi"))
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))).alias(TS),
    )
    return grid.join(df, on=keys + [TS], how="left").select(*keys, TS, VAL)


def fill_linear(
    df: DataFrame,
    keys: Sequence[str] | None = None,
    value_col: str = VAL,
    assume_bounded: bool = False,
) -> DataFrame:
    """Linear interpolation with edge extrapolation-by-nearest.

    Equivalent of pandas ``interpolate(method='linear',
    limit_direction='both')`` as used throughout the reference
    (``analytics/app/workload/schemes.py:50,92``; ``workload/models.py:67,134``):
    interior null gaps are filled linearly between the surrounding non-null
    observations; leading/trailing nulls take the nearest non-null value.

    Implemented with four window expressions (last/first non-null value and
    timestamp over unbounded-preceding / unbounded-following frames) — stays
    entirely in whole-stage codegen.
    """
    _check_unkeyed("fill_linear", keys, assume_bounded)
    v = F.col(value_col)
    w_prev = _keyed_window(keys).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = _keyed_window(keys).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    valid_ts = F.when(v.isNotNull(), F.col(TS))
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_t = F.last(valid_ts, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    next_t = F.first(valid_ts, ignorenulls=True).over(w_next)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * (F.col(TS) - prev_t) / (next_t - prev_t),
        ).otherwise(F.coalesce(prev_v, next_v))
    )
    return df.withColumn(value_col, interp)


def merge_sum(*dfs: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Java-merge: aligned union where overlapping non-null values are summed.

    ``structures/TimeSeries.java:109-138`` (``merge``) and the
    divide-and-conquer ``asyncMerge`` (``:140-158``) — used to add
    per-generator workload rates. The D&C fold is unnecessary on Spark: a
    union + hash-shuffle aggregation is already parallel, and map-side
    partial aggregation makes it one shuffle regardless of series count.
    Timestamps where every input is null stay null (Spark ``sum`` skips
    nulls and returns null for all-null groups, matching the reference).
    """
    keys = list(keys or [])
    out = dfs[0].select(*keys, TS, VAL)
    for d in dfs[1:]:
        out = out.unionByName(d.select(*keys, TS, VAL))
    return out.groupBy(*keys, TS).agg(F.sum(VAL).alias(VAL))


def merge_overwrite(*dfs: DataFrame, assume_bounded: bool = False) -> DataFrame:
    """Python-merge: dense grid + overwrite-by-recency + linear interpolation.

    ``analytics/app/workload/schemes.py:73-94``: build the dense 1 s index
    ``range(min_start, max_end + 1)``; write each series onto it in order of
    ascending ``end_time`` so later-ending series overwrite earlier ones on
    overlap; then interpolate remaining gaps linearly (both directions).

    Spark expression: tag each input with its ``end_time`` rank, take the
    value from the highest-ranked series that has an observation at each
    grid point (``max_by`` over rank), then :func:`fill_linear`.

    Inherently single-series (the reference's Python merge contract) —
    warned unless ``assume_bounded`` asserts the merged span is bounded.
    """
    _check_unkeyed("merge_overwrite", None, assume_bounded)
    tagged = None
    for i, d in enumerate(dfs):
        t = d.select(TS, VAL).withColumn("_series", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    # The merge contract is a bounded series (asserted above), so both
    # reused frames are safe to materialize: `tagged` feeds the end-rank
    # AND the overwrite agg, `obs` feeds densify's grid bounds AND its
    # join — without the cut each consumer re-derives the upstream union
    # (measured 12 parquet scans on the q40 shape; 1 after).
    tagged = tagged.localCheckpoint(eager=True)
    ends = tagged.groupBy("_series").agg(F.max(TS).alias("_end"))
    rank_w = Window.orderBy(F.col("_end").asc(), F.col("_series").asc())
    ranks = ends.withColumn("_rank", F.row_number().over(rank_w)).select("_series", "_rank")
    obs = (
        tagged.join(F.broadcast(ranks), "_series")
        .groupBy(TS)
        .agg(F.max_by(VAL, F.col("_rank")).alias(VAL))
    ).localCheckpoint(eager=True)
    return fill_linear(densify(obs, step=1, assume_bounded=True), assume_bounded=True)


def slice_inclusive(df: DataFrame, start: int, end: int, keys: Sequence[str] | None = None) -> DataFrame:
    """``TimeSeries.select(ts, start, end)`` — pandas ``.loc[start:end]``,
    BOTH ends inclusive (``analytics/app/workload/schemes.py:96-101``).
    Spark ``between`` is also inclusive, so semantics match directly; the
    predicate pushes down to the scan."""
    return df.filter(F.col(TS).between(start, end))


def strided_subsample(
    df: DataFrame,
    rate: int,
    keys: Sequence[str] | None = None,
    limit: int | None = None,
    assume_bounded: bool = False,
) -> DataFrame:
    """Keep every ``rate``-th observation walking backwards from the newest.

    Java ``resample(timestamp, sampleRate, limit)``
    (``structures/TimeSeries.java:185-215``) and the Python equivalent
    stride ``(count-1) - arange(0, count, step)`` reversed
    (``analytics/app/workload/models.py:81-83``): anchor at the latest
    observation, retain indices ``latest, latest-rate, latest-2·rate, …``,
    optionally at most ``limit`` points, output in ascending time order.
    """
    _check_unkeyed("strided_subsample", keys, assume_bounded)
    w = _keyed_window(keys, desc=True)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % rate == 0)
    )
    if limit is not None:
        out = out.filter(F.col("_rn") <= (limit - 1) * rate + 1)
    return out.drop("_rn")


def rolling_mean_centered(
    df: DataFrame,
    half_window: int,
    keys: Sequence[str] | None = None,
    value_col: str = VAL,
    out_col: str | None = None,
    assume_bounded: bool = False,
) -> DataFrame:
    """Centered rolling mean over ``2*half_window+1`` rows, min_periods=1.

    Plain-kernel equivalent of the reference's centered rolling smoothing
    (``analytics/app/workload/models.py:64-68, 134-136``). The exact
    exponential win_type kernel lives in the models layer as a pandas UDF;
    this JVM-side version is the scalable default.
    """
    _check_unkeyed("rolling_mean_centered", keys, assume_bounded)
    w = _keyed_window(keys).rowsBetween(-half_window, half_window)
    return df.withColumn(out_col or value_col, F.avg(F.col(value_col)).over(w))


def binned_mean(
    df: DataFrame,
    bin_count: int,
    keys: Sequence[str] | None = None,
    value_col: str = VAL,
    assume_bounded: bool = False,
) -> DataFrame:
    """Equal-width binned means (``subsample``,
    ``analytics/app/recoverytime/models.py:33-39``): split the ordered
    series into ``bin_count`` equal-width position bins and average each.
    Returns one row per (keys, bin) with columns ``bin`` and ``value``.
    Unkeyed input runs as a single-partition global sort and raises
    :class:`UnkeyedGlobalWindowWarning` like the other unkeyed kernels.
    """
    _check_unkeyed("binned_mean", keys, assume_bounded)
    keys = list(keys or [])
    w = _keyed_window(keys)
    counts = Window.partitionBy(*[F.col(k) for k in keys]) if keys else Window.partitionBy()
    out = (
        df.withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_n", F.count(F.lit(1)).over(counts))
        .withColumn("bin", F.floor(F.col("_rn") * bin_count / F.col("_n")).cast("int"))
        .groupBy(*keys, "bin")
        .agg(F.avg(value_col).alias(value_col))
    )
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = TS,
    by: Sequence[str] | None = None,
    value_cols: Sequence[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_asof",
    assume_bounded: bool = False,
) -> DataFrame:
    """Backward as-of join: each left row picks up the most recent right
    observation at or before its timestamp, per ``by`` group (pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics; the generalization of
    the reference's series alignment, ``workload/models.py:138-147``).

    Union-tag implementation — the scalable as-of shape: tag right rows 0
    and left rows 1, order by (time, tag) per key, carry the latest right
    ROW forward as one struct with ``last(..., ignorenulls)`` over an
    unbounded-preceding frame, keep the left rows. The struct is non-null
    for every right row even when its VALUE columns are null, so a null
    observation correctly shadows older ones (pandas ``merge_asof``
    matches the row and returns NaN — carrying values individually would
    skip past it to a stale older value, and with several value_cols
    could mix values from different right rows). ONE shuffle on the
    ``by`` key, no range cross-product, no per-row probe; ties (right at
    exactly the left timestamp) are included. ``tolerance`` (same unit as
    ``on``) nulls out matches older than ``on - tolerance``. Unkeyed
    input runs as a global sort and raises
    :class:`UnkeyedGlobalWindowWarning` like the other unkeyed kernels
    (pass ``assume_bounded=True`` to assert boundedness).

    Right value columns land as ``<col><suffix>``.
    """
    _check_unkeyed("asof_join", by, assume_bounded)
    keys = list(by or [])
    vals = list(value_cols or [c for c in right.columns if c not in keys + [on]])
    out_names = {c: f"{c}{suffix}" for c in vals}
    r = (
        right.select(*keys, F.col(on), *[F.col(c).alias(out_names[c]) for c in vals])
        .withColumn("_tag", F.lit(0))
        .withColumn("_r_ts", F.col(on).cast("long"))
    )
    l = left.withColumn("_tag", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)
    if keys:
        w = Window.partitionBy(*keys).orderBy(F.col(on), F.col("_tag"))
    else:
        w = Window.orderBy(F.col(on), F.col("_tag"))
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # one whole-row struct, non-null exactly on right rows
    row_struct = F.when(
        F.col("_tag") == 0,
        F.struct(
            F.col("_r_ts").alias("ts"),
            *[F.col(out_names[c]).alias(f"v{i}") for i, c in enumerate(vals)],
        ),
    )
    carried = merged.select(
        "*", F.last(row_struct, ignorenulls=True).over(w).alias("_c")
    ).filter(F.col("_tag") == 1)
    keep = F.col("_c").isNotNull()
    if tolerance is not None:
        keep = keep & (
            F.col("_c")["ts"] >= F.col(on).cast("long") - F.lit(int(tolerance))
        )
    return carried.select(
        *left.columns,
        *[
            F.when(keep, F.col("_c")[f"v{i}"]).alias(out_names[c])
            for i, c in enumerate(vals)
        ],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = TS,
    by: Sequence[str] | None = None,
    lower: int = 0,
    upper: int = 60,
    bucket: int | None = None,
) -> DataFrame:
    """Interval (range) join: pair each left row with every right row whose
    time lies in ``(left.on + lower, left.on + upper]``, optionally also
    matching on equi keys ``by``.

    Scale design — the bucketed range-join pattern: a naive range join has
    no equi condition, so Spark would plan a broadcast-nested-loop /
    cartesian product. Instead both sides are bucketed by
    ``floor(time / bucket)`` (bucket defaults to the window span) and the
    left side probes its own bucket plus the neighbors its window can
    reach, turning the plan into a plain shuffled equi-join on
    ``(by..., bucket)`` with the exact range predicate applied after the
    match. Replication factor is ceil(span/bucket)+1 ≈ 2 — constant, not
    O(rows). Time is compared at full input resolution (``on`` cast to
    long), so no precision is lost.

    Output: all left columns plus every right column renamed with an
    ``_r`` suffix (collision-proof regardless of shared names).
    """
    keys = list(by or [])
    span = upper - lower
    if span <= 0:
        raise ValueError("upper must exceed lower")
    bucket = int(bucket or span)
    l_t = F.col(on).cast("long")
    r = right.select(*[F.col(c).alias(f"{c}_r") for c in right.columns])
    r_t = F.col(f"{on}_r").cast("long")
    r_b = r.withColumn("_bkt", F.floor(r_t / F.lit(bucket)))
    n_probe = (span + bucket - 1) // bucket + 1
    l_b = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor((l_t + F.lit(lower)) / F.lit(bucket)),
                F.floor((l_t + F.lit(lower)) / F.lit(bucket)) + F.lit(n_probe - 1),
            )
        ),
    )
    cond = [l_b["_bkt"] == r_b["_bkt"]] + [l_b[k] == r_b[f"{k}_r"] for k in keys]
    joined = l_b.join(r_b, cond, "inner").filter(
        (r_t > l_t + F.lit(lower)) & (r_t <= l_t + F.lit(upper))
    )
    return joined.drop("_bkt")


def savgol_smooth(
    df: DataFrame,
    window: int = 51,
    polyorder: int = 3,
    keys: Sequence[str] | None = None,
    value_col: str = VAL,
    order_col: str = TS,
    tiebreak_cols: Sequence[str] = (),
    out_col: str = "smoothed",
    assume_bounded: bool = False,
    short_series: str = "python",
) -> DataFrame:
    """W5 Savitzky-Golay smoothing per series, ALL-JVM (the reference's
    scipy savgol with mode='interp' edges, ``workload/models.py:55-62``).

    The filter is LINEAR in the input, so it decomposes into literal
    coefficient blocks extracted once at plan-build time by pushing unit
    vectors through :func:`phoebe_spark.functions.numeric.savgol_filter`:
    interior rows are a ``window``-tap centered dot product
    (``collect_list`` over a ±half row frame, ``zip_with`` + ``aggregate``
    against the literal tap vector) and the half-window head/tail 'interp'
    edges are literal (half x window) matrices applied to each series'
    first/last ``window`` values (per-series scalars, broadcast-joined
    back). No Python anywhere in the plan, so work distributes WITHIN a
    series — a 10^9-row series is just more window partitions, never one
    executor's pandas frame.

    Series SHORTER than ``window`` need the reduced-window fallback the
    Python kernel applies: with ``short_series='python'`` (default) those
    series — bounded at < ``window`` rows each by definition — route
    through a grouped Arrow fallback running
    :func:`phoebe_spark.functions.numeric.savgol_filter`, and long
    series stay on the JVM path. ``short_series='null'`` keeps the plan
    100% Python-free for callers whose domain guarantees long series
    (the oracle-checked q35 path); their sub-window series emit NULL
    smoothed values.
    """
    import numpy as np

    from phoebe_spark.functions.numeric import savgol_filter

    _check_unkeyed("savgol_smooth", keys, assume_bounded)
    keys = list(keys or [])
    half = window // 2
    m = max(4 * window, 2 * window + 8)
    L = np.array([savgol_filter(np.eye(m)[j], window, polyorder) for j in range(m)]).T
    center = L[m // 2, m // 2 - half : m // 2 + half + 1]
    head, tail = L[:half, :window], L[-half:, -window:]
    # one-parse literal blocks (round-11 optimization): the per-element
    # F.lit form cost ~2.5 s of py4j round-trips per construction for the
    # 51 + 2*(25x51) coefficients; bit-identical values (see
    # numeric.lit_double_array)
    from phoebe_spark.functions.numeric import lit_double_array, lit_double_matrix

    CC = lit_double_array(center)
    HH = lit_double_matrix(head)
    TT = lit_double_matrix(tail)

    def _dotl(coeffs, vals):
        return F.aggregate(
            F.zip_with(coeffs, vals, lambda c, x: c * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    order = [F.col(order_col), *[F.col(c) for c in tiebreak_cols]]
    if keys:
        w_ord = Window.partitionBy(*keys).orderBy(*order)
        w_all = Window.partitionBy(*keys).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    else:
        w_ord = Window.orderBy(*order)
        w_all = Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    v = F.col(value_col).cast("double")
    base = df.withColumn("_rn", F.row_number().over(w_ord)).withColumn(
        "_cnt", F.count(F.lit(1)).over(w_all)
    )

    def _ordered_vals(pos):
        return F.transform(
            F.array_sort(F.collect_list(F.struct(pos.alias("p"), v.alias("v")))),
            lambda s: s["v"],
        )

    grp = keys if keys else [F.lit(1).alias("_g")]
    join_keys = keys if keys else ["_g"]
    firstw = (
        base.filter(F.col("_rn") <= window)
        .groupBy(*grp)
        .agg(_ordered_vals(F.col("_rn")).alias("_first_w"))
    )
    lastw = (
        base.filter(F.col("_rn") > F.col("_cnt") - window)
        .groupBy(*grp)
        .agg(_ordered_vals(F.col("_rn")).alias("_last_w"))
    )
    if not keys:
        base = base.withColumn("_g", F.lit(1))
    wnd = F.collect_list(v).over(w_ord.rowsBetween(-half, half))
    if short_series == "python":
        shorts = base.filter(F.col("_cnt") < window)
        base = base.filter(F.col("_cnt") >= window)
    # null-safe key join: groupBy keeps a NULL-key series but a plain
    # equi-join would silently drop all its rows — join on <=> instead
    def _nsjoin(l_df, r_df):
        r_df = r_df.select(
            *[F.col(k).alias(f"_rk_{k}") for k in join_keys],
            *[c for c in r_df.columns if c not in join_keys],
        )
        cond = None
        for k in join_keys:
            c = F.col(k).eqNullSafe(F.col(f"_rk_{k}"))
            cond = c if cond is None else cond & c
        return l_df.join(F.broadcast(r_df), cond).drop(
            *[f"_rk_{k}" for k in join_keys]
        )

    out = (
        _nsjoin(_nsjoin(base, firstw), lastw)
        .withColumn(
            out_col,
            F.when(F.col("_rn") <= half, _dotl(F.element_at(HH, F.col("_rn")), F.col("_first_w")))
            .when(
                F.col("_rn") >= F.col("_cnt") - (half - 1),
                _dotl(
                    F.element_at(TT, (F.col("_rn") - (F.col("_cnt") - half)).cast("int")),
                    F.col("_last_w"),
                ),
            )
            .otherwise(_dotl(CC, wnd)),
        )
    )
    result = out.drop("_rn", "_cnt", "_first_w", "_last_w", "_g")
    if short_series != "python":
        return result
    # Arrow fallback for sub-window series: each group is < window rows
    # by construction, so the pandas work per task is bounded by the
    # filter width, not the data — the one place the reduced-window
    # kernel is genuinely needed.
    from pyspark.sql.types import DoubleType, StructField, StructType

    from phoebe_spark.functions.numeric import savgol_filter as _sg

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(out_col, DoubleType())]
    )
    sort_cols = [order_col, *tiebreak_cols]
    in_cols = [f.name for f in df.schema.fields]

    def _short(pdf):
        pdf = pdf.sort_values(sort_cols)
        sm = _sg(pdf[value_col].astype(float).to_numpy(), window, polyorder)
        res = pdf[in_cols].copy()
        res[out_col] = sm
        return res

    grp_cols = keys if keys else ["_g"]
    if not keys:
        shorts = shorts.withColumn("_g", F.lit(1))
    short_out = shorts.groupBy(*grp_cols).applyInPandas(_short, out_schema).select(
        *result.columns
    )
    return result.unionByName(short_out)
