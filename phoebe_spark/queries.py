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


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.2-2.6 on the TPC-H-ish tables)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
           round(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(round(sum(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (A1-A3 aggregates + F2 filter).

    Scale notes: single scan, filter pushed to parquet, map-side partial
    aggregation on a 4-group key — shuffle is O(groups), not O(rows).
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum2(_dec("l_quantity")).alias("sum_qty"),
            _dsum2(_dec("l_extendedprice")).alias("sum_base_price"),
            _dsum2(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))).alias("sum_disc_price"),
            F.round(_dsum2(_dec("l_quantity")) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(_dsum2(_dec("l_discount")) / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: equality filter + column projection; both push to the scan."""
    o = _t(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "q03_membership_filter",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q03_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: membership (IN) filter — pushed to parquet as an In filter."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@query(
    "q04_region_acctbal",
    oracle="""
    SELECT r.r_name, count(*) AS num_customers,
           round(CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) / count(*), 6) AS avg_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q04_region_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension join chain with broadcast: nation/region are tiny dims —
    broadcast both so the customer scan never shuffles on data."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            F.round(_dsum2(_dec("c_acctbal")) / F.count(F.lit(1)), 6).alias("avg_acctbal"),
        )
    )


@query(
    "q05_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
)
def q05_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join (lineitem ⋈ orders) + broadcast dims + aggregation.

    Scale notes: the only real shuffle is lineitem⋈orders on orderkey (both
    sides co-partitioned by the join key after shuffle; with bucketed tables
    this becomes shuffle-free). customer/nation broadcast. The orders-status
    filter is applied before the join, shrinking the build side.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_dim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(_dsum2(rev).alias("revenue"))
    )


@query(
    "q06_candidate_grid",
    oracle="""
    SELECT CAST(t.s AS INT) AS scale_out, d.o_orderstatus
    FROM generate_series(2, 24) t(s)
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) d
    """,
)
def q06_candidate_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 grid-replication join: replicate rows across the scale-out range
    (``latency/models.py:141-146``). spark.range is a distributed source."""
    grid = spark.range(2, 25).select(F.col("id").cast("int").alias("scale_out"))
    d = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return grid.crossJoin(d)


@query(
    "q07_union_distinct",
    oracle="""
    SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
    """,
)
def q07_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 vertical concat + U3 distinct."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_nationkey")
    return a.unionByName(b).distinct()


@query(
    "q12_threshold_pick",
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN count(CASE WHEN o_totalprice > 150000 THEN 1 END) > 0
                THEN min(CASE WHEN o_totalprice > 150000 THEN o_totalprice END)
                ELSE max(o_totalprice) END AS picked_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q12_threshold_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 first-match threshold search with argmax fallback
    (``baselines/models.py:40-51``): smallest value exceeding the
    threshold, else the overall max."""
    o = _t(spark, sf_dir, "orders")
    over = F.when(F.col("o_totalprice") > 150000, F.col("o_totalprice"))
    return o.groupBy("o_orderpriority").agg(
        F.when(F.count(over) > 0, F.min(over)).otherwise(F.max("o_totalprice")).alias("picked_price")
    )


# ---------------------------------------------------------------------------
# Time-series kernel on the events table (SURVEY §2.4-2.5)
# ---------------------------------------------------------------------------


@query(
    "q14_ts_minutely_sum",
    oracle=f"""
    SELECT event_type, CAST(floor({EPOCH_SQL.format(c='ts')} / 60) AS BIGINT) AS minute,
           round(sum(value), 6) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q14_ts_minutely_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 cross-series sum (PromQL ``sum(metric)`` per timestamp bucket,
    ``ClientsManager.java:341-364``): one shuffle on (key, minute)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("minute", F.floor(_epoch() / 60).cast("long"))
        .groupBy("event_type", "minute")
        .agg(F.round(F.sum("value"), 6).alias("sum_value"))
    )


@query(
    "q15_ts_trailing_avg",
    oracle=f"""
    WITH m AS (SELECT max({EPOCH_SQL.format(c='ts')}) AS mx FROM events)
    SELECT event_type, round(avg(value), 6) AS avg_value, count(*) AS n_obs
    FROM events, m
    WHERE {EPOCH_SQL.format(c='ts')} BETWEEN m.mx - 604800 AND m.mx
    GROUP BY event_type
    """,
)
def q15_ts_trailing_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 trailing window + W2 inclusive slice + A6 mean
    (``Graph.java:82-87``): average over the trailing 7 days, inclusive on
    both ends like ``.loc[start:end]``."""
    e = _t(spark, sf_dir, "events").withColumn("es", _epoch())
    mx = e.agg(F.max("es").alias("mx"))
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("es").between(F.col("mx") - 604800, F.col("mx")))
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"), F.count(F.lit(1)).alias("n_obs"))
    )


@query(
    "q16_ts_summary",
    oracle=f"""
    SELECT event_type,
           round(avg(value), 6) AS avg_value,
           min(value) AS min_value, max(value) AS max_value,
           round(sum(value), 6) AS sum_value,
           count(*) AS count_obs, count(value) AS count_non_null,
           min({EPOCH_SQL.format(c='ts')}) AS start_time,
           max({EPOCH_SQL.format(c='ts')}) AS end_time,
           max_by(value, ts) AS last_value, min_by(value, ts) AS first_value
    FROM events GROUP BY event_type
    """,
)
def q16_ts_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3 null-skipping aggregates + A8 first/last by time
    (``TimeSeries.java:256-316``), via :func:`ts_agg.ts_summary`."""
    e = _t(spark, sf_dir, "events")
    # first/last must be ordered by the raw (microsecond) timestamp, but
    # reported bounds use epoch seconds — pass raw ts for ordering.
    base = e.select("event_type", F.col("ts").alias("_raw"), _epoch().alias("timestamp"), "value")
    s = ts_agg.ts_summary(base.withColumn("timestamp", F.col("timestamp")), keys=["event_type"])
    # recompute last/first against the raw timestamp for exact ordering
    raw = base.groupBy("event_type").agg(
        F.max_by("value", F.col("_raw")).alias("last_value"),
        F.min_by("value", F.col("_raw")).alias("first_value"),
    )
    return (
        s.drop("last_value", "first_value")
        .join(raw, "event_type")
        .select(
            "event_type",
            F.round("avg_value", 6).alias("avg_value"),
            "min_value",
            "max_value",
            F.round("sum_value", 6).alias("sum_value"),
            "count_obs",
            "count_non_null",
            "start_time",
            "end_time",
            "last_value",
            "first_value",
        )
    )


@query(
    "q17_ts_slope",
    oracle=f"""
    WITH x AS (
      SELECT event_type, CAST({EPOCH_SQL.format(c='ts')} - 1704067200 AS DOUBLE) AS xs, value
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           round(covar_pop(xs, value) / var_pop(xs) * 86400, 6) + 0.0 AS slope_per_day,
           round(avg(value) - covar_pop(xs, value) / var_pop(xs) * avg(xs), 6) + 0.0 AS intercept
    FROM x GROUP BY event_type
    """,
)
def q17_ts_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 OLS trend per series (``common/routes.py:27-47``,
    ``ClientsManager.java:329-339``): closed-form slope/intercept as
    aggregates; x centered to keep the moments well-conditioned."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", (_epoch() - F.lit(1704067200)).alias("timestamp"), "value"
    )
    s = ts_agg.slope_intercept(e, keys=["event_type"])
    return s.select(
        "event_type",
        (F.round(F.col("slope") * 86400, 6) + F.lit(0.0)).alias("slope_per_day"),
        (F.round("intercept", 6) + F.lit(0.0)).alias("intercept"),
    )


@query(
    "q18_ts_strided",
    oracle="""
    WITH r AS (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
      FROM events
    )
    SELECT event_id, event_type FROM r WHERE (rn - 1) % 50 = 0
    """,
)
def q18_ts_strided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 strided subsample anchored at the newest observation
    (``TimeSeries.java:185-215``), via :func:`ts_core.strided_subsample`."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", F.col("ts").alias("timestamp"))
    out = ts_core.strided_subsample(e.withColumn("value", F.lit(None).cast("double")), rate=50, keys=["event_type"])
    return out.select("event_id", "event_type")


@query(
    "q19_ts_rolling",
    oracle="""
    SELECT event_id, event_type,
           round(avg(value) OVER (PARTITION BY event_type ORDER BY ts
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS rolling_avg
    FROM events
    """,
)
def q19_ts_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 centered rolling mean, min_periods=1
    (``workload/models.py:64-68``), via :func:`ts_core.rolling_mean_centered`."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("ts").alias("timestamp"), "value"
    )
    out = ts_core.rolling_mean_centered(e, half_window=2, keys=["event_type"], out_col="rolling_avg")
    return out.select("event_id", "event_type", F.round("rolling_avg", 6).alias("rolling_avg"))


@query(
    "q20_ts_interpolate",
    oracle=f"""
    WITH h AS (
      SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 3600) AS BIGINT) AS hr, sum(value) AS v
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    grid AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM h), (SELECT max(hr) FROM h))) AS timestamp
    ),
    j AS (SELECT g.timestamp, h.v AS value FROM grid g LEFT JOIN h ON h.hr = g.timestamp),
    w AS (
      SELECT timestamp, value,
        last_value(value IGNORE NULLS) OVER (ORDER BY timestamp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN value IS NOT NULL THEN timestamp END IGNORE NULLS) OVER (ORDER BY timestamp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(value IGNORE NULLS) OVER (ORDER BY timestamp ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN value IS NOT NULL THEN timestamp END IGNORE NULLS) OVER (ORDER BY timestamp ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j
    )
    SELECT timestamp,
           round(CASE WHEN value IS NOT NULL THEN value
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                        THEN pv + (nv - pv) * (timestamp - pt) / (nt - pt)
                      ELSE coalesce(pv, nv) END, 6) AS value
    FROM w
    """,
)
def q20_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify + W4 linear interpolation (the reference's
    ``interpolate(method='linear', limit_direction='both')``,
    ``workload/schemes.py:50,92``): hourly click volume on a dense hour
    grid with gaps filled linearly."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.filter(F.col("event_type") == "click")
        .withColumn("timestamp", F.floor(_epoch() / 3600).cast("long"))
        .groupBy("timestamp")
        .agg(F.sum("value").alias("value"))
    )
    dense = ts_core.densify(hourly, step=1, assume_bounded=True)
    filled = ts_core.fill_linear(dense, assume_bounded=True)
    return filled.select("timestamp", F.round("value", 6).alias("value"))


@query(
    "q21_regression_metrics",
    oracle="""
    WITH p AS (
      SELECT event_type, value,
             lag(value) OVER (PARTITION BY event_type ORDER BY ts) AS pred
      FROM events
    ),
    f AS (SELECT * FROM p WHERE pred IS NOT NULL AND value > 1)
    SELECT event_type,
           round(avg(abs(value - pred)), 6) AS mae,
           round(quantile_cont(abs(value - pred), 0.5), 6) AS median_ae,
           round(avg(abs((value - pred) / value)), 6) AS mape,
           round(avg((value - pred) * (value - pred)), 6) AS mse,
           round(sqrt(avg((value - pred) * (value - pred))), 6) AS rmse
    FROM f GROUP BY event_type
    """,
)
def q21_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 regression-metric suite (``common/models.py:41-51``) comparing
    each value to the previous observation (persistence forecast)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts")
    p = e.withColumn("pred", F.lag("value").over(w)).filter(
        F.col("pred").isNotNull() & (F.col("value") > 1)
    )
    m = ts_agg.regression_metrics(p, "value", "pred", keys=["event_type"], exact_median=True)
    return m.select(
        "event_type",
        F.round("mae", 6).alias("mae"),
        F.round("median_ae", 6).alias("median_ae"),
        F.round("mape", 6).alias("mape"),
        F.round("mse", 6).alias("mse"),
        F.round("rmse", 6).alias("rmse"),
    )


@query(
    "q26_ts_binned_mean",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY ts) - 1 AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, CAST(floor(rn * 10 / n) AS INT) AS bin,
           round(avg(value), 6) AS value
    FROM r GROUP BY 1, 2
    """,
)
def q26_ts_binned_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 equal-width binned means (``recoverytime/models.py:33-39``),
    via :func:`ts_core.binned_mean`."""
    e = _t(spark, sf_dir, "events").select("event_type", F.col("ts").alias("timestamp"), "value")
    out = ts_core.binned_mean(e, bin_count=10, keys=["event_type"])
    return out.select("event_type", "bin", F.round("value", 6).alias("value"))


# ---------------------------------------------------------------------------
# Text analysis / dedup (documents table)
# ---------------------------------------------------------------------------

_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

# 80-char normalized-prefix fingerprint — the near-dup candidate signal
# shared by q174/q178/q179. ONE definition per engine: a tweak here keeps
# the three linked queries (and their oracles) in lockstep.
_PREFIX_FP_SQL = (
    "md5(substring(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), 1, 80))"
)


def _prefix_fp() -> F.Column:
    return F.md5(
        F.substring(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")), 1, 80)
    )
_SW_SQL = f"len(list_filter({_TOKS_SQL}, x -> x IN ('the','a','of','and','to')))"


@query(
    "q08_dedup_exact",
    oracle="""
    SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
           min(doc_id) AS keep_id, count(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def q08_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint (hash-groupBy; the
    canonical 100 TB exact dedup — skew-free uniform key)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d)


@query(
    "q09_text_stats",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS token_count,
           length(text) AS char_count,
           round(CASE WHEN trim(text) = '' THEN 0.0
                 ELSE (length(text) - (len({_TOKS_SQL}) - 1)) * 1.0 / len({_TOKS_SQL}) END, 6) AS avg_token_len,
           round(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text) END, 6) AS punct_ratio
    FROM documents
    """,
)
def q09_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counts + punctuation ratio — JVM column expressions only
    (whole-stage codegen over the documents scan)."""
    d = _t(spark, sf_dir, "documents")
    s = text.token_stats(d)
    return s.select(
        "doc_id",
        "token_count",
        "char_count",
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
    )


@query(
    "q10_text_quality",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS tok,
             length(text) AS ch,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text) END AS pr,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE {_SW_SQL} * 1.0 / len({_TOKS_SQL}) END AS sw
      FROM documents
    )
    SELECT doc_id, round(sw, 6) AS stopword_ratio,
           round(0.5 * least(tok / 100.0, 1.0) + 0.5 * least(sw * 5.0, 1.0)
                 - 0.25 * least(pr * 5.0, 1.0), 6) AS quality_score
    FROM s
    """,
)
def q10_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length + stopword + punctuation signals)."""
    d = _t(spark, sf_dir, "documents")
    q = text.quality_score(d)
    return q.select(
        "doc_id",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


@query(
    "q11_langid_counts",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN trim(text) = '' THEN 0.0
                  ELSE {_SW_SQL} * 1.0 / len({_TOKS_SQL}) END AS sw
      FROM documents
    )
    SELECT CASE WHEN sw > 0.03 THEN 'en' ELSE 'other' END AS pred_lang,
           count(*) AS n_docs
    FROM s GROUP BY 1
    """,
)
def q11_langid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID + distribution."""
    d = _t(spark, sf_dir, "documents")
    p = text.predict_language(d)
    return p.groupBy("pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "q13_ngram_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 5
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 4),
                                          i -> array_to_string(t[i:i+4], ' '))) AS grams
      FROM toks
    ),
    posting AS (SELECT doc_id, len(grams) AS sz, unnest(grams) AS g FROM sh),
    capped AS (
      SELECT * FROM (
        SELECT p.*, count(*) OVER (PARTITION BY g) AS df FROM posting p
      ) WHERE df <= 1000
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS size_a, b.sz AS size_b,
             count(*) AS inter
      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, round(inter * 1.0 / (size_a + size_b - inter), 6) AS jaccard
    FROM pairs WHERE inter * 1.0 / (size_a + size_b - inter) >= 0.2
    """,
)
def q13_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 5-gram Jaccard via an inverted shingle index
    — no O(n²) cross join; see :func:`dedup.ngram_jaccard_pairs`. The
    document-frequency cap (1000, mirrored in the oracle) bounds the pair
    expansion of hot stopword-grams at corpus scale."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, n=5, threshold=0.2, max_shingle_freq=1000)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# Embedding similarity (embeddings table)
# ---------------------------------------------------------------------------

_COS_SQL = """
      list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


@query(
    "q22_emb_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    s AS (SELECT e.vec_id, {_COS_SQL} AS cs FROM embeddings e, q)
    SELECT vec_id, round(cs, 6) AS cos_sim FROM s WHERE cs > 0.2
    """,
)
def q22_emb_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine against one query vector: the query is collected
    once (a single-row lookup) and folded into the plan as a literal — the
    corpus is scanned exactly once, no shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    scored = similarity.cosine_to_query(emb, list(qvec))
    return scored.filter(F.col("cos_sim") > 0.2).select(
        "vec_id", F.round("cos_sim", 6).alias("cos_sim")
    )


@query(
    "q23_emb_knn",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)),
    s AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, {_COS_SQL} AS cs
      FROM embeddings e, q
    ),
    r AS (SELECT query_id, neighbor_id, cs,
                 row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rank
          FROM s)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cs, 6) AS cos_sim
    FROM r WHERE rank <= 5
    """,
)
def q23_emb_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k ANN baseline: broadcast query set, per-query window
    top-k (``similarity.brute_force_topk``)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    out = similarity.brute_force_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
        F.round("cos_sim", 6).alias("cos_sim"),
    )


# ---------------------------------------------------------------------------
# Rows-only entries (no SQL oracle: hash functions differ across engines)
# ---------------------------------------------------------------------------


# shared 60-bit md5-derived hash, bit-identical in both engines
# (Spark: conv(substring(md5(x),1,15),16,10); see dedup.md5_hash64)
_MD5H_SQL = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"


@query(
    "q24_minhash_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' '))) AS grams
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    hp AS (
      SELECT doc_id,
             {_MD5H_SQL.format(x='g')} % 2147483647 AS h1,
             CAST(('0x' || substring(md5(g), 17, 15)) AS BIGINT) % 2147483646 + 1 AS h2
      FROM post
    ),
    mh AS (
      SELECT doc_id, i, min((h1 + i * h2) % 2147483647) AS h
      FROM hp CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i) seeds
      GROUP BY doc_id, i
    ),
    sig AS (SELECT doc_id, list(h ORDER BY i) AS s FROM mh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, s, b,
             array_to_string(list_transform(s[b*4+1:b*4+4], x -> CAST(x AS VARCHAR)), ',') AS bucket
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) bands
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
      FROM banded a JOIN banded b ON a.b = b.b AND a.bucket = b.bucket
                                 AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(list_sum(list_transform(generate_series(1, 32),
                 k -> CASE WHEN sa[k] = sb[k] THEN 1 ELSE 0 END)) / 32.0, 6) AS est_jaccard
    FROM cand
    """,
)
def q24_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs. Uses the md5-derived 60-bit
    hash (:func:`dedup.md5_hash64`) so the whole pipeline — signatures,
    band buckets, candidate join, agreement estimate — is reproduced
    hash-for-hash by the DuckDB oracle. The xxhash64 default stays the
    fast path for production corpora."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, num_hashes=32, bands=8, shingle_n=3, hash_fn="md5")
    return pairs.select(
        "doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


@query(
    "q25_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE {_TOKS_SQL} END AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(t, tok -> {_MD5H_SQL.format(x="tok")}) AS hs
      FROM toks
    )
    SELECT doc_id AS doc,
           array_to_string(list_transform(generate_series(0, 59), b ->
             CASE WHEN list_sum(list_transform(hs,
                    x -> CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                  THEN '1' ELSE '0' END), '') AS simhash
    FROM h
    """,
)
def q25_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document via the md5-derived hash — bit-for-bit
    reproduced by the DuckDB oracle (the 64-bit xxhash64 form stays the
    production default)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash(d, hash_fn="md5")


# ---------------------------------------------------------------------------
# Control-loop / profile-store operators (SURVEY A4, A7, A11-A13, W9, J5, M10)
# ---------------------------------------------------------------------------


@query(
    "q27_grouped_topn",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    )
    SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_orderkey, o_totalprice
    FROM r WHERE rank <= 3
    """,
)
def q27_grouped_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 grouped ordered assembly + W8 positional slice: the reference
    groups profiles by scaleOut and walks each group in stop-time order
    (``Graph.java:92-102``); expressed relationally as a per-group
    row_number + top-n (no collect_list on the driver)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", F.col("rank").cast("int").alias("rank"), "o_orderkey", "o_totalprice")
    )


@query(
    "q28_p95_latency",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.95), 6) AS p95_value,
           round(quantile_cont(value, 0.5), 6) AS p50_value
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def q28_p95_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 quantile: the reference's p95 operator-latency metric
    (``ClientsManager.java:47, 352-353``). Exact interpolating percentile
    here for oracle parity; at 100 TB switch to percentile_approx (sketch
    merges map-side, no per-group sort)."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_value"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_value"),
    )


@query(
    "q29_simpson_integral",
    oracle=f"""
    WITH h AS (
      SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 3600) AS BIGINT) AS hr,
             sum(value) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    d AS (
      SELECT v, row_number() OVER (ORDER BY hr) - 1 AS rn,
             lead(v, 1) OVER (ORDER BY hr) AS v1,
             lead(v, 2) OVER (ORDER BY hr) AS v2,
             count(*) OVER () AS n
      FROM h
    )
    SELECT round(sum((v + 4 * v1 + v2) / 3.0), 6) AS integral
    FROM d WHERE rn % 2 = 0 AND rn + 2 <= n - 1
    """,
)
def q29_simpson_integral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 composite Simpson integral as a window expression (the
    recovery-time catch-up integrand, ``recoverytime/models.py:45-70``):
    on the uniform hourly grid (h=1), sum (y0 + 4*y1 + y2)*h/3 over
    disjoint interval pairs; a trailing odd interval is truncated
    identically on both sides."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("hr", F.floor(_epoch() / 3600).cast("long"))
        .groupBy("hr")
        .agg(F.sum("value").alias("v"))
    )
    w = Window.orderBy("hr")
    d = (
        hourly.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("v1", F.lead("v", 1).over(w))
        .withColumn("v2", F.lead("v", 2).over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    )
    return d.filter((F.col("rn") % 2 == 0) & (F.col("rn") + 2 <= F.col("n") - 1)).agg(
        F.round(F.sum((F.col("v") + 4 * F.col("v1") + F.col("v2")) / 3.0), 6).alias("integral")
    )


@query(
    "q30_pairwise_clustering",
    oracle="""
    WITH cand AS (
      SELECT o_orderpriority AS cand, avg(o_totalprice) AS val FROM orders GROUP BY 1
    ),
    agree AS (
      SELECT a.cand, count(*) AS peers
      FROM cand a JOIN cand b ON abs(a.val - b.val) / b.val < 0.05
      GROUP BY a.cand
    ),
    m AS (SELECT max(peers) AS mx FROM agree)
    SELECT agree.cand, CAST(peers AS BIGINT) AS peers,
           (peers = m.mx) AS in_largest_group
    FROM agree, m
    """,
)
def q30_pairwise_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 pairwise relative-distance clustering (``utils/Evaluate.java:
    13-39``): each candidate counts peers within relative distance; the
    largest agreement group wins. Self-join + filter + count — the
    candidate set is tiny so the cross join is bounded."""
    o = _t(spark, sf_dir, "orders")
    cand = o.groupBy(F.col("o_orderpriority").alias("cand")).agg(
        F.avg("o_totalprice").alias("val")
    )
    a = cand.select(F.col("cand"), F.col("val").alias("va"))
    b = cand.select(F.col("cand").alias("cb"), F.col("val").alias("vb"))
    agree = (
        a.crossJoin(b)
        .filter(F.abs((F.col("va") - F.col("vb")) / F.col("vb")) < 0.05)
        .groupBy("cand")
        .agg(F.count(F.lit(1)).alias("peers"))
    )
    mx = agree.agg(F.max("peers").alias("mx"))
    return agree.crossJoin(F.broadcast(mx)).select(
        "cand", F.col("peers").cast("long").alias("peers"),
        (F.col("peers") == F.col("mx")).alias("in_largest_group"),
    )


@query(
    "q31_regression_validity",
    oracle=f"""
    WITH s AS (
      SELECT event_type, {EPOCH_SQL.format(c='ts')} - 1704067200 AS x, value,
             row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ),
    fit AS (
      SELECT event_type,
             covar_pop(CAST(x AS DOUBLE), value) / var_pop(CAST(x AS DOUBLE)) AS slope,
             avg(value) - covar_pop(CAST(x AS DOUBLE), value) / var_pop(CAST(x AS DOUBLE)) * avg(CAST(x AS DOUBLE)) AS icept
      FROM s WHERE rn < n GROUP BY event_type
    ),
    lastv AS (SELECT event_type, x AS lx, value AS lv FROM s WHERE rn = n)
    SELECT l.event_type,
           round(f.slope * l.lx + f.icept, 6) AS predicted,
           round(l.lv, 6) AS actual,
           (abs((f.slope * l.lx + f.icept) - l.lv) / l.lv < 2.0) AS is_valid
    FROM lastv l JOIN fit f ON l.event_type = f.event_type
    """,
)
def q31_regression_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 per-group regression validity (``utils/Evaluate.java:41-56``):
    OLS on all-but-last points, candidate valid if the last value is within
    2.0 relative error of the extrapolation."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        "event_type", (_epoch() - F.lit(1704067200)).alias("x"), "value", F.col("ts")
    )
    w = Window.partitionBy("event_type").orderBy("ts")
    cnt = Window.partitionBy("event_type")
    s = e.withColumn("rn", F.row_number().over(w)).withColumn("n", F.count(F.lit(1)).over(cnt))
    xd = F.col("x").cast("double")
    fit = (
        s.filter(F.col("rn") < F.col("n"))
        .groupBy("event_type")
        .agg(
            (F.covar_pop(xd, F.col("value")) / F.var_pop(xd)).alias("slope"),
            F.avg("value").alias("_my"),
            F.avg(xd).alias("_mx"),
        )
        .select(
            "event_type", "slope", (F.col("_my") - F.col("slope") * F.col("_mx")).alias("icept")
        )
    )
    lastv = s.filter(F.col("rn") == F.col("n")).select(
        "event_type", F.col("x").alias("lx"), F.col("value").alias("lv")
    )
    pred = F.col("slope") * F.col("lx") + F.col("icept")
    return lastv.join(fit, "event_type").select(
        "event_type",
        F.round(pred, 6).alias("predicted"),
        F.round("lv", 6).alias("actual"),
        (F.abs(pred - F.col("lv")) / F.col("lv") < 2.0).alias("is_valid"),
    )


@query(
    "q32_response_finalizer",
    oracle="""
    WITH cand AS (
      SELECT row_number() OVER (ORDER BY revenue DESC) + 1 AS scale_out,
             revenue / 1000000.0 AS value
      FROM (
        SELECT n.n_name, sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                             * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
      )
    ),
    r AS (SELECT quantile_cont(value, 0.5) AS restriction FROM cand),
    v AS (
      SELECT scale_out, round(CAST(value AS DOUBLE), 6) AS value,
             (value < r.restriction) AS is_valid
      FROM cand, r
    ),
    fv AS (SELECT min(CASE WHEN is_valid THEN scale_out END) AS first_valid FROM v)
    SELECT CAST(v.scale_out AS INT) AS scale_out, v.value, v.is_valid,
           (v.is_valid AND v.scale_out = fv.first_valid) AS is_best
    FROM v, fv
    """,
)
def q32_response_finalizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 ResponseFinalizer (``common/schemes.py:43-68``): candidates sorted
    by scale_out, validity = value < restriction, single best = first valid.
    Candidate values derived deterministically from the revenue query so the
    oracle can rebuild them."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_dim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.col("revenue").desc())
    cand = rev.select(
        (F.row_number().over(w) + 1).alias("scale_out"),
        (F.col("revenue") / F.lit(1000000.0)).alias("value"),
    # candidate-grid-sized (~25 rows) but derived from the 4-table join:
    # materialize once so downstream consumers don't re-run the join
    ).localCheckpoint(eager=True)
    restriction = cand.agg(F.expr("percentile(value, 0.5)").alias("restriction"))
    v = cand.crossJoin(F.broadcast(restriction)).select(
        "scale_out",
        F.round(F.col("value").cast("double"), 6).alias("value"),
        (F.col("value") < F.col("restriction")).alias("is_valid"),
    )
    fv = v.agg(F.min(F.when(F.col("is_valid"), F.col("scale_out"))).alias("first_valid"))
    return v.crossJoin(F.broadcast(fv)).select(
        F.col("scale_out").cast("int").alias("scale_out"),
        "value",
        "is_valid",
        (F.col("is_valid") & (F.col("scale_out") == F.col("first_valid"))).alias("is_best"),
    )


@query(
    "q33_series_align",
    oracle=f"""
    WITH a AS (
      SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 60) AS BIGINT) AS minute, sum(value) AS va
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    b AS (
      SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 60) AS BIGINT) AS minute, sum(value) AS vb
      FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT count(*) AS n_aligned,
           round(avg(abs(va - vb)), 6) AS mae,
           round(avg(va - vb), 6) AS bias
    FROM a JOIN b USING (minute)
    """,
)
def q33_series_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 as-of/alignment join: align two series on shared timestamps and
    compare elementwise (``workload/models.py:138-147``). Equi-join on the
    minute bucket; at scale both sides are pre-partitioned by time."""
    e = _t(spark, sf_dir, "events")
    minutely = lambda typ, out: (
        e.filter(F.col("event_type") == typ)
        .withColumn("minute", F.floor(_epoch() / 60).cast("long"))
        .groupBy("minute")
        .agg(F.sum("value").alias(out))
    )
    a = minutely("click", "va")
    b = minutely("view", "vb")
    return a.join(b, "minute").agg(
        F.count(F.lit(1)).alias("n_aligned"),
        F.round(F.avg(F.abs(F.col("va") - F.col("vb"))), 6).alias("mae"),
        F.round(F.avg(F.col("va") - F.col("vb")), 6).alias("bias"),
    )


@query(
    "q34_backpressure_detector",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             CAST({EPOCH_SQL.format(c='ts')} - 1704067200 AS DOUBLE) AS x,
             value,
             CASE WHEN value > 150 THEN 1.0 ELSE 0.0 END AS over
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           round(avg(over), 6) AS bck_pres_per,
           round(covar_pop(x, value) / var_pop(x) * 86400, 6) + 0.0 AS lat_slope_per_day,
           (avg(over) = 1.0 OR (avg(over) > 0 AND covar_pop(x, value) / var_pop(x) * 86400 > 1
                                AND avg(value) > 50)) AS is_bck_pres
    FROM s GROUP BY event_type
    """,
)
def q34_backpressure_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 backpressure detector boolean rule (``ClientsManager.java:
    329-339``): full backpressure, or partial backpressure with rising
    latency and rising lag. Expressed over per-type aggregates (threshold
    fraction stands in for the PromQL backpressure ratio)."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        "event_type",
        (_epoch() - F.lit(1704067200)).cast("double").alias("x"),
        "value",
        F.when(F.col("value") > 150, 1.0).otherwise(0.0).alias("over"),
    )
    slope = F.covar_pop(F.col("x"), F.col("value")) / F.var_pop(F.col("x")) * 86400
    return e.groupBy("event_type").agg(
        F.round(F.avg("over"), 6).alias("bck_pres_per"),
        (F.round(slope, 6) + F.lit(0.0)).alias("lat_slope_per_day"),
        (
            (F.avg("over") == 1.0)
            | ((F.avg("over") > 0) & (slope > 1) & (F.avg("value") > 50))
        ).alias("is_bck_pres"),
    )


# -- pandas-UDF (Arrow) rows-only entries ----------------------------------


def _savgol_oracle() -> str:
    """DuckDB oracle for savgol(51, 3): the filter is LINEAR in the input,
    so it is three literal coefficient blocks — a 51-tap centered
    convolution for interior rows and 25x51 head/tail matrices for the
    'interp' polynomial edges — extracted numerically by applying
    :func:`savgol_filter` to unit vectors (block structure verified:
    Toeplitz interior, head/tail support only in the first/last 51)."""
    import numpy as np

    from phoebe_spark.functions.numeric import savgol_filter

    n = 200
    L = np.array([savgol_filter(np.eye(n)[j], 51, 3) for j in range(n)]).T

    def lit1(v):
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    def lit2(M):
        return "[" + ", ".join(lit1(r) for r in M) + "]"

    center, head, tail = L[100, 75:126], L[:25, :51], L[-25:, -51:]
    return f"""
    WITH s AS (
      SELECT event_type,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs,
             list(event_id ORDER BY ts, event_id) AS ids
      FROM events GROUP BY event_type
    ),
    c AS (SELECT {lit1(center)} AS cc, {lit2(head)} AS hh, {lit2(tail)} AS tt)
    SELECT event_type,
           unnest(ids) AS event_id,
           unnest(list_transform(generate_series(1, len(vs)), i ->
             round(CASE
               WHEN i <= 25 THEN
                 list_sum(list_transform(generate_series(1, 51), j -> hh[i][j] * vs[j]))
               WHEN i >= len(vs) - 24 THEN
                 list_sum(list_transform(generate_series(1, 51),
                          j -> tt[i - (len(vs) - 25)][j] * vs[len(vs) - 51 + j]))
               ELSE
                 list_sum(list_transform(generate_series(1, 51), j -> cc[j] * vs[i - 26 + j]))
             END, 6))) AS smoothed
    FROM s, c
    """


@query("q35_savgol_smooth", oracle=_savgol_oracle())
def q35_savgol_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 Savitzky-Golay smoothing per series, ALL-JVM (the reference's
    scipy savgol, `analytics/app/workload/models.py:55-62`). The filter is
    linear, so it is three literal coefficient blocks (see
    :func:`_savgol_oracle`): interior rows are a 51-tap centered windowed
    dot product — ``collect_list`` over a ±25 row frame, ``zip_with`` +
    ``aggregate`` against the literal tap vector — and the 25-row
    head/tail 'interp' edges are literal 25x51 matrices applied to each
    series' first/last 51 values (per-series scalars, broadcast-joined
    back). No Python in the plan: unlike the round-2
    one-Arrow-task-per-series ``applyInPandas``, this distributes within a
    series, so a 10^9-row series is just more window partitions, not one
    executor's pandas frame. Plan-asserted Python-free in
    tests/test_plans.py. Kernel: :func:`ts_core.savgol_smooth`."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("ts").alias("t"),
        F.col("value").alias("value"),
    )
    out = ts_core.savgol_smooth(
        e,
        window=51,
        polyorder=3,
        keys=["event_type"],
        value_col="value",
        order_col="t",
        tiebreak_cols=["event_id"],
        # every event_type has thousands of points at all SFs, so the
        # sub-window Python fallback can never fire: pin the plan to the
        # 100%-JVM form (asserted in tests/test_plans.py)
        short_series="null",
    )
    return out.select(
        "event_type", "event_id", F.round("smoothed", 6).alias("smoothed")
    )


@query(
    "q36_ewm_ensemble",
    oracle="""
    WITH m AS (
      SELECT (epoch_ns(ts) // 1000000000) // 60 AS minute, event_type,
             CAST(sum(value) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), a AS (
      SELECT minute, list(v ORDER BY event_type) AS vs FROM m GROUP BY minute
    ), e AS (
      SELECT minute, list_reduce(vs, (acc, x) -> acc + (x - acc) / 3.0) AS ewm
      FROM a
    )
    SELECT minute,
           round(avg(ewm) OVER (ORDER BY minute
                 ROWS BETWEEN 60 PRECEDING AND 59 FOLLOWING), 6) AS combined
    FROM e
    """,
)
def q36_ewm_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 horizontal EWM ensemble, closed form (``workload/models.py:
    132-136``): per minute the per-type sums are ordered 'model columns';
    EWM(span=5, adjust=False, ignore_na=True) across columns followed by
    taking the LAST column is a left fold ``acc + (x - acc)/3`` over the
    present values in column order — a JVM ``aggregate`` over a sorted
    ``collect_list``, no Python in the path. The trailing centered
    rolling(120) mean is a rows-between [-60, +59] window (pandas
    ``center=True`` pins the even window left-heavy; verified empirically).

    The window runs over the aggregated minute grid — bounded by the time
    span, not row volume, so the single-partition sort is safe at scale
    (same shape as the reference's one-job timeline)."""
    per_type = (
        _t(spark, sf_dir, "events")
        .withColumn("minute", F.floor(_epoch() / 60).cast("long"))
        .groupBy("minute", "event_type")
        .agg(F.sum("value").alias("v"))
    )
    arr = per_type.groupBy("minute").agg(
        F.array_sort(F.collect_list(F.struct("event_type", "v"))).alias("s")
    )
    vals = F.transform(F.col("s"), lambda x: x["v"])
    ewm = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.coalesce(acc + (x - acc) / F.lit(3.0), x, acc),
    )
    w = Window.orderBy("minute").rowsBetween(-60, 59)
    return (
        arr.select("minute", ewm.alias("_ewm"))
        .select("minute", F.round(F.avg("_ewm").over(w), 6).alias("combined"))
    )


@query(
    "q37_json_extract",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           count(*) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1
    """,
)
def q37_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 JSON (de)serialization: parse the ``props`` JSON column with a
    typed schema (``from_json`` — JVM-side, no UDF) and aggregate by the
    extracted field. Mirrors the reference's gson/pydantic TimeSeries JSON
    boundary (``TimeSeries.java:323-327``)."""
    e = _t(spark, sf_dir, "events")
    parsed = e.withColumn("_p", F.from_json("props", "k INT"))
    return parsed.groupBy(F.col("_p.k").alias("k")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@query(
    "q38_semi_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                   AND o.o_orderstatus = 'F') AS has_finished_order
    FROM customer c
    WHERE c.c_acctbal > 0
    """,
)
def q38_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join surface (the reference has no semi/anti joins — SURVEY
    §2.3 notes Spark provides the full suite for free): per customer, an
    existence flag against filtered orders. Implemented as a left_semi
    union left_anti pair so both plan shapes are exercised."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    keys = o.select(F.col("o_custkey")).distinct()
    with_flag = c.join(keys, c.c_custkey == keys.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment", F.lit(True).alias("has_finished_order")
    )
    without = c.join(keys, c.c_custkey == keys.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment", F.lit(False).alias("has_finished_order")
    )
    return with_flag.unionByName(without)


@query(
    "q39_outer_join_nulls",
    oracle="""
    SELECT c.c_custkey,
           coalesce(CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE), 0.0) AS total_spend,
           count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def q39_outer_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-group handling (F4 null-skip semantics on
    the agg side): customers with zero orders keep a 0.0 spend row."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(_dsum2(_dec("o_totalprice")), F.lit(0.0)).alias("total_spend"),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "q40_merge_overwrite",
    oracle=f"""
    WITH a AS (
      SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 3600) AS BIGINT) AS hr, sum(value) AS v
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    b AS (
      SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 3600) AS BIGINT) AS hr, sum(value) AS v
      FROM events WHERE event_type = 'view'
        AND {EPOCH_SQL.format(c='ts')} < (SELECT max({EPOCH_SQL.format(c='ts')}) FROM events) - 172800
      GROUP BY 1
    ),
    ends AS (SELECT (SELECT max(hr) FROM a) AS end_a, (SELECT max(hr) FROM b) AS end_b),
    -- later-ending series overwrites on overlap (Python TimeSeries.merge)
    obs AS (
      SELECT hr, CASE WHEN av IS NOT NULL AND (bv IS NULL OR e.end_a >= e.end_b) THEN av ELSE bv END AS v
      FROM (SELECT coalesce(a.hr, b.hr) AS hr, a.v AS av, b.v AS bv
            FROM a FULL OUTER JOIN b ON a.hr = b.hr), ends e
    ),
    grid AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM obs), (SELECT max(hr) FROM obs))) AS timestamp
    ),
    j AS (SELECT g.timestamp, o.v AS value FROM grid g LEFT JOIN obs o ON o.hr = g.timestamp),
    w AS (
      SELECT timestamp, value,
        last_value(value IGNORE NULLS) OVER (ORDER BY timestamp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN value IS NOT NULL THEN timestamp END IGNORE NULLS) OVER (ORDER BY timestamp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(value IGNORE NULLS) OVER (ORDER BY timestamp ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN value IS NOT NULL THEN timestamp END IGNORE NULLS) OVER (ORDER BY timestamp ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j
    )
    SELECT timestamp,
           round(CASE WHEN value IS NOT NULL THEN value
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                        THEN pv + (nv - pv) * (timestamp - pt) / (nt - pt)
                      ELSE coalesce(pv, nv) END, 6) AS value
    FROM w
    """,
)
def q40_merge_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 Python-merge (overwrite-by-recency + linear interpolation) on
    real series: hourly 'click' volume merged with a truncated hourly
    'view' series — the later-ending click series overwrites on overlap,
    and the gap left by the truncation interpolates linearly. This is the
    flagship custom operator (:func:`ts_core.merge_overwrite`), oracle-
    checked beyond its golden unit test."""
    e = _t(spark, sf_dir, "events")
    hourly = lambda typ: (
        e.filter(F.col("event_type") == typ)
        .withColumn("timestamp", F.floor(_epoch() / 3600).cast("long"))
        .groupBy("timestamp")
        .agg(F.sum("value").alias("value"))
    )
    a = hourly("click")
    # truncation cutoff as a broadcast 1-row aggregate (as q15 does), not a
    # driver-side collect — the plan stays lazy end-to-end
    cut = e.agg((F.max(_epoch()) - F.lit(172800)).alias("_cut"))
    b = (
        e.filter(F.col("event_type") == "view")
        .join(F.broadcast(cut))
        .filter(_epoch() < F.col("_cut"))
        .withColumn("timestamp", F.floor(_epoch() / 3600).cast("long"))
        .groupBy("timestamp")
        .agg(F.sum("value").alias("value"))
    )
    merged = ts_core.merge_overwrite(b, a, assume_bounded=True)
    return merged.select("timestamp", F.round("value", 6).alias("value"))


@query(
    "q41_emb_neardup_pairs",
    oracle="""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(generate_series(1, len(a.embedding)),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                 / (a.nrm * b.nrm), 6) AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (a.nrm * b.nrm) >= 0.45
    """,
)
def q41_emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at >= 0.45 (the embedding
    variant of near-dup dedup). Exact pairwise form as the oracle-checkable
    baseline; the LSH-bucketed variant (similarity.lsh_bucketed_pairs) is
    the scale path, tested for recall against this in pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.all_pairs_cosine(emb, threshold=0.45)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


@query(
    "q42_part_stats",
    oracle="""
    SELECT p_brand, count(*) AS n_parts,
           round(CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,4))), 2) AS DOUBLE) / count(*), 6) AS avg_price,
           max(p_size) AS max_size
    FROM part WHERE p_size >= 10 GROUP BY p_brand
    """,
)
def q42_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part-table coverage: filtered grouped stats."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_size") >= 10)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(_dsum2(_dec("p_retailprice")) / F.count(F.lit(1)), 6).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


@query(
    "q43_supplier_nation",
    oracle="""
    SELECT n.n_name, count(*) AS n_suppliers,
           CAST(round(sum(CAST(s.s_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q43_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier-table coverage: broadcast dim join + grouped money sum."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            _dsum2(_dec("s_acctbal")).alias("total_acctbal"),
        )
    )


@query(
    "q44_ivf_ann",
    oracle="""
    WITH n AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    piv AS (
      SELECT CAST(vec_id - 10 AS INT) AS cell, v AS pv, nrm AS pnrm
      FROM n WHERE vec_id BETWEEN 10 AND 17
    ),
    ad AS (
      SELECT n.vec_id, n.v, n.nrm, piv.cell,
             list_sum(list_transform(generate_series(1, len(n.v)),
                      i -> n.v[i] * piv.pv[i])) / (n.nrm * piv.pnrm) AS cs
      FROM n CROSS JOIN piv
    ),
    cells AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT vec_id, v, nrm, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rk
        FROM ad) WHERE rk = 1
    ),
    qc AS (
      SELECT query_id, qv, qnrm, cell FROM (
        SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rk
        FROM ad WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rk <= 4
    ),
    cand AS (
      SELECT qc.query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(generate_series(1, len(c.v)),
                      i -> c.v[i] * qc.qv[i])) / (c.nrm * qc.qnrm) AS cs
      FROM qc JOIN cells c USING (cell)
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cs, 6) AS cos_sim
    FROM (SELECT query_id, neighbor_id, cs,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cs DESC, neighbor_id) AS rank
          FROM cand)
    WHERE rank <= 5
    """,
)
def q44_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a PRETRAINED coarse quantizer (the FAISS
    train-once/assign-many pattern): the 8 cell centroids are fixed pivot
    vectors (corpus vec_id 10-17, normalized), so cell assignment, probed
    cells, and the within-cell exact top-k are all deterministic — the
    DuckDB oracle reproduces the operator EXACTLY (value-hash strength;
    round-2's `no_oracle` retired). The k-means fit path remains the
    operator default (recall pinned in tests/test_similarity.py).

    100 TB shape unchanged: per-query cost is n_probe/n_centroids of the
    corpus, assignment is one distributed Arrow GEMM pass, corpus never
    shuffles."""
    emb = _t(spark, sf_dir, "embeddings")
    pivots = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id").between(10, 17))
        .orderBy("vec_id")
        .collect()
    ]
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    out = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=4, centroids=pivots
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("cos_sim", 6).alias("cos_sim"),
    )


@query(
    "q45_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents WHERE trim(text) <> ''
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents WHERE trim(text) <> ''),
    scored AS (
      SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.n_docs * 1.0 / dfreq.df), 6) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ln(n.n_docs * 1.0 / dfreq.df) DESC, tf.term) AS rk
      FROM tf JOIN dfreq USING (term), n
    )
    SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rank FROM scored WHERE rk <= 3
    """,
)
def q45_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic text-pipeline scoring
    operator: term frequencies and document frequencies are two hash
    aggregations, idf joins back on term (broadcastable: vocabulary <<
    corpus), per-doc top-k is a window. All JVM-side."""
    d = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    # corpus size as a broadcast 1-row aggregate, not a driver-side action —
    # the whole query stays one lazy plan
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    toks = d.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tfidf = F.col("tf") * F.log(F.col("_n_docs") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(tfidf.desc(), F.col("term"))
    return (
        tf.join(_dim(dfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", F.round(tfidf, 6).alias("tfidf"), F.col("rank").cast("int").alias("rank"))
    )


@query(
    "q46_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, {EPOCH_SQL.format(c='ts')} AS es FROM events
    ),
    marked AS (
      SELECT user_id, es,
             CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
                       OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sess AS (
      SELECT user_id, es,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY es
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    ),
    per_session AS (
      SELECT user_id, session_id, count(*) AS ev, max(es) - min(es) AS dur
      FROM sess GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(ev) AS BIGINT) AS n_events,
           round(avg(ev), 6) AS avg_session_events,
           round(avg(dur), 6) AS avg_session_dur_s
    FROM per_session GROUP BY user_id
    """,
)
def q46_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-minute inactivity gap): the canonical windowed
    data-pipeline operator — gap detection via lag, session ids via a
    running sum, two follow-up aggregations. One shuffle on user_id; the
    windows reuse that partitioning."""
    e = _t(spark, sf_dir, "events").select("user_id", _epoch().alias("es"))
    w = Window.partitionBy("user_id").orderBy("es")
    marked = e.withColumn(
        "new_session",
        F.when(
            F.lag("es").over(w).isNull() | ((F.col("es") - F.lag("es").over(w)) > 1800), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("ev"), (F.max("es") - F.min("es")).alias("dur")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("ev").cast("long").alias("n_events"),
        F.round(F.avg("ev"), 6).alias("avg_session_events"),
        F.round(F.avg("dur"), 6).alias("avg_session_dur_s"),
    )


@query(
    "q47_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q47_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (beyond the reference's surface — SURVEY §2.4
    notes it has none): exact per-key distinct count. At 100 TB prefer
    approx_count_distinct (HLL sketch, map-side mergeable) unless
    exactness is required; the exact form is the oracle-checkable one."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q48_latest_per_user",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id, event_type, value FROM r WHERE rn = 1
    """,
)
def q48_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup — the standard CDC/snapshot compaction
    operator: one window on the natural partition key, deterministic
    tiebreak."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "q49_rollup_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q49_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status -> priority -> grand total): one
    pass, partial aggregation per grouping set; NULL marks the rolled-up
    levels identically in both engines."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        _dsum2(_dec("o_totalprice")).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q50_profile_store",
    oracle="""
    WITH base AS (
      SELECT 1 AS expId, event_type AS genType,
             'job_' || CAST(CAST(json_extract_string(props, '$.k') AS INT) AS VARCHAR) AS jobName,
             CAST(json_extract_string(props, '$.k') AS INT) AS scaleOut,
             round(avg(value), 6) AS avgLat,
             round(sum(value), 6) AS avgThr,
             CAST(json_extract_string(props, '$.k') AS INT) % 2 AS isBckPres,
             min(epoch_ns(ts) // 1000000000) AS startTs,
             max(epoch_ns(ts) // 1000000000) AS stopTs
      FROM events
      GROUP BY event_type, CAST(json_extract_string(props, '$.k') AS INT)
    )
    SELECT expId, genType, jobName, scaleOut, avgLat, avgThr, isBckPres, startTs, stopTs
    FROM base
    WHERE genType IN ('click', 'view')
      AND NOT (genType = 'click' AND isBckPres = 1)
    """,
)
def q50_profile_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4-S6 profile-store round-trip: DDL + insert + predicate delete +
    filtered ordered select (``DataManager.java:148-214``). Profile rows
    derive from the events table (one per (genType, scaleOut)); the
    DELETE WHERE expId/genType/isBckPres is a static-partition overwrite
    (see :mod:`phoebe_spark.sources.tables`) so at scale it swaps out one
    partition directory instead of rewriting the store. The oracle mirrors
    the delete as an anti-filter over the same derived rows."""
    import tempfile

    from phoebe_spark.sources import tables as store

    spark.sql("DROP TABLE IF EXISTS profiles")
    spark.sql("DROP TABLE IF EXISTS predictions")
    store.create_profile_store(spark, tempfile.mkdtemp(prefix="phoebe_store_"))

    e = _t(spark, sf_dir, "events").withColumn("k", F.from_json("props", "k INT")["k"])
    base = (
        e.groupBy("event_type", "k")
        .agg(
            F.round(F.avg("value"), 6).alias("avgLat"),
            F.round(F.sum("value"), 6).alias("avgThr"),
            F.min(_epoch()).alias("startTs"),
            F.max(_epoch()).alias("stopTs"),
        )
        .select(
            F.lit(1).alias("expId"),
            F.col("event_type").alias("genType"),
            F.concat(F.lit("job_"), F.col("k").cast("string")).alias("jobName"),
            F.col("k").alias("scaleOut"),
            "avgLat",
            "avgThr",
            (F.col("k") % 2).alias("isBckPres"),
            "startTs",
            "stopTs",
        )
    )
    store.insert_profiles(spark, base)
    store.delete_profiles(spark, 1, "click", is_bck_pres=1)
    return store.select_profiles(spark, [1], "click").unionAll(
        store.select_profiles(spark, [1], "view")
    )


@query(
    "q51_winnow_fingerprints",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    p AS (
      SELECT doc_id, t, unnest(range(1, length(t) - 8 + 2)) AS pos
      FROM d WHERE length(t) >= 11
    ),
    g AS (
      SELECT doc_id, pos,
             (((((((CAST(ord(substr(t, pos, 1)) AS BIGINT)
               * 131 + ord(substr(t, pos + 1, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 2, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 3, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 4, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 5, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 6, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 7, 1))) % 2147483647 AS h
      FROM p
    ),
    w AS (
      SELECT doc_id, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             max(pos) OVER (PARTITION BY doc_id) AS mx
      FROM g
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM w WHERE pos <= mx - 3)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp, bit_xor(fp) AS fp_xor,
           min(fp) AS min_fp
    FROM fps GROUP BY doc_id
    """,
)
def q51_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash document fingerprints (MOSS; the classic
    substring-level near-dup fingerprint for training corpora), k=8 char
    grams, window=4, via :func:`dedup.winnow_fingerprints`. Compacted to
    per-doc (count, xor, min) of the fingerprint set so the oracle compare
    is value-sensitive to every fingerprint without ferrying the full set."""
    d = _t(spark, sf_dir, "documents")
    fps = dedup.winnow_fingerprints(d, k=8, window=4)
    return fps.groupBy(F.col("doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.bit_xor("fp").alias("fp_xor"),
        F.min("fp").alias("min_fp"),
    )


@query(
    "q52_token_counts",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens,
           len(regexp_extract_all(text,
               '''(?:s|d|m|t|ll|ve|re)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens,
           length(text) AS chars
    FROM documents
    """,
)
def q52_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens plus
    the GPT-2-ish pre-tokenizer match count (:func:`text.bpe_token_count`)
    — the standard first-order BPE token estimate. Both are single-pass
    column expressions over the documents scan."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(text.tokens(F.col("text"))).alias("ws_tokens"),
        text.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        F.length("text").alias("chars"),
    )


@query(
    "q53_dedup_components",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings) a
      JOIN (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings) b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (a.nrm * b.nrm) >= 0.45
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(doc, lbl) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc = e.d
    )
    SELECT doc AS doc_id, min(lbl) AS component
    FROM reach GROUP BY doc
    """,
)
def q53_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clusters: embedding near-dup pairs (q41's exact >= 0.45
    cosine) closed into connected components via iterative min-label
    propagation (:func:`dedup.dedup_components`). The oracle computes the
    same components with a recursive reachability CTE, so the iterative
    Spark algorithm is checked end-to-end against a declarative fixpoint."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.all_pairs_cosine(emb, threshold=0.45)
    comp = dedup.dedup_components(pairs, id_col_a="id_a", id_col_b="id_b")
    return comp.select(F.col("doc").alias("doc_id"), "component")


@query(
    "q54_asof_join",
    oracle=f"""
    WITH m AS (
      SELECT event_type, CAST(floor({EPOCH_SQL.format(c='ts')} / 60) AS BIGINT) AS minute,
             round(sum(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, minute, v FROM m WHERE minute % 5 = 0)
    SELECT l.event_type, l.minute, l.v AS minute_sum,
           r.v AS checkpoint_sum_asof
    FROM m l ASOF LEFT JOIN r
      ON l.event_type = r.event_type AND l.minute >= r.minute
    """,
)
def q54_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic backward as-of join (:func:`ts_core.asof_join`, the pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` operator): every per-minute sum
    picks up the most recent 5-minute checkpoint at or before it, per
    event_type. Checked against DuckDB's native ASOF LEFT JOIN — ties
    inclusive, leading rows null. The union-tag plan shuffles once on the
    key; no range cross-product."""
    e = _t(spark, sf_dir, "events")
    m = (
        e.withColumn("minute", F.floor(_epoch() / 60).cast("long"))
        .groupBy("event_type", "minute")
        .agg(F.round(F.sum("value"), 6).alias("minute_sum"))
    )
    r = m.filter(F.col("minute") % 5 == 0).select(
        "event_type", "minute", F.col("minute_sum").alias("checkpoint_sum")
    )
    out = ts_core.asof_join(
        m, r, on="minute", by=["event_type"], value_cols=["checkpoint_sum"]
    )
    return out.select("event_type", "minute", "minute_sum", "checkpoint_sum_asof")


@query(
    "q55_hash_split",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|v1'), 1, 15)) AS BIGINT)
               % 10000 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM b GROUP BY 1
    """,
)
def q55_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (:func:`sampling.hash_split`):
    salted md5 bucket cut, reproducible across runs, partitionings, and
    engines — the 100 TB-safe alternative to rand()/sample() splits. The
    oracle recomputes the identical assignment in DuckDB; aggregated per
    split so the compare is sensitive to every row's label."""
    d = _t(spark, sf_dir, "documents")
    s = sampling.hash_split(d, id_col="doc_id")
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "q56_salted_agg",
    oracle=f"""
    SELECT event_type, round(sum(value), 6) AS sum_value,
           CAST(count(*) AS BIGINT) AS count
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def q56_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (:func:`skew.salted_aggregate`):
    groupBy(key, salt) partials then groupBy(key) combine. The oracle is
    the PLAIN single-phase GROUP BY — proving the salted plan is
    result-identical while its first shuffle spreads each hot key over 32
    reducers (the 100 TB answer to power-law keys when AQE's skew split
    isn't available, e.g. pre-shuffle cardinality explosions)."""
    from phoebe_spark.operators import skew

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = skew.salted_aggregate(e, keys=["event_type"], sum_cols=["value"])
    return out.select(
        "event_type",
        F.round("sum_value", 6).alias("sum_value"),
        F.col("count"),
    )


@query(
    "q57_pii_scrub",
    oracle=r"""
    WITH planted AS (
      SELECT doc_id,
             text || CASE
               WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
               WHEN doc_id % 11 = 0 THEN ' call +1 (415) 555-0100 soon'
               WHEN doc_id % 13 = 0 THEN ' host 192.168.0.1 up'
               ELSE '' END AS text
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
               '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS clean_text,
             len(regexp_extract_all(
               regexp_replace(
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
               '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS n_phones
      FROM planted
    )
    SELECT doc_id, n_emails, n_ips, n_phones, md5(clean_text) AS clean_md5
    FROM scrubbed
    """,
)
def q57_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (:func:`text.scrub_pii`) with deterministically planted
    emails / phone shapes / IPv4 literals so the replacement paths are
    exercised, not just counted as zero. The md5 of the cleaned text makes
    the oracle compare sensitive to every replaced character. Single-pass
    regexp expressions — at 100 TB this runs inside the documents scan."""
    d = _t(spark, sf_dir, "documents")
    suffix = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com now")),
        )
        .when(F.col("doc_id") % 11 == 0, F.lit(" call +1 (415) 555-0100 soon"))
        .when(F.col("doc_id") % 13 == 0, F.lit(" host 192.168.0.1 up"))
        .otherwise(F.lit(""))
    )
    planted = d.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    s = text.scrub_pii(planted)
    return s.select(
        "doc_id", "n_emails", "n_ips", "n_phones", F.md5("clean_text").alias("clean_md5")
    )


@query(
    "q58_decontamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 5
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 4),
                                          i -> array_to_string(t[i:i+4], ' '))) AS grams
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    bench AS (SELECT DISTINCT g FROM post WHERE doc_id < 5),
    hits AS (
      SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM post p JOIN bench b ON p.g = b.g
      WHERE p.doc_id >= 5
      GROUP BY p.doc_id
    )
    SELECT d.doc_id AS doc, coalesce(h.n_contaminated, 0) AS n_contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id >= 5
    """,
)
def q58_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (:func:`dedup.contamination_flags`):
    documents 0-4 stand in as the benchmark set; every other document
    counts its distinct 5-gram overlaps with them. The benchmark shingle
    set broadcasts, so the corpus-side probe is shuffle-free — the plan a
    100 TB decontamination pass needs. (The testdata's planted near-dups
    make real overlaps fire.)"""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 5)
    corpus = d.filter(F.col("doc_id") >= 5)
    return dedup.contamination_flags(corpus, bench, n=5)


@query(
    "q59_media_metadata",
    oracle=r"""
    WITH b AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 5 = 0 THEN '\xFF\xD8\xFF'::BLOB
                   WHEN doc_id % 7 = 0 THEN '\x89PNG'::BLOB
                   WHEN doc_id % 11 = 0 THEN 'RIFF\x00\x00\x00\x00WAVE'::BLOB
                   WHEN doc_id % 13 = 0 THEN 'RIFF\x00\x00\x00\x00AVI '::BLOB
                   ELSE ''::BLOB END) || encode(text) AS content
      FROM documents
    )
    SELECT doc_id,
           CAST(octet_length(content) AS BIGINT) AS n_bytes,
           CASE WHEN substring(hex(content), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
                WHEN substring(hex(content), 1, 8) = '89504E47' THEN 'image/png'
                WHEN substring(hex(content), 1, 8) = '52494646'
                     AND substring(hex(content), 17, 8) = '57415645' THEN 'audio/wav'
                WHEN substring(hex(content), 1, 8) = '52494646'
                     AND substring(hex(content), 17, 8) = '41564920' THEN 'video/avi'
                ELSE 'application/octet-stream' END AS sniffed_mime
    FROM b
    """,
)
def q59_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata pass (:func:`multimodal.attach_media_metadata`):
    opaque binary columns get byte length + magic-byte mime sniffing as
    pure column expressions — no decode. Binary payloads are synthesized
    from the text column with planted JPEG/PNG/RIFF-WAVE/RIFF-AVI magic
    prefixes so every sniff path executes (RIFF alone is ambiguous — the
    container tag at offset 8 decides audio vs video); DuckDB mirrors the
    bytes via encode()+hex prefixes. The real pipeline runs this exact scan shape over media
    blobs before routing to decode stages."""
    from phoebe_spark.operators import multimodal

    d = _t(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(bytes([0xFF, 0xD8, 0xFF])))
        .when(F.col("doc_id") % 7 == 0, F.lit(b"\x89PNG"))
        .when(F.col("doc_id") % 11 == 0, F.lit(b"RIFF\x00\x00\x00\x00WAVE"))
        .when(F.col("doc_id") % 13 == 0, F.lit(b"RIFF\x00\x00\x00\x00AVI "))
        .otherwise(F.lit(b""))
    )
    blobs = d.select(
        "doc_id", F.concat(magic, F.col("text").cast("binary")).alias("content")
    )
    out = multimodal.attach_media_metadata(blobs)
    return out.select("doc_id", "n_bytes", "sniffed_mime")


# ---------------------------------------------------------------------------
# Corpus curation (Gopher/C4-style rules, packing, mixing) + range join
# ---------------------------------------------------------------------------

_WLEN_SQL = f"list_aggregate(list_transform({_TOKS_SQL}, x -> len(x)), 'sum')"


@query(
    "q60_quality_rules",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 17 = 0 THEN ' ## ## ## ## ## ## ## ##'
                          WHEN doc_id % 19 = 0 THEN chr(10) || 'teaser one...' || chr(10) || 'teaser two...'
                          ELSE '' END AS text
      FROM documents
    ),
    base AS (
      SELECT doc_id, text,
             {_TOKS_SQL} AS toks,
             len({_TOKS_SQL}) AS n_words,
             string_split(text, chr(10)) AS lines
      FROM planted WHERE trim(text) <> ''
    ),
    m AS (
      SELECT doc_id, n_words,
             CASE WHEN n_words > 0 THEN CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE) / n_words ELSE 0.0 END AS mwl,
             CASE WHEN n_words > 0 THEN CAST(len(text) - len(replace(text, '#', '')) + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE) / n_words ELSE 0.0 END AS swr,
             CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE) / len(lines) ELSE 0.0 END AS elf,
             CASE WHEN n_words > 0 THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / n_words ELSE 0.0 END AS awf,
             len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to'))) AS swh
      FROM base
    )
    SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len,
           (n_words >= 10 AND n_words <= 100000) AS ok_word_count,
           (mwl >= 3.0 AND mwl <= 10.0) AS ok_mean_word_len,
           (swr <= 0.1) AS ok_symbol_ratio,
           (elf <= 0.3) AS ok_ellipsis_lines,
           (awf >= 0.80) AS ok_alpha_words,
           (swh >= 2) AS ok_stopwords,
           ((n_words >= 10 AND n_words <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
            AND (swr <= 0.1) AND (elf <= 0.3) AND (awf >= 0.80) AND (swh >= 2)) AS passes_quality
    FROM m
    """,
)
def q60_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule filter (:func:`curation.gopher_quality_flags`;
    Rae et al. 2021 §A1.1). Symbol-spam and ellipsis-line suffixes are
    planted on deterministic doc_id slices so the reject paths execute.
    Pure column expressions — the full rule set evaluates inside the
    documents scan with no shuffle, which is the shape a 100 TB quality
    pass needs."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 17 == 0, F.lit(" ## ## ## ## ## ## ## ##"))
        .when(F.col("doc_id") % 19 == 0, F.lit("\nteaser one...\nteaser two..."))
        .otherwise(F.lit(""))
    )
    planted = d.select("doc_id", F.concat(F.col("text"), suffix).alias("text")).filter(
        F.trim("text") != ""
    )
    out = curation.gopher_quality_flags(planted)
    return out.select(
        "doc_id", "n_words", "mean_word_len",
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_ellipsis_lines", "ok_alpha_words", "ok_stopwords", "passes_quality",
    )


@query(
    "q61_repetition_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents WHERE trim(text) <> ''
    ),
    grams AS (
      SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
             unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS gram
      FROM base WHERE len(t) >= 2
    ),
    per_gram AS (
      SELECT doc_id, n_tokens, n_distinct, gram, count(*) AS c
      FROM grams GROUP BY ALL
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_frac,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_gram_frac
    FROM per_gram GROUP BY doc_id, n_tokens, n_distinct
    """,
)
def q61_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (:func:`curation.repetition_stats`):
    duplicate-token fraction and most-frequent-bigram share, the Gopher
    repetition heuristics. Explode + two keyed aggregations on
    (doc, gram) — skew-free shuffle keys, no Python, no collect."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    return curation.repetition_stats(d).filter(F.col("n_tokens") >= 2)


@query(
    "q62_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, CAST(len({_TOKS_SQL}) AS BIGINT) AS token_count
      FROM documents WHERE trim(text) <> ''
    )
    SELECT doc_id, source, token_count,
           CAST(sum(token_count) OVER w - token_count AS BIGINT) AS pack_off,
           CAST(floor(CAST(sum(token_count) OVER w - token_count AS DOUBLE) / 512) AS BIGINT) AS pack_id
    FROM toks
    WINDOW w AS (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q62_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (:func:`curation.pack_sequences`):
    concatenate documents per source in doc_id order and cut at a
    512-token context boundary — one keyed running-sum window per source
    partition, no global sort. This is the deterministic packing layout a
    pretraining dataloader materializes."""
    from phoebe_spark.operators import curation, text

    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select(
        "doc_id", "source", F.size(text.tokens(F.col("text"))).cast("bigint").alias("token_count")
    )
    return curation.pack_sequences(toks, ctx_tokens=512)


@query(
    "q63_mixture_weights",
    oracle="""
    WITH per_src AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_items,
           round(pow(n, 0.5) / sum(pow(n, 0.5)) OVER (), 6) AS weight,
           round(pow(n, 0.5) / sum(pow(n, 0.5)) OVER () * sum(n) OVER () / n, 6) AS rel_epochs
    FROM per_src
    """,
)
def q63_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source-mixture weights (alpha=0.5,
    :func:`curation.mixture_weights`) — the exponent-smoothed sampling
    rule used for multi-source/multilingual pretraining mixes. One
    aggregation to O(sources) rows; the window normalizer runs over that
    tiny frame only."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents")
    return curation.mixture_weights(d, alpha=0.5)


@query(
    "q64_range_join",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, {EPOCH_SQL.format(c="ts")} AS sec
      FROM events
    ),
    err AS (SELECT * FROM ev WHERE event_type = 'error'),
    clk AS (SELECT * FROM ev WHERE event_type = 'click'),
    hits AS (
      SELECT e.event_id, count(*) AS n
      FROM err e JOIN clk c ON c.user_id = e.user_id
       AND c.sec > e.sec AND c.sec <= e.sec + 60
      GROUP BY e.event_id
    )
    SELECT e.event_id, e.user_id, coalesce(h.n, 0) AS n_clicks_60s
    FROM err e LEFT JOIN hits h ON e.event_id = h.event_id
    """,
)
def q64_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via :func:`ts_core.range_join_bucketed`: for every
    error event, count same-user clicks in the following 60 s. The naive
    range join is a cartesian plan; bucketing time to the window span
    turns it into a shuffled equi-join on (user, bucket) with constant
    ~2x left replication — the shape that survives 100 TB of events."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", _epoch("ts").alias("sec")
    )
    err = ev.filter(F.col("event_type") == "error").drop("event_type")
    clk = ev.filter(F.col("event_type") == "click").drop("event_type")
    matched = ts_core.range_join_bucketed(
        err, clk, on="sec", by=["user_id"], lower=0, upper=60
    )
    hits = matched.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        err.join(hits, "event_id", "left")
        .select(
            "event_id", "user_id", F.coalesce(F.col("n"), F.lit(0)).alias("n_clicks_60s")
        )
    )


_STRAT_FRACS = {f"src{i}": (0.8, 0.5, 0.2, 0.05)[i % 4] for i in range(20)}
_STRAT_CASE = " ".join(
    f"WHEN '{k}' THEN {int(round(v * 10000))}" for k, v in _STRAT_FRACS.items()
)


@query(
    "q65_stratified_sample",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|v1'), 1, 15)) AS BIGINT)
            % 10000
          < CASE source {_STRAT_CASE} ELSE 0 END
    """,
)
def q65_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic subsample (:func:`sampling.
    stratified_hash_sample`) — the rebalance-by-source curation step
    (downsample boilerplate-heavy sources, keep rare ones whole). Pure
    codegen CASE over the salted md5 bucket: no shuffle, no RNG state,
    identical under repartitioning — and bit-identical in the oracle."""
    from phoebe_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    out = sampling.stratified_hash_sample(d, _STRAT_FRACS, strata_col="source")
    return out.select("doc_id", "source")


@query(
    "q66_label_centroids",
    oracle="""
    WITH flat AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM embeddings
    )
    SELECT label, dim, round(avg(v), 6) AS centroid
    FROM flat GROUP BY label, dim
    """,
)
def q66_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (:func:`similarity.label_centroids`) in
    long (label, dim, centroid) form — class prototypes for semantic
    dedup summaries / label-conditioned retrieval. posexplode inside the
    scan + one map-side-combining groupBy on the tiny (label, dim) key:
    the shuffle carries O(labels x dims) partials per task, not data."""
    emb = _t(spark, sf_dir, "embeddings")
    c = similarity.label_centroids(emb)
    return c.select("label", "dim", F.round("centroid", 6).alias("centroid"))


@query(
    "q67_boilerplate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' '))) AS grams
      FROM toks
    ),
    posting AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    gdf AS (SELECT g, count(*) AS df_docs FROM posting GROUP BY g),
    tot AS (SELECT count(*) AS n_docs FROM documents),
    per AS (
      SELECT p.doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN gdf.df_docs >= 0.02 * tot.n_docs THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
      FROM posting p JOIN gdf ON gdf.g = p.g CROSS JOIN tot
      GROUP BY p.doc_id
    )
    SELECT d.doc_id AS doc,
           coalesce(per.n_grams, 0) AS n_grams,
           coalesce(per.n_boiler, 0) AS n_boiler,
           round(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0.0
                      ELSE per.n_boiler * 1.0 / per.n_grams END, 6) AS boiler_ratio
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
)
def q67_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate scoring (:func:`curation.
    boilerplate_stats`): a 3-gram in >= 2% of documents is boilerplate
    (site chrome / license headers); each doc is scored by its
    boilerplate-gram fraction. Catches cross-document repetition that
    per-doc :func:`curation.repetition_stats` cannot see."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents")
    out = curation.boilerplate_stats(d, n=3, min_df_frac=0.02)
    return out.select(
        "doc", "n_grams", "n_boiler", F.round("boiler_ratio", 6).alias("boiler_ratio")
    )


@query(
    "q68_semantic_prune",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings) a
      JOIN (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings) b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (a.nrm * b.nrm) >= 0.45
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(doc, lbl) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc = e.d
    ),
    comp AS (SELECT doc, min(lbl) AS component FROM reach GROUP BY doc)
    SELECT e.vec_id, e.label
    FROM embeddings e LEFT JOIN comp c ON c.doc = e.vec_id
    WHERE c.component IS NULL OR c.component = e.vec_id
    """,
)
def q68_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): close the
    >= 0.45 cosine near-dup pairs (q41's exact GEMM) into components
    (q53's min-label propagation) and KEEP one representative per
    cluster (the min id) plus every unclustered row — the actual dedup
    action a curation pipeline applies before training. The components
    frame is only as large as the matched docs; the keep-filter is a
    left join on the corpus id."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.all_pairs_cosine(emb, threshold=0.45)
    comp = dedup.dedup_components(pairs, id_col_a="id_a", id_col_b="id_b")
    return (
        emb.join(comp.withColumnRenamed("doc", "vec_id"), "vec_id", "left")
        .filter(F.col("component").isNull() | (F.col("component") == F.col("vec_id")))
        .select("vec_id", "label")
    )


@query(
    "q69_quantize_embeddings",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS am,
             embedding
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, am,
             CASE WHEN am = 0 THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) / (am / 127)) AS INT)) END AS qvec
      FROM base
    )
    SELECT vec_id, round(am / 127, 6) AS scale,
           CAST(list_sum(qvec) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT) AS q_l1,
           list_min(qvec) AS q_min, list_max(qvec) AS q_max
    FROM q
    """,
)
def q69_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 absmax quantization (:func:`similarity.
    quantize_embeddings`) — the 4x storage/bandwidth compression an ANN
    index applies before sharding billions of vectors. Codes are compacted
    to per-vector (sum, l1, min, max) so the oracle compare is
    value-sensitive to every code without ferrying arrays (q51's
    fingerprint-compaction pattern)."""
    emb = _t(spark, sf_dir, "embeddings")
    qd = similarity.quantize_embeddings(emb)
    qv = F.col("qvec")
    return qd.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)).alias("q_l1"),
        F.array_min(qv).alias("q_min"),
        F.array_max(qv).alias("q_max"),
    )


@query(
    "q70_token_fertility",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws,
             len(regexp_extract_all(text,
                 '''(?:s|d|m|t|ll|ve|re)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe,
             length(text) AS chars
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           round(avg(ws), 6) AS avg_ws_tokens,
           round(avg(bpe), 6) AS avg_bpe_tokens,
           round(sum(chars) * 1.0 / sum(bpe), 6) AS chars_per_bpe
    FROM t GROUP BY lang
    """,
)
def q70_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility rollup by language: average whitespace and
    BPE-ish subword token counts plus chars-per-subword — the
    fertility/compression diagnostic a multilingual pretraining mix is
    balanced on (languages a tokenizer splits inefficiently consume
    context budget). One scan, pure codegen token counting
    (:func:`text.bpe_token_count`), one tiny groupBy(lang)."""
    d = _t(spark, sf_dir, "documents")
    ws = F.size(text.tokens(F.col("text")))
    bpe = text.bpe_token_count(F.col("text"))
    return (
        d.select("lang", ws.alias("ws"), bpe.alias("bpe"), F.length("text").alias("chars"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ws"), 6).alias("avg_ws_tokens"),
            F.round(F.avg("bpe"), 6).alias("avg_bpe_tokens"),
            F.round(F.sum("chars") / F.sum("bpe"), 6).alias("chars_per_bpe"),
        )
    )


@query(
    "q71_event_funnel",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, {EPOCH_SQL.format(c="ts")} AS sec FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (SELECT user_id, min(sec) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.sec) AS t2 FROM ev e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.sec > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.sec) AS t3 FROM ev e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.sec > s2.t2 GROUP BY e.user_id
    )
    SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
)
def q71_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel (path) analysis: users reaching each step of
    view -> click -> purchase with strictly increasing timestamps — the
    sequence-matching operator class (funnel / user-path analytics).

    Spark shape: ONE shuffle on user_id. The dependent step times reduce
    to chained minima — t1 = min view sec, t2 = min click sec > t1,
    t3 = min purchase sec > t2 (with time-sorted events, "first X after
    Y" IS the minimum over the qualifying set) — so the whole funnel is
    one groupBy(user) emitting t1 plus two per-type second arrays, and
    two ``array_min(filter(...))`` expressions. No sort, no self-joins,
    no per-step shuffles — the shape that survives 100 TB of events (the
    oracle uses the textbook three-self-join form, which would be three
    fact-fact shuffles here). An earlier version resolved the steps with
    a 3-slot ``aggregate`` state walk over the sorted event array —
    equivalent output, but the generated code was large enough to cost
    ~3 s of one-time codegen compilation; the min form is a few lines of
    bytecode."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", _epoch("ts").alias("sec"))
    # collect_list skips the when()'s null branch, so each array holds
    # exactly that type's seconds; per-user state stays bounded by the
    # user's event count, as before
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias("t1"),
        F.collect_list(F.when(F.col("event_type") == "click", F.col("sec"))).alias("clicks"),
        F.collect_list(F.when(F.col("event_type") == "purchase", F.col("sec"))).alias("buys"),
    )
    stepped = per_user.withColumn(
        "t2", F.array_min(F.filter("clicks", lambda c: c > F.col("t1")))
    ).withColumn("t3", F.array_min(F.filter("buys", lambda b: b > F.col("t2"))))
    counts = stepped.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    steps = spark.createDataFrame(
        [(1, "view"), (2, "click"), (3, "purchase")], "step INT, event_type STRING"
    )
    return steps.crossJoin(F.broadcast(counts)).select(
        "step",
        "event_type",
        F.when(F.col("step") == 1, F.col("n1"))
        .when(F.col("step") == 2, F.col("n2"))
        .otherwise(F.col("n3"))
        .alias("n_users"),
    )


@query(
    "q72_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term
      FROM documents WHERE trim(text) <> ''
    ),
    lm AS (
      SELECT term, ln(count(*) * 1.0 / (SELECT count(*) FROM toks)) AS logp
      FROM toks GROUP BY term
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-lm.logp), 6) AS avg_neg_logprob
    FROM toks t JOIN lm USING (term)
    GROUP BY t.doc_id
    """,
)
def q72_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM quality scoring
    (:func:`text.unigram_logprob_scores`, Wenzek et al. 2020): per-doc
    mean negative log-probability of its tokens under a corpus-fit
    unigram model — the perplexity-bucket signal pretraining pipelines
    filter on. One map-side-combining groupBy fits the LM; scoring is
    explode -> term join -> per-doc agg (broadcast the LM when it is a
    bounded trained model; self-fit defaults to an AQE-replannable
    equi-join)."""
    d = _t(spark, sf_dir, "documents")
    out = text.unigram_logprob_scores(d)
    return out.select(
        "doc_id", "n_tokens", F.round("avg_neg_logprob", 6).alias("avg_neg_logprob")
    )


@query(
    "q73_bloom_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 5
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 4),
                                          i -> array_to_string(t[i:i+4], ' '))) AS grams
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    bench AS (SELECT DISTINCT g FROM post WHERE doc_id < 5),
    hits AS (
      SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM post p JOIN bench b ON p.g = b.g
      WHERE p.doc_id >= 5
      GROUP BY p.doc_id
    )
    SELECT d.doc_id AS doc, coalesce(h.n_contaminated, 0) AS n_contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id >= 5
    """,
)
def q73_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via Bloom prefilter + exact confirm
    (:func:`dedup.contamination_flags_bloom`): result-identical to q58 —
    the oracle IS the exact-overlap SQL — but the corpus-side probe drops
    non-matching shingles inside the scan stage with pure-codegen bit
    tests against a literal word array, so at 100 TB only ~1% of corpus
    shingles (true hits + Bloom FPs) reach the join. The scale answer for
    eval registries too large to broadcast as strings."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 5)
    corpus = d.filter(F.col("doc_id") >= 5)
    return dedup.contamination_flags_bloom(corpus, bench, n=5)


def _jl_oracle() -> str:
    """DuckDB oracle for q74: replay the IDENTICAL literal Rademacher
    matrix (same seeded generator as :func:`similarity.jl_matrix`) as a
    list-of-lists literal; per (vec, out-dim) dot product, rounded."""
    from phoebe_spark.operators.similarity import jl_matrix

    R = jl_matrix(64, 8, seed=7)
    rows = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in row) + "]" for row in R
    )
    return f"""
    WITH r AS (SELECT [{rows}] AS m)
    SELECT e.vec_id, CAST(d - 1 AS INT) AS dim,
           round(list_sum(list_transform(generate_series(1, len(e.embedding)),
                 i -> CAST(e.embedding[i] AS DOUBLE) * r.m[d][i])), 6) AS value
    FROM embeddings e, r, (SELECT unnest(generate_series(1, 8)) AS d) dims
    """


@query("q74_random_projection", oracle=_jl_oracle())
def q74_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection
    (:func:`similarity.random_projection`, Achlioptas 2003): dim-64
    embeddings to dim-8 via a literal seeded Rademacher matrix — the
    cheap, shuffle-free prep before ANN indexing/clustering at scale.
    Entirely whole-stage codegen (one zip_with+aggregate dot per output
    dim); the oracle replays the identical literal matrix."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.random_projection(emb, out_dim=8, seed=7, in_dim=64)
    return out.select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.round("value", 6).alias("value"),
    )


# ---------------------------------------------------------------------------
# Drift / anomaly detection on the events table (round-3 extensions:
# the statistical monitors a workload-watching engine runs continuously —
# complements the q34 backpressure detector)
# ---------------------------------------------------------------------------

# Shared minutely-mean series, rounded to 6 so both engines agree on the
# detector input before any cumulative arithmetic starts.
_MINUTELY_SQL = f"""
    SELECT event_type,
           CAST(floor({EPOCH_SQL.format(c='ts')} / 60) AS BIGINT) AS minute,
           round(avg(value), 6) AS v
    FROM events GROUP BY 1, 2
"""


def _minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("minute", F.floor(_epoch() / 60).cast("long"))
        .groupBy("event_type", "minute")
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )


@query(
    "q75_cusum_drift",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    p AS (
      SELECT event_type, minute, v,
             sum(v - 60.0) OVER (PARTITION BY event_type ORDER BY minute
                                 ROWS UNBOUNDED PRECEDING) AS p
      FROM m),
    s AS (
      SELECT event_type,
             p - least(0.0, min(p) OVER (PARTITION BY event_type ORDER BY minute
                                         ROWS UNBOUNDED PRECEDING)) AS stat
      FROM p)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN round(stat, 6) > 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
           round(max(stat), 4) AS max_stat
    FROM s GROUP BY event_type
    """,
)
def q75_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection (:func:`ts_anom.cusum`, Page 1954)
    over the minutely workload series — sustained load above the k=60
    slack accumulates into the statistic; h=500 is the alarm line. The
    sequential-looking recursion ``s_i = max(0, s_{i-1} + x_i - k)`` runs
    as its prefix-sum closed form: two cumulative window frames sharing
    one sort, fully distributed across series keys, no recursion and no
    Python. The same pattern the reference's monitoring loop needs for
    regime-change detection (``analytics/app/optimization`` control loop,
    q34's sibling)."""
    m = _minutely(spark, sf_dir)
    st = ts_anom.cusum(m, "event_type", "minute", "v", k=60.0, h=500.0)
    return st.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum((F.round("stat", 6) > 500.0).cast("long")).alias("n_alarms"),
        F.round(F.max("stat"), 4).alias("max_stat"),
    )


@query(
    "q76_autocorr",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    l AS (
      SELECT event_type, v,
             lag(v, 1) OVER (PARTITION BY event_type ORDER BY minute) AS prev
      FROM m)
    SELECT event_type, round(corr(v, prev), 6) AS acf,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM l WHERE prev IS NOT NULL GROUP BY event_type
    """,
)
def q76_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per series (:func:`ts_anom.autocorr`) — the
    ACF value a forecaster checks before fitting AR terms (the reference
    fits auto_arima, whose order selection starts exactly here). One
    shuffle on the series key; ``lag`` + single-pass ``corr`` co-moment
    aggregate, all JVM."""
    m = _minutely(spark, sf_dir)
    a = ts_anom.autocorr(m, "event_type", "minute", "v", lag=1)
    return a.select("event_type", F.round("acf", 6).alias("acf"), "n_pairs")


@query(
    "q77_mad_anomaly",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, med.med, abs(e.value - med.med) AS adev
      FROM events e JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type, round(max(d.med), 6) AS median,
           round(max(mad.mad), 6) AS mad,
           CAST(sum(CASE WHEN abs(d.value - round(d.med, 6))
                              > 3.0 * 1.4826 * round(mad.mad, 6)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           CAST(count(*) AS BIGINT) AS n_points
    FROM dev d JOIN mad USING (event_type) GROUP BY d.event_type
    """,
)
def q77_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census via the Hampel MAD rule
    (:func:`ts_anom.mad_flags`): |x - median| > 3 * 1.4826 * MAD. Two
    grouped exact-percentile passes with the tiny per-key medians
    broadcast back; the rounded threshold ingredients pin the cut line so
    an independent engine reproduces the counts digit-for-digit. At
    100 TB the same operator runs with ``exact=False``
    (``approx_percentile`` sketches, bounded memory per group)."""
    e = _t(spark, sf_dir, "events")
    return ts_anom.mad_flags(e, "event_type", "value", n_sigmas=3.0)


@query(
    "q83_seasonal_naive",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    l AS (
      SELECT event_type, v,
             lag(v, 1) OVER (PARTITION BY event_type ORDER BY minute) AS l1,
             lag(v, 60) OVER (PARTITION BY event_type ORDER BY minute) AS lm
      FROM m)
    SELECT event_type,
           round(CAST(sum(CAST(abs(v - lm) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mae_seasonal,
           round(CAST(sum(CAST(abs(v - l1) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mae_naive,
           round(CAST(sum(CAST(abs(v - lm) AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(abs(v - l1) AS DECIMAL(18,6))) AS DOUBLE), 6) AS ratio,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM l WHERE lm IS NOT NULL GROUP BY event_type
    """,
)
def q83_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE-style seasonality diagnostic
    (:func:`ts_anom.seasonal_naive_ratio`, Hyndman & Koehler 2006):
    seasonal-naive (lag-60) vs one-step-naive MAE over the minutely
    series. ratio < 1 means hourly seasonality is exploitable — the
    go/no-go check before the reference's seasonal ARIMA terms. One
    shuffle, two lag frames sharing one sort."""
    m = _minutely(spark, sf_dir)
    r = ts_anom.seasonal_naive_ratio(m, "event_type", "minute", "v", period=60)
    return r.select(
        "event_type",
        F.round("mae_seasonal", 6).alias("mae_seasonal"),
        F.round("mae_naive", 6).alias("mae_naive"),
        F.round("ratio", 6).alias("ratio"),
        "n_obs",
    )


# ---------------------------------------------------------------------------
# Corpus curation extensions: chunk-level dedup, template-phrase census
# ---------------------------------------------------------------------------


@query(
    "q78_chunk_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE trim(text) <> ''),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / 8.0) AS INT) - 1),
                    c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
      FROM t),
    cnt AS (SELECT chunk, count(*) AS c FROM ch GROUP BY chunk)
    SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           round(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_ratio
    FROM ch JOIN cnt USING (chunk) GROUP BY ch.doc_id
    """,
)
def q78_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact-duplication census
    (:func:`dedup.chunk_dedup_stats`): the RefinedWeb/CCNet
    "repeated lines across documents" signal on 8-word chunks. Chunk
    assembly is exchange-free codegen (transform + slice per row, no
    re-assembly groupBy); only the corpus-wide chunk count and its join
    back shuffle."""
    d = _t(spark, sf_dir, "documents")
    return dedup.chunk_dedup_stats(d, chunk_words=8)


@query(
    "q79_top_ngrams",
    oracle=f"""
    WITH t AS (SELECT {_TOKS_SQL} AS toks FROM documents
               WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3),
    g AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> array_to_string(toks[i : i+2], ' '))) AS gram FROM t)
    SELECT gram, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY gram
    ORDER BY n DESC, gram ASC LIMIT 20
    """,
)
def q79_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 trigram heavy hitters (:func:`text.top_ngrams`)
    with deterministic tie-break — the template-phrase census run before
    writing boilerplate-removal rules. Gram construction is exchange-free
    codegen; the global top-k is TakeOrdered over per-partition partial
    top-k (O(k) to the driver), never a full sort of the gram table."""
    d = _t(spark, sf_dir, "documents")
    return text.top_ngrams(d, n=3, k=20)


# ---------------------------------------------------------------------------
# Relational extensions: argmin-per-group join, CUBE, deciles
# ---------------------------------------------------------------------------


@query(
    "q80_best_supplier",
    oracle="""
    WITH offers AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice / l.l_quantity AS unit_price,
             row_number() OVER (PARTITION BY l.l_partkey
                                ORDER BY l.l_extendedprice / l.l_quantity ASC,
                                         l.l_suppkey ASC, l.l_orderkey ASC,
                                         l.l_linenumber ASC) AS rn
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size < 5)
    SELECT o.l_partkey AS partkey, o.l_suppkey AS suppkey, s.s_name,
           n.n_name AS nation, round(o.unit_price, 6) AS best_unit_price
    FROM offers o JOIN supplier s ON o.l_suppkey = s.s_suppkey
                  JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.rn = 1
    """,
)
def q80_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style cheapest-offer-per-part (argmin per group with a
    total tie-break), sourced from lineitem since the driver schema has
    no partsupp. Filtered part keys broadcast INTO the fact scan (the
    row_number window then runs on the ~8% survivor set, not all of
    lineitem); supplier and nation dims broadcast onto the 1-row-per-part
    result."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") < 5).select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    offers = li.join(_dim(p), li.l_partkey == p.p_partkey).withColumn(
        "unit_price", F.col("l_extendedprice") / F.col("l_quantity")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_price").asc(),
        F.col("l_suppkey").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(_dim(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("unit_price", 6).alias("best_unit_price"),
        )
    )


@query(
    "q81_cube_revenue",
    oracle="""
    SELECT coalesce(n.n_name, 'ALL') AS nation,
           coalesce(CAST(year(o.o_orderdate) AS INT), -1) AS o_year,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (n.n_name, year(o.o_orderdate))
    """,
)
def q81_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all four grouping sets of nation x order-year)
    — the OLAP companion to q49's ROLLUP. Spark expands the cube in one
    pass with partial aggregation per grouping set; dims broadcast onto
    the orders scan. Order-independent money sums via the decimal
    round-trip (q01 contract)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = (
        o.join(_dim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
    )
    return (
        j.cube("n_name", "o_year")
        .agg(
            _dsum2(_dec("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            "revenue",
            "n_orders",
        )
    )


@query(
    "q82_acctbal_deciles",
    oracle="""
    WITH d AS (
      SELECT c_custkey, c_acctbal,
             ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
      FROM customer)
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal,
           round(avg(c_acctbal), 6) AS avg_bal
    FROM d GROUP BY decile
    """,
)
def q82_acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer account-balance deciles via ntile over a total order
    (tie-break on custkey makes bucket boundaries deterministic).
    Runs WITHOUT a global sort: the two-phase bucketed rank
    (layout.global_rank_by_value, buckets = floor(balance) — offsets
    frame bounded by the money RANGE, not the row count) plus exact
    NTILE arithmetic reproduces ntile(10) OVER (ORDER BY ...) bit for
    bit at any scale."""
    from phoebe_spark.operators.layout import exact_ntile_expr, global_rank_by_value

    cst = _t(spark, sf_dir, "customer")
    rk = global_rank_by_value(
        cst, "c_acctbal", "c_custkey", descending=False,
        bucket=F.floor(F.col("c_acctbal")),
    )
    n1 = cst.agg(F.count(F.lit(1)).cast("long").alias("__nn"))
    d = rk.crossJoin(F.broadcast(n1)).withColumn(
        "decile", exact_ntile_expr("r", "__nn", 10).cast("int")
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
    )


# ---------------------------------------------------------------------------
# Data-quality profiling, robust statistics, and dedup-graph curation
# ---------------------------------------------------------------------------


@query(
    "q84_column_profile",
    oracle="""
    SELECT 'event_id' AS col_name, count(*) - count(event_id) AS n_nulls,
           count(DISTINCT event_id) AS n_distinct, count(*) AS n_rows FROM events
    UNION ALL SELECT 'user_id', count(*) - count(user_id), count(DISTINCT user_id), count(*) FROM events
    UNION ALL SELECT 'event_type', count(*) - count(event_type), count(DISTINCT event_type), count(*) FROM events
    UNION ALL SELECT 'value', count(*) - count(value), count(DISTINCT value), count(*) FROM events
    UNION ALL SELECT 'props', count(*) - count(props), count(DISTINCT props), count(*) FROM events
    """,
)
def q84_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-sanity column profile (:func:`curation.column_profile`):
    per-column null and exact-distinct counts in ONE scan — Spark plans
    the multi-distinct with a single EXPAND + shuffle, then `stack`
    unpivots the 1-row aggregate (the oracle's five UNION ALL scans show
    exactly what the one-pass plan saves). ts is excluded by contract:
    DuckDB truncates the parquet's nano timestamps to micros, so its
    distinct count is not comparable."""
    from phoebe_spark.operators.curation import column_profile

    e = _t(spark, sf_dir, "events")
    return column_profile(e, ["event_id", "user_id", "event_type", "value", "props"])


@query(
    "q85_spearman",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    x AS (SELECT minute, v AS vx FROM m WHERE event_type = 'click'),
    y AS (SELECT minute, v AS vy FROM m WHERE event_type = 'view'),
    j AS (SELECT x.minute, vx, vy FROM x JOIN y USING (minute)),
    r AS (SELECT minute, vx, vy,
                 row_number() OVER (ORDER BY vx ASC, minute ASC) AS rnx,
                 row_number() OVER (ORDER BY vy ASC, minute ASC) AS rny
          FROM j),
    a AS (SELECT vx, vy,
                 avg(rnx) OVER (PARTITION BY vx) AS ax,
                 avg(rny) OVER (PARTITION BY vy) AS ay
          FROM r)
    SELECT round(corr(ax, ay), 6) AS spearman, CAST(count(*) AS BIGINT) AS n_obs
    FROM a
    """,
)
def q85_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the click and view minutely
    series (:func:`ts_agg.spearman_xy`), tie-averaged ranks per the
    textbook definition — the monotone-dependence check that is robust to
    the heavy-tailed values Pearson chokes on. Ranks come from
    row_number + per-value avg windows over the small aligned frame."""
    m = _minutely(spark, sf_dir)
    x = m.filter(F.col("event_type") == "click").select("minute", F.col("v").alias("vx"))
    y = m.filter(F.col("event_type") == "view").select("minute", F.col("v").alias("vy"))
    j = x.join(y, "minute")
    out = ts_agg.spearman_xy(j, "vx", "vy", tiebreak="minute")
    return out.select(F.round("spearman", 6).alias("spearman"), "n_obs")


@query(
    "q86_theil_sen",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    s AS (SELECT event_type, minute, v,
                 row_number() OVER (PARTITION BY event_type ORDER BY minute) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM m),
    d AS (SELECT event_type, minute AS t, v
          FROM s WHERE rn % greatest(1, CAST(floor(n / 120.0) AS BIGINT)) = 0),
    p AS (SELECT a.event_type, (b.v - a.v) / (b.t - a.t) AS slope
          FROM d a JOIN d b ON a.event_type = b.event_type AND a.t < b.t)
    SELECT event_type, round(quantile_cont(slope, 0.5), 6) + 0.0 AS ts_slope,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY event_type
    """,
)
def q86_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per series (:func:`ts_agg.theil_sen`):
    median of pairwise slopes, ~29% breakdown point vs OLS q17's 0. The
    series is strided to <=~120 points per key with pure integer math
    (deterministic, engine-portable) so the pair join is bounded at
    ~7k pairs/key however long the series grows."""
    m = _minutely(spark, sf_dir)
    out = ts_agg.theil_sen(m, "event_type", "minute", "v", max_points=120)
    return out.select(
        "event_type",
        (F.round("ts_slope", 6) + F.lit(0.0)).alias("ts_slope"),
        "n_pairs",
    )


@query(
    "q87_zipf_slope",
    oracle=f"""
    WITH toks AS (SELECT unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank FROM c)
    SELECT round(regr_slope(ln(cnt), ln(rank)), 6) + 0.0 AS zipf_slope,
           round(regr_intercept(ln(cnt), ln(rank)), 6) + 0.0 AS zipf_intercept,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM r
    """,
)
def q87_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary
    (:func:`text.zipf_slope`): OLS slope of ln(freq) on ln(rank) —
    natural corpora land near -1, templated/synthetic text drifts away,
    making this a one-number corpus-health check. The shuffle is bounded
    by vocabulary size, not corpus size."""
    d = _t(spark, sf_dir, "documents")
    out = text.zipf_slope(d)
    return out.select(
        (F.round("zipf_slope", 6) + F.lit(0.0)).alias("zipf_slope"),
        (F.round("zipf_intercept", 6) + F.lit(0.0)).alias("zipf_intercept"),
        "n_terms",
    )


@query(
    "q88_keep_best",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE trim(text) <> ''),
    ch AS (
      SELECT DISTINCT doc_id, chunk FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / 8.0) AS INT) - 1),
                      c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
        FROM t)),
    elig AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) BETWEEN 2 AND 100),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ch a JOIN elig USING (chunk) JOIN ch b USING (chunk)
      WHERE a.doc_id < b.doc_id),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(doc, lbl) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc = e.d),
    comp AS (SELECT doc, min(lbl) AS component FROM reach GROUP BY doc),
    j AS (SELECT c.component, c.doc, d.n_chars,
                 row_number() OVER (PARTITION BY c.component
                                    ORDER BY d.n_chars DESC, c.doc ASC) AS rn,
                 count(*) OVER (PARTITION BY c.component) AS nm
          FROM comp c JOIN documents d ON d.doc_id = c.doc)
    SELECT component, doc AS kept_doc, CAST(n_chars AS BIGINT) AS kept_quality,
           CAST(nm AS BIGINT) AS n_members
    FROM j WHERE rn = 1
    """,
)
def q88_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection per dedup cluster: shared-chunk
    near-dup pairs (:func:`dedup.chunk_pairs`, df-capped like the shingle
    index) -> connected components (q53's min-label propagation) -> keep
    the HIGHEST-quality member per cluster
    (:func:`dedup.keep_best_per_component`, quality = n_chars, ties to
    min id). The realistic curation action: SemDeDup q68 keeps an
    arbitrary representative; production pipelines keep the best one.
    The components frame scales with matched docs only."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.chunk_pairs(d, chunk_words=8, max_docs_per_chunk=100)
    comp = dedup.dedup_components(pairs, id_col_a="id_a", id_col_b="id_b")
    return dedup.keep_best_per_component(comp, d, quality_col="n_chars")


# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical BM25, rank fusion, dedup-graph diagnostics
# ---------------------------------------------------------------------------


@query(
    "q89_bm25",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('table', 'row', 'hash') GROUP BY 1, 2),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    sc AS (SELECT tf.doc_id,
                  CAST(round(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                       * tf.tf * (1.2 + 1)
                       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)
                       AS DECIMAL(18,6)) AS c
           FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s)
    SELECT doc_id, CAST(sum(c) AS DOUBLE) AS bm25 FROM sc GROUP BY doc_id
    """,
)
def q89_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical retrieval (:func:`text.bm25_scores`) for the
    literal query {table, row, hash} — the sparse half of hybrid search.
    One tokenize pass feeds doc lengths and tf; df/corpus stats broadcast
    back; per-term contributions sum as DECIMAL(18,6) so scores are
    bit-stable across partitionings and engines."""
    d = _t(spark, sf_dir, "documents")
    return text.bm25_scores(d, terms=("table", "row", "hash"))


@query(
    "q90_rrf_fusion",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    s AS (SELECT e.vec_id,
                 list_sum(list_transform(generate_series(1, len(e.embedding)),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS cosine,
                 sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
                      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
                         * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))))) AS l2
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
    r AS (SELECT vec_id,
                 row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS r_cos,
                 row_number() OVER (ORDER BY l2 ASC, vec_id ASC) AS r_l2
          FROM s)
    SELECT vec_id, round(1.0/(60 + r_cos) + 1.0/(60 + r_l2), 6) AS rrf,
           CAST(r_cos AS BIGINT) AS r_cos, CAST(r_l2 AS BIGINT) AS r_l2
    FROM r ORDER BY rrf DESC, vec_id ASC LIMIT 15
    """,
)
def q90_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (:func:`similarity.rrf_fusion`, Cormack et
    al. 2009): cosine and euclidean rankings against the vec_id=0 query,
    merged as 1/(60+r_cos) + 1/(60+r_l2) — hybrid search's standard
    calibration-free ranker merge. One corpus scan computes both
    distances in codegen; the top-k is TakeOrdered."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.rrf_fusion(emb, query_id=0, top_k=15)


@query(
    "q91_graph_triangles",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE trim(text) <> ''),
    ch AS (
      SELECT DISTINCT doc_id, chunk FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / 8.0) AS INT) - 1),
                      c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
        FROM t)),
    elig AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) BETWEEN 2 AND 100),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ch a JOIN elig USING (chunk) JOIN ch b USING (chunk)
      WHERE a.doc_id < b.doc_id)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
           (SELECT CAST(count(DISTINCT doc) AS BIGINT) FROM
              (SELECT id_a AS doc FROM pairs UNION ALL SELECT id_b FROM pairs)) AS n_nodes
    FROM pairs p1
    JOIN pairs p2 ON p2.id_a = p1.id_b
    JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b
    """,
)
def q91_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-graph density census: triangles / edges / nodes of the
    shared-chunk pair graph (:func:`dedup.chunk_pairs`) — high triangle
    density means clusters are tight duplicate families (safe to collapse
    aggressively); sparse chains mean borderline matches that deserve a
    verify pass. Triangle counting by ordered two-hop join (id_a < id_b
    everywhere, so each triangle counts once); the graph frame is
    localCheckpointed once and reused by all three statistics."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.chunk_pairs(d, chunk_words=8, max_docs_per_chunk=100)
    pairs = pairs.localCheckpoint(eager=True)
    p1 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    p2 = pairs.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    p3 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = p1.join(p2, "b").join(p3, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = (
        pairs.select(F.col("id_a").alias("doc"))
        .unionAll(pairs.select(F.col("id_b").alias("doc")))
        .agg(F.countDistinct("doc").alias("n_nodes"))
    )
    return tri.crossJoin(F.broadcast(edges)).crossJoin(F.broadcast(nodes))


# ---------------------------------------------------------------------------
# Verify-pass dedup, lexical diversity, domain shift
# ---------------------------------------------------------------------------

_CHUNK_PAIRS_SQL = f"""
    t AS (SELECT doc_id, {_TOKS_SQL} AS toks, text FROM documents
          WHERE trim(text) <> ''),
    ch AS (SELECT DISTINCT doc_id, chunk FROM (
       SELECT doc_id,
              unnest(list_transform(generate_series(0, CAST(ceil(len(toks)/8.0) AS INT)-1),
                     c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
       FROM t)),
    elig AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) BETWEEN 2 AND 100),
    pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM ch a JOIN elig USING (chunk) JOIN ch b USING (chunk)
              WHERE a.doc_id < b.doc_id)
"""


@query(
    "q92_edit_verify",
    oracle=f"""
    WITH {_CHUNK_PAIRS_SQL},
    sc AS (SELECT p.id_a, p.id_b,
                  levenshtein(ta.text, tb.text) AS lev,
                  greatest(len(ta.text), len(tb.text)) AS mx
           FROM pairs p JOIN t ta ON ta.doc_id = p.id_a
                        JOIN t tb ON tb.doc_id = p.id_b)
    SELECT id_a, id_b, CAST(lev AS BIGINT) AS lev,
           round(1.0 - lev * 1.0 / mx, 6) AS sim
    FROM sc WHERE round(1.0 - lev * 1.0 / mx, 6) >= 0.6
    """,
)
def q92_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate-then-verify dedup: shared-chunk candidates
    (:func:`dedup.chunk_pairs`) confirmed by exact normalized Levenshtein
    similarity (:func:`dedup.edit_distance_verify`, >= 0.6) — the
    certification stage that turns probabilistic candidate recall into
    exact near-dup pairs. O(len^2) edit distance runs ONLY on candidates,
    so cost scales with matches, never corpus^2."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.chunk_pairs(d, chunk_words=8, max_docs_per_chunk=100)
    return dedup.edit_distance_verify(d, pairs, min_sim=0.6)


@query(
    "q93_token_entropy",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    c AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
    n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
    SELECT c.doc_id,
           CAST(sum(CAST(round(-(c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n), 6)
                    AS DECIMAL(18,6))) AS DOUBLE) AS token_entropy,
           CAST(max(n.n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct
    FROM c JOIN n USING (doc_id) GROUP BY c.doc_id
    """,
)
def q93_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token histogram
    (:func:`text.token_entropy`) — the lexical-diversity quality signal:
    low entropy = templated/repetitive text, implausibly high = random
    garbage. One shuffle on (doc, term); the doc total reuses the same
    key via a window; DECIMAL contribution sums are engine-exact."""
    d = _t(spark, sf_dir, "documents")
    return text.token_entropy(d)


@query(
    "q94_source_kl",
    oracle=f"""
    WITH toks AS (SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    st AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
    sn AS (SELECT source, sum(c) AS n FROM st GROUP BY 1),
    ct AS (SELECT term, sum(c) AS cc FROM st GROUP BY 1),
    cn AS (SELECT sum(cc) AS cnn FROM ct)
    SELECT st.source,
           CAST(sum(CAST(round((st.c * 1.0 / sn.n) * ln((st.c * 1.0 / sn.n)
                    / (ct.cc * 1.0 / cn.cnn)), 6) AS DECIMAL(18,6))) AS DOUBLE) AS kl_vs_corpus,
           CAST(max(sn.n) AS BIGINT) AS n_tokens
    FROM st JOIN sn USING (source) JOIN ct USING (term) CROSS JOIN cn
    GROUP BY st.source
    """,
)
def q94_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift census (:func:`text.source_kl`): KL divergence of
    each source's term distribution from the whole corpus — the
    mixture-health check run on every new data drop (drifting sources
    carry novel content or rot; pairs with q63's mixture weights). Always
    finite (every source term is in the corpus distribution)."""
    d = _t(spark, sf_dir, "documents")
    return text.source_kl(d)


# ---------------------------------------------------------------------------
# Event analytics: retention cohorts, inter-event gaps, weighted sampling
# ---------------------------------------------------------------------------


@query(
    "q95_retention_cohorts",
    oracle=f"""
    WITH d AS (SELECT user_id,
                      CAST(floor({EPOCH_SQL.format(c='ts')} / 86400.0) AS BIGINT) AS day
               FROM events),
    fs AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
    SELECT fs.cohort, d.day - fs.cohort AS day_offset,
           CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
    FROM d JOIN fs USING (user_id)
    GROUP BY 1, 2
    """,
)
def q95_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen day, counted
    as active per day-offset — the standard cohort/retention analysis
    over the events stream. Two keyed shuffles (user first-seen, then
    cohort x offset distinct-count); the per-user cohort frame is
    dimension-sized and AQE broadcasts it back onto the events scan."""
    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.floor(_epoch() / 86400).cast("long")
    )
    fs = e.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        e.join(fs, "user_id")
        .groupBy("cohort", (F.col("day") - F.col("cohort")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "q96_event_gaps",
    oracle=f"""
    WITH es AS (SELECT user_id, event_id, {EPOCH_SQL.format(c='ts')} AS sec FROM events),
    g AS (
      SELECT user_id,
             sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
      FROM es)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap, 0.5), 6) AS median_gap_s,
           round(quantile_cont(gap, 0.95), 6) AS p95_gap_s
    FROM g WHERE gap IS NOT NULL GROUP BY user_id
    """,
)
def q96_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-gap profile per user (median + p95 seconds between
    consecutive events) — the activity-cadence signal behind session-gap
    tuning (q46 uses a fixed threshold; this measures what it should
    be). Ordering is by epoch-SECOND + event_id in both engines so the
    nano-vs-micro timestamp resolution difference cannot reorder ties.
    One shuffle on user_id; lag and both exact percentiles share it."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", _epoch().alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    g = e.withColumn("gap", F.col("sec") - F.lag("sec").over(w)).filter(
        F.col("gap").isNotNull()
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("median_gap_s"),
        F.round(F.expr("percentile(gap, 0.95)"), 6).alias("p95_gap_s"),
    )


@query(
    "q97_weighted_sample",
    oracle="""
    WITH u AS (
      SELECT doc_id, n_chars,
             (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|ws1'), 1, 15)) AS BIGINT) + 1.0)
             / 1152921504606846977.0 AS u
      FROM documents WHERE n_chars > 0),
    k AS (SELECT doc_id, n_chars, ln(u) / n_chars AS key FROM u)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, round(key * 1e6, 6) AS neg_key_ppm
    FROM k ORDER BY key DESC, doc_id ASC LIMIT 20
    """,
)
def q97_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (:func:`sampling.weighted_sample`, Efraimidis-Spirakis 2006) — 20
    docs drawn proportionally to n_chars from content-hash randomness:
    no RNG, so the sample is bit-reproducible across runs, partition
    layouts, and engines (the q55 salted-hash philosophy extended to
    WEIGHTED draws). Top-k is TakeOrdered, never a global sort."""
    d = _t(spark, sf_dir, "documents")
    out = sampling.weighted_sample(d, weight_col="n_chars", k=20)
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        F.round(F.col("_key") * 1e6, 6).alias("neg_key_ppm"),
    )


# ---------------------------------------------------------------------------
# Reporting layer: pivot matrix, trailing actives, calendar heatmap
# ---------------------------------------------------------------------------


@query(
    "q98_pivot_daily",
    oracle=f"""
    WITH d AS (SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 86400.0) AS BIGINT) AS day,
                      event_type
               FROM events)
    SELECT day,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM d GROUP BY day
    """,
)
def q98_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type pivot matrix via Spark's native
    ``groupBy().pivot()`` with an EXPLICIT value list — the explicit list
    matters at scale: without it Spark runs an extra distinct-values job
    and the pivot width becomes data-dependent. One shuffle on day with
    map-side partial counts per (day, type); missing cells filled 0 to
    match the oracle's conditional sums."""
    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.floor(_epoch() / 86400).cast("long")
    )
    types = ["view", "click", "purchase", "signup", "error"]
    return (
        e.groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


@query(
    "q99_trailing_actives",
    oracle=f"""
    WITH du AS (SELECT DISTINCT CAST(floor({EPOCH_SQL.format(c='ts')} / 86400.0) AS BIGINT) AS day,
                       user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du),
    w AS (SELECT d.day, du.user_id
          FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day)
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau FROM w GROUP BY day
    """,
)
def q99_trailing_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day (WAU) — the engagement metric
    distinct counts cannot express as a sliding window, so the standard
    plan is: collapse to distinct (day, user) first (the big shuffle,
    done ONCE), then range-join the tiny day dimension onto it (broadcast
    nested-loop over ~days rows, fine because days is calendar-bounded)
    and distinct-count per window end."""
    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.floor(_epoch() / 86400).cast("long")
    )
    du = e.select("day", "user_id").distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "d0")
    w = days.join(
        du, (F.col("day") >= F.col("d0") - 6) & (F.col("day") <= F.col("d0"))
    )
    return w.groupBy(F.col("d0").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )


@query(
    "q100_calendar_heatmap",
    oracle=f"""
    SELECT CAST((floor({EPOCH_SQL.format(c='ts')} / 86400.0) + 4) % 7 AS BIGINT) AS dow,
           CAST(floor(({EPOCH_SQL.format(c='ts')} % 86400) / 3600.0) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def q100_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour activity heatmap (dow 0 = Sunday: epoch day 0
    was a Thursday, hence the +4 shift) — the 168-cell calendar profile
    behind load-shaping decisions. Pure integer bucketing on the scan,
    one tiny-key shuffle with map-side combine."""
    e = _t(spark, sf_dir, "events").withColumn("es", _epoch())
    return (
        e.select(
            ((F.floor(F.col("es") / 86400) + 4) % 7).cast("long").alias("dow"),
            F.floor((F.col("es") % 86400) / 3600).cast("long").alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@query(
    "q101_curation_pipeline",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, text, {_TOKS_SQL} AS toks, len({_TOKS_SQL}) AS n_words
      FROM documents WHERE trim(text) <> ''),
    quality AS (
      SELECT *, (n_words >= 20) AS ok_quality FROM base),
    fp AS (
      SELECT *, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM quality WHERE ok_quality),
    keep_dup AS (
      SELECT *, (doc_id = min(doc_id) OVER (PARTITION BY fingerprint)) AS is_canonical
      FROM fp),
    grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(toks) - 4),
             i -> array_to_string(toks[i:i+4], ' ')))) AS g
      FROM base WHERE len(toks) >= 5),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5),
    contaminated AS (
      SELECT DISTINCT gr.doc_id FROM grams gr JOIN bench b ON gr.g = b.g
      WHERE gr.doc_id >= 5),
    staged AS (
      SELECT b.source, b.doc_id, b.n_words,
             coalesce(q.ok_quality, FALSE) AS ok_q,
             coalesce(k.is_canonical, FALSE) AS ok_d,
             (c.doc_id IS NULL AND b.doc_id >= 5) AS ok_c
      FROM base b
      LEFT JOIN quality q USING (doc_id)
      LEFT JOIN keep_dup k ON k.doc_id = b.doc_id
      LEFT JOIN contaminated c ON c.doc_id = b.doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_in,
           CAST(sum(CASE WHEN NOT ok_q THEN 1 ELSE 0 END) AS BIGINT) AS drop_quality,
           CAST(sum(CASE WHEN ok_q AND NOT ok_d THEN 1 ELSE 0 END) AS BIGINT) AS drop_dup,
           CAST(sum(CASE WHEN ok_q AND ok_d AND NOT ok_c THEN 1 ELSE 0 END) AS BIGINT) AS drop_contaminated,
           CAST(sum(CASE WHEN ok_q AND ok_d AND ok_c THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           CAST(sum(CASE WHEN ok_q AND ok_d AND ok_c THEN n_words ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM staged GROUP BY source
    """,
)
def q101_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pipeline with a per-source yield report —
    the integration query proving the stages compose: quality gate
    (length floor) -> exact dedup (md5 fingerprint canonical,
    :func:`text.fingerprint` / q08) -> benchmark decontamination
    (5-gram overlap vs the doc_id<5 eval set,
    :func:`dedup.contamination_flags` / q58) -> per-source attrition +
    kept-token accounting (the numbers a data lead actually reviews
    before a training run). Stage flags are computed once each over one
    corpus scan apiece; the report is a single source-keyed aggregate."""
    d = _t(spark, sf_dir, "documents")
    base = (
        d.filter(F.trim("text") != "")
        .withColumn("n_words", F.size(text.tokens(F.col("text"))))
    )
    ok_q = base.withColumn("ok_q", F.col("n_words") >= 20)
    fp = text.fingerprint(ok_q.filter("ok_q"))
    canon = fp.withColumn(
        "ok_d",
        F.col("doc_id")
        == F.min("doc_id").over(Window.partitionBy("fingerprint")),
    ).select("doc_id", "ok_d")
    flags = dedup.contamination_flags(
        base.filter(F.col("doc_id") >= 5), base.filter(F.col("doc_id") < 5), n=5
    )
    contaminated = flags.filter(F.col("n_contaminated") > 0).select(
        F.col("doc").alias("doc_id"), F.lit(True).alias("is_cont")
    )
    staged = (
        ok_q.select("source", "doc_id", "n_words", "ok_q")
        .join(canon, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .withColumn("ok_d", F.coalesce("ok_d", F.lit(False)))
        .withColumn("ok_c", F.col("is_cont").isNull() & (F.col("doc_id") >= 5))
    )
    kept = F.col("ok_q") & F.col("ok_d") & F.col("ok_c")
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum((~F.col("ok_q")).cast("long")).alias("drop_quality"),
        F.sum((F.col("ok_q") & ~F.col("ok_d")).cast("long")).alias("drop_dup"),
        F.sum((F.col("ok_q") & F.col("ok_d") & ~F.col("ok_c")).cast("long")).alias(
            "drop_contaminated"
        ),
        F.sum(kept.cast("long")).alias("docs_kept"),
        F.sum(F.when(kept, F.col("n_words")).otherwise(0)).alias("tokens_kept"),
    )


@query(
    "q102_incremental_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents WHERE trim(text) <> ''),
    hist AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 400),
    batch AS (SELECT * FROM fp WHERE doc_id >= 400),
    flagged AS (
      SELECT b.doc_id, b.source, (h.fingerprint IS NOT NULL) AS dup_of_history,
             (b.doc_id <> min(b.doc_id) OVER (PARTITION BY b.fingerprint)) AS dup_in_batch
      FROM batch b LEFT JOIN hist h USING (fingerprint))
    SELECT source,
           CAST(count(*) AS BIGINT) AS batch_docs,
           CAST(sum(CASE WHEN dup_of_history THEN 1 ELSE 0 END) AS BIGINT) AS dup_vs_history,
           CAST(sum(CASE WHEN NOT dup_of_history AND dup_in_batch THEN 1 ELSE 0 END) AS BIGINT) AS dup_in_batch,
           CAST(sum(CASE WHEN NOT dup_of_history AND NOT dup_in_batch THEN 1 ELSE 0 END) AS BIGINT) AS kept
    FROM flagged GROUP BY source
    """,
)
def q102_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the production daily-drop shape: a new batch
    (doc_id >= 400) deduped against the historical fingerprint set
    (doc_id < 400) AND within itself, reported per source. The history
    side reduces to its distinct fingerprints before the join (at 100 TB
    that fingerprint set is the only state carried between runs — store
    it partitioned by fingerprint prefix and this join is storage-pruned);
    within-batch dups resolve by a min-id window on the batch only."""
    d = _t(spark, sf_dir, "documents")
    fp = text.fingerprint(d.filter(F.trim("text") != ""))
    hist = fp.filter(F.col("doc_id") < 400).select("fingerprint").distinct()
    batch = fp.filter(F.col("doc_id") >= 400)
    flagged = (
        batch.join(
            hist.withColumn("_h", F.lit(True)), "fingerprint", "left"
        )
        .withColumn("dup_of_history", F.col("_h").isNotNull())
        .withColumn(
            "dup_in_batch",
            F.col("doc_id")
            != F.min("doc_id").over(Window.partitionBy("fingerprint")),
        )
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("batch_docs"),
        F.sum(F.col("dup_of_history").cast("long")).alias("dup_vs_history"),
        F.sum((~F.col("dup_of_history") & F.col("dup_in_batch")).cast("long")).alias(
            "dup_in_batch"
        ),
        F.sum((~F.col("dup_of_history") & ~F.col("dup_in_batch")).cast("long")).alias(
            "kept"
        ),
    )


@query(
    "q103_attribution",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, {EPOCH_SQL.format(c='ts')} AS sec, event_id
               FROM events),
    lc AS (
      SELECT user_id, event_type, sec,
             max(CASE WHEN event_type = 'click' THEN sec END)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
      FROM e),
    p AS (SELECT CAST(floor(sec / 86400.0) AS BIGINT) AS day,
                 (last_click IS NOT NULL AND sec - last_click <= 3600) AS attributed
          FROM lc WHERE event_type = 'purchase')
    SELECT day, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
    FROM p GROUP BY day
    """,
)
def q103_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is attributed when the same
    user clicked within the preceding hour — computed with carried-
    forward window state (max of click-times over an UNBOUNDED-to-1-
    PRECEDING frame), NOT an event-table self-join: one user_id shuffle,
    one pass, however many purchases. Tie order pinned to (second,
    event_id) so both engines walk the same sequence."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch().alias("sec"), "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lc = e.withColumn(
        "last_click",
        F.max(F.when(F.col("event_type") == "click", F.col("sec"))).over(w),
    )
    p = lc.filter(F.col("event_type") == "purchase").select(
        F.floor(F.col("sec") / 86400).cast("long").alias("day"),
        (
            F.col("last_click").isNotNull()
            & ((F.col("sec") - F.col("last_click")) <= 3600)
        ).alias("attributed"),
    )
    return p.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("attributed").cast("long")).alias("n_attributed"),
    )


@query(
    "q104_value_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99,
           CAST(count(value) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q104_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantile profile (p25/p50/p75/p95/p99 per series) in ONE
    exact-percentile aggregate (Spark evaluates the whole percentile
    ARRAY from a single per-group buffer — five quantiles cost one
    sort, not five). Extends q28's single p95; at 100 TB swap in
    approx_percentile with the same array form."""
    e = _t(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.95, 0.99))").alias("qs"),
        F.count("value").alias("n"),
    )
    return q.select(
        "event_type",
        *[
            F.round(F.col("qs")[i], 6).alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p95", "p99"])
        ],
        "n",
    )


@query(
    "q105_wow_growth",
    oracle=f"""
    WITH d AS (
      SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 604800.0) AS BIGINT) AS week,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS wk_value
      FROM events GROUP BY 1),
    g AS (SELECT week, wk_value, lag(wk_value) OVER (ORDER BY week) AS prev FROM d)
    SELECT week, wk_value,
           round(CASE WHEN prev > 0 THEN (wk_value - prev) / prev END, 6) AS wow_growth
    FROM g
    """,
)
def q105_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth of total activity — the trend report on top
    of an order-independent decimal weekly rollup (q01 money contract),
    so the growth ratios are bit-stable. The lag window runs over the
    calendar-bounded weekly frame (tiny), not the events."""
    e = _t(spark, sf_dir, "events").withColumn(
        "week", F.floor(_epoch() / 604800).cast("long")
    )
    d = e.groupBy("week").agg(_dsum2(_dec("value")).alias("wk_value"))
    w = Window.orderBy("week")
    g = d.withColumn("prev", F.lag("wk_value").over(w))
    return g.select(
        "week",
        "wk_value",
        F.round(
            F.when(F.col("prev") > 0, (F.col("wk_value") - F.col("prev")) / F.col("prev")),
            6,
        ).alias("wow_growth"),
    )


@query(
    "q106_ship_delay",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           round(sum(date_diff('day', o.o_orderdate, l.l_shipdate)) * 1.0 / count(*), 6) AS avg_ship_delay_days,
           CAST(sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                    THEN 1 ELSE 0 END) AS BIGINT) AS within_30d
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q106_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment SLA by order priority: average order-to-ship delay and
    the 30-day on-time count (TPC-H Q4's business question, answered
    with a fact-fact join instead of EXISTS). Integer day sums are exact
    (BIGINT), so the average is deterministic without decimal help; the
    orders side carries only two columns into the join."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    dd = F.datediff("l_shipdate", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn("dd", dd)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.sum("dd") * 1.0 / F.count(F.lit(1)), 6).alias("avg_ship_delay_days"),
        F.sum((F.col("dd") <= 30).cast("long")).alias("within_30d"),
    )


@query(
    "q107_session_conversion",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, {EPOCH_SQL.format(c='ts')} AS es, event_id
               FROM events),
    marked AS (
      SELECT user_id, event_type, es, event_id,
             CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    sess AS (
      SELECT user_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY es, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    per AS (
      SELECT user_id, sid, count(*) AS ev,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM sess GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(sum(converted) * 1.0 / count(*), 6) AS conversion_rate,
           round(sum(CASE WHEN converted = 1 THEN ev ELSE 0 END) * 1.0
                 / nullif(sum(converted), 0), 6) AS avg_events_converted,
           round(sum(CASE WHEN converted = 0 THEN ev ELSE 0 END) * 1.0
                 / nullif(count(*) - sum(converted), 0), 6) AS avg_events_organic
    FROM per
    """,
)
def q107_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session conversion report on q46's gap sessionization: fraction of
    30-min-gap sessions containing a purchase, plus average session size
    split by outcome. One user_id shuffle feeds the gap lag, the session
    running sum, and the per-session rollup (all same-key); the final
    report is a 1-row aggregate of exact integer sums. Tie order pinned
    to (second, event_id) in both engines."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch().alias("es"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    marked = e.withColumn(
        "new_session",
        F.when(
            F.lag("es").over(w).isNull() | ((F.col("es") - F.lag("es").over(w)) > 1800),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sid", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("ev"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    )
    conv = F.sum("converted")
    n = F.count(F.lit(1))
    return per.agg(
        n.alias("n_sessions"),
        conv.cast("long").alias("n_converted"),
        F.round(conv * 1.0 / n, 6).alias("conversion_rate"),
        F.round(
            F.sum(F.when(F.col("converted") == 1, F.col("ev")).otherwise(0))
            * 1.0
            / F.nullif(conv, F.lit(0)),
            6,
        ).alias("avg_events_converted"),
        F.round(
            F.sum(F.when(F.col("converted") == 0, F.col("ev")).otherwise(0))
            * 1.0
            / F.nullif(n - conv, F.lit(0)),
            6,
        ).alias("avg_events_organic"),
    )


@query(
    "q108_source_dup_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
               WHERE trim(text) <> ''),
    ch AS (SELECT doc_id, source,
                  unnest(list_transform(generate_series(0, CAST(ceil(len(toks)/8.0) AS INT)-1),
                         c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk FROM t),
    cnt AS (SELECT chunk, count(*) AS c FROM ch GROUP BY chunk)
    SELECT ch.source, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           round(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_ratio
    FROM ch JOIN cnt USING (chunk) GROUP BY ch.source
    """,
)
def q108_source_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE duplication pressure: the q78 chunk census aggregated
    to the source level — the ranking a curation team uses to decide
    which feeds get the aggressive dedup treatment. Same exchange-free
    chunk assembly; corpus-wide counts join back on the chunk key."""
    d = _t(spark, sf_dir, "documents")
    return dedup.chunk_dedup_stats(d, group_col="source")


@query(
    "q109_embedding_health",
    oracle="""
    WITH n AS (
      SELECT label, vec_id, len(embedding) AS dim,
             round(sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
      FROM embeddings)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(min(dim) AS BIGINT) AS min_dim, CAST(max(dim) AS BIGINT) AS max_dim,
           round(CAST(sum(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_norm
    FROM n GROUP BY label
    """,
)
def q109_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table health per label: vector counts, zero-norm
    vectors (dead rows an ANN index must not ingest), dimension
    consistency, and mean norm (catches an un-normalized drop before it
    poisons cosine math). Norms are codegen higher-order functions;
    rounded-then-DECIMAL norm sums keep the means engine-exact."""
    emb = _t(spark, sf_dir, "embeddings")
    nrm = F.round(similarity.norm(F.col("embedding")), 6)
    n = emb.select(
        "label",
        F.size("embedding").alias("dim").cast("long").alias("dim"),
        nrm.alias("nrm"),
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum((F.col("nrm") == 0).cast("long")).alias("n_zero"),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
        F.round(
            F.sum(F.col("nrm").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("avg_norm"),
    )

# ---------------------------------------------------------------------------
# Round-3 (cont.): corpus heavy-hitters, RFM, autocorrelation, seasonality,
# discount-band OLAP, bigram PMI collocations
# ---------------------------------------------------------------------------


@query(
    "q110_token_topk",
    oracle=r"""
    WITH t AS (
      SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents WHERE trim(text) <> ''),
    c AS (SELECT lang, tok, count(*) AS n FROM t GROUP BY 1, 2),
    r AS (SELECT lang, tok, n,
                 row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok ASC) AS rank
          FROM c)
    SELECT lang, CAST(rank AS BIGINT) AS rank, tok, CAST(n AS BIGINT) AS n
    FROM r WHERE rank <= 5
    """,
)
def q110_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters: top-5 most frequent tokens per language — the
    vocabulary skew report a tokenizer/mixture design starts from.

    Scale notes: explode + map-side-combined groupBy(lang, tok) is the
    only O(rows) shuffle; the top-k window then runs over DISTINCT
    (lang, tok) counts only (vocabulary-sized, orders of magnitude
    smaller than the corpus), partitioned by lang so no global sort.
    Ties pinned by token ASC in both engines."""
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    tok = d.select("lang", F.explode(text.tokens(F.col("text"))).alias("tok"))
    cnt = tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tok"))
    return (
        cnt.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("lang", "rank", "tok", "n")
    )


@query(
    "q111_rfm_segments",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT max(o_orderdate) FROM orders)) AS rec_days,
             count(*) AS freq,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS mon
      FROM orders GROUP BY o_custkey),
    th AS (
      SELECT quantile_cont(rec_days, [0.25, 0.5, 0.75]) AS rq,
             quantile_cont(freq, [0.25, 0.5, 0.75]) AS fq,
             quantile_cont(mon, [0.25, 0.5, 0.75]) AS mq
      FROM per),
    seg AS (
      SELECT (1 + CAST(rec_days > rq[1] AS INT) + CAST(rec_days > rq[2] AS INT)
                + CAST(rec_days > rq[3] AS INT)) * 100
           + (4 - CAST(freq > fq[1] AS INT) - CAST(freq > fq[2] AS INT)
                - CAST(freq > fq[3] AS INT)) * 10
           + (4 - CAST(mon > mq[1] AS INT) - CAST(mon > mq[2] AS INT)
                - CAST(mon > mq[3] AS INT)) AS segment,
             mon
      FROM per CROSS JOIN th)
    SELECT CAST(segment AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(CAST(mon AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_monetary
    FROM seg GROUP BY segment
    """,
)
def q111_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation with
    VALUE-BASED quartiles: thresholds are the exact interpolated 25/50/75
    percentiles of each metric, and a customer's quartile is how many
    thresholds its value exceeds (recency: lower is better -> quartile 1;
    freq/monetary: higher is better -> quartile 1).

    Scale notes: deliberately NOT NTILE — rank-based NTILE needs a global
    single-partition sort, a scale-killer at 100x. Here the per-customer
    rollup is one shuffle; the 9 thresholds are a 1-row aggregate
    broadcast back (crossJoin of a 1-row frame), so segment assignment is
    pure codegen. Boundary compares are FP-stable across engines even
    though Spark computes (1-g)*a + g*b and DuckDB a + (b-a)*g (ulp-
    different when a != b): each threshold then lies strictly BETWEEN
    its two interpolation endpoints in both engines, and every data
    value is <= a or >= b by rank, so no value can sit inside the ulp
    gap; when a == b both formulas yield exactly a."""
    o = _t(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("maxd"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last"),
            F.count(F.lit(1)).alias("freq"),
            _dsum2(_dec("o_totalprice")).alias("mon"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("maxd", "last").alias("rec_days"),
            "freq",
            "mon",
        )
        # customer-sized rollup feeds thresholds AND segment assignment:
        # materialize once so orders is scanned once, not per consumer
        .localCheckpoint(eager=True)
    )
    th = per.agg(
        F.expr("percentile(rec_days, array(0.25, 0.5, 0.75))").alias("rq"),
        F.expr("percentile(freq, array(0.25, 0.5, 0.75))").alias("fq"),
        F.expr("percentile(mon, array(0.25, 0.5, 0.75))").alias("mq"),
    )
    j = per.crossJoin(F.broadcast(th))

    def _quart(col, th_col, invert):
        gt = sum(
            (F.col(col) > F.element_at(F.col(th_col), i)).cast("int") for i in (1, 2, 3)
        )
        return (4 - gt) if invert else (1 + gt)

    seg = (
        _quart("rec_days", "rq", invert=False) * 100
        + _quart("freq", "fq", invert=True) * 10
        + _quart("mon", "mq", invert=True)
    )
    return (
        j.select(seg.cast("long").alias("segment"), "mon")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum2(_dec("mon")).alias("total_monetary"),
        )
    )


@query(
    "q112_acf",
    oracle=f"""
    WITH b AS (
      SELECT event_type, {EPOCH_SQL.format(c='ts')} // 60 AS bucket, avg(value) AS v
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, v,
             lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
             lag(v, 3) OVER w AS l3, lag(v, 4) OVER w AS l4,
             lag(v, 5) OVER w AS l5
      FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
    lagged AS (
      SELECT event_type, lag, v, lv FROM (
        SELECT event_type, v,
               unnest([1, 2, 3, 4, 5]) AS lag,
               unnest([l1, l2, l3, l4, l5]) AS lv
        FROM l)
      WHERE lv IS NOT NULL)
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           round(corr(v, lv), 6) AS acf, CAST(count(*) AS BIGINT) AS n_pairs
    FROM lagged GROUP BY 1, 2
    """,
)
def q112_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-5) of each event type's minutely
    mean-value series — the stationarity/seasonality diagnostic that
    feeds AR-order selection (the PACF path in models.workload uses the
    same primitive).

    Scale notes: one shuffle to the minutely rollup; ONE window sort per
    event_type computes all 5 lags (Spark reuses the partitionBy/orderBy
    sort across the lag columns), then posexplode fans the (lag, pair)
    rows out without touching the raw events again. corr() is a
    single-pass JVM aggregate."""
    e = _t(spark, sf_dir, "events")
    b = (
        e.select("event_type", (_epoch() / F.lit(60)).cast("long").alias("bucket"), "value")
        .groupBy("event_type", "bucket")
        .agg(F.avg("value").alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    lags = b.select(
        "event_type",
        "v",
        F.array(*[F.lag("v", k).over(w) for k in (1, 2, 3, 4, 5)]).alias("lvs"),
    )
    pairs = lags.select(
        "event_type", "v", F.posexplode("lvs").alias("pos", "lv")
    ).filter(F.col("lv").isNotNull())
    return (
        pairs.groupBy("event_type", (F.col("pos") + 1).cast("long").alias("lag"))
        .agg(
            F.round(F.corr("v", "lv"), 6).alias("acf"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


@query(
    "q113_seasonality",
    oracle=f"""
    WITH e AS (
      SELECT event_type, ({EPOCH_SQL.format(c='ts')} // 3600) % 24 AS hod,
             (({EPOCH_SQL.format(c='ts')} // 86400) + 4) % 7 AS dow, value
      FROM events),
    cell AS (
      SELECT event_type, hod, dow, count(*) AS n, avg(value) AS cell_avg
      FROM e GROUP BY 1, 2, 3),
    base AS (
      SELECT event_type,
             sum(n * cell_avg) / sum(n) AS overall
      FROM cell GROUP BY event_type)
    SELECT cell.event_type, CAST(hod AS BIGINT) AS hod, CAST(dow AS BIGINT) AS dow,
           CAST(n AS BIGINT) AS n, round(cell_avg, 6) AS cell_avg,
           round(cell_avg - overall, 6) AS deviation
    FROM cell JOIN base ON cell.event_type = base.event_type
    """,
)
def q113_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x day-of-week seasonality profile per event type:
    cell mean and its deviation from the type's overall mean — the
    weekly-seasonality fingerprint behind the reference's sinus workload
    modeling (`analytics/app/workload/models.py` fits exactly this shape).

    Scale notes: hod/dow are integer epoch math (no timezone functions —
    portable and codegen); one groupBy to the 24x7xtypes cells, then the
    per-type overall mean is recovered from the CELL rollup (weighted
    mean, no second scan of raw events) and joined back broadcast-size.
    Overall mean is computed as sum(n*avg)/sum(n) in BOTH engines so the
    FP summation shape matches."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        ((_epoch() / F.lit(3600)).cast("long") % 24).alias("hod"),
        ((((_epoch() / F.lit(86400)).cast("long")) + 4) % 7).alias("dow"),
        "value",
    )
    cell = e.groupBy("event_type", "hod", "dow").agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("cell_avg")
    ).localCheckpoint(eager=True)  # 24x7xtypes rows; feeds base + the join
    base = cell.groupBy("event_type").agg(
        (F.sum(F.col("n") * F.col("cell_avg")) / F.sum("n")).alias("overall")
    )
    return cell.join(F.broadcast(base), "event_type").select(
        "event_type",
        F.col("hod").cast("long").alias("hod"),
        F.col("dow").cast("long").alias("dow"),
        F.col("n").cast("long").alias("n"),
        F.round("cell_avg", 6).alias("cell_avg"),
        F.round(F.col("cell_avg") - F.col("overall"), 6).alias("deviation"),
    )


@query(
    "q114_discount_bands",
    oracle="""
    SELECT CAST(round(l_discount * 100) AS BIGINT) AS band_pct,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS discount_given,
           round(avg(l_quantity), 6) AS avg_qty
    FROM lineitem GROUP BY band_pct
    """,
)
def q114_discount_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band pricing report: items, net revenue, total discount
    given away, and mean quantity per integer discount percentage band.

    Scale notes: single scan, two-column ReadSchema, map-side-combined
    groupBy on a ~12-value key; money sums go through DECIMAL(18,4) so
    partial-aggregation order cannot move the result."""
    li = _t(spark, sf_dir, "lineitem")
    band = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.groupBy(band.alias("band_pct"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum2(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))).alias("revenue"),
            _dsum2(_dec("l_extendedprice") * _dec("l_discount")).alias("discount_given"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
    )


@query(
    "q115_bigram_pmi",
    oracle=r"""
    WITH t AS (
      SELECT regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''),
    uni AS (
      SELECT unnest(toks) AS tok FROM t),
    ucnt AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
    bi AS (
      SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM t WHERE len(toks) >= 2),
    bcnt AS (SELECT bg, count(*) AS c_ab FROM bi GROUP BY bg),
    tot AS (SELECT (SELECT count(*) FROM uni) AS n_uni,
                   (SELECT count(*) FROM bi) AS n_bi),
    pmi AS (
      SELECT bg, c_ab,
             round(ln(c_ab) + ln(n_uni) + ln(n_uni) - ln(n_bi)
                   - ln(ua.c) - ln(ub.c), 6) AS pmi
      FROM bcnt CROSS JOIN tot
      JOIN ucnt ua ON ua.tok = split_part(bg, ' ', 1)
      JOIN ucnt ub ON ub.tok = split_part(bg, ' ', 2)
      WHERE c_ab >= 20)
    SELECT bg, CAST(c_ab AS BIGINT) AS c_ab, pmi FROM (
      SELECT bg, c_ab, pmi,
             row_number() OVER (ORDER BY pmi DESC, bg ASC) AS rn FROM pmi)
    WHERE rn <= 20
    """,
)
def q115_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by pointwise mutual information
    (min count 20) — the collocation mining step behind phrase-aware
    tokenizer vocab construction (word2vec-style phrase detection,
    Mikolov et al. 2013, public).

    Scale notes: ONE corpus pass — unigrams and bigrams explode
    together as a tagged gram stream (bigrams built by zip_with inside
    the token array: codegen, no self-join) into ONE map-side-combined
    groupBy; the resulting vocabulary-sized count frame is materialized
    once and serves the unigram side, the bigram side, AND the totals
    (sums over the counts), so the corpus is never re-scanned. The PMI
    join is vocabulary-sized, ln() terms are ordered identically in both
    engines so the rounded doubles match bit-for-bit, and the final
    top-20 window runs over the >=20-count survivors only (tiny). At
    100x, the count frames stay vocabulary-bounded; nothing is
    corpus-quadratic."""
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    t = d.select(text.tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("toks", 1, n - 1),
            F.slice("toks", 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tagged = t.select(
        F.explode(
            F.concat(
                F.transform("toks", lambda x: F.struct(F.lit(0).alias("k"), x.alias("g"))),
                F.transform(bigrams, lambda x: F.struct(F.lit(1).alias("k"), x.alias("g"))),
            )
        ).alias("e")
    ).select(F.col("e.k").alias("k"), F.col("e.g").alias("g"))
    cnt = (
        tagged.groupBy("k", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # vocabulary-sized; feeds 3 consumers
    )
    ucnt = cnt.filter(F.col("k") == 0).select(F.col("g").alias("tok"), "c")
    bcnt = cnt.filter(F.col("k") == 1).select(F.col("g").alias("bg"), F.col("c").alias("c_ab"))
    tot = cnt.groupBy().agg(
        F.sum(F.when(F.col("k") == 0, F.col("c"))).alias("n_uni"),
        F.sum(F.when(F.col("k") == 1, F.col("c"))).alias("n_bi"),
    )
    ua = ucnt.select(F.col("tok").alias("_ta"), F.col("c").alias("ca"))
    ub = ucnt.select(F.col("tok").alias("_tb"), F.col("c").alias("cb"))
    pmi_col = F.round(
        F.log("c_ab") + F.log("n_uni") + F.log("n_uni") - F.log("n_bi")
        - F.log("ca") - F.log("cb"),
        6,
    )
    pmi = (
        bcnt.filter(F.col("c_ab") >= 20)
        .crossJoin(F.broadcast(tot))
        .withColumn("_ta", F.split("bg", " ").getItem(0))
        .withColumn("_tb", F.split("bg", " ").getItem(1))
        .join(_dim(ua), "_ta")
        .join(_dim(ub), "_tb")
        .select("bg", "c_ab", pmi_col.alias("pmi"))
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("bg"))
    return (
        pmi.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("bg", "c_ab", "pmi")
    )


@query(
    "q116_cardinality_gate",
    oracle=r"""
    WITH t AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents WHERE trim(text) <> '')
    SELECT source,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_exact,
           TRUE AS sketch_within_5pct
    FROM t GROUP BY source
    """,
)
def q116_cardinality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token cardinality per source, with an HLL sketch
    acceptance gate: the q35-style boolean-oracle pattern for
    approximate operators — the oracle asserts the exact count and that
    Spark's approx_count_distinct (rsd=0.02) landed within 5% of it.

    Scale notes: this is the sketch the 100 TB path actually uses —
    approx_count_distinct is a fixed-size HLL merged map-side (O(1)
    state per group), while exact COUNT(DISTINCT) expands to an EXPAND +
    two-level aggregate. Running both here certifies the sketch against
    the exact answer on the same scan."""
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    t = d.select("source", F.explode(text.tokens(F.col("text"))).alias("tok"))
    return t.groupBy("source").agg(
        F.count_distinct("tok").alias("n_exact"),
        F.approx_count_distinct("tok", rsd=0.02).alias("_approx"),
    ).select(
        "source",
        "n_exact",
        (
            F.abs(F.col("_approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("sketch_within_5pct"),
    )


@query(
    "q117_quantile_gate",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50_exact,
           round(quantile_cont(value, 0.9), 6) AS p90_exact,
           TRUE AS sketch_rank_ok
    FROM events GROUP BY event_type
    """,
)
def q117_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 of event values per type, plus an acceptance gate
    for the approximate-quantile sketch: the rank of
    approx_percentile's answer must sit within +-2 percentage points of
    the target rank (the sketch's own accuracy contract, checked
    against the data rather than trusted).

    Scale notes: exact `percentile` needs the full value multiset per
    group (fine per-type; the 100 TB path uses the sketch); the gate
    re-ranks the sketch output with one extra aggregate over the same
    scan, both map-side combined. The boolean-oracle pattern makes a
    non-reproducible sketch driver-checkable (precedent: q35/q116)."""
    e = _t(spark, sf_dir, "events").select("event_type", "value")
    agg = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("_p50"),
        F.expr("percentile(value, 0.9)").alias("_p90"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("_a50"),
        F.expr("approx_percentile(value, 0.9, 10000)").alias("_a90"),
    )
    ranked = (
        e.join(F.broadcast(agg), "event_type")
        .groupBy("event_type")
        .agg(
            F.avg((F.col("value") <= F.col("_a50")).cast("double")).alias("_r50"),
            F.avg((F.col("value") <= F.col("_a90")).cast("double")).alias("_r90"),
            F.first("_p50").alias("_p50"),
            F.first("_p90").alias("_p90"),
        )
    )
    return ranked.select(
        "event_type",
        F.round("_p50", 6).alias("p50_exact"),
        F.round("_p90", 6).alias("p90_exact"),
        (
            (F.abs(F.col("_r50") - 0.5) <= 0.02) & (F.abs(F.col("_r90") - 0.9) <= 0.02)
        ).alias("sketch_rank_ok"),
    )


@query(
    "q118_dup_pagerank",
    oracle=f"""
    WITH {_CHUNK_PAIRS_SQL},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg),
    p0 AS (SELECT src AS node, 1.0 / n AS pr FROM deg CROSS JOIN nn),
    p1 AS (SELECT e.dst AS node, 0.15 / max(nn.n) + 0.85 * sum(p0.pr / deg.d) AS pr
           FROM edges e JOIN p0 ON p0.node = e.src JOIN deg ON deg.src = e.src
           CROSS JOIN nn GROUP BY e.dst),
    p2 AS (SELECT e.dst AS node, 0.15 / max(nn.n) + 0.85 * sum(p1.pr / deg.d) AS pr
           FROM edges e JOIN p1 ON p1.node = e.src JOIN deg ON deg.src = e.src
           CROSS JOIN nn GROUP BY e.dst),
    p3 AS (SELECT e.dst AS node, 0.15 / max(nn.n) + 0.85 * sum(p2.pr / deg.d) AS pr
           FROM edges e JOIN p2 ON p2.node = e.src JOIN deg ON deg.src = e.src
           CROSS JOIN nn GROUP BY e.dst)
    SELECT node AS doc_id, round(pr, 6) AS pagerank FROM p3
    """,
)
def q118_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, d=0.85) over the undirected
    chunk-sharing near-dup graph: high-rank documents are template/
    boilerplate HUBS — the docs whose removal collapses the most
    duplication (a centrality-guided curation target the plain component
    view cannot rank).

    Scale notes: the classic iterative join-agg pattern — each iteration
    is ONE shuffle join (rank frame x edges on src, rank/deg weighted)
    plus ONE groupBy(dst) sum, exactly the GraphX/Pregel dataflow
    expressed relationally. Iteration count is FIXED (3), so the lineage
    stays bounded without checkpointing; the edge and degree frames are
    reused across iterations (cached by reference in one job). Every
    node in the pair graph has degree >= 1 so no dangling-mass term is
    needed."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.chunk_pairs(d, chunk_words=8, max_docs_per_chunk=100)
    edges = pairs.selectExpr("id_a AS src", "id_b AS dst").unionAll(
        pairs.selectExpr("id_b AS src", "id_a AS dst")
    )
    # The edge list enters every iteration's lineage: checkpoint it once
    # so the chunk-pair generator runs once, not once per iteration (the
    # q53 components pattern).
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).localCheckpoint(eager=True)
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    pr = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(3):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .join(deg, "src")
            .select("dst", (F.col("pr") / F.col("d")).alias("c"))
        )
        pr = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("node"),
                (F.lit(0.15) / F.col("n") + F.lit(0.85) * F.col("s")).alias("pr"),
            )
        )
    return pr.select(F.col("node").alias("doc_id"), F.round("pr", 6).alias("pagerank"))


@query(
    "q119_multires_rollup",
    oracle=f"""
    WITH e AS (
      SELECT event_type, {EPOCH_SQL.format(c='ts')} // 60 AS m,
             {EPOCH_SQL.format(c='ts')} // 3600 AS h,
             {EPOCH_SQL.format(c='ts')} // 86400 AS d, value
      FROM events)
    SELECT event_type,
           CASE WHEN grouping(m) = 0 THEN 'minute'
                WHEN grouping(h) = 0 THEN 'hour' ELSE 'day' END AS resolution,
           coalesce(m, h, d) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(round(sum(CAST(value AS DECIMAL(28,10))), 6) AS DOUBLE) / count(*), 6) AS avg_value
    FROM e
    GROUP BY GROUPING SETS ((event_type, m), (event_type, h), (event_type, d))
    """,
)
def q119_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: minute/hour/day rollups of
    each event type materialized in ONE pass via GROUPING SETS — the
    multi-resolution downsampling a time-series store keeps hot
    (TimescaleDB continuous aggregates; the reference's TimeSeries
    binning A9 generalized to a resolution hierarchy).

    Scale notes: GROUPING SETS plans as a single scan + EXPAND(3) +
    map-side-combined aggregate — one shuffle for all three resolutions
    vs three scans for three separate groupBys; grouping() flags
    recover which set each output row came from. Buckets are integer
    epoch divisions (codegen, TZ-free)."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        (_epoch() / F.lit(60)).cast("long").alias("m"),
        (_epoch() / F.lit(3600)).cast("long").alias("h"),
        (_epoch() / F.lit(86400)).cast("long").alias("d"),
        "value",
    )
    g = e.groupingSets(
        [["event_type", "m"], ["event_type", "h"], ["event_type", "d"]],
        "event_type", "m", "h", "d",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # decimal sum -> round -> double -> divide: order-independent and
        # engine-exact (q01 money policy) — plain double avg() diverged
        # from the oracle in the 6th decimal on one 32-row group at sf0.1
        F.round(
            F.round(F.sum(F.col("value").cast("decimal(28,10)")), 6).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
        F.grouping("m").alias("_gm"),
        F.grouping("h").alias("_gh"),
    )
    return g.select(
        "event_type",
        F.when(F.col("_gm") == 0, "minute")
        .when(F.col("_gh") == 0, "hour")
        .otherwise("day")
        .alias("resolution"),
        F.coalesce("m", "h", "d").alias("bucket"),
        "n",
        "avg_value",
    )


@query(
    "q120_cluster_purity",
    oracle=f"""
    WITH RECURSIVE {_CHUNK_PAIRS_SQL},
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(doc, lbl) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc = e.d),
    comp AS (SELECT doc, min(lbl) AS component FROM reach GROUP BY doc),
    j AS (SELECT comp.component, dd.source
          FROM comp JOIN documents dd ON dd.doc_id = comp.doc)
    SELECT component, CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           (count(DISTINCT source) > 1) AS cross_source
    FROM j GROUP BY component
    """,
)
def q120_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source purity of each near-dup cluster: member count, distinct
    feeds, and a cross-source flag — the contamination view that tells a
    curation team whether duplication is WITHIN a feed (crawl artifact,
    fix the feed) or ACROSS feeds (syndication, needs corpus-level
    dedup). Components come from the same iterative min-label
    propagation as q53, checked here against the recursive-CTE fixpoint
    on the chunk-pair graph; the source join is components-sized, the
    rollup per-component."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.chunk_pairs(d, chunk_words=8, max_docs_per_chunk=100)
    comp = dedup.dedup_components(pairs, id_col_a="id_a", id_col_b="id_b")
    j = comp.join(d.select(F.col("doc_id").alias("doc"), "source"), "doc")
    return j.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.count_distinct("source").alias("n_sources"),
        (F.count_distinct("source") > 1).alias("cross_source"),
    )


@query(
    "q121_minhash_calibration",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' '))) AS grams
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    hp AS (
      SELECT doc_id,
             {_MD5H_SQL.format(x='g')} % 2147483647 AS h1,
             CAST(('0x' || substring(md5(g), 17, 15)) AS BIGINT) % 2147483646 + 1 AS h2
      FROM post
    ),
    mh AS (
      SELECT doc_id, i, min((h1 + i * h2) % 2147483647) AS h
      FROM hp CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i) seeds
      GROUP BY doc_id, i
    ),
    sig AS (SELECT doc_id, list(h ORDER BY i) AS s FROM mh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, s, b,
             array_to_string(list_transform(s[b*4+1:b*4+4], x -> CAST(x AS VARCHAR)), ',') AS bucket
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) bands
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
      FROM banded a JOIN banded b ON a.b = b.b AND a.bucket = b.bucket
                                 AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT cand.doc_a, cand.doc_b,
             list_sum(list_transform(generate_series(1, 32),
                   k -> CASE WHEN sa[k] = sb[k] THEN 1 ELSE 0 END)) / 32.0 AS est,
             len(list_intersect(ga.grams, gb.grams)) * 1.0
               / (len(ga.grams) + len(gb.grams)
                  - len(list_intersect(ga.grams, gb.grams))) AS tru
      FROM cand JOIN sh ga ON ga.doc_id = cand.doc_a
                JOIN sh gb ON gb.doc_id = cand.doc_b
    )
    SELECT CAST(floor(est * 10) AS BIGINT) AS est_decile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(est), 6) AS avg_est,
           round(avg(tru), 6) AS avg_true,
           round(avg(abs(est - tru)), 6) AS mae
    FROM scored GROUP BY est_decile
    """,
)
def q121_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration report: on every LSH candidate pair, the
    32-hash signature ESTIMATE of Jaccard vs the TRUE shingle-set
    Jaccard, binned by estimate decile with mean absolute error — the
    certification that tells you whether the sketch's band/row config is
    honest enough to act on (the q116/q117 gate idea applied pairwise).

    Scale notes: truth is only ever computed on the CANDIDATE set (LSH
    output), never all pairs; the gram arrays join back by doc id
    (broadcast-able), and intersections are array_intersect on
    already-distinct arrays. est = k/32 is exact binary, so the decile
    binning cannot straddle engines. The corpus is tokenized + shingled
    exactly ONCE: the posting pass is materialized and feeds both the
    minhash signatures (via ``postings=``) and the true-Jaccard gram sets
    (collect_set over the same frame) — previously three full
    scan+shingle subtrees (signatures + both gram-join sides)."""
    d = _t(spark, sf_dir, "documents")
    post = dedup.shingle_postings(d, "doc_id", "text", 3, distinct=False).localCheckpoint(
        eager=True
    )
    pairs = dedup.minhash_lsh_pairs(
        d, num_hashes=32, bands=8, shingle_n=3, hash_fn="md5", postings=post
    )
    grams = (
        post.groupBy("doc")
        .agg(F.collect_set("shingle").alias("grams"))
        .localCheckpoint(eager=True)
    )
    ga = grams.select(F.col("doc").alias("doc_a"), F.col("grams").alias("_ga"))
    gb = grams.select(F.col("doc").alias("doc_b"), F.col("grams").alias("_gb"))
    inter = F.size(F.array_intersect("_ga", "_gb"))
    tru = inter * 1.0 / (F.size("_ga") + F.size("_gb") - inter)
    scored = (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select("doc_a", "doc_b", F.col("est_jaccard").alias("est"), tru.alias("tru"))
    )
    return scored.groupBy(
        F.floor(F.col("est") * 10).cast("long").alias("est_decile")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("est"), 6).alias("avg_est"),
        F.round(F.avg("tru"), 6).alias("avg_true"),
        F.round(F.avg(F.abs(F.col("est") - F.col("tru"))), 6).alias("mae"),
    )


@query(
    "q122_source_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
               WHERE trim(text) <> ''),
    ch AS (SELECT DISTINCT source, chunk FROM (
       SELECT source,
              unnest(list_transform(generate_series(0, CAST(ceil(len(toks)/8.0) AS INT)-1),
                     c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
       FROM t)),
    per AS (SELECT source, count(*) AS c FROM ch GROUP BY source),
    inter AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS i
              FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.source < b.source
              GROUP BY 1, 2)
    SELECT source_a, source_b, CAST(i AS BIGINT) AS n_shared,
           round(i * 1.0 / (pa.c + pb.c - i), 6) AS jaccard
    FROM inter JOIN per pa ON pa.source = inter.source_a
               JOIN per pb ON pb.source = inter.source_b
    """,
)
def q122_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content overlap between sources: Jaccard of each feed
    pair's distinct 8-word-chunk sets — the syndication matrix that
    tells a mixture designer which feeds are near-copies of each other
    (and should not be double-weighted).

    Scale notes: ONE distinct (source, chunk) projection feeds both the
    per-source sizes and the intersection self-join; the join key is the
    chunk, so pair expansion per chunk is bounded by the (small) number
    of sources carrying it, never by document count. Only pairs sharing
    at least one chunk appear (identical in both engines)."""
    d = _t(spark, sf_dir, "documents")
    ch = (
        dedup.doc_chunks(d, "doc_id", "text", 8)
        .join(d.select(F.col("doc_id").alias("doc"), "source"), "doc")
        .select("source", "chunk")
        .distinct()
        # three consumers (sizes + both self-join sides): materialize the
        # distinct projection once instead of re-scanning the corpus 3x
        .localCheckpoint(eager=True)
    )
    per = ch.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    a = ch.select(F.col("source").alias("source_a"), "chunk")
    b = ch.select(F.col("source").alias("source_b"), "chunk")
    inter = (
        a.join(b, "chunk")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    pa = per.select(F.col("source").alias("source_a"), F.col("c").alias("ca"))
    pb = per.select(F.col("source").alias("source_b"), F.col("c").alias("cb"))
    return (
        inter.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("i").alias("n_shared"),
            F.round(F.col("i") / (F.col("ca") + F.col("cb") - F.col("i")), 6).alias(
                "jaccard"
            ),
        )
    )


@query(
    "q123_dedup_yield_curve",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 5
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 4),
                                          i -> array_to_string(t[i:i+4], ' '))) AS grams
      FROM toks
    ),
    posting AS (SELECT doc_id, len(grams) AS sz, unnest(grams) AS g FROM sh),
    capped AS (
      SELECT * FROM (
        SELECT p.*, count(*) OVER (PARTITION BY g) AS df FROM posting p
      ) WHERE df <= 1000
    ),
    pr AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS size_a, b.sz AS size_b,
             count(*) AS inter
      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ),
    jac AS (
      SELECT doc_a, doc_b, inter * 1.0 / (size_a + size_b - inter) AS j
      FROM pr WHERE inter * 1.0 / (size_a + size_b - inter) >= 0.2
    ),
    sweep AS (
      SELECT th, doc_a, doc_b FROM jac
      CROSS JOIN (SELECT CAST(unnest([0.2, 0.35, 0.5, 0.65, 0.8]) AS DOUBLE) AS th)
      WHERE j >= th
    ),
    docs AS (
      SELECT th, doc FROM (
        SELECT th, doc_a AS doc FROM sweep
        UNION ALL SELECT th, doc_b FROM sweep)
    )
    SELECT th AS threshold,
           CAST((SELECT count(*) FROM sweep s WHERE s.th = d.th) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT doc) AS BIGINT) AS n_docs_touched
    FROM docs d GROUP BY th
    """,
)
def q123_dedup_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup aggressiveness sweep: how many near-dup pairs and touched
    documents survive each Jaccard threshold in {0.2..0.8} — the yield
    curve that picks the operating point BEFORE running the expensive
    full dedup at one threshold.

    Scale notes: the pair set (q13's posting-index output) is computed
    ONCE at the loosest threshold and the five-point sweep is a literal
    explode over it — five thresholds cost one extra narrow stage, not
    five pair-generation runs. Pair and touched-doc counts both roll up
    per threshold with map-side combine."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, n=5, threshold=0.2, max_shingle_freq=1000)
    sweep = (
        pairs.select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.explode(F.array(*[F.lit(t) for t in (0.2, 0.35, 0.5, 0.65, 0.8)])).alias(
                "th"
            ),
        )
        .filter(F.col("jaccard") >= F.col("th"))
    )
    return (
        sweep.select("th", F.explode(F.array("doc_a", "doc_b")).alias("doc"))
        .groupBy("th")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_pairs"),
            F.count_distinct("doc").alias("n_docs_touched"),
        )
        .select(F.col("th").alias("threshold"), "n_pairs", "n_docs_touched")
    )


@query(
    "q124_sole_late_supplier",
    oracle="""
    WITH j AS (
      SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    per AS (
      SELECT ok,
             count(DISTINCT sk) AS n_supp,
             count(DISTINCT CASE WHEN late THEN sk END) AS n_late,
             max(CASE WHEN late THEN sk END) AS late_supp
      FROM j GROUP BY ok)
    SELECT late_supp AS l_suppkey, CAST(count(*) AS BIGINT) AS numwait
    FROM per WHERE n_supp >= 2 AND n_late = 1
    GROUP BY late_supp
    """,
)
def q124_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's business question on this schema: suppliers who were
    the ONLY late shipper (ship > order date + 60d) on multi-supplier
    orders — the classic blame report.

    Scale notes: the textbook form is lineitem EXISTS lineitem / NOT
    EXISTS lineitem — two extra fact-fact self-joins. Here the whole
    predicate collapses into ONE groupBy(orderkey) (distinct suppliers,
    distinct late suppliers, the argmax late supplier), so the plan is
    one fact-fact equi-join + one aggregation; the oracle uses the same
    rollup, and n_late = 1 makes max() over late suppliers exact."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("sk"),
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    per = j.groupBy("ok").agg(
        F.count_distinct("sk").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("sk"))).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("sk"))).alias("late_supp"),
    )
    return (
        per.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy(F.col("late_supp").alias("l_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q125_supplier_share",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_suppkey),
    tot AS (SELECT CAST(round(sum(CAST(revenue AS DECIMAL(18,4))), 2) AS DOUBLE) AS t,
                   CAST(count(*) AS BIGINT) AS ns FROM rev)
    SELECT l_suppkey, revenue, round(revenue / t, 6) AS share
    FROM rev CROSS JOIN tot
    WHERE revenue > 1.05 * t / ns
    """,
)
def q125_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape: suppliers whose revenue exceeds 1.05x the fair
    per-supplier share of the corpus total — the
    HAVING-against-a-scalar-subquery pattern. Q11's literal fraction must
    shrink as 1/SF to stay non-vacuous (TPC-H specifies 0.0001/SF); the
    fair-share multiple is the scale-free equivalent, so the query
    returns a meaningful head at every scale factor.

    Scale notes: the total arrives as a 1-row broadcast re-aggregated
    FROM the per-supplier rollup (no second lineitem scan), and the
    threshold filter is codegen after the broadcast — the whole query is
    one shuffle on l_suppkey. Both revenue and the total go through
    DECIMAL so the share is bit-stable."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        _dsum2(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))).alias("revenue")
    # the rollup feeds both the output and the total: materialize the
    # supplier-sized frame so lineitem is scanned once, not twice
    ).localCheckpoint(eager=True)
    tot = rev.agg(_dsum2(_dec("revenue")).alias("t"), F.count(F.lit(1)).alias("ns"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .filter(F.col("revenue") > 1.05 * F.col("t") / F.col("ns"))
        .select("l_suppkey", "revenue", F.round(F.col("revenue") / F.col("t"), 6).alias("share"))
    )


@query(
    "q126_set_ops",
    oracle="""
    WITH both_prio AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'),
    never_f AS (
      SELECT o_custkey FROM both_prio
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT CAST(count(*) AS BIGINT) AS n_both,
           CAST((SELECT count(*) FROM never_f) AS BIGINT) AS n_both_never_f
    FROM both_prio
    """,
)
def q126_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operators: customers who placed BOTH an urgent and
    a low-priority order (INTERSECT), and of those, the ones with no
    completed order (EXCEPT) — U3's distinct-union sibling coverage.

    Scale notes: Spark plans INTERSECT as a left-semi aggregate join and
    EXCEPT as left-anti — both hash joins on the key, no sort, and the
    priority filters push to the parquet scan. The two counts aggregate
    frames that are customer-sized, not order-sized."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    both = urgent.intersect(low).localCheckpoint(eager=True)
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    never_f = both.exceptAll(f.distinct())
    return both.agg(F.count(F.lit(1)).alias("n_both")).crossJoin(
        F.broadcast(never_f.agg(F.count(F.lit(1)).alias("n_both_never_f")))
    )


@query(
    "q127_value_rank_profile",
    oracle=f"""
    WITH e AS (SELECT event_type, event_id, value FROM events),
    r AS (
      SELECT event_type, event_id, value,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(CASE WHEN pr >= 0.99 THEN value END), 6) AS avg_top1pct,
           round(max(CASE WHEN cd <= 0.5 THEN value END), 6) AS median_by_cd
    FROM r GROUP BY event_type
    """,
)
def q127_value_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic rank functions over keyed partitions: percent_rank /
    cume_dist of each event's value within its type, rolled up to the
    top-1% mean and the cume_dist median — SQL-analytics parity for the
    rank family (rank/row_number are exercised elsewhere).

    Scale notes: ONE window sort per event_type computes both rank
    functions (shared partitioning/ordering), then a map-side-combined
    rollup; ranks are exact rationals of row counts so the cross-engine
    comparison is FP-safe. Tie order pinned by (value, event_id)."""
    e = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = e.select(
        "event_type",
        "value",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.when(F.col("pr") >= 0.99, F.col("value"))), 6).alias(
            "avg_top1pct"
        ),
        F.round(F.max(F.when(F.col("cd") <= 0.5, F.col("value"))), 6).alias(
            "median_by_cd"
        ),
    )


@query(
    "q128_keyed_ntile",
    oracle=f"""
    WITH e AS (SELECT event_type, event_id, value FROM events),
    q AS (
      SELECT event_type, value,
             ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
      FROM e)
    SELECT event_type, CAST(quartile AS BIGINT) AS quartile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 6) AS lo, round(max(value), 6) AS hi
    FROM q GROUP BY event_type, quartile
    """,
)
def q128_keyed_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed NTILE quartiles: each event type's value distribution cut
    into four equal-count buckets with their boundaries — the scalable
    NTILE (partitioned per key, so each sort is per-group; contrast with
    q111, which deliberately avoids the GLOBAL unkeyed NTILE).

    Scale notes: one window sort per event_type, deterministic ties via
    (value, event_id); the rollup shares the window's partitioning."""
    e = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    q = e.select(
        "event_type", "value", F.ntile(4).over(w).cast("long").alias("quartile")
    )
    return q.groupBy("event_type", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@query(
    "q129_scd2_islands",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, {EPOCH_SQL.format(c='ts')} AS es, event_id
               FROM events),
    m AS (
      SELECT user_id, event_type, es, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    isl AS (
      SELECT user_id, event_type, es,
             sum(chg) OVER (PARTITION BY user_id ORDER BY es, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM m),
    runs AS (
      SELECT user_id, island, min(event_type) AS state,
             min(es) AS valid_from, max(es) AS last_seen, count(*) AS n_events
      FROM isl GROUP BY user_id, island)
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, island) AS valid_to,
           last_seen, CAST(n_events AS BIGINT) AS n_events
    FROM runs
    """,
)
def q129_scd2_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build (gaps-and-islands): each
    user's consecutive same-event-type runs collapse into validity
    intervals [valid_from, valid_to) with the next run's start as the
    expiry (NULL = current) — the warehouse pattern for turning an event
    stream into queryable history, distinct from q46's TIME-gap
    sessionization (islands break on VALUE change).

    Scale notes: ONE user_id shuffle serves the change-detect lag, the
    island running sum, the per-run rollup, and the expiry lead (all
    same-key window/group operations — Spark reuses the partitioning);
    no self-joins. Ties pinned by (second, event_id) in both engines."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch().alias("es"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    m = e.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    isl = m.withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.min("event_type").alias("state"),
        F.min("es").alias("valid_from"),
        F.max("es").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "island")
    return runs.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "last_seen",
        "n_events",
    )


@query(
    "q130_transition_matrix",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, {EPOCH_SQL.format(c='ts')} AS es, event_id
               FROM events),
    nxt AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY es, event_id) AS dst,
             CASE WHEN lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
                       - es <= 1800 THEN 1 ELSE 0 END AS in_session
      FROM e),
    t AS (SELECT src, dst, count(*) AS n FROM nxt
          WHERE dst IS NOT NULL AND in_session = 1 GROUP BY src, dst),
    tot AS (SELECT src, sum(n) AS tn FROM t GROUP BY src)
    SELECT t.src, t.dst, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / tn, 6) AS p
    FROM t JOIN tot ON t.src = tot.src
    """,
)
def q130_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    (event_type -> next event_type) step within a 30-minute session
    horizon, the count and conditional probability P(next | current) —
    the behavioral model behind next-action prediction and funnel
    drop-off diagnosis.

    Scale notes: ONE user_id shuffle computes the lead pair per event;
    transition counts are a map-side-combined groupBy on the 25-cell
    (src, dst) key; row-normalization joins the 5-row totals broadcast.
    Ties pinned by (second, event_id)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch().alias("es"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    nxt = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        ((F.lead("es").over(w) - F.col("es")) <= 1800).alias("in_session"),
    )
    t = (
        nxt.filter(F.col("dst").isNotNull() & F.col("in_session"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        # 25-cell frame feeding totals AND the normalization join:
        # materialize once so the lead-window subtree runs once
        .localCheckpoint(eager=True)
    )
    tot = t.groupBy("src").agg(F.sum("n").alias("tn"))
    return t.join(F.broadcast(tot), "src").select(
        "src", "dst", "n", F.round(F.col("n") / F.col("tn"), 6).alias("p")
    )


@query(
    "q131_zipf_slope",
    oracle=r"""
    WITH t AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents WHERE trim(text) <> ''),
    c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
    r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rank FROM c)
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           round(regr_slope(ln(n), ln(rank)), 6) + 0.0 AS zipf_slope,
           round(regr_r2(ln(n), ln(rank)), 6) + 0.0 AS r2
    FROM r
    """,
)
def q131_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the token frequency distribution: OLS slope of
    ln(frequency) on ln(rank) with R² — natural text sits near -1;
    templated/synthetic corpora deviate sharply, making this a one-row
    corpus-authenticity fingerprint (Zipf 1949, public).

    Scale notes: token counts are the only corpus-scale shuffle
    (map-side combined); the rank window and the regression run over the
    VOCABULARY (orders of magnitude smaller). regr_slope/regr_r2 are
    single-pass JVM aggregates with identical semantics in DuckDB; ln()
    of identical integer counts/ranks matches bit-for-bit, and the
    1-row result rounds at 6dp."""
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    c = (
        d.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    r = c.select("n", F.row_number().over(w).alias("rank"))
    return r.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        (F.round(F.expr("regr_slope(ln(n), ln(rank))"), 6) + F.lit(0.0)).alias(
            "zipf_slope"
        ),
        (F.round(F.expr("regr_r2(ln(n), ln(rank))"), 6) + F.lit(0.0)).alias("r2"),
    )


def _zorder_oracle() -> str:
    """DuckDB oracle for q132: the IDENTICAL literal Morton interleave
    (shared generator :func:`layout.morton_expr`, div spelled ``//``) over
    the same equal-width quantization, bucketed into 16 z-ranges."""
    from phoebe_spark.operators.layout import morton_expr, quantize_expr

    xq = quantize_expr("l_partkey", "xmin", "xmax", 256, "//")
    yq = quantize_expr("l_suppkey", "ymin", "ymax", 256, "//")
    z = morton_expr("xq", "yq", 8, "//")
    return f"""
    WITH mm AS (SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
                       min(l_suppkey) AS ymin, max(l_suppkey) AS ymax
                FROM lineitem),
    q AS (SELECT l_partkey, l_suppkey, {xq} AS xq, {yq} AS yq
          FROM lineitem, mm),
    z AS (SELECT l_partkey, l_suppkey, {z} AS zv FROM q)
    SELECT CAST(zv // 4096 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(l_partkey) AS BIGINT) AS part_lo,
           CAST(max(l_partkey) AS BIGINT) AS part_hi,
           CAST(min(l_suppkey) AS BIGINT) AS supp_lo,
           CAST(max(l_suppkey) AS BIGINT) AS supp_hi
    FROM z GROUP BY bucket
    """


@query("q132_zorder_locality", oracle=_zorder_oracle())
def q132_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout profile: interleave the bits of the
    quantized ``(l_partkey, l_suppkey)`` pair into one sort key, then
    report per z-range row counts and BOTH columns' min/max spans — the
    evidence that sorting by the z-value keeps every contiguous range
    narrow in both dimensions at once, which is what makes parquet
    row-group min/max stats prune two-column predicates after a
    ``ZORDER``-style rewrite (:func:`layout.zorder_layout` is the write
    path: ``repartitionByRange(__z) + sortWithinPartitions``).

    Scale notes: one tiny min/max aggregate broadcast back as four
    scalars; the interleave is literal div/mod integer arithmetic —
    whole-stage codegen, no shuffle besides the 16-group rollup. The
    identical literal expression runs in DuckDB (generator shared,
    savgol-oracle pattern)."""
    from phoebe_spark.operators.layout import morton_expr, quantize_expr

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    mm = li.agg(
        F.min("l_partkey").alias("xmin"),
        F.max("l_partkey").alias("xmax"),
        F.min("l_suppkey").alias("ymin"),
        F.max("l_suppkey").alias("ymax"),
    )
    q = li.crossJoin(F.broadcast(mm)).selectExpr(
        "l_partkey",
        "l_suppkey",
        f"{quantize_expr('l_partkey', 'xmin', 'xmax', 256, 'div')} AS xq",
        f"{quantize_expr('l_suppkey', 'ymin', 'ymax', 256, 'div')} AS yq",
    )
    z = q.selectExpr(
        "l_partkey", "l_suppkey", f"{morton_expr('xq', 'yq', 8, 'div')} AS zv"
    )
    return z.groupBy((F.expr("zv div 4096")).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_partkey").cast("long").alias("part_lo"),
        F.max("l_partkey").cast("long").alias("part_hi"),
        F.min("l_suppkey").cast("long").alias("supp_lo"),
        F.max("l_suppkey").cast("long").alias("supp_hi"),
    )


@query(
    "q133_top_unshipped",
    oracle="""
    SELECT l.l_orderkey,
           CAST(date_diff('day', DATE '1970-01-01', o.o_orderdate) AS BIGINT) AS order_day,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q133_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority top-10): revenue still unshipped
    at the cutoff for one market segment — an ordered-limit over a
    fact-fact join that Catalyst executes as a TakeOrderedAndProject
    (per-partition top-10 heaps, only 10 rows per task reach the driver
    stage — no global sort materialization at any scale).

    Scale notes: both date filters push into the parquet scans; the
    segment filter shrinks customer before it broadcasts; the single real
    shuffle is lineitem join orders on orderkey. Ties are pinned by
    (revenue DESC, orderkey ASC) so LIMIT 10 is deterministic."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(_dim(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum2(rev).alias("revenue"))
        .select(
            "l_orderkey",
            F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("order_day"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q134_promo_share",
    oracle="""
    SELECT
      CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS promo_revenue,
      CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue,
      round(100.0 * CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
               / CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE), 6) AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-03-01'
    """,
)
def q134_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the revenue share of PROMO-type
    parts in a two-month ship window — conditional aggregation over a
    broadcast dimension join, the canonical "rate inside one scan"
    pattern (no second scan, no self-join for the denominator).

    Scale notes: the ship-date range pushes into the lineitem scan; part
    broadcasts (only p_partkey + p_type survive pruning); both sums ride
    one map-side-combined aggregate. Money stays DECIMAL until the final
    rounded doubles, so partial-aggregation order can't wiggle cents."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,4)")
    agg = li.join(_dim(p), li.l_partkey == p.p_partkey).agg(
        F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)), 2)
        .cast("double")
        .alias("promo_revenue"),
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6).alias(
            "promo_share_pct"
        ),
    )


@query(
    "q135_disjunctive_pred",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q135_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    OR-of-ANDs predicate that mixes columns from BOTH join sides — the
    classic case where a naive engine evaluates the whole disjunction
    post-join. Catalyst extracts the common join key AND pushes the
    per-side residuals (brand/size prefilter into the part scan via
    constraint propagation of the OR's part-only projection is not free,
    so the broadcast stays small by column pruning instead).

    Scale notes: part broadcasts (3 columns after pruning); the
    disjunction runs as one codegen stage on the joined row; one
    map-side-combined global aggregate returns a single row."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(_dim(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum2(rev).alias("revenue"),
        )
    )


@query(
    "q136_ngram_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_TOKS_SQL} AS t FROM documents WHERE trim(text) <> ''
    ),
    uni AS (SELECT lang, unnest(t) AS g FROM toks),
    bi AS (
      SELECT lang, unnest(list_transform(generate_series(1, len(t) - 1),
                                         i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks WHERE len(t) >= 2
    )
    SELECT u.lang,
           u.n_tokens, u.distinct_tokens, round(u.ttr, 6) AS ttr,
           b.n_bigrams, b.distinct_bigrams, round(b.bttr, 6) AS bigram_ttr
    FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(count(DISTINCT g) AS BIGINT) AS distinct_tokens,
                 count(DISTINCT g) * 1.0 / count(*) AS ttr
          FROM uni GROUP BY lang) u
    JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(count(DISTINCT g) AS BIGINT) AS distinct_bigrams,
                 count(DISTINCT g) * 1.0 / count(*) AS bttr
          FROM bi GROUP BY lang) b USING (lang)
    """,
)
def q136_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity fingerprint per language: type-token ratio at the
    unigram and bigram level — templated or over-deduplicated corpora
    collapse to low TTR, synthetic word soup approaches 1.0; pipelines
    track both to catch generation/curation regressions.

    Scale notes: one tagged explode per n-gram order feeding
    ``count(DISTINCT)`` aggregates that Spark executes as two-stage
    partial-distinct (expand + map-side dedup on (lang, gram)) — the
    corpus shuffles distinct grams only, never raw token streams; bigrams
    come from a zip-with-next array transform inside the scan, no window,
    no self-join."""
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    t = d.select("lang", text.tokens(F.col("text")).alias("t"))
    uni = t.select("lang", F.explode("t").alias("g"))
    bi = t.filter(F.size("t") >= 2).select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))")
        ).alias("g"),
    )
    u = uni.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("g").alias("distinct_tokens"),
    )
    b = bi.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("g").alias("distinct_bigrams"),
    )
    return (
        u.join(b, "lang")
        .select(
            "lang",
            "n_tokens",
            "distinct_tokens",
            F.round(F.col("distinct_tokens") / F.col("n_tokens"), 6).alias("ttr"),
            "n_bigrams",
            "distinct_bigrams",
            F.round(F.col("distinct_bigrams") / F.col("n_bigrams"), 6).alias("bigram_ttr"),
        )
    )


@query(
    "q137_importance_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_t, unnest({_TOKS_SQL}) AS term
      FROM documents WHERE trim(text) <> ''
    ),
    counts AS (
      SELECT term, count(*) AS n_raw,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_tgt
      FROM toks GROUP BY term
    ),
    tot AS (SELECT sum(n_raw) AS tr, sum(n_tgt) AS tt, count(*) AS v FROM counts),
    lm AS (
      SELECT term, ln((n_tgt + 1.0) / (tt + 1.0 * v))
                   - ln((n_raw + 1.0) / (tr + 1.0 * v)) AS lr
      FROM counts, tot
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(lr), 6) AS log_importance
    FROM toks t JOIN lm USING (term)
    GROUP BY t.doc_id
    """,
)
def q137_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (:func:`curation.importance_weights`,
    Xie et al. 2023): per-doc ``sum log(P_en(t)/P_corpus(t))`` under two
    add-1-smoothed unigram LMs sharing the corpus vocabulary — the
    hashed-n-gram importance-resampling signal that steers a 100 TB raw
    crawl toward a target domain without training a classifier.

    Scale notes: one explode feeds both LM fits (corpus + conditional
    target counts in the SAME map-side-combined groupBy(term)); totals and
    |V| broadcast from a 1-row aggregate of the vocabulary frame; scoring
    is explode -> term equi-join -> per-doc sum. Log-ratio sums round at
    6dp, far above double reassociation error for ~1e2-token docs."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents")
    out = curation.importance_weights(d, target=F.col("lang") == "en")
    return out.select(
        "doc_id", "n_tokens", F.round("log_importance", 6).alias("log_importance")
    )


@query(
    "q138_prefix_ssjoin",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 5
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 4),
                                          i -> array_to_string(t[i:i+4], ' '))) AS grams
      FROM toks
    ),
    posting AS (SELECT doc_id, len(grams) AS sz, unnest(grams) AS g FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS size_a, b.sz AS size_b,
             count(*) AS inter
      FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (size_a + size_b - inter), 6) AS jaccard,
           round(inter * 1.0 / least(size_a, size_b), 6) AS containment
    FROM pairs WHERE inter * 1.0 / (size_a + size_b - inter) >= 0.5
    """,
)
def q138_prefix_ssjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join with prefix filtering
    (:func:`dedup.prefix_filter_jaccard_pairs`, PPJoin family — Chaudhuri
    ICDE'06 / Xiao WWW'08): all pairs with 5-gram Jaccard >= 0.5, zero
    recall loss, plus the asymmetric CONTAINMENT score
    (``inter/min(sz)``) that flags near-subset duplication symmetric
    Jaccard under-rates. Candidate generation touches only each doc's
    rarest-shingle prefix, so hot-stopword posting groups never pair up —
    the exactness alternative to q24's probabilistic LSH and q13's
    df-capped lower bound. The oracle is the brute-force inverted-index
    join over ALL postings: matching it certifies the prefix filter
    dropped nothing.

    Scale notes: prefixes shrink pair generation by design (rarity-sorted
    df ordering); every shuffle is bounded (doc- or shingle-keyed); the
    full-set verify joins only the candidate pairs. No cap, no
    cross-join, no Python."""
    d = _t(spark, sf_dir, "documents")
    out = dedup.prefix_filter_jaccard_pairs(d, n=5, threshold=0.5)
    return out.select(
        "doc_a",
        "doc_b",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("containment", 6).alias("containment"),
    )


@query(
    "q139_jsonl_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(length(text)) AS BIGINT) AS text_chars
    FROM documents GROUP BY lang
    """,
)
def q139_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL interchange round-trip (:mod:`phoebe_spark.sources.jsonl`):
    export the corpus as newline-delimited JSON, re-ingest it with an
    explicit schema (no inference pass), and aggregate per language —
    matching the oracle computed on the ORIGINAL parquet certifies the
    round-trip is lossless down to every text byte (sum of text lengths
    rides the check).

    Scale notes: JSONL part-files split on line boundaries (full read
    parallelism at any corpus size); the explicit schema keeps re-ingest
    one pass with field pruning inside the JSON parser; writes stream
    partition-parallel, nothing through the driver."""
    import os

    from phoebe_spark.sources import jsonl

    d = _t(spark, sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/phoebe_jsonl_{tag}"
    jsonl.write_jsonl(d, path)
    back = jsonl.read_jsonl(
        spark,
        path,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.length("text")).alias("text_chars"),
    )


@query(
    "q140_bpe_pair_stats",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS_SQL}) AS w FROM documents WHERE trim(text) <> ''
    ),
    pairs AS (
      SELECT w[i] || w[i+1] AS pair
      FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks WHERE len(w) >= 2)
    ),
    counted AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair),
    tot AS (SELECT sum(n) AS t FROM counted)
    SELECT pair, CAST(n AS BIGINT) AS n, round(n * 1.0 / t, 6) AS share
    FROM counted, tot
    ORDER BY n DESC, pair ASC LIMIT 20
    """,
)
def q140_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE tokenizer training at corpus scale (Sennrich et
    al. 2016, arXiv 1508.07909 — public): the frequency of every adjacent
    symbol pair inside words, top-20 with corpus share — the statistic a
    byte-pair-encoding trainer recomputes per merge; at 100 TB this
    aggregation IS the tokenizer-training bottleneck, so it must run as a
    distributed map-side-combined count, never a driver-side vocabulary
    walk.

    Scale notes: two nested codegen explodes (words, then in-word
    character pairs via ``transform(sequence)`` + ``substring``) feed one
    groupBy(pair) whose key space is bounded (alphabet²); the top-20 is a
    TakeOrderedAndProject over the tiny pair frame; the corpus-total
    share denominator broadcasts from a 1-row aggregate. Ties pinned by
    (n DESC, pair ASC)."""
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    words = d.select(F.explode(text.tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=True
    )
    tot = counted.agg(F.sum("n").alias("t"))
    return (
        counted.crossJoin(F.broadcast(tot))
        .select("pair", "n", F.round(F.col("n") / F.col("t"), 6).alias("share"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


@query(
    "q141_cms_gate",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS_SQL}) AS tok FROM documents WHERE trim(text) <> ''
    ),
    exact AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    probes AS (SELECT tok, n FROM exact ORDER BY n DESC, tok ASC LIMIT 20),
    seeded AS (
      SELECT t.tok, s.s,
             {_MD5H_SQL.format(x="t.tok || '|' || s.s")} % 256 AS bucket
      FROM toks t CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) s
    ),
    counters AS (SELECT s, bucket, count(*) AS c FROM seeded GROUP BY s, bucket),
    est AS (
      SELECT p.tok, min(c.c) AS cms_est
      FROM probes p
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) s
      JOIN counters c ON c.s = s.s
                     AND c.bucket = {_MD5H_SQL.format(x="p.tok || '|' || s.s")} % 256
      GROUP BY p.tok
    )
    SELECT p.tok, CAST(p.n AS BIGINT) AS exact_n,
           CAST(e.cms_est AS BIGINT) AS cms_est,
           CAST(e.cms_est - p.n AS BIGINT) AS overcount
    FROM probes p JOIN est e USING (tok)
    """,
)
def q141_cms_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch certification (Cormode & Muthukrishnan 2005 —
    public): build a depth-4 x width-256 CMS over the corpus token stream
    with the oracle-portable md5 hash family, then report, for the top-20
    true heavy hitters, the exact count beside the sketch estimate and
    its overcount — completing the sketch-gate family (q116 HLL
    cardinality, q117 quantile sketch) with the counting sketch. The CMS
    never undercounts (est = min over rows of a counter that includes
    every occurrence), and the overcount column is the measured collision
    mass the width bounds in expectation by N/256 per row.

    Scale notes: the sketch build is a groupBy on (seed, bucket) — 1,024
    cells of map-side-combined state regardless of vocabulary size (the
    whole point: per-key state O(d*w), not O(|domain|)); probes broadcast
    into the cell frame. The cell counters are built from the
    VOCABULARY-sized exact-count frame (sum of per-token counts per
    bucket == count of raw occurrences), not by re-exploding the token
    stream 4x — one corpus scan feeds everything, and nothing
    token-stream-sized is ever materialized or reshuffled."""
    from phoebe_spark.operators.dedup import md5_hash64

    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=True
    )
    probes = exact.orderBy(F.desc("n"), F.asc("tok")).limit(20)
    seeds = F.explode(F.array(*[F.lit(s) for s in range(4)])).alias("s")
    bucket = F.pmod(
        md5_hash64(F.concat(F.col("tok"), F.lit("|"), F.col("s").cast("string"))),
        F.lit(256),
    )
    counters = (
        exact.select("tok", "n", seeds)
        .select("s", bucket.alias("bucket"), "n")
        .groupBy("s", "bucket")
        .agg(F.sum("n").alias("c"))
    )
    est = (
        probes.select("tok", "n", seeds)
        .select("tok", "n", "s", bucket.alias("bucket"))
        .join(counters, ["s", "bucket"])
        .groupBy("tok", "n")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "tok",
        F.col("n").alias("exact_n"),
        "cms_est",
        (F.col("cms_est") - F.col("n")).alias("overcount"),
    )


@query(
    "q142_partition_pruning",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value,
           CAST(min(epoch_ns(ts) // 1000000000) AS BIGINT) AS first_sec,
           CAST(max(epoch_ns(ts) // 1000000000) AS BIGINT) AS last_sec
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)
def q142_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned table layout + directory-pruned read
    (:mod:`phoebe_spark.sources.layout`): persist the event fact table
    partitioned by ``event_type``, then answer a two-type slice question
    from the partitioned copy — matching the oracle computed on the
    ORIGINAL parquet certifies the partitioned round-trip (counts,
    distinct users, money sums, and epoch-second extrema all survive).
    The reference keeps one SQLite table per experiment id for the same
    access pattern (dos-group/phoebe analytics/app/common/db.py:21-38 —
    partition-per-key, single-node edition).

    Scale notes: the IN-filter lands in the scan's ``PartitionFilters``
    (plan-asserted in tests/test_plans.py), so non-matching partition
    DIRECTORIES are skipped at planning time — at 100 TB that's the
    difference between scanning 2/5 of the table and all of it. The write
    repartitions on the partition column first (one writer per value, no
    tasks x partitions small-file explosion). Aggregation is a single
    map-side-combined groupBy on the partition key."""
    import os

    from phoebe_spark.sources import layout

    ev = _t(spark, sf_dir, "events")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/phoebe_part_{tag}"
    layout.write_partitioned(ev, path, ["event_type"])
    back = layout.read_partitioned(spark, path)
    return (
        back.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum2(_dec("value")).alias("total_value"),
            F.min(_epoch("ts")).alias("first_sec"),
            F.max(_epoch("ts")).alias("last_sec"),
        )
    )


@query(
    "q143_orc_roundtrip",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q143_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC interchange round-trip (:mod:`phoebe_spark.sources.orc`):
    export lineitem as ORC — Spark's second built-in columnar format,
    the one Hive/Trino warehouses commonly standardize on — re-read it
    (schema from the ORC footer, self-describing, no inference scan), and
    aggregate a shipdate slice per (returnflag, linestatus). Matching the
    oracle computed on the ORIGINAL parquet certifies the ORC writer/
    reader preserve decimals, dates, and row multiplicity exactly.

    Scale notes: ORC splits on stripe boundaries (full read parallelism
    at any size); the shipdate predicate pushes into ORC stripe min/max
    indexes (``spark.sql.orc.filterPushdown``, default on) and column
    projection reads only the five referenced streams; decoding stays in
    the JVM vectorized reader. One map-side-combined groupBy after the
    pruned scan."""
    import os

    from phoebe_spark.sources import orc as orc_src

    li = _t(spark, sf_dir, "lineitem")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/phoebe_orc_{tag}"
    orc_src.write_orc(li, path)
    back = orc_src.read_orc(spark, path)
    return (
        back.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum2(_dec("l_quantity")).alias("sum_qty"),
            _dsum2(_dec("l_extendedprice")).alias("sum_price"),
        )
    )


@query(
    "q144_skyline_users",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))) * 100, 0) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    )
    SELECT a.user_id, a.n_events, a.cents
    FROM u a
    WHERE NOT EXISTS (
      SELECT 1 FROM u b
      WHERE b.n_events >= a.n_events AND b.cents >= a.cents
        AND (b.n_events > a.n_events OR b.cents > a.cents)
    )
    """,
)
def q144_skyline_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier preference query
    (:func:`skyline.skyline_2d`, Borzsony ICDE'01): the users no other
    user beats on BOTH event count and total spend — the multi-objective
    selection primitive (the reference's profiling loop filters its
    scaleOut-vs-throughput profiles to the same usable frontier before
    fitting, analytics/app/latency/preprocessing.py:21-38). The oracle is
    the textbook quadratic NOT EXISTS self-join; matching it certifies
    the two-phase distributed plan is exact, including duplicate-point
    ties (twins never dominate each other, so both survive).

    Scale notes: the NOT EXISTS form is O(n²) comparisons and
    un-pushdownable — the operator instead hash-buckets users (one
    shuffle), drops locally dominated points with an O(n log n)
    sort-based value-range-window dominance test (no self-join), and runs
    the same test once more over the tiny survivor set. Spend is summed
    in DECIMAL cents so the frontier compares exact integers, never
    float-reordered doubles."""
    from phoebe_spark.operators import skyline

    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(_dec("value")) * 100, 0).cast("long").alias("cents"),
    )
    return skyline.skyline_2d(u, x="n_events", y="cents", id_cols=["user_id"])


def _bpe_oracle(rounds: int) -> str:
    """Generated CTE chain mirroring ``text.bpe_train``: round r counts
    adjacent symbol pairs, picks the (count DESC, left ASC, right ASC)
    argmax, and applies it with the same sentinel-string ``replace``."""
    # symbols are ENCLOSED chr(31)+sym+chr(30) so the merge pattern carries
    # both symbol boundaries (a prefix-only sentinel false-matches when the
    # next symbol merely starts with r_sym) — mirrors text.BPE_SEP/BPE_END
    cte = f"""
    WITH toks AS (
      SELECT unnest({_TOKS_SQL}) AS t FROM documents WHERE trim(text) <> ''
    ),
    words0 AS (
      SELECT array_to_string(list_transform(generate_series(1, length(t)),
                                            i -> chr(31) || t[i] || chr(30)), '') AS w
      FROM toks WHERE length(t) >= 1
    )"""
    for r in range(1, rounds + 1):
        p = r - 1
        cte += f""",
    sy{r} AS (SELECT list_transform(
                       list_filter(string_split(w, chr(30)), x -> x <> ''),
                       x -> replace(x, chr(31), '')) AS s
              FROM words{p}),
    pr{r} AS (SELECT s[i] AS l_sym, s[i+1] AS r_sym
              FROM (SELECT s, unnest(generate_series(1, len(s) - 1)) AS i
                    FROM sy{r} WHERE len(s) >= 2)),
    best{r} AS (SELECT {r} AS rnd, l_sym, r_sym, count(*) AS n FROM pr{r}
                GROUP BY l_sym, r_sym ORDER BY n DESC, l_sym ASC, r_sym ASC
                LIMIT 1),
    words{r} AS (SELECT replace(w, chr(31) || b.l_sym || chr(30) || chr(31) || b.r_sym || chr(30),
                                chr(31) || b.l_sym || b.r_sym || chr(30)) AS w
                 FROM words{p}, best{r} b)"""
    union = " UNION ALL ".join(f"SELECT * FROM best{r}" for r in range(1, rounds + 1))
    return (
        cte
        + f"""
    SELECT rnd, l_sym, r_sym, l_sym || r_sym AS merged, CAST(n AS BIGINT) AS n
    FROM ({union}) ORDER BY rnd"""
    )


@query("q145_bpe_train", oracle=_bpe_oracle(5))
def q145_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer training, 5 merge rounds
    (:func:`text.bpe_train`, Sennrich et al. 2016 arXiv 1508.07909):
    learn the first 5 merges over the whole corpus and return the merge
    table — round, pair, merged symbol, and the pair's corpus frequency
    at selection time. q140 is one round of the pair statistic; this is
    the full training loop, the iterative-algorithm class (q118 PageRank,
    q53 components) applied to tokenizer learning. The oracle replays all
    5 rounds as a generated CTE chain — digit-for-digit agreement
    certifies pair counting, deterministic argmax tie-breaks, AND the
    greedy leftmost merge application each round.

    Scale notes: each round is the q140 map-side-combined pair count
    (bounded key space) plus a 1-row argmax fetch (a model parameter, not
    a data collect) and a pure-codegen string ``replace`` merge — the
    sentinel-prefixed symbol encoding makes greedy BPE application
    exactly literal replace, no per-row Python, no array rebuilds; words
    re-checkpoint per round so lineage stays O(1) (q53/q118 discipline)."""
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    words = d.select(F.explode(text.tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 1
    )
    merges = text.bpe_train(words, rounds=5, word_col="w")
    return spark.createDataFrame(
        merges, "rnd INT, l_sym STRING, r_sym STRING, merged STRING, n BIGINT"
    ).orderBy("rnd")


def _maxcover_oracle(rounds: int) -> str:
    """Generated CTE chain replaying ``curation.greedy_max_coverage``:
    round r scores every doc's uncovered-bigram gain, takes the
    (gain DESC, doc_id ASC) argmax among gain > 0 (the operator's
    exhaustion break), and folds the winner's bigrams into the covered
    set."""
    cte = f"""
    WITH docsets AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(w) - 1),
                                          i -> w[i] || ' ' || w[i+1])) AS toks
      FROM (SELECT doc_id, {_TOKS_SQL} AS w FROM documents
            WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 2)
    ),
    cov0 AS (SELECT CAST([] AS VARCHAR[]) AS c)"""
    for r in range(1, rounds + 1):
        p = r - 1
        cte += f""",
    gain{r} AS (
      SELECT d.doc_id,
             len(list_filter(d.toks, t -> NOT list_contains(c.c, t))) AS gain
      FROM docsets d, cov{p} c
    ),
    best{r} AS (SELECT {r} AS rnd, doc_id, gain FROM gain{r} WHERE gain > 0
                ORDER BY gain DESC, doc_id ASC LIMIT 1),
    cov{r} AS (
      SELECT list_distinct(list_concat(c.c, d.toks)) AS c
      FROM cov{p} c, best{r} b JOIN docsets d ON d.doc_id = b.doc_id
    )"""
    union = " UNION ALL ".join(f"SELECT * FROM best{r}" for r in range(1, rounds + 1))
    return (
        cte
        + f"""
    SELECT rnd, doc_id, CAST(gain AS BIGINT) AS gain FROM ({union}) ORDER BY rnd"""
    )


@query("q146_max_coverage", oracle=_maxcover_oracle(5))
def q146_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage document selection, 5 rounds
    (:func:`curation.greedy_max_coverage`, Nemhauser 1978 / distributed
    greedy a la Chierichetti WWW'10): the 5 documents that together cover
    the most distinct bigrams, picked greedily with deterministic
    tie-breaks — submodular data selection, the "which k docs buy the
    most diversity" pruning loop. The oracle replays all 5 rounds as a
    generated CTE chain (the q145 pattern applied to set coverage);
    digit-for-digit agreement certifies gain scoring, argmax tie-breaks,
    and the covered-set fold.

    Scale notes: one pass builds the per-doc DISTINCT-bigram-set frame
    (zip_with over token-array slices — no explode, no per-element
    re-split), checkpointed and reused by all rounds; the covered set
    stays bounded (rounds x max-doc-bigrams, model state, never
    corpus-sized) and ships as an array LITERAL into a shuffle-free
    ``size(array_except(toks, covered))`` scan, so each round is a single
    TakeOrdered argmax job whose 1-row result carries the winner's
    uncovered set — no joins, no per-round shuffles."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents")
    picks = curation.greedy_max_coverage(d, rounds=5)
    return spark.createDataFrame(picks, "rnd INT, doc_id LONG, gain BIGINT").orderBy(
        "rnd"
    )


@query(
    "q147_shard_layout",
    oracle="""
    WITH b AS (
      SELECT doc_id, length(text) AS chars,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|shard'), 1, 15)) AS BIGINT)
               % 16 AS shard_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|order'), 1, 15)) AS BIGINT)
               AS okey
      FROM documents
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           arg_min(doc_id, okey) AS first_doc,
           arg_max(doc_id, okey) AS last_doc,
           min(okey) AS min_okey
    FROM b GROUP BY shard_id
    """,
)
def q147_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard layout: the dataloader-facing write of
    a curated corpus as N shards, each with a stable pseudo-random
    internal order (the "global shuffle" step before tokenized-sample
    serving). Shard assignment and intra-shard order key are both salted
    md5 hashes of ``doc_id`` (:func:`sampling.hash_bucket` /
    :func:`dedup.md5_hash64`) — reproducible across runs, partitionings,
    and engines, unlike ``rand()``-based shuffles which re-roll under AQE
    re-planning and task retries. Result is the per-shard manifest
    (counts, bytes, first/last doc in shard order); sensitive to every
    row's shard AND order via arg_min/arg_max/min-key columns.

    Scale notes: at 100 TB this is ``repartition(N, shard_id)`` +
    ``sortWithinPartitions(okey)`` + parquet write — exactly one shuffle,
    no global sort (the order is per-shard by construction, which is all
    a dataloader that samples shards round-robin needs). The manifest
    here is the same plan minus the write: one scan, codegen hash exprs,
    map-side-combining groupBy on a 16-value key."""
    from phoebe_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    okey = dedup.md5_hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit("|order"))
    )
    s = d.select(
        "doc_id",
        F.length("text").alias("chars"),
        sampling.hash_bucket(F.col("doc_id"), salt="shard", buckets=16).alias(
            "shard_id"
        ),
        okey.alias("okey"),
    )
    return s.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("chars").cast("long").alias("total_chars"),
        F.min_by("doc_id", "okey").alias("first_doc"),
        F.max_by("doc_id", "okey").alias("last_doc"),
        F.min("okey").alias("min_okey"),
    )


@query(
    "q148_length_buckets",
    oracle=r"""
    WITH t AS (
      SELECT CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks
      FROM documents
    ),
    b AS (
      SELECT toks,
             greatest(16, CAST(pow(2, length(bin(greatest(toks, 1) - 1))) AS BIGINT))
               AS bucket_cap
      FROM t
    )
    SELECT bucket_cap,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS sum_tokens,
           round(1 - CAST(sum(toks) AS BIGINT) / (bucket_cap * CAST(count(*) AS BIGINT)), 6)
             AS padding_frac
    FROM b GROUP BY bucket_cap
    """,
)
def q148_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report: assign every document to the
    smallest power-of-two token bucket (floor 16) and report the padding
    waste if batches pad to the bucket cap — the standard pre-tokenization
    question "what do length-grouped batches cost us vs dynamic batching".
    Token count is the q52 whitespace tokenizer, so the two reports share
    a vocabulary of terms.

    The bucket cap is computed with integer bit-length arithmetic
    (``2 ^ length(bin(toks - 1))``), not ``ceil(log2(x))`` — float log2
    at exact powers of two is where engines disagree; ``bin`` is exact
    and bit-identical in Spark and DuckDB.

    Scale notes: one scan, pure codegen exprs, map-side-combining groupBy
    on a ~10-value key — shuffle is O(buckets). This is the profile you
    run BEFORE choosing fixed context-window packing (q62) vs bucketed
    batching at 100 TB."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(text.tokens(F.col("text")))
    s = d.select(toks.alias("toks"))
    bits = F.length(F.bin(F.greatest(F.col("toks"), F.lit(1)) - 1))
    cap = F.greatest(
        F.lit(16).cast("long"), F.pow(F.lit(2.0), bits).cast("long")
    )
    g = (
        s.withColumn("bucket_cap", cap)
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("sum_tokens"),
        )
    )
    return g.select(
        "bucket_cap",
        "n_docs",
        "sum_tokens",
        F.round(
            F.lit(1) - F.col("sum_tokens") / (F.col("bucket_cap") * F.col("n_docs")),
            6,
        ).alias("padding_frac"),
    )


@query(
    "q149_pq_ann",
    oracle="""
    WITH n AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    ms AS (SELECT unnest(generate_series(0, 3)) AS m),
    sub AS (
      SELECT vec_id, m, v[(m * 16 + 1):((m + 1) * 16)] AS sv FROM n, ms
    ),
    cb AS (
      SELECT m, CAST(vec_id - 20 AS INT) AS code, sv AS cw
      FROM sub WHERE vec_id BETWEEN 20 AND 27
    ),
    enc AS (
      SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, cb.code,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY list_sum(list_transform(generate_series(1, 16),
                            i -> (s.sv[i] - cb.cw[i]) * (s.sv[i] - cb.cw[i]))),
                          cb.code) AS rk
        FROM sub s JOIN cb USING (m)) WHERE rk = 1
    ),
    qsub AS (
      SELECT vec_id AS query_id, m, sv AS qv
      FROM sub WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    contrib AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, e.m,
             list_sum(list_transform(generate_series(1, 16),
                      i -> q.qv[i] * cb.cw[i])) AS part
      FROM enc e
      JOIN cb ON cb.m = e.m AND cb.code = e.code
      JOIN qsub q ON q.m = e.m
    ),
    scores AS (
      SELECT query_id, neighbor_id,
             list_sum(list(part ORDER BY m)) AS adc_dot
      FROM contrib GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(adc_dot, 6) AS adc_dot
    FROM (SELECT query_id, neighbor_id, adc_dot,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc_dot DESC, neighbor_id) AS rank
          FROM scores)
    WHERE rank <= 5
    """,
)
def q149_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-5 via asymmetric distance
    (:func:`similarity.pq_topk`, Jégou 2011 / FAISS IndexPQ) with a
    PRETRAINED pivot codebook: M=4 subspaces of 16 dims, K=8 codewords
    per subspace taken from corpus vectors 20-27 (the q44 deterministic
    train-once/assign-many pattern), so encoding, the ADC lookup, and the
    top-5 are all exactly reproducible — the oracle replays subvector
    slicing, nearest-codeword argmin (ties -> smallest code), per-subspace
    LUT dots, and the fixed-order m=0..3 score sum digit-for-digit.

    Completes the ANN ladder: q23 exact brute force, q42/q74 LSH
    projections, q44 IVF cell probing, q69 int8 storage compression —
    this is the codes-only memory path (M ints per corpus row, 64x
    smaller than float32 at d=64/M=4)."""
    emb = _t(spark, sf_dir, "embeddings")
    pivots = (
        emb.filter(F.col("vec_id").between(20, 27)).orderBy("vec_id").collect()
    )
    codebooks = [
        [list(r["embedding"])[j * 16 : (j + 1) * 16] for r in pivots]
        for j in range(4)
    ]
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    out = similarity.pq_topk(emb, queries, codebooks, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("adc_dot", 6).alias("adc_dot"),
    )


# ---------------------------------------------------------------------------
# Round 4 extensions: substring-dup diagnostics, classic warehouse shapes,
# KMV distinct sketching, mixture resampling
# ---------------------------------------------------------------------------


@query(
    "q150_dup_substring_ratio",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents WHERE trim(text) <> ''
    ),
    pos AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 7),
                                   i -> array_to_string(t[i:i+7], ' '))) AS g
      FROM toks WHERE len(t) >= 8
    ),
    gc AS (SELECT g, count(*) AS c FROM pos GROUP BY g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_positions,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_positions,
           round(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_ratio
    FROM pos JOIN gc USING (g)
    GROUP BY doc_id
    """,
)
def q150_dup_substring_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring ratio: the fraction of a doc's
    8-word-gram POSITIONS whose gram occurs anywhere else in the corpus
    (including elsewhere in the same doc) — the scan that motivates
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): docs dominated by
    corpus-duplicated spans are boilerplate/syndication candidates even
    when no whole-doc fingerprint matches.

    Scale notes: the posting pass (posexplode + window lead, codegen) is
    the same single-scan shingler the minhash path uses; the global gram
    census is one map-side-combined groupBy on the gram key, and the
    postings->census join is an equi-join on that same key — no
    all-pairs anything, and the gram census (distinct 8-grams) is the
    natural partition-pruned build side at 100 TB. Positions, not
    distinct grams, are scored, so a doc repeating one spammy sentence
    50 times scores 50 duplicated positions."""
    d = _t(spark, sf_dir, "documents")
    return dedup.dup_substring_ratio(d, "doc_id", "text", n=8)


@query(
    "q151_cheapest_supplier",
    oracle=f"""
    WITH costs AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
             CAST(l.l_extendedprice AS DOUBLE) / CAST(l.l_quantity AS DOUBLE) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_size <= 5 AND l.l_quantity > 0
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY unit_cost, s_suppkey) AS rk
      FROM costs
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
           round(unit_cost, 6) AS unit_cost
    FROM ranked WHERE rk = 1
    """,
)
def q151_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape on the observed schema: for every small part
    (p_size <= 5) shipped from a EUROPE supplier, the supplier offering
    the minimum observed unit price (extendedprice/quantity; ties ->
    smallest suppkey). The classic correlated MIN subquery re-expressed
    as one window argmin — a single pass instead of the textbook
    re-join against a per-part aggregate.

    Scale notes: region/nation/supplier/part are dimension tables —
    Catalyst broadcasts all of them (only lineitem shuffles, and only
    for the per-part window); the p_size and r_name predicates prune
    the build sides before broadcast. unit_cost is a per-row double op
    (identical IEEE in both engines), never aggregated."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    costs = (
        l.join(_dim(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(_dim(p), l.l_partkey == p.p_partkey)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            (F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")).alias("unit_cost"),
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("unit_cost").asc(), F.col("s_suppkey").asc())
    return (
        costs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
    )


@query(
    "q152_big_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(year(o.o_orderdate) * 10000 + month(o.o_orderdate) * 100
                + day(o.o_orderdate) AS INT) AS orderdate_ymd,
           o.o_totalprice, big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q152_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): orders whose total line quantity
    exceeds 250, joined back to customer — the HAVING-subquery-IN shape
    as a plain aggregate-then-join.

    Scale notes: the lineitem rollup is one map-side-combined groupBy on
    orderkey; the HAVING filter collapses it to a tiny frame (p99 of
    order quantity is ~262 here), which then BROADCASTS into orders —
    the fact-fact join never happens, only fact x filtered-aggregate.
    Quantity totals ride the DECIMAL money policy."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum2(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    ymd = (
        F.year("o_orderdate") * 10000 + F.month("o_orderdate") * 100 + F.dayofmonth("o_orderdate")
    ).cast("int")
    return (
        o.join(_dim(big), o.o_orderkey == big.l_orderkey)
        .join(_dim(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            ymd.alias("orderdate_ymd"),
            "o_totalprice", "total_qty",
        )
    )


@query(
    "q153_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             / count(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
)
def q153_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with an above-average (positive-balance
    average) account balance and NO orders since 2000-01-01 (lapsed
    high-value accounts), rolled up by nation — the anti-join +
    scalar-subquery pattern.

    Scale notes: the scalar average is a 1-row broadcast (decimal-sum
    policy so the threshold double is engine-exact); the no-orders test
    is a LEFT ANTI join on custkey (no NOT IN null traps, no
    correlated re-scan); the nation rollup is a broadcast dim join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.round(F.sum(_dec("c_acctbal")), 2).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, "c_custkey", "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            _dsum2(_dec("c_acctbal")).alias("total_bal"),
        )
    )


@query(
    "q154_kmv_distinct",
    oracle=f"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, user_id,
             {_MD5H_SQL.format(x='CAST(user_id AS VARCHAR)')} / 1152921504606846976.0 AS frac
      FROM du
    ),
    ranked AS (
      SELECT event_type, frac,
             row_number() OVER (PARTITION BY event_type ORDER BY frac, user_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n_exact
      FROM h
    )
    SELECT event_type,
           CAST(max(n_exact) AS BIGINT) AS n_exact,
           round(CASE WHEN max(n_exact) < 32 THEN max(n_exact)
                      ELSE 31.0 / max(CASE WHEN rk = 32 THEN frac END) END, 6) AS kmv_est,
           round(abs(CASE WHEN max(n_exact) < 32 THEN max(n_exact)
                          ELSE 31.0 / max(CASE WHEN rk = 32 THEN frac END) END
                     - max(n_exact)) / max(n_exact), 6) AS rel_err
    FROM ranked GROUP BY event_type
    """,
)
def q154_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=32, per event
    type over user ids (Bar-Yossef et al. 2002 — the bottom-k sketch
    behind theta sketches): estimate = (k-1) / r_k where r_k is the
    k-th smallest normalized hash of the distinct values; groups with
    fewer than k distinct values fall back to the exact count. Reported
    against the exact distinct count with relative error — the
    mergeable-sketch alternative to approx_count_distinct whose state
    is k doubles per group and whose union is a k-smallest merge.

    Scale notes: one distinct-collapse shuffle (map-side combining on
    (type, user)), then a per-group bottom-k window — at 100 TB you'd
    keep only the running k-minimum per partition (the sketch property);
    here the window form keeps the whole computation one oracle-exact
    pass. The md5-derived hash is engine-portable, so the estimate is
    digit-for-digit reproducible, not a property test."""
    e = _t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    frac = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast("long")
        / F.lit(1152921504606846976.0)
    )
    h = e.select("event_type", "user_id", frac.alias("frac"))
    w = Window.partitionBy("event_type").orderBy(F.col("frac").asc(), F.col("user_id").asc())
    cnt = Window.partitionBy("event_type")
    ranked = h.select(
        "event_type",
        "frac",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(cnt).alias("n_exact"),
    )
    est = F.when(
        F.max("n_exact") < 32, F.max("n_exact").cast("double")
    ).otherwise(F.lit(31.0) / F.max(F.when(F.col("rk") == 32, F.col("frac"))))
    return ranked.groupBy("event_type").agg(
        F.max("n_exact").cast("long").alias("n_exact"),
        F.round(est, 6).alias("kmv_est"),
        F.round(F.abs(est - F.max("n_exact")) / F.max("n_exact"), 6).alias("rel_err"),
    )


@query(
    "q155_mixture_resample",
    oracle=f"""
    WITH per AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n, count(*) AS s FROM per),
    fac AS (
      SELECT source, n_docs,
             CAST(tot.n AS DOUBLE) / (tot.s * n_docs) AS factor
      FROM per CROSS JOIN tot
    ),
    rep AS (
      SELECT d.doc_id, d.source, fac.factor,
             CAST(floor(fac.factor) AS BIGINT)
             + CASE WHEN {_MD5H_SQL.format(x='CAST(d.doc_id AS VARCHAR)')} / 1152921504606846976.0
                         < fac.factor - floor(fac.factor)
                    THEN 1 ELSE 0 END AS n_repeats
      FROM documents d JOIN fac ON fac.source = d.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(max(factor), 6) AS factor,
           CAST(sum(n_repeats) AS BIGINT) AS n_emitted
    FROM rep GROUP BY source
    """,
)
def q155_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture resampling plan: to hit a uniform
    per-source target mixture, each source gets a sampling factor
    N/(S*n_src); every doc is emitted floor(factor) times plus one more
    when its salted hash falls under the fractional part — the
    upsample/downsample executor for the mixture WEIGHTS q67 designs
    (DoReMi/SlimPajama-style mixture execution). Reported per source:
    factor and the number of training copies emitted.

    Scale notes: the per-source census is one tiny groupBy broadcast
    back onto the corpus scan; the repeat decision is a pure column
    expression on the content-stable md5 hash (no RNG — retries and
    AQE replans cannot change the sample), and the downstream explode
    would be sequence(1, n_repeats) — fan-out without a shuffle."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("_n"), F.count(F.lit(1)).alias("_s")
    )
    fac = per.crossJoin(F.broadcast(tot)).select(
        "source",
        (F.col("_n").cast("double") / (F.col("_s") * F.col("n_docs"))).alias("factor"),
    )
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
        / F.lit(1152921504606846976.0)
    )
    rep = d.join(F.broadcast(fac), "source").select(
        "source",
        "factor",
        (
            F.floor("factor").cast("long")
            + F.when(frac < F.col("factor") - F.floor("factor"), 1).otherwise(0)
        ).alias("n_repeats"),
    )
    return rep.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.max("factor"), 6).alias("factor"),
        F.sum("n_repeats").cast("long").alias("n_emitted"),
    )


@query(
    "q156_ivf_recall_curve",
    oracle="""
    WITH n AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    piv AS (
      SELECT CAST(vec_id - 10 AS INT) AS cell, v AS pv, nrm AS pnrm
      FROM n WHERE vec_id BETWEEN 10 AND 17
    ),
    ad AS (
      SELECT n.vec_id, n.v, n.nrm, piv.cell,
             list_sum(list_transform(generate_series(1, len(n.v)),
                      i -> n.v[i] * piv.pv[i])) / (n.nrm * piv.pnrm) AS cs
      FROM n CROSS JOIN piv
    ),
    cells AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT vec_id, v, nrm, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rk
        FROM ad) WHERE rk = 1
    ),
    qc AS (
      SELECT query_id, qv, qnrm, cell, rk FROM (
        SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rk
        FROM ad WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rk <= 4
    ),
    probes AS (SELECT unnest([1, 2, 4]) AS n_probe),
    cand AS (
      SELECT p.n_probe, qc.query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(generate_series(1, len(c.v)),
                      i -> c.v[i] * qc.qv[i])) / (c.nrm * qc.qnrm) AS cs
      FROM probes p, qc, cells c
      WHERE qc.rk <= p.n_probe AND c.cell = qc.cell
    ),
    approx AS (
      SELECT n_probe, query_id, neighbor_id FROM (
        SELECT n_probe, query_id, neighbor_id,
               row_number() OVER (PARTITION BY n_probe, query_id
                                  ORDER BY cs DESC, neighbor_id) AS rnk
        FROM cand) WHERE rnk <= 10
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
          WHERE vec_id IN (0, 1, 2, 3, 4)),
    ex AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 list_sum(list_transform(generate_series(1, len(e.v)),
                          i -> e.v[i] * q.qv[i])) / (e.nrm * q.qnrm) DESC,
                 e.vec_id) AS rnk
        FROM n e, q) WHERE rnk <= 10
    )
    SELECT a.query_id, CAST(a.n_probe AS INT) AS n_probe,
           CAST(count(e.neighbor_id) AS BIGINT) AS n_hits,
           round(count(e.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM approx a
    LEFT JOIN ex e ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY a.query_id, a.n_probe
    """,
)
def q156_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN acceptance certification: recall@10 of the IVF index against
    the exact brute-force top-10, per query, at probe depths 1/2/4 of 8
    cells — the recall-vs-cost curve an index operator publishes before
    anyone is allowed to swap brute force out (the q121 sketch-
    calibration idea applied to ANN; deterministic pivot quantizer as in
    q44, so the whole curve is oracle-exact, not a threshold test).

    Scale notes: exact truth is computed only for the FIXED query panel
    (broadcast top-k scan — one corpus pass), not per corpus row; each
    probe depth reuses the same deterministic cell assignment; the
    recall join runs on (panel x k)-sized frames."""
    emb = _t(spark, sf_dir, "embeddings")
    pivots = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id").between(10, 17)).orderBy("vec_id").collect()
    ]
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
    exact = similarity.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    parts = []
    for p in (1, 2, 4):
        a = similarity.ivf_topk(
            emb, queries, k=10, n_centroids=8, n_probe=p, centroids=pivots
        )
        parts.append(
            a.select("query_id", "neighbor_id", F.lit(p).cast("int").alias("n_probe"))
        )
    approx = parts[0].unionByName(parts[1]).unionByName(parts[2])
    hits = approx.join(
        exact.withColumn("_hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
    )
    return hits.groupBy("query_id", "n_probe").agg(
        F.count("_hit").alias("n_hits"),
        F.round(F.count("_hit") / F.lit(10.0), 6).alias("recall_at_10"),
    )


@query(
    "q157_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS constraint,
           CAST(count(*) AS BIGINT) AS n_child,
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           (sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0) AS ok
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           (sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) = 0)
    FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           (sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) = 0)
    FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           (sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           (sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) = 0)
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    UNION ALL
    SELECT 'supplier.s_nationkey->nation',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           (sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) = 0)
    FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def q157_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema referential-integrity audit: for every foreign-key
    edge, the child row count and the number of orphans (child keys with
    no parent) — the ingest acceptance gate that runs before any join
    in this file is trusted (an orphaned key silently DROPS rows from
    every inner join downstream).

    Scale notes: each edge is one left join against a DISTINCT-key
    parent; parents here are dimensions (broadcast), and the fact-fact
    edge (lineitem->orders) aggregates to two counters per edge — the
    shuffle carries key + null-flag only. At 100 TB you'd run all six
    edges in one pass over each child with `observe` counters; the
    per-edge form keeps each constraint independently attributable."""
    checks = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    outs = []
    for name, child, ck, parent, pk in checks:
        c = _t(spark, sf_dir, child).select(F.col(ck).alias("_k"))
        par = _t(spark, sf_dir, parent).select(F.col(pk).alias("_k"), F.lit(1).alias("_p"))
        j = c.join(_dim(par), "_k", "left")
        outs.append(
            j.agg(
                F.lit(name).alias("constraint"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.when(F.col("_p").isNull(), 1).otherwise(0)).cast("long").alias("n_orphans"),
                (F.sum(F.when(F.col("_p").isNull(), 1).otherwise(0)) == 0).alias("ok"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@query(
    "q158_compaction_plan",
    oracle="""
    WITH per AS (
      SELECT lang, source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS part_bytes
      FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, part_bytes,
           CAST(greatest(1, ceil(part_bytes / 65536.0)) AS BIGINT) AS target_files,
           round(part_bytes / (greatest(1, ceil(part_bytes / 65536.0)) * 65536.0), 6)
             AS fill_ratio,
           (part_bytes < 32768) AS undersized
    FROM per
    """,
)
def q158_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner: per (lang, source) partition, the
    byte volume (n_chars as the proxy), the target file count at a 64 KiB
    unit (stand-in for the production 128 MB-1 GB row-group target), the
    fill ratio those files would have, and an undersized flag for
    partitions worth merging INTO a sibling — the table-maintenance pass
    every long-lived lakehouse table needs before reads degrade into
    footer-fetch storms.

    Scale notes: pure single-pass groupBy census (map-side combined,
    partition-count-sized output); the plan itself is what a compaction
    job consumes as its `repartition(target_files)` argument — the same
    shape q147's shard manifest uses for the write side."""
    d = _t(spark, sf_dir, "documents")
    unit = 65536.0
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("part_bytes"),
    )
    target = F.greatest(F.lit(1), F.ceil(F.col("part_bytes") / F.lit(unit))).cast("long")
    return per.select(
        "lang", "source", "n_docs", "part_bytes",
        target.alias("target_files"),
        F.round(F.col("part_bytes") / (target * F.lit(unit)), 6).alias("fill_ratio"),
        (F.col("part_bytes") < 32768).alias("undersized"),
    )


@query(
    "q159_token_budget_curve",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS tok,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text) END AS pr,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE {_SW_SQL} * 1.0 / len({_TOKS_SQL}) END AS sw
      FROM documents
    ),
    q AS (
      SELECT doc_id, tok,
             0.5 * least(tok / 100.0, 1.0) + 0.5 * least(sw * 5.0, 1.0)
             - 0.25 * least(pr * 5.0, 1.0) AS quality
      FROM s
    ),
    r AS (
      SELECT doc_id, tok, quality,
             row_number() OVER (ORDER BY quality DESC, doc_id) AS rk,
             count(*) OVER () AS n
      FROM q
    ),
    c AS (
      SELECT quality, tok,
             CAST(floor((rk - 1) * 10 / n) AS INT) AS decile,
             sum(tok) OVER (ORDER BY rk) AS cum_tokens
      FROM r
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(cum_tokens) AS BIGINT) AS cum_tokens,
           round(min(quality), 6) AS cutoff_quality
    FROM c GROUP BY decile
    """,
)
def q159_token_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curriculum curve: rank the corpus by quality score
    (best first) and report, per rank decile, the CUMULATIVE token count
    and the quality cutoff at the decile boundary — the planning table
    that answers "to fill a 10B-token budget with the best documents,
    where do I set the quality threshold, and how much does the tail
    cost?" (the quality-vs-volume tradeoff behind FineWeb/DCLM-style
    filtered mixes).

    Scale notes: the rank is the two-phase bucketed form
    (layout.global_rank_by_value, buckets = quality rounded to 2dp — a
    monotone coarsening, offsets bounded by the score range) — no
    single-partition sort anywhere; quality is per-row arithmetic
    (identical IEEE both engines), cumulative sums are integer-exact."""
    from phoebe_spark.operators.layout import global_rank_by_value

    d = _t(spark, sf_dir, "documents")
    q = text.quality_score(d).select("doc_id", "token_count", "quality_score")
    rk = global_rank_by_value(
        q, "quality_score", "doc_id", descending=True,
        bucket=F.round(F.col("quality_score"), 2), out_col="rk",
    )
    n1 = q.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = rk.crossJoin(F.broadcast(n1)).select(
        "doc_id", "token_count", "quality_score", "rk", "n"
    )
    c = r.select(
        "quality_score",
        "token_count",
        F.floor((F.col("rk") - 1) * 10 / F.col("n")).cast("int").alias("decile"),
        F.col("token_count"),
    )
    # cumulative tokens at each decile BOUNDARY == running sum of the
    # per-decile totals (a 10-row window), so the per-row cumulative-sum
    # global window is unnecessary
    dec = c.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").alias("dec_tokens"),
        F.round(F.min("quality_score"), 6).alias("cutoff_quality"),
    )
    cum = F.sum("dec_tokens").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    return dec.select(
        "decile",
        "n_docs",
        cum.cast("long").alias("cum_tokens"),
        "cutoff_quality",
    )


def _bpe_encode_oracle(rounds: int) -> str:
    """Generated oracle for q160: re-learn the ``rounds`` merges with the
    q145 CTE chain, then REPLAY them over every (lang, word) occurrence
    and aggregate per-language token/char totals."""
    cte = f"""
    WITH toks AS (
      SELECT lang, unnest({_TOKS_SQL}) AS t FROM documents WHERE trim(text) <> ''
    ),
    words0 AS (
      SELECT array_to_string(list_transform(generate_series(1, length(t)),
                                            i -> chr(31) || t[i] || chr(30)), '') AS w
      FROM toks WHERE length(t) >= 1
    )"""
    for r in range(1, rounds + 1):
        p = r - 1
        cte += f""",
    sy{r} AS (SELECT list_transform(
                       list_filter(string_split(w, chr(30)), x -> x <> ''),
                       x -> replace(x, chr(31), '')) AS s
              FROM words{p}),
    pr{r} AS (SELECT s[i] AS l_sym, s[i+1] AS r_sym
              FROM (SELECT s, unnest(generate_series(1, len(s) - 1)) AS i
                    FROM sy{r} WHERE len(s) >= 2)),
    best{r} AS (SELECT l_sym, r_sym, count(*) AS n FROM pr{r}
                GROUP BY l_sym, r_sym ORDER BY n DESC, l_sym ASC, r_sym ASC
                LIMIT 1),
    words{r} AS (SELECT replace(w, chr(31) || b.l_sym || chr(30) || chr(31) || b.r_sym || chr(30),
                                chr(31) || b.l_sym || b.r_sym || chr(30)) AS w
                 FROM words{p}, best{r} b)"""
    cte += """,
    wl0 AS (
      SELECT lang,
             array_to_string(list_transform(generate_series(1, length(t)),
                                            i -> chr(31) || t[i] || chr(30)), '') AS e,
             length(t) AS ch
      FROM toks WHERE length(t) >= 1
    )"""
    for r in range(1, rounds + 1):
        p = r - 1
        cte += f""",
    wl{r} AS (SELECT lang,
                     replace(e, chr(31) || b.l_sym || chr(30) || chr(31) || b.r_sym || chr(30),
                             chr(31) || b.l_sym || b.r_sym || chr(30)) AS e, ch
              FROM wl{p}, best{r} b)"""
    return (
        cte
        + f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(ch) AS BIGINT) AS n_chars,
           CAST(sum(len(list_filter(string_split(e, chr(30)), x -> x <> ''))) AS BIGINT)
             AS n_tokens,
           round(sum(len(list_filter(string_split(e, chr(30)), x -> x <> ''))) * 1.0
                 / count(*), 6) AS tokens_per_word,
           round(sum(ch) * 1.0
                 / sum(len(list_filter(string_split(e, chr(30)), x -> x <> ''))), 6)
             AS chars_per_token
    FROM wl{rounds} GROUP BY lang"""
    )


@query("q160_bpe_encode", oracle=_bpe_encode_oracle(5))
def q160_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — the apply half of the q145 trainer: learn 5 merges on
    the corpus, replay them over every word occurrence, and report
    per-language tokenizer-efficiency stats (tokens/word and chars/token
    — the fertility and compression numbers that decide whether a
    tokenizer is paying for itself on each language). Completes the
    tokenizer lifecycle: q140 pair stats -> q145 training -> q160
    encoding; the oracle re-learns AND re-applies every merge, so both
    halves are certified digit-for-digit.

    Scale notes: the merge table is model state (5 rows, collected like
    q145); encoding is a chain of 5 literal string ``replace`` exprs in
    ONE codegen scan pass — per-token cost is independent of corpus
    size, no shuffle until the ~languages-sized rollup."""
    from phoebe_spark.operators.text import BPE_END, BPE_SEP

    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    corpus_words = d.select(F.explode(text.tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 1
    )
    merges = text.bpe_train(corpus_words, rounds=5)

    wl = d.select("lang", F.explode(text.tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 1
    )
    enc = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.concat(F.lit(BPE_SEP), F.substring(F.col("w"), i, F.lit(1)), F.lit(BPE_END)),
        ),
        "",
    )
    for _, l_sym, r_sym, merged, _n in merges:
        enc = F.replace(
            enc,
            F.lit(BPE_SEP + l_sym + BPE_END + BPE_SEP + r_sym + BPE_END),
            F.lit(BPE_SEP + merged + BPE_END),
        )
    n_tok = F.size(F.filter(F.split(enc, BPE_END), lambda x: x != ""))
    per = wl.select("lang", F.length("w").alias("ch"), n_tok.alias("nt"))
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("ch").cast("long").alias("n_chars"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.round(F.sum("nt") / F.count(F.lit(1)), 6).alias("tokens_per_word"),
        F.round(F.sum("ch") / F.sum("nt"), 6).alias("chars_per_token"),
    )


@query(
    "q161_source_data_card",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, lang, n_chars,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS tok,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text) END AS pr,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE {_SW_SQL} * 1.0 / len({_TOKS_SQL}) END AS sw,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    q AS (
      SELECT *,
             CAST(round(0.5 * least(tok / 100.0, 1.0) + 0.5 * least(sw * 5.0, 1.0)
                        - 0.25 * least(pr * 5.0, 1.0), 6) AS DECIMAL(18,6)) AS quality
      FROM s
    ),
    fp AS (
      SELECT source, fp, count(*) AS c FROM q GROUP BY source, fp
    ),
    dup AS (
      SELECT source, CAST(sum(c - 1) AS BIGINT) AS n_dup_docs FROM fp GROUP BY source
    )
    SELECT q.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(q.tok) AS BIGINT) AS total_tokens,
           CAST(sum(q.n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT q.lang) AS BIGINT) AS n_langs,
           round(CAST(sum(q.quality) AS DOUBLE) / count(*), 6) AS mean_quality,
           CAST(sum(CASE WHEN q.tok = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
           max(dup.n_dup_docs) AS n_dup_docs,
           round(max(dup.n_dup_docs) * 1.0 / count(*), 6) AS dup_rate
    FROM q JOIN dup ON dup.source = q.source
    GROUP BY q.source
    """,
)
def q161_source_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data card: the one-row-per-feed summary a dataset ships
    with — volume (docs/tokens/chars), language spread, mean quality
    score, empty-doc count, and the exact-duplicate rate — composing the
    quality (q10), fingerprint-dedup (q08), and census primitives into
    the acceptance sheet reviewed before a source enters the mix.

    Scale notes: ONE corpus scan computes tokens/quality/fingerprint
    side by side; the dup census is a (source, fingerprint) groupBy that
    reuses the same scan output; per-row quality is rounded then carried
    as DECIMAL so the mean is order-independent (the q119 lesson
    pre-applied). Output is sources-sized."""
    d = _t(spark, sf_dir, "documents")
    q = text.quality_score(d).select(
        "doc_id", "source", "lang", "n_chars", "token_count",
        F.round("quality_score", 6).cast("decimal(18,6)").alias("quality"),
        F.md5(
            F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
        ).alias("fp"),
    ).localCheckpoint(eager=True)
    dup = (
        q.groupBy("source", "fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(F.sum(F.col("c") - 1).cast("long").alias("n_dup_docs"))
    )
    card = q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.round(F.sum("quality").cast("double") / F.count(F.lit(1)), 6).alias("mean_quality"),
        F.sum(F.when(F.col("token_count") == 0, 1).otherwise(0)).cast("long").alias("n_empty"),
    )
    return card.join(F.broadcast(dup), "source").select(
        "source", "n_docs", "total_tokens", "total_chars", "n_langs",
        "mean_quality", "n_empty", "n_dup_docs",
        F.round(F.col("n_dup_docs") * 1.0 / F.col("n_docs"), 6).alias("dup_rate"),
    )


@query(
    "q162_bilateral_trade",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q162_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    specific nations in each direction, by ship year — the
    two-dimension-chain fact join (lineitem->supplier-nation AND
    lineitem->orders->customer-nation on the SAME fact row).

    Scale notes: supplier/customer/nation are broadcast dims and the
    nation filters prune the build sides before broadcast, so the only
    shuffle is lineitem->orders (fact-fact, both sides pre-filtered by
    the broadcast semi-effect of the dim joins); money rides the
    DECIMAL policy; output is 2 x years rows."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ("NATION_1", "NATION_2")
    cn = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        l.join(_dim(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_snk"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(_dim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cnk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(_dsum2(rev).alias("revenue"))
    )


@query(
    "q163_market_share",
    oracle="""
    WITH eur AS (
      SELECT year(l.l_shipdate) AS yr,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))) AS rev,
             (sn.n_name = 'NATION_3') AS is_target
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'EUROPE'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    )
    SELECT CAST(yr AS INT) AS ship_year,
           CAST(round(sum(CASE WHEN is_target THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
             AS target_revenue,
           CAST(round(sum(rev), 2) AS DOUBLE) AS total_revenue,
           round(CAST(round(sum(CASE WHEN is_target THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
                 / CAST(round(sum(rev), 2) AS DOUBLE), 6) AS mkt_share
    FROM eur GROUP BY yr
    """,
)
def q163_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): within the EUROPE customer
    market, the share of revenue supplied by one nation, per ship year —
    numerator and denominator in ONE conditional aggregate over a single
    join tree (no second scan, no self-join; the q134 promo-share
    pattern generalized across a dim chain).

    Scale notes: all dims broadcast (region filter prunes nation->
    customer before broadcast); one fact-fact shuffle (lineitem->orders);
    the share division happens on 2-decimal-rounded DOUBLEs, identical
    in both engines."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("_cnk")
    )
    sn = n.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,4)")
    eur = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_dim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cnk"))
        .join(_dim(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_snk"))
        .select(
            F.year("l_shipdate").cast("int").alias("ship_year"),
            rev.alias("rev"),
            (F.col("supp_nation") == "NATION_3").alias("is_target"),
        )
    )
    tgt = F.round(F.sum(F.when(F.col("is_target"), F.col("rev")).otherwise(zero)), 2).cast("double")
    tot = F.round(F.sum("rev"), 2).cast("double")
    return eur.groupBy("ship_year").agg(
        tgt.alias("target_revenue"),
        tot.alias("total_revenue"),
        F.round(tgt / tot, 6).alias("mkt_share"),
    )


@query(
    "q164_returned_items",
    oracle="""
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
             CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                            * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                  AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-04-01'
      GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    )
    SELECT c_custkey, c_name, nation, c_acctbal, revenue
    FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rn FROM rev)
    WHERE rn <= 20
    """,
)
def q164_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): the 20 customers who
    generated the most revenue on returned lines in one quarter — the
    triage list an account team works through.

    Scale notes: returnflag + orderdate predicates push to the scans
    before the fact-fact shuffle; customer/nation broadcast; the top-20
    is a rank over the customers-sized aggregate (revenue is
    decimal-rounded BEFORE ranking and ties break on c_custkey, so the
    cut line is deterministic in both engines). At 100 TB the rank input
    is customers-sized, not fact-sized."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_dim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "nation", "c_acctbal")
        .agg(_dsum2(rev).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("c_custkey", "c_name", "nation", "c_acctbal", "revenue")
    )


@query(
    "q165_order_count_distribution",
    oracle="""
    WITH oc AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM oc GROUP BY c_count
    """,
)
def q165_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): histogram of customers by
    how many qualifying orders they placed, INCLUDING the zero-order
    customers the left join preserves — the double-aggregate shape
    (per-customer count, then count-of-counts).

    Scale notes: the priority filter lands on the orders scan pre-join;
    the left join shuffles both sides on custkey once; the second
    aggregate's input is customers-sized and its output is
    max-order-count-sized (tiny). No broadcast: at 100 TB both sides of
    the first join are large, which is exactly when the shuffle
    hash join is the right plan."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q166_top_supplier",
    oracle="""
    WITH srev AS (
      SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM srev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM srev)
    """,
)
def q166_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) whose shipped
    revenue over one quarter equals the global maximum — the
    agg-vs-its-own-extreme shape Q15 writes as a view + scalar subquery.

    Scale notes: the quarter filter pushes to the scan; the per-supplier
    aggregate is map-side combined to a suppliers-sized frame; the global
    max is a 1-row frame broadcast back (no second fact scan, no window
    over the whole aggregate); ties are kept, matching the SQL. Revenue
    is decimal-rounded before the equality so both engines cut
    identically."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    srev = l.groupBy("l_suppkey").agg(_dsum2(rev).alias("total_revenue"))
    mx = srev.agg(F.max("total_revenue").alias("_mx"))
    return (
        srev.join(F.broadcast(mx), srev.total_revenue == F.col("_mx"))
        .join(_dim(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q167_small_qty_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*)) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) / 7.0, 6)
             AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.qty_thresh
    """,
)
def q167_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): yearly revenue
    lost if orders below 20% of a part's average order quantity were not
    taken — the correlated-average shape (each fact row compared to its
    own group's aggregate).

    Scale notes: the correlated subquery decorrelates into a parts-sized
    per-part threshold frame joined back on partkey — broadcastable at
    any scale since it is one row per part; the brand filter prunes via
    the broadcast part join before the threshold comparison. The
    threshold is an exact decimal sum divided by an exact count, so the
    `<` cut is bit-identical in both engines."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    pa = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_thresh")
    )
    return (
        l.join(_dim(p), l.l_partkey == p.p_partkey)
        .join(pa, l.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.round(F.sum(_dec("l_extendedprice")), 2).cast("double") / 7.0, 6).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q168_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                          - CAST(p.p_retailprice * 0.5 AS DECIMAL(18,4))
                            * CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q168_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier-nation,
    per-order-year profit on one product line. This schema has no
    partsupp, so unit cost is proxied as half the part's retail price —
    the join/aggregate shape (fact x 3 dims x orders, name-pattern dim
    filter) is what Q9 exercises.

    Scale notes: the p_name LIKE filter prunes part BEFORE broadcast and
    its broadcast join semi-filters the fact scan; supplier/nation
    broadcast; the only shuffle is lineitem->orders. The cost factor is
    folded to DECIMAL(18,4) per part row (double halving is exact), so
    the summed profit is order-independent under the decimal policy."""
    l = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", (F.col("p_retailprice") * 0.5).cast("decimal(18,4)").alias("_unit_cost"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,4)") - _dec("l_discount")
    ) - F.col("_unit_cost") * _dec("l_quantity")
    return (
        l.join(_dim(p), l.l_partkey == p.p_partkey)
        .join(_dim(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(_dsum2(profit).alias("profit"))
    )


@query(
    "q169_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q169_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers actually shipped parts of each surviving (brand, type,
    size) combination, excluding deny-listed suppliers (negative account
    balance stands in for Q16's complaints predicate).

    Scale notes: all three p_* predicates prune part before its
    broadcast join semi-filters the fact scan; the deny-list is a
    6-row broadcast ANTI join (never a NOT IN materialization); the
    distinct-supplier count shuffles once on the group key with
    partial distinct aggregation map-side."""
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    deny = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(_dim(deny), l.l_suppkey == deny.s_suppkey, "left_anti")
        .join(_dim(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def _lsh_planes(k: int = 4, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes, generated once driver-side and
    embedded as LITERALS in both the Spark plan and the oracle SQL — the
    two engines must agree bit-for-bit on every plane component or sign
    decisions near zero diverge."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [[float(x) for x in rng.standard_normal(dim)] for _ in range(k)]


def _lsh_oracle_sql() -> str:
    planes = _lsh_planes()
    dim = len(planes[0])

    def plane_dot(p: list[float]) -> str:
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]))"
        )

    bucket = " + ".join(
        f"(CASE WHEN {plane_dot(p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    pair_dot = (
        "list_sum(list_transform(generate_series(1, len(a.embedding)), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    return f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
             {bucket} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({pair_dot} / (a.nrm * b.nrm), 6) AS cos_sim
    FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {pair_dot} / (a.nrm * b.nrm) >= 0.4
    """


@query("q170_lsh_neardup_pairs", oracle=_lsh_oracle_sql())
def q170_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-duplicate pairs (random-hyperplane signatures,
    Charikar 2002 SimHash family): vectors landing in the same
    sign-of-dot-product bucket are the only candidate pairs, and exact
    cosine runs within buckets only — the sub-quadratic scale path the
    exact all-pairs scan (q41) refuses above its row guard. The oracle
    replays the SAME literal planes in SQL, so bucket assignment and the
    surviving pair set are checked end-to-end, not just recall-sampled.

    Scale notes: one scan computes all k sign bits (codegen aggregate
    per plane, no Python); ONE shuffle on the ~uniform bucket key; the
    within-bucket self-join is quadratic only in bucket size, tunable by
    plane count (2^k buckets). False negatives are the LSH contract —
    tested recall lives in test_similarity; THIS entry pins determinism
    and exactness of what the buckets do emit."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_bucketed_pairs(e, _lsh_planes(), threshold=0.4)


@query(
    "q171_measure_profile_unpivot",
    oracle="""
    WITH long AS (
      SELECT 'l_quantity' AS measure, l_quantity AS v FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure,
           CAST(count(*) AS BIGINT) AS n,
           round(min(v), 6) AS min_v,
           round(max(v), 6) AS max_v,
           CAST(round(sum(CAST(v AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_v,
           round(CAST(round(sum(CAST(v AS DECIMAL(18,4))), 2) AS DOUBLE) / count(*), 6) AS mean_v
    FROM long GROUP BY measure
    """,
)
def q171_measure_profile_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long measure profile via UNPIVOT (`stack`): the four
    lineitem measures melt to (measure, value) rows inside the scan
    projection, then one grouped aggregate profiles each — the
    data-quality sweep shape that would otherwise be four scans or four
    ad-hoc agg columns.

    Scale notes: stack is a codegen row-expansion in the scan stage (NO
    shuffle for the melt; 4x row fan-out but each long row is 2 narrow
    columns); the profile aggregate map-side combines to a 4-group
    shuffle. The oracle's UNION ALL is DuckDB's spelling of the same
    relational algebra."""
    l = _t(spark, sf_dir, "lineitem")
    long = l.selectExpr(
        "stack(4, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, "
        "'l_discount', l_discount, 'l_tax', l_tax) AS (measure, v)"
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
        _dsum2(_dec("v")).alias("sum_v"),
        F.round(_dsum2(_dec("v")) / F.count(F.lit(1)), 6).alias("mean_v"),
    )


@query(
    "q172_grouping_id_rollup",
    oracle="""
    SELECT CASE WHEN GROUPING(c.c_mktsegment) = 1 THEN NULL ELSE c.c_mktsegment END AS segment,
           CASE WHEN GROUPING(o.o_orderpriority) = 1 THEN NULL ELSE o.o_orderpriority END AS priority,
           CAST(GROUPING(c.c_mktsegment) * 2 + GROUPING(o.o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY ROLLUP (c.c_mktsegment, o.o_orderpriority)
    """,
)
def q172_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id: subtotal rows are tagged by WHICH columns
    were rolled up, not by NULL-coalescing sentinel strings — the
    disambiguation q49/q81 sidestep (a real NULL group value and a
    subtotal row are indistinguishable without GROUPING). gid = 0 detail,
    1 per-segment subtotal, 3 grand total.

    Scale notes: one pass, grouping-set expansion with map-side partials;
    customer broadcasts onto the orders scan; output is
    (segments x priorities)-sized."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(_dim(c), c.c_custkey == o.o_custkey)
    return (
        j.rollup(F.col("c_mktsegment").alias("segment"), F.col("o_orderpriority").alias("priority"))
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            _dsum2(_dec("o_totalprice")).alias("revenue"),
        )
        .select("segment", "priority", "gid", "n_orders", "revenue")
    )


@query(
    "q173_lang_embedding_coherence",
    oracle="""
    WITH e AS (
      SELECT d.lang, em.vec_id, em.embedding
      FROM documents d JOIN embeddings em ON em.vec_id = d.doc_id
    ),
    fan AS (
      -- dim taken from each row's own list length (select-list unnest is
      -- lateral): stays correct if the table is regenerated at another
      -- dimensionality, where a hardcoded series would silently truncate
      SELECT lang, vec_id, unnest(generate_series(1, len(embedding))) AS pos, embedding
      FROM e
    ),
    long AS (
      SELECT lang, vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val FROM fan
    ),
    cent AS (
      SELECT lang, pos, sum(val) / count(*) AS c FROM long GROUP BY lang, pos
    ),
    pv AS (
      SELECT l.lang, l.vec_id,
             sum(l.val * cent.c) AS dot,
             sum(l.val * l.val) AS v2,
             sum(cent.c * cent.c) AS c2
      FROM long l JOIN cent ON cent.lang = l.lang AND cent.pos = l.pos
      GROUP BY l.lang, l.vec_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(dot / (sqrt(v2) * sqrt(c2))) / count(*), 6) AS mean_coherence
    FROM pv GROUP BY lang
    """,
)
def q173_lang_embedding_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal corpus diagnostic: per language, the mean cosine of
    each document's embedding to its language centroid — low coherence
    flags mislabeled language tags or polluted embedding spaces before a
    semantic-dedup or clustering stage trusts them. Joins the text table
    to the embedding table (doc_id = vec_id), i.e. the two modalities a
    training pipeline must keep aligned.

    Scale notes: vectors fan long-form via posexplode inside the scan
    stage; the centroid is a (langs x dims)-sized aggregate with map-side
    partials; the score join re-keys on the composite (lang, dim) —
    skew-free because dims stripe every language evenly. Float sums are
    order-sensitive in the last bits (both engines round at 1e-6, ~9
    orders above the reorder noise)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    em = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    long = (
        d.join(em, d.doc_id == em.vec_id)
        .select("lang", "vec_id", F.posexplode("embedding").alias("pos", "_v"))
        .select("lang", "vec_id", "pos", F.col("_v").cast("double").alias("val"))
    )
    cent = long.groupBy("lang", "pos").agg(
        (F.sum("val") / F.count(F.lit(1))).alias("c")
    )
    pv = (
        long.join(cent, ["lang", "pos"])
        .groupBy("lang", "vec_id")
        .agg(
            F.sum(F.col("val") * F.col("c")).alias("dot"),
            F.sum(F.col("val") * F.col("val")).alias("v2"),
            F.sum(F.col("c") * F.col("c")).alias("c2"),
        )
    )
    return pv.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("dot") / (F.sqrt("v2") * F.sqrt("c2"))) / F.count(F.lit(1)), 6
        ).alias("mean_coherence"),
    )


@query(
    "q174_dup_pair_embedding_audit",
    oracle=rf"""
    WITH f AS (
      SELECT doc_id, {_PREFIX_FP_SQL} AS fp
      FROM documents
    ),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ),
    n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    c AS (
      SELECT p.id_a, p.id_b,
             list_sum(list_transform(generate_series(1, len(ea.embedding)),
                      i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
               / (ea.nrm * eb.nrm) AS cos
      FROM p JOIN n ea ON ea.vec_id = p.id_a JOIN n eb ON eb.vec_id = p.id_b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(cos) / count(*), 6) AS mean_cos,
           round(min(cos), 6) AS min_cos
    FROM c
    """,
)
def q174_dup_pair_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal consistency audit: every text near-dup CANDIDATE pair
    (matching 80-char normalized-prefix fingerprint — the prefix-bucket
    candidate generator) scored by embedding cosine. Textual near-dups
    whose embeddings disagree flag a broken embed pipeline (stale
    vectors, misaligned ids) before any embedding-based dedup or
    retrieval trusts the space; min_cos is the alarm line, mean_cos the
    health trend.

    Scale notes: the fingerprint self-join touches only dup groups
    (groups of 1 produce no pairs); pair count is bounded by the planted
    dup rate, so the two embedding joins are candidate-sized equi-joins —
    never corpus x corpus; cosine is the same ordered JVM aggregate the
    q41 oracle proved bit-compatible."""
    d = _t(spark, sf_dir, "documents")
    em = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", similarity.norm(F.col("embedding")).alias("nrm")
    )
    f = d.select("doc_id", _prefix_fp().alias("fp"))
    a = f.select(F.col("doc_id").alias("id_a"), "fp")
    b = f.select(F.col("doc_id").alias("id_b"), "fp")
    p = a.join(b, "fp").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    ea = em.select(F.col("vec_id").alias("_va"), F.col("embedding").alias("_ea"), F.col("nrm").alias("_na"))
    eb = em.select(F.col("vec_id").alias("_vb"), F.col("embedding").alias("_eb"), F.col("nrm").alias("_nb"))
    cos = similarity.dot(F.col("_ea"), F.col("_eb")) / (F.col("_na") * F.col("_nb"))
    c = (
        p.join(ea, p.id_a == F.col("_va"))
        .join(eb, p.id_b == F.col("_vb"))
        .select(cos.alias("cos"))
    )
    return c.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("cos") / F.count(F.lit(1)), 6).alias("mean_cos"),
        F.round(F.min("cos"), 6).alias("min_cos"),
    )


@query(
    "q175_trailing_range_window",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, {EPOCH_SQL.format(c='ts')} AS ts_s,
             CAST(value AS DECIMAL(18,4)) AS v
      FROM events
    )
    SELECT event_id, user_id, ts_s,
           CAST(count(*) OVER w AS BIGINT) AS n_5min,
           CAST(round(sum(v) OVER w, 2) AS DOUBLE) AS sum_5min
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                 RANGE BETWEEN 300 PRECEDING AND CURRENT ROW)
    """,
)
def q175_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: at every event, the count and value sum
    of the same user's events in the trailing 300 SECONDS — a frame
    bounded by the ORDER BY value, not by row counts, so bursts widen the
    frame and quiet periods shrink it (the per-entity rate/limit signal
    rowsBetween cannot express when event cadence is irregular).

    Scale notes: one shuffle on user_id; the range frame is evaluated by
    a sliding scan within each sorted partition (no self-join
    materialization of the 300 s neighborhood); tied timestamps are frame
    peers in both engines by the RANGE contract; the value sum rides the
    DECIMAL policy so the sliding accumulation order cannot show."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id", _epoch("ts").alias("ts_s"), _dec("value").alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-300, 0)
    return e.select(
        "event_id", "user_id", "ts_s",
        F.count(F.lit(1)).over(w).alias("n_5min"),
        F.round(F.sum("v").over(w), 2).cast("double").alias("sum_5min"),
    )


@query(
    "q176_forecast_revenue_change",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q176_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the revenue that would vanish
    if small-quantity, mid-discount lines shipped in one year had their
    discounts eliminated — the pure scan-filter-aggregate probe of
    predicate pushdown on three columns at once.

    Scale notes: every predicate reaches the parquet scan (date range,
    discount band, quantity cap), the projection reads only the four
    touched columns, and the single global aggregate is a map-side
    partial + 1-row final — the cheapest possible shape at any scale."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum2(_dec("l_extendedprice") * _dec("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q177_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q177_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per nation where the
    CUSTOMER'S nation equals the SUPPLIER'S nation inside one region and
    order year — the defining Q5 twist is that equality between two dim
    chains hanging off the same fact row (q05/q43 group by one chain
    only).

    Scale notes: region->nation prunes the broadcast nation dim first;
    customer and supplier broadcast; the local-supplier equality is a
    post-broadcast filter on the fact row (no extra shuffle); the only
    shuffle join is lineitem->orders with the date predicate pushed to
    the orders scan."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(_dim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(_dim(s), l.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("nation")
        .agg(_dsum2(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "q178_quality_dup_curve",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS tok,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text) END AS pr,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE {_SW_SQL} * 1.0 / len({_TOKS_SQL}) END AS sw,
             {_PREFIX_FP_SQL} AS fp
      FROM documents
    ),
    q AS (
      SELECT doc_id, tok, fp,
             CAST(round(0.5 * least(tok / 100.0, 1.0) + 0.5 * least(sw * 5.0, 1.0)
                        - 0.25 * least(pr * 5.0, 1.0), 6) AS DECIMAL(18,6)) AS quality
      FROM s
    ),
    c AS (SELECT fp, count(*) AS cnt FROM q GROUP BY fp),
    d AS (
      SELECT q.doc_id, q.tok, q.quality, (c.cnt > 1) AS is_dup,
             ntile(10) OVER (ORDER BY q.quality, q.doc_id) AS decile
      FROM q JOIN c ON c.fp = q.fp
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           round(CAST(sum(quality) AS DOUBLE) / count(*), 6) AS mean_quality,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_rate
    FROM d GROUP BY decile
    """,
)
def q178_quality_dup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile duplication curve: split the corpus into quality
    deciles and report each decile's near-dup-candidate rate (80-char
    prefix-fingerprint buckets, the q174 signal) — the standard dataset-
    paper analysis that tells a curation pipeline whether aggressive
    dedup should run BEFORE or AFTER the quality gate (boilerplate is
    usually both low-quality and duplicated; if dup_rate concentrates in
    the bottom deciles, the quality gate removes most dups for free).

    Scale notes: one scan computes quality + fingerprint; the dup census
    is fingerprint-keyed with map-side combining; deciles come from the
    two-phase bucketed rank + exact NTILE arithmetic (buckets = quality
    rounded to 2dp) — no single-partition sort anywhere in the plan."""
    from phoebe_spark.operators.layout import exact_ntile_expr, global_rank_by_value

    d = _t(spark, sf_dir, "documents")
    q = text.quality_score(d).select(
        "doc_id",
        F.col("token_count").alias("tok"),
        F.round("quality_score", 6).cast("decimal(18,6)").alias("quality"),
        _prefix_fp().alias("fp"),
    )
    c = q.groupBy("fp").agg(F.count(F.lit(1)).alias("cnt"))
    rk = global_rank_by_value(
        q, "quality", "doc_id", descending=False,
        bucket=F.round(F.col("quality"), 2),
    )
    n1 = q.agg(F.count(F.lit(1)).cast("long").alias("__nn"))
    dd = (
        rk.crossJoin(F.broadcast(n1))
        .join(c, "fp")
        .select(
            "doc_id", "tok", "quality",
            (F.col("cnt") > 1).alias("is_dup"),
            exact_ntile_expr("r", "__nn", 10).cast("int").alias("decile"),
        )
    )
    return dd.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.round(F.sum("quality").cast("double") / F.count(F.lit(1)), 6).alias("mean_quality"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("long").alias("n_dup_docs"),
        F.round(
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)) * 1.0 / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


@query(
    "q179_streaming_dedup_drain",
    oracle=rf"""
    WITH f AS (
      SELECT doc_id, source, {_PREFIX_FP_SQL} AS fp
      FROM documents
    ),
    surv AS (SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY fp)
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(surv.doc_id) AS BIGINT) AS n_survivors
    FROM f LEFT JOIN surv ON surv.fp = f.fp AND surv.doc_id = f.doc_id
    GROUP BY f.source
    """,
)
def q179_streaming_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING operator inside the correctness gate: run the
    streaming exact-dedup gate (streaming/stateful.py, the
    applyInPandasWithState first-occurrence filter) over the documents
    table AS A STREAM, drain it, and report per-source document and
    survivor counts. The gate's tie-break is (event_time, doc_id) and
    event_time is held constant here, so the drained survivor set is
    deterministically min(doc_id) per fingerprint — which is exactly what
    the batch SQL oracle computes. One operator, two execution models,
    one answer: the streaming path is held to the same hash-checked
    standard as every batch query.

    Scale notes: in production the stream is the ingest feed and state is
    TTL-bounded; here the drain is one availableNow pass (state =
    distinct fingerprints). The survivor join back to sources is
    fingerprint-keyed."""
    import shutil
    import tempfile

    from phoebe_spark.streaming.stateful import streaming_dedup_gate

    d = _t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="q179_")
    src_dir = f"{work}/src"
    try:
        # ONE fingerprint scan, materialized once: the same parquet is the
        # streaming source (schema-pruned to the gate's 3 columns) AND the
        # batch side of the final per-source aggregate. The gate tie-breaks
        # doc_id as a STRING: zero-pad so string order == numeric order and
        # the drained survivor is min(doc_id).
        d.select(
            _prefix_fp().alias("fp"),
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("doc_id"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("event_time"),
            "source",
        ).write.parquet(src_dir)

        stream = spark.readStream.schema(
            "fp STRING, doc_id STRING, event_time TIMESTAMP"
        ).parquet(src_dir)
        gate = streaming_dedup_gate(stream)  # ttl_ms=None: drain terminates
        sink = f"{work}/survivors"
        # fingerprint state doesn't need the session's shuffle width: the
        # state store pins its partition count from the first batch and
        # every micro-batch pays per-partition state/Python-worker
        # overhead — drain narrow (fresh checkpoint each run) and restore
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                gate.writeStream.outputMode("append")
                .foreachBatch(lambda bdf, _bid: bdf.write.mode("append").parquet(sink))
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q179: streaming dedup drain did not finish within 300 s — "
                    "refusing to report a partial survivor set"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        staged = spark.read.parquet(src_dir)
        # unhinted join: survivors ~= distinct fingerprints (corpus-sized at
        # scale) — let the planner pick the strategy
        surv = spark.read.parquet(sink).select(F.col("doc_id").alias("_sid"))
        out = (
            staged.join(surv, staged.doc_id == F.col("_sid"), "left")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count("_sid").alias("n_survivors"),
            )
        )
        # materialize (sources-sized) so the scratch dir can be removed —
        # a lazily-returned frame would still be reading from it
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q180_streaming_window_drain",
    oracle=f"""
    SELECT ({EPOCH_SQL.format(c='ts')} // 60) * 60 AS win_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q180_streaming_window_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING windowed aggregation inside the hash-checked gate: the
    events table replayed as a stream through a per-type tumbling
    1-minute window aggregate (the reference's keyed-window job shape,
    SURVEY §2.10), drained in complete mode, and compared against the
    batch GROUP BY on the same minute buckets — the streaming-vs-batch
    equivalence the unit tests assert, promoted to the oracle gate.

    Scale notes: complete mode is the DRAIN contract only (final state
    snapshot, foreachBatch overwrite); production uses append + watermark
    (streaming/jobs.py `windowed_keyed_agg`). The value sum rides the
    DECIMAL policy so streaming partial-aggregation order matches the
    batch engines."""
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q180_")
    src_dir = f"{work}/src"
    try:
        ev.select(
            F.expr("timestamp_micros(ts div 1000)").alias("event_time"),
            "event_type",
            _dec("value").alias("v"),
        ).write.parquet(src_dir)

        stream = spark.readStream.schema(
            "event_time TIMESTAMP, event_type STRING, v DECIMAL(18,4)"
        ).parquet(src_dir)
        agg = (
            stream.groupBy(F.window("event_time", "1 minute"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("v"), 2).cast("double").alias("total_value"),
            )
        )
        sink = f"{work}/windows"
        # minute-bucket state doesn't need the session's shuffle width —
        # drain narrow (fresh checkpoint each run) and restore
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                agg.writeStream.outputMode("complete")
                .foreachBatch(lambda bdf, _bid: bdf.write.mode("overwrite").parquet(sink))
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q180: streaming window drain did not finish within 300 s — "
                    "refusing to report a partial state snapshot"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        out = spark.read.parquet(sink).select(
            F.col("window.start").cast("long").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        # materialize (minute-buckets-sized) so the scratch dir can go
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q181_calendar_gap_audit",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', min(o_orderdate)) AS lo,
             date_trunc('day', max(o_orderdate)) AS hi
      FROM orders
    ),
    cal AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
    ),
    act AS (SELECT DISTINCT date_trunc('day', o_orderdate) AS d FROM orders)
    SELECT strftime(cal.d, '%Y-%m-%d') AS gap_day, dayname(cal.d) AS dow
    FROM cal LEFT JOIN act ON act.d = cal.d
    WHERE act.d IS NULL
    """,
)
def q181_calendar_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-gap audit: generate the full day calendar between the
    first and last order date (`sequence` + explode — rows the data does
    NOT contain) and anti-join the active days away, leaving the days
    with zero orders — the ingestion-outage / upstream-feed-gap check a
    daily pipeline runs before trusting day-over-day metrics. A day
    missing from the fact table is invisible to every GROUP BY; only a
    generated calendar can surface it.

    Scale notes: the calendar is bounds-derived (two-value aggregate,
    broadcast back), thousands of rows regardless of fact size; the
    distinct-day frame collapses the fact table map-side before the
    anti join, so the join is days x days."""
    o = _t(spark, sf_dir, "orders")
    b = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    cal = b.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    act = o.select(F.date_trunc("day", F.col("o_orderdate")).alias("d")).distinct()
    return (
        cal.join(act, "d", "left_anti")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("gap_day"),
            F.date_format("d", "EEEE").alias("dow"),
        )
    )


@query(
    "q182_leakage_safe_split",
    oracle=f"""
    WITH f AS (SELECT doc_id, {_PREFIX_FP_SQL} AS fp FROM documents),
    r AS (SELECT fp, min(doc_id) AS rep FROM f GROUP BY fp),
    a AS (
      SELECT fp, rep,
             CAST(('0x' || substring(md5(CAST(rep AS VARCHAR) || '|v1'), 1, 15)) AS BIGINT)
               % 10000 AS bucket
      FROM r
    ),
    s AS (SELECT fp, CASE WHEN bucket < 9000 THEN 'train'
                          WHEN bucket < 9500 THEN 'val'
                          ELSE 'test' END AS split FROM a)
    SELECT s.split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT f.fp) AS BIGINT) AS n_groups,
           min(f.doc_id) AS min_doc, max(f.doc_id) AS max_doc
    FROM f JOIN s ON s.fp = f.fp
    GROUP BY 1
    """,
)
def q182_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (:func:`sampling.leakage_safe_split`):
    documents are grouped by the shared 80-char prefix fingerprint (the
    near-dup signal of q174/q178/q179) and the whole group inherits the
    deterministic hash split of its min-doc_id representative — so a
    near-duplicate pair can never land train-side AND test-side, the
    contamination path a row-wise q55 split leaves open. The oracle
    re-derives group, representative, bucket, and label independently.
    Aggregated per split so the compare is sensitive to every doc's
    assignment."""
    d = _t(spark, sf_dir, "documents").select("doc_id", _prefix_fp().alias("fp"))
    s = sampling.leakage_safe_split(d, group_col="fp")
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_groups"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "q183_source_length_ks",
    oracle="""
    WITH cnt AS (
      SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2
    ),
    per AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cnt GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
    vals AS (SELECT DISTINCT v FROM cnt),
    vcum AS (
      SELECT v, sum(tc) OVER (ORDER BY v) AS cum_all
      FROM (SELECT v, sum(c) AS tc FROM cnt GROUP BY v)
    ),
    grid AS (SELECT p.source, p.ns, x.v FROM per p CROSS JOIN vals x),
    scum AS (
      SELECT g.source, g.ns, g.v,
             sum(coalesce(cnt.c, 0))
               OVER (PARTITION BY g.source ORDER BY g.v) AS cum_s
      FROM grid g LEFT JOIN cnt ON cnt.source = g.source AND cnt.v = g.v
    )
    SELECT s.source, s.ns AS n_docs,
           round(max(abs(s.cum_s * 1.0 / s.ns
                 - (vc.cum_all - s.cum_s) * 1.0 / (t.n - s.ns))), 6) AS ks_stat
    FROM scum s JOIN vcum vc ON vc.v = s.v CROSS JOIN tot t
    GROUP BY s.source, s.ns
    """,
)
def q183_source_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-drift audit: the two-sample
    Kolmogorov-Smirnov statistic of each source's document-length
    distribution against the REST of the corpus — the standard "did this
    feed change shape" gate before a source is admitted into a training
    mix (mean/stddev gates miss bimodal drift; KS does not).

    Scale shape: lengths collapse to (source, value, count) map-side
    first, so everything after is (sources x distinct-lengths)-sized —
    bounded by the length domain, independent of corpus rows. Both ECDFs
    come from ONE cumulative window over the shared value grid (rest =
    global cum minus source cum; no second pass), and the max-deviation
    is an ordinary groupBy max."""
    d = _t(spark, sf_dir, "documents")
    # the census feeds FIVE downstream branches (per/tot/vals/vcum/scum):
    # materialize the (sources x distinct-lengths)-sized frame once so the
    # corpus is scanned once, not once per branch
    cnt = (
        d.groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    per = cnt.groupBy("source").agg(F.sum("c").alias("ns"))
    tot = cnt.agg(F.sum("c").alias("n"))
    vals = cnt.select("v").distinct()
    vcum = (
        cnt.groupBy("v")
        .agg(F.sum("c").alias("tc"))
        .withColumn("cum_all", F.sum("tc").over(Window.orderBy("v")))
        .select("v", "cum_all")
    )
    grid = per.crossJoin(vals)
    scum = (
        grid.join(cnt, ["source", "v"], "left")
        .withColumn(
            "cum_s",
            F.sum(F.coalesce(F.col("c"), F.lit(0))).over(
                Window.partitionBy("source").orderBy("v")
            ),
        )
        .select("source", "ns", "v", "cum_s")
    )
    j = scum.join(vcum, "v").crossJoin(F.broadcast(tot))
    dev = F.abs(
        F.col("cum_s") / F.col("ns")
        - (F.col("cum_all") - F.col("cum_s")) / (F.col("n") - F.col("ns"))
    )
    return j.groupBy("source", F.col("ns").alias("n_docs")).agg(
        F.round(F.max(dev), 6).alias("ks_stat")
    )


@query(
    "q184_streaming_profile_drain",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def q184_streaming_profile_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING profile loop in the correctness gate (SURVEY §2.10's
    generator->profile-store cycle, tightened): the events table replays
    as a RATE-LIMITED file stream (``maxFilesPerTrigger`` holds each
    micro-batch to 2 of the 8 staged files — the file-source throttle a
    backfill uses so one catch-up run cannot starve the live cluster), an
    update-mode keyed aggregate maintains per-event-type profiles
    INCREMENTALLY across micro-batches, and every batch APPENDS its
    updated profile rows to a versioned store with its batch id — the
    append-only profile-store layout (no in-place rewrite at 100 TB;
    readers take the latest version per key). The drained read-back picks
    each key's newest version; because update mode re-emits a key's full
    running aggregate, that latest version must equal the one-pass batch
    answer the DuckDB oracle computes. Money-sum policy: DECIMAL(18,4)
    accumulate, round(2), cast DOUBLE — exact under any batch/partial
    ordering."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="q184_")
    src_dir, sink, ck = f"{work}/src", f"{work}/profiles", f"{work}/ck"
    try:
        e = _t(spark, sf_dir, "events").select("event_type", "value")
        e.repartition(8).write.parquet(src_dir)

        stream = (
            spark.readStream.schema("event_type STRING, value DOUBLE")
            .option("maxFilesPerTrigger", 2)  # the rate limit: 4 micro-batches
            .parquet(src_dir)
        )
        prof = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )

        def _append_version(bdf, bid: int) -> None:
            bdf.withColumn("_ver", F.lit(bid)).write.mode("append").parquet(sink)

        # per-event-type state doesn't need the session's shuffle width —
        # drain narrow (fresh checkpoint each run) and restore
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                prof.writeStream.outputMode("update")
                .foreachBatch(_append_version)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q184: streaming profile drain did not finish within 300 s — "
                    "refusing to read a partial profile store"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        store = spark.read.parquet(sink)
        latest = Window.partitionBy("event_type").orderBy(F.desc("_ver"))
        out = (
            store.withColumn("_rn", F.row_number().over(latest))
            .filter(F.col("_rn") == 1)
            .select("event_type", "n_events", "total_value")
        )
        # materialize before the scratch dir vanishes
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q185_audio_dominant_freq",
    oracle="""
    SELECT doc_id AS media_id,
           round((8 + 8 * (doc_id % 8)) * 8000.0 / 256, 2) AS dominant_freq_hz
    FROM documents
    """,
)
def q185_audio_dominant_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audio DSP loop, analytically oracle-checked: every doc
    synthesizes a REAL RIFF/WAVE file (stdlib ``wave`` encoder, 16-bit
    PCM, 8 kHz) carrying a pure sine planted at bin
    ``k = 8 + 8*(doc_id % 8)`` of a 256-sample frame, then the pipeline
    runs the real decoder (:func:`multimodal.wav_decode`) and the real
    rFFT (:func:`multimodal.audio_spectral_features`). Because the sine
    completes an integer number of cycles per frame, ALL its energy lands
    in bin k, so the detected dominant frequency must equal the planted
    ``k * 8000 / 256`` Hz exactly — the oracle predicts the DSP answer in
    closed form without re-deriving the FFT. Any defect in WAV framing,
    PCM scaling, channel averaging, or FFT indexing shifts the argmax and
    fails the hash.

    Scale shape: generation and analysis are both Arrow-batched
    ``mapInPandas`` kernels; blobs never leave the executor."""
    from phoebe_spark.operators import multimodal

    def _gen(it):
        import io
        import wave as wavelib

        import numpy as np
        import pandas as pd

        sr, n = 8000, 256
        t = np.arange(n)
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                k = 8 + 8 * (int(doc_id) % 8)
                x = 0.4 * np.sin(2 * np.pi * k * t / n)
                pcm = (x * 32767).astype("<i2")
                buf = io.BytesIO()
                with wavelib.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(pcm.tobytes())
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "content": buf.getvalue(),
                        "n_samples": n,
                        "sample_rate": sr,
                    }
                )
            yield pd.DataFrame(rows)

    d = _t(spark, sf_dir, "documents").select("doc_id")
    blobs = d.mapInPandas(
        _gen, "media_id LONG, content BINARY, n_samples LONG, sample_rate LONG"
    )
    feats = multimodal.audio_spectral_features(blobs, decoder=multimodal.wav_decode)
    return feats.select("media_id", F.round("dominant_freq_hz", 2).alias("dominant_freq_hz"))


@query(
    "q186_chunk_scrub_rebuild",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE trim(text) <> ''),
    ch AS (
      SELECT doc_id,
             unnest(generate_series(0, CAST(ceil(len(toks) / 4.0) AS INT) - 1)) AS pos,
             unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / 4.0) AS INT) - 1),
                    c -> array_to_string(toks[c*4+1 : c*4+4], ' '))) AS chunk
      FROM t),
    census AS (SELECT chunk, count(DISTINCT doc_id) AS df_docs FROM ch GROUP BY chunk)
    SELECT ch.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN census.df_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(length(coalesce(string_agg(CASE WHEN census.df_docs < 2 THEN ch.chunk END, ' '
                                           ORDER BY ch.pos), '')) AS BIGINT) AS clean_len,
           md5(coalesce(string_agg(CASE WHEN census.df_docs < 2 THEN ch.chunk END, ' '
                                   ORDER BY ch.pos), '')) AS clean_md5
    FROM ch JOIN census USING (chunk)
    GROUP BY ch.doc_id
    """,
)
def q186_chunk_scrub_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate REMOVAL with document reassembly
    (:func:`dedup.chunk_scrub_rebuild`): the RefinedWeb "drop lines
    repeated across documents" curation step — 4-word chunks occurring in
    >= 2 distinct documents are scrubbed from every document and the
    survivors are re-joined in original order. Where q78 only *counts*
    duplicated chunks, this query certifies the rebuilt text itself: the
    md5 of every reassembled document must match the oracle's
    ``string_agg(... ORDER BY pos)`` reconstruction, so a wrong census
    verdict, a dropped position, or an out-of-order reassembly all fail
    the hash.

    Scale shape: codegen chunk assembly (transform+slice), one census
    shuffle on the chunk string, one verdict join back on the same
    ~uniform key, ONE doc-keyed reassembly groupBy (array_sort of
    (pos, chunk) structs — no per-document window sort)."""
    d = _t(spark, sf_dir, "documents")
    s = dedup.chunk_scrub_rebuild(d, chunk_words=4, min_docs=2)
    return s.select(
        "doc_id",
        "n_chunks",
        "n_removed",
        F.length("clean_text").cast("long").alias("clean_len"),
        F.md5("clean_text").alias("clean_md5"),
    )


@query(
    "q187_kmeans_embeddings",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
      FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 8)),
    d1 AS (
      SELECT x.vec_id, x.v, c.cid,
             row_number() OVER (PARTITION BY x.vec_id
                                ORDER BY sqrt(list_sum(list_transform(generate_series(1, len(x.v)),
                                     i -> (x.v[i] - c.v[i]) * (x.v[i] - c.v[i])))), c.cid) AS rn
      FROM v x CROSS JOIN c0 c),
    a1 AS (SELECT vec_id, v, cid FROM d1 WHERE rn = 1),
    u1 AS (
      SELECT cid, dim,
             CAST(sum(CAST(floor(val * 1000000000.0) AS BIGINT)) AS DOUBLE)
               / (1000000000.0 * count(*)) AS cv
      FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM a1)
      GROUP BY cid, dim),
    c1 AS (
      SELECT c0.cid, coalesce(ug.v, c0.v) AS v
      FROM c0 LEFT JOIN (SELECT cid, list(cv ORDER BY dim) AS v FROM u1 GROUP BY cid) ug
      USING (cid)),
    d2 AS (
      SELECT x.vec_id, x.v, c.cid,
             row_number() OVER (PARTITION BY x.vec_id
                                ORDER BY sqrt(list_sum(list_transform(generate_series(1, len(x.v)),
                                     i -> (x.v[i] - c.v[i]) * (x.v[i] - c.v[i])))), c.cid) AS rn
      FROM v x CROSS JOIN c1 c),
    a2 AS (SELECT vec_id, v, cid FROM d2 WHERE rn = 1),
    u2 AS (
      SELECT cid, dim,
             CAST(sum(CAST(floor(val * 1000000000.0) AS BIGINT)) AS DOUBLE)
               / (1000000000.0 * count(*)) AS cv
      FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM a2)
      GROUP BY cid, dim),
    c2 AS (
      SELECT c1.cid, coalesce(ug.v, c1.v) AS v
      FROM c1 LEFT JOIN (SELECT cid, list(cv ORDER BY dim) AS v FROM u2 GROUP BY cid) ug
      USING (cid)),
    d3 AS (
      SELECT x.vec_id, c.cid,
             sqrt(list_sum(list_transform(generate_series(1, len(x.v)),
                  i -> (x.v[i] - c.v[i]) * (x.v[i] - c.v[i])))) AS dist,
             row_number() OVER (PARTITION BY x.vec_id
                                ORDER BY sqrt(list_sum(list_transform(generate_series(1, len(x.v)),
                                     i -> (x.v[i] - c.v[i]) * (x.v[i] - c.v[i])))), c.cid) AS rn
      FROM v x CROSS JOIN c2 c),
    a3 AS (SELECT vec_id, cid, dist FROM d3 WHERE rn = 1)
    SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
           round(CAST(sum(CAST(dist AS DECIMAL(27,12))) AS DOUBLE) / count(*), 6) AS mean_dist,
           CAST(min(vec_id) AS BIGINT) AS min_member
    FROM a3 GROUP BY cid
    """,
)
def q187_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means on the embedding corpus
    (:func:`similarity.kmeans_lloyd`, k=8, 2 iterations) — the cluster
    step of SemDeDup semantic dedup and the honest fit behind an IVF
    index (q44 certifies IVF *search* against pretrained pivots; this
    certifies the *training* loop itself). Deterministic lowest-id
    seeding + lowest-cid tie-breaks let the oracle replay BOTH Lloyd
    iterations as a CTE chain: assignment distances are the same ordered
    fold DuckDB computes, centroid updates carry DECIMAL(27,12)-exact
    sums, and an emptied cluster falls back to its previous centroid in
    both engines. Per-cluster size, decimal-carried mean distance, and
    min member certify every vector's final assignment.

    Scale shape: per iteration ONE corpus scan (literal-centroid codegen
    distance folds) + one (k x dims)-sized aggregate; exactly k*dims
    doubles reach the driver per round — the model state, never data."""
    emb = _t(spark, sf_dir, "embeddings")
    fit = similarity.kmeans_lloyd(emb, k=8, iters=2)
    return fit.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(
            F.sum(F.col("dist").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_dist"),
        F.min("vec_id").cast("long").alias("min_member"),
    )


@query(
    "q188_streaming_quota_drain",
    oracle="""
    WITH r AS (
      SELECT user_id, value,
             epoch_ns(ts) AS ord_ns,
             lpad(CAST(event_id AS VARCHAR), 12, '0') AS sid,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), lpad(CAST(event_id AS VARCHAR), 12, '0')) AS rn
      FROM events)
    SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(count(*) AS BIGINT) AS n_admitted,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value,
           CAST(max(ord_ns) AS BIGINT) AS max_ord
    FROM r WHERE rn <= 40 GROUP BY user_id
    """,
)
def q188_streaming_quota_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING per-key admission quota inside the hash-checked gate
    (:func:`stateful.keyed_quota_gate`, quota=40): the per-source intake
    cap of a training-data pipeline (one feed cannot flood the mix) run
    as REAL Structured Streaming — the events table replays as 4
    sequenced files (disjoint ascending (ts, id) ranges, strictly
    increasing mtimes, one file per trigger), so arrival order is the
    global (ts, zero-padded id) order and the admitted set must equal
    the batch ``row_number() <= quota`` answer the DuckDB oracle
    computes. Quota 40 with ~49-86 events/user means most keys admit
    across SEVERAL micro-batches before saturating — the carried counter
    state, not single-batch truncation, decides the cut.

    Scale shape: state is one monotone counter per key (write-free once
    saturated); the staging global sort is drain scaffolding only — the
    production source is a Kafka topic whose per-partition order is the
    arrival order. Money policy: DECIMAL(18,4) accumulate, round(2),
    cast DOUBLE."""
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming import stateful

    work = tempfile.mkdtemp(prefix="q188_")
    stage, src_dir, sink, ck = (
        f"{work}/stage",
        f"{work}/src",
        f"{work}/out",
        f"{work}/ck",
    )
    try:
        os.makedirs(src_dir)
        e = _t(spark, sf_dir, "events").select(
            F.col("user_id").cast("string").alias("key"),
            F.lpad(F.col("event_id").cast("string"), 12, "0").alias("sid"),
            F.col("ts").alias("ord_ns"),
            F.col("value").cast("double").alias("value"),
        )
        n_files = 4
        # Staging in ONE pruned pass. Two facts make this cheap without
        # touching the answer:
        #   1. The admitted set only needs the files to hold DISJOINT
        #      ASCENDING ord_ns ranges — the gate canonically re-sorts
        #      every micro-batch by (ord, sid), so the exact boundary
        #      placement is irrelevant. Approximate quantile boundaries
        #      (3 scalars to the driver) therefore slice as well as an
        #      exact global ntile sort did, minus the single-task sort.
        #   2. Map-side pre-prune — the scalable quota-gate ingest
        #      shape: a row ranked > quota per key WITHIN ITS OWN SLICE
        #      can never be admitted (>= quota same-key rows precede it
        #      in the same micro-batch and the counter is monotone), so
        #      the per-(slice, key) row_number <= quota filter provably
        #      leaves the admitted set unchanged while keeping ~70-97%
        #      of the stream away from the Python stateful operator.
        #      Cross-batch counter state still decides the cut: a key
        #      can stage quota rows per file but only quota TOTAL pass.
        qs = e.stat.approxQuantile("ord_ns", [0.25, 0.5, 0.75], 0.001)
        slice_expr = (
            1
            + sum((F.col("ord_ns") > F.lit(b)).cast("int") for b in qs)
        ).alias("_slice")
        w_slice = Window.partitionBy("_slice", "key").orderBy("ord_ns", "sid")
        pruned = (
            e.select("key", "sid", "ord_ns", "value", slice_expr)
            .withColumn("_rn", F.row_number().over(w_slice))
            .filter(F.col("_rn") <= 40)
            .drop("_rn")
        )
        pruned.repartition(1).write.partitionBy("_slice").parquet(stage)
        parts = sorted(glob.glob(f"{stage}/_slice=*/part-*.parquet"))
        for i, part in enumerate(parts, start=1):
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("key STRING, sid STRING, ord_ns LONG, value DOUBLE")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        admitted = stateful.keyed_quota_gate(
            stream, quota=40, key_col="key", id_col="sid", ord_col="ord_ns"
        )
        # ~150 keys don't need the session's shuffle width: the state
        # store pins its partition count from the first batch, and every
        # micro-batch pays per-partition state/Python-worker overhead, so
        # drain with 8 partitions (fresh checkpoint each run) and restore
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                admitted.writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q188: streaming quota drain did not finish within 300 s — "
                    "refusing to read a partial admitted set"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        out = (
            spark.read.parquet(sink)
            .groupBy("key")
            .agg(
                F.count(F.lit(1)).alias("n_admitted"),
                F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias("total_value"),
                F.max("ord").alias("max_ord"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q189_stitch_audit",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS w FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 6),
    g AS (
      SELECT doc_id,
             array_to_string(w[1:3], ' ') AS head,
             array_to_string(w[-3:], ' ') AS tail
      FROM t),
    hd AS (SELECT head AS gram, count(*) AS h_df FROM g GROUP BY head),
    td AS (SELECT tail AS gram, count(*) AS t_df FROM g GROUP BY tail),
    ok AS (
      SELECT coalesce(hd.gram, td.gram) AS gram
      FROM hd FULL JOIN td ON hd.gram = td.gram
      WHERE coalesce(h_df, 0) <= 64 AND coalesce(t_df, 0) <= 64)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.tail AS gram
    FROM g a
    JOIN ok ON ok.gram = a.tail
    JOIN g b ON b.head = a.tail
    WHERE a.doc_id <> b.doc_id
    """,
)
def q189_stitch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-document reconstruction audit
    (:func:`dedup.stitch_candidates`, k=3, df-cap 64): documents whose
    last 3 tokens open another document — the shard-boundary /
    pagination-cut signal that two stored rows are one logical document.
    Hot boundary grams (template openings/closings) are df-capped on
    both sides before the tail->head equi-join, so the join is
    candidate-sized, never a corpus self-join."""
    d = _t(spark, sf_dir, "documents")
    return dedup.stitch_candidates(d, k=3, max_df=64)


@query(
    "q190_source_quality_cap",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_SQL}) END AS tok,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text) END AS pr,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE {_SW_SQL} * 1.0 / len({_TOKS_SQL}) END AS sw
      FROM documents),
    q AS (
      SELECT doc_id, source, tok,
             0.5 * least(tok / 100.0, 1.0) + 0.5 * least(sw * 5.0, 1.0)
               - 0.25 * least(pr * 5.0, 1.0) AS score
      FROM s),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, doc_id) AS rn
      FROM q)
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           round(min(score), 6) AS min_kept_score,
           CAST(sum(tok) AS BIGINT) AS kept_tokens,
           CAST(min(doc_id) AS BIGINT) AS best_doc
    FROM r WHERE rn <= 50 GROUP BY source
    """,
)
def q190_source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-ranked admission cap: each source contributes at
    most its 50 highest-quality documents (ties broken by doc_id) to the
    training mix — the "source capping" curation step that stops one
    over-crawled feed from dominating, ranked by the oracle-proven q10
    composite score. The per-source rollup (count, worst admitted score,
    token yield) certifies the exact admitted set.

    Scale shape: the rank is a PER-SOURCE window (WindowGroupLimit
    pushes the rn<=50 filter into the sort — each partition keeps a
    50-row heap, no full per-source sort materializes), and the output
    is sources-sized. At 100 TB the same query runs with
    approx-quantile score thresholds per source (q159's pattern) if
    even the group-limit sort is too hot."""
    d = _t(spark, sf_dir, "documents")
    q = text.quality_score(d).select("doc_id", "source", "token_count", "quality_score")
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.min("quality_score"), 6).alias("min_kept_score"),
            F.sum("token_count").cast("long").alias("kept_tokens"),
            F.min("doc_id").cast("long").alias("best_doc"),
        )
    )


@query(
    "q191_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2),
    tr AS (
      SELECT event_type, day, v,
             avg(v) OVER w AS trend,
             count(*) OVER w AS wn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
    SELECT event_type, CAST(day % 7 AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(CAST(v - trend AS DECIMAL(27,12))) AS DOUBLE) / count(*), 6)
             + 0.0 AS seasonal
    FROM tr WHERE wn = 7
    GROUP BY event_type, CAST(day % 7 AS INT)
    """,
)
def q191_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the per-type daily revenue
    series: trend = centered 7-day moving average (full windows only, so
    the profile is never contaminated by edge-shrunken means), seasonal =
    per day-of-week mean of the detrended series — the metrics-domain
    operator behind "is Monday really lower or is that the trend"
    (W3's centered rolling mean composed into a seasonal profile, the
    step the reference's workload forecaster takes implicitly when it
    fits sine-modulated rates; cf. analytics/app/workload/models.py).
    Day-of-week is epoch-day mod 7 — timezone-free and engine-portable.

    Determinism: the daily series carries the DECIMAL(18,4) money
    policy; the 7-row frame average folds in frame order in both
    engines; the dow mean is a DECIMAL(27,12)-carried sum.

    Scale shape: one (type, day) shuffle builds the series, one
    days-sized window sort per type, one 35-key rollup — the fact table
    never sorts globally."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.expr("ts div 86400000000000").alias("day"))
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("v")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "v",
        F.avg("v").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == 7)
    return (
        tr.groupBy("event_type", (F.col("day") % 7).cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (
                F.round(
                    F.sum(
                        (F.col("v") - F.col("trend")).cast("decimal(27,12)")
                    ).cast("double")
                    / F.count(F.lit(1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("seasonal"),
        )
    )


@query(
    "q192_matryoshka_audit",
    oracle="""
    WITH p AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
    b AS (SELECT unnest([8, 16, 32, 64]) AS d),
    s AS (
      SELECT p.qid, e.vec_id AS nid, b.d,
             list_sum(list_transform(generate_series(1, b.d),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(generate_series(1, b.d),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(generate_series(1, b.d),
                      i -> CAST(p.qv[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE))))) AS cs
      FROM embeddings e CROSS JOIN p CROSS JOIN b
      WHERE e.vec_id <> p.qid),
    r AS (SELECT qid, nid, d, cs,
                 row_number() OVER (PARTITION BY qid, d ORDER BY cs DESC, nid) AS rn
          FROM s),
    t AS (SELECT qid, d, nid, cs FROM r WHERE rn = 1),
    fl AS (SELECT qid, nid AS fid FROM t WHERE d = 64)
    SELECT CAST(t.d AS INT) AS dim_budget,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN t.nid = fl.fid THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           round(CAST(sum(CAST(t.cs AS DECIMAL(27,12))) AS DOUBLE) / count(*), 6)
             AS mean_top1_cos
    FROM t JOIN fl USING (qid) WHERE t.d < 64
    GROUP BY t.d
    """,
)
def q192_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation retrieval audit (Kusupati et al. 2022): for
    a 10-query panel, does top-1 retrieval under the first 8 / 16 / 32
    dimensions (re-normalized truncated cosine) agree with full-64-dim
    top-1? The acceptance gate run before shipping truncated embeddings
    to a cheaper ANN tier — per budget: agreement count and the
    decimal-carried mean top-1 truncated cosine. Budget 64 rides the
    same plan as the ground truth, so one scan scores every budget.

    Scale shape: the query panel broadcasts (q23's pattern); truncated
    cosines are codegen folds over array slices of the SAME scan row —
    4 budgets cost 4 expressions, not 4 scans; per-(query, budget)
    top-1 is a WindowGroupLimit rank; everything after is
    panel-sized."""
    emb = _t(spark, sf_dir, "embeddings")
    panel = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    budgets = F.explode(F.array(*[F.lit(d) for d in (8, 16, 32, 64)])).alias("d")
    pairs = (
        emb.join(F.broadcast(panel))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "embedding", "qid", "qv", budgets)
    )
    scored = pairs.select(
        "qid",
        F.col("vec_id").alias("nid"),
        "d",
        similarity.cosine(
            F.slice("embedding", F.lit(1), F.col("d")),
            F.slice("qv", F.lit(1), F.col("d")),
        ).alias("cs"),
    )
    w = Window.partitionBy("qid", "d").orderBy(F.col("cs").desc(), F.col("nid").asc())
    # panel-sized (n_queries x budgets): materialize once so the full-dim
    # branch and the truncated branch don't EACH re-score the corpus
    top1 = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .localCheckpoint(eager=True)
    )
    full = top1.filter(F.col("d") == 64).select("qid", F.col("nid").alias("fid"))
    return (
        top1.filter(F.col("d") < 64)
        .join(full, "qid")
        .groupBy(F.col("d").cast("int").alias("dim_budget"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(F.when(F.col("nid") == F.col("fid"), 1).otherwise(0))
            .cast("long")
            .alias("n_agree"),
            F.round(
                F.sum(F.col("cs").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_top1_cos"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 extensions: snapshot/CDC lifecycle, normalization-sensitive dedup,
# langid evaluation, stream-stream join certification, embedding drift,
# robust stats, cross-source vocabulary overlap
# ---------------------------------------------------------------------------


@query(
    "q193_snapshot_diff",
    oracle="""
    WITH prev AS (
      SELECT doc_id, source,
             md5(CASE WHEN doc_id % 7 = 0 THEN substr(text, 1, 10) ELSE text END) AS h
      FROM documents WHERE doc_id % 11 <> 3
    ),
    cur AS (
      SELECT doc_id, source, md5(text) AS h
      FROM documents WHERE doc_id % 13 <> 5
    ),
    d AS (
      SELECT coalesce(cur.source, prev.source) AS source,
             CASE WHEN prev.doc_id IS NULL THEN 'added'
                  WHEN cur.doc_id IS NULL THEN 'removed'
                  WHEN prev.h <> cur.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM prev FULL OUTER JOIN cur ON prev.doc_id = cur.doc_id
    )
    SELECT source, status, count(*) AS n_docs
    FROM d GROUP BY source, status
    """,
)
def q193_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset snapshot diff — the "what changed between crawls" audit
    every corpus refresh needs before reprocessing: full-outer join two
    snapshot views of the corpus on the document key, classify each id
    as added / removed / changed / unchanged by content hash, and
    census the result per source. The two snapshots are deterministic
    derivations of the documents table (previous crawl: drops
    ``doc_id%11==3`` and carries a stale 10-char text for ``%7==0``;
    current crawl: drops ``doc_id%13==5``) so the oracle replays them
    exactly.

    Scale shape: ONE equi-join on the id key — both sides shuffle once
    on doc_id (at 100 TB this is the bucketed-by-id layout's free
    join); the hash compare is a codegen expression, and the output is
    source x status (tiny). No content ever moves — only (id, source,
    16-byte md5)."""
    d = _t(spark, sf_dir, "documents")
    prev = d.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id",
        F.col("source").alias("p_source"),
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.substring("text", 1, 10)
            ).otherwise(F.col("text"))
        ).alias("p_h"),
    )
    cur = d.filter(F.col("doc_id") % 13 != 5).select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    status = (
        F.when(F.col("p_h").isNull(), "added")
        .when(F.col("h").isNull(), "removed")
        .when(F.col("p_h") != F.col("h"), "changed")
        .otherwise("unchanged")
    )
    return (
        prev.join(cur, "doc_id", "full_outer")
        .select(
            F.coalesce("source", "p_source").alias("source"), status.alias("status")
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q194_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS k, 1 AS version, 'I' AS op, o_orderstatus AS status,
             CAST(o_totalprice AS DECIMAL(18,4)) AS price
      FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 'U', o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,4)) + CAST(10 AS DECIMAL(18,4))
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', o_orderstatus, NULL
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    last AS (
      SELECT * FROM (
        SELECT log.*, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        FROM log
      ) WHERE rn = 1
    )
    SELECT status,
           count(*) AS n_live,
           CAST(round(sum(price), 2) AS DOUBLE) AS total_price
    FROM last WHERE op <> 'D'
    GROUP BY status
    """,
)
def q194_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog (CDC) apply — collapse an insert/update/delete log into
    final table state by last-writer-wins, the core of every
    incremental-materialization sink (Debezium -> lakehouse MERGE). The
    log is a deterministic derivation of orders (every key inserted at
    v1; ``%5==0`` updated at v2 with an exact DECIMAL +10 price bump;
    ``%7==0`` tombstoned at v3), so the oracle rebuilds the identical
    log and the final-state census per order status is hash-comparable.

    Scale shape: ONE shuffle on the change key for the per-key
    row_number (in production the log is already key-partitioned by the
    CDC transport, making this map-side); deletes drop in the same
    pass — no join against the base table, because v1 carries the base.
    The DECIMAL policy keeps the surviving-price sum order-independent."""
    o = _t(spark, sf_dir, "orders")
    ins = o.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("version"),
        F.lit("I").alias("op"),
        F.col("o_orderstatus").alias("status"),
        _dec("o_totalprice").alias("price"),
    )
    upd = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit(2).alias("version"),
            F.lit("U").alias("op"),
            F.col("o_orderstatus").alias("status"),
            (_dec("o_totalprice") + F.lit(10).cast("decimal(18,4)")).alias("price"),
        )
    )
    dele = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit(3).alias("version"),
            F.lit("D").alias("op"),
            F.col("o_orderstatus").alias("status"),
            F.lit(None).cast("decimal(18,4)").alias("price"),
        )
    )
    log = ins.unionByName(upd).unionByName(dele)
    w = Window.partitionBy("k").orderBy(F.col("version").desc())
    live = (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return live.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_live"),
        F.round(F.sum("price"), 2).cast("double").alias("total_price"),
    )


@query(
    "q195_normalization_lift",
    oracle="""
    WITH n AS (
      SELECT source,
             md5(text) AS raw_h,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                     '\\s+', ' ', 'g'))) AS norm_h
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT raw_h) AS n_raw_distinct,
           count(DISTINCT norm_h) AS n_norm_distinct,
           count(DISTINCT raw_h) - count(DISTINCT norm_h) AS dedup_lift
    FROM n GROUP BY source
    """,
)
def q195_normalization_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-sensitivity dedup audit: how many extra duplicate
    groups does aggressive text normalization (lowercase, strip
    non-alphanumerics, collapse whitespace) reveal per source beyond
    byte-exact hashing? This decides whether a corpus needs the
    normalized pass before exact dedup (CCNet / RefinedWeb both
    normalize first) — a per-source lift of 0 means raw hashing
    suffices.

    Scale shape: both fingerprints are codegen expressions over the
    SAME scan row; the per-source distinct-count pair is one partial
    aggregation on (source, hash) — Spark rewrites the multi-distinct
    with expand, still one shuffle family, no text movement (hashes
    only)."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    return (
        d.select("source", F.md5("text").alias("raw_h"), F.md5(norm).alias("norm_h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("raw_h").alias("n_raw_distinct"),
            F.countDistinct("norm_h").alias("n_norm_distinct"),
            (F.countDistinct("raw_h") - F.countDistinct("norm_h")).alias("dedup_lift"),
        )
    )


@query(
    "q196_langid_confusion",
    oracle=f"""
    WITH s AS (
      SELECT lang,
             CASE WHEN (CASE WHEN trim(text) = '' THEN 0.0
                             ELSE {_SW_SQL} * 1.0 / len({_TOKS_SQL}) END) > 0.03
                  THEN 'en' ELSE 'other' END AS pred_lang
      FROM documents
    )
    SELECT lang, pred_lang,
           count(*) AS n_docs,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY lang), 6)
             AS share_of_lang
    FROM s GROUP BY lang, pred_lang
    """,
)
def q196_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the stopword-heuristic classifier
    (q11, text.predict_language) evaluated against the corpus's stored
    ``lang`` labels — per (true, predicted) cell the count and its share
    within the true language. The acceptance sheet run before trusting
    a cheap classifier to route documents at ingest: an 'en' recall row
    below target means the 3% stopword threshold needs retuning.

    Scale shape: classification is a codegen expression on the scan;
    the matrix is one groupBy on a (langs x 2)-sized key; the per-lang
    share is a window over the already-tiny matrix, not the corpus."""
    d = _t(spark, sf_dir, "documents")
    p = text.predict_language(d).select("lang", "pred_lang")
    w = Window.partitionBy("lang")
    return (
        p.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "share_of_lang",
            F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6),
        )
    )


@query(
    "q197_stream_join_drain",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, ts, value FROM events
    ),
    j AS (
      SELECT a.user_id,
             CAST(b.value AS DECIMAL(18,4)) AS bv,
             {EPOCH_SQL.format(c='b.ts')} - {EPOCH_SQL.format(c='a.ts')} AS lag_s
      FROM e a JOIN e b
        ON a.user_id = b.user_id
       AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
       AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    )
    SELECT user_id,
           count(*) AS n_pairs,
           CAST(round(sum(bv), 2) AS DOUBLE) AS total_value,
           CAST(max(lag_s) AS BIGINT) AS max_lag_s
    FROM j GROUP BY user_id
    """,
)
def q197_stream_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join inside the hash-checked gate: the
    events table split into two live streams (even event_ids as the
    trigger stream, odd as the response stream), joined per user on a
    [0, 30 min] event-time range, drained with availableNow, and the
    per-user pair census compared against the batch interval-join
    oracle. This promotes the last big Structured Streaming operator
    family (stream-stream joins, SURVEY §2.10's transport composed with
    §2.3's interval join) to the same oracle standard as the stateful
    gates (q179/q188) and windowed aggs (q180) — one operator, two
    execution models, one answer.

    Scale notes: both sides carry watermarks and the join condition is
    time-bounded, so state eviction is exactly the production contract
    (Spark drops buffered rows older than watermark + 30 min); the
    drained join output is aggregated before leaving the executors.
    ~75 keys don't need the session's shuffle width, so the drain runs
    with a narrow state store (same rationale as q188) and a fresh
    checkpoint per run."""
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q197_")
    try:
        staged = ev.select(
            "event_id",
            "user_id",
            F.expr("timestamp_micros(ts div 1000)").alias("event_time"),
            _dec("value").alias("v"),
        )
        staged.filter(F.col("event_id") % 2 == 0).write.parquet(f"{work}/left")
        staged.filter(F.col("event_id") % 2 == 1).write.parquet(f"{work}/right")

        schema = "event_id LONG, user_id LONG, event_time TIMESTAMP, v DECIMAL(18,4)"
        left = (
            spark.readStream.schema(schema)
            .parquet(f"{work}/left")
            .withWatermark("event_time", "0 seconds")
            .select("user_id", F.col("event_time").alias("a_time"))
        )
        right = (
            spark.readStream.schema(schema)
            .parquet(f"{work}/right")
            .withWatermark("event_time", "0 seconds")
            .select(
                F.col("user_id").alias("r_user"),
                F.col("event_time").alias("b_time"),
                "v",
            )
        )
        joined = left.join(
            right,
            F.expr(
                "user_id = r_user AND b_time >= a_time "
                "AND b_time <= a_time + INTERVAL 30 MINUTES"
            ),
        ).select(
            "user_id",
            "v",
            (F.col("b_time").cast("long") - F.col("a_time").cast("long")).alias(
                "lag_s"
            ),
        )
        sink = f"{work}/pairs"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                joined.writeStream.outputMode("append")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q197: stream-stream join drain did not finish within "
                    "300 s — refusing to report a partial pair set"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        out = (
            spark.read.parquet(sink)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.round(F.sum("v"), 2).cast("double").alias("total_value"),
                F.max("lag_s").alias("max_lag_s"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q198_source_centroid_drift",
    oracle="""
    WITH joined AS (
      SELECT d.source, e.embedding
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    flat AS (
      SELECT source, unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM joined
    ),
    sc AS (
      SELECT source, dim, avg(v) AS c, count(*) AS n
      FROM flat GROUP BY source, dim
    ),
    gc AS (
      SELECT dim, sum(c * n) / sum(n) AS g FROM sc GROUP BY dim
    )
    SELECT sc.source,
           CAST(max(sc.n) AS BIGINT) AS n_vecs,
           round(sum(sc.c * gc.g)
                 / (sqrt(sum(sc.c * sc.c)) * sqrt(sum(gc.g * gc.g))), 6)
             AS centroid_cos
    FROM sc JOIN gc ON gc.dim = sc.dim
    GROUP BY sc.source
    """,
)
def q198_source_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source embedding drift: cosine between each source's mean
    embedding and the corpus-wide mean. The cross-modal health check a
    mixture pipeline runs per crawl — a source whose centroid swings
    away from the corpus centroid changed its content distribution
    (new spam template, language shift) even when its volume and
    quality metrics look flat. Global centroid is derived FROM the
    per-source partials (weighted by count), so both engines fold the
    same per-(source,dim) means and the comparison is exact at 6dp.

    Scale shape: posexplode inside the scan, ONE map-side-combining
    groupBy on the (source, dim) key — the shuffle carries
    O(sources x dims) partials per task, never vectors; everything
    after (global centroid, cosine) is sources x dims sized."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    emb = _t(spark, sf_dir, "embeddings")
    joined = emb.join(d, emb.vec_id == d.doc_id).select(
        "source", F.posexplode("embedding").alias("pos", "v")
    )
    sc = joined.groupBy("source", (F.col("pos") + 1).alias("dim")).agg(
        F.avg(F.col("v").cast("double")).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    # sources x dims — materialize once so the global-centroid branch and
    # the per-source branch don't EACH re-run the corpus join + explode
    sc = sc.localCheckpoint(eager=True)
    gc = sc.groupBy("dim").agg(
        (F.sum(F.col("c") * F.col("n")) / F.sum("n")).alias("g")
    )
    # sources x dims — broadcast-sized by construction at any corpus scale
    return (
        sc.join(F.broadcast(gc), "dim")
        .groupBy("source")
        .agg(
            F.max("n").alias("n_vecs"),
            F.round(
                F.sum(F.col("c") * F.col("g"))
                / (
                    F.sqrt(F.sum(F.col("c") * F.col("c")))
                    * F.sqrt(F.sum(F.col("g") * F.col("g")))
                ),
                6,
            ).alias("centroid_cos"),
        )
    )


@query(
    "q199_winsorized_stats",
    oracle="""
    WITH q AS (
      SELECT source,
             percentile_cont(0.10) WITHIN GROUP (ORDER BY n_chars) AS p10,
             percentile_cont(0.90) WITHIN GROUP (ORDER BY n_chars) AS p90
      FROM documents GROUP BY source
    )
    SELECT d.source,
           count(*) AS n_docs,
           round(q.p10, 6) AS p10,
           round(q.p90, 6) AS p90,
           round(avg(least(greatest(d.n_chars, q.p10), q.p90)), 6)
             AS winsorized_mean,
           round(avg(d.n_chars), 6) AS raw_mean
    FROM documents d JOIN q ON q.source = d.source
    GROUP BY d.source, q.p10, q.p90
    """,
)
def q199_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per source: clamp document lengths to
    the source's [p10, p90] band before averaging, next to the raw mean.
    The outlier-robust size profile mixture planning reads — one
    pathological 100 MB document shifts a raw mean for a month, but
    moves the winsorized mean by one part in n. Exact interpolating
    percentiles (Spark ``percentile`` == DuckDB ``percentile_cont``)
    over integer lengths, so the clamp bounds match digit-for-digit.

    Scale shape: two passes over the (source, n_chars) projection —
    one percentile aggregation (exact percentile needs the values; at
    100 TB swap in approx_percentile with a bounded error and the same
    clamp shape) and one clamped re-aggregation against the
    broadcast-sized per-source bounds table."""
    d = _t(spark, sf_dir, "documents").select("source", "n_chars")
    q = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.10)").alias("p10"),
        F.expr("percentile(n_chars, 0.90)").alias("p90"),
    )
    clamped = d.join(F.broadcast(q), "source").select(
        "source",
        "p10",
        "p90",
        "n_chars",
        F.least(F.greatest(F.col("n_chars").cast("double"), "p10"), "p90").alias("w"),
    )
    return clamped.groupBy("source", "p10", "p90").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("w"), 6).alias("winsorized_mean"),
        F.round(F.avg("n_chars"), 6).alias("raw_mean"),
    ).select(
        "source",
        "n_docs",
        F.round("p10", 6).alias("p10"),
        F.round("p90", 6).alias("p90"),
        "winsorized_mean",
        "raw_mean",
    )


@query(
    "q200_source_vocab_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT source, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    grams AS (
      SELECT DISTINCT source, g
      FROM (
        SELECT source,
               unnest(list_transform(generate_series(1, len(t) - 2),
                                     i -> array_to_string(t[i:i+2], ' '))) AS g
        FROM toks
      )
    ),
    sz AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
      FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, n_shared,
           round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS vocab_jaccard
    FROM inter
    JOIN sz sa ON sa.source = source_a
    JOIN sz sb ON sb.source = source_b
    WHERE n_shared * 1.0 / (sa.n + sb.n - n_shared) >= 0.05
    """,
)
def q200_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap matrix: Jaccard similarity
    between sources' distinct token-trigram vocabularies, reported for
    pairs above 5%. The syndication / shared-template detector at the
    SOURCE granularity (q13/q121 find document pairs; this finds feed
    pairs) — two crawl feeds with 80% trigram overlap are mirrors and
    one should be dropped before dedup even runs.

    Scale shape: the classic inverted-index set-similarity plan with
    the corpus collapsed to (source, gram) DISTINCT pairs first —
    postings per gram are bounded by the number of sources (not
    documents), so the self-join fan-out is at most sources² per gram
    and the output is a sources x sources matrix. One shuffle to
    distinct, one on the gram key."""
    d = _t(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    grams = (
        d.filter((F.trim("text") != "") & (F.size(toks) >= 3))
        .select(
            "source",
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
                    F.zip_with(
                        F.slice(toks, 2, F.greatest(F.size(toks) - 2, F.lit(0))),
                        F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
                        lambda b, c: F.concat_ws(" ", b, c),
                    ),
                    lambda a, bc: F.concat_ws(" ", a, bc),
                )
            ).alias("g"),
        )
        .distinct()
    )
    sz = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    b = grams.select(F.col("source").alias("source_b"), "g")
    inter = (
        grams.join(b, (grams.g == b.g) & (grams.source < b.source_b))
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = (
        inter.join(
            F.broadcast(sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))),
            "source_a",
        )
        .join(
            F.broadcast(sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))),
            "source_b",
        )
        .withColumn(
            "vocab_jaccard",
            F.round(F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")), 6),
        )
    )
    return jac.filter(
        F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")) >= 0.05
    ).select("source_a", "source_b", "n_shared", "vocab_jaccard")


@query(
    "q201_tpch_q4_semi",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q201_tpch_q4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in a quarter with
    at least one LATE line item, counted per priority. The reference
    corpus has no l_commitdate/l_receiptdate, so lateness is the
    disclosed proxy ``l_shipdate > o_orderdate + 90 days`` (same policy
    as the Q9 cost proxy) — the SHAPE under test is the decorrelated
    EXISTS: a LEFT SEMI join, never a count-then-filter materialization.

    Scale shape: the quarter filter prunes orders at the scan
    (PushedFilters); the semi join shuffles on orderkey and short-
    circuits per probe row — no lineitem aggregation state, no
    duplicate-elimination afterthought. Catalyst plans EXISTS exactly
    this way, which is why the DataFrame side writes left_semi
    explicitly."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q202_kmv_set_ops",
    oracle="""
    WITH h AS (
      SELECT DISTINCT source,
             CAST(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS DOUBLE)
               / 1152921504606846976 AS u
      FROM documents
    ),
    sk AS (
      SELECT source, u
      FROM (SELECT source, u,
                   row_number() OVER (PARTITION BY source ORDER BY u) AS rn
            FROM h)
      WHERE rn <= 32
    ),
    pairs AS (SELECT a.source AS source_a, b.source AS source_b
              FROM (SELECT DISTINCT source FROM sk) a
              JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
    merged AS (
      SELECT p.source_a, p.source_b, s.u,
             max(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN sk s ON s.source IN (p.source_a, p.source_b)
      GROUP BY p.source_a, p.source_b, s.u
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source_a, source_b ORDER BY u) AS rn
      FROM merged
    ),
    kset AS (SELECT * FROM ranked WHERE rn <= 32),
    agg AS (
      SELECT source_a, source_b,
             count(*) AS m,
             max(u) AS u_k,
             sum(in_a * in_b) AS n_both
      FROM kset GROUP BY source_a, source_b
    )
    SELECT source_a, source_b,
           CAST(n_both AS BIGINT) AS n_both,
           round(CASE WHEN m < 32 THEN m * 1.0 ELSE (32 - 1) / u_k END, 6)
             AS union_est,
           round(n_both * 1.0 / m, 6) AS jaccard_est
    FROM agg
    """,
)
def q202_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) sketch SET OPERATIONS between sources: estimate
    pairwise union cardinality and Jaccard overlap from 32-value
    bottom-k sketches of each source's document-hash set — the
    mergeable-sketch algebra (Beyer et al. 2007) that lets a 100 TB
    corpus answer "how much does crawl A overlap crawl B" from
    kilobytes of state. Hashes map to the unit interval via the first
    60 bits of md5 (2^60 divides exactly, so the double scaling is
    lossless); under-filled sketches (|merged| < k) fall back to the
    exact count, so the small-SF fixtures exercise the exact path and
    sf0.1 the estimator path — both engines replay both branches
    digit-for-digit.

    Scale shape: per-source sketches are a rank-k window over the
    distinct (source, hash) projection (k rows per source survive);
    the pair algebra runs on sources x k rows — corpus size never
    appears after the first aggregation."""
    d = _t(spark, sf_dir, "documents")
    h = d.select(
        "source",
        (
            F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long").cast("double")
            / F.lit(1152921504606846976)
        ).alias("u"),
    ).distinct()
    w = Window.partitionBy("source").orderBy("u")
    sk = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 32).drop("rn")
    srcs = sk.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("source_a")).join(
        srcs.select(F.col("source").alias("source_b")),
        F.col("source_a") < F.col("source_b"),
    )
    # sketches are sources x k rows — broadcast both sides of the algebra
    merged = (
        F.broadcast(pairs)
        .join(
            F.broadcast(sk),
            (F.col("source") == F.col("source_a"))
            | (F.col("source") == F.col("source_b")),
        )
        .groupBy("source_a", "source_b", "u")
        .agg(
            F.max(F.when(F.col("source") == F.col("source_a"), 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("source") == F.col("source_b"), 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    wk = Window.partitionBy("source_a", "source_b").orderBy("u")
    kset = merged.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= 32)
    agg = kset.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("m"),
        F.max("u").alias("u_k"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    return agg.select(
        "source_a",
        "source_b",
        F.col("n_both").cast("long").alias("n_both"),
        F.round(
            F.when(F.col("m") < 32, F.col("m").cast("double")).otherwise(
                F.lit(31.0) / F.col("u_k")
            ),
            6,
        ).alias("union_est"),
        F.round(F.col("n_both") / F.col("m"), 6).alias("jaccard_est"),
    )


@query(
    "q203_session_window_drain",
    oracle=f"""
    WITH e AS (
      SELECT user_id, {EPOCH_SQL.format(c='ts')} AS es FROM events
    ),
    marked AS (
      SELECT user_id, es,
             CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
                       OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sess AS (
      SELECT user_id, es,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY es
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    ),
    per_session AS (
      SELECT user_id, session_id, count(*) AS ev, max(es) - min(es) AS dur
      FROM sess GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(ev) AS BIGINT) AS n_events,
           round(avg(ev), 6) AS avg_session_events,
           round(avg(dur), 6) AS avg_session_dur_s
    FROM per_session GROUP BY user_id
    """,
)
def q203_session_window_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows inside the hash-checked gate: the events
    table replayed as a stream through ``session_window(event_time,
    '30 minutes')`` — Spark's native merging-session-state operator —
    drained in complete mode and summarized per user exactly like the
    BATCH gaps-and-islands sessionization (q46). The two
    implementations share nothing (stateful window merge vs lag/window
    SQL) and must produce identical session counts, sizes, and
    durations; ``session_window.end`` is last-event + gap, so duration
    subtracts the 30-minute tail before comparing.

    Scale notes: complete mode is the DRAIN contract only; production
    session aggregation runs append + watermark so closed sessions emit
    and state stays bounded by open sessions per key. ~150 keys drain
    with a narrow state store (q188's rationale)."""
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q203_")
    try:
        ev.select(
            "user_id", F.expr("timestamp_micros(ts div 1000)").alias("event_time")
        ).write.parquet(f"{work}/src")

        stream = spark.readStream.schema("user_id LONG, event_time TIMESTAMP").parquet(
            f"{work}/src"
        )
        sessions = stream.groupBy(
            "user_id", F.session_window("event_time", "30 minutes").alias("sw")
        ).agg(F.count(F.lit(1)).alias("ev"))
        sink = f"{work}/sessions"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                sessions.writeStream.outputMode("complete")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("overwrite").parquet(sink)
                )
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q203: session-window drain did not finish within 300 s — "
                    "refusing to report a partial session snapshot"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        out = (
            spark.read.parquet(sink)
            .select(
                "user_id",
                "ev",
                (
                    F.col("sw.end").cast("long")
                    - F.col("sw.start").cast("long")
                    - F.lit(1800)
                ).alias("dur"),
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("ev").cast("long").alias("n_events"),
                F.round(F.avg("ev"), 6).alias("avg_session_events"),
                F.round(F.avg("dur"), 6).alias("avg_session_dur_s"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q204_image_ahash_gate",
    oracle="""
    WITH px AS (
      SELECT doc_id, unnest(generate_series(0, 63)) AS i,
             (doc_id * 31 + unnest(generate_series(0, 63)) * 7) % 256 AS p
      FROM documents
    ),
    bits AS (
      SELECT doc_id, i,
             CASE WHEN p * 64 > sum(p) OVER (PARTITION BY doc_id) THEN 1 ELSE 0 END AS b
      FROM px
    ),
    halves AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN i < 32 THEN b * (CAST(1 AS BIGINT) << (31 - i)) ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN i >= 32 THEN b * (CAST(1 AS BIGINT) << (63 - i)) ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(b) AS BIGINT) AS n_on
      FROM bits GROUP BY doc_id
    )
    SELECT doc_id,
           CAST((hi - 2147483648) * 4294967296 + lo AS BIGINT) AS ahash,
           n_on
    FROM halves
    """,
)
def q204_image_ahash_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IMAGE pipeline certification in the hash-checked gate:
    every doc synthesizes a REAL 8x8 PNG (zlib-deflated, filter-0
    scanlines) whose gray pixel ``i`` is the closed form
    ``(doc_id*31 + i*7) % 256``, runs the real decoder
    (:func:`multimodal.png_decode`) and the real perceptual average-hash
    (:func:`multimodal.image_features`), and the oracle predicts the
    final 64-bit hash ANALYTICALLY from the pixel formula — no image
    library on either side. Any defect in PNG framing, filter handling,
    channel order, the 8x8 downsample stride, or the bit packing flips
    a bit and fails the hash (the audio twin is q185). The mean
    threshold compares ``p*64 > sum(p)`` so both engines decide each
    bit in exact integer arithmetic, and the signed-int64 packing goes
    through 32-bit halves so the oracle never overflows BIGINT.

    Scale shape: generation, decode, and hashing are Arrow-batched
    mapInPandas kernels; blobs never leave the executor — the gate
    moves only (doc_id, 8-byte hash)."""
    from phoebe_spark.operators import multimodal

    def _gen(it):
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def _png(gray: np.ndarray) -> bytes:
            h, w = gray.shape
            raw = b"".join(
                b"\x00" + bytes(np.repeat(gray[r], 3).astype(np.uint8))
                for r in range(h)
            )
            def chunk(tag: bytes, body: bytes) -> bytes:
                return (
                    struct.pack(">I", len(body))
                    + tag
                    + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
                )
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = np.arange(64, dtype=np.int64)
                gray = ((int(doc_id) * 31 + i * 7) % 256).reshape(8, 8)
                png = _png(gray.astype(np.uint8))
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "content": png,
                        "width": 8,
                        "height": 8,
                    }
                )
            yield pd.DataFrame(rows)

    d = _t(spark, sf_dir, "documents").select("doc_id")
    blobs = d.mapInPandas(
        _gen, "media_id LONG, content BINARY, width INT, height INT"
    )
    feats = multimodal.image_features(blobs, decoder=multimodal.png_decode)
    # ahash is the unsigned 64-bit hash re-biased into signed int64 by
    # subtracting 2^63 (= flipping the top bit of the two's-complement
    # pattern), so flipping it back with XOR min-long recovers the raw
    # bit pattern and its popcount
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "ahash",
        F.bit_count(F.col("ahash").bitwiseXOR(F.lit(-9223372036854775808)))
        .cast("long")
        .alias("n_on"),
    )


@query(
    "q205_watermark_drop_audit",
    oracle="""
    WITH e AS (
      SELECT event_type, epoch_ns(ts) // 1000 AS us, (event_id % 4) + 1 AS b
      FROM events
    ),
    fm AS (SELECT b, max(us) AS mx FROM e GROUP BY b),
    cm AS (SELECT b, max(mx) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS m
           FROM fm),
    kept AS (
      SELECT e.event_type, (e.us // 3600000000) * 3600 AS ws
      FROM e LEFT JOIN cm ON cm.b = e.b - 2
      WHERE cm.m IS NULL
         OR ((e.us // 3600000000) * 3600 + 3600) * 1000000 > cm.m - 3600000000
    ),
    fin AS (SELECT max(us) - 3600000000 AS we FROM e)
    SELECT event_type, ws AS win_start, count(*) AS n_events
    FROM kept, fin
    WHERE (ws + 3600) * 1000000 <= fin.we
    GROUP BY event_type, ws
    """,
)
def q205_watermark_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK LATE-DATA SEMANTICS inside the hash-checked gate: the
    events table is sliced into 4 interleaved files (``event_id % 4``,
    so every micro-batch spans the full time range and later batches
    carry genuinely late rows), replayed one file per micro-batch
    (``maxFilesPerTrigger=1``, mtime-ordered), and run through an
    append-mode 1-hour tumbling window with a 1-hour watermark. The
    oracle replays Spark's micro-batch watermark mechanics EXACTLY,
    validated empirically against this engine (Spark 4.x):

    - the late-row filter of batch *i* uses the watermark planned
      before the batch ran: ``M(i-2) - delay`` where ``M(j)`` is the
      cumulative max event time through batch *j* — one batch MORE
      lagged than the end-of-batch eviction watermark;
    - a row is dropped iff its window end <= that watermark
      (boundary inclusive — verified with an exact-equality probe);
    - availableNow runs one final empty batch, so the emitted set is
      every window with end <= M(n) - delay (also inclusive), counting
      only rows that survived their batch's filter.

    Counts are integers, so the certification is exact — any future
    engine change to watermark lag, drop inclusivity, or the final
    finalization batch flips a count and fails the hash.

    Scale notes: this IS the production late-data contract (state
    evicted at the watermark, bounded by in-flight windows x keys);
    the drain's slice staging is one sorted write (q188's pattern)."""
    import glob
    import os
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q205_")
    src_dir = f"{work}/src"
    os.makedirs(src_dir)
    try:
        stage = f"{work}/stage"
        (
            ev.select(
                F.expr("timestamp_micros(ts div 1000)").alias("event_time"),
                "event_type",
                (F.col("event_id") % 4 + 1).alias("_slice"),
            )
            .repartition(1)
            .write.partitionBy("_slice")
            .parquet(stage)
        )
        for i in range(1, 5):
            (part,) = glob.glob(f"{stage}/_slice={i}/part-*.parquet")
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("event_time TIMESTAMP, event_type STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .withWatermark("event_time", "1 hour")
        )
        agg = stream.groupBy(
            F.window("event_time", "1 hour"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n_events"))
        sink = f"{work}/windows"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                agg.writeStream.outputMode("append")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q205: watermark drain did not finish within 300 s — "
                    "refusing to report a partial window set"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        out = spark.read.parquet(sink).select(
            "event_type",
            F.col("window.start").cast("long").alias("win_start"),
            "n_events",
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q206_naive_bayes_source",
    oracle="""
    WITH split AS (
      SELECT doc_id, source, text,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|v1'), 1, 15)) AS BIGINT)
               % 10000 AS bucket
      FROM documents
    ),
    tok AS (
      SELECT doc_id, source, bucket < 9000 AS is_train, w
      FROM split, unnest(string_split(text, ' ')) AS u(w)
      WHERE w <> ''
    ),
    vocab AS (
      SELECT w FROM tok WHERE is_train GROUP BY w HAVING count(*) >= 5
    ),
    vsize AS (SELECT count(*) AS v FROM vocab),
    cls AS (
      SELECT source AS c, count(*) AS n_docs
      FROM split WHERE bucket < 9000 GROUP BY source
    ),
    ntrain AS (SELECT sum(n_docs) AS n FROM cls),
    wc AS (
      SELECT t.w, t.source AS c, count(*) AS n
      FROM tok t JOIN vocab v USING (w)
      WHERE t.is_train GROUP BY t.w, t.source
    ),
    ctot AS (SELECT c, sum(n) AS t FROM wc GROUP BY c),
    model AS (
      SELECT wc.w, wc.c,
             CAST(floor(1e6 * ln((wc.n + 1.0) / (ctot.t + vsize.v))) AS BIGINT) AS l
      FROM wc JOIN ctot USING (c), vsize
    ),
    clsinfo AS (
      SELECT cls.c,
             CAST(floor(1e6 * ln(cls.n_docs * 1.0 / ntrain.n)) AS BIGINT) AS prior,
             CAST(floor(1e6 * ln(1.0 / (ctot.t + vsize.v))) AS BIGINT) AS l0
      FROM cls JOIN ctot ON ctot.c = cls.c, ntrain, vsize
    ),
    testtok AS (
      SELECT t.doc_id, t.source, t.w
      FROM tok t JOIN vocab USING (w) WHERE NOT t.is_train
    ),
    doctot AS (SELECT doc_id, source, count(*) AS m FROM testtok GROUP BY 1, 2),
    delta AS (
      SELECT tt.doc_id, m.c, sum(m.l - ci.l0) AS d
      FROM testtok tt JOIN model m USING (w) JOIN clsinfo ci ON ci.c = m.c
      GROUP BY 1, 2
    ),
    scores AS (
      SELECT dt.doc_id, dt.source AS true_source, ci.c AS cand,
             ci.prior + dt.m * ci.l0 + coalesce(d.d, 0) AS score
      FROM doctot dt CROSS JOIN clsinfo ci
      LEFT JOIN delta d ON d.doc_id = dt.doc_id AND d.c = ci.c
    ),
    pred AS (
      SELECT doc_id, true_source, cand AS pred_source,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand ASC) AS rn
      FROM scores
    )
    SELECT true_source, pred_source, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
)
def q206_naive_bayes_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained IN-ENGINE and certified exactly:
    fit on the deterministic md5 train split (add-one smoothing over a
    min-count-5 vocabulary), score the held-out docs, emit the
    source-vs-predicted confusion matrix. Every log-probability is
    floor-quantized to an integer (``floor(1e6 * ln(p))``) BEFORE any
    summation, so scores are exact integer sums in both engines and the
    argmax (ties broken by class name) cannot drift with float
    accumulation order — the fasttext-style quality/source classifier
    step of a curation pipeline as two shuffles plus broadcast joins.

    Scale shape: the fit is one map-side-combining groupBy(word, class)
    over the train token stream (vocabulary-bounded output); the model,
    class table, and vocab are broadcast to the scoring side, which is
    one groupBy(doc, class) over test tokens. The corpus shuffles on
    doc_id once; no all-pairs anything."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    bucket = sampling.hash_bucket(F.col("doc_id"), "v1", 10000)
    tok = (
        d.withColumn("is_train", bucket < 9000)
        .select(
            "doc_id",
            "source",
            "is_train",
            F.explode(F.split("text", " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    train = tok.filter("is_train")
    vocab = train.groupBy("w").count().filter("count >= 5").select("w")
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    cls = (
        d.withColumn("bucket", bucket)
        .filter("bucket < 9000")
        .groupBy(F.col("source").alias("c"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    ntrain = cls.agg(F.sum("n_docs").alias("n"))
    wc = (
        train.join(F.broadcast(vocab), "w")
        .groupBy("w", F.col("source").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ctot = wc.groupBy("c").agg(F.sum("n").alias("t"))
    model = (
        wc.join(F.broadcast(ctot), "c")
        .crossJoin(F.broadcast(vsize))
        .select(
            "w",
            "c",
            F.floor(1e6 * F.log((F.col("n") + 1.0) / (F.col("t") + F.col("v"))))
            .cast("long")
            .alias("l"),
        )
    )
    clsinfo = (
        cls.join(F.broadcast(ctot), "c")
        .crossJoin(F.broadcast(ntrain))
        .crossJoin(F.broadcast(vsize))
        .select(
            "c",
            F.floor(1e6 * F.log(F.col("n_docs") * 1.0 / F.col("n")))
            .cast("long")
            .alias("prior"),
            F.floor(1e6 * F.log(1.0 / (F.col("t") + F.col("v"))))
            .cast("long")
            .alias("l0"),
        )
    )
    testtok = tok.filter(~F.col("is_train")).join(F.broadcast(vocab), "w")
    doctot = testtok.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("m")
    )
    delta = (
        testtok.join(F.broadcast(model), "w")
        .join(F.broadcast(clsinfo), "c")
        .groupBy("doc_id", "c")
        .agg(F.sum(F.col("l") - F.col("l0")).alias("d"))
    )
    scores = (
        doctot.crossJoin(F.broadcast(clsinfo))
        .join(delta, ["doc_id", "c"], "left")
        .select(
            "doc_id",
            F.col("source").alias("true_source"),
            F.col("c").alias("cand"),
            (
                F.col("prior")
                + F.col("m") * F.col("l0")
                + F.coalesce(F.col("d"), F.lit(0))
            ).alias("score"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    pred = scores.withColumn("rn", F.row_number().over(w_rank)).filter("rn = 1")
    return pred.groupBy(
        "true_source", F.col("cand").alias("pred_source")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "q207_blocking_er_join",
    oracle="""
    WITH names AS (
      SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY p_name
    ),
    blocked AS (
      SELECT p_name, n_parts, split_part(p_name, ' ', 2) AS blk
      FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def q207_blocking_er_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking join: canonicalize part names to their
    DISTINCT spellings first (the pigeonhole move — candidate generation
    runs over entities, not rows), block on the head-noun token so the
    self-join is an equi-join within bounded blocks, then verify only
    the candidates with exact Levenshtein <= 3. Emits matched name
    pairs with their edit distance and per-spelling row support.

    Scale shape: the O(n^2) edit-distance verify never sees the fact
    table — it runs on distinct spellings within a block (block count
    grows with the name vocabulary, block size with spellings per noun);
    the only full-table work is the distinct+count groupBy. The same
    generate-then-verify contract as the chunk dedup path
    (operators/dedup.py)."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("blk", F.split("p_name", " ").getItem(1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_a"),
        "blk",
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_b"),
        "blk",
    )
    pairs = a.join(_dim(b), "blk").filter(F.col("name_a") < F.col("name_b"))
    return (
        pairs.withColumn("lev", F.levenshtein("name_a", "name_b").cast("long"))
        .filter("lev <= 3")
        .select("name_a", "name_b", "lev", "n_a", "n_b")
    )


def _q208_oracle() -> str:
    # Embed the u<4 rows of the quantized DCT basis as literals so DuckDB
    # replays the integer DCT exactly (same table the engine kernel uses).
    from phoebe_spark.operators.multimodal import dct_basis_q

    t = dct_basis_q(8)
    vals = ", ".join(
        f"({u}, {x}, {t[u][x]})" for u in range(4) for x in range(8)
    )
    return f"""
    WITH px AS (
      SELECT doc_id,
             unnest(generate_series(0, 63)) // 8 AS r,
             unnest(generate_series(0, 63)) % 8 AS c,
             (doc_id * 37 + unnest(generate_series(0, 63)) * 11) % 256 AS p
      FROM documents
    ),
    tq(u, x, cv) AS (VALUES {vals}),
    coef AS (
      SELECT px.doc_id, t1.u AS u, t2.u AS v,
             sum(px.p * t1.cv * t2.cv) AS cval
      FROM px
      JOIN tq t1 ON t1.x = px.r
      JOIN tq t2 ON t2.x = px.c
      GROUP BY 1, 2, 3
    ),
    low AS (SELECT doc_id, u, v, cval FROM coef WHERE NOT (u = 0 AND v = 0)),
    tot AS (SELECT doc_id, sum(cval) AS s FROM low GROUP BY 1),
    bits AS (
      SELECT l.doc_id, l.u, l.v,
             CASE WHEN 15 * l.cval > t.s THEN 1 ELSE 0 END AS b
      FROM low l JOIN tot t USING (doc_id)
    )
    SELECT doc_id,
           CAST(sum(b * (CAST(1 AS BIGINT) << (14 - (u * 4 + v - 1)))) AS BIGINT)
             AS phash,
           CAST(sum(b) AS BIGINT) AS n_on
    FROM bits GROUP BY doc_id
    """


@query("q208_image_phash_gate", oracle=_q208_oracle())
def q208_image_phash_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT perceptual-hash certification — the frequency-domain sibling
    of q204's average-hash: every doc synthesizes a REAL 8x8 PNG whose
    gray pixel at (row r, col c) is ``(doc_id*37 + (r*8+c)*11) % 256``,
    runs the real PNG decoder and :func:`multimodal.image_dct_phash`
    (integer-quantized DCT basis, mean-threshold bits over the 4x4
    low-frequency block minus DC), and the oracle recomputes the SAME
    integer DCT analytically from the pixel formula with the basis
    embedded as literals. Every coefficient is an exact integer in both
    engines, so any defect in decode, the subsample, the basis, or the
    bit packing flips the 15-bit hash. pHash survives brightness shifts
    that break ahash — together they certify the two standard
    image-dedup fingerprints.

    Scale shape: Arrow mapInPandas kernels end-to-end; only (doc_id,
    15-bit hash) leaves the executors."""
    from phoebe_spark.operators import multimodal

    def _gen(it):
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def _png(gray: np.ndarray) -> bytes:
            h, w = gray.shape
            raw = b"".join(
                b"\x00" + bytes(np.repeat(gray[r], 3).astype(np.uint8))
                for r in range(h)
            )

            def chunk(tag: bytes, body: bytes) -> bytes:
                return (
                    struct.pack(">I", len(body))
                    + tag
                    + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = np.arange(64, dtype=np.int64)
                gray = ((int(doc_id) * 37 + i * 11) % 256).reshape(8, 8)
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "content": _png(gray.astype(np.uint8)),
                        "width": 8,
                        "height": 8,
                    }
                )
            yield pd.DataFrame(rows)

    d = _t(spark, sf_dir, "documents").select("doc_id")
    blobs = d.mapInPandas(
        _gen, "media_id LONG, content BINARY, width INT, height INT"
    )
    out = multimodal.image_dct_phash(blobs, decoder=multimodal.png_decode)
    return out.select(F.col("media_id").alias("doc_id"), "phash", "n_on")


@query(
    "q209_streaming_cusum_drain",
    oracle=f"""
    WITH e AS (
      SELECT event_type, value, {EPOCH_SQL.format(c='ts')} * 1000000000
               + (epoch_ns(ts) % 1000000000) AS tsn, event_id
      FROM events WHERE value IS NOT NULL
    ),
    o AS (
      SELECT event_type,
             CAST(floor(value * 1000000.0) AS BIGINT) - 50000000 AS dev,
             row_number() OVER (ORDER BY tsn, event_id) AS ord,
             ntile(4) OVER (ORDER BY tsn, event_id) AS slice
      FROM e
    ),
    p AS (
      SELECT event_type, ord, slice,
             sum(dev) OVER (PARTITION BY event_type ORDER BY ord) AS psum,
             row_number() OVER (PARTITION BY event_type ORDER BY ord) AS rn
      FROM o
    ),
    s AS (
      SELECT event_type, ord, slice, rn,
             psum - least(CAST(0 AS HUGEINT),
                          min(psum) OVER (PARTITION BY event_type ORDER BY ord))
               AS s
      FROM p
    ),
    be AS (SELECT event_type, slice, max(ord) AS mo FROM o GROUP BY 1, 2),
    bs AS (
      SELECT s.event_type, s.slice, s.rn, s.s
      FROM s JOIN be ON be.event_type = s.event_type AND be.mo = s.ord
    )
    SELECT event_type,
           CAST(arg_max(s, slice) AS BIGINT) AS final_stat,
           CAST(max(rn) AS BIGINT) AS n_obs,
           CAST(sum(CASE WHEN s > 200000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_batches
    FROM bs GROUP BY event_type
    """,
)
def q209_streaming_cusum_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CUSUM drift detector inside the hash-checked gate
    (:func:`stateful.keyed_cusum`): per-event-type deviations stream
    through 4 sequenced micro-batches and fold ``s = max(0, s + dev)``
    in the state store; the oracle replays the recursion CLOSED-FORM —
    ``S_n = P_n - min(0, min_j P_j)`` over prefix sums — at every
    micro-batch boundary. Deviations are floor-quantized to integers
    BEFORE streaming (``floor(1e6*value) - 50e6``), so the float state
    variable only ever holds exact integers (< 2^53) and the drain is
    bit-reproducible: the 4 batch-end probes per key certify the carried
    state, the observation counter, and the ``s > 200e6`` alarm line.

    The staging global sort is drain scaffolding (the production source
    is a Kafka topic, arrival order = partition order); state is two
    scalars per key. The closed form is also WHY the offline/online
    split is safe at 100 TB: thresholds tuned on the batch prefix-sum
    window plan transfer unchanged to the streaming fold."""
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming import stateful

    work = tempfile.mkdtemp(prefix="q209_")
    stage, src_dir, sink, ck = (
        f"{work}/stage",
        f"{work}/src",
        f"{work}/out",
        f"{work}/ck",
    )
    try:
        os.makedirs(src_dir)
        e = (
            _t(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select(
                F.col("event_type").alias("key"),
                (F.floor(F.col("value") * 1e6).cast("long") - 50000000)
                .cast("double")
                .alias("dev"),
                "ts",
                "event_id",
            )
        )
        w_ord = Window.orderBy("ts", "event_id")
        staged = e.select(
            "key",
            "dev",
            F.row_number().over(w_ord).alias("ord"),
            F.ntile(4).over(w_ord).alias("_slice"),
        )
        staged.repartition(1).write.partitionBy("_slice").parquet(stage)
        for i in range(1, 5):
            (part,) = glob.glob(f"{stage}/_slice={i}/part-*.parquet")
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("key STRING, dev DOUBLE, ord LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        monitored = stateful.keyed_cusum(
            stream,
            k=0.0,
            h=200_000_000.0,
            key_col="key",
            ts_col="ord",
            value_col="dev",
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                monitored.writeStream.outputMode("update")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q209: streaming CUSUM drain did not finish within 300 s — "
                    "refusing to report a partial monitor history"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        out = (
            spark.read.parquet(sink)
            .groupBy(F.col("key").alias("event_type"))
            .agg(
                F.max_by("stat", "n_obs").cast("long").alias("final_stat"),
                F.max("n_obs").alias("n_obs"),
                F.sum(F.col("alarm").cast("long")).alias("n_alarm_batches"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q210_streaming_topk_drain",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           TRUE AS within_k, TRUE AS mass_exact, TRUE AS lower_ok,
           TRUE AS bound_ok, TRUE AS hh_tracked
    FROM events GROUP BY event_type
    """,
)
def q210_streaming_topk_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Misra-Gries heavy hitters inside the hash-checked gate
    (:func:`stateful.keyed_heavy_hitters`, k=10): per event type, user
    activity streams through 4 sequenced micro-batches into an O(k)
    summary, then the drained FINAL summary is audited against the exact
    batch counts with the Misra-Gries guarantees as EXACT integer
    checks (boolean-oracle treatment, like the q116/q117 sketch gates —
    summary content is fold-order-dependent, the invariants are not):

    - ``within_k``: at most k tracked items per key;
    - ``mass_exact``: (n_total - sum of counters) is divisible by k+1 —
      every decrement event retires exactly k+1 occurrences, so the
      retired mass is an exact multiple (a sharp algebra check on the
      carried state, not just an inequality);
    - ``lower_ok``: every counter is a lower bound on its true count;
    - ``bound_ok``: every undercount (and every untracked item's true
      count) is at most D = retired/(k+1);
    - ``hh_tracked``: every item with true count > D is tracked.

    Scale shape: O(k) state per key vs the unbounded groupBy a naive
    top-k would carry; the exact-count audit side is sf-test scaffolding
    (at 100 TB you'd audit a sampled key subset)."""
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming import stateful

    K = 10
    work = tempfile.mkdtemp(prefix="q210_")
    stage, src_dir, sink, ck = (
        f"{work}/stage",
        f"{work}/src",
        f"{work}/out",
        f"{work}/ck",
    )
    try:
        os.makedirs(src_dir)
        ev = _t(spark, sf_dir, "events")
        e = ev.select(
            F.col("event_type").alias("key"),
            F.col("user_id").cast("string").alias("item"),
            "ts",
            "event_id",
        )
        w_ord = Window.orderBy("ts", "event_id")
        staged = e.select(
            "key", "item", F.ntile(4).over(w_ord).alias("_slice")
        )
        staged.repartition(1).write.partitionBy("_slice").parquet(stage)
        for i in range(1, 5):
            (part,) = glob.glob(f"{stage}/_slice={i}/part-*.parquet")
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("key STRING, item STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        hh = stateful.keyed_heavy_hitters(stream, k=K)
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                hh.writeStream.outputMode("update")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q210: streaming top-k drain did not finish within 300 s — "
                    "refusing to audit a partial summary"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        emitted = spark.read.parquet(sink)
        w_last = Window.partitionBy("key")
        final = emitted.withColumn(
            "max_nt", F.max("n_total").over(w_last)
        ).filter("n_total = max_nt")
        exact = ev.groupBy(
            F.col("event_type").alias("key"),
            F.col("user_id").cast("string").alias("item"),
        ).agg(F.count(F.lit(1)).alias("exact"))
        j = exact.join(final.select("key", "item", "count_lb", "n_total"),
                       ["key", "item"], "left")
        per_key = j.groupBy("key").agg(
            F.sum("exact").alias("nt_exact"),
            F.sum(F.when(F.col("count_lb").isNotNull(), 1).otherwise(0))
            .alias("n_tracked"),
            F.sum(F.coalesce(F.col("count_lb"), F.lit(0))).alias("mass"),
            F.min(
                F.when(F.col("count_lb").isNotNull(),
                       (F.col("count_lb") <= F.col("exact")).cast("int"))
            ).alias("lower_min"),
            F.max(F.col("n_total")).alias("nt_emitted"),
        )
        audit = (
            j.join(per_key.select(
                "key", "nt_exact", "n_tracked", "mass", "lower_min"
            ), "key")
            .withColumn("d", ((F.col("nt_exact") - F.col("mass")) / (K + 1))
                        .cast("long"))
            .groupBy("key")
            .agg(
                F.max("nt_exact").alias("n_total"),
                (F.max("n_tracked") <= K).alias("within_k"),
                (F.max((F.col("nt_exact") - F.col("mass")) % (K + 1)) == 0)
                .alias("mass_exact"),
                (F.max("lower_min") == 1).alias("lower_ok"),
                F.min(
                    F.when(
                        F.col("count_lb").isNotNull(),
                        (F.col("exact") - F.col("count_lb") <= F.col("d"))
                        .cast("int"),
                    ).otherwise((F.col("exact") <= F.col("d")).cast("int"))
                ).cast("boolean").alias("bound_ok"),
                F.min(
                    F.when(
                        F.col("exact") * (K + 1) > F.col("nt_exact"),
                        F.col("count_lb").isNotNull().cast("int"),
                    ).otherwise(F.lit(1))
                ).cast("boolean").alias("hh_tracked"),
            )
            .withColumnRenamed("key", "event_type")
        )
        rows = audit.collect()
        return spark.createDataFrame(rows, audit.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q211_dominant_supplier",
    oracle="""
    WITH small_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small %'
    ),
    sp AS (
      SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem JOIN small_parts ON p_partkey = l_partkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey, sum(qty) AS tq, count(*) AS ns FROM sp GROUP BY 1),
    dom AS (
      SELECT sp.l_suppkey, sp.l_partkey, sp.qty
      FROM sp JOIN tot USING (l_partkey)
      WHERE sp.qty * tot.ns > 2 * tot.tq
    )
    SELECT s.s_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_dominant_parts,
           CAST(sum(dom.qty) AS BIGINT) AS dominated_qty
    FROM dom
    JOIN supplier s ON s.s_suppkey = dom.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q211_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-stock suppliers) on this corpus — closes
    the Q2-Q22 ladder modulo data limits. DISCLOSED PROXY: there is no
    partsupp table (no ps_availqty), so 'supplier holding more than half
    the forecast demand' becomes 'supplier who SHIPPED more than half of
    a small-part's total quantity' — the identical plan shape (filtered
    part semi-join, two-level quantity rollup, threshold compare,
    supplier/nation lookup) with 'ships more than TWICE the part's
    fair per-supplier share' as the dominance test (absolute-majority
    thresholds are vacuous on this corpus: small-part supply is spread
    near-uniformly across suppliers). Quantities are small integers, so double sums are
    exact and the BIGINT casts are lossless in both engines.

    Scale shape: the part filter prunes the lineitem join via broadcast;
    the (part, supplier) rollup is one map-side-combining shuffle; the
    part-total is a second, strictly smaller rollup joined back
    broadcast; nation/supplier lookups are bounded-dim broadcasts."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("small "))
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    sp = (
        li.join(F.broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
        # parts x suppliers sized; checkpoint so the lineitem scan+rollup
        # subtree is not recomputed for the per-part total branch
        .localCheckpoint(eager=True)
    )
    tot = sp.groupBy("l_partkey").agg(
        F.sum("qty").alias("tq"), F.count(F.lit(1)).alias("ns")
    )
    dom = sp.join(_dim(tot), "l_partkey").filter(
        F.col("qty") * F.col("ns") > 2 * F.col("tq")
    )
    s = _dim(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        dom.join(s, dom.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_dominant_parts"),
            F.sum("qty").alias("dominated_qty"),
        )
    )


# Benford first-digit expectations, quantized once in Python and embedded
# as literals on BOTH sides — no runtime transcendentals to drift.
_BENFORD_MILLI = {d: round(1_000_000 * __import__("math").log10(1 + 1 / d)) for d in range(1, 10)}


def _q212_oracle() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_MILLI.items()
    )
    return f"""
    WITH m AS (
      SELECT 'o_totalprice' AS measure,
             CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
      UNION ALL
      SELECT 'l_extendedprice' AS measure,
             CAST(substring(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM lineitem WHERE l_extendedprice > 0
    ),
    obs AS (
      SELECT measure, digit, CAST(count(*) AS BIGINT) AS n_obs
      FROM m GROUP BY 1, 2
    ),
    tot AS (SELECT measure, sum(n_obs) AS n FROM obs GROUP BY 1)
    SELECT obs.measure, obs.digit, obs.n_obs,
           CAST(tot.n * (CASE obs.digit {cases} END) AS BIGINT) AS exp_milli,
           CAST(obs.n_obs * 1000000 - tot.n * (CASE obs.digit {cases} END) AS BIGINT)
             AS dev_milli
    FROM obs JOIN tot USING (measure)
    """


@query("q212_benford_audit", oracle=_q212_oracle())
def q212_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit data-quality audit over the two money columns:
    observed leading-digit counts vs the Benford expectation, with the
    expected probabilities quantized to millionths ONCE in Python and
    embedded as literals in both engines (no runtime log10 to drift).
    Deviations are exact integers (obs*1e6 - n*p_milli) — synthetic or
    fabricated financial columns jump out as large |dev_milli| mass.
    The leading digit is taken from the DECIMAL(18,4) rendering so both
    engines agree on formatting (no scientific notation).

    Scale shape: pure column expressions into a 9-digit-per-measure
    groupBy — one scan per measure, vocabulary-bounded output."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter("o_totalprice > 0")
        .select(
            F.lit("o_totalprice").alias("measure"),
            F.substring(F.col("o_totalprice").cast("decimal(18,4)").cast("string"), 1, 1)
            .cast("long")
            .alias("digit"),
        )
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter("l_extendedprice > 0")
        .select(
            F.lit("l_extendedprice").alias("measure"),
            F.substring(F.col("l_extendedprice").cast("decimal(18,4)").cast("string"), 1, 1)
            .cast("long")
            .alias("digit"),
        )
    )
    obs = o.unionByName(li).groupBy("measure", "digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    p = F.create_map(
        *[F.lit(x) for d, pm in _BENFORD_MILLI.items() for x in (d, pm)]
    )
    # per-measure total as a window over the 18-row aggregate — the scans
    # run ONCE (a groupBy+join-back would duplicate both subtrees)
    return (
        obs.withColumn("n", F.sum("n_obs").over(Window.partitionBy("measure")))
        .withColumn("p_milli", p[F.col("digit")])
        .select(
            "measure",
            "digit",
            "n_obs",
            (F.col("n") * F.col("p_milli")).alias("exp_milli"),
            (F.col("n_obs") * 1_000_000 - F.col("n") * F.col("p_milli"))
            .alias("dev_milli"),
        )
    )


@query(
    "q213_ushaped_attribution",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             epoch_ns(ts) // 1000000000 AS sec,
             CAST(floor(coalesce(value, 0) * 1000000.0) AS BIGINT) AS val_milli
      FROM events
    ),
    nxt AS (
      SELECT user_id, event_type, event_id, sec,
             last_value(CASE WHEN event_type = 'purchase' THEN sec END IGNORE NULLS)
               OVER w AS psec,
             last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
               OVER w AS pid,
             last_value(CASE WHEN event_type = 'purchase' THEN val_milli END IGNORE NULLS)
               OVER w AS pval
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY sec DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    touches AS (
      SELECT user_id, event_type, event_id, sec, pid, pval
      FROM nxt
      WHERE event_type IN ('view', 'click')
        AND pid IS NOT NULL AND psec - sec <= 86400
    ),
    ranked AS (
      SELECT event_type, pid, pval,
             row_number() OVER (PARTITION BY user_id, pid ORDER BY sec, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, pid) AS n
      FROM touches
    ),
    credited AS (
      SELECT event_type,
             CASE WHEN n = 1 THEN 'only'
                  WHEN rn = 1 THEN 'first'
                  WHEN rn = n THEN 'last'
                  ELSE 'middle' END AS position_class,
             CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN rn = 1 OR rn = n THEN 400000
                  ELSE 200000 // (n - 2) END AS w_milli,
             pval
      FROM ranked
    )
    SELECT event_type AS touch_type, position_class,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(w_milli * pval) AS BIGINT) AS credit_micro2
    FROM credited GROUP BY 1, 2
    """,
)
def q213_ushaped_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — the
    multi-touch sibling of q103's last-touch: each view/click within the
    24 h before a user's NEXT purchase earns credit by journey position
    (only: 100%, first/last: 40% each — 50/50 for 2-touch journeys —
    middles: floor-split of the remaining 20%). The next-purchase
    binding is an IGNORE-NULLS carried window over the descending
    (sec, id) order — one user_id shuffle, no event-table self-join,
    however many purchases. Purchase values and position weights are
    floor-quantized to integer millionths BEFORE multiplication, so
    every credit is an exact integer product and the per-(channel,
    position) rollup is order-independent in both engines.

    Scale shape: two windows over one user_id partitioning (Catalyst
    reuses the exchange), then a tiny groupBy; state per user is a
    3-scalar carry, never a journey buffer."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        _epoch().alias("sec"),
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6)
        .cast("long")
        .alias("val_milli"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("sec").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_p = F.col("event_type") == "purchase"
    nxt = e.select(
        "user_id",
        "event_type",
        "event_id",
        "sec",
        F.last(F.when(is_p, F.col("sec")), ignorenulls=True).over(w).alias("psec"),
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True).over(w).alias("pid"),
        F.last(F.when(is_p, F.col("val_milli")), ignorenulls=True).over(w).alias("pval"),
    )
    touches = nxt.filter(
        F.col("event_type").isin("view", "click")
        & F.col("pid").isNotNull()
        & (F.col("psec") - F.col("sec") <= 86400)
    )
    w_j = Window.partitionBy("user_id", "pid").orderBy("sec", "event_id")
    w_n = Window.partitionBy("user_id", "pid")
    ranked = touches.select(
        "event_type",
        "pid",
        "pval",
        F.row_number().over(w_j).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    credited = ranked.select(
        "event_type",
        F.when(F.col("n") == 1, "only")
        .when(F.col("rn") == 1, "first")
        .when(F.col("rn") == F.col("n"), "last")
        .otherwise("middle")
        .alias("position_class"),
        F.when(F.col("n") == 1, 1000000)
        .when(F.col("n") == 2, 500000)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 400000)
        .otherwise(F.floor(200000 / (F.col("n") - 2)).cast("long"))
        .alias("w_milli"),
        "pval",
    )
    return credited.groupBy(
        F.col("event_type").alias("touch_type"), "position_class"
    ).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(F.col("w_milli") * F.col("pval")).alias("credit_micro2"),
    )


def _q214_oracle(max_piece_len: int = 4, max_word_len: int = 8) -> str:
    # Generated CTE chain replaying the Viterbi DP step by step — the
    # same treatment as the BPE-trainer oracles (q145/q160): the oracle
    # RE-RUNS the algorithm, it doesn't trust the engine's answer.
    steps = []
    prev_ub = "ub0"
    for i in range(1, max_word_len + 1):
        steps.append(f"""
    best{i} AS (
      SELECT w, pos, score, seg FROM (
        SELECT b.w, {i} AS pos, b.score + s.l AS score,
               list_append(b.seg, s.piece) AS seg,
               row_number() OVER (PARTITION BY b.w
                                  ORDER BY b.score + s.l DESC, b.pos ASC) AS rn
        FROM {prev_ub} b JOIN so s ON s.w = b.w AND s.j = b.pos AND s.i = {i}
      ) WHERE rn = 1
    ),
    ub{i} AS (SELECT * FROM {prev_ub} UNION ALL SELECT * FROM best{i})""")
        prev_ub = f"ub{i}"
    chain = ",".join(steps)
    return f"""
    WITH tok AS (
      SELECT w FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE w <> ''
    ),
    words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cw, length(w) AS wlen
      FROM tok GROUP BY 1 HAVING length(w) <= {max_word_len}
    ),
    occ AS (
      SELECT w, cw, wlen, j, i, substring(w, j + 1, i - j) AS piece
      FROM words,
           generate_series(0, {max_word_len} - 1) AS g1(j),
           generate_series(1, {max_word_len}) AS g2(i)
      WHERE j < i AND i <= wlen AND i - j <= {max_piece_len}
    ),
    c0 AS (SELECT piece, sum(cw) AS c FROM occ GROUP BY 1),
    t0 AS (SELECT sum(c) AS t FROM c0),
    l0 AS (
      SELECT piece, CAST(floor(1e6 * ln(c * 1.0 / t)) AS BIGINT) AS l
      FROM c0, t0
    ),
    so AS (
      SELECT occ.w, occ.j, occ.i, occ.piece, l0.l
      FROM occ JOIN l0 USING (piece)
    ),
    ub0 AS (
      SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS score,
             CAST([] AS VARCHAR[]) AS seg
      FROM words
    ),{chain},
    fin AS (
      SELECT u.w, u.seg, wd.cw
      FROM {prev_ub} u JOIN words wd ON wd.w = u.w AND u.pos = wd.wlen
    ),
    rc AS (SELECT piece, cw, w FROM fin, unnest(seg) AS s(piece)),
    n1 AS (
      SELECT piece, CAST(sum(cw) AS BIGINT) AS n1,
             CAST(count(DISTINCT w) AS BIGINT) AS n_words
      FROM rc GROUP BY 1
    ),
    tot1 AS (SELECT sum(n1) AS t, count(*) AS p FROM n1)
    SELECT piece, n1, n_words,
           CAST(floor(1e6 * ln((n1 + 1.0) / (t + p))) AS BIGINT) AS l1_milli
    FROM n1, tot1
    """


@query("q214_unigram_lm_tokenizer", oracle=_q214_oracle())
def q214_unigram_lm_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style UNIGRAM-LM tokenizer EM round
    (:func:`text.unigram_lm_fit`) certified digit-for-digit: all-substring
    seeding, integer-quantized Viterbi segmentation of every distinct
    word (ties broken (score desc, split asc)), and the weighted M-step
    recount — the oracle REPLAYS the whole DP as a generated CTE chain,
    one step per word position, exactly like the q145/q160 BPE oracles.
    Together with BPE train/encode this completes the tokenizer ladder:
    greedy bottom-up merges AND top-down likelihood pruning.

    Scale shape: one map-side-combining word count over the corpus; the
    EM machinery runs entirely on the distinct-word frame (vocabulary-
    bounded), and the whole Viterbi DP folds inside ONE codegen
    ``aggregate`` higher-order expression per word — a single shuffle,
    no iterative job chain."""
    return text.unigram_lm_fit(_t(spark, sf_dir, "documents"))


def _q215_oracle(vocab_size: int = 200, max_piece_len: int = 4, max_word_len: int = 8) -> str:
    # Generated step chain replaying the greedy longest-match loop, one
    # CTE per cursor tick — the q145/q160/q214 oracle treatment: DuckDB
    # re-learns the vocab and re-applies the matching rule itself.
    def mk(length: int) -> str:
        s = f"substring(w, pos + 1, {length})"
        return f"CASE WHEN pos = 0 THEN {s} ELSE '##' || {s} END"

    arms = " ".join(
        f"WHEN pos + {l} <= wlen AND {mk(l)} IN (SELECT piece FROM vocab) THEN {mk(l)}"
        for l in range(max_piece_len, 1, -1)
    )
    pick = f"CASE {arms} ELSE {mk(1)} END"
    steps = []
    prev = "st0"
    for t in range(1, max_word_len + 1):
        steps.append(f"""
    st{t} AS (
      SELECT w, cw, wlen,
        CASE WHEN pos >= wlen THEN pos
             ELSE pos + length(pick) - CASE WHEN pos > 0 THEN 2 ELSE 0 END
        END AS pos,
        CASE WHEN pos >= wlen THEN seg ELSE list_append(seg, pick) END AS seg
      FROM (SELECT *, {pick} AS pick FROM {prev})
    )""")
        prev = f"st{t}"
    chain = ",".join(steps)
    return f"""
    WITH tok AS (
      SELECT w FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE w <> ''
    ),
    words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cw, length(w) AS wlen
      FROM tok GROUP BY 1 HAVING length(w) <= {max_word_len}
    ),
    occ AS (
      SELECT w, cw, wlen, j, i,
             CASE WHEN j = 0 THEN substring(w, j + 1, i - j)
                  ELSE '##' || substring(w, j + 1, i - j) END AS piece
      FROM words,
           generate_series(0, {max_word_len} - 1) AS g1(j),
           generate_series(1, {max_word_len}) AS g2(i)
      WHERE j < i AND i <= wlen AND i - j <= {max_piece_len}
    ),
    pc AS (SELECT piece, sum(cw) AS cnt FROM occ GROUP BY 1),
    topv AS (
      SELECT piece FROM (
        SELECT piece, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
        FROM pc
      ) WHERE rn <= {vocab_size}
    ),
    singles AS (SELECT DISTINCT piece FROM occ WHERE i - j = 1),
    vocab AS (SELECT piece FROM topv UNION SELECT piece FROM singles),
    st0 AS (
      SELECT w, cw, wlen, 0 AS pos, CAST([] AS VARCHAR[]) AS seg FROM words
    ),{chain},
    rc AS (SELECT piece, cw, w FROM {prev}, unnest(seg) AS s(piece))
    SELECT piece, CAST(sum(cw) AS BIGINT) AS n_uses,
           CAST(count(DISTINCT w) AS BIGINT) AS n_words
    FROM rc GROUP BY 1
    """


@query("q215_wordpiece_encode", oracle=_q215_oracle())
def q215_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match-first encoding census
    (:func:`text.wordpiece_encode_census`) certified digit-for-digit:
    the top-200 marked substrings (continuations carry ``##``) plus the
    full single-char alphabet form the vocab, and every distinct word is
    encoded by the BERT-tokenizer rule — repeatedly take the longest
    matching vocab piece at the cursor. The oracle RE-LEARNS the vocab
    and RE-APPLIES the greedy loop as a generated CTE chain, one tick
    per cursor step — the q145/q160/q214 treatment. Completes the
    tokenizer ladder: BPE merge replay, unigram-LM Viterbi, WordPiece
    greedy longest-match.

    Scale shape: one map-side-combining word count; bounded vocab rides
    as a broadcast one-row map; the greedy loop folds inside ONE codegen
    ``aggregate`` HOF per word — a single shuffle, no job chain."""
    return text.wordpiece_encode_census(_t(spark, sf_dir, "documents"))


_Q216_ORACLE = r"""
    WITH d AS (
      SELECT source AS g, length(text) AS x,
             len(regexp_split_to_array(trim(text), '\s+')) AS y
      FROM documents
    ),
    r AS (
      SELECT g,
        CAST(2 * rank() OVER (PARTITION BY g ORDER BY x)
             + count(*) OVER (PARTITION BY g, x) - 1 AS BIGINT) AS rx,
        CAST(2 * rank() OVER (PARTITION BY g ORDER BY y)
             + count(*) OVER (PARTITION BY g, y) - 1 AS BIGINT) AS ry
      FROM d
    ),
    s AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy,
             CAST(sum(rx * rx) AS BIGINT) AS sxx,
             CAST(sum(ry * ry) AS BIGINT) AS syy
      FROM r GROUP BY 1
    )
    SELECT g AS source, n AS n_docs,
      round(CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
        THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        ELSE 0.0 END, 6) AS spearman_rho
    FROM s
"""


@query("q216_quality_signal_agreement", oracle=_Q216_ORACLE)
def q216_quality_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Spearman rank agreement between two quality signals
    (:func:`curation.quality_signal_agreement`): char length vs
    whitespace token count. The curation sanity check that independent
    scorers agree before their thresholds gate a corpus. Average ranks
    with standard tie handling are carried as INTEGER doubled-ranks and
    all correlation sums as exact BIGINTs; only the final Pearson-on-
    ranks combination runs in (identically-ordered) double — so the
    oracle matches digit-for-digit, not to-an-ulp.

    Scale shape: two per-source rank windows + one grouped sum; no
    joins, no global sort."""
    from phoebe_spark.operators import curation

    return curation.quality_signal_agreement(_t(spark, sf_dir, "documents"))


_Q217_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, (doc_id % 7 = 0) AS is_bench, {_TOKS_SQL} AS t
      FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    post AS (
      SELECT doc_id, is_bench,
             unnest(list_distinct(list_transform(generate_series(1, len(t) - 2),
                                  i -> array_to_string(t[i:i+2], ' ')))) AS g
      FROM toks
    ),
    hp AS (
      SELECT doc_id, is_bench,
             {_MD5H_SQL.format(x='g')} % 2147483647 AS h1,
             CAST(('0x' || substring(md5(g), 17, 15)) AS BIGINT) % 2147483646 + 1 AS h2
      FROM post
    ),
    mh AS (
      SELECT doc_id, is_bench, i, min((h1 + i * h2) % 2147483647) AS h
      FROM hp CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i) seeds
      GROUP BY 1, 2, 3
    ),
    sig AS (SELECT doc_id, is_bench, list(h ORDER BY i) AS s FROM mh GROUP BY 1, 2),
    banded AS (
      SELECT doc_id, is_bench, b,
             array_to_string(list_transform(s[b*4+1:b*4+4],
                                            x -> CAST(x AS VARCHAR)), ',') AS bucket
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) bands
    ),
    cand AS (
      SELECT DISTINCT c.doc_id AS corpus_doc, e.doc_id AS bench_doc
      FROM banded c JOIN banded e ON c.b = e.b AND c.bucket = e.bucket
      WHERE NOT c.is_bench AND e.is_bench
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY 1),
    inter AS (
      SELECT c.doc_id AS corpus_doc, e.doc_id AS bench_doc, count(*) AS n_i
      FROM post c JOIN post e USING (g)
      WHERE NOT c.is_bench AND e.is_bench
      GROUP BY 1, 2
    )
    SELECT corpus_doc, bench_doc,
           round(n_i * 1.0 / (sc.n + se.n - n_i), 6) AS jaccard
    FROM cand
    JOIN inter USING (corpus_doc, bench_doc)
    JOIN sizes sc ON sc.doc_id = corpus_doc
    JOIN sizes se ON se.doc_id = bench_doc
    WHERE round(n_i * 1.0 / (sc.n + se.n - n_i), 6) >= 0.2
"""


@query("q217_neardup_decontamination", oracle=_Q217_ORACLE)
def q217_neardup_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate train/eval decontamination
    (:func:`dedup.neardup_decontaminate`): documents with
    ``doc_id % 7 = 0`` stand in as the benchmark suite; cross-corpus
    banded MinHash-LSH (md5 double hashing, 32 hashes / 8 bands)
    generates candidates with the benchmark side BROADCAST, and the
    exact 3-gram Jaccard verifies them — the paraphrase-leakage rung the
    exact/Bloom decontamination passes (q58/q73) can't catch. The oracle
    replays every hash, band, and the verify join in SQL.

    Scale shape: the corpus contributes one signature shuffle and never
    self-joins; both probe joins broadcast the eval side."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 7 == 0)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    return dedup.neardup_decontaminate(corpus, bench, threshold=0.2)


@query(
    "q218_stream_outer_join_drain",
    oracle=f"""
    WITH l AS (
      SELECT user_id, ts, epoch_ns(ts) // 1000 AS lt_us
      FROM events WHERE event_id % 2 = 0
    ),
    r AS (
      SELECT user_id, ts, epoch_ns(ts) // 1000 AS rt_us,
             CAST(value AS DECIMAL(18,4)) AS rv
      FROM events WHERE event_id % 2 = 1
    ),
    wm AS (
      SELECT least((SELECT max(lt_us) FROM l), (SELECT max(rt_us) FROM r)) AS w
    ),
    pairs AS (
      SELECT l.user_id, r.rv
      FROM l JOIN r ON l.user_id = r.user_id
        AND r.rt_us >= l.lt_us AND r.rt_us <= l.lt_us + 1800000000
    ),
    expired AS (
      -- unmatched lefts whose join window closed STRICTLY below the
      -- final watermark emit one null row in the finalization batch
      -- (boundary empirically pinned: lt + 30min = wm does NOT emit)
      SELECT l.user_id
      FROM l, wm
      WHERE NOT EXISTS (
        SELECT 1 FROM r WHERE r.user_id = l.user_id
          AND r.rt_us >= l.lt_us AND r.rt_us <= l.lt_us + 1800000000
      ) AND l.lt_us + 1800000000 < wm.w
    ),
    per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(round(sum(rv), 2) AS DOUBLE) AS matched_value,
             CAST(0 AS BIGINT) AS n_expired_null
      FROM pairs GROUP BY user_id
      UNION ALL
      SELECT user_id, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE),
             CAST(count(*) AS BIGINT)
      FROM expired GROUP BY user_id
    )
    SELECT user_id,
           CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
           CAST(round(sum(CAST(matched_value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS matched_value,
           CAST(sum(n_expired_null) AS BIGINT) AS n_expired_null
    FROM per_user GROUP BY user_id
    """,
)
def q218_stream_outer_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM event-time LEFT OUTER interval join drained inside
    the hash-checked gate — certifying the subtlest streaming semantics
    in the join family: NULL-side emission at watermark expiry. The
    events table splits into a left (even event_ids) and right (odd)
    stream, joined per user on a [0, 30 min] event-time range with
    0-second watermarks. Matched pairs emit in the data micro-batch;
    an unmatched left emits exactly one null-matched row in the
    availableNow FINALIZATION batch iff its join window closed STRICTLY
    below the final watermark ``min(max(left_time), max(right_time))``
    — boundary behavior empirically pinned (a window closing exactly AT
    the watermark is withheld, and never emits in an availableNow
    drain). The oracle replays the matched pairs as a batch interval
    join and the null set by that exact watermark rule.

    Scale notes: both sides are watermarked so join state is
    eviction-bounded exactly as in production; per-user aggregation
    happens before anything leaves the executors; narrow state store
    for the drain (q188 rationale), fresh checkpoint per run."""
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q218_")
    try:
        staged = ev.select(
            "event_id",
            "user_id",
            F.expr("timestamp_micros(ts div 1000)").alias("event_time"),
            _dec("value").alias("v"),
        )
        staged.filter(F.col("event_id") % 2 == 0).write.parquet(f"{work}/left")
        staged.filter(F.col("event_id") % 2 == 1).write.parquet(f"{work}/right")

        schema = "event_id LONG, user_id LONG, event_time TIMESTAMP, v DECIMAL(18,4)"
        left = (
            spark.readStream.schema(schema)
            .parquet(f"{work}/left")
            .withWatermark("event_time", "0 seconds")
            .select("user_id", F.col("event_time").alias("a_time"))
        )
        right = (
            spark.readStream.schema(schema)
            .parquet(f"{work}/right")
            .withWatermark("event_time", "0 seconds")
            .select(
                F.col("user_id").alias("r_user"),
                F.col("event_time").alias("b_time"),
                "v",
            )
        )
        joined = left.join(
            right,
            F.expr(
                "user_id = r_user AND b_time >= a_time "
                "AND b_time <= a_time + INTERVAL 30 MINUTES"
            ),
            "leftOuter",
        ).select("user_id", "v", F.col("r_user").isNotNull().alias("matched"))
        sink = f"{work}/rows"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                joined.writeStream.outputMode("append")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q218: stream outer-join drain did not finish within "
                    "300 s — refusing to report a partial row set"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        out = (
            spark.read.parquet(sink)
            .groupBy("user_id")
            .agg(
                F.count(F.when(F.col("matched"), 1)).alias("n_pairs"),
                F.round(F.sum(F.when(F.col("matched"), F.col("v")).otherwise(F.lit(0).cast("decimal(18,4)"))), 2)
                .cast("double")
                .alias("matched_value"),
                F.count(F.when(~F.col("matched"), 1)).alias("n_expired_null"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q219_oracle(iterations: int = 2, scale: int = 1_000_000) -> str:
    # Generated CTE chain replaying the integer power iteration, one
    # (w, m, v) triple per iteration — the q187 k-means treatment.
    steps = []
    prev = "v0"
    for k in range(1, iterations + 1):
        steps.append(f"""
    w{k} AS (
      SELECT g.i, CAST(sum(g.g2 * v.v) AS BIGINT) AS w
      FROM g2 g JOIN {prev} v ON v.dim = g.j GROUP BY 1
    ),
    m{k} AS (SELECT CAST(max(abs(w)) // {scale} AS BIGINT) AS d FROM w{k}),
    v{k} AS (
      SELECT i AS dim,
             CAST(CASE WHEN w < 0 THEN -(abs(w) // d) ELSE w // d END AS BIGINT) AS v
      FROM w{k}, m{k}
    )""")
        prev = f"v{k}"
    chain = ",".join(steps)
    return f"""
    WITH flat AS (
      SELECT vec_id,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))) AS q
      FROM embeddings
    ),
    gram AS (
      SELECT a.dim AS i, b.dim AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g
      FROM flat a JOIN flat b USING (vec_id) GROUP BY 1, 2
    ),
    g2 AS (
      SELECT i, j,
             CAST(CASE WHEN g < 0 THEN -(abs(g) // {scale})
                       ELSE g // {scale} END AS BIGINT) AS g2
      FROM gram
    ),
    v0 AS (SELECT DISTINCT i AS dim, CAST({scale} AS BIGINT) AS v FROM g2),{chain}
    SELECT dim, v AS v_milli FROM {prev}
    """


@query("q219_pca_power_iteration", oracle=_q219_oracle())
def q219_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant singular direction of the embedding corpus
    (:func:`similarity.dominant_direction`): 2 rounds of power iteration
    on the Gram matrix, every step integer-quantized (scan-side
    floor(1e6*v), exact BIGINT Gram sums, sign-split TRUNCATING
    divisions — pinned because Spark's ``div`` truncates on negatives)
    and replayed by a generated CTE chain, one (multiply, max-norm,
    renormalize) triple per iteration — the q187 k-means treatment
    applied to spectral structure. The curation use: the top principal
    direction of an embedding table is the first thing an
    embedding-health audit inspects (a runaway dominant direction means
    collapsed representations).

    Scale shape: the corpus contributes ONE map-side-combining
    Gram aggregate (dims² = 4096 cells regardless of row count); the
    iterations run on dims-sized frames with broadcast joins — X is
    never materialized."""
    from phoebe_spark.operators import similarity as sim

    return sim.dominant_direction(_t(spark, sf_dir, "embeddings"))


def _q220_oracle(n_slices: int = 4, delay_s: int = 61) -> str:
    # Replay the engine's exact cross-batch dedup-within-watermark state
    # machine, one CTE per micro-batch. Mechanics pinned with boundary
    # probes (see the query docstring): no late-row filter; a state
    # entry from batch i blocks a duplicate in batch k iff it survived
    # every end-of-batch eviction, i.e. iff t_i + delay >= wm_{k-1}
    # where wm_j = max(event seconds of batches < j) - delay; the
    # minute grid + 61 s delay make expiry == watermark impossible, so
    # boundary strictness never engages.
    steps = ["e1 AS (SELECT DISTINCT fp, tsec FROM rows WHERE slice = 0)"]
    for k in range(2, n_slices + 1):
        prior = " UNION ALL ".join(
            f"SELECT fp, tsec FROM e{j}" for j in range(1, k)
        )
        # the blocking test for batch k uses wm_{k-1} = max(tsec of
        # batches < k-1, i.e. slices < k-2) - delay; coalesce(-inf)
        # because wm_1 is unset (every prior entry is alive for batch 2)
        steps.append(f"""
    e{k} AS (
      SELECT DISTINCT r.fp, r.tsec
      FROM rows r
      WHERE r.slice = {k - 1}
        AND NOT EXISTS (
          SELECT 1 FROM ({prior}) p
          WHERE p.fp = r.fp
            AND p.tsec + {delay_s} >=
                coalesce((SELECT max(tsec) FROM rows WHERE slice < {k - 2}),
                         -922337203685477) - {delay_s}
        )
    )""")
    admits = " UNION ALL ".join(
        f"SELECT fp FROM e{j}" for j in range(1, n_slices + 1)
    )
    return f"""
    WITH base AS (
      SELECT {_PREFIX_FP_SQL} AS fp, doc_id % {n_slices} AS slice
      FROM documents
    ),
    rows AS (
      SELECT fp, slice,
             ((CAST(('0x' || substring(md5(fp), 1, 4)) AS BIGINT) % 50)
              + slice * 37) * 60 AS tsec
      FROM base
    ),
    {",".join(steps)},
    admits AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_admits FROM ({admits}) GROUP BY 1),
    copies AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_copies FROM base GROUP BY 1)
    SELECT c.fp, coalesce(a.n_admits, 0) AS n_admits,
           c.n_copies - coalesce(a.n_admits, 0) AS n_dropped
    FROM copies c LEFT JOIN admits a USING (fp)
    """


@query("q220_dedup_within_watermark_drain", oracle=_q220_oracle())
def q220_dedup_within_watermark_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ``dropDuplicatesWithinWatermark`` inside the
    hash-checked gate — the built-in TTL dedup operator's exact
    cross-batch state machine certified against a replaying oracle. The
    documents table replays as 4 sequenced files (slice = doc_id % 4,
    one file per trigger); each fingerprint's event time is a stable
    function of (fp, slice) so the state content is deterministic.

    Mechanics empirically pinned with boundary probes (this is the
    entire value of the entry — none of this is in the docs):
      - there is NO late-row filter: a row below the watermark is still
        admitted if its key is absent from state;
      - a dropped duplicate does NOT re-arm the state expiry (expiry
        stays first-emission time + delay);
      - eviction happens at END of each batch with that batch's
        watermark, so a duplicate in batch k is blocked iff the prior
        emission survived through wm_{k-1} = max(event time of batches
        < k-1) - delay — re-admission of a key AFTER its state expired
        is real and exercised (dup groups straddle non-adjacent slices);
      - the minute event-time grid with a 61 s delay makes expiry ==
        watermark unrepresentable, so boundary strictness is moot by
        construction.

    Scale: state is per-fingerprint with watermark-bounded TTL — the
    production ingest-dedup shape; per-fp aggregation before output."""
    import glob
    import os
    import shutil
    import tempfile

    d = _t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="q220_")
    src_dir = f"{work}/src"
    try:
        os.makedirs(src_dir)
        base = d.select(
            _prefix_fp().alias("fp"),
            (F.col("doc_id") % 4).alias("slice"),
        )
        rows = base.select(
            "fp",
            "slice",
            F.expr(
                "timestamp'2026-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, "
                "((CAST(conv(substring(md5(fp), 1, 4), 16, 10) AS BIGINT) % 50)"
                " + slice * 37) * 60)"
            ).alias("event_time"),
        )
        rows.repartition(1).write.partitionBy("slice").parquet(f"{work}/stage")
        for i in range(4):
            (part,) = glob.glob(f"{work}/stage/slice={i}/part-*.parquet")
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("fp STRING, event_time TIMESTAMP")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .withWatermark("event_time", "61 seconds")
            .dropDuplicatesWithinWatermark(["fp"])
        )
        sink = f"{work}/admitted"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q220: dedup-within-watermark drain did not finish within "
                    "300 s — refusing to report a partial admitted set"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        admits = (
            spark.read.parquet(sink)
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_admits"))
        )
        copies = base.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
        out = copies.join(admits, "fp", "left").select(
            "fp",
            F.coalesce("n_admits", F.lit(0)).alias("n_admits"),
            (F.col("n_copies") - F.coalesce("n_admits", F.lit(0))).alias(
                "n_dropped"
            ),
        )
        rows_out = out.collect()
        return spark.createDataFrame(rows_out, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q221_oracle(seed_mod: int = 11, rounds: int = 2, num_hashes: int = 8, bands: int = 8) -> str:
    rpb = num_hashes // bands
    steps = []
    prev = "d0"
    for k in range(1, rounds + 1):
        steps.append(f"""
    b{k} AS (
      SELECT e.bkey, CAST(min(d.dist) + 1 AS BIGINT) AS bdist
      FROM edges e JOIN {prev} d USING (doc) GROUP BY 1
    ),
    r{k} AS (
      SELECT e.doc, CAST(min(b.bdist) + 1 AS BIGINT) AS dist
      FROM edges e JOIN b{k} b USING (bkey) GROUP BY 1
    ),
    d{k} AS (
      SELECT doc, CAST(min(dist) AS BIGINT) AS dist
      FROM (SELECT * FROM {prev} UNION ALL SELECT * FROM r{k}) GROUP BY 1
    )""")
        prev = f"d{k}"
    chain = ",".join(steps)
    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' '))) AS grams
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    hp AS (
      SELECT doc_id,
             {_MD5H_SQL.format(x='g')} % 2147483647 AS h1,
             CAST(('0x' || substring(md5(g), 17, 15)) AS BIGINT) % 2147483646 + 1 AS h2
      FROM post
    ),
    mh AS (
      SELECT doc_id, i, min((h1 + i * h2) % 2147483647) AS h
      FROM hp CROSS JOIN (SELECT unnest(generate_series(0, {num_hashes - 1})) AS i) seeds
      GROUP BY 1, 2
    ),
    sig AS (SELECT doc_id, list(h ORDER BY i) AS s FROM mh GROUP BY 1),
    edges AS (
      SELECT doc_id AS doc,
             CAST(b AS VARCHAR) || ':' ||
             array_to_string(list_transform(s[b*{rpb}+1:b*{rpb}+{rpb}],
                                            x -> CAST(x AS VARCHAR)), ',') AS bkey
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS b) bands
    ),
    d0 AS (
      SELECT doc_id AS doc, CAST(0 AS BIGINT) AS dist FROM documents
      WHERE doc_id % {seed_mod} = 0
    ),{chain}
    SELECT doc, dist // 2 AS dist FROM {prev}
    """


@query("q221_contamination_closure_bfs", oracle=_q221_oracle())
def q221_contamination_closure_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive contamination closure (:func:`dedup.lsh_cobucket_bfs`):
    BFS from seed documents (doc_id % 11 = 0) through the LSH doc <->
    (band, bucket) BIPARTITE graph (SINGLE-minhash bands — the
    recall-heavy banding a transitive sweep wants: loose candidate
    edges, verification downstream), two co-bucket hops deep — "every
    document within two near-dup hops of a known-contaminated seed",
    the cleanup sweep that catches syndicated near-dups-of-near-dups
    direct probing (q217) misses. The oracle replays the md5 banding
    (the q24 machinery) and each BFS expansion as a CTE chain.

    Scale shape: hub expansion keeps every step an equi-join LINEAR in
    the edge table (8 bands x docs) — the co-bucket PAIR set, quadratic
    in a hot bucket, is never materialized. Distances are min-combined
    per round, checkpointed like the connected-components loop."""
    d = _t(spark, sf_dir, "documents")
    seeds = d.filter(F.col("doc_id") % 11 == 0)
    return dedup.lsh_cobucket_bfs(d, seeds, num_hashes=8, bands=8)


@query(
    "q222_csv_roundtrip",
    oracle=r"""
    SELECT doc_id,
           md5('pre,"fix' || chr(10) || text || chr(9) || 'suf\fix,"')
             AS content_md5
    FROM documents
    """,
)
def q222_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless CSV round-trip under ADVERSARIAL content — each document
    is wrapped with embedded quotes, commas, a newline, a tab, and a
    backslash before being written to CSV and read back (multiLine +
    matching quote/escape). The oracle hashes the constructed payload
    directly: the only way the engine matches is if the CSV writer's
    quoting and the reader's parse are exact inverses, byte for byte.
    Completes the sink/format ladder next to the JSONL (q139) and ORC
    (q143) round-trips with the format that actually breaks pipelines.

    Scale notes: CSV is a line-oriented splittable format only WITHOUT
    embedded newlines; multiLine forces single-file parsing per file, so
    the production guidance (docstring contract) is: quote-heavy text
    columns belong in parquet, CSV is an interchange edge — which is
    exactly what this entry demonstrates by needing multiLine."""
    import shutil
    import tempfile

    d = _t(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit('pre,"fix\n'), F.col("text"), F.lit('\tsuf\\fix,"')
    )
    work = tempfile.mkdtemp(prefix="q222_")
    try:
        (
            d.select("doc_id", payload.alias("content"))
            .write.option("header", True)
            .option("quoteAll", True)
            .csv(f"{work}/csv")
        )
        back = (
            spark.read.option("header", True)
            .option("multiLine", True)
            .option("inferSchema", False)
            .schema("doc_id LONG, content STRING")
            .csv(f"{work}/csv")
        )
        out = back.select("doc_id", F.md5("content").alias("content_md5"))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q223_schema_evolution_read",
    oracle="""
    WITH unioned AS (
      SELECT source, NULL::BIGINT AS quality FROM documents WHERE doc_id % 3 <> 0
      UNION ALL
      SELECT source, n_chars AS quality FROM documents WHERE doc_id % 3 = 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(quality) AS BIGINT) AS n_with_quality,
           CAST(sum(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_quality,
           CAST(coalesce(sum(quality), 0) AS BIGINT) AS quality_total
    FROM unioned GROUP BY source
    """,
)
def q223_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: an old snapshot (doc_id % 3 != 0, no
    ``quality`` column) and a new snapshot (doc_id % 3 = 0, with it)
    live side by side in one dataset directory; ``mergeSchema=true``
    reconciles the footers and old rows surface NULL quality — the
    data-lake migration read every long-lived table eventually needs.
    The per-source census (rows / with / missing / total) is the audit a
    pipeline runs before trusting the evolved column. The oracle builds
    the same union with explicit NULLs.

    Scale notes: schema merge is a FOOTER-level operation (per-file, no
    data scan); the census itself is one map-side-combining groupBy.
    Guidance encoded here: evolved columns must be added nullable-only —
    exactly what parquet merge enforces."""
    import shutil
    import tempfile

    d = _t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="q223_")
    try:
        d.filter(F.col("doc_id") % 3 != 0).select("doc_id", "source").write.parquet(
            f"{work}/data/v=1"
        )
        d.filter(F.col("doc_id") % 3 == 0).select(
            "doc_id", "source", F.col("n_chars").alias("quality")
        ).write.parquet(f"{work}/data/v=2")
        merged = spark.read.option("mergeSchema", True).parquet(f"{work}/data")
        out = merged.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("quality").alias("n_with_quality"),
            F.count(F.when(F.col("quality").isNull(), 1)).alias("n_missing_quality"),
            F.coalesce(F.sum("quality"), F.lit(0)).cast("long").alias("quality_total"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q224_quantile_normalize",
    oracle="""
    WITH d AS (
      SELECT doc_id, source AS g, CAST(length(text) AS BIGINT) AS score
      FROM documents
    ),
    r AS (
      SELECT doc_id, g, score,
             CAST(row_number() OVER (PARTITION BY g ORDER BY score, doc_id)
                  AS BIGINT) AS k,
             CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS ns,
             CAST(count(*) OVER () AS BIGINT) AS n_total
      FROM d
    ),
    vh AS (
      SELECT score, CAST(sum(count(*)) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM d GROUP BY score
    ),
    t AS (
      SELECT doc_id, g, score,
             CASE WHEN ns = 1 THEN 1 + ((2 * (n_total - 1) + 2) // 4)
                  ELSE 1 + ((2 * (n_total - 1) * (k - 1) + (ns - 1))
                            // (2 * (ns - 1))) END AS t
      FROM r
    )
    SELECT doc_id, g AS source, score,
           (SELECT min(vh.score) FROM vh WHERE vh.cum >= t.t) AS norm_score
    FROM t
    """,
)
def q224_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization
    (:func:`curation.quantile_normalize`): every document's length score
    is replaced by the GLOBAL distribution's value at the document's
    within-source quantile — the calibration that makes per-source
    quality thresholds comparable before one cut gates a mixed corpus.
    Exact nearest-rank integer arithmetic (round-half-up rank mapping in
    BIGINTs, single-doc sources map to the median) — no interpolation
    floats, so the oracle matches digit-for-digit.

    Scale shape: one rank window per source + a value-domain-bounded
    histogram carried as a single broadcast sorted-array row, probed
    with a codegen filter/size bisect — no global row sort, no
    per-row correlated lookup shuffle."""
    from phoebe_spark.operators import curation

    return curation.quantile_normalize(_t(spark, sf_dir, "documents"))


@query(
    "q225_market_basket",
    oracle="""
    WITH baskets AS (
      SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS parts
      FROM lineitem GROUP BY 1
    ),
    n_orders AS (SELECT CAST(count(*) AS BIGINT) AS n FROM baskets),
    pairs AS (
      SELECT l_orderkey, a, b
      FROM baskets,
           unnest(parts) AS ua(a),
           unnest(parts) AS ub(b)
      WHERE a < b
    ),
    pair_cnt AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
      FROM pairs GROUP BY 1, 2
    ),
    part_cnt AS (
      SELECT part, CAST(count(*) AS BIGINT) AS n_p FROM (
        SELECT l_orderkey, unnest(parts) AS part FROM baskets
      ) GROUP BY 1
    )
    SELECT p.a AS part_a, p.b AS part_b, p.n_ab, ca.n_p AS n_a, cb.n_p AS n_b,
           round(CAST(p.n_ab AS DOUBLE) * n_orders.n / ca.n_p / cb.n_p, 6)
             AS lift
    FROM pair_cnt p
    JOIN part_cnt ca ON ca.part = p.a
    JOIN part_cnt cb ON cb.part = p.b
    CROSS JOIN n_orders
    WHERE p.n_ab >= 3
    """,
)
def q225_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over order baskets: co-occurrence
    counts and LIFT for every part pair appearing in >= 3 orders — the
    association-rule primitive (Agrawal & Srikant 1994, public) that in
    a training-data pipeline doubles as a co-occurrence prior for
    document-bundle dedup. Pair expansion happens INSIDE each basket
    (combinations of a <= 13-line order, never a part-keyed self-join),
    so the shuffle is one groupBy(order) + one groupBy(pair) — bounded
    by sum(basket²), not corpus². Lift's float division is written with
    the identical operation order in both engines; every count is
    BIGINT.

    Scale shape: the classic a-priori first pass as two skew-free
    shuffles; a part-keyed self-join (the naive shape) would explode on
    popular parts — baskets bound it instead."""
    li = _t(spark, sf_dir, "lineitem")
    # basket frame materialized once: three consumers (pair expansion,
    # part counts, order total) would otherwise each re-run the
    # scan+groupBy(order) subtree (verified: 4 FileScans without this)
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint(eager=True)
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n"))
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("parts"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("parts"),
                            i + 2,
                            F.greatest(F.size("parts") - i - 1, F.lit(0)),
                        ),
                        lambda b: F.struct(a.alias("a"), b.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    pair_cnt = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    part_cnt = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    ca = part_cnt.select(F.col("part").alias("a"), F.col("n_p").alias("n_a"))
    cb = part_cnt.select(F.col("part").alias("b"), F.col("n_p").alias("n_b"))
    return (
        pair_cnt.filter(F.col("n_ab") >= 3)
        .join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab").cast("double") * F.col("n") / F.col("n_a") / F.col("n_b"),
                6,
            ).alias("lift"),
        )
    )


@query(
    "q226_delta_encoding_audit",
    oracle=f"""
    WITH s AS (
      SELECT user_id, {EPOCH_SQL.format(c='ts')} AS t,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS k,
             lag({EPOCH_SQL.format(c='ts')}, 1) OVER w AS t1,
             lag({EPOCH_SQL.format(c='ts')}, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    bits AS (
      SELECT user_id,
             CASE WHEN k = 1 THEN 64
                  WHEN k = 2 THEN 14
                  ELSE (
                    CASE WHEN (t - t1) - (t1 - t2) = 0 THEN 1
                         WHEN (t - t1) - (t1 - t2) BETWEEN -63 AND 64 THEN 9
                         WHEN (t - t1) - (t1 - t2) BETWEEN -255 AND 256 THEN 12
                         WHEN (t - t1) - (t1 - t2) BETWEEN -2047 AND 2048 THEN 16
                         ELSE 36 END)
             END AS b
      FROM s
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(b) AS BIGINT) AS bits_total,
           CAST((sum(b) * 1000) // count(*) AS BIGINT) AS bits_per_sample_milli,
           CAST((sum(b) * 1000) // (64 * count(*)) AS BIGINT)
             AS compression_ratio_milli
    FROM bits GROUP BY user_id
    """,
)
def q226_delta_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla-style timestamp delta-of-delta compressibility audit
    (Pelkonen et al. 2015 "Gorilla", VLDB — public, §4.1): per user
    series ordered by (ts, event_id), second differences of the epoch
    seconds are bucketed into the Gorilla bit classes (0 -> 1 bit,
    ±63/64 -> 9, ±255/256 -> 12, ±2047/2048 -> 16, else 36; first
    sample 64, first delta 14) and summed into per-series storage
    estimates — the "should this series be delta-encoded" decision a
    time-series store makes at ingest, and the cadence-regularity
    fingerprint of an event feed. Pure integer arithmetic end to end.

    Scale shape: two lags over one per-user window (uniform key), one
    grouped sum; nothing leaves codegen."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.expr("ts div 1000000000").alias("t"),
        F.row_number().over(w).alias("k"),
        F.lag(F.expr("ts div 1000000000"), 1).over(w).alias("t1"),
        F.lag(F.expr("ts div 1000000000"), 2).over(w).alias("t2"),
    )
    dod = (F.col("t") - F.col("t1")) - (F.col("t1") - F.col("t2"))
    b = (
        F.when(F.col("k") == 1, 64)
        .when(F.col("k") == 2, 14)
        .when(dod == 0, 1)
        .when(dod.between(-63, 64), 9)
        .when(dod.between(-255, 256), 12)
        .when(dod.between(-2047, 2048), 16)
        .otherwise(36)
    )
    return (
        s.select("user_id", b.alias("b"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("b").alias("bits_total"),
            F.expr("(sum(b) * 1000) div count(*)").alias("bits_per_sample_milli"),
            F.expr("(sum(b) * 1000) div (64 * count(*))").alias(
                "compression_ratio_milli"
            ),
        )
    )


@query(
    "q227_token_waterfill",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    ordered AS (
      SELECT source, n_tokens,
             CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS i,
             CAST(count(*) OVER () AS BIGINT) AS m,
             CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM src
    ),
    scal AS (
      SELECT CAST(max(cum) AS BIGINT) AS total,
             CAST(max(cum) / 2 AS BIGINT) AS b,
             CAST(max(m) AS BIGINT) AS m
      FROM ordered
    ),
    -- i0 = largest fully-taken prefix: cum_i + (m-i)*n_i <= budget
    pick AS (
      SELECT coalesce(max(o.i), 0) AS i0
      FROM ordered o, scal
      WHERE o.cum + (scal.m - o.i) * o.n_tokens <= scal.b
    ),
    tau AS (
      SELECT CASE WHEN scal.total <= scal.b THEN NULL
                  ELSE (scal.b - coalesce(
                          (SELECT cum FROM ordered WHERE i = pick.i0), 0))
                       // (scal.m - pick.i0)
             END AS tau
      FROM pick, scal
    )
    SELECT o.source, o.n_tokens,
           CAST(CASE WHEN tau.tau IS NULL THEN o.n_tokens
                     ELSE least(o.n_tokens, tau.tau) END AS BIGINT) AS alloc
    FROM ordered o, tau
    """,
)
def q227_token_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget WATERFILL allocation across sources: with a budget
    of half the corpus, cap every source at the common level tau such
    that sum(min(n_tokens_s, tau)) fills the budget — small sources are
    taken whole, large ones cut to tau (max-min fairness, the classic
    water-filling rule, applied to mixture balancing when one feed
    dwarfs the rest). Exact integers: i0 = the largest prefix with
    ``cum_i + (m-i)*n_i <= budget``; ``tau = (budget - cum_i0) div
    (m - i0)``; floor(tau) >= every prefix size, so ``min(n, tau)``
    needs no prefix special-case (proved in the docstring test).

    Scale shape: ONE map-side-combining token count over the corpus;
    the waterfill solve is two windows over the sources-sized frame."""
    d = _t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).cast("long").alias("n_tokens")
    )
    w = Window.orderBy("n_tokens", "source")
    ordered = src.select(
        "source",
        "n_tokens",
        F.row_number().over(w).cast("long").alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
        F.sum("n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    ).localCheckpoint(eager=True)
    scal = ordered.agg(
        F.max("cum").alias("total"),
        (F.max("cum") / 2).cast("long").alias("b"),
        F.max("m").alias("ms"),
    )
    pick = (
        ordered.drop("m").crossJoin(F.broadcast(scal))
        .filter(F.col("cum") + (F.col("ms") - F.col("i")) * F.col("n_tokens") <= F.col("b"))
        .agg(F.coalesce(F.max("i"), F.lit(0)).alias("i0"))
    )
    cum_i0 = (
        ordered.join(F.broadcast(pick), F.col("i") == F.col("i0"))
        .agg(F.coalesce(F.max("cum"), F.lit(0)).alias("cum0"))
    )
    tau = (
        scal.crossJoin(F.broadcast(pick))
        .crossJoin(F.broadcast(cum_i0))
        .select(
            F.when(F.col("total") <= F.col("b"), F.lit(None).cast("long"))
            .otherwise(
                F.expr("(b - cum0) div (ms - i0)")
            )
            .alias("tau")
        )
    )
    return ordered.crossJoin(F.broadcast(tau)).select(
        "source",
        "n_tokens",
        F.when(F.col("tau").isNull(), F.col("n_tokens"))
        .otherwise(F.least(F.col("n_tokens"), F.col("tau")))
        .alias("alloc"),
    )


@query(
    "q228_interleaved_epoch_order",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS r
      FROM documents
    )
    SELECT doc_id, source, r,
           CAST(row_number() OVER (ORDER BY r, source, doc_id) - 1 AS BIGINT)
             AS pos
    FROM r
    """,
)
def q228_interleaved_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ROUND-ROBIN INTERLEAVED dataloader order: documents
    are shuffled within source (md5 hash order) and sources interleaved
    round-robin — the epoch order a mixture dataloader feeds the trainer
    so no source clumps. The engine computes each document's global
    position with a CLOSED FORM instead of a global sort:

        pos(s, r) = sum_s' min(n_s', r-1) + |{s' < s : n_s' >= r}|

    (everything strictly earlier in round-robin order), evaluated as a
    codegen HOF over the broadcast per-source count table. The ORACLE
    computes the actual global ``row_number() OVER (ORDER BY r, source)``
    — so the hash match PROVES the closed form equals the real global
    rank at every row. Within-source ranking is the only shuffle; the
    interleave itself costs nothing at any scale (this is why real
    dataloaders use rank arithmetic, not sorts).

    Money/typing: all BIGINT."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = d.select(
        "doc_id", "source", F.row_number().over(w).cast("long").alias("r")
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    arrs = counts.agg(
        F.array_sort(F.collect_list(F.struct("source", "n"))).alias("sn")
    )
    pos = F.expr(
        """
        aggregate(sn, CAST(0 AS BIGINT),
          (acc, e) -> acc
            + least(e.n, r - 1)
            + CASE WHEN e.source < source AND e.n >= r THEN 1 ELSE 0 END)
        """
    )
    return r.crossJoin(F.broadcast(arrs)).select(
        "doc_id", "source", "r", pos.alias("pos")
    )


_Q229_GAP_MS = 50_000_001  # ODD, against the even synthetic-ms grid


@query(
    "q229_event_timer_sessions_drain",
    oracle=f"""
    WITH t AS (
      SELECT user_id AS key,
             2 * (({EPOCH_SQL.format(c='ts')}) * 1000 + event_id % 1000) AS tm
      FROM events
    ),
    s AS (
      SELECT key, tm,
             CASE WHEN lag(tm) OVER w IS NULL
                       OR tm - lag(tm) OVER w > {_Q229_GAP_MS} THEN 1
                  ELSE 0 END AS brk
      FROM t WINDOW w AS (PARTITION BY key ORDER BY tm)
    ),
    g AS (
      SELECT key, tm,
             sum(brk) OVER (PARTITION BY key ORDER BY tm
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    ),
    sess AS (
      SELECT key, sid,
             CAST(min(tm) AS BIGINT) AS session_start,
             CAST(max(tm) AS BIGINT) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events
      FROM g GROUP BY 1, 2
    ),
    wm AS (SELECT max(tm) AS w FROM t),
    last AS (SELECT key, max(sid) AS ls FROM sess GROUP BY 1)
    SELECT CAST(sess.key AS VARCHAR) AS key, session_start, session_end, n_events
    FROM sess JOIN last USING (key), wm
    WHERE sid < ls OR session_end + {_Q229_GAP_MS} < wm.w
    """,
)
def q229_event_timer_sessions_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING custom sessionization with EVENT-TIME TIMERS drained
    inside the hash-checked gate (:func:`stateful.session_close_event_time`):
    the applyInPandasWithState timer path (``EventTimeTimeout`` +
    ``setTimeoutTimestamp`` + ``hasTimedOut``) certified end to end —
    sessions close by in-batch gap splits when the next same-key event
    arrives, or by WATERMARK-driven timer firings (including the
    availableNow finalization batch, which is what lets the drain
    self-terminate — unlike processing-time timers, documented at
    :func:`stateful.streaming_session_finalizer`).

    The fixture makes every divergence class unrepresentable:
      - synthetic EVEN-millisecond event times ``2*(epoch_s*1000 +
        event_id%1000)`` keep range-staged slices value-monotone (ties
        may straddle files, but an equal-time same-key arrival always
        merges in-handler, and the odd gap keeps the timer threshold off
        every tie), so a timer-vs-data race in one batch is
        emission-equivalent either way;
      - the ODD gap keeps ``session_end + gap`` off the even watermark
        grid, so fire-boundary strictness never engages.
    The oracle is the batch gaps-and-islands sessionization minus each
    key's final session unless its close passed the final watermark —
    all three paths (splits, merges, withheld lasts) are exercised at
    every SF (asserted in tests).

    Scale: state is three scalars per OPEN session; emission is
    exactly-once append."""
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming.stateful import session_close_event_time

    ev = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q229_")
    src_dir = f"{work}/src"
    try:
        os.makedirs(src_dir)
        staged = ev.select(
            F.col("user_id"),
            F.expr(
                "timestamp_millis(2 * ((ts div 1000000000) * 1000 + event_id % 1000))"
            ).alias("event_time"),
        )
        staged.repartitionByRange(4, "event_time").write.parquet(f"{work}/stage")
        parts = sorted(glob.glob(f"{work}/stage/part-*.parquet"))
        for i, part in enumerate(parts, start=1):
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("user_id LONG, event_time TIMESTAMP")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .withWatermark("event_time", "0 seconds")
        )
        sessions = session_close_event_time(
            stream, gap_ms=_Q229_GAP_MS, key_col="user_id"
        )
        sink = f"{work}/sessions"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                sessions.writeStream.outputMode("append")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q229: event-timer session drain did not finish within "
                    "300 s — refusing to report a partial session set"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        out = spark.read.parquet(sink).select(
            "key", "session_start", "session_end", "n_events"
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q230_weighted_median",
    oracle="""
    WITH d AS (
      SELECT source, CAST(length(text) AS BIGINT) AS v,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS w,
             doc_id
      FROM documents
    ),
    c AS (
      SELECT source, v, w,
             CAST(sum(w) OVER (PARTITION BY source ORDER BY v, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cw,
             CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS tw
      FROM d
    )
    SELECT source,
           CAST(min(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
             AS weighted_median,
           CAST(max(tw) AS BIGINT) AS total_weight
    FROM c GROUP BY source
    """,
)
def q230_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source WEIGHTED median: the smallest value whose
    cumulative weight reaches half the total (weights = token counts, so
    this is "the document length at which half the source's TOKENS sit
    in shorter docs" — the length cut a token-budgeted sampler actually
    cares about, where the unweighted median answers the wrong
    question). Lower-weighted-median convention, pure BIGINT cumulative
    arithmetic with a doc_id tie-break — digit-exact against the oracle.
    Completes the robust-stats ladder: median/MAD (q77), winsorized
    (q199-family), weighted median.

    Scale shape: one per-source cumulative window + one grouped min —
    no joins, no value-domain assumptions."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "source",
        F.length("text").cast("long").alias("v"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("w"),
        "doc_id",
    )
    wcum = Window.partitionBy("source").orderBy("v", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = base.select(
        "source",
        "v",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(Window.partitionBy("source")).alias("tw"),
    )
    return c.groupBy("source").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v"))).alias(
            "weighted_median"
        ),
        F.max("tw").alias("total_weight"),
    )


@query(
    "q231_eval_apportionment",
    oracle="""
    WITH src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(200 AS BIGINT) AS b FROM src),
    q AS (
      SELECT source, n,
             CAST((tot.b * n) // tot.nt AS BIGINT) AS fl,
             CAST((tot.b * n) % tot.nt AS BIGINT) AS rem
      FROM src, tot
    ),
    ranked AS (
      SELECT source, n, fl, rem,
             CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rr,
             CAST((SELECT b FROM tot) - sum(fl) OVER () AS BIGINT) AS leftover
      FROM q
    )
    SELECT source, n AS n_docs, fl + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
             AS quota
    FROM ranked
    """,
)
def q231_eval_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) APPORTIONMENT of a fixed eval budget
    (200 docs) across sources: floor quotas ``(b*n_s) div N`` plus one
    extra seat to the largest remainders until the budget is exact —
    the standard way an eval set is cut proportionally without
    fractional documents (and the method whose paradoxes are
    disclosed textbook material — public classic). Pure BIGINT: floors,
    modular remainders, a remainder rank with a source tie-break.
    Sums exactly to the budget by construction (invariant-tested).
    Pairs with the waterfill allocator (q227): waterfill caps dominant
    sources, Hamilton splits a fixed budget proportionally.

    Scale shape: one map-side-combining count; the apportionment runs
    on the sources-sized frame."""
    d = _t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = src.agg(F.sum("n").alias("nt"), F.lit(200).cast("long").alias("b"))
    q = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr("(b * n) div nt").alias("fl"),
        F.expr("(b * n) % nt").alias("rem"),
        "b",
    )
    w = Window.orderBy(F.col("rem").desc(), "source")
    ranked = q.select(
        "source",
        "n",
        "fl",
        F.row_number().over(w).cast("long").alias("rr"),
        (F.col("b") - F.sum("fl").over(Window.partitionBy())).alias("leftover"),
    )
    return ranked.select(
        "source",
        F.col("n").alias("n_docs"),
        (F.col("fl") + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)).alias(
            "quota"
        ),
    )


# ---------------------------------------------------------------------------
# Round 6: graph analytics, semantic dedup, RAG prep, batch packing
# ---------------------------------------------------------------------------

# Part co-occurrence graph shared by q232/q233: undirected edge between two
# parts that appear together in >= 2 distinct orders. TPC-H bounds lines per
# order (<= 7), so the pair fan-out per order is O(1) and the edge build is
# LINEAR in lineitem at any scale factor — the graph never densifies into
# an all-pairs blow-up the way a naive similarity graph would.
_COGRAPH_SQL = """
    os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    co AS (
      SELECT a.l_partkey AS s1, b.l_partkey AS s2
      FROM os a JOIN os b USING (l_orderkey)
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
"""


def _cograph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (s1 < s2) co-occurrence edges; see _COGRAPH_SQL."""
    li = _t(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_partkey").distinct()
    a = os_.alias("a")
    b = os_.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("s1"), F.col("b.l_partkey").alias("s2")
        )
        .count()
        .filter(F.col("count") >= 2)
        .select("s1", "s2")
    )


@query(
    "q232_part_pagerank",
    oracle=f"""
    WITH {_COGRAPH_SQL},
    edges AS (SELECT s1 AS src, s2 AS dst FROM co
              UNION ALL SELECT s2, s1 FROM co),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM deg),
    we AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS w
           FROM edges e JOIN deg d USING (src)),
    r0 AS (SELECT src AS node, 1.0 / (SELECT cnt FROM n) AS r FROM deg),
    r1 AS (SELECT we.dst AS node,
                  0.15 / (SELECT cnt FROM n) + 0.85 * sum(we.w * r0.r) AS r
           FROM we JOIN r0 ON we.src = r0.node GROUP BY 1),
    r2 AS (SELECT we.dst AS node,
                  0.15 / (SELECT cnt FROM n) + 0.85 * sum(we.w * r1.r) AS r
           FROM we JOIN r1 ON we.src = r1.node GROUP BY 1),
    r3 AS (SELECT we.dst AS node,
                  0.15 / (SELECT cnt FROM n) + 0.85 * sum(we.w * r2.r) AS r
           FROM we JOIN r2 ON we.src = r2.node GROUP BY 1),
    r4 AS (SELECT we.dst AS node,
                  0.15 / (SELECT cnt FROM n) + 0.85 * sum(we.w * r3.r) AS r
           FROM we JOIN r3 ON we.src = r3.node GROUP BY 1),
    r5 AS (SELECT we.dst AS node,
                  0.15 / (SELECT cnt FROM n) + 0.85 * sum(we.w * r4.r) AS r
           FROM we JOIN r4 ON we.src = r4.node GROUP BY 1)
    SELECT node AS part, round(r * (SELECT cnt FROM n), 6) AS pr_scaled
    FROM r5
    """,
)
def q232_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 iterations, uniform start) over the part
    co-occurrence graph — "which parts sit at the center of the purchase
    graph". The iterative-join shape is the canonical Spark graph recipe:
    contributions = edges ⋈ ranks, grouped on dst; `localCheckpoint` per
    iteration truncates the lineage so the plan does not grow 5 joins deep
    (and a retry cannot recompute the whole chain). The graph is
    symmetrized, so every node has in-edges and there is no dangling-mass
    term. Output is rank × N (O(1) magnitude), rounded to 6dp.

    100 TB story: edge build is linear (bounded lines/order); each
    iteration is one shuffle on dst, sized by edges, not nodes²; ranks and
    degrees co-partition on the join key across iterations.
    """
    co = _cograph_edges(spark, sf_dir)
    # materialize the symmetrized edge list ONCE: the node count, the
    # degree aggregate, and the weighted-edge join would otherwise each
    # re-run the lineitem self-join that builds the co-graph
    edges = graph.symmetrize(co).localCheckpoint(eager=True)
    n_nodes = float(edges.select("src").distinct().count())
    ranks = graph.pagerank(edges, iters=5, damping=0.85)
    return ranks.select(
        F.col("node").alias("part"),
        F.round(F.col("r") * F.lit(n_nodes), 6).alias("pr_scaled"),
    )


@query(
    "q233_triangle_census",
    oracle=f"""
    WITH {_COGRAPH_SQL},
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM co e1
      JOIN co e2 ON e1.s2 = e2.s1
      JOIN co e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    ),
    nodes AS (
      SELECT a AS part FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT part, count(*) AS n_triangles
    FROM nodes GROUP BY 1
    """,
)
def q233_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation on the part co-occurrence graph —
    the clustering-structure audit behind community detection and
    link-spam checks. Uses the oriented-edge (a<b<c) enumeration: every
    triangle is generated exactly once from its canonical vertex order, so
    there is no /6 correction and no duplicate work.

    100 TB story: two equi-joins on edge endpoints; with edges canonically
    oriented toward the higher-degree endpoint the join fan-out is bounded
    by arboricity (here the co-count >= 2 threshold already bounds degree).
    No node ever materializes its full neighborhood cross-product outside
    the join.
    """
    co = _cograph_edges(spark, sf_dir).localCheckpoint(eager=True)
    return graph.triangle_counts(co)


# Pairwise cosine between two aliased embedding rows (a / b), all-DOUBLE.
_PAIR_COS_SQL = """
      list_sum(list_transform(generate_series(1, len(a.embedding)),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


@query(
    "q234_semdedup_prune",
    oracle=f"""
    WITH pr AS (
      SELECT a.label, b.vec_id AS pruned
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round({_PAIR_COS_SQL}, 6) >= 0.3
      GROUP BY 1, 2
    )
    SELECT e.label,
           count(*) AS n_vecs,
           CAST(count(pr.pruned) AS BIGINT) AS n_pruned,
           CAST(count(*) - count(pr.pruned) AS BIGINT) AS n_kept
    FROM embeddings e
    LEFT JOIN pr ON pr.label = e.label AND pr.pruned = e.vec_id
    GROUP BY 1
    """,
)
def q234_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): inside each
    cluster, drop every vector that has a LOWER-id neighbor with cosine
    >= tau — keeping exactly one representative per near-duplicate chain
    head. The `label` column plays the cluster role (the real pipeline
    would feed k-means assignments, q187). Cosine is rounded to 6dp BEFORE
    the threshold so the boundary predicate is engine-stable.

    100 TB story: the self-join is CLUSTER-LOCAL (equi-join on label), so
    pair count is sum over clusters of |c|^2, not corpus^2 — the whole
    point of clustering before the pairwise pass; one shuffle on label.
    """
    e = _t(spark, sf_dir, "embeddings")
    pruned = (
        similarity.cluster_local_pairs(e, threshold=0.3)
        .select("label", F.col("id_b").alias("pruned"))
        .distinct()
    )
    return (
        e.join(
            pruned,
            (pruned.label == e.label) & (pruned.pruned == e.vec_id),
            "left",
        )
        .groupBy(e.label)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count("pruned").alias("n_pruned"),
            (F.count(F.lit(1)) - F.count("pruned")).alias("n_kept"),
        )
    )


@query(
    "q235_rag_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t, len({_TOKS_SQL}) AS n
      FROM documents WHERE trim(text) <> ''
    ),
    ch AS (
      SELECT doc_id, n, t,
             unnest(generate_series(0,
               CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 23) // 24 END)) AS i
      FROM toks
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(least(32, n - i * 24) AS BIGINT) AS n_tok_chunk,
           array_to_string(t[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
    FROM ch
    """,
)
def q235_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG ingestion chunking: overlapping token windows (W=32, stride=24,
    8-token overlap) with stable (doc_id, chunk_id) keys — the standard
    retrieval-corpus prep step. Chunk count per doc is closed-form
    (1 + ceil((n-W)/S)), the window is materialized by exploding a
    `sequence`, and the text is re-joined with single spaces (both engines
    slice the same whitespace token array, so the text matches exactly).

    100 TB story: pure per-row narrow ops — no shuffle at all; output
    size is input x (1 + overlap fraction), and the generated chunk_id is
    deterministic so re-runs upsert cleanly.
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.trim("text") != "").select(
        "doc_id",
        F.split(F.trim("text"), r"\s+").alias("t"),
    ).withColumn("n", F.size("t"))
    ch = toks.select(
        "doc_id",
        "n",
        "t",
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("n") <= 32, F.lit(0)).otherwise(
                    F.expr("CAST((n - 32 + 23) div 24 AS INT)")
                ),
            )
        ).alias("i"),
    )
    return ch.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        F.least(F.lit(32), F.col("n") - F.col("i") * 24)
        .cast("long")
        .alias("n_tok_chunk"),
        F.array_join(F.slice("t", F.col("i") * 24 + 1, 32), " ").alias("chunk_text"),
    )


@query(
    "q236_length_bucket_batches",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
      FROM documents WHERE trim(text) <> ''
    ),
    ranked AS (
      SELECT doc_id, n_tok,
             row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rn
      FROM lens
    )
    SELECT CAST((rn - 1) // 32 AS BIGINT) AS batch_id,
           count(*) AS n_docs,
           max(n_tok) AS max_tok,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste,
           round(1.0 - sum(n_tok) * 1.0 / (count(*) * max(n_tok)), 6)
             AS pad_frac
    FROM ranked GROUP BY 1
    """,
)
def q236_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly: sort docs by token count (desc,
    doc_id tie-break), cut into fixed batches of 32, and report the padding
    waste each batch pays (batch tensor is n x max_len; waste = padding
    cells). Sorting before batching is THE standard trick that turns
    ~50% padding into a few percent — this query quantifies it per batch.

    100 TB story: a global sort by a scalar (Spark range-partitions it —
    no single-reducer bottleneck), then a batch-local aggregate; row_number
    over the global order is the one sequential construct, and at scale the
    same assembly is done per-partition (interleaved epoch order, q228).
    """
    from phoebe_spark.operators.layout import global_rank_by_value

    d = _t(spark, sf_dir, "documents")
    lens = d.filter(F.trim("text") != "").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tok"),
    )
    # value-bucketed two-phase rank: no single-reducer global window
    ranked = global_rank_by_value(lens, "n_tok", "doc_id", out_col="rn")
    return (
        ranked.groupBy(F.expr("(rn - 1) div 32").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("max_tok"),
            F.sum("n_tok").alias("sum_tok"),
        )
        .select(
            "batch_id",
            "n_docs",
            "max_tok",
            "sum_tok",
            (F.col("n_docs") * F.col("max_tok") - F.col("sum_tok")).alias("pad_waste"),
            F.round(
                F.lit(1.0)
                - F.col("sum_tok") / (F.col("n_docs") * F.col("max_tok")),
                6,
            ).alias("pad_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Round 6: time-series diagnostics and audits on the events stream
# ---------------------------------------------------------------------------


@query(
    "q237_hourly_acf",
    oracle=f"""
    WITH hc AS (
      SELECT {EPOCH_SQL.format(c='ts')} // 3600 AS hr,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(generate_series(1, 10)) AS lag),
    j AS (
      SELECT l.lag, a.c AS ca, b.c AS cb
      FROM lags l
      JOIN hc a ON true
      JOIN hc b ON b.hr = a.hr + l.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(ca, cb), 6) AS acf
    FROM j GROUP BY 1
    """,
)
def q237_hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags 1..10 —
    the seasonality probe that tells a forecaster (reference workload
    models, SURVEY §2.8) which AR terms matter. Sample ACF here is the
    Pearson correlation over observed (t, t+lag) pairs, so hour gaps are
    skipped rather than zero-filled. Counts are integers, so both engines
    correlate IDENTICAL doubles; only corr's internal sums differ, well
    under the 6dp rounding.

    100 TB story: the hourly rollup is a map-side-combining groupBy
    (O(hours) rows out); the lag join replicates that TINY series 10x and
    self-joins on hr+lag — all post-aggregation, never on raw events.
    """
    e = _t(spark, sf_dir, "events")
    hc = (
        e.groupBy((_epoch() / 3600).cast("long").alias("hr"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    lags = spark.range(1, 11).select(F.col("id").alias("lag"))
    a = hc.select(F.col("hr").alias("ha"), F.col("c").alias("ca")).crossJoin(
        F.broadcast(lags)
    )
    b = hc.select(F.col("hr").alias("hb"), F.col("c").alias("cb"))
    j = a.join(b, a.ha + a.lag == b.hb)
    return j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("ca", "cb"), 6).alias("acf"),
    )


@query(
    "q238_changepoint",
    oracle=f"""
    WITH hc AS (
      SELECT {EPOCH_SQL.format(c='ts')} // 3600 AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    pre AS (
      SELECT hr, c,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(sum(c) OVER w AS BIGINT) AS s,
             CAST(sum(c * c) OVER w AS BIGINT) AS s2,
             CAST(count(*) OVER () AS BIGINT) AS nn,
             CAST(sum(c) OVER () AS BIGINT) AS st,
             CAST(sum(c * c) OVER () AS BIGINT) AS s2t
      FROM hc
      WINDOW w AS (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    sse AS (
      SELECT hr, i, nn, st, s2t,
             round((s2 - s * s / CAST(i AS DOUBLE))
                 + ((s2t - s2) - (st - s) * (st - s) / CAST(nn - i AS DOUBLE)), 6)
               AS sse_split,
             round(s / CAST(i AS DOUBLE), 6) AS mean_left,
             round((st - s) / CAST(nn - i AS DOUBLE), 6) AS mean_right
      FROM pre WHERE i < nn
    )
    SELECT hr AS split_hour, sse_split, mean_left, mean_right,
           round(s2t - st * st / CAST(nn AS DOUBLE), 6) AS sse_nosplit
    FROM sse
    QUALIFY row_number() OVER (ORDER BY sse_split, hr) = 1
    """,
)
def q238_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection on the hourly event-count series:
    the split minimizing total within-segment SSE (the first step of
    binary segmentation / PELT). All moments are EXACT BIGINT prefix sums
    of integer counts — the only floats are the final divisions, so both
    engines compute bit-identical SSE values and the argmin cannot flip
    on float noise; ties break on earliest hour.

    100 TB story: counts are a map-side-combining rollup; the prefix
    sums run over the O(hours) series, not raw events. The argmin is a
    window-min over that same tiny frame.
    """
    e = _t(spark, sf_dir, "events")
    hc = e.groupBy((_epoch() / 3600).cast("long").alias("hr")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    pre = hc.select(
        "hr",
        F.row_number().over(Window.orderBy("hr")).cast("long").alias("i"),
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("s2"),
        F.count(F.lit(1)).over(wall).alias("nn"),
        F.sum("c").over(wall).alias("st"),
        F.sum(F.col("c") * F.col("c")).over(wall).alias("s2t"),
    )
    sse = pre.filter(F.col("i") < F.col("nn")).select(
        "hr",
        F.round(
            (F.col("s2") - F.col("s") * F.col("s") / F.col("i").cast("double"))
            + (
                (F.col("s2t") - F.col("s2"))
                - (F.col("st") - F.col("s"))
                * (F.col("st") - F.col("s"))
                / (F.col("nn") - F.col("i")).cast("double")
            ),
            6,
        ).alias("sse_split"),
        F.round(F.col("s") / F.col("i").cast("double"), 6).alias("mean_left"),
        F.round(
            (F.col("st") - F.col("s")) / (F.col("nn") - F.col("i")).cast("double"), 6
        ).alias("mean_right"),
        F.round(
            F.col("s2t") - F.col("st") * F.col("st") / F.col("nn").cast("double"), 6
        ).alias("sse_nosplit"),
    )
    best = sse.withColumn(
        "rk", F.row_number().over(Window.orderBy("sse_split", "hr"))
    )
    return best.filter(F.col("rk") == 1).select(
        F.col("hr").alias("split_hour"),
        "sse_split",
        "mean_left",
        "mean_right",
        "sse_nosplit",
    )


@query(
    "q239_k_anonymity",
    oracle="""
    SELECT source, lang,
           CAST(n_chars // 500 AS BIGINT) AS len_band,
           count(*) AS group_size,
           CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS INT) AS at_risk
    FROM documents
    GROUP BY 1, 2, 3
    """,
)
def q239_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (source, lang,
    length band): any equivalence class smaller than k=5 re-identifies its
    members — the privacy screen a training corpus runs before release.
    Generalization (banding n_chars to 500-char buckets) is part of the
    audit: the band IS the generalized QI.

    100 TB story: one map-side-combining groupBy on a low-cardinality
    composite key; no joins, no skew (bands are bounded).
    """
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        "source",
        "lang",
        F.expr("n_chars div 500").alias("len_band"),
    ).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.when(F.count(F.lit(1)) < 5, 1).otherwise(0).cast("int").alias("at_risk"),
    )


@query(
    "q240_time_weighted_avg",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, value,
             epoch_ns(ts) AS tns,
             lead(epoch_ns(ts)) OVER w AS next_tns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    )
    SELECT user_id,
           CAST(count(next_tns) AS BIGINT) AS n_intervals,
           CAST(sum(next_tns - tns) AS BIGINT) AS span_ns,
           round(sum(value * (next_tns - tns) / 1e9)
                 / (sum(next_tns - tns) / 1e9), 6) AS twa
    FROM seq WHERE next_tns IS NOT NULL
    GROUP BY 1
    """,
)
def q240_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average of `value` under last-observation-
    carried-forward weighting (TimescaleDB's `time_weight('LOCF')`): each
    observation holds until the next one, so its weight is the interval
    length — the honest mean for irregularly sampled gauges, where the
    plain avg over-counts bursts. Span accounting stays exact BIGINT
    nanos; only the final weighted mean is float (rounded 6dp). Same-ts
    duplicates contribute zero weight regardless of intra-tie order, so
    the (ts, event_id) ordering is fully deterministic.

    100 TB story: one shuffle on user_id (the window), then a grouped
    agg on the same key — Spark reuses the partitioning; no join.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "value",
        F.col("ts").alias("tns"),
        F.lead("ts").over(w).alias("next_tns"),
    ).filter(F.col("next_tns").isNotNull())
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("next_tns") - F.col("tns")).alias("span_ns"),
        F.round(
            F.sum(F.col("value") * (F.col("next_tns") - F.col("tns")) / F.lit(1e9))
            / (F.sum(F.col("next_tns") - F.col("tns")) / F.lit(1e9)),
            6,
        ).alias("twa"),
    )


@query(
    "q241_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('micro',    0,  50000),
             ('small',    50000, 150000),
             ('mid',     150000, 300000),
             ('large',   300000, 600000)
    )
    SELECT b.band,
           count(o.o_orderkey) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_price
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY 1
    """,
)
def q241_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join rewritten as an equi-join: each NON-UNIFORM price
    band is exploded into the fixed-width 50k buckets it covers, facts map
    to their bucket with one arithmetic expression, and the join becomes
    `fact.bucket = band.bucket` plus a residual BETWEEN check. The oracle
    states the declarative BETWEEN join; this plan is the scalable shape.

    100 TB story: a naive theta-join (BETWEEN) forces
    broadcast-nested-loop — O(rows x bands) comparisons; the bucketed
    rewrite is a broadcast HASH join: one probe per row. The residual
    predicate keeps semantics exact for bands that don't align to bucket
    edges, and the bucket explosion is bounded by band width / bucket
    width (here <= 6 rows per band).
    """
    bands = [
        ("micro", 0, 50_000),
        ("small", 50_000, 150_000),
        ("mid", 150_000, 300_000),
        ("large", 300_000, 600_000),
    ]
    bucket_w = 50_000
    rows = []
    for name, lo, hi in bands:
        for bkt in range(lo // bucket_w, (hi - 1) // bucket_w + 1):
            rows.append((name, lo, hi, bkt))
    band_df = spark.createDataFrame(rows, "band string, lo long, hi long, bkt long")
    o = _t(spark, sf_dir, "orders")
    fact = o.select(
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / bucket_w).cast("long").alias("bkt"),
    )
    j = fact.join(F.broadcast(band_df), "bkt").filter(
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum2(_dec("o_totalprice")).alias("sum_price"),
    )


@query(
    "q242_ndcg_eval",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qemb, label AS qlabel
      FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
      SELECT q.query_id, q.qlabel, b.vec_id AS neighbor_id, b.label,
             round(
               list_sum(list_transform(generate_series(1, len(b.embedding)),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qemb[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qemb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
               6) AS cs
      FROM q JOIN embeddings b ON b.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, qlabel, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank
      FROM scored
    ),
    rel_total AS (
      SELECT q.query_id,
             least(10, count(*) FILTER (WHERE b.label = q.qlabel)) AS r_tot
      FROM q JOIN embeddings b ON b.vec_id <> q.query_id
      GROUP BY 1
    ),
    dcg AS (
      SELECT query_id,
             CAST(count(*) FILTER (WHERE label = qlabel) AS BIGINT) AS n_rel_at10,
             sum(CASE WHEN label = qlabel
                      THEN 1.0 / log2(rank + 1) ELSE 0 END) AS dcg10
      FROM ranked WHERE rank <= 10 GROUP BY 1
    ),
    idcg_rows AS (
      SELECT query_id, unnest(generate_series(1, r_tot)) AS k
      FROM rel_total WHERE r_tot > 0
    ),
    idcg AS (
      SELECT query_id, sum(1.0 / log2(k + 1)) AS idcg10
      FROM idcg_rows GROUP BY 1
    )
    SELECT d.query_id, d.n_rel_at10,
           round(d.dcg10, 6) AS dcg10,
           round(coalesce(i.idcg10, 0), 6) AS idcg10,
           round(CASE WHEN coalesce(i.idcg10, 0) > 0
                      THEN d.dcg10 / i.idcg10 ELSE 0 END, 6) AS ndcg10
    FROM dcg d LEFT JOIN idcg i USING (query_id)
    """,
)
def q242_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval: NDCG@10 for the first 10 vectors as queries
    against the rest of the corpus, binary relevance = label match (the
    standard recall-proxy when embeddings carry class labels). Ranking
    ties break on 6dp-rounded cosine then neighbor_id, so rank order is
    engine-stable. IDCG uses min(total relevant, 10) — the full-corpus
    ideal, not top-10-local — so NDCG is comparable across queries.

    100 TB story: the query set broadcasts (it's tiny by construction);
    the corpus is scanned once per eval; per-query top-k is a window over
    k-bounded groups. This is the eval harness for the IVF/PQ indexes
    (q44/q149/q156) — same contract, exact baseline.
    """
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("label").alias("qlabel"),
    )
    scored = e.join(F.broadcast(q), e.vec_id != q.query_id).select(
        "query_id",
        "qlabel",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.round(similarity.cosine(F.col("embedding"), F.col("qemb")), 6).alias("cs"),
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("cs").desc(), "neighbor_id"
            )
        ),
    )
    rel = F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
    dcg = (
        ranked.filter(F.col("rank") <= 10)
        .groupBy("query_id")
        .agg(
            F.sum(rel).cast("long").alias("n_rel_at10"),
            F.sum(rel / F.log2(F.col("rank") + 1)).alias("dcg10_raw"),
        )
    )
    r_tot = scored.groupBy("query_id").agg(
        F.least(F.lit(10), F.sum(rel)).cast("int").alias("r_tot")
    )
    idcg = (
        r_tot.filter(F.col("r_tot") > 0)
        .select(
            "query_id", F.explode(F.sequence(F.lit(1), F.col("r_tot"))).alias("k")
        )
        .groupBy("query_id")
        .agg(F.sum(F.lit(1.0) / F.log2(F.col("k") + 1)).alias("idcg10_raw"))
    )
    return (
        dcg.join(idcg, "query_id", "left")
        .select(
            "query_id",
            "n_rel_at10",
            F.round("dcg10_raw", 6).alias("dcg10"),
            F.round(F.coalesce("idcg10_raw", F.lit(0.0)), 6).alias("idcg10"),
            F.round(
                F.when(
                    F.coalesce("idcg10_raw", F.lit(0.0)) > 0,
                    F.col("dcg10_raw") / F.col("idcg10_raw"),
                ).otherwise(0.0),
                6,
            ).alias("ndcg10"),
        )
    )


@query(
    "q243_label_propagation",
    oracle=f"""
    WITH {_COGRAPH_SQL},
    edges AS (SELECT s1 AS src, s2 AS dst FROM co
              UNION ALL SELECT s2, s1 FROM co),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    seeds AS (
      SELECT n.node, p.p_brand AS label
      FROM nodes n JOIN part p ON p.p_partkey = n.node
      WHERE n.node % 10 = 0
    ),
    lab0 AS (
      SELECT n.node, s.label FROM nodes n LEFT JOIN seeds s USING (node)
    ),
    v1 AS (SELECT e.dst AS node, l.label, count(*) AS c
           FROM edges e JOIN lab0 l ON e.src = l.node
           WHERE l.label IS NOT NULL GROUP BY 1, 2),
    m1 AS (SELECT node, label FROM v1
           QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1),
    lab1 AS (SELECT n.node, coalesce(s.label, m.label, p.label) AS label
             FROM nodes n LEFT JOIN seeds s USING (node)
             LEFT JOIN m1 m USING (node) LEFT JOIN lab0 p USING (node)),
    v2 AS (SELECT e.dst AS node, l.label, count(*) AS c
           FROM edges e JOIN lab1 l ON e.src = l.node
           WHERE l.label IS NOT NULL GROUP BY 1, 2),
    m2 AS (SELECT node, label FROM v2
           QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1),
    lab2 AS (SELECT n.node, coalesce(s.label, m.label, p.label) AS label
             FROM nodes n LEFT JOIN seeds s USING (node)
             LEFT JOIN m2 m USING (node) LEFT JOIN lab1 p USING (node)),
    v3 AS (SELECT e.dst AS node, l.label, count(*) AS c
           FROM edges e JOIN lab2 l ON e.src = l.node
           WHERE l.label IS NOT NULL GROUP BY 1, 2),
    m3 AS (SELECT node, label FROM v3
           QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1),
    lab3 AS (SELECT n.node, coalesce(s.label, m.label, p.label) AS label
             FROM nodes n LEFT JOIN seeds s USING (node)
             LEFT JOIN m3 m USING (node) LEFT JOIN lab2 p USING (node))
    SELECT l.node AS part, l.label,
           CAST(CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_seed
    FROM lab3 l LEFT JOIN seeds s USING (node)
    WHERE l.label IS NOT NULL
    """,
)
def q243_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the part co-occurrence
    graph: 10% of nodes are seeded with their brand, then 3 SYNCHRONOUS
    rounds of neighbor majority vote (count desc, label asc tie-break)
    spread labels to unseeded nodes; seeds stay clamped, and a node with
    no labeled neighbor carries its previous label. Distinct from
    connected components (q53): CC converges to a set min, LP takes a
    VOTE — it can assign different labels inside one component.

    100 TB story: each round is one edges-to-labels equi-join + one
    grouped argmax, all partitioned on node id; `localCheckpoint` per
    round truncates lineage exactly like q232. Votes shuffle O(edges),
    never O(nodes x labels).
    """
    co = _cograph_edges(spark, sf_dir)
    edges = graph.symmetrize(co).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    part = _t(spark, sf_dir, "part")
    seeds = (
        nodes.filter(F.col("node") % 10 == 0)
        .join(part, nodes.node == part.p_partkey)
        .select("node", F.col("p_brand").alias("slabel"))
        .localCheckpoint(eager=True)
    )
    lab = graph.label_propagation(edges, seeds, rounds=3)
    return (
        lab.filter(F.col("label").isNotNull())
        .join(seeds, "node", "left")
        .select(
            F.col("node").alias("part"),
            "label",
            F.when(F.col("slabel").isNotNull(), 1).otherwise(0).cast("int").alias("is_seed"),
        )
    )


@query(
    "q244_minhash_merge_cert",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    sh AS (
      SELECT source,
             unnest(list_transform(generate_series(1, len(t) - 2),
                                   i -> array_to_string(t[i:i+2], ' '))) AS g
      FROM toks
    ),
    hp AS (
      SELECT source,
             {_MD5H_SQL.format(x='g')} % 2147483647 AS h1,
             CAST(('0x' || substring(md5(g), 17, 15)) AS BIGINT) % 2147483646 + 1 AS h2
      FROM sh
    )
    SELECT source, CAST(i AS BIGINT) AS slot,
           min((h1 + i * h2) % 2147483647) AS sig,
           CAST(1 AS INT) AS merge_ok
    FROM hp CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) seeds
    GROUP BY 1, 2
    """,
)
def q244_minhash_merge_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-MERGEABILITY certificate for per-source MinHash signatures:
    computes each source's 16-slot signature TWICE — directly over all its
    documents, and as an elementwise-min MERGE of two half-corpus partial
    signatures (split on doc_id parity) — and emits ``merge_ok`` per slot.
    The oracle replays only the direct path and expects merge_ok=1, so a
    broken merge (any non-distributive step sneaking into the sketch)
    hash-fails the gate.

    Why it matters at 100 TB: mergeability is THE property that lets a
    sketch run as map-side partial aggregation and combine across
    executors/days/snapshots without touching raw text twice — this query
    pins it as a tested contract, not an assumption.
    """
    d = _t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        d, id_col="doc_id", text_col="text", num_hashes=16, shingle_n=3,
        hash_fn="md5",
    )
    src = d.select(F.col("doc_id").alias("doc"), "source", (F.col("doc_id") % 2).alias("half"))
    # Materialize the per-doc signatures once: BOTH the direct and the
    # half-merge paths consume this frame, and without the checkpoint each
    # would re-run the whole shingle+hash subtree (the module-wide
    # recompute trap — see minhash_lsh_pairs).
    per_doc = sigs.join(src, "doc").localCheckpoint(eager=True)
    slot_cols = [F.col("signature")[i].alias(f"s{i}") for i in range(16)]
    direct = (
        per_doc.select("source", *slot_cols)
        .groupBy("source")
        .agg(*[F.min(f"s{i}").alias(f"d{i}") for i in range(16)])
    )
    halves = (
        per_doc.select("source", "half", *slot_cols)
        .groupBy("source", "half")
        .agg(*[F.min(f"s{i}").alias(f"h{i}") for i in range(16)])
    )
    merged = halves.groupBy("source").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(16)]
    )
    j = direct.join(merged, "source")
    long_form = j.select(
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("slot"),
                        F.col(f"d{i}").alias("sig"),
                        F.when(F.col(f"d{i}") == F.col(f"m{i}"), 1)
                        .otherwise(0)
                        .cast("int")
                        .alias("merge_ok"),
                    )
                    for i in range(16)
                ]
            )
        ).alias("e"),
    )
    return long_form.select("source", "e.slot", "e.sig", "e.merge_ok")


@query(
    "q245_key_skew_gini",
    oracle="""
    WITH audits AS (
      SELECT 'lineitem.l_partkey' AS key_name, l_partkey AS k FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
      UNION ALL
      SELECT 'events.user_id', user_id FROM events
    ),
    cnts AS (
      SELECT key_name, k, CAST(count(*) AS BIGINT) AS c
      FROM audits GROUP BY 1, 2
    ),
    ranked AS (
      SELECT key_name, c,
             CAST(row_number() OVER (PARTITION BY key_name ORDER BY c, k)
               AS BIGINT) AS i
      FROM cnts
    )
    SELECT key_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS top1_cnt,
           round(2.0 * sum(i * c) / (count(*) * sum(c))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked GROUP BY 1
    """,
)
def q245_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: per join/groupBy key column, the Gini
    coefficient of the per-key row-count distribution plus the hottest
    key's count — the numbers that decide whether a key needs salting
    (operators/skew.py) BEFORE the job OOMs. Gini uses the exact sorted
    cumulative formula (2*sum(i*c_i)/(n*sum c) - (n+1)/n); all moments are
    BIGINT, only the final ratio is float. Ties in c are order-insensitive
    for the formula, so the (c, k) sort is engine-stable.

    100 TB story: one map-side-combining count per audited key, then the
    per-key-name window over the (much smaller) distinct-key frame; audits
    union BEFORE aggregation so the whole report is one job.
    """
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    # Both lineitem keys come out of ONE scan via an explode — a union of
    # two selects would read the fact table twice (the plan test pins it).
    audits = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem.l_partkey").alias("key_name"),
                    F.col("l_partkey").alias("k"),
                ),
                F.struct(
                    F.lit("lineitem.l_suppkey").alias("key_name"),
                    F.col("l_suppkey").alias("k"),
                ),
            )
        ).alias("e")
    ).select("e.key_name", "e.k").unionAll(
        ev.select(F.lit("events.user_id").alias("key_name"), F.col("user_id").alias("k"))
    )
    cnts = audits.groupBy("key_name", "k").agg(F.count(F.lit(1)).alias("c"))
    ranked = cnts.select(
        "key_name",
        "c",
        F.row_number()
        .over(Window.partitionBy("key_name").orderBy("c", "k"))
        .cast("long")
        .alias("i"),
    )
    return ranked.groupBy("key_name").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("top1_cnt"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("c"))
            / (F.count(F.lit(1)) * F.sum("c"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


_Q246_WINDOW_MS = 21_600_000  # 6 h pattern window


@query(
    "q246_stream_first_match_drain",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_type,
             ({EPOCH_SQL.format(c='ts')}) * 1000 + event_id % 1000 AS tm
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    wm AS (SELECT max(tm) AS w FROM t),
    a AS (SELECT DISTINCT user_id, tm FROM t WHERE event_type = 'view'),
    b AS (SELECT user_id, tm FROM t WHERE event_type = 'purchase'),
    m AS (
      SELECT a.user_id, a.tm AS a_time, CAST(min(b.tm) AS BIGINT) AS b_time
      FROM a JOIN b ON b.user_id = a.user_id
                   AND b.tm >= a.tm AND b.tm <= a.tm + {_Q246_WINDOW_MS}
      GROUP BY 1, 2
    )
    SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(a_time AS BIGINT) AS a_time, b_time,
           CAST(b_time - a_time AS BIGINT) AS lag_ms
    FROM m, wm WHERE a_time + {_Q246_WINDOW_MS} < wm.w
    """,
)
def q246_stream_first_match_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CEP first-match drained inside the hash-checked gate:
    'view followed by purchase within 6 h' per user, each view matched to
    the EARLIEST qualifying purchase (:func:`stateful.first_match_within`
    — applyInPandasWithState, event-time timers, watermark-pruned A/B
    buffers). The oracle is the batch min-join; views whose window has
    not closed at the final watermark are withheld by BOTH sides (the
    q229 last-session rule, applied per pattern window), so the drain's
    event-time finalization logic — not just its join math — is what the
    hash certifies.

    Scale: state per user is the live-window event times only (watermark
    pruned both sides); one shuffle on the key; exactly-once append.
    """
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming.stateful import first_match_within

    ev = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q246_")
    src_dir = f"{work}/src"
    try:
        os.makedirs(src_dir)
        staged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
            F.col("user_id"),
            F.col("event_type"),
            F.expr(
                "timestamp_millis((ts div 1000000000) * 1000 + event_id % 1000)"
            ).alias("event_time"),
        )
        staged.repartitionByRange(4, "event_time").write.parquet(f"{work}/stage")
        parts = sorted(glob.glob(f"{work}/stage/part-*.parquet"))
        for i, part in enumerate(parts, start=1):
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema(
                "user_id LONG, event_type STRING, event_time TIMESTAMP"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .withWatermark("event_time", "0 seconds")
        )
        matches = first_match_within(
            stream,
            window_ms=_Q246_WINDOW_MS,
            a_type="view",
            b_type="purchase",
            key_col="user_id",
        )
        sink = f"{work}/matches"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                matches.writeStream.outputMode("append")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q246: first-match drain did not finish within 300 s — "
                    "refusing to report a partial match set"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        out = spark.read.parquet(sink).select("key", "a_time", "b_time", "lag_ms")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q247_partition_overwrite",
    oracle=f"""
    WITH base AS (
      SELECT CAST({EPOCH_SQL.format(c='ts')} // 86400 AS BIGINT) AS day,
             value
      FROM events
    ),
    final AS (
      SELECT day,
             CASE WHEN day % 10 = 3 THEN value * 2.0 ELSE value END AS value
      FROM base
    )
    SELECT day, count(*) AS n_rows,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS day_sum
    FROM final GROUP BY 1
    """,
)
def q247_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite lifecycle: a day-partitioned fact table
    receives a restatement batch covering only the days with day%10==3
    (values doubled), written with
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` — so ONLY the
    restated day directories are replaced and every other partition's
    files are untouched (verified by reading the final table back; the
    oracle states the expected post-restatement content). This is the
    idempotent-backfill primitive every batch pipeline needs: re-running a
    day's job replaces that day, never truncates the table.

    100 TB story: the overwrite is partition-granular — a 1-day backfill
    into a 3-year table rewrites 1/1000th of the data; STATIC mode (the
    default!) would drop every partition first, which is the
    footgun this query pins the guard against.
    """
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "events")
    base = e.select(
        (F.expr("ts div 1000000000") / 86400).cast("long").alias("day"),
        "value",
    )
    work = tempfile.mkdtemp(prefix="q247_")
    tbl = f"{work}/facts"
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        base.write.partitionBy("day").parquet(tbl)
        restate = base.filter(F.col("day") % 10 == 3).select(
            "day", (F.col("value") * 2.0).alias("value")
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        restate.write.mode("overwrite").partitionBy("day").parquet(tbl)
        out = (
            spark.read.parquet(tbl)
            .groupBy("day")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                _dsum2(_dec("value")).alias("day_sum"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q248_bucketed_join",
    oracle="""
    SELECT c.c_nationkey AS nation,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q248_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUCKETED co-located join: orders and customer are both written as
    bucketed tables (8 buckets on the join key), so the sort-merge join
    reads bucket i against bucket i directly — ZERO Exchange in the plan
    (asserted in tests). The ``merge`` hint pins SMJ so the demonstration
    doesn't silently degrade to a broadcast at bench scale.

    100 TB story: bucketing is THE amortization for repeated fact-fact
    joins — the shuffle is paid once at write time and every subsequent
    join on the key is shuffle-free; at 1000 executors that removes the
    single largest network cost of the pipeline. (Bucket count is a
    layout decision: 8 here for the test corpus; production picks
    buckets ~ cluster cores so every bucket pair is one task.)
    """
    import uuid

    e_orders = _t(spark, sf_dir, "orders")
    e_cust = _t(spark, sf_dir, "customer")
    suffix = uuid.uuid4().hex[:8]
    t_o, t_c = f"q248_orders_{suffix}", f"q248_cust_{suffix}"
    try:
        (
            e_orders.select("o_orderkey", "o_custkey", "o_totalprice")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable(t_o)
        )
        (
            e_cust.select("c_custkey", "c_nationkey")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable(t_c)
        )
        o = spark.table(t_o)
        c = spark.table(t_c).hint("merge")
        out = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(F.col("c_nationkey").alias("nation"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                _dsum2(_dec("o_totalprice")).alias("revenue"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")


def _q249_oracle() -> str:
    # identical final-state census to q194: the streaming upsert loop must
    # converge to the same table state as the batch CDC collapse
    return ORACLE["q194_cdc_apply"]


@query("q249_streaming_cdc_upsert_drain", oracle=_q249_oracle())
def q249_streaming_cdc_upsert_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental CDC upsert drained in the hash-checked gate:
    q194's exact changelog (I at v1, U at v2 for %5==0, D tombstones at
    v3 for %7==0) replayed one VERSION per micro-batch through a
    ``foreachBatch`` merge loop that maintains a versioned parquet store —
    each batch reads the previous snapshot, last-writer-wins-merges the
    change set, and writes snapshot N+1 (never overwriting the snapshot it
    is reading — the self-overwrite trap). The final snapshot's census
    must hash-match the batch CDC apply oracle: one operator, two
    execution models, one answer (the q180 principle applied to table
    maintenance).

    100 TB story: the merge is one window over store+delta keyed on the
    change key (in production a partitioned MERGE touching only impacted
    partitions); tombstones ride in-band so no base-table join ever
    happens; snapshot versioning gives exactly-once semantics under batch
    replay (a re-run of batch N deterministically rewrites snapshot N+1).
    """
    import glob
    import os
    import shutil
    import tempfile

    o = _t(spark, sf_dir, "orders")
    log_parts = [
        o.select(
            F.col("o_orderkey").alias("k"),
            F.lit(1).alias("version"),
            F.lit("I").alias("op"),
            F.col("o_orderstatus").alias("status"),
            _dec("o_totalprice").alias("price"),
        ),
        o.filter(F.col("o_orderkey") % 5 == 0).select(
            F.col("o_orderkey").alias("k"),
            F.lit(2).alias("version"),
            F.lit("U").alias("op"),
            F.col("o_orderstatus").alias("status"),
            # re-cast: decimal addition widens to (19,4), and the staged
            # files must all carry the stream schema's exact (18,4)
            (_dec("o_totalprice") + F.lit(10).cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("price"),
        ),
        o.filter(F.col("o_orderkey") % 7 == 0).select(
            F.col("o_orderkey").alias("k"),
            F.lit(3).alias("version"),
            F.lit("D").alias("op"),
            F.col("o_orderstatus").alias("status"),
            F.lit(None).cast("decimal(18,4)").alias("price"),
        ),
    ]
    work = tempfile.mkdtemp(prefix="q249_")
    src_dir = f"{work}/src"
    store = f"{work}/store"
    try:
        os.makedirs(src_dir)
        for v, part in enumerate(log_parts, start=1):
            part.coalesce(1).write.parquet(f"{work}/stage{v}")
            pf = glob.glob(f"{work}/stage{v}/part-*.parquet")[0]
            dst = f"{src_dir}/{v:03d}.parquet"
            shutil.copyfile(pf, dst)
            os.utime(dst, (1_000_000_000 + 10 * v, 1_000_000_000 + 10 * v))

        def _merge(batch_df, batch_id: int) -> None:
            snaps = sorted(glob.glob(f"{store}/v*"))
            if snaps:
                cur = batch_df.sparkSession.read.parquet(snaps[-1])
                merged_src = cur.unionByName(batch_df)
            else:
                merged_src = batch_df
            w = Window.partitionBy("k").orderBy(F.col("version").desc())
            merged = (
                merged_src.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
            merged.write.mode("overwrite").parquet(f"{store}/v{batch_id:05d}")

        stream = (
            spark.readStream.schema(
                "k LONG, version INT, op STRING, status STRING, price DECIMAL(18,4)"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "q249: CDC upsert drain did not finish within 300 s — "
                "refusing to report a partial store state"
            )
        snaps = sorted(glob.glob(f"{store}/v*"))
        final = spark.read.parquet(snaps[-1])
        out = (
            final.filter(F.col("op") != "D")
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n_live"),
                F.round(F.sum("price"), 2).cast("double").alias("total_price"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q250_scd2_pit_join",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, {EPOCH_SQL.format(c='ts')} AS es,
                      event_id, value
               FROM events),
    dsrc AS (SELECT * FROM e WHERE event_type <> 'purchase'),
    m AS (
      SELECT user_id, event_type, es, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM dsrc WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    isl AS (
      SELECT user_id, event_type, es,
             sum(chg) OVER (PARTITION BY user_id ORDER BY es, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM m),
    runs AS (
      SELECT user_id, island, min(event_type) AS state, min(es) AS valid_from
      FROM isl GROUP BY 1, 2),
    dim AS (
      SELECT user_id, valid_from, state FROM runs
      QUALIFY row_number() OVER (PARTITION BY user_id, valid_from
                                 ORDER BY island DESC) = 1),
    f AS (SELECT user_id, es, event_id, value FROM e
          WHERE event_type = 'purchase'),
    pit AS (
      SELECT f.user_id, f.value, d.state
      FROM f JOIN dim d ON d.user_id = f.user_id AND d.valid_from <= f.es
      QUALIFY row_number() OVER (PARTITION BY f.user_id, f.es, f.event_id
                                 ORDER BY d.valid_from DESC) = 1)
    SELECT state,
           count(*) AS n_purchases,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM pit GROUP BY 1
    """,
)
def q250_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 POINT-IN-TIME join — the warehouse op q129 builds toward:
    every purchase fact joins the dimension version VALID AT ITS TIME
    (the user's state run active when the purchase happened). Because
    SCD2 intervals are gapless by construction (valid_to = next
    valid_from), PIT is exactly a backward AS-OF join on valid_from —
    so this runs through :func:`ts_core.asof_join` (union-tag carry,
    ONE shuffle on user_id, no interval cross-product), with same-second
    dimension flips pre-collapsed to the latest island so the carry is
    deterministic.

    100 TB story: the naive BETWEEN join is a range theta-join
    (nested-loop per user); the as-of carry is one sort per key —
    the same machinery as q54, now certified on the SCD2 shape.
    """
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch().alias("es"), "event_id", "value"
    )
    dsrc = e.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    m = dsrc.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    isl = m.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.min("event_type").alias("state"), F.min("es").alias("valid_from")
    )
    dim = (
        runs.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id", "valid_from").orderBy(
                    F.col("island").desc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("valid_from").alias("es"), "state")
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "es", "event_id", "value"
    )
    pit = ts_core.asof_join(facts, dim, on="es", by=["user_id"], value_cols=["state"])
    return (
        pit.filter(F.col("state_asof").isNotNull())
        .groupBy(F.col("state_asof").alias("state"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum2(_dec("value")).alias("total_value"),
        )
    )


# RBO depth weights (1-p)*p^(d-1), p=0.9, k=20 — computed ONCE in Python
# and embedded as identical double literals in both engines, so no pow()
# libm divergence can enter the comparison.
_RBO_W = [(d, (1 - 0.9) * 0.9 ** (d - 1)) for d in range(1, 21)]
_RBO_W_SQL = ", ".join(f"({d}, {w!r})" for d, w in _RBO_W)


@query(
    "q251_rank_biased_overlap",
    oracle=f"""
    WITH lens AS (
      SELECT source, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tok,
             n_chars
      FROM documents WHERE trim(text) <> ''
    ),
    ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_tok DESC, doc_id) AS ra,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rb
      FROM lens
    ),
    mx AS (
      SELECT source, greatest(ra, rb) AS m FROM ranked
      WHERE greatest(ra, rb) <= 20
    ),
    w(d, wt) AS (VALUES {_RBO_W_SQL}),
    ov AS (
      SELECT mx.source, w.d, w.wt, CAST(count(*) AS BIGINT) AS overlap_d
      FROM mx JOIN w ON mx.m <= w.d
      GROUP BY 1, 2, 3
    )
    SELECT source,
           max(CASE WHEN d = 20 THEN overlap_d ELSE 0 END) AS overlap_at_20,
           round(sum(wt * overlap_d / d), 6) AS rbo
    FROM ov GROUP BY 1
    """,
)
def q251_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap (Webber et al. 2010, truncated at k=20,
    p=0.9) between two per-source document rankings — token-count vs
    char-count — the top-weighted agreement measure for "do two quality
    signals pick the same heads?", where Spearman (q216) weighs the whole
    list equally. The depth-d overlap needs no per-depth set
    intersection: a doc is in both prefixes iff max(rank_a, rank_b) <= d,
    so overlap_d is one bounded join of the (source, m<=20) survivors
    against the 20-row depth/weight dim.

    100 TB story: two windows on the same source partitioning, then the
    survivor set is at most 20 rows per source — everything after the
    ranking is dimension-sized.
    """
    d = _t(spark, sf_dir, "documents")
    lens = d.filter(F.trim("text") != "").select(
        "source",
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tok"),
        "n_chars",
    )
    ranked = lens.select(
        "source",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.col("n_tok").desc(), "doc_id"))
        .alias("ra"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rb"),
    )
    mx = ranked.select(
        "source", F.greatest("ra", "rb").alias("m")
    ).filter(F.col("m") <= 20)
    wdim = spark.createDataFrame(_RBO_W, "d int, wt double")
    ov = (
        mx.join(F.broadcast(wdim), mx.m <= wdim.d)
        .groupBy("source", "d", "wt")
        .agg(F.count(F.lit(1)).alias("overlap_d"))
    )
    return ov.groupBy("source").agg(
        F.max(F.when(F.col("d") == 20, F.col("overlap_d")).otherwise(0)).alias(
            "overlap_at_20"
        ),
        F.round(F.sum(F.col("wt") * F.col("overlap_d") / F.col("d")), 6).alias("rbo"),
    )


@query(
    "q252_asof_tolerance",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(floor({EPOCH_SQL.format(c='ts')} / 60) AS BIGINT) AS minute,
             round(sum(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, minute, v FROM m WHERE minute % 60 = 0),
    j AS (
      SELECT l.event_type, l.minute, l.v AS minute_sum,
             r.v AS cp_v, r.minute AS cp_minute
      FROM m l ASOF LEFT JOIN r
        ON l.event_type = r.event_type AND l.minute >= r.minute
    )
    SELECT event_type, minute, minute_sum,
           CASE WHEN cp_minute >= minute - 15 THEN cp_v END
             AS checkpoint_sum_asof
    FROM j
    """,
)
def q252_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas ``merge_asof(...,
    tolerance=...)``): per-minute sums pick up the most recent HOURLY
    checkpoint, but only if it is at most 15 minutes old — a stale match
    must surface as null, not silently carry an hour-old value (the
    staleness contract every metrics/feature-store lookup needs). q54
    certifies the unbounded carry; this pins the tolerance path of the
    same operator — most minutes fall OUTSIDE the window, so the nulling
    logic is exercised non-vacuously.

    Scale: same union-tag single-shuffle plan; tolerance is a post-carry
    column predicate, not a join-condition change.
    """
    e = _t(spark, sf_dir, "events")
    m = (
        e.withColumn("minute", F.floor(_epoch() / 60).cast("long"))
        .groupBy("event_type", "minute")
        .agg(F.round(F.sum("value"), 6).alias("minute_sum"))
    )
    r = m.filter(F.col("minute") % 60 == 0).select(
        "event_type", "minute", F.col("minute_sum").alias("checkpoint_sum")
    )
    out = ts_core.asof_join(
        m, r, on="minute", by=["event_type"], value_cols=["checkpoint_sum"],
        tolerance=15,
    )
    return out.select("event_type", "minute", "minute_sum", "checkpoint_sum_asof")


@query(
    "q253_session_paths",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, {EPOCH_SQL.format(c='ts')} AS es, event_id
      FROM events
    ),
    s AS (
      SELECT user_id, event_type, es, event_id,
             CASE WHEN es - lag(es) OVER w > 1800 OR lag(es) OVER w IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    ),
    g AS (
      SELECT user_id, event_type, es, event_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY es, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    ),
    rn AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY es, event_id) AS step
      FROM g
    ),
    paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY step) AS path
      FROM rn WHERE step <= 3 GROUP BY 1, 2
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY 1 HAVING count(*) >= 5
    """,
)
def q253_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry-path mining: sessionize on a 30-minute gap, take each
    session's first 3 event types as an ordered path string, and count
    paths with support >= 5 — the navigation-pattern report product teams
    run daily, and the path-level complement of the Markov transition
    matrix (q130: pairwise, memoryless; this: ordered prefixes). Path
    assembly is deterministic: (second, event_id) ordering, positional
    concat.

    100 TB story: sessionization + step-ranking + path-concat all share
    ONE user_id shuffle (same-key windows), then one path-keyed count
    whose cardinality is bounded by |event_types|^3.
    """
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch().alias("es"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    s = e.withColumn(
        "brk",
        F.when(
            (F.col("es") - F.lag("es").over(w) > 1800)
            | F.lag("es").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    g = s.withColumn(
        "sid",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    rn = g.withColumn(
        "step",
        F.row_number().over(
            Window.partitionBy("user_id", "sid").orderBy("es", "event_id")
        ),
    )
    paths = (
        rn.filter(F.col("step") <= 3)
        .groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("step", "event_type"))
                ).getField("event_type"),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
    )


@query(
    "q254_fano_burstiness",
    oracle=f"""
    WITH hc AS (
      SELECT user_id,
             CAST({EPOCH_SQL.format(c='ts')} // 3600 AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_active_hours,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(max(c) AS BIGINT) AS peak_hour,
           round((sum(c * c) - sum(c) * sum(c) * 1.0 / count(*))
                 / sum(c), 6) AS fano
    FROM hc GROUP BY 1 HAVING count(*) >= 5
    """,
)
def q254_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness via the Fano factor of ACTIVE-hour event
    counts (variance-to-mean over hours with >=1 event; ~1 = Poisson-like
    arrivals, >>1 = bursty — the signal a rate limiter or capacity planner
    keys on). All moments are exact BIGINT sums of integer counts; the
    two divisions are the only floats, so the 6dp rounding is
    engine-stable. Biased (population) variance, disclosed.

    100 TB story: two stacked map-side-combining groupBys
    (user x hour, then user) — no window, no join, no skew beyond the
    natural per-user row counts.
    """
    e = _t(spark, sf_dir, "events")
    hc = e.groupBy(
        "user_id", (_epoch() / 3600).cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        hc.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_active_hours"),
            F.sum("c").alias("n_events"),
            F.max("c").alias("peak_hour"),
            F.round(
                (
                    F.sum(F.col("c") * F.col("c"))
                    - F.sum("c") * F.sum("c") * F.lit(1.0) / F.count(F.lit(1))
                )
                / F.sum("c"),
                6,
            ).alias("fano"),
        )
        .filter(F.col("n_active_hours") >= 5)
    )


@query(
    "q255_hopping_window",
    oracle=f"""
    WITH e AS (
      SELECT {EPOCH_SQL.format(c='ts')} AS es, value FROM events
    ),
    contrib AS (
      SELECT unnest(generate_series(
               (es // 60 - 4) * 60, (es // 60) * 60, 60)) AS win_start,
             value
      FROM e
    )
    SELECT CAST(win_start AS BIGINT) AS win_start,
           CAST(win_start + 300 AS BIGINT) AS win_end,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS win_sum
    FROM contrib
    WHERE win_start >= 0
    GROUP BY 1, 2
    """,
)
def q255_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) window aggregate — 5-minute windows every 1
    minute via Spark's native ``F.window(ts, '5 minutes', '1 minute')``:
    each event lands in 5 overlapping windows, the smoothing rollup
    dashboards want where tumbling windows (q14) jitter. The oracle
    replicates the window-assignment rule itself (every minute-aligned
    start in (es-300, es]), so what's certified is Spark's hop semantics,
    not just the sums.

    100 TB story: window explosion is exactly size/slide = 5x — bounded
    and declared; the aggregate stays map-side-combining on the window
    key. (Counter-pattern: a per-second slide would be a 300x blow-up —
    the slide ratio IS the cost knob.)
    """
    e = _t(spark, sf_dir, "events")
    w = e.select(
        F.window(
            F.expr("timestamp_seconds(ts div 1000000000)"), "5 minutes", "1 minute"
        ).alias("w"),
        "value",
    )
    return (
        w.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum2(_dec("value")).alias("win_sum"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            F.col("w.end").cast("long").alias("win_end"),
            "n_events",
            "win_sum",
        )
    )


@query(
    "q256_token_lorenz",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents WHERE trim(text) <> ''
    ),
    ranked AS (
      SELECT n_tok,
             ntile(10) OVER (ORDER BY n_tok, doc_id) AS decile
      FROM lens
    ),
    tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t FROM ranked)
    SELECT CAST(decile AS INT) AS decile,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS decile_tokens,
           round(sum(n_tok) * 1.0 / (SELECT t FROM tot), 6) AS token_share,
           round(sum(sum(n_tok)) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1.0 / (SELECT t FROM tot), 6) AS cum_share
    FROM ranked GROUP BY decile
    """,
)
def q256_token_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-concentration (Lorenz) curve: docs in length deciles,
    each decile's share of TOTAL tokens and the cumulative share — "how
    much of the training signal lives in the longest 10% of documents",
    the long-tail audit that decides truncation and packing policy
    (complements q245's key-skew Gini: that measures shuffle keys, this
    measures the data itself). NTILE with a doc_id tie-break is
    deterministic; shares are exact-integer sums with two final floats.

    100 TB story: one global sort by a scalar (range-partitioned), one
    grouped rollup on 10 keys, one 10-row cumulative window.
    """
    from phoebe_spark.operators.layout import global_rank_by_value

    d = _t(spark, sf_dir, "documents")
    lens = d.filter(F.trim("text") != "").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tok"),
    )
    # two-phase rank + exact NTILE arithmetic: bit-identical to
    # ntile(10) OVER (ORDER BY n_tok, doc_id) without the single-reducer
    # global window (first n%10 buckets get ceil(n/10) rows)
    r = global_rank_by_value(lens, "n_tok", "doc_id", descending=False)
    n1 = lens.agg(F.count(F.lit(1)).cast("long").alias("__nn"))
    ranked = r.crossJoin(F.broadcast(n1)).select(
        "n_tok",
        F.expr(
            """
            CASE WHEN r <= (__nn % 10) * (__nn div 10 + 1)
                 THEN (r - 1) div (__nn div 10 + 1) + 1
                 ELSE (__nn % 10)
                      + (r - (__nn % 10) * (__nn div 10 + 1) - 1)
                        div (__nn div 10) + 1
            END
            """
        ).cast("int").alias("decile"),
    )
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("decile_tokens"),
    )
    tot = F.sum("decile_tokens").over(Window.partitionBy())
    cum = F.sum("decile_tokens").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dec.select(
        F.col("decile").cast("int").alias("decile"),
        "n_docs",
        "decile_tokens",
        F.round(F.col("decile_tokens") / tot, 6).alias("token_share"),
        F.round(cum / tot, 6).alias("cum_share"),
    )


@query(
    "q257_date_dim_rollup",
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(o_orderdate AS DATE)) AS lo,
             max(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    dd AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    dim AS (
      SELECT d,
             CAST(isodow(d) AS INT) AS dow,
             CAST(CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS INT)
               AS is_weekend,
             CAST(strftime(d, '%Y-%m') AS VARCHAR) AS month
      FROM dd
    )
    SELECT dim.month, dim.is_weekend,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM dim LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = dim.d
    GROUP BY 1, 2
    HAVING count(o.o_orderkey) > 0
    """,
)
def q257_date_dim_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated DATE DIMENSION + calendar-attribute rollup: the date dim
    is derived in-engine (``sequence(min, max, interval 1 day)`` +
    calendar functions — no external table), then orders roll up by
    month x weekend flag through a broadcast join against it. This is the
    warehouse date-spine pattern: deriving calendar attributes ONCE in a
    dimension beats re-computing `dayofweek` per fact row in every query,
    and the spine also exposes zero-activity days (q181's gap audit rides
    the same spine).

    100 TB story: the dim is O(days) — broadcast always; the fact side
    aggregates map-side on (month, flag).
    """
    o = _t(spark, sf_dir, "orders")
    bounds = o.select(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    dim = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    ).select(
        "d",
        F.expr("CAST(((dayofweek(d) + 5) % 7) + 1 AS INT)").alias("dow"),
        F.when(F.expr("((dayofweek(d) + 5) % 7) + 1") >= 6, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_weekend"),
        F.date_format("d", "yyyy-MM").alias("month"),
    )
    facts = o.select(F.to_date("o_orderdate").alias("d"), "o_orderkey", "o_totalprice")
    j = F.broadcast(dim).join(facts, "d", "left")
    return (
        j.groupBy("month", "is_weekend")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _dsum2(_dec("o_totalprice")).alias("revenue"),
        )
        .filter(F.col("n_orders") > 0)
    )


@query(
    "q258_containment_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' '))) AS grams
      FROM toks
    ),
    posting AS (SELECT doc_id, len(grams) AS sz, unnest(grams) AS g FROM sh),
    capped AS (
      SELECT * FROM (
        SELECT p.*, count(*) OVER (PARTITION BY g) AS df FROM posting p
      ) WHERE df <= 1000
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS size_a, b.sz AS size_b,
             count(*) AS inter
      FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b,
           round(inter * 1.0 / least(size_a, size_b), 6) AS containment,
           round(inter * 1.0 / (size_a + size_b - inter), 6) AS jaccard
    FROM pairs WHERE inter * 1.0 / least(size_a, size_b) >= 0.2
    """,
)
def q258_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX-CONTAINMENT near-dup pairs (:func:`dedup.containment_pairs`,
    3-gram shingles, threshold 0.2): the asymmetric inclusion score that
    catches a short document embedded in a long one — containment 1.0
    where Jaccard is arbitrarily small — the quote/excerpt rung of the
    dedup ladder. Emits both scores, and the threshold sits where the
    gate certifies genuine divergence: the surviving set contains pairs
    at containment ~0.25 whose Jaccard is ~0.03 (one-way inclusion), next
    to mutual near-dups at ~1.0/~0.97.

    100 TB story: identical single-posting-pass inverted-index shape as
    q13 — only the final arithmetic differs.
    """
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.containment_pairs(d, n=3, threshold=0.2, max_shingle_freq=1000)
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round("containment", 6).alias("containment"),
        F.round("jaccard", 6).alias("jaccard"),
    )


@query(
    "q259_variant_shred",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_band,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
             AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
             AS k_max
    FROM events GROUP BY 1
    """,
)
def q259_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured OPEN-SCHEMA path via Spark 4's VARIANT type:
    ``parse_json`` keeps the whole document queryable without declaring a
    schema, ``variant_get`` shreds typed fields on demand — the
    schema-on-read complement of q37's closed-schema ``from_json`` (which
    silently nulls fields the struct didn't declare). Variant's binary
    encoding makes repeated field extraction cheap vs re-parsing JSON
    text per access.

    100 TB story: variant columns store parsed-once binary; field
    extraction is a columnar kernel, and the group key lands map-side —
    this is the pattern for telemetry/props columns whose schema drifts
    faster than the pipeline's release cycle.
    """
    e = _t(spark, sf_dir, "events")
    v = e.select(F.parse_json("props").alias("vp"))
    shred = v.select(
        F.expr("variant_get(vp, '$.k', 'int')").alias("k")
    )
    return shred.groupBy((F.col("k") % 10).alias("k_band")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").cast("int").alias("k_min"),
        F.max("k").cast("int").alias("k_max"),
    )


@query(
    "q260_expectations_suite",
    oracle="""
    WITH fk AS (
      SELECT count(*) AS n_orphans
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
    ),
    m AS (
      SELECT count(*) AS n,
             count(o_custkey) AS n_custkey,
             count(DISTINCT o_orderkey) AS n_distinct_pk,
             sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS n_neg_price,
             sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END)
               AS n_bad_status
      FROM orders
    )
    SELECT c.name AS constraint_name, c.metric, c.passed FROM (
      SELECT 'completeness(o_custkey)' AS name,
             round(n_custkey * 1.0 / n, 6) AS metric,
             CAST(CASE WHEN n_custkey = n THEN 1 ELSE 0 END AS INT) AS passed
      FROM m
      UNION ALL
      SELECT 'uniqueness(o_orderkey)',
             round(n_distinct_pk * 1.0 / n, 6),
             CAST(CASE WHEN n_distinct_pk = n THEN 1 ELSE 0 END AS INT)
      FROM m
      UNION ALL
      SELECT 'non_negative(o_totalprice)',
             CAST(n_neg_price AS DOUBLE),
             CAST(CASE WHEN n_neg_price = 0 THEN 1 ELSE 0 END AS INT)
      FROM m
      UNION ALL
      SELECT 'in_set(o_orderstatus)',
             CAST(n_bad_status AS DOUBLE),
             CAST(CASE WHEN n_bad_status = 0 THEN 1 ELSE 0 END AS INT)
      FROM m
      UNION ALL
      SELECT 'fk_containment(o_custkey->customer)',
             CAST(n_orphans AS DOUBLE),
             CAST(CASE WHEN n_orphans = 0 THEN 1 ELSE 0 END AS INT)
      FROM fk
    ) c
    """,
)
def q260_expectations_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality EXPECTATIONS suite as one report:
    completeness, primary-key uniqueness, value-bound, domain-set, and
    FK-containment constraints each emit (name, metric, passed) — the
    contract gate a table must clear before a pipeline consumes it. All
    single-table metrics come from ONE aggregate pass (one scan, five
    counters); only the FK probe adds a broadcast anti-join. Extends the
    per-FK orphan audit (q157) into the named-constraint report shape.

    100 TB story: constraint evaluation is O(1) extra state per
    constraint inside an existing scan — the same observe-metrics
    principle as curation.py's inline QA gate.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_distinct_pk"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("n_neg_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("n_bad_status"),
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    rows = m.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("completeness(o_custkey)").alias("constraint_name"),
                    F.round(F.col("n_custkey") / F.col("n"), 6).alias("metric"),
                    F.when(F.col("n_custkey") == F.col("n"), 1)
                    .otherwise(0)
                    .cast("int")
                    .alias("passed"),
                ),
                F.struct(
                    F.lit("uniqueness(o_orderkey)").alias("constraint_name"),
                    F.round(F.col("n_distinct_pk") / F.col("n"), 6).alias("metric"),
                    F.when(F.col("n_distinct_pk") == F.col("n"), 1)
                    .otherwise(0)
                    .cast("int")
                    .alias("passed"),
                ),
                F.struct(
                    F.lit("non_negative(o_totalprice)").alias("constraint_name"),
                    F.col("n_neg_price").cast("double").alias("metric"),
                    F.when(F.col("n_neg_price") == 0, 1)
                    .otherwise(0)
                    .cast("int")
                    .alias("passed"),
                ),
                F.struct(
                    F.lit("in_set(o_orderstatus)").alias("constraint_name"),
                    F.col("n_bad_status").cast("double").alias("metric"),
                    F.when(F.col("n_bad_status") == 0, 1)
                    .otherwise(0)
                    .cast("int")
                    .alias("passed"),
                ),
            )
        ).alias("e")
    ).select("e.constraint_name", "e.metric", "e.passed")
    fk_row = orphans.select(
        F.lit("fk_containment(o_custkey->customer)").alias("constraint_name"),
        F.col("n_orphans").cast("double").alias("metric"),
        F.when(F.col("n_orphans") == 0, 1).otherwise(0).cast("int").alias("passed"),
    )
    return rows.unionByName(fk_row)


@query(
    "q261_incremental_agg_maintenance",
    oracle=f"""
    WITH base AS (
      SELECT CAST({EPOCH_SQL.format(c='ts')} // 86400 AS BIGINT) AS day,
             event_type, value
      FROM events
    )
    SELECT day, event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS day_sum,
           CAST(1 AS INT) AS ivm_ok
    FROM base GROUP BY 1, 2
    """,
)
def q261_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance certificate: the daily
    (day x event_type) aggregate is built TWICE — full recompute, and
    incrementally (the first 25 days' aggregate merged with the remaining
    days' delta by re-aggregating partials, the IVM step a daily pipeline
    runs at midnight) — and every row carries ``ivm_ok``. The oracle
    expects 1, so any non-self-maintainable step (a non-decomposable
    aggregate, a lost partial) hash-fails the gate. COUNT and DECIMAL SUM
    are self-maintainable aggregates; the decimal carry makes the merged
    sum bit-equal to the recompute, not just close — which is exactly why
    the money policy (README) mandates DECIMAL partials.

    100 TB story: the nightly delta touches one day's partition; the
    merge is partials-sized (days x types), never a fact rescan — IVM is
    the difference between O(delta) and O(history) daily cost.
    """
    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.expr("(ts div 1000000000) div 86400").cast("long").alias("day"),
        "event_type",
        "value",
    )
    min_day = base.agg(F.min("day")).head()[0]
    cut = (min_day or 0) + 25

    def _partial(df):
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).alias("sum_dec"),
        )

    history = _partial(base.filter(F.col("day") < cut))
    delta = _partial(base.filter(F.col("day") >= cut))
    merged = (
        history.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
        )
    )
    full = _partial(base).withColumnRenamed("n_events", "n_full").withColumnRenamed(
        "sum_dec", "sum_full"
    )
    j = merged.join(full, ["day", "event_type"])
    return j.select(
        "day",
        "event_type",
        "n_events",
        F.round(F.col("sum_dec"), 2).cast("double").alias("day_sum"),
        F.when(
            (F.col("n_events") == F.col("n_full"))
            & (F.col("sum_dec") == F.col("sum_full")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("ivm_ok"),
    )


@query(
    "q262_snake_sharding",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents WHERE trim(text) <> ''
    ),
    ranked AS (
      SELECT doc_id, n_tok,
             CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS BIGINT)
               AS r
      FROM lens
    ),
    assigned AS (
      SELECT n_tok,
             CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END
               AS shard
      FROM ranked
    ),
    tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t FROM assigned)
    SELECT CAST(shard AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS token_sum,
           round(sum(n_tok) * 8.0 / (SELECT t FROM tot) - 1.0, 6)
             AS imbalance
    FROM assigned GROUP BY 1
    """,
)
def q262_snake_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance-OPTIMIZED training-shard assignment by SNAKE
    (boustrophedon) order: sort docs by token count desc, deal them across
    8 shards alternating direction each pass — the closed-form
    ``shard = f(rank)`` stand-in for greedy LPT bin packing (which is
    inherently sequential and cannot run as a plan). Snake order pairs a
    heavy pick in one pass with a light pick in the return pass, so
    per-shard token sums land within a fraction of a percent of ideal —
    the ``imbalance`` column measures it exactly. Complements q147's
    salted-hash sharding (random, content-addressed) with the
    skew-minimizing variant a token-budgeted trainer wants.

    100 TB story: one range-partitioned sort + a rank formula — no
    sequential state, no driver loop; re-runs reproduce the same shards.
    """
    d = _t(spark, sf_dir, "documents")
    lens = d.filter(F.trim("text") != "").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tok"),
    )
    from phoebe_spark.operators.layout import global_rank_by_value

    ranked = global_rank_by_value(lens, "n_tok", "doc_id").select(
        "n_tok", (F.col("r") - 1).alias("r")
    )
    assigned = ranked.select(
        "n_tok",
        F.when(F.expr("r div 8") % 2 == 0, F.col("r") % 8)
        .otherwise(7 - F.col("r") % 8)
        .alias("shard"),
    )
    tot = F.sum("token_sum").over(Window.partitionBy())
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("token_sum"),
        )
        .select(
            "shard",
            "n_docs",
            "token_sum",
            F.round(F.col("token_sum") * 8.0 / tot - 1.0, 6).alias("imbalance"),
        )
    )


@query(
    "q263_golden_record",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source, n_chars,
             md5(substring(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                           1, 80)) AS fp
      FROM documents WHERE trim(text) <> ''
    ),
    clusters AS (
      SELECT fp FROM fp GROUP BY fp HAVING count(*) >= 2
    )
    SELECT f.fp AS cluster_fp,
           CAST(min(f.doc_id) AS BIGINT) AS golden_doc_id,
           count(*) AS n_members,
           CAST(count(DISTINCT f.source) AS BIGINT) AS n_sources,
           string_agg(DISTINCT f.source, ',' ORDER BY f.source) AS sources,
           CAST(max(f.n_chars) AS BIGINT) AS max_chars
    FROM fp f JOIN clusters USING (fp)
    GROUP BY 1
    """,
)
def q263_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution SURVIVORSHIP: for every exact-duplicate cluster
    (normalized-prefix fingerprint, the q08/q178 family), MERGE a golden
    record by policy — lowest doc_id as the canonical key, member and
    distinct-source census, the sorted source list (provenance a data
    card needs), and the longest variant's length. Complements q88's
    keep-best (which PICKS one row) with the attribute-merge shape a
    master-data pipeline emits.

    100 TB story: one fingerprint shuffle; every survivorship rule is an
    ordinary aggregate (min/max/count/sort_array of collect_set) — no
    per-cluster iteration, no skew beyond natural cluster sizes.
    """
    d = _t(spark, sf_dir, "documents")
    f = d.filter(F.trim("text") != "").select(
        "doc_id", "source", "n_chars", _prefix_fp().alias("fp")
    )
    g = f.groupBy("fp").agg(
        F.min("doc_id").alias("golden_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct("source").alias("n_sources"),
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.max("n_chars").alias("max_chars"),
    )
    return g.filter(F.col("n_members") >= 2).select(
        F.col("fp").alias("cluster_fp"),
        "golden_doc_id",
        "n_members",
        "n_sources",
        "sources",
        "max_chars",
    )


@query(
    "q264_determinism_cert",
    oracle="""
    WITH kept AS (
      SELECT source, doc_id
      FROM documents
      WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|v1'), 1, 15))
                 AS BIGINT) % 10000 < 3000
    )
    SELECT source,
           count(*) AS n_kept,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id,
           CAST(1 AS INT) AS stable_ok
    FROM kept GROUP BY 1
    """,
)
def q264_determinism_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISM certificate for the sampling family: the salted-hash
    30% sample is drawn TWICE under adversarially different physical
    layouts (7-partition round-robin vs 13-partition range-by-text) and
    ``stable_ok`` asserts the two draws picked IDENTICAL rows per source.
    This is the contract the whole no-RNG design rides on — `Bernoulli
    sample()` changes membership under retries/AQE re-partitioning,
    salted-hash membership cannot — here it stops being a docstring claim
    and becomes a hash-checked gate row (the oracle expects 1, so any
    layout-sensitivity in the scan-side expression fails the round).

    100 TB story: both draws are scan-side codegen predicates (no
    shuffle); the certificate join is sample-sized on the id.
    """
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    a = sampling.hash_sample(d.repartition(7), 0.30, id_col="doc_id", salt="v1")
    b = sampling.hash_sample(
        d.repartitionByRange(13, "doc_id"), 0.30, id_col="doc_id", salt="v1"
    )
    both = a.select("doc_id", "source").join(
        b.select(F.col("doc_id").alias("doc_id_b")),
        F.col("doc_id") == F.col("doc_id_b"),
        "full",
    )
    return (
        both.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.min(
                F.when(
                    F.col("doc_id").isNotNull() & F.col("doc_id_b").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("int")
            .alias("stable_ok"),
        )
        .filter(F.col("source").isNotNull())
    )


@query(
    "q265_order_integrity",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             {EPOCH_SQL.format(c='ts')} AS es,
             lag({EPOCH_SQL.format(c='ts')}) OVER w AS prev_es
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    )
    SELECT user_id,
           CAST(count(prev_es) AS BIGINT) AS n_steps,
           CAST(sum(CASE WHEN es < prev_es THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inversions,
           CAST(max(CASE WHEN es < prev_es THEN prev_es - es ELSE 0 END)
                AS BIGINT) AS max_backstep_s,
           round(sum(CASE WHEN es < prev_es THEN 1 ELSE 0 END) * 1.0
                 / count(prev_es), 6) AS disorder_rate
    FROM seq WHERE prev_es IS NOT NULL
    GROUP BY 1
    """,
)
def q265_order_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-INTEGRITY certificate: per key, does event time ever step
    BACKWARD along arrival order (the event_id sequence)? Every streaming
    drain in this engine stages with a 0-SECOND watermark — which is only
    correct because ingestion order preserves event time; this query
    turns that assumption into a hash-checked gate row (n_inversions and
    max_backstep_s expected 0 on this corpus — if the fixture ever gains
    disorder, the row fails loudly and the watermark-delay choice must be
    revisited; the same report, run on a disordered feed, IS the
    watermark-tuning measurement — max backstep bounds the delay from
    below, q205 certifies what a too-small delay drops).

    100 TB story: one shuffle on the key for the lag window, then a
    grouped rollup on the same key — Spark reuses the partitioning.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select(
        "user_id",
        _epoch().alias("es"),
        F.lag(_epoch()).over(w).alias("prev_es"),
    ).filter(F.col("prev_es").isNotNull())
    inv = F.when(F.col("es") < F.col("prev_es"), 1).otherwise(0)
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum(inv).alias("n_inversions"),
        F.max(
            F.when(F.col("es") < F.col("prev_es"), F.col("prev_es") - F.col("es"))
            .otherwise(0)
        ).alias("max_backstep_s"),
        F.round(F.sum(inv) / F.count(F.lit(1)), 6).alias("disorder_rate"),
    )


@query(
    "q266_reconciliation",
    oracle="""
    WITH l AS (
      SELECT l_orderkey,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                            * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))), 2)
                  AS DOUBLE) AS line_total
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT o.o_orderkey, o.o_totalprice, l.line_total,
             CASE
               WHEN l.line_total IS NULL THEN 'missing_lines'
               WHEN abs(o.o_totalprice - l.line_total) / o.o_totalprice < 0.01
                 THEN 'tie_1pct'
               WHEN abs(o.o_totalprice - l.line_total) / o.o_totalprice < 0.10
                 THEN 'drift_1_10pct'
               ELSE 'drift_over_10pct'
             END AS band
      FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
    )
    SELECT band,
           count(*) AS n_orders,
           CAST(round(sum(CAST(abs(o_totalprice - coalesce(line_total, 0))
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS abs_delta_sum
    FROM j GROUP BY 1
    """,
)
def q266_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FINANCIAL RECONCILIATION: does the order header total
    tie out against the sum of its line extensions (price x (1-disc) x
    (1+tax))? Orders band into tie (<1%), drift (1-10%), material
    mismatch (>10%), and headers with NO lines — the controls report
    every warehouse runs between fact tables that are supposed to agree.
    On this corpus the invariant deliberately does NOT hold, so every
    band is populated (asserted non-vacuous by the gate row counts); line
    sums carry DECIMAL so banding never moves on partial-agg order.

    100 TB story: one map-side-combining rollup on the line side, one
    key join, one 4-group aggregate — reconciliation cost is one scan of
    each table regardless of mismatch rate.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    l = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
                * (F.lit(1).cast("decimal(18,4)") + _dec("l_tax"))
            ),
            2,
        )
        .cast("double")
        .alias("line_total")
    )
    j = o.join(l, o.o_orderkey == l.l_orderkey, "left")
    rel = F.abs(F.col("o_totalprice") - F.col("line_total")) / F.col("o_totalprice")
    band = (
        F.when(F.col("line_total").isNull(), "missing_lines")
        .when(rel < 0.01, "tie_1pct")
        .when(rel < 0.10, "drift_1_10pct")
        .otherwise("drift_over_10pct")
    )
    return (
        j.select(
            band.alias("band"),
            F.abs(
                F.col("o_totalprice") - F.coalesce("line_total", F.lit(0.0))
            ).alias("d"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("d")), 2).cast("double").alias("abs_delta_sum"),
        )
    )


@query(
    "q267_ts_similarity_search",
    oracle=f"""
    WITH hc AS (
      SELECT user_id,
             CAST(({EPOCH_SQL.format(c='ts')} // 3600) % 24 AS INT) AS hod,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    grid AS (SELECT unnest(generate_series(0, 23)) AS hod),
    dense AS (
      SELECT u.user_id, g.hod, coalesce(hc.c, 0.0) AS c
      FROM (SELECT DISTINCT user_id FROM hc) u
      CROSS JOIN grid g
      LEFT JOIN hc ON hc.user_id = u.user_id AND hc.hod = g.hod
    ),
    stats AS (
      SELECT user_id, avg(c) AS mu,
             sqrt(avg(c * c) - avg(c) * avg(c)) AS sd
      FROM dense GROUP BY 1 HAVING sqrt(avg(c * c) - avg(c) * avg(c)) > 0
    ),
    z AS (
      SELECT d.user_id, d.hod, (d.c - s.mu) / s.sd AS z
      FROM dense d JOIN stats s USING (user_id)
    ),
    q AS (SELECT hod, z AS qz FROM z WHERE user_id = 0),
    dist AS (
      SELECT z.user_id, sqrt(sum((z.z - q.qz) * (z.z - q.qz))) AS zdist
      FROM z JOIN q USING (hod)
      WHERE z.user_id <> 0
      GROUP BY 1
    )
    SELECT user_id, round(zdist, 6) AS zdist,
           CAST(row_number() OVER (ORDER BY round(zdist, 6), user_id) AS INT)
             AS rank
    FROM dist
    QUALIFY row_number() OVER (ORDER BY round(zdist, 6), user_id) <= 10
    """,
)
def q267_ts_similarity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-SERIES similarity search (the distributed-TS-search shape, cf.
    EDBT'19 streaming TS similarity): each user's 24-hour activity profile
    is z-NORMALIZED (shape match, not volume match — the UCR-suite
    convention) and the 10 nearest users to user 0 by Euclidean distance
    come back ranked. Flat profiles (sd=0) are excluded — z-normalization
    is undefined there. Rank ties break on 6dp-rounded distance then
    user_id, so ordering is engine-stable.

    100 TB story: profile build is one map-side-combining rollup to
    users x 24 rows; the query profile broadcasts (24 rows); distance is
    a per-user aggregate over 24 aligned dims — the corpus is scanned
    once and only (user, dist) rows shuffle for the global top-k (which
    plans as WindowGroupLimit partial top-k). At billions of series the
    same plan gains an LSH/PAA prefilter exactly like the ANN ladder.
    """
    e = _t(spark, sf_dir, "events")
    hc = e.groupBy(
        "user_id",
        F.expr("CAST(((ts div 1000000000) div 3600) % 24 AS INT)").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    grid = spark.range(0, 24).select(F.col("id").cast("int").alias("hod"))
    users = hc.select("user_id").distinct()
    dense = (
        users.crossJoin(F.broadcast(grid))
        .join(hc, ["user_id", "hod"], "left")
        .select("user_id", "hod", F.coalesce("c", F.lit(0.0)).alias("c"))
    )
    stats = (
        dense.groupBy("user_id")
        .agg(
            F.avg("c").alias("mu"),
            F.sqrt(F.avg(F.col("c") * F.col("c")) - F.avg("c") * F.avg("c")).alias("sd"),
        )
        .filter(F.col("sd") > 0)
    )
    z = dense.join(stats, "user_id").select(
        "user_id", "hod", ((F.col("c") - F.col("mu")) / F.col("sd")).alias("z")
    )
    q = z.filter(F.col("user_id") == 0).select("hod", F.col("z").alias("qz"))
    dist = (
        z.filter(F.col("user_id") != 0)
        .join(F.broadcast(q), "hod")
        .groupBy("user_id")
        .agg(F.sqrt(F.sum((F.col("z") - F.col("qz")) * (F.col("z") - F.col("qz")))).alias("zd"))
    )
    ranked = dist.select(
        "user_id", F.round("zd", 6).alias("zdist")
    ).withColumn(
        "rank",
        F.row_number().over(Window.orderBy("zdist", "user_id")).cast("int"),
    )
    return ranked.filter(F.col("rank") <= 10)


# Shared z-normalized 24-hour profile CTE (q267/q268)
_ZPROF_SQL = f"""
    hc AS (
      SELECT user_id,
             CAST(({EPOCH_SQL.format(c='ts')} // 3600) % 24 AS INT) AS hod,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    grid AS (SELECT unnest(generate_series(0, 23)) AS hod),
    dense AS (
      SELECT u.user_id, g.hod, coalesce(hc.c, 0.0) AS c
      FROM (SELECT DISTINCT user_id FROM hc) u
      CROSS JOIN grid g
      LEFT JOIN hc ON hc.user_id = u.user_id AND hc.hod = g.hod
    ),
    stats AS (
      SELECT user_id, avg(c) AS mu,
             sqrt(avg(c * c) - avg(c) * avg(c)) AS sd
      FROM dense GROUP BY 1 HAVING sqrt(avg(c * c) - avg(c) * avg(c)) > 0
    ),
    z AS (
      SELECT d.user_id, d.hod, (d.c - s.mu) / s.sd AS z
      FROM dense d JOIN stats s USING (user_id)
    )
"""


@query(
    "q268_paa_prune_audit",
    oracle=f"""
    WITH {_ZPROF_SQL},
    q AS (SELECT hod, z AS qz FROM z WHERE user_id = 0),
    paa AS (
      SELECT user_id, hod // 3 AS seg, avg(z) AS zm
      FROM z GROUP BY 1, 2
    ),
    qpaa AS (SELECT hod // 3 AS seg, avg(qz) AS qm FROM q GROUP BY 1),
    lb AS (
      SELECT p.user_id,
             sqrt(3 * sum((p.zm - qp.qm) * (p.zm - qp.qm))) AS lb_paa
      FROM paa p JOIN qpaa qp USING (seg)
      WHERE p.user_id <> 0 GROUP BY 1
    ),
    dist AS (
      SELECT z.user_id, sqrt(sum((z.z - q.qz) * (z.z - q.qz))) AS zdist
      FROM z JOIN q USING (hod) WHERE z.user_id <> 0 GROUP BY 1
    ),
    j AS (
      SELECT d.user_id, d.zdist, l.lb_paa,
             CAST(CASE WHEN round(l.lb_paa, 9) <= round(d.zdist, 9) + 1e-9
                       THEN 1 ELSE 0 END AS INT) AS lb_ok
      FROM dist d JOIN lb l USING (user_id)
    ),
    kth AS (
      SELECT max(zdist) AS k10 FROM (
        SELECT zdist FROM j ORDER BY zdist, user_id LIMIT 10)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(min(lb_ok) AS INT) AS lb_holds_everywhere,
           CAST(sum(CASE WHEN j.lb_paa > kth.k10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_prunable,
           round(sum(CASE WHEN j.lb_paa > kth.k10 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS prune_rate
    FROM j, kth
    """,
)
def q268_paa_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAA LOWER-BOUND pruning audit — the scale path for q267's
    time-series search, certified: the 8-segment piecewise aggregate
    approximation of each z-profile gives Keogh's lower bound
    ``sqrt(w * sum((mean_x - mean_y)^2)) <= Euclid(x, y)`` (w=3), so a
    series whose LB already exceeds the exact 10th-best distance can be
    skipped WITHOUT computing its full distance and recall stays 1.0.
    ``lb_holds_everywhere`` re-proves the lemma on every candidate inside
    the hash-checked gate (tolerance 1e-9 at 9dp for the one float
    rounding), and ``prune_rate`` reports how much of the corpus the
    8-dim prefilter eliminates — the number that says whether the index
    pays for itself.

    100 TB story: PAA shrinks every series to 8 values (map-side), the
    LB pass scans those 8-dim sketches only, and the exact pass touches
    just the unpruned survivors — the ANN generate-then-verify shape
    (LSH/IVF/PQ ladder) applied to time series.
    """
    e = _t(spark, sf_dir, "events")
    hc = e.groupBy(
        "user_id",
        F.expr("CAST(((ts div 1000000000) div 3600) % 24 AS INT)").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    grid = spark.range(0, 24).select(F.col("id").cast("int").alias("hod"))
    dense = (
        hc.select("user_id").distinct()
        .crossJoin(F.broadcast(grid))
        .join(hc, ["user_id", "hod"], "left")
        .select("user_id", "hod", F.coalesce("c", F.lit(0.0)).alias("c"))
    )
    stats = (
        dense.groupBy("user_id")
        .agg(
            F.avg("c").alias("mu"),
            F.sqrt(F.avg(F.col("c") * F.col("c")) - F.avg("c") * F.avg("c")).alias("sd"),
        )
        .filter(F.col("sd") > 0)
    )
    z = dense.join(stats, "user_id").select(
        "user_id", "hod", ((F.col("c") - F.col("mu")) / F.col("sd")).alias("z")
    ).localCheckpoint(eager=True)
    q = z.filter(F.col("user_id") == 0).select("hod", F.col("z").alias("qz"))
    paa = z.groupBy("user_id", F.expr("hod div 3").alias("seg")).agg(
        F.avg("z").alias("zm")
    )
    qpaa = q.groupBy(F.expr("hod div 3").alias("seg")).agg(F.avg("qz").alias("qm"))
    lb = (
        paa.filter(F.col("user_id") != 0)
        .join(F.broadcast(qpaa), "seg")
        .groupBy("user_id")
        .agg(
            F.sqrt(F.lit(3) * F.sum((F.col("zm") - F.col("qm")) ** 2)).alias("lb_paa")
        )
    )
    dist = (
        z.filter(F.col("user_id") != 0)
        .join(F.broadcast(q), "hod")
        .groupBy("user_id")
        .agg(F.sqrt(F.sum((F.col("z") - F.col("qz")) ** 2)).alias("zdist"))
    )
    j = dist.join(lb, "user_id").select(
        "user_id",
        "zdist",
        "lb_paa",
        F.when(
            F.round("lb_paa", 9) <= F.round("zdist", 9) + F.lit(1e-9), 1
        ).otherwise(0).cast("int").alias("lb_ok"),
    )
    k10 = (
        j.select("zdist", "user_id")
        .withColumn("rk", F.row_number().over(Window.orderBy("zdist", "user_id")))
        .filter(F.col("rk") <= 10)
        .agg(F.max("zdist").alias("k10"))
    )
    return j.crossJoin(F.broadcast(k10)).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.min("lb_ok").cast("int").alias("lb_holds_everywhere"),
        F.sum(F.when(F.col("lb_paa") > F.col("k10"), 1).otherwise(0)).alias(
            "n_prunable"
        ),
        F.round(
            F.sum(F.when(F.col("lb_paa") > F.col("k10"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("prune_rate"),
    )


@query(
    "q269_sax_words",
    oracle=f"""
    WITH {_ZPROF_SQL},
    paa AS (
      SELECT user_id, hod // 3 AS seg, avg(z) AS zm
      FROM z GROUP BY 1, 2
    ),
    sym AS (
      SELECT user_id, seg,
             CASE WHEN zm < -0.6745 THEN 'a'
                  WHEN zm < 0 THEN 'b'
                  WHEN zm < 0.6745 THEN 'c'
                  ELSE 'd' END AS s
      FROM paa
    ),
    words AS (
      SELECT user_id, string_agg(s, '' ORDER BY seg) AS sax_word
      FROM sym GROUP BY 1
    )
    SELECT sax_word,
           count(*) AS n_users,
           CAST(min(user_id) AS BIGINT) AS example_user
    FROM words GROUP BY 1 HAVING count(*) >= 2
    """,
)
def q269_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin et al. 2003): each user's z-normalized
    24-hour profile reduces to an 8-segment PAA, each segment to one of 4
    symbols at the standard Gaussian quartile breakpoints (-0.6745, 0,
    0.6745) — the 8-char "shape word" that makes time series GROUPABLE:
    users sharing a word have the same activity shape, found by one
    groupBy instead of any pairwise distance. Completes the TS ladder
    next to exact search (q267) and PAA pruning (q268); words with >= 2
    members only, so the output certifies real shape collisions.

    Scale: profiles and PAA are map-side rollups; symbolization is a
    codegen CASE; the final shuffle is on the 4^8-bounded word key.
    """
    e = _t(spark, sf_dir, "events")
    hc = e.groupBy(
        "user_id",
        F.expr("CAST(((ts div 1000000000) div 3600) % 24 AS INT)").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    grid = spark.range(0, 24).select(F.col("id").cast("int").alias("hod"))
    dense = (
        hc.select("user_id").distinct()
        .crossJoin(F.broadcast(grid))
        .join(hc, ["user_id", "hod"], "left")
        .select("user_id", "hod", F.coalesce("c", F.lit(0.0)).alias("c"))
    )
    stats = (
        dense.groupBy("user_id")
        .agg(
            F.avg("c").alias("mu"),
            F.sqrt(F.avg(F.col("c") * F.col("c")) - F.avg("c") * F.avg("c")).alias("sd"),
        )
        .filter(F.col("sd") > 0)
    )
    z = dense.join(stats, "user_id").select(
        "user_id", "hod", ((F.col("c") - F.col("mu")) / F.col("sd")).alias("z")
    )
    paa = z.groupBy("user_id", F.expr("hod div 3").alias("seg")).agg(
        F.avg("z").alias("zm")
    )
    sym = paa.select(
        "user_id",
        "seg",
        F.when(F.col("zm") < -0.6745, "a")
        .when(F.col("zm") < 0, "b")
        .when(F.col("zm") < 0.6745, "c")
        .otherwise("d")
        .alias("s"),
    )
    words = sym.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("seg", "s"))).getField("s"), ""
        ).alias("sax_word")
    )
    return (
        words.groupBy("sax_word")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("user_id").alias("example_user"),
        )
        .filter(F.col("n_users") >= 2)
    )


@query(
    "q270_seasonal_backtest",
    oracle=f"""
    WITH hc AS (
      SELECT {EPOCH_SQL.format(c='ts')} // 86400 AS day,
             ({EPOCH_SQL.format(c='ts')} // 3600) % 24 AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.day, a.hr, a.c AS actual, f.c AS forecast
      FROM hc a JOIN hc f ON f.day = a.day - 7 AND f.hr = a.hr
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(abs(actual - forecast)) AS BIGINT) AS abs_err_sum,
           round(sum(abs(actual - forecast)) * 1.0 / count(*), 6) AS mae,
           round(sum(abs(actual - forecast) * 1.0 / actual) / count(*), 6)
             AS mape
    FROM j WHERE actual > 0
    GROUP BY 1
    """,
)
def q270_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin BACKTEST of the seasonal-naive forecaster (predict
    hour h of day d with hour h of day d-7): per-day MAE and MAPE over
    the hourly event-count series — the baseline every workload
    forecaster (reference M1-M3; phoebe_spark/models/workload.py) must
    beat, produced as one batch query so the bar is itself
    oracle-certified. Errors are exact integers; only the two final
    ratios are float.

    100 TB story: the hourly rollup is map-side-combining; the
    forecast join is a self-equi-join on the O(hours) aggregate, never
    on raw events; per-day scoring reuses the same key partitioning.
    """
    e = _t(spark, sf_dir, "events")
    hc = e.groupBy(
        F.expr("(ts div 1000000000) div 86400").alias("day"),
        F.expr("((ts div 1000000000) div 3600) % 24").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = hc.select("day", "hr", F.col("c").alias("actual"))
    f = hc.select(
        (F.col("day") + 7).alias("day"), "hr", F.col("c").alias("forecast")
    )
    j = a.join(f, ["day", "hr"]).filter(F.col("actual") > 0)
    err = F.abs(F.col("actual") - F.col("forecast"))
    return j.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(err).alias("abs_err_sum"),
        F.round(F.sum(err) / F.count(F.lit(1)), 6).alias("mae"),
        F.round(
            F.sum(err / F.col("actual")) / F.count(F.lit(1)), 6
        ).alias("mape"),
    )


def _q271_dtw_oracle(n: int = 24, band: int = 2) -> str:
    """Generated oracle for q271: the banded DTW dynamic program unrolled
    as one chained-CTE row per DP row (the q145/q214 generated-oracle
    treatment applied to DTW). Row i carries the 5 in-band cells
    D(i, i+k), k=-2..2, as lateral-alias columns — DuckDB evaluates the
    intra-row dependency D(i, j-1) left-to-right, exactly like the
    engine-side numpy loop, so the float sequence is identical op for op.
    Virtual row 0 is D(0,0)=0 (others +inf), giving the standard base
    case without special-casing row 1."""
    INF = "1e308"
    ks = list(range(-band, band + 1))

    def nm(k: int) -> str:
        return f"m{-k}" if k < 0 else f"p{k}" if k > 0 else "0"

    def cell(i: int, k: int) -> str:
        j = i + k
        if j < 1 or j > n:
            return INF
        p_k1 = f"c{nm(k + 1)}" if k + 1 <= band else INF
        p_k0 = f"c{nm(k)}"
        c_km1 = f"n{nm(k - 1)}" if k - 1 >= -band else INF
        return (
            f"(x.xs[{i}] - q.qs[{j}]) * (x.xs[{i}] - q.qs[{j}])"
            f" + least({p_k1}, {p_k0}, {c_km1})"
        )

    ctes = [
        "r0 AS (SELECT user_id, "
        + ", ".join(
            f"CAST({'0' if k == 0 else INF} AS DOUBLE) AS c{nm(k)}" for k in ks
        )
        + " FROM prof WHERE user_id <> 0)"
    ]
    for i in range(1, n + 1):
        cols = ", ".join(f"{cell(i, k)} AS n{nm(k)}" for k in ks)
        renames = ", ".join(f"n{nm(k)} AS c{nm(k)}" for k in ks)
        ctes.append(
            f"r{i}_t AS (SELECT r{i - 1}.user_id, {cols} "
            f"FROM r{i - 1} JOIN prof x USING (user_id), qrow q)"
        )
        ctes.append(f"r{i} AS (SELECT user_id, {renames} FROM r{i}_t)")
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {_ZPROF_SQL},
    prof AS (
      SELECT user_id, list(z ORDER BY hod) AS xs FROM z GROUP BY 1
    ),
    qrow AS (SELECT xs AS qs FROM prof WHERE user_id = 0),
    {chain},
    dist AS (SELECT user_id, sqrt(c0) AS dtw FROM r{n})
    SELECT user_id, round(dtw, 6) AS dtw,
           CAST(row_number() OVER (ORDER BY round(dtw, 6), user_id) AS INT)
             AS rank
    FROM dist
    QUALIFY row_number() OVER (ORDER BY round(dtw, 6), user_id) <= 10
    """


@query("q271_dtw_topk", oracle=_q271_dtw_oracle())
def q271_dtw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BANDED DTW search — the elastic-distance capstone of the TS
    ladder (q267 exact Euclidean / q268 PAA prune / q269 SAX): the 10
    users whose z-normalized 24-hour profiles are closest to user 0 under
    dynamic time warping with a Sakoe-Chiba band of 2 (shapes may lead or
    lag by up to 2 hours without penalty — Euclidean calls a 1-hour
    phase shift 'different', DTW does not). The DP runs as a vectorized
    numpy loop inside one Arrow batch pass; the oracle replays the SAME
    DP as a generated 24-row CTE chain with lateral aliases, so every
    float op happens in the same order and the distance matches to 6dp
    digit-for-digit.

    100 TB story: profiles are map-side rollups to O(keys) rows of 24
    doubles; the query profile broadcasts via closure; DTW is O(n*band)
    per candidate inside mapInPandas (no shuffle); only (user, dist)
    rows shuffle for the WindowGroupLimit top-k. The q268 PAA bound
    prunes candidates for DTW exactly as for Euclidean (LB_PAA lower
    bounds both).
    """
    import numpy as np
    import pandas as pd

    e = _t(spark, sf_dir, "events")
    hc = e.groupBy(
        "user_id",
        F.expr("CAST(((ts div 1000000000) div 3600) % 24 AS INT)").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    grid = spark.range(0, 24).select(F.col("id").cast("int").alias("hod"))
    dense = (
        hc.select("user_id").distinct()
        .crossJoin(F.broadcast(grid))
        .join(hc, ["user_id", "hod"], "left")
        .select("user_id", "hod", F.coalesce("c", F.lit(0.0)).alias("c"))
    )
    stats = (
        dense.groupBy("user_id")
        .agg(
            F.avg("c").alias("mu"),
            F.sqrt(F.avg(F.col("c") * F.col("c")) - F.avg("c") * F.avg("c")).alias("sd"),
        )
        .filter(F.col("sd") > 0)
    )
    z = dense.join(stats, "user_id").select(
        "user_id", "hod", ((F.col("c") - F.col("mu")) / F.col("sd")).alias("z")
    )
    prof = z.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("hod", "z")))
        .getField("z")
        .alias("xs")
    )
    qs = np.array(
        prof.filter(F.col("user_id") == 0).head()["xs"], dtype=np.float64
    )
    band = 2
    n = 24
    INF = 1e308

    def _dtw(batches):
        for pdf in batches:
            out_u, out_d = [], []
            for uid, xs in zip(pdf["user_id"], pdf["xs"]):
                x = np.asarray(xs, dtype=np.float64)
                # prev[k+band] = D(i-1, (i-1)+k); virtual row 0: D(0,0)=0
                prev = np.full(2 * band + 1, INF)
                prev[band] = 0.0
                for i in range(1, n + 1):
                    cur = np.full(2 * band + 1, INF)
                    for k in range(-band, band + 1):
                        j = i + k
                        if j < 1 or j > n:
                            continue
                        p_k1 = prev[k + 1 + band] if k + 1 <= band else INF
                        p_k0 = prev[k + band]
                        c_km1 = cur[k - 1 + band] if k - 1 >= -band else INF
                        cost = (x[i - 1] - qs[j - 1]) * (x[i - 1] - qs[j - 1])
                        cur[k + band] = cost + min(p_k1, p_k0, c_km1)
                    prev = cur
                out_u.append(int(uid))
                out_d.append(float(np.sqrt(prev[band])))
            yield pd.DataFrame({"user_id": out_u, "dtw": out_d})

    cand = prof.filter(F.col("user_id") != 0)
    dist = cand.mapInPandas(_dtw, schema="user_id long, dtw double")
    ranked = dist.select(
        "user_id", F.round("dtw", 6).alias("dtw")
    ).withColumn(
        "rank",
        F.row_number().over(Window.orderBy("dtw", "user_id")).cast("int"),
    )
    return ranked.filter(F.col("rank") <= 10)


@query(
    "q272_matrix_profile",
    oracle=f"""
    WITH hc AS (
      SELECT {EPOCH_SQL.format(c='ts')} // 3600 AS hr,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hc),
    grid AS (
      SELECT unnest(generate_series(0, hi - lo)) AS hi2, lo
      FROM bounds
    ),
    dense AS (
      SELECT g.hi2 AS idx, coalesce(hc.c, 0.0) AS c
      FROM grid g LEFT JOIN hc ON hc.hr = g.lo + g.hi2
    ),
    nsub AS (SELECT max(idx) + 1 - 24 AS last_start FROM dense),
    starts AS (
      SELECT unnest(generate_series(0, last_start, 3)) AS s FROM nsub
    ),
    sub AS (
      SELECT st.s, d.idx - st.s AS o, d.c
      FROM starts st JOIN dense d ON d.idx >= st.s AND d.idx < st.s + 24
    ),
    arrs AS (
      SELECT s, list(c ORDER BY o) AS a FROM sub GROUP BY 1
    ),
    zt AS (
      SELECT s, a,
             list_sum(a) / 24 AS mu,
             sqrt(list_sum(list_transform(a, x -> x * x)) / 24
                  - (list_sum(a) / 24) * (list_sum(a) / 24)) AS sd
      FROM arrs
    ),
    zs AS (
      SELECT s, list_transform(a, x -> (x - mu) / sd) AS za
      FROM zt WHERE sd > 0
    ),
    pairs AS (
      SELECT a.s AS s1, b.s AS s2,
             sqrt(list_sum(list_transform(generate_series(1, 24),
                  i -> (a.za[i] - b.za[i]) * (a.za[i] - b.za[i])))) AS d
      FROM zs a JOIN zs b ON b.s > a.s AND b.s - a.s >= 12
    ),
    sym AS (
      SELECT s1 AS s, s2 AS partner, d FROM pairs
      UNION ALL SELECT s2, s1, d FROM pairs
    ),
    mp AS (
      SELECT s, partner, round(d, 6) AS mp_dist
      FROM sym
      QUALIFY row_number() OVER (PARTITION BY s ORDER BY round(d, 6), partner) = 1
    ),
    ranked AS (
      SELECT 'motif' AS kind, s, partner, mp_dist,
             CAST(row_number() OVER (ORDER BY mp_dist, s) AS INT) AS rank
      FROM mp
      UNION ALL
      SELECT 'discord', s, partner, mp_dist,
             CAST(row_number() OVER (ORDER BY mp_dist DESC, s) AS INT)
      FROM mp
    )
    SELECT kind, CAST(s AS BIGINT) AS s, CAST(partner AS BIGINT) AS partner,
           mp_dist, rank
    FROM ranked WHERE rank <= 5
    """,
)
def q272_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRIDED MATRIX PROFILE over the dense hourly event-count series
    (Yeh et al., ICDM 2016 — the all-pairs nearest-neighbor profile that
    yields MOTIFS, the most-repeated shapes, and DISCORDS, the anomalies,
    from one structure): 24-hour windows at stride 3, z-normalized, an
    exclusion zone of half a window so trivial self-matches never win,
    and the top-5 of each kind returned. Missing hours are real zeros
    (the count of an empty hour), not gaps — the subsequence grid is
    dense by construction.

    100 TB story: the PROFILE input is the aggregated O(hours) series
    (one map-side rollup of the raw events), so the quadratic
    subsequence join is over hours²/stride², never rows — the matrix
    profile of a year of hourly data is ~3k windows, trivially
    distributed; stride and exclusion are declared knobs.
    """
    e = _t(spark, sf_dir, "events")
    hc = e.groupBy(F.expr("(ts div 1000000000) div 3600").alias("hr")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    b = hc.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = b.select(
        F.explode(F.expr("sequence(0, CAST(hi - lo AS INT))")).alias("idx"), "lo"
    )
    dense = grid.join(hc, grid.lo + grid.idx == hc.hr, "left").select(
        "idx", F.coalesce("c", F.lit(0.0)).alias("c")
    ).localCheckpoint(eager=True)
    last_start = dense.agg(F.max("idx")).head()[0] + 1 - 24
    starts = spark.range(0, last_start + 1, 3).select(F.col("id").alias("s"))
    sub = starts.join(
        dense, (dense.idx >= starts.s) & (dense.idx < starts.s + 24)
    ).select("s", (F.col("idx") - F.col("s")).alias("o"), "c")
    arrs = sub.groupBy("s").agg(
        F.array_sort(F.collect_list(F.struct("o", "c"))).getField("c").alias("a")
    )
    lsum = F.aggregate(F.col("a"), F.lit(0.0), lambda acc, x: acc + x)
    lsq = F.aggregate(F.col("a"), F.lit(0.0), lambda acc, x: acc + x * x)
    zt = arrs.select(
        "s",
        "a",
        (lsum / 24).alias("mu"),
        F.sqrt(lsq / 24 - (lsum / 24) * (lsum / 24)).alias("sd"),
    )
    zs = zt.filter(F.col("sd") > 0).select(
        "s",
        F.transform("a", lambda x: (x - F.col("mu")) / F.col("sd")).alias("za"),
    ).localCheckpoint(eager=True)
    a = zs.alias("a")
    bb = zs.alias("b")
    pd_ = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("a.za"), F.col("b.za"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    pairs = a.join(
        bb,
        (F.col("b.s") > F.col("a.s")) & (F.col("b.s") - F.col("a.s") >= 12),
    ).select(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"), pd_.alias("d"))
    sym = pairs.select(
        F.col("s1").alias("s"), F.col("s2").alias("partner"), "d"
    ).unionAll(pairs.select(F.col("s2"), F.col("s1"), "d"))
    mp = (
        sym.select("s", "partner", F.round("d", 6).alias("mp_dist"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("s").orderBy("mp_dist", "partner")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    motifs = mp.withColumn(
        "rank", F.row_number().over(Window.orderBy("mp_dist", "s")).cast("int")
    ).withColumn("kind", F.lit("motif"))
    discords = mp.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("mp_dist").desc(), "s")).cast("int"),
    ).withColumn("kind", F.lit("discord"))
    return (
        motifs.unionAll(discords)
        .filter(F.col("rank") <= 5)
        .select("kind", "s", "partner", "mp_dist", "rank")
    )


def _q273_holt_oracle(T: int = 30, a: float = 0.5, g: float = 0.3, keyed: bool = False) -> str:
    """Generated oracle for q273: Holt's linear recursion unrolled as one
    CTE per time step (the DTW/q271 generated-chain treatment applied to
    exponential smoothing). Level/trend are lateral-alias scalars; the
    float sequence is identical to the engine-side sequential fold."""
    k = "k, " if keyed else ""
    ctes = [
        f"h1_r AS (SELECT {k}xs[1] AS l, xs[2] - xs[1] AS b, xs FROM series)"
    ]
    for t in range(2, T + 1):
        ctes.append(
            f"h{t} AS (SELECT {k}{a} * xs[{t}] + {1 - a} * (l + b) AS nl, "
            f"{g} * ({a} * xs[{t}] + {1 - a} * (l + b) - l) + {1 - g} * b AS nb, "
            f"xs FROM h{t - 1}_r)"
        )
        ctes.append(f"h{t}_r AS (SELECT {k}nl AS l, nb AS b, xs FROM h{t})")
    chain = ",\n    ".join(ctes)
    last = f"h{T}_r"
    if keyed:
        return f"""
    WITH hc AS (
      SELECT event_type AS k,
             epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo FROM hc),
    keys AS (SELECT DISTINCT k FROM hc),
    grid AS (SELECT keys.k, g.d, b.lo
             FROM keys CROSS JOIN (SELECT unnest(generate_series(0, {T - 1})) AS d) g,
                  bounds b),
    dense AS (
      SELECT g.k, g.d, coalesce(hc.c, 0.0) AS c
      FROM grid g LEFT JOIN hc ON hc.k = g.k AND hc.day = g.lo + g.d
    ),
    series AS (SELECT k, list(c ORDER BY d) AS xs FROM dense GROUP BY 1),
    {chain}
    SELECT k AS event_type,
           round(l, 6) + 0.0 AS level, round(b, 6) + 0.0 AS trend,
           round(l + 1 * b, 6) + 0.0 AS f1,
           round(l + 2 * b, 6) + 0.0 AS f2,
           round(l + 3 * b, 6) + 0.0 AS f3
    FROM {last}
    """
    return f"""
    WITH hc AS (
      SELECT epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(day) AS lo FROM hc),
    grid AS (SELECT unnest(generate_series(0, {T - 1})) AS d, lo FROM bounds),
    dense AS (
      SELECT g.d, coalesce(hc.c, 0.0) AS c
      FROM grid g LEFT JOIN hc ON hc.day = g.lo + g.d
    ),
    series AS (SELECT list(c ORDER BY d) AS xs FROM dense),
    {chain}
    SELECT round(l, 6) + 0.0 AS level, round(b, 6) + 0.0 AS trend,
           round(l + 1 * b, 6) + 0.0 AS f1,
           round(l + 2 * b, 6) + 0.0 AS f2,
           round(l + 3 * b, 6) + 0.0 AS f3
    FROM {last}
    """


@query("q273_holt_linear", oracle=_q273_holt_oracle())
def q273_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's LINEAR exponential smoothing (alpha=0.5, gamma=0.3) over the
    first 30 days of daily event counts, with 1/2/3-step-ahead forecasts —
    the workload-forecasting family (reference M1-M3) brought INSIDE the
    hash-checked gate: the sequential level/trend recursion folds in ONE
    codegen `aggregate` over the day array engine-side, and the oracle
    replays the identical recursion as a generated 30-step CTE chain, so
    the smoothed state matches digit-for-digit (same float ops, same
    order). Complements the seasonal-naive backtest (q270): that scores a
    baseline, this certifies a real smoother.

    100 TB story: the input is the O(days) aggregate of the fact table
    (map-side rollup); the fold is a single-row array operation. Per-key
    smoothing (millions of series) is the same fold grouped by key.
    """
    e = _t(spark, sf_dir, "events")
    T, a, g = 30, 0.5, 0.3
    hc = e.groupBy(F.expr("(ts div 1000000000) div 86400").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    b = hc.agg(F.min("day").alias("lo"))
    grid = b.select(F.explode(F.sequence(F.lit(0), F.lit(T - 1))).alias("d"), "lo")
    dense = grid.join(hc, grid.lo + grid.d == hc.day, "left").select(
        "d", F.coalesce("c", F.lit(0.0)).alias("c")
    )
    series = dense.agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).getField("c").alias("xs")
    )
    # seed on (x1, x2-x1), then fold steps t=2..T over xs[2..T] — the
    # oracle's h1/h2..h30 chain in one codegen aggregate
    state = F.aggregate(
        F.slice("xs", 2, T - 1),
        F.struct(
            (F.col("xs")[0]).alias("l"),
            (F.col("xs")[1] - F.col("xs")[0]).alias("b"),
        ),
        lambda acc, x: F.struct(
            (F.lit(a) * x + F.lit(1 - a) * (acc["l"] + acc["b"])).alias("l"),
            (
                F.lit(g)
                * (F.lit(a) * x + F.lit(1 - a) * (acc["l"] + acc["b"]) - acc["l"])
                + F.lit(1 - g) * acc["b"]
            ).alias("b"),
        ),
    )
    out = series.select(state.alias("st"))
    return out.select(
        (F.round(F.col("st.l"), 6) + F.lit(0.0)).alias("level"),
        (F.round(F.col("st.b"), 6) + F.lit(0.0)).alias("trend"),
        (F.round(F.col("st.l") + 1 * F.col("st.b"), 6) + F.lit(0.0)).alias("f1"),
        (F.round(F.col("st.l") + 2 * F.col("st.b"), 6) + F.lit(0.0)).alias("f2"),
        (F.round(F.col("st.l") + 3 * F.col("st.b"), 6) + F.lit(0.0)).alias("f3"),
    )


@query("q274_holt_by_key", oracle=_q273_holt_oracle(keyed=True))
def q274_holt_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q273's Holt smoother GROUPED — one level/trend fold per event_type
    series, certifying the 'millions of series' claim: the recursion is a
    per-row array fold, so smoothing N keys is one groupBy + the same
    codegen aggregate, no per-series driver loop, no iteration joins. The
    generated oracle chain runs row-wise, so it certifies every key's
    recursion in the same pass.

    100 TB story: per-key daily rollup (map-side) -> per-key array
    (one shuffle on the key) -> embarrassingly parallel folds.
    """
    e = _t(spark, sf_dir, "events")
    T, a, g = 30, 0.5, 0.3
    hc = (
        e.groupBy(
            F.col("event_type").alias("k"),
            F.expr("(ts div 1000000000) div 86400").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    lo = hc.agg(F.min("day").alias("lo"))
    keys = hc.select("k").distinct()
    grid = keys.crossJoin(
        F.broadcast(
            lo.select(F.explode(F.sequence(F.lit(0), F.lit(T - 1))).alias("d"), "lo")
        )
    )
    dense = grid.join(
        hc, (grid.k == hc.k) & (grid.lo + grid.d == hc.day), "left"
    ).select(grid.k, grid.d, F.coalesce("c", F.lit(0.0)).alias("c"))
    series = dense.groupBy("k").agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).getField("c").alias("xs")
    )
    state = F.aggregate(
        F.slice("xs", 2, T - 1),
        F.struct(
            (F.col("xs")[0]).alias("l"),
            (F.col("xs")[1] - F.col("xs")[0]).alias("b"),
        ),
        lambda acc, x: F.struct(
            (F.lit(a) * x + F.lit(1 - a) * (acc["l"] + acc["b"])).alias("l"),
            (
                F.lit(g)
                * (F.lit(a) * x + F.lit(1 - a) * (acc["l"] + acc["b"]) - acc["l"])
                + F.lit(1 - g) * acc["b"]
            ).alias("b"),
        ),
    )
    out = series.select(F.col("k").alias("event_type"), state.alias("st"))
    return out.select(
        "event_type",
        (F.round(F.col("st.l"), 6) + F.lit(0.0)).alias("level"),
        (F.round(F.col("st.b"), 6) + F.lit(0.0)).alias("trend"),
        (F.round(F.col("st.l") + 1 * F.col("st.b"), 6) + F.lit(0.0)).alias("f1"),
        (F.round(F.col("st.l") + 2 * F.col("st.b"), 6) + F.lit(0.0)).alias("f2"),
        (F.round(F.col("st.l") + 3 * F.col("st.b"), 6) + F.lit(0.0)).alias("f3"),
    )


@query("q275_streaming_holt_drain", oracle=_q273_holt_oracle(keyed=True))
def q275_streaming_holt_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Holt smoothing drained in the hash-checked gate — the
    q273/q274 recursion as a stateful operator
    (:func:`stateful.streaming_holt`): the per-key daily series arrives
    as three sequence-ordered micro-batches (days 0-9, 10-19, 20-29), the
    (level, trend) state folds ACROSS batches, and the final state must
    match the generated 30-step CTE-chain oracle digit-for-digit. One
    smoother, three execution forms, one answer: batch array fold (q273),
    grouped fold (q274), cross-batch stateful stream (this) — the
    strongest equivalence class in the registry.

    Scale: state is 4 scalars per key; each micro-batch does O(new rows)
    work — the streaming form is how a million series smooth INCREMENTALLY
    every day without re-reading history.
    """
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming.stateful import streaming_holt

    e = _t(spark, sf_dir, "events")
    T, a, g = 30, 0.5, 0.3
    hc = (
        e.groupBy(
            F.col("event_type").alias("k"),
            F.expr("(ts div 1000000000) div 86400").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    lo = hc.agg(F.min("day").alias("lo"))
    keys = hc.select("k").distinct()
    grid = keys.crossJoin(
        F.broadcast(
            lo.select(F.explode(F.sequence(F.lit(0), F.lit(T - 1))).alias("d"), "lo")
        )
    )
    dense = grid.join(
        hc, (grid.k == hc.k) & (grid.lo + grid.d == hc.day), "left"
    ).select(grid.k, grid.d.cast("int").alias("d"), F.coalesce("c", F.lit(0.0)).alias("c"))

    work = tempfile.mkdtemp(prefix="q275_")
    src_dir = f"{work}/src"
    try:
        os.makedirs(src_dir)
        for i, (d_lo, d_hi) in enumerate(((0, 10), (10, 20), (20, 30)), start=1):
            part = dense.filter((F.col("d") >= d_lo) & (F.col("d") < d_hi))
            part.coalesce(1).write.parquet(f"{work}/stage{i}")
            pf = glob.glob(f"{work}/stage{i}/part-*.parquet")[0]
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(pf, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("k STRING, d INT, c DOUBLE")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = streaming_holt(stream, alpha=a, gamma=g, key_col="k")
        sink = f"{work}/holt"
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda bdf, _bid: bdf.write.mode("append").parquet(sink))
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "q275: streaming Holt drain did not finish within 300 s — "
                "refusing to report a partial smooth"
            )
        states = spark.read.parquet(sink)
        final = (
            states.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("key").orderBy(F.col("n").desc())
                ),
            )
            .filter(F.col("rk") == 1)
            .select(
                F.col("key").alias("event_type"),
                (F.round("level", 6) + F.lit(0.0)).alias("level"),
                (F.round("trend", 6) + F.lit(0.0)).alias("trend"),
                (F.round(F.col("level") + 1 * F.col("trend"), 6) + F.lit(0.0)).alias("f1"),
                (F.round(F.col("level") + 2 * F.col("trend"), 6) + F.lit(0.0)).alias("f2"),
                (F.round(F.col("level") + 3 * F.col("trend"), 6) + F.lit(0.0)).alias("f3"),
            )
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)

# ---------------------------------------------------------------------------
# Round 7: QoS / operations analytics (the reference's own domain — QoS-aware
# stream processing per arXiv 2206.09679 — expressed as oracle-certified
# batch analytics over the events/orders streams)
# ---------------------------------------------------------------------------


@query(
    "q276_slo_burn_rate",
    oracle="""
    WITH h AS (
      SELECT epoch_ns(ts) // 1000000000 // 3600 AS hr,
             count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs
      FROM events GROUP BY 1
    ),
    b AS (
      SELECT hr, n, errs,
             (errs * 1.0 / n) / 0.2 AS bs,
             (sum(errs) OVER w * 1.0 / sum(n) OVER w) / 0.2 AS bl
      FROM h
      WINDOW w AS (ORDER BY hr RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT hr, n, errs,
           round(bs, 6) AS burn_short,
           round(bl, 6) AS burn_long,
           CASE WHEN bs > 1.5 AND bl > 1.1 THEN 1 ELSE 0 END AS page
    FROM b
    """,
)
def q276_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO error-budget burn rate (Google SRE workbook ch.5)
    over the events stream — the alerting arithmetic a QoS controller like
    the reference's (latency-SLO-driven rescaling, phoebe §III) runs on its
    own metrics. SLO = 80% non-error; burn = error_rate / budget. A page
    fires only when BOTH the 1 h window burns > 1.5x AND the trailing 6 h
    window burns > 1.1x — the two-window AND that suppresses blips but
    catches sustained burns.

    The 6 h window is a RANGE frame over the hour number, so missing hours
    shorten the window identically in both engines (no dense fill needed).

    100 TB story: one map-side hourly rollup of the fact stream, then a
    single O(hours-in-span) ordered window — the window input is
    SF-independent (720 rows per month regardless of event volume).
    """
    e = _t(spark, sf_dir, "events")
    h = e.groupBy(F.expr("(ts div 1000000000) div 3600").alias("hr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errs"),
    )
    w = Window.orderBy("hr").rangeBetween(-5, 0)
    b = h.select(
        "hr",
        "n",
        "errs",
        ((F.col("errs") * 1.0 / F.col("n")) / 0.2).alias("bs"),
        ((F.sum("errs").over(w) * 1.0 / F.sum("n").over(w)) / 0.2).alias("bl"),
    )
    return b.select(
        "hr",
        "n",
        "errs",
        F.round("bs", 6).alias("burn_short"),
        F.round("bl", 6).alias("burn_long"),
        F.when((F.col("bs") > 1.5) & (F.col("bl") > 1.1), 1).otherwise(0).alias("page"),
    )


@query(
    "q277_littles_law_audit",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             datediff('day', DATE '1970-01-01', o_orderdate) AS aday,
             greatest(datediff('day', DATE '1970-01-01', o_orderdate),
                      max(datediff('day', DATE '1970-01-01', l_shipdate)) + 1) AS cday
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    bounds AS (SELECT min(aday) AS d0, max(cday) AS d1 FROM o),
    grid AS (SELECT unnest(generate_series(b.d0, b.d1)) AS d, b.d0 FROM bounds b),
    arr AS (SELECT aday AS d, count(*) AS a FROM o GROUP BY 1),
    comp AS (SELECT cday AS d, count(*) AS c FROM o GROUP BY 1),
    wip AS (
      SELECT g.d, g.d0,
             sum(coalesce(arr.a, 0)) OVER (ORDER BY g.d) -
             sum(coalesce(comp.c, 0)) OVER (ORDER BY g.d) AS l
      FROM grid g LEFT JOIN arr ON arr.d = g.d LEFT JOIN comp ON comp.d = g.d
    ),
    wk_wip AS (
      SELECT (d - d0) // 7 AS wk, avg(l) AS avg_wip
      FROM wip GROUP BY 1
    ),
    wk_arr AS (
      SELECT (o.aday - b.d0) // 7 AS wk,
             count(*) / 7.0 AS lam,
             avg(o.cday - o.aday) AS mean_w
      FROM o, bounds b GROUP BY 1
    )
    SELECT a.wk,
           round(w.avg_wip, 6) AS avg_wip,
           round(a.lam, 6) AS lam,
           round(a.mean_w, 6) AS mean_w,
           round(a.lam * a.mean_w, 6) AS pred_l,
           round(w.avg_wip - a.lam * a.mean_w, 6) AS resid
    FROM wk_arr a JOIN wk_wip w ON w.wk = a.wk
    """,
)
def q277_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law audit (L = λW) of the order-fulfilment pipeline — the
    queueing identity the reference's capacity model (phoebe §IV: latency
    vs utilisation) rests on, checked empirically: per week, average
    work-in-progress (orders placed, not yet fully shipped) is compared
    against arrival-rate × mean-flow-time, and the residual reported.
    An order's completion day is its last lineitem ship day + 1, clamped
    to >= the arrival day (the synthetic corpus has ship dates before
    order dates; clamped intervals contribute zero flow time).

    WIP is NOT computed with an interval join: on a daily grid it is
    cumulative-arrivals minus cumulative-completions — two O(span)
    ordered windows over day-grouped counts, so the expensive
    interval-containment join is avoided entirely.

    100 TB story: the per-day rollups are map-side combines of the two
    fact scans; the grid is O(calendar-span) rows independent of SF, and
    every float here is an exact int-sum divide — no accumulation-order
    sensitivity.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    od = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("aday"),
        )
        .agg(
            F.greatest(
                F.col("aday"),
                F.max(F.datediff("l_shipdate", F.lit("1970-01-01")).cast("long")) + 1,
            ).alias("cday")
        )
    )
    bounds = od.agg(F.min("aday").alias("d0"), F.max("cday").alias("d1"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d"), "d0"
    )
    arr = od.groupBy(F.col("aday").alias("d")).agg(F.count(F.lit(1)).alias("a"))
    comp = od.groupBy(F.col("cday").alias("d")).agg(F.count(F.lit(1)).alias("c"))
    wg = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wip = (
        grid.join(arr, "d", "left")
        .join(comp, "d", "left")
        .select(
            "d",
            "d0",
            (
                F.sum(F.coalesce("a", F.lit(0))).over(wg)
                - F.sum(F.coalesce("c", F.lit(0))).over(wg)
            ).alias("l"),
        )
    )
    wk_wip = wip.groupBy(F.expr("(d - d0) div 7").alias("wk")).agg(
        F.avg("l").alias("avg_wip")
    )
    wk_arr = (
        od.crossJoin(F.broadcast(bounds))
        .groupBy(F.expr("(aday - d0) div 7").alias("wk"))
        .agg(
            (F.count(F.lit(1)) / 7.0).alias("lam"),
            F.avg(F.col("cday") - F.col("aday")).alias("mean_w"),
        )
    )
    return wk_arr.join(wk_wip, "wk").select(
        "wk",
        F.round("avg_wip", 6).alias("avg_wip"),
        F.round("lam", 6).alias("lam"),
        F.round("mean_w", 6).alias("mean_w"),
        F.round(F.col("lam") * F.col("mean_w"), 6).alias("pred_l"),
        F.round(F.col("avg_wip") - F.col("lam") * F.col("mean_w"), 6).alias("resid"),
    )


def _q278_rescale_oracle(T: int = 30, cap: int = 12) -> str:
    """Generated oracle for q278: the rescale-decision recursion unrolled
    as one CTE per day (the q273 Holt treatment applied to the reference's
    control loop). All-integer arithmetic, so the chain is exact."""
    ctes = [
        "s1 AS (SELECT 1 AS t, xs[1] AS c, (xs[1] + "
        f"{cap - 1}) // {cap} AS target, (xs[1] + {cap - 1}) // {cap} AS par, "
        "0 AS rescaled, xs FROM series)"
    ]
    for t in range(2, T + 1):
        tgt = f"(xs[{t - 1}] + {cap - 1}) // {cap}"
        ctes.append(
            f"s{t} AS (SELECT {t} AS t, xs[{t}] AS c, {tgt} AS target, "
            f"CASE WHEN abs({tgt} - par) >= 2 THEN {tgt} ELSE par END AS par, "
            f"CASE WHEN abs({tgt} - par) >= 2 THEN 1 ELSE 0 END AS rescaled, "
            f"xs FROM s{t - 1})"
        )
    chain = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(
        f"SELECT t, c, target, par, rescaled FROM s{t}" for t in range(1, T + 1)
    )
    return f"""
    WITH dc AS (
      SELECT epoch_ns(ts) // 1000000000 // 86400 AS day, count(*) AS c
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(day) AS lo FROM dc),
    grid AS (SELECT unnest(generate_series(0, {T - 1})) AS d, lo FROM bounds),
    dense AS (
      SELECT g.d, coalesce(dc.c, 0) AS c
      FROM grid g LEFT JOIN dc ON dc.day = g.lo + g.d
    ),
    series AS (SELECT list(c ORDER BY d) AS xs FROM dense),
    {chain}
    {union}
    """


@query("q278_rescale_replay", oracle=_q278_rescale_oracle())
def q278_rescale_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay of the reference's core control loop — forecast-driven
    rescaling with hysteresis (phoebe §III: predict the workload, size the
    parallelism, suppress sub-threshold rescales because a rescale costs a
    savepoint-restore) — as an oracle-certified recursion. Per day t:
    target_t = ceil(prev-day count / 12) and the running parallelism only
    moves when |target - current| >= 2. All-integer, so the engine fold
    and the generated 30-step CTE chain agree exactly, not just to 6 dp.

    Engine side the recursion is ONE codegen `aggregate` fold over the
    dense day array (no iteration joins, no driver loop); the decision
    sequence is then posexploded back to rows.

    100 TB story: input is the O(days) map-side rollup of the event
    stream; the fold is a single-row array op. Replaying one controller
    per pipeline (thousands of keys) is the q274 grouped-fold shape.
    """
    e = _t(spark, sf_dir, "events")
    T, cap = 30, 12
    dc = e.groupBy(F.expr("(ts div 1000000000) div 86400").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    lo = dc.agg(F.min("day").alias("lo"))
    grid = lo.select(F.explode(F.sequence(F.lit(0), F.lit(T - 1))).alias("d"), "lo")
    dense = grid.join(dc, grid.lo + grid.d == dc.day, "left").select(
        "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    series = dense.agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).getField("c").alias("xs")
    )
    first = F.struct(
        F.lit(1).alias("t"),
        F.col("xs")[0].alias("c"),
        ((F.col("xs")[0] + (cap - 1)) / cap).cast("long").alias("target"),
        ((F.col("xs")[0] + (cap - 1)) / cap).cast("long").alias("par"),
        F.lit(0).alias("rescaled"),
    )
    # fold t=2..T: target from the PREVIOUS day's count, hysteresis >= 2
    def step(acc, t):
        prev = F.element_at(acc, -1)
        tgt = F.floor((F.element_at(F.col("xs"), (t - 1).cast("int")) + (cap - 1)) / cap)
        move = F.abs(tgt - prev["par"]) >= 2
        return F.concat(
            acc,
            F.array(
                F.struct(
                    t.cast("int").alias("t"),
                    F.element_at(F.col("xs"), t.cast("int")).alias("c"),
                    tgt.alias("target"),
                    F.when(move, tgt).otherwise(prev["par"]).alias("par"),
                    F.when(move, 1).otherwise(0).alias("rescaled"),
                )
            ),
        )

    decisions = series.select(
        F.aggregate(
            F.sequence(F.lit(2), F.lit(T)), F.array(first), step
        ).alias("steps")
    )
    return decisions.select(F.explode("steps").alias("s")).select(
        F.col("s.t").alias("t"),
        F.col("s.c").alias("c"),
        F.col("s.target").alias("target"),
        F.col("s.par").alias("par"),
        F.col("s.rescaled").alias("rescaled"),
    )


@query(
    "q279_roc_auc",
    oracle="""
    WITH s AS (
      SELECT l_linestatus AS grp,
             CAST(round(l_discount * 100) AS BIGINT) * 10
               + CAST(round(l_tax * 100) AS BIGINT) AS s,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    g AS (
      SELECT grp, s, count(*) AS n_s,
             CAST(sum(y) AS BIGINT) AS p_s
      FROM s GROUP BY 1, 2
    ),
    r AS (
      SELECT grp, s, n_s, p_s,
             coalesce(sum(n_s) OVER (PARTITION BY grp ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM g
    ),
    a AS (
      SELECT grp,
             CAST(sum(p_s) AS BIGINT) AS p,
             CAST(sum(n_s - p_s) AS BIGINT) AS n,
             sum(p_s * (before + (n_s + 1) / 2.0)) AS pos_rank_sum
      FROM r GROUP BY 1
    )
    SELECT grp, p, n,
           round((pos_rank_sum - p * (p + 1) / 2.0) / (p * n), 6) AS auc,
           round(2 * ((pos_rank_sum - p * (p + 1) / 2.0) / (p * n)) - 1, 6) AS gini
    FROM a
    """,
)
def q279_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based ROC-AUC (Mann-Whitney U with average-rank tie handling)
    per linestatus: label = returned flag, score = the discretised
    discount/tax signal. The textbook formula needs a global rank over all
    rows; here ranks are reconstructed from per-DISTINCT-SCORE counts —
    cum-before + (n_s+1)/2 is each tie group's average rank — so the
    ordered window runs over the score VOCABULARY (~100 rows), not the
    fact table. A near-0.5 AUC is the correct answer for this synthetic
    corpus (returnflag is independent of discount/tax); the tie-heavy
    score makes the average-rank path the thing being certified.

    100 TB story: one map-side-combining groupBy(grp, score), then an
    O(|scores|) window; rank sums are integer-exact in doubles (< 2^52),
    so partial-aggregation order cannot move the hash.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_linestatus").alias("grp"),
        (
            F.round(F.col("l_discount") * 100).cast("long") * 10
            + F.round(F.col("l_tax") * 100).cast("long")
        ).alias("s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("grp", "s").agg(
        F.count(F.lit(1)).alias("n_s"), F.sum("y").cast("long").alias("p_s")
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn("before", F.coalesce(F.sum("n_s").over(w), F.lit(0)))
    a = r.groupBy("grp").agg(
        F.sum("p_s").cast("long").alias("p"),
        F.sum(F.col("n_s") - F.col("p_s")).cast("long").alias("n"),
        F.sum(F.col("p_s") * (F.col("before") + (F.col("n_s") + 1) / 2.0)).alias(
            "pos_rank_sum"
        ),
    )
    auc = (F.col("pos_rank_sum") - F.col("p") * (F.col("p") + 1) / 2.0) / (
        F.col("p") * F.col("n")
    )
    return a.select(
        "grp",
        "p",
        "n",
        F.round(auc, 6).alias("auc"),
        F.round(2 * auc - 1, 6).alias("gini"),
    )


@query(
    "q280_calibration_bins",
    oracle="""
    WITH s AS (
      SELECT least(CAST(round(l_discount * 100) AS BIGINT), 9) AS bin,
             l_discount * 10 AS conf,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    b AS (
      SELECT bin, count(*) AS n,
             avg(conf) AS conf_mean,
             CAST(sum(y) AS BIGINT) * 1.0 / count(*) AS acc
      FROM s GROUP BY 1
    )
    SELECT bin, n,
           round(conf_mean, 6) AS conf_mean,
           round(acc, 6) AS acc,
           round(acc - conf_mean, 6) AS gap,
           round(abs(acc - conf_mean) * n / (sum(n) OVER ()), 6) AS ece_term
    FROM b
    """,
)
def q280_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram / expected-calibration-error bins: treat the
    scaled discount as a predicted probability of return and compare each
    decile bin's mean confidence against its empirical accuracy; `ece_term`
    is the bin's weighted contribution, so sum(ece_term) IS the ECE. The
    honest result for this corpus is a strongly mis-calibrated "model"
    (acc ~ 1/3 in every bin) — the operator, not the model, is under test.

    Bin ids are computed with integer arithmetic on round(discount*100)
    (floor of the float product would be representation-sensitive at the
    0.0x boundaries; the integer detour is exact in both engines).

    100 TB story: one map-side-combining groupBy into <= 10 bins; the
    window for the ECE weight runs over 10 rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.least(
            F.round(F.col("l_discount") * 100).cast("long"),
            F.lit(9).cast("long"),
        ).alias("bin"),
        (F.col("l_discount") * 10).alias("conf"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("conf").alias("conf_mean"),
        (F.sum("y").cast("long") * 1.0 / F.count(F.lit(1))).alias("acc"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return b.select(
        "bin",
        "n",
        F.round("conf_mean", 6).alias("conf_mean"),
        F.round("acc", 6).alias("acc"),
        F.round(F.col("acc") - F.col("conf_mean"), 6).alias("gap"),
        F.round(
            F.abs(F.col("acc") - F.col("conf_mean"))
            * F.col("n")
            / F.sum("n").over(wall),
            6,
        ).alias("ece_term"),
    )


@query(
    "q281_ab_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(user_id % 2 AS INT) AS arm,
             value AS v
      FROM events
    ),
    g AS (
      SELECT event_type,
             count(*) FILTER (WHERE arm = 0) AS n0,
             count(*) FILTER (WHERE arm = 1) AS n1,
             avg(v) FILTER (WHERE arm = 0) AS m0,
             avg(v) FILTER (WHERE arm = 1) AS m1,
             var_samp(v) FILTER (WHERE arm = 0) AS v0,
             var_samp(v) FILTER (WHERE arm = 1) AS v1
      FROM s GROUP BY 1
    )
    SELECT event_type, n0, n1,
           round(m0, 6) AS mean_a,
           round(m1, 6) AS mean_b,
           round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 6) AS t_stat,
           round(pow(v0 / n0 + v1 / n1, 2)
                 / (pow(v0 / n0, 2) / (n0 - 1) + pow(v1 / n1, 2) / (n1 - 1)),
                 6) AS df,
           CASE WHEN abs((m0 - m1) / sqrt(v0 / n0 + v1 / n1)) > 1.96
                THEN 1 ELSE 0 END AS significant
    FROM g
    """,
)
def q281_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test per event type over a
    deterministic A/B split (user_id parity — hash-stable, no RNG), with
    the Welch-Satterthwaite degrees of freedom. The |t|>1.96 flag is the
    normal-approximation decision at alpha=0.05; by construction the arms
    are exchangeable, so ~0 significant rows is the correct answer and a
    nonzero t certifies only the arithmetic. Means/variances of ~2k
    doubles carry O(1e-12) accumulation-order noise — far below the 6 dp
    rounding.

    100 TB story: one map-side-combining groupBy(event_type) computing
    both arms' moments in a single pass (conditional aggregation, no
    self-join of the two arms).
    """
    e = _t(spark, sf_dir, "events")
    s = e.select(
        "event_type", (F.col("user_id") % 2).cast("int").alias("arm"), F.col("value").alias("v")
    )
    g = s.groupBy("event_type").agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
        F.avg(F.when(F.col("arm") == 0, F.col("v"))).alias("m0"),
        F.avg(F.when(F.col("arm") == 1, F.col("v"))).alias("m1"),
        F.var_samp(F.when(F.col("arm") == 0, F.col("v"))).alias("v0"),
        F.var_samp(F.when(F.col("arm") == 1, F.col("v"))).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    t = (F.col("m0") - F.col("m1")) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
    )
    return g.select(
        "event_type",
        "n0",
        "n1",
        F.round("m0", 6).alias("mean_a"),
        F.round("m1", 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("df"),
        F.when(F.abs(t) > 1.96, 1).otherwise(0).alias("significant"),
    )


@query(
    "q282_kaplan_meier",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             datediff('day', DATE '1970-01-01', o_orderdate) AS d
      FROM orders
    ),
    mx AS (SELECT max(d) AS dmax FROM o),
    g AS (
      SELECT o_custkey, d,
             lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS nd
      FROM o
    ),
    dur AS (
      SELECT CASE WHEN nd IS NULL THEN (SELECT dmax FROM mx) - d
                  ELSE nd - d END AS t,
             CASE WHEN nd IS NULL THEN 0 ELSE 1 END AS ev
      FROM g
    ),
    byt AS (
      SELECT t, count(*) AS n_all, CAST(sum(ev) AS BIGINT) AS d_ev
      FROM dur GROUP BY 1
    ),
    risk AS (
      SELECT t, d_ev,
             CAST(sum(n_all) OVER () -
             coalesce(sum(n_all) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      FROM byt
    ),
    ev AS (SELECT t, n_risk, d_ev FROM risk WHERE d_ev > 0),
    km AS (
      SELECT t, n_risk, d_ev,
             sum(CASE WHEN d_ev < n_risk
                      THEN ln(1 - d_ev * 1.0 / n_risk) END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lnsum,
             max(CASE WHEN d_ev >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS zs
      FROM ev
    )
    SELECT t, n_risk, d_ev AS d,
           round(CASE WHEN zs = 1 THEN 0.0 ELSE exp(coalesce(lnsum, 0.0)) END, 6)
             AS survival
    FROM km
    """,
)
def q282_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over customer reorder gaps: each
    consecutive-order gap is an observed event, the tail from a customer's
    last order to the corpus end is right-censored (censored subjects
    leave the risk set without stepping the curve — the thing that
    distinguishes KM from a plain ECDF). S(t) steps only at event times:
    S = prod(1 - d_i/n_i), computed as exp of a running ln-sum over the
    O(distinct gap) event-time rows, with the d==n full-absorption edge
    handled by a cumulative zero flag (Spark's ln(0) is NULL, DuckDB's is
    -inf — the CASE keeps both engines on the same finite path).

    100 TB story: durations come from one lead() pass partitioned by
    customer (shuffle on the key); everything after is grouped by gap
    VALUE — O(distinct days) rows, SF-independent — so the ordered
    windows never see the fact table.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("d"),
    )
    dmax = o.agg(F.max("d").alias("dmax"))
    g = o.withColumn(
        "nd",
        F.lead("d").over(
            Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
        ),
    )
    dur = g.crossJoin(F.broadcast(dmax)).select(
        F.when(F.col("nd").isNull(), F.col("dmax") - F.col("d"))
        .otherwise(F.col("nd") - F.col("d"))
        .alias("t"),
        F.when(F.col("nd").isNull(), 0).otherwise(1).alias("ev"),
    )
    byt = dur.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("ev").cast("long").alias("d_ev")
    )
    wtot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wbef = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = byt.select(
        "t",
        "d_ev",
        (
            F.sum("n_all").over(wtot)
            - F.coalesce(F.sum("n_all").over(wbef), F.lit(0))
        ).alias("n_risk"),
    ).filter(F.col("d_ev") > 0)
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    km = risk.select(
        "t",
        "n_risk",
        "d_ev",
        F.sum(
            F.when(
                F.col("d_ev") < F.col("n_risk"),
                F.log(1 - F.col("d_ev") * 1.0 / F.col("n_risk")),
            )
        )
        .over(wc)
        .alias("lnsum"),
        F.max(F.when(F.col("d_ev") >= F.col("n_risk"), 1).otherwise(0))
        .over(wc)
        .alias("zs"),
    )
    return km.select(
        "t",
        "n_risk",
        F.col("d_ev").alias("d"),
        F.round(
            F.when(F.col("zs") == 1, 0.0).otherwise(
                F.exp(F.coalesce(F.col("lnsum"), F.lit(0.0)))
            ),
            6,
        ).alias("survival"),
    )


@query(
    "q283_hll_distinct",
    oracle="""
    WITH base AS (
      SELECT lang AS grp, doc_id FROM documents
      UNION ALL
      SELECT 'ALL' AS grp, doc_id FROM documents
    ),
    h0 AS (SELECT grp, doc_id, doc_id % 4294967296 AS a FROM base),
    h1 AS (SELECT grp, doc_id,
                  (xor(a >> 16, a) * 73244475) % 4294967296 AS a FROM h0),
    h2 AS (SELECT grp, doc_id,
                  (xor(a >> 16, a) * 73244475) % 4294967296 AS a FROM h1),
    h AS (SELECT grp, doc_id, xor(a >> 16, a) AS hv FROM h2),
    rho AS (
      SELECT grp, doc_id, hv % 64 AS idx,
             CASE WHEN hv // 64 = 0 THEN 27
                  ELSE 27 - length(bin(hv // 64)) END AS r,
             doc_id % 2 AS half
      FROM h
    ),
    regs AS (
      SELECT grp, idx, max(r) AS m FROM rho GROUP BY 1, 2
    ),
    regs_h AS (
      SELECT grp, half, idx, max(r) AS m FROM rho GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT grp, idx, max(m) AS m FROM regs_h GROUP BY 1, 2
    ),
    est AS (
      SELECT grp,
             0.709 * 64 * 64 /
               (sum(1.0 / (CAST(1 AS BIGINT) << m)) + (64 - count(*))) AS e_raw,
             64 - count(*) AS v
      FROM regs GROUP BY 1
    ),
    est_m AS (
      SELECT grp,
             0.709 * 64 * 64 /
               (sum(1.0 / (CAST(1 AS BIGINT) << m)) + (64 - count(*))) AS e_raw,
             64 - count(*) AS v
      FROM merged GROUP BY 1
    ),
    fin AS (
      SELECT grp,
             CASE WHEN e_raw <= 160 AND v > 0 THEN 64 * ln(64.0 / v)
                  ELSE e_raw END AS e
      FROM est
    ),
    fin_m AS (
      SELECT grp,
             CASE WHEN e_raw <= 160 AND v > 0 THEN 64 * ln(64.0 / v)
                  ELSE e_raw END AS e
      FROM est_m
    ),
    ex AS (SELECT grp, count(DISTINCT doc_id) AS n_exact FROM base GROUP BY 1)
    SELECT ex.grp, ex.n_exact,
           round(fin.e, 6) AS est,
           round(fin_m.e, 6) AS est_merged,
           round(abs(fin.e - ex.n_exact) / ex.n_exact, 6) AS rel_err,
           CASE WHEN fin.e = fin_m.e THEN 1 ELSE 0 END AS merge_exact
    FROM ex JOIN fin ON fin.grp = ex.grp JOIN fin_m ON fin_m.grp = ex.grp
    """,
)
def q283_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog (p=6, m=64 registers, Flajolet et al.
    2007 incl. the small-range linear-counting correction) per language
    plus an 'ALL' rollup — the canonical mergeable-sketch distinct count,
    joining the KMV (q154/q202), CMS (q141), Bloom (q73) and MinHash
    (q244) sketch family. The hash is the degski 32-bit avalanche mixer
    (two xor-shift-multiply rounds; the multiplier is < 2^27 so every
    intermediate fits a BIGINT under ANSI overflow checks — and a plain
    multiplicative hash demonstrably FAILS here: on sequential ids its
    rho distribution is non-geometric and the estimate lands 78% high);
    register rank rho comes
    from the binary-string length of the remaining 26 bits (`bin()` —
    float log2 would be representation-sensitive at power-of-two
    boundaries). 2^-M is an exact bigint shift, and a sum of powers of
    two spanning <= 27 bits is EXACT in a double, so the harmonic mean is
    accumulation-order-independent — the property that makes an HLL hash
    safe to certify. The parity-split/merge path (register max of two
    half-sketches) must reproduce the full sketch bit-for-bit
    (`merge_exact`), certifying the distributed-union operator.

    100 TB story: a sketch build is one map-side-combining groupBy to
    m * groups rows; merges are register-max — the shape that counts
    distincts over a 100 TB corpus in one pass with O(m) state.
    """
    d = _t(spark, sf_dir, "documents")
    base = d.select(F.col("lang").alias("grp"), "doc_id").unionAll(
        d.select(F.lit("ALL").alias("grp"), "doc_id")
    )
    rho = (
        base.select(
            "grp", "doc_id", F.expr("doc_id % 4294967296").alias("a")
        )
        .select(
            "grp",
            "doc_id",
            F.expr("((shiftright(a, 16) ^ a) * 73244475) % 4294967296").alias("a"),
        )
        .select(
            "grp",
            "doc_id",
            F.expr("((shiftright(a, 16) ^ a) * 73244475) % 4294967296").alias("a"),
        )
        .select(
            "grp",
            "doc_id",
            (F.col("doc_id") % 2).alias("half"),
            F.expr("shiftright(a, 16) ^ a").alias("hv"),
        )
    ).select(
        "grp",
        "doc_id",
        "half",
        (F.col("hv") % 64).alias("idx"),
        F.when(F.expr("hv div 64") == 0, 27)
        .otherwise(27 - F.length(F.bin(F.expr("hv div 64"))))
        .alias("r"),
    )
    regs = rho.groupBy("grp", "idx").agg(F.max("r").alias("m"))
    regs_h = rho.groupBy("grp", "half", "idx").agg(F.max("r").alias("m"))
    merged = regs_h.groupBy("grp", "idx").agg(F.max("m").alias("m"))

    def estimate(rdf: DataFrame) -> DataFrame:
        e = rdf.groupBy("grp").agg(
            (
                F.lit(0.709 * 64 * 64)
                / (
                    F.sum(F.expr("1.0 / cast(shiftleft(1L, m) as double)"))
                    + (64 - F.count(F.lit(1)))
                )
            ).alias("e_raw"),
            (64 - F.count(F.lit(1))).alias("v"),
        )
        return e.select(
            "grp",
            F.when(
                (F.col("e_raw") <= 160) & (F.col("v") > 0),
                64 * F.log(64.0 / F.col("v")),
            )
            .otherwise(F.col("e_raw"))
            .alias("e"),
        )

    fin = estimate(regs)
    fin_m = estimate(merged).withColumnRenamed("e", "em")
    ex = base.groupBy("grp").agg(F.countDistinct("doc_id").alias("n_exact"))
    return (
        ex.join(fin, "grp")
        .join(fin_m, "grp")
        .select(
            "grp",
            "n_exact",
            F.round("e", 6).alias("est"),
            F.round("em", 6).alias("est_merged"),
            F.round(F.abs(F.col("e") - F.col("n_exact")) / F.col("n_exact"), 6).alias(
                "rel_err"
            ),
            F.when(F.col("e") == F.col("em"), 1).otherwise(0).alias("merge_exact"),
        )
    )


def _q284_hw_oracle(T: int = 28, m: int = 7, a: float = 0.4, b: float = 0.2, g: float = 0.3) -> str:
    """Generated oracle for q284: additive Holt-Winters unrolled as one CTE
    per step with the 7 seasonal components as rotating columns (the q273
    Holt chain treatment extended with a seasonal register file). nl/nb/ns
    re-expand subexpressions rather than referencing lateral aliases, so
    every float op matches the engine fold exactly."""
    scols = ", ".join(f"s{i}" for i in range(1, m + 1))
    sum1 = "(" * (m - 1) + "xs[1]" + "".join(f" + xs[{i}])" for i in range(2, m + 1))
    sum2 = "(" * (m - 1) + f"xs[{m + 1}]" + "".join(
        f" + xs[{i}])" for i in range(m + 2, 2 * m + 1)
    )
    seas = ", ".join(f"xs[{i}] - l AS s{i}" for i in range(1, m + 1))
    ctes = [
        f"w0 AS (SELECT k, xs, {sum1} / {m} AS l FROM series)",
        f"w{m}_r AS (SELECT k, xs, l, ({sum2} / {m} - l) / {m} AS b, {seas} FROM w0)",
    ]
    for t in range(m + 1, T + 1):
        nl = f"{a} * (xs[{t}] - s1) + {1 - a} * (l + b)"
        nb = f"{b_lit(b)} * (({nl}) - l) + {1 - b} * b"
        ns = f"{g} * (xs[{t}] - ({nl})) + {1 - g} * s1"
        keep = ", ".join(f"s{i}" for i in range(2, m + 1))
        rot = ", ".join(f"s{i + 1} AS s{i}" for i in range(1, m)) + f", ns AS s{m}"
        # ns is computed HERE, where l/b/s1 still bind to the OLD state —
        # in the rotation CTE the lateral aliases `nl AS l` would shadow
        # them and silently smooth with the new level
        ctes.append(
            f"w{t} AS (SELECT k, xs, ({nl}) AS nl, ({nb}) AS nb, ({ns}) AS ns, "
            f"{keep} FROM w{t - 1}_r)"
        )
        ctes.append(
            f"w{t}_r AS (SELECT k, xs, nl AS l, nb AS b, {rot} FROM w{t})"
        )
    chain = ",\n    ".join(ctes)
    fcs = ", ".join(
        f"round(l + {h} * b + s{h}, 6) + 0.0 AS f{h}" for h in range(1, m + 1)
    )
    return f"""
    WITH hc AS (
      SELECT event_type AS k,
             epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo FROM hc),
    keys AS (SELECT DISTINCT k FROM hc),
    grid AS (SELECT keys.k, g.d, b.lo
             FROM keys CROSS JOIN (SELECT unnest(generate_series(0, {T - 1})) AS d) g,
                  bounds b),
    dense AS (
      SELECT g.k, g.d, coalesce(hc.c, 0.0) AS c
      FROM grid g LEFT JOIN hc ON hc.k = g.k AND hc.day = g.lo + g.d
    ),
    series AS (SELECT k, list(c ORDER BY d) AS xs FROM dense GROUP BY 1),
    {chain}
    SELECT k AS event_type, round(l, 6) + 0.0 AS level,
           round(b, 6) + 0.0 AS trend, {fcs}
    FROM w{T}_r
    """


def b_lit(x: float) -> str:
    return repr(x)


@query("q284_holt_winters", oracle=_q284_hw_oracle())
def q284_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (alpha=0.4, beta=0.2, gamma=0.3, weekly
    season m=7) per event type over 28 days of daily counts, with a full
    season of forecasts — the seasonal tier of the smoothing ladder
    (q270 seasonal-naive baseline, q273/q274 Holt level+trend, this adds
    the seasonal register file; the reference's auto_arima workload models
    fit exactly this shape of series). Classical init: level = mean of
    week 1, trend = (mean week 2 - mean week 1)/7, seasonals = week-1
    residuals; the mean is an EXPLICIT left-to-right sum chain, not avg(),
    so both engines add in the same order. The engine folds (level,
    trend, 7-slot rotating seasonal array) in ONE codegen `aggregate`;
    the oracle replays the identical recursion as a generated 21-step CTE
    chain with the seasonals as rotating columns — digit-for-digit.

    100 TB story: O(days x keys) map-side rollup, one shuffle on the
    key, then embarrassingly parallel per-row folds (q274's shape).
    """
    e = _t(spark, sf_dir, "events")
    T, m = 28, 7
    a, bt, g = 0.4, 0.2, 0.3
    hc = (
        e.groupBy(
            F.col("event_type").alias("k"),
            F.expr("(ts div 1000000000) div 86400").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    lo = hc.agg(F.min("day").alias("lo"))
    keys = hc.select("k").distinct()
    grid = keys.crossJoin(
        F.broadcast(
            lo.select(F.explode(F.sequence(F.lit(0), F.lit(T - 1))).alias("d"), "lo")
        )
    )
    dense = grid.join(
        hc, (grid.k == hc.k) & (grid.lo + grid.d == hc.day), "left"
    ).select(grid.k, grid.d, F.coalesce("c", F.lit(0.0)).alias("c"))
    series = dense.groupBy("k").agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).getField("c").alias("xs")
    )
    xs = F.col("xs")
    # explicit left-to-right sums (same float order as the oracle)
    l0 = xs[0]
    for i in range(1, m):
        l0 = l0 + xs[i]
    l0 = l0 / m
    s2 = xs[m]
    for i in range(m + 1, 2 * m):
        s2 = s2 + xs[i]
    b0 = (s2 / m - l0) / m
    init = F.struct(
        l0.alias("l"),
        b0.alias("b"),
        F.array(*[(xs[i] - l0) for i in range(m)]).alias("s"),
    )

    def step(acc, t):
        x = F.element_at(xs, t.cast("int"))
        s1 = F.element_at(acc["s"], 1)
        nl = F.lit(a) * (x - s1) + F.lit(1 - a) * (acc["l"] + acc["b"])
        nb = F.lit(bt) * (nl - acc["l"]) + F.lit(1 - bt) * acc["b"]
        ns = F.lit(g) * (x - nl) + F.lit(1 - g) * s1
        return F.struct(
            nl.alias("l"),
            nb.alias("b"),
            F.concat(F.slice(acc["s"], 2, m - 1), F.array(ns)).alias("s"),
        )

    st = F.aggregate(F.sequence(F.lit(m + 1), F.lit(T)), init, step)
    out = series.select(F.col("k").alias("event_type"), st.alias("st"))
    cols = [
        "event_type",
        (F.round(F.col("st.l"), 6) + F.lit(0.0)).alias("level"),
        (F.round(F.col("st.b"), 6) + F.lit(0.0)).alias("trend"),
    ]
    for h in range(1, m + 1):
        cols.append(
            (
                F.round(
                    F.col("st.l")
                    + h * F.col("st.b")
                    + F.element_at(F.col("st.s"), h),
                    6,
                )
                + F.lit(0.0)
            ).alias(f"f{h}")
        )
    return out.select(*cols)


@query(
    "q285_bigram_lm_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    uni AS (SELECT unnest(toks) AS tok FROM t),
    ucnt AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
    n AS (SELECT count(*) AS n_uni FROM uni),
    bi AS (
      SELECT doc_id, source,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i])) AS w1,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i + 1])) AS w2
      FROM t WHERE len(toks) >= 2
    ),
    bcnt AS (SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY 1, 2),
    scored AS (
      SELECT bi.doc_id, bi.source,
             ln(0.7 * (bcnt.c_ab * 1.0 / ua.c)
                + 0.3 * (ub.c * 1.0 / n.n_uni)) AS lp
      FROM bi
      JOIN bcnt ON bcnt.w1 = bi.w1 AND bcnt.w2 = bi.w2
      JOIN ucnt ua ON ua.tok = bi.w1
      JOIN ucnt ub ON ub.tok = bi.w2
      CROSS JOIN n
    ),
    perdoc AS (
      SELECT doc_id, source, avg(lp) AS doc_lp FROM scored GROUP BY 1, 2
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(doc_lp), 6) AS avg_lp,
           round(exp(-avg(doc_lp)), 6) AS ppl
    FROM perdoc GROUP BY 1
    """,
)
def q285_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer-interpolated bigram language model (lambda=0.7
    bigram MLE + 0.3 unigram MLE) fit on the corpus and applied back to
    score every document; reported as per-source mean log-prob and
    perplexity. This is the bigram tier above the CCNet-style unigram LM
    quality signal (q72/q137) — fluency-aware, so boilerplate with
    common words in odd ORDER now scores badly too.

    100 TB story: counts are two map-side-combining groupBys bounded by
    the (observed) vocabulary and bigram vocabulary; scoring joins the
    bigram stream against those count frames on their keys — no corpus
    self-join, and the count frames broadcast when small. The per-doc
    mean then per-source mean keeps every reduction associative.
    """
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    t = d.select("doc_id", "source", text.tokens(F.col("text")).alias("toks"))
    nt = F.size("toks")
    bi = (
        t.filter(nt >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, nt - 1),
                    F.slice("toks", 2, nt - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("e"),
        )
        .select("doc_id", "source", F.col("e.w1").alias("w1"), F.col("e.w2").alias("w2"))
    )
    uni = t.select(F.explode("toks").alias("tok"))
    ucnt = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n = uni.agg(F.count(F.lit(1)).alias("n_uni"))
    bcnt = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    ua = ucnt.select(F.col("tok").alias("w1"), F.col("c").alias("ca"))
    ub = ucnt.select(F.col("tok").alias("w2"), F.col("c").alias("cb"))
    scored = (
        bi.join(_dim(bcnt), ["w1", "w2"])
        .join(_dim(ua), "w1")
        .join(_dim(ub), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "source",
            F.log(
                0.7 * (F.col("c_ab") * 1.0 / F.col("ca"))
                + 0.3 * (F.col("cb") * 1.0 / F.col("n_uni"))
            ).alias("lp"),
        )
    )
    perdoc = scored.groupBy("doc_id", "source").agg(F.avg("lp").alias("doc_lp"))
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("doc_lp"), 6).alias("avg_lp"),
        F.round(F.exp(-F.avg("doc_lp")), 6).alias("ppl"),
    )


@query(
    "q286_l_diversity",
    oracle="""
    WITH g AS (
      SELECT lang, n_chars // 50 AS band, source, count(*) AS c
      FROM documents GROUP BY 1, 2, 3
    ),
    g2 AS (
      SELECT lang, band, c,
             sum(c) OVER (PARTITION BY lang, band) AS tot
      FROM g
    ),
    q AS (
      SELECT lang, band,
             CAST(sum(c) AS BIGINT) AS k,
             count(*) AS l_distinct,
             exp(-sum((c * 1.0 / tot) * ln(c * 1.0 / tot))) AS l_entropy
      FROM g2 GROUP BY 1, 2
    )
    SELECT lang, band, k, l_distinct,
           round(l_entropy, 6) AS l_entropy,
           CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END AS violates_l3
    FROM q
    """,
)
def q286_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) extending the
    k-anonymity census (q239): quasi-identifier = (lang, 50-char length
    band), sensitive attribute = source. Per QI group: group size k,
    DISTINCT l-diversity, ENTROPY l-diversity (exp of the sensitive-value
    entropy — penalises groups where one sensitive value dominates even
    when several are nominally present), and the distinct-l<3 violation
    flag a release gate would block on.

    100 TB story: one map-side-combining groupBy to (QI x sensitive)
    cells, then a second groupBy to QI groups — both bounded by the
    attribute-combination vocabulary, never corpus-sized.
    """
    d = _t(spark, sf_dir, "documents")
    g = d.groupBy(
        "lang", F.expr("n_chars div 50").alias("band"), "source"
    ).agg(F.count(F.lit(1)).alias("c"))
    g2 = g.withColumn(
        "tot", F.sum("c").over(Window.partitionBy("lang", "band"))
    )
    q = g2.groupBy("lang", "band").agg(
        F.sum("c").cast("long").alias("k"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.exp(
            -F.sum(
                (F.col("c") * 1.0 / F.col("tot"))
                * F.log(F.col("c") * 1.0 / F.col("tot"))
            )
        ).alias("l_entropy"),
    )
    return q.select(
        "lang",
        "band",
        "k",
        "l_distinct",
        F.round("l_entropy", 6).alias("l_entropy"),
        F.when(F.col("l_distinct") < 3, 1).otherwise(0).alias("violates_l3"),
    )


@query(
    "q287_column_dependence",
    oracle="""
    WITH cell AS (
      SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
    ),
    mx AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rx FROM cell GROUP BY 1),
    my AS (SELECT source, CAST(sum(o) AS BIGINT) AS cy FROM cell GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cell),
    dims AS (SELECT (SELECT count(*) FROM mx) AS r, (SELECT count(*) FROM my) AS c),
    terms AS (
      SELECT cell.o, mx.rx, my.cy, n.n,
             (cell.o * 1.0 / n.n)
               * ln((cell.o * 1.0 / n.n) / ((mx.rx * 1.0 / n.n) * (my.cy * 1.0 / n.n)))
               AS mi_term,
             (mx.rx * 1.0 * my.cy / n.n) AS e,
             (cell.o - (mx.rx * 1.0 * my.cy / n.n))
               * (cell.o - (mx.rx * 1.0 * my.cy / n.n))
               / (mx.rx * 1.0 * my.cy / n.n) AS chi_term
      FROM cell JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN n
    )
    SELECT n.n, dims.r, dims.c,
           round(sum(mi_term), 6) AS mi,
           round(sum(chi_term) + (n.n - sum(e)), 6) AS chi2,
           (dims.r - 1) * (dims.c - 1) AS dof,
           round(sqrt((sum(chi_term) + (n.n - sum(e)))
                      / (n.n * least(dims.r - 1, dims.c - 1))), 6) AS cramers_v
    FROM terms CROSS JOIN n CROSS JOIN dims
    GROUP BY n.n, dims.r, dims.c
    """,
)
def q287_column_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-dependence audit between lang and source: mutual
    information (nats), the chi-square independence statistic, its
    degrees of freedom, and Cramer's V — the screening pass a curation
    pipeline runs to find leaking/correlated metadata columns before
    stratifying on them. Unobserved contingency cells still owe their
    expected count to chi-square; rather than materializing the full
    R x C grid, the identity sum_all(e) = N folds them in as
    N - sum_observed(e) — observed cells only, exact same value.

    100 TB story: one groupBy to observed cells (vocabulary-bounded),
    marginals re-aggregated from the cell frame (no second corpus scan),
    a cell-sized join, one scalar row out.
    """
    d = _t(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    mx = cell.groupBy("lang").agg(F.sum("o").cast("long").alias("rx"))
    my = cell.groupBy("source").agg(F.sum("o").cast("long").alias("cy"))
    n = cell.agg(F.sum("o").cast("long").alias("n"))
    dims = mx.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        my.agg(F.count(F.lit(1)).alias("c"))
    )
    e = F.col("rx") * 1.0 * F.col("cy") / F.col("n")
    terms = (
        cell.join(_dim(mx), "lang")
        .join(_dim(my), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "o",
            "n",
            (
                (F.col("o") * 1.0 / F.col("n"))
                * F.log(
                    (F.col("o") * 1.0 / F.col("n"))
                    / ((F.col("rx") * 1.0 / F.col("n")) * (F.col("cy") * 1.0 / F.col("n")))
                )
            ).alias("mi_term"),
            e.alias("e"),
            ((F.col("o") - e) * (F.col("o") - e) / e).alias("chi_term"),
        )
    )
    agg = terms.groupBy("n").agg(
        F.sum("mi_term").alias("smi"),
        F.sum("chi_term").alias("schi"),
        F.sum("e").alias("se"),
    )
    return agg.crossJoin(F.broadcast(dims)).select(
        "n",
        "r",
        "c",
        F.round("smi", 6).alias("mi"),
        F.round(F.col("schi") + (F.col("n") - F.col("se")), 6).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round(
            F.sqrt(
                (F.col("schi") + (F.col("n") - F.col("se")))
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "q288_fs_em_weights",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, source, lang, n_chars,
             regexp_split_to_array(trim(text), '\s+')[1] AS tok1,
             n_chars // 25 AS band
      FROM documents WHERE trim(text) <> ''
    ),
    pairs AS (
      SELECT a.doc_id AS i, b.doc_id AS j,
             CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS g1,
             CASE WHEN a.tok1 = b.tok1 THEN 1 ELSE 0 END AS g2,
             CASE WHEN abs(a.n_chars - b.n_chars) <= 5 THEN 1 ELSE 0 END AS g3
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    ),
    u0 AS (
      SELECT avg(g1 * 1.0) AS u1, avg(g2 * 1.0) AS u2, avg(g3 * 1.0) AS u3,
             count(*) AS np
      FROM pairs
    ),
    post AS (
      SELECT g1, g2, g3, np,
             (0.05
              * (CASE WHEN g1 = 1 THEN 0.9 ELSE 0.1 END)
              * (CASE WHEN g2 = 1 THEN 0.9 ELSE 0.1 END)
              * (CASE WHEN g3 = 1 THEN 0.9 ELSE 0.1 END))
             /
             ((0.05
              * (CASE WHEN g1 = 1 THEN 0.9 ELSE 0.1 END)
              * (CASE WHEN g2 = 1 THEN 0.9 ELSE 0.1 END)
              * (CASE WHEN g3 = 1 THEN 0.9 ELSE 0.1 END))
              + (0.95
              * (CASE WHEN g1 = 1 THEN u1 ELSE 1 - u1 END)
              * (CASE WHEN g2 = 1 THEN u2 ELSE 1 - u2 END)
              * (CASE WHEN g3 = 1 THEN u3 ELSE 1 - u3 END))) AS w
      FROM pairs CROSS JOIN u0
    ),
    upd AS (
      SELECT np,
             sum(w) AS sw, sum(1 - w) AS swn,
             sum(w * g1) AS m1n, sum((1 - w) * g1) AS u1n,
             sum(w * g2) AS m2n, sum((1 - w) * g2) AS u2n,
             sum(w * g3) AS m3n, sum((1 - w) * g3) AS u3n
      FROM post GROUP BY np
    ),
    fields AS (
      SELECT 'same_source' AS field, m1n / sw AS m, u1n / swn AS u, np FROM upd
      UNION ALL
      SELECT 'same_first_token', m2n / sw, u2n / swn, np FROM upd
      UNION ALL
      SELECT 'len_within_5', m3n / sw, u3n / swn, np FROM upd
    )
    SELECT field, np AS n_pairs,
           round(m, 6) AS m,
           round(u, 6) AS u,
           round(ln(m / u), 6) AS w_agree,
           round(ln((1 - m) / (1 - u)), 6) AS w_disagree
    FROM fields
    """,
)
def q288_fs_em_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (1969), fit the
    real-world way — UNSUPERVISED: blocked candidate pairs (lang x
    25-char band, the q207 blocking shape), three field-agreement
    patterns (source, first token, length-within-5), and ONE
    deterministic EM step from the standard init (m=0.9, u=observed
    agreement rate, prior 0.05) to per-field m/u probabilities and the
    log-likelihood agree/disagree weights a linkage rule sums. No RNG,
    no labels; the posterior arithmetic is the same closed-form Bayes
    expression in both engines.

    100 TB story: pairs are generated only within blocks (the standard
    ER contract — block growth is the quadratic knob, finer blocking is
    the scale path); the EM step is two aggregations over the pair
    stream with map-side combine, never materializing pairs to the
    driver.
    """
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.trim("text") != "")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            text.tokens(F.col("text")).getItem(0).alias("tok1"),
            F.expr("n_chars div 25").alias("band"),
        )
    )
    a = d.select(*[F.col(c).alias(f"a_{c}") for c in d.columns])
    b = d.select(*[F.col(c).alias(f"b_{c}") for c in d.columns])
    pairs = (
        a.join(
            b,
            (F.col("a_lang") == F.col("b_lang"))
            & (F.col("a_band") == F.col("b_band"))
            & (F.col("a_doc_id") < F.col("b_doc_id")),
        )
        .select(
            F.when(F.col("a_source") == F.col("b_source"), 1).otherwise(0).alias("g1"),
            F.when(F.col("a_tok1") == F.col("b_tok1"), 1).otherwise(0).alias("g2"),
            F.when(F.abs(F.col("a_n_chars") - F.col("b_n_chars")) <= 5, 1)
            .otherwise(0)
            .alias("g3"),
        )
    )
    u0 = pairs.agg(
        F.avg(F.col("g1") * 1.0).alias("u1"),
        F.avg(F.col("g2") * 1.0).alias("u2"),
        F.avg(F.col("g3") * 1.0).alias("u3"),
        F.count(F.lit(1)).alias("np"),
    )

    def lik(g, p):
        return F.when(F.col(g) == 1, F.lit(p)).otherwise(F.lit(1 - p))

    def ulik(g, u):
        return F.when(F.col(g) == 1, F.col(u)).otherwise(1 - F.col(u))

    num = F.lit(0.05) * lik("g1", 0.9) * lik("g2", 0.9) * lik("g3", 0.9)
    den = num + F.lit(0.95) * ulik("g1", "u1") * ulik("g2", "u2") * ulik("g3", "u3")
    post = pairs.crossJoin(F.broadcast(u0)).select(
        "g1", "g2", "g3", "np", (num / den).alias("w")
    )
    upd = post.groupBy("np").agg(
        F.sum("w").alias("sw"),
        F.sum(1 - F.col("w")).alias("swn"),
        *[
            agg
            for i in (1, 2, 3)
            for agg in (
                F.sum(F.col("w") * F.col(f"g{i}")).alias(f"m{i}n"),
                F.sum((1 - F.col("w")) * F.col(f"g{i}")).alias(f"u{i}n"),
            )
        ],
    )
    names = {1: "same_source", 2: "same_first_token", 3: "len_within_5"}
    parts = [
        upd.select(
            F.lit(names[i]).alias("field"),
            (F.col(f"m{i}n") / F.col("sw")).alias("m"),
            (F.col(f"u{i}n") / F.col("swn")).alias("u"),
            F.col("np").alias("n_pairs"),
        )
        for i in (1, 2, 3)
    ]
    fields = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return fields.select(
        "field",
        "n_pairs",
        F.round("m", 6).alias("m"),
        F.round("u", 6).alias("u"),
        F.round(F.log(F.col("m") / F.col("u")), 6).alias("w_agree"),
        F.round(F.log((1 - F.col("m")) / (1 - F.col("u"))), 6).alias("w_disagree"),
    )


@query("q289_streaming_burn_drain", oracle=None)
def q289_streaming_burn_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING multi-window SLO burn-rate alerting drained in the
    hash-checked gate — q276's batch computation re-executed through
    Structured Streaming with the trailing 6 h window carried in the
    state store (:func:`stateful.streaming_burn_rate`): hourly aggregates
    arrive as three hour-ordered micro-batches, the window ring folds
    ACROSS batches, and the union of emitted rows must match q276's
    DuckDB oracle digit-for-digit. Batch RANGE frame and streaming state:
    two execution forms, one answer — the q273/q274/q275 equivalence
    class applied to the alerting operator the reference's QoS monitor
    would run continuously.

    Scale: state is <= 6 triples per SLO stream; each micro-batch does
    O(new hours) work — the streaming form alerts on an unbounded metric
    stream with O(1) memory, no re-reading history.
    """
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming.stateful import streaming_burn_rate

    e = _t(spark, sf_dir, "events")
    h = e.groupBy(F.expr("(ts div 1000000000) div 3600").alias("hr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errs"),
    )
    work = tempfile.mkdtemp(prefix="q289_")
    src_dir = f"{work}/src"
    try:
        os.makedirs(src_dir)
        lo = h.agg(F.min("hr")).collect()[0][0]
        for i, (h_lo, h_hi) in enumerate(((0, 240), (240, 480), (480, 100000)), start=1):
            part = h.filter(
                (F.col("hr") >= lo + h_lo) & (F.col("hr") < lo + h_hi)
            )
            part.coalesce(1).write.parquet(f"{work}/stage{i}")
            pf = glob.glob(f"{work}/stage{i}/part-*.parquet")[0]
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(pf, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("hr LONG, n LONG, errs LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = streaming_burn_rate(stream)
        sink = f"{work}/burn"
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda bdf, _bid: bdf.write.mode("append").parquet(sink))
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "q289: streaming burn drain did not finish within 300 s — "
                "refusing to report a partial alert stream"
            )
        res = spark.read.parquet(sink).select(
            "hr",
            "n",
            "errs",
            F.round("burn_short", 6).alias("burn_short"),
            F.round("burn_long", 6).alias("burn_long"),
            "page",
        )
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the drain must reproduce the batch operator's oracle exactly — batch
# RANGE frame and streaming state are two forms of one computation
ORACLE["q289_streaming_burn_drain"] = ORACLE["q276_slo_burn_rate"]


@query(
    "q290_conformal_interval",
    oracle="""
    WITH dc AS (
      SELECT epoch_ns(ts) // 1000000000 // 86400 AS day, count(*) AS c
      FROM events GROUP BY 1
    ),
    b AS (SELECT min(day) AS lo FROM dc),
    grid AS (SELECT unnest(generate_series(0, 29)) AS d, lo FROM b),
    dense AS (
      SELECT g.d, CAST(coalesce(dc.c, 0) AS BIGINT) AS c
      FROM grid g LEFT JOIN dc ON dc.day = g.lo + g.d
    ),
    resid AS (
      SELECT a.d, abs(a.c - p.c) AS r
      FROM dense a JOIN dense p ON p.d = a.d - 7
      WHERE a.d >= 7
    ),
    calib AS (
      SELECT r, row_number() OVER (ORDER BY r, d) AS rn,
             count(*) OVER () AS n_cal
      FROM resid WHERE d % 2 = 0
    ),
    qh AS (
      SELECT r AS q_hat, n_cal FROM calib
      WHERE rn = ((n_cal + 1) * 4 + 4) // 5
    ),
    test AS (SELECT r FROM resid WHERE d % 2 = 1)
    SELECT qh.n_cal,
           (SELECT count(*) FROM test) AS n_test,
           qh.q_hat,
           round(avg(CASE WHEN test.r <= qh.q_hat THEN 1.0 ELSE 0.0 END), 6)
             AS coverage,
           CAST(0.8 AS DOUBLE) AS target
    FROM test CROSS JOIN qh
    GROUP BY qh.n_cal, qh.q_hat
    """,
)
def q290_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk; Lei et al. 2018) wrapped
    around the seasonal-naive forecaster the backtest scores (q270):
    absolute day-over-week residuals on the even-day calibration split
    give the ceil((n+1)*0.8)-th order statistic as the distribution-free
    80% interval half-width q_hat; the odd-day test split reports
    empirical coverage. The order statistic is an integer row_number
    lookup (no float quantile interpolation), so the certificate is
    exact in both engines.

    100 TB story: residuals are O(days) from the map-side daily rollup;
    the order statistic is a window over the calibration rows only. Per
    series (q274's grouped shape) this is one sort per key of
    O(days)-sized arrays — conformal calibration for a million
    forecasters in one pass.
    """
    e = _t(spark, sf_dir, "events")
    dc = e.groupBy(F.expr("(ts div 1000000000) div 86400").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    lo = dc.agg(F.min("day").alias("lo"))
    grid = lo.select(F.explode(F.sequence(F.lit(0), F.lit(29))).alias("d"), "lo")
    dense = grid.join(dc, grid.lo + grid.d == dc.day, "left").select(
        "d", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    a = dense.select(F.col("d").alias("ad"), F.col("c").alias("ac"))
    p = dense.select(F.col("d").alias("pd"), F.col("c").alias("pc"))
    resid = (
        a.join(p, F.col("pd") == F.col("ad") - 7)
        .filter(F.col("ad") >= 7)
        .select(F.col("ad").alias("d"), F.abs(F.col("ac") - F.col("pc")).alias("r"))
    )
    calib = (
        resid.filter(F.col("d") % 2 == 0)
        .select(
            "r",
            F.row_number().over(Window.orderBy("r", "d")).alias("rn"),
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n_cal"),
        )
    )
    # integer ceil division: ceil((n+1)*0.8) == ((n+1)*4 + 4) div 5
    qh = calib.filter(
        F.col("rn") == F.expr("((n_cal + 1) * 4 + 4) div 5")
    ).select(F.col("r").alias("q_hat"), "n_cal")
    test = resid.filter(F.col("d") % 2 == 1)
    return (
        test.crossJoin(F.broadcast(qh))
        .groupBy("n_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(
                F.avg(F.when(F.col("r") <= F.col("q_hat"), 1.0).otherwise(0.0)), 6
            ).alias("coverage"),
        )
        .select(
            "n_cal",
            "n_test",
            "q_hat",
            "coverage",
            F.lit(0.8).alias("target"),
        )
    )


def _q291_kcore_oracle(k: int = 2, rounds: int = 6) -> str:
    """Generated oracle for q291: every peeling round as two CTEs (the
    q232 fixed-iteration treatment applied to k-core). Unlike q232's
    chain, each round references the PREVIOUS round twice (both join
    sides), so un-materialized CTE inlining is exponential in rounds —
    ``AS MATERIALIZED`` on the multiply-referenced CTEs keeps the oracle
    linear (the SQL analogue of the Spark side's localCheckpoint)."""
    ctes = [
        "edges AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM co UNION ALL SELECT s2, s1 FROM co)",
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS n FROM edges)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"d{r} AS (SELECT e.src, count(*) AS dg FROM edges e "
            f"JOIN a{r - 1} x ON e.src = x.n JOIN a{r - 1} y ON e.dst = y.n "
            f"GROUP BY 1)"
        )
        ctes.append(f"a{r} AS MATERIALIZED (SELECT src AS n FROM d{r} WHERE dg >= {k})")
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {_COGRAPH_SQL},
    {chain},
    dfin AS (
      SELECT e.src, count(*) AS dg FROM edges e
      JOIN a{rounds} x ON e.src = x.n JOIN a{rounds} y ON e.dst = y.n
      GROUP BY 1
    ),
    cert AS (
      SELECT CASE WHEN (SELECT count(*) FROM a{rounds - 1})
                     = (SELECT count(*) FROM a{rounds}) THEN 1 ELSE 0 END AS stable
    )
    SELECT dfin.src AS part, CAST(dfin.dg AS BIGINT) AS core_deg, cert.stable
    FROM dfin CROSS JOIN cert
    """


@query("q291_kcore", oracle=_q291_kcore_oracle())
def q291_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the part co-occurrence graph by 6 bounded peeling rounds
    (Seidman 1983 coreness; Batagelj-Zaversnik peeling as iterated
    DataFrame joins) — the density filter that isolates the structurally
    cohesive region of the purchase graph, completing the graph ladder
    (components q53, triangles q233, PageRank q232, label propagation
    q243). Emits each surviving node's within-core degree plus a
    convergence certificate (`stable` = the last round no longer shrank
    the set; k=2 converges within 8 rounds at every test SF — k=3 peels
    the co-graph to EMPTY at sf0.1, so the 2-core is the non-vacuous
    choice at all SFs).

    100 TB story: a round is two equi-joins + one grouped count shuffled
    on the node id (edge-sized, never node-squared), checkpointed per
    round; peeling rounds shrink the frontier monotonically.
    """
    co = _cograph_edges(spark, sf_dir)
    edges = graph.symmetrize(co).localCheckpoint(eager=True)
    prev, alive, deg_final = graph.kcore_peel(edges, k=2, rounds=6)
    cert = (
        prev.agg(F.count(F.lit(1)).alias("pc"))
        .crossJoin(alive.agg(F.count(F.lit(1)).alias("ac")))
        .select(
            F.when(F.col("pc") == F.col("ac"), 1).otherwise(0).alias("stable")
        )
    )
    return deg_final.crossJoin(F.broadcast(cert)).select(
        F.col("src").alias("part"),
        F.col("deg").cast("long").alias("core_deg"),
        "stable",
    )


@query(
    "q292_quantile_hist_sketch",
    oracle="""
    WITH vals AS (
      SELECT o_orderkey, o_totalprice AS v,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    binned AS (
      SELECT o_orderkey % 2 AS half,
             least((cents * 128) // 50000000, 127) AS bin
      FROM vals
    ),
    hb AS (SELECT half, bin, count(*) AS c FROM binned GROUP BY 1, 2),
    merged AS (SELECT bin, CAST(sum(c) AS BIGINT) AS c FROM hb GROUP BY 1),
    full_h AS (SELECT bin, count(*) AS c FROM binned GROUP BY 1),
    cert AS (
      SELECT CAST(min(CASE WHEN m.c = f.c THEN 1 ELSE 0 END) AS INT) AS merge_exact
      FROM merged m JOIN full_h f USING (bin)
    ),
    cum AS (
      SELECT bin, c,
             coalesce(CAST(sum(c) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               AS before,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM full_h
    ),
    qs(q, num, den) AS (VALUES (0.5, 1, 2), (0.95, 19, 20), (0.99, 99, 100)),
    est AS (
      SELECT qs.q,
             cum.bin * 3906.25
               + 3906.25 * ((qs.q * cum.n) - cum.before) / cum.c AS est,
             (qs.num * cum.n + qs.den - 1) // qs.den AS k
      FROM qs JOIN cum
        ON cum.before < qs.q * cum.n AND cum.before + cum.c >= qs.q * cum.n
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rn FROM vals
    )
    SELECT CAST(est.q AS DOUBLE) AS q,
           round(est.est, 6) AS est,
           round(ranked.v, 6) AS exact,
           round(est.est - ranked.v, 6) AS err,
           round(abs(est.est - ranked.v) / ranked.v, 6) AS rel_err,
           cert.merge_exact
    FROM est JOIN ranked ON ranked.rn = est.k CROSS JOIN cert
    """,
)
def q292_quantile_hist_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-range histogram quantile sketch over order totals:
    128 equi-width bins on [0, 500k) with CENTS-integer bin assignment
    (a float floor at bin boundaries would be representation-sensitive;
    (cents*128) div 5e7 is exact), linear interpolation inside the
    quantile bin for p50/p95/p99, audited against the EXACT order
    statistic, plus a parity-split merge certificate (half-sketches sum
    to the full sketch bin-for-bin — additive counts are what make the
    sketch mergeable across 1000 executors). Joins the mergeable-sketch
    family: HLL (q283) merges by register max, KMV (q202) by
    k-min union, this by vector addition.

    100 TB story: the sketch is one map-side-combining groupBy into 128
    cells — O(1) state per partition, one tiny shuffle; the exact
    order-statistic side is the AUDIT, not the product (rank lookup via
    sort is the thing the sketch exists to avoid).
    """
    o = _t(spark, sf_dir, "orders")
    vals, binned = _order_price_bins(o)
    hb = binned.groupBy("half", "bin").agg(F.count(F.lit(1)).alias("c"))
    return _hist_sketch_assembly(spark, vals, binned, hb)


def _order_price_bins(o: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(vals, binned) for the q292/q300 histogram sketch: order totals with
    their exact-cents representation, and the (parity-half, 128-bin) cell
    assignment on [0, 500k) — integer arithmetic only at the boundary."""
    vals = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("v"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    binned = vals.select(
        (F.col("o_orderkey") % 2).alias("half"),
        F.least(F.expr("(cents * 128) div 50000000"), F.lit(127).cast("long")).alias(
            "bin"
        ),
    )
    return vals, binned


def _hist_sketch_assembly(
    spark: SparkSession, vals: DataFrame, binned: DataFrame, hb: DataFrame
) -> DataFrame:
    """Shared downstream of the histogram quantile sketch (q292 batch,
    q300 streaming drain): merge the half-sketches (q300: the DRAINED
    streaming state) against the batch-direct full histogram with a
    bin-for-bin certificate, interpolate p50/p95/p99 inside the quantile
    bin, audit against the exact order statistic."""
    merged = hb.groupBy("bin").agg(F.sum("c").cast("long").alias("mc"))
    full_h = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    cert = (
        merged.join(full_h, "bin")
        .agg(
            F.min(F.when(F.col("mc") == F.col("c"), 1).otherwise(0))
            .cast("int")
            .alias("merge_exact")
        )
    )
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = full_h.select(
        "bin",
        "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).cast("long").alias("before"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    qs = spark.range(1).select(
        F.explode(
            F.array(
                F.struct(F.lit(0.5).alias("q"), F.lit(1).alias("num"), F.lit(2).alias("den")),
                F.struct(F.lit(0.95).alias("q"), F.lit(19).alias("num"), F.lit(20).alias("den")),
                F.struct(F.lit(0.99).alias("q"), F.lit(99).alias("num"), F.lit(100).alias("den")),
            )
        ).alias("s")
    ).select("s.q", "s.num", "s.den")
    est = qs.join(
        cum,
        (F.col("before") < F.col("q") * F.col("n"))
        & (F.col("before") + F.col("c") >= F.col("q") * F.col("n")),
    ).select(
        "q",
        (
            F.col("bin") * 3906.25
            + 3906.25 * ((F.col("q") * F.col("n")) - F.col("before")) / F.col("c")
        ).alias("est"),
        F.expr("(num * n + den - 1) div den").alias("k"),
    )
    # exact order statistic WITHOUT a single-reducer global sort: the
    # two-phase value-bucketed rank ($100-cents buckets — offsets frame
    # bounded by the price RANGE), bit-identical to row_number() over
    # the naive total-order window
    from phoebe_spark.operators.layout import global_rank_by_value

    ranked = global_rank_by_value(
        vals, "v", "o_orderkey", descending=False, out_col="rn",
        bucket=F.expr("cents div 10000"),
    ).select("v", "rn")
    return (
        est.join(ranked, est.k == ranked.rn)
        .crossJoin(F.broadcast(cert))
        .select(
            F.col("q").cast("double").alias("q"),
            F.round("est", 6).alias("est"),
            F.round("v", 6).alias("exact"),
            F.round(F.col("est") - F.col("v"), 6).alias("err"),
            F.round(F.abs(F.col("est") - F.col("v")) / F.col("v"), 6).alias("rel_err"),
            "merge_exact",
        )
    )


def _q293_eigencentrality_oracle(iters: int = 5) -> str:
    """Generated oracle for q293: every power-iteration round as three
    MATERIALIZED CTEs (matvec, norm, normalize) — the q291 treatment;
    every sum is a DECIMAL(32,8) sum of 8-dp-rounded terms so both
    engines fold bit-identically regardless of row order."""
    ctes = [
        "edges AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM co UNION ALL SELECT s2, s1 FROM co)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS n FROM edges)",
        "v0 AS MATERIALIZED (SELECT n, round(1.0 / sqrt((SELECT count(*) FROM nodes)), 8) AS v FROM nodes)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT e.src AS n, "
            f"CAST(sum(CAST(round(p.v, 8) AS DECIMAL(32,8))) AS DOUBLE) AS raw "
            f"FROM edges e JOIN v{k - 1} p ON e.dst = p.n GROUP BY 1)"
        )
        ctes.append(
            f"n{k} AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(round(raw * raw, 8) "
            f"AS DECIMAL(32,8))) AS DOUBLE)) AS nrm FROM r{k})"
        )
        ctes.append(
            f"v{k} AS MATERIALIZED (SELECT n, "
            f"round(raw / (SELECT nrm FROM n{k}), 8) AS v FROM r{k})"
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {_COGRAPH_SQL},
    {chain}
    SELECT n AS part, v AS score,
           (SELECT nrm FROM n{iters}) AS lambda_est
    FROM v{iters}
    """


@query("q293_eigencentrality", oracle=_q293_eigencentrality_oracle())
def q293_eigencentrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality of the part co-occurrence graph — 5 power-
    iteration rounds (:func:`graph.eigencentrality`), the principal-
    direction complement to PageRank's random-walk mass (q232) and the
    measure HITS degenerates to on an undirected graph (hub == authority),
    closing the centrality ladder: components (q53), triangles (q233),
    PageRank (q232), label propagation (q243), k-core (q291), this.
    Certified digit-for-digit: every sum in both engines is a
    DECIMAL(32,8) fold of 8-dp-rounded terms, and the only float ops
    (divide, sqrt) are IEEE correctly-rounded on identical inputs.

    100 TB story: a round is one edge-list join + one grouped decimal sum
    shuffled on the node id (edge-sized, never node-squared), plus a
    scalar norm to the driver; localCheckpoint keeps the plan
    round-count-independent.
    """
    co = _cograph_edges(spark, sf_dir)
    edges = graph.symmetrize(co).localCheckpoint(eager=True)
    return graph.eigencentrality(edges, iters=5).select(
        F.col("n").alias("part"), "score", "lambda_est"
    )


@query(
    "q294_clustering_coeff",
    oracle=f"""
    WITH {_COGRAPH_SQL},
    edges AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM co
                           UNION ALL SELECT s2, s1 FROM co),
    deg AS (SELECT src AS part, count(*) AS deg FROM edges GROUP BY 1),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM co e1
      JOIN co e2 ON e1.s2 = e2.s1
      JOIN co e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    ),
    tcount AS (
      SELECT part, count(*) AS n_tri FROM (
        SELECT a AS part FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    )
    SELECT deg.part, CAST(deg.deg AS BIGINT) AS deg,
           CAST(coalesce(tcount.n_tri, 0) AS BIGINT) AS n_tri,
           round(2.0 * coalesce(tcount.n_tri, 0)
                 / (deg.deg * (deg.deg - 1)), 6) AS cc
    FROM deg LEFT JOIN tcount USING (part)
    WHERE deg.deg >= 2
    """,
)
def q294_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (Watts-Strogatz 1998) per node of the
    part co-occurrence graph: cc = 2*triangles / (deg*(deg-1)) for nodes
    of degree >= 2 — the community-tightness audit that separates hub
    parts (high degree, low cc) from clique parts (dense neighborhoods).
    Reuses the oriented a<b<c triangle enumeration (q233: each triangle
    generated once, no /6 correction) joined against the symmetrized
    degree table.

    100 TB story: triangles are two equi-joins on oriented edges (fan-out
    bounded by the co-count threshold), degrees one grouped count; the
    final assembly is a node-keyed left join — nothing is
    neighborhood-squared outside the oriented join.
    """
    co = _cograph_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        graph.symmetrize(co)
        .groupBy(F.col("src").alias("part"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = graph.triangle_counts(co).withColumnRenamed("n_triangles", "n_tri")
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "part", "left")
        .select(
            "part",
            F.col("deg").cast("long").alias("deg"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.round(
                2.0 * F.coalesce("n_tri", F.lit(0)) / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("cc"),
        )
    )


@query(
    "q296_t_closeness",
    oracle="""
    WITH cells AS (
      SELECT lang, n_chars // 50 AS band, source, count(*) AS c
      FROM documents GROUP BY 1, 2, 3
    ),
    classes AS (
      SELECT lang, band, CAST(sum(c) AS BIGINT) AS k FROM cells GROUP BY 1, 2
    ),
    gm AS (
      SELECT source, sum(c) AS gc, sum(sum(c)) OVER () AS gtot
      FROM cells GROUP BY 1
    ),
    grid AS (
      SELECT cl.lang, cl.band, cl.k, g.source,
             g.gc * 1.0 / g.gtot AS q
      FROM classes cl CROSS JOIN gm g
    ),
    terms AS (
      SELECT grid.lang, grid.band, grid.k,
             CAST(round(abs(coalesce(cells.c, 0) * 1.0 / grid.k - grid.q), 8)
                  AS DECIMAL(32,8)) AS term
      FROM grid LEFT JOIN cells
        ON cells.lang = grid.lang AND cells.band = grid.band
       AND cells.source = grid.source
    )
    SELECT lang, band, k,
           CAST(0.5 * CAST(sum(term) AS DOUBLE) AS DOUBLE) AS t_dist,
           CAST(CASE WHEN 0.5 * CAST(sum(term) AS DOUBLE) > 0.2
                THEN 1 ELSE 0 END AS INT) AS violates_t02
    FROM terms GROUP BY 1, 2, 3
    """,
)
def q296_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li, Venkatasubramanian 2007) completing the
    privacy ladder (k-anonymity q239, l-diversity q286): per QI class
    (lang, 50-char band), the distance between the class's sensitive
    (source) distribution and the GLOBAL source distribution — equal
    ground metric, so EMD reduces to total variation 0.5*sum|p - q|,
    taken over the FULL source vocabulary (absent sources contribute
    |0 - q|, which the naive inner-join formulation silently drops).
    Per-term 8-dp rounding + DECIMAL fold keeps the <= 20-term sum
    order-independent and engine-exact.

    100 TB story: cells and the global marginal are vocabulary-bounded
    aggregates; the audit grid is classes x sources (bounded), built by
    broadcasting the tiny global marginal — nothing corpus-sized shuffles
    twice.
    """
    d = _t(spark, sf_dir, "documents")
    # ONE corpus scan: every downstream frame (classes, global marginal,
    # audit grid) derives from the vocabulary-bounded cells table, so
    # checkpoint it instead of re-scanning documents per branch
    cells = (
        d.groupBy("lang", F.expr("n_chars div 50").alias("band"), "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    classes = cells.groupBy("lang", "band").agg(F.sum("c").cast("long").alias("k"))
    glob = (
        cells.groupBy("source")
        .agg(F.sum("c").alias("gc"))
        .select(
            "source",
            (
                F.col("gc")
                * 1.0
                / F.sum("gc").over(
                    Window.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
            ).alias("q"),
        )
    )
    grid = classes.crossJoin(F.broadcast(glob))
    terms = grid.join(cells, ["lang", "band", "source"], "left").select(
        "lang",
        "band",
        "k",
        F.round(
            F.abs(F.coalesce("c", F.lit(0)) * 1.0 / F.col("k") - F.col("q")), 8
        )
        .cast("decimal(32,8)")
        .alias("term"),
    )
    t_dist = (0.5 * F.sum("term").cast("double")).cast("double")
    return terms.groupBy("lang", "band", "k").agg(
        t_dist.alias("t_dist"),
        F.when(t_dist > 0.2, 1).otherwise(0).cast("int").alias("violates_t02"),
    )


@query(
    "q297_mann_whitney",
    oracle="""
    WITH s AS (
      SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    dist AS (SELECT value, count(*) AS t FROM s GROUP BY 1),
    ranked AS (
      SELECT value, t,
             coalesce(CAST(sum(t) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               AS below
      FROM dist
    ),
    rr AS (SELECT value, (below + (t + 1) / 2.0) AS avg_rank, t FROM ranked),
    agg AS (
      SELECT CAST(sum(CASE WHEN s.grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN s.grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN s.grp = 1
                  THEN CAST(round(rr.avg_rank, 6) AS DECIMAL(32,6))
                  ELSE CAST(0 AS DECIMAL(32,6)) END) AS DOUBLE) AS r1
      FROM s JOIN rr USING (value)
    ),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS DOUBLE) AS tie_cube FROM dist
    )
    SELECT n1, n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 6) AS u1,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt((n1 * 1.0 * n2 / 12.0)
                        * ((n1 + n2 + 1)
                           - tie_cube / ((n1 + n2) * 1.0 * (n1 + n2 - 1)))),
                 6) AS z
    FROM agg CROSS JOIN ties
    """,
)
def q297_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (purchase vs error event values) —
    the distribution-free location test that backs A/B decisions when the
    Welch t-test's normality assumption (q281) is off. Average ranks for
    ties come from the VALUE-level distinct table (below-count + (t+1)/2),
    never a row-level window; the z-score uses the exact tie-corrected
    variance. Rank sums fold as DECIMAL(32,6) of 6-dp-rounded average
    ranks — order-independent and engine-exact; the KS test (q183) checks
    shape, this checks location, together the full two-sample screen.

    100 TB story: ranking is one groupBy to the distinct-value table plus
    one ordered cumulative window over values (bounded by value
    cardinality, not row count); the rank-sum join back is value-keyed.
    """
    e = _t(spark, sf_dir, "events")
    s = e.filter(F.col("event_type").isin("purchase", "error")).select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
    )
    dist = s.groupBy("value").agg(F.count(F.lit(1)).alias("t"))
    ranked = dist.select(
        "value",
        "t",
        F.coalesce(
            F.sum("t").over(
                Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("below"),
    )
    rr = ranked.select(
        "value", (F.col("below") + (F.col("t") + 1) / 2.0).alias("avg_rank")
    )
    agg = (
        s.join(rr, "value")
        .agg(
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n2"),
            F.sum(
                F.when(
                    F.col("grp") == 1,
                    F.round("avg_rank", 6).cast("decimal(32,6)"),
                ).otherwise(F.lit(0).cast("decimal(32,6)"))
            )
            .cast("double")
            .alias("r1"),
        )
    )
    ties = dist.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("double")
        .alias("tie_cube")
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    n, m = F.col("n1"), F.col("n2")
    sigma = F.sqrt(
        (n * 1.0 * m / 12.0)
        * ((n + m + 1) - F.col("tie_cube") / ((n + m) * 1.0 * (n + m - 1)))
    )
    return agg.crossJoin(F.broadcast(ties)).select(
        "n1",
        "n2",
        F.round(u1, 6).alias("u1"),
        F.round((u1 - n * m / 2.0) / sigma, 6).alias("z"),
    )


def _q298_pca_oracle(iters: int = 4, dim: int = 64) -> str:
    """Generated oracle for q298: integer-quantized Gram + dim-sums give
    the CENTERED covariance as cov = g/n - (s_i/n)(s_j/n) — exact BIGINT
    folds feeding IEEE double ops on identical inputs, so the hot path
    never touches a decimal aggregate (the q219 quantization recipe);
    the 64x64 power-iteration rounds then follow the q293 DECIMAL(32,8)
    8-dp policy (cheap at 4096 rows)."""
    ctes = [
        "nn AS (SELECT count(*) AS n FROM embeddings)",
        f"qx AS MATERIALIZED (SELECT vec_id, t.i AS i, "
        f"CAST(floor(CAST(embedding[t.i + 1] AS DOUBLE) * 10000) AS BIGINT) AS q "
        f"FROM embeddings CROSS JOIN "
        f"(SELECT unnest(generate_series(0, {dim - 1})) AS i) t)",
        "gram AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS g "
        "FROM qx a JOIN qx b USING (vec_id) GROUP BY 1, 2)",
        "sv AS MATERIALIZED (SELECT i, sum(q) AS s FROM qx GROUP BY 1)",
        "cov AS MATERIALIZED (SELECT gram.i, gram.j, "
        "round((CAST(gram.g AS DOUBLE) / (SELECT n FROM nn) "
        " - (CAST(si.s AS DOUBLE) / (SELECT n FROM nn)) "
        " * (CAST(sj.s AS DOUBLE) / (SELECT n FROM nn))) / 100000000.0, 8) AS cv "
        "FROM gram JOIN sv si ON gram.i = si.i JOIN sv sj ON gram.j = sj.i)",
        "tr AS (SELECT CAST(sum(CAST(round(cv, 8) AS DECIMAL(32,8))) AS DOUBLE)"
        " AS trace FROM cov WHERE i = j)",
        "v0 AS MATERIALIZED (SELECT i AS j, CAST(0.125 AS DOUBLE) AS v FROM sv)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"w{k} AS MATERIALIZED (SELECT cov.i,"
            f" CAST(sum(CAST(cov.cv AS DECIMAL(18,8)) * CAST(p.v AS DECIMAL(18,8)))"
            f" AS DOUBLE) AS w"
            f" FROM cov JOIN v{k - 1} p ON cov.j = p.j GROUP BY 1)"
        )
        ctes.append(
            f"n{k} AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(round(w * w, 8)"
            f" AS DECIMAL(32,8))) AS DOUBLE)) AS nrm FROM w{k})"
        )
        ctes.append(
            f"v{k} AS MATERIALIZED (SELECT i AS j,"
            f" round(w / (SELECT nrm FROM n{k}), 8) AS v FROM w{k})"
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {chain}
    SELECT CAST(j AS BIGINT) AS dim, v AS loading,
           (SELECT nrm FROM n{iters}) AS lambda_est,
           round((SELECT nrm FROM n{iters}) / (SELECT trace FROM tr), 6)
             AS explained_ratio
    FROM v{iters}
    """


@query("q298_pca_power_iter", oracle=_q298_pca_oracle())
def q298_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the CENTERED embedding corpus by
    distributed covariance + 4 power-iteration rounds — the statistic
    q219's uncentered Gram direction cannot produce: mean removal makes
    this PCA proper (ABTT-style anisotropy is measured after centering),
    and the eigenvalue/trace ratio is the explained-variance number an
    embedding-health dashboard actually reports. Complements
    q219_pca_power_iteration (dominant singular direction, integer
    quantization); this one follows the q293 decimal-fold policy. The covariance is the ONLY
    corpus-sized pass (posexplode long form, vec_id-keyed pair join,
    grouped decimal fold to d^2 = 4096 cells); the iteration then runs on
    the fixed 64x64 matrix, so its cost is INDEPENDENT of corpus size.
    Emits each dimension's loading, the Rayleigh eigenvalue estimate
    ||C v||, and the explained-variance ratio lambda/trace(C). Certified
    digit-for-digit: values quantize scan-side to BIGINT (floor(1e4*x),
    the q219 recipe), the Gram and per-dim sums fold as EXACT integer
    aggregates, and cov = g/n - (s_i/n)(s_j/n) is IEEE double arithmetic
    on identical integers — a decimal aggregate over the N*d^2 product
    rows (the first cut) ran 21.7 s at sf0.1 vs 2.5 s for the integer
    Gram. The matvec multiplies EXACT decimals (18,8 x 18,8 -> 16-scale
    product) instead of rounding the float product: cv*0.125 lands on an
    exact half-tie whenever cv's 8th digit is 4 mod 8 — a structural 1/8
    of cells where the engines' tie-breaking diverges.

    100 TB story: one integer Gram shuffle onto 4096 cells (map-side
    combine does the heavy reduction — same cells regardless of N);
    matvec rounds shuffle 4096 rows; localCheckpoint keeps plans
    round-count-independent.
    """
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select(
        "vec_id",
        F.col("i").cast("long").alias("i"),
        F.floor(F.col("xf").cast("double") * 10000).cast("long").alias("q"),
    )
    a = flat.select("vec_id", "i", F.col("q").alias("qa"))
    b = flat.select("vec_id", F.col("i").alias("j"), F.col("q").alias("qb"))
    gram = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("g"))
    )
    sv = flat.groupBy("i").agg(F.sum("q").alias("s"))
    nd = F.lit(float(n))
    cov = (
        gram.join(F.broadcast(sv.select(F.col("i"), F.col("s").alias("si"))), "i")
        .join(F.broadcast(sv.select(F.col("i").alias("j"), F.col("s").alias("sj"))), "j")
        .select(
            "i",
            "j",
            F.round(
                (
                    F.col("g").cast("double") / nd
                    - (F.col("si").cast("double") / nd)
                    * (F.col("sj").cast("double") / nd)
                )
                / 1e8,
                8,
            ).alias("cv"),
        )
        .localCheckpoint(eager=True)
    )
    tr = cov.filter(F.col("i") == F.col("j")).agg(
        F.sum(F.round("cv", 8).cast("decimal(32,8)")).cast("double").alias("trace")
    )
    v = sv.select(F.col("i").alias("j"), F.lit(0.125).alias("v"))
    nrm = None
    for _ in range(4):
        w = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.col("cv").cast("decimal(18,8)")
                    * F.col("v").cast("decimal(18,8)")
                )
                .cast("double")
                .alias("w")
            )
        )
        nrm = w.agg(
            F.sqrt(
                F.sum(F.round(F.col("w") * F.col("w"), 8).cast("decimal(32,8)")).cast(
                    "double"
                )
            ).alias("nrm")
        )
        v = (
            w.crossJoin(F.broadcast(nrm))
            .select(F.col("i").alias("j"), F.round(F.col("w") / F.col("nrm"), 8).alias("v"))
            .localCheckpoint(eager=True)
        )
    return (
        v.crossJoin(F.broadcast(nrm))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("j").cast("long").alias("dim"),
            F.col("v").alias("loading"),
            F.col("nrm").alias("lambda_est"),
            F.round(F.col("nrm") / F.col("trace"), 6).alias("explained_ratio"),
        )
    )


@query(
    "q299_blocking_quality",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             md5(substr(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), 1, 80))
               AS fp,
             lang || '|' || CAST(n_chars // 100 AS VARCHAR) AS blk
      FROM documents
    ),
    n AS (SELECT count(*) AS n_docs FROM d),
    blocks AS (SELECT blk, count(*) AS s FROM d GROUP BY 1),
    cand AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                    CAST(sum(s * (s - 1) / 2) AS BIGINT) AS cand_pairs
             FROM blocks),
    truth AS (SELECT CAST(sum(c * (c - 1) / 2) AS BIGINT) AS true_pairs
              FROM (SELECT fp, count(*) AS c FROM d GROUP BY 1)),
    tib AS (SELECT CAST(sum(c * (c - 1) / 2) AS BIGINT) AS true_in_block
            FROM (SELECT fp, blk, count(*) AS c FROM d GROUP BY 1, 2))
    SELECT CAST(n.n_docs AS BIGINT) AS n_docs,
           cand.n_blocks, cand.cand_pairs, truth.true_pairs, tib.true_in_block,
           round(1.0 - cand.cand_pairs * 2.0 / (n.n_docs * (n.n_docs - 1)), 6)
             AS reduction_ratio,
           round(CASE WHEN truth.true_pairs = 0 THEN 1.0
                 ELSE tib.true_in_block * 1.0 / truth.true_pairs END, 6)
             AS pairs_completeness
    FROM n CROSS JOIN cand CROSS JOIN truth CROSS JOIN tib
    """,
)
def q299_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-scheme quality audit for entity resolution (Christen
    2012): for the (lang, 100-char band) blocking key the ER join (q207)
    and the Fellegi-Sunter weights (q288) run on, report REDUCTION RATIO
    (candidate pairs vs all N(N-1)/2 pairs — how much work blocking
    saves) and PAIRS COMPLETENESS (ground-truth duplicate pairs, by the
    q08 normalized-prefix fingerprint, that land in the same block — the
    recall blocking silently trades away). The metric pair is what
    decides whether a blocking key is production-safe: RR near 1 with PC
    near 1, never one without the other.

    100 TB story: pure counting — three map-side-combining groupBys
    (block sizes, fingerprint group sizes, their intersection) and
    four scalar aggregates cross-joined into one row; candidate pairs
    are COUNTED via s*(s-1)/2, never materialized.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        _prefix_fp().alias("fp"),
        F.concat_ws("|", "lang", F.expr("n_chars div 100")).alias("blk"),
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    blocks = d.groupBy("blk").agg(F.count(F.lit(1)).alias("s"))
    cand = blocks.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.expr("s * (s - 1) div 2")).cast("long").alias("cand_pairs"),
    )
    truth = (
        d.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("true_pairs"))
    )
    tib = (
        d.groupBy("fp", "blk")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("true_in_block"))
    )
    return (
        n.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(truth))
        .crossJoin(F.broadcast(tib))
        .select(
            "n_docs",
            "n_blocks",
            "cand_pairs",
            "true_pairs",
            "true_in_block",
            F.round(
                1.0
                - F.col("cand_pairs") * 2.0 / (F.col("n_docs") * (F.col("n_docs") - 1)),
                6,
            ).alias("reduction_ratio"),
            F.round(
                F.when(F.col("true_pairs") == 0, 1.0).otherwise(
                    F.col("true_in_block") * 1.0 / F.col("true_pairs")
                ),
                6,
            ).alias("pairs_completeness"),
        )
    )


@query("q300_streaming_hist_drain")
def q300_streaming_hist_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING histogram-sketch drain twinning the batch q292: the
    (parity-half, 128-bin) cell counts accumulate in a COMPLETE-mode
    streaming aggregation across 2 micro-batches — the source is staged
    as one file PER HALF with maxFilesPerTrigger=1, so the cross-batch
    state merge IS the half-sketch merge the batch query certifies — then
    the drained state feeds the exact same assembly
    (:func:`_hist_sketch_assembly`): merge certificate against the
    batch-direct histogram, p50/p95/p99 interpolation, exact-order-
    statistic audit. One sketch, two execution models, one hash-checked
    answer (the oracle IS q292's oracle).

    Scale notes: the streaming agg is all-JVM (no Python stateful
    operator) with O(256) state cells; the drain stages narrow
    (shuffle=8, fresh checkpoint, scratch cleaned in try/finally).
    """
    import shutil
    import tempfile

    o = _t(spark, sf_dir, "orders")
    vals, binned = _order_price_bins(o)
    work = tempfile.mkdtemp(prefix="q300_")
    src_dir = f"{work}/src"
    sink = f"{work}/hist"
    try:
        import glob
        import os

        # one file per half: batch 1 streams half 0, batch 2 half 1 —
        # state after the drain holds the merged sketch
        os.makedirs(src_dir)
        for idx, hv in enumerate((0, 1), start=1):
            binned.filter(F.col("half") == hv).repartition(1).write.parquet(
                f"{work}/h{hv}"
            )
            part = sorted(glob.glob(f"{work}/h{hv}/part-*.parquet"))[0]
            dst = f"{src_dir}/{idx:03d}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 10 * idx, 1_000_000_000 + 10 * idx))

        stream = (
            spark.readStream.schema("half LONG, bin LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        agg = stream.groupBy("half", "bin").agg(F.count(F.lit(1)).alias("c"))
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                agg.writeStream.outputMode("complete")
                .foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("overwrite").parquet(sink)
                )
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q300: streaming histogram drain did not finish within 300 s — "
                    "refusing to assemble from a partial sketch"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        hb = spark.read.parquet(sink).select("half", "bin", "c")
        out = _hist_sketch_assembly(spark, vals, binned, hb)
        out = out.localCheckpoint(eager=True)  # materialize before cleanup
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the streaming drain must reproduce the batch sketch's oracle exactly —
# complete-mode state and the batch groupBy are two forms of one histogram
ORACLE["q300_streaming_hist_drain"] = ORACLE["q292_quantile_hist_sketch"]


@query(
    "q301_link_prediction",
    oracle=f"""
    WITH {_COGRAPH_SQL},
    edges AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM co
                           UNION ALL SELECT s2, s1 FROM co),
    deg AS (SELECT src AS z, count(*) AS dg FROM edges GROUP BY 1),
    paths AS (
      SELECT e1.dst AS u, e2.dst AS w, e1.src AS z
      FROM edges e1 JOIN edges e2 ON e1.src = e2.src
      WHERE e1.dst < e2.dst
    ),
    cand AS (
      SELECT p.u, p.w,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(CAST(round(1.0 / ln(d.dg), 8) AS DECIMAL(32,8)))
                  AS DOUBLE) AS adamic_adar
      FROM paths p JOIN deg d ON p.z = d.z
      WHERE d.dg > 1
      GROUP BY 1, 2
    )
    SELECT cand.u, cand.w, cand.common_neighbors,
           cand.adamic_adar AS adamic_adar
    FROM cand
    LEFT JOIN co ON co.s1 = cand.u AND co.s2 = cand.w
    WHERE co.s1 IS NULL
    """,
)
def q301_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the part co-occurrence graph (Liben-Nowell &
    Kleinberg 2003): for every NON-edge pair sharing common
    neighbors (>= 1), the common-neighbor count and the Adamic-Adar score
    (sum 1/ln(deg(z)) over shared neighbors z, degree-1 hubs excluded
    since ln(1)=0) — the "parts that should co-occur but don't yet"
    recommendation feed. Candidates come from 2-hop path enumeration
    with the existing-edge set anti-joined away; AA contributions fold
    as DECIMAL(32,8) of 8-dp-rounded terms (q293 policy) and are emitted
    at full 8-dp precision — a final round(.,6) would hit exact halfway
    ties (8-dp sums can end ...5 at the 7th digit) where the engines'
    rounding modes differ. (A cn >= 2 floor empties at sf0.1's sparser
    co-graph, so the floor is the structural one: >= 1 shared neighbor.)

    100 TB story: the 2-hop join fans out per-node as deg^2, but the
    co-count >= 2 threshold bounds degree (the same arboricity argument
    as the q233 triangle join); the anti-join is edge-keyed; nothing is
    node-squared globally. The cn >= 2 floor keeps the candidate table
    recommendation-sized.
    """
    co = _cograph_edges(spark, sf_dir).localCheckpoint(eager=True)
    edges = graph.symmetrize(co)
    deg = edges.groupBy(F.col("src").alias("z")).agg(F.count(F.lit(1)).alias("dg"))
    e1 = edges.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    e2 = edges.select(F.col("src").alias("z"), F.col("dst").alias("w"))
    paths = e1.join(e2, "z").filter(F.col("u") < F.col("w"))
    cand = (
        paths.join(deg.filter(F.col("dg") > 1), "z")
        .groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum(F.round(1.0 / F.log(F.col("dg")), 8).cast("decimal(32,8)"))
            .cast("double")
            .alias("adamic_adar"),
        )
    )
    return (
        cand.join(
            co,
            (co.s1 == cand.u) & (co.s2 == cand.w),
            "left_anti",
        )
        .select("u", "w", "common_neighbors", "adamic_adar")
    )


@query(
    "q302_isotonic_calibration",
    oracle="""
    WITH s AS (
      SELECT least(CAST(floor(value / 10) AS BIGINT), 9) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'error', 'click')
    ),
    b AS (
      SELECT bin, count(*) AS n, sum(y) AS pos FROM s GROUP BY 1
    ),
    c AS (
      SELECT bin, n, pos,
             sum(n) OVER (ORDER BY bin) AS cn,
             sum(pos) OVER (ORDER BY bin) AS cp
      FROM b
    ),
    grid AS (
      SELECT i.bin AS b, j.bin AS j, k.bin AS k,
             (k.cp - j.cp + j.pos) * 1.0 / (k.cn - j.cn + j.n) AS avg_jk
      FROM c i JOIN c j ON j.bin <= i.bin JOIN c k ON k.bin >= i.bin
    ),
    inner_max AS (
      SELECT b, k, max(avg_jk) AS m FROM grid GROUP BY 1, 2
    ),
    iso AS (
      SELECT b AS bin, min(m) AS iso FROM inner_max GROUP BY 1
    ),
    fit AS (
      SELECT c.bin, CAST(c.n AS BIGINT) AS n,
             round(c.pos * 1.0 / c.n, 6) AS rate,
             round(iso.iso, 6) AS iso
      FROM c JOIN iso USING (bin)
    ),
    fit2 AS (
      SELECT bin, n, rate, iso,
             CASE WHEN iso >= lag(iso, 1, iso) OVER (ORDER BY bin)
                  THEN 1 ELSE 0 END AS ok
      FROM fit
    )
    SELECT bin, n, rate, iso, CAST(min(ok) OVER () AS INT) AS monotone_ok
    FROM fit2
    """,
)
def q302_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration of purchase propensity against the
    10-unit value band — the PAV fit, computed by the exact minimax
    identity iso(b) = min_{k>=b} max_{j<=b} mean(y_j..y_k) (Barlow et al.
    1972), which needs NO sequential pooling loop: with 10 bins the
    (j, b, k) grid is <= 1000 rows, every block mean is a ratio of exact
    integer cumulative sums, and min/max comparisons of identical doubles
    are rounding-free — so both engines agree digit-for-digit with zero
    quantization. The monotone_ok certificate re-proves the isotonic
    property inside the hash gate. Complements q280 (calibration bins
    report raw reliability; this produces the monotone calibration MAP
    a score consumer actually applies).

    100 TB story: the corpus contributes ONE map-side-combining groupBy
    onto 10 cells; the cubic minimax runs on the 10-row frame (bounded by
    bin count, never rows). The classic O(n) PAV applies per-partition
    only after this same binning step at any scale.
    """
    e = _t(spark, sf_dir, "events")
    s = e.filter(F.col("event_type").isin("purchase", "error", "click")).select(
        F.least(F.floor(F.col("value") / 10).cast("long"), F.lit(9).cast("long")).alias(
            "bin"
        ),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = s.groupBy("bin").agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
    wcum = Window.orderBy("bin")
    c = b.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("pos").over(wcum).alias("cp"),
    ).localCheckpoint(eager=True)
    i = c.select(F.col("bin").alias("b"))
    j = c.select(
        F.col("bin").alias("j"),
        F.col("pos").alias("jpos"),
        F.col("n").alias("jn"),
        F.col("cp").alias("jcp"),
        F.col("cn").alias("jcn"),
    )
    k = c.select(
        F.col("bin").alias("k"), F.col("cp").alias("kcp"), F.col("cn").alias("kcn")
    )
    grid = (
        i.join(j, F.col("j") <= F.col("b"))
        .join(k, F.col("k") >= F.col("b"))
        .select(
            "b",
            "k",
            (
                (F.col("kcp") - F.col("jcp") + F.col("jpos"))
                * 1.0
                / (F.col("kcn") - F.col("jcn") + F.col("jn"))
            ).alias("avg_jk"),
        )
    )
    inner_max = grid.groupBy("b", "k").agg(F.max("avg_jk").alias("m"))
    iso = inner_max.groupBy(F.col("b").alias("bin")).agg(F.min("m").alias("iso"))
    fit = c.join(iso, "bin").select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("pos") * 1.0 / F.col("n"), 6).alias("rate"),
        F.round("iso", 6).alias("iso"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return fit.select(
        "bin",
        "n",
        "rate",
        "iso",
        F.min(
            F.when(
                F.col("iso")
                >= F.coalesce(
                    F.lag("iso", 1).over(Window.orderBy("bin")), F.col("iso")
                ),
                1,
            )
            .otherwise(0)
        )
        .over(wall)
        .cast("int")
        .alias("monotone_ok"),
    )


@query(
    "q303_sprt_monitor",
    oracle="""
    WITH s AS (
      SELECT epoch_ns(ts) AS ord_ns, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    walk AS (
      SELECT ord_ns, event_id,
             row_number() OVER w AS i,
             2 * sum(x) OVER w - row_number() OVER w AS d
      FROM s WINDOW w AS (ORDER BY ord_ns, event_id)
    ),
    crossing AS (
      SELECT i, d FROM walk WHERE abs(d) >= 15 ORDER BY i LIMIT 1
    ),
    fin AS (SELECT max(i) AS n_total FROM walk)
    SELECT CAST(coalesce(crossing.i, fin.n_total) AS BIGINT) AS n_obs,
           CAST(CASE WHEN crossing.i IS NULL THEN 0
                WHEN crossing.d > 0 THEN 1 ELSE -1 END AS INT) AS decision,
           round(coalesce(crossing.d, 0) * ln(11.0 / 9.0), 6) AS llr,
           CAST(15 AS BIGINT) AS d_threshold
    FROM fin LEFT JOIN crossing ON TRUE
    """,
)
def q303_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential A/B monitor (Wald 1945) over the purchase-vs-
    error stream in arrival order: testing p0=0.45 vs p1=0.55 at
    alpha=beta=0.05, the log-likelihood ratio after i observations is
    (2*S_i - i)*ln(11/9), so the stopping rule |LLR| >= ln(19) reduces to
    the EXACT INTEGER test |2*S_i - i| >= 15 — no float enters the
    decision at all (the sequential complement of the fixed-sample Welch
    q281 / Mann-Whitney q297). Emits the stopping sample size, the
    decision (+1 accept H1, -1 accept H0, 0 still running at stream end),
    and the boundary LLR.

    100 TB story: the random walk is one cumulative window per ordered
    key-range (in production, per experiment arm — a keyed window);
    the first-crossing is a filter + global min, no iteration. The
    monitor's whole point at scale: most experiments stop after a
    PREFIX of the data, and the integer test makes early-stop decisions
    retry-stable.
    """
    e = _t(spark, sf_dir, "events")
    s = e.filter(F.col("event_type").isin("purchase", "error")).select(
        F.col("ts").alias("ord_ns"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
    )
    # two-phase bucketed prefix sums (day buckets — offsets frame bounded
    # by the time domain): bit-identical to the naive total-order window
    # without single-partitioning the whole stream (round-9 guard fix)
    from phoebe_spark.operators.layout import global_prefix_sums

    walk = (
        global_prefix_sums(
            s,
            order_col="ord_ns",
            tie_col="event_id",
            bucket=F.expr("ord_ns div 86400000000000"),  # ns -> day
            sum_cols=["x"],
            rn_col="i",
        )
        .select("i", (2 * F.col("cum_x") - F.col("i")).alias("d"))
        .localCheckpoint(eager=True)
    )
    crossing = (
        walk.filter(F.abs("d") >= 15)
        .orderBy("i")
        .limit(1)
        .select(F.col("i").alias("ci"), F.col("d").alias("cd"))
    )
    fin = walk.agg(F.max("i").alias("n_total"))
    return (
        fin.join(F.broadcast(crossing), F.lit(True), "left")
        .select(
            F.coalesce("ci", "n_total").cast("long").alias("n_obs"),
            F.when(F.col("ci").isNull(), 0)
            .when(F.col("cd") > 0, 1)
            .otherwise(-1)
            .cast("int")
            .alias("decision"),
            F.round(
                F.coalesce("cd", F.lit(0)) * float(__import__("math").log(11.0 / 9.0)),
                6,
            ).alias("llr"),
            F.lit(15).cast("long").alias("d_threshold"),
        )
    )


def _q304_ams_oracle(n_est: int = 16) -> str:
    """Generated oracle for q304: estimator j's +-1 sign is the parity of
    the j-th hex digit of ONE md5(key) per row (16 hashes/row benched
    2x slower) — replayable in any engine with md5; the 16 sign-sums are
    exact BIGINT folds."""
    sign = (
        "CASE WHEN substr(h, {pos}, 1)"
        " IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END"
    )
    zs = ",\n           ".join(
        f"sum({sign.format(pos=j + 1)}) AS z{j}" for j in range(n_est)
    )
    ests = ", ".join(f"CAST(z{j} AS DOUBLE) * z{j}" for j in range(n_est))
    return f"""
    WITH hashed AS (
      SELECT md5(CAST(l_partkey AS VARCHAR)) AS h FROM lineitem
    ),
    signs AS (
      SELECT {zs}
      FROM hashed
    ),
    exact AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS f2, CAST(count(*) AS BIGINT) AS n_keys
      FROM (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1)
    ),
    est AS (
      SELECT CAST(median(x) AS DOUBLE) AS f2_est
      FROM (SELECT unnest([{ests}]) AS x FROM signs)
    )
    SELECT exact.f2, exact.n_keys, est.f2_est,
           round(abs(est.f2_est - exact.f2) / exact.f2, 6) AS rel_err
    FROM exact CROSS JOIN est
    """


@query("q304_ams_f2_sketch", oracle=_q304_ams_oracle())
def q304_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment (F2) sketch over lineitem part keys (Alon-
    Matias-Szegedy 1996) — the one-pass self-join-size estimator a
    planner consults before committing to a partkey-partkey join: 16
    independent +-1 sign projections (estimator j reads the parity of hex
    digit j of ONE md5(key) per row — 16 separate hashes benched 2x
    slower — replayed exactly by the oracle), each
    Z_j = sum of signs folding as an exact BIGINT, estimate = median of
    Z_j^2, audited against the exact F2 = sum(c^2) from the full key
    groupBy. Joins the sketch family (HLL counts distinct, KMV sets, CMS
    points, q292 quantiles — this one estimates JOIN SIZES).

    100 TB story: the sketch is ONE scan with 16 map-side-combining
    integer sums — no shuffle wider than 16 cells, while the exact side
    (the audit, not the product) pays the full key-shuffle the sketch
    exists to avoid. Sign-sums are trivially mergeable across executors
    and across corpus shards (add the Z vectors).
    """
    li = _t(spark, sf_dir, "lineitem")
    odd = ("1", "3", "5", "7", "9", "b", "d", "f")
    hashed = li.select(F.md5(F.col("l_partkey").cast("string")).alias("h"))

    def sign(j: int) -> F.Column:
        return (
            F.when(F.substring("h", j + 1, 1).isin(*odd), 1).otherwise(-1)
        )

    signs = hashed.agg(
        *[F.sum(sign(j)).alias(f"z{j}") for j in range(16)]
    )
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * F.col("c")).cast("long").alias("f2"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
        )
    )
    est = (
        signs.select(
            F.explode(
                F.array(
                    *[
                        (F.col(f"z{j}").cast("double") * F.col(f"z{j}")).alias("x")
                        for j in range(16)
                    ]
                )
            ).alias("x")
        )
        .agg(F.expr("median(x)").cast("double").alias("f2_est"))
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            "f2",
            "n_keys",
            "f2_est",
            F.round(F.abs(F.col("f2_est") - F.col("f2")) / F.col("f2"), 6).alias(
                "rel_err"
            ),
        )
    )


@query(
    "q305_corpus_merkle",
    oracle="""
    WITH leaves AS (
      SELECT doc_id, doc_id % 16 AS bucket, md5(text) AS h
      FROM documents
    ),
    buckets AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             md5(string_agg(h, '' ORDER BY doc_id)) AS bucket_hash
      FROM leaves GROUP BY 1
    ),
    root AS (
      SELECT md5(string_agg(bucket_hash, '' ORDER BY bucket)) AS root_hash
      FROM buckets
    )
    SELECT buckets.bucket, buckets.n_docs, buckets.bucket_hash, root.root_hash
    FROM buckets CROSS JOIN root
    """,
)
def q305_corpus_merkle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level Merkle fingerprint of the document corpus: leaf =
    md5(text), 16 id-sharded bucket hashes = md5(leaf hashes concatenated
    in doc_id order), root = md5(bucket hashes in bucket order) — the
    content-addressing layer a 100 TB pipeline versions datasets with:
    two snapshots compare in O(1) at the root, and a mismatch drills down
    BUCKET-BY-BUCKET to localize the changed shard before q193's row-level
    snapshot diff runs. The ordered concatenation is deterministic in both
    engines (sort_array over (doc_id, hash) structs vs string_agg ORDER
    BY), so the fingerprint itself sits in the hash gate.

    100 TB story: one scan, one shuffle onto 16 bucket cells; per-bucket
    state is the sorted leaf-hash stream (in production, buckets are
    file-aligned so each bucket hash folds within its own partition and
    only 16 strings ever move).
    """
    d = _t(spark, sf_dir, "documents")
    leaves = d.select(
        "doc_id", (F.col("doc_id") % 16).alias("bucket"), F.md5("text").alias("h")
    )
    buckets = (
        leaves.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("doc_id"), F.col("h")))
                        ),
                        lambda s: s["h"],
                    ),
                )
            ).alias("bucket_hash"),
        )
    )
    root = buckets.agg(
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("bucket"), F.col("bucket_hash")))
                    ),
                    lambda s: s["bucket_hash"],
                ),
            )
        ).alias("root_hash")
    )
    return buckets.crossJoin(F.broadcast(root))


@query("q306_streaming_sprt_drain")
def q306_streaming_sprt_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SPRT drain twinning the batch monitor q303: the
    purchase-vs-error walk arrives as three sequence-ordered micro-
    batches, the integer state (n, s, frozen decision) folds across them
    (:func:`stateful.streaming_sprt`), and the drained final state must
    reproduce q303's oracle row exactly — pure-integer state makes
    micro-batch boundaries provably invisible. One sequential test, two
    execution models, one hash-checked answer; this is the form the
    monitor actually ships in (an experiment decision service watching
    the live event feed and stopping EARLY).

    Scale notes: five integers of state per experiment key; the drain
    stages narrow (shuffle=8, fresh checkpoint, scratch cleaned)."""
    import glob
    import math
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming.stateful import streaming_sprt

    e = _t(spark, sf_dir, "events")
    s = e.filter(F.col("event_type").isin("purchase", "error")).select(
        F.row_number()
        .over(Window.orderBy("ts", "event_id"))
        .cast("long")
        .alias("i"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
        F.lit("exp1").alias("key"),
    )
    work = tempfile.mkdtemp(prefix="q306_")
    src_dir = f"{work}/src"
    try:
        os.makedirs(src_dir)
        n_total = s.count()
        cut1, cut2 = n_total // 3, 2 * n_total // 3
        for idx, (lo_i, hi_i) in enumerate(
            ((0, cut1), (cut1, cut2), (cut2, n_total + 1)), start=1
        ):
            part = s.filter((F.col("i") > lo_i) & (F.col("i") <= hi_i))
            part.coalesce(1).write.parquet(f"{work}/stage{idx}")
            pf = glob.glob(f"{work}/stage{idx}/part-*.parquet")[0]
            dst = f"{src_dir}/{idx:03d}.parquet"
            shutil.copyfile(pf, dst)
            os.utime(dst, (1_000_000_000 + 10 * idx, 1_000_000_000 + 10 * idx))

        stream = (
            spark.readStream.schema("i LONG, x INT, key STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = streaming_sprt(stream, d_threshold=15)
        sink = f"{work}/sprt"
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                out.writeStream.outputMode("update")
                .foreachBatch(lambda bdf, _bid: bdf.write.mode("append").parquet(sink))
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "q306: streaming SPRT drain did not finish within 300 s — "
                    "refusing to report a partial decision"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

        states = spark.read.parquet(sink)
        final = (
            states.withColumn(
                "rk",
                F.row_number().over(Window.partitionBy("key").orderBy(F.col("n").desc())),
            )
            .filter(F.col("rk") == 1)
            .select(
                F.col("n_obs").cast("long").alias("n_obs"),
                F.col("decision").cast("int").alias("decision"),
                F.round(F.col("d_stop") * float(math.log(11.0 / 9.0)), 6).alias("llr"),
                F.lit(15).cast("long").alias("d_threshold"),
            )
            .localCheckpoint(eager=True)
        )
        return final
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the streaming drain must reproduce the batch monitor's oracle exactly —
# the integer walk state and the batch window are two forms of one test
ORACLE["q306_streaming_sprt_drain"] = ORACLE["q303_sprt_monitor"]


@query(
    "q307_grouped_conformal",
    oracle="""
    WITH dc AS (
      SELECT event_type AS k, epoch_ns(ts) // 1000000000 // 86400 AS day,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT min(day) AS lo FROM dc),
    grid AS (
      SELECT k, d, lo FROM (SELECT DISTINCT k FROM dc)
      CROSS JOIN (SELECT unnest(generate_series(0, 29)) AS d, lo FROM b)
    ),
    dense AS (
      SELECT g.k, g.d, CAST(coalesce(dc.c, 0) AS BIGINT) AS c
      FROM grid g LEFT JOIN dc ON dc.k = g.k AND dc.day = g.lo + g.d
    ),
    resid AS (
      SELECT a.k, a.d, abs(a.c - p.c) AS r
      FROM dense a JOIN dense p ON p.k = a.k AND p.d = a.d - 7
      WHERE a.d >= 7
    ),
    calib AS (
      SELECT k, r, row_number() OVER (PARTITION BY k ORDER BY r, d) AS rn,
             count(*) OVER (PARTITION BY k) AS n_cal
      FROM resid WHERE d % 2 = 0
    ),
    qh AS (
      SELECT k, r AS q_hat, n_cal FROM calib
      WHERE rn = ((n_cal + 1) * 4 + 4) // 5
    ),
    test AS (SELECT k, r FROM resid WHERE d % 2 = 1)
    SELECT qh.k AS event_type, qh.n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           qh.q_hat,
           round(avg(CASE WHEN test.r <= qh.q_hat THEN 1.0 ELSE 0.0 END), 6)
             AS coverage,
           CAST(0.8 AS DOUBLE) AS target
    FROM test JOIN qh USING (k)
    GROUP BY 1, 2, 4
    """,
)
def q307_grouped_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED split-conformal intervals — q290's distribution-free
    calibration run per event type in ONE pass (the q274 grouped-Holt
    treatment): every key gets its own calibration order statistic
    (row_number window partitioned by key, integer ceil rank) and its own
    test-split coverage. This is the million-forecasters shape the q290
    docstring promises: per-series interval calibration with NO per-key
    loop, just key-partitioned windows over the residual frame.

    100 TB story: residuals are O(keys x days) from one map-side daily
    rollup; the order statistic is a per-key window over calibration rows
    only; coverage is one grouped aggregate. Nothing is per-key
    driver-side.
    """
    e = _t(spark, sf_dir, "events")
    dc = e.groupBy(
        F.col("event_type").alias("k"),
        F.expr("(ts div 1000000000) div 86400").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    lo = dc.agg(F.min("day").alias("lo"))
    grid = (
        dc.select("k")
        .distinct()
        .crossJoin(
            F.broadcast(
                lo.select(
                    F.explode(F.sequence(F.lit(0), F.lit(29))).alias("d"), "lo"
                )
            )
        )
    )
    dense = grid.join(
        dc, (grid.k == dc.k) & (grid.lo + grid.d == dc.day), "left"
    ).select(grid.k, grid.d.alias("d"), F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    a = dense.select(F.col("k"), F.col("d").alias("ad"), F.col("c").alias("ac"))
    p = dense.select(
        F.col("k").alias("pk"), F.col("d").alias("pd"), F.col("c").alias("pc")
    )
    resid = (
        a.join(p, (F.col("pk") == F.col("k")) & (F.col("pd") == F.col("ad") - 7))
        .filter(F.col("ad") >= 7)
        .select("k", F.col("ad").alias("d"), F.abs(F.col("ac") - F.col("pc")).alias("r"))
    ).localCheckpoint(eager=True)
    wk = Window.partitionBy("k")
    calib = resid.filter(F.col("d") % 2 == 0).select(
        "k",
        "r",
        F.row_number().over(wk.orderBy("r", "d")).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("n_cal"),
    )
    qh = calib.filter(F.col("rn") == F.expr("((n_cal + 1) * 4 + 4) div 5")).select(
        "k", F.col("r").alias("q_hat"), "n_cal"
    )
    test = resid.filter(F.col("d") % 2 == 1)
    return (
        test.join(F.broadcast(qh), "k")
        .groupBy(F.col("k").alias("event_type"), "n_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.avg(F.when(F.col("r") <= F.col("q_hat"), 1.0).otherwise(0.0)), 6
            ).alias("coverage"),
        )
        .select(
            "event_type",
            "n_cal",
            "n_test",
            "q_hat",
            "coverage",
            F.lit(0.8).alias("target"),
        )
    )


def _q308_landmark_oracle(rounds: int = 4, n_seeds: int = 4) -> str:
    """Generated oracle for q308: per-round min-distance relaxation as
    MATERIALIZED CTEs (each round references the previous twice — the
    q291 exponential-inlining lesson)."""
    ctes = [
        "edges AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM co UNION ALL SELECT s2, s1 FROM co)",
        f"seeds AS MATERIALIZED (SELECT DISTINCT src AS seed FROM edges ORDER BY seed LIMIT {n_seeds})",
        "d0 AS MATERIALIZED (SELECT seed, seed AS n, 0 AS dist FROM seeds)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"c{r} AS (SELECT p.seed, e.dst AS n, p.dist + 1 AS dist "
            f"FROM d{r - 1} p JOIN edges e ON e.src = p.n)"
        )
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT seed, n, min(dist) AS dist FROM "
            f"(SELECT * FROM d{r - 1} UNION ALL SELECT * FROM c{r}) GROUP BY 1, 2)"
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {_COGRAPH_SQL},
    {chain}
    SELECT seed, CAST(dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM d{rounds} GROUP BY 1, 2
    """


@query("q308_landmark_bfs", oracle=_q308_landmark_oracle())
def q308_landmark_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark BFS distance census over the part co-occurrence graph:
    from the 4 smallest node ids (deterministic landmarks), 4 rounds of
    synchronized min-distance relaxation give each landmark's reach
    census by hop count — the landmark-distance sketch behind graph
    diameter estimation and 2-hop-cover shortest-path indexes (and the
    distance-distribution view the closure BFS q221 doesn't report).
    All-integer distances: nothing to round, both engines agree exactly.

    100 TB story: a round is one frontier-edge equi-join + one grouped
    min shuffled on (seed, node) — frontier-sized, never node-squared;
    landmarks multiply the frame by a CONSTANT 4; localCheckpoint keeps
    plans round-count-independent.
    """
    co = _cograph_edges(spark, sf_dir)
    edges = graph.symmetrize(co).localCheckpoint(eager=True)
    seeds = (
        edges.select(F.col("src").alias("seed"))
        .distinct()
        .orderBy("seed")
        .limit(4)
    )
    d = seeds.select(
        "seed", F.col("seed").alias("n"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    for _ in range(4):
        cand = d.join(edges, d.n == edges.src).select(
            "seed", F.col("dst").alias("n"), (F.col("dist") + 1).alias("dist")
        )
        d = (
            d.unionByName(cand)
            .groupBy("seed", "n")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return d.groupBy("seed", F.col("dist").cast("long").alias("dist")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


@query(
    "q309_heaps_law",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
      FROM documents WHERE trim(text) <> ''
    ),
    nn AS (SELECT count(*) AS n_docs FROM ranked),
    toks AS (
      SELECT r.rk, unnest(regexp_split_to_array(trim(d.text), '\\s+')) AS term
      FROM documents d JOIN ranked r USING (doc_id) WHERE trim(d.text) <> ''
    ),
    first_occ AS (SELECT term, min(rk) AS fr FROM toks GROUP BY 1),
    cuts AS (
      SELECT k, (nn.n_docs * k + 9) // 10 AS boundary
      FROM (SELECT unnest(generate_series(1, 10)) AS k) CROSS JOIN nn
    ),
    pts AS (
      SELECT cuts.k,
             CAST((SELECT sum(n_tok) FROM ranked WHERE rk <= cuts.boundary)
                  AS BIGINT) AS tokens,
             CAST((SELECT count(*) FROM first_occ WHERE fr <= cuts.boundary)
                  AS BIGINT) AS types
      FROM cuts
    ),
    lg AS (
      SELECT k, tokens, types,
             CAST(round(ln(tokens), 12) AS DECIMAL(38,12)) AS x,
             CAST(round(ln(types), 12) AS DECIMAL(38,12)) AS y
      FROM pts
    ),
    fit AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
                  AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
                  AS DECIMAL(38,12))) AS DOUBLE) AS sxx
      FROM lg
    )
    SELECT lg.k, lg.tokens, lg.types,
           round((fit.n * fit.sxy - fit.sx * fit.sy)
                 / (fit.n * fit.sxx - fit.sx * fit.sx), 6) + 0.0 AS heaps_beta,
           round(exp((fit.sy - (fit.n * fit.sxy - fit.sx * fit.sy)
                 / (fit.n * fit.sxx - fit.sx * fit.sx) * fit.sx) / fit.n), 6) + 0.0
             AS heaps_k
    FROM lg CROSS JOIN fit
    """,
)
def q309_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978): distinct-type count
    vs cumulative token count at 10 document-prefix checkpoints, with the
    log-log OLS exponent beta and coefficient K — the curve that tells a
    tokenizer/vocab-sizing pass how fast NEW types keep appearing as the
    corpus grows (beta near 1 = unbounded novelty, small beta = vocabulary
    saturating). Types-at-prefix needs NO per-prefix distinct pass: each
    term's FIRST-occurrence document rank is one groupBy, and
    types(prefix) = count(first_rank <= boundary). Sums in the OLS fold
    as DECIMAL(38,12) of 12-dp-rounded terms (10 points), so both engines
    agree digit-for-digit.

    100 TB story: one tokenize pass feeds doc lengths and first
    occurrences (map-side min); checkpoints are 10 scalars; the fit runs
    on a 10-row frame. Nothing is per-prefix re-scanned.
    """
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    # two-phase bucketed rank on doc_id (1M-id buckets: offsets frame is
    # corpus/2^20-sized, within-bucket windows distributed) — bit-identical
    # to row_number over the naive global window (round-9 guard fix)
    from phoebe_spark.operators.layout import global_rank_by_value

    ranked = (
        global_rank_by_value(
            d.select(
                "doc_id", F.size(text.tokens(F.col("text"))).alias("n_tok"), "text"
            ),
            "doc_id",
            "doc_id",
            descending=False,
            out_col="rk",
            bucket=F.expr("doc_id div 1048576"),
        )
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "n_tok", "text")
        .localCheckpoint(eager=True)
    )
    n_docs = ranked.count()
    toks = ranked.select("rk", F.explode(text.tokens(F.col("text"))).alias("term"))
    first_occ = toks.groupBy("term").agg(F.min("rk").alias("fr"))
    cuts = spark.range(1, 11).select(
        F.col("id").alias("k"),
        ((F.lit(n_docs) * F.col("id") + 9) / 10).cast("long").alias("boundary"),
    )
    lens = ranked.select("rk", "n_tok")
    pts = (
        cuts.join(F.broadcast(lens), F.col("rk") <= F.col("boundary"))
        .groupBy("k", "boundary")
        .agg(F.sum("n_tok").cast("long").alias("tokens"))
        .join(
            cuts.join(F.broadcast(first_occ), F.col("fr") <= F.col("boundary"))
            .groupBy(F.col("k").alias("k2"))
            .agg(F.count(F.lit(1)).cast("long").alias("types")),
            F.col("k") == F.col("k2"),
        )
        .select("k", "tokens", "types")
    )
    lg = pts.select(
        "k",
        "tokens",
        "types",
        F.round(F.log("tokens"), 12).cast("decimal(38,12)").alias("x"),
        F.round(F.log("types"), 12).cast("decimal(38,12)").alias("y"),
    ).localCheckpoint(eager=True)
    fit = lg.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("y").cast("double"), 12).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("sxy"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("x").cast("double"), 12).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("sxx"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return lg.crossJoin(F.broadcast(fit)).select(
        "k",
        "tokens",
        "types",
        (F.round(beta, 6) + F.lit(0.0)).alias("heaps_beta"),
        (
            F.round(F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n")), 6)
            + F.lit(0.0)
        ).alias("heaps_k"),
    )


@query(
    "q310_ks_two_sample",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS arm, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type, v,
             count(*) FILTER (WHERE arm = 0) AS c0,
             count(*) FILTER (WHERE arm = 1) AS c1
      FROM s GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, v,
             sum(c0) OVER w AS f0, sum(c1) OVER w AS f1,
             sum(c0) OVER p AS n0, sum(c1) OVER p AS n1
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             p AS (PARTITION BY event_type)
    ),
    top AS (
      SELECT event_type, v, n0, n1,
             abs(f0 * n1 - f1 * n0) AS dn,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(f0 * n1 - f1 * n0) DESC, v ASC)
               AS rk
      FROM cum
    )
    SELECT event_type,
           CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(dn * 1.0 / (n0 * n1), 6) AS ks_d,
           round(v, 6) AS ks_at,
           CASE WHEN dn * 1.0 / (n0 * n1)
                     > 1.358 * sqrt((n0 + n1) * 1.0 / (n0 * n1))
                THEN 1 ELSE 0 END AS reject_h0
    FROM top WHERE rk = 1
    """,
)
def q310_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test per event type between the two
    deterministic A/B arms (user_id parity, the q281 split): D = max over
    the pooled support of |ECDF_0 - ECDF_1|, reported with the value at
    which the gap peaks and the alpha=0.05 decision (c(0.05)=1.358
    two-sample critical value). Completes the q281/q287 two-sample ladder
    with the DISTRIBUTION-level test: Welch sees means, Mann-Whitney sees
    ranks, KS sees any shape difference — the drift test a data pipeline
    runs between yesterday's and today's corpus.

    Exactness: the ECDF gap is kept as the INTEGER cross-product
    |F0*n1 - F1*n0| until the single final division, so the argmax and
    the decision are exact in both engines; the window is a per-type
    frame over DISTINCT values (the documented distinct-value-frame
    exception to the no-global-sort rule).

    100 TB story: one map-side-combining groupBy(type, value) collapses
    the fact table to the distinct-value support before any window; the
    cumulative frame sorts support values per type, never raw rows.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.col("value").alias("v"),
    )
    g = s.groupBy("event_type", "v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        "v",
        F.sum("c0").over(w).alias("f0"),
        F.sum("c1").over(w).alias("f1"),
        F.sum("c0").over(p).alias("n0"),
        F.sum("c1").over(p).alias("n1"),
    )
    dn = F.abs(F.col("f0") * F.col("n1") - F.col("f1") * F.col("n0"))
    top = cum.select(
        "event_type",
        "v",
        "n0",
        "n1",
        dn.alias("dn"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(dn.desc(), F.asc("v")))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    ks = F.col("dn") * 1.0 / (F.col("n0") * F.col("n1"))
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n0") + F.col("n1")) * 1.0 / (F.col("n0") * F.col("n1"))
    )
    return top.select(
        "event_type",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(ks, 6).alias("ks_d"),
        F.round("v", 6).alias("ks_at"),
        F.when(ks > crit, 1).otherwise(0).alias("reject_h0"),
    )


@query(
    "q311_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type, sign(b.c - a.c) AS sg
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ),
    s AS (
      SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat
      FROM pairs GROUP BY 1
    ),
    nn AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT event_type, c, count(*) AS t FROM daily GROUP BY 1, 2)
      WHERE t > 1 GROUP BY 1
    ),
    v AS (
      SELECT nn.event_type, nn.n, s.s_stat,
             (nn.n * (nn.n - 1) * (2 * nn.n + 5)
              - coalesce(ties.tie_term, 0)) / 18.0 AS var_s
      FROM nn JOIN s ON s.event_type = nn.event_type
      LEFT JOIN ties ON ties.event_type = nn.event_type
    )
    SELECT event_type, n AS n_days, s_stat,
           round(var_s, 6) AS var_s,
           round(CASE WHEN var_s = 0 THEN 0.0
                      WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) + 0.0 AS z,
           CASE WHEN var_s > 0 AND s_stat > 0
                     AND (s_stat - 1) / sqrt(var_s) > 1.96 THEN 'increasing'
                WHEN var_s > 0 AND s_stat < 0
                     AND (s_stat + 1) / sqrt(var_s) < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM v
    """,
)
def q311_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test (Mann 1945, Kendall 1975)
    per event type over the daily count series: S = sum of pairwise
    signs, tie-corrected variance, and the continuity-corrected normal
    z — the SIGNIFICANCE companion to the Theil-Sen slope (q86: how
    steep; this: is it real). S and the tie term are exact integers,
    var_s an exact rational/18, so both engines agree digit-for-digit.

    100 TB story: the pair join runs on the O(days) per-key AGGREGATE
    (30 rows/key -> 435 pairs/key, bounded however large the fact table
    grows); ties come from one more grouped count of the same rollup.
    """
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type", F.expr("(ts div 1000000000) div 86400").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long")).alias("s_stat"))
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    v = (
        nn.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n",
            "s_stat",
            (
                (
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.coalesce(F.col("tie_term"), F.lit(0))
                )
                / 18.0
            ).alias("var_s"),
        )
    )
    z = (
        F.when(F.col("var_s") == 0, F.lit(0.0))
        .when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt("var_s"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt("var_s"))
        .otherwise(F.lit(0.0))
    )
    return v.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        (F.round(z, 6) + F.lit(0.0)).alias("z"),
        F.when((F.col("var_s") > 0) & (z > 1.96), "increasing")
        .when((F.col("var_s") > 0) & (z < -1.96), "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


@query(
    "q312_jsd_sources",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS term
      FROM documents WHERE trim(text) <> ''
    ),
    st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n_st
           FROM toks GROUP BY 1, 2),
    ns AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
    ct AS (SELECT term, CAST(sum(n_st) AS BIGINT) AS n_t FROM st GROUP BY 1),
    tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM ct),
    cell AS (
      SELECT st.source,
             st.n_st * 1.0 / ns.n_s AS p,
             ct.n_t * 1.0 / tot.n AS q
      FROM st JOIN ns ON ns.source = st.source
              JOIN ct ON ct.term = st.term
              CROSS JOIN tot
    ),
    agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(CAST(round(p * ln(p / ((p + q) / 2)), 12)
                  AS DECIMAL(38,12))) AS DOUBLE) AS kl_p,
             CAST(sum(CAST(round(q * ln(q / ((p + q) / 2)), 12)
                  AS DECIMAL(38,12))) AS DOUBLE) AS kl_q_in,
             CAST(sum(CAST(round(q, 12) AS DECIMAL(38,12))) AS DOUBLE)
               AS q_cov
      FROM cell GROUP BY 1
    )
    SELECT agg.source, agg.n_terms, ns.n_s AS n_tokens,
           round(0.5 * kl_p + 0.5 * (kl_q_in + (1 - q_cov) * ln(2)), 6) + 0.0
             AS jsd_nats,
           round((0.5 * kl_p + 0.5 * (kl_q_in + (1 - q_cov) * ln(2))) / ln(2),
                 6) + 0.0 AS jsd_bits
    FROM agg JOIN ns ON ns.source = agg.source
    """,
)
def q312_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's unigram
    distribution and the whole-corpus distribution — the symmetric,
    bounded ([0, ln 2]) cousin of the KL skew signal: a curation
    dashboard ranks sources by how far their token mix sits from the
    corpus mix (high JSD = domain-shifted source worth reweighting;
    cf. the DSIR importance weights, q-family curation.py). Terms the
    source never emits contribute exactly q*ln(2) to KL(Q||M), folded
    closed-form via the source's covered corpus mass — no outer join
    over the full vocabulary per source.

    Determinism: per-term contributions are 12-dp-quantized
    DECIMAL(38,12) folds (the established big-fold policy), so the
    vocabulary-sized sums agree across engines and partitionings.

    100 TB story: three map-side-combining groupBys bounded by
    (source x term), source count, and vocabulary; the scoring join is
    key-to-key on the term — the corpus never self-joins.
    """
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select("source", F.explode(text.tokens(F.col("text"))).alias("term"))
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n_st"))
    ns = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    ct = st.groupBy("term").agg(F.sum("n_st").alias("n_t"))
    tot = ct.agg(F.sum("n_t").alias("n"))
    cell = (
        st.join(ns, "source")
        .join(ct, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (F.col("n_st") * 1.0 / F.col("n_s")).alias("p"),
            (F.col("n_t") * 1.0 / F.col("n")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    agg = cell.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(
            F.round(F.col("p") * F.log(F.col("p") / m), 12).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("kl_p"),
        F.sum(
            F.round(F.col("q") * F.log(F.col("q") / m), 12).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("kl_q_in"),
        F.sum(F.round(F.col("q"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("q_cov"),
    )
    ln2 = F.log(F.lit(2.0))
    jsd = 0.5 * F.col("kl_p") + 0.5 * (
        F.col("kl_q_in") + (1 - F.col("q_cov")) * ln2
    )
    return agg.join(ns, "source").select(
        "source",
        "n_terms",
        F.col("n_s").alias("n_tokens"),
        (F.round(jsd, 6) + F.lit(0.0)).alias("jsd_nats"),
        (F.round(jsd / ln2, 6) + F.lit(0.0)).alias("jsd_bits"),
    )


@query(
    "q314_cramers_v",
    oracle="""
    WITH c AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    langs AS (SELECT DISTINCT lang FROM c),
    srcs AS (SELECT DISTINCT source FROM c),
    grid AS (
      SELECT l.lang, s.source, coalesce(c.o, 0) AS o
      FROM langs l CROSS JOIN srcs s
      LEFT JOIN c ON c.lang = l.lang AND c.source = s.source
    ),
    rt AS (SELECT lang, sum(o) AS r FROM grid GROUP BY 1),
    ctot AS (SELECT source, sum(o) AS col_n FROM grid GROUP BY 1),
    n AS (SELECT sum(o) AS n,
                 CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                 CAST(count(DISTINCT source) AS BIGINT) AS n_sources
          FROM grid),
    chi AS (
      SELECT CAST(sum(CAST(round(
               (g.o - rt.r * ctot.col_n * 1.0 / n.n)
               * (g.o - rt.r * ctot.col_n * 1.0 / n.n)
               / (rt.r * ctot.col_n * 1.0 / n.n), 12)
             AS DECIMAL(38,12))) AS DOUBLE) AS chi2
      FROM grid g JOIN rt ON rt.lang = g.lang
           JOIN ctot ON ctot.source = g.source
           CROSS JOIN n
    )
    SELECT CAST(n.n AS BIGINT) AS n_docs, n.n_langs, n.n_sources,
           round(chi.chi2, 6) AS chi2,
           round(sqrt(chi.chi2 / (n.n * least(n.n_langs - 1,
                                              n.n_sources - 1))), 6)
             AS cramers_v
    FROM chi CROSS JOIN n
    """,
)
def q314_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence + Cramér's V effect size over the
    lang x source contingency table of the documents corpus — the
    one-number answer to "does language mix depend on source?" that a
    mixture-balancing pass checks before reweighting (V near 0 =
    sources share a language profile; near 1 = languages are
    source-segregated). ZERO cells matter: the grid is the full
    langs x sources cross product (bounded, tens of cells) with
    coalesce(0), because an absent pair still contributes E to chi2.

    Determinism: observed counts and marginals are exact integers;
    the per-cell (O-E)^2/E terms fold as 12-dp DECIMAL(38,12).

    100 TB story: one map-side-combining groupBy(lang, source)
    collapses the corpus; everything after runs on the tiny grid.
    """
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    langs = c.select("lang").distinct()
    srcs = c.select("source").distinct()
    grid = (
        langs.crossJoin(srcs)
        .join(c, ["lang", "source"], "left")
        .select("lang", "source", F.coalesce("o", F.lit(0)).alias("o"))
    )
    rt = grid.groupBy("lang").agg(F.sum("o").alias("r"))
    ctot = grid.groupBy("source").agg(F.sum("o").alias("col_n"))
    n = grid.agg(
        F.sum("o").alias("n"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    e_exp = F.col("r") * F.col("col_n") * 1.0 / F.col("n")
    chi = (
        grid.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ctot), "source")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                F.round(
                    (F.col("o") - e_exp) * (F.col("o") - e_exp) / e_exp, 12
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("chi2")
        )
    )
    return chi.crossJoin(F.broadcast(n)).select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("n_sources").cast("long").alias("n_sources"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * F.least(F.col("n_langs") - 1, F.col("n_sources") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


def _q313_ph_oracle(T: int = 30, delta: float = 5.0, lam: float = 200.0) -> str:
    """Generated oracle for q313: the Page-Hinkley recursion unrolled as
    one CTE per day (the Holt/DTW generated-chain treatment). Each step's
    nmean/nu/nminu/nalarm are lateral aliases evaluated left-to-right, so
    the float sequence is identical op for op to the engine-side
    ``aggregate`` fold (mean + (x - mean)/t, then u + x - mean_t - delta,
    both left-associated in both engines)."""
    ctes = [
        "p0_r AS (SELECT k, xs, CAST(0.0 AS DOUBLE) AS mean,"
        " CAST(0.0 AS DOUBLE) AS u, CAST(0.0 AS DOUBLE) AS minu,"
        " CAST(0 AS BIGINT) AS alarm FROM series)"
    ]
    for t in range(1, T + 1):
        ctes.append(
            f"p{t} AS (SELECT k, xs, "
            f"mean + (xs[{t}] - mean) / {t} AS nmean, "
            f"u + xs[{t}] - (mean + (xs[{t}] - mean) / {t}) - {delta} AS nu, "
            f"least(minu, u + xs[{t}] - (mean + (xs[{t}] - mean) / {t})"
            f" - {delta}) AS nminu, "
            f"CASE WHEN alarm = 0 AND (u + xs[{t}] - (mean + (xs[{t}] - mean)"
            f" / {t}) - {delta}) - least(minu, u + xs[{t}] - (mean +"
            f" (xs[{t}] - mean) / {t}) - {delta}) > {lam}"
            f" THEN {t} ELSE alarm END AS nalarm "
            f"FROM p{t - 1}_r)"
        )
        ctes.append(
            f"p{t}_r AS (SELECT k, xs, nmean AS mean, nu AS u,"
            f" nminu AS minu, CAST(nalarm AS BIGINT) AS alarm FROM p{t})"
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH hc AS (
      SELECT event_type AS k,
             epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo FROM hc),
    keys AS (SELECT DISTINCT k FROM hc),
    grid AS (SELECT keys.k, g.d, b.lo
             FROM keys CROSS JOIN (SELECT unnest(generate_series(0, {T - 1})) AS d) g,
                  bounds b),
    dense AS (
      SELECT g.k, g.d, coalesce(hc.c, 0.0) AS c
      FROM grid g LEFT JOIN hc ON hc.k = g.k AND hc.day = g.lo + g.d
    ),
    series AS (SELECT k, list(c ORDER BY d) AS xs FROM dense GROUP BY 1),
    {chain}
    SELECT k AS event_type, CAST({T} AS BIGINT) AS n_days,
           round(mean, 6) + 0.0 AS mean,
           round(u, 6) + 0.0 AS u,
           round(minu, 6) + 0.0 AS min_u,
           round(u - minu, 6) + 0.0 AS ph_stat,
           alarm AS alarm_day
    FROM p{T}_r
    """


@query("q313_page_hinkley", oracle=_q313_ph_oracle())
def q313_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift detector (Page 1954; Hinkley 1971 — the
    standard drift test in streaming-ML monitoring) per event type over
    the 30-day daily count series: the cumulative deviation from the
    RUNNING mean, U_t = U_{t-1} + x_t - mean_t - delta, alarms at the
    first t where U_t - min(U) exceeds lambda — the change detector a
    data pipeline runs on ingest volume per source. The sequential
    recursion folds in ONE codegen `aggregate` over the day array
    engine-side; the oracle replays it as a generated 30-step CTE chain
    with the identical float-op order, so the statistic matches
    digit-for-digit (the q273 Holt treatment applied to drift
    detection). Complements CUSUM (known target mean) with the
    self-calibrating running-mean form.

    100 TB story: input is the O(days) per-key rollup (map-side); the
    fold is a per-row array op — a million series drift-check as one
    groupBy + one codegen aggregate, no iteration joins.
    """
    e = _t(spark, sf_dir, "events")
    T, delta, lam = 30, 5.0, 200.0
    hc = (
        e.groupBy(
            F.col("event_type").alias("k"),
            F.expr("(ts div 1000000000) div 86400").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    lo = hc.agg(F.min("day").alias("lo"))
    keys = hc.select("k").distinct()
    grid = keys.crossJoin(
        F.broadcast(
            lo.select(F.explode(F.sequence(F.lit(0), F.lit(T - 1))).alias("d"), "lo")
        )
    )
    dense = grid.join(
        hc, (grid.k == hc.k) & (grid.lo + grid.d == hc.day), "left"
    ).select(grid.k, grid.d, F.coalesce("c", F.lit(0.0)).alias("c"))
    series = dense.groupBy("k").agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).getField("c").alias("xs")
    )

    def _step(acc, x):
        t = acc["t"] + 1
        nmean = acc["mean"] + (x - acc["mean"]) / t
        nu = acc["u"] + x - nmean - F.lit(delta)
        nminu = F.least(acc["minu"], nu)
        nalarm = (
            F.when((acc["alarm"] == 0) & (nu - nminu > F.lit(lam)), t.cast("long"))
            .otherwise(acc["alarm"])
        )
        return F.struct(
            t.alias("t"),
            nmean.alias("mean"),
            nu.alias("u"),
            nminu.alias("minu"),
            nalarm.alias("alarm"),
        )

    state = F.aggregate(
        F.col("xs"),
        F.struct(
            F.lit(0).cast("long").alias("t"),
            F.lit(0.0).alias("mean"),
            F.lit(0.0).alias("u"),
            F.lit(0.0).alias("minu"),
            F.lit(0).cast("long").alias("alarm"),
        ),
        _step,
    )
    out = series.select(F.col("k").alias("event_type"), state.alias("st"))
    return out.select(
        "event_type",
        F.lit(T).cast("long").alias("n_days"),
        (F.round(F.col("st.mean"), 6) + F.lit(0.0)).alias("mean"),
        (F.round(F.col("st.u"), 6) + F.lit(0.0)).alias("u"),
        (F.round(F.col("st.minu"), 6) + F.lit(0.0)).alias("min_u"),
        (F.round(F.col("st.u") - F.col("st.minu"), 6) + F.lit(0.0)).alias(
            "ph_stat"
        ),
        F.col("st.alarm").alias("alarm_day"),
    )


@query("q315_streaming_page_hinkley_drain", oracle=None)
def q315_streaming_page_hinkley_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Page-Hinkley drift detection drained in the hash-checked
    gate — q313's recursion as a stateful operator
    (:func:`stateful.streaming_page_hinkley`): the per-key daily series
    arrives as three sequence-ordered micro-batches (days 0-9, 10-19,
    20-29), the (t, mean, U, min U, alarm) state folds ACROSS batches,
    and the final state must match q313's generated CTE-chain oracle
    digit-for-digit. Batch array fold and cross-batch stateful stream:
    two execution forms, one drift answer — the q273/q275 equivalence
    class applied to change detection, which is exactly how a corpus
    ingest monitor runs PH continuously instead of re-scanning history.

    Scale: state is 5 scalars per key; each micro-batch does O(new
    rows) work — drift monitoring over unbounded streams at O(1) memory
    per series.
    """
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming.stateful import streaming_page_hinkley

    e = _t(spark, sf_dir, "events")
    T, delta, lam = 30, 5.0, 200.0
    hc = (
        e.groupBy(
            F.col("event_type").alias("k"),
            F.expr("(ts div 1000000000) div 86400").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    lo = hc.agg(F.min("day").alias("lo"))
    keys = hc.select("k").distinct()
    grid = keys.crossJoin(
        F.broadcast(
            lo.select(F.explode(F.sequence(F.lit(0), F.lit(T - 1))).alias("d"), "lo")
        )
    )
    dense = grid.join(
        hc, (grid.k == hc.k) & (grid.lo + grid.d == hc.day), "left"
    ).select(
        grid.k, grid.d.cast("int").alias("d"), F.coalesce("c", F.lit(0.0)).alias("c")
    )

    work = tempfile.mkdtemp(prefix="q315_")
    src_dir = f"{work}/src"
    try:
        os.makedirs(src_dir)
        for i, (d_lo, d_hi) in enumerate(((0, 10), (10, 20), (20, 30)), start=1):
            part = dense.filter((F.col("d") >= d_lo) & (F.col("d") < d_hi))
            part.coalesce(1).write.parquet(f"{work}/stage{i}")
            pf = glob.glob(f"{work}/stage{i}/part-*.parquet")[0]
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(pf, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("k STRING, d INT, c DOUBLE")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = streaming_page_hinkley(stream, delta=delta, lam=lam, key_col="k")
        sink = f"{work}/ph"
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda bdf, _bid: bdf.write.mode("append").parquet(sink))
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "q315: streaming Page-Hinkley drain did not finish within"
                " 300 s — refusing to report a partial drift state"
            )
        states = spark.read.parquet(sink)
        final = (
            states.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("key").orderBy(F.col("n").desc())
                ),
            )
            .filter(F.col("rk") == 1)
            .select(
                F.col("key").alias("event_type"),
                F.col("n").alias("n_days"),
                (F.round("mean", 6) + F.lit(0.0)).alias("mean"),
                (F.round("u", 6) + F.lit(0.0)).alias("u"),
                (F.round("min_u", 6) + F.lit(0.0)).alias("min_u"),
                (F.round(F.col("u") - F.col("min_u"), 6) + F.lit(0.0)).alias(
                    "ph_stat"
                ),
                F.col("alarm").alias("alarm_day"),
            )
        )
        rows = final.collect()
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the streaming drain must reproduce the batch detector's oracle exactly —
# batch array fold and cross-batch state are two forms of one computation
ORACLE["q315_streaming_page_hinkley_drain"] = ORACLE["q313_page_hinkley"]


@query(
    "q316_embedding_isotropy",
    oracle=f"""
    WITH s AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % 13 = 0 AND vec_id < 130000),
    pr AS (
      SELECT {_PAIR_COS_SQL} AS cs
      FROM s a JOIN s b ON a.vec_id < b.vec_id
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(round(cs, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
             CAST(sum(CAST(round(cs * cs, 12) AS DECIMAL(38,12))) AS DOUBLE)
               AS s2,
             CAST(sum(CASE WHEN abs(cs) > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high
      FROM pr
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_vecs,
           n_pairs,
           round(s1 / n_pairs, 6) + 0.0 AS mean_cos,
           round(sqrt(s2 / n_pairs - (s1 / n_pairs) * (s1 / n_pairs)), 6)
             AS sd_cos,
           round(n_high * 1.0 / n_pairs, 6) AS frac_high
    FROM agg
    """,
)
def q316_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy audit (Ethayarajh 2019's anisotropy
    diagnostic): mean, spread, and high-similarity mass of the pairwise
    cosine over a deterministic 1-in-13 id sample — a healthy embedding
    space has mean pairwise cosine near 0; a collapsed/anisotropic one
    (bad pooling, undertrained encoder) drifts toward 1, which silently
    breaks every cosine-thresholded dedup and ANN recall assumption
    downstream. The sample is a modulus cut (no RNG, reproducible),
    HARD-CAPPED at 10k vectors (vec_id < 130000) so the sampled side
    stays broadcastable at ANY corpus size — a rate-only cut would grow
    with the corpus and break the broadcast contract at 100 TB. Per-pair
    cosines fold as 12-dp DECIMAL(38,12) so the quadratic-in-sample
    aggregate is engine- and partitioning-exact.

    100 TB story: the audit is quadratic only in the SAMPLE (154 vecs ->
    ~12k pairs here; the sample rate is the knob) and the sample is tiny
    enough to broadcast — one corpus scan to cut it, zero shuffles on the
    full table.
    """
    emb = _t(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") % 13 == 0) & (F.col("vec_id") < 130000)
    )
    s = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    a = s.alias("a")
    b = s.alias("b")
    cs = similarity.cosine(F.col("a.embedding"), F.col("b.embedding"))
    pr = a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id")).select(
        cs.alias("cs")
    )
    agg = pr.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.round(F.col("cs"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s1"),
        F.sum(F.round(F.col("cs") * F.col("cs"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s2"),
        F.sum(F.when(F.abs("cs") > 0.5, 1).otherwise(0)).alias("n_high"),
    )
    mean = F.col("s1") / F.col("n_pairs")
    return agg.crossJoin(F.broadcast(s.agg(F.count(F.lit(1)).alias("n_vecs")))).select(
        "n_vecs",
        "n_pairs",
        (F.round(mean, 6) + F.lit(0.0)).alias("mean_cos"),
        F.round(F.sqrt(F.col("s2") / F.col("n_pairs") - mean * mean), 6).alias(
            "sd_cos"
        ),
        F.round(F.col("n_high") * 1.0 / F.col("n_pairs"), 6).alias("frac_high"),
    )


def _q317_markov_oracle(K: int = 5, iters: int = 20) -> str:
    """Generated oracle for q317: the power iteration v <- vP unrolled as
    one CTE per round with K literal inner-product chains (left-assoc, so
    the float sequence matches the engine's explicit-sum fold), each
    component 12-dp-rounded per round so drift cannot compound."""
    ctes = [
        "s0 AS (SELECT parr, ["
        + ", ".join([f"CAST({1.0 / K} AS DOUBLE)"] * K)
        + "] AS v FROM pm)"
    ]
    for t in range(1, iters + 1):
        comps = []
        for j in range(1, K + 1):
            chain = " + ".join(
                f"v[{i}] * parr[{(i - 1) * K + j}]" for i in range(1, K + 1)
            )
            comps.append(f"round({chain}, 12)")
        ctes.append(
            f"s{t} AS (SELECT parr, [" + ", ".join(comps) + f"] AS v FROM s{t - 1})"
        )
    chain_sql = ",\n    ".join(ctes)
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_ns(ts), event_id) AS nxt
      FROM events
    ),
    tc AS (SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS c
           FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    types AS (SELECT t, row_number() OVER (ORDER BY t) AS idx
              FROM (SELECT DISTINCT event_type AS t FROM events)),
    grid AS (
      SELECT i.idx AS i, j.idx AS j, coalesce(tc.c, 0) AS c
      FROM types i CROSS JOIN types j
      LEFT JOIN tc ON tc.src = i.t AND tc.dst = j.t
    ),
    rowtot AS (SELECT i, sum(c) AS tot FROM grid GROUP BY 1),
    cells AS (SELECT g.i, g.j, g.c * 1.0 / r.tot AS p,
                     (g.i - 1) * {K} + g.j AS pos
              FROM grid g JOIN rowtot r ON r.i = g.i),
    pm AS (SELECT list(p ORDER BY pos) AS parr FROM cells),
    {chain_sql},
    freq AS (SELECT event_type AS t, count(*) * 1.0 AS cnt FROM events GROUP BY 1),
    ftot AS (SELECT sum(cnt) AS n FROM freq)
    SELECT types.t AS event_type,
           round(v[types.idx], 6) + 0.0 AS stationary_prob,
           round(freq.cnt / ftot.n, 6) AS empirical_share
    FROM s{iters} CROSS JOIN types
    JOIN freq ON freq.t = types.t CROSS JOIN ftot
    """


@query("q317_markov_stationary", oracle=_q317_markov_oracle())
def q317_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain:
    transition counts from each user's time-ordered event sequence (the
    q130 matrix), then 20 rounds of the power iteration v <- vP folded in
    ONE codegen `aggregate` over a 5x5 row-stochastic matrix carried as a
    25-element array — the long-run behavioral mix the chain converges
    to, reported beside the raw empirical share (a gap between them
    flags non-ergodic usage: states over-represented by heavy sessions
    vs states that are sticky in the dynamics). Each component is
    12-dp-rounded per round (the graph-ladder determinism policy), so
    20 iterations stay engine-exact; the oracle replays the identical
    left-associated inner-product chains.

    100 TB story: ONE corpus-scale window (user, time) builds the
    transition pairs; everything after runs on the K x K aggregate —
    the iteration is a single-row array fold, corpus-size-independent.
    """
    e = _t(spark, sf_dir, "events")
    K, iters = 5, 20
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    tc = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("c"))
    types = (
        e.select(F.col("event_type").alias("t"))
        .distinct()
        .select("t", F.row_number().over(Window.orderBy("t")).alias("idx"))
        .localCheckpoint(eager=True)
    )
    # the fold and the generated oracle both bake K into their literal
    # expression chains — fail loudly if the fixture's support drifts,
    # instead of both sides computing identically mis-indexed vectors
    # and parity staying green on a wrong statistic (ADVICE r8)
    n_types = types.count()
    if n_types != K:
        raise ValueError(
            f"q317 assumes exactly K={K} event types; fixture has {n_types}"
        )
    grid = (
        types.select(F.col("t").alias("src_t"), F.col("idx").alias("i"))
        .crossJoin(types.select(F.col("t").alias("dst_t"), F.col("idx").alias("j")))
        .join(
            tc,
            (F.col("src_t") == F.col("src")) & (F.col("dst_t") == F.col("dst")),
            "left",
        )
        .select("i", "j", F.coalesce("c", F.lit(0)).alias("c"))
        .localCheckpoint(eager=True)
    )
    rowtot = grid.groupBy("i").agg(F.sum("c").alias("tot"))
    cells = grid.join(rowtot, "i").select(
        ((F.col("i") - 1) * K + F.col("j")).alias("pos"),
        (F.col("c") * 1.0 / F.col("tot")).alias("p"),
    )
    pm = cells.agg(
        F.array_sort(F.collect_list(F.struct("pos", "p"))).getField("p").alias("parr")
    )

    def _step(acc, _):
        comps = []
        for j in range(1, K + 1):
            expr = F.element_at(acc, 1) * F.element_at(F.col("parr"), j)
            for i in range(2, K + 1):
                expr = expr + F.element_at(acc, i) * F.element_at(
                    F.col("parr"), (i - 1) * K + j
                )
            comps.append(F.round(expr, 12))
        return F.array(*comps)

    v = F.aggregate(
        F.sequence(F.lit(1), F.lit(iters)),
        F.array(*[F.lit(1.0 / K)] * K),
        _step,
    )
    st = pm.select(v.alias("v"))
    freq = (
        e.groupBy(F.col("event_type").alias("t"))
        .agg((F.count(F.lit(1)) * 1.0).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ftot = freq.agg(F.sum("cnt").alias("n"))
    return (
        st.crossJoin(F.broadcast(types))
        .join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(ftot))
        .select(
            F.col("t").alias("event_type"),
            (F.round(F.element_at(F.col("v"), F.col("idx")), 6) + F.lit(0.0)).alias(
                "stationary_prob"
            ),
            F.round(F.col("cnt") / F.col("n"), 6).alias("empirical_share"),
        )
    )


@query(
    "q318_psi_drift",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
             least(greatest(CAST(floor(value / 50) AS INT), 0), 9) AS bin
      FROM events WHERE value IS NOT NULL
    ),
    bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
    keys AS (SELECT DISTINCT event_type FROM s),
    grid AS (
      SELECT k.event_type, b.bin,
             coalesce(sum(CASE WHEN s.arm = 0 THEN 1 ELSE 0 END), 0) + 0.5
               AS c0,
             coalesce(sum(CASE WHEN s.arm = 1 THEN 1 ELSE 0 END), 0) + 0.5
               AS c1
      FROM keys k CROSS JOIN bins b
      LEFT JOIN s ON s.event_type = k.event_type AND s.bin = b.bin
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, sum(c0) AS n0, sum(c1) AS n1 FROM grid GROUP BY 1
    ),
    contrib AS (
      SELECT g.event_type,
             (g.c0 / t.n0 - g.c1 / t.n1)
               * ln((g.c0 / t.n0) / (g.c1 / t.n1)) AS x
      FROM grid g JOIN tot t ON t.event_type = g.event_type
    )
    SELECT event_type,
           CAST(10 AS BIGINT) AS n_bins,
           round(CAST(sum(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE), 6)
             + 0.0 AS psi,
           CASE WHEN CAST(sum(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE)
                     > 0.2 THEN 1 ELSE 0 END AS drifted
    FROM contrib GROUP BY 1
    """,
)
def q318_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the two
    deterministic A/B arms — the standard production drift score for a
    feature distribution (PSI < 0.1 stable, > 0.2 drifted): fixed-width
    bins over the value domain (10 x 50, clamped — fixed edges keep both
    engines' binning exact-integer, where quantile edges would hang
    engine-specific interpolation into the gate), 0.5 Laplace smoothing
    so empty bins stay finite, per-bin contributions folded as 12-dp
    DECIMAL(38,12). Completes the drift ladder: KS (q310) tests, PSI
    scores, Page-Hinkley (q313/q315) watches.

    100 TB story: one map-side-combining groupBy(type, arm, bin) is the
    only corpus-scale shuffle; the PSI fold runs on the 10-cell grid.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.least(
            F.greatest(F.floor(F.col("value") / 50).cast("int"), F.lit(0)),
            F.lit(9),
        ).alias("bin"),
    )
    keys = s.select("event_type").distinct()
    bins = spark.range(0, 10).select(F.col("id").cast("int").alias("bin"))
    counted = s.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("r0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("r1"),
    )
    grid = (
        keys.crossJoin(F.broadcast(bins))
        .join(counted, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            (F.coalesce("r0", F.lit(0)) + 0.5).alias("c0"),
            (F.coalesce("r1", F.lit(0)) + 0.5).alias("c1"),
        )
        .localCheckpoint(eager=True)
    )
    tot = grid.groupBy("event_type").agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    j = grid.join(tot, "event_type")
    p = F.col("c0") / F.col("n0")
    q = F.col("c1") / F.col("n1")
    x = (p - q) * F.log(p / q)
    psi = (
        F.sum(F.round(x, 12).cast("decimal(38,12)")).cast("double")
    )
    return j.groupBy("event_type").agg(
        F.lit(10).cast("long").alias("n_bins"),
        (F.round(psi, 6) + F.lit(0.0)).alias("psi"),
        F.when(psi > 0.2, 1).otherwise(0).alias("drifted"),
    )


@query(
    "q319_cramer_von_mises",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS arm, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type, v,
             count(*) FILTER (WHERE arm = 0) AS c0,
             count(*) FILTER (WHERE arm = 1) AS c1
      FROM s GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, c0 + c1 AS cnt,
             sum(c0) OVER w AS f0, sum(c1) OVER w AS f1,
             sum(c0) OVER p AS n0, sum(c1) OVER p AS n1
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             p AS (PARTITION BY event_type)
    ),
    agg AS (
      SELECT event_type, n0, n1,
             CAST(sum(CAST(round(
               cnt * ((f0 * n1 - f1 * n0) * 1.0 / (n0 * n1))
                   * ((f0 * n1 - f1 * n0) * 1.0 / (n0 * n1)), 12)
             AS DECIMAL(38,12))) AS DOUBLE) AS s2
      FROM cum GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(n0 * n1 * 1.0 / ((n0 + n1) * (n0 + n1)) * s2, 6) AS cvm_t
    FROM agg
    """,
)
def q319_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic per event type between the
    A/B arms (Anderson 1962): T = n0*n1/N^2 * sum over pooled
    observations of (ECDF_0 - ECDF_1)^2 — the L2 companion to q310's
    sup-norm KS, more sensitive to distributed (non-local) shape
    differences. The ECDF gap stays the exact integer cross-product
    f0*n1 - f1*n0 until one division; per-value contributions (weighted
    by pooled multiplicity) fold as 12-dp DECIMAL(38,12).

    100 TB story: identical shape to q310 — one map-side-combining
    groupBy(type, value) to the distinct-value support, one per-type
    cumulative frame over that support, one grouped fold.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.col("value").alias("v"),
    )
    g = s.groupBy("event_type", "v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        (F.col("c0") + F.col("c1")).alias("cnt"),
        F.sum("c0").over(w).alias("f0"),
        F.sum("c1").over(w).alias("f1"),
        F.sum("c0").over(p).alias("n0"),
        F.sum("c1").over(p).alias("n1"),
    )
    gap = (F.col("f0") * F.col("n1") - F.col("f1") * F.col("n0")) * 1.0 / (
        F.col("n0") * F.col("n1")
    )
    agg = cum.groupBy("event_type", "n0", "n1").agg(
        F.sum(F.round(F.col("cnt") * gap * gap, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s2")
    )
    return agg.select(
        "event_type",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(
            F.col("n0")
            * F.col("n1")
            * 1.0
            / ((F.col("n0") + F.col("n1")) * (F.col("n0") + F.col("n1")))
            * F.col("s2"),
            6,
        ).alias("cvm_t"),
    )


@query(
    "q320_hybrid_retrieval",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('spark', 'window', 'hash') GROUP BY 1, 2),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    sc AS (SELECT tf.doc_id,
                  CAST(round(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                       * tf.tf * (1.2 + 1)
                       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)
                       AS DECIMAL(18,6)) AS c
           FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s),
    bm AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS bm25 FROM sc GROUP BY 1),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cand AS (
      SELECT bm.doc_id, bm.bm25, {_COS_SQL} AS cs
      FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id CROSS JOIN q
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(bm25, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sb,
             CAST(sum(CAST(round(bm25 * bm25, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sb2,
             CAST(sum(CAST(round(cs, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sc1,
             CAST(sum(CAST(round(cs * cs, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sc2
      FROM cand
    ),
    z AS (
      SELECT c.doc_id, c.bm25, c.cs,
             0.5 * ((c.bm25 - m.sb / m.n)
                    / sqrt(greatest(m.sb2 / m.n - (m.sb / m.n) * (m.sb / m.n), 1e-300)))
             + 0.5 * ((c.cs - m.sc1 / m.n)
                    / sqrt(greatest(m.sc2 / m.n - (m.sc1 / m.n) * (m.sc1 / m.n), 1e-300)))
               AS hybrid
      FROM cand c CROSS JOIN mom m
    ),
    rk AS (SELECT doc_id, bm25, cs, hybrid,
                  row_number() OVER (ORDER BY hybrid DESC, doc_id ASC) AS rank
           FROM z)
    SELECT CAST(rank AS INT) AS rank, doc_id,
           round(bm25, 6) AS bm25,
           round(cs, 6) + 0.0 AS cos_sim,
           round(hybrid, 6) + 0.0 AS hybrid
    FROM rk WHERE rank <= 10
    """,
)
def q320_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical-dense retrieval with z-score fusion: Okapi BM25 for
    the literal query {spark, window, hash} and cosine similarity to the
    vec_id=0 query embedding (docs paired to vectors by doc_id = vec_id,
    the corpus convention), each z-normalized over the candidate set and
    averaged 50/50 — the calibrated-score alternative to q90's
    rank-based RRF, sensitive to score MARGINS where RRF only sees
    order. Candidates are docs matching >= 1 query term that have an
    embedding; score moments fold as 12-dp DECIMAL(38,12) so the
    normalization is engine- and partitioning-exact; top-10 with
    doc_id tiebreak.

    100 TB story: BM25's shuffles are bounded by matched postings and
    the vocabulary; the dense score is one equi-join on the candidate
    ids (never a corpus self-join); the fusion normalizes over the
    candidate aggregate only. TakeOrdered handles the top-k without a
    global sort.
    """
    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    bm = text.bm25_scores(d, terms=("spark", "window", "hash"))
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cand = (
        bm.join(emb, bm.doc_id == emb.vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            "bm25",
            similarity.cosine(F.col("embedding"), F.col("qv")).alias("cs"),
        )
        .localCheckpoint(eager=True)
    )
    mom = cand.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("bm25", 12).cast("decimal(38,12)")).cast("double").alias("sb"),
        F.sum(F.round(F.col("bm25") * F.col("bm25"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sb2"),
        F.sum(F.round("cs", 12).cast("decimal(38,12)")).cast("double").alias("sc1"),
        F.sum(F.round(F.col("cs") * F.col("cs"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sc2"),
    )
    mb = F.col("sb") / F.col("n")
    mc = F.col("sc1") / F.col("n")
    sdb = F.sqrt(F.greatest(F.col("sb2") / F.col("n") - mb * mb, F.lit(1e-300)))
    sdc = F.sqrt(F.greatest(F.col("sc2") / F.col("n") - mc * mc, F.lit(1e-300)))
    hybrid = 0.5 * ((F.col("bm25") - mb) / sdb) + 0.5 * ((F.col("cs") - mc) / sdc)
    z = cand.crossJoin(F.broadcast(mom)).select(
        "doc_id", "bm25", "cs", hybrid.alias("hybrid")
    )
    # distributed top-k (TakeOrdered), then rank the 10-row result — a
    # global rank window over the candidate set would single-partition
    # sort a corpus-rate frame at scale
    top10 = z.orderBy(F.col("hybrid").desc(), F.asc("doc_id")).limit(10)
    rk = top10.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("hybrid").desc(), F.asc("doc_id")))
        .alias("rank"),
    )
    return rk.select(
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        F.round("bm25", 6).alias("bm25"),
        (F.round("cs", 6) + F.lit(0.0)).alias("cos_sim"),
        (F.round("hybrid", 6) + F.lit(0.0)).alias("hybrid"),
    )


def _q321_mmr_oracle(K: int = 20, picks: int = 10, lam: float = 0.7) -> str:
    """Generated oracle for q321: the greedy MMR selection unrolled as one
    CTE per pick. Each step computes the K candidate scores as LITERAL
    expressions (selected candidates masked with a -1e308 sentinel; the
    max-sim-to-selected term is a single-level list_transform over the
    sel list), takes their greatest, and picks the FIRST index attaining
    it (explicit CASE chain = smallest-index tie-break) — the identical
    expression set the engine fold evaluates, so every float compare
    matches."""

    def score(i: int) -> str:
        return (
            f"CASE WHEN list_contains(sel, {i}) THEN -1e308 ELSE "
            f"{lam} * rel[{i}] - {1 - lam} * coalesce(list_max("
            f"list_transform(sel, j -> sim[{(i - 1) * K} + j])), 0.0) END"
        )

    ctes = ["m0 AS (SELECT rel, sim, ids, CAST([] AS INT[]) AS sel FROM mat)"]
    for t in range(1, picks + 1):
        sc = ", ".join(f"{score(i)} AS s{i}" for i in range(1, K + 1))
        gr = "greatest(" + ", ".join(f"s{i}" for i in range(1, K + 1)) + ")"
        pick = (
            "CASE "
            + " ".join(f"WHEN s{i} = m THEN {i}" for i in range(1, K + 1))
            + " END"
        )
        ctes.append(f"m{t}a AS (SELECT rel, sim, ids, sel, {sc} FROM m{t - 1})")
        ctes.append(f"m{t}b AS (SELECT rel, sim, ids, sel, {gr} AS m, * FROM m{t}a)")
        ctes.append(
            f"m{t} AS (SELECT rel, sim, ids,"
            f" list_append(sel, {pick}) AS sel FROM m{t}b)"
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    relv AS (
      SELECT e.vec_id, e.embedding, {_COS_SQL} AS rel
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    ),
    cand AS (
      SELECT vec_id, embedding, rel,
             row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS idx
      FROM relv QUALIFY idx <= {K}
    ),
    pairs AS (
      SELECT a.idx AS i, b.idx AS j, {_PAIR_COS_SQL} AS s
      FROM cand a CROSS JOIN cand b
    ),
    mat AS (
      SELECT (SELECT list(rel ORDER BY idx) FROM cand) AS rel,
             (SELECT list(s ORDER BY i * {K} + j) FROM pairs) AS sim,
             (SELECT list(vec_id ORDER BY idx) FROM cand) AS ids
    ),
    {chain}
    SELECT CAST(u.pos AS INT) AS rank,
           ids[sel[u.pos]] AS vec_id,
           round(rel[sel[u.pos]], 6) AS relevance
    FROM m{picks}, unnest(generate_series(1, {picks})) AS u(pos)
    """


@query("q321_mmr_rerank", oracle=_q321_mmr_oracle())
def q321_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    of the vec_id=0 query's top-20 cosine candidates: greedily pick 10,
    each step maximizing lambda*relevance - (1-lambda)*max-similarity-to-
    already-selected (lambda=0.7) — the diversity-aware re-rank a RAG
    stack runs so the context window isn't five copies of the same
    passage. The greedy recursion folds in ONE codegen `aggregate` over a
    10-step sequence, carrying the selected-index list; candidate scores
    are the same literal expression set the generated oracle chain
    evaluates (selected mask = -1e308 sentinel, greatest(), first-index
    tie-break), so every pick matches digit-for-digit.

    100 TB story: relevance is one corpus scan + TakeOrdered(20); the
    20x20 similarity matrix and the 10-step greedy run on a single-row
    array — re-ranking cost is independent of corpus size, the standard
    two-stage retrieve-then-rerank shape.
    """
    K, picks, lam = 20, 10, 0.7
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    relv = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            similarity.cosine(F.col("embedding"), F.col("qv")).alias("rel"),
        )
    )
    # distributed top-K (TakeOrderedAndProject), then rank the K-row
    # result — q320's exact shape; a global rank window over the
    # corpus-rate relevance frame would single-partition sort every
    # embedding row at scale (round-8 verdict fix)
    top = relv.orderBy(F.col("rel").desc(), F.asc("vec_id")).limit(K)
    cand = (
        top.select(
            "*",
            F.row_number()
            .over(Window.orderBy(F.col("rel").desc(), F.asc("vec_id")))
            .alias("idx"),
        )
        .localCheckpoint(eager=True)
    )
    a = cand.alias("a")
    b = cand.alias("b")
    pairs = a.join(F.broadcast(b), how="cross").select(
        F.col("a.idx").alias("i"),
        F.col("b.idx").alias("j"),
        similarity.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("s"),
    )
    mat = (
        cand.agg(
            F.array_sort(F.collect_list(F.struct("idx", "rel")))
            .getField("rel")
            .alias("rel"),
            F.array_sort(F.collect_list(F.struct("idx", F.col("vec_id"))))
            .getField("vec_id")
            .alias("ids"),
        )
        .crossJoin(
            F.broadcast(
                pairs.agg(
                    F.array_sort(
                        F.collect_list(F.struct((F.col("i") * K + F.col("j")).alias("pos"), "s"))
                    )
                    .getField("s")
                    .alias("sim")
                )
            )
        )
    )

    def _score(sel, i: int):
        max_sim = F.array_max(
            F.transform(
                sel, lambda j: F.element_at(F.col("sim"), F.lit((i - 1) * K) + j)
            )
        )
        return F.when(F.array_contains(sel, i), F.lit(-1e308)).otherwise(
            F.lit(lam) * F.element_at(F.col("rel"), i)
            - F.lit(1 - lam) * F.coalesce(max_sim, F.lit(0.0))
        )

    def _step(sel, _):
        scores = [_score(sel, i) for i in range(1, K + 1)]
        m = F.greatest(*scores)
        pick = None
        for i in range(1, K + 1):
            cond = scores[i - 1] == m
            pick = F.when(cond, i) if pick is None else pick.when(cond, i)
        return F.concat(sel, F.array(pick))

    sel = F.aggregate(
        F.sequence(F.lit(1), F.lit(picks)),
        F.array().cast("array<int>"),
        _step,
    )
    out = mat.select("rel", "ids", sel.alias("sel"))
    return out.select(
        F.explode(F.sequence(F.lit(1), F.lit(picks))).alias("rank"),
        "rel",
        "ids",
        "sel",
    ).select(
        F.col("rank").cast("int").alias("rank"),
        F.element_at(F.col("ids"), F.element_at(F.col("sel"), F.col("rank"))).alias(
            "vec_id"
        ),
        F.round(
            F.element_at(F.col("rel"), F.element_at(F.col("sel"), F.col("rank"))), 6
        ).alias("relevance"),
    )


@query(
    "q322_mahalanobis_outliers",
    oracle="""
    WITH s AS (
      SELECT event_id, event_type, value AS x1,
             CAST((epoch_ns(ts) // 1000000000 // 3600) % 24 AS DOUBLE) AS x2
      FROM events WHERE value IS NOT NULL
    ),
    mom AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(x1, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
             CAST(sum(CAST(round(x2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s2,
             CAST(sum(CAST(round(x1 * x1, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s11,
             CAST(sum(CAST(round(x2 * x2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s22,
             CAST(sum(CAST(round(x1 * x2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s12
      FROM s GROUP BY 1
    ),
    cov AS (
      SELECT event_type, n,
             s1 / n AS m1, s2 / n AS m2,
             s11 / n - (s1 / n) * (s1 / n) AS c11,
             s22 / n - (s2 / n) * (s2 / n) AS c22,
             s12 / n - (s1 / n) * (s2 / n) AS c12
      FROM mom
    ),
    d AS (
      SELECT s.event_type, c.n,
             ((s.x1 - c.m1) * (c.c22 * (s.x1 - c.m1) - c.c12 * (s.x2 - c.m2))
              + (s.x2 - c.m2) * (c.c11 * (s.x2 - c.m2) - c.c12 * (s.x1 - c.m1)))
             / (c.c11 * c.c22 - c.c12 * c.c12) AS d2
      FROM s JOIN cov c ON c.event_type = s.event_type
    )
    SELECT event_type, n,
           CAST(sum(CASE WHEN d2 > 13.8155 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           round(max(d2), 6) AS max_d2
    FROM d GROUP BY 1, 2
    """,
)
def q322_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier census per event type: squared Mahalanobis
    distance of each event's (value, hour-of-day) pair from the type's
    own 2D distribution, counted against the chi-square(2, 0.999) cut
    13.8155 — the correlation-aware anomaly gate (a value normal at 14:00
    can be an outlier at 03:00) that completes the per-feature z-score
    family. The covariance comes from 12-dp DECIMAL-folded moments (one
    pass); the 2x2 inverse is closed-form inside the distance expression,
    written identically in both engines.

    100 TB story: one map-side-combining moments pass, one broadcast of
    the 5-row covariance table back over the scan — two corpus scans,
    zero corpus-scale shuffles, no per-row matrix library.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        "event_type",
        F.col("value").alias("x1"),
        (F.expr("((ts div 1000000000) div 3600) % 24")).cast("double").alias("x2"),
    )
    mom = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("x1", 12).cast("decimal(38,12)")).cast("double").alias("s1"),
        F.sum(F.round("x2", 12).cast("decimal(38,12)")).cast("double").alias("s2"),
        F.sum(F.round(F.col("x1") * F.col("x1"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s11"),
        F.sum(F.round(F.col("x2") * F.col("x2"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s22"),
        F.sum(F.round(F.col("x1") * F.col("x2"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s12"),
    )
    cov = mom.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("m1"),
        (F.col("s2") / F.col("n")).alias("m2"),
        (F.col("s11") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))).alias("c11"),
        (F.col("s22") / F.col("n") - (F.col("s2") / F.col("n")) * (F.col("s2") / F.col("n"))).alias("c22"),
        (F.col("s12") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s2") / F.col("n"))).alias("c12"),
    )
    j = s.join(F.broadcast(cov), "event_type")
    dx1 = F.col("x1") - F.col("m1")
    dx2 = F.col("x2") - F.col("m2")
    d2 = (
        dx1 * (F.col("c22") * dx1 - F.col("c12") * dx2)
        + dx2 * (F.col("c11") * dx2 - F.col("c12") * dx1)
    ) / (F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12"))
    return j.select("event_type", "n", d2.alias("d2")).groupBy(
        "event_type", "n"
    ).agg(
        F.sum(F.when(F.col("d2") > 13.8155, 1).otherwise(0)).alias("n_outliers"),
        F.round(F.max("d2"), 6).alias("max_d2"),
    )


@query(
    "q323_robust_zscore_mad",
    oracle="""
    WITH s AS (
      SELECT event_type, value AS v FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT event_type, v, count(*) AS cnt FROM s GROUP BY 1, 2),
    cum AS (
      SELECT event_type, v, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM g
    ),
    med AS (
      SELECT event_type, min(v) AS median, min(n) AS n
      FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1
    ),
    a AS (
      SELECT g.event_type, abs(g.v - m.median) AS av, g.cnt
      FROM g JOIN med m ON m.event_type = g.event_type
    ),
    ag AS (SELECT event_type, av, sum(cnt) AS cnt FROM a GROUP BY 1, 2),
    acum AS (
      SELECT event_type, av, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY av
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM ag
    ),
    mad AS (
      SELECT event_type, min(av) AS mad
      FROM acum WHERE cum >= (n + 1) // 2 GROUP BY 1
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n,
           round(m.median, 6) AS median,
           round(d.mad, 6) AS mad,
           CAST(CASE WHEN d.mad = 0 THEN 0 ELSE (
             SELECT sum(CASE WHEN abs(0.6745 * (g.v - m.median) / d.mad) > 3.5
                             THEN g.cnt ELSE 0 END)
             FROM g WHERE g.event_type = m.event_type
           ) END AS BIGINT) AS n_outliers
    FROM med m JOIN mad d ON d.event_type = m.event_type
    """,
)
def q323_robust_zscore_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type by modified z-score
    (Iglewicz & Hoaglin 1993): 0.6745 * (x - median) / MAD with the
    |z| > 3.5 cut — the anomaly gate that, unlike mean/stddev (q322's
    moment-based cousin), does not let the outliers it hunts inflate
    their own threshold. Median and MAD are LOWER order statistics read
    off cumulative counts over the distinct-value support (exact
    integers, no interpolation to diverge between engines — disclosed
    lower-median convention).

    100 TB story: the fact table collapses to (type, value) counts once
    (map-side combine); medians come from cumulative frames over that
    distinct-value support (the documented distinct-value-frame
    exception), and the outlier count re-uses the same counted support —
    no raw-row sorting anywhere.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = (
        e.groupBy("event_type", F.col("value").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        "v",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(p).alias("n"),
    )
    med = (
        cum.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("v").alias("median"), F.min("n").alias("n"))
        .localCheckpoint(eager=True)
    )
    a = g.join(F.broadcast(med), "event_type").groupBy(
        "event_type", F.abs(F.col("v") - F.col("median")).alias("av")
    ).agg(F.sum("cnt").alias("cnt"))
    wa = (
        Window.partitionBy("event_type")
        .orderBy("av")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    acum = a.select(
        "event_type",
        "av",
        "cnt",
        F.sum("cnt").over(wa).alias("cum"),
        F.sum("cnt").over(p).alias("n"),
    )
    mad = (
        acum.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("av").alias("mad"))
    )
    stats = med.join(mad, "event_type")
    z = F.abs(
        F.lit(0.6745) * (F.col("v") - F.col("median")) / F.col("mad")
    )
    outl = (
        g.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    (F.col("mad") != 0) & (z > 3.5), F.col("cnt")
                ).otherwise(0)
            ).alias("n_outliers")
        )
    )
    return stats.join(outl, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("median", 6).alias("median"),
        F.round("mad", 6).alias("mad"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
    )


@query("q324_streaming_psi_drain", oracle=None)
def q324_streaming_psi_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Population Stability Index drained in the hash-checked
    gate — q318's bin counts accumulated ACROSS micro-batches in the
    state store (:func:`stateful.streaming_bin_counts`): the per-(type,
    bin, arm) pre-counts arrive as three event-time-sliced micro-batches,
    the two 10-bin count vectors ADD per key across batches, and the
    final drained vectors feed the identical PSI arithmetic — hash-
    matching q318's DuckDB oracle. Where the Holt/Page-Hinkley drains
    certify ORDER-SENSITIVE cross-batch recursions, this one certifies
    the COMMUTATIVE-state contract: batch boundaries and arrival order
    provably cannot move the score, which is why a PSI monitor can run
    continuously on a shuffled feed.

    Scale: state is 20 longs per key; each micro-batch does O(new bins)
    work — continuous drift scoring at O(1) memory per monitored stream.
    """
    import glob
    import os
    import shutil
    import tempfile

    from phoebe_spark.streaming.stateful import streaming_bin_counts

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        F.col("event_type"),
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.least(
            F.greatest(F.floor(F.col("value") / 50).cast("int"), F.lit(0)),
            F.lit(9),
        ).alias("bin"),
        F.expr("(ts div 1000000000) div 86400").alias("day"),
    )
    lo_hi = s.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).collect()[0]
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    third = max(1, (hi - lo + 1) // 3)

    work = tempfile.mkdtemp(prefix="q324_")
    src_dir = f"{work}/src"
    try:
        os.makedirs(src_dir)
        for i, (d_lo, d_hi) in enumerate(
            ((0, third), (third, 2 * third), (2 * third, 10**9)), start=1
        ):
            part = (
                s.filter((F.col("day") >= lo + d_lo) & (F.col("day") < lo + d_hi))
                .groupBy("event_type", "bin", "arm")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            part.coalesce(1).write.parquet(f"{work}/stage{i}")
            pf = glob.glob(f"{work}/stage{i}/part-*.parquet")[0]
            dst = f"{src_dir}/{i:03d}.parquet"
            shutil.copyfile(pf, dst)
            os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

        stream = (
            spark.readStream.schema("event_type STRING, bin INT, arm INT, cnt LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = streaming_bin_counts(stream, n_bins=10, key_col="event_type")
        sink = f"{work}/psi"
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda bdf, _bid: bdf.write.mode("append").parquet(sink))
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "q324: streaming PSI drain did not finish within 300 s — "
                "refusing to score a partial distribution"
            )
        states = spark.read.parquet(sink)
        final = (
            states.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("key").orderBy(F.col("n").desc())
                ),
            )
            .filter(F.col("rk") == 1)
            .select(F.col("key").alias("event_type"), "c0", "c1")
        )
        grid = final.select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"),
            "c0",
            "c1",
        ).select(
            "event_type",
            (F.element_at(F.col("c0"), F.col("bin") + 1) + 0.5).alias("c0"),
            (F.element_at(F.col("c1"), F.col("bin") + 1) + 0.5).alias("c1"),
        ).localCheckpoint(eager=True)
        tot = grid.groupBy("event_type").agg(
            F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
        )
        j = grid.join(F.broadcast(tot), "event_type")
        p = F.col("c0") / F.col("n0")
        qq = F.col("c1") / F.col("n1")
        x = (p - qq) * F.log(p / qq)
        psi = F.sum(F.round(x, 12).cast("decimal(38,12)")).cast("double")
        res = j.groupBy("event_type").agg(
            F.lit(10).cast("long").alias("n_bins"),
            (F.round(psi, 6) + F.lit(0.0)).alias("psi"),
            F.when(psi > 0.2, 1).otherwise(0).alias("drifted"),
        )
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the streaming drain must reproduce the batch PSI's oracle exactly —
# commutative bin-count state makes batch boundaries provably invisible
ORACLE["q324_streaming_psi_drain"] = ORACLE["q318_psi_drift"]


@query(
    "q325_rake_keyphrases",
    oracle=f"""
    WITH arr AS (
      SELECT doc_id, {_TOKS_SQL} AS ts FROM documents WHERE trim(text) <> ''
    ),
    toks AS (
      SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS pos
      FROM arr
    ),
    ns AS (
      SELECT doc_id, term, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM toks WHERE term NOT IN ('the', 'a', 'of', 'and', 'to')
    ),
    ph AS (
      SELECT doc_id, island,
             string_agg(term, ' ' ORDER BY pos) AS phrase,
             CAST(count(*) AS BIGINT) AS n_words
      FROM ns GROUP BY 1, 2
    ),
    ws AS (
      SELECT ns.term,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(ph.n_words) AS BIGINT) AS deg
      FROM ns JOIN ph ON ph.doc_id = ns.doc_id AND ph.island = ns.island
      GROUP BY 1
    ),
    psc AS (
      SELECT ph.doc_id, ph.island, ph.phrase, ph.n_words,
             CAST(sum(CAST(round(ws.deg * 1.0 / ws.freq, 12)
                  AS DECIMAL(38,12))) AS DOUBLE) AS score
      FROM ph JOIN ns ON ns.doc_id = ph.doc_id AND ns.island = ph.island
              JOIN ws ON ws.term = ns.term
      GROUP BY 1, 2, 3, 4
    ),
    census AS (
      SELECT phrase, min(n_words) AS n_words,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             min(score) AS score
      FROM psc GROUP BY 1
    ),
    top AS (
      SELECT phrase, n_words, n_occurrences, round(score, 6) AS score,
             row_number() OVER (ORDER BY score DESC, phrase ASC) AS rank
      FROM census
    )
    SELECT CAST(rank AS INT) AS rank, phrase, n_words, n_occurrences, score
    FROM top WHERE rank <= 15
    """,
)
def q325_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free token runs — segmented by
    the gaps-and-islands identity pos - row_number() so both engines
    split identically with NO regex-dialect dependence — scored by the
    classic degree/frequency word metric summed per phrase (12-dp DECIMAL
    folds, order-free), reported as the top-15 corpus keyphrases. The
    metadata-enrichment operator of a curation pipeline: cluster labels,
    dataset cards, and topic drill-downs all start from exactly this
    census.

    100 TB story: one tokenize pass feeds islands; phrase assembly is one
    (doc, island) shuffle; word stats are vocabulary-bounded; identical
    phrases share the corpus-global word scores, so the census
    deduplicates BEFORE ranking and the final top-15 is a
    WindowGroupLimit over the phrase census, not the corpus.
    """
    stop = ("the", "a", "of", "and", "to")
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select(
        "doc_id",
        F.posexplode(text.tokens(F.col("text"))).alias("pos0", "term"),
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))
    ns = (
        toks.filter(~F.col("term").isin(*stop))
        .select(
            "doc_id",
            "term",
            "pos",
            (
                F.col("pos")
                - F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("pos")
                )
            ).alias("island"),
        )
        .localCheckpoint(eager=True)
    )
    ph = (
        ns.groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("pos", "term"))).getField(
                    "term"
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .localCheckpoint(eager=True)
    )
    ws = (
        ns.join(ph, ["doc_id", "island"])
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("n_words").alias("deg"),
        )
    )
    psc = (
        ph.join(ns, ["doc_id", "island"])
        .join(ws, "term")
        .groupBy("doc_id", "island", "phrase", F.col("n_words"))
        .agg(
            F.sum(
                F.round(F.col("deg") * 1.0 / F.col("freq"), 12).cast(
                    "decimal(38,12)"
                )
            )
            .cast("double")
            .alias("score")
        )
    )
    census = psc.groupBy("phrase").agg(
        F.min("n_words").alias("n_words"),
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("score").alias("score"),
    )
    # distributed top-k (TakeOrdered) over the phrase census, then rank
    # the 15-row result — the census is vocabulary-scale, not top-k-scale
    top = census.orderBy(F.col("score").desc(), F.asc("phrase")).limit(15).select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.asc("phrase")))
        .alias("rank"),
    )
    return top.select(
        F.col("rank").cast("int").alias("rank"),
        "phrase",
        "n_words",
        "n_occurrences",
        F.round("score", 6).alias("score"),
    )


def _q326_croston_oracle(T: int = 30, a: float = 0.2) -> str:
    """Generated oracle for q326: Croston's conditional SES recursion
    unrolled as one CTE per day (the Holt treatment with CASE branches —
    integer demand counts make every branch decision engine-exact)."""
    ctes = [
        "c0_r AS (SELECT k, xs, CAST(NULL AS DOUBLE) AS z,"
        " CAST(NULL AS DOUBLE) AS p, CAST(0 AS BIGINT) AS q,"
        " CAST(0 AS BIGINT) AS started FROM series)"
    ]
    for t in range(1, T + 1):
        ctes.append(
            f"c{t} AS (SELECT k, xs, q + 1 AS qn, z, p, started FROM c{t - 1}_r)"
        )
        ctes.append(
            f"c{t}_r AS (SELECT k, xs, "
            f"CASE WHEN xs[{t}] > 0 THEN "
            f"  CASE WHEN started = 0 THEN xs[{t}]"
            f"       ELSE {a} * xs[{t}] + {1 - a} * z END "
            f"ELSE z END AS z, "
            f"CASE WHEN xs[{t}] > 0 THEN "
            f"  CASE WHEN started = 0 THEN CAST(qn AS DOUBLE)"
            f"       ELSE {a} * qn + {1 - a} * p END "
            f"ELSE p END AS p, "
            f"CASE WHEN xs[{t}] > 0 THEN 0 ELSE qn END AS q, "
            f"CASE WHEN xs[{t}] > 0 THEN 1 ELSE started END AS started "
            f"FROM c{t})"
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH hc AS (
      SELECT event_type AS k,
             epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) FILTER (WHERE value > 480) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo FROM hc),
    keys AS (SELECT DISTINCT k FROM hc),
    grid AS (SELECT keys.k, g.d, b.lo
             FROM keys CROSS JOIN (SELECT unnest(generate_series(0, {T - 1})) AS d) g,
                  bounds b),
    dense AS (
      SELECT g.k, g.d, coalesce(hc.c, 0.0) AS c
      FROM grid g LEFT JOIN hc ON hc.k = g.k AND hc.day = g.lo + g.d
    ),
    series AS (SELECT k, list(c ORDER BY d) AS xs FROM dense GROUP BY 1),
    {chain},
    nd AS (
      SELECT k, CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_demands
      FROM dense GROUP BY 1
    )
    SELECT r.k AS event_type, CAST({T} AS BIGINT) AS n_periods,
           nd.n_demands,
           round(r.z, 6) + 0.0 AS demand_size,
           round(r.p, 6) + 0.0 AS interval_est,
           round(r.z / r.p, 6) + 0.0 AS croston_f,
           round({1 - a / 2} * r.z / r.p, 6) + 0.0 AS sba_f
    FROM c{T}_r r JOIN nd ON nd.k = r.k
    """


@query("q326_croston_intermittent", oracle=_q326_croston_oracle())
def q326_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972) with the
    Syntetos-Boylan bias correction: over each type's daily count of
    rare high-value events (value > 480 — a sparse series with real zero
    days), separate SES recursions track nonzero demand SIZE and
    inter-demand INTERVAL, updated only at demand points; forecast =
    size/interval (SBA multiplies by 1 - alpha/2). The forecaster the
    Holt family mis-serves: smoothing a mostly-zero series drives Holt's
    level to noise, while Croston models the sparsity itself. The
    conditional recursion folds in ONE codegen `aggregate`; the oracle
    replays it as a generated CTE chain whose CASE branches decide on
    exact integer counts, so both engines take identical paths.

    100 TB story: the input is the O(days) per-key filtered rollup
    (map-side, predicate in the scan); the fold is a single-row array
    op — a million sparse series forecast as one groupBy + one aggregate.
    """
    e = _t(spark, sf_dir, "events")
    T, a = 30, 0.2
    hc = (
        e.groupBy(
            F.col("event_type").alias("k"),
            F.expr("(ts div 1000000000) div 86400").alias("day"),
        )
        .agg(
            F.sum(F.when(F.col("value") > 480, 1).otherwise(0))
            .cast("double")
            .alias("c")
        )
        .localCheckpoint(eager=True)
    )
    lo = hc.agg(F.min("day").alias("lo"))
    keys = hc.select("k").distinct()
    grid = keys.crossJoin(
        F.broadcast(
            lo.select(F.explode(F.sequence(F.lit(0), F.lit(T - 1))).alias("d"), "lo")
        )
    )
    dense = grid.join(
        hc, (grid.k == hc.k) & (grid.lo + grid.d == hc.day), "left"
    ).select(grid.k, grid.d, F.coalesce("c", F.lit(0.0)).alias("c"))
    series = dense.groupBy("k").agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).getField("c").alias("xs"),
        F.sum(F.when(F.col("c") > 0, 1).otherwise(0)).alias("n_demands"),
    )

    def _step(acc, x):
        qn = acc["q"] + 1
        nz = x > 0
        z = F.when(
            nz,
            F.when(acc["started"] == 0, x).otherwise(
                F.lit(a) * x + F.lit(1 - a) * acc["z"]
            ),
        ).otherwise(acc["z"])
        p = F.when(
            nz,
            F.when(acc["started"] == 0, qn.cast("double")).otherwise(
                F.lit(a) * qn + F.lit(1 - a) * acc["p"]
            ),
        ).otherwise(acc["p"])
        q = F.when(nz, F.lit(0).cast("long")).otherwise(qn)
        started = F.when(nz, F.lit(1).cast("long")).otherwise(acc["started"])
        return F.struct(
            z.alias("z"), p.alias("p"), q.alias("q"), started.alias("started")
        )

    st = F.aggregate(
        F.col("xs"),
        F.struct(
            F.lit(None).cast("double").alias("z"),
            F.lit(None).cast("double").alias("p"),
            F.lit(0).cast("long").alias("q"),
            F.lit(0).cast("long").alias("started"),
        ),
        _step,
    )
    out = series.select(
        F.col("k").alias("event_type"), "n_demands", st.alias("st")
    )
    return out.select(
        "event_type",
        F.lit(T).cast("long").alias("n_periods"),
        F.col("n_demands").cast("long").alias("n_demands"),
        (F.round(F.col("st.z"), 6) + F.lit(0.0)).alias("demand_size"),
        (F.round(F.col("st.p"), 6) + F.lit(0.0)).alias("interval_est"),
        (F.round(F.col("st.z") / F.col("st.p"), 6) + F.lit(0.0)).alias(
            "croston_f"
        ),
        (
            F.round(F.lit(1 - a / 2) * F.col("st.z") / F.col("st.p"), 6)
            + F.lit(0.0)
        ).alias("sba_f"),
    )


def _q327_dbscan_oracle(tau: float = 0.3, min_neighbors: int = 2) -> str:
    """Generated oracle for q327: the LSH candidate pairs with the q170
    literal planes, core marking by degree, a recursive reachability
    fixpoint over the core-core subgraph, and border assignment — the
    q53 CC-oracle treatment applied to density clustering."""
    planes = _lsh_planes()
    dim = len(planes[0])

    def plane_dot(p: list[float]) -> str:
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]))"
        )

    bucket = " + ".join(
        f"(CASE WHEN {plane_dot(p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    pair_dot = (
        "list_sum(list_transform(generate_series(1, len(a.embedding)), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    return f"""
    WITH RECURSIVE n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
             {bucket} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {pair_dot} / (a.nrm * b.nrm) >= {tau}
    ),
    sym AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT s, count(*) AS dg FROM sym GROUP BY 1),
    core AS (SELECT s FROM deg WHERE dg >= {min_neighbors}),
    ce AS (
      SELECT sym.s, sym.d FROM sym
      JOIN core c1 ON c1.s = sym.s JOIN core c2 ON c2.s = sym.d
    ),
    reach(doc, lbl) AS (
      SELECT s, s FROM core
      UNION
      SELECT e.s, r.lbl FROM ce e JOIN reach r ON r.doc = e.d
    ),
    comp AS (SELECT doc, min(lbl) AS cluster FROM reach GROUP BY 1),
    border AS (
      SELECT sym.s AS doc, min(comp.cluster) AS cluster
      FROM sym JOIN comp ON comp.doc = sym.d
      WHERE sym.s NOT IN (SELECT s FROM core)
      GROUP BY 1
    ),
    census AS (
      SELECT cluster,
             CAST(count(*) AS BIGINT) AS n_core,
             CAST(0 AS BIGINT) AS n_border
      FROM comp GROUP BY 1
    ),
    bc AS (SELECT cluster, CAST(count(*) AS BIGINT) AS nb FROM border GROUP BY 1),
    cl AS (
      SELECT census.cluster AS cluster_id, census.n_core,
             coalesce(bc.nb, 0) AS n_border,
             census.n_core + coalesce(bc.nb, 0) AS size
      FROM census LEFT JOIN bc ON bc.cluster = census.cluster
    ),
    tot AS (SELECT count(*) AS n FROM embeddings)
    SELECT cluster_id, n_core, n_border, CAST(size AS BIGINT) AS size FROM cl
    UNION ALL
    SELECT -1, 0, 0,
           CAST(tot.n - (SELECT coalesce(sum(size), 0) FROM cl) AS BIGINT)
    FROM tot
    """


@query("q327_dbscan_lite", oracle=_q327_dbscan_oracle())
def q327_dbscan_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based semantic clustering (DBSCAN, Ester et al. 1996,
    under the LSH candidate contract): neighbors are the deterministic
    random-hyperplane candidate pairs at cosine >= 0.3 (q170's literal
    planes, so the neighborhood graph is engine-exact and sub-quadratic),
    CORE points have >= 2 such neighbors, clusters are connected
    components of the core-core subgraph (min-label propagation, the q53
    fixpoint treatment), BORDER points attach to their lowest adjacent
    core cluster, everything else is NOISE (the -1 row) — the topic-
    discovery step between flat k-means (q242) and per-cluster semantic
    pruning (q234): clusters of arbitrary shape, no k chosen up front,
    outliers left unassigned instead of polluting a centroid.

    100 TB story: ONE shuffle on the LSH bucket key bounds the pair
    work; degree/core/census are grouped aggregates on the edge list;
    each CC round is one equi-join + grouped min on node ids. The
    LSH-neighborhood approximation IS the scale contract (recall tested
    separately in test_similarity).
    """
    tau, min_neighbors = 0.3, 2
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.lsh_bucketed_pairs(emb, _lsh_planes(), threshold=tau).select(
        "id_a", "id_b"
    ).localCheckpoint(eager=True)
    sym = (
        pairs.union(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        .distinct()
        .select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    core = deg.filter(F.col("dg") >= min_neighbors).select("s").localCheckpoint(
        eager=True
    )
    ce = (
        sym.join(core.withColumnRenamed("s", "cs"), F.col("s") == F.col("cs"))
        .join(core.withColumnRenamed("s", "cd"), F.col("d") == F.col("cd"))
        .select("s", "d")
    )
    # isolated cores (no core neighbor) must still form singleton clusters:
    # seed every core as its own edge-free node by uniting self-loops
    comp = dedup.dedup_components(
        ce.union(core.select(F.col("s"), F.col("s").alias("d"))),
        id_col_a="s",
        id_col_b="d",
    ).localCheckpoint(eager=True)
    border = (
        sym.join(core.withColumnRenamed("s", "cs"), F.col("s") == F.col("cs"), "left_anti")
        .join(comp.withColumnRenamed("doc", "d2"), F.col("d") == F.col("d2"))
        .groupBy(F.col("s").alias("doc"))
        .agg(F.min("component").alias("cluster"))
    )
    census = comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_core")
    )
    bc = border.groupBy(F.col("cluster").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    cl = (
        census.join(bc, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_core",
            F.coalesce("nb", F.lit(0)).alias("n_border"),
            (F.col("n_core") + F.coalesce("nb", F.lit(0))).alias("size"),
        )
        .localCheckpoint(eager=True)
    )
    tot = emb.agg(F.count(F.lit(1)).alias("n"))
    assigned = cl.agg(F.coalesce(F.sum("size"), F.lit(0)).alias("a"))
    noise = tot.crossJoin(F.broadcast(assigned)).select(
        F.lit(-1).cast("long").alias("cluster_id"),
        F.lit(0).cast("long").alias("n_core"),
        F.lit(0).cast("long").alias("n_border"),
        (F.col("n") - F.col("a")).cast("long").alias("size"),
    )
    return cl.select(
        "cluster_id",
        F.col("n_core").cast("long").alias("n_core"),
        F.col("n_border").cast("long").alias("n_border"),
        F.col("size").cast("long").alias("size"),
    ).unionAll(noise)


def _q328_negatives_oracle(lo: float = 0.1, hi: float = 0.3, k: int = 5) -> str:
    """Generated oracle for q328: the q170 literal-plane bucket assignment,
    a similarity band filter, and a per-anchor top-k window."""
    planes = _lsh_planes()
    dim = len(planes[0])

    def plane_dot(p: list[float]) -> str:
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]))"
        )

    bucket = " + ".join(
        f"(CASE WHEN {plane_dot(p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    pair_dot = (
        "list_sum(list_transform(generate_series(1, len(a.embedding)), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    return f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
             {bucket} AS bucket
      FROM embeddings
    ),
    pr AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {pair_dot} / (a.nrm * b.nrm) AS cs
      FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {pair_dot} / (a.nrm * b.nrm) >= {lo}
        AND {pair_dot} / (a.nrm * b.nrm) < {hi}
    ),
    sym AS (
      SELECT id_a AS anchor, id_b AS neg_id, cs FROM pr
      UNION ALL
      SELECT id_b, id_a, cs FROM pr
    ),
    rk AS (
      SELECT anchor, neg_id, cs,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY cs DESC, neg_id ASC) AS rank
      FROM sym
    )
    SELECT anchor, CAST(rank AS INT) AS rank, neg_id,
           round(cs, 6) AS cos_sim
    FROM rk WHERE rank <= {k}
    """


@query("q328_hard_negatives", oracle=_q328_negatives_oracle())
def q328_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for each
    anchor vector, the top-5 SAME-LSH-BUCKET neighbors in the similarity
    band 0.1 <= cos < 0.3 — close enough to collide in the hash (that is
    what makes them HARD) but below the near-duplicate band, i.e. exactly
    the negatives a contrastive loss learns the most from (in-batch
    random negatives are trivially far; near-dups would be false
    negatives). Deterministic: q170's literal hyperplanes, band filter,
    smallest-id tie-break — the mined pairs are reproducible across
    runs, partitionings, and engines.

    100 TB story: identical shape to q170 — one shuffle on the bucket
    key, within-bucket pair work bounded by bucket size (2^k planes the
    knob), then a WindowGroupLimit top-5 per anchor on the surviving
    band pairs only.
    """
    lo, hi, k = 0.1, 0.3, 5
    emb = _t(spark, sf_dir, "embeddings")
    pr = (
        similarity.lsh_bucketed_pairs(emb, _lsh_planes(), threshold=lo)
        .filter(F.col("cos_sim") < hi)
        .localCheckpoint(eager=True)
    )
    sym = pr.select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("neg_id"),
        F.col("cos_sim").alias("cs"),
    ).unionAll(
        pr.select(
            F.col("id_b").alias("anchor"),
            F.col("id_a").alias("neg_id"),
            F.col("cos_sim").alias("cs"),
        )
    )
    rk = sym.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy("anchor").orderBy(
                F.col("cs").desc(), F.asc("neg_id")
            )
        )
        .alias("rank"),
    ).filter(F.col("rank") <= k)
    return rk.select(
        "anchor",
        F.col("rank").cast("int").alias("rank"),
        "neg_id",
        F.round("cs", 6).alias("cos_sim"),
    )


@query(
    "q329_kneser_ney_lm",
    oracle=f"""
    WITH arr AS (
      SELECT doc_id, source, {_TOKS_SQL} AS ts
      FROM documents WHERE trim(text) <> ''
    ),
    toks AS (
      SELECT doc_id, source, unnest(ts) AS term,
             generate_subscripts(ts, 1) AS pos
      FROM arr
    ),
    bg AS (
      SELECT a.source, a.term AS v, b.term AS w
      FROM toks a JOIN toks b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ),
    c_vw AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
    c_v AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv,
                   CAST(count(*) AS BIGINT) AS n1_fwd
            FROM c_vw GROUP BY 1),
    cont AS (SELECT w, CAST(count(*) AS BIGINT) AS n1_bwd FROM c_vw GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM c_vw),
    scored AS (
      SELECT bg.source,
             ln(greatest(c_vw.c - 0.75, 0) / c_v.cv
                + (0.75 * c_v.n1_fwd / c_v.cv)
                  * (cont.n1_bwd * 1.0 / tot.n_bigram_types)) AS lp
      FROM bg JOIN c_vw ON c_vw.v = bg.v AND c_vw.w = bg.w
              JOIN c_v ON c_v.v = bg.v
              JOIN cont ON cont.w = bg.w
              CROSS JOIN tot
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(CAST(round(lp, 12) AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*), 6) + 0.0 AS mean_logprob,
           round(exp(-CAST(sum(CAST(round(lp, 12) AS DECIMAL(38,12))) AS DOUBLE)
                 / count(*)), 6) AS perplexity
    FROM scored GROUP BY 1
    """,
)
def q329_kneser_ney_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995,
    d=0.75) fit on the corpus and applied back per source: P(w|v) =
    max(c(vw)-d, 0)/c(v) + lambda(v) * Pcont(w), where the continuation
    probability counts DISTINCT contexts (the "how many things does w
    follow" insight that beats raw-frequency backoff on burst-heavy
    corpora) — the modern-smoothing tier above q285's Jelinek-Mercer
    interpolation, reported as per-source mean log-prob and perplexity.
    Every count is an exact integer (bigram counts, context totals,
    forward/backward type counts), so both engines compute identical
    probabilities; per-bigram log-probs fold as 12-dp DECIMAL(38,12).

    100 TB story: counts are map-side-combining groupBys bounded by the
    bigram vocabulary; scoring joins the bigram stream to those count
    frames on their keys — no corpus self-join, the classic shape shared
    with q285.
    """
    d_disc = 0.75
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(text.tokens(F.col("text"))).alias("pos0", "term"),
    )
    a = toks.select("doc_id", "source", "term", F.col("pos0").alias("p"))
    b = toks.select(
        F.col("doc_id").alias("doc_id2"),
        F.col("term").alias("w"),
        (F.col("pos0") - 1).alias("p2"),
    )
    bg = a.join(
        b, (F.col("doc_id") == F.col("doc_id2")) & (F.col("p") == F.col("p2"))
    ).select("source", F.col("term").alias("v"), "w")
    c_vw = bg.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=True
    )
    c_v = c_vw.groupBy("v").agg(
        F.sum("c").alias("cv"), F.count(F.lit(1)).alias("n1_fwd")
    )
    cont = c_vw.groupBy("w").agg(F.count(F.lit(1)).alias("n1_bwd"))
    tot = c_vw.agg(F.count(F.lit(1)).alias("n_bigram_types"))
    lp = F.log(
        F.greatest(F.col("c") - d_disc, F.lit(0.0)) / F.col("cv")
        + (F.lit(d_disc) * F.col("n1_fwd") / F.col("cv"))
        * (F.col("n1_bwd") * 1.0 / F.col("n_bigram_types"))
    )
    scored = (
        bg.join(c_vw, ["v", "w"])
        .join(c_v, "v")
        .join(cont, "w")
        .crossJoin(F.broadcast(tot))
        .select("source", lp.alias("lp"))
    )
    mean_lp = (
        F.sum(F.round("lp", 12).cast("decimal(38,12)")).cast("double")
        / F.count(F.lit(1))
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.round(mean_lp, 6) + F.lit(0.0)).alias("mean_logprob"),
        F.round(F.exp(-mean_lp), 6).alias("perplexity"),
    )


@query(
    "q330_mde_power",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
             CASE WHEN value > 150 THEN 1 ELSE 0 END AS conv
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n0,
             CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1,
             CAST(sum(conv) FILTER (WHERE arm = 0) AS BIGINT) AS c0
      FROM s GROUP BY 1
    )
    SELECT event_type, n0, n1,
           round(c0 * 1.0 / n0, 6) AS baseline_rate,
           round((1.959963984540054 + 0.8416212335729143)
                 * sqrt((c0 * 1.0 / n0) * (1 - c0 * 1.0 / n0)
                        * (1.0 / n0 + 1.0 / n1)), 6) AS mde_abs,
           round((1.959963984540054 + 0.8416212335729143)
                 * sqrt((c0 * 1.0 / n0) * (1 - c0 * 1.0 / n0)
                        * (1.0 / n0 + 1.0 / n1)) / (c0 * 1.0 / n0), 6)
             AS mde_rel
    FROM g
    """,
)
def q330_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for the A/B arms at alpha=0.05 (two-
    sided) and 80% power: MDE = (z_{0.975} + z_{0.8}) * sqrt(p(1-p) *
    (1/n0 + 1/n1)) over the threshold-conversion rate per event type —
    the pre-experiment sizing answer ("how small a lift CAN this split
    even see?") that belongs next to the post-hoc tests (q281 Welch,
    q297 Mann-Whitney, q303 SPRT). The normal quantiles are 17-digit
    literals embedded identically on both sides (the q237 RBO treatment
    — no inverse-CDF libm dependence); counts are exact integers, so the
    two engines compute identical rates and identical MDEs.

    100 TB story: one map-side-combining groupBy(event_type) computing
    both arms' counts in a single pass — the cheapest query in the
    experimentation ladder, and the one you run FIRST.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.when(F.col("value") > 150, 1).otherwise(0).alias("conv"),
    )
    g = s.groupBy("event_type").agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
    )
    p = F.col("c0") * 1.0 / F.col("n0")
    z = F.lit(1.959963984540054) + F.lit(0.8416212335729143)
    mde = z * F.sqrt(p * (1 - p) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    return g.select(
        "event_type",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(p, 6).alias("baseline_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p, 6).alias("mde_rel"),
    )


@query(
    "q331_srm_check",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n0,
             CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS n1
      FROM events GROUP BY 1
    )
    SELECT event_type, n0, n1,
           round((n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1), 6) AS chi2,
           CASE WHEN (n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1) > 3.841458820694124
                THEN 1 ELSE 0 END AS srm
    FROM g
    """,
)
def q331_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the A/B split (the FIRST gate an
    experimentation platform runs — a biased assignment invalidates every
    downstream test): chi-square with 1 df against the expected 50/50,
    chi2 = (n0-n1)^2/(n0+n1), flagged above the 0.05 critical value
    (17-digit literal, no inverse-CDF dependence). Counts are exact
    integers; one division. Completes the experimentation ladder:
    SRM -> MDE (q330) -> Welch/Mann-Whitney/KS/CvM -> SPRT.

    100 TB story: one map-side-combining groupBy computing both arm
    counts in a single pass.
    """
    e = _t(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("n0"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("n1"),
    )
    chi2 = (
        (F.col("n0") - F.col("n1"))
        * (F.col("n0") - F.col("n1"))
        * 1.0
        / (F.col("n0") + F.col("n1"))
    )
    return g.select(
        "event_type",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > 3.841458820694124, 1).otherwise(0).alias("srm"),
    )


@query(
    "q332_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2),
    tr AS (
      SELECT event_type, day, v,
             avg(v) OVER w AS trend, count(*) OVER w AS wn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    dt AS (
      SELECT event_type, CAST(day % 7 AS INT) AS dow, v - trend AS d
      FROM tr WHERE wn = 7),
    se AS (
      SELECT event_type, dow,
             CAST(sum(CAST(round(d, 12) AS DECIMAL(38,12))) AS DOUBLE)
               / count(*) AS s
      FROM dt GROUP BY 1, 2),
    r AS (
      SELECT dt.event_type, dt.d, dt.d - se.s AS rem
      FROM dt JOIN se ON se.event_type = dt.event_type AND se.dow = dt.dow),
    v AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(d, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sd,
             CAST(sum(CAST(round(d * d, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sd2,
             CAST(sum(CAST(round(rem, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sr,
             CAST(sum(CAST(round(rem * rem, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sr2
      FROM r GROUP BY 1)
    SELECT event_type, n,
           round(greatest(0.0, 1 - (sr2 / n - (sr / n) * (sr / n))
                               / (sd2 / n - (sd / n) * (sd / n))), 6) + 0.0
             AS seasonal_strength
    FROM v
    """,
)
def q332_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's seasonal-strength diagnostic F_S = max(0, 1 -
    Var(remainder)/Var(detrended)) over the q191 decomposition (trend =
    centered 7-day MA on full windows, seasonal = day-of-week mean of the
    detrended series, remainder = detrended - seasonal): the one-number
    answer to "does this series HAVE a weekly cycle worth modeling",
    which decides between the seasonal-naive (q270), Holt (q273), and
    Holt-Winters (q284) forecasters. All moments fold as 12-dp
    DECIMAL(38,12); variances are identical ratios of identical sums.

    100 TB story: q191's shape — one (type, day) rollup, one days-sized
    window per type, one dow-profile join, one grouped moment fold.
    """
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.expr("(ts div 1000000000) div 86400").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    dt = (
        daily.select(
            "event_type",
            "day",
            "v",
            F.avg("v").over(w).alias("trend"),
            F.count(F.lit(1)).over(w).alias("wn"),
        )
        .filter(F.col("wn") == 7)
        .select(
            "event_type",
            (F.col("day") % 7).cast("int").alias("dow"),
            (F.col("v") - F.col("trend")).alias("d"),
        )
        .localCheckpoint(eager=True)
    )
    se = dt.groupBy("event_type", "dow").agg(
        (
            F.sum(F.round("d", 12).cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("s")
    )
    r = dt.join(F.broadcast(se), ["event_type", "dow"]).select(
        "event_type", "d", (F.col("d") - F.col("s")).alias("rem")
    )
    v = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("d", 12).cast("decimal(38,12)")).cast("double").alias("sd"),
        F.sum(F.round(F.col("d") * F.col("d"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sd2"),
        F.sum(F.round("rem", 12).cast("decimal(38,12)")).cast("double").alias("sr"),
        F.sum(F.round(F.col("rem") * F.col("rem"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sr2"),
    )
    var_r = F.col("sr2") / F.col("n") - (F.col("sr") / F.col("n")) * (
        F.col("sr") / F.col("n")
    )
    var_d = F.col("sd2") / F.col("n") - (F.col("sd") / F.col("n")) * (
        F.col("sd") / F.col("n")
    )
    return v.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (
            F.round(F.greatest(F.lit(0.0), 1 - var_r / var_d), 6) + F.lit(0.0)
        ).alias("seasonal_strength"),
    )


@query(
    "q333_hill_tail_index",
    oracle="""
    WITH g AS (
      SELECT event_type, value AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL AND value > 0 GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, v, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY v DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM g
    ),
    xk AS (
      SELECT event_type, min(v) AS x_k
      FROM cum WHERE cum >= 100 GROUP BY 1
    ),
    taken AS (
      SELECT c.event_type,
             least(c.cnt, 100 - (c.cum - c.cnt)) AS take, c.v, k.x_k
      FROM cum c JOIN xk k ON k.event_type = c.event_type
      WHERE c.cum - c.cnt < 100 AND c.v >= k.x_k
    )
    SELECT event_type,
           CAST(100 AS BIGINT) AS k,
           round(min(x_k), 6) AS x_k,
           round(CAST(sum(CAST(round(take * ln(v / x_k), 12)
                 AS DECIMAL(38,12))) AS DOUBLE) / 100, 6) + 0.0 AS hill_gamma,
           round(100.0 / CAST(sum(CAST(round(take * ln(v / x_k), 12)
                 AS DECIMAL(38,12))) AS DOUBLE), 6) AS tail_alpha
    FROM taken GROUP BY 1
    """,
)
def q333_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the value distribution's tail index (Hill 1975,
    k=100): gamma = (1/k) * sum over the k largest observations of
    ln(x_(i) / x_(k)), alpha = 1/gamma — the heavy-tail diagnostic that
    tells a pipeline whether its latency/size/cost column even HAS a
    finite variance (alpha < 2: plan for extremes, winsorize, budget by
    quantiles not means). The top-k comes from cumulative counts over the
    DESCENDING distinct-value support with exact multiplicity splitting
    at the k-boundary — no raw-row sort, no sampling; per-value terms
    fold as 12-dp DECIMAL(38,12).

    100 TB story: one map-side-combining groupBy(type, value), one
    distinct-value cumulative frame per type (the documented exception),
    one grouped fold — the tail census costs the same as any quantile.
    """
    k = 100
    e = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    g = e.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select(
        "event_type", "v", "cnt", F.sum("cnt").over(w).alias("cum")
    ).localCheckpoint(eager=True)
    xk = (
        cum.filter(F.col("cum") >= k)
        .groupBy("event_type")
        .agg(F.min("v").alias("x_k"))
    )
    taken = (
        cum.join(F.broadcast(xk), "event_type")
        .filter((F.col("cum") - F.col("cnt") < k) & (F.col("v") >= F.col("x_k")))
        .select(
            "event_type",
            F.least(F.col("cnt"), F.lit(k) - (F.col("cum") - F.col("cnt"))).alias(
                "take"
            ),
            "v",
            "x_k",
        )
    )
    s = F.sum(
        F.round(F.col("take") * F.log(F.col("v") / F.col("x_k")), 12).cast(
            "decimal(38,12)"
        )
    ).cast("double")
    return taken.groupBy("event_type").agg(
        F.lit(k).cast("long").alias("k"),
        F.round(F.min("x_k"), 6).alias("x_k"),
        (F.round(s / k, 6) + F.lit(0.0)).alias("hill_gamma"),
        F.round(F.lit(float(k)) / s, 6).alias("tail_alpha"),
    )


@query(
    "q334_odds_ratio",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 150
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN user_id % 2 = 0 AND value <= 150
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 150
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN user_id % 2 = 1 AND value <= 150
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT event_type, a, b, c, d,
           round((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)), 6)
             AS odds_ratio,
           round(exp(ln((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
                 - 1.959963984540054
                   * sqrt(1.0/(a + 0.5) + 1.0/(b + 0.5)
                          + 1.0/(c + 0.5) + 1.0/(d + 0.5))), 6) AS ci_lo,
           round(exp(ln((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
                 + 1.959963984540054
                   * sqrt(1.0/(a + 0.5) + 1.0/(b + 0.5)
                          + 1.0/(c + 0.5) + 1.0/(d + 0.5))), 6) AS ci_hi,
           CASE WHEN exp(ln((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
                     - 1.959963984540054
                       * sqrt(1.0/(a + 0.5) + 1.0/(b + 0.5)
                              + 1.0/(c + 0.5) + 1.0/(d + 0.5))) > 1
                  OR exp(ln((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
                     + 1.959963984540054
                       * sqrt(1.0/(a + 0.5) + 1.0/(b + 0.5)
                              + 1.0/(c + 0.5) + 1.0/(d + 0.5))) < 1
                THEN 1 ELSE 0 END AS significant
    FROM s
    """,
)
def q334_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio of threshold conversion between the A/B arms with the
    Wald 95% confidence interval (log OR +/- z*sqrt(1/a+1/b+1/c+1/d)) —
    the effect-SIZE report beside the yes/no tests (q281 Welch, q331
    SRM): a significant-but-OR=1.01 result and an OR=2 result read very
    differently to whoever acts on the experiment. The 2x2 table is
    exact integers from one conditional-aggregation pass with the
    Haldane-Anscombe +0.5 correction (rare cells can be empty — a raw
    OR would divide by zero); the z quantile is a 17-digit literal on
    both sides.

    100 TB story: one map-side-combining groupBy computing all four
    cells in a single pass — same shape as q281/q330/q331.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    arm0 = F.col("user_id") % 2 == 0
    conv = F.col("value") > 150
    s = e.groupBy("event_type").agg(
        F.sum(F.when(arm0 & conv, 1).otherwise(0)).alias("a"),
        F.sum(F.when(arm0 & ~conv, 1).otherwise(0)).alias("b"),
        F.sum(F.when(~arm0 & conv, 1).otherwise(0)).alias("c"),
        F.sum(F.when(~arm0 & ~conv, 1).otherwise(0)).alias("d"),
    )
    a, b, c, d = (F.col(x) + 0.5 for x in ("a", "b", "c", "d"))
    orr = a * d / (b * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    z = F.lit(1.959963984540054)
    lo = F.exp(F.log(orr) - z * se)
    hi = F.exp(F.log(orr) + z * se)
    return s.select(
        "event_type",
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round(lo, 6).alias("ci_lo"),
        F.round(hi, 6).alias("ci_hi"),
        F.when((lo > 1) | (hi < 1), 1).otherwise(0).alias("significant"),
    )


@query(
    "q335_term_burstiness",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
      WHERE trim(text) <> ''
    ),
    st AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS cf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY 1
    ),
    top AS (
      SELECT term, cf, df,
             round(cf * 1.0 / df, 6) AS burstiness,
             round((cf - df) * 1.0 / cf, 6) AS p_repeat
      FROM st WHERE cf >= 10
      ORDER BY cf * 1.0 / df DESC, term ASC LIMIT 20
    )
    SELECT term, cf, df, burstiness, p_repeat FROM top
    """,
)
def q335_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale term burstiness (Church & Gale 1995): collection
    frequency over document frequency per term, with the adaptation
    probability P(repeat | occurred) = (cf-df)/cf — the top-20 burstiest
    terms (cf >= 10 support) are the templated/boilerplate vocabulary a
    curation pass inspects first: a term that appears 40 times in 3
    documents is structure, not language. Pure integer counts; the top-k
    is a distributed TakeOrdered over the vocabulary-bounded stats.

    100 TB story: one map-side-combining groupBy(term) computing cf and
    df together; everything after runs on the vocabulary.
    """
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
    st = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    b = F.col("cf") * 1.0 / F.col("df")
    return (
        st.filter(F.col("cf") >= 10)
        .orderBy(b.desc(), F.asc("term"))
        .limit(20)
        .select(
            "term",
            F.col("cf").cast("long").alias("cf"),
            F.col("df").cast("long").alias("df"),
            F.round(b, 6).alias("burstiness"),
            F.round((F.col("cf") - F.col("df")) * 1.0 / F.col("cf"), 6).alias(
                "p_repeat"
            ),
        )
    )


@query(
    "q336_gini_simpson",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
      WHERE trim(text) <> ''
    ),
    st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
           FROM toks GROUP BY 1, 2),
    agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST(sum(n * (n - 1)) AS BIGINT) AS pair_mass
      FROM st GROUP BY 1
    )
    SELECT source, n_types, n_tokens,
           round(1.0 - pair_mass * 1.0 / (n_tokens * (n_tokens - 1)), 6)
             AS gini_simpson,
           round((n_tokens * (n_tokens - 1)) * 1.0 / pair_mass, 6)
             AS inv_simpson
    FROM agg
    """,
)
def q336_gini_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased Gini-Simpson lexical diversity per source (Simpson 1949,
    Hurlbert's finite-sample form): 1 - sum n_i(n_i-1) / (N(N-1)) — the
    probability two tokens drawn WITHOUT replacement differ — plus the
    inverse-Simpson effective vocabulary size. The estimator's core is
    EXACT INTEGER arithmetic (pair mass over pair count), so unlike the
    entropy profile (q93) there is no per-term float fold to quantize at
    all: both engines divide the same two BIGINTs. Low diversity with
    high token count flags templated sources the Zipf/entropy signals
    corroborate.

    100 TB story: one map-side-combining groupBy(source, term), one
    source-level rollup — vocabulary-bounded, like every corpus-health
    signal in the text family.
    """
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select("source", F.explode(text.tokens(F.col("text"))).alias("term"))
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n"))
    agg = st.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("n").alias("n_tokens"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("pair_mass"),
    )
    nn = F.col("n_tokens") * (F.col("n_tokens") - 1)
    return agg.select(
        "source",
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(1.0 - F.col("pair_mass") * 1.0 / nn, 6).alias("gini_simpson"),
        F.round(nn * 1.0 / F.col("pair_mass"), 6).alias("inv_simpson"),
    )


@query(
    "q337_lift_gain_curve",
    oracle="""
    WITH s AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS pos
          FROM s GROUP BY 1),
    cum AS (
      SELECT score, n, pos,
             sum(n) OVER w - n AS cum_before,
             sum(n) OVER (ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS total,
             sum(pos) OVER (ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS total_pos
      FROM g
      WINDOW w AS (ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    dec AS (
      SELECT least(CAST(cum_before * 10 // total AS INT), 9) AS decile,
             n, pos, total, total_pos
      FROM cum
    ),
    agg AS (
      SELECT decile, CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS conversions,
             min(total) AS total, min(total_pos) AS total_pos
      FROM dec GROUP BY 1
    )
    SELECT CAST(decile AS INT) AS decile, n, conversions,
           round(conversions * 1.0 / n, 6) AS conv_rate,
           round((conversions * 1.0 / n)
                 / (total_pos * 1.0 / total), 6) AS lift,
           round(sum(conversions) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1.0 / total_pos, 6) AS cum_gain
    FROM agg
    """,
)
def q337_lift_gain_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative-gain curve for a score against a binary
    outcome (score = value, outcome = purchase event): rank the
    population by score descending, cut into 10 population deciles, and
    report each decile's conversion rate, lift over the base rate, and
    cumulative gain — the model-eval table behind every 'top-decile
    targeting' decision, next to ROC-AUC (q279) and calibration (q280).
    Deciles are cut on cumulative counts over the DESCENDING distinct-
    score support with ties kept together (a tied score never straddles
    a decile — deterministic in both engines, disclosed), so all counts
    are exact integers and the only floats are final ratios of identical
    BIGINTs.

    100 TB story: one map-side-combining groupBy(score) collapses the
    population to the score support; the decile cut is a cumulative
    frame over that support (the documented distinct-value exception);
    the report is a 10-row rollup.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w = (
        Window.orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = g.select(
        "n",
        "pos",
        (F.sum("n").over(w) - F.col("n")).alias("cum_before"),
        F.sum("n").over(tot).alias("total"),
        F.sum("pos").over(tot).alias("total_pos"),
    )
    dec = cum.select(
        F.least(
            F.expr("(cum_before * 10) div total").cast("int"), F.lit(9)
        ).alias("decile"),
        "n",
        "pos",
        "total",
        "total_pos",
    )
    agg = dec.groupBy("decile").agg(
        F.sum("n").alias("n"),
        F.sum("pos").alias("conversions"),
        F.min("total").alias("total"),
        F.min("total_pos").alias("total_pos"),
    )
    cw = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("long").alias("n"),
        F.col("conversions").cast("long").alias("conversions"),
        F.round(F.col("conversions") * 1.0 / F.col("n"), 6).alias("conv_rate"),
        F.round(
            (F.col("conversions") * 1.0 / F.col("n"))
            / (F.col("total_pos") * 1.0 / F.col("total")),
            6,
        ).alias("lift"),
        F.round(
            F.sum("conversions").over(cw) * 1.0 / F.col("total_pos"), 6
        ).alias("cum_gain"),
    )


@query(
    "q338_chao1_richness",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS_SQL}) AS term FROM documents
      WHERE trim(text) <> ''
    ),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
    f AS (
      SELECT CAST(count(*) AS BIGINT) AS s_obs,
             CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(sum(n) AS BIGINT) AS n_tokens
      FROM c
    )
    SELECT s_obs, f1, f2, n_tokens,
           round(s_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6) AS chao1,
           round(s_obs / (s_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1))), 6)
             AS coverage_frac,
           round(1.0 - f1 * 1.0 / n_tokens, 6) AS good_turing_coverage
    FROM f
    """,
)
def q338_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of the TOTAL vocabulary (Chao
    1984, bias-corrected form S_obs + f1(f1-1)/(2(f2+1))) from the hapax
    and doubleton counts, plus Good-Turing sample coverage 1 - f1/N —
    the "how many types exist that we have not seen yet" companion to
    the Heaps'-law growth fit (q309): Heaps says how fast new types
    arrive, Chao1 says how many remain, and together they size a
    tokenizer vocabulary before committing to it. Every input is an
    exact integer (type count, singleton/doubleton counts, token total);
    the only floats are three final ratios of identical BIGINTs.

    100 TB story: one map-side-combining groupBy(term), one 4-number
    rollup over the vocabulary — the cheapest possible corpus-coverage
    certificate.
    """
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    c = (
        d.select(F.explode(text.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f = c.agg(
        F.count(F.lit(1)).alias("s_obs"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0)).alias("f2"),
        F.sum("n").alias("n_tokens"),
    )
    chao1 = F.col("s_obs") + F.col("f1") * (F.col("f1") - 1) / (
        2.0 * (F.col("f2") + 1)
    )
    return f.select(
        F.col("s_obs").cast("long").alias("s_obs"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(chao1, 6).alias("chao1"),
        F.round(F.col("s_obs") / chao1, 6).alias("coverage_frac"),
        F.round(1.0 - F.col("f1") * 1.0 / F.col("n_tokens"), 6).alias(
            "good_turing_coverage"
        ),
    )


@query(
    "q339_median_ci",
    oracle="""
    WITH s AS (
      SELECT event_type, value AS v FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS cnt
          FROM s GROUP BY 1, 2),
    cum AS (
      SELECT event_type, v, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM g
    ),
    ranks AS (
      SELECT event_type, min(n) AS n,
             CAST(floor((min(n) + 1) / 2.0
                  - 1.959963984540054 * sqrt(min(n) / 4.0)) AS BIGINT) AS r_lo,
             CAST(ceil((min(n) + 1) / 2.0
                  + 1.959963984540054 * sqrt(min(n) / 4.0)) AS BIGINT) AS r_hi
      FROM cum GROUP BY 1
    ),
    med AS (
      SELECT c.event_type, min(c.v) AS median
      FROM cum c WHERE c.cum >= (c.n + 1) // 2 GROUP BY 1
    ),
    lo AS (
      SELECT c.event_type, min(c.v) AS ci_lo
      FROM cum c JOIN ranks r ON r.event_type = c.event_type
      WHERE c.cum >= r.r_lo GROUP BY 1
    ),
    hi AS (
      SELECT c.event_type, min(c.v) AS ci_hi
      FROM cum c JOIN ranks r ON r.event_type = c.event_type
      WHERE c.cum >= r.r_hi GROUP BY 1
    )
    SELECT m.event_type, CAST(r.n AS BIGINT) AS n,
           round(m.median, 6) AS median,
           round(lo.ci_lo, 6) AS ci_lo,
           round(hi.ci_hi, 6) AS ci_hi
    FROM med m JOIN ranks r ON r.event_type = m.event_type
    JOIN lo ON lo.event_type = m.event_type
    JOIN hi ON hi.event_type = m.event_type
    """,
)
def q339_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median by the
    order-statistic (binomial) method: the interval is the pair of
    sample values at ranks (n+1)/2 -/+ z*sqrt(n)/4*2 (the normal
    approximation to Binomial(n, 1/2) rank bounds, z as a 17-digit
    literal) — no bootstrap, no RNG, no distributional assumption: the
    inference tier of the robust-statistics family (q323 gives the
    point estimates, this bounds them). Ranks are exact integers
    (floor/ceil of identical doubles), order statistics read off
    cumulative counts over the distinct-value support.

    100 TB story: the q323 shape — one (type, value) rollup, per-type
    cumulative frames over the support, three rank probes that reuse
    the same frame.
    """
    z = 1.959963984540054
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = e.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        "v",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(p).alias("n"),
    ).localCheckpoint(eager=True)
    ranks = cum.groupBy("event_type").agg(
        F.min("n").alias("n"),
        F.floor(
            (F.min("n") + 1) / 2.0 - z * F.sqrt(F.min("n") / 4.0)
        ).cast("long").alias("r_lo"),
        F.ceil(
            (F.min("n") + 1) / 2.0 + z * F.sqrt(F.min("n") / 4.0)
        ).cast("long").alias("r_hi"),
    )
    med = (
        cum.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("v").alias("median"))
    )
    lo = (
        cum.join(F.broadcast(ranks), "event_type")
        .filter(F.col("cum") >= F.col("r_lo"))
        .groupBy("event_type")
        .agg(F.min("v").alias("ci_lo"))
    )
    hi = (
        cum.join(F.broadcast(ranks), "event_type")
        .filter(F.col("cum") >= F.col("r_hi"))
        .groupBy("event_type")
        .agg(F.min("v").alias("ci_hi"))
    )
    return (
        med.join(ranks, "event_type")
        .join(lo, "event_type")
        .join(hi, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round("median", 6).alias("median"),
            F.round("ci_lo", 6).alias("ci_lo"),
            F.round("ci_hi", 6).alias("ci_hi"),
        )
    )


@query(
    "q340_simpsons_paradox",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 150
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN user_id % 2 = 0 AND value <= 150
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 150
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN user_id % 2 = 1 AND value <= 150
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    strata AS (
      SELECT event_type, a, b, c, d,
             CASE WHEN a * 1.0 * (c + d) > c * 1.0 * (a + b) THEN 1
                  WHEN a * 1.0 * (c + d) < c * 1.0 * (a + b) THEN -1
                  ELSE 0 END AS direction
      FROM s
    ),
    pooled AS (
      SELECT sum(a) AS a, sum(b) AS b, sum(c) AS c, sum(d) AS d,
             CASE WHEN sum(a) * 1.0 * (sum(c) + sum(d))
                       > sum(c) * 1.0 * (sum(a) + sum(b)) THEN 1
                  WHEN sum(a) * 1.0 * (sum(c) + sum(d))
                       < sum(c) * 1.0 * (sum(a) + sum(b)) THEN -1
                  ELSE 0 END AS direction
      FROM s
    )
    SELECT st.event_type,
           round(st.a * 1.0 / (st.a + st.b), 6) AS rate_arm0,
           round(st.c * 1.0 / (st.c + st.d), 6) AS rate_arm1,
           CAST(st.direction AS INT) AS stratum_direction,
           CAST(p.direction AS INT) AS pooled_direction,
           CASE WHEN st.direction <> 0 AND p.direction <> 0
                     AND st.direction <> p.direction
                THEN 1 ELSE 0 END AS reversed
    FROM strata st CROSS JOIN pooled p
    """,
)
def q340_simpsons_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit of the A/B conversion comparison: per
    stratum (event type), which arm converts better — and does the
    POOLED comparison point the same way? A `reversed=1` row is the
    classic aggregation trap (Simpson 1951): the pooled table says arm 1
    wins while this stratum says arm 0 does, meaning the pooled
    conclusion is confounded by the stratum mix and must not ship. The
    direction compare is EXACT integer cross-multiplication
    (a*(c+d) vs c*(a+b) — no rate division before the decision), so the
    flag cannot flip on float noise.

    100 TB story: one conditional-aggregation pass builds every 2x2
    stratum table; the pooled table is a 1-row rollup of the strata
    broadcast back over the 5-row frame.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    arm0 = F.col("user_id") % 2 == 0
    conv = F.col("value") > 150
    s = e.groupBy("event_type").agg(
        F.sum(F.when(arm0 & conv, 1).otherwise(0)).alias("a"),
        F.sum(F.when(arm0 & ~conv, 1).otherwise(0)).alias("b"),
        F.sum(F.when(~arm0 & conv, 1).otherwise(0)).alias("c"),
        F.sum(F.when(~arm0 & ~conv, 1).otherwise(0)).alias("d"),
    ).localCheckpoint(eager=True)

    def direction(a, b, c, d):
        lhs = a * 1.0 * (c + d)
        rhs = c * 1.0 * (a + b)
        return F.when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0)

    strata = s.select(
        "event_type",
        "a",
        "b",
        "c",
        "d",
        direction(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias(
            "direction"
        ),
    )
    pooled = s.agg(
        F.sum("a").alias("pa"),
        F.sum("b").alias("pb"),
        F.sum("c").alias("pc"),
        F.sum("d").alias("pd"),
    ).select(
        direction(F.col("pa"), F.col("pb"), F.col("pc"), F.col("pd")).alias(
            "p_direction"
        )
    )
    return strata.crossJoin(F.broadcast(pooled)).select(
        "event_type",
        F.round(F.col("a") * 1.0 / (F.col("a") + F.col("b")), 6).alias(
            "rate_arm0"
        ),
        F.round(F.col("c") * 1.0 / (F.col("c") + F.col("d")), 6).alias(
            "rate_arm1"
        ),
        F.col("direction").cast("int").alias("stratum_direction"),
        F.col("p_direction").cast("int").alias("pooled_direction"),
        F.when(
            (F.col("direction") != 0)
            & (F.col("p_direction") != 0)
            & (F.col("direction") != F.col("p_direction")),
            1,
        )
        .otherwise(0)
        .alias("reversed"),
    )


@query(
    "q341_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
      WHERE trim(text) <> ''
    ),
    topw AS (
      SELECT term FROM (
        SELECT term, count(*) AS n FROM toks GROUP BY 1
        ORDER BY n DESC, term ASC LIMIT 50
      )
    ),
    st AS (
      SELECT t.source, t.term, CAST(count(*) AS BIGINT) AS n
      FROM toks t JOIN topw w ON w.term = t.term
      GROUP BY 1, 2
    ),
    ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
           FROM toks GROUP BY 1),
    grid AS (
      SELECT ns.source, w.term,
             coalesce(st.n, 0) * 1000000.0 / ns.n_s AS fpm
      FROM ns CROSS JOIN topw w
      LEFT JOIN st ON st.source = ns.source AND st.term = w.term
    ),
    mom AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(fpm, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s1,
             CAST(sum(CAST(round(fpm * fpm, 12) AS DECIMAL(38,12))) AS DOUBLE)
               AS s2
      FROM grid GROUP BY 1
    ),
    z AS (
      SELECT g.source, g.term,
             (g.fpm - m.s1 / m.k)
             / sqrt(greatest(m.s2 / m.k - (m.s1 / m.k) * (m.s1 / m.k),
                             1e-300)) AS zv
      FROM grid g JOIN mom m ON m.term = g.term
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(sum(CAST(round(abs(a.zv - b.zv), 12)
                  AS DECIMAL(38,12))) AS DOUBLE) / 50 AS delta
      FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, round(delta, 6) AS burrows_delta
    FROM pairs
    """,
)
def q341_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between sources (Burrows 2002,
    the standard authorship-attribution measure): per-source frequencies
    per million of the corpus's top-50 words, z-scored ACROSS sources per
    word, pairwise mean |z_a - z_b| — near-zero Delta between two
    'different' sources is the syndication/laundering fingerprint
    content-level dedup misses when the texts differ but the WRITING
    doesn't. Function-word profiles are the signal precisely because
    no copy-editor changes them.

    Determinism: top-50 by (count desc, term asc); fpm and moments fold
    as 12-dp DECIMAL(38,12); the z and delta arithmetic is identical
    ratios of identical sums; absent (source, word) cells contribute
    fpm=0 via the full grid.

    100 TB story: one tokenize pass feeds the word census and the
    per-source counts of 50 words; the grid/z/delta all run on the
    sources x 50 frame — pair work is sources-squared, not corpus
    anything.
    """
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select("source", F.explode(text.tokens(F.col("text"))).alias("term"))
    topw = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.asc("term"))
        .limit(50)
        .select("term")
        .localCheckpoint(eager=True)
    )
    st = (
        toks.join(F.broadcast(topw), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ns = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    grid = (
        ns.crossJoin(F.broadcast(topw))
        .join(st, ["source", "term"], "left")
        .select(
            "source",
            "term",
            (F.coalesce("n", F.lit(0)) * 1000000.0 / F.col("n_s")).alias("fpm"),
        )
        .localCheckpoint(eager=True)
    )
    mom = grid.groupBy("term").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round("fpm", 12).cast("decimal(38,12)")).cast("double").alias("s1"),
        F.sum(F.round(F.col("fpm") * F.col("fpm"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("k")
    sd = F.sqrt(F.greatest(F.col("s2") / F.col("k") - mean * mean, F.lit(1e-300)))
    z = grid.join(F.broadcast(mom), "term").select(
        "source", "term", ((F.col("fpm") - mean) / sd).alias("zv")
    )
    a = z.alias("a")
    b = z.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(
            (
                F.sum(
                    F.round(F.abs(F.col("a.zv") - F.col("b.zv")), 12).cast(
                        "decimal(38,12)"
                    )
                ).cast("double")
                / 50
            ).alias("delta")
        )
    )
    return pairs.select("src_a", "src_b", F.round("delta", 6).alias("burrows_delta"))


# ---------------------------------------------------------------------------
# Round-9: multiple testing, drift distances, agreement, and the
# experimentation ladder's stratified/adjusted tier
# ---------------------------------------------------------------------------


def _p2_sql(x: str) -> str:
    """Two-sided normal p-value erfc(x) for x = |z|/sqrt(2) as a DuckDB
    expression — Abramowitz & Stegun 7.1.26 (public handbook, |err| <
    1.5e-7), evaluated with the IDENTICAL Horner chain and literals as
    the engine column so both sides agree bit-for-bit (same IEEE ops in
    the same order; statistical accuracy disclosed, parity exact)."""
    t = f"(1.0/(1.0 + 0.3275911*({x})))"
    return (
        f"({t}*(0.254829592 + {t}*(-0.284496736 + {t}*(1.421413741 + "
        f"{t}*(-1.453152027 + {t}*1.061405429)))) * exp(-({x})*({x})))"
    )


def _p2_col(x: F.Column) -> F.Column:
    """Engine twin of :func:`_p2_sql` — same Horner order, same literals."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    return (
        t
        * (
            F.lit(0.254829592)
            + t
            * (
                F.lit(-0.284496736)
                + t
                * (
                    F.lit(1.421413741)
                    + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
                )
            )
        )
        * F.exp(-(x * x))
    )


_INV_SQRT2 = 0.7071067811865476  # 1/sqrt(2), correctly rounded literal

_Q342_Z_SQL = """
    g AS (
      SELECT event_type,
             CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n0,
             CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1,
             CAST(sum(conv) FILTER (WHERE arm = 0) AS BIGINT) AS c0,
             CAST(sum(conv) FILTER (WHERE arm = 1) AS BIGINT) AS c1
      FROM (SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
                   CASE WHEN value > 150 THEN 1 ELSE 0 END AS conv
            FROM events WHERE value IS NOT NULL)
      GROUP BY event_type
    ),
    z AS (
      SELECT event_type, n0, n1,
             (c1 * 1.0 / n1 - c0 * 1.0 / n0)
             / sqrt(((c0 + c1) * 1.0 / (n0 + n1)) * (1.0 - (c0 + c1) * 1.0 / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)) AS zs
      FROM g
    )
"""


@query(
    "q342_bh_fdr",
    oracle=f"""
    WITH {_Q342_Z_SQL},
    p AS (
      SELECT event_type, n0, n1, zs,
             {_p2_sql(f"abs(zs) * {_INV_SQRT2}")} AS pv
      FROM z
    ),
    r AS (
      SELECT *, row_number() OVER (ORDER BY pv ASC, event_type ASC) AS rk,
             count(*) OVER () AS m
      FROM p
    ),
    k AS (SELECT coalesce(max(CASE WHEN pv <= rk * 0.05 / m THEN rk END), 0) AS kmax FROM r)
    SELECT event_type, n0, n1,
           round(zs, 6) + 0.0 AS z,
           round(pv, 6) + 0.0 AS p_value,
           CAST(rk AS INT) AS bh_rank,
           round(rk * 0.05 / m, 6) AS bh_threshold,
           CAST(CASE WHEN rk <= k.kmax THEN 1 ELSE 0 END AS INT) AS reject
    FROM r CROSS JOIN k
    """,
)
def q342_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg 1995)
    over the per-event-type two-proportion z-tests (arm = user parity,
    conversion = value > 150, q330's construction): rank the m p-values
    ascending, find the largest k with p_(k) <= k*alpha/m (alpha=0.05),
    reject hypotheses 1..k — the multiple-testing guard every metrics
    platform needs once it tests five event types at once (pairs the
    single-test tier q330/q331/q334). p-values via the Abramowitz-Stegun
    erfc polynomial evaluated with IDENTICAL literals/order in both
    engines, so ranks and rejections match exactly.

    100 TB story: the corpus collapses to m per-type count rows in ONE
    map-side-combining aggregate; z/p/BH all run on the m-row frame (the
    rank window is over m = #event-types rows — the audited aggregated-
    support exception)."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = e.groupBy("event_type").agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("n0"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("n1"),
        F.sum(
            F.when((F.col("user_id") % 2 == 0) & (F.col("value") > 150), 1).otherwise(0)
        ).alias("c0"),
        F.sum(
            F.when((F.col("user_id") % 2 == 1) & (F.col("value") > 150), 1).otherwise(0)
        ).alias("c1"),
    )
    ph = (F.col("c0") + F.col("c1")) * 1.0 / (F.col("n0") + F.col("n1"))
    zc = (F.col("c1") * 1.0 / F.col("n1") - F.col("c0") * 1.0 / F.col("n0")) / F.sqrt(
        ph * (F.lit(1.0) - ph) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    p = g.select(
        "event_type", "n0", "n1", zc.alias("zs")
    ).select(
        "*", _p2_col(F.abs(F.col("zs")) * F.lit(_INV_SQRT2)).alias("pv")
    )
    w = Window.orderBy(F.col("pv").asc(), F.col("event_type").asc())
    r = p.select(
        "*",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("m"),
    ).localCheckpoint(eager=True)
    k = r.agg(
        F.coalesce(
            F.max(F.when(F.col("pv") <= F.col("rk") * 0.05 / F.col("m"), F.col("rk"))),
            F.lit(0),
        ).alias("kmax")
    )
    return r.crossJoin(F.broadcast(k)).select(
        "event_type",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        (F.round("zs", 6) + F.lit(0.0)).alias("z"),
        (F.round("pv", 6) + F.lit(0.0)).alias("p_value"),
        F.col("rk").cast("int").alias("bh_rank"),
        F.round(F.col("rk") * 0.05 / F.col("m"), 6).alias("bh_threshold"),
        F.when(F.col("rk") <= F.col("kmax"), 1).otherwise(0).cast("int").alias("reject"),
    )


@query(
    "q343_wasserstein_drift",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS arm, value
      FROM events WHERE value IS NOT NULL
    ),
    sup AS (
      SELECT event_type, value AS v,
             CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS c0,
             CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS c1
      FROM s GROUP BY event_type, value
    ),
    cum AS (
      SELECT event_type, v,
             sum(c0) OVER (PARTITION BY event_type ORDER BY v) AS f0,
             sum(c1) OVER (PARTITION BY event_type ORDER BY v) AS f1,
             sum(c0) OVER (PARTITION BY event_type) AS n0,
             sum(c1) OVER (PARTITION BY event_type) AS n1,
             lead(v) OVER (PARTITION BY event_type ORDER BY v) AS nv
      FROM sup
    )
    SELECT event_type,
           CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(round(sum(CAST(round(abs(f0 * 1.0 / n0 - f1 * 1.0 / n1) * (nv - v), 12) AS DECIMAL(38,12))), 6) AS DOUBLE) + 0.0 AS w1
    FROM cum WHERE nv IS NOT NULL
    GROUP BY event_type, n0, n1
    """,
)
def q343_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth mover's) distance between the two arms'
    value distributions per event type: W1 = integral of |F0 - F1| dv,
    exact on the merged distinct-value support as sum over support gaps
    of |cdf gap| * (next_v - v) — the drift distance with UNITS (how far
    mass moved, in value units) completing the drift ladder's
    supremum-norm (KS q310), quadratic-norm (CvM q319), and
    likelihood-ratio (PSI q318 / JSD q312) tiers. Terms fold as 12-dp
    DECIMAL(38,12), so engines agree digit-for-digit.

    100 TB story: q310's exact shape — the fact table collapses to the
    (type, value) support with a map-side partial aggregate BEFORE any
    window; cumulative frames and the lead() gap run per-type on the
    support only."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    sup = e.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("c0"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("c1"),
    )
    wo = Window.partitionBy("event_type").orderBy("v")
    wp = Window.partitionBy("event_type")
    cum = sup.select(
        "event_type",
        "v",
        F.sum("c0").over(wo).alias("f0"),
        F.sum("c1").over(wo).alias("f1"),
        F.sum("c0").over(wp).alias("n0"),
        F.sum("c1").over(wp).alias("n1"),
        F.lead("v").over(wo).alias("nv"),
    )
    term = F.abs(F.col("f0") * 1.0 / F.col("n0") - F.col("f1") * 1.0 / F.col("n1")) * (
        F.col("nv") - F.col("v")
    )
    return (
        cum.filter(F.col("nv").isNotNull())
        .groupBy("event_type", "n0", "n1")
        .agg(
            (
                F.round(
                    F.sum(F.round(term, 12).cast("decimal(38,12)")), 6
                ).cast("double")
                + F.lit(0.0)
            ).alias("w1")
        )
        .select(
            "event_type",
            F.col("n0").cast("long").alias("n0"),
            F.col("n1").cast("long").alias("n1"),
            "w1",
        )
    )


@query(
    "q344_kendall_tau",
    oracle="""
    WITH d AS (
      SELECT (epoch_ns(ts) // 1000000000) // 86400 AS day,
             CAST(count(*) AS BIGINT) AS x,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))) * 100, 0) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    p AS (
      SELECT CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END AS con,
             CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END AS dis,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM d a JOIN d b ON a.day < b.day
    ),
    s AS (
      SELECT CAST(sum(con) AS BIGINT) AS c, CAST(sum(dis) AS BIGINT) AS dd,
             CAST(sum(tx) AS BIGINT) AS n1, CAST(sum(ty) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS n0
      FROM p
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
           c AS concordant, dd AS discordant, n1 AS ties_x, n2 AS ties_y,
           round((c - dd) / sqrt((n0 - n1) * 1.0 * (n0 - n2)), 6) + 0.0 AS tau_b
    FROM s
    """,
)
def q344_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation (Kendall 1938, tie-corrected)
    between daily event VOLUME and daily total VALUE (exact cents) — do
    busier days move more money, measured without assuming linearity?
    The bivariate cousin of q311's Mann-Kendall (which is tau of a series
    against TIME; disclosed kinship): concordant/discordant/tie counts
    are exact integers over day pairs, so tau matches digit-for-digit.

    100 TB story: the corpus collapses to the O(days) daily rollup in
    ONE map-side-combining aggregate; the pair join is O(days^2) on a
    calendar-bounded frame (~30 rows here, 365 at a year) — never
    corpus-sized."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = e.groupBy(F.expr("(ts div 1000000000) div 86400").alias("day")).agg(
        F.count(F.lit(1)).alias("x"),
        F.round(F.sum(_dec("value")) * 100, 0).cast("long").alias("y"),
    ).localCheckpoint(eager=True)
    a, b = d.alias("a"), d.alias("b")
    pr = a.join(b, F.col("a.day") < F.col("b.day")).select(
        ((F.col("b.x") - F.col("a.x")) * (F.col("b.y") - F.col("a.y"))).alias("s"),
        (F.col("a.x") == F.col("b.x")).cast("int").alias("tx"),
        (F.col("a.y") == F.col("b.y")).cast("int").alias("ty"),
    )
    s = pr.agg(
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).alias("dd"),
        F.sum("tx").alias("n1"),
        F.sum("ty").alias("n2"),
        F.count(F.lit(1)).alias("n0"),
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    tau = (F.col("c") - F.col("dd")) / F.sqrt(
        (F.col("n0") - F.col("n1")) * 1.0 * (F.col("n0") - F.col("n2"))
    )
    return nd.crossJoin(F.broadcast(s)).select(
        "n_days",
        F.col("c").cast("long").alias("concordant"),
        F.col("dd").cast("long").alias("discordant"),
        F.col("n1").cast("long").alias("ties_x"),
        F.col("n2").cast("long").alias("ties_y"),
        (F.round(tau, 6) + F.lit(0.0)).alias("tau_b"),
    )


@query(
    "q345_cmh_test",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
             CASE WHEN value > 150 THEN 1 ELSE 0 END AS conv
      FROM events WHERE value IS NOT NULL
    ),
    t AS (
      SELECT event_type,
             CAST(sum(conv) FILTER (WHERE arm = 1) AS BIGINT) AS a,
             CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) - CAST(sum(conv) FILTER (WHERE arm = 1) AS BIGINT) AS b,
             CAST(sum(conv) FILTER (WHERE arm = 0) AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) - CAST(sum(conv) FILTER (WHERE arm = 0) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY event_type
    ),
    f AS (
      SELECT CAST(sum(a) AS BIGINT) AS sa,
             CAST(round(sum(CAST(round((a + b) * 1.0 * (a + c) / n, 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS se,
             CAST(round(sum(CAST(round((a + b) * 1.0 * (c + d) * (a + c) * (b + d) / (n * 1.0 * n * (n - 1)), 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS sv,
             CAST(round(sum(CAST(round(a * 1.0 * d / n, 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS sad,
             CAST(round(sum(CAST(round(b * 1.0 * c / n, 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS sbc,
             CAST(count(*) AS INT) AS k
      FROM t
    )
    SELECT k AS k_strata,
           round((sa - se) * (sa - se) / sv, 6) + 0.0 AS cmh_stat,
           round({_p2_sql(f"sqrt((sa - se) * (sa - se) / sv) * {_INV_SQRT2}")}, 6) + 0.0 AS p_value,
           round(sad / sbc, 6) AS mh_odds_ratio
    FROM f
    """,
)
def q345_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2x2 test (Mantel & Haenszel
    1959, no continuity correction — disclosed) of arm-vs-conversion
    ACROSS event-type strata, plus the Mantel-Haenszel pooled odds
    ratio: the stratum-adjusted answer to the confounding q340's
    Simpson's-paradox audit detects (q334 reports per-stratum odds
    ratios; this pools them the right way instead of collapsing the
    table). Per-stratum E/V terms are 12-dp DECIMAL folds over the
    O(types) frame; the chi-square(1) p-value reuses the A&S erfc
    polynomial, identical literals both engines.

    100 TB story: one map-side-combining aggregate collapses the corpus
    to K = #strata rows; everything downstream is a K-row fold."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    conv = F.when(F.col("value") > 150, 1).otherwise(0)
    arm1 = F.col("user_id") % 2 == 1
    t = e.groupBy("event_type").agg(
        F.sum(F.when(arm1, conv).otherwise(0)).alias("a"),
        (F.count(F.when(arm1, 1)) - F.sum(F.when(arm1, conv).otherwise(0))).alias("b"),
        F.sum(F.when(~arm1, conv).otherwise(0)).alias("c"),
        (F.count(F.when(~arm1, 1)) - F.sum(F.when(~arm1, conv).otherwise(0))).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    e_i = (F.col("a") + F.col("b")) * 1.0 * (F.col("a") + F.col("c")) / F.col("n")
    v_i = (
        (F.col("a") + F.col("b"))
        * 1.0
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
        / (F.col("n") * 1.0 * F.col("n") * (F.col("n") - 1))
    )
    def _fold(x):
        return F.round(F.sum(F.round(x, 12).cast("decimal(38,12)")), 12).cast("double")
    f = t.agg(
        F.sum("a").alias("sa"),
        _fold(e_i).alias("se"),
        _fold(v_i).alias("sv"),
        _fold(F.col("a") * 1.0 * F.col("d") / F.col("n")).alias("sad"),
        _fold(F.col("b") * 1.0 * F.col("c") / F.col("n")).alias("sbc"),
        F.count(F.lit(1)).cast("int").alias("k"),
    )
    stat = (F.col("sa") - F.col("se")) * (F.col("sa") - F.col("se")) / F.col("sv")
    return f.select(
        F.col("k").alias("k_strata"),
        (F.round(stat, 6) + F.lit(0.0)).alias("cmh_stat"),
        (F.round(_p2_col(F.sqrt(stat) * F.lit(_INV_SQRT2)), 6) + F.lit(0.0)).alias(
            "p_value"
        ),
        F.round(F.col("sad") / F.col("sbc"), 6).alias("mh_odds_ratio"),
    )


@query(
    "q346_cohens_kappa",
    oracle="""
    WITH g AS (
      SELECT source,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS ga,
             CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 40 THEN 1 ELSE 0 END AS gb
      FROM documents WHERE trim(text) <> ''
    ),
    s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ga = 1 AND gb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(sum(CASE WHEN ga = 0 AND gb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             CAST(sum(ga) AS BIGINT) AS na, CAST(sum(gb) AS BIGINT) AS nb
      FROM g GROUP BY source
    )
    SELECT source, n,
           round((n11 + n00) * 1.0 / n, 6) AS p_observed,
           round((na * 1.0 / n) * (nb * 1.0 / n) + (1.0 - na * 1.0 / n) * (1.0 - nb * 1.0 / n), 6) AS p_expected,
           CASE WHEN 1.0 - ((na * 1.0 / n) * (nb * 1.0 / n) + (1.0 - na * 1.0 / n) * (1.0 - nb * 1.0 / n)) = 0.0
                THEN 0.0
                ELSE round(((n11 + n00) * 1.0 / n - ((na * 1.0 / n) * (nb * 1.0 / n) + (1.0 - na * 1.0 / n) * (1.0 - nb * 1.0 / n)))
                           / (1.0 - ((na * 1.0 / n) * (nb * 1.0 / n) + (1.0 - na * 1.0 / n) * (1.0 - nb * 1.0 / n))), 6) + 0.0
           END AS kappa
    FROM s
    """,
)
def q346_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa chance-corrected agreement (Cohen 1960) between two
    binary quality gates — a char-length gate (n_chars >= 200) and a
    token-count gate (>= 40 whitespace tokens) — per source: the
    "do independent filters actually agree beyond what base rates force"
    check a curation pipeline runs before OR-ing gates into a keep
    decision (the chance-corrected tier above q216's rank agreement;
    disclosed kinship). Degenerate pe = 1 strata emit kappa 0 by the
    same CASE in both engines.

    100 TB story: both gates are pure column expressions inside ONE
    map-side-combining per-source aggregate; kappa arithmetic runs on
    the O(sources) frame."""
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    ga = F.when(F.col("n_chars") >= 200, 1).otherwise(0)
    gb = F.when(F.size(text.tokens(F.col("text"))) >= 40, 1).otherwise(0)
    s = d.select("source", ga.alias("ga"), gb.alias("gb")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("ga") == 1) & (F.col("gb") == 1), 1).otherwise(0)).alias("n11"),
        F.sum(F.when((F.col("ga") == 0) & (F.col("gb") == 0), 1).otherwise(0)).alias("n00"),
        F.sum("ga").alias("na"),
        F.sum("gb").alias("nb"),
    )
    pa = F.col("na") * 1.0 / F.col("n")
    pb = F.col("nb") * 1.0 / F.col("n")
    po = (F.col("n11") + F.col("n00")) * 1.0 / F.col("n")
    pe = pa * pb + (F.lit(1.0) - pa) * (F.lit(1.0) - pb)
    return s.select(
        "source",
        F.col("n").cast("long").alias("n"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.when(F.lit(1.0) - pe == 0.0, F.lit(0.0))
        .otherwise(F.round((po - pe) / (F.lit(1.0) - pe), 6) + F.lit(0.0))
        .alias("kappa"),
    )


@query(
    "q347_brier_decomposition",
    oracle="""
    WITH s AS (
      SELECT CAST(least(greatest(CAST(floor(value * 100) AS BIGINT), 0), 19999) AS BIGINT) AS pq,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS o
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT pq // 2000 AS bin, CAST(count(*) AS BIGINT) AS nk,
             CAST(sum(pq) AS BIGINT) AS s1, CAST(sum(pq * pq) AS BIGINT) AS s2,
             CAST(sum(pq * o) AS BIGINT) AS spo, CAST(sum(o) AS BIGINT) AS so
      FROM s GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(so) AS BIGINT) AS sot,
             CAST(sum(s2) AS BIGINT) AS s2t, CAST(sum(spo) AS BIGINT) AS spot
      FROM b
    ),
    terms AS (
      SELECT
        CAST(round(sum(CAST(round(nk * (s1 / (20000.0 * nk) - so * 1.0 / nk) * (s1 / (20000.0 * nk) - so * 1.0 / nk), 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS rel_n,
        CAST(round(sum(CAST(round(nk * (so * 1.0 / nk - (SELECT sot * 1.0 / n FROM tot)) * (so * 1.0 / nk - (SELECT sot * 1.0 / n FROM tot)), 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS res_n
      FROM b
    )
    SELECT n,
           round((s2t / (20000.0 * 20000.0) - 2.0 * spot / 20000.0 + sot) / n, 6) AS brier,
           round(rel_n / n, 6) AS reliability,
           round(res_n / n, 6) AS resolution,
           round((sot * 1.0 / n) * (1.0 - sot * 1.0 / n), 6) AS uncertainty,
           round((s2t / (20000.0 * 20000.0) - 2.0 * spot / 20000.0 + sot) / n
                 - (rel_n / n - res_n / n + (sot * 1.0 / n) * (1.0 - sot * 1.0 / n)), 6) + 0.0 AS within_bin_term
    FROM tot CROSS JOIN terms
    """,
)
def q347_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (Murphy 1973): treating
    value/200 (clamped to [0,1), CENTS-quantized so every moment is an
    exact integer sum) as a purchase-probability forecast, split mean
    squared error into reliability (calibration), resolution
    (discrimination), and uncertainty (base-rate entropy) over 10
    forecast bins — the diagnostic tier above q280's calibration table
    and q302's isotonic recalibration (disclosed kinship): REL says how
    far bin means sit from bin outcomes, RES how much the bins separate
    the base rate, and the residual column is the within-bin forecast
    variance the 10-bin coarsening leaves behind (reported, not hidden,
    so the identity is auditable). Brier itself comes from the exact
    integer moments (sum pq, sum pq^2, sum pq*o), never a float mean
    over corpus-ordered terms.

    100 TB story: ONE map-side-combining aggregate to 10 bin rows
    carrying integer moments; every statistic is a 10-row 12-dp DECIMAL
    fold; no second corpus pass, no window."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        F.least(
            F.greatest(F.floor(F.col("value") * 100).cast("long"), F.lit(0)),
            F.lit(19999),
        ).alias("pq"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("o"),
    )
    b = s.groupBy(F.expr("pq div 2000").alias("bin")).agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum("pq").alias("s1"),
        F.sum(F.col("pq") * F.col("pq")).alias("s2"),
        F.sum(F.col("pq") * F.col("o")).alias("spo"),
        F.sum("o").alias("so"),
    ).localCheckpoint(eager=True)
    tot = b.agg(
        F.sum("nk").alias("n"),
        F.sum("so").alias("sot"),
        F.sum("s2").alias("s2t"),
        F.sum("spo").alias("spot"),
    )
    obar = F.col("sot") * 1.0 / F.col("n")
    pbark = F.col("s1") / (F.lit(20000.0) * F.col("nk"))
    obark = F.col("so") * 1.0 / F.col("nk")
    def _fold12(x):
        return F.round(F.sum(F.round(x, 12).cast("decimal(38,12)")), 12).cast("double")
    terms = b.crossJoin(F.broadcast(tot)).agg(
        _fold12(F.col("nk") * (pbark - obark) * (pbark - obark)).alias("rel_n"),
        _fold12(F.col("nk") * (obark - obar) * (obark - obar)).alias("res_n"),
    )
    brier = (
        F.col("s2t") / (F.lit(20000.0) * F.lit(20000.0))
        - F.lit(2.0) * F.col("spot") / F.lit(20000.0)
        + F.col("sot")
    ) / F.col("n")
    unc = obar * (F.lit(1.0) - obar)
    return tot.crossJoin(F.broadcast(terms)).select(
        F.col("n").cast("long").alias("n"),
        F.round(brier, 6).alias("brier"),
        F.round(F.col("rel_n") / F.col("n"), 6).alias("reliability"),
        F.round(F.col("res_n") / F.col("n"), 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        (
            F.round(
                brier
                - (F.col("rel_n") / F.col("n") - F.col("res_n") / F.col("n") + unc),
                6,
            )
            + F.lit(0.0)
        ).alias("within_bin_term"),
    )


# chi-square 95% critical values for df = 1..7 (literal handbook
# constants, identical in both engines)
_CHI2_95 = (3.841459, 5.991465, 7.814728, 9.487729, 11.070498, 12.591587, 14.067140)


@query(
    "q351_ljung_box",
    oracle=f"""
    WITH d AS (
      SELECT (epoch_ns(ts) // 1000000000) // 86400 AS day,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))) * 100, 0) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    arr AS (
      SELECT list(cents / 100.0 / n ORDER BY day) AS x, count(*) AS n FROM d
    ),
    m AS (
      SELECT x, n, list_sum(x) / n AS xb,
             list_sum(list_transform(x, v -> (v - list_sum(x) / n) * (v - list_sum(x) / n))) AS den
      FROM arr
    ),
    lags AS (SELECT unnest(generate_series(1, 7)) AS k),
    rho AS (
      SELECT k, n,
             list_sum(list_transform(generate_series(k + 1, CAST(n AS INT)),
                                     t -> (x[t] - xb) * (x[t - k] - xb))) / den AS r
      FROM m CROSS JOIN lags
    ),
    q AS (
      SELECT k, n, r,
             sum(n * (n + 2.0) * r * r / (n - k)) OVER (ORDER BY k) AS qs
      FROM rho
    )
    SELECT CAST(k AS INT) AS lag,
           round(r, 6) + 0.0 AS rho,
           round(qs, 6) AS q_stat,
           CAST(([{", ".join(str(c) for c in _CHI2_95)}])[k] AS DOUBLE) AS crit_95,
           CAST(CASE WHEN qs > ([{", ".join(str(c) for c in _CHI2_95)}])[k] THEN 1 ELSE 0 END AS INT) AS reject
    FROM q
    """,
)
def q351_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (Ljung & Box 1978) for autocorrelation
    in the daily-mean value series: ACF at lags 1..7 over the day-ordered
    series, the cumulative Q_m = n(n+2) * sum rho_k^2/(n-k), and the
    reject decision against the literal chi-square(m) 95% critical values
    — the "is there ANY serial structure left" gate run on residuals
    after a forecast fit (the test tier above q112/q237's raw ACF
    emission; disclosed kinship). Every fold runs over the SAME
    day-ordered array in both engines (index-ordered left folds), so Q
    matches digit-for-digit.

    100 TB story: the corpus collapses to the O(days) rollup in one
    map-side aggregate; the series becomes a single-row array and all 7
    lags are bounded array folds — corpus-size-independent after the
    first scan."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = e.groupBy(F.expr("(ts div 1000000000) div 86400").alias("day")).agg(
        F.round(F.sum(_dec("value")) * 100, 0).cast("long").alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    arr = d.agg(
        F.array_sort(
            F.collect_list(F.struct("day", (F.col("cents") / 100.0 / F.col("n")).alias("v")))
        ).getField("v").alias("x"),
        F.count(F.lit(1)).alias("n"),
    )
    xsum = F.aggregate(F.col("x"), F.lit(0.0), lambda a, v: a + v)
    m = arr.select(
        "x",
        "n",
        (xsum / F.col("n")).alias("xb"),
    ).select(
        "*",
        F.aggregate(
            F.col("x"), F.lit(0.0), lambda a, v: a + (v - F.col("xb")) * (v - F.col("xb"))
        ).alias("den"),
    ).localCheckpoint(eager=True)
    # all 7 lags AND the cumulative Q computed as array folds on the
    # single stats row — no window anywhere, not even over 7 rows
    def _num(k):
        return F.aggregate(
            F.sequence(k + 1, F.col("n").cast("int")),
            F.lit(0.0),
            lambda a, t: a
            + (F.element_at(F.col("x"), t) - F.col("xb"))
            * (F.element_at(F.col("x"), t - k) - F.col("xb")),
        )

    rhos = m.select(
        "n",
        F.array(*[(_num(F.lit(k)) / F.col("den")).alias(f"r{k}") for k in range(1, 8)]).alias(
            "rhos"
        ),
    )
    qs = F.transform(
        F.sequence(F.lit(1), F.lit(7)),
        lambda k: F.aggregate(
            F.sequence(F.lit(1), k),
            F.lit(0.0),
            lambda a, j: a
            + F.col("n")
            * (F.col("n") + 2.0)
            * F.element_at(F.col("rhos"), j)
            * F.element_at(F.col("rhos"), j)
            / (F.col("n") - j),
        ),
    )
    row = rhos.select("rhos", qs.alias("qs"))
    crit_arr = F.array(*[F.lit(c) for c in _CHI2_95])
    out = row.select(
        F.posexplode(F.sequence(F.lit(1), F.lit(7))).alias("i", "k"),
        "rhos",
        "qs",
    )
    crit = F.element_at(crit_arr, F.col("k"))
    qsk = F.element_at(F.col("qs"), F.col("k"))
    return out.select(
        F.col("k").cast("int").alias("lag"),
        (F.round(F.element_at(F.col("rhos"), F.col("k")), 6) + F.lit(0.0)).alias("rho"),
        F.round(qsk, 6).alias("q_stat"),
        crit.alias("crit_95"),
        F.when(qsk > crit, 1).otherwise(0).cast("int").alias("reject"),
    )


@query(
    "q349_association_rules",
    oracle="""
    WITH b AS (
      SELECT DISTINCT user_id, (epoch_ns(ts) // 1000000000) // 86400 AS day, event_type
      FROM events
    ),
    nb AS (SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n FROM b),
    sup1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
    sup2 AS (
      SELECT a.event_type AS ante, c.event_type AS cons, CAST(count(*) AS BIGINT) AS cc
      FROM b a JOIN b c ON a.user_id = c.user_id AND a.day = c.day
                       AND a.event_type <> c.event_type
      GROUP BY 1, 2
    )
    SELECT s.ante, s.cons,
           s.cc AS n_baskets_both,
           round(s.cc * 1.0 / nb.n, 6) AS support,
           round(s.cc * 1.0 / sa.c, 6) AS confidence,
           round((s.cc * 1.0 / sa.c) / (sc.c * 1.0 / nb.n), 6) AS lift
    FROM sup2 s
    JOIN sup1 sa ON sa.event_type = s.ante
    JOIN sup1 sc ON sc.event_type = s.cons
    CROSS JOIN nb
    """,
)
def q349_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over user-day baskets (Agrawal et al.
    1993, the 2-itemset tier of Apriori): for every ordered event-type
    pair A -> B, the basket support, confidence P(B|A), and lift
    P(B|A)/P(B) — the unordered-co-occurrence complement of q71's
    ordered funnel (disclosed kinship; q337's "lift" is a model-gain
    curve, a different statistic). All three measures are exact ratios
    of integer basket counts.

    100 TB story: ONE distinct-collapse shuffle builds the (user, day,
    type) basket items; the pair census self-joins baskets on the
    (user, day) key — each basket contributes at most K(K-1) pairs (K =
    #types, bounded), so pair work is linear in baskets; supports and
    the K^2 rule frame are broadcast-sized aggregates."""
    e = _t(spark, sf_dir, "events")
    b = e.select(
        "user_id", F.expr("(ts div 1000000000) div 86400").alias("day"), "event_type"
    ).distinct().localCheckpoint(eager=True)
    nb = b.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    sup1 = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a, c = b.alias("a"), b.alias("c")
    sup2 = (
        a.join(
            c,
            (F.col("a.user_id") == F.col("c.user_id"))
            & (F.col("a.day") == F.col("c.day"))
            & (F.col("a.event_type") != F.col("c.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"), F.col("c.event_type").alias("cons")
        )
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    sa = sup1.select(F.col("event_type").alias("ante"), F.col("c").alias("ca"))
    sc = sup1.select(F.col("event_type").alias("cons"), F.col("c").alias("cb"))
    return (
        sup2.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .crossJoin(F.broadcast(nb))
        .select(
            "ante",
            "cons",
            F.col("cc").cast("long").alias("n_baskets_both"),
            F.round(F.col("cc") * 1.0 / F.col("n"), 6).alias("support"),
            F.round(F.col("cc") * 1.0 / F.col("ca"), 6).alias("confidence"),
            F.round(
                (F.col("cc") * 1.0 / F.col("ca")) / (F.col("cb") * 1.0 / F.col("n")), 6
            ).alias("lift"),
        )
    )


def _q348_textrank_oracle(rounds: int = 6, topk: int = 15) -> str:
    """Generated oracle for q348: the co-occurrence graph and weighted
    degree MATERIALIZED once (multiply-referenced — the k-core CTE
    lesson), then one CTE per TextRank round replaying the engine's
    12-dp DECIMAL fold and per-round quantization digit-for-digit."""
    ctes = [
        """toks AS MATERIALIZED (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term,
             generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
      FROM documents WHERE trim(text) <> ''
    )""",
        """co AS MATERIALIZED (
      SELECT a.term AS s1, b.term AS s2, CAST(count(*) AS BIGINT) AS w
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos - a.pos IN (1, 2) AND a.term <> b.term
      GROUP BY 1, 2
    )""",
        """edges AS MATERIALIZED (
      SELECT s1 AS src, s2 AS dst, CAST(sum(w) AS BIGINT) AS w FROM (
        SELECT s1, s2, w FROM co UNION ALL SELECT s2, s1, w FROM co
      ) GROUP BY 1, 2
    )""",
        "wdeg AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wd FROM edges GROUP BY 1)",
        "r0 AS MATERIALIZED (SELECT src AS node, 1.0 AS r FROM wdeg)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""r{k} AS MATERIALIZED (
      SELECT e.dst AS node,
             round(0.15 + 0.85 * CAST(sum(CAST(round(e.w * p.r / d.wd, 12) AS DECIMAL(38,12))) AS DOUBLE), 12) AS r
      FROM edges e JOIN r{k - 1} p ON e.src = p.node JOIN wdeg d ON d.src = e.src
      GROUP BY 1
    )"""
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {chain}
    SELECT node AS term, round(r, 6) AS textrank
    FROM r{rounds} ORDER BY r DESC, node ASC LIMIT {topk}
    """


@query("q348_textrank", oracle=_q348_textrank_oracle())
def q348_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    (damping 0.85, uniform 1.0 start) over the corpus-wide word
    co-occurrence graph (tokens within a 2-token forward window,
    symmetrized, edge weight = co-occurrence count, contributions
    normalized by WEIGHTED degree), 6 rounds, top-15 keywords — the
    graph-centrality tier of the keyphrase ladder above q325's RAKE
    (degree/frequency scoring; disclosed kinship). Per-round per-edge
    contributions are 12-dp-rounded DECIMAL(38,12) folds and each round's
    score re-quantizes to 12 dp (the q293 graph-ladder policy), so both
    engines iterate bit-identically.

    100 TB story: the co-occurrence census is one position self-join on
    (doc, pos) + a vocabulary-bounded groupBy; every round is ONE edge
    equi-join + grouped fold on the vocabulary-sized node set,
    localCheckpointed (lineage truncation, the q232 recipe); top-15 is a
    TakeOrdered."""
    rounds, topk = 6, 15
    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    a, b = toks.alias("a"), toks.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") - F.col("a.pos")).isin(1, 2)
            & (F.col("a.term") != F.col("b.term")),
        )
        .groupBy(F.col("a.term").alias("s1"), F.col("b.term").alias("s2"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = (
        co.select("s1", "s2", "w")
        .unionAll(co.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"), "w"))
        .groupBy(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wd")).localCheckpoint(eager=True)
    ranks = wdeg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    for _ in range(rounds):
        ranks = (
            edges.join(ranks, edges.src == ranks.node)
            .join(wdeg, "src")
            .groupBy(F.col("dst").alias("node2"))
            .agg(
                F.round(
                    F.lit(0.15)
                    + F.lit(0.85)
                    * F.sum(
                        F.round(
                            F.col("w") * F.col("r") / F.col("wd"), 12
                        ).cast("decimal(38,12)")
                    ).cast("double"),
                    12,
                ).alias("r2")
            )
            .select(F.col("node2").alias("node"), F.col("r2").alias("r"))
            .localCheckpoint(eager=True)
        )
    return (
        ranks.orderBy(F.col("r").desc(), F.asc("node"))
        .limit(topk)
        .select(F.col("node").alias("term"), F.round("r", 6).alias("textrank"))
    )


def _q350_hits_oracle(rounds: int = 4, top_hubs: int = 10) -> str:
    """Generated oracle for q350: per round, the raw hub/authority folds
    AND their maxima are MATERIALIZED (each raw frame is referenced
    twice: by its max and by its normalized successor — the k-core CTE
    lesson); folds and per-round quantization mirror the engine."""
    ctes = [
        """e AS MATERIALIZED (
      SELECT user_id AS u, event_type AS t, CAST(count(*) AS BIGINT) AS w
      FROM events GROUP BY 1, 2
    )""",
        "a0 AS MATERIALIZED (SELECT DISTINCT t, 1.0 AS a FROM e)",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        ctes.append(
            f"""hr{k} AS MATERIALIZED (
      SELECT e.u, CAST(sum(CAST(round(e.w * a{p}.a, 12) AS DECIMAL(38,12))) AS DOUBLE) AS h
      FROM e JOIN a{p} USING (t) GROUP BY 1
    )"""
        )
        ctes.append(f"hm{k} AS MATERIALIZED (SELECT max(h) AS m FROM hr{k})")
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT u, round(h / (SELECT m FROM hm{k}), 12) AS h FROM hr{k})"
        )
        ctes.append(
            f"""ar{k} AS MATERIALIZED (
      SELECT e.t, CAST(sum(CAST(round(e.w * h{k}.h, 12) AS DECIMAL(38,12))) AS DOUBLE) AS a
      FROM e JOIN h{k} USING (u) GROUP BY 1
    )"""
        )
        ctes.append(f"am{k} AS MATERIALIZED (SELECT max(a) AS m FROM ar{k})")
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT t, round(a / (SELECT m FROM am{k}), 12) AS a FROM ar{k})"
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {chain}
    SELECT 'authority' AS role, t AS id, round(a, 6) AS score FROM a{rounds}
    UNION ALL
    SELECT 'hub', CAST(u AS VARCHAR), round(h, 6)
    FROM (SELECT u, h FROM h{rounds} ORDER BY h DESC, u ASC LIMIT {top_hubs})
    """


@query("q350_hits", oracle=_q350_hits_oracle())
def q350_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) on the user <-> event-
    type bipartite interaction graph (edge weight = interaction count):
    4 rounds of the mutual-reinforcement iteration with max-normalization
    each half-step — authority says which event types the heavy users
    concentrate on, hub says which users span the authoritative types
    (the bipartite complement of the unipartite centrality ladder:
    PageRank q232/q118, eigencentrality q293). Folds are 12-dp
    DECIMAL(38,12) of 12-dp-rounded terms with per-half-round
    re-quantization, so both engines iterate bit-identically.

    100 TB story: the edge frame is ONE map-side-combining (user, type)
    aggregate; each half-round is one edge equi-join + grouped fold +
    1-row max broadcast, localCheckpointed per round; hubs emit top-10
    by TakeOrdered, authorities are K = #types rows."""
    rounds, top_hubs = 4, 10
    ev = _t(spark, sf_dir, "events")
    e = ev.groupBy(F.col("user_id").alias("u"), F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("w")
    ).localCheckpoint(eager=True)
    a_s = e.select("t").distinct().select("t", F.lit(1.0).alias("a"))

    def _fold(x):
        return F.sum(F.round(x, 12).cast("decimal(38,12)")).cast("double")

    h_s = None
    for _ in range(rounds):
        hr = (
            e.join(a_s, "t")
            .groupBy("u")
            .agg(_fold(F.col("w") * F.col("a")).alias("h"))
            .localCheckpoint(eager=True)
        )
        hm = hr.agg(F.max("h").alias("m"))
        h_s = hr.crossJoin(F.broadcast(hm)).select(
            "u", F.round(F.col("h") / F.col("m"), 12).alias("h")
        ).localCheckpoint(eager=True)
        ar = (
            e.join(h_s, "u")
            .groupBy("t")
            .agg(_fold(F.col("w") * F.col("h")).alias("a"))
            .localCheckpoint(eager=True)
        )
        am = ar.agg(F.max("a").alias("m"))
        a_s = ar.crossJoin(F.broadcast(am)).select(
            "t", F.round(F.col("a") / F.col("m"), 12).alias("a")
        ).localCheckpoint(eager=True)
    auth = a_s.select(
        F.lit("authority").alias("role"),
        F.col("t").alias("id"),
        F.round("a", 6).alias("score"),
    )
    hubs = (
        h_s.orderBy(F.col("h").desc(), F.asc("u"))
        .limit(top_hubs)
        .select(
            F.lit("hub").alias("role"),
            F.col("u").cast("string").alias("id"),
            F.round("h", 6).alias("score"),
        )
    )
    return auth.unionAll(hubs)
