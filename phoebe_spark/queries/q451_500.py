"""Query registry block 451+ (round 11): time-series diagnostics
(cross-correlation, turning-point randomness, forecastability strength,
Breusch-Pagan heteroscedasticity, Page trend), information dynamics
(Markov entropy rate), Bayesian A/B (two-proportion posterior),
variance homogeneity (Bartlett), inequality (Palma/Hoover), extremes
(Gumbel block maxima), paired nonparametrics (sign + Wilcoxon
signed-rank), and regression influence (Cook's distance) — each with
the exact-fold determinism policy from ``_core`` (integer/DECIMAL
corpus sums, 12-dp per-iteration rounding, identical literal chains on
both engines)."""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._core import _t, query
from .q401_450 import _phi_col, _phi_sql


def _fold12(x):
    """Order-free 12-dp DECIMAL fold (the registry determinism policy)."""
    return F.round(F.sum(F.round(x, 12).cast("decimal(38,12)")), 12).cast("double")


_FOLD12_SQL = (
    "CAST(round(sum(CAST(round({x}, 12) AS DECIMAL(38,12))), 12) AS DOUBLE)"
)

_CCF_LAGS = list(range(-7, 8))
_CCF_LAGS_SQL = ", ".join(f"({l})" for l in _CCF_LAGS)


@query(
    "q451_cross_correlation",
    oracle=f"""
    WITH lags(lag) AS (VALUES {_CCF_LAGS_SQL}),
    od AS (
      SELECT datediff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    ld AS (
      SELECT datediff('day', DATE '1970-01-01', l_shipdate) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT lg.lag, od.x, ld.y
      FROM lags lg
      JOIN od ON TRUE
      JOIN ld ON ld.d = od.d + lg.lag
    ),
    m AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM j GROUP BY 1
    ),
    r AS (
      SELECT lag, n,
             CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,0))
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DOUBLE)
               / sqrt(CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
                           - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DOUBLE)
                      * CAST(CAST(n AS DECIMAL(19,0)) * CAST(syy AS DECIMAL(19,0))
                             - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DOUBLE))
               AS ccf
      FROM m
    )
    SELECT lag, n AS n_days,
           round(ccf, 6) + 0.0 AS ccf,
           CASE WHEN abs(ccf) = max(abs(ccf)) OVER () THEN 1 ELSE 0 END AS is_best
    FROM r
    """,
)
def q451_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily ORDER-ARRIVAL count
    and the daily LINE-SHIPMENT count at lags -7..+7 days: the
    lead-lag screen that measures how many days demand takes to turn
    into shipments (positive best lag = shipments trail orders), run
    before any join of the two series into one forecasting feature
    (m1/q443 kinship disclosed). Each lag's Pearson r comes from exact
    BIGINT moment folds over the aligned day pairs (the overlap set
    shifts with the lag, so n varies per lag — disclosed); all
    n*S - S*S combinations run in DECIMAL(38,0) and convert to DOUBLE
    once, identical chains both engines.

    100 TB story: two corpus scans collapse to O(days) rollups; the
    lag fan-out is a BROADCAST 15-row literal frame; each lag's moment
    fold is one grouped aggregate over the day-pair frame — no window
    on corpus-rate data; the best-lag flag runs on the 15-row lag frame
    (allowlisted)."""
    od = (
        _t(spark, sf_dir, "orders")
        .select(F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    ld = (
        _t(spark, sf_dir, "lineitem")
        .select(F.datediff("l_shipdate", F.lit("1970-01-01")).cast("long").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    lags = spark.createDataFrame([(l,) for l in _CCF_LAGS], "lag INT")
    j = (
        od.crossJoin(F.broadcast(lags))
        .join(
            ld.select(F.col("d").alias("dy"), "y"),
            F.col("dy") == F.col("d") + F.col("lag"),
        )
    )
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )

    def _d19(c):
        return F.col(c).cast("decimal(19,0)")

    nsxy = (_d19("n") * _d19("sxy") - _d19("sx") * _d19("sy")).cast("double")
    nsxx = (_d19("n") * _d19("sxx") - _d19("sx") * _d19("sx")).cast("double")
    nsyy = (_d19("n") * _d19("syy") - _d19("sy") * _d19("sy")).cast("double")
    r = m.select("lag", "n", (nsxy / F.sqrt(nsxx * nsyy)).alias("ccf"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return r.select(
        "lag",
        F.col("n").alias("n_days"),
        (F.round("ccf", 6) + F.lit(0.0)).alias("ccf"),
        F.when(F.abs("ccf") == F.max(F.abs("ccf")).over(wall), 1)
        .otherwise(0)
        .alias("is_best"),
    )


@query(
    "q452_turning_points",
    oracle=f"""
    WITH o AS (
      SELECT datediff('day', DATE '1970-01-01', o_orderdate) AS d
      FROM orders
    ),
    days AS (SELECT d, CAST(count(*) AS BIGINT) AS y FROM o GROUP BY 1),
    tri AS (
      SELECT y,
             lag(y) OVER (ORDER BY d) AS yp,
             lead(y) OVER (ORDER BY d) AS yn
      FROM days
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) + 2 AS n,
             CAST(sum(CASE WHEN (y - yp) * (yn - y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM tri WHERE yp IS NOT NULL AND yn IS NOT NULL
    ),
    z AS (
      SELECT n, tp,
             2.0 * (n - 2) / 3.0 AS e_tp,
             (CAST(tp AS DOUBLE) - 2.0 * (n - 2) / 3.0)
               / sqrt((16.0 * n - 29.0) / 90.0) AS zstat
      FROM t
    )
    SELECT n AS n_days, tp AS n_turning,
           round(e_tp, 6) AS expected_turning,
           round(zstat, 6) + 0.0 AS z,
           round(2.0 * (1.0 - {_phi_sql("abs(zstat)")}), 6) AS p_value,
           CASE WHEN 2.0 * (1.0 - {_phi_sql("abs(zstat)")}) < 0.05
                THEN 'structured' ELSE 'random' END AS verdict
    FROM z
    """,
)
def q452_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test of randomness (Kendall; Brockwell & Davis
    §1.6) on the daily order-count series: count the strict local
    extrema (points where (y_t - y_{t-1})(y_{t+1} - y_t) < 0 — tied
    neighbours contribute no turning point, disclosed) and compare
    against the i.i.d. expectation 2(n-2)/3 with variance (16n-29)/90.
    Too FEW turning points means positive autocorrelation (trends),
    too MANY means negative autocorrelation (overdifferencing) — the
    five-line randomness screen that complements q367's runs test
    (sign-based) and q443's ACF (moment-based), disclosed kinship.
    Interior triples come from one lag+lead pass over the day rollup;
    Phi runs the shared erfc Horner chain.

    100 TB story: one corpus scan to the O(days) rollup; lag/lead run
    over that bounded frame (allowlisted); the census is one fold."""
    o = _t(spark, sf_dir, "orders").select(
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("d")
    )
    days = o.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("y"))
    wd = Window.orderBy("d")
    tri = days.select(
        "y",
        F.lag("y").over(wd).alias("yp"),
        F.lead("y").over(wd).alias("yn"),
    ).filter(F.col("yp").isNotNull() & F.col("yn").isNotNull())
    t = tri.agg(
        (F.count(F.lit(1)) + 2).cast("long").alias("n"),
        F.sum(
            F.when((F.col("y") - F.col("yp")) * (F.col("yn") - F.col("y")) < 0, 1)
            .otherwise(0)
        ).cast("long").alias("tp"),
    )
    e_tp = 2.0 * (F.col("n") - 2) / 3.0
    z = (F.col("tp").cast("double") - e_tp) / F.sqrt(
        (16.0 * F.col("n") - 29.0) / 90.0
    )
    zc = t.select("n", "tp", e_tp.alias("e_tp"), z.alias("zstat"))
    p = 2.0 * (1.0 - _phi_col(F.abs(F.col("zstat"))))
    return zc.select(
        F.col("n").alias("n_days"),
        F.col("tp").alias("n_turning"),
        F.round("e_tp", 6).alias("expected_turning"),
        (F.round("zstat", 6) + F.lit(0.0)).alias("z"),
        F.round(p, 6).alias("p_value"),
        F.when(p < 0.05, "structured").otherwise("random").alias("verdict"),
    )


@query(
    "q453_markov_entropy_rate",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    tc AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    rt AS (
      SELECT src, CAST(sum(c) AS BIGINT) AS rc FROM tc GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM tc),
    hr AS (
      SELECT {_FOLD12_SQL.format(x="-(CAST(tc.c AS DOUBLE) / tot.nn) * log2(CAST(tc.c AS DOUBLE) / rt.rc)")} AS h_rate
      FROM tc JOIN rt USING (src) CROSS JOIN tot
    ),
    hm AS (
      SELECT {_FOLD12_SQL.format(x="-(CAST(rt.rc AS DOUBLE) / tot.nn) * log2(CAST(rt.rc AS DOUBLE) / tot.nn)")} AS h_src,
             CAST(count(*) AS BIGINT) AS k
      FROM rt CROSS JOIN tot
    )
    SELECT tot.nn AS n_transitions,
           hm.k AS n_states,
           round(hr.h_rate, 6) AS entropy_rate_bits,
           round(hm.h_src, 6) AS marginal_entropy_bits,
           round(hm.h_src - hr.h_rate, 6) AS predictability_gain_bits,
           round(hr.h_rate / log2(CAST(hm.k AS DOUBLE)), 6) AS entropy_efficiency
    FROM tot CROSS JOIN hr CROSS JOIN hm
    """,
)
def q453_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain (Shannon;
    Cover & Thomas ch. 4): H = -sum_ij (n_ij/N) log2(n_ij / n_i.) over
    the empirical transition counts — bits of surprise per step GIVEN
    the previous state — reported against the marginal (order-0)
    entropy of the source states; the difference is the PREDICTABILITY
    GAIN one step of memory buys, and efficiency normalizes by log2(K)
    over the observed K states. The screen that says whether q317's
    chain (disclosed kinship: identical transition build) carries any
    sequential signal worth a sequence model, or user behavior is
    i.i.d. and a bag-of-events suffices. Transition weights use the
    EMPIRICAL stationary estimate n_i./N (disclosed; exact for the
    observed window). Entropy terms fold at 12-dp DECIMAL so cell
    order cannot move the sums.

    100 TB story: ONE corpus-scale window (user, time) builds
    transition pairs; everything after runs on the K x K count grid —
    the entropy folds touch <= K^2 = 25 rows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    tc = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("c"))
    rt = tc.groupBy("src").agg(F.sum("c").cast("long").alias("rc"))
    tot = tc.agg(F.sum("c").cast("long").alias("nn"))
    hr = (
        tc.join(rt, "src")
        .crossJoin(F.broadcast(tot))
        .agg(
            _fold12(
                -(F.col("c").cast("double") / F.col("nn"))
                * F.log2(F.col("c").cast("double") / F.col("rc"))
            ).alias("h_rate")
        )
    )
    hm = rt.crossJoin(F.broadcast(tot)).agg(
        _fold12(
            -(F.col("rc").cast("double") / F.col("nn"))
            * F.log2(F.col("rc").cast("double") / F.col("nn"))
        ).alias("h_src"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return (
        tot.crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hm))
        .select(
            F.col("nn").alias("n_transitions"),
            F.col("k").alias("n_states"),
            F.round("h_rate", 6).alias("entropy_rate_bits"),
            F.round("h_src", 6).alias("marginal_entropy_bits"),
            F.round(F.col("h_src") - F.col("h_rate"), 6).alias(
                "predictability_gain_bits"
            ),
            F.round(
                F.col("h_rate") / F.log2(F.col("k").cast("double")), 6
            ).alias("entropy_efficiency"),
        )
    )


@query(
    "q454_bayes_two_proportion",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS hit
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    m AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(hit) AS BIGINT) AS k
      FROM s GROUP BY 1
    ),
    w AS (
      SELECT
        CAST(max(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
        CAST(max(CASE WHEN arm = 1 THEN k END) AS BIGINT) AS k1,
        CAST(max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
        CAST(max(CASE WHEN arm = 0 THEN k END) AS BIGINT) AS k0
      FROM m
    ),
    post AS (
      SELECT n1, k1, n0, k0,
             (k1 + 1.0) / (n1 + 2.0) AS m1,
             (k0 + 1.0) / (n0 + 2.0) AS m0,
             (k1 + 1.0) * (n1 - k1 + 1.0)
               / ((n1 + 2.0) * (n1 + 2.0) * (n1 + 3.0)) AS v1,
             (k0 + 1.0) * (n0 - k0 + 1.0)
               / ((n0 + 2.0) * (n0 + 2.0) * (n0 + 3.0)) AS v0
      FROM w
    ),
    z AS (
      SELECT n1, n0, m1, m0, v1, v0,
             (m1 - m0) / sqrt(v1 + v0) AS zstat
      FROM post
    )
    SELECT n1 AS n_building, n0 AS n_other,
           round(m1, 6) AS post_rate_building,
           round(m0, 6) AS post_rate_other,
           round({phi_z}, 6) AS prob_building_higher,
           round(m1 - m0 - 1.96 * sqrt(v1 + v0), 6) + 0.0 AS lift_ci_low,
           round(m1 - m0 + 1.96 * sqrt(v1 + v0), 6) + 0.0 AS lift_ci_high,
           CASE WHEN {phi_z} > 0.975 OR {phi_z} < 0.025
                THEN 'decided' ELSE 'undecided' END AS verdict
    FROM z
    """.replace("{phi_z}", _phi_sql("zstat")),
)
def q454_bayes_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian two-proportion comparison (Beta-Binomial with uniform
    Beta(1,1) priors) of the URGENT-priority rate between
    BUILDING-segment customers and the rest (the q438 fixture,
    disclosed kinship): each arm's posterior is Beta(k+1, n-k+1) with
    mean (k+1)/(n+2) and variance ab/((a+b)^2(a+b+1)); the posterior
    probability P(rate_B > rate_other) and the 95% credible interval
    of the lift use the NORMAL approximation of the Beta difference
    (disclosed — exact only as n grows; at corpus scale the skew
    correction is below rounding). The Bayesian twin of a frequentist
    two-proportion z-test: it answers "how sure are we B is higher"
    directly instead of a p-value. Counts are exact BIGINTs from one
    grouped aggregate; Phi runs the shared erfc Horner chain.

    100 TB story: ONE map-side-combining aggregate to two (n, k) rows;
    everything after is closed-form arithmetic on one row."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("arm"),
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("hit"),
    )
    m = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("hit").cast("long").alias("k"),
        )
    )
    w = m.agg(
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("k"))).alias("k1"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("k"))).alias("k0"),
    )
    m1 = (F.col("k1") + 1.0) / (F.col("n1") + 2.0)
    m0 = (F.col("k0") + 1.0) / (F.col("n0") + 2.0)
    v1 = (F.col("k1") + 1.0) * (F.col("n1") - F.col("k1") + 1.0) / (
        (F.col("n1") + 2.0) * (F.col("n1") + 2.0) * (F.col("n1") + 3.0)
    )
    v0 = (F.col("k0") + 1.0) * (F.col("n0") - F.col("k0") + 1.0) / (
        (F.col("n0") + 2.0) * (F.col("n0") + 2.0) * (F.col("n0") + 3.0)
    )
    z = w.select(
        "n1", "n0",
        m1.alias("m1"), m0.alias("m0"), v1.alias("v1"), v0.alias("v0"),
        ((m1 - m0) / F.sqrt(v1 + v0)).alias("zstat"),
    )
    phi = _phi_col(F.col("zstat"))
    return z.select(
        F.col("n1").alias("n_building"),
        F.col("n0").alias("n_other"),
        F.round("m1", 6).alias("post_rate_building"),
        F.round("m0", 6).alias("post_rate_other"),
        F.round(phi, 6).alias("prob_building_higher"),
        (F.round(F.col("m1") - F.col("m0") - 1.96 * F.sqrt(F.col("v1") + F.col("v0")), 6) + F.lit(0.0)).alias("lift_ci_low"),
        (F.round(F.col("m1") - F.col("m0") + 1.96 * F.sqrt(F.col("v1") + F.col("v0")), 6) + F.lit(0.0)).alias("lift_ci_high"),
        F.when((phi > 0.975) | (phi < 0.025), "decided")
        .otherwise("undecided")
        .alias("verdict"),
    )


@query(
    "q455_bartlett_variances",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS flag, CAST(round(l_quantity) AS BIGINT) AS v
      FROM lineitem
    ),
    m AS (
      SELECT flag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s1,
             CAST(sum(v * v) AS BIGINT) AS s2
      FROM s GROUP BY 1
    ),
    vv AS (
      SELECT flag, n,
             CAST(CAST(n AS DECIMAL(19,0)) * CAST(s2 AS DECIMAL(19,0))
                  - CAST(s1 AS DECIMAL(19,0)) * CAST(s1 AS DECIMAL(19,0)) AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1.0)) AS var_i
      FROM m
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(round(sum(CAST(round((n - 1.0) * var_i, 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS ssw,
             CAST(round(sum(CAST(round((n - 1.0) * ln(var_i), 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS slnv,
             CAST(round(sum(CAST(round(1.0 / (n - 1.0), 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS sinv
      FROM vv
    ),
    t AS (
      SELECT k, nn,
             ((nn - k) * ln(ssw / (nn - k)) - slnv)
               / (1.0 + (sinv - 1.0 / (nn - k)) / (3.0 * (k - 1.0))) AS tstat
      FROM agg
    )
    SELECT nn AS n_total, k AS n_groups,
           round(tstat, 6) + 0.0 AS bartlett_t,
           round(exp(-tstat / 2.0), 6) AS p_value,
           CASE WHEN exp(-tstat / 2.0) < 0.05
                THEN 'heteroscedastic' ELSE 'homoscedastic' END AS verdict
    FROM t
    """,
)
def q455_bartlett_variances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for homogeneity of variances (Bartlett 1937) of
    line quantity across the three return flags: T = ((N-k) ln(Sp^2)
    - sum (n_i-1) ln(S_i^2)) / C with the standard small-sample
    correction C — the PARAMETRIC sibling of q431's Brown-Forsythe
    (disclosed kinship: BF is robust to non-normality, Bartlett is
    more powerful when q423's normality read holds), the gate before
    pooling variances in any q438-style effect size. With k = 3 the
    null is chi-square(2), whose survival function is EXACTLY
    exp(-T/2) — no quantile approximation at all. Group variances come
    from exact BIGINT moments; the 3-row folds run at 12-dp DECIMAL.

    100 TB story: ONE map-side-combining aggregate to k = 3 moment
    rows; everything after is arithmetic on a 3-row frame."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round("l_quantity").cast("long").alias("v"),
    )
    m = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("s2"),
    )

    def _d19(c):
        return F.col(c).cast("decimal(19,0)")

    vv = m.select(
        "flag",
        "n",
        (
            (_d19("n") * _d19("s2") - _d19("s1") * _d19("s1")).cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1.0))
        ).alias("var_i"),
    )
    agg = vv.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        _fold12((F.col("n") - 1.0) * F.col("var_i")).alias("ssw"),
        _fold12((F.col("n") - 1.0) * F.log("var_i")).alias("slnv"),
        _fold12(1.0 / (F.col("n") - 1.0)).alias("sinv"),
    )
    tstat = (
        (F.col("nn") - F.col("k")) * F.log(F.col("ssw") / (F.col("nn") - F.col("k")))
        - F.col("slnv")
    ) / (
        1.0
        + (F.col("sinv") - 1.0 / (F.col("nn") - F.col("k")))
        / (3.0 * (F.col("k") - 1.0))
    )
    t = agg.select("k", "nn", tstat.alias("tstat"))
    p = F.exp(-F.col("tstat") / 2.0)
    return t.select(
        F.col("nn").alias("n_total"),
        F.col("k").alias("n_groups"),
        (F.round("tstat", 6) + F.lit(0.0)).alias("bartlett_t"),
        F.round(p, 6).alias("p_value"),
        F.when(p < 0.05, "heteroscedastic").otherwise("homoscedastic").alias("verdict"),
    )


@query(
    "q456_palma_hoover",
    oracle="""
    WITH c AS (
      SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer
    ),
    grid AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM c GROUP BY 1
    ),
    cum AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
             CAST(sum(c) OVER () AS BIGINT) AS n,
             CAST(sum(CAST(v AS DECIMAL(19,0)) * c) OVER () AS DECIMAL(38,0)) AS s
      FROM grid
    ),
    marks AS (
      SELECT v, c, cc, n, s,
             (4 * n) // 10 AS k40,
             (9 * n) // 10 AS k90,
             CAST(s AS DOUBLE) / n AS mean_c
      FROM cum
    ),
    amounts AS (
      SELECT max(n) AS n, max(s) AS s, max(k40) AS k40,
             CAST(sum(CASE WHEN cc <= k40 THEN CAST(v AS DECIMAL(19,0)) * c
                           WHEN cc - c < k40 THEN CAST(v AS DECIMAL(19,0)) * (k40 - (cc - c))
                           ELSE 0 END) AS DECIMAL(38,0)) AS a40,
             CAST(sum(CASE WHEN cc <= k90 THEN CAST(v AS DECIMAL(19,0)) * c
                           WHEN cc - c < k90 THEN CAST(v AS DECIMAL(19,0)) * (k90 - (cc - c))
                           ELSE 0 END) AS DECIMAL(38,0)) AS a90,
             CAST(round(sum(CAST(round(c * abs(v - mean_c), 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS sad
      FROM marks
    )
    SELECT n AS n_customers,
           round(CAST(a40 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS bottom40_share,
           round(CAST(s - a90 AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top10_share,
           round(CAST(s - a90 AS DOUBLE) / CAST(a40 AS DOUBLE), 6) AS palma_ratio,
           round(sad / (2.0 * CAST(s AS DOUBLE)), 6) AS hoover_index
    FROM amounts
    """,
)
def q456_palma_hoover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio and Hoover (Robin Hood) index of customer account
    balances — the inequality measures that complement q410's Gini
    and the Theil/Atkinson family (disclosed kinship): Palma = share
    of the top 10% over the share of the bottom 40% (the middle 50%
    is famously stable, so Palma isolates the tails Gini blurs);
    Hoover = half the mean absolute deviation from the mean over the
    total — the fraction of all balance that would have to move to
    equalize. Boundary customers at the 40%/90% rank marks are split
    FRACTIONALLY by count within the boundary value (exact integer
    arithmetic on the value support — no interpolation floats,
    disclosed); negative balances participate as-is (shares are of
    the NET total, disclosed). The absolute-deviation fold runs at
    12-dp DECIMAL.

    100 TB story: ONE map-side-combining aggregate to the cent-value
    support (range-bounded, the q82 shape); cumulative windows and
    the boundary split run over that support (allowlisted)."""
    c = _t(spark, sf_dir, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v")
    )
    grid = c.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = grid.select(
        "v",
        "c",
        F.sum("c").over(wc).cast("long").alias("cc"),
        F.sum("c").over(wall).cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("c")).over(wall)
        .cast("decimal(38,0)").alias("s"),
    )
    marks = cum.select(
        "v", "c", "cc", "n", "s",
        F.expr("(4 * n) div 10").alias("k40"),
        F.expr("(9 * n) div 10").alias("k90"),
        (F.col("s").cast("double") / F.col("n")).alias("mean_c"),
    )

    def _amount(kcol):
        v19 = F.col("v").cast("decimal(19,0)")
        return F.sum(
            F.when(F.col("cc") <= F.col(kcol), v19 * F.col("c"))
            .when(F.col("cc") - F.col("c") < F.col(kcol), v19 * (F.col(kcol) - (F.col("cc") - F.col("c"))))
            .otherwise(F.lit(0).cast("decimal(19,0)"))
        ).cast("decimal(38,0)")

    amounts = marks.agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        _amount("k40").alias("a40"),
        _amount("k90").alias("a90"),
        _fold12(F.col("c") * F.abs(F.col("v") - F.col("mean_c"))).alias("sad"),
    )
    sD = F.col("s").cast("double")
    top = (F.col("s") - F.col("a90")).cast("double")
    return amounts.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("a40").cast("double") / sD, 6).alias("bottom40_share"),
        F.round(top / sD, 6).alias("top10_share"),
        F.round(top / F.col("a40").cast("double"), 6).alias("palma_ratio"),
        F.round(F.col("sad") / (2.0 * sD), 6).alias("hoover_index"),
    )


# Gumbel constants quantized once in Python, embedded in BOTH engines
# (neither engine's libm ln/sqrt chain is trusted across engines for
# literal-argument constants).
_G_SQRT6_PI = 0.779696801233676   # sqrt(6)/pi
_G_EULER = 0.5772156649015329    # Euler-Mascheroni gamma
_G_RL12 = 2.441716398881459    # -ln(-ln(1 - 1/12))
_G_RL120 = 4.783310535761862    # -ln(-ln(1 - 1/120))


@query(
    "q457_gumbel_block_maxima",
    oracle="""
    WITH o AS (
      SELECT datediff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS yc
      FROM orders
    ),
    days AS (
      SELECT d, CAST(sum(yc) AS BIGINT) AS y FROM o GROUP BY 1
    ),
    blocks AS (
      SELECT d // 30 AS b, CAST(max(y) AS BIGINT) AS mx
      FROM days GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(mx AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(mx AS DECIMAL(19,0)) * CAST(mx AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s2
      FROM blocks
    ),
    fit AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / n AS mean_c,
             sqrt(CAST(CAST(n AS DECIMAL(19,0)) * s2 - s1 * s1 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (n - 1.0))) * {s6pi} AS beta_c
      FROM m
    )
    SELECT n AS n_blocks,
           round((mean_c - {eul} * beta_c) / 100.0, 2) AS gumbel_mu,
           round(beta_c / 100.0, 2) AS gumbel_beta,
           round((mean_c - {eul} * beta_c + beta_c * {rl12}) / 100.0, 2) AS return_level_1yr,
           round((mean_c - {eul} * beta_c + beta_c * {rl120}) / 100.0, 2) AS return_level_10yr
    FROM fit
    """.replace("{s6pi}", repr(_G_SQRT6_PI)).replace("{eul}", repr(_G_EULER))
       .replace("{rl12}", repr(_G_RL12)).replace("{rl120}", repr(_G_RL120)),
)
def q457_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit on 30-day block maxima of daily order
    revenue (Gumbel 1958; the method-of-moments fit: beta =
    sd * sqrt(6)/pi, mu = mean - gamma*beta) with 1-year (T = 12
    blocks) and 10-year (T = 120) RETURN LEVELS mu - beta *
    ln(-ln(1 - 1/T)) — the capacity-planning question "what daily
    revenue peak should we provision for once a decade" that no mean
    or quantile of the raw series answers (q448's outlier test flags
    the past; this extrapolates the tail law). Fixed 30-day blocks
    from the epoch-day index avoid calendar-month parsing differences
    (disclosed). All four transcendental constants (sqrt(6)/pi,
    Euler's gamma, the two return-level logs) are quantized once in
    Python and embedded as IDENTICAL literals in both engines; block
    maxima moments are exact DECIMAL.

    100 TB story: one corpus scan to the O(days) rollup, one grouped
    max to the O(blocks) frame, ONE moment fold; closed form after."""
    o = _t(spark, sf_dir, "orders").select(
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("yc"),
    )
    days = o.groupBy("d").agg(F.sum("yc").cast("long").alias("y"))
    blocks = days.groupBy(F.expr("d div 30").alias("b")).agg(
        F.max("y").cast("long").alias("mx")
    )

    def _d19(c):
        return F.col(c).cast("decimal(19,0)")

    m = blocks.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_d19("mx")).cast("decimal(38,0)").alias("s1"),
        F.sum(_d19("mx") * _d19("mx")).cast("decimal(38,0)").alias("s2"),
    )
    mean_c = F.col("s1").cast("double") / F.col("n")
    beta_c = (
        F.sqrt(
            (_d19("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1.0))
        )
        * _G_SQRT6_PI
    )
    fit = m.select("n", mean_c.alias("mean_c"), beta_c.alias("beta_c"))
    mu = F.col("mean_c") - _G_EULER * F.col("beta_c")
    return fit.select(
        F.col("n").alias("n_blocks"),
        F.round(mu / 100.0, 2).alias("gumbel_mu"),
        F.round(F.col("beta_c") / 100.0, 2).alias("gumbel_beta"),
        F.round((mu + F.col("beta_c") * _G_RL12) / 100.0, 2).alias("return_level_1yr"),
        F.round((mu + F.col("beta_c") * _G_RL120) / 100.0, 2).alias("return_level_10yr"),
    )
