"""Query registry block 501+ (round 11b tail): agreement robust to the
kappa paradox (Gwet AC1), arcsine effect size (Cohen's h), Poisson rate
CIs (Byar), diagnostic threshold calibration (Youden scan), tail risk
(expected shortfall with exact fractional boundary), equivalence
testing (TOST), reliability (mean residual life), and effect-modification
(Woolf OR-homogeneity) — the exact-fold determinism policy from
``_core`` throughout (integer/DECIMAL corpus sums, 12-dp per-term
rounding, identical literal chains on both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._core import _t, query
from .q451_500 import _FOLD12_SQL, _fold12


@query(
    "q501_gwet_ac1",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS r1,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r2
      FROM lineitem
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM s
    ),
    f AS (
      SELECT n,
             CAST(a + d AS DOUBLE) / n AS po,
             CAST(a + b AS DOUBLE) / n AS p1,
             CAST(a + c AS DOUBLE) / n AS p2
      FROM m
    ),
    g AS (
      SELECT n, po, p1, p2,
             (p1 + p2) / 2.0 AS q
      FROM f
    )
    SELECT n AS n_lines,
           round(po, 6) AS observed_agreement,
           round(2.0 * q * (1.0 - q), 6) AS chance_ac1,
           round((po - 2.0 * q * (1.0 - q)) / (1.0 - 2.0 * q * (1.0 - q)), 6) AS gwet_ac1,
           round((po - (p1 * p2 + (1.0 - p1) * (1.0 - p2)))
                 / (1.0 - (p1 * p2 + (1.0 - p1) * (1.0 - p2))), 6) AS cohens_kappa,
           round((po - 2.0 * q * (1.0 - q)) / (1.0 - 2.0 * q * (1.0 - q))
                 - (po - (p1 * p2 + (1.0 - p1) * (1.0 - p2)))
                   / (1.0 - (p1 * p2 + (1.0 - p1) * (1.0 - p2))), 6) AS paradox_gap
    FROM g
    """,
)
def q501_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 agreement coefficient (Gwet 2008), the
    prevalence-paradox-robust alternative to Cohen's kappa, treating
    the deep-discount flag and the return flag as two binary "raters"
    of each line: AC1's chance term 2q(1-q) (q = mean marginal) stays
    calibrated when one category dominates, where kappa's p1*p2 +
    (1-p1)(1-p2) collapses toward Po and drags kappa to zero on skewed
    margins — the reported paradox_gap IS that effect, measured. q346
    computes kappa proper and q216 raw quality-signal agreement
    (disclosed kinship); AC1 completes the agreement ladder with the
    skew-robust member. All four cell counts are exact integers from
    ONE aggregate; the coefficients are closed-form on one row.

    100 TB story: ONE map-side-combining aggregate to a 4-cell table;
    scalar arithmetic after — no window, no join, no second scan."""
    s = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("r1"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r2"),
    )
    m = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    f = m.select(
        "n",
        ((F.col("a") + F.col("d")).cast("double") / F.col("n")).alias("po"),
        ((F.col("a") + F.col("b")).cast("double") / F.col("n")).alias("p1"),
        ((F.col("a") + F.col("c")).cast("double") / F.col("n")).alias("p2"),
    )
    g = f.select("n", "po", "p1", "p2", ((F.col("p1") + F.col("p2")) / 2.0).alias("q"))
    pe1 = 2.0 * F.col("q") * (1.0 - F.col("q"))
    pek = F.col("p1") * F.col("p2") + (1.0 - F.col("p1")) * (1.0 - F.col("p2"))
    ac1 = (F.col("po") - pe1) / (1.0 - pe1)
    kap = (F.col("po") - pek) / (1.0 - pek)
    return g.select(
        F.col("n").alias("n_lines"),
        F.round("po", 6).alias("observed_agreement"),
        F.round(pe1, 6).alias("chance_ac1"),
        F.round(ac1, 6).alias("gwet_ac1"),
        F.round(kap, 6).alias("cohens_kappa"),
        F.round(ac1 - kap, 6).alias("paradox_gap"),
    )


@query(
    "q502_cohens_h",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS t,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    m AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      FROM s GROUP BY 1
    ),
    w AS (
      SELECT
        CAST(max(CASE WHEN t = 1 THEN pos END) AS DOUBLE)
          / max(CASE WHEN t = 1 THEN n END) AS p1,
        CAST(max(CASE WHEN t = 0 THEN pos END) AS DOUBLE)
          / max(CASE WHEN t = 0 THEN n END) AS p0,
        CAST(max(CASE WHEN t = 1 THEN n END) AS BIGINT) AS n1,
        CAST(max(CASE WHEN t = 0 THEN n END) AS BIGINT) AS n0
      FROM m
    ),
    f AS (
      SELECT n1, n0, p1, p0,
             round(2.0 * asin(sqrt(p1)), 12) AS phi1,
             round(2.0 * asin(sqrt(p0)), 12) AS phi0
      FROM w
    )
    SELECT n1 AS n_discounted, n0 AS n_rest,
           round(p1, 6) AS return_rate_discounted,
           round(p0, 6) AS return_rate_rest,
           round(phi1 - phi0, 6) AS cohens_h,
           CASE WHEN abs(phi1 - phi0) < 0.2 THEN 'negligible'
                WHEN abs(phi1 - phi0) < 0.5 THEN 'small'
                WHEN abs(phi1 - phi0) < 0.8 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM f
    """,
)
def q502_cohens_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's h effect size for two proportions (Cohen 1988): the
    difference of arcsine-square-root transformed return rates between
    deep-discounted and other lines, h = 2asin(sqrt(p1)) -
    2asin(sqrt(p0)) — the variance-stabilizing scale on which a
    5pp difference means the same thing at p=0.05 as at p=0.50,
    which raw risk differences (q434/q498, disclosed kinship) do not.
    Each phi term is rounded to 12 dp BEFORE the subtraction in both
    engines (the asin outputs are the only libm calls; quantized
    identically per the registry policy). Banded with Cohen's
    conventional 0.2/0.5/0.8 magnitude labels.

    100 TB story: ONE aggregate to two (n, pos) rows, a 2-row pivot,
    closed form — no window, no join."""
    s = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("t"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    m = s.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = m.agg(
        (
            F.max(F.when(F.col("t") == 1, F.col("pos"))).cast("double")
            / F.max(F.when(F.col("t") == 1, F.col("n")))
        ).alias("p1"),
        (
            F.max(F.when(F.col("t") == 0, F.col("pos"))).cast("double")
            / F.max(F.when(F.col("t") == 0, F.col("n")))
        ).alias("p0"),
        F.max(F.when(F.col("t") == 1, F.col("n"))).cast("long").alias("n1"),
        F.max(F.when(F.col("t") == 0, F.col("n"))).cast("long").alias("n0"),
    )
    f = w.select(
        "n1",
        "n0",
        "p1",
        "p0",
        F.round(2.0 * F.asin(F.sqrt("p1")), 12).alias("phi1"),
        F.round(2.0 * F.asin(F.sqrt("p0")), 12).alias("phi0"),
    )
    h = F.col("phi1") - F.col("phi0")
    return f.select(
        F.col("n1").alias("n_discounted"),
        F.col("n0").alias("n_rest"),
        F.round("p1", 6).alias("return_rate_discounted"),
        F.round("p0", 6).alias("return_rate_rest"),
        F.round(h, 6).alias("cohens_h"),
        F.when(F.abs(h) < 0.2, "negligible")
        .when(F.abs(h) < 0.5, "small")
        .when(F.abs(h) < 0.8, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


@query(
    "q503_byar_rate_ci",
    oracle="""
    WITH span AS (
      SELECT CAST((max(epoch_ns(ts) // 1000000000) - min(epoch_ns(ts) // 1000000000))
                  AS DOUBLE) / 86400.0 + 1.0 AS t_days
      FROM events
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
    ),
    f AS (
      SELECT event_type, n, (SELECT t_days FROM span) AS t,
             (1.0 - 1.0 / (9.0 * n) - 1.959963985 / (3.0 * sqrt(CAST(n AS DOUBLE)))) AS la,
             (1.0 - 1.0 / (9.0 * (n + 1)) + 1.959963985 / (3.0 * sqrt(n + 1.0))) AS ua
      FROM g
    )
    SELECT event_type, n AS n_events,
           round(t, 6) AS span_days,
           round(n / t, 6) AS rate_per_day,
           round(n * (la * la * la) / t, 6) AS rate_lo95,
           round((n + 1) * (ua * ua * ua) / t, 6) AS rate_hi95,
           round(((n + 1) * (ua * ua * ua) - n * (la * la * la)) / t, 6) AS ci_width
    FROM f
    """,
)
def q503_byar_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byar's approximation to the exact Poisson rate confidence
    interval (Byar, in Breslow & Day 1987) per event type: the cube of
    1 - 1/(9n) -/+ z/(3 sqrt(n)) applied to n (lower) and n+1 (upper),
    over the observed span in days — accurate to a fraction of a
    percent of the exact Garwood chi-square interval WITHOUT needing a
    chi-square quantile function, which is exactly why it is the
    closed form a SQL engine can own. The per-type RATE with honest
    uncertainty is the number q405's dispersion test (disclosed
    kinship) decides you may trust; cubes are explicit x*x*x products
    so both engines run the identical float chain (z = 1.959963985
    shared literal).

    100 TB story: ONE aggregate to K type rows plus one span row;
    closed form per row — no window, no join beyond the broadcast
    1-row span."""
    e = _t(spark, sf_dir, "events")
    span = e.agg(
        (
            (
                F.max(F.expr("ts div 1000000000"))
                - F.min(F.expr("ts div 1000000000"))
            ).cast("double")
            / 86400.0
            + 1.0
        ).alias("t")
    )
    g = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    z = 1.959963985
    f = g.crossJoin(F.broadcast(span)).select(
        "event_type",
        "n",
        "t",
        (
            1.0 - 1.0 / (9.0 * F.col("n")) - z / (3.0 * F.sqrt(F.col("n").cast("double")))
        ).alias("la"),
        (
            1.0
            - 1.0 / (9.0 * (F.col("n") + 1))
            + z / (3.0 * F.sqrt(F.col("n") + 1.0))
        ).alias("ua"),
    )
    lo = F.col("n") * (F.col("la") * F.col("la") * F.col("la")) / F.col("t")
    hi = (F.col("n") + 1) * (F.col("ua") * F.col("ua") * F.col("ua")) / F.col("t")
    return f.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round("t", 6).alias("span_days"),
        F.round(F.col("n") / F.col("t"), 6).alias("rate_per_day"),
        F.round(lo, 6).alias("rate_lo95"),
        F.round(hi, 6).alias("rate_hi95"),
        F.round(hi - lo, 6).alias("ci_width"),
    )


@query(
    "q504_youden_threshold",
    oracle="""
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT v,
             CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cn,
             CAST(sum(pos) OVER (ORDER BY v) AS BIGINT) AS cpos,
             CAST(sum(c) OVER () AS BIGINT) AS nn,
             CAST(sum(pos) OVER () AS BIGINT) AS np,
             max(v) OVER () AS vmax
      FROM h
    ),
    j AS (
      SELECT v AS threshold,
             round(CAST(cpos AS DOUBLE) / np, 12) AS sens,
             round(CAST((nn - np) - (cn - cpos) AS DOUBLE) / (nn - np), 12) AS spec
      FROM cum WHERE v < vmax
    ),
    g AS (
      SELECT threshold, sens, spec,
             round(sens + spec - 1.0, 12) AS j
      FROM j
    ),
    g2 AS (
      SELECT threshold, sens, spec, j, max(j) OVER () AS bj FROM g
    ),
    g3 AS (
      SELECT threshold, sens, spec, j, bj,
             min(CASE WHEN j = bj THEN threshold END) OVER () AS bt
      FROM g2
    )
    SELECT threshold,
           round(sens, 6) AS sensitivity,
           round(spec, 6) AS specificity,
           round(j, 6) AS youden_j,
           CASE WHEN j = bj AND threshold = bt THEN 1 ELSE 0 END AS is_best
    FROM g3
    """,
)
def q504_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Youden-optimal operating point scan (Youden 1950): for every
    quantity threshold, the sensitivity and specificity of the rule
    "v <= t predicts a returned line", with J = sens + spec - 1
    maximized (12-dp-quantized argmax, earliest-threshold tiebreak in
    BOTH engines). The CALIBRATION complement of the ladder this block
    closes: q279 integrates the whole ROC into one AUC, q481 picks the
    split by Gini purity, q467 reports the diagnostic suite AT a given
    rule — this finds the rule. All counts flow from ONE cumulative
    pass over the 50-row support.

    100 TB story: ONE aggregate to the support histogram; cum and
    argmax windows run on that SF-invariant support (allowlisted) —
    no corpus-rate work after the first fold."""
    h = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("v"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("isr"),
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("isr").cast("long").alias("pos"),
        )
    )
    wv = Window.orderBy("v")
    wall = Window.partitionBy()
    cum = h.select(
        "v",
        F.sum("c").over(wv).cast("long").alias("cn"),
        F.sum("pos").over(wv).cast("long").alias("cpos"),
        F.sum("c").over(wall).cast("long").alias("nn"),
        F.sum("pos").over(wall).cast("long").alias("np"),
        F.max("v").over(wall).alias("vmax"),
    )
    j = cum.filter(F.col("v") < F.col("vmax")).select(
        F.col("v").alias("threshold"),
        F.round(F.col("cpos").cast("double") / F.col("np"), 12).alias("sens"),
        F.round(
            ((F.col("nn") - F.col("np")) - (F.col("cn") - F.col("cpos"))).cast(
                "double"
            )
            / (F.col("nn") - F.col("np")),
            12,
        ).alias("spec"),
    )
    g = j.select(
        "threshold",
        "sens",
        "spec",
        F.round(F.col("sens") + F.col("spec") - 1.0, 12).alias("jj"),
    )
    wmax = Window.partitionBy()
    best_j = F.max("jj").over(wmax)
    best_t = F.min(F.when(F.col("jj") == best_j, F.col("threshold"))).over(wmax)
    return g.select(
        "threshold",
        F.round("sens", 6).alias("sensitivity"),
        F.round("spec", 6).alias("specificity"),
        F.round("jj", 6).alias("youden_j"),
        F.when((F.col("jj") == best_j) & (F.col("threshold") == best_t), 1)
        .otherwise(0)
        .alias("is_best"),
    )


@query(
    "q505_expected_shortfall",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
    ),
    sup AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s
      FROM sup
    ),
    cum AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v DESC) AS BIGINT) AS cdesc,
             CAST(sum(CAST(v AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
                  OVER (ORDER BY v DESC) AS DECIMAL(38,0)) AS sdesc
      FROM sup
    ),
    m AS (
      SELECT CAST(ceil(0.05 * (SELECT n FROM tot)) AS BIGINT) AS m
    ),
    b AS (
      SELECT v, c, cdesc, sdesc FROM cum
      WHERE cdesc >= (SELECT m FROM m)
      ORDER BY v DESC LIMIT 1
    ),
    f AS (
      SELECT (SELECT n FROM tot) AS n, (SELECT m FROM m) AS m,
             b.v AS var95,
             CAST(b.sdesc - CAST(b.v AS DECIMAL(19,0))
                  * CAST(b.cdesc - (SELECT m FROM m) AS DECIMAL(19,0)) AS DOUBLE)
               / (SELECT m FROM m) AS es95,
             CAST(b.sdesc - CAST(b.v AS DECIMAL(19,0))
                  * CAST(b.cdesc - (SELECT m FROM m) AS DECIMAL(19,0)) AS DOUBLE)
               / CAST((SELECT s FROM tot) AS DOUBLE) AS tail_rev_share
      FROM b
    )
    SELECT n AS n_orders, m AS tail_orders, var95 AS var95_dollars,
           round(es95, 6) AS es95_dollars,
           round(es95 / var95, 6) AS es_to_var_ratio,
           round(tail_rev_share, 6) AS tail_revenue_share
    FROM f
    """,
)
def q505_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected shortfall / CVaR at the 95% level (Rockafellar &
    Uryasev 2000) of dollar-floored order values: the mean of the top
    m = ceil(0.05 N) values, computed EXACTLY from the descending
    dollar-support cum with the fractional-boundary rule — the boundary
    bucket contributes only (m - taken) of its count, the q456
    Palma/Hoover exact-split treatment applied to a tail mean
    (disclosed kinship; q82's $1 buckets bound the support by the price
    RANGE). ES is the coherent tail-risk measure VaR is not — the
    es_to_var_ratio says how heavy the tail is beyond its own cutoff.
    Dollar flooring is the disclosed quantization (sub-dollar cents
    ignored, same rule both engines).

    100 TB story: ONE aggregate to the price-range-bounded dollar
    support; the descending cum is the allowlisted bounded-support
    window; the boundary row is a 1-row limit — no corpus sort."""
    v = _t(spark, sf_dir, "orders").select(
        F.floor("o_totalprice").cast("long").alias("v")
    )
    sup = v.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    vd = F.col("v").cast("decimal(19,0)")
    cd = F.col("c").cast("decimal(19,0)")
    wdesc = Window.orderBy(F.col("v").desc())
    wall = Window.partitionBy()
    cum = sup.select(
        "v",
        "c",
        F.sum("c").over(wdesc).cast("long").alias("cdesc"),
        F.sum(vd * cd).over(wdesc).cast("decimal(38,0)").alias("sdesc"),
        F.sum("c").over(wall).cast("long").alias("n"),
        F.sum(vd * cd).over(wall).cast("decimal(38,0)").alias("s"),
    )
    withm = cum.select(
        "*", F.ceil(0.05 * F.col("n")).cast("long").alias("m")
    )
    b = (
        withm.filter(F.col("cdesc") >= F.col("m"))
        .orderBy(F.col("v").desc())
        .limit(1)
    )
    tail_sum = (
        F.col("sdesc")
        - F.col("v").cast("decimal(19,0)")
        * (F.col("cdesc") - F.col("m")).cast("decimal(19,0)")
    ).cast("double")
    return b.select(
        F.col("n").alias("n_orders"),
        F.col("m").alias("tail_orders"),
        F.col("v").alias("var95_dollars"),
        F.round(tail_sum / F.col("m"), 6).alias("es95_dollars"),
        F.round(tail_sum / F.col("m") / F.col("v"), 6).alias("es_to_var_ratio"),
        F.round(tail_sum / F.col("s").cast("double"), 6).alias("tail_revenue_share"),
    )


@query(
    "q506_tost_equivalence",
    oracle="""
    WITH s AS (
      SELECT year(o_orderdate) AS yr,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS y
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    ),
    g AS (
      SELECT yr, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      FROM s GROUP BY 1
    ),
    w AS (
      SELECT
        CAST(max(CASE WHEN yr = 1995 THEN n END) AS BIGINT) AS n1,
        CAST(max(CASE WHEN yr = 1996 THEN n END) AS BIGINT) AS n2,
        CAST(max(CASE WHEN yr = 1995 THEN pos END) AS DOUBLE)
          / max(CASE WHEN yr = 1995 THEN n END) AS p1,
        CAST(max(CASE WHEN yr = 1996 THEN pos END) AS DOUBLE)
          / max(CASE WHEN yr = 1996 THEN n END) AS p2
      FROM g
    ),
    f AS (
      SELECT n1, n2, p1, p2, p2 - p1 AS d,
             sqrt(p1 * (1.0 - p1) / n1 + p2 * (1.0 - p2) / n2) AS se
      FROM w
    )
    SELECT n1 AS n_1995, n2 AS n_1996,
           round(p1, 6) AS high_prio_share_1995,
           round(p2, 6) AS high_prio_share_1996,
           round(d, 6) AS diff,
           round((d + 0.02) / se, 6) AS z_lower,
           round((0.02 - d) / se, 6) AS z_upper,
           CASE WHEN (d + 0.02) / se >= 1.644853627
                 AND (0.02 - d) / se >= 1.644853627
                THEN 'equivalent_within_2pp' ELSE 'not_shown_equivalent' END AS verdict
    FROM f
    """,
)
def q506_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-one-sided-tests equivalence procedure (Schuirmann 1987,
    TOST) for the high-priority order share 1995 vs 1996 at a +/-2pp
    margin: equivalence is DEMONSTRATED only when BOTH one-sided z
    statistics clear 1.645 — absence of a significant difference is
    not evidence of equivalence, which is precisely the inferential
    gap every superiority test in this registry (q330/q362/q497 family,
    disclosed kinship) leaves open; TOST closes the ladder with the
    "shows sameness" member. Proportions and the pooled-free SE come
    from exact integer counts; margin 0.02 and z_0.95 = 1.644853627
    are shared literals.

    100 TB story: ONE aggregate to two (n, pos) rows, a 2-row pivot,
    closed form — no window, no join."""
    s = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .select(
            F.year("o_orderdate").alias("yr"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("y"),
        )
    )
    g = s.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = g.agg(
        F.max(F.when(F.col("yr") == 1995, F.col("n"))).cast("long").alias("n1"),
        F.max(F.when(F.col("yr") == 1996, F.col("n"))).cast("long").alias("n2"),
        (
            F.max(F.when(F.col("yr") == 1995, F.col("pos"))).cast("double")
            / F.max(F.when(F.col("yr") == 1995, F.col("n")))
        ).alias("p1"),
        (
            F.max(F.when(F.col("yr") == 1996, F.col("pos"))).cast("double")
            / F.max(F.when(F.col("yr") == 1996, F.col("n")))
        ).alias("p2"),
    )
    f = w.select(
        "n1",
        "n2",
        "p1",
        "p2",
        (F.col("p2") - F.col("p1")).alias("d"),
        F.sqrt(
            F.col("p1") * (1.0 - F.col("p1")) / F.col("n1")
            + F.col("p2") * (1.0 - F.col("p2")) / F.col("n2")
        ).alias("se"),
    )
    zl = (F.col("d") + 0.02) / F.col("se")
    zu = (0.02 - F.col("d")) / F.col("se")
    return f.select(
        F.col("n1").alias("n_1995"),
        F.col("n2").alias("n_1996"),
        F.round("p1", 6).alias("high_prio_share_1995"),
        F.round("p2", 6).alias("high_prio_share_1996"),
        F.round("d", 6).alias("diff"),
        F.round(zl, 6).alias("z_lower"),
        F.round(zu, 6).alias("z_upper"),
        F.when((zl >= 1.644853627) & (zu >= 1.644853627), "equivalent_within_2pp")
        .otherwise("not_shown_equivalent")
        .alias("verdict"),
    )


_MRL_GRID = [7, 14, 30, 60, 90]
_MRL_GRID_SQL = ", ".join(f"({t})" for t in _MRL_GRID)


@query(
    "q507_mean_residual_life",
    oracle=f"""
    WITH grid(t) AS (VALUES {_MRL_GRID_SQL}),
    o AS (
      SELECT o_custkey,
             datediff('day', DATE '1970-01-01', o_orderdate) AS d,
             o_orderkey
      FROM orders
    ),
    g AS (
      SELECT d, lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS nd
      FROM o
    ),
    sup AS (
      SELECT nd - d AS gap, CAST(count(*) AS BIGINT) AS c
      FROM g WHERE nd IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sup),
    f AS (
      SELECT grid.t,
             CAST(sum(CASE WHEN sup.gap > grid.t THEN sup.c ELSE 0 END) AS BIGINT) AS surv,
             CAST(sum(CASE WHEN sup.gap > grid.t
                           THEN CAST(sup.gap - grid.t AS DECIMAL(19,0)) * CAST(sup.c AS DECIMAL(19,0))
                           ELSE 0 END) AS DECIMAL(38,0)) AS rsum
      FROM grid CROSS JOIN sup
      GROUP BY 1
    )
    SELECT t AS horizon_days, surv AS n_surviving,
           round(CAST(surv AS DOUBLE) / (SELECT n FROM tot), 6) AS survival_share,
           round(CAST(rsum AS DOUBLE) / surv, 6) AS mean_residual_days
    FROM f
    """,
)
def q507_mean_residual_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical mean residual life of the customer reorder gap (the
    reliability function MRL(t) = E[G - t | G > t]) at horizons 7/14/
    30/60/90 days: given a customer has NOT reordered by day t, how
    many more days until they do, on average — the quantity a win-back
    campaign trigger is actually tuned on. An INCREASING MRL is the
    heavy-tail signature (the longer they're gone, the longer still
    they'll be gone). Computed on OBSERVED (uncensored) gaps only —
    disclosed: q429's Nelson-Aalen handles the censored tail via risk
    sets; MRL here is the uncensored empirical complement (q439's
    Weibull fit is the parametric sibling). Sums are exact
    BIGINT/DECIMAL over the gap support x the broadcast 5-row grid.

    100 TB story: one customer-partitioned lead() pass builds gaps
    (the q429 audited shape); everything after runs on the
    date-range-bounded gap support against a broadcast literal grid —
    no corpus re-scan, no unpartitioned corpus sort."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("d"),
    )
    g = o.withColumn(
        "nd",
        F.lead("d").over(Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")),
    )
    sup = (
        g.filter(F.col("nd").isNotNull())
        .groupBy((F.col("nd") - F.col("d")).alias("gap"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = sup.agg(F.sum("c").cast("long").alias("n"))
    grid = spark.createDataFrame([(t,) for t in _MRL_GRID], "t INT")
    f = (
        sup.crossJoin(F.broadcast(grid))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("gap") > F.col("t"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("surv"),
            F.sum(
                F.when(
                    F.col("gap") > F.col("t"),
                    (F.col("gap") - F.col("t")).cast("decimal(19,0)")
                    * F.col("c").cast("decimal(19,0)"),
                ).otherwise(F.lit(0))
            )
            .cast("decimal(38,0)")
            .alias("rsum"),
        )
    )
    return f.crossJoin(F.broadcast(tot)).select(
        F.col("t").alias("horizon_days"),
        F.col("surv").alias("n_surviving"),
        F.round(F.col("surv").cast("double") / F.col("n"), 6).alias(
            "survival_share"
        ),
        F.round(F.col("rsum").cast("double") / F.col("surv"), 6).alias(
            "mean_residual_days"
        ),
    )


@query(
    "q508_woolf_homogeneity",
    oracle="""
    WITH s AS (
      SELECT l_linestatus AS st,
             CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS t,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    g AS (
      SELECT st,
             CAST(sum(CASE WHEN t = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN t = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN t = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN t = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM s GROUP BY 1
    ),
    lor AS (
      SELECT st, a, b, c, d,
             round(ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))), 12) AS lo,
             round(1.0 / (1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                          + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)), 12) AS w
      FROM g
    ),
    pool AS (
      SELECT CAST(round(sum(CAST(round(w * lo, 12) AS DECIMAL(38,12))), 12) AS DOUBLE)
               / CAST(round(sum(CAST(round(w, 12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS plo
      FROM lor
    ),
    chi AS (
      SELECT CAST(round(sum(CAST(round(
               w * (lo - (SELECT plo FROM pool)) * (lo - (SELECT plo FROM pool)),
             12) AS DECIMAL(38,12))), 12) AS DOUBLE) AS x2,
             CAST(count(*) AS BIGINT) - 1 AS df
      FROM lor
    )
    SELECT lor.st AS stratum, lor.a + lor.b + lor.c + lor.d AS n,
           round(exp(lor.lo), 6) AS odds_ratio,
           round(exp((SELECT plo FROM pool)), 6) AS pooled_odds_ratio,
           round((SELECT x2 FROM chi), 6) AS woolf_chi2,
           (SELECT df FROM chi) AS df,
           CASE WHEN (SELECT x2 FROM chi) > 3.841458821
                THEN 'effect_modification' ELSE 'homogeneous' END AS verdict
    FROM lor
    """,
)
def q508_woolf_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Woolf's test for homogeneity of odds ratios across strata
    (Woolf 1955): is the discount-return odds ratio the SAME for open
    and finished lines, or is line status an effect modifier? Each
    stratum's log-OR (Haldane-Anscombe +0.5 in every cell, applied
    unconditionally so both engines take the identical branch-free
    path) is weighted by its inverse variance; the chi-square is the
    weighted dispersion of stratum log-ORs around the pooled value,
    df = K-1 against the 3.841 literal. THE missing premise check for
    q463's Mantel-Haenszel pooling (disclosed kinship): MH ASSUMES a
    common OR — Woolf TESTS it; report both, pool only when Woolf
    passes. 12-dp folds throughout.

    100 TB story: ONE aggregate to the K x 4 cell grid; weights,
    pooling and the dispersion fold run on K rows — no window, no
    join, no second scan."""
    s = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linestatus").alias("st"),
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("t"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("st").agg(
        F.sum(F.when((F.col("t") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("t") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("t") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("t") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    ).localCheckpoint(eager=True)
    lor = g.select(
        "st",
        "a",
        "b",
        "c",
        "d",
        F.round(
            F.log(
                ((F.col("a") + 0.5) * (F.col("d") + 0.5))
                / ((F.col("b") + 0.5) * (F.col("c") + 0.5))
            ),
            12,
        ).alias("lo"),
        F.round(
            1.0
            / (
                1.0 / (F.col("a") + 0.5)
                + 1.0 / (F.col("b") + 0.5)
                + 1.0 / (F.col("c") + 0.5)
                + 1.0 / (F.col("d") + 0.5)
            ),
            12,
        ).alias("w"),
    ).localCheckpoint(eager=True)
    pool = lor.agg(
        (_fold12(F.col("w") * F.col("lo")) / _fold12(F.col("w"))).alias("plo")
    )
    chi = lor.crossJoin(F.broadcast(pool)).agg(
        _fold12(
            F.col("w")
            * (F.col("lo") - F.col("plo"))
            * (F.col("lo") - F.col("plo"))
        ).alias("x2"),
        (F.count(F.lit(1)).cast("long") - 1).alias("df"),
    )
    return (
        lor.crossJoin(F.broadcast(pool))
        .crossJoin(F.broadcast(chi))
        .select(
            F.col("st").alias("stratum"),
            (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n"),
            F.round(F.exp("lo"), 6).alias("odds_ratio"),
            F.round(F.exp("plo"), 6).alias("pooled_odds_ratio"),
            F.round("x2", 6).alias("woolf_chi2"),
            "df",
            F.when(F.col("x2") > 3.841458821, "effect_modification")
            .otherwise("homogeneous")
            .alias("verdict"),
        )
    )
