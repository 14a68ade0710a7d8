"""Round-11 property tests: the rewritten/new structures must agree
bit-for-bit with their naive reference formulations on adversarial
synthetic data (heavy ties, single-member groups, pure signals)."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_quantile_normalize_matches_naive_window(spark):
    """The round-11 two-phase value-bucketed rank + bucketed band join
    must be BIT-IDENTICAL to the naive formulation it replaced
    (row_number over (partitionBy source orderBy score, doc_id) + a
    linear array probe of the global histogram) — on data with heavy
    score ties, a single-doc source, and skewed source sizes."""
    from phoebe_spark.operators.curation import quantile_normalize

    rows = []
    did = 0
    # source a: 60 docs with only 5 distinct lengths (heavy ties)
    for i in range(60):
        rows.append((did, "a", "x" * (10 + (i % 5)))); did += 1
    # source b: 17 docs, distinct lengths interleaved with a's range
    for i in range(17):
        rows.append((did, "b", "x" * (8 + 3 * i))); did += 1
    # source c: single doc
    rows.append((did, "c", "x" * 31)); did += 1
    # source d: 2 docs with IDENTICAL length (tie broken by doc_id)
    rows.append((did, "d", "x" * 12)); did += 1
    rows.append((did, "d", "x" * 12)); did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    got = {
        r["doc_id"]: (r["score"], r["norm_score"])
        for r in quantile_normalize(df).collect()
    }

    # naive reference: the pre-round-11 shape
    d = df.select(
        "doc_id", F.col("source").alias("g"), F.length("text").cast("long").alias("score")
    )
    w = Window.partitionBy("g").orderBy("score", "doc_id")
    r = d.select(
        "doc_id", "g", "score",
        F.row_number().over(w).alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("ns"),
    )
    rows_r = r.collect()
    scores = sorted(v[0] for v in got.values())
    n_total = len(scores)
    want = {}
    for row in rows_r:
        k, ns = row["k"], row["ns"]
        if ns == 1:
            t = 1 + (2 * (n_total - 1) + 2) // 4
        else:
            t = 1 + (2 * (n_total - 1) * (k - 1) + (ns - 1)) // (2 * (ns - 1))
        want[row["doc_id"]] = (row["score"], scores[t - 1])
    assert got == want


def test_hodges_lehmann_matches_explicit_walsh_median(spark, sf_dir):
    """q449's support-collapsed Walsh median must equal the median of
    the explicitly enumerated Walsh averages (numpy-free reference:
    sorted list middle-rank average), and the HL shift likewise."""
    from phoebe_spark.queries import QUERIES

    out = QUERIES["q449_hodges_lehmann"](spark, sf_dir).collect()[0]

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long").alias("d")
    )
    days = sorted(
        (r["d"], r["y"])
        for r in o.groupBy("d").agg(F.count(F.lit(1)).alias("y")).collect()
    )
    ys = [y for _, y in days]
    walsh = sorted(
        (ys[i] + ys[j]) / 2.0 for i in range(len(ys)) for j in range(i, len(ys))
    )
    m = len(walsh)
    ref_pseudo = (walsh[(m + 1) // 2 - 1] + walsh[(m + 2) // 2 - 1]) / 2.0
    assert out["n_walsh_pairs"] == m
    assert abs(out["pseudomedian"] - ref_pseudo) < 1e-6

    dmid = (days[0][0] + days[-1][0]) // 2
    lo = [y for d, y in days if d <= dmid]
    hi = [y for d, y in days if d > dmid]
    diffs = sorted(b - a for a in lo for b in hi)
    md = len(diffs)
    ref_shift = (diffs[(md + 1) // 2 - 1] + diffs[(md + 2) // 2 - 1]) / 2.0
    assert out["n_cross_pairs"] == md
    assert abs(out["hl_shift"] - ref_shift) < 1e-6


def test_dft_periodogram_finds_planted_period(spark):
    """A pure 7-day cosine planted into a synthetic day rollup must
    make period 7 dominant with most of the normalized power — run
    through the SAME literal twiddle table and fold chain as q450."""
    from phoebe_spark.queries.q401_450 import _DFT_TAB, _DFT_PERIODS

    n_days = 210
    rows = [(d, 100 + int(round(40 * math.cos(2 * math.pi * d / 7)))) for d in range(n_days)]
    days = spark.createDataFrame(rows, "d long, y long")
    m = days.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s1"))
    tab = spark.createDataFrame(_DFT_TAB, "p INT, r INT, co DOUBLE, si DOUBLE")
    periods = F.array(*[F.lit(pp) for pp in _DFT_PERIODS])
    grid = (
        days.crossJoin(F.broadcast(m))
        .select("d", (F.col("y") - F.col("s1") / F.col("n")).alias("yc"))
        .select("d", "yc", F.explode(periods).alias("p"))
        .withColumn("r", (F.col("d") % F.col("p")).cast("int"))
        .join(F.broadcast(tab), ["p", "r"])
    )
    ab = grid.groupBy("p").agg(
        F.sum(F.col("yc") * F.col("co")).alias("a"),
        F.sum(F.col("yc") * F.col("si")).alias("b"),
    )
    pw = {r["p"]: r["a"] ** 2 + r["b"] ** 2 for r in ab.collect()}
    total = sum(pw.values())
    assert max(pw, key=pw.get) == 7
    assert pw[7] / total > 0.9


def test_wilcoxon_midranks_match_reference(spark):
    """q458's support-cumulative midrank W+ must equal a brute-force
    per-element midrank computation on tied data."""
    # differences with heavy ties: d values and signs
    ds = [3, -3, 3, 5, -5, 5, 5, 2, -2, 7]
    rows = [(i, d) for i, d in enumerate(ds)]
    nz = spark.createDataFrame(rows, "i long, d long")
    grid = nz.groupBy(F.abs("d").alias("ad")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("cpos"),
    )
    cum = grid.select(
        "ad", "c", "cpos",
        F.sum("c").over(
            Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cc"),
    )
    wplus = cum.agg(
        F.sum(
            F.col("cpos") * ((F.col("cc") - F.col("c")) + (F.col("c") + 1.0) / 2.0)
        ).alias("w")
    ).collect()[0]["w"]

    # reference: per-element midranks over |d|
    srt = sorted(range(len(ds)), key=lambda i: abs(ds[i]))
    ranks = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and abs(ds[srt[j]]) == abs(ds[srt[i]]):
            j += 1
        mid = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[srt[k]] = mid
        i = j
    ref = sum(ranks[i] for i, d in enumerate(ds) if d > 0)
    assert abs(wplus - ref) < 1e-9
