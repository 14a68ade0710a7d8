"""Behavioral tests for timeseries.anomaly and the round-3 curation ops:
each detector is checked against an independent reference implementation
(naive Python recursion / numpy / pandas), not just the DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from phoebe_spark.operators import dedup, text
from phoebe_spark.timeseries import anomaly as ts_anom

RNG = np.random.default_rng(11)


def _series_df(spark, values, key="a"):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(values)],
        "k STRING, t LONG, v DOUBLE",
    )


def test_cusum_matches_sequential_recursion(spark):
    vals = RNG.exponential(50.0, size=300)
    k, h = 60.0, 120.0
    out = (
        ts_anom.cusum(_series_df(spark, vals), "k", "t", "v", k=k, h=h)
        .orderBy("t")
        .collect()
    )
    s = 0.0
    for row, x in zip(out, vals):
        s = max(0.0, s + x - k)
        assert row.stat == pytest.approx(s, abs=1e-9)
        assert row.alarm == (s > h)


def test_cusum_distributes_across_keys(spark):
    df = _series_df(spark, [100.0, 100.0, 0.0], key="a").union(
        _series_df(spark, [0.0, 0.0, 0.0], key="b")
    )
    out = ts_anom.cusum(df, "k", "t", "v", k=10.0, h=50.0)
    stats = {(r.k, r.t): r.stat for r in out.collect()}
    # key b never accumulates; key a's drift does not leak into b
    assert stats[("b", 2)] == 0.0
    assert stats[("a", 1)] == pytest.approx(180.0)


def test_autocorr_matches_pandas(spark):
    vals = np.cumsum(RNG.normal(0, 1, size=200))  # random walk: high lag-1 ACF
    got = ts_anom.autocorr(_series_df(spark, vals), "k", "t", "v", lag=1).collect()[0]
    expected = pd.Series(vals).autocorr(lag=1)
    assert got.acf == pytest.approx(expected, abs=1e-9)
    assert got.n_pairs == 199


def test_mad_flags_matches_numpy(spark):
    vals = np.concatenate([RNG.normal(100, 5, size=500), [500.0, -300.0]])
    got = ts_anom.mad_flags(_series_df(spark, vals), "k", "v").collect()[0]
    med = round(float(np.median(vals)), 6)
    mad = round(float(np.median(np.abs(vals - np.median(vals)))), 6)
    n_expected = int(np.sum(np.abs(vals - med) > 3.0 * 1.4826 * mad))
    assert got.median == pytest.approx(med)
    assert got.mad == pytest.approx(mad)
    assert got.n_anomalies == n_expected >= 2  # the two planted outliers


def test_seasonal_naive_perfect_seasonality(spark):
    # exact period-4 signal: seasonal-naive error is 0, one-step naive is not
    vals = [1.0, 9.0, 1.0, 9.0] * 20
    got = ts_anom.seasonal_naive_ratio(
        _series_df(spark, vals), "k", "t", "v", period=4
    ).collect()[0]
    assert got.mae_seasonal == 0.0
    assert got.mae_naive == pytest.approx(8.0)
    assert got.ratio == 0.0
    assert got.n_obs == len(vals) - 4


def test_chunk_dedup_stats_counts_shared_chunks(spark):
    shared = "a b c d e f g h"  # exactly one 8-word chunk
    docs = spark.createDataFrame(
        [
            (1, shared + " x y z"),  # chunk1 shared, chunk2 unique
            (2, shared),  # chunk1 shared
            (3, "p q r s t u v w"),  # unique
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in dedup.chunk_dedup_stats(docs).collect()}
    assert out[1].n_chunks == 2 and out[1].n_dup_chunks == 1
    assert out[2].n_chunks == 1 and out[2].n_dup_chunks == 1
    assert out[3].n_dup_chunks == 0
    assert out[1].dup_ratio == pytest.approx(0.5)


def test_top_ngrams_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "a b c"), (3, "x y z")],
        "doc_id LONG, text STRING",
    )
    rows = text.top_ngrams(docs, n=3, k=3).collect()
    assert (rows[0].gram, rows[0].n) == ("x y z", 3)
    # count-1 grams tie; broken by gram ascending
    assert rows[1].n == rows[2].n == 1
    assert rows[1].gram < rows[2].gram


def test_chunk_plan_has_no_assembly_exchange(spark):
    """Chunk construction must happen inside the scan stage: the only
    exchanges in the plan belong to the count groupBy + count join, not a
    posexplode/groupBy re-assembly of chunks."""
    docs = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id LONG, text STRING")
    plan = dedup.chunk_dedup_stats(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "transform(sequence" in plan or "slice(" in plan


def test_spearman_monotone_and_ties(spark):
    from phoebe_spark.timeseries import aggregates as ts_agg

    # y = exp(x) is a nonlinear monotone map: Pearson < 1, Spearman == 1
    rows = [(i, float(i), float(np.exp(i / 10.0))) for i in range(50)]
    df = spark.createDataFrame(rows, "t LONG, x DOUBLE, y DOUBLE")
    got = ts_agg.spearman_xy(df, "x", "y", tiebreak="t").collect()[0]
    assert got.spearman == pytest.approx(1.0)
    # tie-averaged ranks: compare against pandas' spearman on tied data
    vals = [(i, float(i // 5), float((i * 7) % 13)) for i in range(40)]
    df2 = spark.createDataFrame(vals, "t LONG, x DOUBLE, y DOUBLE")
    got2 = ts_agg.spearman_xy(df2, "x", "y", tiebreak="t").collect()[0]
    pdf = pd.DataFrame(vals, columns=["t", "x", "y"])
    # rank-then-Pearson == Spearman with average ranks (no scipy needed)
    expected = pdf["x"].rank().corr(pdf["y"].rank())
    assert got2.spearman == pytest.approx(expected, abs=1e-9)


def test_theil_sen_ignores_outliers(spark):
    from phoebe_spark.timeseries import aggregates as ts_agg

    # y = 3t + noise, with 10% gross outliers that wreck OLS
    rows = []
    for i in range(100):
        v = 3.0 * i + float(RNG.normal(0, 0.1))
        if i % 10 == 5:
            v += 5000.0
        rows.append(("s", i, v))
    df = spark.createDataFrame(rows, "k STRING, t LONG, v DOUBLE")
    got = ts_agg.theil_sen(df, "k", "t", "v", max_points=200).collect()[0]
    assert got.ts_slope == pytest.approx(3.0, abs=0.1)


def test_zipf_slope_on_zipfian_corpus(spark):
    from phoebe_spark.operators import text as text_ops

    # frequencies ~ 1/rank: slope of ln(freq) vs ln(rank) should be ~ -1
    words = []
    for rank in range(1, 21):
        words += [f"w{rank:02d}"] * max(1, int(200 / rank))
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id LONG, text STRING")
    got = text_ops.zipf_slope(docs).collect()[0]
    assert got.n_terms == 20
    assert got.zipf_slope == pytest.approx(-1.0, abs=0.1)


def test_chunk_pairs_and_keep_best(spark):
    shared = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique one two three"),
            (2, shared),
            (3, "totally different words here now ok fine yes"),
            (4, shared + " other tail words four five"),
        ],
        "doc_id LONG, text STRING",
    )
    pairs = {(r.id_a, r.id_b) for r in dedup.chunk_pairs(docs).collect()}
    assert pairs == {(1, 2), (1, 4), (2, 4)}

    comp = dedup.dedup_components(
        dedup.chunk_pairs(docs), id_col_a="id_a", id_col_b="id_b"
    )
    quality = docs.withColumn("n_chars", F.length("text"))
    kept = dedup.keep_best_per_component(comp, quality).collect()
    assert len(kept) == 1
    # doc 4 has the longest text (42 chars) in the {1,2,4} cluster
    assert kept[0].kept_doc == 4 and kept[0].n_members == 3


def test_chunk_pairs_hot_chunk_cap(spark):
    shared = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(i, shared) for i in range(20)], "doc_id LONG, text STRING"
    )
    # cap below the chunk's document frequency: no pairs emitted
    assert dedup.chunk_pairs(docs, max_docs_per_chunk=10).count() == 0
    # cap above: all C(20,2) pairs
    assert dedup.chunk_pairs(docs, max_docs_per_chunk=25).count() == 190


def test_column_profile(spark):
    from phoebe_spark.operators.curation import column_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "id LONG, s STRING",
    )
    out = {r.col_name: r for r in column_profile(df, ["id", "s"]).collect()}
    assert out["id"].n_nulls == 1 and out["id"].n_distinct == 3
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["id"].n_rows == 4


def test_bm25_matches_hand_computation(spark):
    from phoebe_spark.operators import text as text_ops

    docs = [
        (1, "cat dog cat fish"),
        (2, "dog dog dog"),
        (3, "bird tree sky"),
        (4, "cat cat cat cat dog"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {r.doc_id: r.bm25 for r in text_ops.bm25_scores(df, ("cat", "dog")).collect()}

    import math

    corpus = {i: t.split() for i, t in docs}
    n, avgdl = len(corpus), round(sum(map(len, corpus.values())) / len(corpus), 6)
    dfreq = {t: sum(t in toks for toks in corpus.values()) for t in ("cat", "dog")}
    k1, b = 1.2, 0.75
    for i, toks in corpus.items():
        score = 0.0
        for t in ("cat", "dog"):
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            score += round(
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl)), 6
            )
        if score > 0:
            assert got[i] == pytest.approx(score, abs=2e-6), i
        else:
            assert i not in got
    assert 3 not in got  # no query terms -> absent


def test_rrf_fusion_ranks_and_scores(spark):
    from phoebe_spark.operators import similarity as sim

    # query = vec 0; vec 1 identical direction (cos rank 1), vec 3 closest L2
    rows = [
        (0, [1.0, 0.0]),
        (1, [10.0, 0.0]),
        (2, [0.0, 5.0]),
        (3, [1.1, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {r.vec_id: r for r in sim.rrf_fusion(df, query_id=0, top_k=3).collect()}
    assert out[3].r_l2 == 1  # nearest in euclidean terms
    assert out[1].r_cos <= 2 and out[3].r_cos <= 2  # colinear-ish vectors lead
    for r in out.values():
        assert r.rrf == pytest.approx(
            round(1 / (60 + r.r_cos) + 1 / (60 + r.r_l2), 6), abs=1e-9
        )


def test_triangle_count_known_graph(spark):
    from pyspark.sql import functions as SF

    # triangle {1,2,3} + pendant edge 3-4: exactly one triangle
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id_a LONG, id_b LONG"
    )
    p1 = pairs.select(SF.col("id_a").alias("a"), SF.col("id_b").alias("b"))
    p2 = pairs.select(SF.col("id_a").alias("b"), SF.col("id_b").alias("c"))
    p3 = pairs.select(SF.col("id_a").alias("a"), SF.col("id_b").alias("c"))
    n = p1.join(p2, "b").join(p3, ["a", "c"]).count()
    assert n == 1


def test_edit_distance_verify(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text with other words in it"),
        ],
        "doc_id LONG, text STRING",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a LONG, id_b LONG")
    out = {(r.id_a, r.id_b): r for r in dedup.edit_distance_verify(docs, pairs, min_sim=0.6).collect()}
    assert (1, 2) in out and (1, 3) not in out
    assert out[(1, 2)].lev == 3  # dog -> cat
    assert out[(1, 2)].sim == pytest.approx(1 - 3 / 43, abs=1e-6)


def test_token_entropy_extremes(spark):
    from phoebe_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d")], "doc_id LONG, text STRING"
    )
    out = {r.doc_id: r for r in text_ops.token_entropy(docs).collect()}
    assert out[1].token_entropy == 0.0  # degenerate distribution
    assert out[2].token_entropy == pytest.approx(np.log(4), abs=1e-5)
    assert out[2].n_distinct == 4 and out[2].n_tokens == 4


def test_source_kl_identical_sources_zero(spark):
    from phoebe_spark.operators import text as text_ops

    # both sources have the SAME distribution as the corpus -> KL == 0
    docs = spark.createDataFrame(
        [(1, "x y", "s1"), (2, "x y", "s2")],
        "doc_id LONG, text STRING, source STRING",
    )
    out = {r.source: r.kl_vs_corpus for r in text_ops.source_kl(docs).collect()}
    assert out == {"s1": 0.0, "s2": 0.0}
    # skewed source diverges
    docs2 = spark.createDataFrame(
        [(1, "x x x x", "s1"), (2, "y y y y", "s2")],
        "doc_id LONG, text STRING, source STRING",
    )
    out2 = {r.source: r.kl_vs_corpus for r in text_ops.source_kl(docs2).collect()}
    assert out2["s1"] == pytest.approx(np.log(2), abs=1e-5)


def test_weighted_sample_favors_heavy_weights(spark):
    from phoebe_spark.operators.sampling import weighted_sample

    # 10 heavy docs (w=1000) vs 200 light docs (w=1): across many salts,
    # heavy docs should dominate the k=5 sample
    rows = [(i, 1000) for i in range(10)] + [(i, 1) for i in range(10, 210)]
    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    heavy_hits = 0
    for salt in ("s1", "s2", "s3", "s4"):
        got = weighted_sample(df, "w", k=5, salt=salt).collect()
        assert len(got) == 5
        heavy_hits += sum(1 for r in got if r.doc_id < 10)
    assert heavy_hits >= 16  # >= 80% heavy across 20 draws

    # determinism: same salt twice -> identical sample
    a = [r.doc_id for r in weighted_sample(df, "w", k=5, salt="s1").collect()]
    b = [r.doc_id for r in weighted_sample(df, "w", k=5, salt="s1").collect()]
    assert a == b


def test_retention_cohort_shape(spark, sf_dir):
    from phoebe_spark.queries import QUERIES

    rows = QUERIES["q95_retention_cohorts"](spark, sf_dir).collect()
    assert all(r.day_offset >= 0 for r in rows)
    # day-0 cells exist and no cell exceeds the user population
    assert any(r.day_offset == 0 for r in rows)
    assert max(r.n_users for r in rows) <= 150


def test_layout_invariance_of_new_operators(spark):
    """weighted_sample and theil_sen advertise partition-layout
    determinism: identical results after an adversarial repartition."""
    from phoebe_spark.operators.sampling import weighted_sample
    from phoebe_spark.timeseries import aggregates as ts_agg

    rows = [(i, (i * 13) % 97 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    a = sorted(r.doc_id for r in weighted_sample(df, "w", k=10).collect())
    b = sorted(
        r.doc_id for r in weighted_sample(df.repartition(7, "w"), "w", k=10).collect()
    )
    assert a == b

    ts_rows = [("s", i, float((i * 7) % 31)) for i in range(400)]
    tdf = spark.createDataFrame(ts_rows, "k STRING, t LONG, v DOUBLE")
    s1 = ts_agg.theil_sen(tdf, "k", "t", "v", max_points=80).collect()[0]
    s2 = ts_agg.theil_sen(tdf.repartition(11), "k", "t", "v", max_points=80).collect()[0]
    assert s1.ts_slope == s2.ts_slope and s1.n_pairs == s2.n_pairs


def test_attribution_window_semantics(spark, tmp_path):
    """Purchases attribute to a preceding same-user click within 1h only;
    later clicks and other users' clicks never attribute."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # user 1: click at t=100, purchase at t=200 (attributed)
        (1, 100, 1, "click"), (2, 200, 1, "purchase"),
        # user 1: purchase at t=5000 (click 4900s earlier -> too old)
        (3, 5000, 1, "purchase"),
        # user 2: purchase BEFORE their click -> organic
        (4, 150, 2, "purchase"), (5, 160, 2, "click"),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 10**9 for r in rows], pa.int64()),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    d = tmp_path / "attr" 
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    from phoebe_spark.queries import QUERIES

    out = QUERIES["q103_attribution"](spark, str(d)).collect()
    assert sum(r.n_purchases for r in out) == 3
    assert sum(r.n_attributed for r in out) == 1
