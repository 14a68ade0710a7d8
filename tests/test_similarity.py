"""Similarity-search tests: IVF and LSH approximate paths measured for
recall against the exact brute-force baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from phoebe_spark.operators.similarity import (
    all_pairs_cosine,
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_pairs,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.limit(10)
    exact = _topk_sets(brute_force_topk(emb, queries, k=10).collect())
    approx = _topk_sets(ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=4).collect())
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    assert np.mean(recalls) >= 0.6, f"IVF mean recall {np.mean(recalls):.2f} too low"
    # probing all cells must recover exact results
    full = _topk_sets(ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=8).collect())
    assert all(full[q] == exact[q] for q in exact)


def test_lsh_pairs_subset_of_exact(spark, emb):
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, 64)).tolist()
    lsh = lsh_bucketed_pairs(emb, planes, threshold=0.95)
    got = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    # every LSH pair must genuinely clear the threshold (no false accepts:
    # exact cosine is computed inside the bucket)
    from phoebe_spark.operators.similarity import cosine

    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.95)
        .collect()
    }
    assert got <= exact
    if exact:
        recall = len(got) / len(exact)
        assert recall >= 0.5, f"LSH recall {recall:.2f} too low for near-dups"


def test_all_pairs_cosine_exact_and_distributed(spark, emb):
    """The 2D-blocked all-pairs operator must be exact (match the naive
    cross-join at the same threshold, duplicate-free) and distributed —
    a cogrouped GEMM in the physical plan, no driver-side collect."""
    from phoebe_spark.operators.similarity import cosine

    got = {
        (r["id_a"], r["id_b"]): round(r["cos_sim"], 6)
        for r in all_pairs_cosine(emb, threshold=0.45, n_blocks=4).collect()
    }
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"]): round(r["c"], 6)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("c", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("c") >= 0.45)
        .collect()
    }
    assert got == exact
    plan = all_pairs_cosine(emb, threshold=0.45)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_label_centroids_match_numpy(spark):
    import numpy as np
    from phoebe_spark.operators.similarity import label_centroids

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(4)], int(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {(r["label"], r["dim"]): r["centroid"] for r in label_centroids(df).collect()}
    X = np.array([np.array(v, dtype=np.float32) for _, v, _ in rows], dtype=np.float64)
    lab = np.array([l for _, _, l in rows])
    for l in range(3):
        want = X[lab == l].mean(axis=0)
        for d in range(4):
            assert got[(l, d + 1)] == pytest.approx(want[d], rel=1e-9)
    assert len(got) == 12


def test_quantize_embeddings_roundtrip_bound(spark):
    import numpy as np
    from phoebe_spark.operators.similarity import quantize_embeddings

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(50)]
    rows.append((99, [0.0] * 16))  # all-zero vector: scale 0, zero codes
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[99]["scale"] == 0.0 and set(out[99]["qvec"]) == {0}
    for vid, vec in rows[:-1]:
        r = out[vid]
        v = np.array(vec, dtype=np.float32).astype(np.float64)
        assert r["scale"] == pytest.approx(np.abs(v).max() / 127, rel=1e-9)
        deq = np.array(r["qvec"], dtype=np.float64) * r["scale"]
        assert np.abs(deq - v).max() <= r["scale"] / 2 + 1e-12
        assert max(abs(c) for c in r["qvec"]) <= 127


def test_pq_adc_lossless_on_codeword_grid(spark):
    """PQ/ADC invariant: when every corpus vector lies exactly on the
    codeword grid (each subvector IS a codeword), encoding is lossless, so
    the asymmetric-distance score equals the exact dot product and the
    top-k equals exact-dot brute force. This certifies encode argmin, LUT
    lookup, and the score sum independently of data clusterability (on
    structureless random vectors recall is legitimately poor — PQ assumes
    cluster structure; the q149 oracle certifies mechanics digit-for-digit)."""
    from phoebe_spark.operators.similarity import pq_topk

    rng = np.random.RandomState(11)
    M, K, ds = 2, 4, 4
    codebooks = [[list(map(float, rng.randn(ds) * (m + 1))) for _ in range(K)] for m in range(M)]
    # corpus = all K^M codeword combinations
    vecs = []
    for a in range(K):
        for b in range(K):
            vecs.append(codebooks[0][a] + codebooks[1][b])
    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    queries = spark.createDataFrame(
        [(100 + i, list(map(float, rng.randn(M * ds)))) for i in range(3)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = pq_topk(corpus, queries, codebooks, k=4).collect()

    X = np.array(vecs)
    qrows = {r["vec_id"]: np.array(r["embedding"]) for r in queries.collect()}
    for qid, q in qrows.items():
        got = sorted(
            [(r["rank"], r["neighbor_id"], r["adc_dot"]) for r in out if r["query_id"] == qid]
        )
        dots = X @ q
        order = np.lexsort((np.arange(len(X)), -dots))[:4]
        for (rk, nb, adc), want_nb in zip(got, order):
            assert nb == want_nb, (qid, rk, nb, want_nb)
            assert adc == pytest.approx(dots[want_nb], rel=1e-9)


def test_all_pairs_cosine_size_guard(spark, emb):
    """Exact all-pairs is quadratic by contract: the max_rows guard must
    refuse oversized inputs with a pointer to the candidate-generator
    path, and max_rows=None must restore the diagnostic override."""
    with pytest.raises(ValueError, match="lsh_bucketed_pairs"):
        all_pairs_cosine(emb, threshold=0.45, max_rows=10)
    # under the threshold (and the None override) the operator still plans
    assert all_pairs_cosine(emb.limit(5), threshold=0.45, max_rows=10).count() >= 0
    df = all_pairs_cosine(emb.limit(5), threshold=0.45, max_rows=None)
    assert df.count() >= 0


def test_pq_topk_validates_codebooks_and_dims(spark):
    from pyspark.sql.utils import PythonException

    from phoebe_spark.operators.similarity import pq_topk

    corpus = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    good = [[[1.0, 0.0], [0.0, 1.0]], [[1.0, 1.0], [2.0, 2.0]]]
    # ragged codeword dim
    bad_dim = [[[1.0, 0.0], [0.0]], [[1.0, 1.0], [2.0, 2.0]]]
    with pytest.raises(ValueError, match="d_sub"):
        pq_topk(corpus, corpus, bad_dim)
    # mismatched K across subspaces
    bad_k = [[[1.0, 0.0]], [[1.0, 1.0], [2.0, 2.0]]]
    with pytest.raises(ValueError, match="share K"):
        pq_topk(corpus, corpus, bad_k)
    # runtime: corpus vector whose dim != M*d_sub raises instead of
    # silently null-padding the ADC score
    short = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(Exception, match="pq_topk: vector dim"):
        pq_topk(short, corpus, good, k=1).collect()
    with pytest.raises(Exception, match="pq_topk: query dim"):
        pq_topk(corpus, short, good, k=1).collect()
    # happy path still returns exact ADC on the grid
    assert pq_topk(corpus, corpus, good, k=1).count() == 1


def test_pq_codes_use_narrow_integer_type(spark):
    """K<=128 codebooks must encode to TINYINT codes (the 64x memory claim
    at d=64/M=4) — checked on the encode subplan's schema."""
    from phoebe_spark.operators.similarity import pq_topk

    corpus = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    good = [[[1.0, 0.0], [0.0, 1.0]], [[1.0, 1.0], [2.0, 2.0]]]
    plan = pq_topk(corpus, corpus, good, k=1)._jdf.queryExecution().analyzed().toString()
    assert "tinyint" in plan.lower()


def test_lsh_salted_hot_bucket_matches_unsalted(spark, emb):
    """Skew guard: an empty plane list drops every vector into bucket 0
    (the worst-case hot bucket); a tiny target forces the per-bucket 2D
    block-pair schedule. The salted pair set must equal the single-group
    path's exactly — the salt changes the task layout, never the answer."""
    unsalted = lsh_bucketed_pairs(emb, planes=[], threshold=0.4, target_bucket_rows=None)
    salted = lsh_bucketed_pairs(emb, planes=[], threshold=0.4, target_bucket_rows=64)
    u = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in unsalted.collect()}
    s = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in salted.collect()}
    assert set(u) == set(s) and len(u) > 0
    for k in u:
        assert s[k] == pytest.approx(u[k], abs=1e-12)


def test_lsh_salted_mixed_hot_and_cold_buckets(spark, emb):
    """One plane -> two buckets; a target between the two bucket sizes
    makes exactly one of them hot, so the salted schedule must carry
    cold buckets through its degenerate single-block case unchanged."""
    rng = np.random.default_rng(3)
    planes = [rng.standard_normal(64).tolist()]
    unsalted = lsh_bucketed_pairs(emb, planes, threshold=0.4, target_bucket_rows=None)
    u = {(r["id_a"], r["id_b"]) for r in unsalted.collect()}
    # pick a target that splits the larger bucket but not the smaller one
    from phoebe_spark.operators.similarity import random_hyperplane_buckets

    counts = sorted(
        r["c"]
        for r in random_hyperplane_buckets(emb, planes)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    assert len(counts) == 2
    target = (counts[0] + counts[1]) // 2
    assert counts[0] <= target < counts[1], "data must split hot/cold for this test"
    salted = lsh_bucketed_pairs(emb, planes, threshold=0.4, target_bucket_rows=target)
    assert {(r["id_a"], r["id_b"]) for r in salted.collect()} == u
