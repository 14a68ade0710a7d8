"""Property tests for operators/graph.py: conservation/clamping invariants
that hold on ANY graph, checked on a seeded synthetic one."""

from __future__ import annotations

from pyspark.sql import functions as F

from phoebe_spark.operators import graph


def _synthetic_canon(spark, n_nodes=300, deg=5):
    return (
        spark.range(n_nodes * deg)
        .select(
            (F.col("id") % n_nodes).alias("s1"),
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("s2"),
        )
        .filter(F.col("s1") < F.col("s2"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def test_pagerank_mass_conservation(spark):
    canon = _synthetic_canon(spark)
    edges = graph.symmetrize(canon)
    n = edges.select("src").distinct().count()
    ranks = graph.pagerank(edges, iters=5)
    total = ranks.agg(F.sum("r")).head()[0]
    # symmetrized graph has no dangling mass: ranks stay a distribution
    assert abs(total - 1.0) < 1e-9
    assert ranks.count() == n
    mn = ranks.agg(F.min("r")).head()[0]
    assert mn >= 0.15 / n - 1e-12  # the teleport floor


def test_pagerank_star_center_dominates(spark):
    # a star graph: the hub must out-rank every leaf
    canon = spark.range(1, 21).select(
        F.lit(0).alias("s1"), F.col("id").alias("s2")
    )
    ranks = graph.pagerank(graph.symmetrize(canon), iters=10)
    rows = {r["node"]: r["r"] for r in ranks.collect()}
    hub = rows.pop(0)
    assert all(hub > v for v in rows.values())


def test_label_propagation_seeds_clamped_and_conserved(spark):
    canon = _synthetic_canon(spark)
    edges = graph.symmetrize(canon).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    seeds = nodes.filter(F.col("node") % 7 == 0).select(
        "node", F.pmod("node", F.lit(3)).cast("string").alias("slabel")
    )
    lab = graph.label_propagation(edges, seeds, rounds=3)
    # seeds never change
    j = lab.join(seeds, "node")
    assert j.filter(F.col("label") != F.col("slabel")).count() == 0
    # labels only ever come from the seed alphabet (or stay null)
    seen = {r["label"] for r in lab.select("label").distinct().collect()}
    assert seen - {None} <= {"0", "1", "2"}
    # propagation actually reaches beyond the seeds
    n_seeds = seeds.count()
    assert lab.filter(F.col("label").isNotNull()).count() > n_seeds


def test_triangle_counts_complete_graph(spark):
    # K5: every node participates in C(4,2)=6 triangles
    rows = [(a, b) for a in range(5) for b in range(5) if a < b]
    canon = spark.createDataFrame(rows, "s1 long, s2 long")
    tri = {r["part"]: r["n_triangles"] for r in graph.triangle_counts(canon).collect()}
    assert tri == {i: 6 for i in range(5)}


def test_rag_chunks_cover_and_overlap(spark):
    """Chunk invariants on adversarial token counts (0, 1, W-1, W, W+1,
    W+S, long): every token covered, consecutive chunks overlap by
    exactly W-S tokens, de-overlapped concat reproduces the document."""
    from phoebe_spark.queries import QUERIES
    import tempfile, shutil, os

    W, S = 32, 24
    rows = []
    did = 0
    for n in (1, 5, W - 1, W, W + 1, W + S, 3 * W):
        rows.append((did, " ".join(f"t{did}_{i}" for i in range(n)), "en", "s", n))
        did += 1
    work = tempfile.mkdtemp(prefix="ragchunks_")
    try:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{work}/documents.parquet")
        # reuse the real tables for the loader's other reads? q235 only
        # reads documents, so the synthetic dir suffices
        out = QUERIES["q235_rag_chunks"](spark, work).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for did2, text, *_ in rows:
            toks = text.split()
            chunks = sorted(by_doc[did2], key=lambda r: r["chunk_id"])
            n = len(toks)
            exp_chunks = 1 if n <= W else 1 + -(-(n - W) // S)
            assert len(chunks) == exp_chunks, (did2, n)
            rebuilt = chunks[0]["chunk_text"].split()
            for c in chunks[1:]:
                ct = c["chunk_text"].split()
                # overlap with the previous chunk is exactly W-S tokens
                # (except a short final chunk, which still starts at i*S)
                rebuilt.extend(ct[max(0, len(rebuilt) - c["chunk_id"] * S):])
            assert rebuilt == toks, (did2, n)
            for c in chunks:
                assert c["n_tok_chunk"] == len(c["chunk_text"].split())
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_snake_sharding_beats_modulo(spark):
    """On a skewed length distribution, snake dealing's worst-shard
    imbalance must not exceed the naive modulo deal's (the property that
    justifies the sort)."""
    from pyspark.sql import functions as F

    from phoebe_spark.operators.layout import global_rank_by_value

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(100)) ** 2).cast("long").alias("n_tok"),
    )
    ranked = global_rank_by_value(docs, "n_tok", "doc_id").select(
        "n_tok", (F.col("r") - 1).alias("r")
    )
    def imbalance(assigned):
        sums = [r["s"] for r in assigned.groupBy("shard").agg(F.sum("n_tok").alias("s")).collect()]
        return (max(sums) - min(sums)) / max(sums)

    snake = ranked.select(
        "n_tok",
        F.when(F.expr("r div 8") % 2 == 0, F.col("r") % 8)
        .otherwise(7 - F.col("r") % 8)
        .alias("shard"),
    )
    modulo = docs.select("n_tok", (F.col("doc_id") % 8).alias("shard"))
    assert imbalance(snake) <= imbalance(modulo)
    assert imbalance(snake) < 0.02  # near-ideal on 1000 docs


def test_global_rank_hypothesis_buckets(spark):
    """Hypothesis: for random value lists (heavy duplicates included) and
    a monotone coarsening, the two-phase rank equals the naive global
    row_number — including the bucketed continuous path."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from phoebe_spark.operators.layout import global_rank_by_value

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=60
        ),
        desc=st.booleans(),
    )
    def check(vals, desc):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "doc_id long, v double"
        )
        fast = global_rank_by_value(
            df, "v", "doc_id", descending=desc, bucket=F.floor(F.col("v"))
        )
        order = F.col("v").desc() if desc else F.col("v").asc()
        naive = df.withColumn("rn", F.row_number().over(W.orderBy(order, F.col("doc_id"))))
        j = fast.join(naive, "doc_id")
        assert j.filter(F.col("r") != F.col("rn")).count() == 0

    check()


def test_dtw_lower_bounded_by_warping(spark):
    """Banded DTW can only REDUCE cost vs the diagonal path, which is
    exactly squared Euclidean — so DTW <= Euclidean for every candidate
    (the property that makes the q268 PAA bound reusable for DTW)."""
    import duckdb

    from phoebe_spark.queries import ORACLE

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    )
    dtw = dict(
        con.execute(
            f"SELECT user_id, dtw FROM ({ORACLE['q271_dtw_topk']})"
        ).fetchall()
    )
    eucl = dict(
        con.execute(
            f"SELECT user_id, zdist FROM ({ORACLE['q267_ts_similarity_search']})"
        ).fetchall()
    )
    shared = set(dtw) & set(eucl)
    assert shared  # the two top-10s overlap at this SF
    for u in shared:
        assert dtw[u] <= eucl[u] + 1e-6, u
    # warping must actually help somewhere (strict inequality exists)
    assert any(dtw[u] < eucl[u] - 1e-6 for u in shared)


def test_eigencentrality_rejects_zero_iters(spark):
    import pytest

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    with pytest.raises(ValueError, match="iters >= 1"):
        graph.eigencentrality(edges, iters=0)
