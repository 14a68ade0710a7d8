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
