"""Distributed graph analytics as iterative DataFrame plans.

Reference parity note: the reference (dos-group/phoebe) has no graph
operators — these are §2.11 extension operators for the training-data
pipeline (dedup-cluster analysis, co-occurrence structure, semi-supervised
label spread), built on the same iterative-join recipe as
``dedup.dedup_components`` (min-label propagation).

Scale contract shared by every loop here: one equi-join + one grouped
aggregate per round, always shuffled on the node id; `localCheckpoint`
per round truncates lineage so plans stay round-count-independent and a
task retry never recomputes the whole chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def symmetrize(canon_edges: DataFrame, src: str = "s1", dst: str = "s2") -> DataFrame:
    """Canonical (a<b) undirected edge list -> both-direction directed list
    with columns (src, dst)."""
    return canon_edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).unionAll(canon_edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list where every node has >=1
    out-edge (true for symmetrized graphs — no dangling-mass term).
    Returns (node, r). Uniform start; out-degree weights are precomputed
    once so each iteration is exactly one join + one groupBy.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    wedges = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .localCheckpoint(eager=True)
    )
    n_nodes = float(deg.count())
    ranks = wedges.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("r")
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        ranks = (
            wedges.join(ranks, wedges.src == ranks.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg((F.lit(base) + F.lit(damping) * F.sum(F.col("w") * F.col("r"))).alias("r2"))
            .select(F.col("node2").alias("node"), F.col("r2").alias("r"))
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_counts(
    canon_edges: DataFrame, src: str = "s1", dst: str = "s2"
) -> DataFrame:
    """Per-node triangle participation from a CANONICAL (a<b) undirected
    edge list via oriented enumeration (a<b<c: each triangle generated
    once, no /6 correction). Returns (part, n_triangles). The 3 vertices
    are emitted by ONE explode over the join output — a union of selects
    would re-execute both joins per branch.
    """
    co = canon_edges.select(F.col(src).alias("s1"), F.col(dst).alias("s2"))
    e1 = co.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
    e2 = co.select(F.col("s1").alias("b"), F.col("s2").alias("c"))
    e3 = co.select(F.col("s1").alias("a"), F.col("s2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
    return nodes.groupBy("part").agg(F.count(F.lit(1)).alias("n_triangles"))


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "slabel",
) -> DataFrame:
    """Synchronous clamped-seed label propagation: each round every node
    takes the majority label of its labeled in-neighbors (count desc,
    label asc tie-break); seeds never change; a node with no labeled
    neighbor carries its previous label. Returns (node, label) with label
    possibly null for unreached nodes.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    sds = seeds.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("slabel")
    ).localCheckpoint(eager=True)
    lab = nodes.join(sds, "node", "left").select(
        "node", F.col("slabel").alias("label")
    )
    for _ in range(rounds):
        votes = (
            e.join(
                lab.filter(F.col("label").isNotNull()).withColumnRenamed("node", "src"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        maj = (
            votes.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("node").orderBy(F.col("c").desc(), "label")
                ),
            )
            .filter(F.col("rk") == 1)
            .select("node", F.col("label").alias("mlabel"))
        )
        lab = (
            nodes.join(sds, "node", "left")
            .join(maj, "node", "left")
            .join(lab.withColumnRenamed("label", "plabel"), "node", "left")
            .select("node", F.coalesce("slabel", "mlabel", "plabel").alias("label"))
            .localCheckpoint(eager=True)
        )
    return lab


def kcore_peel(
    edges: DataFrame, k: int = 3, rounds: int = 8
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bounded-round k-core peeling over a SYMMETRIZED edge list: each
    round keeps nodes whose degree within the current alive set is >= k.
    Returns (alive_prev, alive, deg_final): the alive sets after
    rounds-1 and rounds (for a convergence certificate) and the final
    within-core degree per surviving node. The fixpoint form just runs
    until alive stops shrinking; the bounded form exists so a generated
    SQL chain can certify every round (the q232 PageRank treatment).

    Each round is two equi-joins + one grouped count shuffled on the node
    id, checkpointed so the plan stays round-count-independent.
    """
    alive = edges.select(F.col("src").alias("n")).distinct().localCheckpoint(eager=True)
    prev = alive
    for _ in range(rounds):
        prev = alive
        deg = (
            edges.join(alive.withColumnRenamed("n", "src"), "src")
            .join(alive.withColumnRenamed("n", "dst"), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        alive = (
            deg.filter(F.col("deg") >= k)
            .select(F.col("src").alias("n"))
            .localCheckpoint(eager=True)
        )
    deg_final = (
        edges.join(alive.withColumnRenamed("n", "src"), "src")
        .join(alive.withColumnRenamed("n", "dst"), "dst")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return prev, alive, deg_final


def eigencentrality(edges: DataFrame, iters: int = 5) -> DataFrame:
    """Eigenvector centrality by power iteration over a SYMMETRIZED edge
    list (Bonacich 1987): v_{k+1} = A v_k / ||A v_k||_2 from a uniform
    start. On an undirected graph this is also what HITS degenerates to
    (hub == authority), so it completes the centrality pair with PageRank
    (:func:`pagerank` measures random-walk mass; this measures the
    principal adjacency direction). Returns (node, score, lambda_est)
    where lambda_est is ||A v|| at the last round — the Rayleigh-quotient
    eigenvalue estimate under a normalized input.

    Determinism contract (the digit-for-digit oracle policy): every
    float SUM is a DECIMAL(32,8) sum of per-edge contributions rounded
    to 8 dp (8 keeps x*1e8 inside the 2^53 exact-integer range for every
    magnitude this graph can produce, so round() agrees across engines)
    — order-independent across partitionings and engines; the
    only float ops are division by the norm and sqrt, which are IEEE
    correctly-rounded on identical inputs. Each round is one edge join +
    one grouped decimal sum shuffled on the node id, localCheckpointed so
    the plan is round-count-independent.
    """
    if iters < 1:
        raise ValueError(f"eigencentrality needs iters >= 1, got {iters}")
    nodes = edges.select(F.col("src").alias("n")).distinct()
    n_nodes = nodes.count()
    v = nodes.select(
        "n", F.round(F.lit(1.0) / F.sqrt(F.lit(float(n_nodes))), 8).alias("v")
    ).localCheckpoint(eager=True)
    lam = None
    for _ in range(iters):
        raw = (
            edges.join(v.withColumnRenamed("n", "dst"), "dst")
            .groupBy(F.col("src").alias("n"))
            .agg(
                F.sum(F.round(F.col("v"), 8).cast("decimal(32,8)"))
                .cast("double")
                .alias("raw")
            )
        )
        nrm = raw.agg(
            F.sqrt(
                F.sum(F.round(F.col("raw") * F.col("raw"), 8).cast("decimal(32,8)")).cast(
                    "double"
                )
            ).alias("nrm")
        )
        lam = nrm
        v = (
            raw.crossJoin(F.broadcast(nrm))
            .select("n", F.round(F.col("raw") / F.col("nrm"), 8).alias("v"))
            .localCheckpoint(eager=True)
        )
    return v.crossJoin(F.broadcast(lam)).select(
        "n", F.col("v").alias("score"), F.col("nrm").alias("lambda_est")
    )
