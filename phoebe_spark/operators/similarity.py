"""Similarity search over an embedding column (``array<float>``).

- cosine / dot product as JVM higher-order functions (``zip_with`` +
  ``aggregate``) — no Python in the scan path.
- brute_force_topk : exact top-k against a broadcast query set. The big
  side streams; the query side is broadcast — no shuffle of the corpus.
- lsh_bucketed_topk: random-hyperplane LSH pre-filter, then exact cosine
  within buckets — the 100 TB scale path (corpus shuffled once by bucket,
  candidates only within matching buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from phoebe_spark.functions.numeric import (
    lit_double_array,
    lit_double_matrix,
    lit_long_matrix,
)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_to_query(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine similarity of every row to one literal query vector. The
    query is a literal array — constant-folded, corpus scanned once."""
    q = lit_double_array(query_vec)
    return df.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query: broadcast the (small) query
    set, cross-join-free scan of the corpus, per-query window top-k. The
    corpus never shuffles on data — only the (query_id, k) results do."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = corpus.join(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col("q_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def random_hyperplane_buckets(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-dot-product LSH bucket id per vector from a fixed list of
    hyperplanes (generated driver-side from a seeded RNG). ~Uniform bucket
    key -> skew-free shuffle; bucket count = 2^len(planes)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        pv = lit_double_array(p)
        bucket = bucket + F.when(dot(F.col(vec_col), pv) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def all_pairs_cosine(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    target_block_rows: int = 4096,
    max_rows: int | None = 1_000_000,
) -> DataFrame:
    """All-pairs cosine similarity above a threshold via 2D-blocked GEMM,
    fully distributed — the corpus is never collected to the driver.

    EXACT and therefore quadratic by contract: pair work is n^2/2 dot
    products no matter how evenly it's sharded. ``max_rows`` (default 1M,
    ~5e11 dot products — hours on a large fleet, a wall beyond it) refuses
    larger inputs with a pointer to the candidate-generate-then-verify
    path: :func:`lsh_bucketed_pairs` / ``dedup.minhash_lsh_pairs`` to
    produce candidates, then exact cosine on candidates only. Pass
    ``max_rows=None`` to override for a deliberately-sized diagnostic.

    Each vector hashes into one of ``n_blocks`` blocks; every unordered
    block pair (bi <= bj) becomes one cogroup task that computes
    ``A @ B.T`` with numpy (BLAS) over the two blocks and emits only pairs
    clearing the threshold, normalized to ``id_a < id_b``. An unordered
    vector pair lands in exactly one block pair, so the output is exact
    and duplicate-free.

    Scale shape: each row is shuffled to ~``n_blocks`` tasks (classic 2D
    all-pairs schedule, O(n * sqrt(tasks)) communication) instead of the
    whole corpus landing on the driver; per-task memory is two blocks of
    ~n/n_blocks vectors. Grow ``n_blocks`` with the corpus so a block pair
    fits an executor — compute stays the unavoidable exact O(n^2) GEMM,
    evenly sharded. Per-element JVM higher-order dot products evaluate
    interpreted and are ~40x slower at 5k vectors; for approximate
    near-dup at extreme scale prefer :func:`lsh_bucketed_pairs`.

    The block-pair replication is a literal jump table (array-of-arrays
    indexed by the row's block, exploded) — pure codegen in the scan
    projection. The earlier broadcast-join against a block-pair table did
    the same thing ~2x slower: two BroadcastExchanges + join overhead
    dominated at small scale and bought nothing at large scale.
    """
    spark = df.sparkSession
    n_guard: int | None = None
    if max_rows is not None:
        n_guard = df.count()
        if n_guard > max_rows:
            raise ValueError(
                f"all_pairs_cosine is exact all-pairs (quadratic): {n_guard} rows "
                f"exceeds max_rows={max_rows} (~{n_guard * n_guard / 2:.1e} dot "
                "products). Generate candidates with lsh_bucketed_pairs or "
                "dedup.minhash_lsh_pairs and verify exact cosine on candidates "
                "only, or pass max_rows=None for a deliberately-sized diagnostic."
            )
    if n_blocks is None:
        # two constraints: blocks small enough to bound per-task memory
        # (~target_block_rows vectors per block; replication ~n_blocks
        # copies per row grows only with sqrt of total pair work), AND
        # enough block pairs (nb*(nb+1)/2) to saturate the cluster -
        # ~2 tasks per core via nb ~= 2*sqrt(parallelism). Tiny corpora
        # cap at 64-row blocks so tasks aren't pure overhead. count() is
        # a cheap metadata-mostly job on columnar sources.
        n = n_guard if n_guard is not None else df.count()
        par = spark.sparkContext.defaultParallelism
        nb_mem = -(-n // target_block_rows)
        # parallelism wants ~2 tasks/core (nb*(nb+1)/2 pairs), but never
        # shatter a small corpus into sub-512-row blocks: task overhead
        # (python worker dispatch + arrow) then dwarfs the BLAS work.
        nb_par = min(2 * int(par**0.5) + 1, -(-n // 512))
        n_blocks = max(1, min(64, max(nb_mem, nb_par)))

    # pair id = bi * n_blocks + bj (bi <= bj). A row in block b serves as
    # the LEFT operand of pairs (b, bj >= b) and the RIGHT operand of
    # pairs (bi <= b, b); both lists are compile-time literals per block.
    left_pairs = [[b * n_blocks + bj for bj in range(b, n_blocks)] for b in range(n_blocks)]
    right_pairs = [[bi * n_blocks + b for bi in range(0, b + 1)] for b in range(n_blocks)]
    lmap = lit_long_matrix(left_pairs)
    rmap = lit_long_matrix(right_pairs)

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")

    def _side(pmap):
        # each side gets its OWN select chain (fresh expression ids): a
        # shared subplan would give both cogroup children identical
        # attribute ids, and the optimizer's dedup-then-prune pass then
        # strips the right child down to just the grouping key
        # (pandas UDF sees only ['pair'] on that side).
        b = df.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), blk.alias("_blk")
        )
        return b.select(
            F.explode(F.element_at(pmap, F.col("_blk") + 1)).alias("pair"),
            "_id", "_vec", "_blk",
        )

    left = _side(lmap)
    right = _side(rmap)

    # id dtype follows the input column (string doc ids work too, matching
    # the dedup operators) — only the vector math is forced to float64
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cos_sim DOUBLE"

    def _gemm(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        return _pairwise_gemm(lpdf, rpdf, threshold)

    return (
        left.groupBy("pair")
        .cogroup(right.groupBy("pair"))
        .applyInPandas(_gemm, out_schema)
    )


def _pairwise_gemm(lpdf: pd.DataFrame, rpdf: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Score one block pair: normalized float64 GEMM over the two sides'
    (_id, _vec, _blk) frames, emit pairs clearing the threshold oriented
    id_a < id_b. On a diagonal block pair (same _blk) both GEMM triangles
    are present and one is kept; off-diagonal pairs appear once."""
    empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
    if len(lpdf) == 0 or len(rpdf) == 0:
        return empty
    a_ids = lpdf["_id"].to_numpy()
    b_ids = rpdf["_id"].to_numpy()
    # Arrow hands array<float> cells over as ndarrays: stack, don't
    # per-row list() (pure-Python, ~10x slower on wide blocks)
    A = np.stack(lpdf["_vec"].to_numpy()).astype(np.float64, copy=False)
    B = np.stack(rpdf["_vec"].to_numpy()).astype(np.float64, copy=False)
    A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
    B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
    sims = A @ B.T
    ii, jj = np.nonzero(sims >= threshold)
    if not len(ii):
        return empty
    ia, ib = a_ids[ii], b_ids[jj]
    if int(lpdf["_blk"].iloc[0]) == int(rpdf["_blk"].iloc[0]):
        # diagonal block: both GEMM triangles present — keep one
        keep = ia < ib
        ia, ib, cs = ia[keep], ib[keep], sims[ii, jj][keep]
    else:
        # off-diagonal: each unordered pair appears once; orient it
        cs = sims[ii, jj]
        lo = np.minimum(ia, ib)
        ib = np.maximum(ia, ib)
        ia = lo
    return pd.DataFrame({"id_a": ia, "id_b": ib, "cos_sim": cs})


def _spherical_kmeans(X, k: int, iters: int, seed: int):
    """Driver-side spherical k-means on a BOUNDED sample (numpy): assign by
    dot product on unit vectors, recentre, renormalize. Deterministic under
    seed; milliseconds at coarse-quantizer sizes (k<=4096, sample<=64k)."""
    rng = np.random.RandomState(seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[rng.choice(len(Xn), size=min(k, len(Xn)), replace=False)]
    if len(C) < k:  # degenerate tiny corpus: pad by repeating
        C = np.vstack([C] * (k // len(C) + 1))[:k]
    for _ in range(iters):
        a = (Xn @ C.T).argmax(axis=1)
        for j in range(k):
            members = Xn[a == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    fit_sample_size: int = 65536,
    centroids: "np.ndarray | list[list[float]] | None" = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse centroids over the
    corpus, each vector assigned to its nearest centroid's cell, each
    query scanning only its ``n_probe`` nearest cells.

    Scale shape: centroids are FIT on a bounded random sample collected to
    the driver (coarse quantizers need a few hundred points per centroid,
    never the corpus; <=``fit_sample_size`` rows by construction — this is
    a model fit on a bounded sample, not a data collect) with spherical
    k-means in numpy — microseconds per iteration, no per-iteration Spark
    jobs. Cell ASSIGNMENT is distributed: one ``mapInPandas`` pass over
    the corpus scan computing an Arrow-batched GEMM argmax against the
    broadcast centroid matrix — the corpus is scanned once, shuffled
    never. The query side probes ``n_probe / n_centroids`` of the corpus
    via a broadcast cell join; at 100 TB that fraction, not the corpus, is
    the per-query cost. Recall is tunable via n_probe
    (tests/test_similarity.py pins recall vs brute force).

    ``centroids`` (optional) supplies a pretrained coarse quantizer — a
    ``(n_centroids, dim)`` row-matrix of unit vectors — skipping the
    k-means fit entirely (the FAISS train-once/assign-many pattern). With
    fixed centroids every downstream step (cell assignment, probed cells,
    within-cell exact top-k) is deterministic and engine-portable, which
    is how q44's DuckDB oracle reproduces this operator exactly."""
    spark = corpus.sparkSession
    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        n_centroids = C.shape[0]
    else:
        n = corpus.count()  # metadata-mostly on columnar sources
        sample = corpus.select(vec_col)
        if n > fit_sample_size:
            sample = sample.sample(fraction=min(1.0, 1.2 * fit_sample_size / n), seed=seed)
        rows = sample.limit(fit_sample_size).collect()
        if not rows:
            raise ValueError(
                "ivf_topk: cannot fit centroids on an empty corpus "
                "(pass pretrained `centroids=` or supply data)"
            )
        X = np.array([list(r[0]) for r in rows], dtype=np.float64)
        C = _spherical_kmeans(X, n_centroids, max_iter, seed)

    id_field = corpus.schema[id_col]
    vec_field = corpus.schema[vec_col]
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        f"{vec_col} {vec_field.dataType.simpleString()}, _cell INT"
    )

    def _assign(batches):
        for pdf in batches:
            V = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cells = (Vn @ C.T).argmax(axis=1).astype("int32")
            yield pd.DataFrame({id_col: pdf[id_col], vec_col: pdf[vec_col], "_cell": cells})

    assigned = corpus.select(id_col, vec_col).mapInPandas(_assign, out_schema)

    # per query: n_probe nearest centroids — same Arrow GEMM pattern as
    # cell assignment (one mapInPandas pass over the query scan, centroid
    # matrix in the closure) instead of a crossJoin against a centroid
    # frame + interpreted higher-order cosine + rank window: one stage,
    # no BroadcastExchange, no per-(query,centroid) row blowup. Ties
    # break toward the lower cell id (argsort on (-sim, cell)), matching
    # the q44 oracle's ORDER BY cs DESC, cell.
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_schema = (
        f"query_id {id_field.dataType.simpleString()}, "
        f"q_vec {vec_field.dataType.simpleString()}, _cell INT"
    )

    def _probe(batches):
        for pdf in batches:
            Q = np.array([list(v) for v in pdf["q_vec"]], dtype=np.float64)
            Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
            sims = Qn @ C.T
            # n_probe can exceed the centroid count (tiny indexes /
            # pretrained pivot matrices): probe every cell, don't crash
            eff_probe = min(n_probe, C.shape[0])
            order = np.argsort(-sims, axis=1, kind="stable")[:, :eff_probe]
            n = len(pdf)
            idx = np.repeat(np.arange(n), eff_probe)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy()[idx],
                    "q_vec": pdf["q_vec"].to_numpy()[idx],
                    "_cell": order.reshape(-1).astype("int32"),
                }
            )

    q_cells = q.mapInPandas(_probe, q_schema)

    # candidate scoring is the hot loop (n_probe/n_centroids of the corpus
    # per query): Arrow-vectorized row-wise cosine, not the interpreted
    # higher-order `cosine` expression (~40x at corpus scale).
    @F.pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.stack(va.to_numpy()).astype(np.float64, copy=False)
        B = np.stack(vb.to_numpy()).astype(np.float64, copy=False)
        num = np.einsum("ij,ij->i", A, B)
        den = np.maximum(np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1), 1e-12)
        return pd.Series(num / den)

    scored = assigned.join(F.broadcast(q_cells), "_cell").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _cos(F.col(vec_col), F.col("q_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_bucketed_pairs(
    df: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket_rows: int | None = 8192,
) -> DataFrame:
    """Near-duplicate embedding pairs: bucket by random hyperplanes, exact
    cosine within buckets only — the sub-quadratic candidate path when the
    corpus exceeds :func:`all_pairs_cosine`'s row guard.

    Scale shape: the sign bits are codegen aggregates in the scan
    projection; ONE shuffle lands each bucket in one Arrow group, where a
    single float64 GEMM scores all within-bucket pairs (BLAS; ~40x faster
    than per-pair interpreted higher-order dot products, and the vectors
    shuffle once instead of twice for a self-join's two sides). Pair work
    is quadratic only in bucket size: plane count tunes E[bucket] =
    n / 2^k.

    Skew guard: LSH buckets are data-dependent, and one hot bucket is
    one quadratic task no matter how uniform the hash looks on paper.
    ``target_bucket_rows`` (None disables) first runs a cheap per-bucket
    census (one extra scan computing only the sign bits; at most 2^k
    counter rows reach the driver — model-state sized, not data); any
    bucket above the target is split into ceil(c/target) id-salted
    blocks and scored as a per-bucket 2D block-pair schedule (the
    :func:`all_pairs_cosine` cogroup trick, scoped to the bucket), so a
    hot bucket's n^2 work lands evenly across ~s^2/2 tasks instead of
    one straggler. With no hot buckets the single-shuffle group path
    runs unchanged."""
    b = random_hyperplane_buckets(df, planes, id_col, vec_col)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cos_sim DOUBLE"

    hot: dict[int, int] = {}
    if target_bucket_rows is not None:
        # Materialize the bucketed projection ONCE before the census:
        # without this, the sign-bit projection is recomputed for the
        # census AND again for each cogroup side in the salted path (up
        # to 3 full corpus scans) — the exact recompute trap the
        # docstring's "one extra scan" claim promises away.
        b = b.localCheckpoint(eager=True)
        nb = {
            int(r["bucket"]): -(-int(r["c"]) // target_bucket_rows)
            for r in b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        hot = {bk: s for bk, s in nb.items() if s > 1}

    if hot:
        return _salted_bucket_pairs(b, hot, threshold, id_col, vec_col, out_schema)

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        if len(pdf) < 2:
            return empty
        # sort by id so the upper triangle IS the id_a < id_b orientation
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ M.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        if not len(ii):
            return empty
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj], "cos_sim": sims[ii, jj]})

    return b.groupBy("bucket").applyInPandas(_pairs, out_schema)


def _salted_bucket_pairs(
    b: DataFrame,
    hot: dict[int, int],
    threshold: float,
    id_col: str,
    vec_col: str,
    out_schema: str,
) -> DataFrame:
    """Per-bucket 2D block-pair schedule for skewed LSH buckets: bucket
    ``bk`` runs as ``s = hot[bk]`` id-salted blocks (1 for cold buckets
    — they ride the same schedule as its degenerate single-block case).
    Block pair (bi <= bj) gets pair id ``bi*s + bj``; a row in block i is
    the LEFT operand of pairs (i, j >= i) — the contiguous id run
    [i*s+i, i*s+s-1] — and the RIGHT operand of pairs (j <= i, i) — the
    stride-s run [i, i*s+i]. Both sides are codegen `sequence` explodes;
    the cogroup key is (bucket, pair)."""
    s_entries: list = []
    for bk, s in sorted(hot.items()):
        s_entries += [F.lit(bk), F.lit(s)]
    s_col = F.coalesce(F.element_at(F.create_map(*s_entries), F.col("bucket")), F.lit(1))

    def _side(seq_expr):
        base = b.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            F.col("bucket"),
            s_col.alias("_s"),
            F.pmod(F.xxhash64(F.col(id_col)), s_col).cast("int").alias("_blk"),
        )
        return base.select(
            F.explode(seq_expr(F.col("_blk"), F.col("_s"))).alias("pair"),
            "bucket", "_id", "_vec", "_blk",
        )

    left = _side(lambda blk, s: F.sequence(blk * s + blk, blk * s + s - 1))
    right = _side(lambda blk, s: F.sequence(blk, blk * s + blk, s))

    def _gemm(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        return _pairwise_gemm(lpdf, rpdf, threshold)

    return (
        left.groupBy("bucket", "pair")
        .cogroup(right.groupBy("bucket", "pair"))
        .applyInPandas(_gemm, out_schema)
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean embedding in long form ``(label, dim, centroid)`` —
    the class-prototype / cluster-centroid aggregate (semantic-dedup
    cluster summaries, label-conditioned retrieval anchors).

    Shape: ``posexplode`` fans each vector into (dim, value) rows inside
    the scan (no Python), and the single groupBy on the composite
    (label, dim) key gets map-side partial aggregation — one skew-free
    shuffle of O(labels × dims) partials per task, not O(rows × dims)
    data. Values cast to double BEFORE the avg so the accumulation
    matches engines that promote float arrays on read.
    """
    return (
        df.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("_p", "_v"),
        )
        .select("label", (F.col("_p") + 1).alias("dim"), F.col("_v").cast("double").alias("_v"))
        .groupBy("label", "dim")
        .agg(F.avg("_v").alias("centroid"))
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector int quantization (absmax scaling): scale =
    max|v| / (2^(bits-1) - 1), q_i = round(v_i / scale) — the storage /
    bandwidth compression step an ANN index applies before sharding
    billions of vectors (4x smaller than float32 at 8 bits; dot products
    rescale by scale_a * scale_b).

    Pure column expressions over array higher-order functions — evaluated
    per element but O(dims) per row with no shuffle, no Python, and the
    arithmetic (double division + half-away-from-zero round) reproduces
    bit-identically in the oracle. An all-zero vector keeps scale 0 and
    an all-zero code array.
    """
    qmax = (1 << (bits - 1)) - 1
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = (absmax / F.lit(float(qmax))).alias("scale")
    codes = F.when(
        absmax == 0.0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.round(x.cast("double") / (absmax / qmax)).cast("int"))
    )
    return df.select(F.col(id_col), scale, codes.alias("qvec"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization approximate top-k (Jégou et al., PAMI 2011 —
    the FAISS ``IndexPQ`` shape): split each d-dim vector into M
    subvectors, encode each against a per-subspace codebook by nearest-L2
    codeword (ties -> smallest code), then score queries against CODES
    ONLY via asymmetric distance computation (ADC): approx_dot(q, x) =
    sum_m dot(q_m, codeword[m][code_m(x)]).

    ``codebooks`` is ``[M][K]`` of subvector lists (train-once/assign-many
    — fit offline or pass pivot subvectors for a deterministic quantizer,
    the q44 oracle pattern). Real deployments use K=256 (1 byte/code);
    K is a parameter here.

    100 TB shape: the corpus is read ONCE to encode (no shuffle — argmin
    over K literal codewords per subspace, pure codegen array exprs) and
    thereafter lives as M small codes per row: codes are cast to TINYINT
    when K <= 128 (SMALLINT up to 32768), so at d=64/M=4/K<=128 the index
    is 4 bytes/row vs 256 bytes of float32 — 64x smaller, the difference
    between an index that fits executor memory and one that doesn't (16x
    if K forces 4-byte codes). Queries broadcast; ADC reads codes +
    literal codebooks, never the original vectors; only (query, k) result
    rows shuffle for the per-query top-k window."""
    m = len(codebooks)
    if m == 0 or not codebooks[0]:
        raise ValueError("codebooks must be a non-empty [M][K] structure")
    d_sub = len(codebooks[0][0])
    n_codes = len(codebooks[0])
    for j, cb_j in enumerate(codebooks):
        if len(cb_j) != n_codes:
            raise ValueError(
                f"codebooks[{j}] has {len(cb_j)} codewords, expected {n_codes} "
                "(all subspaces must share K)"
            )
        for i, cw in enumerate(cb_j):
            if len(cw) != d_sub:
                raise ValueError(
                    f"codebooks[{j}][{i}] has dim {len(cw)}, expected d_sub={d_sub}"
                )
    code_type = "tinyint" if n_codes <= 128 else ("smallint" if n_codes <= 32768 else "int")
    v = F.col(vec_col)
    dim_ok = F.size(v) == F.lit(m * d_sub)
    dim_err = F.raise_error(
        F.concat(
            F.lit(f"pq_topk: vector dim must be M*d_sub={m * d_sub}, got "),
            F.size(v).cast("string"),
        )
    )

    codes = []
    for j in range(m):
        sl = F.slice(v, j * d_sub + 1, d_sub)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sl,
                        lit_double_array(cw),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for cw in codebooks[j]
            ]
        )
        # first-min position = smallest code on ties, matching the
        # oracle's ORDER BY dist, code
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast(code_type)
        if j == 0:
            # per-row dim guard rides the first code expr so pruning can't
            # drop it: mismatched vectors raise instead of null-padding
            code = F.when(dim_ok, code).otherwise(dim_err.cast(code_type))
        codes.append(code.alias(f"code{j}"))
    enc = corpus.select(F.col(id_col).alias("neighbor_id"), *codes)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    score = None
    for j in range(m):
        qsl = F.slice(F.col("q_vec"), j * d_sub + 1, d_sub)
        cb = lit_double_matrix(codebooks[j])
        cw = F.element_at(cb, F.col(f"code{j}") + 1)
        part = F.aggregate(
            F.zip_with(qsl, cw, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if j == 0:
            q_ok = F.size(F.col("q_vec")) == F.lit(m * d_sub)
            q_err = F.raise_error(
                F.concat(
                    F.lit(f"pq_topk: query dim must be M*d_sub={m * d_sub}, got "),
                    F.size(F.col("q_vec")).cast("string"),
                )
            )
            part = F.when(q_ok, part).otherwise(q_err.cast("double"))
        score = part if score is None else score + part

    scored = enc.join(F.broadcast(q)).select("query_id", "neighbor_id", score.alias("adc_dot"))
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dot").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def random_projection(
    df: DataFrame,
    out_dim: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a literal
    Rademacher (±1/sqrt(out_dim)) projection matrix (Achlioptas 2003,
    "Database-friendly random projections") — the standard cheap prep
    before ANN indexing or clustering when the embedding dim is large.

    The matrix is generated driver-side from a seeded RNG and embedded as
    LITERALS, so the whole projection is whole-stage codegen (one
    ``zip_with``+``aggregate`` dot product per output dim), shuffle-free,
    and exactly reproducible across engines — q74's DuckDB oracle
    replays the identical literal matrix. Output: one row per
    (id, dim 0..out_dim-1, value).
    """

    if in_dim is None:
        head = df.select(vec_col).head()
        if head is None or head[0] is None:
            raise ValueError(
                "random_projection: cannot infer in_dim from an empty frame "
                "or a null first vector - pass in_dim explicitly"
            )
        in_dim = len(head[0])
    R = jl_matrix(in_dim, out_dim, seed)
    projs = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                lit_double_array(R[j]),
                lambda v, r: v.cast("double") * r,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for j in range(out_dim)
    ]
    return df.select(
        F.col(id_col), F.posexplode(F.array(*projs)).alias("dim", "value")
    )


def jl_matrix(in_dim: int, out_dim: int, seed: int = 7):
    """Seeded Rademacher projection matrix, shared with the q74 oracle."""

    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=(out_dim, in_dim)) * 2 - 1) / np.sqrt(out_dim)


def rrf_fusion(
    df: DataFrame,
    query_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_rrf: int = 60,
    top_k: int = 15,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    rankings against one query vector (taken from the frame by id): the
    cosine ranking and the euclidean ranking, fused as
    ``1/(k + rank_cos) + 1/(k + rank_l2)`` — the standard way hybrid
    search merges rankers without score calibration. Both distance
    columns are pure codegen higher-order-function expressions over one
    corpus scan; ranks come from the two-phase value-bucketed global
    rank (:func:`layout.global_rank_by_value` — per-bucket distributed
    windows plus a tiny bucket-offset frame, bit-identical to the naive
    total-order window without moving the corpus to one partition), and
    the final top-k is a TakeOrdered, not a full sort to one partition.

    For a billion-vector corpus, feed this the candidate union of the
    per-ranker top-N (each produced by :func:`brute_force_topk` /
    :func:`ivf_ann`) instead of the full frame — RRF only needs ranks of
    candidates."""

    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("_qv"))
    s = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            cosine(F.col(vec_col), F.col("_qv")).alias("_cos"),
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.col("_qv"),
                        lambda x, y: (x.cast("double") - y.cast("double"))
                        * (x.cast("double") - y.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("_l2"),
        )
    )
    from phoebe_spark.operators.layout import global_rank_by_value

    # distributed exact ranks: bucket by a monotone coarsening of each
    # sort key so the offset frame is value-range-bounded (cos in [-1,1]
    # -> <=2049 buckets; l2 bounded by the embedding norm ball)
    r = global_rank_by_value(
        s, "_cos", id_col, descending=True, out_col="r_cos",
        bucket=F.floor(F.col("_cos") * 1024),
    )
    r = global_rank_by_value(
        r, "_l2", id_col, descending=False, out_col="r_l2",
        bucket=F.floor(F.col("_l2") * 1024),
    )
    rrf = 1.0 / (k_rrf + F.col("r_cos")) + 1.0 / (k_rrf + F.col("r_l2"))
    return (
        r.select(
            id_col,
            F.round(rrf, 6).alias("rrf"),
            F.col("r_cos").cast("long").alias("r_cos"),
            F.col("r_l2").cast("long").alias("r_l2"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def _sq_dist(v: Column, centroid: list[float]) -> Column:
    """Euclidean distance of an array<double> column to one literal
    centroid: ordered left fold over dimensions (index order), matching
    DuckDB's ``list_sum(list_transform(generate_series(...), ...))``
    accumulation digit for digit."""
    c = lit_double_array(centroid)
    return F.sqrt(
        F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column — the cluster
    step of SemDeDup-style semantic dedup (Abbas et al. 2023) and the
    cell fit of an IVF ANN index, as a DataFrame plan.

    Fully deterministic (no RNG, no framework kmeans):

    - **init**: centroids are the vectors of the ``k`` lowest ids —
      the deterministic seeding that lets an external oracle replay the
      fit exactly;
    - **assign**: one corpus scan; distances to all k centroids are
      codegen ordered folds against LITERAL centroid arrays, and the
      argmin tie-breaks to the lowest centroid id
      (``array_position(dists, array_min(dists))``);
    - **update**: per-(centroid, dim) mean via posexplode + ONE
      map-side-combining groupBy. Components are quantized
      ``floor(val * 1e9)`` into exact BIGINT sums: order-independent
      under any partial-aggregation schedule AND free of the
      decimal-cast tie hazard (a float32 component whose decimal
      expansion terminates exactly at the rounding scale is rounded
      HALF_UP by Spark but half-even by DuckDB; ``floor`` has no tie).
      Centroids are therefore 1e-9-quantized — semantically irrelevant
      for k-means, and what makes the fit bit-replayable by an external
      SQL engine. A cluster that empties keeps its previous centroid.

    Returns the final assignment ``(id_col, cid, dist)``.

    Scale shape: per iteration = one corpus scan + one (k x dims)-sized
    aggregate; exactly ``k*dims`` doubles ever reach the driver (the
    centroid table — the model state), never data rows. The corpus is
    never shuffled on data; only the posexplode fan-out shuffles, keyed
    on (cid, dim) which is uniform by construction.
    """
    dv = df.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    cents = [list(r["v"]) for r in dv.orderBy("vid").limit(k).collect()]

    def _assign(frame: DataFrame) -> DataFrame:
        dists = F.array(*[_sq_dist(F.col("v"), c) for c in cents])
        return frame.select(
            "vid",
            "v",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cid"),
            F.element_at(dists, F.array_position(dists, F.array_min(dists)).cast("int")).alias("dist"),
        )

    for _ in range(iters):
        assigned = _assign(dv)
        upd = (
            assigned.select("cid", F.posexplode("v").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(
                (
                    F.sum(F.floor(F.col("val") * 1000000000.0)).cast("double")
                    / (1000000000.0 * F.count(F.lit(1)))
                ).alias("cv")
            )
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("pairs"))
            .select("cid", F.transform("pairs", lambda p: p["cv"]).alias("cvec"))
        )
        new_cents = {r["cid"]: list(r["cvec"]) for r in upd.collect()}
        cents = [new_cents.get(i, cents[i]) for i in range(k)]

    return _assign(dv).select(F.col("vid").alias(id_col), "cid", "dist")


def dominant_direction(
    emb: DataFrame,
    vec_col: str = "embedding",
    iterations: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Dominant singular direction of the embedding matrix (PCA without
    centering) by POWER ITERATION on the Gram matrix G = X^T X —
    engine-exact and replayable:

    - values quantize once scan-side (``floor(1e6 * v)`` BIGINT), so the
      Gram entries are exact integer sums (order-independent, unlike a
      double sum);
    - each iteration is ``w = (G // 1e6) v`` then an integer
      renormalization ``v' = w / (max|w| // 1e6)`` — all divisions are
      SIGN-SPLIT TRUNCATING (``sign * (abs // d)``) because Spark's
      ``div`` truncates while a naive ``//`` replay might floor, and the
      two differ on negatives;
    - v0 = the all-ones vector at unit scale.

    Returns (dim, v_milli): the 1-based dimension index and the
    iterated direction in 1e6 units (max-normalized, not L2 — the
    deterministic integer choice).

    Scale shape: ONE self-join shuffle builds G (dims² rows — 4096 for
    64-dim embeddings — regardless of corpus size; the corpus
    contributes a single map-side-combining aggregate), then the
    iterations run on dims-sized frames with broadcast joins. The
    textbook distributed-PCA layout: never materialize X, only G."""
    flat = emb.select(
        "vec_id",
        F.posexplode(vec_col).alias("pos", "val"),
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("val").cast("double") * scale).cast("long").alias("q"),
    )
    a = flat.select("vec_id", F.col("dim").alias("i"), F.col("q").alias("qa"))
    b = flat.select("vec_id", F.col("dim").alias("j"), F.col("q").alias("qb"))
    gram = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("g"))
    )

    # Pre-scale G once (sign-split INTEGER trunc division — `div`, not
    # float division, which loses bits above 2^53) so w never overflows
    # BIGINT
    g2 = gram.select(
        "i",
        "j",
        F.expr(
            f"CASE WHEN g < 0 THEN -(abs(g) div {scale}L) "
            f"ELSE g div {scale}L END"
        ).alias("g2"),
    ).localCheckpoint(eager=True)

    dims = g2.select(F.col("i").alias("dim")).distinct()
    v = dims.select("dim", F.lit(scale).cast("long").alias("v"))
    for _ in range(iterations):
        w = (
            g2.join(F.broadcast(v.withColumnRenamed("dim", "j")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("g2") * F.col("v")).alias("w"))
        )
        m = w.agg(F.expr(f"max(abs(w)) div {scale}L").alias("d"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("dim"),
                F.expr(
                    "CASE WHEN w < 0 THEN -(abs(w) div d) ELSE w div d END"
                ).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return v.select("dim", F.col("v").alias("v_milli"))


def cluster_local_pairs(
    df: DataFrame,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    round_to: int = 6,
    max_cluster_rows: int | None = 100_000,
) -> DataFrame:
    """Within-cluster cosine pairs >= threshold — the SemDeDup pair stage.
    The self-join is an EQUI-join on the cluster key, so pair work is
    sum-of-cluster-squares, never corpus²; per-row norms are computed
    ONCE before the join (hoisting them out of the pair predicate halves
    the per-pair arithmetic — measured 9.4 s -> 3.5 s at 5k vectors).
    Cosine is rounded to ``round_to`` dp BEFORE the threshold so the
    boundary predicate is engine-stable.

    ``max_cluster_rows``: quadratic-blowup guard, same contract as
    :func:`all_pairs_cosine`'s ``max_rows``. One map-side-combining
    census; if any cluster exceeds the bound, refuse with a pointer at
    the scalable alternatives (re-cluster finer with
    :func:`kmeans_lloyd`, or LSH-bucket INSIDE the hot cluster with
    :func:`lsh_bucketed_pairs`, whose salt-split already handles hot
    buckets) instead of silently scheduling a cluster² straggler.
    """
    if max_cluster_rows is not None:
        hot = (
            df.groupBy(cluster_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_cluster_rows)
            .head(1)
        )
        if hot:
            row = hot[0]
            raise ValueError(
                f"cluster_local_pairs: cluster {row[cluster_col]!r} has "
                f"{row['n']} rows (> max_cluster_rows={max_cluster_rows}); "
                "the within-cluster pair join would be quadratic in that "
                "cluster. Re-cluster finer (kmeans_lloyd with larger k) or "
                "run lsh_bucketed_pairs inside the hot cluster (its "
                "salt-split schedules hot buckets as block pairs), or raise "
                "max_cluster_rows deliberately."
            )
    en = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(cluster_col).alias("label"),
        F.col(vec_col).alias("embedding"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    a = en.alias("a")
    b = en.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                round_to,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
