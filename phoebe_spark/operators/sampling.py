"""Deterministic sampling and dataset splitting for training-data
pipelines.

At 100 TB, ``df.sample()`` / ``rand()`` splits are the wrong tool: they
change under re-partitioning, retries, and seed drift, so yesterday's
train set is not today's. The reproducible pattern is content hashing —
assign each record to a bucket by a salted hash of its id and cut the
bucket range by the requested shares. The assignment is a pure column
expression (whole-stage codegen, no shuffle, no RNG state), identical on
any cluster size, and — built on the md5 double-hash base — bit-identical
in DuckDB so splits oracle-check end-to-end (q55).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from phoebe_spark.operators.dedup import md5_hash64

DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.9),
    ("val", 0.05),
    ("test", 0.05),
)


def hash_bucket(id_col, salt: str = "v1", buckets: int = 10000):
    """Stable bucket in [0, buckets): md5 double-hash of ``id || '|' ||
    salt``. Change the salt to draw an independent split."""
    return md5_hash64(F.concat(id_col.cast("string"), F.lit(f"|{salt}"))) % buckets


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    salt: str = "v1",
    buckets: int = 10000,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label by cumulative bucket
    ranges (e.g. train [0, 9000), val [9000, 9500), test [9500, 10000)).
    Shares must sum to <= 1; any remainder is labeled null (held out)."""
    total = sum(f for _, f in splits)
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = hash_bucket(F.col(id_col), salt, buckets)
    expr = None
    acc = 0.0
    for name, frac in splits:
        acc += frac
        bound = int(round(acc * buckets))
        cond = b < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr.otherwise(F.lit(None).cast("string")))


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "v1",
    buckets: int = 10000,
) -> DataFrame:
    """Deterministic ``fraction`` subsample by bucket cut — reproducible
    across runs and cluster layouts, unlike ``df.sample``. Nested samples:
    a 1% cut is a subset of the 10% cut at the same salt."""
    bound = int(round(fraction * buckets))
    return df.filter(hash_bucket(F.col(id_col), salt, buckets) < F.lit(bound))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "v1",
    buckets: int = 10000,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum subsample: each stratum keeps its own
    ``fractions[stratum]`` share by the same salted-hash bucket cut as
    :func:`hash_sample` — the downsample-common-sources / keep-rare-sources
    rebalancing step of corpus curation, reproducible across runs,
    partitionings, and engines (md5 base, oracle-checked as q65).

    The per-stratum bound compiles to a ``CASE`` chain (whole-stage
    codegen, no shuffle, no join). That is the right shape while strata
    are enumerable (sources, languages — tens to hundreds); for
    unbounded strata keys, broadcast-join a fractions table instead.
    Strata missing from ``fractions`` keep ``default_fraction``.
    """
    bound = None
    for name, frac in fractions.items():
        b = int(round(frac * buckets))
        cond = F.col(strata_col) == name
        bound = F.when(cond, F.lit(b)) if bound is None else bound.when(cond, F.lit(b))
    bound = (
        F.lit(int(round(default_fraction * buckets)))
        if bound is None
        else bound.otherwise(F.lit(int(round(default_fraction * buckets))))
    )
    return df.filter(hash_bucket(F.col(id_col), salt, buckets) < bound)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws u in (0,1) from the salted content
    hash of its id (no RNG — reproducible across runs, partitionings, and
    engines) and the k rows with the largest ``u^(1/w)`` — equivalently
    the largest ``ln(u)/w`` — win. Quality-weighted corpus subsampling
    with an audit trail: rerunning the pipeline reproduces the sample
    bit-for-bit, and the DuckDB oracle re-derives it independently.

    The top-k is a TakeOrdered over per-partition partial top-k (O(k) to
    the driver); everything else is codegen column math on the scan."""
    h = md5_hash64(F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}")))
    # (h + 1) / (2^60 + 1): strictly inside (0, 1) so ln(u) is finite
    u = (h.cast("double") + 1.0) / float((1 << 60) + 1)
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_key", key)
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def leakage_safe_split(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    salt: str = "v1",
    buckets: int = 10000,
    out_col: str = "split",
    rep_col: str = "group_rep",
) -> DataFrame:
    """Group-aware deterministic split: every member of a group (a dup
    cluster, a fingerprint bin, a domain) receives the split of the
    group's REPRESENTATIVE (min id), so near-duplicates can never
    straddle train/test — the train→test contamination path that a
    row-wise :func:`hash_split` leaves open whenever the corpus still
    contains near-dups at split time (reference parity: the reference
    splits at the record level only; this is the scale-out-safe form an
    LLM pipeline needs).

    Scale shape: one map-side-combining groupBy on ``group_col`` for the
    representative, the split assignment as a pure column expression on
    the representative id (no RNG), and one equi-join back on
    ``group_col`` — group-count-sized right side, AQE broadcasts it when
    small. Reproducible across runs, partitionings, and engines (md5
    double-hash base, q55 philosophy)."""
    rep = df.groupBy(group_col).agg(F.min(id_col).alias(rep_col))
    rep = hash_split(
        rep, id_col=rep_col, splits=splits, salt=salt, buckets=buckets, out_col=out_col
    )
    return df.join(rep, group_col)
