"""Hot-shingle document-frequency cap: a single boilerplate gram shared by
every doc must not emit a quadratic pair set when the cap is on (the
default). Guards the 100 TB failure mode where one stopword 5-gram shared
by 1e5 docs explodes into 1e10 pairs from one posting group."""

from __future__ import annotations

import pytest

from phoebe_spark.operators.dedup import ngram_jaccard_pairs

N_DOCS = 60


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    # every doc shares exactly one hot 5-gram; all other grams are unique
    rows = [
        (i, f"common1 common2 common3 common4 common5 u{i}a u{i}b u{i}c u{i}d")
        for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_uncapped_goes_quadratic(boilerplate_docs):
    pairs = ngram_jaccard_pairs(
        boilerplate_docs, n=5, threshold=0.01, max_shingle_freq=None
    )
    assert pairs.count() == N_DOCS * (N_DOCS - 1) // 2


def test_default_cap_bounds_pairs(boilerplate_docs):
    # default cap (1000) admits the gram at 60 docs; an explicit cap below
    # the gram's document frequency drops it and the pair set collapses
    pairs = ngram_jaccard_pairs(
        boilerplate_docs, n=5, threshold=0.01, max_shingle_freq=10
    )
    assert pairs.count() == 0


def test_cap_preserves_true_neardups(spark):
    # two near-identical docs share many RARE grams: they must survive the
    # cap even when a hot boilerplate gram is dropped corpus-wide
    body = " ".join(f"w{i}" for i in range(30))
    rows = [(0, body + " tail0"), (1, body + " tail1")]
    rows += [
        (i, f"common1 common2 common3 common4 common5 u{i}a u{i}b u{i}c u{i}d")
        for i in range(2, 42)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, n=5, threshold=0.5, max_shingle_freq=10).collect()
    }
    assert got == {(0, 1)}
