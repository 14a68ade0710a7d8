"""Property-based tests (hypothesis) for the time-series kernel — beyond
the reference's own example-based strategy (SURVEY §5 notes it has none)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from phoebe_spark.functions.numeric import exp_rolling_mean, nnls, simpson
from phoebe_spark.timeseries import densify, fill_linear, merge_sum, strided_subsample

series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda p: p[0],
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(t), None if v is None else float(v)) for t, v in pairs],
        "timestamp LONG, value DOUBLE",
    )


@SLOW
@given(pairs=series_strategy)
def test_fill_linear_preserves_observed_and_bounds(spark, pairs):
    df = _df(spark, pairs)
    out = {r["timestamp"]: r["value"] for r in fill_linear(df).collect()}
    observed = {t: v for t, v in pairs if v is not None}
    for t, v in observed.items():
        assert out[t] == v  # non-null points unchanged
    if observed:
        lo, hi = min(observed.values()), max(observed.values())
        for t, v in out.items():
            if v is not None:
                assert lo - 1e-9 <= v <= hi + 1e-9  # interpolation never extrapolates beyond range
    else:
        assert all(v is None for v in out.values())


@SLOW
@given(pairs=series_strategy)
def test_densify_is_dense_and_preserves(spark, pairs):
    df = _df(spark, pairs)
    rows = densify(df, step=1).collect()
    ts = sorted(r["timestamp"] for r in rows)
    assert ts == list(range(min(t for t, _ in pairs), max(t for t, _ in pairs) + 1))
    vals = {r["timestamp"]: r["value"] for r in rows}
    for t, v in pairs:
        assert vals[t] == v


@SLOW
@given(pairs=series_strategy)
def test_merge_sum_commutative(spark, pairs):
    half = len(pairs) // 2 or 1
    a, b = _df(spark, pairs[:half]), _df(spark, pairs[half:] or pairs[:1])
    ab = {r["timestamp"]: r["value"] for r in merge_sum(a, b).collect()}
    ba = {r["timestamp"]: r["value"] for r in merge_sum(b, a).collect()}
    assert ab == ba


@SLOW
@given(
    n=st.integers(min_value=1, max_value=50),
    rate=st.integers(min_value=1, max_value=10),
)
def test_strided_subsample_count_and_anchor(spark, n, rate):
    df = _df(spark, [(i, float(i)) for i in range(n)])
    out = sorted(r["timestamp"] for r in strided_subsample(df, rate=rate).collect())
    assert len(out) == (n + rate - 1) // rate
    assert out[-1] == n - 1  # newest observation always kept


@given(
    ys=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=3, max_size=40)
)
@settings(max_examples=50, deadline=None)
def test_simpson_close_to_trapezoid(ys):
    x = np.arange(len(ys), dtype=float)
    y = np.array(ys)
    s = simpson(y, x)
    t = float(np.trapz(y, x))
    # both are consistent integral estimates; for bounded values on a unit
    # grid they cannot diverge more than the total variation
    bound = np.sum(np.abs(np.diff(y))) + 1e-6
    assert abs(s - t) <= bound


@given(
    ys=st.lists(st.floats(min_value=-1e4, max_value=1e4, allow_nan=False), min_size=1, max_size=60),
    window=st.integers(min_value=2, max_value=20),
)
@settings(max_examples=50, deadline=None)
def test_exp_rolling_mean_stays_in_range(ys, window):
    y = np.array(ys)
    out = exp_rolling_mean(y, window)
    assert len(out) == len(y)
    assert np.all(out >= y.min() - 1e-6) and np.all(out <= y.max() + 1e-6)


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_nnls_never_negative(data):
    rng_seed = data.draw(st.integers(min_value=0, max_value=10_000))
    rng = np.random.default_rng(rng_seed)
    A = rng.standard_normal((12, 4))
    b = rng.standard_normal(12)
    x, resid = nnls(A, b)
    assert np.all(x >= -1e-12)
    # residual no worse than the zero solution
    assert resid <= np.linalg.norm(b) + 1e-9


asof_sides = st.tuples(
    st.lists(  # left: (key, ts) unique
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=1, max_size=20, unique=True,
    ),
    st.lists(  # right: (key, ts, value) unique on (key, ts); null values
        # included — a null observation must SHADOW older non-null ones
        # (merge_asof matches the row and returns NaN)
        st.tuples(st.integers(0, 2), st.integers(0, 100),
                  st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False))),
        min_size=1, max_size=20, unique_by=lambda r: (r[0], r[1]),
    ),
)


@SLOW
@given(sides=asof_sides)
def test_asof_join_matches_pandas_merge_asof(spark, sides):
    """asof_join must agree with pandas merge_asof (direction='backward',
    by=key) on arbitrary keyed series — the de-facto semantics contract."""
    import pandas as pd

    left_rows, right_rows = sides
    left = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "k INT, timestamp LONG"
    )
    right = spark.createDataFrame(
        [(k, t, None if v is None else float(v)) for k, t, v in right_rows],
        "k INT, timestamp LONG, rv DOUBLE",
    )
    from phoebe_spark.timeseries.core import asof_join

    got = {
        (r["k"], r["timestamp"]): r["rv_asof"]
        for r in asof_join(left, right, by=["k"], value_cols=["rv"]).collect()
    }

    lp = pd.DataFrame(sorted(left_rows), columns=["k", "timestamp"])
    rp = pd.DataFrame(sorted(right_rows), columns=["k", "timestamp", "rv"])
    lp = lp.sort_values("timestamp", kind="stable").reset_index(drop=True)
    rp = rp.sort_values("timestamp", kind="stable").reset_index(drop=True)
    exp_df = pd.merge_asof(lp, rp, on="timestamp", by="k", direction="backward")
    exp = {
        (int(r.k), int(r.timestamp)): (None if pd.isna(r.rv) else float(r.rv))
        for r in exp_df.itertuples()
    }
    assert got == exp


doc_corpus = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=60),
    min_size=6,
    max_size=14,
)


@SLOW
@given(texts=doc_corpus)
def test_bloom_decontamination_equals_exact(spark, texts):
    """The Bloom-prefiltered decontamination must be RESULT-IDENTICAL to
    the exact operator on arbitrary corpora: Bloom filters have no false
    negatives, and the confirm join removes every false positive. Tiny
    bit budgets force real false positives through the prefilter."""
    from phoebe_spark.operators.dedup import contamination_flags, contamination_flags_bloom

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    bench = df.filter(F.col("doc_id") < 2)
    corpus = df.filter(F.col("doc_id") >= 2)
    exact = {
        (r["doc"], r["n_contaminated"])
        for r in contamination_flags(corpus, bench, n=2).collect()
    }
    bloom = {
        (r["doc"], r["n_contaminated"])
        for r in contamination_flags_bloom(
            corpus, bench, n=2, n_hashes=2, bits_per_item=4
        ).collect()
    }
    assert bloom == exact


@SLOW
@given(texts=doc_corpus)
def test_unigram_logprob_matches_reference_computation(spark, texts):
    """The distributed unigram LM scorer must match a direct single-node
    computation of the same model on arbitrary corpora."""
    from collections import Counter
    import math as m

    from phoebe_spark.operators.text import unigram_logprob_scores

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_neg_logprob"])
        for r in unigram_logprob_scores(df).collect()
    }

    toks = {i: t.split() for i, t in enumerate(texts) if t.strip()}
    counts = Counter(w for ws in toks.values() for w in ws)
    total = sum(counts.values())
    for i, ws in toks.items():
        exp_n = len(ws)
        exp_score = sum(-m.log(counts[w] / total) for w in ws) / exp_n
        assert got[i][0] == exp_n
        assert abs(got[i][1] - exp_score) < 1e-9


points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=60,
)


@SLOW
@given(pts=points_strategy)
def test_skyline_matches_bruteforce(spark, pts):
    """skyline_2d must equal the quadratic NOT EXISTS definition on
    arbitrary point sets — small ranges force heavy duplicate/tie cases,
    and hypothesis shrinks toward anti-correlated sets where the skyline
    is large and every bucket contributes survivors."""
    from phoebe_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "pid LONG, x LONG, y LONG"
    )
    got = sorted(
        (r.pid, r.x, r.y)
        for r in skyline_2d(df, "x", "y", n_buckets=4, id_cols=["pid"]).collect()
    )
    want = sorted(
        (i, x, y)
        for i, (x, y) in enumerate(pts)
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for bx, by in pts
        )
    )
    assert got == want


words_strategy = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=25,
)


def _py_bpe(words, rounds):
    """Reference BPE: greedy leftmost merge application, (count DESC,
    left ASC, right ASC) argmax."""
    from collections import Counter

    seqs = [[ch for ch in w] for w in words]
    merges = []
    for rnd in range(1, rounds + 1):
        counts = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, l + r, n))
        out = []
        for s in seqs:
            t, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    t.append(l + r)
                    i += 2
                else:
                    t.append(s[i])
                    i += 1
            out.append(t)
        seqs = out
    return merges


@SLOW
@given(words=words_strategy, rounds=st.integers(min_value=1, max_value=3))
def test_bpe_train_matches_python_reference(spark, words, rounds):
    """bpe_train == the classic per-sequence greedy implementation on
    arbitrary small-alphabet corpora (small alphabets force heavy merge
    collisions, ties, and single-char words)."""
    from phoebe_spark.operators.text import bpe_train

    df = spark.createDataFrame([(w,) for w in words], "w string")
    assert bpe_train(df, rounds=rounds) == _py_bpe(words, rounds)


docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24),
    min_size=1,
    max_size=15,
)


@SLOW
@given(texts=docs_strategy, rounds=st.integers(min_value=1, max_value=3))
def test_max_coverage_matches_python_reference(spark, texts, rounds):
    """greedy_max_coverage == the sequential greedy on arbitrary tiny
    corpora (whitespace-heavy strings force empty-token and short-doc
    edge cases)."""
    from phoebe_spark.operators.curation import greedy_max_coverage

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = greedy_max_coverage(df, rounds=rounds)

    sets = {}
    for i, t in enumerate(texts):
        toks = t.split()
        if len(toks) >= 2:
            sets[i] = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
    covered, want = set(), []
    for rnd in range(1, rounds + 1):
        gains = {i: len(s - covered) for i, s in sets.items()}
        gains = {i: g for i, g in gains.items() if g > 0}
        if not gains:
            break
        doc = min(gains, key=lambda i: (-gains[i], i))
        want.append((rnd, doc, gains[doc]))
        covered |= sets[doc]
    assert got == want


str_pairs_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abc ", min_size=0, max_size=20),
        st.text(alphabet="abc ", min_size=0, max_size=20),
    ),
    min_size=1,
    max_size=10,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SLOW
@given(pairs=str_pairs_strategy, min_sim=st.sampled_from([0.3, 0.6, 0.9]))
def test_edit_distance_verify_matches_full_dp(spark, pairs, min_sim):
    """The banded-DP certifier must agree with the full O(nm) DP: every
    returned pair carries the exact Levenshtein distance, and every
    dropped pair is truly below min_sim (the band may only prune pairs
    that cannot reach the threshold)."""
    from phoebe_spark.operators.dedup import edit_distance_verify

    docs = []
    for i, (a, b) in enumerate(pairs):
        docs += [(2 * i, a), (2 * i + 1, b)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    pdf = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(len(pairs))], "id_a long, id_b long"
    )
    got = {
        (r.id_a, r.id_b): r.lev
        for r in edit_distance_verify(ddf, pdf, min_sim=min_sim).collect()
    }
    for i, (a, b) in enumerate(pairs):
        d = _lev(a, b)
        sim = 1.0 - d / max(len(a), len(b), 1)
        key = (2 * i, 2 * i + 1)
        if sim >= min_sim:
            assert got.get(key) == d, (a, b, d, got.get(key))
        else:
            assert key not in got, (a, b, d)


@SLOW
@given(
    stream=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=300),
    k=st.integers(min_value=2, max_value=8),
    n_chunks=st.integers(min_value=1, max_value=4),
)
def test_misra_gries_invariants(stream, k, n_chunks):
    """The pure Misra-Gries fold (mg_update) must satisfy the 1982
    guarantees on arbitrary streams, regardless of how the stream is cut
    into micro-batches: <= k counters, every counter a lower bound, the
    undercount <= n/(k+1), and every item with true frequency above
    n/(k+1) tracked. Chunking invariance is exactly what the streaming
    state hand-off relies on."""
    from collections import Counter

    from phoebe_spark.streaming.stateful import mg_update

    items = [str(x) for x in stream]
    # fold in one go
    whole, n_whole = mg_update({}, 0, items, k)
    # fold in chunks (micro-batch boundaries must not change the result)
    chunked, n_chunked = {}, 0
    step = max(1, len(items) // n_chunks)
    for i in range(0, len(items), step):
        chunked, n_chunked = mg_update(chunked, n_chunked, items[i : i + step], k)
    assert (whole, n_whole) == (chunked, n_chunked)

    n = len(items)
    true = Counter(items)
    assert n_whole == n
    assert len(whole) <= k
    for item, lb in whole.items():
        assert 0 < lb <= true[item]
        assert true[item] - lb <= n / (k + 1)
    for item, cnt in true.items():
        if cnt > n / (k + 1):
            assert item in whole, (item, cnt, n, k)


@SLOW
@given(texts=doc_corpus, n=st.integers(min_value=1, max_value=3))
def test_dup_substring_ratio_matches_bruteforce(spark, texts, n):
    """The distributed duplicated-substring scan must match a direct
    single-node computation: for every document, count n-word-gram
    POSITIONS whose gram occurs more than once corpus-wide (including
    elsewhere in the same document); docs with fewer than n tokens drop
    out. The tiny 'ab cd' alphabet forces heavy gram collisions."""
    from collections import Counter

    from phoebe_spark.operators.dedup import dup_substring_ratio

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_positions"], r["n_dup_positions"])
        for r in dup_substring_ratio(df, "doc_id", "text", n=n).collect()
    }

    grams_by_doc = {}
    census = Counter()
    for i, t in enumerate(texts):
        toks = t.split()
        grams = [tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        if grams:
            grams_by_doc[i] = grams
            census.update(grams)
    exp = {
        i: (len(grams), sum(1 for g in grams if census[g] > 1))
        for i, grams in grams_by_doc.items()
    }
    assert got == exp
