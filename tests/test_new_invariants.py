"""Mathematical invariants of the round-3 analytics operators — checks
independent of the DuckDB oracle (which proves engine parity, not that
the math means what it claims)."""

from __future__ import annotations

import pytest

from phoebe_spark.queries import QUERIES

def test_pagerank_mass_conserved(spark, sf_dir):
    """PageRank is a probability distribution: masses sum to ~1 and every
    node's rank is >= the damping floor."""
    rows = QUERIES["q118_dup_pagerank"](spark, sf_dir).collect()
    assert rows, "pair graph must be non-empty at this SF"
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-3  # rounded to 6dp per node
    assert min(r["pagerank"] for r in rows) > 0


def test_rfm_segments_partition_customers(spark, sf_dir):
    """Every customer lands in exactly one segment; digits stay in 1..4."""
    seg = QUERIES["q111_rfm_segments"](spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in seg) == n_cust
    for r in seg:
        s = r["segment"]
        assert 1 <= s // 100 <= 4 and 1 <= (s // 10) % 10 <= 4 and 1 <= s % 10 <= 4


def test_acf_bounded(spark, sf_dir):
    """Autocorrelation estimates live in [-1, 1]."""
    for r in QUERIES["q112_acf"](spark, sf_dir).collect():
        if r["acf"] is not None:
            assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9


def test_seasonality_deviations_weighted_zero(spark, sf_dir):
    """Cell deviations from the per-type mean, weighted by cell counts,
    cancel out."""
    rows = QUERIES["q113_seasonality"](spark, sf_dir).collect()
    by_type: dict[str, float] = {}
    wt: dict[str, int] = {}
    for r in rows:
        by_type[r["event_type"]] = by_type.get(r["event_type"], 0.0) + r["n"] * r["deviation"]
        wt[r["event_type"]] = wt.get(r["event_type"], 0) + r["n"]
    for t, s in by_type.items():
        assert abs(s / wt[t]) < 1e-5  # deviations rounded to 6dp per cell


def test_ntile_buckets_balanced(spark, sf_dir):
    """NTILE(4) bucket sizes within a key differ by at most one."""
    rows = QUERIES["q128_keyed_ntile"](spark, sf_dir).collect()
    sizes: dict[str, list[int]] = {}
    for r in rows:
        sizes.setdefault(r["event_type"], []).append(r["n"])
    for t, ns in sizes.items():
        assert len(ns) == 4
        assert max(ns) - min(ns) <= 1, f"{t}: {ns}"


def test_calibration_mae_small_at_high_similarity(spark, sf_dir):
    """MinHash with 32 hashes: on the highest-estimate decile the sketch
    should track true Jaccard within a loose statistical bound."""
    rows = QUERIES["q121_minhash_calibration"](spark, sf_dir).collect()
    if not rows:
        pytest.skip("no LSH candidates at this SF")
    top = max(rows, key=lambda r: r["est_decile"])
    assert top["mae"] < 0.25  # 1/sqrt(32) ~ 0.18 expected sampling error


def test_yield_curve_monotone(spark, sf_dir):
    """Raising the dedup threshold can only shrink pairs and touched docs."""
    rows = sorted(
        QUERIES["q123_dedup_yield_curve"](spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    for a, b in zip(rows, rows[1:]):
        assert b["n_pairs"] <= a["n_pairs"]
        assert b["n_docs_touched"] <= a["n_docs_touched"]


def test_source_overlap_jaccard_bounds(spark, sf_dir):
    """Pairwise source Jaccard is in (0, 1] and symmetric-by-construction
    (each unordered pair appears once)."""
    rows = QUERIES["q122_source_overlap"](spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert 0 < r["jaccard"] <= 1
        key = (r["source_a"], r["source_b"])
        assert r["source_a"] < r["source_b"]
        assert key not in seen
        seen.add(key)


def test_multires_rollup_consistent(spark, sf_dir):
    """Each type's minute/hour/day bucket counts all sum to the same
    event total."""
    rows = QUERIES["q119_multires_rollup"](spark, sf_dir).collect()
    tot: dict[tuple, int] = {}
    for r in rows:
        tot[(r["event_type"], r["resolution"])] = (
            tot.get((r["event_type"], r["resolution"]), 0) + r["n"]
        )
    types = {k[0] for k in tot}
    for t in types:
        assert tot[(t, "minute")] == tot[(t, "hour")] == tot[(t, "day")]


def test_bpe_train_textbook_corpus(spark):
    """bpe_train reproduces the classic Sennrich toy-corpus merges with
    deterministic tie-breaks, and greedy leftmost application handles the
    overlapping-pair case ('aaaa' + (a,a) -> aa,aa not aa,a,a)."""
    from phoebe_spark.operators.text import BPE_SEP, bpe_train

    words = spark.createDataFrame(
        [("low",)] * 2 + [("lower",)] + [("newest",)] * 3 + [("widest",)],
        "w string",
    )
    merges = bpe_train(words, rounds=4)
    assert merges == [
        (1, "e", "s", "es", 4),
        (2, "es", "t", "est", 4),
        (3, "e", "w", "ew", 3),
        (4, "ew", "est", "ewest", 3),
    ]

    # overlap: greedy leftmost on runs
    runs = spark.createDataFrame([("aaaa",), ("aaa",)], "w string")
    m2 = bpe_train(runs, rounds=1)
    assert m2 == [(1, "a", "a", "aa", 5)]  # 3 + 2 adjacent pairs

    # and the merged words after round 1 would be aa|aa and aa|a: verify
    # via a second round — best pair is now (aa, aa) from 'aaaa' (1) vs
    # (aa, a) from 'aaa' (1); tie broken left ASC -> ('aa','a')
    m3 = bpe_train(runs, rounds=2)
    assert m3[1] == (2, "aa", "a", "aaa", 1)
    assert BPE_SEP not in m3[1][3]


def test_max_coverage_greedy_invariants(spark, sf_dir):
    """Greedy max-coverage: marginal gains are non-increasing (coverage
    is submodular), picked docs are distinct, and the union of the
    winners' bigram sets has exactly sum(gains) elements."""
    from pyspark.sql import functions as F

    from phoebe_spark.operators.curation import greedy_max_coverage
    from phoebe_spark.operators.text import adjacent_bigrams, tokens
    from phoebe_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents")
    picks = greedy_max_coverage(d, rounds=4)
    gains = [g for _, _, g in picks]
    assert gains == sorted(gains, reverse=True)
    ids = [doc for _, doc, _ in picks]
    assert len(set(ids)) == len(ids)

    pairs = adjacent_bigrams(tokens(F.col("text")))
    n_union = (
        d.filter(F.col("doc_id").isin(ids))
        .select(F.explode(pairs).alias("t"))
        .distinct()
        .count()
    )
    assert n_union == sum(gains)


def test_registry_rotation_covers_everything_over_rounds():
    """The round-aware rotation must (a) keep every query + oracle present
    every round, (b) front a different 50-slice per round, and (c) give
    every query a front-window slot within ceil(N/50) + 3 rounds."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    names = sorted(mod.queries().keys(), key=mod._qnum)
    n = len(names)
    seen_in_window = set()
    # the offset now advances once per CERTIFIED round (count of
    # CORRECTNESS files), so a driver round whose artifacts never land
    # cannot skip a window; simulate certified counts 0, 1, 2, ...
    counts_needed = -(-n // 50) + 3
    for certified in range(0, counts_needed + 1):
        offset = (max(0, certified - 2) * 50) % n
        rotated = names[offset:] + names[:offset]
        assert sorted(rotated) == sorted(names)  # nothing dropped
        seen_in_window.update(rotated[:50])
    assert seen_in_window == set(names), (
        f"{len(set(names) - seen_in_window)} queries never reach the driver window"
    )
    # consecutive certified counts advance the window by exactly 50
    # (gap-free), beyond the warm-up plateau
    for certified in range(2, counts_needed):
        o1 = (max(0, certified - 2) * 50) % n
        o2 = (max(0, certified - 1) * 50) % n
        assert (o2 - o1) % n == 50
    # the live module agrees with the formula for the current state
    live = list(mod.queries())
    offset = (max(0, mod._certified_rounds() - 2) * 50) % n
    assert live == names[offset:] + names[:offset]


def test_leakage_safe_split_groups_atomic(spark, sf_dir):
    """Every fingerprint group lands WHOLLY in one split (the leakage-safety
    contract), the group's split equals hash_split of its min-id
    representative, and every doc keeps exactly one assignment."""
    from pyspark.sql import functions as F

    from phoebe_spark.operators import sampling
    from phoebe_spark.queries import _prefix_fp, _t

    d = _t(spark, sf_dir, "documents").select("doc_id", _prefix_fp().alias("fp"))
    s = sampling.leakage_safe_split(d, group_col="fp")
    assert s.count() == d.count()  # join back is 1:1 on fp

    spans = (
        s.groupBy("fp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0

    reps = s.select("fp", F.col("group_rep").alias("doc_id"), "split").distinct()
    expected = sampling.hash_split(reps.select("fp", "doc_id"), id_col="doc_id")
    mismatch = (
        reps.withColumnRenamed("split", "got")
        .join(expected.withColumnRenamed("split", "want"), ["fp", "doc_id"])
        .filter(F.col("got") != F.col("want"))
        .count()
    )
    assert mismatch == 0


def test_chunk_scrub_rebuild_reconstruction(spark):
    """Scrubbed rebuild equals hand-computed expectation: shared chunks
    vanish from every doc, unique chunks survive in original order, and a
    fully-boilerplate doc rebuilds to the empty string."""
    from pyspark.sql import functions as F

    from phoebe_spark.operators import dedup

    rows = [
        (1, "a b c d u1 u2 u3 u4"),   # chunk1 shared with doc 2, chunk2 unique
        (2, "a b c d v1 v2 v3 v4"),
        (3, "a b c d"),               # only the shared chunk -> empty rebuild
        (4, "w1 w2 w3 w4 w5"),        # 5 tokens -> 2 chunks (4+1), both unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.chunk_scrub_rebuild(df, chunk_words=4, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "u1 u2 u3 u4"
    assert (out[1]["n_chunks"], out[1]["n_removed"]) == (2, 1)
    assert out[2]["clean_text"] == "v1 v2 v3 v4"
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_chunks"], out[3]["n_removed"]) == (1, 1)
    assert out[4]["clean_text"] == "w1 w2 w3 w4 w5"
    assert out[4]["n_removed"] == 0


def test_kmeans_lloyd_converges_on_separated_blobs(spark):
    """On well-separated blobs, 2 Lloyd iterations recover the planted
    clustering exactly regardless of the (id-order) seeding, and the
    assignment is total: every vector gets exactly one cluster."""
    from pyspark.sql import functions as F

    from phoebe_spark.operators import similarity

    # two tight blobs far apart; ids interleave the blobs so the lowest-k
    # seeding starts with one seed in each blob
    rows = []
    for i in range(20):
        blob = i % 2
        base = [10.0 * blob] * 4
        rows.append((i, [base[0] + 0.01 * i, base[1], base[2], base[3]], blob))
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    fit = similarity.kmeans_lloyd(df, k=2, iters=2)
    got = {r["vec_id"]: r["cid"] for r in fit.collect()}
    assert len(got) == 20
    # planted blob -> one consistent cid (0/1 may swap with seeding order)
    blob_cids = {b: {got[i] for i, _, bb in rows if bb == b} for b in (0, 1)}
    assert all(len(c) == 1 for c in blob_cids.values())
    assert blob_cids[0] != blob_cids[1]


def test_kmeans_lloyd_empty_cluster_keeps_previous_centroid(spark):
    """If a cluster empties out (a seed that captures no points after the
    first update), its centroid carries over instead of NaN-ing: with
    k=3 on data forming 2 blobs where seed 2 duplicates seed 0, cluster 2
    captures nothing (ties break to the lower cid) and the fit must still
    return a total, finite assignment."""
    from phoebe_spark.operators import similarity

    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.0, 0.0])] + [
        (i, [0.1 * (i % 3), 0.0]) for i in range(3, 12)
    ] + [(i, [10.0 + 0.1 * (i % 3), 10.0]) for i in range(12, 20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fit = similarity.kmeans_lloyd(df, k=3, iters=2).collect()
    assert len(fit) == 20
    assert all(r["dist"] == r["dist"] for r in fit)  # no NaN
    assert all(r["cid"] in (0, 1, 2) for r in fit)
    # the far blob stays its own cluster throughout
    far = {r["cid"] for r in fit if r["vec_id"] == 1 or r["vec_id"] >= 12}
    assert far == {1}


def test_unigram_lm_hand_checked_corpus(spark):
    """A 3x-repeated word must survive whole ('ab' beats 'a'+'b' since
    ln(1/3) > 2*ln(1/3)); counts and smoothed re-scores are hand-computed."""
    from phoebe_spark.operators.text import unigram_lm_fit

    df = spark.createDataFrame([("ab ab ab",)], "text string")
    rows = {r["piece"]: r for r in unigram_lm_fit(df).collect()}
    assert set(rows) == {"ab"}
    r = rows["ab"]
    # n1 = 3 occurrences, 1 distinct word; l1 = floor(1e6*ln((3+1)/(3+1))) = 0
    assert (r["n1"], r["n_words"], r["l1_milli"]) == (3, 1, 0)


def test_unigram_lm_tie_breaks_to_earliest_split(spark):
    """With max_piece_len=2 the word 'abc' ties exactly between
    'ab'+'c' and 'a'+'bc' (all substrings count 1); the (score desc,
    split asc) rule must pick the EARLIER split, i.e. ['a','bc']."""
    from phoebe_spark.operators.text import unigram_lm_fit

    df = spark.createDataFrame([("abc",)], "text string")
    rows = {r["piece"]: r for r in unigram_lm_fit(df, max_piece_len=2).collect()}
    assert set(rows) == {"a", "bc"}
    # t = 2, p = 2 -> l1 = floor(1e6 * ln(2/4)) = -693148 for both
    assert rows["a"]["l1_milli"] == -693148
    assert rows["bc"]["l1_milli"] == -693148


def test_wordpiece_whole_word_wins(spark):
    """Greedy longest-match must take a full-word vocab piece in one
    bite: 'abab' x3 puts 'abab' itself in the vocab."""
    from phoebe_spark.operators.text import wordpiece_encode_census

    df = spark.createDataFrame([("abab abab abab",)], "text string")
    rows = {r["piece"]: r for r in wordpiece_encode_census(df).collect()}
    assert set(rows) == {"abab"}
    assert (rows["abab"]["n_uses"], rows["abab"]["n_words"]) == (3, 1)


def test_wordpiece_single_char_fallback_marks_continuations(spark):
    """With vocab_size=0 only the forced single-char alphabet remains:
    every word decomposes into chars, continuations marked '##'."""
    from phoebe_spark.operators.text import wordpiece_encode_census

    df = spark.createDataFrame([("abcd",)], "text string")
    rows = {r["piece"]: (r["n_uses"], r["n_words"])
            for r in wordpiece_encode_census(df, vocab_size=0).collect()}
    assert rows == {"a": (1, 1), "##b": (1, 1), "##c": (1, 1), "##d": (1, 1)}


def test_spearman_rho_bounds_and_perfect_agreement(spark):
    """rho must be exactly 1.0 when one signal is a monotone function of
    the other, and -1.0 when reversed (integer doubled-rank arithmetic
    makes these exact, not approximate)."""
    from pyspark.sql import functions as F

    from phoebe_spark.operators.curation import quality_signal_agreement

    df = spark.createDataFrame(
        [("a", i, "x" * (i + 1)) for i in range(10)]
        + [("b", i, "x" * (20 - i)) for i in range(10)],
        "source string, k int, text string",
    )
    rows = {
        r["source"]: r["spearman_rho"]
        for r in quality_signal_agreement(
            df, x_col=F.col("k"), y_col=F.length("text")
        ).collect()
    }
    assert rows == {"a": 1.0, "b": -1.0}


def test_neardup_decontaminate_catches_paraphrase(spark):
    """A corpus doc sharing most 3-grams with a benchmark doc must be
    flagged with the exact Jaccard; an unrelated doc must not."""
    from phoebe_spark.operators.dedup import neardup_decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different words about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    rows = neardup_decontaminate(corpus, bench, threshold=0.2).collect()
    assert [(r["corpus_doc"], r["bench_doc"]) for r in rows] == [(1, 100)]
    # 8 grams each, 7 shared -> J = 7/9
    assert abs(rows[0]["jaccard"] - 7 / 9) < 1e-6


def test_power_iteration_finds_planted_direction(spark):
    """On vectors lying exactly along axis 2 (plus a tiny axis-1
    component), two power iterations must concentrate on dim 2 at max
    scale and keep every other dim small."""
    from phoebe_spark.operators.similarity import dominant_direction

    rows = [(i, [0.001, 1.0, 0.0, 0.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = {r["dim"]: r["v_milli"] for r in dominant_direction(df).collect()}
    assert v[2] == 1_000_000  # the max-normalized dominant axis
    assert abs(v[1]) < 10_000 and v[3] == 0 and v[4] == 0


def test_quantile_normalize_properties(spark):
    """Rank-1 maps to the global min, rank-n to the global max; a
    single-doc source maps to the global median value; normalized
    scores are always values from the global score set."""
    from pyspark.sql import functions as F

    from phoebe_spark.operators.curation import quantile_normalize

    rows = (
        [(i, "a", "x" * (10 + i)) for i in range(9)]       # lengths 10..18
        + [(100, "b", "x" * 5)]                            # global min, single-doc source? no: source b
        + [(101, "b", "x" * 99)]                           # global max
        + [(200, "c", "x" * 50)]                           # single-doc source
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in quantile_normalize(df).collect()}
    all_scores = sorted(len(t) for _, _, t in rows)
    # source a's lowest/highest docs hit the global extremes
    assert out[0]["norm_score"] == all_scores[0] == 5
    assert out[8]["norm_score"] == all_scores[-1] == 99
    # single-doc source c maps to the median rank value
    n = len(all_scores)
    t = 1 + ((2 * (n - 1) + 2) // 4)
    assert out[200]["norm_score"] == all_scores[t - 1]
    # closure: every normalized value is an observed global value
    assert {r["norm_score"] for r in out.values()} <= set(all_scores)


def test_waterfill_fills_budget_with_floor_slack(spark):
    """sum(alloc) must land within m of the budget (floor slack only),
    small sources are taken whole, large ones cut to a common level."""
    from phoebe_spark.queries import QUERIES

    out = QUERIES["q227_token_waterfill"](spark, "/root/testdata/sf0.001").collect()
    total = sum(r["n_tokens"] for r in out)
    b = total // 2
    got = sum(r["alloc"] for r in out)
    m = len(out)
    assert b - m < got <= b
    cut = [r for r in out if r["alloc"] < r["n_tokens"]]
    whole = [r for r in out if r["alloc"] == r["n_tokens"]]
    assert cut, "budget < total must force cuts"
    # every cut source is capped at the same tau
    assert len({r["alloc"] for r in cut}) == 1
    # max-min fairness: every whole source is <= the cap level
    tau = cut[0]["alloc"]
    assert all(r["n_tokens"] <= tau for r in whole)


def test_apportionment_sums_to_budget_and_near_proportional(spark):
    """Hamilton quotas must sum exactly to the budget and differ from
    exact proportionality by less than 1 per source (quota property)."""
    from phoebe_spark.queries import QUERIES

    out = QUERIES["q231_eval_apportionment"](spark, "/root/testdata/sf0.001").collect()
    total = sum(r["n_docs"] for r in out)
    assert sum(r["quota"] for r in out) == 200
    for r in out:
        exact = 200 * r["n_docs"] / total
        assert abs(r["quota"] - exact) < 1
