"""Text-analysis operators over a documents table.

These are the LLM-training-data-pipeline extensions: all implemented as
JVM-side column expressions (no Python UDFs in the hot path) so a 100 TB
documents scan stays in whole-stage codegen with full column pruning.

Schema convention: ``documents(doc_id BIGINT, text STRING, lang STRING,
source STRING, n_chars BIGINT)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword sets for the n-gram/stopword language
# heuristic. Kept small and explicit so the oracle SQL can mirror them.
_EN_STOPWORDS = ("the", "a", "of", "and", "to")


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def adjacent_bigrams(toks: Column, distinct: bool = True) -> Column:
    """Space-joined adjacent token pairs from a token-array column.

    Built as ``zip_with`` over two slices, NOT ``transform`` +
    ``element_at``: when ``toks`` is an expression (e.g. the regex split
    from :func:`tokens`), an ``element_at`` lambda re-evaluates it per
    element — O(len²) splits per document (measured 8.3s -> 0.9s at
    sf0.1 on the q146 corpus for this one change). ``zip_with``
    evaluates each slice argument once per row."""
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.array_distinct(grams) if distinct else grams


def adjacent_trigrams(toks: Column, distinct: bool = False) -> Column:
    """Space-joined adjacent token triples from a token-array column —
    the 3-gram sibling of :func:`adjacent_bigrams`, built with the same
    ``zip_with``-over-slices idiom so an expression-valued ``toks`` is
    evaluated once per row, never once per element (the O(len²)
    ``transform`` + ``element_at`` trap; measured 10.4 s -> ~2 s at
    sf0.1 on the q388 trigram census for this one change)."""
    n = F.greatest(F.size(toks) - 2, F.lit(0))
    grams = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, n),
            F.slice(toks, 2, n),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        F.slice(toks, 3, n),
        lambda ab, c: F.concat_ws(" ", ab, c),
    )
    return F.array_distinct(grams) if distinct else grams


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token count, char count, average token length, and
    punctuation ratio — the quality-signal primitives."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    n_punct = n_char - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    return df.select(
        "*",
        n_tok.alias("token_count"),
        n_char.alias("char_count"),
        F.when(n_tok > 0, (n_char - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0)).alias("avg_token_len"),
        F.when(n_char > 0, n_punct / n_char).otherwise(F.lit(0.0)).alias("punct_ratio"),
    )


# GPT-2-style pre-tokenizer approximation, restricted to syntax RE2 and
# Java regex agree on (no lookarounds, ASCII classes): contraction tails,
# letter runs, single digits, punctuation runs. Counting its matches
# estimates BPE token count to first order (BPE merges only ever split
# within these pre-token boundaries).
BPE_SPLIT_RE = r"'(?:s|d|m|t|ll|ve|re)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(text_col: Column) -> Column:
    """Estimated subword (BPE) token count: matches of the GPT-2-ish
    pre-tokenizer regex. Pure ``regexp_count`` — stays in codegen; the
    identical pattern runs in DuckDB via ``regexp_extract_all`` for the
    oracle."""
    return F.regexp_count(text_col, F.lit(BPE_SPLIT_RE))


def stopword_ratio(text_col: Column, stopwords: tuple[str, ...] = _EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [-0.25, 1] (the punctuation penalty can
    push punctuation-only text below zero; the q10 oracle reproduces the
    raw arithmetic, so no clamp here — clamp downstream if a [0, 1] range
    is required): rewards mid-length documents with a healthy stopword
    ratio and low punctuation density. Deterministic arithmetic only —
    oracle-checkable."""
    s = token_stats(df, text_col)
    sw = stopword_ratio(F.col(text_col))
    len_score = F.least(F.col("token_count") / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    punct_penalty = F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))
    return s.select(
        "*",
        sw.alias("stopword_ratio"),
        (0.5 * len_score + 0.5 * sw_score - 0.25 * punct_penalty).alias("quality_score"),
    )


def predict_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-frequency language heuristic: 'en' when English stopwords
    exceed 3% of tokens, else 'other'. (A full n-gram profile model slots
    in here later; the operator contract — pure column expr over the text
    column — is what matters at scale.)"""
    sw = stopword_ratio(F.col(text_col))
    return df.select(
        "*",
        F.when(sw > 0.03, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercase text. md5 is available identically in Spark and DuckDB, which
    makes the fingerprint oracle-checkable end-to-end."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


# PII patterns shared by the Spark expressions and the DuckDB oracle —
# intentionally lookaround-free so Java regex and RE2 agree.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
PII_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    """PII redaction for training corpora: emails, phone-number shapes, and
    IPv4 literals replaced with typed placeholder tokens, with per-doc
    match counts for audit. Pure ``regexp_replace``/``regexp_count``
    column expressions — single pass, whole-stage codegen, and the exact
    patterns re-run in DuckDB for the oracle (q57)."""
    t = F.col(text_col)
    cleaned = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    cleaned = F.regexp_replace(cleaned, PII_IPV4_RE, "<IP>")
    cleaned = F.regexp_replace(cleaned, PII_PHONE_RE, "<PHONE>")
    return df.select(
        "*",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).alias("n_ips"),
        F.regexp_count(F.regexp_replace(F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_IPV4_RE, "<IP>"), F.lit(PII_PHONE_RE)).alias("n_phones"),
        cleaned.alias(out_col),
    )


def unigram_logprob_scores(
    df: DataFrame,
    lm: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = False,
    oov_logp: float = -20.0,
) -> DataFrame:
    """CCNet-style unigram language-model scoring (Wenzek et al. 2020,
    arXiv 1911.00359): each document's quality signal is the mean negative
    log-probability of its tokens under a unigram LM — high values flag
    gibberish / OOV-heavy text for the perplexity-bucket filter every
    large pretraining corpus runs.

    ``lm`` is a (term, logp) frame; when None the LM is fit on ``df``
    itself (self-perplexity) with one map-side-combining groupBy over the
    exploded tokens plus a 1-row total joined back as a broadcast scalar.
    Scoring is explode -> join(term) -> groupBy(doc): with a trained LM
    the vocabulary is bounded, so pass ``broadcast_lm=True`` to make the
    probe a map-side broadcast join (the 100 TB deployment shape —
    corpus never shuffles on terms); self-fit vocab grows with the corpus,
    so it defaults to a shuffled equi-join AQE can re-plan.
    """
    toks = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    if lm is None:
        # materialize the vocab counts once (the fitted model artifact):
        # total and scoring both read it, so the corpus scans exactly
        # twice — once to fit, once to score — instead of three times
        counts = (
            toks.groupBy("term")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
        total = counts.agg(F.sum("cnt").alias("tot"))
        lm = counts.crossJoin(F.broadcast(total)).select(
            "term", F.log(F.col("cnt") / F.col("tot")).alias("logp")
        )
    probe = F.broadcast(lm) if broadcast_lm else lm
    # LEFT join: with a provided LM, out-of-vocabulary tokens are exactly
    # the gibberish signal this operator exists to flag — an inner join
    # would silently skip them (and drop all-OOV documents entirely).
    # Misses score at the ``oov_logp`` floor; self-fit LMs have no OOV, so
    # the default path is unaffected.
    return (
        toks.join(probe, "term", "left")
        .groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.coalesce(F.col("logp"), F.lit(float(oov_logp)))).alias(
                "avg_neg_logprob"
            ),
        )
    )


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-``k`` word ``n``-grams by frequency (heavy
    hitters) with a deterministic tie-break (count desc, gram asc) — the
    boilerplate / template-phrase census a curation pipeline runs before
    writing removal rules.

    Scale notes: gram construction is exchange-free codegen (transform +
    slice per row); the count is one map-side-combining groupBy on the
    gram string, and the global top-k is a TakeOrdered over the partial
    per-partition top-k — O(k) to the driver, never a full sort of the
    gram table.
    """
    toks = df.select(tokens(F.col(text_col)).alias("t")).filter(F.size("t") >= n)
    grams = toks.select(
        F.explode(
            F.expr(f"transform(sequence(1, size(t) - {n - 1}), i -> array_join(slice(t, i, {n}), ' '))")
        ).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("gram").asc()).limit(k)


def zipf_slope(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    ln(frequency) on ln(rank), rank assigned by (count desc, term asc) —
    natural-language corpora land near -1; templated/synthetic text
    drifts far from it, making this a cheap corpus-health check.

    One explode + map-side-combining term count, a vocabulary-sized
    row_number window, and a single regr_slope/regr aggregate: the heavy
    shuffle is on terms (bounded by vocabulary, not corpus size)."""
    from pyspark.sql import Window

    toks = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("term").asc())),
    )
    return ranked.agg(
        F.expr("regr_slope(ln(cnt), ln(rank))").alias("zipf_slope"),
        F.expr("regr_intercept(ln(cnt), ln(rank))").alias("zipf_intercept"),
        F.count(F.lit(1)).alias("n_terms"),
    )


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a literal query term set
    (Robertson-Sparck Jones idf: ln(1 + (N - df + 0.5)/(df + 0.5))) — the
    lexical half of a hybrid retrieval stack (fuse with the dense half via
    :func:`phoebe_spark.operators.similarity.rrf_fusion`).

    Plan shape: one tokenize pass feeds both the doc-length table and the
    query-term tf counts (the term filter prunes the tf branch inside the
    scan); df and corpus stats are tiny aggregates broadcast back. Each
    term's contribution is rounded then summed as DECIMAL(18,6) — exact
    and order-independent, so scores are bit-stable across partition
    layouts, retries, and engines. Only docs containing >= 1 query term
    appear (score > 0)."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    dl = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.round(F.avg("dl"), 6).alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.countDistinct("doc").alias("df"))
    sc = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        sc.withColumn("_c", F.round(contrib, 6).cast("decimal(18,6)"))
        .groupBy(F.col("doc").alias(id_col))
        .agg(F.sum("_c").cast("double").alias("bm25"))
    )


def token_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    the lexical-diversity signal: low entropy flags repetitive/templated
    text (complements the q61 repetition stats), high entropy flags
    random-token garbage.

    One shuffle on (doc, term); the doc-total then comes from a window
    over the same doc key (no second aggregate pass). Contributions are
    rounded and summed as DECIMAL(18,6): order-independent, engine-exact."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    c = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("c"))
    c = c.withColumn("n", F.sum("c").over(Window.partitionBy("doc")))
    p = F.col("c").cast("double") / F.col("n")
    contrib = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        c.withColumn("_e", contrib)
        .groupBy(F.col("doc").alias(id_col))
        .agg(
            F.sum("_e").cast("double").alias("token_entropy"),
            F.max("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )


def source_kl(df: DataFrame, group_col: str = "source", text_col: str = "text") -> DataFrame:
    """Domain-shift census: KL divergence of each source's term
    distribution from the whole-corpus distribution,
    ``sum_t P_s(t) ln(P_s(t)/P(t))`` — the mixture-health check run when
    a new data drop lands (a source drifting from the corpus either
    carries novel content or rot). Every source term also occurs in the
    corpus distribution, so the KL is always finite.

    Shuffles: one on (source, term), one on term for the corpus totals;
    the corpus distribution joins back on term (AQE-broadcast when the
    vocabulary is small). DECIMAL contribution sums keep results
    bit-stable across layouts and engines."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(group_col).alias("src"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    st = toks.groupBy("src", "term").agg(F.count(F.lit(1)).alias("c"))
    st = st.withColumn("n", F.sum("c").over(Window.partitionBy("src")))
    ct = st.groupBy("term").agg(F.sum("c").alias("cc"))
    cn = ct.agg(F.sum("cc").alias("cnn"))
    j = st.join(ct, "term").crossJoin(F.broadcast(cn))
    ps = F.col("c").cast("double") / F.col("n")
    pc = F.col("cc").cast("double") / F.col("cnn")
    contrib = F.round(ps * F.log(ps / pc), 6).cast("decimal(18,6)")
    return (
        j.withColumn("_k", contrib)
        .groupBy(F.col("src").alias(group_col))
        .agg(
            F.sum("_k").cast("double").alias("kl_vs_corpus"),
            F.max("n").alias("n_tokens"),
        )
    )


# Symbol enclosure sentinels: every symbol is stored as SEP_L + sym + SEP_R,
# so a merge pattern carries BOTH symbol boundaries. (A prefix-only sentinel
# is subtly wrong: pattern SEP+l+SEP+r also fires when the next symbol merely
# STARTS with r — e.g. applying merge (ab, a) to symbols [ab, ab, a] would
# corrupt the first two symbols into "abab".) Control chars never appear in
# whitespace-split tokens.
BPE_SEP = "\x1f"  # left boundary (unit separator)
BPE_END = "\x1e"  # right boundary (record separator)


def bpe_train(words: DataFrame, rounds: int = 5, word_col: str = "w") -> list[tuple]:
    """Iterative BPE merge learning at corpus scale (Sennrich et al. 2016,
    arXiv 1508.07909 — public): run ``rounds`` merge rounds over a corpus
    of words, each round (1) counting every adjacent symbol pair with a
    distributed map-side-combined groupBy, (2) picking the most frequent
    pair (ties broken (count DESC, left ASC, right ASC) so the learned
    vocabulary is deterministic), and (3) applying the merge greedily
    left-to-right to every word. Returns the learned merge table
    ``[(round, left, right, merged, count), ...]`` — the artifact a BPE
    tokenizer trainer ships.

    Representation trick that keeps the merge step in pure codegen: each
    word is a single string of sentinel-ENCLOSED symbols
    (``\\x1f + sym + \\x1e`` per symbol), so the greedy leftmost
    non-overlapping merge of pair (a, b) IS literal string
    ``replace(w, L+a+R+L+b+R, L+ab+R)`` — both engines' ``replace``
    scans left-to-right and continues after each replacement, which is
    exactly BPE's application order, and the enclosing boundaries make
    the pattern match whole symbols only (prefix-sharing symbols like
    "a" vs "ab" cannot false-match). No per-row Python, no array
    rebuilds.

    Scale notes — the trainer runs on the DISTINCT-WORD FREQUENCY TABLE,
    not the token stream (Sennrich's own implementation does the same):
    one corpus-scale map-side-combined groupBy collapses the stream to
    (word, freq) — vocabulary-sized, bounded by the language, not the
    corpus — and every round after that explodes/counts/merges only the
    vocab frame with pair counts weighted by freq. Corpus size affects
    the initial collapse ONLY; at 100 TB each merge round still touches
    ~100k rows. The 1-row argmax collect per round is a model parameter
    fetch, not a data collect; the vocab re-aggregates after each merge
    (distinct pre-merge words can collide into one post-merge spelling)
    and re-checkpoints so lineage stays O(1) across rounds (the q53/q118
    iterative-algorithm discipline).
    """
    w = F.col(word_col)
    # empty words must be excluded: sequence(1, 0) DESCENDS to [1, 0] in
    # Spark, so '' would encode as two phantom empty symbols and inject
    # bogus ('','') pairs into the merge statistics
    words = words.filter(F.length(w) >= 1)
    cur = (
        words.select(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.length(w)),
                    lambda i: F.concat(
                        F.lit(BPE_SEP), F.substring(w, i, F.lit(1)), F.lit(BPE_END)
                    ),
                ),
                "",
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )

    merges: list[tuple] = []
    for rnd in range(1, rounds + 1):
        # adjacent pairs via zip_with over two slices: syms is an
        # EXPRESSION (split + filter), and an element_at lambda would
        # re-evaluate it per element — O(len²) splits per word (the q146
        # higher-order-function trap); zip_with evaluates each slice
        # argument once per row
        syms = F.transform(
            F.filter(F.split(F.col("w"), BPE_END), lambda x: x != ""),
            lambda x: F.translate(x, BPE_SEP, ""),
        )
        prs = F.zip_with(
            F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("l_sym"), b.alias("r_sym")),
        )
        best = (
            cur.select(F.explode(prs).alias("p"), "freq")
            .groupBy(F.col("p.l_sym").alias("l_sym"), F.col("p.r_sym").alias("r_sym"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("l_sym"), F.asc("r_sym"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l_sym, r_sym, n = best[0]["l_sym"], best[0]["r_sym"], best[0]["n"]
        merges.append((rnd, l_sym, r_sym, l_sym + r_sym, int(n)))
        cur = (
            cur.select(
                F.replace(
                    F.col("w"),
                    F.lit(BPE_SEP + l_sym + BPE_END + BPE_SEP + r_sym + BPE_END),
                    F.lit(BPE_SEP + l_sym + r_sym + BPE_END),
                ).alias("w"),
                "freq",
            )
            .groupBy("w")
            .agg(F.sum("freq").alias("freq"))
            .localCheckpoint(eager=True)
        )
    return merges


def unigram_lm_fit(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    max_word_len: int = 8,
) -> DataFrame:
    """One EM round of a SentencePiece-style UNIGRAM-LM tokenizer
    (Kudo 2018, "Subword Regularization" — public), engine-exact:

    - candidate pieces = every substring of length 1..``max_piece_len``
      of the distinct words, seeded with occurrence-weighted counts;
    - E-step = Viterbi segmentation of each distinct word under
      floor-quantized integer log-probs (``floor(1e6*ln(c/total))``),
      ties broken by (score desc, split position asc — i.e. longest
      last piece), so the DP is bit-deterministic;
    - M-step = re-count pieces from the Viterbi segmentations weighted
      by word frequency, emit smoothed re-scored pieces.

    Returns (piece, n1, n_words, l1_milli): the surviving piece table.
    Completes the tokenizer ladder next to :func:`bpe_train` — BPE grows
    greedily bottom-up, unigram prunes top-down from all substrings.

    Scale shape: the corpus contributes ONE map-side-combining word
    count; everything after runs on the distinct-word frame (vocabulary-
    bounded, like the BPE merge table). The whole Viterbi DP runs INSIDE
    one codegen ``aggregate`` higher-order expression per word — pieces
    are collected per word (≤ ``max_word_len * max_piece_len`` structs)
    and the position loop folds over them JVM-side, so the E-step is a
    single shuffle with no iterative job chain. At each position the
    winner is ``array_max`` over candidate structs ordered
    ``(score, -prev_pos, …)`` — exactly the (score desc, split asc)
    tie-break, and since each candidate at a position comes from a
    distinct split the key is strict. Words longer than ``max_word_len``
    are truncated-out (disclosed; raise the bound for natural-language
    corpora)."""
    tok = docs.select(F.explode(F.split(text_col, " ")).alias("w")).filter(
        F.col("w") != ""
    )
    words = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .withColumn("wlen", F.length("w"))
        .filter(F.col("wlen") <= max_word_len)
        .localCheckpoint(eager=True)
    )
    # all (word, start j, stop i) piece occurrences, 1-based substring
    occ = (
        words.select(
            "w",
            "cw",
            "wlen",
            F.explode(F.sequence(F.lit(0), F.col("wlen") - 1)).alias("j"),
        )
        .select(
            "w",
            "cw",
            "wlen",
            "j",
            F.explode(
                F.sequence(
                    F.col("j") + 1,
                    F.least(F.col("j") + max_piece_len, F.col("wlen")),
                )
            ).alias("i"),
        )
        .withColumn(
            "piece", F.expr("substring(w, j + 1, i - j)")
        )
    )
    c0 = occ.groupBy("piece").agg(F.sum("cw").alias("c"))
    t0 = c0.agg(F.sum("c").alias("t"))
    l0 = c0.crossJoin(F.broadcast(t0)).select(
        "piece",
        F.floor(1e6 * F.log(F.col("c") * 1.0 / F.col("t")))
        .cast("long")
        .alias("l"),
    )
    so = occ.join(F.broadcast(l0), "piece").select("w", "j", "i", "piece", "l")

    # One collect per word, then the entire position-by-position DP as a
    # codegen fold: acc is the best (score, -split, seg) per prefix
    # position; array_max over the candidates ending at each position IS
    # the (score desc, split asc) winner rule of the stepwise DP.
    per_word = so.groupBy("w").agg(
        F.collect_list(F.struct("j", "i", "l", "piece")).alias("ps")
    )
    dp = F.expr(
        """
        aggregate(
          sequence(1, wlen),
          array(named_struct(
            'score', CAST(0 AS BIGINT),
            'negj', CAST(0 AS BIGINT),
            'seg', CAST(array() AS array<string>))),
          (acc, i) -> array_append(acc,
            array_max(transform(
              filter(ps, p -> p.i = i),
              p -> named_struct(
                'score', element_at(acc, p.j + 1).score + p.l,
                'negj', -CAST(p.j AS BIGINT),
                'seg', array_append(element_at(acc, p.j + 1).seg, p.piece))))),
          acc -> element_at(acc, wlen + 1).seg
        )
        """
    )
    fin = per_word.join(words, "w").select("w", "cw", dp.alias("seg"))
    rc = fin.select("w", "cw", F.explode("seg").alias("piece"))
    n1 = rc.groupBy("piece").agg(
        F.sum("cw").alias("n1"),
        F.countDistinct("w").alias("n_words"),
    )
    tot1 = n1.agg(
        F.sum("n1").alias("t"), F.count(F.lit(1)).alias("p")
    )
    return n1.crossJoin(F.broadcast(tot1)).select(
        "piece",
        "n1",
        "n_words",
        F.floor(1e6 * F.log((F.col("n1") + 1.0) / (F.col("t") + F.col("p"))))
        .cast("long")
        .alias("l1_milli"),
    )


def wordpiece_encode_census(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    max_piece_len: int = 4,
    max_word_len: int = 8,
) -> DataFrame:
    """WordPiece greedy longest-match-first encoding census (Wu et al.
    2016, public; the BERT tokenizer's inference rule), engine-exact:

    - vocab = the ``vocab_size`` most frequent marked substrings of the
      distinct words (continuation pieces carry the ``##`` prefix, start
      pieces don't; ties broken (count desc, piece asc)) PLUS every
      single-character piece, so greedy matching can never dead-end and
      no [UNK] token is needed;
    - encoding = per word, repeatedly take the LONGEST vocab piece
      matching at the cursor (longest-match-first, the WordPiece rule —
      unlike BPE's merge-order replay or unigram's Viterbi argmax);
    - output = the piece usage census over the corpus:
      (piece, n_uses, n_words), occurrence-weighted.

    Completes the tokenizer ladder: BPE (bottom-up merge replay,
    :func:`bpe_train`), unigram-LM (top-down Viterbi,
    :func:`unigram_lm_fit`), WordPiece (greedy longest-match).

    A word that itself starts with ``##`` collides with a continuation
    piece in the count table — the stock WordPiece ambiguity, kept
    as-is (disclosed; both this and the oracle share it).

    Scale shape: ONE map-side-combining word count over the corpus; the
    vocab is bounded (``vocab_size`` + alphabet) and rides along as a
    broadcast single-row map; the greedy loop folds inside one codegen
    ``aggregate`` HOF per word (each tick advances >= 1 char, so
    ``max_word_len`` ticks suffice) — no iterative job chain, no UDF."""
    tok = docs.select(F.explode(F.split(text_col, " ")).alias("w")).filter(
        F.col("w") != ""
    )
    words = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .withColumn("wlen", F.length("w"))
        .filter(F.col("wlen") <= max_word_len)
        .localCheckpoint(eager=True)
    )
    occ = (
        words.select(
            "w",
            "cw",
            "wlen",
            F.explode(F.sequence(F.lit(0), F.col("wlen") - 1)).alias("j"),
        )
        .select(
            "w",
            "cw",
            "wlen",
            "j",
            F.explode(
                F.sequence(
                    F.col("j") + 1,
                    F.least(F.col("j") + max_piece_len, F.col("wlen")),
                )
            ).alias("i"),
        )
        .withColumn(
            "piece",
            F.when(
                F.col("j") == 0, F.expr("substring(w, j + 1, i - j)")
            ).otherwise(F.concat(F.lit("##"), F.expr("substring(w, j + 1, i - j)"))),
        )
    )
    pc = occ.groupBy("piece").agg(F.sum("cw").alias("cnt"))
    topv = (
        pc.orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(vocab_size)
        .select("piece")
    )
    singles = occ.filter(F.col("i") - F.col("j") == 1).select("piece").distinct()
    vocab = topv.unionByName(singles).distinct()
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.lit(True)))
        ).alias("vmap")
    )

    def _mk(length: int) -> str:
        s = f"substring(w, acc.pos + 1, {length})"
        return f"CASE WHEN acc.pos = 0 THEN {s} ELSE '##' || {s} END"

    def _hit(length: int) -> str:
        return (
            f"acc.pos + {length} <= wlen AND "
            f"try_element_at(vmap, {_mk(length)}) IS NOT NULL"
        )

    pick = "CASE " + " ".join(
        f"WHEN {_hit(l)} THEN {_mk(l)}"
        for l in range(max_piece_len, 1, -1)
    ) + f" ELSE {_mk(1)} END"
    dp = F.expr(
        f"""
        aggregate(
          sequence(1, wlen),
          named_struct('pos', 0, 'seg', CAST(array() AS array<string>)),
          (acc, t) -> CASE WHEN acc.pos >= wlen THEN acc ELSE
            named_struct(
              'pos', acc.pos + length({pick})
                       - CASE WHEN acc.pos > 0 THEN 2 ELSE 0 END,
              'seg', array_append(acc.seg, {pick}))
            END,
          acc -> acc.seg
        )
        """
    )
    enc = words.crossJoin(F.broadcast(vmap)).select("w", "cw", dp.alias("seg"))
    rc = enc.select("w", "cw", F.explode("seg").alias("piece"))
    return rc.groupBy("piece").agg(
        F.sum("cw").alias("n_uses"),
        F.countDistinct("w").alias("n_words"),
    )
