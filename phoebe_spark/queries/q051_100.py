"""Query registry block 051-100 (mechanically split from the former
single-module registry in round 9; see ``_core`` for the decorator,
the registry dicts, and the float-determinism policy)."""

from __future__ import annotations


from phoebe_spark.operators import dedup, graph, sampling, similarity, text

from pyspark.sql import DataFrame, SparkSession, Window
from phoebe_spark.timeseries import aggregates as ts_agg
from phoebe_spark.timeseries import anomaly as ts_anom
from phoebe_spark.timeseries import core as ts_core
from pyspark.sql import functions as F

from ._core import EPOCH_SQL, _dec, _dim, _dsum2, _epoch, _t, query
from .q001_050 import _TOKS_SQL

@query(
    "q51_winnow_fingerprints",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    p AS (
      SELECT doc_id, t, unnest(range(1, length(t) - 8 + 2)) AS pos
      FROM d WHERE length(t) >= 11
    ),
    g AS (
      SELECT doc_id, pos,
             (((((((CAST(ord(substr(t, pos, 1)) AS BIGINT)
               * 131 + ord(substr(t, pos + 1, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 2, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 3, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 4, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 5, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 6, 1))) % 2147483647
               * 131 + ord(substr(t, pos + 7, 1))) % 2147483647 AS h
      FROM p
    ),
    w AS (
      SELECT doc_id, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             max(pos) OVER (PARTITION BY doc_id) AS mx
      FROM g
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM w WHERE pos <= mx - 3)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp, bit_xor(fp) AS fp_xor,
           min(fp) AS min_fp
    FROM fps GROUP BY doc_id
    """,
)
def q51_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash document fingerprints (MOSS; the classic
    substring-level near-dup fingerprint for training corpora), k=8 char
    grams, window=4, via :func:`dedup.winnow_fingerprints`. Compacted to
    per-doc (count, xor, min) of the fingerprint set so the oracle compare
    is value-sensitive to every fingerprint without ferrying the full set."""
    d = _t(spark, sf_dir, "documents")
    fps = dedup.winnow_fingerprints(d, k=8, window=4)
    return fps.groupBy(F.col("doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.bit_xor("fp").alias("fp_xor"),
        F.min("fp").alias("min_fp"),
    )


@query(
    "q52_token_counts",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens,
           len(regexp_extract_all(text,
               '''(?:s|d|m|t|ll|ve|re)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens,
           length(text) AS chars
    FROM documents
    """,
)
def q52_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens plus
    the GPT-2-ish pre-tokenizer match count (:func:`text.bpe_token_count`)
    — the standard first-order BPE token estimate. Both are single-pass
    column expressions over the documents scan."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(text.tokens(F.col("text"))).alias("ws_tokens"),
        text.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        F.length("text").alias("chars"),
    )


@query(
    "q53_dedup_components",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings) a
      JOIN (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings) b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (a.nrm * b.nrm) >= 0.45
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(doc, lbl) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc = e.d
    )
    SELECT doc AS doc_id, min(lbl) AS component
    FROM reach GROUP BY doc
    """,
)
def q53_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clusters: embedding near-dup pairs (q41's exact >= 0.45
    cosine) closed into connected components via iterative min-label
    propagation (:func:`dedup.dedup_components`). The oracle computes the
    same components with a recursive reachability CTE, so the iterative
    Spark algorithm is checked end-to-end against a declarative fixpoint."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.all_pairs_cosine(emb, threshold=0.45)
    comp = dedup.dedup_components(pairs, id_col_a="id_a", id_col_b="id_b")
    return comp.select(F.col("doc").alias("doc_id"), "component")


@query(
    "q54_asof_join",
    oracle=f"""
    WITH m AS (
      SELECT event_type, CAST(floor({EPOCH_SQL.format(c='ts')} / 60) AS BIGINT) AS minute,
             round(sum(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, minute, v FROM m WHERE minute % 5 = 0)
    SELECT l.event_type, l.minute, l.v AS minute_sum,
           r.v AS checkpoint_sum_asof
    FROM m l ASOF LEFT JOIN r
      ON l.event_type = r.event_type AND l.minute >= r.minute
    """,
)
def q54_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic backward as-of join (:func:`ts_core.asof_join`, the pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` operator): every per-minute sum
    picks up the most recent 5-minute checkpoint at or before it, per
    event_type. Checked against DuckDB's native ASOF LEFT JOIN — ties
    inclusive, leading rows null. The union-tag plan shuffles once on the
    key; no range cross-product."""
    e = _t(spark, sf_dir, "events")
    m = (
        e.withColumn("minute", F.floor(_epoch() / 60).cast("long"))
        .groupBy("event_type", "minute")
        .agg(F.round(F.sum("value"), 6).alias("minute_sum"))
    )
    r = m.filter(F.col("minute") % 5 == 0).select(
        "event_type", "minute", F.col("minute_sum").alias("checkpoint_sum")
    )
    out = ts_core.asof_join(
        m, r, on="minute", by=["event_type"], value_cols=["checkpoint_sum"]
    )
    return out.select("event_type", "minute", "minute_sum", "checkpoint_sum_asof")


@query(
    "q55_hash_split",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|v1'), 1, 15)) AS BIGINT)
               % 10000 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM b GROUP BY 1
    """,
)
def q55_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (:func:`sampling.hash_split`):
    salted md5 bucket cut, reproducible across runs, partitionings, and
    engines — the 100 TB-safe alternative to rand()/sample() splits. The
    oracle recomputes the identical assignment in DuckDB; aggregated per
    split so the compare is sensitive to every row's label."""
    d = _t(spark, sf_dir, "documents")
    s = sampling.hash_split(d, id_col="doc_id")
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "q56_salted_agg",
    oracle=f"""
    SELECT event_type, round(sum(value), 6) AS sum_value,
           CAST(count(*) AS BIGINT) AS count
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def q56_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (:func:`skew.salted_aggregate`):
    groupBy(key, salt) partials then groupBy(key) combine. The oracle is
    the PLAIN single-phase GROUP BY — proving the salted plan is
    result-identical while its first shuffle spreads each hot key over 32
    reducers (the 100 TB answer to power-law keys when AQE's skew split
    isn't available, e.g. pre-shuffle cardinality explosions)."""
    from phoebe_spark.operators import skew

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = skew.salted_aggregate(e, keys=["event_type"], sum_cols=["value"])
    return out.select(
        "event_type",
        F.round("sum_value", 6).alias("sum_value"),
        F.col("count"),
    )


@query(
    "q57_pii_scrub",
    oracle=r"""
    WITH planted AS (
      SELECT doc_id,
             text || CASE
               WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
               WHEN doc_id % 11 = 0 THEN ' call +1 (415) 555-0100 soon'
               WHEN doc_id % 13 = 0 THEN ' host 192.168.0.1 up'
               ELSE '' END AS text
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
               '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS clean_text,
             len(regexp_extract_all(
               regexp_replace(
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
               '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS n_phones
      FROM planted
    )
    SELECT doc_id, n_emails, n_ips, n_phones, md5(clean_text) AS clean_md5
    FROM scrubbed
    """,
)
def q57_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (:func:`text.scrub_pii`) with deterministically planted
    emails / phone shapes / IPv4 literals so the replacement paths are
    exercised, not just counted as zero. The md5 of the cleaned text makes
    the oracle compare sensitive to every replaced character. Single-pass
    regexp expressions — at 100 TB this runs inside the documents scan."""
    d = _t(spark, sf_dir, "documents")
    suffix = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com now")),
        )
        .when(F.col("doc_id") % 11 == 0, F.lit(" call +1 (415) 555-0100 soon"))
        .when(F.col("doc_id") % 13 == 0, F.lit(" host 192.168.0.1 up"))
        .otherwise(F.lit(""))
    )
    planted = d.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    s = text.scrub_pii(planted)
    return s.select(
        "doc_id", "n_emails", "n_ips", "n_phones", F.md5("clean_text").alias("clean_md5")
    )


@query(
    "q58_decontamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 5
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 4),
                                          i -> array_to_string(t[i:i+4], ' '))) AS grams
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    bench AS (SELECT DISTINCT g FROM post WHERE doc_id < 5),
    hits AS (
      SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM post p JOIN bench b ON p.g = b.g
      WHERE p.doc_id >= 5
      GROUP BY p.doc_id
    )
    SELECT d.doc_id AS doc, coalesce(h.n_contaminated, 0) AS n_contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id >= 5
    """,
)
def q58_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (:func:`dedup.contamination_flags`):
    documents 0-4 stand in as the benchmark set; every other document
    counts its distinct 5-gram overlaps with them. The benchmark shingle
    set broadcasts, so the corpus-side probe is shuffle-free — the plan a
    100 TB decontamination pass needs. (The testdata's planted near-dups
    make real overlaps fire.)"""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 5)
    corpus = d.filter(F.col("doc_id") >= 5)
    return dedup.contamination_flags(corpus, bench, n=5)


@query(
    "q59_media_metadata",
    oracle=r"""
    WITH b AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 5 = 0 THEN '\xFF\xD8\xFF'::BLOB
                   WHEN doc_id % 7 = 0 THEN '\x89PNG'::BLOB
                   WHEN doc_id % 11 = 0 THEN 'RIFF\x00\x00\x00\x00WAVE'::BLOB
                   WHEN doc_id % 13 = 0 THEN 'RIFF\x00\x00\x00\x00AVI '::BLOB
                   ELSE ''::BLOB END) || encode(text) AS content
      FROM documents
    )
    SELECT doc_id,
           CAST(octet_length(content) AS BIGINT) AS n_bytes,
           CASE WHEN substring(hex(content), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
                WHEN substring(hex(content), 1, 8) = '89504E47' THEN 'image/png'
                WHEN substring(hex(content), 1, 8) = '52494646'
                     AND substring(hex(content), 17, 8) = '57415645' THEN 'audio/wav'
                WHEN substring(hex(content), 1, 8) = '52494646'
                     AND substring(hex(content), 17, 8) = '41564920' THEN 'video/avi'
                ELSE 'application/octet-stream' END AS sniffed_mime
    FROM b
    """,
)
def q59_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata pass (:func:`multimodal.attach_media_metadata`):
    opaque binary columns get byte length + magic-byte mime sniffing as
    pure column expressions — no decode. Binary payloads are synthesized
    from the text column with planted JPEG/PNG/RIFF-WAVE/RIFF-AVI magic
    prefixes so every sniff path executes (RIFF alone is ambiguous — the
    container tag at offset 8 decides audio vs video); DuckDB mirrors the
    bytes via encode()+hex prefixes. The real pipeline runs this exact scan shape over media
    blobs before routing to decode stages."""
    from phoebe_spark.operators import multimodal

    d = _t(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(bytes([0xFF, 0xD8, 0xFF])))
        .when(F.col("doc_id") % 7 == 0, F.lit(b"\x89PNG"))
        .when(F.col("doc_id") % 11 == 0, F.lit(b"RIFF\x00\x00\x00\x00WAVE"))
        .when(F.col("doc_id") % 13 == 0, F.lit(b"RIFF\x00\x00\x00\x00AVI "))
        .otherwise(F.lit(b""))
    )
    blobs = d.select(
        "doc_id", F.concat(magic, F.col("text").cast("binary")).alias("content")
    )
    out = multimodal.attach_media_metadata(blobs)
    return out.select("doc_id", "n_bytes", "sniffed_mime")


# ---------------------------------------------------------------------------
# Corpus curation (Gopher/C4-style rules, packing, mixing) + range join
# ---------------------------------------------------------------------------

_WLEN_SQL = f"list_aggregate(list_transform({_TOKS_SQL}, x -> len(x)), 'sum')"


@query(
    "q60_quality_rules",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 17 = 0 THEN ' ## ## ## ## ## ## ## ##'
                          WHEN doc_id % 19 = 0 THEN chr(10) || 'teaser one...' || chr(10) || 'teaser two...'
                          ELSE '' END AS text
      FROM documents
    ),
    base AS (
      SELECT doc_id, text,
             {_TOKS_SQL} AS toks,
             len({_TOKS_SQL}) AS n_words,
             string_split(text, chr(10)) AS lines
      FROM planted WHERE trim(text) <> ''
    ),
    m AS (
      SELECT doc_id, n_words,
             CASE WHEN n_words > 0 THEN CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE) / n_words ELSE 0.0 END AS mwl,
             CASE WHEN n_words > 0 THEN CAST(len(text) - len(replace(text, '#', '')) + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE) / n_words ELSE 0.0 END AS swr,
             CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE) / len(lines) ELSE 0.0 END AS elf,
             CASE WHEN n_words > 0 THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / n_words ELSE 0.0 END AS awf,
             len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to'))) AS swh
      FROM base
    )
    SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len,
           (n_words >= 10 AND n_words <= 100000) AS ok_word_count,
           (mwl >= 3.0 AND mwl <= 10.0) AS ok_mean_word_len,
           (swr <= 0.1) AS ok_symbol_ratio,
           (elf <= 0.3) AS ok_ellipsis_lines,
           (awf >= 0.80) AS ok_alpha_words,
           (swh >= 2) AS ok_stopwords,
           ((n_words >= 10 AND n_words <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
            AND (swr <= 0.1) AND (elf <= 0.3) AND (awf >= 0.80) AND (swh >= 2)) AS passes_quality
    FROM m
    """,
)
def q60_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule filter (:func:`curation.gopher_quality_flags`;
    Rae et al. 2021 §A1.1). Symbol-spam and ellipsis-line suffixes are
    planted on deterministic doc_id slices so the reject paths execute.
    Pure column expressions — the full rule set evaluates inside the
    documents scan with no shuffle, which is the shape a 100 TB quality
    pass needs."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 17 == 0, F.lit(" ## ## ## ## ## ## ## ##"))
        .when(F.col("doc_id") % 19 == 0, F.lit("\nteaser one...\nteaser two..."))
        .otherwise(F.lit(""))
    )
    planted = d.select("doc_id", F.concat(F.col("text"), suffix).alias("text")).filter(
        F.trim("text") != ""
    )
    out = curation.gopher_quality_flags(planted)
    return out.select(
        "doc_id", "n_words", "mean_word_len",
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_ellipsis_lines", "ok_alpha_words", "ok_stopwords", "passes_quality",
    )


@query(
    "q61_repetition_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents WHERE trim(text) <> ''
    ),
    grams AS (
      SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
             unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS gram
      FROM base WHERE len(t) >= 2
    ),
    per_gram AS (
      SELECT doc_id, n_tokens, n_distinct, gram, count(*) AS c
      FROM grams GROUP BY ALL
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_frac,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_gram_frac
    FROM per_gram GROUP BY doc_id, n_tokens, n_distinct
    """,
)
def q61_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (:func:`curation.repetition_stats`):
    duplicate-token fraction and most-frequent-bigram share, the Gopher
    repetition heuristics. Explode + two keyed aggregations on
    (doc, gram) — skew-free shuffle keys, no Python, no collect."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    return curation.repetition_stats(d).filter(F.col("n_tokens") >= 2)


@query(
    "q62_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, CAST(len({_TOKS_SQL}) AS BIGINT) AS token_count
      FROM documents WHERE trim(text) <> ''
    )
    SELECT doc_id, source, token_count,
           CAST(sum(token_count) OVER w - token_count AS BIGINT) AS pack_off,
           CAST(floor(CAST(sum(token_count) OVER w - token_count AS DOUBLE) / 512) AS BIGINT) AS pack_id
    FROM toks
    WINDOW w AS (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q62_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (:func:`curation.pack_sequences`):
    concatenate documents per source in doc_id order and cut at a
    512-token context boundary — one keyed running-sum window per source
    partition, no global sort. This is the deterministic packing layout a
    pretraining dataloader materializes."""
    from phoebe_spark.operators import curation, text

    d = _t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = d.select(
        "doc_id", "source", F.size(text.tokens(F.col("text"))).cast("bigint").alias("token_count")
    )
    return curation.pack_sequences(toks, ctx_tokens=512)


@query(
    "q63_mixture_weights",
    oracle="""
    WITH per_src AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_items,
           round(pow(n, 0.5) / sum(pow(n, 0.5)) OVER (), 6) AS weight,
           round(pow(n, 0.5) / sum(pow(n, 0.5)) OVER () * sum(n) OVER () / n, 6) AS rel_epochs
    FROM per_src
    """,
)
def q63_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source-mixture weights (alpha=0.5,
    :func:`curation.mixture_weights`) — the exponent-smoothed sampling
    rule used for multi-source/multilingual pretraining mixes. One
    aggregation to O(sources) rows; the window normalizer runs over that
    tiny frame only."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents")
    return curation.mixture_weights(d, alpha=0.5)


@query(
    "q64_range_join",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, {EPOCH_SQL.format(c="ts")} AS sec
      FROM events
    ),
    err AS (SELECT * FROM ev WHERE event_type = 'error'),
    clk AS (SELECT * FROM ev WHERE event_type = 'click'),
    hits AS (
      SELECT e.event_id, count(*) AS n
      FROM err e JOIN clk c ON c.user_id = e.user_id
       AND c.sec > e.sec AND c.sec <= e.sec + 60
      GROUP BY e.event_id
    )
    SELECT e.event_id, e.user_id, coalesce(h.n, 0) AS n_clicks_60s
    FROM err e LEFT JOIN hits h ON e.event_id = h.event_id
    """,
)
def q64_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via :func:`ts_core.range_join_bucketed`: for every
    error event, count same-user clicks in the following 60 s. The naive
    range join is a cartesian plan; bucketing time to the window span
    turns it into a shuffled equi-join on (user, bucket) with constant
    ~2x left replication — the shape that survives 100 TB of events."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", _epoch("ts").alias("sec")
    )
    err = ev.filter(F.col("event_type") == "error").drop("event_type")
    clk = ev.filter(F.col("event_type") == "click").drop("event_type")
    matched = ts_core.range_join_bucketed(
        err, clk, on="sec", by=["user_id"], lower=0, upper=60
    )
    hits = matched.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        err.join(hits, "event_id", "left")
        .select(
            "event_id", "user_id", F.coalesce(F.col("n"), F.lit(0)).alias("n_clicks_60s")
        )
    )


_STRAT_FRACS = {f"src{i}": (0.8, 0.5, 0.2, 0.05)[i % 4] for i in range(20)}
_STRAT_CASE = " ".join(
    f"WHEN '{k}' THEN {int(round(v * 10000))}" for k, v in _STRAT_FRACS.items()
)


@query(
    "q65_stratified_sample",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|v1'), 1, 15)) AS BIGINT)
            % 10000
          < CASE source {_STRAT_CASE} ELSE 0 END
    """,
)
def q65_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic subsample (:func:`sampling.
    stratified_hash_sample`) — the rebalance-by-source curation step
    (downsample boilerplate-heavy sources, keep rare ones whole). Pure
    codegen CASE over the salted md5 bucket: no shuffle, no RNG state,
    identical under repartitioning — and bit-identical in the oracle."""
    from phoebe_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    out = sampling.stratified_hash_sample(d, _STRAT_FRACS, strata_col="source")
    return out.select("doc_id", "source")


@query(
    "q66_label_centroids",
    oracle="""
    WITH flat AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM embeddings
    )
    SELECT label, dim, round(avg(v), 6) AS centroid
    FROM flat GROUP BY label, dim
    """,
)
def q66_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (:func:`similarity.label_centroids`) in
    long (label, dim, centroid) form — class prototypes for semantic
    dedup summaries / label-conditioned retrieval. posexplode inside the
    scan + one map-side-combining groupBy on the tiny (label, dim) key:
    the shuffle carries O(labels x dims) partials per task, not data."""
    emb = _t(spark, sf_dir, "embeddings")
    c = similarity.label_centroids(emb)
    return c.select("label", "dim", F.round("centroid", 6).alias("centroid"))


@query(
    "q67_boilerplate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' '))) AS grams
      FROM toks
    ),
    posting AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    gdf AS (SELECT g, count(*) AS df_docs FROM posting GROUP BY g),
    tot AS (SELECT count(*) AS n_docs FROM documents),
    per AS (
      SELECT p.doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN gdf.df_docs >= 0.02 * tot.n_docs THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
      FROM posting p JOIN gdf ON gdf.g = p.g CROSS JOIN tot
      GROUP BY p.doc_id
    )
    SELECT d.doc_id AS doc,
           coalesce(per.n_grams, 0) AS n_grams,
           coalesce(per.n_boiler, 0) AS n_boiler,
           round(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0.0
                      ELSE per.n_boiler * 1.0 / per.n_grams END, 6) AS boiler_ratio
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
)
def q67_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate scoring (:func:`curation.
    boilerplate_stats`): a 3-gram in >= 2% of documents is boilerplate
    (site chrome / license headers); each doc is scored by its
    boilerplate-gram fraction. Catches cross-document repetition that
    per-doc :func:`curation.repetition_stats` cannot see."""
    from phoebe_spark.operators import curation

    d = _t(spark, sf_dir, "documents")
    out = curation.boilerplate_stats(d, n=3, min_df_frac=0.02)
    return out.select(
        "doc", "n_grams", "n_boiler", F.round("boiler_ratio", 6).alias("boiler_ratio")
    )


@query(
    "q68_semantic_prune",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings) a
      JOIN (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings) b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (a.nrm * b.nrm) >= 0.45
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(doc, lbl) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc = e.d
    ),
    comp AS (SELECT doc, min(lbl) AS component FROM reach GROUP BY doc)
    SELECT e.vec_id, e.label
    FROM embeddings e LEFT JOIN comp c ON c.doc = e.vec_id
    WHERE c.component IS NULL OR c.component = e.vec_id
    """,
)
def q68_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): close the
    >= 0.45 cosine near-dup pairs (q41's exact GEMM) into components
    (q53's min-label propagation) and KEEP one representative per
    cluster (the min id) plus every unclustered row — the actual dedup
    action a curation pipeline applies before training. The components
    frame is only as large as the matched docs; the keep-filter is a
    left join on the corpus id."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.all_pairs_cosine(emb, threshold=0.45)
    comp = dedup.dedup_components(pairs, id_col_a="id_a", id_col_b="id_b")
    return (
        emb.join(comp.withColumnRenamed("doc", "vec_id"), "vec_id", "left")
        .filter(F.col("component").isNull() | (F.col("component") == F.col("vec_id")))
        .select("vec_id", "label")
    )


@query(
    "q69_quantize_embeddings",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS am,
             embedding
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, am,
             CASE WHEN am = 0 THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) / (am / 127)) AS INT)) END AS qvec
      FROM base
    )
    SELECT vec_id, round(am / 127, 6) AS scale,
           CAST(list_sum(qvec) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT) AS q_l1,
           list_min(qvec) AS q_min, list_max(qvec) AS q_max
    FROM q
    """,
)
def q69_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 absmax quantization (:func:`similarity.
    quantize_embeddings`) — the 4x storage/bandwidth compression an ANN
    index applies before sharding billions of vectors. Codes are compacted
    to per-vector (sum, l1, min, max) so the oracle compare is
    value-sensitive to every code without ferrying arrays (q51's
    fingerprint-compaction pattern)."""
    emb = _t(spark, sf_dir, "embeddings")
    qd = similarity.quantize_embeddings(emb)
    qv = F.col("qvec")
    return qd.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)).alias("q_l1"),
        F.array_min(qv).alias("q_min"),
        F.array_max(qv).alias("q_max"),
    )


@query(
    "q70_token_fertility",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws,
             len(regexp_extract_all(text,
                 '''(?:s|d|m|t|ll|ve|re)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe,
             length(text) AS chars
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           round(avg(ws), 6) AS avg_ws_tokens,
           round(avg(bpe), 6) AS avg_bpe_tokens,
           round(sum(chars) * 1.0 / sum(bpe), 6) AS chars_per_bpe
    FROM t GROUP BY lang
    """,
)
def q70_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility rollup by language: average whitespace and
    BPE-ish subword token counts plus chars-per-subword — the
    fertility/compression diagnostic a multilingual pretraining mix is
    balanced on (languages a tokenizer splits inefficiently consume
    context budget). One scan, pure codegen token counting
    (:func:`text.bpe_token_count`), one tiny groupBy(lang)."""
    d = _t(spark, sf_dir, "documents")
    ws = F.size(text.tokens(F.col("text")))
    bpe = text.bpe_token_count(F.col("text"))
    return (
        d.select("lang", ws.alias("ws"), bpe.alias("bpe"), F.length("text").alias("chars"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ws"), 6).alias("avg_ws_tokens"),
            F.round(F.avg("bpe"), 6).alias("avg_bpe_tokens"),
            F.round(F.sum("chars") / F.sum("bpe"), 6).alias("chars_per_bpe"),
        )
    )


@query(
    "q71_event_funnel",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, {EPOCH_SQL.format(c="ts")} AS sec FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (SELECT user_id, min(sec) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.sec) AS t2 FROM ev e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.sec > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.sec) AS t3 FROM ev e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.sec > s2.t2 GROUP BY e.user_id
    )
    SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
)
def q71_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel (path) analysis: users reaching each step of
    view -> click -> purchase with strictly increasing timestamps — the
    sequence-matching operator class (funnel / user-path analytics).

    Spark shape: ONE shuffle on user_id. The dependent step times reduce
    to chained minima — t1 = min view sec, t2 = min click sec > t1,
    t3 = min purchase sec > t2 (with time-sorted events, "first X after
    Y" IS the minimum over the qualifying set) — so the whole funnel is
    one groupBy(user) emitting t1 plus two per-type second arrays, and
    two ``array_min(filter(...))`` expressions. No sort, no self-joins,
    no per-step shuffles — the shape that survives 100 TB of events (the
    oracle uses the textbook three-self-join form, which would be three
    fact-fact shuffles here). An earlier version resolved the steps with
    a 3-slot ``aggregate`` state walk over the sorted event array —
    equivalent output, but the generated code was large enough to cost
    ~3 s of one-time codegen compilation; the min form is a few lines of
    bytecode."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", _epoch("ts").alias("sec"))
    # collect_list skips the when()'s null branch, so each array holds
    # exactly that type's seconds; per-user state stays bounded by the
    # user's event count, as before
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias("t1"),
        F.collect_list(F.when(F.col("event_type") == "click", F.col("sec"))).alias("clicks"),
        F.collect_list(F.when(F.col("event_type") == "purchase", F.col("sec"))).alias("buys"),
    )
    stepped = per_user.withColumn(
        "t2", F.array_min(F.filter("clicks", lambda c: c > F.col("t1")))
    ).withColumn("t3", F.array_min(F.filter("buys", lambda b: b > F.col("t2"))))
    counts = stepped.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    steps = spark.createDataFrame(
        [(1, "view"), (2, "click"), (3, "purchase")], "step INT, event_type STRING"
    )
    return steps.crossJoin(F.broadcast(counts)).select(
        "step",
        "event_type",
        F.when(F.col("step") == 1, F.col("n1"))
        .when(F.col("step") == 2, F.col("n2"))
        .otherwise(F.col("n3"))
        .alias("n_users"),
    )


@query(
    "q72_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term
      FROM documents WHERE trim(text) <> ''
    ),
    lm AS (
      SELECT term, ln(count(*) * 1.0 / (SELECT count(*) FROM toks)) AS logp
      FROM toks GROUP BY term
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-lm.logp), 6) AS avg_neg_logprob
    FROM toks t JOIN lm USING (term)
    GROUP BY t.doc_id
    """,
)
def q72_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM quality scoring
    (:func:`text.unigram_logprob_scores`, Wenzek et al. 2020): per-doc
    mean negative log-probability of its tokens under a corpus-fit
    unigram model — the perplexity-bucket signal pretraining pipelines
    filter on. One map-side-combining groupBy fits the LM; scoring is
    explode -> term join -> per-doc agg (broadcast the LM when it is a
    bounded trained model; self-fit defaults to an AQE-replannable
    equi-join)."""
    d = _t(spark, sf_dir, "documents")
    out = text.unigram_logprob_scores(d)
    return out.select(
        "doc_id", "n_tokens", F.round("avg_neg_logprob", 6).alias("avg_neg_logprob")
    )


@query(
    "q73_bloom_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 5
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 4),
                                          i -> array_to_string(t[i:i+4], ' '))) AS grams
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    bench AS (SELECT DISTINCT g FROM post WHERE doc_id < 5),
    hits AS (
      SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM post p JOIN bench b ON p.g = b.g
      WHERE p.doc_id >= 5
      GROUP BY p.doc_id
    )
    SELECT d.doc_id AS doc, coalesce(h.n_contaminated, 0) AS n_contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id >= 5
    """,
)
def q73_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via Bloom prefilter + exact confirm
    (:func:`dedup.contamination_flags_bloom`): result-identical to q58 —
    the oracle IS the exact-overlap SQL — but the corpus-side probe drops
    non-matching shingles inside the scan stage with pure-codegen bit
    tests against a literal word array, so at 100 TB only ~1% of corpus
    shingles (true hits + Bloom FPs) reach the join. The scale answer for
    eval registries too large to broadcast as strings."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 5)
    corpus = d.filter(F.col("doc_id") >= 5)
    return dedup.contamination_flags_bloom(corpus, bench, n=5)


def _jl_oracle() -> str:
    """DuckDB oracle for q74: replay the IDENTICAL literal Rademacher
    matrix (same seeded generator as :func:`similarity.jl_matrix`) as a
    list-of-lists literal; per (vec, out-dim) dot product, rounded."""
    from phoebe_spark.operators.similarity import jl_matrix

    R = jl_matrix(64, 8, seed=7)
    rows = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in row) + "]" for row in R
    )
    return f"""
    WITH r AS (SELECT [{rows}] AS m)
    SELECT e.vec_id, CAST(d - 1 AS INT) AS dim,
           round(list_sum(list_transform(generate_series(1, len(e.embedding)),
                 i -> CAST(e.embedding[i] AS DOUBLE) * r.m[d][i])), 6) AS value
    FROM embeddings e, r, (SELECT unnest(generate_series(1, 8)) AS d) dims
    """


@query("q74_random_projection", oracle=_jl_oracle())
def q74_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection
    (:func:`similarity.random_projection`, Achlioptas 2003): dim-64
    embeddings to dim-8 via a literal seeded Rademacher matrix — the
    cheap, shuffle-free prep before ANN indexing/clustering at scale.
    Entirely whole-stage codegen (one zip_with+aggregate dot per output
    dim); the oracle replays the identical literal matrix."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.random_projection(emb, out_dim=8, seed=7, in_dim=64)
    return out.select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.round("value", 6).alias("value"),
    )


# ---------------------------------------------------------------------------
# Drift / anomaly detection on the events table (round-3 extensions:
# the statistical monitors a workload-watching engine runs continuously —
# complements the q34 backpressure detector)
# ---------------------------------------------------------------------------

# Shared minutely-mean series, rounded to 6 so both engines agree on the
# detector input before any cumulative arithmetic starts.
_MINUTELY_SQL = f"""
    SELECT event_type,
           CAST(floor({EPOCH_SQL.format(c='ts')} / 60) AS BIGINT) AS minute,
           round(avg(value), 6) AS v
    FROM events GROUP BY 1, 2
"""


def _minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("minute", F.floor(_epoch() / 60).cast("long"))
        .groupBy("event_type", "minute")
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )


@query(
    "q75_cusum_drift",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    p AS (
      SELECT event_type, minute, v,
             sum(v - 60.0) OVER (PARTITION BY event_type ORDER BY minute
                                 ROWS UNBOUNDED PRECEDING) AS p
      FROM m),
    s AS (
      SELECT event_type,
             p - least(0.0, min(p) OVER (PARTITION BY event_type ORDER BY minute
                                         ROWS UNBOUNDED PRECEDING)) AS stat
      FROM p)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN round(stat, 6) > 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
           round(max(stat), 4) AS max_stat
    FROM s GROUP BY event_type
    """,
)
def q75_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection (:func:`ts_anom.cusum`, Page 1954)
    over the minutely workload series — sustained load above the k=60
    slack accumulates into the statistic; h=500 is the alarm line. The
    sequential-looking recursion ``s_i = max(0, s_{i-1} + x_i - k)`` runs
    as its prefix-sum closed form: two cumulative window frames sharing
    one sort, fully distributed across series keys, no recursion and no
    Python. The same pattern the reference's monitoring loop needs for
    regime-change detection (``analytics/app/optimization`` control loop,
    q34's sibling)."""
    m = _minutely(spark, sf_dir)
    st = ts_anom.cusum(m, "event_type", "minute", "v", k=60.0, h=500.0)
    return st.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum((F.round("stat", 6) > 500.0).cast("long")).alias("n_alarms"),
        F.round(F.max("stat"), 4).alias("max_stat"),
    )


@query(
    "q76_autocorr",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    l AS (
      SELECT event_type, v,
             lag(v, 1) OVER (PARTITION BY event_type ORDER BY minute) AS prev
      FROM m)
    SELECT event_type, round(corr(v, prev), 6) AS acf,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM l WHERE prev IS NOT NULL GROUP BY event_type
    """,
)
def q76_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per series (:func:`ts_anom.autocorr`) — the
    ACF value a forecaster checks before fitting AR terms (the reference
    fits auto_arima, whose order selection starts exactly here). One
    shuffle on the series key; ``lag`` + single-pass ``corr`` co-moment
    aggregate, all JVM."""
    m = _minutely(spark, sf_dir)
    a = ts_anom.autocorr(m, "event_type", "minute", "v", lag=1)
    return a.select("event_type", F.round("acf", 6).alias("acf"), "n_pairs")


@query(
    "q77_mad_anomaly",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, med.med, abs(e.value - med.med) AS adev
      FROM events e JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type, round(max(d.med), 6) AS median,
           round(max(mad.mad), 6) AS mad,
           CAST(sum(CASE WHEN abs(d.value - round(d.med, 6))
                              > 3.0 * 1.4826 * round(mad.mad, 6)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           CAST(count(*) AS BIGINT) AS n_points
    FROM dev d JOIN mad USING (event_type) GROUP BY d.event_type
    """,
)
def q77_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census via the Hampel MAD rule
    (:func:`ts_anom.mad_flags`): |x - median| > 3 * 1.4826 * MAD. Two
    grouped exact-percentile passes with the tiny per-key medians
    broadcast back; the rounded threshold ingredients pin the cut line so
    an independent engine reproduces the counts digit-for-digit. At
    100 TB the same operator runs with ``exact=False``
    (``approx_percentile`` sketches, bounded memory per group)."""
    e = _t(spark, sf_dir, "events")
    return ts_anom.mad_flags(e, "event_type", "value", n_sigmas=3.0)


@query(
    "q83_seasonal_naive",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    l AS (
      SELECT event_type, v,
             lag(v, 1) OVER (PARTITION BY event_type ORDER BY minute) AS l1,
             lag(v, 60) OVER (PARTITION BY event_type ORDER BY minute) AS lm
      FROM m)
    SELECT event_type,
           round(CAST(sum(CAST(abs(v - lm) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mae_seasonal,
           round(CAST(sum(CAST(abs(v - l1) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mae_naive,
           round(CAST(sum(CAST(abs(v - lm) AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(abs(v - l1) AS DECIMAL(18,6))) AS DOUBLE), 6) AS ratio,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM l WHERE lm IS NOT NULL GROUP BY event_type
    """,
)
def q83_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE-style seasonality diagnostic
    (:func:`ts_anom.seasonal_naive_ratio`, Hyndman & Koehler 2006):
    seasonal-naive (lag-60) vs one-step-naive MAE over the minutely
    series. ratio < 1 means hourly seasonality is exploitable — the
    go/no-go check before the reference's seasonal ARIMA terms. One
    shuffle, two lag frames sharing one sort."""
    m = _minutely(spark, sf_dir)
    r = ts_anom.seasonal_naive_ratio(m, "event_type", "minute", "v", period=60)
    return r.select(
        "event_type",
        F.round("mae_seasonal", 6).alias("mae_seasonal"),
        F.round("mae_naive", 6).alias("mae_naive"),
        F.round("ratio", 6).alias("ratio"),
        "n_obs",
    )


# ---------------------------------------------------------------------------
# Corpus curation extensions: chunk-level dedup, template-phrase census
# ---------------------------------------------------------------------------


@query(
    "q78_chunk_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE trim(text) <> ''),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / 8.0) AS INT) - 1),
                    c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
      FROM t),
    cnt AS (SELECT chunk, count(*) AS c FROM ch GROUP BY chunk)
    SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           round(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_ratio
    FROM ch JOIN cnt USING (chunk) GROUP BY ch.doc_id
    """,
)
def q78_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact-duplication census
    (:func:`dedup.chunk_dedup_stats`): the RefinedWeb/CCNet
    "repeated lines across documents" signal on 8-word chunks. Chunk
    assembly is exchange-free codegen (transform + slice per row, no
    re-assembly groupBy); only the corpus-wide chunk count and its join
    back shuffle."""
    d = _t(spark, sf_dir, "documents")
    return dedup.chunk_dedup_stats(d, chunk_words=8)


@query(
    "q79_top_ngrams",
    oracle=f"""
    WITH t AS (SELECT {_TOKS_SQL} AS toks FROM documents
               WHERE trim(text) <> '' AND len({_TOKS_SQL}) >= 3),
    g AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> array_to_string(toks[i : i+2], ' '))) AS gram FROM t)
    SELECT gram, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY gram
    ORDER BY n DESC, gram ASC LIMIT 20
    """,
)
def q79_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 trigram heavy hitters (:func:`text.top_ngrams`)
    with deterministic tie-break — the template-phrase census run before
    writing boilerplate-removal rules. Gram construction is exchange-free
    codegen; the global top-k is TakeOrdered over per-partition partial
    top-k (O(k) to the driver), never a full sort of the gram table."""
    d = _t(spark, sf_dir, "documents")
    return text.top_ngrams(d, n=3, k=20)


# ---------------------------------------------------------------------------
# Relational extensions: argmin-per-group join, CUBE, deciles
# ---------------------------------------------------------------------------


@query(
    "q80_best_supplier",
    oracle="""
    WITH offers AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice / l.l_quantity AS unit_price,
             row_number() OVER (PARTITION BY l.l_partkey
                                ORDER BY l.l_extendedprice / l.l_quantity ASC,
                                         l.l_suppkey ASC, l.l_orderkey ASC,
                                         l.l_linenumber ASC) AS rn
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size < 5)
    SELECT o.l_partkey AS partkey, o.l_suppkey AS suppkey, s.s_name,
           n.n_name AS nation, round(o.unit_price, 6) AS best_unit_price
    FROM offers o JOIN supplier s ON o.l_suppkey = s.s_suppkey
                  JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.rn = 1
    """,
)
def q80_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style cheapest-offer-per-part (argmin per group with a
    total tie-break), sourced from lineitem since the driver schema has
    no partsupp. Filtered part keys broadcast INTO the fact scan (the
    row_number window then runs on the ~8% survivor set, not all of
    lineitem); supplier and nation dims broadcast onto the 1-row-per-part
    result."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") < 5).select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    offers = li.join(_dim(p), li.l_partkey == p.p_partkey).withColumn(
        "unit_price", F.col("l_extendedprice") / F.col("l_quantity")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_price").asc(),
        F.col("l_suppkey").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(_dim(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("unit_price", 6).alias("best_unit_price"),
        )
    )


@query(
    "q81_cube_revenue",
    oracle="""
    SELECT coalesce(n.n_name, 'ALL') AS nation,
           coalesce(CAST(year(o.o_orderdate) AS INT), -1) AS o_year,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (n.n_name, year(o.o_orderdate))
    """,
)
def q81_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all four grouping sets of nation x order-year)
    — the OLAP companion to q49's ROLLUP. Spark expands the cube in one
    pass with partial aggregation per grouping set; dims broadcast onto
    the orders scan. Order-independent money sums via the decimal
    round-trip (q01 contract)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = (
        o.join(_dim(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
    )
    return (
        j.cube("n_name", "o_year")
        .agg(
            _dsum2(_dec("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            "revenue",
            "n_orders",
        )
    )


@query(
    "q82_acctbal_deciles",
    oracle="""
    WITH d AS (
      SELECT c_custkey, c_acctbal,
             ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
      FROM customer)
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal,
           round(avg(c_acctbal), 6) AS avg_bal
    FROM d GROUP BY decile
    """,
)
def q82_acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer account-balance deciles via ntile over a total order
    (tie-break on custkey makes bucket boundaries deterministic).
    Runs WITHOUT a global sort: the two-phase bucketed rank
    (layout.global_rank_by_value, buckets = floor(balance) — offsets
    frame bounded by the money RANGE, not the row count) plus exact
    NTILE arithmetic reproduces ntile(10) OVER (ORDER BY ...) bit for
    bit at any scale."""
    from phoebe_spark.operators.layout import exact_ntile_expr, global_rank_by_value

    cst = _t(spark, sf_dir, "customer")
    rk = global_rank_by_value(
        cst, "c_acctbal", "c_custkey", descending=False,
        bucket=F.floor(F.col("c_acctbal")),
    )
    n1 = cst.agg(F.count(F.lit(1)).cast("long").alias("__nn"))
    d = rk.crossJoin(F.broadcast(n1)).withColumn(
        "decile", exact_ntile_expr("r", "__nn", 10).cast("int")
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
    )


# ---------------------------------------------------------------------------
# Data-quality profiling, robust statistics, and dedup-graph curation
# ---------------------------------------------------------------------------


@query(
    "q84_column_profile",
    oracle="""
    SELECT 'event_id' AS col_name, count(*) - count(event_id) AS n_nulls,
           count(DISTINCT event_id) AS n_distinct, count(*) AS n_rows FROM events
    UNION ALL SELECT 'user_id', count(*) - count(user_id), count(DISTINCT user_id), count(*) FROM events
    UNION ALL SELECT 'event_type', count(*) - count(event_type), count(DISTINCT event_type), count(*) FROM events
    UNION ALL SELECT 'value', count(*) - count(value), count(DISTINCT value), count(*) FROM events
    UNION ALL SELECT 'props', count(*) - count(props), count(DISTINCT props), count(*) FROM events
    """,
)
def q84_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-sanity column profile (:func:`curation.column_profile`):
    per-column null and exact-distinct counts in ONE scan — Spark plans
    the multi-distinct with a single EXPAND + shuffle, then `stack`
    unpivots the 1-row aggregate (the oracle's five UNION ALL scans show
    exactly what the one-pass plan saves). ts is excluded by contract:
    DuckDB truncates the parquet's nano timestamps to micros, so its
    distinct count is not comparable."""
    from phoebe_spark.operators.curation import column_profile

    e = _t(spark, sf_dir, "events")
    return column_profile(e, ["event_id", "user_id", "event_type", "value", "props"])


@query(
    "q85_spearman",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    x AS (SELECT minute, v AS vx FROM m WHERE event_type = 'click'),
    y AS (SELECT minute, v AS vy FROM m WHERE event_type = 'view'),
    j AS (SELECT x.minute, vx, vy FROM x JOIN y USING (minute)),
    r AS (SELECT minute, vx, vy,
                 row_number() OVER (ORDER BY vx ASC, minute ASC) AS rnx,
                 row_number() OVER (ORDER BY vy ASC, minute ASC) AS rny
          FROM j),
    a AS (SELECT vx, vy,
                 avg(rnx) OVER (PARTITION BY vx) AS ax,
                 avg(rny) OVER (PARTITION BY vy) AS ay
          FROM r)
    SELECT round(corr(ax, ay), 6) AS spearman, CAST(count(*) AS BIGINT) AS n_obs
    FROM a
    """,
)
def q85_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the click and view minutely
    series (:func:`ts_agg.spearman_xy`), tie-averaged ranks per the
    textbook definition — the monotone-dependence check that is robust to
    the heavy-tailed values Pearson chokes on. Ranks come from
    row_number + per-value avg windows over the small aligned frame."""
    m = _minutely(spark, sf_dir)
    x = m.filter(F.col("event_type") == "click").select("minute", F.col("v").alias("vx"))
    y = m.filter(F.col("event_type") == "view").select("minute", F.col("v").alias("vy"))
    j = x.join(y, "minute")
    out = ts_agg.spearman_xy(j, "vx", "vy", tiebreak="minute")
    return out.select(F.round("spearman", 6).alias("spearman"), "n_obs")


@query(
    "q86_theil_sen",
    oracle=f"""
    WITH m AS ({_MINUTELY_SQL}),
    s AS (SELECT event_type, minute, v,
                 row_number() OVER (PARTITION BY event_type ORDER BY minute) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM m),
    d AS (SELECT event_type, minute AS t, v
          FROM s WHERE rn % greatest(1, CAST(floor(n / 120.0) AS BIGINT)) = 0),
    p AS (SELECT a.event_type, (b.v - a.v) / (b.t - a.t) AS slope
          FROM d a JOIN d b ON a.event_type = b.event_type AND a.t < b.t)
    SELECT event_type, round(quantile_cont(slope, 0.5), 6) + 0.0 AS ts_slope,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY event_type
    """,
)
def q86_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per series (:func:`ts_agg.theil_sen`):
    median of pairwise slopes, ~29% breakdown point vs OLS q17's 0. The
    series is strided to <=~120 points per key with pure integer math
    (deterministic, engine-portable) so the pair join is bounded at
    ~7k pairs/key however long the series grows."""
    m = _minutely(spark, sf_dir)
    out = ts_agg.theil_sen(m, "event_type", "minute", "v", max_points=120)
    return out.select(
        "event_type",
        (F.round("ts_slope", 6) + F.lit(0.0)).alias("ts_slope"),
        "n_pairs",
    )


@query(
    "q87_zipf_slope",
    oracle=f"""
    WITH toks AS (SELECT unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank FROM c)
    SELECT round(regr_slope(ln(cnt), ln(rank)), 6) + 0.0 AS zipf_slope,
           round(regr_intercept(ln(cnt), ln(rank)), 6) + 0.0 AS zipf_intercept,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM r
    """,
)
def q87_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary
    (:func:`text.zipf_slope`): OLS slope of ln(freq) on ln(rank) —
    natural corpora land near -1, templated/synthetic text drifts away,
    making this a one-number corpus-health check. The shuffle is bounded
    by vocabulary size, not corpus size."""
    d = _t(spark, sf_dir, "documents")
    out = text.zipf_slope(d)
    return out.select(
        (F.round("zipf_slope", 6) + F.lit(0.0)).alias("zipf_slope"),
        (F.round("zipf_intercept", 6) + F.lit(0.0)).alias("zipf_intercept"),
        "n_terms",
    )


@query(
    "q88_keep_best",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE trim(text) <> ''),
    ch AS (
      SELECT DISTINCT doc_id, chunk FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / 8.0) AS INT) - 1),
                      c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
        FROM t)),
    elig AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) BETWEEN 2 AND 100),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ch a JOIN elig USING (chunk) JOIN ch b USING (chunk)
      WHERE a.doc_id < b.doc_id),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(doc, lbl) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc = e.d),
    comp AS (SELECT doc, min(lbl) AS component FROM reach GROUP BY doc),
    j AS (SELECT c.component, c.doc, d.n_chars,
                 row_number() OVER (PARTITION BY c.component
                                    ORDER BY d.n_chars DESC, c.doc ASC) AS rn,
                 count(*) OVER (PARTITION BY c.component) AS nm
          FROM comp c JOIN documents d ON d.doc_id = c.doc)
    SELECT component, doc AS kept_doc, CAST(n_chars AS BIGINT) AS kept_quality,
           CAST(nm AS BIGINT) AS n_members
    FROM j WHERE rn = 1
    """,
)
def q88_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection per dedup cluster: shared-chunk
    near-dup pairs (:func:`dedup.chunk_pairs`, df-capped like the shingle
    index) -> connected components (q53's min-label propagation) -> keep
    the HIGHEST-quality member per cluster
    (:func:`dedup.keep_best_per_component`, quality = n_chars, ties to
    min id). The realistic curation action: SemDeDup q68 keeps an
    arbitrary representative; production pipelines keep the best one.
    The components frame scales with matched docs only."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.chunk_pairs(d, chunk_words=8, max_docs_per_chunk=100)
    comp = dedup.dedup_components(pairs, id_col_a="id_a", id_col_b="id_b")
    return dedup.keep_best_per_component(comp, d, quality_col="n_chars")


# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical BM25, rank fusion, dedup-graph diagnostics
# ---------------------------------------------------------------------------


@query(
    "q89_bm25",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('table', 'row', 'hash') GROUP BY 1, 2),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    sc AS (SELECT tf.doc_id,
                  CAST(round(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                       * tf.tf * (1.2 + 1)
                       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)
                       AS DECIMAL(18,6)) AS c
           FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s)
    SELECT doc_id, CAST(sum(c) AS DOUBLE) AS bm25 FROM sc GROUP BY doc_id
    """,
)
def q89_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical retrieval (:func:`text.bm25_scores`) for the
    literal query {table, row, hash} — the sparse half of hybrid search.
    One tokenize pass feeds doc lengths and tf; df/corpus stats broadcast
    back; per-term contributions sum as DECIMAL(18,6) so scores are
    bit-stable across partitionings and engines."""
    d = _t(spark, sf_dir, "documents")
    return text.bm25_scores(d, terms=("table", "row", "hash"))


@query(
    "q90_rrf_fusion",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    s AS (SELECT e.vec_id,
                 list_sum(list_transform(generate_series(1, len(e.embedding)),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS cosine,
                 sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
                      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
                         * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))))) AS l2
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
    r AS (SELECT vec_id,
                 row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS r_cos,
                 row_number() OVER (ORDER BY l2 ASC, vec_id ASC) AS r_l2
          FROM s)
    SELECT vec_id, round(1.0/(60 + r_cos) + 1.0/(60 + r_l2), 6) AS rrf,
           CAST(r_cos AS BIGINT) AS r_cos, CAST(r_l2 AS BIGINT) AS r_l2
    FROM r ORDER BY rrf DESC, vec_id ASC LIMIT 15
    """,
)
def q90_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (:func:`similarity.rrf_fusion`, Cormack et
    al. 2009): cosine and euclidean rankings against the vec_id=0 query,
    merged as 1/(60+r_cos) + 1/(60+r_l2) — hybrid search's standard
    calibration-free ranker merge. One corpus scan computes both
    distances in codegen; the top-k is TakeOrdered."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.rrf_fusion(emb, query_id=0, top_k=15)


@query(
    "q91_graph_triangles",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE trim(text) <> ''),
    ch AS (
      SELECT DISTINCT doc_id, chunk FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(0, CAST(ceil(len(toks) / 8.0) AS INT) - 1),
                      c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
        FROM t)),
    elig AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) BETWEEN 2 AND 100),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ch a JOIN elig USING (chunk) JOIN ch b USING (chunk)
      WHERE a.doc_id < b.doc_id)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
           (SELECT CAST(count(DISTINCT doc) AS BIGINT) FROM
              (SELECT id_a AS doc FROM pairs UNION ALL SELECT id_b FROM pairs)) AS n_nodes
    FROM pairs p1
    JOIN pairs p2 ON p2.id_a = p1.id_b
    JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b
    """,
)
def q91_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-graph density census: triangles / edges / nodes of the
    shared-chunk pair graph (:func:`dedup.chunk_pairs`) — high triangle
    density means clusters are tight duplicate families (safe to collapse
    aggressively); sparse chains mean borderline matches that deserve a
    verify pass. Triangle counting by ordered two-hop join (id_a < id_b
    everywhere, so each triangle counts once); the graph frame is
    localCheckpointed once and reused by all three statistics."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.chunk_pairs(d, chunk_words=8, max_docs_per_chunk=100)
    pairs = pairs.localCheckpoint(eager=True)
    p1 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    p2 = pairs.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    p3 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = p1.join(p2, "b").join(p3, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = (
        pairs.select(F.col("id_a").alias("doc"))
        .unionAll(pairs.select(F.col("id_b").alias("doc")))
        .agg(F.countDistinct("doc").alias("n_nodes"))
    )
    return tri.crossJoin(F.broadcast(edges)).crossJoin(F.broadcast(nodes))


# ---------------------------------------------------------------------------
# Verify-pass dedup, lexical diversity, domain shift
# ---------------------------------------------------------------------------

_CHUNK_PAIRS_SQL = f"""
    t AS (SELECT doc_id, {_TOKS_SQL} AS toks, text FROM documents
          WHERE trim(text) <> ''),
    ch AS (SELECT DISTINCT doc_id, chunk FROM (
       SELECT doc_id,
              unnest(list_transform(generate_series(0, CAST(ceil(len(toks)/8.0) AS INT)-1),
                     c -> array_to_string(toks[c*8+1 : c*8+8], ' '))) AS chunk
       FROM t)),
    elig AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) BETWEEN 2 AND 100),
    pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM ch a JOIN elig USING (chunk) JOIN ch b USING (chunk)
              WHERE a.doc_id < b.doc_id)
"""


@query(
    "q92_edit_verify",
    oracle=f"""
    WITH {_CHUNK_PAIRS_SQL},
    sc AS (SELECT p.id_a, p.id_b,
                  levenshtein(ta.text, tb.text) AS lev,
                  greatest(len(ta.text), len(tb.text)) AS mx
           FROM pairs p JOIN t ta ON ta.doc_id = p.id_a
                        JOIN t tb ON tb.doc_id = p.id_b)
    SELECT id_a, id_b, CAST(lev AS BIGINT) AS lev,
           round(1.0 - lev * 1.0 / mx, 6) AS sim
    FROM sc WHERE round(1.0 - lev * 1.0 / mx, 6) >= 0.6
    """,
)
def q92_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate-then-verify dedup: shared-chunk candidates
    (:func:`dedup.chunk_pairs`) confirmed by exact normalized Levenshtein
    similarity (:func:`dedup.edit_distance_verify`, >= 0.6) — the
    certification stage that turns probabilistic candidate recall into
    exact near-dup pairs. O(len^2) edit distance runs ONLY on candidates,
    so cost scales with matches, never corpus^2."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.chunk_pairs(d, chunk_words=8, max_docs_per_chunk=100)
    return dedup.edit_distance_verify(d, pairs, min_sim=0.6)


@query(
    "q93_token_entropy",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    c AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
    n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
    SELECT c.doc_id,
           CAST(sum(CAST(round(-(c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n), 6)
                    AS DECIMAL(18,6))) AS DOUBLE) AS token_entropy,
           CAST(max(n.n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct
    FROM c JOIN n USING (doc_id) GROUP BY c.doc_id
    """,
)
def q93_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token histogram
    (:func:`text.token_entropy`) — the lexical-diversity quality signal:
    low entropy = templated/repetitive text, implausibly high = random
    garbage. One shuffle on (doc, term); the doc total reuses the same
    key via a window; DECIMAL contribution sums are engine-exact."""
    d = _t(spark, sf_dir, "documents")
    return text.token_entropy(d)


@query(
    "q94_source_kl",
    oracle=f"""
    WITH toks AS (SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
                  WHERE trim(text) <> ''),
    st AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
    sn AS (SELECT source, sum(c) AS n FROM st GROUP BY 1),
    ct AS (SELECT term, sum(c) AS cc FROM st GROUP BY 1),
    cn AS (SELECT sum(cc) AS cnn FROM ct)
    SELECT st.source,
           CAST(sum(CAST(round((st.c * 1.0 / sn.n) * ln((st.c * 1.0 / sn.n)
                    / (ct.cc * 1.0 / cn.cnn)), 6) AS DECIMAL(18,6))) AS DOUBLE) AS kl_vs_corpus,
           CAST(max(sn.n) AS BIGINT) AS n_tokens
    FROM st JOIN sn USING (source) JOIN ct USING (term) CROSS JOIN cn
    GROUP BY st.source
    """,
)
def q94_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift census (:func:`text.source_kl`): KL divergence of
    each source's term distribution from the whole corpus — the
    mixture-health check run on every new data drop (drifting sources
    carry novel content or rot; pairs with q63's mixture weights). Always
    finite (every source term is in the corpus distribution)."""
    d = _t(spark, sf_dir, "documents")
    return text.source_kl(d)


# ---------------------------------------------------------------------------
# Event analytics: retention cohorts, inter-event gaps, weighted sampling
# ---------------------------------------------------------------------------


@query(
    "q95_retention_cohorts",
    oracle=f"""
    WITH d AS (SELECT user_id,
                      CAST(floor({EPOCH_SQL.format(c='ts')} / 86400.0) AS BIGINT) AS day
               FROM events),
    fs AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
    SELECT fs.cohort, d.day - fs.cohort AS day_offset,
           CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
    FROM d JOIN fs USING (user_id)
    GROUP BY 1, 2
    """,
)
def q95_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen day, counted
    as active per day-offset — the standard cohort/retention analysis
    over the events stream. Two keyed shuffles (user first-seen, then
    cohort x offset distinct-count); the per-user cohort frame is
    dimension-sized and AQE broadcasts it back onto the events scan."""
    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.floor(_epoch() / 86400).cast("long")
    )
    fs = e.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        e.join(fs, "user_id")
        .groupBy("cohort", (F.col("day") - F.col("cohort")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "q96_event_gaps",
    oracle=f"""
    WITH es AS (SELECT user_id, event_id, {EPOCH_SQL.format(c='ts')} AS sec FROM events),
    g AS (
      SELECT user_id,
             sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
      FROM es)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap, 0.5), 6) AS median_gap_s,
           round(quantile_cont(gap, 0.95), 6) AS p95_gap_s
    FROM g WHERE gap IS NOT NULL GROUP BY user_id
    """,
)
def q96_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-gap profile per user (median + p95 seconds between
    consecutive events) — the activity-cadence signal behind session-gap
    tuning (q46 uses a fixed threshold; this measures what it should
    be). Ordering is by epoch-SECOND + event_id in both engines so the
    nano-vs-micro timestamp resolution difference cannot reorder ties.
    One shuffle on user_id; lag and both exact percentiles share it."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", _epoch().alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    g = e.withColumn("gap", F.col("sec") - F.lag("sec").over(w)).filter(
        F.col("gap").isNotNull()
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap, 0.5)"), 6).alias("median_gap_s"),
        F.round(F.expr("percentile(gap, 0.95)"), 6).alias("p95_gap_s"),
    )


@query(
    "q97_weighted_sample",
    oracle="""
    WITH u AS (
      SELECT doc_id, n_chars,
             (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|ws1'), 1, 15)) AS BIGINT) + 1.0)
             / 1152921504606846977.0 AS u
      FROM documents WHERE n_chars > 0),
    k AS (SELECT doc_id, n_chars, ln(u) / n_chars AS key FROM u)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, round(key * 1e6, 6) AS neg_key_ppm
    FROM k ORDER BY key DESC, doc_id ASC LIMIT 20
    """,
)
def q97_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (:func:`sampling.weighted_sample`, Efraimidis-Spirakis 2006) — 20
    docs drawn proportionally to n_chars from content-hash randomness:
    no RNG, so the sample is bit-reproducible across runs, partition
    layouts, and engines (the q55 salted-hash philosophy extended to
    WEIGHTED draws). Top-k is TakeOrdered, never a global sort."""
    d = _t(spark, sf_dir, "documents")
    out = sampling.weighted_sample(d, weight_col="n_chars", k=20)
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        F.round(F.col("_key") * 1e6, 6).alias("neg_key_ppm"),
    )


# ---------------------------------------------------------------------------
# Reporting layer: pivot matrix, trailing actives, calendar heatmap
# ---------------------------------------------------------------------------


@query(
    "q98_pivot_daily",
    oracle=f"""
    WITH d AS (SELECT CAST(floor({EPOCH_SQL.format(c='ts')} / 86400.0) AS BIGINT) AS day,
                      event_type
               FROM events)
    SELECT day,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM d GROUP BY day
    """,
)
def q98_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type pivot matrix via Spark's native
    ``groupBy().pivot()`` with an EXPLICIT value list — the explicit list
    matters at scale: without it Spark runs an extra distinct-values job
    and the pivot width becomes data-dependent. One shuffle on day with
    map-side partial counts per (day, type); missing cells filled 0 to
    match the oracle's conditional sums."""
    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.floor(_epoch() / 86400).cast("long")
    )
    types = ["view", "click", "purchase", "signup", "error"]
    return (
        e.groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


@query(
    "q99_trailing_actives",
    oracle=f"""
    WITH du AS (SELECT DISTINCT CAST(floor({EPOCH_SQL.format(c='ts')} / 86400.0) AS BIGINT) AS day,
                       user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du),
    w AS (SELECT d.day, du.user_id
          FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day)
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau FROM w GROUP BY day
    """,
)
def q99_trailing_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day (WAU) — the engagement metric
    distinct counts cannot express as a sliding window, so the standard
    plan is: collapse to distinct (day, user) first (the big shuffle,
    done ONCE), then range-join the tiny day dimension onto it (broadcast
    nested-loop over ~days rows, fine because days is calendar-bounded)
    and distinct-count per window end."""
    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.floor(_epoch() / 86400).cast("long")
    )
    du = e.select("day", "user_id").distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "d0")
    w = days.join(
        du, (F.col("day") >= F.col("d0") - 6) & (F.col("day") <= F.col("d0"))
    )
    return w.groupBy(F.col("d0").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )


@query(
    "q100_calendar_heatmap",
    oracle=f"""
    SELECT CAST((floor({EPOCH_SQL.format(c='ts')} / 86400.0) + 4) % 7 AS BIGINT) AS dow,
           CAST(floor(({EPOCH_SQL.format(c='ts')} % 86400) / 3600.0) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def q100_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour activity heatmap (dow 0 = Sunday: epoch day 0
    was a Thursday, hence the +4 shift) — the 168-cell calendar profile
    behind load-shaping decisions. Pure integer bucketing on the scan,
    one tiny-key shuffle with map-side combine."""
    e = _t(spark, sf_dir, "events").withColumn("es", _epoch())
    return (
        e.select(
            ((F.floor(F.col("es") / 86400) + 4) % 7).cast("long").alias("dow"),
            F.floor((F.col("es") % 86400) / 3600).cast("long").alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )
