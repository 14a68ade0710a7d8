"""Signed-zero hardening regression tests (round-8 verdict ask #6).

Every slope/trend-family query emits `round(..., 6) + 0.0` on BOTH the
engine and oracle sides so a degenerate fit (constant-y series, saturated
vocabulary) cannot diverge on IEEE ``-0.0`` vs ``0.0``. These tests build a
maximally degenerate fixture — every event carries the SAME value, every
document is the SAME text — and replay the full engine-vs-DuckDB parity
compare on it, which is exactly the scenario that made q309 fail at
sf0.001 before the fix.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from phoebe_spark.queries import ORACLE, QUERIES

# Queries whose final emission is a slope / trend / seasonal residual that
# can round to +/-0.0 when the fit degenerates.
SLOPE_QUERIES = [
    "q17_ts_slope",
    "q34_backpressure_detector",
    "q86_theil_sen",
    "q87_zipf_slope",
    "q131_zipf_slope",
    "q191_seasonal_decompose",
    "q273_holt_linear",
    "q274_holt_by_key",
    "q284_holt_winters",
    "q309_heaps_law",
    "q310_ks_two_sample",
    "q311_mann_kendall",
    "q312_jsd_sources",
    "q313_page_hinkley",
    "q318_psi_drift",
    "q319_cramer_von_mises",
    "q329_kneser_ney_lm",
    "q332_seasonal_strength",
]


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory, sf_dir):
    """A copy of the sf0.001 tables with all variance removed: events all
    carry value=42.0, documents all carry one fixed text — preserving the
    parquet physical types by round-tripping through DuckDB COPY."""
    d = tmp_path_factory.mktemp("degen_sf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT event_id, ts, user_id, event_type,
                     CAST(42.0 AS DOUBLE) AS value, props
              FROM read_parquet('{sf_dir}/events.parquet'))
        TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT doc_id,
                     'alpha beta gamma alpha beta gamma delta' AS text,
                     lang, source, CAST(39 AS BIGINT) AS n_chars
              FROM read_parquet('{sf_dir}/documents.parquet'))
        TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # Remaining tables: pass through unchanged (only events/documents feed
    # the slope-family queries, but the loaders resolve paths lazily).
    for t in (
        "region nation customer supplier part orders lineitem embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def degen_ddb(degen_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{degen_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", SLOPE_QUERIES)
def test_degenerate_fit_matches_oracle(name, spark, degen_dir, degen_ddb):
    sdf = QUERIES[name](spark, degen_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = degen_ddb.execute(ORACLE[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"

    # And explicitly: no negative zero may survive the emission on the
    # engine side — repr() distinguishes -0.0, which is what the driver's
    # value hash would trip over.
    for line in s_norm:
        assert "-0.0|" not in line + "|", f"{name}: -0.0 leaked: {line}"
