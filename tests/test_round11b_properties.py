"""Round-11b property tests: the closed-form/support-based structures
in q471-q495 must agree with independent brute-force reference
implementations — the Ansari-Bradley arithmetic-series scores vs direct
score assignment, the Croston codegen fold vs a Python loop, tau-b /
Kuiper / MAD-z / Gini-stump vs numpy enumerations on the real sf0.001
tables."""

from __future__ import annotations

import math
import random

import duckdb
import numpy as np
import pytest

from phoebe_spark.queries import QUERIES


def _ab_scores_closed_form(counts):
    """The q477 closed form: per-block tie-averaged Ansari-Bradley score
    sums from arithmetic series split at k = (N+1) div 2."""
    n = sum(counts)
    k = (n + 1) // 2
    out = []
    cc = 0
    for c in counts:
        lo, hi = cc + 1, cc + c
        cc += c
        hk = min(hi, k)
        t1 = (hk * (hk + 1) - (lo - 1) * lo) // 2 if lo <= hk else 0
        l2 = max(lo, k + 1)
        t2 = (
            (hi - l2 + 1) * (n + 1) - (hi * (hi + 1) - (l2 - 1) * l2) // 2
            if l2 <= hi
            else 0
        )
        out.append(t1 + t2)
    return out


def test_ansari_bradley_block_scores_match_direct_assignment():
    """For 200 random tie-heavy histograms (odd and even N, blocks
    straddling the fold point), the closed-form block score sums must
    equal the direct min(i, N+1-i) assignment summed per block."""
    rng = random.Random(477)
    for _ in range(200):
        counts = [rng.randint(1, 9) for _ in range(rng.randint(1, 12))]
        n = sum(counts)
        direct = []
        i = 1
        for c in counts:
            direct.append(sum(min(j, n + 1 - j) for j in range(i, i + c)))
            i += c
        assert _ab_scores_closed_form(counts) == direct, counts


def _croston_python(xs, a=0.2):
    """Independent Croston loop: returns (z, p, q, nd) after the scan."""
    z = p = q = nd = 0.0
    started = False
    for idx, x in enumerate(xs, start=1):
        if not started:
            if x > 0:
                z, p, q, started = x, float(idx), 1.0, True
                nd += 1.0
        else:
            if x > 0:
                z = a * x + (1 - a) * z
                p = a * q + (1 - a) * p
                q = 1.0
                nd += 1.0
            else:
                q += 1.0
    return z, p, nd


def test_croston_query_matches_python_loop(spark, sf_dir):
    """q496's streaming cross-batch state must match an independent
    Python Croston run on the same dense 60-day Brand#11 series rebuilt
    directly from parquet."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH li AS (
          SELECT l.l_shipdate AS sd, CAST(l.l_quantity AS DOUBLE) AS qy
          FROM read_parquet('{sf_dir}/lineitem.parquet') l
          JOIN read_parquet('{sf_dir}/part.parquet') p
            ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#11'
        ),
        lo AS (SELECT min(sd) AS lo FROM li)
        SELECT datediff('day', (SELECT lo FROM lo), sd) AS d, sum(qy) AS c
        FROM li WHERE datediff('day', (SELECT lo FROM lo), sd) < 60
        GROUP BY 1
        """
    ).fetchall()
    con.close()
    xs = [0.0] * 60
    for d, c in rows:
        xs[int(d)] = float(c)
    z, p, nd = _croston_python(xs)
    rows_out = QUERIES["q496_streaming_croston_drain"](spark, sf_dir).collect()
    got = next(r for r in rows_out if r["brand"] == "Brand#11")
    assert got["n_demand_days"] == int(nd)
    assert got["demand_size"] == pytest.approx(round(z, 6), abs=1e-9)
    assert got["demand_interval"] == pytest.approx(round(p, 6), abs=1e-9)
    assert got["croston_rate"] == pytest.approx(round(z / p, 6), abs=1e-9)


def test_croston_python_loop_edge_cases():
    """The reference loop itself: leading zeros delay the start (p =
    first demand position), an isolated single demand leaves rate =
    size/position, and all-zero input keeps the null-guard state."""
    z, p, nd = _croston_python([0, 0, 5, 0, 0, 0])
    assert (z, p, nd) == (5.0, 3.0, 1.0)
    z, p, nd = _croston_python([0.0] * 10)
    assert (z, p, nd) == (0.0, 0.0, 0.0)
    z, p, nd = _croston_python([0, 4, 0, 0, 6])
    # second demand: z = .2*6+.8*4, p = .2*3+.8*2 (q was 3 at update)
    assert z == pytest.approx(0.2 * 6 + 0.8 * 4)
    assert p == pytest.approx(0.2 * 3 + 0.8 * 2)


def test_kendall_tau_b_matches_numpy_brute_force(spark, sf_dir):
    """q472's support-histogram pair counting must match the O(n^2)
    numpy enumeration of concordant/discordant pairs on the raw rows."""
    con = duckdb.connect()
    x, y = map(
        np.array,
        zip(
            *con.execute(
                f"SELECT CAST(l_quantity AS BIGINT), l_linenumber "
                f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
            ).fetchall()
        ),
    )
    con.close()
    n = len(x)
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    prod = dx * dy
    iu = np.triu_indices(n, k=1)
    nc = int((prod[iu] > 0).sum())
    nd = int((prod[iu] < 0).sum())
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in np.bincount(x) if t > 1)
    n2 = sum(t * (t - 1) / 2 for t in np.bincount(y) if t > 1)
    tau_b = (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2))
    got = QUERIES["q472_kendall_tau_b"](spark, sf_dir).collect()[0]
    assert got["concordant"] == nc
    assert got["discordant"] == nd
    assert got["tau_b"] == pytest.approx(round(tau_b, 6), abs=2e-6)


def test_kuiper_matches_numpy_ecdfs(spark, sf_dir):
    """q484's support-cum D+/D- must match numpy ECDF maxima."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(l_quantity AS BIGINT), l_linestatus "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    con.close()
    a = np.array([v for v, st in rows if st == "O"])
    b = np.array([v for v, st in rows if st == "F"])
    grid = np.arange(1, max(a.max(), b.max()) + 1)
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    dplus = max((fa - fb).max(), 0.0)
    dminus = max((fb - fa).max(), 0.0)
    got = QUERIES["q484_kuiper_test"](spark, sf_dir).collect()[0]
    assert got["d_plus"] == pytest.approx(round(dplus, 6), abs=2e-6)
    assert got["d_minus"] == pytest.approx(round(dminus, 6), abs=2e-6)
    assert got["kuiper_v"] == pytest.approx(round(dplus + dminus, 6), abs=4e-6)


def test_mad_robust_z_matches_statistics_median(spark, sf_dir):
    """q491's doubled-integer median/MAD must match Python's statistics
    module on the raw per-customer counts."""
    import statistics

    con = duckdb.connect()
    ys = [
        r[0]
        for r in con.execute(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet') "
            f"GROUP BY o_custkey"
        ).fetchall()
    ]
    con.close()
    med = statistics.median(ys)
    mad = statistics.median([abs(y - med) for y in ys])
    n_out = sum(1 for y in ys if abs(0.6745 * (y - med) / mad) > 3.5)
    got = QUERIES["q491_mad_robust_z"](spark, sf_dir).collect()[0]
    assert got["median_orders"] == pytest.approx(med)
    assert got["mad_orders"] == pytest.approx(mad)
    assert got["n_outliers_35"] == n_out


def test_gini_stump_matches_brute_force(spark, sf_dir):
    """q481's cumulative split search must match the direct per-threshold
    recomputation, including the argmin flag."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(l_quantity AS BIGINT), "
        f"CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    con.close()
    v = np.array([r[0] for r in rows])
    pos = np.array([r[1] for r in rows])
    nn = len(v)
    ref = {}
    for t in range(int(v.min()), int(v.max())):
        left = v <= t
        nl, nr = int(left.sum()), int((~left).sum())
        pl = pos[left].sum() / nl
        pr = pos[~left].sum() / nr
        ref[t] = round(
            round((nl * (2.0 * pl * (1.0 - pl)) + nr * (2.0 * pr * (1.0 - pr))) / nn, 12),
            6,
        )
    got = {
        r["threshold"]: (r["gini_split"], r["is_best"])
        for r in QUERIES["q481_gini_stump"](spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    for t, g in ref.items():
        assert got[t][0] == pytest.approx(g, abs=2e-6), t
    best = min(ref, key=lambda t: ref[t])
    assert got[best][1] == 1
