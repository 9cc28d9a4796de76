"""Hand-case semantics tests for the stats/graph catalog suite — the
DuckDB parity gate proves Spark == oracle; these pin that BOTH equal the
textbook definition on inputs small enough to reason about."""
from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_fuse_spark.catalog import load_all

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def test_ols_trend_matches_numpy_polyfit(spark):
    """The exact-integer moment formulation equals numpy's float lstsq fit
    to well within the published 1e-4 rounding grain."""
    import duckdb

    rows = load_all()["q_ols_trend"].spark(spark, SF_MED).collect()
    pts = duckdb.sql(
        f"""
        SELECT n.n_name,
               (EXTRACT(YEAR FROM o.o_orderdate) - 1995) * 12
                 + EXTRACT(MONTH FROM o.o_orderdate) - 1 AS x,
               ROUND(o.o_totalprice * 100) / 100 AS y
        FROM read_parquet('{SF_MED}/orders.parquet') o
        JOIN read_parquet('{SF_MED}/customer.parquet') c ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{SF_MED}/nation.parquet') n ON c.c_nationkey = n.n_nationkey
        """
    ).df()
    assert len(rows) == 25
    for r in rows:
        grp = pts[pts.n_name == r.n_name]
        slope, intercept = np.polyfit(grp.x.to_numpy(), grp.y.to_numpy(), 1)
        assert r.slope_dollars_per_month == pytest.approx(slope, abs=2e-4)
        assert r.intercept_dollars == pytest.approx(intercept, abs=2e-4)
        assert r.n_orders == len(grp)


def test_triangle_count_on_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles; the full pipeline —
    pair extraction, support filter, degree orientation, wedge closure —
    reproduces that from a hand-built order/part incidence list."""
    import tempfile

    # orders {10,11,12,13,14} each co-purchase a part pair TWICE (support-2
    # filter keeps each); pairs form K4-minus-{3,4}: triangles 123 and 124.
    pair_list = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    rows = []
    order = 10
    for u, v in pair_list:
        for _ in range(2):  # two distinct orders per pair -> support 2
            rows.append((order, u))
            rows.append((order, v))
            order += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        # satisfy load_table for the one table the query reads
        out = load_all()["x_triangle_count"].spark(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.nodes, r.edges, r.triangles) == (4, 5, 2)


def test_bloom_prune_candidates_superset_of_true_matches(spark):
    """Bucket pre-filtering may only ADD false positives — it can never
    drop a true match (the defining Bloom-filter guarantee)."""
    r = load_all()["x_bloom_join_prune"].spark(spark, SF).collect()[0]
    assert r.candidate_rows >= r.matched_rows
    assert r.false_positive_rows == r.candidate_rows - r.matched_rows
    assert 0 <= r.fp_rate <= 1 and 0 <= r.scan_reduction <= 1
    assert r.buckets_set <= min(r.dim_keys, 8192)


def test_ewma_matches_python_loop(spark):
    """The 8-tap FIR equals a per-user python replay of the same formula."""
    out = {r.event_id: r for r in load_all()["e_ewma_smooth"].spark(spark, SF).collect()}
    ev = (
        load_all()["e_ewma_smooth"]
        .spark(spark, SF)
        .sparkSession.read.parquet(f"{SF}/events.parquet")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select("event_id", "user_id", F.col("ts").alias("t"), "value")
        .collect()
    )
    by_user: dict = {}
    for r in sorted(clicks, key=lambda r: (r.user_id, r.t, r.event_id)):
        hist = by_user.setdefault(r.user_id, [])
        hist.append((r.event_id, r.value))
        taps = hist[-8:][::-1]  # current first
        num = sum(v * 0.5**j for j, (_, v) in enumerate(taps))
        den = sum(0.5**j for j in range(len(taps)))
        expect = math.floor(num / den * 1e6 + 0.5) / 1e6
        assert out[r.event_id].ewma == pytest.approx(expect, abs=2e-6), r.event_id


def test_kmeans_step_matches_numpy(spark):
    """Assignment, counts, inertia, and centroid shift equal a numpy
    replay of the quantized Lloyd iteration (same seeds, same tie-break)."""
    import hashlib

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/embeddings.parquet").to_pydict()
    ids = tbl["vec_id"]
    vecs = {
        i: np.array([math.floor(x * 1e6 + 0.5) for x in v], dtype=np.int64)
        for i, v in zip(ids, tbl["embedding"])
    }

    def h(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    seed_ids = sorted(ids, key=lambda i: (h(i), i))[:8]
    assign: dict = {}
    for i, v in vecs.items():
        best = min(
            ((int(((v - vecs[c]) ** 2).sum()), c) for c in seed_ids)
        )
        assign[i] = best
    out = {r.cluster_id: r for r in load_all()["v_kmeans_step"].spark(spark, SF).collect()}
    assert set(out) == set(seed_ids)
    for c in seed_ids:
        members = [i for i, (_, cc) in assign.items() if cc == c]
        inertia = sum(d for i, (d, cc) in assign.items() if cc == c)
        mean = np.mean([vecs[i] for i in members], axis=0)
        shift = float(np.sqrt(((mean - vecs[c]) ** 2).sum()) / 1e6)
        r = out[c]
        assert r.n_assigned == len(members)
        assert r.inertia_unit2 == pytest.approx(inertia / 1e12, abs=2e-6)
        assert r.centroid_shift == pytest.approx(shift, abs=2e-6)


def test_payload_neardup_finds_shuffled_bytes(spark):
    """Two payloads with the SAME byte multiset (shuffled order) are
    byte-histogram twins (hamming 0); a different distribution is not."""
    from spark_fuse_spark.operators.multimodal import payload_signature_pairs

    base = "the quick brown fox jumps over the lazy dog " * 20
    shuffled = "".join(sorted(base))  # same multiset, different order
    other = "zzzzqqqqxxxxjjjj1234567890!!!???" * 25
    docs = spark.createDataFrame(
        [(1, base), (2, shuffled), (3, other)], "doc_id long, text string"
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in payload_signature_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_bq_topk_recall_floor_vs_exact(spark):
    """Binary quantization must stay a useful coarse filter: the exact
    top-5 (v_ann_bruteforce) appears in BQ's re-ranked top-10 with
    recall >= 0.6 (measured 0.775 at sf0.001 — 1-bit codes at a 10%
    candidate budget)."""
    from collections import defaultdict

    bq = load_all()["v_bq_topk"].spark(spark, SF).collect()
    ex = load_all()["v_ann_bruteforce"].spark(spark, SF).collect()
    b, e = defaultdict(set), defaultdict(set)
    for r in bq:
        b[r.query_id].add(r.neighbor_id)
    for r in ex:
        e[r.query_id].add(r.neighbor_id)
    hits = sum(len(e[q] & b[q]) for q in e if q in b)
    tot = sum(len(e[q]) for q in e if q in b)
    assert tot >= 20
    assert hits / tot >= 0.6, (hits, tot)


def test_bootstrap_thresholds_are_poisson_cdf():
    """The integer weight thresholds are exactly floor(CDF_Poisson(1)(k) * 2^60)."""
    from spark_fuse_spark.catalog.experimentation import _POIS_T

    e, cdf, fact = math.exp(-1), 0.0, 1
    for k, t in enumerate(_POIS_T):
        if k:
            fact *= k
        cdf += e / fact
        assert t == math.floor(cdf * (1 << 60))


def test_bootstrap_ci_brackets_mean_and_se_scales(spark):
    """The Poisson-bootstrap SE approximates the analytic SE of the mean
    (s/sqrt(n)) and the normal CI brackets the true mean — the property
    that makes the hash-weight resample a valid uncertainty estimate."""
    import duckdb

    rows = load_all()["e_bootstrap_ci"].spark(spark, SF_MED).collect()
    pdf = duckdb.sql(
        f"""SELECT o_orderpriority, ROUND(o_totalprice * 100) / 100.0 AS y
            FROM read_parquet('{SF_MED}/orders.parquet')"""
    ).df()
    assert len(rows) == 5
    for r in rows:
        g = pdf[pdf.o_orderpriority == r.o_orderpriority].y.to_numpy()
        se = g.std(ddof=1) / math.sqrt(len(g))
        assert r.n_orders == len(g)
        assert r.est_mean_dollars == pytest.approx(g.mean(), abs=1e-3)
        assert r.ci_lo_dollars < g.mean() < r.ci_hi_dollars
        # B=32 replicates -> the SE estimate itself has ~13% relative sd;
        # the band is wide enough to never flap yet tight enough to catch
        # a broken weight distribution (e.g. Bernoulli weights -> SE/sqrt2)
        assert 0.6 * se < r.boot_se_dollars < 1.6 * se


def test_chi2_matches_numpy_contingency(spark):
    """chi2 and Cramér's V equal the textbook computation on the full
    R x C grid (zero cells contribute their expected count)."""
    import duckdb

    (r,) = load_all()["q_chi2_independence"].spark(spark, SF_MED).collect()
    obs = duckdb.sql(
        f"""SELECT o_orderpriority AS r, o_orderstatus AS c, COUNT(*) AS n
            FROM read_parquet('{SF_MED}/orders.parquet') GROUP BY 1, 2"""
    ).df()
    pivot = obs.pivot_table(index="r", columns="c", values="n", fill_value=0)
    O = pivot.to_numpy().astype(float)
    n = O.sum()
    E = np.outer(O.sum(axis=1), O.sum(axis=0)) / n
    chi2 = ((O - E) ** 2 / E).sum()
    assert r.n_rows == int(n)
    assert r.r_levels == O.shape[0] and r.c_levels == O.shape[1]
    assert r.dof == (O.shape[0] - 1) * (O.shape[1] - 1)
    assert r.chi2 == pytest.approx(chi2, abs=2e-4)
    v = math.sqrt(chi2 / (n * (min(O.shape) - 1)))
    assert r.cramers_v == pytest.approx(v, abs=2e-6)


def test_kmv_matches_python_bottom_k(spark):
    """The per-group KMV estimate equals a brute-force python bottom-k
    over the same md5-based hash, and the error audit is honest."""
    import duckdb
    import hashlib

    rows = load_all()["x_kmv_sketch"].spark(spark, SF_MED).collect()
    pdf = duckdb.sql(
        f"""SELECT DISTINCT o_orderpriority, o_custkey
            FROM read_parquet('{SF_MED}/orders.parquet')"""
    ).df()
    k, space = 64, 1 << 60
    for r in rows:
        keys = pdf[pdf.o_orderpriority == r.o_orderpriority].o_custkey
        hashes = sorted(
            {
                int(hashlib.md5(str(int(c)).encode()).hexdigest()[:15], 16)
                for c in keys
            }
        )
        assert r.exact_distinct == len(hashes)
        if len(hashes) < k:
            expected = len(hashes)
        else:
            expected = math.floor((k - 1) * float(space) / hashes[k - 1])
        assert r.kmv_estimate == expected
        if len(hashes) >= k:  # 1/sqrt(k-2) theory -> ~13% SE; 40% = 3σ
            assert r.rel_err_pct < 40.0


def test_corr_matrix_matches_numpy(spark):
    """The one-scan exact-moment correlations equal numpy.corrcoef on the
    identically-quantized columns."""
    import duckdb

    rows = {
        r.pair: r for r in load_all()["q_corr_matrix"].spark(spark, SF_MED).collect()
    }
    pdf = duckdb.sql(
        f"""SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
                   CAST(ROUND(l_discount * 10000) AS BIGINT) AS z
            FROM read_parquet('{SF_MED}/lineitem.parquet')"""
    ).df()
    c = np.corrcoef(np.vstack([pdf.x, pdf.y, pdf.z]))
    assert rows["quantity~extendedprice"].corr_r == pytest.approx(c[0, 1], abs=1e-5)
    assert rows["quantity~discount"].corr_r == pytest.approx(c[0, 2], abs=1e-5)
    assert rows["extendedprice~discount"].corr_r == pytest.approx(c[1, 2], abs=1e-5)
    assert all(r.n_rows == len(pdf) for r in rows.values())


def test_ks_2sample_matches_numpy_ecdf(spark):
    """The distributed prefix-sum KS statistic equals the brute-force
    numpy ECDF sup-difference, and the z/p panel follows the asymptotic
    formula."""
    import duckdb

    (r,) = load_all()["q_ks_2sample"].spark(spark, SF_MED).collect()
    pdf = duckdb.sql(
        f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
                   EXTRACT(YEAR FROM o_orderdate) AS yr
            FROM read_parquet('{SF_MED}/orders.parquet')
            WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)"""
    ).df()
    a = np.sort(pdf[pdf.yr == 1995].v.to_numpy())
    b = np.sort(pdf[pdf.yr == 1996].v.to_numpy())
    grid = np.union1d(a, b)
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(fa - fb).max()
    assert r.n_a == len(a) and r.n_b == len(b)
    assert r.ks_d == pytest.approx(d, abs=1e-6)
    z = math.sqrt(len(a) * len(b) / (len(a) + len(b))) * d
    assert r.ks_z == pytest.approx(z, abs=1e-4)
    assert r.p_approx == pytest.approx(min(1.0, 2 * math.exp(-2 * z * z)), abs=1e-6)


def test_kmv_setops_match_python_sketches(spark):
    """Union/Jaccard/intersection estimates equal a brute-force python
    reimplementation of the merged bottom-k estimator, and the exact
    panel is truly exact."""
    import duckdb
    import hashlib

    (r,) = load_all()["x_kmv_setops"].spark(spark, SF_MED).collect()
    pdf = duckdb.sql(
        f"""SELECT DISTINCT EXTRACT(YEAR FROM o_orderdate) AS yr, o_custkey
            FROM read_parquet('{SF_MED}/orders.parquet')
            WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)"""
    ).df()
    k, space = 64, 1 << 60

    def hset(yr):
        keys = pdf[pdf.yr == yr].o_custkey
        return {
            int(hashlib.md5(str(int(c)).encode()).hexdigest()[:15], 16)
            for c in keys
        }

    A, B = hset(1995), hset(1996)
    assert (r.exact_a, r.exact_b) == (len(A), len(B))
    assert r.exact_union == len(A | B)
    assert r.exact_intersect == len(A & B)

    def est(s):
        srt = sorted(s)[:k]
        return len(srt) if len(srt) < k else math.floor((k - 1) * float(space) / srt[k - 1])

    ska, skb = set(sorted(A)[:k]), set(sorted(B)[:k])
    assert r.est_a == est(A) and r.est_b == est(B)
    merged = sorted(ska | skb)
    est_union = (
        len(merged) if len(merged) < k
        else math.floor((k - 1) * float(space) / merged[k - 1])
    )
    assert r.est_union == est_union
    denom = min(k, len(merged))
    j_num = sum(1 for h in merged[:k] if h in ska and h in skb)
    assert r.jaccard_est == pytest.approx(j_num / denom, abs=1e-6)
    assert r.est_intersect == math.floor(j_num / denom * est_union)
    # the estimators are actually good at this cardinality
    assert abs(r.est_union - r.exact_union) / r.exact_union < 0.4


def test_mann_whitney_matches_pandas_ranks(spark):
    """U, z, and p equal a brute-force midrank computation (pandas
    average-rank), with p inside the documented A&S 7.1.25 error bound
    of the true normal tail."""
    import duckdb
    import pandas as pd

    (r,) = load_all()["q_mann_whitney"].spark(spark, SF_MED).collect()
    pdf = duckdb.sql(
        f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
                   EXTRACT(YEAR FROM o_orderdate) AS yr
            FROM read_parquet('{SF_MED}/orders.parquet')
            WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)"""
    ).df()
    ranks = pd.Series(pdf.v).rank(method="average")
    is_a = (pdf.yr == 1995).to_numpy()
    n_a, n_b = int(is_a.sum()), int((~is_a).sum())
    u_a = float(ranks[is_a].sum()) - n_a * (n_a + 1) / 2
    n = n_a + n_b
    _, t = np.unique(pdf.v.to_numpy(), return_counts=True)
    tie = float((t.astype(object) ** 3 - t).sum())
    var_u = n_a * n_b / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2) / math.sqrt(var_u)
    assert (r.n_a, r.n_b) == (n_a, n_b)
    assert r.u_a == pytest.approx(u_a, abs=0.01)
    assert r.z_score == pytest.approx(z, abs=1e-4)
    true_p = math.erfc(abs(z) / math.sqrt(2))
    assert r.p_two_sided == pytest.approx(true_p, abs=5e-4)
    assert 0.0 <= r.p_two_sided <= 1.0


def test_label_propagation_matches_python_rounds(spark):
    """The cluster-size histogram equals a from-scratch Python synchronous
    min-label propagation on the same support-2 co-purchase graph."""
    import duckdb

    edges = duckdb.sql(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM read_parquet('{SF_MED}/lineitem.parquet')),
        pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
                  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                     AND a.l_partkey < b.l_partkey)
        SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2"""
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lbl = {n: n for n in adj}
    for _ in range(3):
        lbl = {
            n: min(min(lbl[m] for m in adj[n]), lbl[n]) for n in adj
        }
    from collections import Counter

    sizes = Counter(Counter(lbl.values()).values())
    checks: dict[int, int] = {}
    by_lbl: dict[int, list[int]] = {}
    for n, l in lbl.items():
        by_lbl.setdefault(l, []).append(n)
    for l, members in by_lbl.items():
        checks[len(members)] = checks.get(len(members), 0) + sum(members)
    rows = load_all()["x_label_propagation"].spark(spark, SF_MED).collect()
    got = {r.cluster_size: (r.n_clusters, r.node_checksum) for r in rows}
    assert got == {sz: (n, checks[sz]) for sz, n in sizes.items()}
    assert len(got) > 1, "graph collapsed to one size class — weak fixture"


def test_theil_sen_matches_numpy_median_of_slopes(spark):
    """Per-nation Theil-Sen slope equals numpy's median over the explicit
    pairwise-slope list built from the same monthly rollup."""
    import duckdb

    pts = duckdb.sql(
        f"""SELECT n.n_name,
                   (EXTRACT(YEAR FROM o.o_orderdate) - 1995) * 12
                     + EXTRACT(MONTH FROM o.o_orderdate) - 1 AS x,
                   CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS y
            FROM read_parquet('{SF_MED}/orders.parquet') o
            JOIN read_parquet('{SF_MED}/customer.parquet') c
              ON o.o_custkey = c.c_custkey
            JOIN read_parquet('{SF_MED}/nation.parquet') n
              ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name, x"""
    ).fetchall()
    by_nation: dict[str, list[tuple[int, int]]] = {}
    for name, x, y in pts:
        by_nation.setdefault(name, []).append((int(x), int(y)))
    rows = load_all()["q_theil_sen"].spark(spark, SF_MED).collect()
    assert len(rows) == len(by_nation)
    for r in rows:
        series = sorted(by_nation[r.n_name])
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(series)
            for (x2, y2) in series[i + 1:]
        ]
        assert r.n_months == len(series)
        assert r.n_pairs == len(slopes)
        want = float(np.median(slopes)) / 100
        assert r.slope_dollars == pytest.approx(want, abs=1e-4)


def test_benford_audit_shares_sum_to_one(spark):
    """Digits cover 1..9 (order totals are >= 857 in TPC-H), observed and
    Benford shares each sum to ~1, and counts sum to the table size."""
    import duckdb

    rows = load_all()["q_benford_audit"].spark(spark, SF_MED).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_MED}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r.n_orders for r in rows) == n
    assert sum(r.obs_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.benford_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        assert r.abs_dev == pytest.approx(abs(r.obs_share - r.benford_share), abs=2e-6)


def test_weighted_deciles_match_python_type1(spark):
    """Each decile value equals the smallest price whose inclusive
    cumulative quantity crosses q*W/10 (type-1 weighted quantile),
    computed from scratch in Python."""
    import duckdb

    cells = dict(
        duckdb.sql(
            f"""SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v,
                       CAST(SUM(l_quantity) AS BIGINT) AS w
                FROM read_parquet('{SF_MED}/lineitem.parquet') GROUP BY v"""
        ).fetchall()
    )
    total = sum(cells.values())
    cum, crossings = 0, {}
    for v in sorted(cells):
        lo, cum = cum, cum + cells[v]
        for q in range(1, 10):
            if cum * 10 >= q * total and lo * 10 < q * total:
                crossings[q] = (round(v / 100, 2), cum)
    rows = load_all()["q_weighted_deciles"].spark(spark, SF_MED).collect()
    assert len(rows) == 9
    for r in rows:
        v, cw = crossings[r.decile]
        assert (r.price_dollars, r.cum_weight, r.total_weight) == (v, cw, total)
    # weighted median differs from the naive midpoint only if weights
    # skew; still, deciles must be nondecreasing
    vals = [r.price_dollars for r in rows]
    assert vals == sorted(vals)


def test_acf_daily_matches_numpy(spark):
    """ACF at each lag equals the textbook estimator computed in numpy on
    the same daily series (full-series mean/variance, overlap numerator,
    calendar-gap-aware pairing)."""
    import duckdb

    daily = dict(
        duckdb.sql(
            f"""SELECT CAST(o_orderdate AS DATE) AS d,
                       CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS x
                FROM read_parquet('{SF_MED}/orders.parquet') GROUP BY d"""
        ).fetchall()
    )
    import datetime

    xs = np.array(list(daily.values()), dtype=float)
    xbar, var = xs.mean(), ((np.array(list(daily.values())) - xs.mean()) ** 2).sum()
    rows = load_all()["e_acf_daily"].spark(spark, SF_MED).collect()
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        num, n_pairs = 0.0, 0
        for d, x in daily.items():
            d2 = d + datetime.timedelta(days=r.lag)
            if d2 in daily:
                num += (x - xbar) * (daily[d2] - xbar)
                n_pairs += 1
        assert r.n_pairs == n_pairs
        assert r.acf == pytest.approx(num / var, abs=2e-6)
        assert abs(r.acf) < 0.3  # independent synthetic days — near zero


def test_cluster_nmi_matches_sklearn_style_python(spark):
    """Purity and NMI equal a from-scratch Python computation on the same
    4-plane assignment (planes replayed via the operator's own LCG)."""
    import duckdb

    from spark_fuse_spark.operators.similarity import _pseudo_planes

    rows = duckdb.sql(
        f"SELECT embedding, label FROM read_parquet('{SF_MED}/embeddings.parquet')"
    ).fetchall()
    planes = _pseudo_planes(4, 64, 42)
    from collections import Counter

    cells: Counter = Counter()
    for emb, label in rows:
        b = sum(
            (1 << i)
            for i, pl in enumerate(planes)
            if sum(e * p for e, p in zip(emb, pl)) >= 0
        )
        cells[(b, label)] += 1
    n = sum(cells.values())
    rowm: Counter = Counter(); colm: Counter = Counter()
    for (c, l), k in cells.items():
        rowm[c] += k
        colm[l] += k
    mi = sum(k / n * math.log(n * k / (rowm[c] * colm[l])) for (c, l), k in cells.items())
    h_c = -sum(v / n * math.log(v / n) for v in rowm.values())
    h_l = -sum(v / n * math.log(v / n) for v in colm.values())
    best: dict = {}
    for (c, l), k in cells.items():
        best[c] = max(best.get(c, 0), k)
    (r,) = load_all()["v_cluster_nmi"].spark(spark, SF_MED).collect()
    assert (r.n_vectors, r.n_clusters, r.n_labels) == (n, len(rowm), len(colm))
    assert r.purity == pytest.approx(sum(best.values()) / n, abs=2e-6)
    assert r.nmi == pytest.approx(mi / math.sqrt(h_c * h_l), abs=2e-6)
    assert 0.0 <= r.nmi <= 1.0 and 0.0 < r.purity <= 1.0


def test_dow_seasonality_matches_numpy_anova(spark):
    """Per-dow means and the one-way-ANOVA R² equal a numpy recompute;
    synthetic order dates are uniform across weekdays so R² ≈ 0."""
    import datetime

    import duckdb

    daily = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(ROUND(o_totalprice*100)) AS BIGINT) AS x
            FROM read_parquet('{SF_MED}/orders.parquet') GROUP BY d"""
    ).fetchall()
    monday = datetime.date(1970, 1, 5)
    by_dow: dict[int, list[int]] = {}
    for d, x in daily:
        by_dow.setdefault((d - monday).days % 7, []).append(x)
    xs = np.array([x for _, x in daily], dtype=float)
    sst = ((xs - xs.mean()) ** 2).sum()
    ssb = sum(
        len(v) * (np.mean(v) - xs.mean()) ** 2 for v in by_dow.values()
    )
    rows = load_all()["e_dow_seasonality"].spark(spark, SF_MED).collect()
    assert [r.dow for r in rows] == list(range(7))
    for r in rows:
        v = by_dow[r.dow]
        assert r.n_days == len(v)
        assert r.mean_dollars == pytest.approx(np.mean(v) / 100, abs=0.01)
        assert r.r2_dow == pytest.approx(ssb / sst, abs=2e-6)
    assert 0.0 <= rows[0].r2_dow < 0.1  # no weekday effect in synthetic data


def test_kcore_matches_python_peel(spark):
    """The fixed-round peel equals a Python replay, and the converged
    flag is honest (True iff the last round changed nothing)."""
    import duckdb

    edges = duckdb.sql(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM read_parquet('{SF_MED}/lineitem.parquet')),
        pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
                  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                     AND a.l_partkey < b.l_partkey)
        SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2"""
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    prev = None
    for _ in range(5):
        prev = alive
        alive = {n for n in alive if len(adj[n] & alive) >= 3}
    (r,) = load_all()["x_kcore"].spark(spark, SF_MED).collect()
    assert r.n_core == len(alive)
    assert r.node_checksum == sum(alive)
    assert r.converged == (len(alive) == len(prev))
    assert 0 < r.n_core < len(adj), "trivial core — weak fixture"


def test_assortativity_matches_numpy_pearson(spark):
    """The exact-moment assortativity equals numpy's corrcoef over the
    explicit directed-edge degree pairs, and sits in [-1, 1]."""
    import duckdb

    edges = duckdb.sql(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM read_parquet('{SF_MED}/lineitem.parquet')),
        pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
                  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                     AND a.l_partkey < b.l_partkey)
        SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2"""
    ).fetchall()
    from collections import Counter

    deg: Counter = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    dx, dy = [], []
    for u, v in edges:
        dx += [deg[u], deg[v]]
        dy += [deg[v], deg[u]]
    expect = float(np.corrcoef(np.array(dx, float), np.array(dy, float))[0, 1])
    (r,) = load_all()["x_degree_assortativity"].spark(spark, SF_MED).collect()
    assert r.n_directed_edges == 2 * len(edges)
    assert r.assortativity == pytest.approx(expect, abs=2e-6)
    assert -1.0 <= r.assortativity <= 1.0


def test_ols_multi_matches_numpy_lstsq(spark):
    """Cramer's rule on exact integer moments equals numpy's float lstsq
    for the 2-regressor model, within the published 1e-4 grain."""
    import duckdb

    rows = load_all()["q_ols_multi"].spark(spark, SF_MED).collect()
    pts = duckdb.sql(
        f"""
        WITH items AS (SELECT l_orderkey, COUNT(*) AS n_items
                       FROM read_parquet('{SF_MED}/lineitem.parquet') GROUP BY 1)
        SELECT o.o_orderpriority,
               (EXTRACT(YEAR FROM o.o_orderdate) - 1995) * 12
                 + EXTRACT(MONTH FROM o.o_orderdate) - 1 AS x1,
               i.n_items AS x2,
               ROUND(o.o_totalprice * 100) / 100 AS y
        FROM read_parquet('{SF_MED}/orders.parquet') o
        JOIN items i ON o.o_orderkey = i.l_orderkey
        """
    ).df()
    assert len(rows) == 5
    for r in rows:
        grp = pts[pts.o_orderpriority == r.o_orderpriority]
        X = np.column_stack(
            [np.ones(len(grp)), grp.x1.to_numpy(float), grp.x2.to_numpy(float)]
        )
        beta, *_ = np.linalg.lstsq(X, grp.y.to_numpy(float), rcond=None)
        assert r.n_orders == len(grp)
        assert r.intercept_dollars == pytest.approx(beta[0], abs=2e-4)
        assert r.month_coef_dollars == pytest.approx(beta[1], abs=2e-4)
        assert r.item_coef_dollars == pytest.approx(beta[2], abs=2e-4)


def test_adamic_adar_matches_python_brute_force(spark):
    """The wedge-join formulation equals the textbook per-pair common-
    neighbor sum computed by a dict-of-sets brute force (including the
    degree cap and the micro-unit quantization)."""
    from collections import defaultdict

    from spark_fuse_spark.catalog.graph_queries import (
        _AA_DEG_CAP,
        _AA_TOPK,
        _copurchase_edges,
    )

    edges = [(r.u, r.v) for r in _copurchase_edges(spark, SF).collect()]
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    scores: dict[tuple[int, int], int] = defaultdict(int)
    common: dict[tuple[int, int], int] = defaultdict(int)
    for z, nz in nbrs.items():
        d = len(nz)
        if not (2 <= d <= _AA_DEG_CAP):
            continue
        w = math.floor(1_000_000.0 / math.log(d) + 0.5)
        for a in nz:
            for b in nz:
                if a < b:
                    scores[(a, b)] += w
                    common[(a, b)] += 1
    edge_set = set(edges)
    cand = [
        (s, a, b) for (a, b), s in scores.items() if (a, b) not in edge_set
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = cand[:_AA_TOPK]

    rows = load_all()["x_adamic_adar"].spark(spark, SF).collect()
    assert len(rows) == len(expect)
    for r, (s, a, b) in zip(rows, expect):
        assert (r.u, r.v) == (a, b)
        assert r.n_common == common[(a, b)]
        assert r.aa_score == pytest.approx(s / 1_000_000.0, abs=1e-9)


def test_rfm_segments_matches_python_brute_force(spark):
    """Quintile boundaries and scores from the prefix-sum machinery equal
    the textbook sorted-list percentile-disc definition computed in pure
    Python (including duplicate boundary rows on coarse metrics)."""
    import duckdb

    per = duckdb.sql(
        f"""
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate),
                         (SELECT MAX(o_orderdate)
                          FROM read_parquet('{SF}/orders.parquet'))) AS r,
               COUNT(*) AS f,
               CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS m
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1
        """
    ).df()
    n = len(per)

    def cuts(vals):
        s = sorted(vals)
        out = []
        for k in range(1, 5):
            # smallest value whose inclusive cumulative count covers k/5
            # (one row per k -> duplicates when a value spans boundaries)
            cum = 0
            for v in sorted(set(s)):
                cum += sum(1 for x in s if x == v)
                if cum * 5 >= k * n:
                    out.append(v)
                    break
        return out

    import collections
    seg = collections.defaultdict(lambda: [0, 0])
    cr, cf, cm = cuts(per.r), cuts(per.f), cuts(per.m)
    for _, row in per.iterrows():
        key = (
            1 + sum(1 for b in cr if b < row.r),
            1 + sum(1 for b in cf if b < row.f),
            1 + sum(1 for b in cm if b < row.m),
        )
        seg[key][0] += 1
        seg[key][1] += row.m

    rows = load_all()["q_rfm_segments"].spark(spark, SF).collect()
    assert sum(r.n_customers for r in rows) == n
    assert len(rows) == len(seg)
    for r in rows:
        cnt, mtot = seg[(r.r_score, r.f_score, r.m_score)]
        assert r.n_customers == cnt
        assert r.monetary_dollars == pytest.approx(mtot / 100, abs=1e-6)
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5


def test_histogram_operators_match_exact_quantiles(spark):
    """operators/histogram.py: midpoint estimates land within half a bin
    width of the exact quantiles on uniform data, for both global-span
    and per-group-span variants; degenerate (constant) groups pin bin 0."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.operators.histogram import (
        equi_width_histogram,
        histogram_quantiles,
        value_span,
    )

    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    bins = 100
    span = value_span(df, "v")
    h = equi_width_histogram(df, "v", bins, group_cols=["g"], span=span)
    assert h.count() <= 2 * bins
    est = {
        (r.g, r.q): r.est
        for r in histogram_quantiles(
            spark, h, span, [0.5, 0.9], bins, group_cols=["g"]
        ).collect()
    }
    half_bin = 999.0 / bins / 2
    for g in ("0", "1"):
        assert abs(est[(g, 0.5)] - 499.5) <= half_bin + 5
        assert abs(est[(g, 0.9)] - 899.1) <= half_bin + 5

    # per-group spans: group "a" in [0,100), group "b" constant at 7.0
    df2 = spark.range(200).select(
        F.when(F.col("id") < 100, "a").otherwise("b").alias("g"),
        F.when(F.col("id") < 100, F.col("id").cast("double")).otherwise(7.0).alias("v"),
    )
    span2 = value_span(df2, "v", ["g"])
    h2 = equi_width_histogram(
        df2, "v", 10, group_cols=["g"], span=span2, span_group_cols=["g"]
    )
    est2 = {
        (r.g, r.q): r.est
        for r in histogram_quantiles(
            spark, h2, span2, [0.5], 10, group_cols=["g"], span_group_cols=["g"]
        ).collect()
    }
    assert abs(est2[("a", 0.5)] - 49.5) <= 99.0 / 10 / 2 + 1
    assert est2[("b", 0.5)] == 7.0  # zero-width span: midpoint is lo

    import pytest

    with pytest.raises(ValueError, match="bins"):
        equi_width_histogram(df, "v", 0)


def test_glm_scoring_helpers_shared_expressions(spark):
    """with_logit_probability reproduces the calibration scan's sigmoid
    math from the weight panel; rational_sigmoid is bounded in (0, 1)."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.operators.glm import (
        logistic_gd_weights,
        rational_sigmoid,
        with_logit_probability,
    )

    base = spark.range(400).select(
        (F.col("id") % 21 - 10).cast("long").alias("x")
    ).select("x", F.when(F.col("x") > 0, 1).otherwise(0).alias("y"))
    w = logistic_gd_weights(base, "y", "x", steps=4, eta=0.5).select("qb", "qw_0")
    scored = with_logit_probability(base, w, "x").select("x", "y", "p_sig")
    rows = scored.collect()
    assert len(rows) == 400
    assert all(0.0 < r.p_sig < 1.0 for r in rows)
    # separable signal: positive x scores above negative x
    hi = sum(r.p_sig for r in rows if r.x > 0) / sum(1 for r in rows if r.x > 0)
    lo = sum(r.p_sig for r in rows if r.x < 0) / sum(1 for r in rows if r.x < 0)
    assert hi > 0.5 > lo
    # the surrogate saturates softly: extreme z still inside (0, 1)
    edge = spark.range(1).select(
        rational_sigmoid(F.lit(1e9)).alias("hi"),
        rational_sigmoid(F.lit(-1e9)).alias("lo"),
    ).collect()[0]
    assert 0.999 < edge.hi < 1.0 and 0.0 < edge.lo < 0.001
