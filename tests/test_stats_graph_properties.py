"""Property pins for the stats/graph suite: brute-force equivalence on
randomized small graphs and estimator-shape invariants on the real data."""
from __future__ import annotations

import itertools
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from spark_fuse_spark.catalog import load_all

SF = "/root/testdata/sf0.001"


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=hst.sets(
        hst.tuples(hst.integers(1, 7), hst.integers(1, 7)).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=12,
    )
)
def test_triangle_count_equals_bruteforce(spark, edges):
    """Degree-oriented wedge closure == itertools brute force on random
    graphs of ≤7 nodes (each edge encoded as two co-purchase orders so it
    survives the support-2 filter)."""
    rows = []
    order = 100
    for u, v in sorted(edges):
        for _ in range(2):
            rows.append((order, u)); rows.append((order, v)); order += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    nodes = sorted({n for e in edges for n in e})
    eset = set(edges)
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        out = load_all()["x_triangle_count"].spark(spark, d).collect()[0]
    assert out.triangles == expected
    assert out.edges == len(edges)


def test_survival_curve_shape_invariants(spark):
    """Kaplan-Meier invariants: survival in (0,1], strictly decreasing
    across churn steps; n_risk strictly decreasing; d <= n everywhere."""
    rows = load_all()["e_survival_curve"].spark(spark, SF).collect()
    assert rows, "no churn steps at sf0.001?"
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in rows:
        assert 0 < r.survival < prev_s
        assert r.n_churned <= r.n_risk
        if prev_n is not None:
            assert r.n_risk < prev_n
        prev_s, prev_n = r.survival, r.n_risk


def test_flow_conformance_counter_invariants(spark):
    """State-machine outputs are internally consistent on the real data:
    violations+conversions bounded by events; converted implies a prior
    browse event existed."""
    rows = load_all()["e_flow_conformance"].spark(spark, SF).collect()
    assert rows
    assert any(r.final_state == "converted" for r in rows)
    for r in rows:
        assert r.n_violations + r.n_errors <= r.n_events
        assert r.final_state in {"inactive", "registered", "browsing", "converted"}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=hst.lists(
        hst.lists(hst.sampled_from("abcdefgh"), min_size=5, max_size=30).map(
            lambda cs: " ".join(cs)
        ),
        min_size=2,
        max_size=6,
    )
)
def test_containment_equals_python_bruteforce(spark, texts):
    """containment_pairs == a python set computation over distinct
    3-shingles on random word sequences."""
    from spark_fuse_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.id_contained, r.id_container): r.containment
        for r in containment_pairs(docs, k=3, threshold=0.5).collect()
    }

    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {i: shingles(t) for i, t in enumerate(texts)}
    expected = {}
    for a in sh:
        for b in sh:
            if a >= b or not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            cont = inter / min(len(sh[a]), len(sh[b]))
            if cont >= 0.5:
                contained, container = (
                    (a, b)
                    if (len(sh[a]), a) <= (len(sh[b]), b)
                    else (b, a)
                )
                expected[(contained, container)] = round(cont, 6)
    assert got == pytest.approx(expected)


def test_histogram_quantile_error_bounded_by_bin_width(spark):
    """The bin-midpoint estimate can miss the exact quantile by at most
    one bin width (the exact value lies in or adjacent to the hit bin)."""
    import duckdb

    rows = load_all()["x_histogram_quantiles"].spark(spark, SF).collect()
    lo, hi = duckdb.sql(
        f"SELECT MIN(o_totalprice), MAX(o_totalprice) "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()
    bin_width = (hi - lo) / 256
    assert rows
    for r in rows:
        assert r.abs_err <= bin_width, (r, bin_width)


def test_rolling_retention_invariants(spark):
    rows = load_all()["e_rolling_retention"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.retained_users <= r.active_users
        assert 0 <= r.retention_rate <= 1


def test_revenue_concentration_lorenz_invariants(spark):
    """Lorenz-curve invariants: deciles 0..9 ascending, shares sum to ~1,
    cumulative share monotone and convex-ish (top decile's share is the
    largest since customers are ranked ascending by spend)."""
    rows = load_all()["q_revenue_concentration"].spark(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(10))
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4
    cums = [r.cumulative_share for r in rows]
    assert all(b > a for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-5
    shares = [r.revenue_share for r in rows]
    assert shares[-1] == max(shares)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=hst.lists(
        hst.tuples(
            hst.integers(min_value=0, max_value=2),  # shard label
            hst.lists(
                hst.integers(min_value=-8, max_value=8), min_size=3, max_size=3
            ),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_mutual_knn_graph_equals_python_bruteforce(spark, data):
    """mutual_knn_graph (blocked, cap=2 so multi-block paths exercise on
    every shard of size > 2) == a python brute-force kNN with the same
    rounded-cosine + id tie-break ranking and mutuality rule."""
    import math

    from spark_fuse_spark.operators.similarity import mutual_knn_graph

    rows = [(i, lbl, [float(x) for x in vec]) for i, (lbl, vec) in enumerate(data)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    got = {
        (r.src_id, r.dst_id): (r.cosine, r.rank, r.mutual)
        for r in mutual_knn_graph(df, cap=2, k=2).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(b, a))
        da, db = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        if da == 0 or db == 0:
            return 0.0  # functions.vectors.cosine_similarity's zero-norm rule
        return round(num / (da * db), 6)

    # python brute force (cosine desc, id asc tie-break)
    knn = {}
    for i, la, va in rows:
        cands = []
        for j, lb, vb in rows:
            if j == i or lb != la:
                continue
            cands.append((-cos(va, vb), j))
        cands.sort()
        knn[i] = [(j, -negc) for negc, j in cands[:2]]
    expected = {}
    for i, lst in knn.items():
        for rank, (j, c) in enumerate(lst, start=1):
            mutual = any(jj == i for jj, _ in knn.get(j, []))
            expected[(i, j)] = (c, rank, mutual)
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    parts=hst.lists(
        hst.tuples(
            hst.sampled_from(["B1", "B2"]),  # brand
            hst.integers(1, 6),  # price half-units (exact doubles)
            hst.integers(1, 5),  # size
        ),
        min_size=1,
        max_size=25,
    )
)
def test_pareto_frontier_equals_bruteforce_dominance(spark, parts):
    """The brand-partitioned running-MAX(size) sweep in q_pareto_frontier
    equals the quadratic NOT-EXISTS dominance definition (Borzsony-
    Kossmann-Stocker 2001) on random frames — the DuckDB oracle replays
    the same sweep formulation, so cross-engine parity alone proves the
    rewrite on both engines, not the rewrite against the definition
    (round-6 verdict #3; precedent: triangle-count brute force above).
    Duplicate (brand, price, size) cells are generated on purpose: they
    must collapse into one cell and survive or fall together."""
    rows = [
        (b, float(p) / 2.0, s, 1000 + i) for i, (b, p, s) in enumerate(parts)
    ]
    df = spark.createDataFrame(
        rows, "p_brand string, p_retailprice double, p_size int, p_partkey long"
    )
    # quadratic dominance brute force over distinct (brand, price, size) cells
    cells = {}
    for b, p, s, pk in rows:
        n, mpk = cells.get((b, p, s), (0, pk))
        cells[(b, p, s)] = (n + 1, min(mpk, pk))
    expected = set()
    for (b, p, s), (n, mpk) in cells.items():
        dominated = any(
            b2 == b and p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for (b2, p2, s2) in cells
        )
        if not dominated:
            expected.add((b, p, s, n, mpk))
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/part.parquet")
        got = {
            (r.p_brand, r.price, r.size, r.n_parts, r.min_partkey)
            for r in load_all()["q_pareto_frontier"].spark(spark, d).collect()
        }
    assert got == expected


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cells=hst.lists(
        hst.tuples(hst.integers(1, 9), hst.integers(0, 4), hst.integers(0, 4)),
        min_size=2,
        max_size=10,
        unique_by=lambda t: t[0],
    )
)
def test_kendall_tau_equals_bruteforce(spark, cells, tmp_path_factory):
    """The panel nested fold in q_kendall_tau equals the textbook pairwise
    tau-b definition on random monthly frames (ties generated on purpose).
    Each synthetic month gets `n` orders of equal price so the rollup
    produces exactly the (x=revenue cents, y=count) cells we control."""
    import itertools
    import math

    rows = []
    for m, price_units, n_orders in cells:
        for k in range(n_orders + 1):  # >=1 order per month
            rows.append((f"2024-{m:02d}-01", float(price_units)))
    df_rows = [(i, d, p) for i, (d, p) in enumerate(rows)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            df_rows, "o_orderkey long, o_orderdate string, o_totalprice double"
        ).selectExpr(
            "o_orderkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
            "o_totalprice"
        ).write.parquet(f"{d}/orders.parquet")
        got = load_all()["q_kendall_tau"].spark(spark, d).collect()[0]
    # brute force over the aggregated cells
    agg = {}
    for _, dt, p in df_rows:
        m = dt[:7]
        x, y = agg.get(m, (0, 0))
        agg[m] = (x + round(p * 100), y + 1)
    pts = [agg[m] for m in sorted(agg)]
    c = d_ = tx = ty = 0
    for (x1, y1), (x2, y2) in itertools.combinations(pts, 2):
        if (x1 < x2 and y1 < y2) or (x1 > x2 and y1 > y2):
            c += 1
        elif (x1 < x2 and y1 > y2) or (x1 > x2 and y1 < y2):
            d_ += 1
        if x1 == x2:
            tx += 1
        if y1 == y2:
            ty += 1
    n0 = len(pts) * (len(pts) - 1) // 2
    assert (got.n0, got.concordant, got.discordant, got.ties_x, got.ties_y) == (
        n0, c, d_, tx, ty,
    )
    if n0 > tx and n0 > ty:
        expect_tau = round((c - d_) / (math.sqrt(n0 - tx) * math.sqrt(n0 - ty)), 6)
        assert got.tau_b == pytest.approx(expect_tau, abs=2e-6)
    else:
        assert got.tau_b is None  # constant variable: tau undefined


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=hst.sets(
        hst.tuples(hst.integers(1, 8), hst.integers(1, 8)).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=16,
    )
)
def test_ktruss_equals_bruteforce_peel(spark, edges):
    """The wedge-join support peel in x_ktruss equals a set-intersection
    brute force running the same fixed round count on random graphs."""
    from spark_fuse_spark.catalog.graph_queries import _KTRUSS_K, _KTRUSS_ROUNDS

    rows = []
    order = 500
    for u, v in sorted(edges):  # encode each edge as two co-purchase orders
        for _ in range(2):
            rows.append((order, u)); rows.append((order, v)); order += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    alive = set(edges)
    prev_n = None
    for _ in range(_KTRUSS_ROUNDS):
        prev_n = len(alive)
        nbrs = {}
        for u, v in alive:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        alive = {
            (u, v)
            for u, v in alive
            if len(nbrs[u] & nbrs[v]) >= _KTRUSS_K - 2
        }
    nodes = {n for e in alive for n in e}
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        got = load_all()["x_ktruss"].spark(spark, d).collect()[0]
    assert got.n_edges == len(alive)
    assert got.edge_checksum == sum(u * 31 + v for u, v in alive)
    assert got.n_nodes == len(nodes)
    assert got.converged == (len(alive) == prev_n)


def test_fourier_harmonics_match_numpy_fft(spark):
    """e_fourier_harmonics equals numpy's FFT of the same mean-centered
    daily series at sf0.001 — a fully independent DFT implementation."""
    import duckdb
    import numpy as np

    sf = "/root/testdata/sf0.001"
    days = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) d, "
        f"CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) c "
        f"FROM read_parquet('{sf}/orders.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    x = np.array([c for _, c in days], dtype=float)
    x = x - x.mean()
    n = len(x)
    spec = np.fft.fft(x)
    rows = load_all()["e_fourier_harmonics"].spark(spark, sf).collect()
    assert [r.harmonic for r in rows] == [1, 2, 3]
    for r in rows:
        coef = spec[r.harmonic]
        # numpy's sign convention: X_k = sum x_t * exp(-2pi i k t / n)
        re, im = coef.real, -coef.imag
        amp = np.floor(np.hypot(re, im) * 2 / n / 100 * 100 + 0.5) / 100
        ph = np.floor(np.arctan2(im, re) * 10000 + 0.5) / 10000
        assert r.amplitude_dollars == pytest.approx(amp, abs=0.02)
        assert r.phase == pytest.approx(ph, abs=2e-4)


def test_levene_w_matches_python_bruteforce(spark):
    """q_levene_test's exact-integer deviation assembly equals the
    textbook float Levene W computed directly in python at sf0.001."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT) "
        f"FROM read_parquet('{sf}/orders.parquet')"
    ).fetchall()
    groups = {}
    for g, x in rows:
        groups.setdefault(g, []).append(x)
    zbars, zs = {}, {}
    for g, xs in groups.items():
        mean = sum(xs) / len(xs)
        z = [abs(x - mean) for x in xs]
        zs[g] = z
        zbars[g] = sum(z) / len(z)
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    zbar = sum(sum(v) for v in zs.values()) / n
    num = sum(len(zs[g]) * (zbars[g] - zbar) ** 2 for g in groups)
    den = sum(sum((z - zbars[g]) ** 2 for z in zs[g]) for g in groups)
    w = (n - k) / (k - 1) * num / den
    got = load_all()["q_levene_test"].spark(spark, sf).collect()[0]
    assert got.k_groups == k and got.n == n
    assert got.levene_w == pytest.approx(w, rel=1e-6)


def test_cochran_armitage_matches_python_bruteforce(spark):
    """q_cochran_armitage's z equals the direct CA formula in python."""
    import math

    import duckdb

    sf = "/root/testdata/sf0.001"
    cells = duckdb.sql(
        f"SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) w, COUNT(*) n, "
        f"SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) k "
        f"FROM read_parquet('{sf}/orders.parquet') GROUP BY 1"
    ).fetchall()
    nn = sum(n for _, n, _ in cells)
    kk = sum(k for _, _, k in cells)
    pbar = kk / nn
    num = sum(w * k for w, _, k in cells) - pbar * sum(w * n for w, n, _ in cells)
    swn = sum(w * n for w, n, _ in cells)
    var = pbar * (1 - pbar) * (sum(w * w * n for w, n, _ in cells) - swn * swn / nn)
    z = num / math.sqrt(var)
    got = load_all()["q_cochran_armitage"].spark(spark, sf).collect()[0]
    assert (got.n, got.successes) == (nn, kk)
    assert got.z_score == pytest.approx(math.floor(z * 10000 + 0.5) / 10000, abs=2e-4)


def test_vocab_overlap_matches_python_sets(spark):
    """t_vocab_overlap's top pairs equal python set arithmetic over the
    same whitespace-lowercase token sets at sf0.001."""
    import duckdb
    import re as _re

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    vocab = {}
    for src, text in docs:
        toks = _re.sub(r"\s+", " ", text).strip().lower().split(" ")
        vocab.setdefault(src, set()).update(toks)
    pairs = []
    for a in sorted(vocab):
        for b in sorted(vocab):
            if a >= b:
                continue
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue
            j = round(inter / len(vocab[a] | vocab[b]), 6)
            c = round(inter / min(len(vocab[a]), len(vocab[b])), 6)
            pairs.append((-j, a, b, len(vocab[a]), len(vocab[b]), inter, j, c))
    pairs.sort()
    expect = [(p[1], p[2], p[3], p[4], p[5], p[6], p[7]) for p in pairs[:25]]
    got = [
        (r.src_a, r.src_b, r.vocab_a, r.vocab_b, r.inter, r.jaccard, r.containment)
        for r in load_all()["t_vocab_overlap"].spark(spark, sf).collect()
    ]
    assert got == expect


def test_bass_diffusion_matches_numpy_lstsq(spark):
    """e_bass_diffusion's exact-moment Cramer solve equals numpy's
    least-squares fit of a on [1, N, N^2] at sf0.001 — an independent
    solver over independently assembled design matrices."""
    import math

    import duckdb
    import numpy as np

    sf = "/root/testdata/sf0.001"
    cells = duckdb.sql(
        f"""WITH fo AS (SELECT o_custkey, MIN(strftime(o_orderdate, '%Y-%m')) m
                        FROM read_parquet('{sf}/orders.parquet') GROUP BY 1)
            SELECT m, COUNT(*) a FROM fo GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    a = np.array([c for _, c in cells], dtype=float)
    nprev = np.concatenate([[0.0], np.cumsum(a)[:-1]])
    X = np.column_stack([np.ones_like(nprev), nprev, nprev**2])
    c0, c1, c2 = np.linalg.lstsq(X, a, rcond=None)[0]
    got = load_all()["e_bass_diffusion"].spark(spark, sf).collect()[0]
    assert got.n_periods == len(cells)
    assert got.c0 == pytest.approx(c0, rel=1e-5)
    assert got.c1 == pytest.approx(c1, rel=1e-5)
    assert got.c2 == pytest.approx(c2, rel=1e-4, abs=1e-8)
    if c2 < 0 and c1 * c1 - 4 * c2 * c0 >= 0:
        m_hat = (-c1 - math.sqrt(c1 * c1 - 4 * c2 * c0)) / (2 * c2)
        assert got.m_hat == pytest.approx(m_hat, rel=1e-4)
        assert got.p_innovation == pytest.approx(c0 / m_hat, rel=1e-4)
        assert got.q_imitation == pytest.approx(c0 / m_hat + c1, rel=1e-3)
    else:
        assert got.m_hat is None
