"""Property-based tests for the layout/governance operators: random
inputs through the real Spark pipelines vs pure-Python models — the
prefix-scan family's correctness depends on partition-boundary
arithmetic that example tests exercise only at fixed sizes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

values_strategy = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=values_strategy, parts=st.integers(min_value=1, max_value=9))
def test_prefix_sum_and_max_match_python_model(spark, values, parts):
    from spark_fuse_spark.operators.packing import with_prefix_max, with_prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "k long, v long"
    )
    got_sum = {
        r.k: r.ps
        for r in with_prefix_sum(df, "k", "v", out_col="ps", num_partitions=parts).collect()
    }
    got_max = {
        r.k: r.pm
        for r in with_prefix_max(df, "k", "v", out_col="pm", num_partitions=parts).collect()
    }
    run_sum, run_max = 0, None
    for i, v in enumerate(values):
        assert got_sum[i] == run_sum, f"prefix sum at {i}"
        assert got_max[i] == run_max, f"prefix max at {i}"
        run_sum += v
        run_max = v if run_max is None else max(run_max, v)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=5_000), min_size=1, max_size=30),
    target=st.integers(min_value=100, max_value=8_000),
)
def test_compaction_next_fit_matches_python_model(spark, sizes, target):
    """Next-fit by exclusive prefix DIV target: bins are contiguous, every
    segment lands in exactly one bin, totals are preserved."""
    from spark_fuse_spark.operators.packing import with_prefix_sum

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "m long, n_rows long"
    )
    pre = with_prefix_sum(df, "m", "n_rows", out_col="prefix", num_partitions=4)
    got = {
        r.m: r.bin
        for r in pre.select("m", (F.col("prefix") / target).cast("long").alias("bin")).collect()
    }
    prefix = 0
    bins = []
    for i, s in enumerate(sizes):
        want = prefix // target
        assert got[i] == want, f"segment {i}"
        bins.append(want)
        prefix += s
    assert bins == sorted(bins)  # contiguity: bins never go backwards


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=1, max_size=50
    )
)
def test_zorder_interleave_matches_python_model(spark, xs):
    """The catalog's Morton interleave == bit-interleaving in Python, stays
    within 16 bits, and is monotone in each dimension when the other is 0."""
    from spark_fuse_spark.catalog.scale_ops import _interleave_col

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(xs)], "i long, a long, b long"
    )
    got = {
        r.i: r.z
        for r in df.select(
            "i", _interleave_col(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }

    def morton(a: int, b: int) -> int:
        z = 0
        for bit in range(8):
            z |= ((a >> bit) & 1) << (2 * bit + 1)
            z |= ((b >> bit) & 1) << (2 * bit)
        return z

    for i, (a, b) in enumerate(xs):
        want = morton(a, b)
        assert got[i] == want and 0 <= want < 65536


# --------------------------------------------------------- spatial blocking
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),
            st.integers(min_value=0, max_value=5000),
        ),
        min_size=1,
        max_size=40,
    ),
    radius=st.integers(min_value=1, max_value=2000),
)
def test_radius_join_equals_bruteforce(spark, pts, radius):
    """Property: the radius-sized-grid blocked join returns EXACTLY the
    brute-force pair set for arbitrary integer points and radii — the 3×3
    neighborhood never misses a boundary-straddling pair and the distance
    filter never admits an extra one."""
    from spark_fuse_spark.operators.spatial import radius_join

    probe = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(pts)],
        "pid long, lat_micro long, lon_micro long",
    )
    build = spark.createDataFrame(
        [(100 + i, la, lo) for i, (la, lo) in enumerate(pts)],
        "bid long, b_lat long, b_lon long",
    )
    got = {
        (r.pid, r.bid): r.dist_sq
        for r in radius_join(
            probe, build, radius=radius, build_lat="b_lat", build_lon="b_lon"
        ).collect()
    }
    want = {}
    for i, (la, lo) in enumerate(pts):
        for j, (lb, lo2) in enumerate(pts):
            d = (la - lb) ** 2 + (lo - lo2) ** 2
            if d <= radius * radius:
                want[(i, 100 + j)] = d
    assert got == want


# ------------------------------------------------------ label propagation
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
def test_label_propagation_matches_python(spark, edges, rounds):
    """Property: K-round synchronous min-label propagation equals the
    Python reference on arbitrary graphs, and at round >= diameter the
    labels equal the connected-component minimum."""
    from spark_fuse_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.lbl for r in label_propagation(df, rounds=rounds).collect()}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        lbl = {n: min(min(lbl[m] for m in adj[n]), lbl[n]) for n in adj}
    assert got == lbl
    if rounds >= len(adj):  # rounds certainly >= diameter
        # every label must equal the min over the node's full BFS closure
        def closure(n):
            comp, stack = {n}, [n]
            while stack:
                for m in adj[stack.pop()]:
                    if m not in comp:
                        comp.add(m)
                        stack.append(m)
            return comp
        for n in adj:
            assert got[n] == min(closure(n))

# ------------------------------------------------------------------ HITS
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),
            st.integers(min_value=11, max_value=20),
        ),
        min_size=1,
        max_size=18,
        unique=True,
    ),
    iterations=st.integers(min_value=1, max_value=3),
)
def test_hits_matches_python(spark, edges, iterations):
    """Property: the exact-integer max-renormalized HITS recurrence equals
    a Python replay of the same recurrence on arbitrary bipartite-ish
    directed graphs (distinct edges, so multiplicity never differs)."""
    from spark_fuse_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    hubs_df, auths_df = hits(df, iterations=iterations)
    got_h = {r.node: r.score_micro for r in hubs_df.collect()}
    got_a = {r.node: r.score_micro for r in auths_df.collect()}

    scale = 1_000_000
    out: dict[int, list[int]] = {}
    inc: dict[int, list[int]] = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
        inc.setdefault(v, []).append(u)
    h = {n: scale for n in out}
    a: dict[int, int] = {}
    for _ in range(iterations):
        raw_a = {v: sum(h[u] for u in srcs if u in h) for v, srcs in inc.items()}
        raw_a = {v: s for v, s in raw_a.items() if s > 0}
        mx = max(raw_a.values())
        a = {v: (s * scale) // mx for v, s in raw_a.items()}
        raw_h = {u: sum(a[v] for v in dsts if v in a) for u, dsts in out.items()}
        raw_h = {u: s for u, s in raw_h.items() if s > 0}
        mx = max(raw_h.values())
        h = {u: (s * scale) // mx for u, s in raw_h.items()}
    assert got_a == a
    assert got_h == h


# ------------------------------------------------ personalized PageRank
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),
            st.integers(min_value=1, max_value=10),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    seeds=st.sets(st.integers(min_value=1, max_value=10), min_size=1, max_size=3),
    iterations=st.integers(min_value=1, max_value=3),
)
def test_personalized_pagerank_matches_python(spark, edges, seeds, iterations):
    """Property: the exact-integer restart-walk recurrence equals a
    Python replay on arbitrary directed graphs (distinct edges); seeds
    need not touch the graph (isolated seeds keep their restart mass)."""
    from spark_fuse_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r.node: r.score_micro
        for r in personalized_pagerank(df, sdf, iterations=iterations).collect()
    }

    scale, dn, dd = 1_000_000, 85, 100
    out: dict[int, list[int]] = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    p = {s: scale for s in seeds}
    for _ in range(iterations):
        infl: dict[int, int] = {}
        for u, score in p.items():
            for v in out.get(u, []):
                infl[v] = infl.get(v, 0) + (score * dn) // (dd * len(out[u]))
        p = {n: infl.get(n, 0) + (scale if n in seeds else 0)
             for n in set(infl) | seeds}
    assert got == p


# ----------------------------------------------------- MMR diversification
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=2,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_mmr_diversify_matches_python(spark, vecs, k):
    """Property: the integer-quantized greedy MMR pick sequence equals a
    Python replay of the same recurrence on arbitrary small vector sets
    (query = first vector, corpus = the rest, pool = whole corpus)."""
    import math

    from spark_fuse_spark.operators.similarity import mmr_diversify

    corpus = [(i + 1, [float(x) for x in v]) for i, v in enumerate(vecs[1:])]
    if not corpus:
        return
    k = min(k, len(corpus))
    qv = [float(x) for x in vecs[0]]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame([(qv,)], "query_vec array<double>")
    got = [
        (r.rank, r.id, r.qsim_micro, r.redundancy_micro)
        for r in mmr_diversify(cdf, qdf, k=k, pool=len(corpus)).collect()
    ]

    def cos_micro(a, b):
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        c = 0.0 if den == 0.0 else sum(x * y for x, y in zip(a, b)) / den
        return math.floor(c * 1_000_000 + 0.5)

    qs = {i: cos_micro(v, qv) for i, v in corpus}
    by = dict(corpus)
    first = max(qs, key=lambda i: (qs[i], -i))
    want = [(1, first, qs[first], None)]
    chosen = [first]
    for r in range(2, k + 1):
        rem = [i for i, _ in corpus if i not in chosen]
        red = {i: max(cos_micro(by[i], by[s]) for s in chosen) for i in rem}
        pick = max(rem, key=lambda i: (qs[i] - red[i], -i))
        want.append((r, pick, qs[pick], red[pick]))
        chosen.append(pick)
    assert got == want


# ------------------------------------------------------ two-phase lag
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.sets(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
    parts=st.integers(min_value=1, max_value=5),
)
def test_with_prev_value_matches_python(spark, vals, parts):
    """Property: the two-phase distributed lag equals Python's sorted
    lag for any partition count (NULL for the global minimum)."""
    from spark_fuse_spark.operators.packing import with_prev_value

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.v: r.prev_v
        for r in with_prev_value(df, "v", out_col="prev_v", num_partitions=parts).collect()
    }
    s = sorted(vals)
    want = {v: (s[i - 1] if i else None) for i, v in enumerate(s)}
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=80),
    depth=st.integers(min_value=1, max_value=4),
    width=st.integers(min_value=4, max_value=32),
)
def test_count_min_sketch_matches_python_model(spark, keys, depth, width):
    """operators/sketches vs a pure-Python CMS with the same md5 hashing:
    identical cells, identical estimates, and the one-sided guarantee
    (estimate >= exact count for every key)."""
    import hashlib
    from collections import Counter

    from spark_fuse_spark.operators.sketches import count_min_cells, count_min_probe

    df = spark.createDataFrame([(str(k),) for k in keys], "k string")
    cells = {
        (r.j, r.b): r.c
        for r in count_min_cells(df, "k", depth, width).collect()
    }

    def bucket(j, k):
        return int(hashlib.md5(f"{k}#cms{j}".encode()).hexdigest()[:15], 16) % width

    model = Counter()
    for k in keys:
        for j in range(depth):
            model[(j, bucket(j, str(k)))] += 1
    assert cells == dict(model)

    exact = Counter(str(k) for k in keys)
    cand = spark.createDataFrame([(k,) for k in exact], "k string")
    est = {
        r.k: r.cms_est
        for r in count_min_probe(
            count_min_cells(df, "k", depth, width), cand, "k", depth, width
        ).collect()
    }
    for k, n in exact.items():
        assert est[k] >= n
        assert est[k] == min(model[(j, bucket(j, k))] for j in range(depth))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
        min_size=5,
        max_size=120,
    ),
    bins=st.integers(min_value=2, max_value=64),
    q=st.sampled_from([0.1, 0.5, 0.9]),
)
def test_histogram_quantiles_match_python_model(spark, vals, bins, q):
    """operators/histogram vs a pure-Python equi-width model: identical
    cells, identical midpoint estimate, and the estimate lands within half
    a bin width of the true order statistic; cells built from two disjoint
    halves and sum-merged equal the direct cells (mergeability)."""
    import math

    from pyspark.sql import functions as F

    from spark_fuse_spark.operators.histogram import (
        equi_width_histogram,
        histogram_quantiles,
        value_span,
    )

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    lo, hi = min(vals), max(vals)
    span = value_span(df, "v")
    hist = equi_width_histogram(df, "v", bins, span=span)
    got_cells = {r.bin: r.c for r in hist.collect()}

    def pybin(v):
        if hi == lo:
            return 0
        return min(bins - 1, math.floor((v - lo) / (hi - lo) * bins))

    model = {}
    for v in vals:
        model[pybin(v)] = model.get(pybin(v), 0) + 1
    assert got_cells == model

    est = histogram_quantiles(spark, hist, span, [q], bins).collect()
    assert len(est) == 1
    got = est[0].est
    # python model of the same estimator
    n = len(vals)
    cum = 0
    for b in sorted(model):
        cum += model[b]
        if cum >= q * n:
            want = lo + (b + 0.5) * (hi - lo) / bins
            break
    assert abs(got - want) < 1e-9
    # accuracy: within half a bin width of the true order statistic
    rank_val = sorted(vals)[max(0, math.ceil(q * n) - 1)]
    assert abs(got - rank_val) <= (hi - lo) / bins / 2 + 1e-9 or hi == lo

    # mergeability: per-half partial histograms sum-merge to the direct one
    half = len(vals) // 2
    if half and len(vals) - half:
        a = spark.createDataFrame([(float(v),) for v in vals[:half]], "v double")
        b = spark.createDataFrame([(float(v),) for v in vals[half:]], "v double")
        merged = (
            equi_width_histogram(a, "v", bins, span=span)
            .unionByName(equi_width_histogram(b, "v", bins, span=span))
            .groupBy("bin")
            .agg(F.sum("c").alias("c"))
        )
        assert {r.bin: r.c for r in merged.collect()} == model


def test_histogram_excludes_nulls_from_bins_and_n(spark):
    """Null values must not become a null bin: a null bin would be counted
    into n by histogram_quantiles and sort engine-dependently (Spark
    nulls-first vs DuckDB nulls-last), skewing estimates on nullable
    inputs.  Nulls are excluded before binning; n counts binned rows."""
    from spark_fuse_spark.operators.histogram import (
        equi_width_histogram,
        histogram_quantiles,
        value_span,
    )

    vals = [0.0, 1.0, 2.0, 3.0, None, None, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    span = value_span(df, "v")
    hist = equi_width_histogram(df, "v", 4, span=span)
    cells = {r.bin: r.c for r in hist.collect()}
    assert None not in cells
    assert sum(cells.values()) == 4  # only non-null rows binned
    # median over {0,1,2,3}: cc >= 0.5*4 first at bin 1 -> midpoint 1.125
    est = histogram_quantiles(spark, hist, span, [0.5], 4).collect()
    assert abs(est[0].est - (0.0 + 1.5 * 3.0 / 4)) < 1e-9


def test_count_min_probe_unseen_key_estimates_zero(spark):
    from spark_fuse_spark.operators.sketches import count_min_cells, count_min_probe

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    cells = count_min_cells(df, "k", 4, 64)
    cand = spark.createDataFrame([("a",), ("zzz-never-seen",)], "k string")
    est = {r.k: r.cms_est for r in count_min_probe(cells, cand, "k", 4, 64).collect()}
    assert est["a"] >= 2
    assert est["zzz-never-seen"] == 0  # empty cells -> 0, row not dropped
