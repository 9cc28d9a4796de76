"""Empirical scaling-curve probe: measure, don't just plan-inspect.

The repo asserts 100-TB safety via plan gates (no cartesian, bounded
windows) and executed-metrics spot tests; this tool turns that into a
measured curve per query family.  It runs the top-cost dedup (d_*),
ANN (v_*) and graph (x_*) queries at sf0.001 / sf0.01 / sf0.1, captures
wall-clock plus APP-LEVEL shuffle write records/bytes per query (the
Spark UI REST API sums over ALL stages, so iterative queries'
checkpointed rounds are counted — unlike final-plan `executed_metrics`),
fits the growth exponent of each metric against SF on a log-log axis,
and flags anything super-linear in shuffle volume.

Exponent semantics: rows scale ~10x per SF step, so an exponent of 1.0
means shuffle volume grows linearly with data (fine — a 100x corpus
costs 100x shuffle), < 1 means the query shuffles a bounded or sublinear
relation (candidate sets, vocabulary, panels), and > 1 means shuffle
volume outgrows the data — the class that falls over at 100 TB.
Wall-clock exponents at these SFs are dominated by fixed planning and
action overhead (~0.3-1 s/query), so they systematically UNDER-state
data-cost growth; shuffle records/bytes are the scale signal, wall is
context.

Flag rule: shuffle-records exponent > 1.15 AND records(sf0.1) > 100k
(tiny absolute shuffles can't be the 100-TB bottleneck no matter the
exponent, and sub-100k deltas are inside AQE partition-count noise).

Usage:  python tools/scaling_probe.py [--out SCALE_PROBE.json]
        (~8 min on local[32]; writes JSON and prints a markdown table)
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_fuse_spark.catalog import load_all  # noqa: E402
from spark_fuse_spark.session import create_session  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

# top-cost representatives of each scale-critical family (the queries a
# 100x scale-up stresses first: candidate generation, banded verify,
# bounded-round graph iteration, broadcast-panel ANN)
PROBE_QUERIES = [
    # exact + near-dup dedup ladder
    "d_dedup_exact",
    "d_minhash_lsh",
    "d_ngram_jaccard",
    "d_simhash",
    "d_embedding_neardup",
    "d_semantic_dedup",
    "d_dedup_clusters",
    "d_minhash_bbit",
    "d_containment",
    "d_lsh_recall_audit",
    "d_levenshtein_blocked",
    "d_winnowing",
    # ANN ladder
    "v_ann_bruteforce",
    "v_ivf_topk",
    "v_pq_topk",
    "v_sq8_topk",
    "v_label_knn_graph",
    # iterative graph
    "x_pagerank_suppliers",
    "x_triangle_count",
    "x_kcore",
    "x_label_propagation",
    "x_hits_suppliers",
    "x_ktruss",
]

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4059"))


def _stage_totals(app_id: str) -> "dict[str, int]":
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    return {
        "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in stages),
        "shuffle_write_records": sum(s["shuffleWriteRecords"] for s in stages),
        "input_records": sum(s["inputRecords"] for s in stages),
    }


def _fit_exponent(sfs: "list[float]", vals: "list[float]") -> "float | None":
    """Least-squares slope of log10(val) vs log10(sf); None when any
    value is 0 (no shuffle at some SF — exponent undefined/irrelevant)."""
    pts = [(math.log10(s), math.log10(v)) for s, v in zip(sfs, vals) if v > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    return sxy / sxx if sxx else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "scaling_probe_out.json"))
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()
    queries = args.queries or PROBE_QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = create_session(
        app_name="spark-fuse-scaling-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_configs={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "20g"),
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            # the status store evicts old stages at its retention limit
            # (default 1000), which silently corrupts before/after stage
            # deltas over a multi-query session — retain everything the
            # probe can produce (measured: ~23 queries x 3 SFs x 2 passes
            # ≈ 6k stages)
            "spark.ui.retainedStages": "200000",
            "spark.ui.retainedJobs": "200000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    registry = load_all()
    # python-worker warmup so the first pandas-UDF query isn't billed
    spark.range(2).mapInPandas(lambda it: it, "id long").collect()

    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    results: "dict[str, dict]" = {}
    for name in queries:
        spec = registry[name]
        per_sf = {}
        for sf in SFS:
            sf_dir = os.path.join(base, f"sf{sf}")
            # warm pass: codegen compile + AQE plan at THIS sf (uncounted)
            spec.spark(spark, sf_dir).count()
            before = _stage_totals(app_id)
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            after = _stage_totals(app_id)
            per_sf[sf] = {
                "wall_sec": round(wall, 3),
                **{k: after[k] - before[k] for k in before},
            }
        sfs = [float(s) for s in SFS]
        rec = [per_sf[s]["shuffle_write_records"] for s in SFS]
        byt = [per_sf[s]["shuffle_write_bytes"] for s in SFS]
        wal = [per_sf[s]["wall_sec"] for s in SFS]
        exps = {
            "shuffle_records_exp": _fit_exponent(sfs, rec),
            "shuffle_bytes_exp": _fit_exponent(sfs, byt),
            "wall_exp": _fit_exponent(sfs, wal),
        }
        flagged = bool(
            exps["shuffle_records_exp"] is not None
            and exps["shuffle_records_exp"] > 1.15
            and rec[-1] > 100_000
        )
        results[name] = {"per_sf": per_sf, **exps, "flagged": flagged}
        e = exps["shuffle_records_exp"]
        print(
            f"{name}: rec_exp={e if e is None else round(e, 2)} "
            f"bytes_exp={exps['shuffle_bytes_exp'] and round(exps['shuffle_bytes_exp'], 2)} "
            f"wall(0.1)={wal[-1]:.2f}s rec(0.1)={rec[-1]:,}"
            + ("  ** FLAGGED super-linear **" if flagged else ""),
            file=sys.stderr,
        )

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)

    # markdown fragment for SCALE.md
    print("\n| query | shuffle_records exp | shuffle_bytes exp | wall exp | records @sf0.1 | bytes @sf0.1 | wall @sf0.1 |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        fmt = lambda v: "n/a" if v is None else f"{v:.2f}"  # noqa: E731
        p = r["per_sf"]["0.1"]
        mark = " **FLAG**" if r["flagged"] else ""
        print(
            f"| {name} | {fmt(r['shuffle_records_exp'])}{mark} | {fmt(r['shuffle_bytes_exp'])} "
            f"| {fmt(r['wall_exp'])} | {p['shuffle_write_records']:,} "
            f"| {p['shuffle_write_bytes']:,} | {p['wall_sec']:.2f}s |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
