"""Bench-methodology timing for a SUBSET of headline queries (A/B tool).

Usage: python tools/bench_subset.py NAME [NAME...] [--passes N]

Mirrors bench.py's contract per query — same session config, same
warm-then-steady count()-based timing, min reported — so numbers are
directly comparable to BENCH_DETAIL.json entries measured in a similar
host window (always read host_calib_sec alongside).  Engineering
instrument only; the bench contract itself lives in bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_fuse_spark.catalog import load_all  # noqa: E402
from spark_fuse_spark.session import create_session  # noqa: E402


def _calibrate_host() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    _ = x
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 1
    for a in sys.argv[1:]:
        if a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Session-config A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" lets an
    # interleaved experiment flip e.g. spark.sql.join.preferSortMergeJoin
    # without touching create_session defaults until the A/B is decided.
    extra = {"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "20g")}
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
        elif kv.strip():
            # a typo'd separator would silently run the DEFAULT config for
            # this arm and make the A/B conclude "a wash" — fail loudly
            raise SystemExit(
                f"SPARK_GRAFT_EXTRA_CONF entry {kv!r} has no '=' — refusing "
                "to run an A/B arm with a silently-dropped config"
            )
    print(f"# effective extra conf: {extra}", file=sys.stderr)
    spark = create_session(
        app_name="bench-subset",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_configs=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    spark.range(2).mapInPandas(lambda it: it, "id long").collect()

    warm: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t0 = time.perf_counter()
        registry[name].spark(spark, sf_dir).count()
        warm[name] = time.perf_counter() - t0
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    calib = _calibrate_host()

    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for p in range(passes):
            spark.sparkContext.setJobDescription(f"steady{p}:{name}")
            t0 = time.perf_counter()
            registry[name].spark(spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "min": round(min(samples + [warm[name]]), 3),
            "warm": round(warm[name], 3),
            "steady": samples,
        }
    print(json.dumps({"host_calib_sec": calib, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
