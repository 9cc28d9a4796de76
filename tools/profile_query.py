"""Per-query profiler for optimization work (guide §1).

Usage: python tools/profile_query.py NAME [NAME...] [--sf DIR] [--passes N]
       [--plan-dir plans/r09] [--suffix before]

For each query: builds the DataFrame, writes `.explain("formatted")` to
<plan-dir>/<name>_<suffix>.txt, then times `passes` noop-sink executions
(`df.write.format("noop")` — computes every column of every row, unlike
the bench's count(); see guide §1.4) and prints min/median. Jobs are
labelled with setJobDescription. Prints a JSON line per query:

  {"name": ..., "noop_sec": [...], "min": ..., "exchanges": N,
   "host_calib_sec": ...}

This is an engineering instrument — the bench contract (bench.py,
count-based timing) is unchanged.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_fuse_spark.catalog import load_all  # noqa: E402
from spark_fuse_spark.session import create_session  # noqa: E402


def _calib() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    _ = x
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = create_session(
        app_name="profile-query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_configs={"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    # python-worker + codegen warmup
    spark.range(2).mapInPandas(lambda it: it, "id long").collect()

    for name in args.names:
        spec = registry[name]
        df = spec.spark(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            with open(os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        times = []
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            df = spec.spark(spark, args.sf)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "name": name,
                    "noop_sec": times,
                    "min": min(times),
                    "exchanges": n_exchange,
                    "host_calib_sec": _calib(),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
