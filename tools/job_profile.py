"""Job-level profiler: run one catalog query and attribute wall time to
the individual Spark jobs it launches (guide §1 / §7.1 — where does the
time actually go inside a multi-job query: eager localCheckpoints,
fixpoint probes, broadcast builds, the final action).

Usage: python tools/job_profile.py NAME [--sf DIR] [--passes N]

Prints one line per Spark job (ordered):  job_id  seconds  callsite
then a JSON summary {"name", "total_noop_sec", "n_jobs", "jobs_sec"}.

Implementation: log4j INFO lines from DAGScheduler land on this
process's stderr in local mode; we tee stderr to a file and parse
"Job N finished: <callsite>, took <t> s".  Engineering instrument only —
bench.py's contract is untouched.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--log", default="/tmp/job_profile_stderr.log")
    args = ap.parse_args()

    # redirect fd 2 (JVM log4j writes there) to a file we can parse
    log_fd = os.open(args.log, os.O_CREAT | os.O_WRONLY | os.O_TRUNC)
    os.dup2(log_fd, 2)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = create_session(
        app_name="job-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_configs={"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    spark.range(2).mapInPandas(lambda it: it, "id long").collect()

    pat = re.compile(r"Job (\d+) finished: (.*), took ([0-9.]+) (m?s)")
    spat = re.compile(r"(ShuffleMapStage|ResultStage) (\d+) \((.*)\) finished in ([0-9.]+) (m?s)")
    for name in args.names:
        spec = registry[name]
        # warm pass(es): codegen compilation etc.
        for _ in range(args.passes - 1):
            spec.spark(spark, args.sf).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setLogLevel("INFO")
        mark = os.path.getsize(args.log)
        t0 = time.perf_counter()
        spec.spark(spark, args.sf).write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        spark.sparkContext.setLogLevel("ERROR")
        time.sleep(0.3)
        with open(args.log) as fh:
            fh.seek(mark)
            tail = fh.read()
        jobs = [(int(m.group(1)), float(m.group(3)) / (1000.0 if m.group(4) == "ms" else 1.0), m.group(2)) for m in pat.finditer(tail)]
        stages = [(int(m.group(2)), float(m.group(4)) / (1000.0 if m.group(5) == "ms" else 1.0), m.group(3)) for m in spat.finditer(tail)]
        print(f"== {name}  steady-pass noop total {total:.2f}s, {len(jobs)} jobs, {len(stages)} stages ==")
        for jid, secs, site in jobs:
            if secs >= 0.1:
                print(f"  job {jid:>4}  {secs:7.2f}s  {site[:100]}")
        for sid, secs, site in sorted(stages, key=lambda s: -s[1])[:12]:
            if secs >= 0.2:
                print(f"  stage {sid:>4}  {secs:7.2f}s  {site[:100]}")
        print(json.dumps({
            "name": name,
            "total_noop_sec": round(total, 3),
            "n_jobs": len(jobs),
            "jobs_sec": round(sum(j[1] for j in jobs), 3),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
