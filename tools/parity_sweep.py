"""Full driver-style parity sweep: every oracle-bearing catalog query vs
its DuckDB oracle at an arbitrary SF dir (default sf0.01 — what the
driver's CORRECTNESS gate runs).

Usage: python tools/parity_sweep.py [sf_dir] [name ...] [--threads N]

--threads N (default 1) runs N queries in flight at once.  The sweep's
wall-time is dominated by fixed per-query planning/action overhead
(profiled round 7: ~1.4 s/query while the 32-core host sits mostly
idle), so overlapping queries reclaims that idle time — Spark job
submission is thread-safe, and each worker gets its OWN DuckDB
connection (a DuckDB connection is not).  The handful of catalog
queries that register temp views all run at the same sf_dir here, so
concurrent re-registration writes identical definitions — a benign
race.  Results are identical to the serial sweep; only completion
order (and thus PASS-line interleaving) differs.
"""
from __future__ import annotations

import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_fuse_spark.catalog import load_all  # noqa: E402
from spark_fuse_spark.session import create_session  # noqa: E402
from spark_fuse_spark.testing import compare_frames, duckdb_connection  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    threads = 1
    if "--threads" in args:
        i = args.index("--threads")
        threads = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:]
    registry = load_all()
    spark = create_session(app_name="parity_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    tls = threading.local()

    def duck():
        if not hasattr(tls, "con"):
            tls.con = duckdb_connection(sf_dir)
        return tls.con

    def check(name: str) -> "tuple[str, bool, str]":
        spec = registry[name]
        if spec.oracle is None:
            print(f"SKIP {name}  (rows-only: no oracle)", flush=True)
            return name, True, "skipped"
        try:
            res = compare_frames(name, spec.spark(spark, sf_dir), duck(), spec.oracle)
            ok, detail = res.ok, res.detail
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"exception: {e}"[:300]
        print(f"{'PASS' if ok else 'FAIL'} {name}" + ("" if ok else f"  {detail}"),
              flush=True)
        return name, ok, detail

    names = only or sorted(n for n, s in registry.items() if s.oracle is not None)
    t0 = time.monotonic()
    if threads > 1:
        with ThreadPoolExecutor(max_workers=threads) as pool:
            results = list(pool.map(check, names))
    else:
        results = [check(n) for n in names]
    failures = [n for n, ok, _ in results if not ok]
    print(f"\n{len(names) - len(failures)}/{len(names)} pass "
          f"in {time.monotonic() - t0:.0f}s; failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
