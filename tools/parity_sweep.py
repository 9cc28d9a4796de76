"""Full driver-style parity sweep: every oracle-bearing catalog query vs
its DuckDB oracle at an arbitrary SF dir (default sf0.01 — what the
driver's CORRECTNESS gate runs).

Usage: python tools/parity_sweep.py [sf_dir] [name ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_fuse_spark.catalog import load_all  # noqa: E402
from spark_fuse_spark.session import create_session  # noqa: E402
from spark_fuse_spark.testing import compare_frames, duckdb_connection  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    registry = load_all()
    spark = create_session(app_name="parity_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb_connection(sf_dir)

    failures = []
    names = only or sorted(n for n, s in registry.items() if s.oracle is not None)
    t0 = time.monotonic()
    for name in names:
        spec = registry[name]
        if spec.oracle is None:
            continue
        try:
            res = compare_frames(name, spec.spark(spark, sf_dir), duck, spec.oracle)
            ok = res.ok
            detail = res.detail
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"exception: {e}"[:300]
        print(f"{'PASS' if ok else 'FAIL'} {name}" + ("" if ok else f"  {detail}"),
              flush=True)
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} pass "
          f"in {time.monotonic() - t0:.0f}s; failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
