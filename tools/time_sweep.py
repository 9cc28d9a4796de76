"""Time the full driver-style correctness sweep at sf0.01.

Replicates what the driver does per query: run the Spark query
(collect) and the DuckDB oracle, and report per-query wall seconds so
we can find and fix anything that would blow a driver time budget.

Usage: python tools/time_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from spark_fuse_spark.session import create_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = create_session(app_name="time-sweep")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = queries()
    oracles = oracle_sql()
    rows = []
    t_total = time.monotonic()
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            n = len(fn(spark, sf_dir).collect())
            spark_s = time.monotonic() - t0
        except Exception as exc:  # noqa: BLE001
            rows.append({"q": name, "err": f"spark: {exc}"[:200]})
            continue
        duck_s = 0.0
        if name in oracles:
            t1 = time.monotonic()
            try:
                con.execute(oracles[name]).fetchall()
                duck_s = time.monotonic() - t1
            except Exception as exc:  # noqa: BLE001
                rows.append({"q": name, "err": f"duck: {exc}"[:200]})
                continue
        rows.append(
            {"q": name, "rows": n, "spark_s": round(spark_s, 2), "duck_s": round(duck_s, 2)}
        )
    total = time.monotonic() - t_total
    rows.sort(key=lambda r: -(r.get("spark_s", 0) + r.get("duck_s", 0)))
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({"total_s": round(total, 1), "n_queries": len(qs)}))
    spark.stop()


if __name__ == "__main__":
    main()
