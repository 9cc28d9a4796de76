"""Time every catalog query the way the driver does: Spark DataFrame
build + collect at a given SF dir, plus the DuckDB oracle run.

Usage: python tools/time_catalog.py [sf_dir] [--skip-oracle]
Prints per-query seconds sorted descending, plus totals — the feedback
loop for keeping the whole catalog inside the driver's correctness
budget.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_fuse_spark.catalog import load_all  # noqa: E402
from spark_fuse_spark.session import create_session  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    skip_oracle = "--skip-oracle" in sys.argv
    only = [a for a in sys.argv[2:] if not a.startswith("--")]

    registry = load_all()
    spark = create_session(app_name="time_catalog")
    spark.sparkContext.setLogLevel("ERROR")

    duck = None
    if not skip_oracle:
        import duckdb

        duck = duckdb.connect()
        for t in TABLES:
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )

    # warmup
    spark.range(1000).groupBy((F_col := __import__("pyspark.sql.functions", fromlist=["col"]).col)("id") % 7).count().collect()

    rows = []
    names = only or sorted(registry)
    for name in names:
        spec = registry[name]
        t0 = time.monotonic()
        try:
            df = spec.spark(spark, sf_dir)
            n = len(df.collect())
            spark_s = time.monotonic() - t0
            err = None
        except Exception as e:  # noqa: BLE001
            spark_s, n, err = time.monotonic() - t0, -1, str(e)[:200]
        oracle_s = 0.0
        if duck is not None and spec.oracle and err is None:
            t0 = time.monotonic()
            try:
                duck.execute(spec.oracle).fetchall()
            except Exception as e:  # noqa: BLE001
                err = "oracle: " + str(e)[:200]
            oracle_s = time.monotonic() - t0
        rows.append((name, spark_s, oracle_s, n, err))
        print(f"{name:36s} spark={spark_s:7.2f}s oracle={oracle_s:6.2f}s rows={n}"
              + (f" ERR={err}" if err else ""), flush=True)

    rows.sort(key=lambda r: -(r[1] + r[2]))
    print("\n== slowest ==")
    for name, s, o, n, err in rows[:15]:
        print(f"{name:36s} {s + o:7.2f}s (spark {s:.2f} + oracle {o:.2f})")
    tot_s = sum(r[1] for r in rows)
    tot_o = sum(r[2] for r in rows)
    print(json.dumps({"total_spark_sec": round(tot_s, 1),
                      "total_oracle_sec": round(tot_o, 1),
                      "total_sec": round(tot_s + tot_o, 1),
                      "n_queries": len(rows),
                      "errors": [r[0] for r in rows if r[4]]}))
    spark.stop()


if __name__ == "__main__":
    main()
