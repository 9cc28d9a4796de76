"""Simulate the driver's correctness sweep: run every ``queries()`` entry
and its ``oracle_sql()`` twin at a given SF dir, compare row counts +
sorted-column value hashes, and print per-query wall time.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _hash_df(pdf) -> str:
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # Normalize: floats to 6 decimals, everything to string, sorted rows.
    import datetime as _dt

    def norm(v):
        if v is None:
            return ""
        try:
            if pd.isna(v):  # NaT / nan — Spark returns None, DuckDB NaT
                return ""
        except (TypeError, ValueError):
            pass  # arrays
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, pd.Timestamp) or isinstance(v, _dt.datetime):
            # date-typed Spark outputs come back as datetime.date while the
            # DuckDB twin renders midnight timestamps — compare date part
            if (v.hour, v.minute, v.second) == (0, 0, 0):
                return str(v.date())
            return str(v)
        return str(v)

    rows = sorted(
        "|".join(norm(v) for v in rec) for rec in pdf.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from spark_fuse_spark.session import create_session

    spark = create_session(app_name="driver-sim")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    queries = entry.queries()
    oracles = entry.oracle_sql()

    results = {}
    t_total = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            t_spark = time.time() - t0
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": f"spark: {exc}"[:200], "sec": time.time() - t0}
            print(f"{name:34s} SPARK-ERR {exc}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = {
                "rows": len(spdf), "oracle": None, "sec": round(t_spark, 2),
            }
            print(f"{name:34s} rows={len(spdf):<7d} no_oracle  {t_spark:6.2f}s", flush=True)
            continue
        t1 = time.time()
        try:
            opdf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": f"oracle: {exc}"[:200]}
            print(f"{name:34s} ORACLE-ERR {exc}", flush=True)
            continue
        t_oracle = time.time() - t1
        rows_ok = len(spdf) == len(opdf)
        cols_ok = sorted(map(str.lower, spdf.columns)) == sorted(
            map(str.lower, opdf.columns)
        )
        spdf.columns = [c.lower() for c in spdf.columns]
        opdf.columns = [c.lower() for c in opdf.columns]
        hash_ok = cols_ok and _hash_df(spdf) == _hash_df(opdf)
        status = "OK " if (rows_ok and cols_ok and hash_ok) else "MISMATCH"
        results[name] = {
            "rows_match": rows_ok, "schema_match": cols_ok, "hash_match": hash_ok,
            "spark_rows": len(spdf), "oracle_rows": len(opdf),
            "spark_sec": round(t_spark, 2), "oracle_sec": round(t_oracle, 2),
        }
        print(
            f"{name:34s} {status} rows={len(spdf):<7d} spark={t_spark:6.2f}s oracle={t_oracle:5.2f}s",
            flush=True,
        )
    total = time.time() - t_total
    bad = {
        k: v for k, v in results.items()
        if v.get("err") or v.get("rows_match") is False
        or v.get("schema_match") is False or v.get("hash_match") is False
    }
    print(f"\nTOTAL {total:.1f}s over {len(results)} queries; problems: {len(bad)}")
    if bad:
        print(json.dumps(bad, indent=2))
    spark.stop()
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
