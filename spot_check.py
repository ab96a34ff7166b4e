"""Spot-check a subset of registered queries against the DuckDB oracle.

Fast iteration companion to ``full_registry_sweep.py`` (same bare
session, same compare) for while-you-work verification of just the
queries a change touched.

Usage:  python spot_check.py <query> [<query> ...]
        SPARK_GRAFT_SWEEP_SF=/root/testdata/sf0.001 to override the SF
        (default sf0.01 — the driver's correctness scale).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: python spot_check.py <query> [<query> ...]")
    sf = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    from bigdata_20251_steam_spark.plans.registry import QUERIES
    from oracle_harness import compare, duckdb_run

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    failed = []
    for n in names:
        q = QUERIES[n]
        t0 = time.time()
        try:
            got = q.fn(spark, sf)
            if q.oracle is None:
                cnt = got.count()
                print(f"{n}: rows-only (no oracle) {cnt} rows "
                      f"[{time.time() - t0:.1f}s]", flush=True)
                continue
            exp = duckdb_run(q.oracle, sf)
            compare(got, exp, n)
            print(f"{n}: match ({len(exp)} rows) [{time.time() - t0:.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failed.append(n)
            print(f"{n}: FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
    spark.stop()
    if failed:
        raise SystemExit(f"FAILED: {failed}")
    print("all match")


if __name__ == "__main__":
    main()
