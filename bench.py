"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is timed end-to-end (plan + execute + collect-to-count).  The
first execution of any plan pays whole-stage-codegen compilation + JVM JIT
(~5-10x the steady-state time on this VM), so each query runs twice and the
minimum is reported — that is the engine's throughput, not the JIT's.
``value`` is the sum of per-query best times across the headline suite.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bigdata_20251_steam_spark.plans import QUERIES
    from bigdata_20251_steam_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    headline = [q for q in QUERIES.values() if q.headline]

    # Warmup: run the first headline query once to absorb JVM/codegen startup.
    if headline:
        headline[0].fn(spark, sf_dir).count()

    # min-of-3: the VM shows rare multi-second stalls (GC/noisy neighbor)
    # that would otherwise masquerade as engine regressions.
    times: dict[str, float] = {}
    for q in headline:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
            assert n >= 0
        times[q.name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
