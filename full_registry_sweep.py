"""Full-registry correctness sweep on a BARE session at sf0.01.

Replicates the driver's comparison (rows+schema+value equality,
order-insensitive) for EVERY registered query — not just the 50-slot
driver window — and writes one JSON artifact
``CORRECTNESS_FULL_r{N}.json``.  This artifact is the per-round
coverage of record now that the registry (123+ queries) has outgrown
the 50-row driver window (see the staleness-invariant amendment in
``plans/registry.py``); the driver window remains a rotating
independent confirmation on top of it.

Promoted from a round-8 one-off to a repo script so every round
refreshes the artifact the same way (round-8 verdict #3: figures cited
in changelogs must come from committed artifacts — see
``round_figures.py``).

Usage:  python full_registry_sweep.py <round>     (e.g. 9)
        SPARK_GRAFT_SWEEP_SF=/root/testdata/sf0.01 to override the SF.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        raise SystemExit("usage: python full_registry_sweep.py <round-number>")
    rnd = int(sys.argv[1])
    sf = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
    # resolve the artifact's sf figure BEFORE the (minutes-long) sweep:
    # a path without an 'sf<number>' suffix must not discard the run at
    # write time — record the raw path instead
    try:
        sf_figure: float | str = float(sf.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf_figure = sf

    from pyspark.sql import SparkSession

    from bigdata_20251_steam_spark.plans.registry import ordered_queries
    from oracle_harness import compare, duckdb_run

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    t_start = time.time()
    for q in ordered_queries():
        t0 = time.time()
        try:
            got = q.fn(spark, sf)
            exp = duckdb_run(q.oracle, sf)
            compare(got, exp, q.name)
            out[q.name] = {
                "status": "match",
                "rows": len(exp),
                "sec": round(time.time() - t0, 2),
            }
        except AssertionError as e:
            out[q.name] = {
                "status": "MISMATCH",
                "detail": str(e)[:300],
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 — sweep must finish
            out[q.name] = {
                "status": "ERROR",
                "detail": f"{type(e).__name__}: {e}"[:300],
                "sec": round(time.time() - t0, 2),
            }
        print(q.name, out[q.name]["status"], flush=True)

    n_match = sum(1 for v in out.values() if v["status"] == "match")
    artifact = {
        "round": rnd,
        "sf": sf_figure,
        "session": "bare (master=local[16], UTC timezone only)",
        "total": len(out),
        "match": n_match,
        "fail": len(out) - n_match,
        "wall_sec": round(time.time() - t_start, 1),
        "queries": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"CORRECTNESS_FULL_r{rnd:02d}.json",
    )
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({"total": len(out), "match": n_match, "artifact": path}))
    spark.stop()


if __name__ == "__main__":
    main()
