"""Shuffle-volume audit: per-headliner exchange bytes as a tracked
regression metric (round 10).

Wall-clock regressions at sf0.1 are mostly VM noise (BENCH_BASE.md's
±10% box), but SHUFFLE VOLUME is deterministic for a fixed plan and is
the thing that actually becomes the bottleneck at 100 TB: a plan change
that doubles exchange bytes can hide inside bench noise locally and
still double cluster cost at scale.  This audit pins it: each headline
query runs once under its own job group (thread-local, so only its own
jobs are tagged), then Spark's public REST status API
(``/api/v1/applications/{id}/jobs`` + ``/stages``) attributes stages to
queries and sums

  - ``shuffleWriteBytes`` / ``shuffleRecordsWritten`` — what crosses
    the wire (the number to minimize),
  - ``shuffleReadBytes``,
  - ``diskBytesSpilled`` + ``memoryBytesSpilled`` — partitions that
    outgrew executor memory (must stay 0 at bench SF),
  - ``inputBytes`` and completed-stage count for context.

SKIPPED stages (reused exchanges) contribute 0, so exchange REUSE shows
up as a reduction — which is the correct accounting.  Streaming
queries are excluded (micro-batch jobs run on the stream-execution
thread, outside the caller's job group); the headline suite is batch.

Usage:  python shuffle_audit.py <round>      -> SHUFFLE_r{N}.json
        SPARK_GRAFT_SF_DIR to override the SF (default sf0.1).
Compare round over round with:  python - <<'PY'
  import json; a=json.load(open('SHUFFLE_r09.json')); ...
PY
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        raise SystemExit("usage: python shuffle_audit.py <round-number>")
    rnd = int(sys.argv[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.plans import QUERIES
    from bigdata_20251_steam_spark.session import get_spark

    spark = get_spark(app_name="shuffle_audit", master="local[32]",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    t0 = time.time()

    headline = [q for q in QUERIES.values() if q.headline]
    for q in headline:
        sc.setJobGroup(q.name, q.name)
        df = q.fn(spark, sf_dir)
        # same full-column fold as bench.py: no pruning, every column
        # computed, so the audited plan is the benched plan
        df.select(F.xxhash64(*df.columns).alias("_h")).agg(
            F.bit_xor("_h"), F.count(F.lit(1))
        ).collect()
        sc.setJobGroup("", "")

    ui = sc.uiWebUrl
    app = sc.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded")
    )
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    by_stage = {s["stageId"]: s for s in stages}
    names = {q.name for q in headline}
    out: dict[str, dict[str, int]] = {}
    for j in jobs:
        g = j.get("jobGroup")
        if g not in names:
            continue
        acc = out.setdefault(
            g,
            {
                "shuffle_write_bytes": 0,
                "shuffle_write_records": 0,
                "shuffle_read_bytes": 0,
                "disk_spill_bytes": 0,
                "memory_spill_bytes": 0,
                "input_bytes": 0,
                "stages_complete": 0,
                "stages_skipped": 0,
            },
        )
        for sid in j["stageIds"]:
            s = by_stage.get(sid)
            if s is None:
                continue
            if s["status"] == "SKIPPED":
                acc["stages_skipped"] += 1
                continue
            acc["stages_complete"] += 1
            acc["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
            acc["shuffle_write_records"] += s.get("shuffleWriteRecords", 0)
            acc["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
            acc["disk_spill_bytes"] += s.get("diskBytesSpilled", 0)
            acc["memory_spill_bytes"] += s.get("memoryBytesSpilled", 0)
            acc["input_bytes"] += s.get("inputBytes", 0)

    missing = sorted(names - set(out))
    artifact = {
        "round": rnd,
        "sf": sf_dir,
        "queries": dict(sorted(out.items())),
        "missing": missing,  # should be [] — loud if attribution broke
        "total_shuffle_write_bytes": sum(
            v["shuffle_write_bytes"] for v in out.values()
        ),
        "total_spill_bytes": sum(
            v["disk_spill_bytes"] + v["memory_spill_bytes"]
            for v in out.values()
        ),
        "wall_sec": round(time.time() - t0, 1),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"SHUFFLE_r{rnd:02d}.json"
    )
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(
        f"wrote {path}: {len(out)} queries, "
        f"{artifact['total_shuffle_write_bytes']:,} shuffle bytes written, "
        f"{artifact['total_spill_bytes']:,} spill bytes"
        + (f", MISSING {missing}" if missing else "")
    )
    spark.stop()
    sys.exit(1 if missing else 0)


if __name__ == "__main__":
    main()
