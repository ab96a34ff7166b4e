"""Determinism audit: every registered query must be partition-count
invariant.

The round-2 peak_activity incident: a query can pass a single oracle
run and still flip low-order float digits run-to-run, because Spark's
partial-aggregation order follows the partition layout.  This audit
runs every `queries()` entry under two different
``spark.sql.shuffle.partitions`` settings and requires EXACT equality
(atol=0) — any difference is an order-sensitive float composition that
will eventually disagree with the driver's oracle.

Usage: python determinism_audit.py [round] [sf_dir]

With a numeric first argument the result is ALSO written to
``DETERMINISM_r{N}.json`` so the claim is committable evidence, not
prose (r9 verdict: "determinism audit clean" lived only in commit
messages).  ``sf_dir`` defaults to ``/root/testdata/sf0.01``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> None:
    args = sys.argv[1:]
    rnd: int | None = None
    if args and args[0].isdigit():
        rnd = int(args.pop(0))
    sf = args[0] if args else "/root/testdata/sf0.01"
    from bigdata_20251_steam_spark.plans import QUERIES
    from bigdata_20251_steam_spark.session import get_spark

    spark = get_spark(app_name="determinism_audit", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    bad = []
    for name, q in QUERIES.items():
        runs = []
        for parts in ("16", "48"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            try:
                runs.append(canon(q.fn(spark, sf).toPandas()))
            except Exception as ex:  # noqa: BLE001 — audit must not abort
                runs.append(f"ERR {ex}")
        a, b = runs
        if isinstance(a, str) or isinstance(b, str):
            bad.append((name, "error"))
            continue
        ok = list(a.columns) == list(b.columns) and len(a) == len(b)
        if ok:
            for c in a.columns:
                x, y = a[c], b[c]
                if str(x.dtype).startswith("float"):
                    ok &= bool(
                        np.allclose(
                            x.astype(float), y.astype(float),
                            rtol=0, atol=0, equal_nan=True,
                        )
                    )
                else:
                    ok &= bool(x.astype(str).equals(y.astype(str)))
        if not ok:
            bad.append((name, "partition-order-sensitive"))
            print("NONDETERMINISTIC:", name)
    print(f"audited {len(QUERIES)} queries; issues: {bad}")
    if rnd is not None:
        out = {
            "audited": len(QUERIES),
            "shuffle_partition_settings": [16, 48],
            "comparison": "exact (atol=0, schema + row order after canon sort)",
            "issues": [list(x) for x in bad],
            "wall_sec": round(time.time() - t0, 1),
            "sf_dir": sf,
        }
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"DETERMINISM_r{rnd:02d}.json",
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
