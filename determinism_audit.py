"""Determinism audit: every registered query must be partition-count
invariant.

The round-2 peak_activity incident: a query can pass a single oracle
run and still flip low-order float digits run-to-run, because Spark's
partial-aggregation order follows the partition layout.  This audit
runs every `queries()` entry under two different
``spark.sql.shuffle.partitions`` settings and requires EXACT equality
(atol=0) — any difference is an order-sensitive float composition that
will eventually disagree with the driver's oracle.

Usage: python determinism_audit.py [sf_dir]     (default sf0.01)
"""

from __future__ import annotations

import sys

import numpy as np


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bigdata_20251_steam_spark.plans import QUERIES
    from bigdata_20251_steam_spark.session import get_spark

    spark = get_spark(app_name="determinism_audit", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
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
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
