"""In-process A/B for the r17 construction-cost batch.

One Spark session (bench conf), alternating measurement blocks:
  A) pyspark dataFrameDebugging flag ON vs OFF (module-global cache
     flipped directly -- no JVM restart, no box drift between legs)
  B) with_log_bucket exponent ladder: old Column when-chain vs new
     SQL CASE string (old body replicated verbatim from git HEAD)

Reports per-leg construct-only and hashfold (bench reduction) times,
min + median over rounds, ABBA ordering inside each round.
"""
import json
import os
import time

import pyspark.errors.utils as eu
from pyspark.sql import functions as F

from bigdata_20251_steam_spark.session import get_spark
from bigdata_20251_steam_spark.plans import QUERIES
from bigdata_20251_steam_spark.operators import quantiles as qa

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(
    app_name="ab_inproc",
    master="local[32]",
    extra_conf={"spark.sql.shuffle.partitions": 32},
)
spark.sparkContext.setLogLevel("ERROR")


def hashfold(df):
    row = df.select(F.xxhash64(*df.columns).alias("_h")).agg(
        F.bit_xor("_h"), F.count(F.lit(1))
    ).first()
    assert row[1] >= 0


def construct(qname):
    df = QUERIES[qname].fn(spark, SF_DIR)
    _ = df.columns  # force analysis
    return df


# ---- part B helper: the old ladder form, verbatim from HEAD ----------
def old_with_log_bucket(df, cents_col, m=16):
    step = (
        df.filter(cents_col.isNotNull())
        .withColumn("c", cents_col.cast("long"))
        .withColumn("_e0", qa.exp2_floor(F.col("c")))
        .withColumn("_lo", F.call_function("shiftleft", F.lit(1).cast("long"), F.col("_e0")))
    )
    return (
        step.withColumn(
            "e", F.when(F.col("c") <= 0, F.lit(-1)).otherwise(F.col("_e0"))
        )
        .withColumn(
            "sub",
            F.when(F.col("c") <= 0, F.lit(0)).otherwise(
                F.expr(f"CAST(((c - _lo) * {m}) DIV _lo AS INT)")
            ),
        )
        .drop("_e0", "_lo")
    )


QUERY_SET = [
    "ivfadc_search",
    "dedup_components",
    "value_quantile_sketch",
    "doclen_quantiles_weighted",
    "minhash_signatures",
    "sentiment_hourly",
]

ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))

# warmup: absorb codegen/JIT on both flag states
eu._enable_debugging_cache = False
hashfold(construct("sentiment_hourly"))
eu._enable_debugging_cache = True
hashfold(construct("sentiment_hourly"))

results = {q: {"on": {"c": [], "h": []}, "off": {"c": [], "h": []}} for q in QUERY_SET}

for rnd in range(ROUNDS):
    # ABBA inside the round to cancel drift
    order = [True, False] if rnd % 2 == 0 else [False, True]
    for flag in order:
        eu._enable_debugging_cache = flag
        key = "on" if flag else "off"
        for q in QUERY_SET:
            spark.sparkContext.setJobDescription(f"ab:{key}:{q}")
            t0 = time.perf_counter()
            df = construct(q)
            t1 = time.perf_counter()
            hashfold(df)
            t2 = time.perf_counter()
            results[q][key]["c"].append(t1 - t0)
            results[q][key]["h"].append(t2 - t0)
    print(f"round {rnd} done", flush=True)


def stats(v):
    s = sorted(v)
    return {"min": round(s[0], 3), "med": round(s[len(s) // 2], 3)}

print("== A) dataFrameDebugging flag (construct c / end-to-end h) ==")
for q in QUERY_SET:
    r = results[q]
    print(json.dumps({
        "q": q,
        "on_construct": stats(r["on"]["c"]), "off_construct": stats(r["off"]["c"]),
        "on_total": stats(r["on"]["h"]), "off_total": stats(r["off"]["h"]),
    }))

# ---- part B: ladder construct micro-bench (both flag states) ---------
base = spark.range(1000).select(F.col("id").alias("v"))
ladder = {"on": {"old": [], "new": []}, "off": {"old": [], "new": []}}
N = 12
for rnd in range(ROUNDS):
    for flag in ([True, False] if rnd % 2 == 0 else [False, True]):
        eu._enable_debugging_cache = flag
        key = "on" if flag else "off"
        for form in (["old", "new"] if rnd % 2 == 0 else ["new", "old"]):
            t0 = time.perf_counter()
            for _ in range(N):
                if form == "old":
                    df = old_with_log_bucket(base, F.col("v"))
                else:
                    df = qa.with_log_bucket(base, F.col("v"))
                _ = df.columns
            ladder[key][form].append((time.perf_counter() - t0) / N)

print("== B) with_log_bucket construct per call (sec) ==")
for key in ("on", "off"):
    print(json.dumps({
        "flag": key,
        "old_column_ladder": stats(ladder[key]["old"]),
        "new_sql_ladder": stats(ladder[key]["new"]),
    }))

# parity re-check of the two ladder forms on the fly
a = old_with_log_bucket(base, F.col("v")).orderBy("v").collect()
b = qa.with_log_bucket(base, F.col("v")).orderBy("v").collect()
assert a == b, "ladder parity violation"
print("ladder parity: identical on range(1000)")
spark.stop()
