"""Materialize a data-dominated benchmark set: N x the sf0.1 fact tables.

At sf0.1 on a warm 32-thread JVM the headline times are dominated by fixed
per-query overhead (scheduling, codegen) and VM jitter, so round-over-round
deltas are mostly noise (VERDICT r3 "re-bench on data-dominated sizes").
This script scales the FACT tables by ``N_COPIES`` with shifted keys —
dimensions stay as-is, the realistic shape (facts grow, dims don't):

- ``documents``: doc_id shifted per replica; replica k>0 text gets a
  ``" rk"`` suffix so replicas are NOT near-duplicates of each other and
  dedup workload (pairs, components) scales ~linearly instead of
  quadratically in replica count.
- ``embeddings``: vec_id shifted; vectors unchanged (queries are the
  replica-0 ids, the corpus scan is what scales).
- ``events``: event_id shifted, ts jittered +k seconds (keeps per-window
  row counts growing, avoids exact-row collisions).
- ``orders`` / ``lineitem``: orderkey shifted consistently on both sides
  so the join fans out correctly; custkey/suppkey/partkey untouched so
  dim joins still hit.

Usage: python scale_testdata.py [N_COPIES] [SRC_SF_DIR] [OUT_DIR]
Defaults: 4 /root/testdata/sf0.1 /tmp/sf0.1x4
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_20251_steam_spark.session import get_spark
from bigdata_20251_steam_spark.sources.batch import load_table

DIMS = ("region", "nation", "customer", "supplier", "part")


def _replicas(df: DataFrame, n: int, build) -> DataFrame:
    out = build(df, 0)
    for k in range(1, n):
        out = out.unionByName(build(df, k))
    return out


def scale(spark: SparkSession, src: str, out_dir: str, n: int) -> None:
    for name in DIMS:
        load_table(spark, src, name).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )

    docs = load_table(spark, src, "documents")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    _replicas(
        docs, n,
        lambda df, k: df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * max_doc)
        ).withColumn(
            "text",
            F.col("text") if k == 0 else F.concat(F.col("text"), F.lit(f" r{k}")),
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load_table(spark, src, "embeddings")
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    _replicas(
        emb, n,
        lambda df, k: df.withColumn("vec_id", F.col("vec_id") + F.lit(k * max_vec)),
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    ev = load_table(spark, src, "events")
    max_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    _replicas(
        ev, n,
        lambda df, k: df.withColumn(
            "event_id", F.col("event_id") + F.lit(k * max_ev)
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {k} SECONDS")),
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    orders = load_table(spark, src, "orders")
    li = load_table(spark, src, "lineitem")
    max_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    _replicas(
        orders, n,
        lambda df, k: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * max_ord)
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    _replicas(
        li, n,
        lambda df, k: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * max_ord)
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf0.1x4"
    spark = get_spark(app_name="scale-testdata")
    spark.sparkContext.setLogLevel("ERROR")
    scale(spark, src, out, n)
    print(f"wrote {n}x {src} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
