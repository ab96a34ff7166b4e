"""Unit tests for the round-2 operator additions: as-of join, range join,
hash split / stratified sample, packing, connected components."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdata_20251_steam_spark.operators.dedup import connected_components
from bigdata_20251_steam_spark.operators.packing import pack_documents
from bigdata_20251_steam_spark.operators.relational_ext import asof_join, range_join
from bigdata_20251_steam_spark.operators.sampling import hash_split, stratified_sample


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00")),  # after r2 -> 20.0
            (2, "k1", _ts("2024-01-01T09:00:00")),  # ties r2 exactly -> 20.0
            (3, "k1", _ts("2024-01-01T07:00:00")),  # before everything -> null
            (4, "k2", _ts("2024-01-01T10:00:00")),  # other key -> 99.0
            (5, "k3", _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T08:00:00"), 10.0),
            ("k1", _ts("2024-01-01T09:00:00"), 20.0),
            ("k1", _ts("2024-01-01T11:00:00"), 30.0),  # future: never matched
            ("k2", _ts("2024-01-01T08:30:00"), 99.0),
        ],
        "k string, ts timestamp, v double",
    )
    got = {
        r["id"]: (r["matched_v"], r["matched_ts"])
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=("v",),
        ).collect()
    }
    assert got[1] == (20.0, _ts("2024-01-01T09:00:00"))
    assert got[2] == (20.0, _ts("2024-01-01T09:00:00"))  # <= : tie matches
    assert got[3] == (None, None)
    assert got[4] == (99.0, _ts("2024-01-01T08:30:00"))
    assert got[5] == (None, None)
    assert len(got) == 5  # every left row exactly once


def test_asof_join_rejects_unknown_direction(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))], "k long, ts timestamp")
    with pytest.raises(ValueError):
        asof_join(df, df, key="k", left_ts="ts", right_ts="ts",
                  value_cols=(), direction="sideways")


def test_asof_join_forward_and_nearest_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00")),
            (2, "k1", _ts("2024-01-01T09:00:00")),  # ties r2 exactly
            (3, "k1", _ts("2024-01-01T12:00:00")),  # after everything
            (4, "k1", _ts("2024-01-01T08:30:00")),  # equidistant 08:00/09:00
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T08:00:00"), 10.0),
            ("k1", _ts("2024-01-01T09:00:00"), 20.0),
            ("k1", _ts("2024-01-01T11:00:00"), 30.0),
        ],
        "k string, ts timestamp, v double",
    )

    def run(direction):
        return {
            r["id"]: r["matched_v"]
            for r in asof_join(
                left, right, key="k", left_ts="ts", right_ts="ts",
                value_cols=("v",), direction=direction,
            ).collect()
        }

    fwd = run("forward")
    assert fwd[1] == 30.0   # earliest at-or-after 10:00 is 11:00
    assert fwd[2] == 20.0   # tie counts forward too
    assert fwd[3] is None   # nothing after 12:00
    assert fwd[4] == 20.0
    near = run("nearest")
    assert near[1] == 20.0  # 09:00 and 11:00 equidistant: tie -> backward
    assert near[2] == 20.0  # exact tie, distance 0
    assert near[3] == 30.0  # only backward exists
    assert near[4] == 10.0  # equidistant: pandas tie rule prefers backward


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00")),  # == start: in
            (2, _ts("2024-01-01T05:59:59")),  # just inside
            (3, _ts("2024-01-01T06:00:00")),  # == end: out (exclusive)
            (4, _ts("2023-12-31T23:59:59")),  # before: out
            # crosses a 6h bucket boundary relative to the interval start
            (5, _ts("2024-01-01T11:00:00")),
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T06:00:00")),
            # interval spanning two buckets
            (200, _ts("2024-01-01T05:00:00"), _ts("2024-01-01T12:00:00")),
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "start_ts", "end_ts", bucket="6 hours"
        ).collect()
    }
    assert got == {(1, 100), (2, 100), (2, 200), (3, 200), (5, 200)}
    # oracle cross-check: plain inequality join gives the identical set
    naive = {
        (r["pid"], r["iid"])
        for r in points.join(
            intervals,
            (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")),
        ).collect()
    }
    assert got == naive


def test_hash_split_proportions_and_stability(spark):
    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    split1 = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    # deterministic: identical on re-run and under different partitioning
    split2 = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(13), "doc_id").collect()
    }
    assert split1 == split2
    from collections import Counter

    c = Counter(split1.values())
    assert set(c) == {"train", "val", "test"}
    assert abs(c["train"] / 2000 - 0.80) < 0.04
    assert abs(c["val"] / 2000 - 0.10) < 0.03
    assert abs(c["test"] / 2000 - 0.10) < 0.03
    # growth stability: the first 1000 docs keep their assignment
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs.filter(F.col("doc_id") < 1000), "doc_id"
        ).collect()
    }
    assert sub == {k: v for k, v in split1.items() if k < 1000}


def test_stratified_sample_fractions(spark):
    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "zh")
        .otherwise("de")
        .alias("lang"),
    )
    kept = stratified_sample(
        docs, "lang", "doc_id", fractions={"en": 0.5, "zh": 0.2},
        default_fraction=0.0,
    )
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "de" not in counts  # default 0.0 drops the stratum entirely
    assert abs(counts["en"] / 1000 - 0.5) < 0.06
    assert abs(counts["zh"] / 1000 - 0.2) < 0.05


def test_pack_documents_offsets(spark):
    docs = spark.createDataFrame(
        [(1, 500), (2, 400), (3, 300), (4, 900), (5, 100)],
        "doc_id long, n long",
    )
    got = {
        r["doc_id"]: (r["pack_offset"], r["pack_id"])
        for r in pack_documents(docs, "doc_id", "n", budget=1000).collect()
    }
    # offsets are the exclusive prefix sum in doc_id order
    assert got == {
        1: (0, 0), 2: (500, 0), 3: (900, 0), 4: (1200, 1), 5: (2100, 2),
    }


def test_pack_documents_sharded_budget_invariant(spark):
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("n")
    )
    packed = pack_documents(docs, "doc_id", "n", budget=256, n_shards=4)
    # every doc appears once; within a shard, offsets are consistent with
    # the per-shard prefix sum (pack_id = offset div budget by definition)
    assert packed.count() == 500
    bad = packed.filter(
        F.col("pack_id") != F.expr("pack_offset div 256")
    ).count()
    assert bad == 0
    shards = packed.select("shard").distinct().count()
    assert shards == 4


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # island pair 10-11, untouched node never appears
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_asof_join_matches_pandas_merge_asof_property(spark):
    """Property test: asof_join == pandas merge_asof on randomized inputs.

    pandas' merge_asof is the independent reference implementation of
    as-of semantics; hypothesis-style randomized trials (fixed seeds for
    reproducibility) cover tie, gap, empty-key, and duplicate-left-ts
    shapes that a hand-built fixture might miss — for all three
    directions (backward / forward / nearest incl. its tie rule).
    """
    import random

    import pandas as pd

    for seed in (11, 23, 47):
        rng = random.Random(seed)
        keys = ["a", "b", "c"]
        left_rows = [
            (i, rng.choice(keys), rng.randint(0, 1000))
            for i in range(60)
        ]
        right_rows_raw = {
            (rng.choice(keys), rng.randint(0, 1000)): float(rng.randint(1, 99))
            for _ in range(40)
        }  # dict => unique (key, ts), the operator's documented requirement
        right_rows = [(k, t, v) for (k, t), v in right_rows_raw.items()]

        left = spark.createDataFrame(left_rows, "id long, k string, ts long")
        right = spark.createDataFrame(right_rows, "k string, ts long, v double")
        lp = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts")
        rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")

        for direction in ("backward", "forward", "nearest"):
            got = {
                r["id"]: r["matched_v"]
                for r in asof_join(
                    left, right, key="k", left_ts="ts", right_ts="ts",
                    value_cols=("v",), direction=direction,
                ).collect()
            }
            merged = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
            want = {
                int(r.id): (None if pd.isna(r.v) else float(r.v))
                for r in merged.itertuples()
            }
            assert got == want, f"seed {seed} {direction}: mismatch"


def test_connected_components_pointer_jumping_long_chain(spark):
    """A diameter-50 chain must converge in O(log d) rounds, not O(d).

    Plain min-label propagation needs 50 rounds (raises at max_iters=8);
    with pointer jumping ~log2(50)+2 ≈ 8 rounds suffice.
    """
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 51)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(pairs, max_iters=8).collect()
    }
    assert got == {i: 1 for i in range(1, 52)}


def test_connected_components_raises_on_non_convergence(spark):
    # a 5-hop chain cannot converge in 1 round of min-label propagation;
    # local_threshold=0 forces the distributed path (the adaptive
    # driver-side union-find cannot fail to converge by construction)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=1, local_threshold=0)
    # the default adaptive path solves the same chain exactly
    got = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(pairs).collect()
    }
    assert got == {(i, 1) for i in range(1, 7)}


def test_range_join_matches_naive_randomized(spark):
    """Randomized trials: binned range_join == naive inequality join."""
    import datetime as dt
    import random

    for seed in (5, 17):
        rng = random.Random(seed)
        t0 = dt.datetime(2024, 1, 1)
        points = spark.createDataFrame(
            [(i, t0 + dt.timedelta(seconds=rng.randint(0, 86400 * 3)))
             for i in range(150)],
            "pid long, ts timestamp",
        )
        intervals = []
        for j in range(40):
            s = t0 + dt.timedelta(seconds=rng.randint(0, 86400 * 3))
            intervals.append(
                (j, s, s + dt.timedelta(seconds=rng.randint(1, 86400)))
            )
        iv = spark.createDataFrame(
            intervals, "iid long, start_ts timestamp, end_ts timestamp"
        )
        got = {
            (r["pid"], r["iid"])
            for r in range_join(
                points, iv, "ts", "start_ts", "end_ts", bucket="6 hours"
            ).collect()
        }
        naive = {
            (r["pid"], r["iid"])
            for r in points.join(
                iv,
                (F.col("ts") >= F.col("start_ts"))
                & (F.col("ts") < F.col("end_ts")),
            ).collect()
        }
        assert got == naive, f"seed {seed}: {len(got)} vs {len(naive)}"


def test_asof_salted_parity_and_plan(spark):
    """salt_keys output is row-for-row identical to the unsalted form on a
    skewed fixture (one hot key carrying ~all rows), and the window
    actually partitions on (key, salt)."""
    base = dt.datetime(2024, 1, 1)
    # hot key: 500 left rows, 7 right rows; cold key: a handful of each
    left_rows = [(i, "hot", base + dt.timedelta(minutes=i)) for i in range(500)]
    left_rows += [(1000 + i, "cold", base + dt.timedelta(hours=i)) for i in range(3)]
    right_rows = [
        ("hot", base + dt.timedelta(minutes=70 * j), float(j)) for j in range(7)
    ]
    right_rows += [("cold", base + dt.timedelta(minutes=90), 99.0)]
    left = spark.createDataFrame(left_rows, "id long, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")

    for d in ("backward", "forward", "nearest"):
        plain = asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=("v",), direction=d,
        )
        salted = asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=("v",), direction=d, salt_keys=8,
        )
        a = {(r["id"], r["matched_v"], r["matched_ts"]) for r in plain.collect()}
        b = {(r["id"], r["matched_v"], r["matched_ts"]) for r in salted.collect()}
        assert a == b, f"direction {d}: salted output diverged"
        # the Window partition spec must carry the salt next to the key:
        # "windowspecdefinition(_k#N, _salt#M, ..." in the executed plan
        plan = salted._jdf.queryExecution().executedPlan().toString()
        import re

        assert re.search(r"windowspecdefinition\(_k#\d+, _salt#\d+", plan), plan


def test_range_join_auto_bucket_mixed_intervals(spark):
    """bucket=None derives a width from the interval-length distribution;
    results equal the naive inequality join on a seconds-to-a-month mix."""
    base = dt.datetime(2024, 1, 1)
    intervals = spark.createDataFrame(
        [
            (1, base, base + dt.timedelta(seconds=45)),
            (2, base + dt.timedelta(hours=1), base + dt.timedelta(hours=7)),
            (3, base, base + dt.timedelta(days=30)),
            (4, base + dt.timedelta(days=10), base + dt.timedelta(days=10, minutes=5)),
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=37 * i)) for i in range(1200)
        ],
        "pid long, ts timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "ts", "start_ts", "end_ts").collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.join(
            intervals,
            (F.col("start_ts") <= F.col("ts")) & (F.col("ts") < F.col("end_ts")),
        ).collect()
    }
    assert got == naive and len(got) > 0

    # empty interval side: no rows, no crash
    empty = spark.createDataFrame(
        [], "iid long, start_ts timestamp, end_ts timestamp"
    )
    assert range_join(points, empty, "ts", "start_ts", "end_ts").count() == 0


def test_range_join_span_guard_fails_loudly(spark):
    """An interval spanning more buckets than max_span_buckets at an
    explicit width must raise, not explode sequence() silently."""
    base = dt.datetime(2024, 1, 1)
    intervals = spark.createDataFrame(
        [(1, base, base + dt.timedelta(days=60))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame([(1, base)], "pid long, ts timestamp")
    with pytest.raises(Exception, match="range_join: interval spans"):
        range_join(
            points, intervals, "ts", "start_ts", "end_ts", bucket="1 second"
        ).collect()
