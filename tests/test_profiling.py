"""Exact column profiler: hand-computed values + plan-shape guarantees."""

from __future__ import annotations

import re

from bigdata_20251_steam_spark.operators.profiling import profile_columns
from bigdata_20251_steam_spark.plans import QUERIES

from .conftest import SF_SMOKE


def test_profile_columns_exact_values(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha"),
            (2, "alpha"),
            (3, ""),
            (4, None),
            (None, "zz"),
        ],
        "id long, s string",
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ["id", "s"]).collect()}

    rid = rows["id"]
    assert rid["n_rows"] == 5
    assert rid["n_nulls"] == 1
    assert rid["n_distinct"] == 4
    assert rid["min_val"] == "1"
    assert rid["max_val"] == "4"
    assert rid["total_len"] == 4  # "1","2","3","4"

    rs = rows["s"]
    assert rs["n_rows"] == 5
    assert rs["n_nulls"] == 1
    assert rs["n_distinct"] == 3  # "alpha", "", "zz" — empty != null
    assert rs["min_val"] == ""  # empty string sorts before everything
    assert rs["max_val"] == "zz"
    assert rs["total_len"] == 12  # 5 + 5 + 0 + 2


def test_profile_columns_rejects_empty_column_list(spark):
    df = spark.range(1)
    try:
        profile_columns(df, [])
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on empty column list")


def test_profile_columns_rejects_duplicate_columns(spark):
    """A duplicate name would be stacked twice and silently merged by the
    groupBy, doubling n_rows/total_len for that column — loud error
    instead (ADVICE r6)."""
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    try:
        profile_columns(df, ["id", "s", "id"])
    except ValueError as e:
        assert "duplicate" in str(e) and "id" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on duplicate columns")


def test_profile_documents_plan_shape(spark):
    """One scan, two hash exchanges, no Expand (the design claim: melting

    then double-aggregating avoids the distinct-aggregate Expand that
    would multiply every input row by the number of profiled columns)."""
    df = QUERIES["profile_documents"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) == 1, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan
    assert "Expand" not in plan, plan
    # the only range exchange is the 5-row final orderBy
    assert len(re.findall(r"Exchange rangepartitioning", plan)) <= 1, plan


def test_value_histogram_hand_computed(spark):
    # lo=0, hi=10, bins=5 -> width 2; 10 clamps into bucket 4
    df = spark.createDataFrame(
        [(0.0,), (1.9,), (2.0,), (9.9,), (10.0,), (None,)], "v double"
    )
    from bigdata_20251_steam_spark.operators.profiling import value_histogram

    rows = {r["bucket"]: r for r in value_histogram(df, "v", bins=5).collect()}
    assert set(rows) == {0, 1, 4}
    assert rows[0]["n"] == 2 and rows[0]["bucket_lo"] == 0.0
    assert rows[1]["n"] == 1 and rows[1]["bucket_lo"] == 2.0
    assert rows[4]["n"] == 2 and rows[4]["bucket_lo"] == 8.0


def test_value_histogram_excludes_nan(spark):
    """NaN rows are dropped like NULLs (ADVICE r6): without the filter a
    NaN poisons max() → width NaN → garbage bucket in Spark while the
    DuckDB oracle's CAST(floor(NaN) AS BIGINT) raises — a cross-engine
    divergence.  The histogram over {0, 1, NaN} must match the one over
    {0, 1}."""
    from bigdata_20251_steam_spark.operators.profiling import value_histogram

    with_nan = spark.createDataFrame(
        [(0.0,), (1.0,), (float("nan"),), (None,)], "v double"
    )
    rows = {r["bucket"]: r["n"] for r in
            value_histogram(with_nan, "v", bins=2).collect()}
    assert rows == {0: 1, 1: 1}

    only_nan = spark.createDataFrame([(float("nan"),)], "v double")
    assert value_histogram(only_nan, "v").collect() == []

    # integer columns still work (isnan is applied on the double cast)
    ints = spark.createDataFrame([(0,), (1,), (2,), (3,)], "v int")
    irows = {r["bucket"]: r["n"] for r in
             value_histogram(ints, "v", bins=2).collect()}
    assert irows == {0: 2, 1: 2}


def test_value_histogram_degenerate_and_empty(spark):
    from bigdata_20251_steam_spark.operators.profiling import value_histogram

    same = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    rows = value_histogram(same, "v", bins=4).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["n"] == 2

    nulls = spark.createDataFrame([(None,)], "v double")
    assert value_histogram(nulls, "v").collect() == []

    try:
        value_histogram(same, "v", bins=0)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on bins=0")


def test_histogram_plan_shape(spark):
    """Two scans (bounds + bucketing), stats broadcast as one row, and
    the only hash exchange is the bins-bounded groupBy(bucket)."""
    df = QUERIES["histogram_event_values"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) == 2, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
