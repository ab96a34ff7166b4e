"""Streaming layer tests: batch/stream parity, dual-sink, watermarks.

Input data is derived deterministically from the driver testdata (events
table) mapped into the reference's Kafka-shaped JSON records — no
synthesized distributions.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from bigdata_20251_steam_spark.functions.timeutil import epoch_seconds
from bigdata_20251_steam_spark.sources.batch import load_table
from bigdata_20251_steam_spark.streaming.engine import (
    DualSinkPaths,
    dual_sink_writer,
    file_stream,
    run_available_now,
)
from bigdata_20251_steam_spark.streaming.pipelines import (
    charts_pipeline,
    players_pipeline,
    reviews_pipeline,
)

from .conftest import SF_SMOKE

RAW_SCHEMA = StructType([StructField("value", StringType(), True)])


def _review_json_df(spark):
    """events -> game_comments-shaped JSON records (A9: to_json(struct))."""
    events = load_table(spark, SF_SMOKE, "events")
    return events.select(
        F.to_json(
            F.struct(
                F.col("user_id").cast("string").alias("app_id"),
                F.col("event_id").cast("string").alias("review_id"),
                F.lit("76561190000000000").alias("author_steamid"),
                F.lit("english").alias("language"),
                (F.col("event_type") != "error").alias("voted_up"),
                F.lit(1).alias("votes_up"),
                F.col("value").alias("weighted_vote_score"),
                epoch_seconds("ts").alias("timestamp_created"),
                F.lit("ok").alias("review_text"),
            )
        ).alias("value")
    )


def test_reviews_pipeline_batch_stream_parity(spark, tmp_path):
    raw = _review_json_df(spark)
    src = str(tmp_path / "raw")
    raw.write.parquet(src)

    batch_out = reviews_pipeline(spark.read.parquet(src), watermark=None)
    stream_raw = file_stream(spark, src, RAW_SCHEMA)
    stream_out = reviews_pipeline(stream_raw, watermark="10 minutes")

    got = run_available_now(stream_out["analytics"], "complete").toPandas()
    exp = batch_out["analytics"].toPandas()
    key = ["window_start", "recommended"]
    got = got.sort_values(key, ignore_index=True)
    exp = exp.sort_values(key, ignore_index=True)
    assert got.shape == exp.shape
    assert (got["total_reviews"] == exp["total_reviews"]).all()
    assert (got["avg_quality"] - exp["avg_quality"]).abs().max() < 1e-9

    bombs = run_available_now(stream_out["review_bomb"], "complete")
    assert bombs.count() == batch_out["review_bomb"].count()


def test_players_pipeline_stream(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    raw = events.select(
        F.to_json(
            F.struct(
                F.col("user_id").cast("int").alias("appid"),
                F.col("value").cast("int").alias("player_count"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
                    "timestamp"
                ),
            )
        ).alias("value")
    )
    src = str(tmp_path / "raw")
    raw.write.parquet(src)

    stream_out = players_pipeline(file_stream(spark, src, RAW_SCHEMA))
    got = run_available_now(stream_out["activity"], "complete")
    batch_out = players_pipeline(spark.read.parquet(src), watermark=None)
    assert got.count() == batch_out["activity"].count()


def test_charts_pipeline_explode_semantics(spark, tmp_path):
    """Pin explode vs explode_outer: null/empty genre arrays drop rows
    (SURVEY.md §7 risk #5; reference uses plain explode at
    kafka-spark-configmap.yaml:182)."""
    records = [
        {"appid": 1, "name": "a", "type": "game", "genres": ["Action", "Indie"],
         "timestamp_scraped": "2026-01-02T10:15:30.123456"},
        {"appid": 2, "name": "b", "type": "game", "genres": [],
         "timestamp_scraped": "2026-01-02T10:15:30.123456"},
        {"appid": 3, "name": "c", "type": "game", "genres": None,
         "timestamp_scraped": "2026-01-02T10:15:30.123456"},
        {"appid": 4, "name": "d", "type": "dlc", "genres": ["Action"],
         "timestamp_scraped": "2026-01-02T10:15:30.123456"},
    ]
    raw = spark.createDataFrame(
        [(json.dumps(r),) for r in records], schema=RAW_SCHEMA
    )
    out = charts_pipeline(raw)
    counts = {r["genre"]: r["total"] for r in out["genre_counts"].collect()}
    assert counts == {"Action": 2, "Indie": 1}  # appids 2,3 contribute nothing
    # ISO-8601 microsecond strings cast cleanly (B3)
    ts = out["bronze"].select("timestamp").collect()[0][0]
    assert ts is not None and ts.microsecond == 123456


def test_dual_sink_writer_incremental(spark, tmp_path):
    """foreachBatch dual sink: bronze appends, serving snapshot overwrites,
    checkpoint makes the second run process only new files."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    first, second = events.filter("event_id % 2 = 0"), events.filter(
        "event_id % 2 = 1"
    )
    first.write.parquet(src)

    paths = DualSinkPaths(
        bronze_dir=str(tmp_path / "bronze"),
        serving_dir=str(tmp_path / "serving"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    def serving_agg(bronze):
        return bronze.groupBy("event_type").agg(F.count("*").alias("n"))

    schema = events.schema
    q = dual_sink_writer(file_stream(spark, src, schema), paths, serving_agg)
    q.awaitTermination()
    n1 = spark.read.parquet(paths.bronze_dir).count()
    assert n1 == first.count()

    # drop new files in, resume from checkpoint
    second.write.mode("append").parquet(src)
    q = dual_sink_writer(file_stream(spark, src, schema), paths, serving_agg)
    q.awaitTermination()
    bronze = spark.read.parquet(paths.bronze_dir)
    assert bronze.count() == events.count()  # appended exactly once
    serving = spark.read.parquet(paths.serving_dir)
    exp = events.groupBy("event_type").agg(F.count("*").alias("n"))
    assert {tuple(r) for r in serving.collect()} == {
        tuple(r) for r in exp.collect()
    }


def test_watermark_append_mode_drops_open_windows(spark, tmp_path):
    """Append mode emits only windows closed by the final watermark (G6).

    With a single availableNow batch the watermark ends at max(ts) - delay,
    so the trailing window(s) stay open and are not emitted."""
    events = load_table(spark, SF_SMOKE, "events").select("ts", "value")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = file_stream(spark, src, spark.read.parquet(src).schema)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.end").alias("window_end"), "n")
    )
    got = run_available_now(agg, "append", checkpoint_dir=str(tmp_path / "ck"))
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    emitted_ends = [r["window_end"] for r in got.collect()]
    total_windows = (
        events.groupBy(F.window("ts", "1 hour")).count().count()
    )
    assert len(emitted_ends) < total_windows  # at least the last window held back
    import datetime

    watermark = max_ts - datetime.timedelta(minutes=10)
    assert all(e <= watermark for e in emitted_ends)


def test_await_streams_all_mode(spark, tmp_path):
    """A6: concurrent queries supervised to completion."""
    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.streaming.engine import await_streams, file_stream

    src = str(tmp_path / "src")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).write.parquet(src)
    schema = "id long, k long"
    q1 = (
        file_stream(spark, src, spark.createDataFrame([], schema).schema)
        .groupBy("k").count()
        .writeStream.format("memory").queryName("aw_a")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q2 = (
        file_stream(spark, src, spark.createDataFrame([], schema).schema)
        .writeStream.format("memory").queryName("aw_b")
        .outputMode("append").trigger(availableNow=True).start()
    )
    done = await_streams([q1, q2], mode="all", timeout=120)
    assert len(done) == 2
    assert spark.table("aw_a").count() == 7
    assert spark.table("aw_b").count() == 100


def test_await_streams_failure_stops_siblings(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bigdata_20251_steam_spark.streaming.engine import await_streams, file_stream

    src = str(tmp_path / "src")
    spark.range(0, 10).write.parquet(src)
    schema = spark.createDataFrame([], "id long").schema

    def boom(batch_df, epoch_id):
        raise ValueError("injected failure")

    bad = (
        file_stream(spark, src, schema)
        .writeStream.foreachBatch(boom)
        .trigger(availableNow=True).start()
    )
    # sibling keeps running until supervised shutdown
    healthy = (
        file_stream(spark, src, schema)
        .writeStream.format("memory").queryName("aw_sib")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    with pytest.raises(StreamingQueryException):
        await_streams([bad, healthy], mode="all", timeout=120)
    assert not healthy.isActive  # no leaked stream after sibling failure


def test_await_streams_timeout_stops_all(spark, tmp_path):
    from bigdata_20251_steam_spark.streaming.engine import await_streams, file_stream

    src = str(tmp_path / "src")
    spark.range(0, 10).write.parquet(src)
    schema = spark.createDataFrame([], "id long").schema
    q = (
        file_stream(spark, src, schema)
        .writeStream.format("memory").queryName("aw_t")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    with pytest.raises(TimeoutError):
        await_streams([q], mode="all", timeout=2)
    assert not q.isActive


def test_await_streams_any_mode(spark, tmp_path):
    from bigdata_20251_steam_spark.streaming.engine import await_streams, file_stream

    src = str(tmp_path / "src")
    spark.range(0, 10).write.parquet(src)
    schema = spark.createDataFrame([], "id long").schema
    fast = (
        file_stream(spark, src, schema)
        .writeStream.format("memory").queryName("aw_fast")
        .outputMode("append").trigger(availableNow=True).start()
    )
    slow = (
        file_stream(spark, src, schema)
        .writeStream.format("memory").queryName("aw_slow")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    first = await_streams([fast, slow], mode="any", timeout=120)
    assert first is fast
    assert not slow.isActive  # 'any' shuts the rest down cleanly


def test_dedup_stream_drops_redelivered_records(spark, tmp_path):
    """dropDuplicatesWithinWatermark: at-least-once -> exactly-once bronze."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bigdata_20251_steam_spark.streaming.engine import (
        dedup_stream,
        file_stream,
        run_available_now,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 10.0),
        (2, base + dt.timedelta(seconds=30), 20.0),
        (1, base, 10.0),                              # redelivery of id 1
        (3, base + dt.timedelta(seconds=60), 30.0),
        (2, base + dt.timedelta(seconds=30), 20.0),   # redelivery of id 2
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    ).write.parquet(src)
    stream = file_stream(
        spark, src, spark.createDataFrame([], "event_id long, ts timestamp, value double").schema
    )
    deduped = dedup_stream(stream, key_cols=("event_id",), ts_col="ts",
                           delay="5 minutes")
    got = run_available_now(deduped, output_mode="append").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2, 3]
    assert {r["event_id"]: r["value"] for r in got} == {1: 10.0, 2: 20.0, 3: 30.0}


def test_dedup_stream_batch_fallback(spark):
    """Kappa replay: the same call works on a batch frame via dropDuplicates."""
    import datetime as dt

    from bigdata_20251_steam_spark.streaming.engine import dedup_stream

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base, 1.0), (1, base, 1.0), (2, base, 2.0)],
        "event_id long, ts timestamp, value double",
    )
    got = dedup_stream(df, key_cols=("event_id",), ts_col="ts")
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2]


def test_stateful_window_agg_checkpoint_resume(spark, tmp_path):
    """A watermarked windowed agg must RESUME from checkpointed state:
    windows spanning the restart emit once with counts from both runs."""
    import datetime as dt

    from bigdata_20251_steam_spark.streaming.engine import file_stream

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, value double"

    def run_once():
        stream = file_stream(spark, src, spark.createDataFrame([], schema).schema)
        agg = (
            stream.withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("w.start").alias("ws"), "user_id", "n"
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: two events in window A; window stays OPEN (no later watermark)
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=1), 1.0),
         (1, base + dt.timedelta(minutes=2), 1.0)], schema
    ).write.parquet(src)
    run_once()
    # run 2: one MORE event in window A plus a far-future event that
    # advances the watermark past A, forcing A to close and emit
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=3), 1.0),
         (9, base + dt.timedelta(hours=2), 1.0)], schema
    ).write.mode("append").parquet(src)
    run_once()

    got = {
        (r["ws"], r["user_id"]): r["n"]
        for r in spark.read.parquet(sink).collect()
    }
    # the restart-spanning window counts events from BOTH runs exactly
    # once — state was restored from the checkpoint, not recomputed
    assert got[(base, 1)] == 3, got


def test_streaming_asof_enrich_batch_stream_parity(spark):
    """scd_asof_enrich on a STREAM must equal the batch asof_join
    (backward direction), restricted to matched facts (inner)."""
    from bigdata_20251_steam_spark.operators.relational_ext import (
        asof_join,
        scd_asof_enrich,
    )
    from bigdata_20251_steam_spark.plans.streaming_queries import (
        q_streaming_asof_enrich,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    good = (
        ev.filter(F.col("event_type") != "error")
        .groupBy("user_id", F.col("ts").alias("valid_from"))
        .agg(F.max("value").alias("value"))
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )

    def rows(df):
        return {
            (r["event_id"], r["matched_value"], r["matched_ts"])
            for r in df.collect()
        }

    batch_window = rows(
        asof_join(
            err, good, key="user_id", left_ts="ts", right_ts="valid_from",
            value_cols=("value",),
        ).filter(F.col("matched_ts").isNotNull())
    )
    batch_scd = rows(
        scd_asof_enrich(
            err, good, key="user_id", fact_ts="ts",
            valid_from="valid_from", value_cols=("value",),
        )
    )
    streamed = {
        (r["event_id"], r["matched_value"], r["matched_ts"])
        for r in q_streaming_asof_enrich(spark, SF_SMOKE)
        .withColumn("matched_value", F.col("matched_value").cast("double"))
        .collect()
    }
    assert batch_scd == batch_window
    # streaming rounds matched_value to 6dp; round the batch sides too
    assert streamed == {
        (e, None if v is None else round(v, 6), t) for e, v, t in batch_scd
    }


def test_streaming_curation_epoch_replay_is_idempotent(spark):
    """r6 verdict #4 'Done' criterion: replaying a committed epoch
    through idempotent_epoch_append (the at-least-once crash case) must
    leave the streaming curation pipeline's result bit-identical."""
    from bigdata_20251_steam_spark.plans.streaming_queries import (
        _streaming_curation_result,
    )

    from .conftest import SF_SMOKE

    base = sorted(
        map(tuple, _streaming_curation_result(spark, SF_SMOKE).collect())
    )
    replayed = sorted(
        map(
            tuple,
            _streaming_curation_result(
                spark, SF_SMOKE, replay_epoch=0
            ).collect(),
        )
    )
    assert base == replayed
    assert base, "pipeline produced no per-source rows"
