"""A1 plan-level evidence without a broker (SURVEY.md §2.A1).

No Kafka connector jar (or broker) exists in this container, so the real
source can never execute here.  What CAN be proven is everything short of
the network: a broker-SHAPED Spark 4 Python DataSource (registered as
``kafka_shaped`` — Spark reserves the provider name "kafka" even with no
jar present) makes ``kafka_stream`` / ``kafka_batch`` resolve through
Spark's actual datasource lookup via their ``fmt`` override, which
demonstrates

- the readers construct against the name ``"kafka"`` exactly as they
  would against the real connector (same ``.format("kafka")`` path);
- the FULL A1 option surface — bootstrap servers, subscription, offsets,
  the SSL truststore trio (kafka-spark-configmap.yaml:46-53), throughput
  caps like ``maxOffsetsPerTrigger`` — arrives verbatim inside the
  resolved source (dumped from within and asserted);
- the canonical Kafka wire schema (key/value binary, topic, partition,
  offset, timestamp, timestampType) flows into the shared parse stage
  ``parse_json_records`` unchanged, batch and streaming;
- ``to_kafka_records`` (A9) round-trips through a kafka-shaped read back
  to the original rows.

Swapping the stub for the real connector is a jar on the classpath plus
a broker address — no engine code changes.
"""

from __future__ import annotations

import json

import pytest

from bigdata_20251_steam_spark.sources.batch import parse_json_records
from bigdata_20251_steam_spark.sources.kafka import (
    kafka_batch,
    kafka_stream,
    to_kafka_records,
)

#: The real connector's output schema, per the Spark Kafka integration doc.
KAFKA_WIRE_DDL = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def _make_kafka_shaped_source():
    """Factory (cloudpickle-by-value) for the broker-shaped stub."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        SimpleDataSourceStreamReader,
    )

    wire_ddl = KAFKA_WIRE_DDL

    def _rows(options):
        import datetime

        msgs = json.loads(options.get("fixture_msgs", "[]"))
        topic = options.get("subscribe", "?")
        ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
        return [
            (
                m["key"].encode() if m["key"] is not None else None,
                m["value"].encode(),
                topic,
                0,
                i,
                ts,
                0,
            )
            for i, m in enumerate(msgs)
        ]

    def _dump_options(options):
        path = options.get("option_dump_path")
        if path:
            with open(path, "w") as f:
                json.dump({k.lower(): v for k, v in options.items()}, f)

    class _Batch(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def read(self, partition):
            return iter(_rows(self.options))

    class _Stream(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.options = options

        def initialOffset(self):
            return {"offset": 0}

        def read(self, start):
            if start["offset"] == 0:
                return iter(_rows(self.options)), {"offset": 1}
            return iter([]), start

        def readBetweenOffsets(self, start, end):
            if start["offset"] == 0 and end["offset"] > 0:
                return iter(_rows(self.options))
            return iter([])

        def commit(self, end):
            pass

    class KafkaShapedSource(DataSource):
        @classmethod
        def name(cls):
            return "kafka_shaped"

        def schema(self):
            _dump_options(self.options)
            return wire_ddl

        def reader(self, schema):
            return _Batch(self.options)

        def simpleStreamReader(self, schema):
            return _Stream(self.options)

    return KafkaShapedSource


@pytest.fixture()
def kafka_shaped(spark):
    spark.dataSource.register(_make_kafka_shaped_source())
    return spark


def test_kafka_stream_unresolved_plan_carries_full_a1_surface(
    kafka_shaped, tmp_path
):
    spark = kafka_shaped
    dump = str(tmp_path / "opts.json")
    msgs = [{"key": "10", "value": json.dumps({"appid": 10, "votes_up": 3})}]
    df = kafka_stream(
        spark,
        brokers="kafka-0.broker:9093,kafka-1.broker:9093",
        topic="steam_reviews",
        starting_offsets="earliest",
        ssl_truststore="/etc/kafka/ssl/truststore.jks",
        ssl_password="changeit",
        extra_options={
            "maxOffsetsPerTrigger": "5000",
            "failOnDataLoss": "false",
            "fixture_msgs": json.dumps(msgs),
            "option_dump_path": dump,
        },
        fmt="kafka_shaped",
    )
    assert df.isStreaming
    # canonical Kafka wire schema, field for field
    assert df.schema.simpleString() == (
        "struct<key:binary,value:binary,topic:string,partition:int,"
        "offset:bigint,timestamp:timestamp,timestampType:int>"
    )
    # one availableNow pass through the SAME parse stage the file-stream
    # stand-in uses, to a memory sink
    parsed = parse_json_records(df, "appid long, votes_up long")
    q = (
        parsed.writeStream.format("memory")
        .queryName("kafka_plan_smoke")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM kafka_plan_smoke").collect()
    assert [(r["appid"], r["votes_up"]) for r in rows] == [(10, 3)]

    got = json.load(open(dump))
    # the full A1 option surface arrived inside the resolved source
    assert got["kafka.bootstrap.servers"] == (
        "kafka-0.broker:9093,kafka-1.broker:9093"
    )
    assert got["subscribe"] == "steam_reviews"
    assert got["startingoffsets"] == "earliest"
    assert got["kafka.security.protocol"] == "SSL"
    assert got["kafka.ssl.truststore.location"] == "/etc/kafka/ssl/truststore.jks"
    assert got["kafka.ssl.truststore.password"] == "changeit"
    assert got["maxoffsetspertrigger"] == "5000"
    assert got["failondataloss"] == "false"


def test_kafka_batch_roundtrips_to_kafka_records(kafka_shaped, tmp_path):
    """A9 -> A1 closure: rows serialized by to_kafka_records, read back
    through a kafka-shaped batch source, parse to the original rows."""
    spark = kafka_shaped
    src = spark.createDataFrame(
        [(10, 3, "great game"), (20, 0, "broken")],
        "appid long, votes_up long, review string",
    )
    wire = to_kafka_records(src, key_col="appid").collect()
    msgs = [{"key": r["key"], "value": r["value"]} for r in wire]
    df = kafka_batch(
        spark,
        brokers="kafka-0.broker:9093",
        topic="steam_reviews",
        extra_options={"fixture_msgs": json.dumps(msgs)},
        fmt="kafka_shaped",
    )
    assert not df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType",
    ]
    vals = sorted(
        (
            int(r["key"].decode()),
            json.loads(bytes(r["value"]).decode()),
        )
        for r in df.collect()
    )
    assert vals == [
        (10, {"votes_up": 3, "review": "great game"}),
        (20, {"votes_up": 0, "review": "broken"}),
    ]
    parsed = parse_json_records(df, "votes_up long, review string")
    assert {(r["votes_up"], r["review"]) for r in parsed.collect()} == {
        (3, "great game"), (0, "broken"),
    }
