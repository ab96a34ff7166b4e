from .batch import (
    load_table,
    load_tables,
    parse_json_records,
    read_jsonl,
    read_review_csv,
    write_jsonl,
)
from .kafka import kafka_batch, kafka_options, kafka_stream, to_kafka_records

__all__ = [
    "load_table",
    "load_tables",
    "read_review_csv",
    "parse_json_records",
    "read_jsonl",
    "write_jsonl",
    "kafka_batch",
    "kafka_options",
    "kafka_stream",
    "to_kafka_records",
]
