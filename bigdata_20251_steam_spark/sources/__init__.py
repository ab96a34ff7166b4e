from .batch import load_table, load_tables, read_review_csv, parse_json_records
from .kafka import kafka_batch, kafka_options, kafka_stream, to_kafka_records

__all__ = [
    "load_table",
    "load_tables",
    "read_review_csv",
    "parse_json_records",
    "kafka_batch",
    "kafka_options",
    "kafka_stream",
    "to_kafka_records",
]
