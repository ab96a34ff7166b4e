from .batch import load_table, load_tables, read_review_csv, parse_json_records

__all__ = ["load_table", "load_tables", "read_review_csv", "parse_json_records"]
