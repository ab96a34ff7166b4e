from .registry import QUERIES, Query, register, spark_queries, oracle_map

__all__ = ["QUERIES", "Query", "register", "spark_queries", "oracle_map"]
