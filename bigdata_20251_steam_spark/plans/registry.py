"""Query registry — the single source of truth for the driver contract.

Every implemented query/operator registers here with:

- ``fn``: the PySpark implementation, ``(spark, sf_dir) -> DataFrame``;
- ``oracle``: an equivalent ANSI-SQL string DuckDB can run against the same
  parquet tables (pre-registered views ``region nation customer supplier
  part orders lineitem events documents embeddings``) — or ``None`` for
  genuinely non-SQL-expressible ops (driver then records a weaker
  rows-only check);
- ``headline``: whether ``bench.py`` times it at sf0.1.

``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``.  Column names are aliased identically on both sides
because the driver's comparison sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    headline: bool = False
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    headline: bool = False,
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


def spark_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in QUERIES.values()}


def oracle_map() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES.values() if q.oracle is not None}


def _load_all() -> None:
    """Import every query module (side effect: registration)."""
    from . import reference_queries  # noqa: F401

    try:
        from . import extension_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import streaming_queries  # noqa: F401
    except ImportError:
        pass


_load_all()
