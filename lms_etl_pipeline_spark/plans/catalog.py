"""Query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a named
plan builder ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, an
ANSI-SQL oracle string the DuckDB differential harness runs on the same
parquet fixtures. Column names/aliases MUST match between the two — the
driver's comparator sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named plan; ``oracle`` is the equivalent DuckDB SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (approx
    sketches, LSH, stateful streaming); the driver then records a weaker
    rows-only check.
    """

    def register(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return register


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)
