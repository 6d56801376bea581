"""Query registry: one entry per implemented operator from SURVEY.md §2.

Each entry pairs a Spark DataFrame implementation with (where
SQL-expressible) an equivalent ANSI-SQL oracle that DuckDB runs on the
same parquet tables. The driver compares row-count + schema +
order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- floating aggregates go through exact DECIMAL accumulation and are
  cast to DOUBLE only at the end (deterministic regardless of
  partition/accumulation order);
- result row order is irrelevant (driver hashes order-insensitively).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # None => not SQL-expressible; rows-only check
    survey_ref: str  # SURVEY.md §2 operator ids this query exercises


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, survey_ref: str = ""):
    """Decorator registering a (spark_fn, oracle_sql) pair."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, survey_ref)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Importing the query modules populates REGISTRY.
    from .queries import (  # noqa: F401
        aggregates,
        auditq,
        builder,
        builder_modes,
        calcdomain,
        corpusprep,
        dims,
        events,
        exports,
        graph,
        ingest,
        joins,
        llmdata,
        policies,
        reporting,
        reporting_brokers,
        scalars,
        setops,
        streamops,
        windows,
    )

    return REGISTRY
