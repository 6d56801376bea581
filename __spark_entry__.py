"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``apl_commissions_etl_spark.registry``: every implemented
operator from SURVEY.md §2 registers a (Spark DataFrame fn, DuckDB
oracle SQL) pair there; this module just exposes the registry in the
driver's expected shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apl_commissions_etl_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: GL journal entries out
    of the full 8-stage commission cascade (SURVEY.md §7.2 minimum
    end-to-end slice — every join class, agg, rounding, and union)."""
    qs = all_queries()
    return qs["calc_gl_entries"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
