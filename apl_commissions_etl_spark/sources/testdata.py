"""Loaders for the driver-generated parquet tables.

TPC-H-ish star schema + events/documents/embeddings
(see /root/repo/TESTDATA.md). These are the generic-operator test
inputs; the domain pipeline has its own fixture builders in
``plans/fixtures.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects. We read it with
    ``spark.sql.legacy.parquet.nanosAsLong`` (session-level, set here)
    and convert to a microsecond TimestampType column, truncating like
    DuckDB/Arrow do, so both engines see identical values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div: float division loses precision at 1e18 nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so operators can be written in
    either the DataFrame or SQL API against the same names."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
