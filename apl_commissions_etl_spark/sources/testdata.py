"""Loaders for the driver-generated parquet tables.

TPC-H-ish star schema + events/documents/embeddings
(see /root/repo/TESTDATA.md). These are the generic-operator test
inputs; the domain pipeline has its own fixture builders in
``plans/fixtures.py``.
"""

from __future__ import annotations

import os
import threading

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


#: (applicationId, view-family) -> sf_dir already registered.  Replacing
#: a temp view (CREATE OR REPLACE / createOrReplaceTempView) makes Spark
#: uncache every cached plan that depends on it — so re-registering the
#: same fixture views before every query silently dropped the
#: session-scoped criteria/cascade caches and re-ran whole cascades
#: (measured: builder_mode_key_mappings 24s in a 120-query session vs
#: 2s isolated).  Views are static per (session, sf_dir): register once.
_VIEW_REGISTRY: dict[tuple[str, str], str] = {}
_VIEW_REGISTRY_LOCK = threading.Lock()


def needs_registration(spark: SparkSession, family: str, sf_dir: str) -> bool:
    """True exactly once per (session, family, sf_dir); switching sf_dir
    re-registers (and correctly invalidates stale caches).  The
    get+set is atomic so concurrent warm-up chains can't both claim
    the registration slot (the catalog mutations themselves still run
    serially up front in ``session.warm_shared_caches``)."""
    key = (spark.sparkContext.applicationId, family)
    with _VIEW_REGISTRY_LOCK:
        if _VIEW_REGISTRY.get(key) == sf_dir:
            return False
        _VIEW_REGISTRY[key] = sf_dir
        return True


def register_base_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register parquet base tables as temp views, each at most once per
    (session, sf_dir) — several fixture families share these names, and
    a redundant replace would uncache everything built on them."""
    for t in tables:
        if needs_registration(spark, f"base:{t}", sf_dir):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so operators can be written in
    either the DataFrame or SQL API against the same names."""
    register_base_tables(spark, sf_dir)
