"""Bronze ingest (SURVEY.md §2.1 S1/S2/S5/S7) as driver-checkable
queries: a real CSV/ZIP round-trip through the filesystem, not a mock.

Each query STAGES data once per session (customer written as headered
CSV parts with deliberately dirty column names; a ZIP with a decoy
member), then runs the actual ingest path — header sniff, name
sanitization, all-string bronze schema, glob multi-file read, prefix-
filtered ZIP extraction — and types the result (P2 try_cast prep).
The DuckDB oracle reads the ORIGINAL parquet, so any loss or mangling
in the round-trip (quoting, duplicate headers, float formatting,
prefix filtering) breaks the value hash.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.csv_ingest import read_raw_csv
from ..sources.archive import read_zip_csvs
from ..sources.testdata import load_table

#: dirty headers exercising the sanitization rules (load-csv.ts:155-165):
#: space -> '_', leading digit -> 'Col_' prefix; the duplicate pair is
#: index-suffixed by Spark's CSV reader itself (name -> name<colIdx>)
_DIRTY_HEADERS = [
    "c custkey", "c name", "1nationkey", "c acctbal", "c mktsegment",
    "c mktsegment",
]

_CSV_STAGE: dict[tuple[str, str], str] = {}
_ZIP_STAGE: dict[tuple[str, str], str] = {}


def _stage_dir(spark: SparkSession, sf_dir: str, kind: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{kind}_{spark.sparkContext.applicationId}_{tag}",
    )


def _csv_stage(spark: SparkSession, sf_dir: str) -> str:
    """Write customer as 2 headered CSV part files (glob source S7)
    with dirty headers; once per (session, sf)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CSV_STAGE:
        path = _stage_dir(spark, sf_dir, "csv")
        c = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").cast("string"),
            "c_name",
            F.col("c_nationkey").cast("string"),
            F.col("c_acctbal").cast("string"),
            "c_mktsegment",
            F.col("c_mktsegment").alias("c_mktsegment2"),
        )
        c.toDF(*_DIRTY_HEADERS).coalesce(2).write.mode("overwrite").option(
            "header", True
        ).csv(path)
        _CSV_STAGE[key] = path
    return _CSV_STAGE[key]


def _zip_stage(spark: SparkSession, sf_dir: str) -> str:
    """Zip the staged CSV parts as 'CommissionsDetail_<i>.csv' plus a
    DECOY member ('Other_0.csv', duplicate rows) that the prefix
    filter must exclude — if filtering regressed, the row multiset
    changes and the value hash catches it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ZIP_STAGE:
        csv_dir = _csv_stage(spark, sf_dir)
        zpath = _stage_dir(spark, sf_dir, "zip") + ".zip"
        parts = sorted(
            f for f in os.listdir(csv_dir)
            if f.endswith(".csv") and not f.startswith(".")
        )
        with zipfile.ZipFile(zpath, "w") as zf:
            for i, p in enumerate(parts):
                zf.write(
                    os.path.join(csv_dir, p), f"CommissionsDetail_{i}.csv"
                )
            zf.write(os.path.join(csv_dir, parts[0]), "Other_0.csv")
        _ZIP_STAGE[key] = zpath
    return _ZIP_STAGE[key]


def _typed(raw: DataFrame) -> DataFrame:
    """P2 prep over the sanitized all-string bronze frame."""
    return raw.select(
        F.col("c_custkey").try_cast("long").alias("c_custkey"),
        "c_name",
        F.col("Col_1nationkey").try_cast("int").alias("Col_1nationkey"),
        F.col("c_acctbal").try_cast("double").alias("c_acctbal"),
        # duplicate headers are index-suffixed by Spark's CSV reader
        # itself (name -> name<colIndex>) before our sanitizer runs
        "c_mktsegment4",
        "c_mktsegment5",
    )


@query(
    "ingest_csv_typed",
    oracle="""
    SELECT c_custkey, c_name,
           c_nationkey AS Col_1nationkey,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           c_mktsegment AS c_mktsegment4,
           c_mktsegment AS c_mktsegment5
    FROM customer
    """,
    survey_ref="§2.1 S1/S2/S7 + P2: real CSV round-trip — headered "
    "multi-file glob read, header sanitization (space->_, leading "
    "digit->Col_, duplicate->_1), all-string bronze then try_cast prep "
    "(load-csv.ts:146-301); oracle reads the original parquet so any "
    "round-trip mangling breaks the hash",
)
def ingest_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _csv_stage(spark, sf_dir)
    raw = read_raw_csv(spark, os.path.join(path, "*.csv"))
    return _typed(raw)


@query(
    "ingest_zip_prefix_summary",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(c_custkey) AS min_key,
           MAX(c_custkey) AS max_key,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM customer
    """,
    survey_ref="§2.1 S5: ZIP extraction with prefix-matched member "
    "discovery (ingest-raw-data.ts:1-23, 'CommissionsDetail_*') — a "
    "decoy member is planted in the archive, so a prefix-filter "
    "regression doubles rows and breaks the hash",
)
def ingest_zip_prefix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    zpath = _zip_stage(spark, sf_dir)
    work = _stage_dir(spark, sf_dir, "zipwork")
    raw = read_zip_csvs(spark, zpath, work, prefix="CommissionsDetail_")
    typed = _typed(raw)
    return typed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("acctbal_cents"),
    )
