"""Bronze CSV ingest (SURVEY.md §2.1 S1/S2/S7).

The reference sniffs the header row, sanitizes column names, creates
an all-NVARCHAR(MAX) table, and bulk-loads in 5 000-row TDS batches
(ref scripts/load-csv.ts:146-301). Spark-first: ``spark.read.csv``
IS the distributed bulk loader — one declarative read replaces the
hand-rolled batching, with the same sanitization rules applied to the
resulting DataFrame's column names:

    - strip BOM + whitespace
    - every char outside [a-zA-Z0-9_] -> '_'
    - leading digit -> 'Col_' prefix
    - empty -> 'Column{i}'
    (ref load-csv.ts:155-165)

plus a uniqueness suffix (Spark DataFrames reject duplicate names;
SQL Server would have errored at CREATE TABLE too).

Glob patterns ('CommissionsDetail_*.csv') read many files as one
table (S7) exactly like the reference's prefix matching
(load-csv.ts:128-144).

Scale posture: schema inference is OFF (header only); the read is a
single distributed scan, splittable per file; multiLine stays off by
default because multiline CSV defeats input splitting at 100 TB —
enable per-source only where quoted newlines actually occur.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sanitize_column(name: str, index: int) -> str:
    """The reference's header sanitization (load-csv.ts:155-165)."""
    cleaned = name.lstrip("﻿").strip()
    cleaned = re.sub(r"[^a-zA-Z0-9_]", "_", cleaned)
    if re.match(r"^[0-9]", cleaned):
        cleaned = "Col_" + cleaned
    return cleaned or f"Column{index}"


def sanitize_columns(names: list[str]) -> list[str]:
    out: list[str] = []
    seen: dict[str, int] = {}
    for i, raw in enumerate(names):
        c = sanitize_column(raw, i)
        if c in seen:
            seen[c] += 1
            c = f"{c}_{seen[c]}"
        seen.setdefault(c, 0)
        out.append(c)
    return out


def read_raw_csv(
    spark: SparkSession,
    path: str,
    multi_line: bool = False,
) -> DataFrame:
    """Read CSV(s) (glob ok) into an all-string bronze DataFrame with
    sanitized column names — the raw_* layer contract (every column
    NVARCHAR, ref sql/01-raw-tables.sql:19-295)."""
    df = (
        spark.read.option("header", True)
        .option("inferSchema", False)  # all-string: typing is prep's job
        .option("multiLine", multi_line)
        .option("encoding", "UTF-8")
        .csv(path)
    )
    return df.toDF(*sanitize_columns(df.columns))


def read_typed_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Typed CSV read with malformed-row quarantine: PERMISSIVE mode
    parks any row that fails the schema in ``corrupt_col`` instead of
    failing the job or silently dropping it (the engine-native form of
    the reference's TRY_CAST-and-inspect ingest loop).

    Returns (good, quarantined): good rows without the capture column,
    quarantined rows as (raw_line,) for the error-report sink. At
    100 TB the quarantine frame is what keeps one bad file from
    poisoning a fleet-wide load — the job completes and the bad lines
    are enumerable.
    """
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(f"{schema}, {corrupt_col} STRING")
        .csv(path)
        # Spark requires caching/materialization before filtering on
        # the corrupt column (SPARK-38523: the column is populated
        # during parsing, referencing it alone is disallowed)
        .cache()
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad
