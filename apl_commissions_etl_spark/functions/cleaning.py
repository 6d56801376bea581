"""Prep-layer cleaning expressions (SURVEY.md §2.2 P1-P3).

T-SQL contract being reproduced (ref sql/02-input-tables.sql:239-262):
``TRY_CAST(NULLIF(LTRIM(RTRIM(x)), '') AS T)`` -- trim, empty becomes
NULL, cast failure becomes NULL. Expressed with ``try_cast`` /
``try_to_timestamp`` so the contract holds under ANY session ANSI
setting (the driver supplies its own ANSI-on session); still
whole-stage-codegen JVM expressions -- no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trim_all(df: DataFrame, *except_cols: str) -> DataFrame:
    """Trim every string column (the reference trims nearly every
    NVARCHAR on ingest)."""
    exprs = []
    for name, dtype in df.dtypes:
        if dtype == "string" and name not in except_cols:
            exprs.append(F.trim(F.col(name)).alias(name))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)


def safe_cast(col: Column | str, to_type: str) -> Column:
    """TRY_CAST(NULLIF(TRIM(x), '') AS T): null on empty or failure."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.trim(c), F.lit("")).try_cast(to_type)


def safe_date(col: Column | str, fmt: str | None = None) -> Column:
    """TRY_CONVERT(DATE, x[, style]) -- ``fmt='MM/dd/yyyy'`` covers the
    reference's style-101 parses (ref sql/transforms/11-fees.sql:221-222).
    Unparseable values become NULL under any ANSI setting."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.nullif(F.trim(c), F.lit(""))
    if fmt:
        return F.try_to_timestamp(c, F.lit(fmt)).try_cast("date")
    return c.try_cast("date")
