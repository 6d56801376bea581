"""Backward as-of join as a reusable operator (Spark has no ASOF
JOIN; DuckDB's native ASOF LEFT JOIN is the oracle for the registered
query).

Implementation: the union-marker window scan. Right-side rows (side 0)
and left-side rows (side 1) are unioned into one stream ordered by
(key, time, side); a running ``last(..., ignorenulls=True)`` window
carries the most recent right-side attributes forward onto each left
row. One shuffle on the ``by`` key, growing-only frame (streams
without buffering whole partitions), no per-key range theta-join —
the O(n log n) re-expression of an O(n^2)-per-hot-key nested loop.

Reference counterpart: the reference resolves "latest effective row
at-or-before the transaction date" with correlated TOP 1 subqueries
(e.g. sql/calc/run-calculation.sql date-band lookups); this operator
is the engine's general form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_on`` <= ``left_on`` within the same ``by`` group (exact
    matches included; left columns win name clashes).

    ``right`` is first deduped to one row per (by, right_on): the row
    with the greatest ``tie_break`` (required when duplicates are
    possible — as-of is otherwise ill-defined). ``right_cols`` are the
    right-side attributes to carry; they appear suffixed ``_asof`` on
    the output to keep the contract explicit.
    """
    if tie_break is not None:
        w_dedup = Window.partitionBy(by, right_on).orderBy(
            F.desc(tie_break)
        )
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    carried = [f"{c}_asof" for c in right_cols]
    r = right.select(
        F.col(by),
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_on).alias(f"{right_on}_asof"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
    )
    null_right = [
        F.lit(None).cast(right.schema[c].dataType).alias(a)
        for c, a in zip(right_cols, carried)
    ]
    l_cols = [c for c in left.columns]
    l = left.select(
        F.col(by),
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_on].dataType).alias(
            f"{right_on}_asof"
        ),
        *null_right,
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    # right rows carry no left payload
    r = r.select(
        *r.columns,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in l_cols
        ],
    )
    w = (
        Window.partitionBy(by)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(f"{right_on}_asof", ignorenulls=True)
        .over(w)
        .alias(f"{right_on}_asof")
    ] + [F.last(a, ignorenulls=True).over(w).alias(a) for a in carried]
    merged = r.unionByName(l).select("_side", *filled, *[f"_l_{c}" for c in l_cols])
    return merged.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        f"{right_on}_asof",
        *carried,
    )
