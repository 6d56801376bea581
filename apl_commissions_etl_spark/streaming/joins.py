"""Stream-stream event-time joins, written ONCE for batch and
streaming execution (SURVEY.md §2.10 — new surface, not a reference
port).

The canonical attribution shape: join each conversion event
('purchase') to the 'click' events of the same user that happened in
the preceding attribution window. As a stream-stream self-join this is
exactly Spark's supported interval-join form — an equi-key plus an
event-time range condition — which bounds the state store: each side
buffers only rows inside the watermark + interval horizon.

Batch mode runs the SAME function for the DuckDB oracle gate (the
range condition is an ordinary theta predicate there);
``tests/test_streaming.py`` proves streaming == batch through
``trigger(availableNow=True)``, including the left-outer variant
(outer interval joins require watermarks on BOTH sides — null matches
are emitted only once the watermark passes the join horizon).

Scale posture: the join shuffles both sides on ``user_id`` once; state
is bounded by (watermark + bound) per key, independent of stream
length. No cross product — Catalyst plans a StreamingSymmetricHashJoin
keyed on the equi-column with the range pushed into the state
eviction condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: attribution window: a purchase is attributed to clicks at most this
#: far in its past
ATTRIBUTION_BOUND = "30 minutes"


def click_purchase_pairs(events: DataFrame, how: str = "inner") -> DataFrame:
    """Per purchase, the same-user clicks within the preceding
    attribution window: ``click.ts <= purchase.ts < click.ts + bound``.

    ``events`` may be a batch frame or a watermarked stream; for a
    stream, pass the SAME watermarked frame twice-filtered (supported
    stream-stream self-join) and use ``how='leftOuter'`` only with a
    watermark applied (Spark enforces this).
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id"),
        F.col("value").alias("click_value"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("user_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (purchases["user_id"] == clicks["user_id"])
        & (clicks["click_ts"] <= purchases["purchase_ts"])
        & (
            purchases["purchase_ts"]
            < clicks["click_ts"] + F.expr(f"INTERVAL {ATTRIBUTION_BOUND}")
        )
    )
    joined = purchases.join(clicks, cond, how)
    return joined.select(
        purchases["purchase_id"],
        purchases["purchase_ts"],
        purchases["user_id"].alias("user_id"),
        purchases["purchase_value"],
        clicks["click_id"],
        clicks["click_ts"],
        clicks["click_value"],
        # ANSI forbids timestamp->numeric casts; unix_seconds truncates
        # like the oracle's floor(epoch()). The NTZ->TIMESTAMP cast
        # interprets in session tz, but the offset cancels in the
        # subtraction, so gap_seconds is tz-independent.
        (
            F.unix_seconds(purchases["purchase_ts"].cast("timestamp"))
            - F.unix_seconds(clicks["click_ts"].cast("timestamp"))
        ).alias("gap_seconds"),
    )


def attribution_rollup(pairs: DataFrame) -> DataFrame:
    """Per purchase: how many clicks were attributable and the span to
    the earliest one — the batch summary downstream of the interval
    join (aggregation over a stream-stream join result is not
    streamable in append mode; the reference shape is join-then-sink,
    rollup in batch)."""
    return pairs.groupBy("purchase_id", "user_id").agg(
        F.count("click_id").cast("int").alias("n_clicks"),
        F.max("gap_seconds").alias("max_gap_seconds"),
        F.sum(F.col("click_value").cast("decimal(18,2)"))
        .cast("double")
        .alias("clicks_value"),
    )
