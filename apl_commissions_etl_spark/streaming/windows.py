"""Windowed event transforms, written ONCE for both batch and
streaming execution (SURVEY.md §2.10 — new surface, not a reference
port).

Design: each transform is ``DataFrame -> DataFrame`` using only
operations Structured Streaming supports in append/update modes
(time windows, session windows, watermarked dedup). The driver's
correctness gate runs them in BATCH mode against DuckDB oracles
(window aggregation semantics are identical — ``F.window`` is just a
grouping expression); ``tests/test_streaming.py`` runs the same
transforms through ``readStream``/``writeStream`` with
``trigger(availableNow=True)`` and asserts streaming == batch, plus
watermark late-drop behavior.

Scale posture: windowed aggs are keyed shuffles with map-side partial
aggregation; state store size is bounded by the watermark horizon, not
the stream length. Sums go through DECIMAL accumulation so results are
independent of partition/arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TUMBLE = "1 hour"
SLIDE_WIDTH = "1 hour"
SLIDE_STEP = "30 minutes"
SESSION_GAP = "30 minutes"
WATERMARK = "2 hours"


def stream_events(spark: SparkSession, source_dir: str, schema=None) -> DataFrame:
    """File-source stream over a directory of event parquet files with
    the engine's watermark applied. ``schema`` defaults to the batch
    events schema (streaming file sources require one)."""
    if schema is None:
        # streaming file sources require a declared schema; infer once
        # from the existing files (driver-side metadata read only)
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
    # Parquet event time may surface as TIMESTAMP_NTZ (writer-dependent);
    # watermarks require TIMESTAMP. Session tz is UTC, so the cast is
    # instant-preserving.
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream.withWatermark("ts", WATERMARK)


def _decimal_sum(col: str) -> F.Column:
    return (
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double")
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event type: count + exact-decimal
    value sum. Epoch-aligned, so batch == streaming == date_trunc."""
    return (
        events.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _decimal_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes: every event lands in
    exactly width/step = 2 windows."""
    return (
        events.groupBy(F.window("ts", SLIDE_WIDTH, SLIDE_STEP).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_users",
        )
    )


def session_stats(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap:
    session end = last event + gap (Spark semantics; the oracle's
    gaps-and-islands CTE reproduces it exactly)."""
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            _decimal_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_keep_first(events: DataFrame, streaming: bool = False) -> DataFrame:
    """One row per (user_id, event_type): the earliest event.

    Streaming: ``dropDuplicatesWithinWatermark`` keeps the first
    ARRIVED row per key inside the watermark horizon (arrival order is
    nondeterministic, which is the documented streaming contract).
    Batch: the deterministic equivalent — argmin by (ts, event_id)
    window (ref W3 keep-latest pattern, inverted)."""
    if streaming:
        return events.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
