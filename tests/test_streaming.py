"""Structured Streaming behavior tests (SURVEY.md §2.10 new surface):
the SAME transform functions the batch oracle gate checks are run
through readStream/writeStream with trigger(availableNow=True).

Covers: streaming == batch parity (complete mode), watermark-driven
late-data dropping across a checkpointed restart (the watermark is
restored from the checkpoint, mirroring the reference's resumable-run
state design ref scripts/lib/state-manager.ts), and watermarked
streaming dedup.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from apl_commissions_etl_spark.sources.testdata import load_table
from apl_commissions_etl_spark.streaming import windows as sw

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def run_stream(spark, df_stream, name, output_mode, checkpoint):
    q = (
        df_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    batch = load_table(spark, sf_dir, "events")
    batch.repartition(4).write.parquet(src)

    stream = sw.stream_events(spark, src, schema=batch.schema)
    got = run_stream(
        spark, sw.tumbling_counts(stream), "t_tumble", "complete",
        str(tmp_path / "ckpt_tumble"),
    )
    want = sw.tumbling_counts(spark.read.parquet(src))
    assert sorted(got.collect()) == sorted(want.collect())


def test_streaming_dedup_covers_keys(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src2")
    batch = load_table(spark, sf_dir, "events")
    batch.repartition(4).write.parquet(src)

    stream = sw.stream_events(spark, src, schema=batch.schema)
    got = run_stream(
        spark, sw.dedup_keep_first(stream, streaming=True), "t_dedup",
        "append", str(tmp_path / "ckpt_dedup"),
    )
    # which row survives per key is arrival-order-dependent, but the
    # KEY SET is deterministic and must match batch exactly
    got_keys = {(r.user_id, r.event_type) for r in got.collect()}
    want_keys = {
        (r.user_id, r.event_type)
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert got_keys == want_keys


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime.fromisoformat(ts), uid, et, float(v), "{}")
            for i, (ts, uid, et, v) in enumerate(rows)
        ],
        EVENTS_SCHEMA,
    )


def test_watermark_drops_late_rows_across_restart(spark, tmp_path):
    """Append mode: a window is emitted once, when the watermark passes
    its end, and its state is evicted. Run 1 (max ts 16:00, watermark
    2h) finalizes the 11:00 window. After the checkpointed restart the
    11:30 event is LATE — if it were NOT dropped it would re-open the
    evicted window and re-emit an 11:00 row; the 19:30 event pushes the
    watermark past 17:00 so the 16:00 window finalizes with both its
    rows."""
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    sink = str(tmp_path / "late_sink")
    schema = _mk_events(spark, []).schema

    _mk_events(
        spark,
        [
            ("2024-01-01T11:15:00", 1, "a", 1),
            ("2024-01-01T11:45:00", 1, "a", 1),
            ("2024-01-01T16:00:00", 2, "a", 1),
        ],
    ).coalesce(1).write.mode("append").parquet(src)

    def run_to_sink():
        # file sink: the only append sink that supports checkpoint
        # recovery (the memory sink cannot restart)
        stream = sw.stream_events(spark, src, schema=schema)
        df = stream.groupBy(F.window("ts", "1 hour").alias("w")).agg(
            F.count("*").alias("n")
        ).select(F.col("w.start").alias("ws"), "n")
        q = (
            df.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink).collect()

    first = {r.ws: r.n for r in run_to_sink()}
    assert first == {dt.datetime(2024, 1, 1, 11, 0): 2}

    _mk_events(
        spark,
        [
            ("2024-01-01T11:30:00", 3, "a", 1),  # LATE: window finalized
            ("2024-01-01T16:30:00", 3, "a", 1),  # on time
            ("2024-01-01T19:30:00", 3, "a", 1),  # watermark pusher
        ],
    ).coalesce(1).write.mode("append").parquet(src)

    rows = run_to_sink()
    eleven = [r for r in rows if r.ws == dt.datetime(2024, 1, 1, 11, 0)]
    # late row dropped: the finalized 11:00 window was NOT re-emitted
    # (one sink row from run 1, still n=2)
    assert len(eleven) == 1 and eleven[0].n == 2
    # both on-time rows of the 16:00 window made it
    sixteen = [r for r in rows if r.ws == dt.datetime(2024, 1, 1, 16, 0)]
    assert len(sixteen) == 1 and sixteen[0].n == 2


def test_session_window_streaming_equals_batch(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    rows = [
        ("2024-01-01T10:00:00", 1, "a", 5),
        ("2024-01-01T10:10:00", 1, "a", 5),   # same session
        ("2024-01-01T11:30:00", 1, "a", 5),   # gap > 30min -> new session
        ("2024-01-01T10:05:00", 2, "b", 5),
    ]
    df = _mk_events(spark, rows)
    df.coalesce(1).write.parquet(src)
    stream = sw.stream_events(spark, src, schema=df.schema)
    got = run_stream(
        spark, sw.session_stats(stream), "t_sess", "complete",
        str(tmp_path / "sess_ckpt"),
    )
    want = sw.session_stats(spark.read.parquet(src))
    assert sorted(got.collect()) == sorted(want.collect())
    sess_u1 = sorted(
        r for r in got.collect() if r.user_id == 1
    )
    assert len(sess_u1) == 2


def test_interval_join_streaming_equals_batch(spark, sf_dir, tmp_path):
    from apl_commissions_etl_spark.streaming import joins as sj

    src = str(tmp_path / "events_src_ij")
    batch = load_table(spark, sf_dir, "events")
    batch.repartition(4).write.parquet(src)

    stream = sw.stream_events(spark, src, schema=batch.schema)
    got = run_stream(
        spark, sj.click_purchase_pairs(stream), "t_ijoin", "append",
        str(tmp_path / "ckpt_ijoin"),
    )
    want = sj.click_purchase_pairs(spark.read.parquet(src))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_interval_join_outer_streaming_flushes_nulls(spark, sf_dir, tmp_path):
    # Left-outer stream-stream join emits a null-side row only once the
    # watermark passes the join horizon. A far-future sentinel event in
    # a LATER microbatch (maxFilesPerTrigger=1; the file source orders
    # batches by file modification time) advances the watermark past
    # every real purchase, flushing all pending unmatched rows.
    import time

    from apl_commissions_etl_spark.streaming import joins as sj

    src = tmp_path / "events_src_oj"
    batch = load_table(spark, sf_dir, "events")
    batch.coalesce(1).write.parquet(str(src))
    time.sleep(1.1)  # sentinel file must be strictly newer
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(int(-1), max_ts + dt.timedelta(days=10), int(-1), "purchase",
          0.0, "{}")],
        schema=batch.schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.format("parquet")
        .schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", sw.WATERMARK)
    )
    got = run_stream(
        spark, sj.click_purchase_pairs(stream, how="leftOuter"), "t_ojoin",
        "append", str(tmp_path / "ckpt_ojoin"),
    ).filter(F.col("user_id") >= 0)
    want = sj.click_purchase_pairs(
        spark.read.parquet(str(src)), how="left"
    ).filter(F.col("user_id") >= 0)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
