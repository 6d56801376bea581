"""Exactly-once foreachBatch MERGE sink: replay-idempotence, keyed
upsert semantics across checkpointed restarts, atomic publish."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from apl_commissions_etl_spark.streaming.sinks import (
    current_table,
    idempotent_merge_sink,
)
from apl_commissions_etl_spark.streaming.stateful import running_user_totals

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mk(spark, rows, start=0):
    return spark.createDataFrame(
        [
            (start + i, dt.datetime(2024, 1, 1, 10, (start + i) % 60), uid,
             "a", float(v), "{}")
            for i, (uid, v) in enumerate(rows)
        ],
        SCHEMA,
    )


def _run_stream(spark, src, ckpt, target):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(idempotent_merge_sink(target, ["user_id"]))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _table(spark, target):
    rows = current_table(spark, target).collect()
    return {r.user_id: (r.n_events, r.total_cents) for r in rows}


def test_merge_sink_upserts_across_restarts(spark, tmp_path):
    src, ckpt, target = (
        str(tmp_path / d) for d in ("ev", "ck", "tbl")
    )
    _mk(spark, [(1, 10.5), (1, 2.25), (2, 5.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, ckpt, target)
    assert _table(spark, target) == {1: (2, 1275), 2: (1, 500)}

    # restart with more data: user 1 updates in place, user 3 inserts
    _mk(spark, [(1, 1.0), (3, 7.0)], start=10).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, ckpt, target)
    assert _table(spark, target) == {1: (3, 1375), 2: (1, 500), 3: (1, 700)}


def test_merge_sink_skips_replayed_batch(spark, tmp_path):
    target = str(tmp_path / "tbl")
    sink = idempotent_merge_sink(target, ["user_id"])
    b0 = (
        _mk(spark, [(1, 10.0), (2, 4.0)])
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
    )
    sink(b0, 0)
    first = _table(spark, target)
    # crash-before-checkpoint replay: same batch id delivered again —
    # the sink must not double-merge
    sink(b0, 0)
    assert _table(spark, target) == first == {1: (1, 1000), 2: (1, 400)}

    # a NEW batch with the same content must merge (id advanced)
    sink(b0, 1)
    assert _table(spark, target)[1] == (1, 1000)  # update, not duplicate row
    assert len(_table(spark, target)) == 2


def test_merge_sink_observed_metrics_ride_each_version_write(
    spark, tmp_path
):
    """Per-batch quality metrics recorded by the sink equal a direct
    audit of the published table, and a replayed batch never
    double-logs (the metrics log shares the exactly-once contract)."""
    from apl_commissions_etl_spark.streaming.sinks import sink_metrics

    target = str(tmp_path / "tbl")

    def gates():
        return [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("total_cents")).cast("long").alias("cents"),
        ]

    sink = idempotent_merge_sink(target, ["user_id"], metrics=gates)
    b0 = (
        _mk(spark, [(1, 10.0), (2, 4.0)])
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
    )
    sink(b0, 0)
    sink(b0, 0)  # replay: must not double-log
    m = sink_metrics(target)
    assert set(m) == {"0"}
    direct = current_table(spark, target).agg(
        F.count(F.lit(1)), F.sum("total_cents").cast("long")
    ).collect()[0]
    assert m["0"]["n_rows"] == direct[0]
    assert m["0"]["cents"] == direct[1]

    b1 = (
        _mk(spark, [(1, 1.0), (3, 7.0)], start=10)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
    )
    sink(b1, 1)
    m = sink_metrics(target)
    assert set(m) == {"0", "1"}
    # batch 1 merged 2 updated/inserted keys into the 2 existing ones
    assert m["1"]["n_rows"] == 3
