"""Capstone: the ENTIRE 8-stage commission cascade runs in Structured
Streaming — every stage is a stream-static join (broadcast dims) or a
stateless projection/explode, so the premium fact can be a stream with
no code changes: the same ``plans/calc.py`` functions produce GL
entries incrementally, micro-batch by micro-batch (SURVEY.md §2.10 —
the 'incremental commission calculation' the reference approximates
with resumable run state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apl_commissions_etl_spark.plans import calc
from apl_commissions_etl_spark.plans.fixtures import (
    FIXTURE_VIEWS,
    register_fixture_views,
)


def test_streaming_gl_equals_batch_gl(spark, sf_dir, tmp_path):
    register_fixture_views(spark, sf_dir)
    staging = {name: spark.table(name) for name, _ in FIXTURE_VIEWS}

    # materialize the premium fact as parquet "arriving" in 3 chunks
    src = str(tmp_path / "premium_stream")
    premiums = staging["stg_premium_transactions"]
    premiums.repartition(3).write.parquet(src)

    batch_staging = dict(staging)
    batch_staging["stg_premium_transactions"] = spark.read.parquet(src)
    want = sorted(
        tuple(r) for r in calc.run_calc(batch_staging)["gl"].collect()
    )

    stream_staging = dict(staging)
    stream_staging["stg_premium_transactions"] = (
        spark.readStream.schema(premiums.schema).parquet(src)
    )
    gl_stream = calc.run_calc(stream_staging)["gl"]
    assert gl_stream.isStreaming

    sink = str(tmp_path / "gl_sink")
    q = (
        gl_stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "gl_ckpt"))
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert got == want
    assert len(got) > 0
    assert len(q.recentProgress) >= 1
