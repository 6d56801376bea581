"""Scale toolkit: bucketed co-located joins (no Exchange), skew-safe
salted aggregation/join equivalence, applyInPandasWithState lifetime
totals with checkpointed restart."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from apl_commissions_etl_spark.operators.skew import salted_aggregate, salted_join
from apl_commissions_etl_spark.sources.testdata import load_table
from apl_commissions_etl_spark.sources.warehouse import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from apl_commissions_etl_spark.streaming.stateful import running_user_totals


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # warehouse dir is static (repo-local spark-warehouse/, gitignored);
    # use a dedicated database and drop it afterwards
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_t")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        write_bucketed(
            orders, "bucketed_t.orders_b", ["o_orderkey"], num_buckets=8
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "bucketed_t.lineitem_b", ["o_orderkey"], num_buckets=8,
        )
        # co-located: the join plans no shuffle on either side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert bucketed_join_is_shuffle_free(
            spark, "bucketed_t.orders_b", "bucketed_t.lineitem_b", ["o_orderkey"]
        )
        # and the data is intact
        n = spark.table("bucketed_t.lineitem_b").count()
        assert n == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE IF EXISTS bucketed_t CASCADE")


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, r.q)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, r.q)
        for r in salted_aggregate(
            li.withColumn("l_quantity", F.col("l_quantity").cast("decimal(18,2)")),
            ["l_returnflag"],
            {"n": ("l_returnflag", "count"), "q": ("l_quantity", "sum")},
            salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    plain = li.join(orders, ["l_orderkey"]).groupBy().agg(
        F.count(F.lit(1)), F.sum("o_custkey")
    ).collect()[0]
    salted = salted_join(li, orders, ["l_orderkey"], salts=4).groupBy().agg(
        F.count(F.lit(1)), F.sum("o_custkey")
    ).collect()[0]
    assert tuple(plain) == tuple(salted)


def test_stateful_running_totals_across_restart(spark, tmp_path):
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 1, 10, i), uid, "a", float(v), "{}")
                for i, (uid, v) in enumerate(rows)
            ],
            schema,
        )

    out_dir = str(tmp_path / "updates")

    def run(name):
        stream = spark.readStream.schema(mk([]).schema).parquet(src)

        def sink(df, batch_id):
            df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # latest update per user wins (batch ids keep increasing
        # across the checkpointed restart)
        rows = spark.read.parquet(out_dir).collect()
        latest: dict = {}
        for r in sorted(rows, key=lambda r: r.batch_id):
            latest[r.user_id] = (r.n_events, r.total_cents)
        return latest

    mk([(1, 10.5), (1, 2.25), (2, 5.0)]).coalesce(1).write.mode("append").parquet(src)
    first = run("t_state1")
    assert first == {1: (2, 1275), 2: (1, 500)}

    # restart with new data: state restored from checkpoint, totals accumulate
    mk([(1, 1.0), (3, 7.0)]).coalesce(1).write.mode("append").parquet(src)
    second = run("t_state2")
    assert second[1] == (3, 1375)
    assert second[3] == (1, 700)


def test_stateful_closed_sessions(spark, tmp_path):
    """Timeout-driven sessionization emits each closed session exactly
    once: in-batch gap closures emit immediately; the final open
    session flushes via the processing-time timeout on a later
    (empty-for-that-user) batch."""
    from apl_commissions_etl_spark.streaming.stateful import closed_sessions

    src = str(tmp_path / "sess_ev")
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ck")
    schema = "user_id long, ts_s long"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            closed_sessions(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # a ProcessingTimeTimeout keeps scheduling no-data batches, so
        # availableNow never self-terminates — drain briefly (data
        # batches + the 1s timeout flush), then stop explicitly
        if not q.awaitTermination(20):
            q.stop()
            q.awaitTermination(30)
        import os

        if not any(f.endswith(".parquet") for f in os.listdir(out_dir)):
            return []
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out_dir).collect()
        )

    gap = 30 * 60
    # user 1: two sessions separated by > gap within one batch;
    # user 2: one session that stays open until a timeout flushes it
    write([(1, 1000), (1, 1100), (1, 1100 + gap + 1), (2, 5000)])
    first = run()
    # the first session of user 1 closed by the in-batch gap,
    # guaranteed emitted in the first run (no timeout needed)
    assert (1, 1000, 1100, 2) in first

    # a later batch (new events for user 3 only) advances processing
    # time; any still-open idle sessions flush via timeout.
    # (availableNow may ALSO have flushed them already during the
    # first run's trailing batch if processing took > the 1s timeout —
    # either way each session must appear EXACTLY once overall.)
    import time

    time.sleep(2)  # let the 1s processing-time timeout expire
    write([(3, 9000)])
    second = run()  # cumulative read of the append sink
    assert sorted(t for t in second if t[0] in (1, 2)) == [
        (1, 1000, 1100, 2),
        (1, 1100 + gap + 1, 1100 + gap + 1, 1),
        (2, 5000, 5000, 1),
    ]
    # user 3's session may or may not have timed out yet (it arrived
    # in the final batch); it must not have been emitted twice
    assert sum(1 for t in second if t[0] == 3) <= 1


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime bloom-filter join pushdown: a selective dim filter
    injects a might_contain() pre-filter on the FACT side of the
    shuffle join, pruning rows before the exchange. Spark's production
    thresholds require a >=10GB application-side scan (exactly the
    100 TB case); they're lowered here because the local fixture is
    small — the assertion is that the optimizer DOES inject the filter
    once the scan qualifies, and that results are unchanged."""
    from apl_commissions_etl_spark.sources.testdata import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        o = load_table(spark, "/root/testdata/sf0.001", "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        n_bloom = j.count()
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        assert n_bloom == li.join(
            o, li.l_orderkey == o.o_orderkey
        ).count()
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_stream_dedup_ttl_keep_first(spark, tmp_path):
    """transformWithStateInPandas dedup: only the first document per
    fingerprint is emitted; a repeat in a later micro-batch (within
    the TTL) is dropped, and state survives the checkpointed restart."""
    from apl_commissions_etl_spark.streaming.dedup_ttl import dedup_stream_ttl

    src = str(tmp_path / "fp_src")
    out_dir = str(tmp_path / "fp_out")
    ckpt = str(tmp_path / "fp_ck")
    schema = "fp string, doc_id long"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            dedup_stream_ttl(stream, ttl_ms=3_600_000)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # the ProcessingTimeTimeout keeps scheduling no-data batches,
        # so availableNow never self-terminates — drain the data
        # batches, then stop explicitly (same shape as the
        # closed-sessions test above)
        if not q.awaitTermination(15):
            q.stop()
            q.awaitTermination(30)
        return {
            (r.fp, r.doc_id, r.n_dups_in_batch)
            for r in spark.read.parquet(out_dir).collect()
        }

    write([("a", 10), ("a", 11), ("b", 20)])
    assert run() == {("a", 10, 1), ("b", 20, 0)}

    # restart: 'a' and 'b' are already in (restored) state -> dropped;
    # 'c' is new
    write([("a", 12), ("b", 21), ("c", 30)])
    assert run() == {("a", 10, 1), ("b", 20, 0), ("c", 30, 0)}
