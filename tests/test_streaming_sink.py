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


def test_append_sink_exactly_once_and_metric_log_parity(spark, tmp_path):
    """The append sink's part-dir commit log: replays never double-
    append or double-log, orphan dirs from a crash between write and
    commit are invisible to readers, and the accumulated per-batch
    observed metrics equal a one-shot audit of the journal."""
    from apl_commissions_etl_spark.streaming.sinks import (
        idempotent_append_sink,
        journal_table,
        sink_metrics,
    )

    target = str(tmp_path / "journal")

    def gauges():
        return [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        ]

    sink = idempotent_append_sink(target, metrics=gauges)
    b0 = _mk(spark, [(1, 10.5), (2, 2.25)])
    b1 = _mk(spark, [(1, 1.0), (3, 7.0)], start=10)
    sink(b0, 0)
    sink(b0, 0)  # crash-before-checkpoint replay: must be a no-op
    sink(b1, 1)
    journal = journal_table(spark, target)
    assert journal.count() == 4  # replay did not double-append
    log = sink_metrics(target)
    assert set(log) == {"0", "1"}  # replay did not double-log
    total_n = sum(m["n"] for m in log.values())
    total_cents = sum(m["cents"] for m in log.values())
    audit = journal.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    ).collect()[0]
    assert (total_n, total_cents) == (audit.n, audit.cents) == (4, 2075)


def test_append_sink_restart_resumes_from_checkpoint(spark, tmp_path):
    """A second availableNow run over a grown source resumes from the
    checkpoint: only NEW files become batches, committed batch ids and
    their metric rows survive untouched."""
    from apl_commissions_etl_spark.streaming.sinks import (
        idempotent_append_sink,
        journal_table,
        sink_metrics,
    )

    src, ckpt, target = (str(tmp_path / d) for d in ("ev", "ck", "journal"))

    def gauges():
        return [F.count(F.lit(1)).alias("n")]

    def run():
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                idempotent_append_sink(target, metrics=gauges)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _mk(spark, [(1, 10.5), (2, 2.25)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    first_log = sink_metrics(target)
    assert sum(m["n"] for m in first_log.values()) == 2

    _mk(spark, [(3, 7.0)], start=10).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    log = sink_metrics(target)
    # earlier batches were NOT replayed: their entries are unchanged
    assert {k: m["n"] for k, m in first_log.items()}.items() <= {
        k: m["n"] for k, m in log.items()
    }.items()
    assert sum(m["n"] for m in log.values()) == 3
    assert journal_table(spark, target).count() == 3


def test_journal_compaction_preserves_exactly_once(spark, tmp_path):
    """compact_journal folds the per-batch part dirs into one parquet
    dir without changing the table, without double-logging metrics,
    and without forgetting committed batch ids (a replay from before
    the compaction must still be skipped)."""
    from apl_commissions_etl_spark.streaming.sinks import (
        compact_journal,
        idempotent_append_sink,
        journal_table,
        sink_metrics,
    )

    target = str(tmp_path / "journal")

    def gauges():
        return [F.count(F.lit(1)).alias("n")]

    sink = idempotent_append_sink(target, metrics=gauges)
    b0 = _mk(spark, [(1, 10.5), (2, 2.25)])
    b1 = _mk(spark, [(3, 7.0)], start=10)
    sink(b0, 0)
    sink(b1, 1)
    before = sorted(
        (r.event_id, r.user_id)
        for r in journal_table(spark, target).collect()
    )
    log_before = sink_metrics(target)

    assert compact_journal(spark, target) == 2  # two part dirs folded
    after = sorted(
        (r.event_id, r.user_id)
        for r in journal_table(spark, target).collect()
    )
    assert after == before
    assert sink_metrics(target) == log_before

    # replay from BEFORE the compaction: still exactly-once
    sink(b0, 0)
    assert sorted(
        (r.event_id, r.user_id)
        for r in journal_table(spark, target).collect()
    ) == before

    # a NEW batch lands as a fresh part dir and reads alongside the
    # compacted dir; a second compaction folds (compacted + new)
    sink(_mk(spark, [(4, 1.0)], start=20), 2)
    assert journal_table(spark, target).count() == len(before) + 1
    assert compact_journal(spark, target) == 2  # c-dir + 1 new b-dir
    assert journal_table(spark, target).count() == len(before) + 1
    # idempotent when nothing new arrived
    assert compact_journal(spark, target) == 0


def test_compaction_merges_with_concurrent_commit(
    spark, tmp_path, monkeypatch
):
    """A batch that commits WHILE compact_journal is rewriting must
    survive the swap: its id stays in the committed set (so a replay
    is still skipped), its part dir stays live (covers lists only the
    snapshot), and the journal reads its rows (r6 ADVICE: the old
    load-mutate-store overwrote the state and orphaned such a batch)."""
    import threading

    from apl_commissions_etl_spark.streaming import sinks
    from apl_commissions_etl_spark.streaming.sinks import (
        compact_journal,
        idempotent_append_sink,
        journal_table,
    )

    target = str(tmp_path / "journal")
    sink = idempotent_append_sink(target)
    sink(_mk(spark, [(1, 10.5), (2, 2.25)]), 0)
    sink(_mk(spark, [(3, 7.0)], start=10), 1)

    # Inject the racer at the compactor's SECOND lock acquisition —
    # the swap point, after the rewrite read its snapshot.
    real = threading.Lock()
    state = {"n": 0}

    class HookLock:
        def __enter__(self):
            real.acquire()
            state["n"] += 1
            if state["n"] == 2:  # swap point
                real.release()  # let the racing sink take the lock
                sink(_mk(spark, [(4, 1.0)], start=20), 2)
                real.acquire()

        def __exit__(self, *exc):
            real.release()

    monkeypatch.setattr(sinks, "_state_lock", lambda td: HookLock())
    assert compact_journal(spark, target) == 2  # only the snapshot

    st = sinks._load_state(target)
    assert st["committed"] == [0, 1, 2]  # racer's commit survived
    assert set(st["compacted"]["covers"]) == {0, 1}  # not covered
    rows = sorted(
        r.event_id for r in journal_table(spark, target).collect()
    )
    assert rows == [0, 1, 10, 20]  # racer's rows visible

    # replaying the racer's batch is still skipped
    monkeypatch.undo()
    sink(_mk(spark, [(4, 1.0)], start=20), 2)
    assert journal_table(spark, target).count() == 4


def test_vacuum_reclaims_only_unreferenced_dirs(spark, tmp_path):
    """vacuum_journal deletes orphan part dirs (crash between write and
    commit), superseded compactions, and superseded merge versions —
    and NOTHING the state references."""
    import os

    from apl_commissions_etl_spark.streaming.sinks import (
        compact_journal,
        idempotent_append_sink,
        journal_table,
        vacuum_journal,
    )

    target = str(tmp_path / "journal")
    sink = idempotent_append_sink(target)
    sink(_mk(spark, [(1, 10.5)]), 0)
    sink(_mk(spark, [(2, 2.0)], start=10), 1)
    before = sorted(
        r.event_id for r in journal_table(spark, target).collect()
    )

    # orphan: a batch dir written but never committed (simulated crash)
    _mk(spark, [(9, 9.9)], start=90).write.mode("overwrite").parquet(
        os.path.join(target, "b000099")
    )
    # compaction leaves old dirs only if its removal crashed; simulate
    # one stale compacted dir
    _mk(spark, [(8, 8.8)], start=80).write.mode("overwrite").parquet(
        os.path.join(target, "c000000")
    )
    removed = vacuum_journal(target)
    assert removed == 2
    assert sorted(
        r.event_id for r in journal_table(spark, target).collect()
    ) == before
    assert not os.path.exists(os.path.join(target, "b000099"))

    # after a real compaction, vacuum has nothing to do (compact
    # already removed its inputs) and the compacted dir survives
    assert compact_journal(spark, target) == 2
    assert vacuum_journal(target) == 0
    assert sorted(
        r.event_id for r in journal_table(spark, target).collect()
    ) == before


def test_replace_sink_group_replace_and_shrink(spark, tmp_path):
    """Group-replace semantics: a batch touching a group key deletes
    EVERY target row of that group (including entries the recompute no
    longer emits) and inserts the batch rows; untouched groups persist
    verbatim; the replay guard still holds."""
    from apl_commissions_etl_spark.streaming.sinks import (
        current_table,
        idempotent_replace_sink,
    )

    target = str(tmp_path / "tbl")
    sink = idempotent_replace_sink(target, ["pid"])
    schema = "pid long, entry string, amount long"
    seed = spark.createDataFrame(
        [(1, "O", 100), (1, "A", 40), (2, "O", 50), (3, "O", 9)], schema
    )
    sink(seed, -1)

    # group 1 shrinks to a single entry with a new amount; group 2 is
    # explicitly affected but recomputes to ZERO rows (the affected
    # frame, not the batch rows, must drive the deletion)
    b0 = spark.createDataFrame([(1, "O", 110)], schema)
    affected = spark.createDataFrame([(1,), (2,)], "pid long")
    sink(b0, 0, affected=affected)

    def table():
        return {
            (r.pid, r.entry): r.amount
            for r in current_table(spark, target).collect()
        }

    assert table() == {(1, "O"): 110, (3, "O"): 9}

    # replayed batch id: no effect
    sink(spark.createDataFrame([(1, "O", 999)], schema), 0, affected=affected)
    assert table() == {(1, "O"): 110, (3, "O"): 9}

    # default deletion set = batch rows' own keys
    sink(spark.createDataFrame([(3, "O", 11), (3, "A", 2)], schema), 1)
    assert table() == {(1, "O"): 110, (3, "O"): 11, (3, "A"): 2}
