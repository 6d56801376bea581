"""CDC change-feed emission (streaming/cdc.py + the emit_changes arms
of the versioned sinks): change-type vocabulary, exactly-once crash
window, vacuum interplay, and the fold round trip on small frames.
The full lifecycle parities run as registry queries
(cdc_emit_roundtrip_parity / stream_cdc_emit_parity)."""

from __future__ import annotations

import os

import pytest

from apl_commissions_etl_spark.streaming import sinks as S
from apl_commissions_etl_spark.streaming.cdc import (
    fold_changes,
    read_changes,
    table_fingerprint,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, v int")


def _changes(spark, target, version=None):
    ch = read_changes(spark, target)
    assert ch is not None
    if version is not None:
        ch = ch.filter(ch["_commit_version"] == version)
    return sorted(
        (r["_change_type"], r["k"], r["v"]) for r in ch.collect()
    )


def test_merge_sink_change_vocabulary(spark, tmp_path):
    target = str(tmp_path / "t")
    sink = S.idempotent_merge_sink(target, ["k"], emit_changes=True)
    sink(_mk(spark, [(1, 10), (2, 20)]), 0)
    assert _changes(spark, target, 1) == [
        ("insert", 1, 10), ("insert", 2, 20)
    ]
    # k=1 updates (pre-image 10, post 11), k=3 inserts
    sink(_mk(spark, [(1, 11), (3, 30)]), 1)
    assert _changes(spark, target, 2) == [
        ("insert", 3, 30), ("update_post", 1, 11), ("update_pre", 1, 10)
    ]


def test_replace_sink_change_vocabulary(spark, tmp_path):
    target = str(tmp_path / "r")
    sink = S.idempotent_replace_sink(target, ["k"], emit_changes=True)
    sink(_mk(spark, [(1, 10), (1, 11), (2, 20)]), 0)
    # group 1 shrinks to one row (delete+reinsert churn), group 2
    # recomputes EMPTY — its delete must come from the affected keys
    sink(
        _mk(spark, [(1, 12)]),
        1,
        affected=spark.createDataFrame([(1,), (2,)], "k int"),
    )
    assert _changes(spark, target, 2) == [
        ("delete", 1, 10), ("delete", 1, 11), ("delete", 2, 20),
        ("insert", 1, 12),
    ]
    # current table matches: group 2 gone, group 1 replaced
    assert sorted(
        (r["k"], r["v"])
        for r in S.current_table(spark, target).collect()
    ) == [(1, 12)]


def test_fold_matches_table_as_of_every_commit(spark, tmp_path):
    target = str(tmp_path / "t")
    sink = S.idempotent_merge_sink(target, ["k"], emit_changes=True)
    sink(_mk(spark, [(1, 10), (2, 20)]), 0)
    sink(_mk(spark, [(1, 11), (3, 30)]), 1)
    sink(_mk(spark, [(2, 21)]), 2)
    ch = read_changes(spark, target)
    for v in (1, 2, 3):
        folded = fold_changes(ch, ["k"], as_of=v).select("k", "v")
        table = S.table_as_of(spark, target, version=v).select("k", "v")
        assert table_fingerprint(folded, ["k", "v"]) == table_fingerprint(
            table, ["k", "v"]
        )


def test_crash_between_feed_write_and_flip_is_invisible(
    spark, tmp_path, monkeypatch
):
    """A crash AFTER the data+changelog writes but BEFORE the state
    flip leaves orphans no reader sees; the redelivered batch
    overwrites them and commits exactly once; vacuum_journal reclaims
    a genuinely orphaned x-dir."""
    target = str(tmp_path / "t")
    sink = S.idempotent_merge_sink(target, ["k"], emit_changes=True)
    sink(_mk(spark, [(1, 10)]), 0)

    real_store = S._store_state
    boom = {"armed": True}

    def exploding_store(td, state):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before flip")
        real_store(td, state)

    monkeypatch.setattr(S, "_store_state", exploding_store)
    with pytest.raises(RuntimeError, match="injected crash"):
        sink(_mk(spark, [(1, 11)]), 1)
    monkeypatch.undo()
    # the orphan version + change dirs exist but are invisible
    assert os.path.isdir(os.path.join(target, "v000002"))
    assert os.path.isdir(os.path.join(target, "_changes", "x000002"))
    assert _changes(spark, target) == [("insert", 1, 10)]
    assert [
        (r["k"], r["v"]) for r in S.current_table(spark, target).collect()
    ] == [(1, 10)]
    # redelivery completes the commit; no duplicate change rows
    sink(_mk(spark, [(1, 11)]), 1)
    assert _changes(spark, target) == [
        ("insert", 1, 10), ("update_post", 1, 11), ("update_pre", 1, 10)
    ]
    # a replay of the committed batch is a no-op for the feed too
    sink(_mk(spark, [(1, 99)]), 1)
    assert _changes(spark, target, 2) == [
        ("update_post", 1, 11), ("update_pre", 1, 10)
    ]


def test_vacuum_reclaims_orphan_change_dirs_keeps_committed(
    spark, tmp_path
):
    target = str(tmp_path / "t")
    sink = S.idempotent_merge_sink(target, ["k"], emit_changes=True)
    sink(_mk(spark, [(1, 10)]), 0)
    sink(_mk(spark, [(1, 11)]), 1)
    # fabricate a crash orphan: an x-dir no history entry names
    os.makedirs(os.path.join(target, "_changes", "x000099"))
    assert S.vacuum_journal(target) == 1
    assert not os.path.exists(
        os.path.join(target, "_changes", "x000099")
    )
    assert len(_changes(spark, target)) == 3  # committed feed intact


def test_vacuum_versions_retires_changes_with_version(spark, tmp_path):
    target = str(tmp_path / "t")
    sink = S.idempotent_merge_sink(target, ["k"], emit_changes=True)
    for b in range(3):
        sink(_mk(spark, [(1, 10 + b)]), b)
    assert S.vacuum_versions(target, keep_last=2) == 1  # v1 retired
    assert not os.path.exists(
        os.path.join(target, "_changes", "x000001")
    )
    # the retained feed starts at version 2 (CDF retention follows
    # version retention)
    ch = read_changes(spark, target)
    assert ch.agg({"_commit_version": "min"}).collect()[0][0] == 2
    assert read_changes(spark, target, from_version=3).count() == 2
