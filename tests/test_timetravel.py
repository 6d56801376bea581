"""Time-travel + retention on the versioned sinks (r10 verdict item 4):
table_as_of resolves any retained published version (by version or by
batch id), vacuum_versions bounds the history with keep-last-K +
protected pins, and retired versions fail with the retention boundary
rather than a missing-path read error.
"""

from __future__ import annotations

import os

import pytest

from apl_commissions_etl_spark.streaming.sinks import (
    current_table,
    idempotent_merge_sink,
    idempotent_replace_sink,
    table_as_of,
    vacuum_journal,
    vacuum_versions,
)


def _feed_merge(spark, target, n=4):
    sink = idempotent_merge_sink(target, ["k"])
    for b in range(n):
        sink(
            spark.createDataFrame(
                [(i, b * 100 + i) for i in range(b + 1)], "k int, v int"
            ),
            b,
        )
    return sink


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_as_of_version_equals_fold_of_first_n_batches(spark, tmp_path):
    target = str(tmp_path / "t")
    _feed_merge(spark, target)
    # batch b carries keys 0..b with value b*100+i; latest batch wins
    assert _rows(table_as_of(spark, target, version=1)) == [(0, 0)]
    assert _rows(table_as_of(spark, target, version=3)) == [
        (0, 200), (1, 201), (2, 202)
    ]
    # as-of BATCH id resolves the same snapshot
    assert _rows(table_as_of(spark, target, batch=2)) == _rows(
        table_as_of(spark, target, version=3)
    )
    # current == newest version
    assert _rows(current_table(spark, target)) == _rows(
        table_as_of(spark, target, version=4)
    )
    with pytest.raises(ValueError):
        table_as_of(spark, target)  # neither selector
    with pytest.raises(ValueError):
        table_as_of(spark, target, version=1, batch=1)  # both
    with pytest.raises(KeyError):
        table_as_of(spark, target, version=9)


def test_vacuum_versions_retention_and_pins(spark, tmp_path):
    target = str(tmp_path / "t")
    _feed_merge(spark, target)
    removed = vacuum_versions(target, keep_last=2, protected={1})
    # victims: version 2 only (3..4 retained, 1 pinned)
    assert removed == 1
    assert _rows(table_as_of(spark, target, version=1)) == [(0, 0)]
    assert _rows(table_as_of(spark, target, version=3))  # retained
    with pytest.raises(KeyError) as ei:
        table_as_of(spark, target, version=2)
    assert "vacuum_versions" in str(ei.value)
    # idempotent: nothing left to retire at the same policy
    assert vacuum_versions(target, keep_last=2, protected={1}) == 0
    with pytest.raises(ValueError):
        vacuum_versions(target, keep_last=0)


def test_vacuum_versions_never_removes_current(spark, tmp_path):
    target = str(tmp_path / "t")
    _feed_merge(spark, target, n=2)
    assert vacuum_versions(target, keep_last=1) == 1
    assert _rows(current_table(spark, target)) == _rows(
        table_as_of(spark, target, version=2)
    )


def test_replace_sink_history_and_as_of(spark, tmp_path):
    target = str(tmp_path / "r")
    sink = idempotent_replace_sink(target, ["g"])
    sink(spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")],
                               "g int, s string"), 0)
    # group 1 SHRINKS to one row; group 2 untouched
    sink(spark.createDataFrame([(1, "z")], "g int, s string"), 1)
    assert _rows(table_as_of(spark, target, version=1)) == [
        (1, "a"), (1, "b"), (2, "c")
    ]
    assert _rows(table_as_of(spark, target, version=2)) == [
        (1, "z"), (2, "c")
    ]


def test_vacuum_journal_keeps_history_reclaims_orphans(spark, tmp_path):
    # history entries are LIVE to the janitor: superseded-but-still-
    # time-travelable versions survive vacuum_journal (retention policy
    # belongs exclusively to vacuum_versions — an earlier incarnation
    # deleted pinned/kept versions a later janitor pass should have
    # left alone); only dirs NO committed state references go
    target = str(tmp_path / "t")
    _feed_merge(spark, target, n=3)
    os.makedirs(os.path.join(target, "v999999"))  # crash orphan
    assert vacuum_journal(target) == 1  # only the orphan
    # every published version is still time-travelable
    assert _rows(table_as_of(spark, target, version=1)) == [(0, 0)]
    assert _rows(table_as_of(spark, target, version=3))
    assert sorted(
        d for d in os.listdir(target) if d.startswith("v")
    ) == ["v000001", "v000002", "v000003"]


def test_vacuum_journal_respects_vacuum_versions_pins(spark, tmp_path):
    # a keep-last-K + pinned retention established via vacuum_versions
    # is NOT destroyed by a later janitor pass
    target = str(tmp_path / "t")
    _feed_merge(spark, target, n=4)
    assert vacuum_versions(target, keep_last=2, protected={1}) == 1  # v2
    assert vacuum_journal(target) == 0  # nothing unreferenced remains
    assert _rows(table_as_of(spark, target, version=1)) == [(0, 0)]
    assert _rows(table_as_of(spark, target, version=3))
    assert _rows(table_as_of(spark, target, version=4))
    with pytest.raises(KeyError) as ei:
        table_as_of(spark, target, version=2)
    # the error reports the ACTUAL retained (non-contiguous) set, not
    # a lo..hi range that would wrongly include the retired v2
    assert "[1, 3, 4]" in str(ei.value)
