"""Multi-table transactional publish (streaming/txn.py): the crash
window, replay guard, reader consistency, and retention vacuum.

The registry-level proof is ``pipeline_txn_commit_parity`` (the five
real maintained outputs through the manifest, hash-checked against
the full-rebuild oracles); these tests pin the manifest's mechanics
at synthetic scale, including the hash-level reader-consistency check
across an injected crash that the in-query path-equality assert
compresses.
"""

from __future__ import annotations

import os

import pytest

from apl_commissions_etl_spark.streaming.txn import (
    TxnAborted,
    txn_commit,
    txn_current,
    txn_resolved_paths,
    txn_table,
    txn_vacuum,
)


def _frames(spark, salt: int):
    a = spark.createDataFrame(
        [(i, i * 10 + salt) for i in range(6)], "k int, v int"
    )
    b = spark.createDataFrame(
        [(i, f"s{i}_{salt}") for i in range(4)], "k int, s string"
    )
    return {"alpha": a, "beta": b}


def _snapshot(spark, root, names, as_of=None):
    return {
        n: sorted(map(tuple, txn_table(spark, root, n, as_of).collect()))
        for n in names
    }


def test_commit_flip_is_all_or_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    assert txn_current(root) is None
    assert txn_commit(_frames(spark, 1), root, 1)
    assert txn_current(root) == 1
    before = _snapshot(spark, root, ["alpha", "beta"])

    # crash after 1 of 2 data writes: manifest untouched, reader
    # still sees commit 1's DATA (hash-level, not just paths)
    with pytest.raises(TxnAborted):
        txn_commit(_frames(spark, 2), root, 2, fail_after=1)
    assert txn_current(root) == 1
    assert _snapshot(spark, root, ["alpha", "beta"]) == before

    # replay completes; one flip publishes BOTH tables
    assert txn_commit(_frames(spark, 2), root, 2)
    assert txn_current(root) == 2
    after = _snapshot(spark, root, ["alpha", "beta"])
    assert after != before
    assert after == {
        n: sorted(map(tuple, df.collect()))
        for n, df in _frames(spark, 2).items()
    }


def test_replay_guard_keeps_directories_immutable(spark, tmp_path):
    root = str(tmp_path / "t")
    txn_commit(_frames(spark, 1), root, 1)
    paths = txn_resolved_paths(root)
    # a re-delivered commit is skipped without touching data
    assert txn_commit(_frames(spark, 99), root, 1) is False
    assert txn_resolved_paths(root) == paths
    assert _snapshot(spark, root, ["alpha"]) == {
        "alpha": sorted(map(tuple, _frames(spark, 1)["alpha"].collect()))
    }


def test_time_travel_reads_old_committed_set(spark, tmp_path):
    root = str(tmp_path / "t")
    txn_commit(_frames(spark, 1), root, 1)
    txn_commit(_frames(spark, 2), root, 2)
    assert _snapshot(spark, root, ["alpha"], as_of=1) == {
        "alpha": sorted(map(tuple, _frames(spark, 1)["alpha"].collect()))
    }
    assert _snapshot(spark, root, ["alpha"]) == {
        "alpha": sorted(map(tuple, _frames(spark, 2)["alpha"].collect()))
    }
    with pytest.raises(KeyError):
        txn_resolved_paths(root, as_of=7)


def test_vacuum_retention_and_orphan_reclaim(spark, tmp_path):
    root = str(tmp_path / "t")
    txn_commit(_frames(spark, 1), root, 1)
    txn_commit(_frames(spark, 2), root, 2)
    # crashed commit 3 leaves an orphan directory for table 'alpha'
    with pytest.raises(TxnAborted):
        txn_commit(_frames(spark, 3), root, 3, fail_after=1)
    orphan = os.path.join(root, "alpha", "c000003")
    assert os.path.isdir(orphan)
    txn_commit(_frames(spark, 4), root, 4)

    removed = txn_vacuum(root, keep_last=2)
    # victims: commit 1's two dirs + the crashed orphan (commit 3's
    # data write landed before the abort)
    assert removed == 3
    assert not os.path.isdir(orphan)
    # retained commits still read, both current and as-of
    assert txn_current(root) == 4
    assert _snapshot(spark, root, ["alpha"], as_of=2) == {
        "alpha": sorted(map(tuple, _frames(spark, 2)["alpha"].collect()))
    }
    # vacuumed commit no longer resolvable
    with pytest.raises(KeyError):
        txn_resolved_paths(root, as_of=1)
    with pytest.raises(ValueError):
        txn_vacuum(root, keep_last=0)


def test_partial_overlap_tables_across_commits(spark, tmp_path):
    # a commit may publish a DIFFERENT table set; reads resolve the
    # committed set as-of, never a blend
    root = str(tmp_path / "t")
    txn_commit(_frames(spark, 1), root, 1)
    only_alpha = {"alpha": _frames(spark, 5)["alpha"]}
    txn_commit(only_alpha, root, 2)
    assert sorted(txn_resolved_paths(root)) == ["alpha"]
    with pytest.raises(KeyError):
        txn_table(spark, root, "beta")  # not in the CURRENT set
    assert _snapshot(spark, root, ["beta"], as_of=1) == {
        "beta": sorted(map(tuple, _frames(spark, 1)["beta"].collect()))
    }


def test_concurrent_committers_serialize_without_loss(spark, tmp_path):
    # two writers racing different commit ids against one root: the
    # per-root lock serializes the load-write-flip windows, so BOTH
    # commits land, order list is a permutation of the ids, and the
    # final current resolves a complete, consistent set (the manifest
    # is the single-writer boundary a catalog enforces at 100 TB —
    # in-process threads are the foreachBatch/maintenance-job reality)
    import threading

    root = str(tmp_path / "t")
    txn_commit(_frames(spark, 0), root, 0)
    errs = []

    def committer(cid):
        try:
            txn_commit(_frames(spark, cid), root, cid)
        except Exception as e:  # pragma: no cover - failure evidence
            errs.append(e)

    threads = [threading.Thread(target=committer, args=(c,)) for c in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    from apl_commissions_etl_spark.streaming.txn import _load

    manifest = _load(root)
    assert sorted(manifest["order"]) == [0, 1, 2]
    assert manifest["current"] in (1, 2)
    # the current set is complete and reads back as one of the two
    # committed value sets, never a blend
    cur = manifest["current"]
    assert _snapshot(spark, root, ["alpha", "beta"]) == {
        n: sorted(map(tuple, df.collect()))
        for n, df in _frames(spark, cur).items()
    }


def test_schema_evolution_across_commits(spark, tmp_path):
    """A commit that ADDS a column to one table of the version set
    (r11 verdict item 5). Contract (documented in txn.py): committed
    directories are immutable and carry their OWN schema — an as-of
    read returns exactly the schema that was committed (snapshot
    isolation of schema; no retroactive null-filling of old commits),
    the current read has the evolved schema, and the replay guard +
    vacuum are path-based and schema-agnostic, so mixed-schema
    version sets survive both."""
    root = str(tmp_path / "t")
    a1 = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    b = spark.createDataFrame([(1, "x")], "k int, s string")
    assert txn_commit({"alpha": a1, "beta": b}, root, 1)
    # commit 2 evolves alpha: adds column w (beta unchanged shape)
    a2 = spark.createDataFrame(
        [(1, 11, 7.5), (3, 30, 2.5)], "k int, v int, w double"
    )
    assert txn_commit({"alpha": a2, "beta": b}, root, 2)

    # each side of the evolution commit keeps its own schema
    assert txn_table(spark, root, "alpha", as_of=1).columns == ["k", "v"]
    assert txn_table(spark, root, "alpha", as_of=2).columns == [
        "k", "v", "w"
    ]
    assert txn_table(spark, root, "alpha").columns == ["k", "v", "w"]
    assert sorted(map(tuple, txn_table(spark, root, "alpha").collect())) \
        == [(1, 11, 7.5), (3, 30, 2.5)]

    # replay guard is schema-agnostic: re-delivering commit 2 with
    # ANY payload is skipped without touching the committed data
    assert not txn_commit({"alpha": a1, "beta": b}, root, 2)
    assert txn_table(spark, root, "alpha").columns == ["k", "v", "w"]

    # a SHRINKING evolution (column dropped) also round-trips
    a3 = spark.createDataFrame([(5, 50)], "k int, v int")
    assert txn_commit({"alpha": a3, "beta": b}, root, 3)
    assert txn_table(spark, root, "alpha", as_of=3).columns == ["k", "v"]
    assert txn_table(spark, root, "alpha", as_of=2).columns == [
        "k", "v", "w"
    ]

    # vacuum across mixed-schema versions: keep-last-2 retires only
    # commit 1's dirs; both retained schemas stay readable
    removed = txn_vacuum(root, keep_last=2)
    assert removed == 2  # alpha/c1 + beta/c1
    with pytest.raises(KeyError):
        txn_resolved_paths(root, as_of=1)
    assert txn_table(spark, root, "alpha", as_of=2).columns == [
        "k", "v", "w"
    ]
    assert sorted(map(tuple, txn_table(spark, root, "alpha").collect())) \
        == [(5, 50)]
