"""Change-data-feed EMISSION from the maintained sinks (r11 frontier).

The read side existed first (``cdc_apply_changelog`` folds a
changelog to current state); this module closes the loop on the WRITE
side: the merge / group-replace sinks in ``sinks.py`` can emit a
Delta-CDF-shaped changelog per commit — ``insert`` / ``update_pre`` /
``update_post`` / ``delete`` rows tagged with the commit version —
derived from the merge's OWN arms, never from a snapshot diff. A
downstream consumer reads the per-commit delta instead of diffing two
table versions (``export_snapshot_diff``), which at 100 TB is the
difference between O(changed rows) and a full-table scan per commit.

Reference anchor: the export layer's anti-join insert-missing IS a
poor man's change feed (sql/export/05-export-groups.sql:11-38 inserts
exactly the rows production has not seen); this module generalizes it
to the full change-type vocabulary and proves the round trip:
``fold_changes`` applied to the emitted log reproduces the maintained
table AS OF every commit (``cdc_emit_roundtrip_parity``,
``stream_cdc_emit_parity``).

Exactly-once rides the sinks' existing machinery: the changelog
parquet is written BEFORE the state flip and the state's history
entry names it, so a crash between write and flip leaves an invisible
orphan (reclaimed by ``vacuum_journal``) and a replayed batch skips
both writes. Committed change directories are immutable.

Scale shape: every derivation arm is the SAME join the merge itself
runs — the delta-scale batch (or its key projection) broadcasts
against the target, so the 100 TB target never shuffles to produce
its changelog; the fold is one keyed window over the log (the W3
keep-latest shape), shuffle-free when the log is bucketed by key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Delta-CDF column vocabulary.
CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"


def _tag(df: DataFrame, change_type: str, version: int) -> DataFrame:
    return df.select(
        "*",
        F.lit(change_type).alias(CHANGE_TYPE),
        F.lit(version).cast("long").alias(COMMIT_VERSION),
    )


def merge_changes(
    target: DataFrame | None,
    batch_df: DataFrame,
    keys: list[str],
    version: int,
) -> DataFrame:
    """Changelog of applying ``batch_df`` to ``target`` with keyed
    MERGE semantics (``operators.export.merge_upsert``): matched keys
    emit ``update_pre`` (the old image) + ``update_post`` (the new
    values), unmatched batch rows emit ``insert``. Derived from the
    merge's own arms: the pre-image arm broadcasts the batch's key
    projection against the target (the target never shuffles), and
    the matched/insert split joins the delta against the target's key
    projection — the exact plan the merge's insert arm already runs,
    so emission adds no new scan shape."""
    if target is None:
        return _tag(batch_df, "insert", version)
    bkeys = batch_df.select(*keys).dropDuplicates(keys)
    pre = target.join(F.broadcast(bkeys), keys, "left_semi").select(
        *target.columns
    )
    tkeys = target.select(*keys).dropDuplicates(keys)
    aligned = batch_df.select(
        *[
            F.col(c)
            if c in batch_df.columns
            else F.lit(None).cast(target.schema[c].dataType).alias(c)
            for c in target.columns
        ]
    )
    post = aligned.join(tkeys, keys, "left_semi")
    ins = aligned.join(tkeys, keys, "left_anti")
    return (
        _tag(pre, "update_pre", version)
        .unionByName(_tag(post, "update_post", version))
        .unionByName(_tag(ins, "insert", version))
    )


def replace_changes(
    target: DataFrame | None,
    batch_df: DataFrame,
    group_keys: list[str],
    keys_df: DataFrame,
    version: int,
) -> DataFrame:
    """Changelog of a GROUP-REPLACE commit
    (``idempotent_replace_sink``): every target row of an affected
    group emits ``delete``, every batch row emits ``insert`` — the
    same vocabulary Delta CDF uses for replaceWhere/dynamic-partition
    overwrite. A row whose unique key survives the recompute appears
    as delete+insert in ONE commit; ``fold_changes`` orders insert
    after delete within a commit so the survivor keeps its new
    values. ``keys_df`` is the sink's affected-group key set (from
    the input delta, so a group whose recompute is EMPTY still emits
    its deletes). The delete arm broadcasts the group keys — the
    target never shuffles, identical to the sink's own anti-join."""
    ins = _tag(batch_df, "insert", version)
    if target is None:
        return ins
    dels = target.join(
        F.broadcast(keys_df), group_keys, "left_semi"
    ).select(*target.columns)
    return _tag(dels, "delete", version).unionByName(
        ins.select(*dels.columns, CHANGE_TYPE, COMMIT_VERSION)
    )


def read_changes(
    spark: SparkSession,
    target_dir: str,
    from_version: int = 1,
    to_version: int | None = None,
) -> DataFrame | None:
    """The committed change feed of a versioned sink, commit versions
    ``from_version..to_version`` inclusive (default: all retained).
    Resolution goes through the sink state's history — orphan change
    directories from crashed commits are invisible, exactly like data
    versions. Returns None when no retained commit in the range
    emitted changes. Change-feed retention follows version retention:
    ``vacuum_versions`` retires a version's changes with its data."""
    from .sinks import _load_state

    state = _load_state(target_dir)
    dirs = [
        h["changes"]
        for h in state.get("history", [])
        if "changes" in h
        and h["version"] >= from_version
        and (to_version is None or h["version"] <= to_version)
    ]
    if not dirs:
        return None
    return spark.read.parquet(
        *[os.path.join(target_dir, d) for d in dirs]
    )


def fold_changes(
    changes: DataFrame, keys: list[str], as_of: int | None = None
) -> DataFrame:
    """Reconstruct table state from the change feed alone — the
    ``cdc_apply_changelog`` semantics applied to an emitted log:
    last-writer-wins per key by commit version, ``delete`` tombstones
    drop the key, ``update_pre`` images are informational and never
    applied. Within one commit a group-replace's delete orders BEFORE
    the reinsert of the same key, so survivors keep their new values.
    ``as_of`` truncates the log at a commit version — fold(log<=N)
    must equal table_as_of(version=N), the round-trip contract the
    parity queries hash-prove. One keyed window (W3 keep-latest), no
    other shuffle."""
    ch = changes if as_of is None else changes.filter(
        F.col(COMMIT_VERSION) <= as_of
    )
    eff = ch.filter(F.col(CHANGE_TYPE) != "update_pre")
    rank = (
        F.when(F.col(CHANGE_TYPE) == "delete", F.lit(0))
        .when(F.col(CHANGE_TYPE) == "insert", F.lit(1))
        .otherwise(F.lit(2))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc(COMMIT_VERSION), F.desc("_op_rank")
    )
    return (
        eff.withColumn("_op_rank", rank)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(CHANGE_TYPE) != "delete"))
        .drop(CHANGE_TYPE, COMMIT_VERSION, "_op_rank", "_rn")
    )


def table_fingerprint(df: DataFrame, cols: list[str]) -> tuple[int, int]:
    """Distributed order-insensitive content fingerprint: (row count,
    decimal-sum of per-row xxhash64 over the canonicalized columns).
    One aggregate job, no collect of data rows — usable on a 100 TB
    side of a parity check where collecting either side is off the
    table. Decimal(38) accumulation cannot overflow under ANSI mode."""
    h = F.xxhash64(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("~"))
            for c in cols
        ]
    )
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(h.cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
        ).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"])
