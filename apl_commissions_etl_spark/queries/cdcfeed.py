"""CDC change-feed EMISSION round-trip proofs (r11 verdict item 3).

``cdc_apply_changelog`` (queries/events.py) proved the READ side —
folding a changelog to current state. These queries prove the WRITE
side the maintained tables were missing: the merge / group-replace
sinks emit a Delta-CDF-shaped changelog per commit, derived from the
merge's own arms (``streaming/cdc.py``), and the emitted log FOLDS
BACK to the maintained table as of every commit — so a downstream
consumer at 100 TB reads O(changed rows) per commit instead of
diffing two snapshots (``export_snapshot_diff``'s full-table scan).

Reference anchor: the export layer's anti-join insert-missing is a
change feed restricted to inserts (sql/export/05-export-groups.sql:
11-38); the emitted feed generalizes it to insert / update_pre /
update_post / delete.

Proof shape (same discipline as the incremental-parity family): the
lifecycle runs inside the query against temp versioned sinks, every
intermediate contract is asserted in-query via distributed
fingerprints (fold(log<=N) == table_as_of(N) for EVERY commit N, both
sink kinds), and the RETURNED frame is the final state reconstructed
from the changelog ALONE — hash-checked by the driver against a
DuckDB oracle that derives the same state straight from the source
events. One hash therefore proves emit + apply == maintained table ==
independent rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.testdata import load_table

#: commit waves per lifecycle (event_id % _WAVES, applied in order)
_WAVES = 4
#: group key modulus for the group-replace lifecycle
_GROUPS = 15


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_id") % _WAVES).cast("int").alias("wave"),
    )


def _latest_per_user(df: DataFrame) -> DataFrame:
    """One keyed row per user: the latest event by (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _assert_roundtrip(spark, target_dir: str, keys: list[str]) -> None:
    """fold(changelog <= N) must fingerprint-equal table_as_of(N) for
    EVERY committed version N — the emit+apply round-trip contract,
    checked with distributed aggregates (no data-row collect, so the
    same check runs on a 100 TB table)."""
    from ..streaming.cdc import fold_changes, read_changes, table_fingerprint
    from ..streaming.sinks import _load_state, table_as_of

    changes = read_changes(spark, target_dir)
    if changes is None:
        raise AssertionError(f"no change feed under {target_dir}")
    data_cols = [
        c for c in changes.columns
        if c not in ("_change_type", "_commit_version")
    ]
    for h in _load_state(target_dir)["history"]:
        v = h["version"]
        folded = fold_changes(changes, keys, as_of=v).select(*data_cols)
        table = table_as_of(spark, target_dir, version=v).select(*data_cols)
        if table_fingerprint(folded, data_cols) != table_fingerprint(
            table, data_cols
        ):
            raise AssertionError(
                f"changelog fold diverges from table_as_of({v}) "
                f"under {target_dir}"
            )


_CDC_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             event_id % {_WAVES} AS wave
      FROM events),
    m AS (
      SELECT user_id, ts, event_id, cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY wave DESC, ts DESC, event_id DESC) AS rn
      FROM ev),
    r AS (
      SELECT user_id, ts, event_id, event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev)
    SELECT 'merge' AS sink, user_id, event_id AS last_event_id,
           ts AS last_ts, cents
    FROM m WHERE rn = 1
    UNION ALL
    SELECT 'replace', user_id, event_id, ts, cents
    FROM r WHERE rn = 1 AND event_type <> 'error'
"""


@query(
    "cdc_emit_roundtrip_parity",
    oracle=_CDC_ORACLE,
    survey_ref="north-star write-side frontier (r11 verdict item 3): "
    "CDC CHANGE-FEED EMISSION from both maintained-sink kinds, proven "
    "by round trip. The keyed-MERGE lifecycle commits 4 waves of "
    "per-user updates through idempotent_merge_sink(emit_changes=True) "
    "— each commit's insert/update_pre/update_post rows derive from "
    "the merge's own arms (streaming/cdc.py merge_changes, the "
    "export layer's anti-join insert-missing generalized, "
    "sql/export/05-export-groups.sql:11-38), never a snapshot diff. "
    "The GROUP-REPLACE lifecycle recomputes user-group row sets per "
    "wave with error-tombstoned users DROPPED, so the feed carries "
    "genuine deletes, delete+reinsert churn of surviving keys, and "
    "empty-recompute groups whose deletes come from the affected key "
    "set. In-query asserts: fold(log<=N) fingerprint-equals "
    "table_as_of(N) for EVERY commit N of BOTH sinks (distributed "
    "aggregate fingerprints — no data-row collect, 100 TB-safe). "
    "Returned frame: the final state of each sink reconstructed from "
    "the emitted changelog ALONE; oracle derives the same states "
    "straight from events, so one driver hash proves "
    "emit + apply == maintained table == independent rebuild. At "
    "100 TB every emission arm broadcasts the delta against the "
    "target (the target never shuffles to produce its feed) and the "
    "fold is one keyed window over the log",
)
def cdc_emit_roundtrip_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from ..streaming.cdc import fold_changes, read_changes
    from ..streaming.sinks import (
        idempotent_merge_sink,
        idempotent_replace_sink,
    )

    e = _events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc_emit_")
    try:
        # --- keyed-MERGE lifecycle: per-user latest row per wave ----
        mdir = f"{tmp}/merge"
        msink = idempotent_merge_sink(
            mdir, ["user_id"], emit_changes=True
        )
        for w in range(_WAVES):
            batch = _latest_per_user(
                e.filter(F.col("wave") == w)
            ).select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("ts").alias("last_ts"),
                "cents",
            )
            msink(batch, w)
        # replay guard covers the feed too: a re-delivered batch must
        # not append duplicate change rows
        msink(
            _latest_per_user(e.filter(F.col("wave") == 0)).select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("ts").alias("last_ts"),
                "cents",
            ),
            0,
        )
        _assert_roundtrip(spark, mdir, ["user_id"])

        # --- GROUP-REPLACE lifecycle: recompute touched groups ------
        rdir = f"{tmp}/replace"
        rsink = idempotent_replace_sink(rdir, ["grp"], emit_changes=True)
        g = e.withColumn(
            "grp", (F.col("user_id") % _GROUPS).cast("int")
        )
        for w in range(_WAVES):
            touched = (
                g.filter(F.col("wave") == w).select("grp").distinct()
            )
            # complete recomputed row set of the touched groups as of
            # wave w: per-user latest event, users whose latest is an
            # error TOMBSTONE out of the group's row set
            recompute = _latest_per_user(
                g.filter(F.col("wave") <= w).join(
                    F.broadcast(touched), "grp", "left_semi"
                )
            )
            batch = recompute.filter(
                F.col("event_type") != "error"
            ).select(
                "grp",
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("ts").alias("last_ts"),
                "cents",
            )
            rsink(batch, w, affected=touched)
        _assert_roundtrip(spark, rdir, ["user_id"])

        # final states from the CHANGELOG ALONE (the consumer's view)
        merged = fold_changes(
            read_changes(spark, mdir), ["user_id"]
        ).select(
            F.lit("merge").alias("sink"),
            "user_id",
            "last_event_id",
            "last_ts",
            "cents",
        )
        replaced = fold_changes(
            read_changes(spark, rdir), ["user_id"]
        ).select(
            F.lit("replace").alias("sink"),
            "user_id",
            "last_event_id",
            "last_ts",
            "cents",
        )
        # materialize before the temp sink directories are removed
        return merged.unionByName(replaced).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_STREAM_CDC_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             event_id % {_WAVES} AS wave
      FROM events),
    m AS (
      SELECT user_id, ts, event_id, cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY wave DESC, ts DESC, event_id DESC) AS rn
      FROM ev)
    SELECT user_id, event_id AS last_event_id, ts AS last_ts, cents
    FROM m WHERE rn = 1
"""


@query(
    "stream_cdc_emit_parity",
    oracle=_STREAM_CDC_ORACLE,
    survey_ref="north-star write-side frontier, STREAMED: the keyed "
    "micro-batches arrive via readStream (maxFilesPerTrigger=1) and "
    "foreachBatch maintains the table through "
    "idempotent_merge_sink(emit_changes=True) — each commit publishes "
    "the new version AND its change-feed slice in one exactly-once "
    "unit. A crash is INJECTED before one batch's commit; the stream "
    "fails, the restarted stream (same checkpoint) REDELIVERS the "
    "batch and its commit completes, and a manually re-delivered "
    "committed batch is a no-op (replay guard covers the feed: no "
    "duplicate change rows). In-query asserts: fold(log<=N) "
    "fingerprint-equals table_as_of(N) for every commit. Returned "
    "frame: the final table reconstructed from the emitted changelog "
    "ALONE, hash-checked against the straight-from-events oracle — "
    "streamed, crash-interrupted change-feed emission round-trips "
    "exactly",
)
def stream_cdc_emit_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..streaming.cdc import fold_changes, read_changes
    from ..streaming.sinks import idempotent_merge_sink

    e = _events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc_stream_")
    try:
        src = f"{tmp}/src"
        ckpt = f"{tmp}/ckpt"
        mdir = f"{tmp}/merge"
        os.makedirs(src)
        # one parquet FILE per wave, delivered in wave order
        waves = []
        for w in range(_WAVES):
            batch = _latest_per_user(
                e.filter(F.col("wave") == w)
            ).select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("ts").alias("last_ts"),
                "cents",
            )
            wdir = f"{tmp}/w{w}"
            batch.coalesce(1).write.mode("overwrite").parquet(wdir)
            part = next(
                f for f in sorted(os.listdir(wdir))
                if f.endswith(".parquet")
            )
            waves.append((f"{wdir}/{part}", f"{src}/wave{w}.parquet"))
        schema = spark.read.parquet(waves[0][0]).schema

        sink = idempotent_merge_sink(mdir, ["user_id"], emit_changes=True)
        crash_arm = {"armed": False}

        def apply_batch(bdf: DataFrame, bid: int) -> None:
            if crash_arm["armed"]:
                crash_arm["armed"] = False
                raise RuntimeError("injected crash before commit")
            sink(bdf, bid)

        def run_wave(expect_crash: bool) -> Exception | None:
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                if not q.awaitTermination(300):
                    q.stop()
                    raise TimeoutError(
                        "cdc stream wave did not finish within 300s"
                    )
                return None
            except TimeoutError:
                raise
            except Exception as err:  # the injected crash surfaces
                q.stop()
                if not expect_crash:
                    raise
                return err

        def deliver(pairs, base_mtime):
            # the file source orders candidate files by modification
            # time, and two back-to-back copies can land inside one
            # timestamp granule (observed at sf0.01: wave 3 scheduled
            # before wave 2) — pin strictly increasing mtimes so the
            # micro-batch order IS the wave order
            for i, (s, d) in enumerate(pairs):
                shutil.copy(s, d)
                os.utime(d, (base_mtime + i, base_mtime + i))

        deliver(waves[:2], 1_000_000_000)
        assert run_wave(expect_crash=False) is None
        # wave 2 crashes before its commit; the restart redelivers it
        crash_arm["armed"] = True
        deliver(waves[2:], 1_000_000_100)
        crash = run_wave(expect_crash=True)
        if crash is None or "injected crash" not in str(crash):
            raise AssertionError(f"expected the injected crash, got {crash}")
        assert run_wave(expect_crash=False) is None
        # replay guard covers the feed: re-delivering a committed
        # batch appends no duplicate change rows
        sink(spark.read.parquet(waves[0][1]), 0)
        _assert_roundtrip(spark, mdir, ["user_id"])
        folded = fold_changes(read_changes(spark, mdir), ["user_id"])
        return folded.select(
            "user_id", "last_event_id", "last_ts", "cents"
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
