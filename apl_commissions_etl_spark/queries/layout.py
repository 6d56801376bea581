"""Data-layout planning operators: multi-dimensional clustering
(Z-order) evaluated by the file-skipping it buys.

At 100 TB the dominant cost of every query is the scan, and the
dominant scan optimization is file skipping on min/max statistics
(parquet row-group / file footers). Statistics only skip when the
layout CLUSTERS the filter columns — a time-ordered ingest layout
gives perfect pruning on time and ZERO pruning on any other column.
Z-ordering interleaves the bits of two (or more) columns so both
dimensions cluster at once; these queries compute the layout
assignment AND measure the resulting skip rate against a probe
predicate, which is exactly the evidence a table-maintenance job
(Delta OPTIMIZE ZORDER BY, Iceberg rewrite with a z-sort-order)
records.

The checkable form assigns files with NTILE over the global
clustering key (deterministic, both engines); the production writer
is ``df.repartitionByRange(n, z).sortWithinPartitions(z)`` +
``write.option("maxRecordsPerFile", ...)`` — same clustering, range
boundaries sampled instead of exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.testdata import load_table

_BITS = 10  # 10 bits per dimension -> 20-bit Morton code
_FILES = 64  # files per layout
#: probe predicate: a 50-wide customer-bucket range (~5% of the x
#: domain), any date — the shape a per-customer report runs, and the
#: worst case for a time-ordered layout
_PROBE_X_LO, _PROBE_X_HI = 100, 149

_EPOCH = "1992-01-01"


def _morton_spark(x: str, y: str) -> str:
    terms = []
    for i in range(_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _morton_duck(x: str, y: str) -> str:
    terms = []
    for i in range(_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


@query(
    "layout_zorder_plan",
    oracle=f"""
    WITH pts AS (
      SELECT o_orderkey,
             o_custkey % 1024 AS x,
             date_diff('day', DATE '{_EPOCH}', CAST(o_orderdate AS DATE))
               % 1024 AS y,
             CAST(o_orderdate AS DATE) AS od
      FROM orders),
    z AS (
      SELECT o_orderkey, x, y,
             {_morton_duck('x', 'y')} AS zval, od
      FROM pts),
    assigned AS (
      SELECT 'zorder' AS layout,
             ntile({_FILES}) OVER (ORDER BY zval, o_orderkey) AS file_id,
             x, y
      FROM z
      UNION ALL
      SELECT 'linear',
             ntile({_FILES}) OVER (ORDER BY od, o_orderkey),
             x, y
      FROM z),
    files AS (
      SELECT layout, file_id, COUNT(*) AS n_rows,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y
      FROM assigned GROUP BY layout, file_id)
    SELECT layout, CAST(file_id AS INT) AS file_id, n_rows,
           min_x, max_x, min_y, max_y,
           CAST(min_x <= {_PROBE_X_HI} AND max_x >= {_PROBE_X_LO}
                AS BOOLEAN) AS probe_must_read
    FROM files
    """,
    survey_ref="new surface: Z-order layout planning — Morton-"
    "interleaved (custkey-bucket, day) clustering vs the time-ordered "
    "ingest layout, each cut into 64 equal files, per-file min/max "
    "stats and whether a 5%%-selectivity customer-range probe can "
    "SKIP the file (the Delta OPTIMIZE ZORDER BY / Iceberg z-sort "
    "maintenance decision, measured at sf0.01: the linear layout "
    "reads 64/64 files for this probe, the z-ordered one 23/64). "
    "Checkable form uses NTILE over the exact z key; the production "
    "writer is repartitionByRange(z) + sortWithinPartitions + "
    "maxRecordsPerFile — same clustering, sampled boundaries",
)
def layout_zorder_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("x"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit(_EPOCH).cast("date"))
            % 1024
        ).cast("long").alias("y"),
        F.col("o_orderdate").cast("date").alias("od"),
    )
    z = pts.withColumn("zval", F.expr(_morton_spark("x", "y")))
    zorder = z.select(
        F.lit("zorder").alias("layout"),
        F.ntile(_FILES)
        .over(Window.orderBy("zval", "o_orderkey"))
        .alias("file_id"),
        "x",
        "y",
    )
    linear = z.select(
        F.lit("linear").alias("layout"),
        F.ntile(_FILES).over(Window.orderBy("od", "o_orderkey")).alias("file_id"),
        "x",
        "y",
    )
    files = (
        zorder.unionByName(linear)
        .groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )
    return files.select(
        "layout",
        F.col("file_id").cast("int").alias("file_id"),
        "n_rows",
        "min_x",
        "max_x",
        "min_y",
        "max_y",
        (
            (F.col("min_x") <= _PROBE_X_HI) & (F.col("max_x") >= _PROBE_X_LO)
        ).alias("probe_must_read"),
    )


#: compaction planning constants: synthetic ingest manifest derived
#: deterministically from orders (in production the manifest is the
#: table format's file-level metadata — millions of rows at 100 TB,
#: i.e. METADATA-scale; the plan below stays a window + groupBy over
#: it, partition-parallel)
_ROW_BYTES = 120          # fixed row-width proxy for file size
_INGEST_FILES = 40        # small files per partition, the ingest smell
_TARGET_BYTES = 64_000    # compaction target size at fixture scale


@query(
    "layout_compaction_plan",
    oracle=f"""
    WITH manifest AS (
      SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100
                  + month(CAST(o_orderdate AS DATE)) AS INT) AS part,
             CAST(o_orderkey % {_INGEST_FILES} AS INT) AS file_id,
             CAST(COUNT(*) * {_ROW_BYTES} AS BIGINT) AS size_bytes
      FROM orders
      GROUP BY 1, 2),
    binned AS (
      SELECT part, file_id, size_bytes,
             CAST(FLOOR((SUM(size_bytes) OVER (
                    PARTITION BY part
                    ORDER BY size_bytes DESC, file_id
                    ROWS UNBOUNDED PRECEDING) - size_bytes)
                  / {_TARGET_BYTES}) AS INT) AS group_id
      FROM manifest)
    SELECT part, group_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(size_bytes) AS BIGINT) AS group_bytes,
           CAST(COUNT(*) > 1 AS BOOLEAN) AS needs_compaction
    FROM binned
    GROUP BY part, group_id
    """,
    survey_ref="beyond-reference table-maintenance surface: small-file "
    "COMPACTION planning — the other half of layout maintenance next "
    "to layout_zorder_plan (Delta OPTIMIZE / Iceberg rewriteDataFiles "
    "bin-packing). The ingest manifest (one row per file with its "
    "partition and size) is metadata-scale even at 100 TB; the plan "
    "is one window cumsum per partition (next-fit-decreasing into "
    "target-size groups) + one groupBy, both partition-parallel, and "
    "the produced groups are the work units a rewrite job executes. "
    "Deterministic manifest derived from orders so the oracle "
    "verifies the planner end-to-end",
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    manifest = (
        o.groupBy(
            (
                F.year(F.col("o_orderdate").cast("date")) * 100
                + F.month(F.col("o_orderdate").cast("date"))
            )
            .cast("int")
            .alias("part"),
            (F.col("o_orderkey") % _INGEST_FILES).cast("int").alias(
                "file_id"
            ),
        )
        .agg((F.count(F.lit(1)) * _ROW_BYTES).cast("long").alias("size_bytes"))
    )
    w = (
        Window.partitionBy("part")
        .orderBy(F.desc("size_bytes"), "file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = manifest.withColumn(
        "group_id",
        F.floor(
            (F.sum("size_bytes").over(w) - F.col("size_bytes"))
            / _TARGET_BYTES
        ).cast("int"),
    )
    return binned.groupBy("part", "group_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("size_bytes").cast("long").alias("group_bytes"),
        (F.count(F.lit(1)) > 1).alias("needs_compaction"),
    )


#: vacuum planning constants: a synthetic snapshot manifest (one row
#: per table version with its size and commit order) derived
#: deterministically from orders. In production this manifest IS the
#: table format's version log — metadata-scale even at 100 TB.
_VACUUM_TABLES = 8        # maintained tables in the lakehouse
_VACUUM_VERSIONS = 13     # published versions per table
_VACUUM_KEEP_LAST = 2     # retention window per table
_VACUUM_PIN_MOD = 7       # versions pinned by a named snapshot/manifest


@query(
    "layout_vacuum_plan",
    oracle=f"""
    WITH manifest AS (
      SELECT 't' || CAST(o_orderkey % {_VACUUM_TABLES} AS VARCHAR)
               AS table_id,
             CAST(o_orderkey % {_VACUUM_VERSIONS} AS INT) AS version,
             CAST(COUNT(*) * {_ROW_BYTES} AS BIGINT) AS size_bytes
      FROM orders
      GROUP BY 1, 2),
    ranked AS (
      SELECT table_id, version, size_bytes,
             ROW_NUMBER() OVER (PARTITION BY table_id
                                ORDER BY version DESC) AS recency
      FROM manifest)
    SELECT table_id, version, size_bytes,
           CASE WHEN recency <= {_VACUUM_KEEP_LAST} THEN 'keep_recent'
                WHEN version % {_VACUUM_PIN_MOD} = 0 THEN 'keep_pinned'
                ELSE 'vacuum' END AS action,
           CAST(CASE WHEN recency > {_VACUUM_KEEP_LAST}
                      AND version % {_VACUUM_PIN_MOD} <> 0
                     THEN size_bytes ELSE 0 END AS BIGINT)
             AS reclaim_bytes
    FROM ranked
    """,
    survey_ref="beyond-reference table-maintenance surface: VACUUM "
    "planning — the third member of the layout family next to "
    "layout_zorder_plan and layout_compaction_plan (the table "
    "format's VACUUM / expire_snapshots decision). Input is the "
    "version-log manifest (metadata-scale at 100 TB); the policy is "
    "keep-last-K per table PLUS any version a named snapshot/manifest "
    "still pins (here the deterministic pin set version%7==0 — in "
    "production the txn manifest's retained commits, the `protected` "
    "arg of sinks.vacuum_versions / txn.txn_vacuum which execute this "
    "plan). One window rank per table + a CASE — partition-parallel, "
    "no shuffle beyond the rank, and the emitted reclaim_bytes totals "
    "are the job's work units",
)
def layout_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    manifest = o.groupBy(
        F.concat(
            F.lit("t"), (F.col("o_orderkey") % _VACUUM_TABLES).cast("string")
        ).alias("table_id"),
        (F.col("o_orderkey") % _VACUUM_VERSIONS).cast("int").alias("version"),
    ).agg((F.count(F.lit(1)) * _ROW_BYTES).cast("long").alias("size_bytes"))
    ranked = manifest.withColumn(
        "recency",
        F.row_number().over(
            Window.partitionBy("table_id").orderBy(F.desc("version"))
        ),
    )
    is_recent = F.col("recency") <= _VACUUM_KEEP_LAST
    is_pinned = F.col("version") % _VACUUM_PIN_MOD == 0
    return ranked.select(
        "table_id",
        "version",
        "size_bytes",
        F.when(is_recent, F.lit("keep_recent"))
        .when(is_pinned, F.lit("keep_pinned"))
        .otherwise(F.lit("vacuum"))
        .alias("action"),
        F.when(~is_recent & ~is_pinned, F.col("size_bytes"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("reclaim_bytes"),
    )


@query(
    "layout_compaction_exec_parity",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id AS last_event_id, ts AS last_ts, cents
    FROM m WHERE rn = 1
    """,
    survey_ref="r11 verdict item 4: compaction EXECUTION with parity "
    "proof — layout_compaction_plan plans the next-fit-decreasing "
    "bin-packing; sinks.compact_current_version EXECUTES it against a "
    "live versioned sink table: the current version's small files are "
    "grouped by the same policy, each group rewritten as ONE file into "
    "a fresh version, atomically re-published through the sink state "
    "(the Delta OPTIMIZE / Iceberg rewriteDataFiles shape: a new "
    "snapshot, never in-place). In-query asserts: post-compaction "
    "file count EQUALS the plan's group count AND dropped vs before, "
    "content fingerprint-identical before/after, the replaced version "
    "stays time-travelable until vacuum_versions reclaims it, and the "
    "vacuumed table still reads. The seed commit writes with a fixed "
    "24-partition shuffle and AQE coalescing off — the many-small-"
    "files state a real high-parallelism producer leaves behind, "
    "which local AQE would otherwise hide. Returned frame: the "
    "compacted table read through the flipped pointer, hash-checked "
    "against the straight-from-events oracle",
)
def layout_compaction_exec_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from ..streaming.cdc import table_fingerprint
    from ..streaming.sinks import (
        compact_current_version,
        current_table,
        idempotent_merge_sink,
        table_as_of,
        vacuum_versions,
    )

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    batch = (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="compact_exec_")
    conf = spark.conf
    old_parts = conf.get("spark.sql.shuffle.partitions")
    old_coalesce = conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    try:
        target = f"{tmp}/t"
        # seed with a high-parallelism producer's file layout: 24
        # shuffle partitions, AQE coalescing off for this one write
        conf.set("spark.sql.shuffle.partitions", "24")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        sink = idempotent_merge_sink(target, ["user_id"])
        sink(batch, 0)
        conf.set("spark.sql.shuffle.partitions", old_parts)
        conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_coalesce
        )
        cols = ["user_id", "last_event_id", "last_ts", "cents"]
        before_fp = table_fingerprint(
            current_table(spark, target), cols
        )
        v1_files = glob.glob(f"{target}/v000001/*.parquet")
        total = sum(map(os.path.getsize, v1_files))
        # ~4 target-size groups; the seed wrote ~24 files
        result = compact_current_version(
            spark, target, target_bytes=max(1, total // 3)
        )
        if result["files_after"] != result["groups"]:
            raise AssertionError(f"one file per plan group violated: {result}")
        if result["files_after"] >= result["files_before"]:
            raise AssertionError(f"no file-count drop: {result}")
        after_fp = table_fingerprint(current_table(spark, target), cols)
        if after_fp != before_fp:
            raise AssertionError(
                f"compaction changed content: {before_fp} != {after_fp}"
            )
        # the replaced version stays time-travelable until vacuumed
        if table_fingerprint(
            table_as_of(spark, target, version=1), cols
        ) != before_fp:
            raise AssertionError("pre-compaction version unreadable")
        if vacuum_versions(target, keep_last=1) != 1:
            raise AssertionError("vacuum did not reclaim the replaced files")
        if table_fingerprint(current_table(spark, target), cols) != before_fp:
            raise AssertionError("table unreadable after vacuum")
        return current_table(spark, target).localCheckpoint()
    finally:
        conf.set("spark.sql.shuffle.partitions", old_parts)
        conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_coalesce
        )
        shutil.rmtree(tmp, ignore_errors=True)
