"""The audit suite as a driver-checkable query (SURVEY.md §5 item 3:
referential-integrity assertion jobs re-expressed from the reference's
print-a-warning SQL scripts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.audit import referential_checks
from ..plans.fixtures import fixtures_cte_sql
from ..queries.calcdomain import _oracle as _calc_oracle, _staging, _stages
from ..registry import query
from ..sources.testdata import load_table

_CHECK = """SELECT '{name}' AS check_name, COUNT(*) AS orphan_count
FROM {child} c
WHERE c.{fk} IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})"""

_CHECKS = [
    ("split_participants_without_version", "stg_premium_split_participants",
     "SplitVersionId", "stg_premium_split_versions", "SplitVersionId"),
    ("hierarchy_participants_without_version", "stg_hierarchy_participants",
     "HierarchyVersionId", "stg_hierarchy_versions", "HierarchyVersionId"),
    ("split_versions_without_proposal", "stg_premium_split_versions",
     "ProposalId", "stg_proposals", "ProposalId"),
    ("premiums_without_policy", "stg_premium_transactions",
     "CertificateId", "stg_policies", "CertificateId"),
    ("assignment_recipients_without_version",
     "stg_commission_assignment_recipients", "AssignmentVersionId",
     "stg_commission_assignment_versions", "AssignmentVersionId"),
    ("premiums_group_without_proposal", "stg_policies",
     "GroupId", "stg_proposals", "GroupId"),
]

_ORACLE = (
    f"WITH {fixtures_cte_sql()}\n"
    + "\nUNION ALL\n".join(
        _CHECK.format(name=n, child=c, fk=fk, parent=p, pk=pk)
        for n, c, fk, p, pk in _CHECKS
    )
)


@query(
    "audit_referential_integrity",
    oracle=_ORACLE,
    survey_ref="§5 item 3: FK orphan checks as anti-join counts "
    "(99-audit-and-cleanup.sql:22-120); J8; the no-proposal stratum is "
    "the one expected-nonzero row",
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return referential_checks(_staging(spark, sf_dir))


@query(
    "audit_resolution_chain",
    oracle=f"""
    WITH {fixtures_cte_sql()},
    flags AS (
      SELECT pol.PolicyId,
             MAX(CASE WHEN p.ProposalId IS NOT NULL THEN 1 ELSE 0 END)
               AS f_prop,
             MAX(CASE WHEN sv.SplitVersionId IS NOT NULL THEN 1 ELSE 0 END)
               AS f_sv,
             MAX(CASE WHEN sp.SplitParticipantId IS NOT NULL
                      THEN 1 ELSE 0 END) AS f_sp,
             MAX(CASE WHEN hv.HierarchyVersionId IS NOT NULL
                      THEN 1 ELSE 0 END) AS f_hv,
             MAX(CASE WHEN hp.HierarchyParticipantId IS NOT NULL
                      THEN 1 ELSE 0 END) AS f_hp
      FROM stg_policies pol
      LEFT JOIN stg_proposals p
        ON p.GroupId = pol.GroupId
       AND (pol.EffectiveDate >= p.EffectiveDateFrom
            OR p.EffectiveDateFrom IS NULL)
       AND (pol.EffectiveDate <= p.EffectiveDateTo
            OR p.EffectiveDateTo IS NULL)
      LEFT JOIN stg_premium_split_versions sv
        ON sv.ProposalId = p.ProposalId AND sv.Status = 1
       AND pol.EffectiveDate >= sv.EffectiveFrom
       AND (pol.EffectiveDate <= sv.EffectiveTo OR sv.EffectiveTo IS NULL)
      LEFT JOIN stg_premium_split_participants sp
        ON sp.SplitVersionId = sv.SplitVersionId
      LEFT JOIN stg_hierarchy_versions hv
        ON hv.HierarchyId = sp.HierarchyId AND hv.Status = 1
      LEFT JOIN stg_hierarchy_participants hp
        ON hp.HierarchyVersionId = hv.HierarchyVersionId
      GROUP BY pol.PolicyId
    )
    SELECT 'total_policies' AS step, CAST(COUNT(*) AS BIGINT) AS n FROM flags
    UNION ALL SELECT 'proposal_resolved', CAST(SUM(f_prop) AS BIGINT)
      FROM flags
    UNION ALL SELECT 'split_version_active', CAST(SUM(f_sv) AS BIGINT)
      FROM flags
    UNION ALL SELECT 'split_participants', CAST(SUM(f_sp) AS BIGINT)
      FROM flags
    UNION ALL SELECT 'hierarchy_version_active', CAST(SUM(f_hv) AS BIGINT)
      FROM flags
    UNION ALL SELECT 'hierarchy_participants', CAST(SUM(f_hp) AS BIGINT)
      FROM flags""",
    survey_ref="§5.3 verify-commission-requirements.sql:17-120 — the "
    "reference walks ONE sample policy through proposal -> split "
    "version -> participants -> hierarchy chain with per-step PASS/"
    "FAIL prints; set-based re-expression walks EVERY policy in one "
    "left-join pass and reports the funnel (each step's flag implies "
    "the previous via the join chain)",
)
def audit_resolution_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    s = _staging(spark, sf_dir)
    pol = s["stg_policies"]
    p = s["stg_proposals"]
    sv = s["stg_premium_split_versions"].filter(F.col("Status") == 1)
    sp = s["stg_premium_split_participants"]
    hv = s["stg_hierarchy_versions"].filter(F.col("Status") == 1)
    hp = s["stg_hierarchy_participants"]

    joined = (
        pol.alias("pol")
        .join(
            p.alias("p"),
            (F.col("p.GroupId") == F.col("pol.GroupId"))
            & (
                (F.col("pol.EffectiveDate") >= F.col("p.EffectiveDateFrom"))
                | F.col("p.EffectiveDateFrom").isNull()
            )
            & (
                (F.col("pol.EffectiveDate") <= F.col("p.EffectiveDateTo"))
                | F.col("p.EffectiveDateTo").isNull()
            ),
            "left",
        )
        .join(
            sv.alias("sv"),
            (F.col("sv.ProposalId") == F.col("p.ProposalId"))
            & (F.col("pol.EffectiveDate") >= F.col("sv.EffectiveFrom"))
            & (
                (F.col("pol.EffectiveDate") <= F.col("sv.EffectiveTo"))
                | F.col("sv.EffectiveTo").isNull()
            ),
            "left",
        )
        .join(
            sp.alias("sp"),
            F.col("sp.SplitVersionId") == F.col("sv.SplitVersionId"),
            "left",
        )
        .join(
            hv.alias("hv"),
            F.col("hv.HierarchyId") == F.col("sp.HierarchyId"),
            "left",
        )
        .join(
            hp.alias("hp"),
            F.col("hp.HierarchyVersionId") == F.col("hv.HierarchyVersionId"),
            "left",
        )
    )
    flags = joined.groupBy("pol.PolicyId").agg(
        F.max(F.col("p.ProposalId").isNotNull().cast("int")).alias("f_prop"),
        F.max(F.col("sv.SplitVersionId").isNotNull().cast("int")).alias("f_sv"),
        F.max(
            F.col("sp.SplitParticipantId").isNotNull().cast("int")
        ).alias("f_sp"),
        F.max(
            F.col("hv.HierarchyVersionId").isNotNull().cast("int")
        ).alias("f_hv"),
        F.max(
            F.col("hp.HierarchyParticipantId").isNotNull().cast("int")
        ).alias("f_hp"),
    )
    steps = [
        ("total_policies", F.count(F.lit(1))),
        ("proposal_resolved", F.sum("f_prop")),
        ("split_version_active", F.sum("f_sv")),
        ("split_participants", F.sum("f_sp")),
        ("hierarchy_version_active", F.sum("f_hv")),
        ("hierarchy_participants", F.sum("f_hp")),
    ]
    out = None
    for name, agg_col in steps:
        part = flags.agg(agg_col.cast("long").alias("n")).select(
            F.lit(name).alias("step"), "n"
        )
        out = part if out is None else out.unionByName(part)
    return out


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@query(
    "audit_column_profile",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_str,
           CAST(MAX({c}) AS VARCHAR) AS max_str
    FROM orders"""
        for c in _PROFILE_COLS
    ),
    survey_ref="audit surface: per-column profile (null counts, "
    "distinct cardinality, min/max) — the reference's check-counts/"
    "check-staging-data.ts inspection scripts as ONE registered "
    "operator. One pass per column batch on the Spark side; at scale "
    "this is the pre-load contract check run before every transform",
)
def audit_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = None
    for c in _PROFILE_COLS:
        part = o.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_str"),
            F.max(c).cast("string").alias("max_str"),
        ).select(
            F.lit(c).alias("column_name"),
            "n_rows",
            "n_null",
            "n_distinct",
            "min_str",
            "max_str",
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Declarative expectations engine (Deequ-style): ONE scan computes every
# metric as conditional aggregation, then the single metrics row unpivots
# to a per-expectation report. Contrast with audit_column_profile's
# per-column union: at 100 TB the one-pass shape is the only affordable
# one -- adding an expectation adds a column to the aggregate, never a
# second scan.
# ---------------------------------------------------------------------------

#: (name, violation-count SQL over lineitem) -- shared text, both engines
_EXPECTATIONS = [
    ("orderkey_not_null",
     "SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)"),
    ("orderkey_linenumber_unique",
     "COUNT(*) - COUNT(DISTINCT CAST(l_orderkey AS VARCHAR(20)) || '-' "
     "|| CAST(l_linenumber AS VARCHAR(20)))"),
    ("discount_in_0_to_01",
     "SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)"),
    ("quantity_in_1_to_50",
     "SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)"),
    ("returnflag_accepted_values",
     "SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)"),
    ("extendedprice_non_negative",
     "SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)"),
    ("shipdate_in_epoch_range",
     "SUM(CASE WHEN l_shipdate < DATE '1992-01-01'"
     " OR l_shipdate > DATE '1998-12-31' THEN 1 ELSE 0 END)"),
]


@query(
    "audit_expectations",
    oracle="WITH m AS (SELECT COUNT(*) AS total, "
    + ", ".join(
        f"CAST({sql} AS BIGINT) AS v{i}"
        for i, (_, sql) in enumerate(_EXPECTATIONS)
    )
    + " FROM lineitem)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{name}' AS expectation, v{i} AS violations, total,"
        f" CAST(v{i} = 0 AS BOOLEAN) AS passed FROM m"
        for i, (name, _) in enumerate(_EXPECTATIONS)
    ),
    survey_ref="audit surface (new): declarative expectations engine -- "
    "not-null / composite-key-unique / numeric-range / accepted-values "
    "/ cross-column date-order constraints computed in ONE scan as "
    "conditional aggregations over a single metrics row, then "
    "unpivoted to a per-expectation pass/fail report. Adding an "
    "expectation adds a column to the aggregate, never a second scan "
    "-- the only affordable shape for a pre-load contract check at "
    "100 TB (the reference's check-*.ts scripts re-scan per check)",
)
def audit_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.expr(sql).cast("long").alias(f"v{i}")
            for i, (_, sql) in enumerate(_EXPECTATIONS)
        ],
    )
    out = None
    for i, (name, _) in enumerate(_EXPECTATIONS):
        part = m.select(
            F.lit(name).alias("expectation"),
            F.col(f"v{i}").alias("violations"),
            "total",
            (F.col(f"v{i}") == 0).alias("passed"),
        )
        out = part if out is None else out.unionByName(part)
    return out


_READY_SQL = """
    SELECT 'status_split_versions_not_active' AS check_name,
           COUNT(CASE WHEN Status <> 1 THEN 1 END) AS n_issues
    FROM stg_premium_split_versions
    UNION ALL
    SELECT 'status_hierarchy_versions_not_active',
           COUNT(CASE WHEN Status <> 1 THEN 1 END)
    FROM stg_hierarchy_versions
    UNION ALL
    SELECT 'completeness_proposals_without_split_version', COUNT(*)
    FROM stg_proposals p
    WHERE NOT EXISTS (SELECT 1 FROM stg_premium_split_versions v
                      WHERE v.ProposalId = p.ProposalId)
    UNION ALL
    SELECT 'completeness_hierarchy_versions_without_participants', COUNT(*)
    FROM stg_hierarchy_versions hv
    WHERE NOT EXISTS (SELECT 1 FROM stg_hierarchy_participants hp
                      WHERE hp.HierarchyVersionId = hv.HierarchyVersionId)
    UNION ALL
    SELECT 'quality_split_versions_total_not_100', COUNT(*)
    FROM (
      SELECT v.SplitVersionId
      FROM stg_premium_split_versions v
      JOIN stg_premium_split_participants sp
        ON sp.SplitVersionId = v.SplitVersionId
      GROUP BY v.SplitVersionId
      HAVING SUM(CAST(sp.SplitPercent AS DECIMAL(18,2)))
             <> CAST(100 AS DECIMAL(18,2)))
    UNION ALL
    SELECT 'quality_premiums_nonpositive', COUNT(*)
    FROM stg_premium_transactions
    WHERE PremiumAmount <= 0"""


@query(
    "audit_production_readiness",
    oracle=f"WITH {fixtures_cte_sql()}\n"
    "SELECT check_name, CAST(n_issues AS BIGINT) AS n_issues,\n"
    "       CAST(n_issues = 0 AS BOOLEAN) AS passes\n"
    f"FROM ({_READY_SQL})",
    survey_ref="§5 pre-export gate: the production-readiness "
    "verification (sql/verify/verify-production-readiness.sql:1-140 — "
    "status fields, completeness EXISTS chains, split-total and "
    "premium-sign quality) as ONE registered report instead of "
    "PRINT-a-warning batches: each check is an aggregate or "
    "anti-join count with a pass flag; at scale every check is a "
    "semi/anti broadcast join or a single-pass conditional count, "
    "so the whole gate costs one scan per staging table",
)
def audit_production_readiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _staging(spark, sf_dir)
    sv, hv = s["stg_premium_split_versions"], s["stg_hierarchy_versions"]
    props, hp = s["stg_proposals"], s["stg_hierarchy_participants"]
    sp, prem = s["stg_premium_split_participants"], s["stg_premium_transactions"]

    def row(name: str, n) -> DataFrame:
        return n.select(
            F.lit(name).alias("check_name"), F.col("n").alias("n_issues")
        )

    checks = [
        row(
            "status_split_versions_not_active",
            sv.agg(F.count(F.when(F.col("Status") != 1, 1)).alias("n")),
        ),
        row(
            "status_hierarchy_versions_not_active",
            hv.agg(F.count(F.when(F.col("Status") != 1, 1)).alias("n")),
        ),
        row(
            "completeness_proposals_without_split_version",
            props.join(
                sv.select("ProposalId").distinct(), "ProposalId", "left_anti"
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        row(
            "completeness_hierarchy_versions_without_participants",
            hv.join(
                hp.select("HierarchyVersionId").distinct(),
                "HierarchyVersionId",
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        row(
            "quality_split_versions_total_not_100",
            sv.join(sp, "SplitVersionId")
            .groupBy("SplitVersionId")
            .agg(F.sum(F.col("SplitPercent").cast("decimal(18,2)")).alias("t"))
            .filter(F.col("t") != F.lit(100).cast("decimal(18,2)"))
            .agg(F.count(F.lit(1)).alias("n")),
        ),
        row(
            "quality_premiums_nonpositive",
            prem.agg(
                F.count(F.when(F.col("PremiumAmount") <= 0, 1)).alias("n")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check_name", "n_issues", (F.col("n_issues") == 0).alias("passes")
    )


@query(
    "audit_observed_gl",
    oracle=_calc_oracle("""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(SUM(CASE WHEN EntryType = 'Original' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_original,
           CAST(SUM(CASE WHEN EntryType = 'Assigned' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_assigned,
           CAST(SUM(CAST(round(Amount * 100) AS BIGINT)) AS BIGINT)
             AS amount_cents,
           CAST(SUM(CASE WHEN BrokerId IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_broker_entries,
           CAST(SUM(CASE WHEN Amount < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS negative_entries
    FROM (
      SELECT 'Original' AS EntryType, EntityId AS BrokerId,
             CAST(RetainedCommission AS DOUBLE) AS Amount
      FROM s8
      UNION ALL
      SELECT 'Assigned', RecipientBrokerId, CAST(AssignedCommission AS DOUBLE)
      FROM s8
      WHERE RecipientBrokerId IS NOT NULL AND AssignedCommission <> 0) gl"""),
    survey_ref="beyond-reference audit surface: IN-FLIGHT data-quality "
    "metrics via Dataset.observe/CollectMetrics — the reference audits "
    "by re-scanning outputs with check-*.ts count queries; at 100 TB a "
    "second audit scan of the GL journal is a second pass over the "
    "output, while observed metrics accumulate on the executors DURING "
    "the write for free (row counts, integer-cents control total, "
    "null-key and negative-amount counts). The returned row is the "
    "metric set a warehouse load would log next to the batch id; the "
    "oracle recomputes the same aggregates from scratch, proving the "
    "in-flight numbers equal a dedicated audit pass",
)
def audit_observed_gl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the GL journal (noop sink here; parquet/JDBC in
    production) with quality metrics riding the SAME job, then emit
    the observed metrics as the result row."""
    from pyspark.sql import Observation

    gl = _stages(spark, sf_dir)["gl"]
    obs = Observation()
    observed = gl.observe(obs, *gl_metric_cols())
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return _gl_metrics_row(spark, m)


#: Observed-metric column order shared by the batch audit and the
#: streaming parity query — every metric is an ADDITIVE sum/count, so
#: per-micro-batch values accumulate to exactly the one-shot total.
GL_METRIC_NAMES = (
    "n_entries",
    "n_original",
    "n_assigned",
    "amount_cents",
    "null_broker_entries",
    "negative_entries",
)


def gl_metric_cols() -> list:
    """Fresh aggregate Columns for the GL quality metrics (Column
    objects are single-plan; build a new list per observation)."""
    return [
        F.count(F.lit(1)).alias("n_entries"),
        F.sum(F.when(F.col("EntryType") == "Original", 1).otherwise(0))
        .cast("long")
        .alias("n_original"),
        F.sum(F.when(F.col("EntryType") == "Assigned", 1).otherwise(0))
        .cast("long")
        .alias("n_assigned"),
        F.sum(F.round(F.col("Amount") * 100).cast("long")).alias(
            "amount_cents"
        ),
        F.sum(F.when(F.col("BrokerId").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_broker_entries"),
        F.sum(F.when(F.col("Amount") < 0, 1).otherwise(0))
        .cast("long")
        .alias("negative_entries"),
    ]


def _gl_metrics_row(spark: SparkSession, m: dict) -> DataFrame:
    return spark.createDataFrame(
        [tuple(int(m[k] or 0) for k in GL_METRIC_NAMES)],
        ", ".join(f"{k} bigint" for k in GL_METRIC_NAMES),
    )


@query(
    "stream_observed_gl_parity",
    oracle=_calc_oracle("""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(SUM(CASE WHEN EntryType = 'Original' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_original,
           CAST(SUM(CASE WHEN EntryType = 'Assigned' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_assigned,
           CAST(SUM(CAST(round(Amount * 100) AS BIGINT)) AS BIGINT)
             AS amount_cents,
           CAST(SUM(CASE WHEN BrokerId IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_broker_entries,
           CAST(SUM(CASE WHEN Amount < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS negative_entries
    FROM (
      SELECT 'Original' AS EntryType, EntityId AS BrokerId,
             CAST(RetainedCommission AS DOUBLE) AS Amount
      FROM s8
      UNION ALL
      SELECT 'Assigned', RecipientBrokerId, CAST(AssignedCommission AS DOUBLE)
      FROM s8
      WHERE RecipientBrokerId IS NOT NULL AND AssignedCommission <> 0) gl"""),
    survey_ref="§2.10 streaming + beyond-reference audit surface: the "
    "observe-PARITY proof — the GL journal is fed through Structured "
    "Streaming (readStream, maxFilesPerTrigger=1) into the exactly-"
    "once append sink (streaming/sinks.py idempotent_append_sink: "
    "same replay guard + committed-batch state as the MERGE sink), "
    "with the batch audit's OWN metric expressions riding every "
    "micro-batch via Dataset.observe; the feed is split across a "
    "checkpointed RESTART (second half of the files arrives after the "
    "first run terminates, the checkpoint resumes without replaying "
    "committed batches). Every metric is an additive sum/count, so "
    "the accumulated per-batch metrics log equals the one-shot "
    "audit_observed_gl row — the oracle recomputes the totals from "
    "scratch, proving per-batch in-flight metrics + exactly-once "
    "semantics compose to the dedicated audit pass. At 100 TB the "
    "sink's per-batch part dirs are the append-only commit log of a "
    "table format and the metrics ride writes that happen anyway",
)
def stream_observed_gl_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the GL journal as 4 files, stream them one per micro-batch
    through the exactly-once append sink across a checkpointed restart
    (2 files per run), then fold the sink's per-batch observed-metrics
    log into one row."""
    import os
    import shutil
    import tempfile

    from ..streaming.sinks import idempotent_append_sink, sink_metrics

    gl = _stages(spark, sf_dir)["gl"]
    tmp = tempfile.mkdtemp(prefix="gl_observe_parity_")
    try:
        src = f"{tmp}/src"
        ckpt = f"{tmp}/ckpt"
        target = f"{tmp}/journal"
        # deterministic 4-way split; publish 2 files per run so the
        # second run exercises checkpoint resume, not a fresh stream
        gl.repartition(4).write.mode("overwrite").parquet(f"{tmp}/all")
        parts = sorted(
            f for f in os.listdir(f"{tmp}/all") if f.endswith(".parquet")
        )
        os.makedirs(src)
        for wave in (parts[:2], parts[2:]):
            for f in wave:
                shutil.copy(f"{tmp}/all/{f}", f"{src}/{f}")
            q = (
                spark.readStream.schema(gl.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(
                    idempotent_append_sink(target, metrics=gl_metric_cols)
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                # Timed out with the query still live: starting the
                # next wave against the same checkpoint (or reading
                # sink_metrics mid-commit) would be silently wrong —
                # fail loudly instead.
                q.stop()
                raise TimeoutError(
                    "streaming wave did not finish within 300s"
                )
        per_batch = sink_metrics(target)
        totals = {
            k: sum(int(b[k] or 0) for b in per_batch.values())
            for k in GL_METRIC_NAMES
        }
        return _gl_metrics_row(spark, totals)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "audit_join_preflight",
    oracle=f"""
    WITH {fixtures_cte_sql()},
    l AS (SELECT CertificateId AS k, COUNT(*) AS c
          FROM stg_premium_transactions GROUP BY 1),
    r AS (SELECT CertificateId AS k, COUNT(*) AS c
          FROM stg_policies GROUP BY 1),
    j AS (SELECT l.k, l.c AS lc, r.c AS rc FROM l JOIN r ON l.k = r.k)
    SELECT CAST((SELECT SUM(c) FROM l) AS BIGINT) AS left_rows,
           CAST((SELECT SUM(c) FROM r) AS BIGINT) AS right_rows,
           CAST(COUNT(*) AS BIGINT) AS matched_keys,
           CAST(SUM(lc * rc) AS BIGINT) AS est_output_rows,
           CAST(MAX(lc) AS BIGINT) AS left_max_mult,
           CAST(MAX(rc) AS BIGINT) AS right_max_mult,
           CAST(MAX(lc * rc) AS BIGINT) AS hot_key_pairs,
           round(CAST(SUM(lc * rc) AS DOUBLE)
                 / (SELECT SUM(c) FROM l), 6) AS explosion_factor
    FROM j
    """,
    survey_ref="beyond-reference audit surface: JOIN PRE-FLIGHT — the "
    "fan-out estimate a 100 TB join should run before committing "
    "cluster-hours. Per-side key multiplicities reduce each input to "
    "key-scale; sum(lc*rc) over matched keys is the EXACT output "
    "cardinality of the equi-join, max(lc*rc) the hottest key's share "
    "(the AQE-skew-split / operators/skew.py salting trigger), and "
    "explosion_factor the blow-up vs the left input. Two key-scale "
    "aggregations + one key-scale join — never the join itself",
)
def audit_join_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (guide §2.4/§1.2): the r11 shape consumed each per-key
    # multiplicity frame TWICE (once for the matched-key join, once
    # for its side total), and Spark plans each consumption as its own
    # subtree — the premium fact was scanned and key-aggregated twice
    # per run (plan before: 2x {Scan parquet -> HashAggregate x2 ->
    # Exchange} + 2 broadcast crossJoins; 20 Exchanges).  Re-expressed
    # over ONE full-outer join of the two key frames: every side total
    # is a conditional aggregate of the SAME single-pass frame
    # (sum(lc) over the full outer = left rows, both-sides-present =
    # matched), so each input is aggregated exactly once and the two
    # 1-row broadcasts disappear.  Values are integer counts — order
    # independent, oracle unchanged.
    s = _staging(spark, sf_dir)
    l = s["stg_premium_transactions"].groupBy(
        F.col("CertificateId").alias("k")
    ).agg(F.count(F.lit(1)).alias("lc"))
    r = s["stg_policies"].groupBy(F.col("CertificateId").alias("k")).agg(
        F.count(F.lit(1)).alias("rc")
    )
    # SHUFFLE_HASH hint (guide §3.1): both sides are per-key counts —
    # one row per key, uniform — so a per-partition hash build is safe
    # at any scale, and the sort-merge pair of full sorts buys nothing.
    # The hint matters because the staging frames sit behind
    # lineage-truncating checkpoints whose stats are unknown, which
    # otherwise defaults this full-outer join to SortMergeJoin.
    f = l.join(r.hint("shuffle_hash"), "k", "full_outer")
    both = F.col("lc").isNotNull() & F.col("rc").isNotNull()
    return f.agg(
        F.sum("lc").cast("long").alias("left_rows"),
        F.sum("rc").cast("long").alias("right_rows"),
        F.count(F.when(both, 1)).cast("long").alias("matched_keys"),
        F.sum(F.when(both, F.col("lc") * F.col("rc")))
        .cast("long")
        .alias("est_output_rows"),
        F.max(F.when(both, F.col("lc"))).cast("long").alias("left_max_mult"),
        F.max(F.when(both, F.col("rc"))).cast("long").alias("right_max_mult"),
        F.max(F.when(both, F.col("lc") * F.col("rc")))
        .cast("long")
        .alias("hot_key_pairs"),
    ).select(
        "left_rows",
        "right_rows",
        "matched_keys",
        "est_output_rows",
        "left_max_mult",
        "right_max_mult",
        "hot_key_pairs",
        F.round(
            F.col("est_output_rows").cast("double") / F.col("left_rows"), 6
        ).alias("explosion_factor"),
    )
