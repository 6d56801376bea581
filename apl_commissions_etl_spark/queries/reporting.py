"""Reporting layer (ref sql/reporting/create-reporting-schema.sql:1-673):
the curated views the reference exposes to its report designer, each
re-expressed as a driver-checkable query over the engine's own staging
entities and calc outputs.

Reference parity map (view number -> query):
  1  EarningBrokers                -> report_earning_brokers
  5  GroupCommissionRules          -> report_commission_rules
  10 GLJournalEntries (enriched)   -> report_gl_entries_enriched
  11 PremiumTransactions           -> report_premium_transactions
  12 Payments                      -> report_payments
  13 Schedules (with rates)        -> report_schedules_rates
  14 GroupCommissionRulesWithEarners -> report_commission_hierarchy
  15 BrokersWithAssignments        -> report_brokers_with_assignments
  16 AvailableViews                -> report_available_views

Views 2-4 and 6-8 (broker master + licenses / E&O / appointments)
live in queries/reporting_brokers.py. View 9 (DryRun) is view 10 over
the dry-run table — same plan, different source flag.

Scale notes: every report is a broadcast-join tree over group-scale
dims except report_premium_transactions, which joins two fact tables
(premiums >< policies) on CertificateId — at 100 TB that join wants
both sides bucketed/co-partitioned by CertificateId (the same key the
calc cascade shuffles on), after which it is shuffle-free.

The reference's GETDATE()-relative "last 3 months" windows use a fixed
AS_OF date (deterministic runs; callers pass today's date in
production) — same policy as queries/policies.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.fixtures import fixtures_cte_sql
from ..registry import query
from .calcdomain import STAGE_CTES, _stages, _staging

#: deterministic stand-in for GETDATE() in the earnings windows; the
#: fixture's transaction dates span 1992-1998 (l_shipdate)
AS_OF = "1998-06-01"
WINDOW_FROM = "1998-03-01"  # AS_OF - 3 months


def _oracle(final_select: str) -> str:
    return f"WITH {fixtures_cte_sql()},\n{STAGE_CTES}\n{final_select}"


#: GL rows with their transaction date, the earnings source feeding
#: views 1 and 6-8 (reference aggregates dbo.GLJournalEntries which
#: carries EntryDate; here the date rides along from s8)
_GL_DATED_SQL = """
gl_dated AS (
  SELECT PremiumTransactionId, EntityId AS BrokerId, TransactionDate,
         CAST(RetainedCommission AS DECIMAL(12,2)) AS Amount
  FROM s8 WHERE AppliedRate > 0
  UNION ALL
  SELECT PremiumTransactionId, RecipientBrokerId, TransactionDate,
         CAST(AssignedCommission AS DECIMAL(12,2))
  FROM s8
  WHERE RecipientBrokerId IS NOT NULL AND AssignedCommission <> 0
    AND AppliedRate > 0
)
"""


def _gl_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    s8 = _stages(spark, sf_dir)["s8"]
    rate_ok = s8.filter(F.col("AppliedRate") > 0)
    original = rate_ok.select(
        "PremiumTransactionId",
        F.col("EntityId").alias("BrokerId"),
        "TransactionDate",
        F.col("RetainedCommission").cast("decimal(12,2)").alias("Amount"),
    )
    assigned = rate_ok.filter(
        F.col("RecipientBrokerId").isNotNull() & (F.col("AssignedCommission") != 0)
    ).select(
        "PremiumTransactionId",
        F.col("RecipientBrokerId").alias("BrokerId"),
        "TransactionDate",
        F.col("AssignedCommission").cast("decimal(12,2)").alias("Amount"),
    )
    return original.unionByName(assigned)


@query(
    "report_earning_brokers",
    oracle=_oracle(
        f", {_GL_DATED_SQL.strip().lstrip(',')}\n"
        + f"""
    SELECT BrokerId,
           'Broker-' || CAST(BrokerId AS VARCHAR) AS BrokerName,
           MAX(TransactionDate) AS DateMostRecentEarnedCommission,
           CAST(SUM(CASE WHEN TransactionDate >= DATE '{WINDOW_FROM}'
                         THEN Amount ELSE CAST(0 AS DECIMAL(12,2)) END)
             AS DOUBLE) AS EarnedCommissionLast3Months,
           CAST(SUM(Amount) AS DOUBLE) AS TotalEarnedCommission,
           CAST(COUNT(CASE WHEN TransactionDate >= DATE '{WINDOW_FROM}'
                           THEN 1 END) AS BIGINT)
             AS TransactionCountLast3Months
    FROM gl_dated GROUP BY BrokerId"""
    ),
    survey_ref="reporting view 1 EarningBrokers (create-reporting-schema"
    ".sql:19-67): last-earned date + 3-month / total sums + 3-month "
    "count per broker over the GL entries; exact DECIMAL accumulation, "
    "DOUBLE only at the edge; fixed AS_OF replaces GETDATE()",
)
def report_earning_brokers(spark: SparkSession, sf_dir: str) -> DataFrame:
    gl = _gl_dated(spark, sf_dir)
    recent = F.col("TransactionDate") >= F.lit(WINDOW_FROM).cast("date")
    return gl.groupBy("BrokerId").agg(
        F.max("TransactionDate").alias("DateMostRecentEarnedCommission"),
        F.sum(
            F.when(recent, F.col("Amount")).otherwise(
                F.lit(0).cast("decimal(12,2)")
            )
        )
        .cast("double")
        .alias("EarnedCommissionLast3Months"),
        F.sum("Amount").cast("double").alias("TotalEarnedCommission"),
        F.count(F.when(recent, F.lit(1))).alias("TransactionCountLast3Months"),
    ).select(
        "BrokerId",
        F.concat(F.lit("Broker-"), F.col("BrokerId").cast("string")).alias(
            "BrokerName"
        ),
        "DateMostRecentEarnedCommission",
        "EarnedCommissionLast3Months",
        "TotalEarnedCommission",
        "TransactionCountLast3Months",
    )


@query(
    "report_commission_rules",
    oracle=_oracle("""
    SELECT ProposalId,
           GroupId,
           'Group-' || GroupId AS GroupName,
           LeadBrokerId,
           EffectiveDateFrom AS ProposalEffectiveDate,
           EffectiveDateTo AS ProposalExpirationDate,
           CASE WHEN EffectiveDateTo IS NULL THEN 1 ELSE 3 END AS Status,
           CASE WHEN EffectiveDateTo IS NULL THEN 'Active'
                ELSE 'Expired' END AS StatusName
    FROM stg_proposals"""),
    survey_ref="reporting view 5 GroupCommissionRules (create-reporting-"
    "schema.sql:188-223): proposals with group identity and decoded "
    "status (open EffectiveDateTo = Active, the fixture's status carrier)",
)
def report_commission_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _staging(spark, sf_dir)["stg_proposals"]
    open_ended = F.col("EffectiveDateTo").isNull()
    return p.select(
        "ProposalId",
        "GroupId",
        F.concat(F.lit("Group-"), "GroupId").alias("GroupName"),
        "LeadBrokerId",
        F.col("EffectiveDateFrom").alias("ProposalEffectiveDate"),
        F.col("EffectiveDateTo").alias("ProposalExpirationDate"),
        F.when(open_ended, 1).otherwise(3).alias("Status"),
        F.when(open_ended, "Active").otherwise("Expired").alias("StatusName"),
    )


@query(
    "report_gl_entries_enriched",
    oracle=_oracle("""
    SELECT 'GL-' || s8.PremiumTransactionId || '-'
             || s8.HierarchyParticipantId || '-O' AS GlEntryId,
           s8.PremiumTransactionId,
           s8.EntityId AS BrokerId,
           'Broker-' || CAST(s8.EntityId AS VARCHAR) AS BrokerName,
           s8.GroupId,
           'Group-' || s8.GroupId AS GroupName,
           CAST(s8.CertificateId AS VARCHAR(20)) AS PolicyId,
           s8.ProductCode,
           s8.TransactionDate AS EntryDate,
           'Original' AS EntryType,
           CAST(s8.RetainedCommission AS DOUBLE) AS Amount,
           CAST(s8.AppliedRate AS DOUBLE) AS CommissionRate,
           s8.RateSource
    FROM s8
    UNION ALL
    SELECT 'GL-' || s8.PremiumTransactionId || '-'
             || s8.HierarchyParticipantId || '-A',
           s8.PremiumTransactionId,
           s8.RecipientBrokerId,
           'Broker-' || CAST(s8.RecipientBrokerId AS VARCHAR),
           s8.GroupId,
           'Group-' || s8.GroupId,
           CAST(s8.CertificateId AS VARCHAR(20)),
           s8.ProductCode,
           s8.TransactionDate,
           'Assigned',
           CAST(s8.AssignedCommission AS DOUBLE),
           CAST(s8.AppliedRate AS DOUBLE),
           s8.RateSource
    FROM s8
    WHERE s8.RecipientBrokerId IS NOT NULL AND s8.AssignedCommission <> 0"""),
    survey_ref="reporting view 10 GLJournalEntries (create-reporting-"
    "schema.sql:369-404): GL entries enriched with broker/group/policy "
    "context — the joins the reference performs against dbo.Brokers/"
    "Group/Policies ride along from the cascade's own columns (no extra "
    "shuffle; view 9 DryRun is the same plan over the dry-run source)",
)
def report_gl_entries_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    s8 = _stages(spark, sf_dir)["s8"]

    def b_name(c: str) -> F.Column:
        return F.concat(F.lit("Broker-"), F.col(c).cast("string"))

    base = [
        F.col("PremiumTransactionId"),
        F.col("GroupId"),
        F.concat(F.lit("Group-"), "GroupId").alias("GroupName"),
        F.col("CertificateId").cast("string").alias("PolicyId"),
        F.col("ProductCode"),
        F.col("TransactionDate").alias("EntryDate"),
        F.col("AppliedRate").cast("double").alias("CommissionRate"),
        F.col("RateSource"),
    ]
    gid = F.concat_ws(
        "-", F.lit("GL"), "PremiumTransactionId", "HierarchyParticipantId"
    )
    original = s8.select(
        F.concat(gid, F.lit("-O")).alias("GlEntryId"),
        F.col("EntityId").alias("BrokerId"),
        b_name("EntityId").alias("BrokerName"),
        F.lit("Original").alias("EntryType"),
        F.col("RetainedCommission").cast("double").alias("Amount"),
        *base,
    )
    assigned = s8.filter(
        F.col("RecipientBrokerId").isNotNull() & (F.col("AssignedCommission") != 0)
    ).select(
        F.concat(gid, F.lit("-A")).alias("GlEntryId"),
        F.col("RecipientBrokerId").alias("BrokerId"),
        b_name("RecipientBrokerId").alias("BrokerName"),
        F.lit("Assigned").alias("EntryType"),
        F.col("AssignedCommission").cast("double").alias("Amount"),
        *base,
    )
    cols = [
        "GlEntryId", "PremiumTransactionId", "BrokerId", "BrokerName",
        "GroupId", "GroupName", "PolicyId", "ProductCode", "EntryDate",
        "EntryType", "Amount", "CommissionRate", "RateSource",
    ]
    return original.select(*cols).unionByName(assigned.select(*cols))


@query(
    "report_premium_transactions",
    oracle=_oracle("""
    SELECT pt.PremiumTransactionId AS TransactionId,
           CAST(pt.CertificateId AS VARCHAR(20)) AS PolicyId,
           pt.CertificateId,
           pt.TransactionDate,
           CAST(pt.PremiumAmount AS DOUBLE) AS PremiumAmount,
           po.GroupId,
           'Group-' || po.GroupId AS GroupName,
           po.ProductCode,
           po.GroupSize
    FROM stg_premium_transactions pt
    LEFT JOIN stg_policies po ON pt.CertificateId = po.CertificateId"""),
    survey_ref="reporting view 11 PremiumTransactions (create-reporting-"
    "schema.sql:408-425): premiums enriched with policy/group context — "
    "the one fact><fact report join; at scale both sides bucket by "
    "CertificateId (the calc cascade's key) making it shuffle-free",
)
def report_premium_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _staging(spark, sf_dir)
    pt, po = s["stg_premium_transactions"], s["stg_policies"]
    return pt.join(po, "CertificateId", "left").select(
        F.col("PremiumTransactionId").alias("TransactionId"),
        F.col("CertificateId").cast("string").alias("PolicyId"),
        "CertificateId",
        "TransactionDate",
        F.col("PremiumAmount").cast("double").alias("PremiumAmount"),
        "GroupId",
        F.concat(F.lit("Group-"), "GroupId").alias("GroupName"),
        "ProductCode",
        "GroupSize",
    )


@query(
    "report_schedules_rates",
    oracle=_oracle("""
    SELECT sr.ScheduleCode AS ScheduleId,
           'Schedule ' || sr.ScheduleCode AS ScheduleName,
           sm.ProductCount,
           sm.RateCount,
           sr.ProductCode,
           sr.State,
           sr.GroupSizeFrom,
           sr.GroupSizeTo,
           CAST(sr.FirstYearRate AS DOUBLE) AS FirstYearRate,
           CAST(sr.RenewalRate AS DOUBLE) AS RenewalRate
    FROM stg_schedule_rates sr
    JOIN (SELECT ScheduleCode,
                 CAST(COUNT(DISTINCT ProductCode) AS BIGINT) AS ProductCount,
                 CAST(COUNT(*) AS BIGINT) AS RateCount
          FROM stg_schedule_rates GROUP BY ScheduleCode) sm
      ON sm.ScheduleCode = sr.ScheduleCode"""),
    survey_ref="reporting view 13 Schedules (create-reporting-schema"
    ".sql:474-516): schedule master attributes (per-schedule product/"
    "rate counts) flattened against every rate row — the master side is "
    "an aggregate of the rates themselves, broadcast back",
)
def report_schedules_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    sr = _staging(spark, sf_dir)["stg_schedule_rates"]
    master = sr.groupBy("ScheduleCode").agg(
        F.countDistinct("ProductCode").alias("ProductCount"),
        F.count(F.lit(1)).alias("RateCount"),
    )
    return sr.join(F.broadcast(master), "ScheduleCode").select(
        F.col("ScheduleCode").alias("ScheduleId"),
        F.concat(F.lit("Schedule "), "ScheduleCode").alias("ScheduleName"),
        "ProductCount",
        "RateCount",
        "ProductCode",
        "State",
        "GroupSizeFrom",
        "GroupSizeTo",
        F.col("FirstYearRate").cast("double").alias("FirstYearRate"),
        F.col("RenewalRate").cast("double").alias("RenewalRate"),
    )


@query(
    "report_commission_hierarchy",
    oracle=_oracle("""
    SELECT p.ProposalId,
           p.GroupId,
           'Group-' || p.GroupId AS GroupName,
           sv.SplitVersionId,
           sp.Sequence AS SplitSequence,
           CAST(sp.SplitPercent AS DOUBLE) AS ParticipantSplitPercent,
           sp.HierarchyId,
           hv.HierarchyVersionId,
           hp.HierarchyParticipantId AS ParticipantId,
           hp.EntityId AS BrokerId,
           'Broker-' || CAST(hp.EntityId AS VARCHAR) AS BrokerName,
           hp.TierLevel,
           CAST(hp.ParticipantRate AS DOUBLE) AS ParticipantRate,
           hp.ScheduleCode
    FROM stg_proposals p
    LEFT JOIN stg_premium_split_versions sv
      ON sv.ProposalId = p.ProposalId AND sv.Status = 1
    LEFT JOIN stg_premium_split_participants sp
      ON sp.SplitVersionId = sv.SplitVersionId
    LEFT JOIN stg_hierarchy_versions hv
      ON hv.HierarchyId = sp.HierarchyId AND hv.Status = 1
    LEFT JOIN stg_hierarchy_participants hp
      ON hp.HierarchyVersionId = hv.HierarchyVersionId"""),
    survey_ref="reporting view 14 GroupCommissionRulesWithEarners "
    "(create-reporting-schema.sql:520-576): the full proposal -> split "
    "-> hierarchy -> participant fan-out as one left-join tree (all "
    "group-scale dims, every join broadcast)",
)
def report_commission_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _staging(spark, sf_dir)
    p = s["stg_proposals"]
    sv = s["stg_premium_split_versions"].filter(F.col("Status") == 1)
    sp = s["stg_premium_split_participants"]
    hv = s["stg_hierarchy_versions"].filter(F.col("Status") == 1)
    hp = s["stg_hierarchy_participants"]
    joined = (
        p.join(F.broadcast(sv), "ProposalId", "left")
        .join(F.broadcast(sp), "SplitVersionId", "left")
        .join(F.broadcast(hv), "HierarchyId", "left")
        .join(F.broadcast(hp), "HierarchyVersionId", "left")
    )
    return joined.select(
        "ProposalId",
        "GroupId",
        F.concat(F.lit("Group-"), "GroupId").alias("GroupName"),
        "SplitVersionId",
        F.col("Sequence").alias("SplitSequence"),
        F.col("SplitPercent").cast("double").alias("ParticipantSplitPercent"),
        "HierarchyId",
        "HierarchyVersionId",
        F.col("HierarchyParticipantId").alias("ParticipantId"),
        F.col("EntityId").alias("BrokerId"),
        F.concat(F.lit("Broker-"), F.col("EntityId").cast("string")).alias(
            "BrokerName"
        ),
        "TierLevel",
        F.col("ParticipantRate").cast("double").alias("ParticipantRate"),
        "ScheduleCode",
    )


@query(
    "report_brokers_with_assignments",
    oracle=_oracle("""
    , brokers AS (
      SELECT DISTINCT EntityId AS BrokerId FROM stg_hierarchy_participants),
    incoming AS (
      SELECT rc.RecipientBrokerId AS BrokerId,
             CAST(COUNT(*) AS BIGINT) AS IncomingAssignmentCount,
             CAST(SUM(rc.RecipientPercent) AS DOUBLE) AS TotalIncomingPercent
      FROM stg_commission_assignment_recipients rc
      GROUP BY rc.RecipientBrokerId)
    SELECT b.BrokerId,
           'Broker-' || CAST(b.BrokerId AS VARCHAR) AS BrokerName,
           av.AssignmentVersionId,
           av.ProposalId AS AssignedProposalId,
           av.EffectiveFrom AS AssignmentEffectiveDate,
           av.EffectiveTo AS AssignmentExpirationDate,
           av.Status AS AssignmentStatus,
           COALESCE(i.IncomingAssignmentCount, 0) AS IncomingAssignmentCount,
           CAST(COALESCE(i.TotalIncomingPercent, 0.0) AS DOUBLE)
             AS TotalIncomingPercent
    FROM brokers b
    LEFT JOIN stg_commission_assignment_versions av ON av.BrokerId = b.BrokerId
    LEFT JOIN incoming i ON i.BrokerId = b.BrokerId"""),
    survey_ref="reporting view 15 BrokersWithAssignments (create-"
    "reporting-schema.sql:580-634): outgoing assignment rows plus the "
    "correlated incoming-assignments aggregate per broker (the "
    "reference's derived-table join), both sides broadcast",
)
def report_brokers_with_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _staging(spark, sf_dir)
    brokers = (
        s["stg_hierarchy_participants"]
        .select(F.col("EntityId").alias("BrokerId"))
        .distinct()
    )
    av = s["stg_commission_assignment_versions"]
    incoming = (
        s["stg_commission_assignment_recipients"]
        .groupBy(F.col("RecipientBrokerId").alias("BrokerId"))
        .agg(
            F.count(F.lit(1)).alias("IncomingAssignmentCount"),
            F.sum("RecipientPercent").cast("double").alias("TotalIncomingPercent"),
        )
    )
    return (
        brokers.join(F.broadcast(av), "BrokerId", "left")
        .join(F.broadcast(incoming), "BrokerId", "left")
        .select(
            "BrokerId",
            F.concat(F.lit("Broker-"), F.col("BrokerId").cast("string")).alias(
                "BrokerName"
            ),
            "AssignmentVersionId",
            F.col("ProposalId").alias("AssignedProposalId"),
            F.col("EffectiveFrom").alias("AssignmentEffectiveDate"),
            F.col("EffectiveTo").alias("AssignmentExpirationDate"),
            F.col("Status").alias("AssignmentStatus"),
            F.coalesce("IncomingAssignmentCount", F.lit(0)).alias(
                "IncomingAssignmentCount"
            ),
            F.coalesce("TotalIncomingPercent", F.lit(0.0))
            .cast("double")
            .alias("TotalIncomingPercent"),
        )
    )


@query(
    "report_payments",
    oracle=_oracle(
        f", {_GL_DATED_SQL.strip().lstrip(',')}\n"
        + """
    , pay AS (
      SELECT BrokerId,
             CAST(date_trunc('month', TransactionDate) AS DATE) AS period,
             CAST(SUM(Amount) AS DOUBLE) AS PaymentAmount
      FROM gl_dated GROUP BY BrokerId,
             CAST(date_trunc('month', TransactionDate) AS DATE))
    SELECT 'PAY-' || CAST(BrokerId AS VARCHAR) || '-'
             || CAST(period AS VARCHAR) AS PaymentId,
           BrokerId,
           'Broker-' || CAST(BrokerId AS VARCHAR) AS BrokerName,
           CAST(period + INTERVAL 44 DAY AS DATE) AS ScheduledDate,
           CASE WHEN (BrokerId + EXTRACT(MONTH FROM period)) % 4 = 1
                THEN CAST(period + INTERVAL 47 DAY AS DATE) END AS PaymentDate,
           PaymentAmount,
           CAST(BrokerId % 3 AS INT) AS PaymentMethod,
           CASE CAST(BrokerId % 3 AS INT) WHEN 0 THEN 'Check'
                WHEN 1 THEN 'ACH' WHEN 2 THEN 'Wire'
                ELSE 'Unknown' END AS PaymentMethodName,
           CAST((BrokerId + EXTRACT(MONTH FROM period)) % 4 AS INT)
             AS PaymentStatus,
           CASE CAST((BrokerId + EXTRACT(MONTH FROM period)) % 4 AS INT)
                WHEN 0 THEN 'Pending' WHEN 1 THEN 'Processed'
                WHEN 2 THEN 'Failed' WHEN 3 THEN 'Cancelled'
                ELSE 'Unknown' END AS PaymentStatusName,
           'REF-' || CAST(BrokerId AS VARCHAR) || '-'
             || CAST(period AS VARCHAR) AS ReferenceNumber,
           LPAD(CAST(BrokerId % 10000 AS VARCHAR), 4, '0') AS AccountLastFour,
           'BATCH-' || CAST(period AS VARCHAR) AS PaymentBatchId
    FROM pay"""
    ),
    survey_ref="reporting view 12 Payments (create-reporting-schema"
    ".sql:433-466): the payment register — one payment per (broker, "
    "month) batched from the GL entries (the reference reads "
    "dbo.Payments, which its payment-batch process derives from the "
    "same journal), with the method/status int-code -> name decode "
    "CASE maps mirrored exactly; schedule/paid dates are deterministic "
    "month-anchored offsets so the view is value-hash-checkable",
)
def report_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    gl = _gl_dated(spark, sf_dir)
    pay = (
        gl.groupBy(
            "BrokerId", F.trunc("TransactionDate", "month").alias("period")
        )
        .agg(F.sum("Amount").cast("double").alias("PaymentAmount"))
    )
    method = (F.col("BrokerId") % 3).cast("int")
    status = ((F.col("BrokerId") + F.month("period")) % 4).cast("int")
    pid = F.concat_ws(
        "-", F.lit("PAY"), F.col("BrokerId").cast("string"),
        F.col("period").cast("string"),
    )
    return pay.select(
        pid.alias("PaymentId"),
        "BrokerId",
        F.concat(F.lit("Broker-"), F.col("BrokerId").cast("string")).alias(
            "BrokerName"
        ),
        F.date_add("period", 44).alias("ScheduledDate"),
        F.when(status == 1, F.date_add("period", 47)).alias("PaymentDate"),
        "PaymentAmount",
        method.alias("PaymentMethod"),
        F.when(method == 0, "Check")
        .when(method == 1, "ACH")
        .when(method == 2, "Wire")
        .otherwise("Unknown")
        .alias("PaymentMethodName"),
        status.alias("PaymentStatus"),
        F.when(status == 0, "Pending")
        .when(status == 1, "Processed")
        .when(status == 2, "Failed")
        .when(status == 3, "Cancelled")
        .otherwise("Unknown")
        .alias("PaymentStatusName"),
        F.concat_ws(
            "-", F.lit("REF"), F.col("BrokerId").cast("string"),
            F.col("period").cast("string"),
        ).alias("ReferenceNumber"),
        F.lpad((F.col("BrokerId") % 10000).cast("string"), 4, "0").alias(
            "AccountLastFour"
        ),
        F.concat(F.lit("BATCH-"), F.col("period").cast("string")).alias(
            "PaymentBatchId"
        ),
    )


#: the catalog rows for view 16 — single source for BOTH engines.
#: ViewName matches the registered SQL view name (the same reference
#: name register_reporting_views uses), and the descriptions are the
#: reference's own catalog text (create-reporting-schema.sql:642-659),
#: so `SELECT ViewName FROM AvailableViews` -> `SELECT * FROM <name>`
#: round-trips exactly as it does against the reference schema
_VIEW_CATALOG: list[tuple[str, str]] = [
    ("EarningBrokers",
     "Brokers with recent commission activity (last earned date, 3-month totals)"),
    ("GroupCommissionRules",
     "Commission proposals/rules by group"),
    ("GLJournalEntries",
     "Production commission journal entries"),
    ("PremiumTransactions",
     "Premium payment transactions"),
    ("Payments",
     "Payment records to brokers"),
    ("Schedules",
     "Commission rate schedules with rates"),
    ("Brokers",
     "All active brokers with contact and status information"),
    ("BrokerEOInsurances",
     "E&O Insurance details for all brokers"),
    ("BrokerLicenses",
     "License details for all brokers"),
    ("EarningBrokersWithLicenses",
     "Earning brokers joined with their license details"),
    ("EarningBrokersWithEO",
     "Earning brokers joined with E&O insurance details"),
    ("EarningBrokersWithAppointments",
     "Earning brokers with appointment/tenure information"),
    ("GroupCommissionRulesWithEarners",
     "Full commission hierarchy: proposals to splits to hierarchies to participants"),
    ("BrokersWithAssignments",
     "Brokers with their commission assignment details"),
    ("AvailableViews",
     "This list of available reporting views"),
]


@query(
    "report_available_views",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"('{n}', 'reporting', '{d}')" for n, d in _VIEW_CATALOG)
    + ") AS t(ViewName, SchemaName, Description)",
    survey_ref="reporting view 16 AvailableViews (create-reporting-"
    "schema.sql:638-664): the self-describing catalog of report views",
)
def report_available_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        [(n, "reporting", d) for n, d in _VIEW_CATALOG],
        "ViewName string, SchemaName string, Description string",
    )


@query(
    "report_gl_period_close",
    oracle=_oracle("""
    , gl AS (
      SELECT CAST(date_trunc('month', s8.TransactionDate) AS DATE) AS period,
             'Original' AS EntryType, s8.EntityId AS BrokerId,
             CAST(s8.RetainedCommission AS DECIMAL(18,2)) AS amt
      FROM s8
      UNION ALL
      SELECT CAST(date_trunc('month', s8.TransactionDate) AS DATE),
             'Assigned', s8.RecipientBrokerId,
             CAST(s8.AssignedCommission AS DECIMAL(18,2))
      FROM s8
      WHERE s8.RecipientBrokerId IS NOT NULL
        AND s8.AssignedCommission <> 0)
    SELECT period, EntryType,
           COUNT(*) AS n_entries,
           CAST(SUM(amt) AS DOUBLE) AS total_amount,
           COUNT(DISTINCT BrokerId) AS n_brokers
    FROM gl GROUP BY period, EntryType"""),
    survey_ref="reporting (new surface): the monthly GL period-close "
    "rollup — month x entry-type totals with exact-decimal "
    "accumulation and distinct payee counts; the aggregate a finance "
    "close reads instead of the raw journal. One combinable shuffle "
    "over period x type (tiny key space)",
)
def report_gl_period_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    s8 = _stages(spark, sf_dir)["s8"]
    period = F.trunc("TransactionDate", "month").alias("period")
    amt = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    original = s8.select(
        period,
        F.lit("Original").alias("EntryType"),
        F.col("EntityId").alias("BrokerId"),
        amt("RetainedCommission").alias("amt"),
    )
    assigned = s8.filter(
        F.col("RecipientBrokerId").isNotNull()
        & (F.col("AssignedCommission") != 0)
    ).select(
        period,
        F.lit("Assigned").alias("EntryType"),
        F.col("RecipientBrokerId").alias("BrokerId"),
        amt("AssignedCommission").alias("amt"),
    )
    return (
        original.unionByName(assigned)
        .groupBy("period", "EntryType")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.sum("amt").cast("double").alias("total_amount"),
            F.countDistinct("BrokerId").alias("n_brokers"),
        )
    )


def _period_close_oracle() -> str:
    from ..registry import REGISTRY

    return REGISTRY["report_gl_period_close"].oracle


def _period_journal(s8: DataFrame) -> DataFrame:
    """The period-close view's pre-aggregation journal (its ``gl``
    CTE) WITH the premium key — the explode-grain base table the
    two-level maintenance below group-replaces by premium before
    re-aggregating affected periods."""
    period = F.trunc("TransactionDate", "month").alias("period")
    amt = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    original = s8.select(
        "PremiumTransactionId",
        period,
        F.lit("Original").alias("EntryType"),
        F.col("EntityId").alias("BrokerId"),
        amt("RetainedCommission").alias("amt"),
    )
    assigned = s8.filter(
        F.col("RecipientBrokerId").isNotNull()
        & (F.col("AssignedCommission") != 0)
    ).select(
        "PremiumTransactionId",
        period,
        F.lit("Assigned").alias("EntryType"),
        F.col("RecipientBrokerId").alias("BrokerId"),
        amt("AssignedCommission").alias("amt"),
    )
    return original.unionByName(assigned)


@query(
    "report_incremental_period_close_parity",
    oracle=_period_close_oracle(),
    survey_ref="north-star: TWO-LEVEL materialized-view maintenance — "
    "the period-close rollup maintained FROM the maintained journal, "
    "not from scratch. The view's n_brokers is COUNT(DISTINCT), a "
    "non-distributive aggregate no delta algebra can subtract from, "
    "so the correct increment is: (1) group-replace the explode-grain "
    "journal by premium (the calc_incremental_gl_parity merge, one "
    "level down), (2) re-aggregate ONLY the affected PERIODS from the "
    "maintained journal — every other period row of the stored "
    "period-close baseline survives verbatim. At 100 TB the journal "
    "is bucketed by premium, the close table is partitioned by "
    "period, the affected-period set is delta-scale (broadcast "
    "semi-join = partition pruning on the close table), and the "
    "re-aggregation scans only the touched month partitions. Oracle = "
    "the FULL-rebuild period close verbatim "
    "(report_gl_period_close), so the value hash proves the chained "
    "view-over-view maintenance exact — including the corrupted "
    "baseline rows the period delete arm must scrub",
)
def report_incremental_period_close_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .calcdomain import (
        _corrupted_baseline,
        _delta_stages,
        _gl_incremental_frames,
    )

    _, affected = _gl_incremental_frames(spark, sf_dir)
    full_journal = _period_journal(_stages(spark, sf_dir)["s8"])
    delta_journal = _period_journal(_delta_stages(spark, sf_dir)["s8"])
    # level 1: group-replace the journal by premium (stored baseline =
    # full journal, value-corrupted on every affected premium's rows)
    maintained_journal = (
        _corrupted_baseline(full_journal, affected, "amt")
        .join(F.broadcast(affected), "PremiumTransactionId", "left_anti")
        .select(*full_journal.columns)
        .unionByName(delta_journal)
    )
    # affected periods: months carrying any affected premium's rows —
    # old rows (they leave the aggregate) or recomputed rows (they
    # enter it); distinct month count is delta-scale
    affected_periods = (
        full_journal.join(F.broadcast(affected), "PremiumTransactionId")
        .select("period")
        .unionByName(delta_journal.select("period"))
        .distinct()
    )
    # level 2: re-aggregate ONLY the affected periods from the
    # maintained journal (COUNT DISTINCT needs the period's full row
    # set, which the maintained journal provides without a rebuild)
    recomputed_close = (
        maintained_journal.join(F.broadcast(affected_periods), "period")
        .groupBy("period", "EntryType")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.sum("amt").cast("double").alias("total_amount"),
            F.countDistinct("BrokerId").alias("n_brokers"),
        )
    )
    full_close = report_gl_period_close(spark, sf_dir)
    baseline_close = _corrupted_baseline(
        full_close, affected_periods, "total_amount", key="period"
    )
    return (
        baseline_close.join(
            F.broadcast(affected_periods), "period", "left_anti"
        )
        .select(*full_close.columns)
        .unionByName(recomputed_close)
    )


#: registered query -> reference view name (create-reporting-schema.sql);
#: GLPeriodClose is the beyond-reference addition
REPORTING_VIEW_QUERIES: dict[str, str] = {
    "report_earning_brokers": "EarningBrokers",
    "report_brokers": "Brokers",
    "report_broker_eo_insurances": "BrokerEOInsurances",
    "report_broker_licenses": "BrokerLicenses",
    "report_commission_rules": "GroupCommissionRules",
    "report_earning_brokers_licenses": "EarningBrokersWithLicenses",
    "report_earning_brokers_eo": "EarningBrokersWithEO",
    "report_earning_brokers_appointments": "EarningBrokersWithAppointments",
    "report_gl_entries_enriched": "GLJournalEntries",
    "report_premium_transactions": "PremiumTransactions",
    "report_payments": "Payments",
    "report_schedules_rates": "Schedules",
    "report_commission_hierarchy": "GroupCommissionRulesWithEarners",
    "report_brokers_with_assignments": "BrokersWithAssignments",
    "report_gl_period_close": "GLPeriodClose",
    "report_available_views": "AvailableViews",
}


def register_reporting_views(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> list[str]:
    """SQL-catalog parity with the reference's `reporting` schema
    (create-reporting-schema.sql): registers every report query as a
    TEMP VIEW named like the reference view (EarningBrokers, Brokers,
    ...), so a user ports `SELECT * FROM reporting.EarningBrokers`
    by dropping the schema qualifier. Returns the registered names.

    ``only`` restricts to a subset of reference view names — building
    a report DataFrame triggers the session's staged-cascade
    materialization, so callers serving one ad-hoc statement register
    just the views it mentions. Each SELECT then executes the view's
    plan with the session's dim-frame caches doing the sharing; at
    warehouse scale the same function would CREATE OR REPLACE
    persistent views in the metastore."""
    from ..registry import all_queries

    qs = all_queries()
    registered = []
    for qname, vname in REPORTING_VIEW_QUERIES.items():
        if only is not None and vname not in only:
            continue
        qs[qname].spark_fn(spark, sf_dir).createOrReplaceTempView(vname)
        registered.append(vname)
    return registered
