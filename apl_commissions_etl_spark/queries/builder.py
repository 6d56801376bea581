"""Proposal-builder composite + consolidation fold as driver-checkable
queries (SURVEY.md §2.9 composites #2 and #3).

Spark side: ``plans/builder.py`` (pure DataFrame) and
``operators/consolidate.py`` (sorted mapInPandas fold). Oracle side: the
same fixture SQL as CTEs + DuckDB aggregation CTEs — including a
RECURSIVE CTE that re-implements the consolidation fold, so even the
stateful operator gets a full value-hash check (not just rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.consolidate import consolidate_proposals
from ..plans import builder
from ..plans.builder_fixtures import builder_cte_sql, register_builder_views
from ..registry import query

# ---------------------------------------------------------------------------
# Oracle CTEs shared by the builder queries (DuckDB dialect — these run
# only on the oracle; the fixture views themselves are shared ANSI SQL)
# ---------------------------------------------------------------------------

_INVALID_GROUP = (
    "(GroupId IS NULL OR TRIM(GroupId) = ''"
    " OR regexp_matches(TRIM(GroupId), '^0+$')"
    " OR regexp_matches(TRIM(GroupId), '^G0+$'))"
)

BUILDER_CTES = f"""
per_split AS (
  SELECT GroupId, GroupName, CertificateId, CertEffectiveDate, ProductCode,
         PlanCode, SitusState, CertSplitSeq, CertSplitPercent,
         string_agg(CAST(SplitBrokerSeq AS VARCHAR) || ':' || SplitBrokerId
                    || ':' || ScheduleCode, ';' ORDER BY SplitBrokerSeq)
           AS TiersCanonical,
         sha256('HIER|' || GroupId || '|' || CAST(CertSplitPercent AS VARCHAR)
                || '|' || string_agg(CAST(SplitBrokerSeq AS VARCHAR) || ':'
                || SplitBrokerId || ':' || ScheduleCode, ';'
                ORDER BY SplitBrokerSeq)) AS HierarchyHash,
         arg_min(SplitBrokerId, SplitBrokerSeq) AS WritingBrokerId
  FROM input_certificate_info
  GROUP BY GroupId, GroupName, CertificateId, CertEffectiveDate, ProductCode,
           PlanCode, SitusState, CertSplitSeq, CertSplitPercent
),
criteria AS (
  SELECT GroupId, GroupName, CertificateId, CertEffectiveDate, ProductCode,
         PlanCode, SitusState,
         CAST(SUM(CertSplitPercent) AS INT) AS TotalSplitPercent,
         CAST(COUNT(*) AS INT) AS SplitCount,
         sha256('CFG|' || string_agg(CAST(CertSplitPercent AS VARCHAR) || '@'
                || HierarchyHash, ';' ORDER BY CertSplitSeq)) AS ConfigHash,
         arg_min(WritingBrokerId, CertSplitSeq) AS WritingBrokerId
  FROM per_split
  GROUP BY GroupId, GroupName, CertificateId, CertEffectiveDate, ProductCode,
           PlanCode, SitusState
),
conformant AS (
  SELECT * FROM criteria
  WHERE TotalSplitPercent = 100 AND NOT {_INVALID_GROUP}
),
proposals AS (
  SELECT GroupId, ConfigHash,
         'PROP-' || GroupId || '-' || substr(ConfigHash, 1, 8) AS ProposalId,
         MIN(CertEffectiveDate) AS EffectiveDateFrom,
         MAX(CertEffectiveDate) AS EffectiveDateTo,
         array_to_string(list_sort(list(DISTINCT PlanCode)), ',') AS PlanCodes,
         array_to_string(list_sort(list(DISTINCT ProductCode)), ',')
           AS ProductCodes,
         CAST(COUNT(DISTINCT CertificateId) AS INT) AS CertificateCount,
         arg_min(WritingBrokerId, CertificateId) AS PrimaryBrokerId,
         arg_min(GroupName, CertificateId) AS GroupName,
         arg_min(SitusState, CertificateId) AS SitusState
  FROM conformant
  GROUP BY GroupId, ConfigHash
)
"""


def _oracle(final_select: str) -> str:
    return f"WITH {builder_cte_sql()},\n{BUILDER_CTES}\n{final_select}"


def _certs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_builder_views(spark, sf_dir)
    return spark.table("input_certificate_info")


@query(
    "builder_split_hierarchies",
    oracle=_oracle("""
    SELECT GroupId, CertificateId, CertSplitSeq, CertSplitPercent,
           TiersCanonical, HierarchyHash, WritingBrokerId
    FROM per_split"""),
    survey_ref="§2.9 builder: per-split tier arrays + group-scoped "
    "SHA-256 hierarchy hash (proposal-builder.ts:665-714)",
)
def builder_split_hierarchies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return builder.split_hierarchies(_certs(spark, sf_dir)).select(
        "GroupId", "CertificateId", "CertSplitSeq", "CertSplitPercent",
        "TiersCanonical", "HierarchyHash", "WritingBrokerId",
    )


@query(
    "builder_selection_criteria",
    oracle=_oracle("""
    SELECT GroupId, CertificateId, CertEffectiveDate, ProductCode, PlanCode,
           SitusState, TotalSplitPercent, SplitCount, ConfigHash,
           WritingBrokerId
    FROM criteria"""),
    survey_ref="§2.9 builder: selection criteria per certificate, config "
    "hash excludes splitSeq (proposal-builder.ts:601-734,1005-1012); "
    "A11 grouped accumulation",
)
def builder_selection_criteria(spark: SparkSession, sf_dir: str) -> DataFrame:
    return builder.selection_criteria(_certs(spark, sf_dir)).select(
        "GroupId", "CertificateId", "CertEffectiveDate", "ProductCode",
        "PlanCode", "SitusState", "TotalSplitPercent", "SplitCount",
        "ConfigHash", "WritingBrokerId",
    )


@query(
    "builder_pha_routing",
    oracle=_oracle(f"""
    SELECT GroupId, CertificateId, CertEffectiveDate AS EffectiveDate,
           'NonConformant-CertificateSplitMismatch' AS Reason,
           1 AS EntryType
    FROM criteria WHERE TotalSplitPercent <> 100
    UNION ALL
    SELECT GroupId, CertificateId, CertEffectiveDate,
           'Invalid GroupId (null/empty/zeros)', 2
    FROM criteria WHERE TotalSplitPercent = 100 AND {_INVALID_GROUP}"""),
    survey_ref="§2.9 builder: non-conformant routing — split mismatch "
    "(proposal-builder.ts:750-763) then invalid group (:906-916, "
    ":1994-2001); P9 invalid-group regex",
)
def builder_pha_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return builder.pha_routing(builder.selection_criteria(_certs(spark, sf_dir)))


@query(
    "builder_proposals",
    oracle=_oracle("""
    SELECT ProposalId, GroupId, ConfigHash, EffectiveDateFrom, EffectiveDateTo,
           PlanCodes, ProductCodes, CertificateCount, PrimaryBrokerId,
           GroupName, SitusState
    FROM proposals"""),
    survey_ref="§2.9 builder: proposals per (GroupId, ConfigHash) with "
    "accumulated codes/dates/certs (proposal-builder.ts:886-1011); "
    "deterministic ids replace the global counter (SURVEY §7.1)",
)
def builder_proposals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return builder.build_proposals(
        builder.selection_criteria(_certs(spark, sf_dir))
    ).select(
        "ProposalId", "GroupId", "ConfigHash", "EffectiveDateFrom",
        "EffectiveDateTo", "PlanCodes", "ProductCodes", "CertificateCount",
        "PrimaryBrokerId", "GroupName", "SitusState",
    )


@query(
    "builder_overlap_fix",
    oracle=_oracle("""
    , props AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY GroupId
                 ORDER BY EffectiveDateFrom, ProposalId) AS INT) AS rn
      FROM proposals
    ),
    ppair AS (
      SELECT DISTINCT p.GroupId, p.rn,
             c.ProductCode || '~' || c.PlanCode AS pair
      FROM props p JOIN conformant c
        ON c.GroupId = p.GroupId AND c.ConfigHash = p.ConfigHash
    ),
    overlap AS (
      SELECT a.GroupId, a.rn
      FROM ppair a JOIN ppair b
        ON a.GroupId = b.GroupId AND b.rn = a.rn + 1 AND a.pair = b.pair
      GROUP BY a.GroupId, a.rn
    ),
    only_cur AS (
      SELECT a.GroupId, a.rn, a.pair
      FROM ppair a
      WHERE NOT EXISTS (SELECT 1 FROM ppair b
                        WHERE b.GroupId = a.GroupId AND b.rn = a.rn + 1
                          AND b.pair = a.pair)
    ),
    base AS (
      SELECT p.ProposalId AS Id, p.GroupId, p.EffectiveDateFrom,
             CASE WHEN o.rn IS NOT NULL THEN nx.EffectiveDateFrom - 1
                  ELSE p.EffectiveDateTo END AS EffectiveDateTo,
             p.ProductCodes, p.PlanCodes, 0 AS IsContinuation
      FROM props p
      LEFT JOIN props nx ON nx.GroupId = p.GroupId AND nx.rn = p.rn + 1
      LEFT JOIN overlap o ON o.GroupId = p.GroupId AND o.rn = p.rn
    ),
    cont AS (
      SELECT p.ProposalId || '-CONT' AS Id, p.GroupId,
             nx.EffectiveDateFrom AS EffectiveDateFrom,
             DATE '2099-01-01' AS EffectiveDateTo,
             array_to_string(list_sort(list(DISTINCT
               split_part(oc.pair, '~', 1))), ',') AS ProductCodes,
             array_to_string(list_sort(list(DISTINCT
               split_part(oc.pair, '~', 2))), ',') AS PlanCodes,
             1 AS IsContinuation
      FROM props p
      JOIN props nx ON nx.GroupId = p.GroupId AND nx.rn = p.rn + 1
      JOIN overlap o ON o.GroupId = p.GroupId AND o.rn = p.rn
      JOIN only_cur oc ON oc.GroupId = p.GroupId AND oc.rn = p.rn
      GROUP BY p.ProposalId, p.GroupId, nx.EffectiveDateFrom
    )
    SELECT * FROM base UNION ALL SELECT * FROM cont"""),
    survey_ref="§2.9 builder: overlap truncation + '-CONT' continuation "
    "proposals (proposal-builder.ts:1503-1620) as LEAD + array set-ops "
    "(no applyInPandas needed: adjacent-only, no state feedback); W4",
)
def builder_overlap_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return builder.fix_overlapping_date_ranges(
        builder.build_proposals(
            builder.selection_criteria(_certs(spark, sf_dir))
        )
    )


@query(
    "builder_broker_assignments",
    oracle=_oracle("""
    SELECT SplitBrokerId AS SourceBrokerId,
           SplitBrokerName AS SourceBrokerName,
           PaidBrokerId AS RecipientBrokerId,
           CertEffectiveDate AS EffectiveDate
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY SplitBrokerId
               ORDER BY CertEffectiveDate DESC, CertificateId DESC,
                        PaidBrokerId DESC) AS rn
      FROM input_certificate_info
      WHERE SplitBrokerId IS NOT NULL AND PaidBrokerId IS NOT NULL
        AND TRIM(SplitBrokerId) <> '' AND TRIM(PaidBrokerId) <> ''
        AND SplitBrokerId <> PaidBrokerId
    ) WHERE rn = 1"""),
    survey_ref="§2.9 builder: broker-level assignments, most recent per "
    "source broker (proposal-builder.ts:644-662); W3 keep-latest",
)
def builder_broker_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return builder.broker_assignments(_certs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Consolidation fold — applyInPandas on Spark, RECURSIVE CTE on DuckDB
# ---------------------------------------------------------------------------

_CONFLICT = """(
  NOT list_contains(AccPlans, '*')
  AND NOT list_contains(plan_list, '*')
  AND len(list_filter(plan_list, x -> list_contains(AccPlans, x))) > 0
  AND NOT (len(list_filter(plan_list, x -> list_contains(AccPlans, x)))
             = len(AccPlans)
           AND len(list_filter(plan_list, x -> list_contains(AccPlans, x)))
             = len(plan_list))
)"""

CONSOLIDATE_ORACLE = f"""
WITH RECURSIVE {{fixtures}},
p AS (
  SELECT *,
         CASE WHEN PlanCodes = '*' THEN ['*']
              ELSE string_split(PlanCodes, ',') END AS plan_list,
         CASE WHEN ProductCodes = '*' THEN ['*']
              ELSE string_split(ProductCodes, ',') END AS prod_list,
         CAST(ROW_NUMBER() OVER (PARTITION BY GroupId
              ORDER BY EffectiveDateFrom, SplitConfigurationMD5, Id) AS INT)
           AS rn
  FROM prestage_proposals
),
fold AS (
  SELECT GroupId, rn, Id AS RetainedId, SplitConfigurationMD5 AS Md5,
         list_sort(list_distinct(plan_list)) AS AccPlans,
         list_sort(list_distinct(prod_list)) AS AccProds,
         EffectiveDateFrom AS EffFrom, EffectiveDateTo AS EffTo,
         DateRangeFrom AS DrFrom, DateRangeTo AS DrTo,
         0 AS Consumed
  FROM p WHERE rn = 1
  UNION ALL
  SELECT GroupId, rn,
         CASE WHEN clos THEN Id ELSE RetainedId END,
         CASE WHEN clos THEN Md5In ELSE Md5 END,
         CASE WHEN clos THEN list_sort(list_distinct(plan_list))
              ELSE list_sort(list_distinct(list_concat(AccPlans, plan_list)))
              END,
         CASE WHEN clos THEN list_sort(list_distinct(prod_list))
              ELSE list_sort(list_distinct(list_concat(AccProds, prod_list)))
              END,
         CASE WHEN clos THEN EffFromIn ELSE LEAST(EffFrom, EffFromIn) END,
         CASE WHEN clos THEN EffToIn
              WHEN EffToIn IS NULL THEN EffTo
              WHEN EffTo IS NULL THEN EffToIn
              ELSE GREATEST(EffTo, EffToIn) END,
         CASE WHEN clos THEN DrFromIn ELSE LEAST(DrFrom, DrFromIn) END,
         CASE WHEN clos THEN DrToIn
              WHEN DrToIn IS NULL THEN NULL
              WHEN DrTo IS NULL THEN DrToIn
              ELSE GREATEST(DrTo, DrToIn) END,
         CASE WHEN clos THEN 0 ELSE Consumed + 1 END
  FROM (
    SELECT f.RetainedId, f.Md5, f.AccPlans, f.AccProds, f.EffFrom, f.EffTo,
           f.DrFrom, f.DrTo, f.Consumed,
           p.GroupId, p.rn, p.Id, p.SplitConfigurationMD5 AS Md5In,
           p.plan_list, p.prod_list,
           p.EffectiveDateFrom AS EffFromIn, p.EffectiveDateTo AS EffToIn,
           p.DateRangeFrom AS DrFromIn, p.DateRangeTo AS DrToIn,
           (p.SplitConfigurationMD5 <> f.Md5 OR {_CONFLICT.replace('AccPlans', 'f.AccPlans').replace('plan_list', 'p.plan_list')})
             AS clos
    FROM fold f JOIN p ON p.GroupId = f.GroupId AND p.rn = f.rn + 1
  )
)
SELECT GroupId, RetainedId, EffFrom AS EffectiveDateFrom,
       EffTo AS EffectiveDateTo,
       CAST(DrFrom AS INT) AS DateRangeFrom,
       CAST(DrTo AS INT) AS DateRangeTo,
       array_to_string(AccProds, ',') AS ProductCodes,
       array_to_string(AccPlans, ',') AS PlanCodes,
       CAST(Consumed AS INT) AS ConsumedCount
FROM fold
QUALIFY ROW_NUMBER() OVER (PARTITION BY GroupId, RetainedId
                           ORDER BY rn DESC) = 1
"""


@query(
    "consolidate_proposals",
    oracle=CONSOLIDATE_ORACLE.format(fixtures=builder_cte_sql()),
    survey_ref="§2.9 consolidation fold rules R1-R4 incl. wildcard "
    "conflicts + asymmetric null date merges "
    "(consolidate-proposals.ts:130-260); §2.11 ordered fold via sorted "
    "mapInPandas; oracle is a DuckDB recursive CTE of the same fold",
)
def consolidate_proposals_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_builder_views(spark, sf_dir)
    return consolidate_proposals(spark.table("prestage_proposals"))
