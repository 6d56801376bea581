"""Export-sink semantics as driver-checkable queries (SURVEY.md §2.1
S9/S10: idempotent insert-missing, UPDATE-join, and the true keyed
MERGE sync).

Scenario (shared fixture SQL on both engines): ``prod_proposals`` is
the production table — most staging proposals at an older sync
version, plus production-only rows ('PR-X-…', retired proposals absent
from staging). ``src_proposals`` is the fresh ETL staging output with
bumped broker ids and a new sync note. The three queries are the three
sink shapes the reference runs against that pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.export import merge_upsert, update_join, upsert_missing
from ..plans.fixtures import fixtures_cte_sql, register_fixture_views
from ..registry import query
from ..sources.testdata import load_table

EXPORT_CTES = """
prod_proposals AS (
  SELECT ProposalId, GroupId, LeadBrokerId, EffectiveDateFrom,
         EffectiveDateTo, 'prod-v1' AS SyncNote
  FROM stg_proposals WHERE GroupKey % 5 <> 2
  UNION ALL
  SELECT 'PR-X-' || CAST(c_custkey AS VARCHAR(20)),
         'G' || CAST(c_custkey AS VARCHAR(20)),
         c_nationkey, DATE '1990-01-01', DATE '1991-01-01', 'prod-only'
  FROM customer WHERE c_custkey % 20 = 13
),
src_proposals AS (
  SELECT ProposalId, GroupId, LeadBrokerId + 1 AS LeadBrokerId,
         EffectiveDateFrom, EffectiveDateTo, 'etl-v2' AS SyncNote
  FROM stg_proposals
)
"""


def _oracle(final_select: str) -> str:
    return f"WITH {fixtures_cte_sql()},\n{EXPORT_CTES}\n{final_select}"


def _frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    register_fixture_views(spark, sf_dir)
    prod = spark.sql("""
        SELECT ProposalId, GroupId, LeadBrokerId, EffectiveDateFrom,
               EffectiveDateTo, 'prod-v1' AS SyncNote
        FROM stg_proposals WHERE GroupKey % 5 <> 2
        UNION ALL
        SELECT 'PR-X-' || CAST(c_custkey AS VARCHAR(20)),
               'G' || CAST(c_custkey AS VARCHAR(20)),
               c_nationkey, DATE '1990-01-01', DATE '1991-01-01', 'prod-only'
        FROM customer WHERE c_custkey % 20 = 13
    """)
    src = spark.sql("""
        SELECT ProposalId, GroupId, LeadBrokerId + 1 AS LeadBrokerId,
               EffectiveDateFrom, EffectiveDateTo, 'etl-v2' AS SyncNote
        FROM stg_proposals
    """)
    return prod, src


@query(
    "export_upsert_missing",
    oracle=_oracle("""
    SELECT s.* FROM src_proposals s
    WHERE NOT EXISTS (SELECT 1 FROM prod_proposals t
                      WHERE t.ProposalId = s.ProposalId)"""),
    survey_ref="§2.1 S9 idempotent export: append-only anti-join — "
    "staging rows whose key is absent from production "
    "(07-export-proposals.sql:57, 05-export-groups.sql:11-38)",
)
def export_upsert_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    prod, src = _frames(spark, sf_dir)
    return upsert_missing(src, prod, ["ProposalId"])


@query(
    "export_update_join",
    oracle=_oracle("""
    SELECT t.ProposalId, t.GroupId,
           CASE WHEN s.ProposalId IS NOT NULL THEN s.LeadBrokerId
                ELSE t.LeadBrokerId END AS LeadBrokerId,
           t.EffectiveDateFrom, t.EffectiveDateTo,
           CASE WHEN s.ProposalId IS NOT NULL THEN 'ETL-KeyMapping'
                ELSE t.SyncNote END AS SyncNote
    FROM prod_proposals t
    LEFT JOIN src_proposals s ON t.ProposalId = s.ProposalId"""),
    survey_ref="§2.1 S10 UPDATE-join enrichment: recompute columns via "
    "left join, unmatched rows keep their values "
    "(09-policies.sql:128-137)",
)
def export_update_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    prod, src = _frames(spark, sf_dir)
    upd = src.select(
        "ProposalId",
        F.col("LeadBrokerId").alias("src_LeadBrokerId"),
        F.lit(1).alias("src_matched"),
    )
    matched = F.col("src_matched") == 1
    return update_join(
        prod,
        upd,
        ["ProposalId"],
        {
            "LeadBrokerId": F.when(matched, F.col("src_LeadBrokerId")).otherwise(
                F.col("LeadBrokerId")
            ),
            "SyncNote": F.when(matched, F.lit("ETL-KeyMapping")).otherwise(
                F.col("SyncNote")
            ),
        },
    )


@query(
    "export_merge_upsert",
    oracle=_oracle("""
    SELECT CASE WHEN t.ProposalId IS NULL THEN s.ProposalId
                ELSE t.ProposalId END AS ProposalId,
           CASE WHEN t.ProposalId IS NULL THEN s.GroupId
                ELSE t.GroupId END AS GroupId,
           CASE WHEN s.ProposalId IS NOT NULL THEN s.LeadBrokerId
                ELSE t.LeadBrokerId END AS LeadBrokerId,
           CASE WHEN t.ProposalId IS NULL THEN s.EffectiveDateFrom
                ELSE t.EffectiveDateFrom END AS EffectiveDateFrom,
           CASE WHEN t.ProposalId IS NULL THEN s.EffectiveDateTo
                ELSE t.EffectiveDateTo END AS EffectiveDateTo,
           CASE WHEN s.ProposalId IS NOT NULL THEN s.SyncNote
                ELSE t.SyncNote END AS SyncNote
    FROM prod_proposals t
    FULL OUTER JOIN src_proposals s ON t.ProposalId = s.ProposalId"""),
    survey_ref="§2.1 S10 true form: keyed MERGE sync — update-matched "
    "(bumped broker + sync note), insert-unmatched, production-only "
    "rows persist (07-export-proposals.sql:57 + 09-policies.sql:128-137"
    " combined; Delta/Iceberg MERGE INTO equivalent on immutable "
    "storage)",
)
def export_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    prod, src = _frames(spark, sf_dir)
    return merge_upsert(
        prod, src, ["ProposalId"], update_cols=["LeadBrokerId", "SyncNote"]
    )


# ---------------------------------------------------------------------------
# 18/19: schedule-rate-tier + hierarchy-product-rate export entities
# (ref sql/export/18-export-schedule-rate-tiers.sql:60-90,
#  sql/export/19-export-hierarchy-product-rates.sql:59-89).
# Shared verbatim Spark/DuckDB: tier/product-rate staging derived from
# the schedule-rate fixture; "production" subsets exercise the EXISTS
# gate, the NOT-IN dedup, and the skipped-record report.
# ---------------------------------------------------------------------------

RATE_TIER_CTES = """
stg_schedule_rate_tiers AS (
  SELECT 'SRT-' || ScheduleCode || '-' || ProductCode || '-'
           || CAST(GroupSizeFrom AS VARCHAR(10)) AS Id,
         ScheduleCode || '-' || ProductCode AS ScheduleRateId,
         GroupSizeFrom AS MinVolume,
         CASE WHEN GroupSizeTo >= 100 THEN CAST(NULL AS INT)
              ELSE GroupSizeTo END AS MaxVolume,
         FirstYearRate AS Rate, FirstYearRate, RenewalRate
  FROM stg_schedule_rates
),
prod_schedule_rates AS (
  SELECT DISTINCT ScheduleCode || '-' || ProductCode AS Id
  FROM stg_schedule_rates WHERE ScheduleCode <> 'SCH-2'
),
prod_schedule_rate_tiers AS (
  SELECT * FROM stg_schedule_rate_tiers
  WHERE MinVolume = 1 AND ScheduleRateId LIKE 'SCH-0-%'
),
stg_hierarchy_product_rates AS (
  SELECT 'HPPR-' || hp.HierarchyParticipantId || '-' || sr.ProductCode
           AS Id,
         hp.HierarchyParticipantId,
         sr.ProductCode,
         sr.FirstYearRate,
         sr.RenewalRate,
         CASE WHEN hp.EntityId % 5 = 0 THEN CAST(NULL AS DATE)
              ELSE DATE '2019-01-01' END AS RawEffectiveFrom,
         CAST(NULL AS DATE) AS EffectiveTo,
         'ETL hierarchy product rate' AS Notes,
         hp.EntityId
  FROM stg_hierarchy_participants hp
  JOIN stg_schedule_rates sr
    ON sr.ScheduleCode = hp.ScheduleCode AND sr.GroupSizeFrom = 1
),
prod_hierarchy_participants AS (
  SELECT HierarchyParticipantId FROM stg_hierarchy_participants
  WHERE EntityId % 4 <> 1
),
prod_hierarchy_product_rates AS (
  SELECT Id FROM stg_hierarchy_product_rates WHERE EntityId % 8 = 0
)
"""

_TIER_EXPORT_SQL = """
SELECT t.Id, t.ScheduleRateId, t.MinVolume, t.MaxVolume, t.Rate,
       t.FirstYearRate, t.RenewalRate, 0 AS IsDeleted
FROM stg_schedule_rate_tiers t
WHERE EXISTS (SELECT 1 FROM prod_schedule_rates r
              WHERE r.Id = t.ScheduleRateId)
  AND t.Id NOT IN (SELECT Id FROM prod_schedule_rate_tiers)"""

_TIER_SUMMARY_SQL = """
SELECT CASE WHEN MaxVolume IS NULL
            THEN CAST(MinVolume AS VARCHAR(10)) || '+'
            ELSE CAST(MinVolume AS VARCHAR(10)) || '-'
                 || CAST(MaxVolume AS VARCHAR(10)) END AS VolumeRange,
       CAST(COUNT(*) AS INT) AS Cnt,
       CAST(AVG(CAST(Rate AS DOUBLE)) AS DOUBLE) AS AvgRate
FROM (
  SELECT MinVolume, MaxVolume, Rate FROM prod_schedule_rate_tiers
  UNION ALL
  SELECT t.MinVolume, t.MaxVolume, t.Rate
  FROM stg_schedule_rate_tiers t
  WHERE EXISTS (SELECT 1 FROM prod_schedule_rates r
                WHERE r.Id = t.ScheduleRateId)
    AND t.Id NOT IN (SELECT Id FROM prod_schedule_rate_tiers)
) after_export
GROUP BY CASE WHEN MaxVolume IS NULL
              THEN CAST(MinVolume AS VARCHAR(10)) || '+'
              ELSE CAST(MinVolume AS VARCHAR(10)) || '-'
                   || CAST(MaxVolume AS VARCHAR(10)) END"""

_HPPR_EXPORT_SQL = """
SELECT r.Id, r.HierarchyParticipantId, r.ProductCode, r.FirstYearRate,
       r.RenewalRate,
       COALESCE(r.RawEffectiveFrom, DATE '0001-01-01') AS EffectiveFrom,
       r.EffectiveTo, r.Notes, 0 AS IsDeleted
FROM stg_hierarchy_product_rates r
WHERE EXISTS (SELECT 1 FROM prod_hierarchy_participants hp
              WHERE hp.HierarchyParticipantId = r.HierarchyParticipantId)
  AND r.Id NOT IN (SELECT Id FROM prod_hierarchy_product_rates)"""


def _tier_oracle(final_select: str) -> str:
    return f"WITH {fixtures_cte_sql()},\n{RATE_TIER_CTES}\n{final_select}"


def _tier_spark(spark: SparkSession, sf_dir: str, final_select: str) -> DataFrame:
    register_fixture_views(spark, sf_dir)
    return spark.sql(f"WITH {RATE_TIER_CTES}\n{final_select}")


@query(
    "export_schedule_rate_tiers",
    oracle=_tier_oracle(_TIER_EXPORT_SQL),
    survey_ref="§2 export entity 18: group-size tiered rates — EXISTS "
    "production-rate gate + NOT-IN idempotent dedup "
    "(18-export-schedule-rate-tiers.sql:60-90)",
)
def export_schedule_rate_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tier_spark(spark, sf_dir, _TIER_EXPORT_SQL)


@query(
    "export_rate_tier_volume_summary",
    oracle=_tier_oracle(_TIER_SUMMARY_SQL),
    survey_ref="§2 export entity 18 verification: post-export tier "
    "counts + avg rate banded by volume range with open-ended 'N+' "
    "label (18-export-schedule-rate-tiers.sql:135-151)",
)
def export_rate_tier_volume_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _tier_spark(spark, sf_dir, _TIER_SUMMARY_SQL)


@query(
    "export_hierarchy_product_rates",
    oracle=_tier_oracle(_HPPR_EXPORT_SQL),
    survey_ref="§2 export entity 19: per-(participant, product) "
    "commission rates — EXISTS participant gate, NOT-IN dedup, "
    "sentinel 0001-01-01 EffectiveFrom coalesce "
    "(19-export-hierarchy-product-rates.sql:59-89)",
)
def export_hierarchy_product_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _tier_spark(spark, sf_dir, _HPPR_EXPORT_SQL)


@query(
    "export_blob_staged",
    oracle="""
    SELECT CAST(o_orderkey % 8 AS INT) AS bucket,
           COUNT(*) AS n_rows,
           md5(array_to_string(list_sort(list(o_orderkey)), ','))
             AS keys_digest
    FROM orders
    GROUP BY 1
    """,
    survey_ref="§2.1 S6 blob staging: bucketed parquet stage + read-back "
    "load manifest (per-bucket count + key digest) — the Azure-Blob "
    "BULK INSERT flow (proposal-builder.ts:415-423,2166-2199) on "
    "immutable storage; manifest is data-deterministic so the oracle "
    "verifies the round-trip without seeing the filesystem",
)
def export_blob_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages the orders table under the engine's scratch dir and
    returns the manifest built from the FILES READ BACK (a failed or
    partial write would change the digest)."""
    import os
    import tempfile

    from ..sources.testdata import load_table
    from ..operators.export import blob_stage

    o = load_table(spark, sf_dir, "orders")
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_blob_stage_{spark.sparkContext.applicationId}",
    )
    return blob_stage(o, path, "o_orderkey", n_buckets=8)


@query(
    "export_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 89 = 0
                  THEN o_totalprice + 1.0 ELSE o_totalprice END
               AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0)
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_orderkey IS NULL THEN 'added'
                ELSE 'changed' END AS change_type,
           a.o_totalprice AS old_price,
           b.o_totalprice AS new_price
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE b.o_orderkey IS NULL
       OR a.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice
       OR a.o_orderstatus <> b.o_orderstatus
    """,
    survey_ref="export surface: keyed snapshot diff — added / removed "
    "/ changed rows between two table versions via one full outer "
    "join on the key (the verification step the reference's "
    "export-with-verification.ts performs with per-table count "
    "queries, upgraded to row-level). Snapshot B is a deterministic "
    "mutation of A (drop o_orderkey%97, bump price on %89) so the "
    "diff itself is value-hash-checkable. At scale both snapshots "
    "bucket by the key and the join is co-partitioned",
)
def export_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    b = o.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    an = a.select(
        F.col("o_orderkey").alias("ak"),
        F.col("o_orderstatus").alias("a_status"),
        F.col("o_totalprice").alias("old_price"),
    )
    bn = b.select(
        F.col("o_orderkey").alias("bk"),
        F.col("o_orderstatus").alias("b_status"),
        F.col("o_totalprice").alias("new_price"),
    )
    j = an.join(bn, an.ak == bn.bk, "full_outer")
    return j.filter(
        F.col("bk").isNull()
        | F.col("ak").isNull()
        | (F.col("old_price") != F.col("new_price"))
        | (F.col("a_status") != F.col("b_status"))
    ).select(
        F.coalesce("ak", "bk").alias("o_orderkey"),
        F.when(F.col("bk").isNull(), "removed")
        .when(F.col("ak").isNull(), "added")
        .otherwise("changed")
        .alias("change_type"),
        "old_price",
        "new_price",
    )
