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
