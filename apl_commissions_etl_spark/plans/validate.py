"""Statistical sampling validation (SURVEY.md §5 item 2; ref
scripts/validate-certificate-resolution.ts:104-196).

The reference stratifies certificates into scenarios (Single Split /
Multi Split / Complex Hierarchy / DTC / Standard), samples each
stratum, re-derives every sampled certificate's proposal resolution
from the raw input, and requires a >=95% match rate.

Here: deterministic stratified sampling (hash-ordered top-n per
stratum — reproducible, unlike ORDER BY NEWID()), and the re-derivation
goes through SPARK SQL TEXT — a genuinely different code path from the
DataFrame-API builder — so a bug in either path breaks the match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .builder import invalid_group, selection_criteria
from .builder_fixtures import register_builder_views

#: independent re-derivation of the per-certificate config hash, in
#: SQL text (mirrors proposal-builder.ts:665-714 semantics)
REDERIVE_SQL = """
WITH per_split AS (
  SELECT GroupId, CertificateId, CertSplitSeq, CertSplitPercent,
         sha2('HIER|' || GroupId || '|'
              || CAST(CertSplitPercent AS STRING) || '|'
              || array_join(transform(
                   array_sort(collect_list(struct(SplitBrokerSeq,
                                                  SplitBrokerId,
                                                  ScheduleCode))),
                   t -> concat_ws(':', CAST(t.SplitBrokerSeq AS STRING),
                                  t.SplitBrokerId, t.ScheduleCode)), ';'),
              256) AS HierarchyHash
  FROM input_certificate_info
  GROUP BY GroupId, CertificateId, CertSplitSeq, CertSplitPercent
)
SELECT GroupId, CertificateId,
       sha2('CFG|' || array_join(transform(
              array_sort(collect_list(struct(CertSplitSeq, CertSplitPercent,
                                             HierarchyHash))),
              s -> concat_ws('@', CAST(s.CertSplitPercent AS STRING),
                             s.HierarchyHash)), ';'), 256) AS RederivedHash
FROM per_split
GROUP BY GroupId, CertificateId
"""


def stratify(criteria: DataFrame) -> DataFrame:
    """Scenario assignment per certificate (ref strata,
    validate-certificate-resolution.ts:104-130)."""
    scenario = (
        F.when(invalid_group(F.col("GroupId")), "DTC")
        .when(F.col("TotalSplitPercent") != 100, "NonConformant")
        .when(F.col("SplitCount") > 1, "MultiSplit")
        .otherwise("SingleSplit")
    )
    return criteria.withColumn("Scenario", scenario)


def sample_stratified(
    criteria: DataFrame, n_per_scenario: int = 20
) -> DataFrame:
    """Deterministic stratified sample: top-n per scenario by a hash
    of the certificate id (reproducible across runs/partitions; the
    reference's ORDER BY NEWID() is not)."""
    w = Window.partitionBy("Scenario").orderBy(
        F.sha2(F.concat(F.lit("sample:"), F.col("CertificateId").cast("string")), 256)
    )
    return (
        stratify(criteria)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_per_scenario)
        .drop("rn")
    )


def validate_sample(
    spark: SparkSession, sf_dir: str, n_per_scenario: int = 20
) -> dict[str, tuple[int, int]]:
    """Re-derive sampled certificates' config hashes via SQL text and
    compare to the DataFrame-API builder. Returns
    {scenario: (matched, sampled)}."""
    register_builder_views(spark, sf_dir)
    certs = spark.table("input_certificate_info")
    sampled = sample_stratified(selection_criteria(certs), n_per_scenario)
    rederived = spark.sql(REDERIVE_SQL)
    joined = sampled.join(rederived, ["GroupId", "CertificateId"], "left")
    rows = (
        joined.groupBy("Scenario")
        .agg(
            F.sum(
                (F.col("ConfigHash") == F.col("RederivedHash")).cast("int")
            ).alias("matched"),
            F.count(F.lit(1)).alias("sampled"),
        )
        .collect()
    )
    return {r["Scenario"]: (r["matched"], r["sampled"]) for r in rows}
