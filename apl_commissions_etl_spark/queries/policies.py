"""Policies transform (ref sql/transforms/09-policies.sql:19-115) and
broker licenses with date corrections (ref
sql/transforms/01-brokers.sql:196-260) — SURVEY.md §7.3 #7.

Deterministic deviations: license surrogate Id (global ROW_NUMBER W1)
is replaced by the (broker, state, code) natural key; GETUTCDATE() is
replaced by an explicit as-of date parameter so the transform is
reproducible (callers pass today's date in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.builder_fixtures import (
    builder_cte_sql,
    cert_info,
    register_builder_views,
)
from ..plans.dims_fixtures import dims_cte_sql, register_dim_views
from ..registry import query

#: fixed as-of date standing in for GETUTCDATE() (deterministic runs)
AS_OF = "2026-01-01"
FAR_EXPIRY = "2027-01-01"


@query(
    "dim_policies",
    oracle=f"WITH {builder_cte_sql()},\n"
    + """
    min_seq AS (
      SELECT CertificateId, MIN(CertSplitSeq) AS MinSeq
      FROM input_certificate_info
      WHERE CertificateId > 0 AND TRIM(RecStatus) = 'A'
      GROUP BY CertificateId
    ),
    pol AS (
      SELECT i.CertificateId,
             MAX(i.Company) AS Company,
             MAX(i.ProductMasterCategory) AS PMC,
             MAX(i.ProductCategory) AS PC,
             CASE WHEN MAX(i.GroupId) IS NULL OR TRIM(MAX(i.GroupId)) = ''
                  THEN '00000' ELSE MAX(i.GroupId) END AS GroupId,
             MAX(i.ProductCode) AS Product,
             MAX(i.PlanCode) AS PlanCode,
             MAX(i.CertEffectiveDate) AS CertEffectiveDate,
             MAX(i.SitusState) AS CertIssuedState,
             MAX(i.CertStatus) AS CertStatus,
             MAX(i.CertPremium) AS CertPremium,
             MAX(i.CustomerId) AS CustomerId,
             TRY_CAST(REPLACE(MAX(i.SplitBrokerId), 'P', '') AS BIGINT)
               AS WritingBrokerId
      FROM input_certificate_info i
      JOIN min_seq ms ON ms.CertificateId = i.CertificateId
                     AND i.CertSplitSeq = ms.MinSeq
      WHERE i.CertificateId > 0 AND i.SplitBrokerSeq = 1
        AND TRIM(i.RecStatus) = 'A'
      GROUP BY i.CertificateId
    )
    SELECT CertificateId AS Id,
           CAST(CertificateId AS VARCHAR(50)) AS PolicyNumber,
           CASE TRIM(CertStatus)
                WHEN 'Active' THEN 0 WHEN 'A' THEN 0
                WHEN 'Terminated' THEN 1 WHEN 'T' THEN 1
                WHEN 'Cancelled' THEN 2 WHEN 'C' THEN 2
                WHEN 'L' THEN 3 ELSE 0 END AS Status,
           COALESCE(WritingBrokerId, 0) AS BrokerId,
           'G' || GroupId AS GroupId,
           COALESCE(NULLIF(TRIM(Company), ''), 'APL') AS CarrierName,
           Product AS ProductCode,
           COALESCE(PC, '') || ' - ' || COALESCE(Product, '') AS ProductName,
           PlanCode,
           PMC AS MasterCategory,
           PC AS Category,
           COALESCE(NULLIF(CustomerId, ''),
                    'Insured-' || CAST(CertificateId AS VARCHAR(20)))
             AS InsuredName,
           CAST(COALESCE(TRY_CAST(CertPremium AS DECIMAL(18,2)), 0)
                AS DOUBLE) AS Premium,
           COALESCE(CAST(CertEffectiveDate AS DATE), DATE '2020-01-01')
             AS EffectiveDate,
           CertIssuedState AS State,
           NULLIF(TRIM(CustomerId), '') AS CustomerId
    FROM pol""",
    survey_ref="§7.3 #7 policies: min-active-seq dedup to one policy per "
    "certificate, status mapping, DTC '00000' normalization, G-prefix, "
    "defaults (09-policies.sql:19-115); A1, P2, P6, P7",
)
def dim_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_builder_views(spark, sf_dir)
    i = cert_info(spark, sf_dir)
    active = i.filter((F.col("CertificateId") > 0) & (F.trim("RecStatus") == "A"))
    # min split seq per certificate as a window over the same partition
    # key the aggregation below shuffles on: ONE scan of the fact and
    # ONE exchange (the window's hash partitioning satisfies the
    # groupBy's distribution), vs the reference's derived-table
    # self-join which scans the input twice (09-policies.sql:41-63)
    from pyspark.sql.window import Window as W

    pol = (
        active.withColumn(
            "MinSeq", F.min("CertSplitSeq").over(W.partitionBy("CertificateId"))
        )
        .filter(
            (F.col("SplitBrokerSeq") == 1)
            & (F.col("CertSplitSeq") == F.col("MinSeq"))
        )
        .groupBy("CertificateId")
        .agg(
            F.max("Company").alias("Company"),
            F.max("ProductMasterCategory").alias("PMC"),
            F.max("ProductCategory").alias("PC"),
            F.max("GroupId").alias("GroupIdRaw"),
            F.max("ProductCode").alias("Product"),
            F.max("PlanCode").alias("PlanCode"),
            F.max("CertEffectiveDate").alias("CertEffectiveDate"),
            F.max("SitusState").alias("CertIssuedState"),
            F.max("CertStatus").alias("CertStatus"),
            F.max("CertPremium").alias("CertPremium"),
            F.max("CustomerId").alias("CustomerIdRaw"),
            F.regexp_replace(F.max("SplitBrokerId"), "P", "")
            .try_cast("long")
            .alias("WritingBrokerId"),
        )
    )
    status = (
        F.when(F.trim("CertStatus").isin("Active", "A"), 0)
        .when(F.trim("CertStatus").isin("Terminated", "T"), 1)
        .when(F.trim("CertStatus").isin("Cancelled", "C"), 2)
        .when(F.trim("CertStatus") == "L", 3)
        .otherwise(0)
    )
    group_id = F.when(
        F.col("GroupIdRaw").isNull() | (F.trim("GroupIdRaw") == ""), "00000"
    ).otherwise(F.col("GroupIdRaw"))
    return pol.select(
        F.col("CertificateId").alias("Id"),
        F.col("CertificateId").cast("string").alias("PolicyNumber"),
        status.alias("Status"),
        F.coalesce("WritingBrokerId", F.lit(0)).alias("BrokerId"),
        F.concat(F.lit("G"), group_id).alias("GroupId"),
        F.coalesce(F.nullif(F.trim("Company"), F.lit("")), F.lit("APL")).alias(
            "CarrierName"
        ),
        F.col("Product").alias("ProductCode"),
        F.concat(
            F.coalesce("PC", F.lit("")), F.lit(" - "), F.coalesce("Product", F.lit(""))
        ).alias("ProductName"),
        "PlanCode",
        F.col("PMC").alias("MasterCategory"),
        F.col("PC").alias("Category"),
        F.coalesce(
            F.nullif(F.col("CustomerIdRaw"), F.lit("")),
            F.concat(F.lit("Insured-"), F.col("CertificateId").cast("string")),
        ).alias("InsuredName"),
        F.coalesce(
            F.col("CertPremium").try_cast("decimal(18,2)"), F.lit(0).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("Premium"),
        F.coalesce(
            F.col("CertEffectiveDate").try_cast("date"), F.lit("2020-01-01").cast("date")
        ).alias("EffectiveDate"),
        F.col("CertIssuedState").alias("State"),
        F.nullif(F.trim("CustomerIdRaw"), F.lit("")).alias("CustomerId"),
    )


@query(
    "dim_broker_licenses",
    oracle=f"WITH {dims_cte_sql()}\n"
    + f"""
    SELECT TRY_CAST(REPLACE(PartyUniqueId, 'P', '') AS BIGINT) AS BrokerId,
           StateCode AS State,
           LicenseNumber,
           LicenseCode,
           CASE WHEN CurrentStatus = 'Active' THEN 0
                WHEN CurrentStatus = 'Inactive' THEN 1
                ELSE 2 END AS Status,
           COALESCE(
             TRY_CAST(NULLIF(LicenseEffectiveDate, '') AS TIMESTAMP),
             TRY_CAST(NULLIF(LicenseExpirationDate, '') AS TIMESTAMP),
             TIMESTAMP '{AS_OF} 00:00:00') AS EffectiveDate,
           CASE WHEN CurrentStatus = 'Active'
                     AND (NULLIF(LicenseExpirationDate, '') IS NULL
                          OR TRY_CAST(NULLIF(LicenseExpirationDate, '')
                               AS TIMESTAMP) < TIMESTAMP '{AS_OF} 00:00:00')
                THEN TIMESTAMP '{FAR_EXPIRY} 00:00:00'
                ELSE COALESCE(
                  TRY_CAST(NULLIF(LicenseExpirationDate, '') AS TIMESTAMP),
                  TIMESTAMP '{FAR_EXPIRY} 00:00:00') END AS ExpirationDate,
           CASE WHEN IsResidenceLicense = 'Y' OR IsResidenceLicense = 'true'
                THEN 1 ELSE 0 END AS IsResidentLicense,
           ApplicableCounty
    FROM raw_licenses
    WHERE PartyUniqueId IS NOT NULL AND PartyUniqueId <> ''""",
    survey_ref="§7.3 #7 licenses: date-correction rules (null effective <- "
    "expiration <- as-of; expired-but-Active -> 2027-01-01; trust "
    "CurrentStatus) (01-brokers.sql:196-260); P2/P3/P6; deterministic "
    "as-of replaces GETUTCDATE",
)
def dim_broker_licenses(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_dim_views(spark, sf_dir)
    r = spark.table("raw_licenses").filter(
        F.col("PartyUniqueId").isNotNull() & (F.col("PartyUniqueId") != "")
    )
    as_of = F.lit(AS_OF).cast("timestamp")
    far = F.lit(FAR_EXPIRY).cast("timestamp")
    eff = F.nullif(F.col("LicenseEffectiveDate"), F.lit("")).try_cast("timestamp")
    exp = F.nullif(F.col("LicenseExpirationDate"), F.lit("")).try_cast("timestamp")
    return r.select(
        F.regexp_replace("PartyUniqueId", "P", "").try_cast("long").alias("BrokerId"),
        F.col("StateCode").alias("State"),
        "LicenseNumber",
        "LicenseCode",
        F.when(F.col("CurrentStatus") == "Active", 0)
        .when(F.col("CurrentStatus") == "Inactive", 1)
        .otherwise(2)
        .alias("Status"),
        F.coalesce(eff, exp, as_of).alias("EffectiveDate"),
        F.when(
            (F.col("CurrentStatus") == "Active") & (exp.isNull() | (exp < as_of)),
            far,
        )
        .otherwise(F.coalesce(exp, far))
        .alias("ExpirationDate"),
        F.when(F.col("IsResidenceLicense").isin("Y", "true"), 1)
        .otherwise(0)
        .alias("IsResidentLicense"),
        "ApplicableCounty",
    )


#: slim policies projection shared by the premium backfill (same
#: min-active-seq semantics as dim_policies, only the 3 needed cols)
_POL_SLIM = """
    min_seq AS (
      SELECT CertificateId, MIN(CertSplitSeq) AS MinSeq
      FROM input_certificate_info
      WHERE CertificateId > 0 AND TRIM(RecStatus) = 'A'
      GROUP BY CertificateId
    ),
    pol_slim AS (
      SELECT i.CertificateId AS Id,
             COALESCE(CAST(MAX(i.CertEffectiveDate) AS DATE),
                      DATE '2020-01-01') AS EffectiveDate,
             COALESCE(TRY_CAST(MAX(i.CertPremium) AS DECIMAL(18,2)), 0)
               AS Premium
      FROM input_certificate_info i
      JOIN min_seq ms ON ms.CertificateId = i.CertificateId
                     AND i.CertSplitSeq = ms.MinSeq
      WHERE i.CertificateId > 0 AND i.SplitBrokerSeq = 1
        AND TRIM(i.RecStatus) = 'A'
      GROUP BY i.CertificateId
    )"""


@query(
    "dim_premium_transactions",
    oracle=f"WITH {builder_cte_sql()},\n{dims_cte_sql()},\n{_POL_SLIM},\n"
    + """
    raw_path AS (
      SELECT 'PT-RAW-' || TRIM(Policy) || '-' || DatePost AS Id,
             TRY_CAST(TRIM(Policy) AS BIGINT) AS CertificateId,
             TRY_CAST(DatePost AS DATE) AS TransactionDate,
             CAST(TRY_CAST(Amount AS DECIMAL(18,2)) AS DOUBLE)
               AS PremiumAmount,
             TRY_CAST(DatePaidTo AS DATE) AS BillingPeriodStart,
             CAST(TRY_CAST(DatePaidTo AS DATE) + INTERVAL 1 MONTH AS DATE)
               AS BillingPeriodEnd,
             'raw_premiums' AS SourceSystem
      FROM raw_premiums
      WHERE Policy IS NOT NULL AND TRIM(Policy) <> ''
        AND TRY_CAST(Amount AS DECIMAL(18,2)) IS NOT NULL
    ),
    backfill AS (
      SELECT 'PT-POL-' || CAST(p.Id AS VARCHAR(20)) AS Id,
             p.Id AS CertificateId,
             p.EffectiveDate AS TransactionDate,
             CAST(p.Premium AS DOUBLE) AS PremiumAmount,
             p.EffectiveDate AS BillingPeriodStart,
             CAST(p.EffectiveDate + INTERVAL 1 MONTH AS DATE)
               AS BillingPeriodEnd,
             'stg_policies' AS SourceSystem
      FROM pol_slim p
      WHERE p.Premium > 0
        AND NOT EXISTS (SELECT 1 FROM raw_path r
                        WHERE r.CertificateId = p.Id)
    )
    SELECT * FROM raw_path UNION ALL SELECT * FROM backfill""",
    survey_ref="§7.3 #7 premium transactions: typed facts from "
    "raw_premiums + anti-join backfill from policies without premiums "
    "(10-premium-transactions.sql:20-90); J8/S9; deterministic "
    "source-prefixed ids replace ROW_NUMBER + @offset W6",
)
def dim_premium_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_builder_views(spark, sf_dir)
    register_dim_views(spark, sf_dir)
    raw = spark.table("raw_premiums").filter(
        F.col("Policy").isNotNull()
        & (F.trim("Policy") != "")
        & F.col("Amount").try_cast("decimal(18,2)").isNotNull()
    ).select(
        F.concat(F.lit("PT-RAW-"), F.trim("Policy"), F.lit("-"), "DatePost")
        .alias("Id"),
        F.trim("Policy").try_cast("long").alias("CertificateId"),
        F.col("DatePost").try_cast("date").alias("TransactionDate"),
        F.col("Amount").try_cast("decimal(18,2)").cast("double")
        .alias("PremiumAmount"),
        F.col("DatePaidTo").try_cast("date").alias("BillingPeriodStart"),
        F.add_months(F.col("DatePaidTo").try_cast("date"), 1)
        .alias("BillingPeriodEnd"),
        F.lit("raw_premiums").alias("SourceSystem"),
    )
    pol = dim_policies(spark, sf_dir).select(
        "Id", "EffectiveDate", "Premium"
    )
    covered = raw.select(F.col("CertificateId").alias("Id")).filter(
        F.col("Id").isNotNull()
    ).distinct()
    backfill = (
        pol.filter(F.col("Premium") > 0)
        .join(covered, "Id", "left_anti")
        .select(
            F.concat(F.lit("PT-POL-"), F.col("Id").cast("string")).alias("Id"),
            F.col("Id").alias("CertificateId"),
            F.col("EffectiveDate").alias("TransactionDate"),
            F.col("Premium").alias("PremiumAmount"),
            F.col("EffectiveDate").alias("BillingPeriodStart"),
            F.add_months("EffectiveDate", 1).alias("BillingPeriodEnd"),
            F.lit("stg_policies").alias("SourceSystem"),
        )
    )
    return raw.unionByName(backfill)


@query(
    "dim_eo_insurance",
    oracle=f"WITH {dims_cte_sql()}\n"
    + """
    SELECT TRY_CAST(REPLACE(PartyUniqueId, 'P', '') AS BIGINT) AS BrokerId,
           PolicyId AS PolicyNumber,
           CarrierName AS Carrier,
           CAST(TRY_CAST(NULLIF(DeductibleAmount, '') AS DECIMAL(18,2))
                AS DOUBLE) AS DeductibleAmount,
           CAST(TRY_CAST(NULLIF(ClaimMaxAmount, '') AS DECIMAL(18,2))
                AS DOUBLE) AS ClaimMaxAmount,
           CAST(TRY_CAST(NULLIF(AnnualMaxAmount, '') AS DECIMAL(18,2))
                AS DOUBLE) AS AnnualMaxAmount,
           CAST(TRY_CAST(NULLIF(PolicyMaxAmount, '') AS DECIMAL(18,2))
                AS DOUBLE) AS PolicyMaxAmount,
           CAST(TRY_CAST(NULLIF(LiabilityLimit, '') AS DECIMAL(18,2))
                AS DOUBLE) AS LiabilityLimit,
           TRY_CAST(NULLIF(FromDate, '') AS TIMESTAMP) AS EffectiveDate,
           TRY_CAST(NULLIF(ToDate, '') AS TIMESTAMP) AS ExpirationDate
    FROM raw_eo_insurance
    WHERE PartyUniqueId IS NOT NULL AND PartyUniqueId <> ''""",
    survey_ref="§7.3 #7 broker E&O insurance: typed projection with "
    "P-strip + TRY_CAST amounts ('unlimited' -> null) "
    "(01-brokers.sql:269-302); P2/P3/P7",
)
def dim_eo_insurance(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_dim_views(spark, sf_dir)
    r = spark.table("raw_eo_insurance").filter(
        F.col("PartyUniqueId").isNotNull() & (F.col("PartyUniqueId") != "")
    )
    dec = lambda c: (  # noqa: E731
        F.nullif(F.col(c), F.lit("")).try_cast("decimal(18,2)").cast("double").alias(c)
    )
    return r.select(
        F.regexp_replace("PartyUniqueId", "P", "").try_cast("long").alias("BrokerId"),
        F.col("PolicyId").alias("PolicyNumber"),
        F.col("CarrierName").alias("Carrier"),
        dec("DeductibleAmount"),
        dec("ClaimMaxAmount"),
        dec("AnnualMaxAmount"),
        dec("PolicyMaxAmount"),
        dec("LiabilityLimit"),
        F.nullif(F.col("FromDate"), F.lit("")).try_cast("timestamp")
        .alias("EffectiveDate"),
        F.nullif(F.col("ToDate"), F.lit("")).try_cast("timestamp")
        .alias("ExpirationDate"),
    )


#: far-future cut-off for the grace-period repair. The reference uses
#: 2050-01-01 against production dates; the fixtures' far-expiry
#: sentinel is 2027-01-01, so the engine parameterizes the threshold
#: and the registered query runs it at 2026-06-01 to exercise real rows.
FAR_FUTURE_CUTOFF = "2026-06-01"


@query(
    "fix_far_future_expirations",
    oracle=f"WITH {dims_cte_sql()},\n"
    + f"""
    lic AS (
      SELECT TRY_CAST(REPLACE(PartyUniqueId, 'P', '') AS BIGINT) AS BrokerId,
             StateCode AS State,
             LicenseNumber,
             COALESCE(
               TRY_CAST(NULLIF(LicenseEffectiveDate, '') AS TIMESTAMP),
               TRY_CAST(NULLIF(LicenseExpirationDate, '') AS TIMESTAMP),
               TIMESTAMP '{AS_OF} 00:00:00') AS EffectiveDate,
             CASE WHEN CurrentStatus = 'Active'
                       AND (NULLIF(LicenseExpirationDate, '') IS NULL
                            OR TRY_CAST(NULLIF(LicenseExpirationDate, '')
                                 AS TIMESTAMP) < TIMESTAMP '{AS_OF} 00:00:00')
                  THEN TIMESTAMP '{FAR_EXPIRY} 00:00:00'
                  ELSE COALESCE(
                    TRY_CAST(NULLIF(LicenseExpirationDate, '') AS TIMESTAMP),
                    TIMESTAMP '{FAR_EXPIRY} 00:00:00') END AS ExpirationDate
      FROM raw_licenses
      WHERE PartyUniqueId IS NOT NULL AND PartyUniqueId <> '')
    SELECT BrokerId, State, LicenseNumber,
           CASE WHEN ExpirationDate > TIMESTAMP '{FAR_FUTURE_CUTOFF} 00:00:00'
                THEN EffectiveDate + INTERVAL 30 DAY
                ELSE ExpirationDate END AS ExpirationDate,
           ExpirationDate > TIMESTAMP '{FAR_FUTURE_CUTOFF} 00:00:00'
             AS WasCorrected
    FROM lic""",
    survey_ref="§2 repair transform (scripts/fix-grace-period-dates.ts, "
    "sql/fixes/fix-grace-period-dates.sql:96-125 Bug #36): far-future "
    "expiration dates repaired to EffectiveDate + 30 days (the "
    "reference's fix-2 default; fix-1's GracePeriodDate column is not "
    "modeled by the fixture schema). Threshold parameterized "
    "(reference: 2050-01-01; run here at the fixtures' sentinel "
    "horizon so the rule touches real rows)",
)
def fix_far_future_expirations(spark: SparkSession, sf_dir: str) -> DataFrame:
    lic = dim_broker_licenses(spark, sf_dir)
    cutoff = F.lit(FAR_FUTURE_CUTOFF).cast("timestamp")
    bad = F.col("ExpirationDate") > cutoff
    return lic.select(
        "BrokerId",
        "State",
        "LicenseNumber",
        F.when(bad, F.date_add(F.col("EffectiveDate"), 30).cast("timestamp"))
        .otherwise(F.col("ExpirationDate"))
        .alias("ExpirationDate"),
        bad.alias("WasCorrected"),
    )
