"""Broker-attribute reporting views (ref sql/reporting/
create-reporting-schema.sql views 2-4 and 6-8) — the remaining
reference report surface over the broker master and its attribute
entities (licenses, E&O insurance, appointment dates).

Reference parity map (view number -> query):
  2  Brokers                      -> report_brokers
  3  BrokerEOInsurances           -> report_broker_eo_insurances
  4  BrokerLicenses               -> report_broker_licenses
  6  EarningBrokersWithLicenses   -> report_earning_brokers_licenses
  7  EarningBrokersWithEO         -> report_earning_brokers_eo
  8  EarningBrokersWithAppointments -> report_earning_brokers_appointments

Fixture mapping notes:
- The reference's views 6-8 join reporting.EarningBrokers (GL-derived)
  against dbo.BrokerLicenses / dbo.BrokerEOInsurances. In this repo the
  GL fixture universe (calc staging) and the broker-party universe
  (raw_* dims) are disjoint key spaces, so the earnings base here is
  the FEE earnings aggregate over the same party universe — identical
  view shape (base agg -> LEFT JOIN attribute entity -> expiry CASE),
  and the joins produce both real matches and real null rows, which a
  degenerate cross-universe join would not.
- GETDATE()-relative expiry classification uses fixed AS_OF constants
  chosen so every CASE branch (Expired / Expiring Soon / Active /
  No E&O On File) is exercised by the planted fixture dates;
  production callers pass today's date.

Scale notes: the broker master and every attribute entity are
dim-scale (thousands to low millions of rows at 100 TB corpus scale),
so every join here broadcasts; the only aggregation is the fee
rollup, one combinable groupBy on BrokerId.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.dims_fixtures import dims_cte_sql
from ..registry import query
from .dims import (
    BROKERS_DIM_CTES,
    EO_STG_CTE,
    FEES_STG_CTE,
    LICENSES_STG_CTE,
    _views,
    brokers_dim_cached,
    eo_stg_cached,
    fees_classified_cached,
    lic_stg_cached,
)

#: fixed stand-ins for GETDATE() in the expiry classifications —
#: chosen so the planted fixture dates hit all CASE branches
LIC_AS_OF = "2025-05-15"  # license expirations span 2000..2025-06-01
EO_AS_OF = "2026-03-15"  # E&O ToDates span 2001..2026-04-01
FEE_AS_OF = "2019-06-01"  # fee EffectiveDates span 2010..2019
FEE_WINDOW_FROM = "2019-03-01"  # FEE_AS_OF - 3 months


def _oracle(final_select: str) -> str:
    return (
        f"WITH {dims_cte_sql()},\n{BROKERS_DIM_CTES},\n"
        f"{LICENSES_STG_CTE},\n{EO_STG_CTE},\n{FEES_STG_CTE}\n{final_select}"
    )


def _expiry_case_sql(col: str, as_of: str) -> str:
    return f"""CASE
        WHEN {col} < TIMESTAMP '{as_of}' THEN 'Expired'
        WHEN {col} < TIMESTAMP '{as_of}' + INTERVAL 30 DAY
          THEN 'Expiring Soon'
        ELSE 'Active' END"""


def _expiry_case(col: F.Column, as_of: str) -> F.Column:
    ts = F.lit(as_of).cast("timestamp")
    soon = F.lit(as_of).cast("timestamp") + F.expr("INTERVAL 30 DAY")
    return (
        F.when(col < ts, "Expired")
        .when(col < soon, "Expiring Soon")
        .otherwise("Active")
    )


# ---------------------------------------------------------------------------
# View 2: Brokers master (create-reporting-schema.sql:73-117)
# ---------------------------------------------------------------------------

_STATUS_CODE_SQL = """CASE Status WHEN 'Active' THEN 1
        WHEN 'Inactive' THEN 2 WHEN 'Terminated' THEN 3
        WHEN 'TerminatedResiduals' THEN 4 ELSE 0 END"""

_STATUS_NAME_SQL = f"""CASE {_STATUS_CODE_SQL}
        WHEN 0 THEN 'Pending' WHEN 1 THEN 'Active' WHEN 2 THEN 'Inactive'
        WHEN 3 THEN 'Terminated' WHEN 4 THEN 'TerminatedResiduals'
        ELSE 'Unknown' END"""


@query(
    "report_brokers",
    oracle=_oracle(f"""
    SELECT Id AS BrokerId,
           ExternalPartyId,
           Name AS BrokerName,
           Email,
           HireDate,
           CAST({_STATUS_CODE_SQL} AS INT) AS Status,
           {_STATUS_NAME_SQL} AS StatusName,
           CAST(CASE BrokerType WHEN 'Individual' THEN 0
                WHEN 'Organization' THEN 1 ELSE 2 END AS INT) AS Type,
           CASE CASE BrokerType WHEN 'Individual' THEN 0
                WHEN 'Organization' THEN 1 ELSE 2 END
                WHEN 0 THEN 'Individual' WHEN 1 THEN 'Organization'
                ELSE 'Unknown' END AS TypeName
    FROM brokers_dim
    WHERE Id IS NOT NULL"""),
    survey_ref="reporting view 2 Brokers (create-reporting-schema.sql:"
    "73-117): broker master projection with the int-code -> name decode "
    "CASE maps for Status and Type (the decode extended with the "
    "residuals status the dim actually carries); the IsDeleted=0 gate "
    "maps to dropping rows whose id normalization failed",
)
def report_brokers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    b = brokers_dim_cached(spark, sf_dir).filter(F.col("Id").isNotNull())
    status_code = (
        F.when(F.col("Status") == "Active", 1)
        .when(F.col("Status") == "Inactive", 2)
        .when(F.col("Status") == "Terminated", 3)
        .when(F.col("Status") == "TerminatedResiduals", 4)
        .otherwise(0)
    )
    type_code = (
        F.when(F.col("BrokerType") == "Individual", 0)
        .when(F.col("BrokerType") == "Organization", 1)
        .otherwise(2)
    )
    return b.select(
        F.col("Id").alias("BrokerId"),
        "ExternalPartyId",
        F.col("Name").alias("BrokerName"),
        "Email",
        "HireDate",
        status_code.cast("int").alias("Status"),
        F.when(status_code == 0, "Pending")
        .when(status_code == 1, "Active")
        .when(status_code == 2, "Inactive")
        .when(status_code == 3, "Terminated")
        .when(status_code == 4, "TerminatedResiduals")
        .otherwise("Unknown")
        .alias("StatusName"),
        type_code.cast("int").alias("Type"),
        F.when(type_code == 0, "Individual")
        .when(type_code == 1, "Organization")
        .otherwise("Unknown")
        .alias("TypeName"),
    )


# ---------------------------------------------------------------------------
# View 3: BrokerEOInsurances (create-reporting-schema.sql:126-151)
# ---------------------------------------------------------------------------


@query(
    "report_broker_eo_insurances",
    oracle=_oracle(f"""
    SELECT eo.Id AS EOInsuranceId,
           eo.BrokerId,
           b.Name AS BrokerName,
           b.ExternalPartyId AS BrokerExternalId,
           eo.Carrier AS InsuranceCompany,
           eo.PolicyNumber,
           eo.CoverageAmount,
           eo.MinimumRequired,
           eo.DeductibleAmount,
           eo.EffectiveDate,
           eo.ExpirationDate,
           eo.Status,
           {_expiry_case_sql('eo.ExpirationDate', EO_AS_OF)}
             AS EOStatusCalculated
    FROM eo_stg eo
    JOIN brokers_dim b ON b.Id = eo.BrokerId"""),
    survey_ref="reporting view 3 BrokerEOInsurances (create-reporting-"
    "schema.sql:126-151): E&O detail rows inner-joined to the broker "
    "master, with the GETDATE()-relative Expired / Expiring Soon / "
    "Active classification against a fixed AS_OF (both engines do pure "
    "timestamp comparison, null expiry falls to the Active ELSE as in "
    "the reference)",
)
def report_broker_eo_insurances(spark: SparkSession, sf_dir: str) -> DataFrame:
    eo = eo_stg_cached(spark, sf_dir)
    b = brokers_dim_cached(spark, sf_dir).select(
        F.col("Id").alias("BrokerId"),
        F.col("Name").alias("BrokerName"),
        F.col("ExternalPartyId").alias("BrokerExternalId"),
    )
    return eo.join(F.broadcast(b), "BrokerId").select(
        F.col("Id").alias("EOInsuranceId"),
        "BrokerId",
        "BrokerName",
        "BrokerExternalId",
        F.col("Carrier").alias("InsuranceCompany"),
        "PolicyNumber",
        "CoverageAmount",
        "MinimumRequired",
        "DeductibleAmount",
        "EffectiveDate",
        "ExpirationDate",
        "Status",
        _expiry_case(F.col("ExpirationDate"), EO_AS_OF).alias(
            "EOStatusCalculated"
        ),
    )


# ---------------------------------------------------------------------------
# View 4: BrokerLicenses (create-reporting-schema.sql:159-183)
# ---------------------------------------------------------------------------


@query(
    "report_broker_licenses",
    oracle=_oracle(f"""
    SELECT l.Id AS LicenseId,
           l.BrokerId,
           b.Name AS BrokerName,
           b.ExternalPartyId AS BrokerExternalId,
           l.LicenseState,
           l.LicenseNumber,
           l.LicType AS LicenseType,
           l.EffectiveDate,
           l.ExpirationDate,
           {_expiry_case_sql('l.ExpirationDate', LIC_AS_OF)}
             AS LicenseStatus
    FROM lic_stg l
    JOIN brokers_dim b ON b.Id = l.BrokerId"""),
    survey_ref="reporting view 4 BrokerLicenses (create-reporting-"
    "schema.sql:159-183): license detail rows inner-joined to the "
    "broker master with the 30-day Expired / Expiring Soon / Active "
    "banding; the fixture's 2000-2025 expirations + nulls exercise "
    "every branch at the fixed AS_OF",
)
def report_broker_licenses(spark: SparkSession, sf_dir: str) -> DataFrame:
    lic = lic_stg_cached(spark, sf_dir)
    b = brokers_dim_cached(spark, sf_dir).select(
        F.col("Id").alias("BrokerId"),
        F.col("Name").alias("BrokerName"),
        F.col("ExternalPartyId").alias("BrokerExternalId"),
    )
    return lic.join(F.broadcast(b), "BrokerId").select(
        F.col("Id").alias("LicenseId"),
        "BrokerId",
        "BrokerName",
        "BrokerExternalId",
        "LicenseState",
        "LicenseNumber",
        F.col("LicType").alias("LicenseType"),
        "EffectiveDate",
        "ExpirationDate",
        _expiry_case(F.col("ExpirationDate"), LIC_AS_OF).alias(
            "LicenseStatus"
        ),
    )


# ---------------------------------------------------------------------------
# Views 6-8: earning brokers x attribute entities. Earnings base =
# the per-broker fee rollup over the same party universe (see module
# docstring); its shape mirrors reporting.EarningBrokers exactly.
# ---------------------------------------------------------------------------

_FEE_EARN_CTE = f"""fee_earn AS (
  SELECT f.RecipientBrokerId AS BrokerId,
         b.Name AS BrokerName,
         b.Status AS BrokerStatus,
         b.BrokerType,
         b.HireDate,
         MAX(f.EffectiveDate) AS DateMostRecentFee,
         CAST(SUM(CASE WHEN f.EffectiveDate >= TIMESTAMP '{FEE_WINDOW_FROM}'
                       THEN CAST(COALESCE(f.Amount, 0) AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           AS FeesLast3Months,
         CAST(SUM(CAST(COALESCE(f.Amount, 0) AS DECIMAL(18,2))) AS DOUBLE)
           AS TotalFees,
         CAST(COUNT(CASE WHEN f.EffectiveDate >= TIMESTAMP
                              '{FEE_WINDOW_FROM}' THEN 1 END) AS BIGINT)
           AS FeeCountLast3Months
  FROM fees_stg f
  JOIN brokers_dim b ON b.Id = f.RecipientBrokerId
  GROUP BY f.RecipientBrokerId, b.Name, b.Status, b.BrokerType, b.HireDate)"""


def _fee_earning_brokers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-broker fee earnings joined to the broker master — the
    view-1-shaped base that views 6-8 extend (exact DECIMAL sums,
    DOUBLE only at the edge)."""
    fees = fees_classified_cached(spark, sf_dir).filter(
        F.col("RecipientBrokerId").isNotNull()
    )
    b = brokers_dim_cached(spark, sf_dir).select(
        F.col("Id").alias("BrokerId"),
        F.col("Name").alias("BrokerName"),
        F.col("Status").alias("BrokerStatus"),
        "BrokerType",
        "HireDate",
    )
    recent = F.col("EffectiveDate") >= F.lit(FEE_WINDOW_FROM).cast("timestamp")
    amt = F.coalesce(F.col("Amount"), F.lit(0.0)).cast("decimal(18,2)")
    return (
        fees.withColumnRenamed("RecipientBrokerId", "BrokerId")
        .join(F.broadcast(b), "BrokerId")
        .groupBy("BrokerId", "BrokerName", "BrokerStatus", "BrokerType", "HireDate")
        .agg(
            F.max("EffectiveDate").alias("DateMostRecentFee"),
            F.sum(F.when(recent, amt).otherwise(F.lit(0).cast("decimal(18,2)")))
            .cast("double")
            .alias("FeesLast3Months"),
            F.sum(amt).cast("double").alias("TotalFees"),
            F.count(F.when(recent, F.lit(1))).alias("FeeCountLast3Months"),
        )
    )


_EB_COLS_SQL = """eb.BrokerId, eb.BrokerName, eb.BrokerStatus,
           eb.BrokerType, eb.DateMostRecentFee, eb.FeesLast3Months,
           eb.TotalFees"""


@query(
    "report_earning_brokers_licenses",
    oracle=_oracle(f"""
    , {_FEE_EARN_CTE.strip()}
    SELECT {_EB_COLS_SQL},
           l.LicenseState,
           l.LicenseNumber,
           l.LicType AS LicenseType,
           l.EffectiveDate AS LicenseEffectiveDate,
           l.ExpirationDate AS LicenseExpirationDate,
           {_expiry_case_sql('l.ExpirationDate', LIC_AS_OF)}
             AS LicenseStatus
    FROM fee_earn eb
    LEFT JOIN lic_stg l ON l.BrokerId = eb.BrokerId"""),
    survey_ref="reporting view 6 EarningBrokersWithLicenses (create-"
    "reporting-schema.sql:228-256): the earnings base LEFT-joined to "
    "every license row (1:N fan-out as in the reference) with the "
    "30-day expiry banding; unlicensed earners surface with null "
    "license columns and the ELSE 'Active' branch, exactly the "
    "reference's null-comparison behavior",
)
def report_earning_brokers_licenses(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    eb = _fee_earning_brokers(spark, sf_dir)
    lic = lic_stg_cached(spark, sf_dir).select(
        "BrokerId",
        "LicenseState",
        "LicenseNumber",
        F.col("LicType").alias("LicenseType"),
        F.col("EffectiveDate").alias("LicenseEffectiveDate"),
        F.col("ExpirationDate").alias("LicenseExpirationDate"),
    )
    return eb.drop("HireDate", "FeeCountLast3Months").join(
        F.broadcast(lic), "BrokerId", "left"
    ).select(
        "BrokerId",
        "BrokerName",
        "BrokerStatus",
        "BrokerType",
        "DateMostRecentFee",
        "FeesLast3Months",
        "TotalFees",
        "LicenseState",
        "LicenseNumber",
        "LicenseType",
        "LicenseEffectiveDate",
        "LicenseExpirationDate",
        _expiry_case(F.col("LicenseExpirationDate"), LIC_AS_OF).alias(
            "LicenseStatus"
        ),
    )


@query(
    "report_earning_brokers_eo",
    oracle=_oracle(f"""
    , {_FEE_EARN_CTE.strip()}
    SELECT {_EB_COLS_SQL},
           eo.Carrier AS InsuranceCompany,
           eo.PolicyNumber AS EOPolicyNumber,
           eo.CoverageAmount AS EOCoverageAmount,
           eo.EffectiveDate AS EOEffectiveDate,
           eo.ExpirationDate AS EOExpirationDate,
           CASE
             WHEN eo.ExpirationDate < TIMESTAMP '{EO_AS_OF}' THEN 'Expired'
             WHEN eo.ExpirationDate < TIMESTAMP '{EO_AS_OF}'
                  + INTERVAL 30 DAY THEN 'Expiring Soon'
             WHEN eo.Id IS NULL THEN 'No E&O On File'
             ELSE 'Active' END AS EOStatus
    FROM fee_earn eb
    LEFT JOIN eo_stg eo ON eo.BrokerId = eb.BrokerId"""),
    survey_ref="reporting view 7 EarningBrokersWithEO (create-"
    "reporting-schema.sql:264-294): earnings base LEFT-joined to E&O "
    "rows; the reference's 4-branch CASE is mirrored in ORDER "
    "(Expired, Expiring Soon, THEN the eo.Id IS NULL 'No E&O On File' "
    "branch, else Active) so null-expiry matched rows and unmatched "
    "rows classify exactly as the reference does",
)
def report_earning_brokers_eo(spark: SparkSession, sf_dir: str) -> DataFrame:
    eb = _fee_earning_brokers(spark, sf_dir)
    eo = eo_stg_cached(spark, sf_dir).select(
        "BrokerId",
        F.col("Id").alias("eo_Id"),
        F.col("Carrier").alias("InsuranceCompany"),
        F.col("PolicyNumber").alias("EOPolicyNumber"),
        F.col("CoverageAmount").alias("EOCoverageAmount"),
        F.col("EffectiveDate").alias("EOEffectiveDate"),
        F.col("ExpirationDate").alias("EOExpirationDate"),
    )
    ts = F.lit(EO_AS_OF).cast("timestamp")
    soon = ts + F.expr("INTERVAL 30 DAY")
    exp = F.col("EOExpirationDate")
    return eb.drop("HireDate", "FeeCountLast3Months").join(
        F.broadcast(eo), "BrokerId", "left"
    ).select(
        "BrokerId",
        "BrokerName",
        "BrokerStatus",
        "BrokerType",
        "DateMostRecentFee",
        "FeesLast3Months",
        "TotalFees",
        "InsuranceCompany",
        "EOPolicyNumber",
        "EOCoverageAmount",
        "EOEffectiveDate",
        "EOExpirationDate",
        F.when(exp < ts, "Expired")
        .when(exp < soon, "Expiring Soon")
        .when(F.col("eo_Id").isNull(), "No E&O On File")
        .otherwise("Active")
        .alias("EOStatus"),
    )


@query(
    "report_earning_brokers_appointments",
    oracle=_oracle(f"""
    , {_FEE_EARN_CTE.strip()}
    SELECT {_EB_COLS_SQL},
           eb.FeeCountLast3Months,
           eb.HireDate AS AppointmentDate,
           CAST(CASE WHEN eb.HireDate IS NOT NULL
                THEN EXTRACT(YEAR FROM TIMESTAMP '{FEE_AS_OF}')
                     - EXTRACT(YEAR FROM eb.HireDate) END AS INT)
             AS YearsWithCompany
    FROM fee_earn eb"""),
    survey_ref="reporting view 8 EarningBrokersWithAppointments "
    "(create-reporting-schema.sql:301-327): earnings base + "
    "appointment-date projection with DATEDIFF(YEAR)-semantics tenure "
    "(year-boundary count, computed as explicit YEAR subtraction so "
    "both engines agree; HireDate stands in for the AppointmentDate "
    "attribute the fixture party feed carries)",
)
def report_earning_brokers_appointments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    eb = _fee_earning_brokers(spark, sf_dir)
    years = F.when(
        F.col("HireDate").isNotNull(),
        F.lit(int(FEE_AS_OF[:4])) - F.year("HireDate"),
    ).cast("int")
    return eb.select(
        "BrokerId",
        "BrokerName",
        "BrokerStatus",
        "BrokerType",
        "DateMostRecentFee",
        "FeesLast3Months",
        "TotalFees",
        "FeeCountLast3Months",
        F.col("HireDate").alias("AppointmentDate"),
        years.alias("YearsWithCompany"),
    )
