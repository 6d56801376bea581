"""Domain invariants of the 8-stage commission calc (ref
sql/calc/run-calculation.sql semantics), checked on the planted
fixture strata at sf0.001.

These complement the DuckDB oracle hash-match (scripts/check_oracle.py)
with semantic assertions a hash can't express: conservation laws,
precedence rules, and the planted error paths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apl_commissions_etl_spark.plans import calc
from apl_commissions_etl_spark.plans.fixtures import (
    FIXTURE_VIEWS,
    register_fixture_views,
)


@pytest.fixture(scope="module")
def stages(spark, sf_dir):
    register_fixture_views(spark, sf_dir)
    staging = {name: spark.table(name) for name, _ in FIXTURE_VIEWS}
    return calc.run_calc(staging)


def test_stage2_planted_error_paths(stages):
    # custkey % 20 == 13 groups have no proposal at all -> error rows
    errs = stages["s2"].filter(F.col("ErrorMessage").isNotNull())
    n_err = errs.count()
    assert n_err > 0
    # every error row belongs to a no-proposal or date-band-missed group
    assert errs.filter(F.col("ProposalId").isNotNull()).count() == 0


def test_split_percents_conserved(stages):
    # per (premium, split version): split percents sum to 100 exactly
    # (60/40 two-way for even groups, single 100 otherwise)
    bad = (
        stages["s3"]
        .groupBy("PremiumTransactionId", "SplitVersionId")
        .agg(F.sum("SplitPercent").alias("total"))
        .filter(F.col("total") != 100)
    )
    assert bad.count() == 0


def test_rate_source_precedence(stages):
    # orderkey % 7 == 0 certificates carry a certificate-level rate and
    # it must win over participant/schedule rates
    s6 = stages["s6"]
    cert_rows = s6.filter(F.col("CertificateId") % 7 == 0)
    assert cert_rows.count() > 0
    assert (
        cert_rows.filter(F.col("RateSource") != "CertificateRate").count() == 0
    )
    # no row may end up rateless: fixtures give every schedule code a
    # rate band covering GroupSize 1..100
    assert s6.filter(F.col("RateSource") == "NoRate").count() == 0


def test_gl_conserves_commission(stages):
    # sum(GL amounts) == sum(stage-7 commission): assignment only moves
    # money between brokers (Retained + Assigned == Commission), except
    # rows that died before stage 5 (no participants) which never reach
    # GL on either side of the equation.
    gl_total = (
        stages["gl"].agg(F.sum(F.col("Amount").cast("decimal(18,2)"))).collect()[0][0]
    )
    s8 = stages["s8"]
    commission_total = (
        s8.agg(F.sum(F.col("Commission").cast("decimal(18,2)"))).collect()[0][0]
    )
    assert gl_total == commission_total


def test_traceability_covers_every_premium(stages, spark):
    # every conformant premium appears exactly once in traceability
    n_premiums = (
        spark.table("stg_premium_transactions")
        .filter(F.col("PremiumAmount") > 0)
        .count()
    )
    trace = stages["trace"]
    assert trace.count() == trace.select("PremiumTransactionId").distinct().count()
    assert trace.count() == n_premiums
    # statuses partition the premiums
    statuses = {r["TraceStatus"] for r in trace.select("TraceStatus").distinct().collect()}
    assert statuses <= {"Calculated", "ProposalResolutionFailed", "NoParticipantsExpanded"}
    assert "Calculated" in statuses and "ProposalResolutionFailed" in statuses


def test_audit_suite_referentially_clean(spark, sf_dir):
    from apl_commissions_etl_spark.plans.audit import assert_referentially_clean
    from apl_commissions_etl_spark.queries.calcdomain import _staging

    counts = assert_referentially_clean(
        _staging(spark, sf_dir),
        allow_nonzero={"premiums_group_without_proposal"},
    )
    # the planted no-proposal stratum must actually trip the check
    assert counts["premiums_group_without_proposal"] > 0


def test_traceability_fanout_differential(stages, spark):
    """The split-plan traceability (numeric-buffer HashAggregate +
    hash-distinct attrs + narrow ProposalId MIN) must match the naive
    single-aggregation formulation EXACTLY — including under
    premium->proposal fanout, the one case where the per-premium
    "constants" frames see multiple source rows per key."""
    staging = {name: spark.table(name) for name, _ in FIXTURE_VIEWS}
    # clone a proposal that actually matches premiums, under a new id:
    # every premium of that group now resolves to TWO proposals
    matched = (
        stages["s2"].filter(F.col("ProposalId").isNotNull())
        .select("ProposalId").first()[0]
    )
    pr = staging["stg_proposals"]
    extra = pr.filter(F.col("ProposalId") == matched).withColumn(
        "ProposalId", F.concat(F.lit("ZDUP-"), F.col("ProposalId"))
    )
    staging2 = dict(staging)
    staging2["stg_proposals"] = pr.unionByName(extra)
    st = calc.run_calc(staging2)
    c8 = st["c8"]

    # the fanout actually happened
    multi = (
        st["s2"].groupBy("PremiumTransactionId")
        .agg(F.countDistinct("ProposalId").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi > 0

    # naive reference formulation: one aggregation, string buffers and
    # all (exactly the pre-optimization implementation)
    reached = F.col("HierarchyParticipantId").isNotNull()
    MONEY = calc.MONEY
    naive_trace = c8.groupBy("PremiumTransactionId").agg(
        F.max(F.col("PremiumAmount").cast("double")).alias("PremiumAmount"),
        F.coalesce(
            F.sum(F.when(reached, F.col("Commission").cast(MONEY))).cast("double"),
            F.lit(0.0),
        ).alias("TotalCommission"),
        F.countDistinct("HierarchyParticipantId").alias("ParticipantCount"),
        F.when(F.min("ErrorMessage").isNotNull(), "ProposalResolutionFailed")
        .when(
            F.sum(F.when(reached, F.col("Commission").cast(MONEY))).isNull(),
            "NoParticipantsExpanded",
        )
        .otherwise("Calculated")
        .alias("TraceStatus"),
    )
    naive_full = c8.groupBy("PremiumTransactionId").agg(
        F.max(reached.cast("int")).alias("any_reached"),
        F.min("CertificateId").alias("PolicyId"),
        F.min("TransactionDate").alias("TransactionDate"),
        F.min(F.col("PremiumAmount").cast("double")).alias("PremiumAmount"),
        F.round(F.sum(F.when(reached, F.col("Commission").cast(MONEY))), 2)
        .cast("double")
        .alias("OkTotalCommission"),
        F.min(F.when(reached, F.col("ProposalId"))).alias("OkProposalId"),
        F.min("ProposalId").alias("AnyProposalId"),
        F.min("GroupId").alias("GroupId"),
        F.min("ProductCode").alias("ProductCode"),
        F.countDistinct(F.when(reached, F.col("HierarchyId"))).alias(
            "OkHierarchyCount"
        ),
        F.sum(reached.cast("long")).alias("OkParticipantCount"),
        F.max(F.col("SplitParticipantId").isNotNull().cast("int")).alias(
            "has_split"
        ),
    )

    def rows(df, cols):
        return sorted(
            tuple(r) for r in df.select(*cols).collect()
        )

    tcols = [
        "PremiumTransactionId", "PremiumAmount", "TotalCommission",
        "ParticipantCount", "TraceStatus",
    ]
    assert rows(st["trace"], tcols) == rows(naive_trace, tcols)

    full = st["trace_full"]
    fcols = ["PremiumTransactionId", "PolicyId", "TransactionDate",
             "PremiumAmount", "GroupId", "ProductCode", "ProposalId",
             "TotalCommission", "HierarchyCount", "ParticipantCount"]
    naive_proj = naive_full.select(
        "PremiumTransactionId", "PolicyId", "TransactionDate",
        "PremiumAmount", "GroupId", "ProductCode",
        F.when(F.col("any_reached") == 1, F.col("OkProposalId"))
        .otherwise(F.col("AnyProposalId"))
        .alias("ProposalId"),
        F.when(F.col("any_reached") == 1, F.col("OkTotalCommission"))
        .otherwise(F.lit(0.0))
        .alias("TotalCommission"),
        F.when(F.col("any_reached") == 1, F.col("OkHierarchyCount"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("HierarchyCount"),
        F.when(F.col("any_reached") == 1, F.col("OkParticipantCount"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ParticipantCount"),
    )
    assert rows(full, fcols) == rows(naive_proj, fcols)
