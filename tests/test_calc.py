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
