"""Audit / referential-integrity assertion jobs (SURVEY.md §5 item 3;
ref sql/transforms/99-audit-and-cleanup.sql:22-120 orphan checks and
sql/verify/verify-commission-requirements.sql chain walk).

Each check is an anti-join count over the staging layer; the suite
returns one row per check so it can run as a single job and be
asserted on (count == expected) or exported as an audit report.

Scale posture: every check key-projects before the anti-join (only
keys shuffle) and the counts are map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _orphans(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    # no .distinct() on the parent side (r12, guide §2.4): a left-anti
    # join is insensitive to build-side duplicates (the broadcast hash
    # table dedups keys as it builds), and the distinct cost a full
    # parent-side Exchange + two HashAggregates per check — 6 of the
    # suite's 44 Exchanges bought nothing
    return (
        child.select(F.col(fk))
        .filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")
    )


def referential_checks(staging: dict[str, DataFrame]) -> DataFrame:
    """One row per FK relationship: (check_name, orphan_count).

    'premiums_group_without_proposal' is EXPECTED nonzero on the
    fixtures (the planted no-proposal stratum) — it is the reference's
    'premiums that will fail stage 2' diagnostic, not a bug."""
    checks: list[tuple[str, DataFrame]] = [
        (
            "split_participants_without_version",
            _orphans(
                staging["stg_premium_split_participants"], "SplitVersionId",
                staging["stg_premium_split_versions"], "SplitVersionId",
            ),
        ),
        (
            "hierarchy_participants_without_version",
            _orphans(
                staging["stg_hierarchy_participants"], "HierarchyVersionId",
                staging["stg_hierarchy_versions"], "HierarchyVersionId",
            ),
        ),
        (
            "split_versions_without_proposal",
            _orphans(
                staging["stg_premium_split_versions"], "ProposalId",
                staging["stg_proposals"], "ProposalId",
            ),
        ),
        (
            "premiums_without_policy",
            _orphans(
                staging["stg_premium_transactions"], "CertificateId",
                staging["stg_policies"], "CertificateId",
            ),
        ),
        (
            "assignment_recipients_without_version",
            _orphans(
                staging["stg_commission_assignment_recipients"],
                "AssignmentVersionId",
                staging["stg_commission_assignment_versions"],
                "AssignmentVersionId",
            ),
        ),
        (
            "premiums_group_without_proposal",
            _orphans(
                staging["stg_policies"], "GroupId",
                staging["stg_proposals"], "GroupId",
            ),
        ),
    ]
    out: DataFrame | None = None
    for name, orphans in checks:
        row = orphans.agg(F.count(F.lit(1)).alias("orphan_count")).select(
            F.lit(name).alias("check_name"), "orphan_count"
        )
        out = row if out is None else out.unionByName(row)
    return out


def assert_referentially_clean(
    staging: dict[str, DataFrame], allow_nonzero: set[str] = frozenset()
) -> dict[str, int]:
    """Run the suite and raise if any unexpected check has orphans;
    returns the counts (driver-side: 6 rows)."""
    rows = referential_checks(staging).collect()
    counts = {r["check_name"]: r["orphan_count"] for r in rows}
    bad = {
        k: v for k, v in counts.items() if v > 0 and k not in allow_nonzero
    }
    if bad:
        raise AssertionError(f"referential integrity violations: {bad}")
    return counts
