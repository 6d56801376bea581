"""The audit suite as a driver-checkable query (SURVEY.md §5 item 3:
referential-integrity assertion jobs re-expressed from the reference's
print-a-warning SQL scripts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.audit import referential_checks
from ..plans.fixtures import fixtures_cte_sql
from ..queries.calcdomain import _staging
from ..registry import query

_CHECK = """SELECT '{name}' AS check_name, COUNT(*) AS orphan_count
FROM {child} c
WHERE c.{fk} IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})"""

_CHECKS = [
    ("split_participants_without_version", "stg_premium_split_participants",
     "SplitVersionId", "stg_premium_split_versions", "SplitVersionId"),
    ("hierarchy_participants_without_version", "stg_hierarchy_participants",
     "HierarchyVersionId", "stg_hierarchy_versions", "HierarchyVersionId"),
    ("split_versions_without_proposal", "stg_premium_split_versions",
     "ProposalId", "stg_proposals", "ProposalId"),
    ("premiums_without_policy", "stg_premium_transactions",
     "CertificateId", "stg_policies", "CertificateId"),
    ("assignment_recipients_without_version",
     "stg_commission_assignment_recipients", "AssignmentVersionId",
     "stg_commission_assignment_versions", "AssignmentVersionId"),
    ("premiums_group_without_proposal", "stg_policies",
     "GroupId", "stg_proposals", "GroupId"),
]

_ORACLE = (
    f"WITH {fixtures_cte_sql()}\n"
    + "\nUNION ALL\n".join(
        _CHECK.format(name=n, child=c, fk=fk, parent=p, pk=pk)
        for n, c, fk, p, pk in _CHECKS
    )
)


@query(
    "audit_referential_integrity",
    oracle=_ORACLE,
    survey_ref="§5 item 3: FK orphan checks as anti-join counts "
    "(99-audit-and-cleanup.sql:22-120); J8; the no-proposal stratum is "
    "the one expected-nonzero row",
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return referential_checks(_staging(spark, sf_dir))
