"""Skewed-fixture stress (r9 verdict item 3): the cascade and the
builder over a fixture where one group holds ~40% of certificates —
correctness against DuckDB running the identical skewed fixture SQL,
fixture strength (the skew is real), and the skew-immune plan shape.

The full value-hash parity is the sweep's job (the two queries are
registered with full oracles); this test pins the same parity at
smoke scale inside pytest plus the invariants the oracle cannot see
(plan shape, skew share)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from apl_commissions_etl_spark.registry import all_queries
from apl_commissions_etl_spark.sources.testdata import TABLES

SF = "/root/testdata/sf0.01"


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name", ["builder_skewed_group_parity", "calc_skewed_group_parity"]
)
def test_skewed_parity_matches_duckdb(spark, name):
    q = all_queries()[name]
    got = {
        tuple(str(v) for v in r)
        for r in q.spark_fn(spark, SF).collect()
    }
    con = _duck(SF)
    want = {
        tuple(str(v) for v in r) for r in con.execute(q.oracle).fetchall()
    }
    assert got == want


def test_skew_fixture_is_really_skewed(spark):
    """G1 must absorb >= 35% of certificates in both skewed fixtures —
    otherwise the stress proves nothing."""
    qs = all_queries()
    props = qs["builder_skewed_group_parity"].spark_fn(spark, SF)
    shares = {
        r["GroupId"]: r["n"]
        for r in props.groupBy("GroupId")
        .agg(F.sum("CertificateCount").alias("n"))
        .collect()
    }
    total = sum(shares.values())
    assert shares.get("G1", 0) / total >= 0.35

    from apl_commissions_etl_spark.queries.calcdomain import _staging

    pol = _staging(spark, SF)["stg_policies"]
    gk = F.substring("GroupId", 2, 20).cast("long")
    frac = pol.filter(gk % 5 <= 1).count() / pol.count()
    assert frac >= 0.35


def test_skewed_cascade_plan_never_partitions_by_group(spark):
    """The skew-immunity claim in SCALING.md's skew section: the
    cascade's executed plan must contain no sort-merge join and no
    hash partitioning on the (hot) GroupId — every group-keyed lookup
    broadcasts, so 40% of the fact sharing one key cannot concentrate
    on one task."""
    q = all_queries()["calc_skewed_group_parity"]
    df = q.spark_fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(GroupId" not in plan
