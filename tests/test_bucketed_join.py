"""Bucketed-table co-location: the storage-level half of the 100 TB
join strategy.

Broadcast handles dim-sized sides; for fact-to-fact joins the engine's
answer is bucketed tables — both sides pre-hashed into the same number
of buckets on the join key at WRITE time, so every later join or
aggregation on that key runs with ZERO shuffle exchanges. These tests
prove Spark actually elides the exchanges for our written layout
(plan-level assertions, not vibes): a regression here (wrong bucket
count, lost sort spec, an accidental repartition) would silently turn
every downstream join into a full shuffle at cluster scale.
"""

from __future__ import annotations

import pytest

from apl_commissions_etl_spark.sources.testdata import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    """orders + customer written as bucketed external tables on
    custkey (same bucket count both sides — the co-location
    contract)."""
    base = tmp_path_factory.mktemp("bucketed")
    specs = {
        "b_orders": (load_table(spark, sf_dir, "orders"), "o_custkey"),
        "b_customer": (load_table(spark, sf_dir, "customer"), "c_custkey"),
    }
    for name, (df, key) in specs.items():
        (
            df.write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(base / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark
    for name in specs:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    o = spark.table("b_orders")
    c = spark.table("b_customer")
    # force sort-merge (a broadcast would trivially have no shuffle and
    # prove nothing about the bucket layout)
    joined = o.hint("merge").join(
        c, o.o_custkey == c.c_custkey
    ).select("o_orderkey", "c_name")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    # sortBy at write time lets the join skip re-sorting too: the only
    # Sort allowed is none
    assert joined.count() > 0


def test_bucketed_groupby_has_no_shuffle(bucketed):
    spark = bucketed
    o = spark.table("b_orders")
    agg = o.groupBy("o_custkey").count()
    plan = _plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() > 0


def test_unbucketed_join_does_shuffle(bucketed, sf_dir):
    """Control: the same join over the raw parquet DOES shuffle —
    proving the assertion above is detecting the bucket layout, not a
    quirk of the plan printer."""
    spark = bucketed
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.hint("merge").join(
        c, o.o_custkey == c.c_custkey
    ).select("o_orderkey", "c_name")
    assert "Exchange hashpartitioning" in _plan(joined)
