"""Schema evolution at the storage layer: a long-lived 100 TB dataset
accumulates writer versions — later files carry added columns. The
read contract must (a) unify schemas when asked, (b) stay cheap when
not asked (schema from one footer, no fleet-wide listing), and (c)
tolerate column reordering between writer versions.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_unifies_added_column(spark, tmp_path):
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id int, v string")
    v1.write.parquet(path + "/batch=1")
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id int, v string, score double"
    )
    v2.write.parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "score", "batch"}
    rows = {r.id: (r.v, r.score) for r in merged.collect()}
    # old files surface the new column as null, not an error
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_merge_schema_tolerates_column_reorder(spark, tmp_path):
    path = str(tmp_path / "reordered")
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(
        path + "/batch=1"
    )
    spark.createDataFrame([("b", 2)], "v string, id int").write.parquet(
        path + "/batch=2"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert {(r.id, r.v) for r in merged.select("id", "v").collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_select_star_prunes_to_read_schema(spark, sf_dir):
    """Column pruning survives the read: a 2-column projection over the
    widest table must reach the scan as a 2-column ReadSchema (the
    100 TB difference between reading 2 columns and reading 11)."""
    from apl_commissions_etl_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:" in plan
    # no other lineitem columns in the scan schema
    scan_schema = plan.split("ReadSchema: ")[1].split(">")[0]
    assert "l_extendedprice" not in scan_schema
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
