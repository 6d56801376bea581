"""Partition pruning proof for the hive-partitioned sink: the
partition-key filter must resolve against directory names
(PartitionFilters), opening only the matching year's files."""

from __future__ import annotations

from pyspark.sql import functions as F

from apl_commissions_etl_spark.queries.ingest import partitioned_orders_path


def test_partition_filter_reaches_scan(spark, sf_dir):
    path = partitioned_orders_path(spark, sf_dir)
    df = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the year predicate must be IN the partition filters, not a
    # post-scan data filter
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "o_year" in pf
    # and only 1995's directory survives: distinct years in the result
    years = {r[0] for r in df.select("o_year").distinct().collect()}
    assert years == {1995}


def test_partitioned_counts_match_unpartitioned(spark, sf_dir):
    from apl_commissions_etl_spark.sources.testdata import load_table

    path = partitioned_orders_path(spark, sf_dir)
    n_part = spark.read.parquet(path).filter(F.col("o_year") == 1995).count()
    o = load_table(spark, sf_dir, "orders")
    n_direct = o.filter(F.year(F.col("o_orderdate").cast("date")) == 1995).count()
    assert n_part == n_direct
