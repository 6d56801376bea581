"""Bucketed warehouse layout (SURVEY.md §4: the reference's
nonclustered join-key indexes map to partitioning/bucketing on Spark).

At 100 TB the dominant cost of the calc cascade's fact-side joins and
the traceability groupBy is the shuffle. Bucketing pre-shuffles ONCE
at write time:

    - facts bucketed by their join/agg key (CertificateId for
      premiums↔policies, PremiumTransactionId for traceability);
    - a join of two tables bucketed by the same key into the same
      bucket count runs with NO Exchange on either side;
    - a groupBy on the bucket key runs with no Exchange at all.

Partition-prune on top: facts partitioned by a low-cardinality time
column (e.g. transaction year/month) so date-band queries scan only
matching directories (the reference's date indexes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    partition_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its hot join
    key. Sorted buckets additionally let sort-merge joins skip the
    sort."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> bool:
    """True when joining the two bucketed tables plans no Exchange —
    the co-location proof the tests assert on."""
    plan = (
        spark.table(left)
        .join(spark.table(right), on)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return "Exchange" not in plan
