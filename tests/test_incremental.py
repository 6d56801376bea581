"""Incremental aggregate maintenance == full recompute, on a real
table split into history + delta batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from apl_commissions_etl_spark.operators.incremental import (
    merge_partial_aggregates,
    partial_aggregate,
)
from apl_commissions_etl_spark.sources.testdata import load_table

SPECS = {
    "n": ("o_orderkey", "count"),
    "total": ("dec_price", "sum"),
    "first_dt": ("o_orderdate", "min"),
    "last_dt": ("o_orderdate", "max"),
}


def _rows(df):
    return {
        r.o_custkey: (r.n, r.total, r.first_dt, r.last_dt)
        for r in df.collect()
    }


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "dec_price", F.col("o_totalprice").cast("decimal(18,2)")
    )
    history = o.filter(F.col("o_orderkey") % 5 != 0)
    delta = o.filter(F.col("o_orderkey") % 5 == 0)

    full = partial_aggregate(o, ["o_custkey"], SPECS)
    merged = merge_partial_aggregates(
        partial_aggregate(history, ["o_custkey"], SPECS),
        partial_aggregate(delta, ["o_custkey"], SPECS),
        ["o_custkey"],
        SPECS,
    )
    assert _rows(full) == _rows(merged)

    # three-way: a second delta merges onto the already-merged state
    d1 = o.filter(F.col("o_orderkey") % 5 == 1)
    rest = o.filter(~F.col("o_orderkey").isin([]) & (F.col("o_orderkey") % 5 > 1))
    base = partial_aggregate(o.filter(F.col("o_orderkey") % 5 == 0), ["o_custkey"], SPECS)
    step1 = merge_partial_aggregates(
        base, partial_aggregate(d1, ["o_custkey"], SPECS), ["o_custkey"], SPECS
    )
    step2 = merge_partial_aggregates(
        step1, partial_aggregate(rest, ["o_custkey"], SPECS), ["o_custkey"], SPECS
    )
    assert _rows(full) == _rows(step2)


def test_builder_incremental_replaces_stale_amended_rows(spark, sf_dir):
    """The incremental-builder merge must REPLACE the amended
    certificates' baseline rows, not append to them: a cert whose
    split-2 arrives in the batch had a genuinely stale baseline
    criteria row (split 1 only), and the merged result must carry the
    full-fact values with no duplicate (Group, Certificate) keys."""
    from pyspark.sql import functions as F

    from apl_commissions_etl_spark.plans import builder as b
    from apl_commissions_etl_spark.queries.builder import (
        _certs_raw,
        builder_incremental_criteria,
    )

    merged = builder_incremental_criteria(spark, sf_dir)
    full = b.selection_criteria(_certs_raw(spark, sf_dir))

    # no duplicate keys in the merged frame
    dup = (
        merged.groupBy("GroupId", "CertificateId")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0

    # at least one amended certificate exists whose baseline (split-1
    # only) disagreed with the full-fact criteria — i.e. the merge had
    # real replacement work to do, not just appends
    amended = merged.filter(
        (F.col("CertificateId") % 10 == 7) & (F.col("SplitCount") > 1)
    )
    assert amended.count() > 0

    # and the merged values equal the full rebuild for those keys
    cols = ["GroupId", "CertificateId", "TotalSplitPercent",
            "SplitCount", "ConfigHash"]
    m = {tuple(r) for r in amended.select(*cols).collect()}
    f = {
        tuple(r)
        for r in full.filter(
            (F.col("CertificateId") % 10 == 7) & (F.col("SplitCount") > 1)
        ).select(*cols).collect()
    }
    assert m == f
