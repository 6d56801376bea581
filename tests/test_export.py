"""Export sink semantics: idempotent insert-missing (S9) and immutable
update-join (S10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apl_commissions_etl_spark.operators.export import update_join, upsert_missing


def test_upsert_missing_is_idempotent(spark):
    prod = spark.createDataFrame([(1, "a"), (2, "b")], "Id int, V string")
    new = spark.createDataFrame([(2, "b2"), (3, "c")], "Id int, V string")
    missing = upsert_missing(new, prod, ["Id"])
    assert [(r.Id, r.V) for r in missing.collect()] == [(3, "c")]
    # re-running against prod+appended yields nothing (idempotent)
    merged = prod.unionByName(missing)
    assert upsert_missing(new, merged, ["Id"]).count() == 0


def test_update_join_recomputes_matched_rows_only(spark):
    target = spark.createDataFrame(
        [(1, "x", 0.0), (2, "y", 0.0), (3, "z", 0.0)], "Id int, N string, Amt double"
    )
    updates = spark.createDataFrame([(1, 10.0), (3, 30.0)], "Id int, NewAmt double")
    out = update_join(
        target, updates, ["Id"],
        {"Amt": F.coalesce(F.col("NewAmt"), F.col("Amt"))},
    )
    assert out.columns == ["Id", "N", "Amt"]
    got = {r.Id: r.Amt for r in out.collect()}
    assert got == {1: 10.0, 2: 0.0, 3: 30.0}
