"""Set operators (SURVEY.md §2.7 U1-U3) + prep/conformance projections
(§2.2 P1-P11): trim/safe-cast, status filters, NOT-NULL gates with
quarantine, regex predicates, exclusion lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table


@query(
    "setop_union_dedup",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal > 9000
    """,
    survey_ref="U1 UNION dedup of two sources (08-analyze-conformance.sql:30-72)",
)
def setop_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certificates-from-two-remainder-tables pattern: UNION with
    dedup across sources."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return a.unionByName(b).distinct()


@query(
    "setop_union_all_tagged",
    oracle="""
    SELECT 'urgent' AS src, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'wealthy' AS src, c_custkey AS o_custkey
    FROM customer WHERE c_acctbal > 9000
    """,
    survey_ref="U2 UNION ALL (sql/calc/run-calculation.sql:621-632)",
)
def setop_union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src"), "o_custkey"
    )
    b = c.filter(F.col("c_acctbal") > 9000).select(
        F.lit("wealthy").alias("src"), F.col("c_custkey").alias("o_custkey")
    )
    return a.unionByName(b)


@query(
    "setop_except_remainder",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    survey_ref="U3 EXCEPT-equivalent remainder (06a-proposals-simple-groups.sql:294-301)",
)
def setop_except_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cert_split_configs_remainder pattern: rows not consumed by
    an earlier transform. subtract() == EXCEPT DISTINCT (exceptAll
    would be bag semantics -- wrong here)."""
    o = load_table(spark, sf_dir, "orders")
    consumed = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.select("o_custkey").subtract(consumed)


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    survey_ref="§2.7 note: INTERSECT unused by reference -- provided as engine surface",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


# ---------------------------------------------------------------------------
# Prep / conformance projections (§2.2)
# ---------------------------------------------------------------------------


@query(
    "prep_conformance_gate",
    oracle="""
    SELECT event_id, user_id, event_type,
           CASE WHEN user_id IS NULL THEN 'MISSING_USER'
                WHEN value IS NULL OR value < 0 THEN 'BAD_VALUE'
                ELSE 'CONFORMANT' END AS conformance_status
    FROM events
    """,
    survey_ref="P5 NOT-NULL conformance gate + quarantine reasons "
    "(sql/02-input-tables.sql:319-348, 163-227)",
)
def prep_conformance_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformant/quarantine classification with reason codes: the
    input_* vs nonconformant_* split, computed in ONE pass (the
    reference scans twice; a single classification column feeds both
    sinks via partitioned write)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.col("user_id").isNull(), "MISSING_USER")
        .when(F.col("value").isNull() | (F.col("value") < 0), "BAD_VALUE")
        .otherwise("CONFORMANT")
        .alias("conformance_status"),
    )


@query(
    "prep_safe_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(event_type AS BIGINT) AS bad_long,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           TRY_CAST(NULLIF(trim(event_type), '') AS VARCHAR) AS clean_type
    FROM events
    """,
    survey_ref="P1-P3 trim + TRY_CAST null-on-failure (sql/02-input-tables.sql:239-262)",
)
def prep_safe_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST semantics via try_cast -- null on failure under any
    session ANSI setting (the driver supplies its own session). JSON
    field extraction then safe-cast mirrors the prep layer's typed
    projection."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_type").try_cast("long").alias("bad_long"),
        F.get_json_object("props", "$.k").try_cast("long").alias("k_value"),
        F.nullif(F.trim("event_type"), F.lit("")).alias("clean_type"),
    )


@query(
    "prep_invalid_group_regex",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN source IS NULL OR trim(source) = ''
                  OR regexp_matches(source, '^0+$')
                THEN 1 ELSE 0 END AS is_invalid
    FROM documents
    """,
    survey_ref="P9 invalid-group regex predicate (scripts/proposal-builder.ts:1994-2001)",
)
def prep_invalid_group_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """null/empty/all-zero id detection -> PHA routing predicate."""
    d = load_table(spark, sf_dir, "documents")
    invalid = (
        F.col("source").isNull()
        | (F.trim("source") == "")
        | F.col("source").rlike("^0+$")
    )
    return d.select(
        "doc_id", "source", F.when(invalid, 1).otherwise(0).alias("is_invalid")
    )


@query(
    "prep_exclusion_list",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey NOT IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
    survey_ref="P10 exclusion filter from side table (scripts/proposal-builder.ts:2093-2101)",
)
def prep_exclusion_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (excluded side table) as a broadcast left_anti join."""
    o = load_table(spark, sf_dir, "orders")
    excluded = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return o.join(
        F.broadcast(excluded), o.o_custkey == excluded.c_custkey, "left_anti"
    ).select("o_orderkey", "o_custkey")


@query(
    "prep_heuristic_predicates",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT (length(CAST(p_partkey AS VARCHAR)) = 5
               AND substr(CAST(p_partkey AS VARCHAR), 1, 1) = '7')
      AND p_name NOT LIKE 'forest%'
    """,
    survey_ref="P11 heuristic exclusions (08-analyze-conformance.sql:149-152)",
)
def prep_heuristic_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'5-digit ids starting with 7' + NOT LIKE prefix exclusion."""
    p = load_table(spark, sf_dir, "part")
    key_str = F.col("p_partkey").cast("string")
    return p.filter(
        ~((F.length(key_str) == 5) & (F.substring(key_str, 1, 1) == "7"))
        & ~F.col("p_name").like("forest%")
    ).select("p_partkey", "p_name")
