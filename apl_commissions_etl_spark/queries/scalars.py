"""Scalar-function operators (SURVEY.md §2.8): string, date, math,
JSON, hash, array surfaces -- each demonstrated end-to-end with its
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import canonical_kv_json, deterministic_id
from ..plans.dims_fixtures import dims_cte_sql, register_dim_views
from ..registry import query
from ..sources.testdata import load_table


@query(
    "func_string_suite",
    oracle="""
    SELECT c_custkey,
           concat('G', CAST(c_custkey AS VARCHAR)) AS prefixed_id,
           TRY_CAST(regexp_replace(c_name, '^Customer#0*', '') AS BIGINT) AS stripped_id,
           trim(c_mktsegment) AS seg,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           CASE WHEN c_name LIKE 'Customer#%' THEN 1 ELSE 0 END AS is_customer,
           upper(c_mktsegment) AS seg_upper,
           replace(c_name, 'Customer', 'Cust') AS renamed
    FROM customer
    """,
    survey_ref="§2.8 string: CONCAT/REPLACE/TRIM/SUBSTRING/LEN/LIKE + P7 prefix "
    "strip + P8 fixed-width substring (sql/transforms/01-brokers.sql:33-35)",
)
def func_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The P-prefix strip -> BIGINT and 'G'+id build are the
    reference's broker/group id normalizations."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.lit("G"), F.col("c_custkey").cast("string")).alias("prefixed_id"),
        F.regexp_replace("c_name", "^Customer#0*", "").try_cast("long").alias(
            "stripped_id"
        ),
        F.trim("c_mktsegment").alias("seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.when(F.col("c_name").like("Customer#%"), 1).otherwise(0).alias(
            "is_customer"
        ),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("renamed"),
    )


@query(
    "func_date_suite",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mth,
           CAST(o_orderdate + INTERVAL 12 MONTH AS DATE) AS plus_12m,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
           CAST(o_orderdate - INTERVAL 1 DAY AS DATE) AS minus_1d,
           (EXTRACT(YEAR FROM DATE '1998-12-31')
            - EXTRACT(YEAR FROM o_orderdate)) AS tsql_datediff_year,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_str,
           strftime(o_orderdate, '%Y%m%d') AS compact_str
    FROM orders
    """,
    survey_ref="§2.8 date: YEAR/DATEADD/DATEDIFF(YEAR)/CONVERT styles "
    "(run-calculation.sql:73-74; 06g:55; 11-fees.sql:109)",
)
def func_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL DATEDIFF(YEAR) counts year-boundary crossings ==
    year(b) - year(a), NOT elapsed years -- reproduced exactly
    (BasisYear depends on it, run-calculation.sql:74)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mth"),
        F.add_months(d, 12).alias("plus_12m"),
        F.date_add(d, 30).alias("plus_30d"),
        F.date_sub(d, 1).alias("minus_1d"),
        (F.lit(1998) - F.year(d)).alias("tsql_datediff_year"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_str"),
        F.date_format(d, "yyyyMMdd").alias("compact_str"),
    )


@query(
    "func_round_money",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS net_2dp,
           CAST(ROUND(CAST(l_discount AS DECIMAL(18,6)) * 100, 4) AS DOUBLE)
             AS pct_4dp,
           CAST(ABS(CAST(l_quantity AS DECIMAL(18,6)) - 25) AS DOUBLE) AS qty_dist,
           CAST(LEAST(CAST(l_extendedprice AS DECIMAL(18,6)),
                      CAST(l_quantity AS DECIMAL(18,6)) * 1000) AS DOUBLE) AS capped,
           GREATEST(1, EXTRACT(YEAR FROM l_shipdate) - 1995) AS basis_year
    FROM lineitem
    """,
    survey_ref="§2.8 math: ROUND half-away-from-zero on DECIMAL, ABS, "
    "LEAST/GREATEST, BasisYear GREATEST(1,...) (run-calculation.sql:73-74,139)",
)
def func_round_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money rounding parity: Spark HALF_UP on DecimalType == T-SQL
    ROUND == DuckDB ROUND on DECIMAL (all half-away-from-zero,
    verified incl. negatives)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(dec("l_extendedprice") * (1 - dec("l_discount")), 2)
        .cast("double")
        .alias("net_2dp"),
        F.round(dec("l_discount") * 100, 4).cast("double").alias("pct_4dp"),
        F.abs(dec("l_quantity") - 25).cast("double").alias("qty_dist"),
        F.least(dec("l_extendedprice"), dec("l_quantity") * 1000)
        .cast("double")
        .alias("capped"),
        F.greatest(F.lit(1), F.year("l_shipdate") - 1995).alias("basis_year"),
    )


@query(
    "func_json_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    """,
    survey_ref="§2.8 JSON shred: JSON_VALUE / OPENJSON WITH typed "
    "(06a-proposals-simple-groups.sql:216-219)",
)
def func_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_VALUE + typed shred; missing paths yield NULL, matching
    OPENJSON ... WITH semantics."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_typed"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@query(
    "func_canonical_json_build",
    oracle="""
    SELECT o_orderkey,
           concat('{', '"priority":', '"', o_orderpriority, '"',
                  ',', '"status":', '"', o_orderstatus, '"', '}')
             AS config_json
    FROM orders
    """,
    survey_ref="§2.8 JSON build w/ canonical serialization (FOR JSON PATH, "
    "06a:48-59; hash-stability caveat SURVEY §2.8)",
)
def func_canonical_json_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's canonical KV-JSON builder: sorted keys, no
    whitespace, engine-independent -- the foundation for stable config
    hashes (replaces FOR JSON PATH whose bytes are serializer-specific)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        canonical_kv_json(
            {"priority": F.col("o_orderpriority"), "status": F.col("o_orderstatus")}
        ).alias("config_json"),
    )


@query(
    "func_hash_sha256_md5",
    oracle="""
    SELECT o_orderkey,
           upper(sha256(concat('{', '"priority":', '"', o_orderpriority, '"',
                               ',', '"status":', '"', o_orderstatus, '"', '}')))
             AS config_hash,
           md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
                         CAST(o_custkey AS VARCHAR))) AS row_md5,
           concat_ws('-', 'PT', CAST(o_orderkey AS VARCHAR),
                     CAST(o_custkey AS VARCHAR)) AS deterministic_key
    FROM orders
    """,
    survey_ref="§2.8 hash ids: HASHBYTES SHA2_256 64-hex-upper (06a:144), MD5 "
    "config hash (consolidate-proposals.ts:43), W1/W6 replacement keys",
)
def func_hash_sha256_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA-256 config hash over canonical JSON + MD5 + the
    deterministic composite id that replaces global ROW_NUMBER id
    minting at scale."""
    o = load_table(spark, sf_dir, "orders")
    cfg = canonical_kv_json(
        {"priority": F.col("o_orderpriority"), "status": F.col("o_orderstatus")}
    )
    return o.select(
        "o_orderkey",
        F.upper(F.sha2(cfg, 256)).alias("config_hash"),
        F.md5(
            F.concat_ws(
                "|", F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string")
            )
        ).alias("row_md5"),
        deterministic_id("PT", "o_orderkey", "o_custkey").alias("deterministic_key"),
    )


@query(
    "func_year_range_explode",
    oracle="""
    SELECT o_orderkey,
           unnest(generate_series(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT), 2001))
             AS coverage_year
    FROM orders
    """,
    survey_ref="§2.8 date: getYearRange expansion (scripts/proposal-builder.ts:1986-1992)",
)
def func_year_range_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence(year(from), year(to)) + explode: one row per covered
    year (the proposal key-mapping expansion). NB: Spark's sequence()
    generates DESCENDING ranges when start > stop (DuckDB's
    generate_series returns empty) -- the upper bound must be >= every
    start year."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.explode(F.sequence(F.year("o_orderdate"), F.lit(2001))).alias(
            "coverage_year"
        ),
    )


@query(
    "func_array_ops",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list_distinct(list(l_returnflag))), ',')
             AS flags,
           len(list_distinct(list(l_returnflag))) AS n_flags,
           CASE WHEN list_contains(list(l_returnflag), 'R')
                THEN 1 ELSE 0 END AS has_return
    FROM lineitem
    GROUP BY l_orderkey
    """,
    survey_ref="§2.8 array/set accumulation (consolidate-proposals.ts:214-220)",
)
def func_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set / array_sort / size / array_contains: the product-
    code set accumulation surface. Array emitted as a sorted joined
    string so result canonicalizers can hash the cell."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias("flags"),
        F.size(F.collect_set("l_returnflag")).alias("n_flags"),
        F.when(F.array_contains(F.collect_list("l_returnflag"), "R"), 1)
        .otherwise(0)
        .alias("has_return"),
    )


@query(
    "func_state_code_map",
    oracle="""
    SELECT n_nationkey, n_name,
           CASE n_name
             WHEN 'UNITED STATES' THEN 'US'
             WHEN 'CANADA' THEN 'CA'
             WHEN 'BRAZIL' THEN 'BR'
             WHEN 'ARGENTINA' THEN 'AR'
             ELSE 'XX' END AS country_code
    FROM nation
    """,
    survey_ref="§2.11 state-code -> name literal map, 51 entries "
    "(scripts/proposal-builder.ts:84-101)",
)
def func_state_code_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small literal mapping as a broadcast map expression (no UDF, no
    join): F.create_map literal + element_at with default."""
    n = load_table(spark, sf_dir, "nation")
    mapping = F.create_map(
        F.lit("UNITED STATES"), F.lit("US"),
        F.lit("CANADA"), F.lit("CA"),
        F.lit("BRAZIL"), F.lit("BR"),
        F.lit("ARGENTINA"), F.lit("AR"),
    )
    return n.select(
        "n_nationkey",
        "n_name",
        F.coalesce(mapping[F.col("n_name")], F.lit("XX")).alias("country_code"),
    )


@query(
    "func_json_shred_explode",
    oracle="""
    WITH built AS (
      SELECT c_custkey,
             '[{"seq":1,"pct":' || CAST(CASE WHEN c_custkey % 2 = 0
                 THEN 60 ELSE 100 END AS VARCHAR(20))
             || '},{"seq":2,"pct":' || CAST(c_custkey % 40 AS VARCHAR(20))
             || '}]' AS ConfigJson
      FROM customer
    )
    SELECT c_custkey,
           CAST(json_extract_string(ConfigJson,
                '$[' || CAST(i.n AS VARCHAR(2)) || '].seq') AS INT) AS seq,
           CAST(json_extract_string(ConfigJson,
                '$[' || CAST(i.n AS VARCHAR(2)) || '].pct') AS INT) AS pct
    FROM built CROSS JOIN (SELECT 0 AS n UNION ALL SELECT 1) i""",
    survey_ref="§2.8 JSON + J11: OPENJSON...WITH typed shred of a JSON "
    "array into rows (06a-proposals-simple-groups.sql:273-280) as "
    "from_json + explode; the build side is engine-portable concat "
    "(canonical serialization, SURVEY §2.8 hash caveat)",
)
def func_json_shred_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    built = c.select(
        "c_custkey",
        F.concat(
            F.lit('[{"seq":1,"pct":'),
            F.when(F.col("c_custkey") % 2 == 0, 60).otherwise(100).cast("string"),
            F.lit('},{"seq":2,"pct":'),
            (F.col("c_custkey") % 40).cast("string"),
            F.lit("}]"),
        ).alias("ConfigJson"),
    )
    shredded = F.from_json(
        F.col("ConfigJson"), "array<struct<seq:int,pct:int>>"
    )
    return built.select(
        "c_custkey", F.explode(shredded).alias("e")
    ).select("c_custkey", F.col("e.seq").alias("seq"), F.col("e.pct").alias("pct"))


_MELT_COLS = ["Year1", "Year2", "Year66", "LevelRate"]


@query(
    "func_unpivot_rates",
    oracle=f"WITH {dims_cte_sql()}\n"
    + "\nUNION ALL\n".join(
        f"""
    SELECT ScheduleName, ProductCode, '{c}' AS year_label,
           {c} AS rate_raw,
           CASE WHEN TRIM({c}) IN ('', '0') THEN NULL
                ELSE TRY_CAST({c} AS DECIMAL(8,4)) END AS rate
    FROM raw_schedule_rates"""
        for c in _MELT_COLS
    ),
    survey_ref="P-family completeness: wide-to-long UNPIVOT of the "
    "schedule rate columns (Year1/Year2/Year66/Level -> rows) with "
    "the zero-as-missing + TRY_CAST scrub applied per cell "
    "(04-schedules.sql:128-141 reads these wide; the melt is what a "
    "normalized rate table ingests). Spark side is one stack() "
    "projection — no shuffle, output is 4x the scan",
)
def func_unpivot_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_dim_views(spark, sf_dir)
    r = spark.table("raw_schedule_rates")
    stack_expr = "stack({n}, {args}) AS (year_label, rate_raw)".format(
        n=len(_MELT_COLS),
        args=", ".join(f"'{c}', {c}" for c in _MELT_COLS),
    )
    melted = r.select(
        "ScheduleName", "ProductCode", F.expr(stack_expr)
    )
    rate = F.when(
        F.trim("rate_raw").isin("", "0"), F.lit(None).cast("decimal(8,4)")
    ).otherwise(F.col("rate_raw").try_cast("decimal(8,4)"))
    return melted.select(
        "ScheduleName", "ProductCode", "year_label", "rate_raw",
        rate.alias("rate"),
    )
