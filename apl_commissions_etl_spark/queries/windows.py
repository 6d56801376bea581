"""Window operators (SURVEY.md §2.5 W1-W5) and sort/limit/top-k
(§2.6 O1-O3).

Scale note (W1): the reference mints surrogate ids with a GLOBAL
``ROW_NUMBER() OVER (ORDER BY ...)`` -- a single-partition bottleneck
at 100 TB. We demonstrate it on a dim-sized input only; fact-scale id
minting uses deterministic hash keys instead (see
``functions/hashing.py`` and the ``func_deterministic_keys`` query),
which is the engine's replacement for W1/W6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import query
from ..sources.testdata import load_table, spread


@query(
    "win_global_rownumber_dim",
    oracle="""
    SELECT n_name,
           ROW_NUMBER() OVER (ORDER BY n_name) AS surrogate_id
    FROM nation
    """,
    survey_ref="W1 global ROW_NUMBER surrogate key (sql/transforms/01-brokers.sql:214)",
)
def win_global_rownumber_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row_number -- acceptable ONLY on dim-sized inputs (this
    is a 25-row table). Fact-scale ids use sha2 keys instead."""
    n = load_table(spark, sf_dir, "nation")
    w = W.orderBy("n_name")
    return n.select("n_name", F.row_number().over(w).alias("surrogate_id"))


@query(
    "win_partitioned_seq",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS seq
    FROM orders
    """,
    survey_ref="W2 partitioned ROW_NUMBER sequence (sql/transforms/06-proposals.sql:66)",
)
def win_partitioned_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence within group (split sequence by SplitPercent DESC
    shape). Deterministic tiebreak on the unique key."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("seq"))


@query(
    "win_dedup_keep_latest",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           CAST(o_orderdate AS DATE) AS latest_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    survey_ref="W3 dedup keep-latest rn=1 (sql/transforms/07-deprecated-hierarchies.sql:281-309)",
)
def win_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest row per key: the reference's
    latest-participant / best-proposal dedup."""
    # spread on the window's partition key: parallelizes the
    # single-split scan and satisfies the window distribution
    o = spread(load_table(spark, sf_dir, "orders"), "o_custkey")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").cast("date").alias("latest_date"),
        )
    )


@query(
    "win_lead_normalize_ranges",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS effective_from,
           CAST(LEAD(o_orderdate) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ) - INTERVAL 1 DAY AS DATE) AS effective_to
    FROM orders
    """,
    survey_ref="W4 LEAD date-range normalization (06g-normalize-proposal-date-ranges.sql:23-64)",
)
def win_lead_normalize_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """next.EffectiveFrom - 1 day becomes current.EffectiveTo; NULL on
    the last row = open-ended range."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("effective_from"),
        F.date_sub(F.lead("o_orderdate").over(w).cast("date"), 1).alias(
            "effective_to"
        ),
    )


@query(
    "win_lag_gap_detection",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     LAG(o_orderdate) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    QUALIFY gap_days > 365
    """,
    survey_ref="W5 LAG gap detection (06g-normalize-proposal-date-ranges.sql:75-109)",
)
def win_lag_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """previous end vs current start -> gap report (only gaps > 1yr)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag("o_orderdate").over(w).cast("date"),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days") > 365)
    )


@query(
    "win_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    survey_ref="§2.5 note: ROWS frames unused by reference -- provided as engine surface",
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame (capability the
    reference lacks; exact decimal accumulation keeps it
    order-stable)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "ord_topn",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    survey_ref="O2 TOP N report samples (sql/transforms/03-products.sql:238-252)",
)
def ord_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP N with a deterministic tiebreak (unique key) so the result
    set is well-defined under order-insensitive comparison. Spark
    plans this as TakeOrderedAndProject -- per-partition top-N then a
    driver-side merge, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
    )


@query(
    "ord_deterministic_sample",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) IN ('00', '01', '02')
    """,
    survey_ref="O3 ORDER BY NEWID() random sample -> deterministic hash sample "
    "(scripts/validate-certificate-resolution.ts:135-156)",
)
def ord_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference samples with ORDER BY NEWID(); distributed
    engines need reproducible sampling, so we hash the key and take a
    hex-prefix slice (~1.2% here). Seeded F.rand works too but is not
    cross-engine reproducible."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    return o.filter(bucket.isin("00", "01", "02")).select(
        "o_orderkey", "o_orderstatus"
    )


@query(
    "win_moving_avg_range",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS moving_avg_1h,
           COUNT(*) OVER w AS n_in_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    survey_ref="RANGE-frame window (new surface): 1h trailing moving "
    "average per user — a time-based frame, not a row count; exact "
    "DECIMAL sum over the frame, one double division at the edge "
    "(double-accumulated AVG would be frame-order-dependent)",
)
def win_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # RANGE frames need a numeric ordering key in Spark: order by
    # microseconds since a fixed NTZ epoch and bound by 1h of
    # microseconds — exact integer arithmetic identical to DuckDB's
    # INTERVAL frame, and timezone-independent (ts is TIMESTAMP_NTZ;
    # casting it to TIMESTAMP would re-interpret in session tz)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
    )
    w = W.partitionBy("user_id").orderBy(us).rangeBetween(-3_600_000_000, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


@query(
    "win_ntile_quartiles",
    oracle="""
    WITH t AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS spend
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, spend,
           ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS spend_quartile
    FROM t
    """,
    survey_ref="NTILE bucketing (new surface): customer spend "
    "quartiles — deterministic via the unique-key tie-break; both "
    "engines share the equal-buckets-remainder-first NTILE definition",
)
def win_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    w = W.orderBy(F.desc("spend"), "o_custkey")
    return spend.select(
        "o_custkey", "spend", F.ntile(4).over(w).alias("spend_quartile")
    )


@query(
    "win_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderstatus) OVER w AS first_status,
           LAST_VALUE(o_orderstatus) OVER w AS last_status,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           LAST_VALUE(o_orderkey) OVER w AS last_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
    survey_ref="W-family completeness: FIRST_VALUE/LAST_VALUE over the "
    "full-partition frame (the oldest/newest-per-key enrichment the "
    "reference writes as two correlated TOP 1 subqueries, e.g. "
    "06a-proposals-simple-groups.sql min/max effective rows) — one "
    "window pass, unique-key tie-break keeps it deterministic",
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderstatus").over(w).alias("first_status"),
        F.last("o_orderstatus").over(w).alias("last_status"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
    ).distinct()


@query(
    "win_rank_distributions",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS spend
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, spend,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           CAST(round(PERCENT_RANK() OVER w, 6) AS DOUBLE) AS pct_rank,
           CAST(round(CUME_DIST() OVER w, 6) AS DOUBLE) AS cume
    FROM spend
    WINDOW w AS (ORDER BY spend DESC, o_custkey)
    """,
    survey_ref="W-family completeness: RANK / DENSE_RANK / "
    "PERCENT_RANK / CUME_DIST over customer spend — the full ranking "
    "function set in one deterministic window (unique-key tie-break); "
    "ratios rounded to 6dp for engine-identical doubles",
)
def win_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    w = W.orderBy(F.desc("spend"), "o_custkey")
    return spend.select(
        "o_custkey",
        "spend",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cume"),
    )


@query(
    "ord_keyset_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate
    FROM orders
    WHERE o_orderkey > 3000
    ORDER BY o_orderkey
    LIMIT 50
    """,
    survey_ref="§2.6 O-family incl. O4 (global ordered read, redesigned as keyset pages): keyset pagination — WHERE key > "
    "last_seen ORDER BY key LIMIT n. Unlike OFFSET (which scans and "
    "discards every earlier row, O(page_number) per page), the keyset "
    "predicate pushes to the scan and each page costs one pruned "
    "TakeOrderedAndProject — the only pagination that survives a "
    "billion-row table",
)
def ord_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") > 3000)
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy("o_orderkey")
        .limit(50)
    )


@query(
    "win_pareto_cumshare",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      FROM orders GROUP BY o_custkey),
    t AS (SELECT SUM(s) AS total, COUNT(*) AS n_cust FROM spend),
    r AS (
      SELECT o_custkey, s,
             SUM(s) OVER (ORDER BY s DESC, o_custkey
               ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY s DESC, o_custkey) AS rn
      FROM spend)
    SELECT r.o_orderkey_rank, r.o_custkey, r.spend, r.cum_share,
           r.cust_frac,
           CAST(r.cum_share >= 0.8 AND r.prev_share < 0.8 AS BOOLEAN)
             AS crosses_80
    FROM (
      SELECT CAST(rn AS INT) AS o_orderkey_rank, o_custkey,
             CAST(s AS DOUBLE) AS spend,
             CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share,
             CAST(cum - s AS DOUBLE) / CAST(t.total AS DOUBLE) AS prev_share,
             CAST(rn AS DOUBLE) / t.n_cust AS cust_frac
      FROM r CROSS JOIN t) r
    """,
    survey_ref="new surface: Pareto / ABC analysis — customers ranked "
    "by spend with exact-decimal running share and the row where the "
    "cumulative share crosses 80% flagged (the '20% of groups carry "
    "80% of premium' check the reference eyeballs in its conformance "
    "PRINTs). Decimal cumsum keeps every prefix exact; doubles only "
    "at the edge",
)
def win_pareto_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    )
    t = spend.agg(
        F.sum("s").alias("total"), F.count(F.lit(1)).alias("n_cust")
    )
    w = W.orderBy(F.desc("s"), "o_custkey")
    r = spend.select(
        "o_custkey",
        "s",
        F.sum("s").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).alias("rn"),
    ).crossJoin(F.broadcast(t))
    cum_share = F.col("cum").cast("double") / F.col("total").cast("double")
    prev_share = (F.col("cum") - F.col("s")).cast("double") / F.col("total").cast("double")
    return r.select(
        F.col("rn").cast("int").alias("o_orderkey_rank"),
        "o_custkey",
        F.col("s").cast("double").alias("spend"),
        cum_share.alias("cum_share"),
        (F.col("rn").cast("double") / F.col("n_cust")).alias("cust_frac"),
        ((cum_share >= 0.8) & (prev_share < 0.8)).alias("crosses_80"),
    )
