"""Aggregation operators (SURVEY.md §2.4 A1-A12) over the testdata
star schema.

Decimal discipline: sums of money-like doubles are accumulated as
DECIMAL (exact, order-independent) then cast to DOUBLE at the very
end, so Spark's partition-parallel accumulation and DuckDB's serial
accumulation produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table, spread

# money columns arrive as DOUBLE in the parquet; they carry 2-4 decimal
# digits, so DECIMAL(18,6) captures them exactly.
DEC = "decimal(18,6)"


def dsum(col: str):
    """Exact, order-independent sum of a money-like double column."""
    return F.sum(F.col(col).cast(DEC)).cast("double")


# DuckDB-side equivalent of ``dsum``
def _osum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_osum('l_quantity')} AS sum_qty,
           {_osum('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="A1 hash agg MIN/MAX/SUM/COUNT (sql/transforms/06-proposals.sql:85-117)",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical A1 hash
    aggregate with map-side partial aggregation (verify with
    .explain(): HashAggregate(partial) below the shuffle)."""
    # spread (guide §2.5): the single-row-group fixture scan fuses the
    # whole partial aggregation into ONE task; the unique line key
    # hash-spreads it across the session's cores (no-op on a real
    # multi-split table)
    li = spread(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey", "l_linenumber"
    )
    # tight decimal widths: the inputs are exact 2-decimal values, and
    # DECIMAL(12,2) * DECIMAL(5,2) * DECIMAL(5,2) stays inside
    # DECIMAL(38) on BOTH engines — the earlier DECIMAL(18,6) casts
    # pushed the triple product past 38 digits, which DuckDB resolves
    # by falling back to DOUBLE (order-dependent last-ulp drift in
    # sum_charge, observed at sf0.1)
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            (
                F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))
            )
            .cast("double")
            .alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_group_stats",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(MIN(o_orderdate) AS DATE) AS first_order,
           CAST(MAX(o_orderdate) AS DATE) AS last_order,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY o_custkey
    """,
    survey_ref="A1+A2 group stats & COUNT DISTINCT (sql/transforms/09-policies.sql:41-63)",
)
def agg_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key MIN/MAX/SUM/COUNT + COUNT(DISTINCT) -- the certificate
    group-stats pattern (one row per GroupId in the reference)."""
    # spread on the GROUPING key: parallelizes the single-split scan
    # AND satisfies the aggregation's distribution in one exchange
    o = spread(load_table(spark, sf_dir, "orders"), "o_custkey")
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_order"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        dsum("o_totalprice").alias("total_spend"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_discounted,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bulk,
           CAST(SUM(CASE WHEN l_tax = 0
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) / 100.0 AS DOUBLE)
             AS taxfree_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ref="A3 conditional aggregation (sql/transforms/08-analyze-conformance.sql:138-141)",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(CASE WHEN ...) conformance-count pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_discounted"),
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("n_bulk"),
        # exact integer-cents sum: avoids engine-specific double->decimal
        # halfway rounding (Spark HALF_UP vs DuckDB half-even)
        (
            F.sum(
                F.when(
                    F.col("l_tax") == 0,
                    F.round(F.col("l_extendedprice") * 100).cast("long"),
                ).otherwise(F.lit(0))
            )
            / 100.0
        )
        .cast("double")
        .alias("taxfree_price"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 2 AND COUNT(DISTINCT o_orderstatus) = 1
    """,
    survey_ref="A4 HAVING on agg (sql/transforms/06a-proposals-simple-groups.sql:82-92)",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-filtered aggregate: the 'single-config groups' pattern
    (HAVING COUNT(DISTINCT ConfigJson)=1)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderstatus").alias("n_status"),
        )
        .filter((F.col("n_orders") >= 2) & (F.col("n_status") == 1))
        .select("o_custkey", "n_orders")
    )


@query(
    "agg_string_agg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    survey_ref="A5 ordered STRING_AGG (sql/transforms/03-products.sql:135)",
)
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING_AGG(x, ',') WITHIN GROUP (ORDER BY x) == sorted
    collect_list joined -- the AllowedStates / structure-signature
    pattern."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "agg_dedup_normalized_key",
    oracle="""
    SELECT trim(p_type) AS norm_type, COUNT(*) AS n_parts,
           CAST(MIN(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS min_price
    FROM part
    GROUP BY trim(p_type)
    """,
    survey_ref="A6 dedup-by-normalized-key (sql/transforms/03-products.sql:208-217)",
)
def agg_dedup_normalized_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY LTRIM(RTRIM(...)): whitespace-insensitive dedupe."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy(F.trim(F.col("p_type")).alias("norm_type")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min(F.col("p_retailprice").cast(DEC)).cast("double").alias("min_price"),
    )


@query(
    "agg_min_per_key_prefiltered",
    oracle="""
    SELECT l_suppkey,
           CAST(MIN(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS min_pos_discount
    FROM lineitem
    WHERE l_discount > 0
    GROUP BY l_suppkey
    """,
    survey_ref="A7 MIN-per-key rate extraction (sql/calc/run-calculation.sql:265-273)",
)
def agg_min_per_key_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min positive value per key -- the certificate-level
    RealCommissionRate extraction pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_discount") > 0)
        .groupBy("l_suppkey")
        .agg(
            F.min(F.col("l_discount").cast(DEC)).cast("double").alias("min_pos_discount")
        )
    )


@query(
    "agg_conformance_banding",
    oracle="""
    WITH stats AS (
      SELECT o_custkey,
             COUNT(*) AS total,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS finished
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, total, finished,
           CAST(finished * 100.0 AS DOUBLE) / CAST(total AS DOUBLE)
             AS pct_finished,
           CASE WHEN CAST(finished * 100.0 AS DOUBLE) / CAST(total AS DOUBLE)
                     = 100.0 THEN 'FULL'
                WHEN CAST(finished * 100.0 AS DOUBLE) / CAST(total AS DOUBLE)
                     >= 50.0 THEN 'MAJORITY'
                ELSE 'MINORITY' END AS band
    FROM stats
    """,
    survey_ref="A9 conformance % + banding (sql/transforms/08-analyze-conformance.sql:132-169)",
)
def agg_conformance_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent = x*100.0/NULLIF(total,0) + 3-way CASE banding."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("finished"),
    )
    # pure double division on both sides: DuckDB's decimal `/` returns
    # DOUBLE via a different intermediate, so force double math here
    pct = (F.col("finished") * 100.0).cast("double") / F.col("total").cast("double")
    return stats.select(
        "o_custkey",
        "total",
        "finished",
        pct.alias("pct_finished"),
        F.when(pct == 100.0, "FULL")
        .when(pct >= 50.0, "MAJORITY")
        .otherwise("MINORITY")
        .alias("band"),
    )


@query(
    "agg_entropy_routing",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ), totals AS (
      SELECT user_id, SUM(c) AS total, COUNT(*) AS n_types
      FROM counts GROUP BY user_id
    )
    SELECT c.user_id,
           t.n_types,
           CAST(ROUND(-SUM((c.c * 1.0 / t.total) * log2(c.c * 1.0 / t.total)), 6)
                AS DOUBLE) AS entropy,
           CAST(MAX(c.c) * 1.0 / t.total AS DOUBLE) AS dominant_coverage
    FROM counts c JOIN totals t ON c.user_id = t.user_id
    GROUP BY c.user_id, t.n_types, t.total
    """,
    survey_ref="A10 group-config entropy routing (scripts/proposal-builder.ts:802-873)",
)
def agg_entropy_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy -sum(p*log2 p) per group over value distribution
    + dominant-cluster coverage: the builder's entropy-routing math as
    pure DataFrame aggregation (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("user_id").agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("c") * 1.0 / F.col("total")
    return (
        counts.join(totals, "user_id")
        .groupBy("user_id", "n_types", "total")
        .agg(
            F.round(-F.sum(p * F.log2(p)), 6).cast("double").alias("entropy"),
            (F.max("c") * 1.0 / F.col("total")).cast("double").alias(
                "dominant_coverage"
            ),
        )
        .select("user_id", "n_types", "entropy", "dominant_coverage")
    )


@query(
    "agg_collect_accumulate",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
             AS priorities,
           CAST(MIN(o_orderdate) AS DATE) AS date_from,
           CAST(MAX(o_orderdate) AS DATE) AS date_to
    FROM orders
    GROUP BY o_custkey
    """,
    survey_ref="A11 grouped set accumulation (scripts/proposal-builder.ts:886-1011)",
)
def agg_collect_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + min/max date accumulation: the proposal builder's
    per-(GroupId, ConfigHash) criteria merge. Emitted as a sorted
    joined string (not a raw array) so result canonicalizers can hash
    the cell; identical set semantics."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.min(F.col("o_orderdate").cast("date")).alias("date_from"),
        F.max(F.col("o_orderdate").cast("date")).alias("date_to"),
    )


@query(
    "agg_summary_union_counts",
    oracle="""
    SELECT 'orders' AS stage, COUNT(*) AS n FROM orders
    UNION ALL SELECT 'lineitem' AS stage, COUNT(*) AS n FROM lineitem
    UNION ALL SELECT 'customer' AS stage, COUNT(*) AS n FROM customer
    """,
    survey_ref="A12 summary UNION ALL of counts (sql/calc/run-calculation.sql:621-632)",
)
def agg_summary_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage row-count report as a union of counts."""
    dfs = []
    for name in ("orders", "lineitem", "customer"):
        t = load_table(spark, sf_dir, name)
        dfs.append(
            t.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit(name).alias("stage"), "n"
            )
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           quantile_cont(l_extendedprice, 0.99) AS p99_price,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="exact grouped percentiles (new surface beyond the "
    "reference): Spark percentile() and DuckDB quantile_cont share the "
    "R-7 linear-interpolation definition, verified bit-exact; at scale "
    "exact percentiles need the full sorted group (the documented "
    "trade-off vs approx_percentile's mergeable sketch)",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99_price"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ref="GROUP BY ROLLUP with GROUPING() markers (new surface "
    "beyond the reference's flat GROUP BYs): subtotal/grand-total "
    "levels in one pass — Spark expands the grouping sets before the "
    "exchange, so it stays a single combinable shuffle; exact DECIMAL "
    "accumulation, DOUBLE at the edge",
)
def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status", "revenue", "n"
    )


@query(
    "agg_pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_O
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="PIVOT (new surface): revenue and counts by returnflag "
    "pivoted across linestatus — explicit value list keeps the output "
    "schema static (a data-driven pivot needs a pre-pass to enumerate "
    "columns, a driver round-trip to avoid at scale); Catalyst rewrites "
    "pivot to exactly the oracle's conditional aggregation",
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(dec).cast("double").alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.coalesce("F_rev", F.lit(0.0)).alias("F"),
        F.coalesce("O_rev", F.lit(0.0)).alias("O"),
        F.coalesce("F_n", F.lit(0)).alias("n_F"),
        F.coalesce("O_n", F.lit(0)).alias("n_O"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS gR, GROUPING(l_linestatus) AS gS,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey_ref="§2.4 completeness: CUBE over (returnflag, linestatus) "
    "with GROUPING markers — all 4 aggregation levels in one pass "
    "(rollup and grouping-sets variants already registered); exact "
    "decimal accumulation",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus").agg(
            F.grouping("l_returnflag").cast("int").alias("gR"),
            F.grouping("l_linestatus").cast("int").alias("gS"),
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("qty"),
        )
        .select("l_returnflag", "l_linestatus", "gR", "gS", "n", "qty")
    )


@query(
    "agg_price_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) + 1 AS INT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
    survey_ref="§2.4 completeness: equal-width histogram (50k-wide buckets "
    "over [0, 600k)) — the profiling "
    "distribution pass, one combinable groupBy on a 14-value key; "
    "bucket boundaries are exactly-representable doubles so both "
    "engines bin identically",
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            (F.floor(F.col("o_totalprice") / 50000.0) + 1)
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: the equal-width histogram form (the
# quantile member of the sketch family next to HLL/KMV/count-min/Bloom)
# ---------------------------------------------------------------------------

_QH_BUCKETS = 1024
_QH_WIDTH = 600000.0 / _QH_BUCKETS  # 585.9375: exactly representable
_QH_QS = (0.5, 0.9, 0.99)


@query(
    "agg_quantile_sketch",
    oracle=f"""
    WITH hist AS (
      SELECT CAST(floor(o_totalprice / {_QH_WIDTH!r}) AS INT) AS bucket,
             COUNT(*) AS c
      FROM orders GROUP BY 1),
    shard_hist AS (
      SELECT o_orderkey % 2 AS shard,
             CAST(floor(o_totalprice / {_QH_WIDTH!r}) AS INT) AS bucket,
             COUNT(*) AS c
      FROM orders GROUP BY 1, 2),
    merged AS (
      SELECT bucket, CAST(SUM(c) AS BIGINT) AS c
      FROM shard_hist GROUP BY bucket),
    hist_match AS (
      SELECT CAST(MIN(CAST(m.c = h.c AS INT)) = 1 AS BOOLEAN) AS ok
      FROM merged m JOIN hist h USING (bucket)),
    cum AS (
      SELECT bucket, c,
             SUM(c) OVER (ORDER BY bucket
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER () AS n
      FROM merged),
    qs AS (SELECT unnest([{", ".join(str(q) for q in _QH_QS)}]) AS q),
    hits AS (
      SELECT q.q, c.bucket, c.c, c.cum - c.c AS cum_before, c.n,
             ROW_NUMBER() OVER (PARTITION BY q.q ORDER BY c.bucket) AS rn
      FROM qs q JOIN cum c ON c.cum >= q.q * c.n),
    est AS (
      SELECT q, n,
             round(bucket * {_QH_WIDTH!r}
               + (q * n - cum_before) / c * {_QH_WIDTH!r}, 6) AS estimate
      FROM hits WHERE rn = 1),
    exact AS (
      SELECT unnest([{", ".join(str(q) for q in _QH_QS)}]) AS q,
             unnest([quantile_cont(o_totalprice, 0.5),
                     quantile_cont(o_totalprice, 0.9),
                     quantile_cont(o_totalprice, 0.99)]) AS exact_q
      FROM orders)
    SELECT e.q, CAST(e.estimate AS DOUBLE) AS estimate,
           CAST(x.exact_q AS DOUBLE) AS exact_q,
           CAST(abs(e.estimate - x.exact_q) <= {_QH_WIDTH!r} AS BOOLEAN)
             AS within_bucket_bound,
           (SELECT ok FROM hist_match) AS merge_matches_direct
    FROM est e JOIN exact x USING (q)
    """,
    survey_ref="north-star: mergeable quantile sketch — equal-width "
    "1024-bucket histogram (bucket = floor(price/width), width an "
    "exactly-representable double so both engines bin identically), "
    "quantiles read by cumulative count + in-bucket linear "
    "interpolation. Error is bounded by ONE bucket width (emitted as "
    "a checked column against the exact R-7 percentile) and the "
    "sketch merges across shards by bucket-count SUM — proven "
    "identical to the direct build in the same output. The quantile "
    "member of the sketch family (HLL/KMV distinct, count-min "
    "frequency, Bloom membership): constant-size state where exact "
    "percentiles need the full sorted column",
)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / _QH_WIDTH).cast("int")
    hist = o.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("c"))
    shard_hist = o.groupBy(
        (F.col("o_orderkey") % 2).alias("shard"), bucket.alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))
    merged = shard_hist.groupBy("bucket").agg(F.sum("c").alias("c"))
    hist_match = (
        merged.join(hist.withColumnRenamed("c", "h_c"), "bucket")
        .agg(
            (F.min((F.col("c") == F.col("h_c")).cast("int")) == 1).alias("ok")
        )
    )
    cum = merged.select(
        "bucket",
        "c",
        F.sum("c")
        .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("c").over(W.orderBy(F.lit(1)).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing)).alias("n"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QH_QS])).alias("q")
    )
    hits = qs.join(cum, F.col("cum") >= F.col("q") * F.col("n")).select(
        "q",
        "bucket",
        "c",
        (F.col("cum") - F.col("c")).alias("cum_before"),
        "n",
        F.row_number()
        .over(W.partitionBy("q").orderBy("bucket"))
        .alias("rn"),
    )
    est = hits.filter(F.col("rn") == 1).select(
        "q",
        F.round(
            F.col("bucket") * _QH_WIDTH
            + (F.col("q") * F.col("n") - F.col("cum_before"))
            / F.col("c")
            * _QH_WIDTH,
            6,
        ).alias("estimate"),
    )
    exact = o.agg(
        *[
            F.expr(f"percentile(o_totalprice, {q})").alias(f"x{i}")
            for i, q in enumerate(_QH_QS)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(q).alias("q"), F.col(f"x{i}").alias("exact_q"))
                    for i, q in enumerate(_QH_QS)
                ]
            )
        ).alias("s")
    ).select("s.q", "s.exact_q")
    return (
        est.join(exact, "q")
        .crossJoin(hist_match)
        .select(
            "q",
            F.col("estimate").cast("double").alias("estimate"),
            F.col("exact_q").cast("double").alias("exact_q"),
            (F.abs(F.col("estimate") - F.col("exact_q")) <= _QH_WIDTH).alias(
                "within_bucket_bound"
            ),
            F.col("ok").alias("merge_matches_direct"),
        )
    )
