"""Join operators (SURVEY.md §2.3 J1-J15) over the testdata star schema.

Physical-plan stance for 100 TB:
- equi-joins on fact tables -> shuffle hash / sort-merge on the key,
  chosen by Catalyst + AQE;
- every dim-side (nation, region, derived rate/band tables) is small
  -> explicitly ``F.broadcast`` so the fact side never shuffles;
- date-band / theta predicates ride as residual filters on an equi or
  broadcast join -- never a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import query
from ..sources.testdata import load_table

DEC = "decimal(18,6)"


@query(
    "join_inner_equi",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    survey_ref="J1 inner equi-join enrichment (sql/calc/run-calculation.sql:76)",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dim enrichment (premiums ⋈ policies shape)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "join_left_with_error_capture",
    oracle="""
    SELECT o.o_orderkey,
           c.c_name,
           CASE WHEN c.c_custkey IS NULL
                THEN 'ERROR: no matching premium customer' END AS error_message
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o.o_custkey = c.c_custkey
    """,
    survey_ref="J2 left join w/ NULL->ErrorMessage (sql/calc/run-calculation.sql:105-110)",
)
def join_left_with_error_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join where a miss produces a diagnostic message column
    instead of dropping the row (stage-2 proposal resolution shape)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        "c_name",
        F.when(
            F.col("c_custkey").isNull(), "ERROR: no matching premium customer"
        ).alias("error_message"),
    )


@query(
    "join_date_band",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
           CASE WHEN l.l_shipdate >= o.o_orderdate
                 AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
                THEN 1 ELSE 0 END AS in_band
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
      AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
    """,
    survey_ref="J3 date-band join: equi key + BETWEEN residual (run-calculation.sql:108-110)",
)
def join_date_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TransactionDate BETWEEN EffectiveFrom AND EffectiveTo composed
    with an equi key: stays a hash/sort-merge join on the equi key with
    the band as residual filter (check .explain(): no BNLJ)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.date_add(o.o_orderdate.cast("date"), 60))
    )
    return li.join(o, cond).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderpriority",
        F.lit(1).alias("in_band"),
    )


@query(
    "join_numeric_band_theta",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
      VALUES ('small', 1, 15), ('medium', 16, 35), ('large', 36, 50)
    )
    SELECT b.band_name, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM part p
    JOIN bands b ON p.p_size >= b.lo AND p.p_size <= b.hi
    GROUP BY b.band_name
    """,
    survey_ref="J4 numeric-band theta join vs broadcast dim (run-calculation.sql:296-297)",
)
def join_numeric_band_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupSize BETWEEN [from, to] against a broadcast band dim: a
    pure theta join that is safe because the build side is tiny
    (broadcast nested-loop over 3 rows, scan stays partition-parallel)."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("small", 1, 15), ("medium", 16, 35), ("large", 36, 50)],
        "band_name string, lo int, hi int",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_size >= bands.lo) & (p.p_size <= bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast(DEC)).cast("double").alias("total_price"),
        )
    )


@query(
    "join_fanout_split",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber,
           CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,6))
                      * CAST(l.l_discount AS DECIMAL(18,6)), 2) AS DOUBLE)
             AS split_amount
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    survey_ref="J5 1:N expanding join + per-row money math (run-calculation.sql:125-147)",
)
def join_fanout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Premium x split-participants row explosion with
    ROUND(amt*pct, 2) per expanded row (calc stage 3 shape)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey",
        "l_linenumber",
        F.round(
            F.col("o_totalprice").cast(DEC) * F.col("l_discount").cast(DEC), 2
        )
        .cast("double")
        .alias("split_amount"),
    )


@query(
    "join_rate_fallback",
    oracle="""
    WITH supp_rate AS (
      SELECT l_suppkey AS k,
             MIN(CAST(l_discount AS DECIMAL(18,6))) AS rate
      FROM lineitem WHERE l_discount > 0 GROUP BY l_suppkey
    ), part_rate AS (
      SELECT l_partkey AS k,
             MAX(CAST(l_tax AS DECIMAL(18,6))) AS rate
      FROM lineitem WHERE l_tax > 0 GROUP BY l_partkey
    )
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(COALESCE(s.rate, p.rate, 0) AS DOUBLE) AS applied_rate,
           CASE WHEN s.rate IS NOT NULL THEN 'SupplierRate'
                WHEN p.rate IS NOT NULL THEN 'PartRate'
                ELSE 'NoRate' END AS rate_source
    FROM lineitem l
    LEFT JOIN supp_rate s ON l.l_suppkey = s.k
    LEFT JOIN part_rate p ON l.l_partkey = p.k
    """,
    survey_ref="J6 multi-fallback rate lookup + RateSource tag (run-calculation.sql:248-297)",
)
def join_rate_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE(certRate, participantRate, scheduleRate, 0) with a
    provenance tag, via two broadcast left joins against aggregated
    rate dims (calc stage 6 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp_rate = (
        li.filter(F.col("l_discount") > 0)
        .groupBy(F.col("l_suppkey").alias("k"))
        .agg(F.min(F.col("l_discount").cast(DEC)).alias("s_rate"))
    )
    part_rate = (
        li.filter(F.col("l_tax") > 0)
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.max(F.col("l_tax").cast(DEC)).alias("p_rate"))
    )
    return (
        li.join(F.broadcast(supp_rate), li.l_suppkey == supp_rate.k, "left")
        .join(F.broadcast(part_rate), li.l_partkey == part_rate.k, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.coalesce(F.col("s_rate"), F.col("p_rate"), F.lit(0).cast(DEC))
            .cast("double")
            .alias("applied_rate"),
            F.when(F.col("s_rate").isNotNull(), "SupplierRate")
            .when(F.col("p_rate").isNotNull(), "PartRate")
            .otherwise("NoRate")
            .alias("rate_source"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
    survey_ref="J7 semi-join membership (sql/transforms/00-references.sql:139)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE x IN (SELECT ...) as left_semi (no row duplication)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_idempotent_insert",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    survey_ref="J8 anti-join dedup insert (sql/transforms/00-references.sql:79-82)",
)
def join_anti_idempotent_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS before INSERT == left_anti: the reference's
    idempotent-insert pattern (and the export sink's missing-rows
    filter, S9)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_argmax_top1",
    oracle="""
    SELECT o_custkey, o_orderkey AS best_orderkey,
           CAST(o_totalprice AS DOUBLE) AS best_price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    survey_ref="J9/O1 correlated TOP-1 subquery -> window argmax (sql/transforms/02-groups.sql:127-128)",
)
def join_argmax_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's correlated 'TOP 1 ... ORDER BY priority' per
    outer row, decorrelated into one window pass (no per-row probe)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("best_orderkey"),
            F.col("o_totalprice").cast("double").alias("best_price"),
        )
    )


@query(
    "join_lateral_count",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COUNT(*) OVER (PARTITION BY l_orderkey) AS n_participants,
           CAST(ROUND(CAST(100 AS DECIMAL(18,6))
                      / COUNT(*) OVER (PARTITION BY l_orderkey), 4) AS DOUBLE)
             AS equal_split_pct
    FROM lineitem
    """,
    survey_ref="J10 CROSS APPLY per-row count -> window count (08-hierarchy-splits.sql:313-317)",
)
def join_lateral_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS APPLY (SELECT COUNT(*) ...) == window count; feeds the
    equal-split fallback percent (100/N)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey")
    n = F.count(F.lit(1)).over(w)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        n.alias("n_participants"),
        F.round(F.lit(100).cast(DEC) / n, 4).cast("double").alias("equal_split_pct"),
    )


@query(
    "join_fallback_chain_multisource",
    oracle="""
    SELECT o.o_orderkey,
           COALESCE(n1.n_name, n2.n_name, 'UNKNOWN') AS resolved_nation
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 7000) c1
      ON o.o_custkey = c1.c_custkey
    LEFT JOIN nation n1 ON c1.c_nationkey = n1.n_nationkey
    LEFT JOIN customer c2 ON o.o_custkey = c2.c_custkey
    LEFT JOIN nation n2 ON c2.c_nationkey = n2.n_nationkey
    """,
    survey_ref="J12 multi-source fallback join chain (sql/transforms/02-groups.sql:102-134)",
)
def join_fallback_chain_multisource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """perf-group -> premium -> certificate state-priority chain:
    N left joins + COALESCE in priority order."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    c1 = cust.filter(F.col("c_acctbal") > 7000).select(
        F.col("c_custkey").alias("c1_key"), F.col("c_nationkey").alias("c1_nation")
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("n1_name")
    )
    c2 = cust.select(
        F.col("c_custkey").alias("c2_key"), F.col("c_nationkey").alias("c2_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("n2_name")
    )
    return (
        o.join(F.broadcast(c1), o.o_custkey == c1.c1_key, "left")
        .join(F.broadcast(n1), F.col("c1_nation") == F.col("n1_key"), "left")
        .join(c2, o.o_custkey == c2.c2_key, "left")
        .join(F.broadcast(n2), F.col("c2_nation") == F.col("n2_key"), "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("n1_name"), F.col("n2_name"), F.lit("UNKNOWN")).alias(
                "resolved_nation"
            ),
        )
    )


@query(
    "join_same_dim_twice",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           ns.n_name AS supplier_nation,
           nc.n_name AS customer_nation
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    """,
    survey_ref="J13 self-lookup of one dim twice (scripts/proposal-builder.ts:2139-2144)",
)
def join_same_dim_twice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brokers b / Brokers pb: the same dimension joined twice under
    different aliases in one plan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    ns = nat.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supplier_nation")
    )
    nc = nat.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("customer_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .select("l_orderkey", "l_linenumber", "supplier_nation", "customer_nation")
    )


@query(
    "join_wildcard_key",
    oracle="""
    WITH mapping(brand, bonus) AS (
      VALUES ('Brand#1', 10), ('Brand#2', 20), ('*', 1)
    )
    SELECT p.p_partkey, m.brand AS matched_brand, m.bonus
    FROM part p
    JOIN mapping m ON (m.brand = p.p_brand OR m.brand = '*')
    """,
    survey_ref="J14 key-mapping join with '*' wildcard (sql/transforms/09-policies.sql:133-137)",
)
def join_wildcard_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(m.PlanCode = pol.PlanCode OR m.PlanCode = '*'): wildcard rows
    match everything; exact rows add on top. Broadcast keeps the OR
    condition cheap (nested loop over a 3-row build side)."""
    p = load_table(spark, sf_dir, "part")
    mapping = spark.createDataFrame(
        [("Brand#1", 10), ("Brand#2", 20), ("*", 1)], "brand string, bonus int"
    )
    return p.join(
        F.broadcast(mapping),
        (mapping.brand == p.p_brand) | (mapping.brand == "*"),
    ).select("p_partkey", F.col("brand").alias("matched_brand"), "bonus")


@query(
    "join_closest_year",
    oracle="""
    WITH catalog(cat_year, cat_name) AS (
      VALUES (1993, 'series-93'), (1996, 'series-96'), (1998, 'series-98')
    ), ranked AS (
      SELECT o.o_orderkey, c.cat_name,
             ROW_NUMBER() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY ABS(c.cat_year - EXTRACT(YEAR FROM o.o_orderdate)),
                        c.cat_year
             ) AS rn
      FROM orders o CROSS JOIN catalog c
    )
    SELECT o_orderkey, cat_name AS closest_series FROM ranked WHERE rn = 1
    """,
    survey_ref="J15 closest-year fuzzy join (sql/transforms/09-policies.sql:158-180)",
)
def join_closest_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank candidates by ABS(year distance), keep rn=1 -- the
    reference's fuzzy schedule-year match. Candidate set is a tiny
    broadcast; the window does the per-row TOP 1."""
    o = load_table(spark, sf_dir, "orders")
    catalog = spark.createDataFrame(
        [(1993, "series-93"), (1996, "series-96"), (1998, "series-98")],
        "cat_year int, cat_name string",
    )
    w = W.partitionBy("o_orderkey").orderBy(
        F.abs(F.col("cat_year") - F.year("o_orderdate")), F.col("cat_year")
    )
    return (
        o.crossJoin(F.broadcast(catalog))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", F.col("cat_name").alias("closest_series"))
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT s.s_nationkey,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
    survey_ref="§4 custom-work 4 skew handling: salted equi-join "
    "(big side salted, small side exploded across 16 salts) with "
    "result identical to the plain join — the explicit second line of "
    "defense behind AQE skew splitting (operators/skew.py)",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting changes the physical shuffle layout, never the result:
    the oracle is the PLAIN join+agg."""
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(
        li, s.withColumnRenamed("s_suppkey", "l_suppkey"), ["l_suppkey"],
        salts=16,
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
    )


@query(
    "join_fuzzy_name_levenshtein",
    oracle="""
    WITH names AS (
      SELECT DISTINCT s_name FROM supplier),
    probes AS (
      SELECT * FROM (VALUES
        ('Supplier#000000001'), ('Suplier#000000002'),
        ('Supplier#00000003x'), ('SUPPLIER#000000004')) AS t(dirty)),
    scored AS (
      SELECT p.dirty, n.s_name,
             levenshtein(p.dirty, n.s_name) AS dist
      FROM probes p CROSS JOIN names n),
    best AS (
      SELECT dirty, s_name, dist,
             ROW_NUMBER() OVER (PARTITION BY dirty
               ORDER BY dist, s_name) AS rn
      FROM scored)
    SELECT dirty, s_name AS matched_name, dist
    FROM best WHERE rn = 1 AND dist <= 3
    """,
    survey_ref="fuzzy name match via edit distance (generalizes J15's "
    "closest-year fuzzy join to strings): tiny probe list broadcast "
    "against the name dim, per-probe argmin with deterministic "
    "tie-break, distance-capped; at scale the probe side is the small "
    "side by construction (a cleanup worklist)",
)
def join_fuzzy_name_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").select("s_name").distinct()
    probes = sup.sparkSession.createDataFrame(
        [
            ("Supplier#000000001",),
            ("Suplier#000000002",),
            ("Supplier#00000003x",),
            ("SUPPLIER#000000004",),
        ],
        "dirty string",
    )
    scored = sup.crossJoin(F.broadcast(probes)).select(
        "dirty",
        "s_name",
        F.levenshtein("dirty", "s_name").alias("dist"),
    )
    w = W.partitionBy("dirty").orderBy("dist", "s_name")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("dist") <= 3))
        .select("dirty", F.col("s_name").alias("matched_name"), "dist")
    )


@query(
    "join_interval_bucketed",
    oracle="""
    SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
          FROM orders
          WHERE CAST(o_orderdate AS DATE) >= DATE '1995-03-01'
            AND CAST(o_orderdate AS DATE) <  DATE '1995-04-01') o
    JOIN (SELECT l_orderkey, l_linenumber,
                 CAST(l_shipdate AS DATE) AS s,
                 CAST(l_shipdate AS DATE)
                   + CAST(3 + (l_orderkey + l_linenumber) % 11 AS INT) AS r
          FROM lineitem) l
      ON o.d >= l.s AND o.d <= l.r
    """,
    survey_ref="custom operator (new surface): BIG-BIG point-in-interval "
    "join with no equi key — the theta predicate is converted to an "
    "equi-join by exploding each interval into its covered days "
    "(bounded width, here <= 14), so the plan is a plain hash join on "
    "the day bucket instead of a nested-loop scan. J3's residual-band "
    "trick needs an equi key and J4 needs a broadcastable side; this "
    "is the remaining case where BOTH sides are fact-scale",
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via day-bucket explode: each (interval, covered
    day) row joins point rows on day equality. Each matching pair
    appears exactly once (a point has one day; an interval covers each
    day once), so no dedup pass. At 100 TB the explode factor is the
    interval width bound — a 14-day cap costs <= 14x on the interval
    side but keeps every join task hash-partitioned and skew-safe."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1995-03-01").cast("date")
    hi = F.lit("1995-04-01").cast("date")
    pts = (
        o.select("o_orderkey", F.col("o_orderdate").cast("date").alias("d"))
        .filter((F.col("d") >= lo) & (F.col("d") < hi))
    )
    iv = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("s"),
    ).withColumn(
        "r",
        F.expr(
            "date_add(s, CAST(3 + (l_orderkey + l_linenumber) % 11 AS INT))"
        ),
    )
    days = iv.withColumn("d", F.explode(F.sequence("s", "r")))
    return pts.join(days, "d").select(
        "o_orderkey", "l_orderkey", "l_linenumber"
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered exact semi-join: the build-side key set is compacted
# into a tiny bitmap that rides the scan closure and prunes the fact
# BEFORE any shuffle; an exact semi-join then removes the bloom's false
# positives, so the RESULT is identical to the plain semi-join (which is
# exactly what the oracle checks). This is the explicit form of the
# runtime-bloom pushdown Spark injects at production thresholds
# (PLANS.md invariant) -- here the sketch is engine-deterministic.
# ---------------------------------------------------------------------------

_JBLOOM_BITS = 4096  # 128 x 32-bit words in BIGINT cells
_JBLOOM_K = 2


@query(
    "join_bloom_semi_prefilter",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment = 'BUILDING')""",
    survey_ref="custom operator (new surface): bloom-prefiltered exact "
    f"semi-join -- the dim key set compacts to a {_JBLOOM_BITS}-bit / "
    f"{_JBLOOM_K}-hash bitmap (one aggregation, 128 BIGINT words) that "
    "is collected once and evaluated INSIDE the fact scan projection, "
    "so non-matching fact rows die before the shuffle; the exact "
    "broadcast semi-join afterwards removes false positives, making "
    "the result provably identical to the plain semi-join (the oracle "
    "IS the plain semi-join). At 100 TB this is the explicit form of "
    "runtime bloom pushdown: sketch size is constant in the fact size "
    "and the prefilter runs at full scan speed in codegen",
)
def join_bloom_semi_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    keys = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )

    def pos(i: int, col: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(str(i)), F.col(col).cast("string"))),
                    1,
                    3,
                ),
                16,
                10,
            ).cast("int")
            % _JBLOOM_BITS
        )

    bits = None
    for i in range(_JBLOOM_K):
        part = keys.select(
            F.shiftright(pos(i, "k"), 5).alias("word"),
            pos(i, "k").bitwiseAND(F.lit(31)).alias("bit"),
        )
        bits = part if bits is None else bits.unionByName(part)
    bloom_rows = (
        bits.groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("bits"))
        .collect()
    )
    # materialize the sketch as a literal array in the scan closure --
    # 128 longs, the one driver round-trip a bloom build costs (the
    # same shape Spark's own runtime bloom pushdown broadcasts)
    words = [0] * (_JBLOOM_BITS // 32)
    for r in bloom_rows:
        words[r["word"]] = r["bits"]
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    candidates = o
    for i in range(_JBLOOM_K):
        p = pos(i, "o_custkey")
        word_val = F.element_at(arr, (F.shiftright(p, 5) + 1).cast("int"))
        candidates = (
            candidates.withColumn(f"__w{i}", word_val)
            .withColumn(f"__b{i}", p.bitwiseAND(F.lit(31)))
            .filter(F.expr(f"(shiftright(__w{i}, __b{i}) & 1) = 1"))
            .drop(f"__w{i}", f"__b{i}")
        )
    return candidates.join(
        F.broadcast(keys), candidates.o_custkey == keys.k, "left_semi"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
