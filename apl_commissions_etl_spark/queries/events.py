"""Sequence analytics over the event stream: funnel conversion,
cohort retention, event-transition matrix. New surface beyond the
reference (its event data lives in run logs it never queries) — the
standard product-analytics operators an engine at this scale is asked
for, each a clean composition of window/agg primitives.

Scale notes: every query here shuffles on user_id exactly once (the
per-user min/first aggregations) and the follow-up joins reuse that
partitioning; cohort/transition outputs are day/type-cardinality
(tiny). Timestamps are microsecond integers in both engines, so
interval arithmetic and datediff are exact — no float drift anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table, spread

#: funnel step window: each step must follow the previous within 24h
STEP_HOURS = 24


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread on user_id (guide §2.5): the single-row-group fixture scan
    # otherwise runs each consumer's first stage as ONE task, and every
    # consumer here (funnels, sessionization, as-of, transitions)
    # windows or aggregates per user — the spread exchange doubles as
    # their required distribution. No-op on a multi-split table.
    return spread(load_table(spark, sf_dir, "events"), "user_id")


def _funnel_users(e: DataFrame) -> DataFrame:
    """Per user: earliest signup t1, earliest click in (t1, t1+24h],
    earliest purchase in (t2, t2+24h] — min-qualifying-timestamp
    funnel semantics (ties resolved by MIN, deterministic)."""
    t1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    step = F.expr(f"INTERVAL {STEP_HOURS} HOURS")
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + step))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + step))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select("user_id", "t1", "t2", "t3")
    )


_FUNNEL_SQL = f"""
t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click'
    AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL {STEP_HOURS} HOURS
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > t2.t2 AND e.ts <= t2.t2 + INTERVAL {STEP_HOURS} HOURS
  GROUP BY e.user_id)
"""


@query(
    "seq_funnel_users",
    oracle=f"""
    WITH {_FUNNEL_SQL}
    SELECT t1.user_id, t1.t1, t2.t2, t3.t3
    FROM t1
    LEFT JOIN t2 ON t2.user_id = t1.user_id
    LEFT JOIN t3 ON t3.user_id = t1.user_id
    """,
    survey_ref="sequence analytics (new surface): 3-step funnel "
    "signup -> click -> purchase, each step within 24h of the previous; "
    "min-qualifying timestamps per user, one user_id shuffle reused by "
    "every step join",
)
def seq_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _funnel_users(_events(spark, sf_dir))


@query(
    "seq_funnel_summary",
    oracle=f"""
    WITH {_FUNNEL_SQL}
    SELECT 'step1_signup' AS stage, COUNT(*) AS n_users FROM t1
    UNION ALL SELECT 'step2_click', COUNT(*) FROM t2
    UNION ALL SELECT 'step3_purchase', COUNT(*) FROM t3
    """,
    survey_ref="sequence analytics (new surface): funnel stage counts "
    "(the conversion report over seq_funnel_users)",
)
def seq_funnel_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _funnel_users(_events(spark, sf_dir))
    out = None
    for stage, col in (
        ("step1_signup", "t1"),
        ("step2_click", "t2"),
        ("step3_purchase", "t3"),
    ):
        part = f.filter(F.col(col).isNotNull()).agg(
            F.count(F.lit(1)).alias("n_users")
        ).select(F.lit(stage).alias("stage"), "n_users")
        out = part if out is None else out.unionByName(part)
    return out


@query(
    "seq_cohort_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id)
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first_day f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    survey_ref="sequence analytics (new surface): cohort retention "
    "matrix — first-activity-day cohorts x day offset x distinct "
    "actives; first_day is user-cardinality (NOT broadcastable at "
    "scale), so the join stays hash-partitioned on user_id and reuses "
    "the aggregation's own shuffle; AQE may still broadcast small SFs",
)
def seq_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    first_day = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    return (
        e.join(first_day, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "seq_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type, next_type, COUNT(*) AS n_transitions
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    survey_ref="sequence analytics (new surface): event transition "
    "matrix via per-user LEAD (W4's window machinery turned into a "
    "Markov edge count; event_id tie-break for same-timestamp rows)",
)
def seq_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "seq_asof_attribution",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts AS click_ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts),
    purchases AS (
      SELECT user_id, event_id, ts
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts,
           c.click_event_id, c.click_ts,
           CAST(date_diff('microsecond', c.click_ts, p.ts) AS BIGINT)
             AS lag_us
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    survey_ref="custom operator (new surface): backward as-of join — "
    "each purchase attributed to the most recent click at-or-before it "
    "per user. Spark lacks ASOF JOIN, so it is re-expressed as a "
    "union-marker window scan (one user_id shuffle, O(n log n)) "
    "instead of the naive per-user range theta-join (O(n^2) per hot "
    "user); DuckDB's native ASOF LEFT JOIN is the oracle",
)
def seq_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (merge_asof-style) join via the union-marker trick.

    Clicks are first deduped to one per (user, ts) (MAX event_id — the
    same tie rule ASOF resolves to after the dedup), then clicks and
    purchases are unioned into one stream ordered by (ts, side) with
    clicks first at equal timestamps; a running ``last(..., ignorenulls)``
    window carries the latest click attributes forward onto each
    purchase row. One shuffle, no range-join explosion, and the window
    frame is growing-only so Spark streams it without buffering whole
    partitions.
    """
    from ..operators.asof import asof_join_backward

    # raw scan, NOT the spread accessor (r13): this query unions two
    # filtered subtrees, so the shared spread's REPARTITION exchange is
    # re-derived per branch AND the union still needs its own user_id
    # exchange for the marker window (union never reports a child
    # partitioning) — the spread bought nothing and shuffled the full
    # event table twice (plan: 3 Exchange -> 2, and the remaining two
    # move only clicks / clicks+purchases, guide §2.3/§2.4)
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join_backward(
        purchases,
        clicks,
        by="user_id",
        left_on="ts",
        right_on="ts",
        right_cols=["event_id"],
        tie_break="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_asof").alias("click_event_id"),
        F.col("ts_asof").alias("click_ts"),
        F.expr("timestampdiff(MICROSECOND, ts_asof, ts)").alias("lag_us"),
    )


@query(
    "agg_time_bucket_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) / 1e6
                AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    survey_ref="new surface: hypertable-style continuous aggregate — "
    "time_bucket(1h) x event_type rollup (count / exact distinct / "
    "sum / min / max). Sum goes through integer micro-units "
    "(floor(x*1e6+0.5)) so it is order-independent and halfway-rule "
    "identical across engines; the single groupBy is a map-side "
    "partial-combinable shuffle on (bucket, type) — the natural "
    "pre-aggregation a downstream dashboard reads instead of raw "
    "events at 100 TB",
)
def agg_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (
                F.sum(F.floor(F.col("value") * 1e6 + 0.5).cast("long")) / 1e6
            ).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "win_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('microsecond', LAG(ts) OVER w, ts)
                      > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked)
    SELECT user_id, CAST(session_seq AS INT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_us
    FROM numbered GROUP BY user_id, session_seq
    """,
    survey_ref="new surface: batch sessionization — 30-min-gap session "
    "ids via LAG + running SUM (the batch twin of "
    "stream_session_window). One user_id shuffle feeds the two stacked "
    "windows AND the final per-session aggregation (same partitioning, "
    "no re-exchange); frames are growing-only so nothing buffers",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle > 30 minutes. LAG marks boundaries, a running sum numbers
    sessions, then a per-(user, session) aggregate emits bounds."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    marked = e.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("prev_ts").isNull() | (gap_us > 1_800_000_000), 1
        ).otherwise(0).alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "ts",
        F.sum("new_session").over(run).cast("int").alias("session_seq"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "timestampdiff(MICROSECOND, min(ts), max(ts))"
        ).alias("duration_us"),
    )


@query(
    "seq_props_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT))
             AS n_distinct_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    """,
    survey_ref="§2.8 JSON fns over the event stream: semi-structured "
    "props shredded in the scan projection (get_json_object stays "
    "inside codegen — no UDF, no parse-to-struct materialization) and "
    "rolled up by type; the J11/OPENJSON machinery applied to "
    "event-analytics shape",
)
def seq_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("long").alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.countDistinct(k).alias("n_distinct_k"),
        )
    )


@query(
    "win_scd2_versions",
    oracle="""
    WITH chg AS (
      SELECT user_id, ts, event_type,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    versions AS (
      SELECT user_id, event_type, ts AS valid_from,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts)
               AS version_n
      FROM chg
      WHERE prev_type IS NULL OR prev_type <> event_type),
    closed AS (
      SELECT user_id, event_type, valid_from, version_n,
             LEAD(valid_from) OVER (PARTITION BY user_id
               ORDER BY valid_from) AS valid_to
      FROM versions)
    SELECT user_id, CAST(version_n AS INT) AS version_n, event_type,
           valid_from, valid_to,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM closed
    """,
    survey_ref="new surface: SCD2 dimension versioning from a change "
    "log — collapse consecutive duplicates (LAG), number the versions, "
    "close each interval with LEAD, flag the open row as current. The "
    "warehouse history-table op the reference's truncate-and-reload "
    "dims lack; both windows and the collapse share ONE user_id "
    "exchange",
)
def win_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    wv = Window.partitionBy("user_id").orderBy("ts")
    versions = chg.select(
        "user_id",
        F.row_number().over(wv).cast("int").alias("version_n"),
        "event_type",
        F.col("ts").alias("valid_from"),
    )
    wc = Window.partitionBy("user_id").orderBy("valid_from")
    return versions.select(
        "user_id",
        "version_n",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wc).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@query(
    "seq_gap_fill_daily",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
      FROM events),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1)
    SELECT s.day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           CAST(d.n_events IS NULL AS BOOLEAN) AS is_gap
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
    survey_ref="new surface: calendar gap-fill — a generated date spine "
    "left-joined to the sparse daily rollup, zero-filling missing days "
    "(dense time series for charts/anomaly windows). The spine is "
    "sequence+explode over the observed bounds (two-row broadcast), "
    "so the fill costs one spine-sized join however large the fact is",
)
def seq_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
    )


@query(
    "seq_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    roll AS (
      SELECT event_type, bucket, c,
             SUM(c) OVER w AS s,
             SUM(c * c) OVER w AS ss,
             COUNT(c) OVER w AS n
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
    z AS (
      SELECT event_type, bucket, c,
             CAST(n AS BIGINT) AS n_baseline,
             CAST(round(s * 1.0 / n, 6) AS DOUBLE) AS baseline_mean,
             CAST(round(
               CASE WHEN ss * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n) > 0
                    THEN (c - s * 1.0 / n)
                         / sqrt(ss * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n))
                    ELSE 0 END, 6) AS DOUBLE) AS zscore
      FROM roll WHERE n >= 8)
    SELECT event_type, bucket, c AS n_events, n_baseline, baseline_mean,
           zscore, CAST(ABS(zscore) > 3.0 AS BOOLEAN) AS is_anomaly
    FROM z
    """,
    survey_ref="new surface: rolling z-score anomaly detection over "
    "the hourly event-count series -- trailing-24-bucket mean/variance "
    "per event type from ONE window pass (SUM, SUM of squares, COUNT "
    "share the frame), z computed in pure IEEE double arithmetic with "
    "the identical expression both engines (sqrt is correctly rounded "
    "per IEEE so it cannot drift), 6-dp rounding absorbs association "
    "order, and the anomaly flag derives from the ROUNDED value. The "
    "hourly pre-aggregation is the only shuffle; the window adds one "
    "type-partitioned exchange over bucket-cardinality rows -- at "
    "100 TB this runs on the continuous aggregate, never the raw "
    "events",
)
def seq_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-24, -1)
    )
    roll = hourly.select(
        "event_type",
        "bucket",
        "c",
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("ss"),
        F.count("c").over(w).alias("n"),
    ).filter(F.col("n") >= 8)
    mean = F.col("s") * 1.0 / F.col("n")
    var = F.col("ss") * 1.0 / F.col("n") - mean * mean
    zscore = F.round(
        F.when(var > 0, (F.col("c") - mean) / F.sqrt(var)).otherwise(0.0), 6
    ).cast("double")
    return roll.select(
        "event_type",
        "bucket",
        F.col("c").alias("n_events"),
        F.col("n").alias("n_baseline"),
        F.round(mean, 6).cast("double").alias("baseline_mean"),
        zscore.alias("zscore"),
        (F.abs(zscore) > 3.0).alias("is_anomaly"),
    )


@query(
    "cdc_apply_changelog",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'delete'
                  WHEN event_type = 'signup' THEN 'insert'
                  ELSE 'update' END AS op,
             value
      FROM events),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_changes
      FROM log)
    SELECT user_id, op AS last_op, ts AS updated_at,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
           n_changes
    FROM ranked
    WHERE rn = 1 AND op <> 'delete'""",
    survey_ref="new surface: CDC changelog apply — a Debezium/Delta-"
    "CDF-shaped change stream (insert/update/delete tombstone derived "
    "from event_type) collapsed to the current table state: "
    "last-writer-wins per key by (ts, event_id) sequence, tombstoned "
    "keys dropped. One W3 keep-latest window; the change count rides "
    "the same key exchange. This is the read-side of "
    "export_merge_upsert: MERGE applies a batch to a target, this "
    "derives the target from the log alone (the replayable-source "
    "contract); at 100 TB the log is bucketed by key and the window "
    "is shuffle-free",
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    log = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "delete")
        .when(F.col("event_type") == "signup", "insert")
        .otherwise("update")
        .alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    ranked = log.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_changes"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("op") != "delete")).select(
        "user_id",
        F.col("op").alias("last_op"),
        F.col("ts").alias("updated_at"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("value"),
        "n_changes",
    )


@query(
    "agg_partial_merge",
    oracle="""
    WITH shard AS (
      SELECT user_id % 100 AS bucket, event_id % 2 AS shard_id,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             MIN(ts) AS min_ts, MAX(ts) AS max_ts
      FROM events GROUP BY 1, 2),
    merged AS (
      SELECT bucket,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents,
             MIN(min_ts) AS min_ts, MAX(max_ts) AS max_ts
      FROM shard GROUP BY bucket),
    direct AS (
      SELECT user_id % 100 AS bucket, COUNT(*) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             MIN(ts) AS min_ts, MAX(ts) AS max_ts
      FROM events GROUP BY 1)
    SELECT m.bucket, m.n, m.cents, m.min_ts, m.max_ts,
           CAST(m.n = d.n AND m.cents = d.cents
                AND m.min_ts = d.min_ts AND m.max_ts = d.max_ts
                AS BOOLEAN) AS matches_direct
    FROM merged m JOIN direct d USING (bucket)""",
    survey_ref="new surface: partial-aggregate state merge — per-shard "
    "aggregate states (count / integer-cents sum / min / max) merged "
    "into the global result and PROVEN equal to the direct "
    "aggregation in the same output (matches_direct all true). This "
    "is the algebraic-mergeability contract every 100 TB rollup "
    "rests on (map-side combine, incremental daily->monthly "
    "re-aggregation, cross-datacenter shard merge): sums stay exact "
    "integers so the merge is associative; the same property the "
    "sketch family (KMV/HLL/count-min/Bloom) extends to "
    "non-algebraic measures",
)
def agg_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    cents = F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")

    def stats(df: DataFrame, keys: list) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            cents,
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )

    base = e.select(
        (F.col("user_id") % 100).alias("bucket"),
        (F.col("event_id") % 2).alias("shard_id"),
        "value",
        "ts",
    )
    shard = stats(base, ["bucket", "shard_id"])
    merged = shard.groupBy("bucket").agg(
        F.sum("n").alias("n"),
        F.sum("cents").alias("cents"),
        F.min("min_ts").alias("min_ts"),
        F.max("max_ts").alias("max_ts"),
    )
    direct = stats(base, ["bucket"]).withColumnsRenamed(
        {"n": "d_n", "cents": "d_cents", "min_ts": "d_min", "max_ts": "d_max"}
    )
    return merged.join(direct, "bucket").select(
        "bucket", "n", "cents", "min_ts", "max_ts",
        (
            (F.col("n") == F.col("d_n"))
            & (F.col("cents") == F.col("d_cents"))
            & (F.col("min_ts") == F.col("d_min"))
            & (F.col("max_ts") == F.col("d_max"))
        ).alias("matches_direct"),
    )
