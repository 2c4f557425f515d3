"""Window / time-series gate queries (SURVEY.md §2.6 + sequence aggs §2.5).

The reference's temporal layer (MobilityDB stores) becomes: per-entity
sequences (A1/W6), tumbling buckets (W1), as-of instant extraction (W3),
micro-batch range bounds (A5). The events table is the stand-in stream.

Scale posture: every window here partitions by an entity key (user_id) —
state is bounded per key and Spark distributes keys across executors. The
as-of lookup uses the sort-merge union trick (one shuffle, no per-probe
scans), which at 100 TB beats a per-probe subquery by orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.codecs import epoch_s, epoch_us
from . import register
from .relational import t

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "w1_tumbling_hour",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS bucket,
       event_type, count(*) AS n, round(sum(value), 2) AS total
FROM events GROUP BY 1, 2 ORDER BY bucket, event_type
""",
    doc="W1/P7: tumbling time bucket (apache_parquet.py:17,27,107)",
    tags=("window", "time"),
)
def w1_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), TS_FMT_SPARK).alias("bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("bucket", "event_type")
    )


@register(
    "a5_batch_range_bounds",
    oracle=f"""
SELECT user_id,
       strftime(min(ts), '{TS_FMT_DUCK}') AS range_start,
       strftime(max(ts), '{TS_FMT_DUCK}') AS range_end,
       count(*) AS n_instants
FROM events GROUP BY user_id ORDER BY user_id
""",
    doc="A5: tsrange batch bounds per entity (mobility_db_batch.py:81-82,107)",
    tags=("agg", "time"),
)
def a5_batch_range_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.date_format(F.min("ts"), TS_FMT_SPARK).alias("range_start"),
            F.date_format(F.max("ts"), TS_FMT_SPARK).alias("range_end"),
            F.count("*").alias("n_instants"),
        )
        .orderBy("user_id")
    )


# Probe instants for the as-of lookup (W3) — data-independent literals.
ASOF_PROBES = [
    "2024-01-02 00:00:00",
    "2024-01-05 12:00:00",
    "2024-01-10 06:30:00",
]


@register(
    "w3_asof_lookup",
    oracle=f"""
WITH probes AS (
  SELECT unnest([{", ".join(f"TIMESTAMP '{p}'" for p in ASOF_PROBES)}]) AS probe_ts
),
users AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, strftime(p.probe_ts, '{TS_FMT_DUCK}') AS probe,
       (SELECT round(e.value, 2) FROM events e
        WHERE e.user_id = u.user_id AND e.ts <= p.probe_ts
        ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS asof_value
FROM users u CROSS JOIN probes p
ORDER BY u.user_id, probe
""",
    doc="W3: as-of instant extraction per entity (mobility_db.py:104-109); "
    "sort-merge union trick — one shuffle for all probes",
    tags=("window", "time", "asof"),
)
def w3_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    from ..session import local_df

    # local_df: legacy list local-relation is ~10-30x slower per action
    probes = local_df(
        spark, [(p,) for p in ASOF_PROBES], "probe_s string"
    ).select(F.col("probe_s").cast("timestamp").alias("probe_ts"))
    users = ev.select("user_id").distinct()
    probe_rows = users.crossJoin(F.broadcast(probes)).select(
        "user_id",
        F.col("probe_ts").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_probe"),
    )
    event_rows = ev.select(
        "user_id", "ts", "event_id", "value", F.lit(0).alias("is_probe")
    )
    # events sort before probes at equal ts (as-of is inclusive); among
    # equal-ts events the larger event_id wins, matching the oracle ORDER BY.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        event_rows.unionByName(probe_rows)
        .withColumn("asof_raw", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            "user_id",
            F.date_format("ts", TS_FMT_SPARK).alias("probe"),
            F.round("asof_raw", 2).alias("asof_value"),
        )
        .orderBy("user_id", "probe")
    )


@register(
    "asof_join_purchases_clicks",
    oracle="""
SELECT p.user_id, p.event_id AS purchase_event,
       round(c.value, 2) AS last_click_value
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY p.user_id, purchase_event
""",
    doc="as-of JOIN: every purchase gets the latest prior click value per "
    "user (operators/asof.py union strategy — one shuffle, no per-row "
    "probing; DuckDB's native ASOF JOIN is the oracle)",
    tags=("join", "time", "asof"),
)
def asof_join_purchases_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join(purchases, clicks, on="ts", by="user_id")
    return out.select(
        "user_id",
        F.col("event_id").alias("purchase_event"),
        F.round("asof_click_value", 2).alias("last_click_value"),
    ).orderBy("user_id", "purchase_event")


@register(
    "range_join_value_tiers",
    oracle="""
SELECT t.tier, count(*) AS n, round(sum(e.value), 2) AS total
FROM events e
JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 120.0), ('high', 120.0, 1e9))
     t(tier, lo, hi)
  ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier ORDER BY t.tier
""",
    doc="range join: fact value into [lo,hi) interval dims "
    "(operators/asof.range_join; broadcast path here, bucketized "
    "equi-join path for big-big covered in tests)",
    tags=("join", "range"),
)
def range_join_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import range_join

    ev = t(spark, sf_dir, "events")
    from ..session import local_df

    tiers = local_df(
        spark,
        [("low", 0.0, 50.0), ("mid", 50.0, 120.0), ("high", 120.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return (
        range_join(ev, tiers, "value")
        .groupBy("tier")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("tier")
    )


@register(
    "w5_sessionize",
    oracle="""
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, count(DISTINCT session_id) AS n_sessions,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id ORDER BY user_id
""",
    doc="sessionization: lag-gap > 30 min starts a session (pyspark guide "
    "'Sessionization'; extension beyond reference W5 buffering)",
    tags=("window", "time"),
)
def w5_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap, matching the oracle's `ts - lag(ts) >
    # INTERVAL 30 MINUTE` by construction: flooring to whole seconds
    # (epoch_s) agrees only while no true gap lands in (1800 s, 1801 s)
    # with fractional misalignment (ADVICE r10)
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w_ord)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_cum))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


@register(
    "topk_per_group",
    oracle="""
SELECT user_id, event_id, round(value, 2) AS value, rk FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
  FROM events
) WHERE rk <= 3 ORDER BY user_id, rk
""",
    doc="top-K per group via window rank (pyspark guide 'Top-K per group')",
    tags=("window",),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        t(spark, sf_dir, "events")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", F.round("value", 2).alias("value"), "rk")
        .orderBy("user_id", "rk")
    )


@register(
    "running_totals",
    oracle=f"""
SELECT user_id, event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_s,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
           AS delta_prev
FROM events
ORDER BY user_id, event_id
""",
    doc="running cumulative sum + lag delta (W4-adjacent incremental append)",
    tags=("window",),
)
def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_s"),
        F.round(F.sum("value").over(w_cum), 2).alias("running_value"),
        F.round(F.col("value") - F.lag("value").over(w_ord), 2).alias("delta_prev"),
    ).orderBy("user_id", "event_id")


@register(
    "ranking_suite",
    oracle="""
SELECT c_custkey, c_mktsegment,
       rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
       ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer ORDER BY c_custkey
""",
    doc="rank/dense_rank/ntile window suite (Spark extension)",
    tags=("window",),
)
def ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_custkey")
    )


@register(
    "quantiles_exact",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS median_value,
       round(quantile_cont(value, 0.9), 4) AS p90_value,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="exact interpolated quantiles (percentile == duckdb quantile_cont)",
    tags=("agg",),
)
def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 4).alias("median_value"),
            F.round(F.percentile("value", 0.9), 4).alias("p90_value"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Sequence builds (A1/W6) and JSON document construction (P4/A2/A3) —
# the re-nesting side of the reference, string-stable across engines.
# ---------------------------------------------------------------------------


@register(
    "a1_entity_sequences",
    oracle=f"""
SELECT user_id,
       string_agg(strftime(ts, '{TS_FMT_DUCK}') || '@' || printf('%.2f', value),
                  ';' ORDER BY ts, event_id) AS sequence,
       count(*) AS n_instants
FROM events WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY user_id
""",
    doc="A1/W6/P16: per-entity time-ordered instant sequence "
    "(mobility_db_batch.py:80-99) as a canonical string",
    tags=("agg", "time", "sequence"),
)
def a1_entity_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    instant = F.struct("ts", "event_id", "value")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(instant)),
                    lambda x: F.concat(
                        F.date_format(x["ts"], TS_FMT_SPARK),
                        F.lit("@"),
                        F.format_string("%.2f", x["value"]),
                    ),
                ),
                ";",
            ).alias("sequence"),
            F.count("*").alias("n_instants"),
        )
        .orderBy("user_id")
    )


@register(
    "p4_json_doc_build",
    oracle="""
SELECT user_id,
       '{"user":' || cast(user_id AS VARCHAR) ||
       ',"n":' || cast(count(*) AS VARCHAR) ||
       ',"events":[' ||
       string_agg('{"id":' || cast(event_id AS VARCHAR) || ',"type":"' || event_type || '"}',
                  ',' ORDER BY event_id) || ']}' AS doc
FROM events WHERE user_id < 5 GROUP BY user_id ORDER BY user_id
""",
    doc="P4/P5/A2/A3: SQL-side JSON document construction "
    "(postgresql_json_agg_store.py:75-106, postgresql_sql_text_conv.py:79-94)",
    tags=("agg", "json"),
)
def p4_json_doc_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    item = F.struct("event_id", "event_type")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list(item)).alias("items"))
        .select(
            "user_id",
            F.concat(
                F.lit('{"user":'),
                F.col("user_id").cast("string"),
                F.lit(',"n":'),
                F.col("n").cast("string"),
                F.lit(',"events":['),
                F.array_join(
                    F.transform(
                        F.col("items"),
                        lambda x: F.concat(
                            F.lit('{"id":'),
                            x["event_id"].cast("string"),
                            F.lit(',"type":"'),
                            x["event_type"],
                            F.lit('"}'),
                        ),
                    ),
                    ",",
                ),
                F.lit("]}"),
            ).alias("doc"),
        )
        .orderBy("user_id")
    )


@register(
    "json_props_extract",
    oracle="""
SELECT event_type,
       cast(sum(cast(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="JSON scalar extraction from the props column (get_json_object path)",
    tags=("json",),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("int"))
            .cast("long")
            .alias("sum_k"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "window_range_frames",
    oracle=f"""
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
           AS rolling_1h,
       round(first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
           AS first_val,
       round(last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
           AS last_val
FROM events ORDER BY user_id, event_id
""",
    doc="RANGE-frame rolling window (1h trailing sum) + first/last_value "
    "(time-based frames — the windowed form of the temporal layer)",
    tags=("window", "time"),
)
def window_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # order the range frame in MICROSECONDS: cast("long") truncates to
    # seconds, which silently widens the frame for event pairs exactly
    # ~1h apart at sub-second offsets (first such pair appears at sf0.1)
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w_range), 2).alias("rolling_1h"),
        F.round(F.first("value").over(w_ord), 2).alias("first_val"),
        F.round(F.last("value").over(w_full), 2).alias("last_val"),
    ).orderBy("user_id", "event_id")


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       cast(date_part('year', o_orderdate) AS INT)    AS yr,
       cast(date_part('month', o_orderdate) AS INT)   AS mo,
       cast(date_part('dow', o_orderdate) AS INT)     AS dow,
       strftime(last_day(o_orderdate), '%Y-%m-%d')    AS month_end,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
""",
    doc="calendar function suite: extract parts, last_day, day difference "
    "(P7/P8 family generalized)",
    tags=("time", "project"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    # duckdb dow: Sunday=0; spark dayofweek: Sunday=1
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_95"),
    ).orderBy("o_orderkey")


@register(
    "funnel_conversion",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_view_click_purchase
""",
    doc="ordered funnel: users whose first view precedes a click precedes "
    "a purchase (stage aggs + per-stage time-ordered joins; each stage "
    "shrinks the key set, so the joins broadcast at scale)",
    tags=("window", "time", "funnel"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


@register(
    "cohort_retention",
    oracle="""
WITH first AS (
  SELECT user_id, min(cast(ts AS DATE)) AS cohort FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id, f.cohort,
         datediff('day', f.cohort, cast(e.ts AS DATE)) AS day_offset
  FROM events e JOIN first f ON f.user_id = e.user_id
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_date, day_offset,
       count(*) AS n_users
FROM act GROUP BY cohort, day_offset
ORDER BY cohort_date, day_offset
""",
    doc="cohort retention matrix: users bucketed by first-seen date, "
    "distinct-active counts per day offset (first-touch agg broadcast "
    "back onto the fact; the cohort matrix is |days|^2 rows at most)",
    tags=("window", "time", "cohort"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    act = (
        ev.join(F.broadcast(first), "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.to_date("ts"), F.col("cohort")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        act.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_date"), "day_offset"
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_date", "day_offset")
    )


@register(
    "json_variant_extract",
    oracle="""
SELECT event_type,
       min(cast(json_extract_string(props, '$.k') AS INT)) AS min_k,
       max(cast(json_extract_string(props, '$.k') AS INT)) AS max_k,
       count(DISTINCT cast(json_extract_string(props, '$.k') AS INT)) AS n_distinct_k
FROM events
WHERE cast(json_extract_string(props, '$.k') AS INT) % 7 = 0
GROUP BY event_type ORDER BY event_type
""",
    doc="semi-structured VARIANT path (Spark 4 parse_json/variant_get): "
    "the open-schema alternative to get_json_object — parse once, typed "
    "extraction + predicate on the extracted value; DuckDB twin uses its "
    "JSON extraction (the semantics, not the encoding, are the contract)",
    tags=("json", "variant"),
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") % 7 == 0)
        .groupBy("event_type")
        .agg(
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_percentiles",
    # Value-checkable twin for a sketch op (the knn_ivf_seeded trick): the
    # sketch value itself is engine-specific, but its RANK-ERROR GUARANTEE is
    # a deterministic claim. The Spark plan computes the GK-sketch quantiles,
    # re-ranks each sketch value against the data (one broadcast join + agg),
    # and emits per-quantile booleans "rank error <= 2*n/accuracy + 2"; the
    # oracle asserts those booleans TRUE and checks n exactly. If the sketch
    # ever degrades past its published bound, the booleans flip and the gate
    # hash-mismatches — a real value check, not rows-only.
    oracle="""
SELECT event_type, count(*) AS n,
       TRUE AS ok_p50, TRUE AS ok_p95, TRUE AS ok_p99
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="approximate percentiles via percentile_approx (mergeable GK sketch: "
    "partial aggregation works at any scale; accuracy knob = the last "
    "argument), verified in-plan against the sketch's rank-error bound. "
    "Exact counterpart: quantiles_exact.",
    tags=("agg", "sketch"),
)
def sketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    accuracy = 10000
    ev = t(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], accuracy).alias("p_approx"),
        F.count("*").alias("n"),
    )
    # Re-rank each sketch value: rank(v) = #{value <= v} per group. One
    # broadcast of the tiny per-group sketch table, one map-side-combinable
    # agg — no extra shuffle of the fact table beyond the groupBy.
    ranked = (
        ev.join(F.broadcast(sk), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            *[
                F.sum((F.col("value") <= F.col("p_approx")[i]).cast("long")).alias(f"rank_{i}")
                for i in range(3)
            ],
        )
    )
    # GK guarantee: |rank(v) - q*n| <= n/accuracy. Allow 2x + 2 slack so the
    # gate tests the published bound's order of magnitude, never flakes.
    err = F.col("n") / accuracy * 2 + F.lit(2.0)
    ok = lambda i, q: (F.abs(F.col(f"rank_{i}") - q * F.col("n")) <= err).alias(f"ok_p{int(q * 100)}")
    return ranked.select(
        "event_type", "n", ok(0, 0.5), ok(1, 0.95), ok(2, 0.99)
    ).orderBy("event_type")


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY from_type, to_type
), totals AS (
  SELECT from_type, sum(n) AS total FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type,
       cast(p.n AS BIGINT) AS n,
       cast(p.n AS DOUBLE) / t.total AS p
FROM pairs p JOIN totals t USING (from_type)
ORDER BY from_type, to_type
""",
    doc="first-order Markov transition matrix over per-user event "
    "sequences: lead window pairs consecutive event types, pair counts "
    "normalize per from-state — probabilities are exact bigint ratios "
    "(no rounding needed for cross-engine equality); the "
    "behavioral-model primitive behind next-action prediction",
    tags=("window", "agg", "events"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    # per-from-state totals are |event types| rows — broadcast back
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "scd2_state_intervals",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events WHERE user_id < 40
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), flagged AS (
  SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
                 THEN 1 ELSE 0 END AS chg
  FROM seq
), grouped AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
), intervals AS (
  SELECT user_id, event_type, grp,
         min(ts) AS valid_from, cast(count(*) AS BIGINT) AS n_events
  FROM grouped GROUP BY user_id, event_type, grp
)
SELECT user_id, event_type,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(lead(valid_from) OVER (PARTITION BY user_id
                ORDER BY valid_from, grp), '%Y-%m-%d %H:%M:%S'), '') AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id
            ORDER BY valid_from, grp) IS NULL AS is_current,
       n_events
FROM intervals
ORDER BY user_id, valid_from, grp
""",
    doc="SCD type-2 interval build: collapse each user's consecutive "
    "identical states into validity intervals (change-flag + running-sum "
    "islands, one entity-keyed window pass), then close each interval at "
    "the next one's start via lead — open intervals flagged current; the "
    "slowly-changing-dimension maintenance primitive",
    tags=("window", "scd", "time"),
)
def scd2_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select("user_id", "event_type", "ts", "event_id").withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    grouped = flagged.withColumn(
        "grp",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    intervals = grouped.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("_from"), F.count("*").alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("_from", "grp")
    nxt = F.lead("_from").over(w2)
    return (
        intervals.select(
            "user_id",
            "event_type",
            F.date_format("_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.coalesce(
                F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"), F.lit("")
            ).alias("valid_to"),
            nxt.isNull().alias("is_current"),
            "n_events",
            "grp",
        )
        .orderBy("user_id", "valid_from", "grp")
        .drop("grp")
    )


@register(
    "anomaly_zscore_outliers",
    oracle="""
WITH moments AS (
  SELECT event_type,
         cast(count(value) AS BIGINT) AS n,
         cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         cast(sum(cast(value AS DECIMAL(18,6))
                  * cast(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
), stats AS (
  SELECT event_type, n, s1 / n AS mean,
         sqrt(s2 / n - (s1 / n) * (s1 / n)) AS std
  FROM moments
)
SELECT s.event_type, s.n, round(s.mean, 6) AS mean, round(s.std, 6) AS std,
       cast(count(*) FILTER (abs(e.value - s.mean) > 3 * s.std) AS BIGINT)
           AS n_outliers
FROM events e JOIN stats s USING (event_type)
GROUP BY s.event_type, s.n, s.mean, s.std
ORDER BY s.event_type
""",
    doc="per-group anomaly screen: mean/std from exact decimal moments "
    "(sum x, sum x² — order-independent), EMITTED rounded to 6dp: the "
    "decimal→double cast itself is allowed to differ by 1 ulp between "
    "engines (DuckDB converts int128/10^scale in two roundings), so raw "
    "mean/std are NOT fixed-order-safe — the r8 exact-compare sweep "
    "caught std off by 7e-15; the 3-sigma count compares against the "
    "un-rounded stats via a broadcast of the |groups|-row stats table "
    "back onto the fact — two narrow shuffles total",
    tags=("agg", "stats", "events"),
)
def anomaly_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    moments = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    stats = moments.select(
        "event_type",
        "n",
        mean.alias("mean"),
        F.sqrt(F.col("s2") / F.col("n") - mean * mean).alias("std"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n", "mean", "std")
        .agg(
            F.count(
                F.when(F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std"), 1)
            ).alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.round("mean", 6).alias("mean"),
            F.round("std", 6).alias("std"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round 4: bucketed interval-overlap join — the time-range join pattern the
# registry's range/asof/containment joins don't cover: both sides are
# intervals and the predicate is overlap, not containment or nearest.
# ---------------------------------------------------------------------------

_IV_MINUTES = 30         # interval length: [ts, ts + 30 min)
_IV_BUCKET_S = 1800      # candidate bucket width (= interval length)
_IV_MIN_OVERLAPS = 2     # report user pairs with at least this many


@register(
    "interval_overlap_join",
    oracle=f"""
WITH iv AS (
  SELECT event_id, user_id, ts AS s, ts + INTERVAL {_IV_MINUTES} MINUTE AS e
  FROM events WHERE event_type = 'purchase'
), p AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS n_overlaps
  FROM iv a JOIN iv b
    ON a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
  GROUP BY a.user_id, b.user_id
)
SELECT user_a, user_b, n_overlaps FROM p
WHERE n_overlaps >= {_IV_MIN_OVERLAPS}
ORDER BY user_a, user_b
""",
    doc="interval-overlap join (co-activity): 30-min purchase windows per "
    "user, count cross-user pairs of strictly overlapping intervals. The "
    "oracle does the naive O(n^2) pair join; the Spark plan decomposes "
    "each interval into its covered 30-min epoch buckets (<=2 per "
    "interval), equi-joins on the bucket, dedups double-bucket matches "
    "and re-verifies exact overlap — candidates are bounded per bucket by "
    "the activity rate, never corpus-quadratic. Integer-second bucketing "
    "is exact: bucket edges sit on whole seconds, so flooring microsecond "
    "timestamps cannot move an endpoint across a bucket boundary",
    tags=("window", "join"),
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {_IV_MINUTES} MINUTES")).alias("e"),
    )
    bucketed = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("s") / _IV_BUCKET_S),
                F.floor(F.unix_timestamp("e") / _IV_BUCKET_S),
            )
        ),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .filter((F.col("a.s") < F.col("b.e")) & (F.col("b.s") < F.col("a.e")))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.event_id").alias("ea"),
            F.col("b.event_id").alias("eb"),
        )
        .distinct()  # an overlapping pair can share both covered buckets
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(F.count("*").alias("n_overlaps"))
        .filter(F.col("n_overlaps") >= _IV_MIN_OVERLAPS)
        .orderBy("user_a", "user_b")
    )


# ---------------------------------------------------------------------------
# Forward fill (last-observation-carried-forward) — the time-series gap
# repair every sensor/telemetry pipeline runs before resampling. Nulls
# are planted deterministically (event_id % 7 == 0 masks the reading),
# then each gap takes the entity's most recent non-null value in
# (ts, event_id) order; leading gaps stay NULL. Spark's
# last(ignorenulls=True) over an unbounded-preceding row frame IS the
# operator; DuckDB replays it with last_value(... IGNORE NULLS).
# Values are compared in exact cents so the fill is bit-checkable.
# Scale: one hash shuffle on user_id + an in-partition ordered scan —
# state is one value per entity, keys distribute.
# ---------------------------------------------------------------------------


@register(
    "ts_forward_fill",
    oracle="""
WITH x AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
)
SELECT event_id, user_id,
       (cents IS NULL) AS was_gap,
       last_value(cents IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_cents
FROM x ORDER BY event_id
""",
    doc="per-entity forward fill of deterministically masked readings "
    "(last non-null carried forward in event order, leading gaps NULL), "
    "exact-cents value parity with DuckDB's IGNORE NULLS window",
    tags=("window", "time", "timeseries"),
)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cents = F.when(
        F.col("event_id") % 7 == 0, F.lit(None).cast("long")
    ).otherwise(F.round(F.col("value") * 100).cast("long"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("cents", cents)
        .select(
            "event_id",
            "user_id",
            F.col("cents").isNull().alias("was_gap"),
            F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Run-length streak mining — the RLE form of gaps-and-islands: maximal
# runs of the SAME event type per user, found with the rank-difference
# trick (global row_number minus per-type row_number is constant within
# a run). Pure integer window algebra, so both engines agree exactly.
# Scale: ONE user_id hash shuffle feeds both window sorts (same
# partition key), then one bounded groupBy; per-entity state only.
# ---------------------------------------------------------------------------


@register(
    "event_rle_streaks",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS grp
  FROM events
), runs AS (
  SELECT user_id, event_type, count(*) AS run_len
  FROM seq GROUP BY user_id, event_type, grp
)
SELECT user_id, event_type,
       CAST(max(run_len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(run_len) AS BIGINT) AS n_events
FROM runs GROUP BY user_id, event_type
ORDER BY user_id, event_type
""",
    doc="per-user maximal same-event runs via the rank-difference RLE "
    "trick (longest streak, run count, totals — all exact integers); "
    "one user_id shuffle shared by both window sorts",
    tags=("window", "sequence"),
)
def event_rle_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        ev.withColumn(
            "grp", F.row_number().over(w_all) - F.row_number().over(w_typ)
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("user_id", "event_type")
        .agg(
            F.max("run_len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("run_len").alias("n_events"),
        )
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Last-touch marketing attribution — credit each purchase to the user's
# most recent preceding touch (click/view) within a 7-day lookback,
# else 'direct'. Expressed with the as-of SORT-MERGE UNION trick the
# engine's w3 gate proved: touches and purchases share ONE user_id
# window (order ts, event_id), the purchase row reads the carried
# last-touch channel/time from the 1-PRECEDING frame — zero joins, no
# per-conversion probe scans, which at 100 TB beats a per-purchase
# lateral lookup by orders of magnitude. Revenue in exact cents.
# ---------------------------------------------------------------------------


@register(
    "attribution_last_touch",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('click', 'view') THEN event_type END
           AS touch_type,
         CASE WHEN event_type IN ('click', 'view') THEN ts END AS touch_ts,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) END AS purchase_cents
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
), carried AS (
  SELECT user_id, purchase_cents,
         last_value(touch_type IGNORE NULLS) OVER w AS last_touch,
         last_value(touch_ts IGNORE NULLS) OVER w AS last_touch_ts,
         ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT CASE WHEN last_touch IS NOT NULL
            AND epoch_us(ts) - epoch_us(last_touch_ts)
                <= CAST(7 * 24 * 3600 AS BIGINT) * 1000000
            THEN last_touch ELSE 'direct' END AS channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(purchase_cents) AS BIGINT) AS revenue_cents
FROM carried WHERE purchase_cents IS NOT NULL
GROUP BY 1 ORDER BY channel
""",
    doc="last-touch attribution: each purchase credits the user's most "
    "recent prior click/view within 7 days (else 'direct') via the "
    "zero-join sort-merge union as-of pattern — one user_id shuffle, "
    "exact-cents revenue per channel",
    tags=("window", "time", "asof"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    is_touch = F.col("event_type").isin("click", "view")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(is_touch, F.col("event_type")).alias("touch_type"),
        F.when(is_touch, F.col("ts")).alias("touch_ts"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        ).alias("purchase_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "purchase_cents",
        F.last("touch_type", ignorenulls=True).over(w).alias("last_touch"),
        F.last("touch_ts", ignorenulls=True).over(w).alias("last_touch_ts"),
    ).filter(F.col("purchase_cents").isNotNull())
    within = (
        F.col("last_touch").isNotNull()
        & (
            epoch_us("ts") - epoch_us("last_touch_ts")
            <= F.lit(7 * 24 * 3600 * 1000000)
        )
    )
    return (
        carried.select(
            F.when(within, F.col("last_touch"))
            .otherwise(F.lit("direct"))
            .alias("channel"),
            "purchase_cents",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("purchase_cents").alias("revenue_cents"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: time-decay attribution — the multi-touch
# complement to attribution_last_touch. EVERY prior touch inside the
# 7-day lookback earns credit, halving per elapsed day: weight
# 2^(7-floor(days)) in {2..128} is a pure INTEGER, so the per-channel
# decay-weighted credit is an exact BIGINT sum (credit is reported
# unnormalized — the per-purchase share normalization would force a
# float per pair; the channel ranking and the one-division share are
# identical). Scale shape: touches explode into 8 day buckets and join
# purchases on (user, day) equality — the pair join is bounded by the
# lookback window, never user-quadratic.
# ---------------------------------------------------------------------------

_DECAY_CASE_SQL = (
    "CASE CAST(floor((pe - te) / 86400000000.0) AS INT) "
    "WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 32 WHEN 3 THEN 16 "
    "WHEN 4 THEN 8 WHEN 5 THEN 4 WHEN 6 THEN 2 ELSE 0 END"
)


@register(
    "attribution_time_decay",
    oracle=f"""
WITH touches AS (
  SELECT user_id, event_type AS channel, epoch_us(ts) AS te
  FROM events WHERE event_type IN ('click', 'view')
), purchases AS (
  SELECT user_id, epoch_us(ts) AS pe,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), pairs AS (
  SELECT t.channel, p.cents,
         CAST({_DECAY_CASE_SQL} AS BIGINT) AS w
  FROM touches t JOIN purchases p
    ON t.user_id = p.user_id
   AND t.te <= p.pe
   AND p.pe - t.te < CAST(7 * 24 * 3600 AS BIGINT) * 1000000
), per AS (
  SELECT channel,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(cents * w) AS BIGINT) AS credit_scaled
  FROM pairs GROUP BY channel
)
SELECT channel, n_pairs, credit_scaled,
       round(CAST(credit_scaled AS DOUBLE)
             / CAST(sum(credit_scaled) OVER () AS DOUBLE), 6) AS share
FROM per ORDER BY channel
""",
    doc="time-decay multi-touch attribution: every click/view inside the "
    "purchase's 7-day lookback earns credit halving per elapsed day — "
    "integer weights 2^(7-d) keep the decay-weighted credit an exact "
    "BIGINT sum (one share division per channel at the end); the Spark "
    "side joins touch day-buckets (8 exploded rows per touch) to "
    "purchase days so the pair join is lookback-bounded, never "
    "user-quadratic",
    tags=("window", "time", "attribution"),
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    day_us = 86400000000
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        epoch_us("ts").alias("te"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        epoch_us("ts").alias("pe"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (epoch_us("ts") / F.lit(day_us)).cast("long").alias("pday"),
    )
    # lookback-bounded equi-join: a touch can only credit purchases in
    # its own or the next 7 calendar day-buckets
    touch_buckets = touches.withColumn(
        "pday",
        F.explode(
            F.sequence(
                (F.col("te") / F.lit(day_us)).cast("long"),
                (F.col("te") / F.lit(day_us)).cast("long") + 7,
            )
        ),
    )
    d_days = F.floor((F.col("pe") - F.col("te")) / F.lit(float(day_us))).cast(
        "int"
    )
    w = (
        F.when(d_days == 0, 128).when(d_days == 1, 64)
        .when(d_days == 2, 32).when(d_days == 3, 16)
        .when(d_days == 4, 8).when(d_days == 5, 4)
        .when(d_days == 6, 2).otherwise(0)
    ).cast("long")
    pairs = touch_buckets.join(purchases, ["user_id", "pday"]).filter(
        (F.col("te") <= F.col("pe"))
        & (F.col("pe") - F.col("te") < F.lit(7 * 24 * 3600 * 1000000))
    )
    per = pairs.select("channel", "cents", w.alias("w")).groupBy(
        "channel"
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("cents") * F.col("w")).alias("credit_scaled"),
    )
    total = Window.partitionBy()
    return per.select(
        "channel",
        "n_pairs",
        "credit_scaled",
        F.round(
            F.col("credit_scaled").cast("double")
            / F.sum("credit_scaled").over(total).cast("double"),
            6,
        ).alias("share"),
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# Round-9 continuation: Kaplan-Meier survival over time-to-first-error —
# the nonparametric reliability/retention curve. Everything is exact
# BIGINT (durations in floored days, death/at-risk counts) up to the
# per-step hazard factor (1 - d/n, one double division of two bigints),
# and the survival product is an ORDERED left fold over the step factors
# (F.aggregate ↔ DuckDB list_reduce with the same 1.0 seed) — the same
# fixed-parenthesization discipline as the BM25 fold, so both engines
# produce the identical IEEE double before the final 6dp round.
# ---------------------------------------------------------------------------

_KM_CUTOFF_SQL = "TIMESTAMP '2024-01-31 00:00:00'"


@register(
    "retention_kaplan_meier",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         min(epoch_us(ts)) AS first_us,
         min(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) AS err_us
  FROM events GROUP BY user_id
), lifetimes AS (
  SELECT CAST(floor((coalesce(err_us, epoch_us({_KM_CUTOFF_SQL})) - first_us)
                    / 86400000000.0) AS BIGINT) AS dur,
         (err_us IS NOT NULL) AS observed
  FROM u
), g AS (
  SELECT dur,
         CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n_at
  FROM lifetimes GROUP BY dur
), r AS (
  SELECT dur, d,
         CAST((SELECT sum(n_at) FROM g) AS BIGINT)
           - CAST(coalesce(sum(n_at) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_risk
  FROM g
), f AS (
  SELECT dur, d, n_risk,
         CASE WHEN d > 0
              THEN 1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
              ELSE CAST(1.0 AS DOUBLE) END AS factor
  FROM r
), lst AS (
  SELECT list(struct_pack(t := dur, f := factor) ORDER BY dur) AS l FROM f
)
SELECT f.dur, f.d, f.n_risk,
       round(list_reduce(
         list_prepend(CAST(1.0 AS DOUBLE),
           list_transform(list_filter(lst.l, x -> x.t <= f.dur),
                          x -> x.f)),
         (a, b) -> a * b), 6) AS survival
FROM f CROSS JOIN lst ORDER BY f.dur
""",
    doc="Kaplan-Meier survival over time-to-first-error (the "
    "nonparametric reliability curve): per-user lifetimes in floored "
    "days (censored at month end when no error observed), per-step "
    "death/at-risk counts exact BIGINT, hazard factor one double "
    "division, survival = ORDERED left fold of the step factors "
    "(F.aggregate == list_reduce, same 1.0 seed, same "
    "parenthesization); the step table is bounded by DISTINCT "
    "durations (calendar days), so the fold list is tiny at any scale",
    tags=("stats", "time", "survival"),
)
def retention_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cutoff_us = epoch_us(F.lit("2024-01-31 00:00:00").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(epoch_us("ts")).alias("first_us"),
        F.min(
            F.when(F.col("event_type") == "error", epoch_us("ts"))
        ).alias("err_us"),
    )
    lifetimes = u.select(
        F.floor(
            (F.coalesce(F.col("err_us"), cutoff_us) - F.col("first_us"))
            / F.lit(86400000000.0)
        )
        .cast("long")
        .alias("dur"),
        F.col("err_us").isNotNull().alias("observed"),
    )
    g = lifetimes.groupBy("dur").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("n_at"),
    )
    # at-risk counts via prefix_sums instead of a partition-less window
    # (r12 verdict item 7): n_risk = total - exclusive prefix, where the
    # exclusive prefix is the inclusive running sum minus the row's own
    # n_at — same integers, no single-task sort of the step table
    from ..functions.codecs import prefix_sums

    r = prefix_sums(
        g, "dur", ["n_at"], out_cols=["_cum"], total_cols={"n_at": "_tot"}
    ).select(
        "dur",
        "d",
        (F.col("_tot") - (F.col("_cum") - F.col("n_at"))).alias("n_risk"),
    )
    f = r.withColumn(
        "factor",
        F.when(
            F.col("d") > 0,
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double"),
        ).otherwise(F.lit(1.0)),
    )
    lst = f.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("dur").alias("t"), F.col("factor").alias("f")))
        ).alias("l")
    )
    joined = f.crossJoin(F.broadcast(lst))
    survival = F.round(
        F.aggregate(
            F.filter(F.col("l"), lambda x: x["t"] <= F.col("dur")),
            F.lit(1.0),
            lambda acc, x: acc * x["f"],
        ),
        6,
    )
    return joined.select(
        "dur", "d", "n_risk", survival.alias("survival")
    ).orderBy("dur")


# ---------------------------------------------------------------------------
# Round-9 continuation: per-entity time-grid gap detection — the
# complement of the islands/interval_coalesce gate: instead of
# coalescing PRESENT hours, materialize each user's expected hourly
# grid (min..max observed hour) and report the MISSING runs. This is
# the sensor-health / feed-outage audit every mobility lake runs
# (reference: the snapshot-cadence checks around SURVEY §2.1 S2's
# 20 s polling source — a missed poll is exactly a grid gap).
# Exactness: hour indexes are exact BIGINT (epoch_us div 3600e6); the
# island key (h - row_number) and every reported stat are integers.
# Scale: the grid explode is bounded by span-per-entity (retention
# window), not by rows; one user_id shuffle; the anti-join is a
# per-user sort-merge on the same key. Output is dim-sized (one row
# per user).
# ---------------------------------------------------------------------------


@register(
    "ts_gap_detection",
    oracle="""
WITH obs AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // (CAST(3600 AS BIGINT) * 1000000) AS h
  FROM events
), spans AS (
  SELECT user_id, min(h) AS h_min, max(h) AS h_max,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM obs GROUP BY user_id
), grid AS (
  SELECT s.user_id, g.h
  FROM spans s, unnest(generate_series(s.h_min, s.h_max)) AS g(h)
), missing AS (
  SELECT g.user_id, g.h
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
  WHERE o.h IS NULL
), runs AS (
  SELECT user_id, h,
         h - row_number() OVER (PARTITION BY user_id ORDER BY h) AS grp
  FROM missing
), gaps AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS gap_hours
  FROM runs GROUP BY user_id, grp
)
SELECT s.user_id,
       CAST(s.h_max - s.h_min + 1 AS BIGINT) AS span_hours,
       s.n_obs AS observed_hours,
       CAST(coalesce(sum(g.gap_hours), 0) AS BIGINT) AS missing_hours,
       CAST(count(g.grp) AS BIGINT) AS n_gaps,
       CAST(coalesce(max(g.gap_hours), 0) AS BIGINT) AS max_gap_hours
FROM spans s LEFT JOIN gaps g ON g.user_id = s.user_id
GROUP BY s.user_id, s.h_min, s.h_max, s.n_obs
ORDER BY s.user_id
""",
    doc="per-user hourly-grid gap detection (the islands complement): "
    "materialize each user's expected hour grid via sequence/"
    "generate_series over exact BIGINT hour indexes, anti-join the "
    "observed hours, coalesce missing hours into runs with the "
    "h - row_number island key, and report span/observed/missing/"
    "n_gaps/max_gap per user — grid size is span-bounded per entity, "
    "one user_id shuffle, all integer arithmetic",
    tags=("window", "time", "quality"),
)
def ts_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    obs = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).distinct()
    spans = obs.groupBy("user_id").agg(
        F.min("h").alias("h_min"),
        F.max("h").alias("h_max"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("h_min", "h_max")).alias("h")
    )
    missing = grid.join(obs, ["user_id", "h"], "left_anti")
    runs = missing.withColumn(
        "grp",
        F.col("h")
        - F.row_number().over(Window.partitionBy("user_id").orderBy("h")),
    )
    gaps = runs.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("gap_hours")
    )
    return (
        spans.join(gaps, "user_id", "left")
        .groupBy("user_id", "h_min", "h_max", "n_obs")
        .agg(
            F.coalesce(F.sum("gap_hours"), F.lit(0)).alias("missing_hours"),
            F.count("grp").alias("n_gaps"),
            F.coalesce(F.max("gap_hours"), F.lit(0)).alias("max_gap_hours"),
        )
        .select(
            "user_id",
            (F.col("h_max") - F.col("h_min") + 1).alias("span_hours"),
            F.col("n_obs").alias("observed_hours"),
            "missing_hours",
            "n_gaps",
            "max_gap_hours",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: Theil-Sen robust trend — the median of all
# pairwise slopes per entity, the estimator that shrugs off the
# outliers that wreck the least-squares gate (linreg_trend_per_entity
# is its fragile twin; Hampel flags points, Theil-Sen fits through
# them). Sen (1968), "Estimates of the regression coefficient based on
# Kendall's tau".
# Exactness: each slope is the single expression
# (y2 - y1) * 3600e6 / (x2 - x1) over exact microsecond BIGINTs and
# raw doubles — identical trees on both engines, so identical IEEE
# values; the median is SELECTION (plus one (a+b)/2 for even counts),
# never a running sum, so ordering can't smear it; final 6dp round.
# Scale: the pair join is a per-entity self-join — quadratic in
# points-per-entity, linear in entities. Points per entity are bounded
# by the retention window (66/user here); at 100 TB cap points per
# entity upstream (sample or bucket to hours) exactly as the reference
# bounds its per-vehicle windows. Equal-timestamp pairs are excluded
# (slope undefined), mirrored in both engines.
# ---------------------------------------------------------------------------


@register(
    "theil_sen_slope",
    oracle="""
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS x, value AS y, event_id FROM events
), slopes AS (
  SELECT a.user_id,
         (b.y - a.y) * 3600000000.0 / (b.x - a.x) AS slope
  FROM pts a JOIN pts b
    ON a.user_id = b.user_id AND a.x < b.x
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(median(slope), 6) AS slope_per_hour
FROM slopes GROUP BY user_id ORDER BY user_id
""",
    doc="Theil-Sen robust trend per user: median of all pairwise "
    "slopes (value units per hour) over exact microsecond x values — "
    "slope is one identical expression tree on both engines, median is "
    "selection not summation, equal-timestamp pairs excluded; "
    "per-entity self-join bounded by points-per-entity, one user_id "
    "shuffle",
    tags=("stats", "time", "window"),
)
def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id", epoch_us("ts").alias("x"), F.col("value").alias("y")
    )
    a = pts.alias("a")
    b = pts.alias("b")
    slopes = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        (
            (F.col("b.y") - F.col("a.y"))
            * F.lit(3600000000.0)
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
    )
    return (
        slopes.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.median("slope"), 6).alias("slope_per_hour"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: funnel time-to-convert — the latency half of
# the funnel story (funnel_conversion counts WHO converts; this gate
# reports HOW FAST): per user, the delay from first signup to the
# first purchase at-or-after it, summarized as exact discrete
# quantiles. Quantiles are SELECTION at hand-computed ranks
# (r_p = ((n-1)*p) div 100 + 1 over a unique (delta, user) ordering) —
# the lower-value discrete definition, identical integer arithmetic on
# both engines, no interpolation anywhere.
# Scale: one user_id collapse for signups, one bounded as-of-style
# min-aggregation for purchases, then a user-dim-sized sort for the
# rank picks.
# ---------------------------------------------------------------------------


@register(
    "funnel_time_to_convert",
    oracle="""
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_us
  GROUP BY e.user_id
), d AS (
  SELECT s.user_id, (p.p_us - s.s_us) // 1000000 AS delta_s
  FROM s JOIN p ON p.user_id = s.user_id
), r AS (
  SELECT delta_s,
         row_number() OVER (ORDER BY delta_s, user_id) AS rn,
         count(*) OVER () AS n
  FROM d
)
SELECT CAST(max(n) AS BIGINT) AS n_converted,
       CAST(min(delta_s) AS BIGINT) AS min_s,
       CAST(max(CASE WHEN rn = (n - 1) * 25 // 100 + 1
                     THEN delta_s END) AS BIGINT) AS p25_s,
       CAST(max(CASE WHEN rn = (n - 1) * 50 // 100 + 1
                     THEN delta_s END) AS BIGINT) AS p50_s,
       CAST(max(CASE WHEN rn = (n - 1) * 75 // 100 + 1
                     THEN delta_s END) AS BIGINT) AS p75_s,
       CAST(max(delta_s) AS BIGINT) AS max_s
FROM r
""",
    doc="funnel time-to-convert: per user, seconds from first signup "
    "to the first purchase at-or-after it; exact discrete quantiles by "
    "rank selection (((n-1)*p) div 100 + 1 over a unique ordering) — "
    "integer microsecond algebra, no interpolation; one user collapse "
    "+ one range-partitioned global rank (no single-task sort)",
    tags=("window", "time", "funnel"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_us("ts")).alias("s_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(epoch_us("ts") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min(epoch_us("ts")).alias("p_us"))
    )
    d = s.join(p, "user_id").select(
        "user_id",
        F.expr("(p_us - s_us) div 1000000").alias("delta_s"),
    )
    # rank + total via the range-partitioned surrogate_keys pattern: the
    # per-user table is SF-proportional, so the old partition-less
    # row_number/count windows sorted it on ONE task (r12 de-weak);
    # numbering and N are bit-identical
    from ..functions.codecs import surrogate_keys

    r = surrogate_keys(
        d, ["delta_s", "user_id"], out_col="rn", total_col="n"
    ).select("delta_s", "rn", "n")
    pick = lambda p_: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.expr(f"(n - 1) * {p_} div 100 + 1"),
            F.col("delta_s"),
        )
    )
    return r.agg(
        F.max("n").alias("n_converted"),
        F.min("delta_s").alias("min_s"),
        pick(25).alias("p25_s"),
        pick(50).alias("p50_s"),
        pick(75).alias("p75_s"),
        F.max("delta_s").alias("max_s"),
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: difference-in-differences — the canonical
# quasi-experiment readout: treatment vs control, before vs after a
# cutover, effect = (T_after - T_before) - (C_after - C_before).
# Assignment is the engine-reproducible parity of user_id (a stand-in
# for a real assignment column); the metric is mean purchase cents.
# Exactness: the four cell sums and counts are BIGINT; each mean is
# ONE division of two exact integers, and the DiD combines those four
# deterministic doubles in a FIXED expression tree — identical IEEE on
# both engines before the final 6dp round.
# Scale: one conditional aggregation over one scan — four cells, zero
# joins, map-side combinable.
# ---------------------------------------------------------------------------

_DID_CUTOVER = "TIMESTAMP '2024-01-15 00:00:00'"


@register(
    "experiment_diff_in_diff",
    oracle=f"""
WITH cells AS (
  SELECT (user_id % 2 = 1) AS treated,
         (ts >= {_DID_CUTOVER}) AS after,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), agg AS (
  SELECT
    CASE WHEN count(CASE WHEN treated AND NOT after THEN 1 END) = 0 THEN NULL
      ELSE CAST(sum(CASE WHEN treated AND NOT after THEN cents END) AS DOUBLE)
      / CAST(count(CASE WHEN treated AND NOT after THEN 1 END) AS DOUBLE) END
      AS m_tb,
    CASE WHEN count(CASE WHEN treated AND after THEN 1 END) = 0 THEN NULL
      ELSE CAST(sum(CASE WHEN treated AND after THEN cents END) AS DOUBLE)
      / CAST(count(CASE WHEN treated AND after THEN 1 END) AS DOUBLE) END
      AS m_ta,
    CASE WHEN count(CASE WHEN NOT treated AND NOT after THEN 1 END) = 0
      THEN NULL
      ELSE CAST(sum(CASE WHEN NOT treated AND NOT after THEN cents END)
                AS DOUBLE)
      / CAST(count(CASE WHEN NOT treated AND NOT after THEN 1 END) AS DOUBLE)
      END AS m_cb,
    CASE WHEN count(CASE WHEN NOT treated AND after THEN 1 END) = 0 THEN NULL
      ELSE CAST(sum(CASE WHEN NOT treated AND after THEN cents END) AS DOUBLE)
      / CAST(count(CASE WHEN NOT treated AND after THEN 1 END) AS DOUBLE) END
      AS m_ca,
    CAST(count(*) AS BIGINT) AS n_purchases
  FROM cells
)
SELECT round(m_tb, 6) AS mean_treated_before,
       round(m_ta, 6) AS mean_treated_after,
       round(m_cb, 6) AS mean_control_before,
       round(m_ca, 6) AS mean_control_after,
       round((m_ta - m_tb) - (m_ca - m_cb), 6) AS did_cents,
       n_purchases
FROM agg
""",
    doc="difference-in-differences over the purchase stream: treatment "
    "= user_id parity, cutover 2024-01-15, effect = (T_after - "
    "T_before) - (C_after - C_before) on mean cents — four exact "
    "BIGINT cells, one division each, DiD in a fixed expression tree "
    "(identical IEEE both engines) rounded 6dp; one conditional "
    "aggregation over one scan, zero joins",
    tags=("stats", "mining", "time"),
)
def experiment_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cutover = F.lit("2024-01-15 00:00:00").cast("timestamp")
    cells = ev.select(
        (F.col("user_id") % 2 == 1).alias("treated"),
        (F.col("ts") >= cutover).alias("after"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def mean_cell(tr, af):
        # empty-cell guard: count = 0 is pinned to NULL on BOTH engines
        # (instead of relying on NULL-sum propagation through x/0)
        cond = (F.col("treated") == tr) & (F.col("after") == af)
        cnt = F.count(F.when(cond, F.lit(1)))
        return F.when(
            cnt > 0,
            F.sum(F.when(cond, F.col("cents"))).cast("double")
            / cnt.cast("double"),
        )

    agg = cells.agg(
        mean_cell(True, False).alias("m_tb"),
        mean_cell(True, True).alias("m_ta"),
        mean_cell(False, False).alias("m_cb"),
        mean_cell(False, True).alias("m_ca"),
        F.count(F.lit(1)).alias("n_purchases"),
    )
    return agg.select(
        F.round("m_tb", 6).alias("mean_treated_before"),
        F.round("m_ta", 6).alias("mean_treated_after"),
        F.round("m_cb", 6).alias("mean_control_before"),
        F.round("m_ca", 6).alias("mean_control_after"),
        F.round(
            (F.col("m_ta") - F.col("m_tb")) - (F.col("m_ca") - F.col("m_cb")),
            6,
        ).alias("did_cents"),
        "n_purchases",
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: Markov next-event prediction accuracy — the
# first sequence model anyone ships: learn argmax P(next | prev) from
# transitions before a temporal cutover, score it on transitions
# after. The gate exercises the full eval loop (temporal train/test
# split -> model fit -> held-out accuracy) in pure relational algebra:
# the "model" is a 5x5 count table, the prediction an argmax row, the
# score an exact ratio.
# Exactness: transition counts are BIGINT, argmax ties break
# lexicographically on the next type, accuracy is one division rounded
# 6dp.
# Scale: one user_id window for the lead pairs, one (prev, next)
# rollup (vocabulary-sized), one broadcast of the 5-row model back
# onto the test pairs.
# ---------------------------------------------------------------------------

_MARKOV_CUTOVER = "TIMESTAMP '2024-01-16 00:00:00'"


@register(
    "markov_accuracy",
    oracle=f"""
WITH pairs AS (
  SELECT user_id, event_type AS prev,
         lead(event_type) OVER w AS next,
         lead(ts) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), valid AS (
  SELECT prev, next, next_ts FROM pairs WHERE next IS NOT NULL
), train AS (
  SELECT prev, next, CAST(count(*) AS BIGINT) AS n
  FROM valid WHERE next_ts < {_MARKOV_CUTOVER} GROUP BY prev, next
), model AS (
  SELECT prev, next AS pred FROM (
    SELECT prev, next,
           row_number() OVER (PARTITION BY prev
                              ORDER BY n DESC, next) AS rk
    FROM train
  ) WHERE rk = 1
), test AS (
  SELECT prev, next FROM valid WHERE next_ts >= {_MARKOV_CUTOVER}
)
SELECT t.prev, m.pred,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(count(CASE WHEN t.next = m.pred THEN 1 END) AS BIGINT)
         AS n_correct,
       round(CAST(count(CASE WHEN t.next = m.pred THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS accuracy
FROM test t JOIN model m ON m.prev = t.prev
GROUP BY t.prev, m.pred ORDER BY t.prev
""",
    doc="Markov next-event accuracy under a temporal split: argmax "
    "P(next|prev) learned from pre-cutover transitions (BIGINT counts, "
    "lexicographic tie-break), held-out accuracy per prev state — the "
    "whole fit/eval loop in relational algebra; one user window + one "
    "vocabulary rollup + a broadcast 5-row model",
    tags=("mining", "ml", "window"),
)
def markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("next"),
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next").isNotNull())
    cutover = F.lit("2024-01-16 00:00:00").cast("timestamp")
    train = (
        pairs.filter(F.col("next_ts") < cutover)
        .groupBy("prev", "next")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_rk = Window.partitionBy("prev").orderBy(F.desc("n"), "next")
    model = (
        train.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select("prev", F.col("next").alias("pred"))
    )
    test = pairs.filter(F.col("next_ts") >= cutover).select("prev", "next")
    correct = F.count(F.when(F.col("next") == F.col("pred"), 1))
    return (
        test.join(F.broadcast(model), "prev")
        .groupBy("prev", "pred")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            correct.alias("n_correct"),
            F.round(
                correct.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("accuracy"),
        )
        .orderBy("prev")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: cohort LTV curve — cohort_retention counts WHO
# comes back; this gate sums WHAT they spend: signup-week cohorts,
# cumulative revenue by week age, per-user LTV. The unit-economics
# readout every growth dashboard plots.
# Exactness: cohort/age weeks are exact integer epoch-day floors,
# revenue is BIGINT cents, the running sum is integer, and per-user
# LTV is one division rounded 6dp.
# Scale: one user collapse for cohorts, one broadcast join onto
# purchases, one (cohort, age) rollup and a cohort-partitioned running
# sum over a calendar-bounded table.
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_curve",
    oracle="""
WITH cohorts AS (
  SELECT user_id,
         min(epoch_us(ts)) // (CAST(604800 AS BIGINT) * 1000000)
           AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
  FROM cohorts GROUP BY cohort_week
), rev AS (
  SELECT c.cohort_week,
         epoch_us(e.ts) // (CAST(604800 AS BIGINT) * 1000000)
           - c.cohort_week AS age_weeks,
         CAST(round(e.value * 100) AS BIGINT) AS cents
  FROM events e JOIN cohorts c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) // (CAST(604800 AS BIGINT) * 1000000)
        >= c.cohort_week
), agg AS (
  SELECT cohort_week, age_weeks,
         CAST(sum(cents) AS BIGINT) AS week_cents
  FROM rev GROUP BY cohort_week, age_weeks
)
SELECT a.cohort_week, a.age_weeks, a.week_cents,
       CAST(sum(a.week_cents) OVER (PARTITION BY a.cohort_week
                                    ORDER BY a.age_weeks
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT)
         AS cum_cents,
       s.n_users,
       round(CAST(sum(a.week_cents) OVER (PARTITION BY a.cohort_week
                                          ORDER BY a.age_weeks
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS DOUBLE)
             / CAST(s.n_users AS DOUBLE), 6) AS ltv_per_user
FROM agg a JOIN sizes s ON s.cohort_week = a.cohort_week
ORDER BY a.cohort_week, a.age_weeks
""",
    doc="cohort LTV curve: signup-week cohorts, purchase revenue "
    "bucketed by week age, cumulative cents per cohort and per-user "
    "LTV — integer week floors, BIGINT running sums, one end division; "
    "user collapse + broadcast cohort join + calendar-bounded rollup",
    tags=("window", "time", "mining"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    week = lambda c: F.expr(  # noqa: E731
        f"unix_micros({c}) div 604800000000"
    )
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_us("ts")).alias("first_us"))
        .select(
            "user_id",
            F.expr("first_us div 604800000000").alias("cohort_week"),
        )
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(cohorts), "user_id")
        .select(
            "cohort_week",
            (week("ts") - F.col("cohort_week")).alias("age_weeks"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .filter(F.col("age_weeks") >= 0)
    )
    agg = rev.groupBy("cohort_week", "age_weeks").agg(
        F.sum("cents").alias("week_cents")
    )
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        agg.withColumn("cum_cents", F.sum("week_cents").over(w_cum))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "week_cents",
            "cum_cents",
            "n_users",
            F.round(
                F.col("cum_cents").cast("double")
                / F.col("n_users").cast("double"),
                6,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: day-of-week x hour activity heatmap — the
# operational calendar every monitoring dashboard opens with, and the
# input to capacity planning (when do the batch windows fit?). Day of
# week is pure epoch-day arithmetic ((day + 4) % 7 pins 1970-01-01 to
# Thursday) so no engine calendar/locale dependence can flip a cell.
# Exactness: all cells are BIGINT counts + exact cents; the share is
# one division rounded 6dp.
# Scale: one 168-key rollup over one scan, map-side combinable.
# ---------------------------------------------------------------------------


@register(
    "dow_hour_heatmap",
    oracle="""
WITH g AS (
  SELECT (epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) + 4) % 7 AS dow,
         (epoch_us(ts) // (CAST(3600 AS BIGINT) * 1000000)) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT dow, hour,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       round(CAST(count(*) AS DOUBLE)
             / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share
FROM g GROUP BY dow, hour ORDER BY dow, hour
""",
    doc="day-of-week x hour activity heatmap via pure epoch arithmetic "
    "((epoch_day + 4) % 7 — no engine calendar/locale dependence), "
    "BIGINT counts and cents, share one end division; a 168-key "
    "map-side-combinable rollup over one scan",
    tags=("window", "time"),
)
def dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    g = ev.select(
        F.expr(
            "(unix_micros(ts) div 86400000000 + 4) % 7"
        ).alias("dow"),
        F.expr(
            "(unix_micros(ts) div 3600000000) % 24"
        ).alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w_all = Window.partitionBy()
    counted = g.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    )
    return counted.select(
        "dow",
        "hour",
        "n",
        "sum_cents",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(w_all).cast("double"),
            6,
        ).alias("share"),
    ).orderBy("dow", "hour")


# ---------------------------------------------------------------------------
# Round-9 continuation: multi-event completion — users who performed
# ALL of view, click and purchase inside one 7-day window: the
# any-order funnel (funnel_conversion is the ordered one;
# event_sequence_regex the regex one). Set-completion over a sliding
# window via per-type as-of state, expressed as conditional max-over-
# window — zero self-joins.
# Exactness: completion tests are integer µs comparisons; the summary
# is BIGINT counts + one division.
# Scale: one user_id window shuffle carrying three running maxes.
# ---------------------------------------------------------------------------


@register(
    "multi_event_completion",
    oracle="""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS e,
         max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           OVER w AS last_view,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER w AS last_click,
         max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           OVER w AS last_purchase
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), complete AS (
  SELECT DISTINCT user_id
  FROM marked
  WHERE last_view IS NOT NULL AND last_click IS NOT NULL
    AND last_purchase IS NOT NULL
    AND e - least(last_view, last_click, last_purchase)
        <= CAST(7 * 24 * 3600 AS BIGINT) * 1000000
)
SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
         AS n_users,
       CAST((SELECT count(*) FROM complete) AS BIGINT) AS n_complete,
       CASE WHEN (SELECT count(DISTINCT user_id) FROM events) = 0 THEN NULL
            ELSE round(CAST((SELECT count(*) FROM complete) AS DOUBLE)
                       / CAST((SELECT count(DISTINCT user_id) FROM events)
                              AS DOUBLE), 6) END AS completion_rate
""",
    doc="any-order funnel: users completing ALL of view/click/purchase "
    "within one 7-day window, via three per-type running maxes on one "
    "user window (zero self-joins) — the set-completion sibling of the "
    "ordered funnel and the sequence-regex gates; integer µs tests, "
    "one end division",
    tags=("window", "time", "funnel"),
)
def multi_event_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def last_of(et):
        return F.max(
            F.when(F.col("event_type") == et, epoch_us("ts"))
        ).over(w)

    marked = ev.select(
        "user_id",
        epoch_us("ts").alias("e"),
        last_of("view").alias("last_view"),
        last_of("click").alias("last_click"),
        last_of("purchase").alias("last_purchase"),
    )
    complete = (
        marked.filter(
            F.col("last_view").isNotNull()
            & F.col("last_click").isNotNull()
            & F.col("last_purchase").isNotNull()
            & (
                F.col("e")
                - F.least("last_view", "last_click", "last_purchase")
                <= F.lit(7 * 24 * 3600 * 1000000)
            )
        )
        .select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_complete"))
    )
    totals = ev.agg(F.countDistinct("user_id").alias("n_users"))
    return totals.crossJoin(F.broadcast(complete)).select(
        "n_users",
        "n_complete",
        # NULL when there are zero users (empty input) instead of an
        # ANSI divide-by-zero crash; oracle pins the same convention
        F.when(
            F.col("n_users") > 0,
            F.round(
                F.col("n_complete").cast("double")
                / F.col("n_users").cast("double"),
                6,
            ),
        ).alias("completion_rate"),
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: Spearman rank correlation — do revenue and
# volume rank parts the same way? ρ = 1 − 6·Σd²/(n(n²−1)) over the two
# rank vectors: both metrics are exact BIGINTs (scaled revenue, total
# quantity), ranks come from unique (metric, partkey) orderings, Σd²
# is a BIGINT sum, and ρ is one division at the end — the classic
# nonparametric correlation with zero float aggregation (the
# rank-space sibling of Mann-Whitney/AUC).
# Scale: one fact collapse + two dim-sized rank windows.
# ---------------------------------------------------------------------------


@register(
    "spearman_revenue_quantity",
    oracle="""
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS rev,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT pk,
         row_number() OVER (ORDER BY rev, pk) AS r_rev,
         row_number() OVER (ORDER BY qty, pk) AS r_qty
  FROM per_part
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum((r_rev - r_qty) * (r_rev - r_qty)) AS BIGINT) AS sd2
  FROM ranked
)
SELECT n, sd2,
       CASE WHEN n < 2 THEN NULL
            ELSE round(1.0 - CAST(6 * sd2 AS DOUBLE)
                        / CAST(n * (n * n - 1) AS DOUBLE), 6)
       END AS spearman_rho
FROM s
""",
    # rho is undefined for n < 2 (n(n^2-1) = 0): both engines pin NULL
    # instead of one crashing on the division (degenerate sweep, r11)
    doc="Spearman rank correlation between part revenue and part "
    "volume: ρ = 1 − 6Σd²/(n(n²−1)) over unique-ordered integer ranks "
    "— BIGINT rank differences, one end division, zero float "
    "aggregation; one fact collapse + two range-partitioned global "
    "ranks (surrogate_keys pattern — no single-task sort)",
    tags=("stats", "mining", "window"),
)
def spearman_revenue_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    )
    # both ranks via the range-partitioned surrogate_keys pattern (no
    # partition-less window: per-part is SF-proportional, and ONE task
    # sorting it is the r11/r12 scale-killer class); numbering identical
    # to row_number() OVER (ORDER BY ...) — unique composite orderings
    from ..functions.codecs import surrogate_keys

    ranked = surrogate_keys(
        surrogate_keys(per_part, ["rev", "pk"], out_col="r_rev"),
        ["qty", "pk"],
        out_col="r_qty",
    ).select("r_rev", "r_qty")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("r_rev") - F.col("r_qty"))
            * (F.col("r_rev") - F.col("r_qty"))
        ).alias("sd2"),
    )
    return s.select(
        "n",
        "sd2",
        F.when(
            F.col("n") >= 2,
            F.round(
                F.lit(1.0)
                - (F.lit(6) * F.col("sd2")).cast("double")
                / (F.col("n") * (F.col("n") * F.col("n") - 1)).cast(
                    "double"
                ),
                6,
            ),
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Round-9 continuation: burstiness (Fano factor) — is a user's event
# arrival Poisson-like (F≈1), regular (F<1) or bursty (F>1)? The
# index of dispersion of the per-hour event counts, computed entirely
# from exact integer moments: F = population-var/mean =
# (n·Σc² − (Σc)²) / (n·Σc) over the user's OBSERVED span of hours
# (empty hours included via span arithmetic, no grid explode needed:
# n = span_hours, Σc and Σc² over non-empty hours are unchanged by
# zero terms). One division at the end — the traffic-shape screen
# next to the gap audit.
# Scale: one (user, hour) rollup + one user rollup.
# ---------------------------------------------------------------------------


@register(
    "event_burstiness_fano",
    oracle="""
WITH hourly AS (
  SELECT user_id,
         epoch_us(ts) // (CAST(3600 AS BIGINT) * 1000000) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, h
), per_user AS (
  SELECT user_id,
         max(h) - min(h) + 1 AS n_hours,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS sc2
  FROM hourly GROUP BY user_id
)
SELECT user_id, CAST(n_hours AS BIGINT) AS n_hours, sc AS n_events,
       CAST(n_hours * sc2 - sc * sc AS BIGINT) AS var_scaled,
       round(CAST(n_hours * sc2 - sc * sc AS DOUBLE)
             / CAST(n_hours * sc AS DOUBLE), 6) AS fano
FROM per_user ORDER BY user_id
""",
    doc="burstiness / Fano factor per user: index of dispersion of "
    "per-hour event counts over the observed span, from exact integer "
    "moments (n·Σc² − (Σc)²)/(n·Σc) — empty hours enter via span "
    "arithmetic (zero terms change nothing), one end division; one "
    "(user, hour) rollup + one user rollup",
    tags=("stats", "time", "window"),
)
def event_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    per_user = hourly.groupBy("user_id").agg(
        (F.max("h") - F.min("h") + 1).alias("n_hours"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    var_scaled = (
        F.col("n_hours") * F.col("sc2") - F.col("sc") * F.col("sc")
    )
    return per_user.select(
        "user_id",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("sc").alias("n_events"),
        var_scaled.alias("var_scaled"),
        F.round(
            var_scaled.cast("double")
            / (F.col("n_hours") * F.col("sc")).cast("double"),
            6,
        ).alias("fano"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Round-9 continuation: SMA crossover signals — the momentum-signal
# primitive (fast moving average crossing the slow one) in fully
# integer form: fast = 3-row sum, slow = 12-row sum over the user's
# ordered cents series, comparison = sign of the cross-multiplied
# BIGINT (sum3·12 − sum12·3) — crossing detection can never ride a
# float boundary. A signal is any sign change between consecutive
# full-frame rows (rows before the 12th are warm-up and excluded on
# both engines).
# Scale: one user window carries both running sums; the lag of the
# sign runs over the same user ordering; one user rollup reports
# counts.
# ---------------------------------------------------------------------------


@register(
    "sma_crossover_signals",
    oracle="""
WITH pts AS (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         sum(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sum3,
         sum(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS sum12
  FROM events
), signed AS (
  SELECT user_id, ts, event_id,
         CASE WHEN sum3 * 12 > sum12 * 3 THEN 1
              WHEN sum3 * 12 < sum12 * 3 THEN -1 ELSE 0 END AS sgn
  FROM pts WHERE rn >= 12
), flips AS (
  SELECT user_id, sgn,
         lag(sgn) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_sgn
  FROM signed
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(count(CASE WHEN prev_sgn IS NOT NULL AND sgn <> prev_sgn
                       THEN 1 END) AS BIGINT) AS n_crossovers,
       CAST(min(sgn) AS BIGINT) AS min_sgn,
       CAST(max(sgn) AS BIGINT) AS max_sgn
FROM flips GROUP BY user_id ORDER BY user_id
""",
    doc="SMA crossover signals in fully integer form: fast 3-row vs "
    "slow 12-row sums compared via the cross-multiplied BIGINT sign "
    "(sum3*12 - sum12*3), a signal = any sign change between "
    "consecutive full-frame rows (12-row warm-up excluded both "
    "engines); one user window + one rollup",
    tags=("window", "time", "stats"),
)
def sma_crossover_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.sum(cents).over(w.rowsBetween(-2, 0)).alias("sum3"),
        F.sum(cents).over(w.rowsBetween(-11, 0)).alias("sum12"),
    )
    diff = F.col("sum3") * 12 - F.col("sum12") * 3
    signed = pts.filter(F.col("rn") >= 12).select(
        "user_id",
        "ts",
        "event_id",
        F.when(diff > 0, 1).when(diff < 0, -1).otherwise(0).alias("sgn"),
    )
    flips = signed.select(
        "user_id",
        "sgn",
        F.lag("sgn").over(w).alias("prev_sgn"),
    )
    return (
        flips.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.count(
                F.when(
                    F.col("prev_sgn").isNotNull()
                    & (F.col("sgn") != F.col("prev_sgn")),
                    1,
                )
            ).alias("n_crossovers"),
            F.min("sgn").cast("long").alias("min_sgn"),
            F.max("sgn").cast("long").alias("max_sgn"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Round-10 continuation: session bounce-rate report — the product-
# analytics readout on top of gap-island sessionization (w5's shape):
# per user cohort, how many sessions, how many BOUNCED (single-event
# sessions), events per session. A bounce-rate shift is the first
# signal of tracking breakage or UX regressions.
# Exactness: sessions are integer gap islands on a unique (ts,
# event_id) order; counts BIGINT; the two ratios one division each 6dp.
# Scale: one user-keyed window sort shared by flag + island id, then
# two hash rollups (session-sized, cohort-sized).
# ---------------------------------------------------------------------------


@register(
    "session_bounce_rate",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), sess AS (
  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, session_id
)
SELECT user_id % 5 AS cohort,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(CASE WHEN n_events = 1 THEN 1 END) AS BIGINT) AS n_bounce,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       round(CAST(count(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS bounce_rate,
       round(CAST(sum(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS events_per_session
FROM sess GROUP BY cohort ORDER BY cohort
""",
    doc="session bounce-rate per user cohort on 30-min gap islands: "
    "session count, single-event bounces, events-per-session — the "
    "product-analytics readout over w5's sessionization; one user "
    "window sort + two rollups, BIGINT counts, two end divisions",
    tags=("window", "time", "mining"),
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap == the oracle's exact INTERVAL compare by
    # construction, not by data luck (ADVICE r10; same fix as w5)
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w_ord)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_cum))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounce = F.count(F.when(F.col("n_events") == 1, 1))
    return (
        sess.groupBy((F.col("user_id") % 5).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounce.alias("n_bounce"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            F.round(
                bounce.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("bounce_rate"),
            F.round(
                F.sum("n_events").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("events_per_session"),
        )
        .orderBy("cohort")
    )


# ---------------------------------------------------------------------------
# Round-10 continuation: hourly OHLC resampling — the candlestick
# reduction every TSDB ships (open/high/low/close + volume per bucket):
# open/close are the FIRST/LAST values under the unique (ts, event_id)
# order inside the bucket — rank algebra, not arg_min/arg_max, so tie
# semantics are pinned identically on both engines; high/low/volume are
# plain aggregates.
# Exactness: cents BIGINT end to end.
# Scale: one (type, hour) window sort reused by the rank picks, then
# one rollup on the same keys — a single shuffle.
# ---------------------------------------------------------------------------


@register(
    "ts_resample_ohlc",
    oracle="""
WITH src AS (
  SELECT event_type,
         epoch_us(ts) // (CAST(3600 AS BIGINT) * 1000000) AS h,
         ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), ranked AS (
  SELECT event_type, h, cents,
         row_number() OVER (PARTITION BY event_type, h
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type, h) AS n
  FROM src
)
SELECT event_type, h,
       CAST(max(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(max(CASE WHEN rn = n THEN cents END) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS volume
FROM ranked GROUP BY event_type, h ORDER BY event_type, h
""",
    doc="hourly OHLC candles per event type: open/close as rank-algebra "
    "first/last under the unique (ts, event_id) order (tie semantics "
    "pinned, no arg_min/arg_max), high/low/volume plain aggregates — "
    "the TSDB resampling primitive; one (type, hour) window sort "
    "reused by the rollup, BIGINT cents",
    tags=("window", "time"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    src = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type", "h").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type", "h")
    ranked = src.select(
        "event_type",
        "h",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return (
        ranked.groupBy("event_type", "h")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias(
                "open_cents"
            ),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max(F.when(F.col("rn") == F.col("n"), F.col("cents"))).alias(
                "close_cents"
            ),
            F.count(F.lit(1)).alias("volume"),
        )
        .orderBy("event_type", "h")
    )
