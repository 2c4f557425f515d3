"""Relational operator gate queries (SURVEY.md §2.1, §2.3-2.5, §2.7).

Each query runs on the driver's star schema (TESTDATA.md) and has a DuckDB
twin. Conventions for hash-stable parity:

- every computed column aliased identically on both sides;
- floating aggregates wrapped in round(x, 2..6) on BOTH sides (sum order
  differs between engines; rounding absorbs the last-ulp noise);
- timestamps output via explicit format strings (spark date_format vs
  duckdb strftime) — never engine-default casts;
- deterministic total orders (unique tiebreaker column) wherever limit/top-k
  truncates.

Scale notes are per-query; the common posture: filters reach the parquet
scan, small dims broadcast, aggregations are partial (map-side) by
construction, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import register


def t(spark: SparkSession, sf_dir: str, name: str, heavy: bool = False) -> DataFrame:
    from ..session import read_table

    return read_table(spark, sf_dir, name, heavy=heavy)


# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (A-group: multi-agg groupBy).
# Scale: classic partial-agg query; shuffle carries only |flags|x|status|
# groups after map-side combine. Columns pruned to the 7 used.
# ---------------------------------------------------------------------------


@register(
    "flagship_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2)
           AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
           AS sum_base_price,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) / 10000.0, 2)
           AS sum_disc_price,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            * 1000000) AS BIGINT)) / 1000000.0, 2)
           AS sum_charge,
       round((sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0)
             / count(*), 4) AS avg_qty,
       round((sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0)
             / count(*), 4) AS avg_price,
       round((sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0)
             / count(*), 4) AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="groupBy two keys + 8 aggregates (SURVEY §2.5; reference A-group). "
    "Money is summed as exact INTEGER UNITS (cents / 1e-4 / 1e-6 — each "
    "column's native decimal grid, lossless per row): float sums of "
    "2-6-decimal money land EXACTLY on round-to-2 half-boundaries "
    "(margin audit: 4.8e-7 grid units), where summation order picks the "
    "side; integer sums are order-invariant and the final divisions are "
    "single IEEE ops on identical operands — bit-identical everywhere. "
    "Long sums ride Tungsten's primitive path (~3x faster than the "
    "decimal(18,x) accumulator measured at sf0.1); at fleet scale where "
    "a per-group micro-unit sum could exceed 2^63 (~1e12 rows/group), "
    "swap the accumulator to decimal(38,0) — same plan shape",
    tags=("agg", "flagship"),
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def units(col, scale):
        return F.sum(F.round(col * scale).cast("long")) / float(scale)

    qty = units(F.col("l_quantity"), 100)
    price = units(F.col("l_extendedprice"), 100)
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(qty, 2).alias("sum_qty"),
            F.round(price, 2).alias("sum_base_price"),
            F.round(units(disc_price, 10000), 2).alias("sum_disc_price"),
            F.round(units(charge, 1000000), 2).alias("sum_charge"),
            F.round(qty / n, 4).alias("avg_qty"),
            F.round(price / n, 4).alias("avg_price"),
            F.round(units(F.col("l_discount"), 100) / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# S1/O1/O2/F8: ordered scan with limit (reference benchmark.py:28-39).
# Scale: Spark plans orderBy+limit as TakeOrderedAndProject — no full sort.
# ---------------------------------------------------------------------------


@register(
    "s1_scan_order_limit",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, user_id, event_type,
       round(value, 2) AS value
FROM events ORDER BY ts, event_id LIMIT 100
""",
    doc="S1+O1+O2: sorted scan capped at MAX_DOCUMENTS (benchmark.py:33-36)",
    tags=("scan",),
)
def s1_scan_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.orderBy("ts", "event_id")
        .limit(100)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# F1: point lookup on key (parquet pushdown; reference apache_parquet.py:116).
# ---------------------------------------------------------------------------


@register(
    "f1_point_lookup",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, round(l_quantity, 2) AS qty
FROM lineitem WHERE l_orderkey = 1
ORDER BY l_linenumber
""",
    doc="F1: key equality filter pushed to the parquet scan",
    tags=("filter",),
)
def f1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            F.round("l_quantity", 2).alias("qty"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "f2_in_list",
    oracle="""
SELECT p_brand, count(*) AS n_parts, cast(sum(p_size) AS BIGINT) AS total_size
FROM part WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
GROUP BY p_brand ORDER BY p_brand
""",
    doc="F2: IN-list predicate (postgresql_velocity.py:99-101)",
    tags=("filter",),
)
def f2_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("p_size").cast("long").alias("total_size"),
        )
        .orderBy("p_brand")
    )


@register(
    "f9_first_match",
    oracle="""
SELECT event_id, user_id, round(value, 2) AS value
FROM events WHERE event_type = 'purchase' AND value > 100
ORDER BY ts, event_id LIMIT 1
""",
    doc="F9: first row matching a predicate (all_in_one_gzip_file_store.py:27)",
    tags=("filter",),
)
def f9_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 100))
        .orderBy("ts", "event_id")
        .limit(1)
        .select("event_id", "user_id", F.round("value", 2).alias("value"))
    )


# ---------------------------------------------------------------------------
# Joins (J1-J8). Build sides are dims -> broadcast; Catalyst picks BHJ
# under the 64 MB threshold set in session.py.
# ---------------------------------------------------------------------------


@register(
    "j1_doc_feature_join",
    oracle="""
SELECT o.o_orderkey, o.o_orderpriority, count(*) AS n_lines,
       round(sum(l.l_extendedprice), 2) AS order_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY o.o_orderkey
""",
    doc="J1/J2: FK equi-join fact->document row (postgresql_json_agg_store.py:101-103)",
    tags=("join",),
)
def j1_doc_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("order_price"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "j4_snowflake_revenue",
    oracle="""
SELECT r.r_name, n.n_name, count(*) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
""",
    doc="J4/J5: snowflake multi-join over 2 dim levels (postgresql_velocity_2levels.py:155-196)",
    tags=("join",),
)
def j4_snowflake_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "j6_three_table_lookup",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, p.p_name, p.p_brand,
       round(l.l_extendedprice, 2) AS price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p   ON l.l_partkey = p.p_partkey
WHERE o.o_orderkey = 7
ORDER BY l.l_linenumber
""",
    doc="J6: main->l2->l1 three-table point reconstruction (apache_parquet_velocity.py:222-247)",
    tags=("join",),
)
def j6_three_table_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 7)
    part = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_name",
            "p_brand",
            F.round("l_extendedprice", 2).alias("price"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "j7_semi_existing_keys",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c WHERE c.c_custkey IN (SELECT o_custkey FROM orders)
ORDER BY c.c_custkey
""",
    doc="J7: existence probe as left-semi join (postgresql_velocity.py:98-102)",
    tags=("join",),
)
def j7_semi_existing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "f4_anti_novelty",
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c WHERE c.c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
ORDER BY c.c_custkey
""",
    doc="F4/J8: anti-join novelty filter — keep keys not already stored (postgresql_velocity.py:104-113)",
    tags=("join",),
)
def f4_anti_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Aggregations (A2-A9) & dimension builds (P14/P18/A9).
# ---------------------------------------------------------------------------


@register(
    "a4_zonemap_minmax",
    oracle="""
SELECT l_orderkey,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(min(l_quantity), 2)      AS min_qty,
       round(max(l_quantity), 2)      AS max_qty,
       count(*)                       AS n
FROM lineitem GROUP BY l_orderkey
HAVING count(*) >= 5
ORDER BY l_orderkey
""",
    doc="A4: per-document zone map min/max (postgresql_velocity_split.py:103-106)",
    tags=("agg",),
)
def a4_zonemap_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.min("l_quantity"), 2).alias("min_qty"),
            F.round(F.max("l_quantity"), 2).alias("max_qty"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 5)
        .orderBy("l_orderkey")
    )


@register(
    "a6_distinct_keys",
    oracle="""
SELECT count(DISTINCT l_partkey)  AS n_parts,
       count(DISTINCT l_suppkey)  AS n_supps,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
    doc="A6: distinct-key sets (postgresql_velocity.py:99-102)",
    tags=("agg",),
)
def a6_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "a9_first_seen_dedup",
    oracle="""
SELECT user_id, event_id AS first_event, strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
FROM (SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1 ORDER BY user_id
""",
    doc="A9/F5: first-seen dedup via window rank (apache_parquet_velocity.py:81-85)",
    tags=("agg", "window"),
)
def a9_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
        .orderBy("user_id")
    )


@register(
    "p14_hashcons_dim",
    oracle="""
SELECT substr(md5(concat(c_name, '|', c_mktsegment, '|', cast(c_nationkey AS VARCHAR))), 1, 8)
           AS hash_key,
       c_custkey, c_name
FROM customer ORDER BY c_custkey
""",
    doc="P14: md5 hash-consing dimension key (postgresql_velocity.py:64-67)",
    tags=("project",),
)
def p14_hashcons_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        F.md5(
            F.concat_ws(
                "|", F.col("c_name"), F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
            )
        )
        .substr(1, 8)
        .alias("hash_key"),
        "c_custkey",
        "c_name",
    ).orderBy("c_custkey")


@register(
    "p18_surrogate_keys",
    oracle="""
SELECT row_number() OVER (ORDER BY p_partkey) AS surrogate_id, p_partkey, p_name
FROM part ORDER BY p_partkey
""",
    doc="P18/P19: dense surrogate key allocation by key order (postgresql_python_conv.py:55-56)",
    tags=("project",),
)
def p18_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range-partitioned dense numbering: identical output to a global
    # row_number() but the sort never lands on a single task, so the same
    # plan holds on a fact-scale input (see codecs.surrogate_keys).
    from ..functions.codecs import surrogate_keys

    return (
        surrogate_keys(t(spark, sf_dir, "part"), "p_partkey")
        .withColumn("surrogate_id", F.col("surrogate_id").cast("int"))
        .select("surrogate_id", "p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "p6_direction_roundtrip",
    oracle="""
SELECT l_orderkey, l_linenumber,
       (l_linenumber % 2) + 1                                  AS direction,
       cast((l_linenumber % 2 + 1) - 1 AS BOOLEAN)             AS stored,
       cast(cast((l_linenumber % 2 + 1) - 1 AS BOOLEAN) AS INT) + 1 AS decoded
FROM lineitem WHERE l_orderkey <= 50
ORDER BY l_orderkey, l_linenumber
""",
    doc="P6: direction-±1 encode/decode involution (apache_parquet.py:35, citus_store.py:121)",
    tags=("project",),
)
def p6_direction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.codecs import decode_direction, encode_direction

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 50)
    direction = (F.col("l_linenumber") % 2) + 1
    stored = encode_direction(direction)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        direction.alias("direction"),
        stored.alias("stored"),
        decode_direction(stored).alias("decoded"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# Set operations (§2.7: union is used by the reference; intersect/except
# are the free Spark extensions).
# ---------------------------------------------------------------------------


@register(
    "o3_union_append",
    oracle="""
SELECT k, count(*) AS n FROM (
  SELECT l_orderkey AS k FROM lineitem WHERE l_linenumber = 1
  UNION ALL
  SELECT l_orderkey AS k FROM lineitem WHERE l_linenumber = 2
) GROUP BY k HAVING count(*) > 1 ORDER BY k
""",
    doc="O3: union/append of accumulated batches (apache_parquet.py:62-103)",
    tags=("setop",),
)
def o3_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_orderkey").alias("k"))
    b = li.filter(F.col("l_linenumber") == 2).select(F.col("l_orderkey").alias("k"))
    return (
        a.unionByName(b)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .orderBy("k")
    )


@register(
    "setop_intersect_except",
    oracle="""
SELECT 'both' AS bucket, count(*) AS n FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT 'only_f' AS bucket, count(*) AS n FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
ORDER BY bucket
""",
    doc="set ops beyond the reference (SURVEY §2.7 'free in Spark')",
    tags=("setop",),
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f_cust.intersect(o_cust).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    only_f = f_cust.exceptAll(o_cust).agg(F.count("*").alias("n")).select(
        F.lit("only_f").alias("bucket"), "n"
    )
    return both.unionByName(only_f).orderBy("bucket")


@register(
    "agg_rollup_status",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL')    AS status,
       coalesce(o_orderpriority, 'ALL')  AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
HAVING count(*) > 0
ORDER BY status, priority
""",
    # HAVING count(*) > 0 is a no-op on any non-empty input (every
    # rollup cell aggregates >= 1 row) and pins the EMPTY-input
    # convention to Spark's: Spark emits 0 rows for rollup/cube over an
    # empty table, standard SQL (DuckDB) emits the () grand-total row
    doc="rollup aggregation (SURVEY §2.5: free Spark extension)",
    tags=("agg",),
)
def agg_rollup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "agg_pivot_manual",
    oracle="""
SELECT l_returnflag,
       cast(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_o,
       cast(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_f
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="pivot via conditional aggregation (SURVEY §2.5 extension)",
    tags=("agg",),
)
def agg_pivot_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0))
            .cast("long")
            .alias("qty_o"),
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0))
            .cast("long")
            .alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a7_counts",
    oracle="SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users FROM events",
    doc="A7: sanity counts (mobility_db.py:68,115)",
    tags=("agg",),
)
def a7_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").agg(
        F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users")
    )


@register(
    "tpch_q3_style_topn",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
""",
    doc="TPC-H Q3 shape: 3-way join + grouped revenue + top-N "
    "(TakeOrdered over aggregated output)",
    tags=("join", "agg", "flagship"),
)
def tpch_q3_style_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
ORDER BY o_orderkey
""",
    doc="scalar subquery predicate (Catalyst rewrites to a broadcast of the "
    "single aggregated value)",
    tags=("filter", "subquery"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    # DataFrame-parameterized SQL ({df} template binding): no
    # createOrReplaceTempView side effects on the shared session, so
    # concurrent gate runs can't race on view names and nothing leaks
    # into the catalog after the gate returns (r10 not_in_null_trap
    # treatment, retrofitted per VERDICT r10 item 3)
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM {orders}
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM {orders})
        ORDER BY o_orderkey
        """,
        orders=orders,
    )


@register(
    "correlated_exists_sql",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
ORDER BY s.s_suppkey
""",
    doc="correlated EXISTS through the spark.sql path (Catalyst decorrelates "
    "to a left-semi join)",
    tags=("filter", "subquery", "sql"),
)
def correlated_exists_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    # {df}-parameterized SQL: view-name-race-free on the shared session
    # (r10 not_in_null_trap treatment, retrofitted per VERDICT r10 item 3)
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name
        FROM {supplier} s
        WHERE EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        ORDER BY s.s_suppkey
        """,
        supplier=t(spark, sf_dir, "supplier"),
        lineitem=t(spark, sf_dir, "lineitem"),
    )


@register(
    "grouping_sets_cube",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS flag,
       coalesce(l_linestatus, 'ALL') AS status,
       count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
HAVING count(*) > 0
ORDER BY flag, status
""",
    # HAVING: no-op on non-empty input; aligns the empty-table case
    # with Spark (0 rows) vs standard SQL's () grand-total row — see
    # agg_rollup_status
    doc="cube aggregation (grouping sets; free Spark extension per SURVEY §2.5)",
    tags=("agg",),
)
def grouping_sets_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n",
        )
        .orderBy("flag", "status")
    )


@register(
    "approx_distinct_users",
    # Value-checkable twin for the HLL sketch (the knn_ivf_seeded trick): the
    # HLL++ estimate is engine-specific, but its relative-error guarantee is
    # deterministic. The Spark plan computes BOTH the sketch estimate and the
    # exact distinct count, and emits the exact count plus a boolean
    # "relative error <= 5*rsd"; the oracle computes the exact count and
    # asserts the boolean TRUE. A degraded sketch flips the boolean and
    # hash-mismatches — a real value check, not rows-only.
    oracle="""
SELECT count(DISTINCT user_id) AS exact_users, count(*) AS n_events,
       TRUE AS within_rel_error
FROM events
""",
    doc="approx_count_distinct / HLL++ extension (SURVEY §2.5: approximate "
    "aggregates), verified in-plan against the sketch's rsd guarantee "
    "(rsd=0.01, bound 5 sigma).",
    tags=("agg", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    rsd = 0.01
    return (
        t(spark, sf_dir, "events")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(5 * rsd) * F.col("exact_users")
            ).alias("within_rel_error"),
        )
    )
