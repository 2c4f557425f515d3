"""Mobility-store pipeline analogues on the driver tables (SURVEY.md §2.2).

The GeoJSON pipelines themselves are exercised end-to-end by tests/ on a
synthesized snapshot stream (the driver tables have no nested GeoJSON). The
encode/decode operators they are built from are gate-checked here on the
star schema so the DuckDB oracle covers them: fixed-point (P11), pairing
(P12), WKT (P15), velocity dimension build (A9+P14+F4 composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.codecs import decode_fixed_point, encode_fixed_point, epoch_us
from . import register
from .relational import t


@register(
    "p11_fixed_point_roundtrip",
    oracle="""
WITH zone AS (
  SELECT l_orderkey, min(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_orderkey
)
SELECT l.l_orderkey, l.l_linenumber,
       cast(round((l.l_extendedprice - z.min_price) * 100000000) AS BIGINT) AS encoded,
       round(cast(round((l.l_extendedprice - z.min_price) * 100000000) AS BIGINT)
             / 100000000.0 + z.min_price, 4) AS decoded
FROM lineitem l JOIN zone z ON l.l_orderkey = z.l_orderkey
WHERE l.l_orderkey <= 100
ORDER BY l.l_orderkey, l.l_linenumber
""",
    doc="P11+A4: fixed-point scaling against the per-document zone-map min "
    "(postgresql_velocity_split.py:121-122, inverse :176-179)",
    tags=("codec",),
)
def p11_fixed_point_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    zone = li.groupBy("l_orderkey").agg(F.min("l_extendedprice").alias("min_price"))
    j = li.filter(F.col("l_orderkey") <= 100).join(F.broadcast(zone), "l_orderkey")
    encoded = encode_fixed_point(F.col("l_extendedprice"), F.col("min_price"))
    return j.select(
        "l_orderkey",
        "l_linenumber",
        encoded.alias("encoded"),
        F.round(decode_fixed_point(encoded, F.col("min_price")), 4).alias("decoded"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "p12_cantor_pairing",
    oracle="""
WITH s AS (
  SELECT l_orderkey, l_linenumber,
         cast(round((l_discount + 1) * 100) AS BIGINT) AS a,
         cast(round((l_tax + 1) * 100) AS BIGINT)      AS b
  FROM lineitem WHERE l_orderkey <= 200
)
SELECT l_orderkey, l_linenumber,
       ((a + b) * (a + b + 1)) // 2 + b AS cantor_z
FROM s ORDER BY l_orderkey, l_linenumber
""",
    doc="P12: Cantor pairing (apache_parquet_cantor.py:18-30) at bigint-safe "
    "precision for the oracle; full Decimal(38) precision is property-tested "
    "in tests/test_codecs.py",
    tags=("codec",),
)
def p12_cantor_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    a = F.round((F.col("l_discount") + 1) * 100).cast("long")
    b = F.round((F.col("l_tax") + 1) * 100).cast("long")
    s = a + b
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(s * (s + 1) / 2) + b).alias("cantor_z"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "p15_wkt_points",
    oracle="""
SELECT event_id,
       printf('POINT(%.4f %.4f)', value / 100.0, cast(user_id AS DOUBLE)) AS wkt
FROM events WHERE event_id < 50 ORDER BY event_id
""",
    doc="P15: WKT point text construction (mobility_db_batch.py:87-89)",
    tags=("codec",),
)
def p15_wkt_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    return ev.select(
        "event_id",
        F.format_string(
            "POINT(%.4f %.4f)",
            F.col("value") / 100.0,
            F.col("user_id").cast("double"),
        ).alias("wkt"),
    ).orderBy("event_id")


@register(
    "velocity_dim_build",
    oracle="""
WITH firsts AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT substr(md5(cast(user_id AS VARCHAR) || '|' || event_type), 1, 8) AS dim_hash,
       user_id, event_type, event_id AS first_event
FROM firsts WHERE rn = 1
ORDER BY user_id, event_type
""",
    doc="velocity dimension build = first-seen dedup (A9/F5) + hash-consed "
    "key (P14), the write path of postgresql_velocity.py:64-115",
    tags=("pipeline",),
)
def velocity_dim_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.md5(
                F.concat_ws("|", F.col("user_id").cast("string"), F.col("event_type"))
            )
            .substr(1, 8)
            .alias("dim_hash"),
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "f6_temporal_containment",
    oracle="""
SELECT user_id, count(*) AS n_contained
FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-03 00:00:00' AND TIMESTAMP '2024-01-06 00:00:00'
GROUP BY user_id ORDER BY user_id
""",
    doc="F6: temporal containment — instants within a range "
    "(mobility_db.py:111 '@>' analog)",
    tags=("filter", "time"),
)
def f6_temporal_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("ts").between("2024-01-03 00:00:00", "2024-01-06 00:00:00")
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_contained"))
        .orderBy("user_id")
    )


@register(
    "trajectory_step_metrics",
    oracle="""
WITH fixes AS (
  SELECT user_id, event_id, ts,
         value % 80.0          AS lat,
         (value * 3.7) % 160.0 AS lon
  FROM events WHERE user_id < 30
), stepped AS (
  SELECT user_id, event_id, ts, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0 AS dt_s
  FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       round(dt_s, 6) AS dt_s,
       round(2 * 6371008.8 * asin(sqrt(
           sin(radians(lat - plat) / 2) ^ 2
           + cos(radians(plat)) * cos(radians(lat))
             * sin(radians(lon - plon) / 2) ^ 2)), 2) AS step_m
FROM stepped WHERE plat IS NOT NULL
ORDER BY user_id, event_id
""",
    doc="trajectory step metrics (operators/trajectory.py): per-entity lag "
    "window + haversine distance, oracle-checked by mapping events.value "
    "onto pseudo lat/lon — the math and window shape are exactly what runs "
    "on real vehicle tracks (reference stores tracks, never analyzes them: "
    "mobility_db_batch.py:85-99)",
    tags=("mobility", "trajectory", "window"),
)
def trajectory_step_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import haversine_m

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    fixes = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = fixes.withColumns(
        {
            "plat": F.lag("lat").over(w),
            "plon": F.lag("lon").over(w),
            "dt_s": (
                epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
            )
            / 1000000.0,
        }
    )
    return (
        stepped.filter(F.col("plat").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round("dt_s", 6).alias("dt_s"),
            F.round(
                haversine_m(F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")),
                2,
            ).alias("step_m"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "resample_linear_grid",
    oracle="""
WITH b AS (
  SELECT user_id, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
  FROM events WHERE user_id < 10 GROUP BY user_id
), grid AS (
  SELECT user_id,
         unnest(generate_series(
             cast(ceil(t0 / 21600000000.0) * 21600000000 AS BIGINT),
             t1, 21600000000)) AS gus,
         TRUE AS is_grid, cast(NULL AS DOUBLE) AS v
  FROM b
), obs AS (
  SELECT user_id, epoch_us(ts) AS gus, FALSE AS is_grid, value AS v
  FROM events WHERE user_id < 10
), m AS (
  SELECT * FROM obs UNION ALL SELECT * FROM grid
), w AS (
  SELECT user_id, gus, is_grid,
    last_value(CASE WHEN NOT is_grid THEN gus END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY gus, is_grid
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pus,
    last_value(CASE WHEN NOT is_grid THEN v END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY gus, is_grid
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    first_value(CASE WHEN NOT is_grid THEN gus END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY gus, is_grid
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nus,
    first_value(CASE WHEN NOT is_grid THEN v END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY gus, is_grid
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM m
)
SELECT user_id,
       strftime(make_timestamp(gus), '%Y-%m-%d %H:%M:%S') AS grid_ts,
       round(coalesce(
           pv + (nv - pv) * (CASE WHEN nus > pus
                                  THEN (gus - pus) * 1.0 / (nus - pus)
                                  ELSE 0 END), pv, nv), 4) AS value_interp
FROM w WHERE is_grid ORDER BY user_id, gus
""",
    doc="regular-grid resampling with linear interpolation "
    "(operators/resample.py): per-entity 6h grid via sequence(), nearest "
    "real observations carried by IGNORE NULLS window frames, lerp "
    "between them — gap repair for irregular feeds, one entity-keyed "
    "shuffle and no joins",
    tags=("mobility", "time", "resample"),
)
def resample_linear_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.resample import resample_linear

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    out = resample_linear(
        ev, step_s=21600, id_col="user_id", ts_col="ts", val_cols=("value",)
    )
    return out.select(
        "user_id",
        F.date_format("grid_ts", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
        F.round("value_interp", 4).alias("value_interp"),
    ).orderBy("user_id", "grid_ts")


# proximity grid-join cell sizes: must cover the largest degree-span of the
# 50 km radius anywhere at |lat| <= 80 deg; identical literals go into the
# Spark call and the oracle SQL so both engines bucket identically.
_PROX_RADIUS_M = 50000.0
_PROX_CELL_LAT = 0.4974044531264131  # 50000/110574 * 1.1
_PROX_CELL_LON = 2.8452423335689883  # 50000/(111320*cos(80 deg)) * 1.1
_PROX_HAVERSINE = """round(2 * 6371008.8 * asin(sqrt(
           sin(radians(b.lat - a.lat) / 2) ^ 2
           + cos(radians(a.lat)) * cos(radians(b.lat))
             * sin(radians(b.lon - a.lon) / 2) ^ 2)), 2)"""


@register(
    "proximity_grid_join",
    oracle=f"""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
), fix AS (
  SELECT user_id, value % 80.0 AS lat, (value * 3.7) % 160.0 AS lon
  FROM ranked WHERE rk = 1
), cells AS (
  SELECT user_id, lat, lon,
         cast(floor(lat / {_PROX_CELL_LAT!r}) AS BIGINT) AS cx,
         cast(floor(lon / {_PROX_CELL_LON!r}) AS BIGINT) AS cy
  FROM fix
)
SELECT a.user_id AS id_a, b.user_id AS id_b,
       {_PROX_HAVERSINE} AS dist_m
FROM cells a JOIN cells b
  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
 AND a.user_id < b.user_id
WHERE {_PROX_HAVERSINE} <= {_PROX_RADIUS_M!r}
ORDER BY id_a, id_b
""",
    doc="spatial proximity self-join (operators/trajectory.proximity_pairs): "
    "latest fix per entity, grid-cell bucketing + 3x3 neighbor-cell "
    "equi-join + exact haversine verify — every entity pair within 50 km, "
    "linear in points + true pairs instead of O(n²); the oracle's "
    "adjacent-cell theta join computes the identical pair set",
    tags=("mobility", "join", "spatial"),
)
def proximity_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import proximity_pairs

    ev = t(spark, sf_dir, "events")
    # latest fix per entity as a struct-max aggregate (no window sort):
    # lexicographic (ts, event_id) max == the oracle's row_number() desc pick
    last = ev.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "value")).alias("_s")
    )
    fix = last.select(
        "user_id",
        (F.col("_s.value") % 80.0).alias("lat"),
        ((F.col("_s.value") * 3.7) % 160.0).alias("lon"),
    )
    pairs = proximity_pairs(
        fix,
        _PROX_RADIUS_M,
        id_col="user_id",
        cell_lat_deg=_PROX_CELL_LAT,
        cell_lon_deg=_PROX_CELL_LON,
    )
    return pairs.select(
        F.col("id_a"), F.col("id_b"), F.col("dist_m")
    ).orderBy("id_a", "id_b")


@register(
    "co_location_contacts",
    oracle=f"""
WITH cells AS (
  SELECT user_id, epoch_us(ts) AS tus,
         value % 80.0 AS lat, (value * 3.7) % 160.0 AS lon,
         cast(floor((value % 80.0) / {_PROX_CELL_LAT!r}) AS BIGINT) AS cx,
         cast(floor(((value * 3.7) % 160.0) / {_PROX_CELL_LON!r}) AS BIGINT) AS cy,
         epoch_us(ts) // 3600000000 AS tb
  FROM events
), offs AS (
  SELECT x.a AS dx, y.a AS dy, t.a AS dt
  FROM (VALUES (-1),(0),(1)) x(a), (VALUES (-1),(0),(1)) y(a), (VALUES (-1),(0),(1)) t(a)
), aexp AS (
  SELECT c.user_id, c.tus, c.lat, c.lon,
         c.cx + o.dx AS jx, c.cy + o.dy AS jy, c.tb + o.dt AS jt
  FROM cells c CROSS JOIN offs o
), contacts AS (
  SELECT a.user_id AS id_a, b.user_id AS id_b,
         {_PROX_HAVERSINE} AS dist_m
  FROM aexp a JOIN cells b
    ON a.jx = b.cx AND a.jy = b.cy AND a.jt = b.tb
   AND a.user_id < b.user_id
  WHERE abs(a.tus - b.tus) <= 3600000000
)
SELECT id_a, id_b,
       cast(count(*) AS BIGINT) AS n_contacts,
       min(dist_m) AS min_dist_m
FROM contacts WHERE dist_m <= {_PROX_RADIUS_M!r}
GROUP BY id_a, id_b
ORDER BY id_a, id_b
""",
    doc="spatiotemporal co-location (operators/trajectory.co_location_pairs): "
    "entity pairs within 50 km AND 1 h of each other across full histories, "
    "per-pair contact count + closest approach — 3x3x3 neighbor-bucket "
    "equi-join on (lat cell, lon cell, time bucket), exact distance/|dt| "
    "verify; the contact-tracing / encounter-mining primitive, linear in "
    "observations + true contacts",
    tags=("mobility", "join", "spatial", "time"),
)
def co_location_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import co_location_pairs

    ev = t(spark, sf_dir, "events")
    fixes = ev.select(
        "user_id",
        "ts",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    out = co_location_pairs(
        fixes,
        _PROX_RADIUS_M,
        3600,
        id_col="user_id",
        ts_col="ts",
        cell_lat_deg=_PROX_CELL_LAT,
        cell_lon_deg=_PROX_CELL_LON,
    )
    return out.select("id_a", "id_b", "n_contacts", "min_dist_m").orderBy(
        "id_a", "id_b"
    )


@register(
    "od_matrix_trips",
    oracle="""
WITH fixes AS (
  SELECT user_id, event_id, ts, epoch_us(ts) // 1000000 AS tsec,
         value % 80.0 AS lat, (value * 3.7) % 160.0 AS lon
  FROM events
), stepped AS (
  SELECT *, CASE WHEN (tsec - lag(tsec) OVER w) IS NULL
                   OR (tsec - lag(tsec) OVER w) > 86400 THEN 1 ELSE 0 END AS new_trip
  FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), trips AS (
  SELECT *, sum(new_trip) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_id
  FROM stepped
), ranked AS (
  SELECT user_id, trip_id, lat, lon,
         row_number() OVER (PARTITION BY user_id, trip_id
                            ORDER BY ts, event_id) AS rka,
         row_number() OVER (PARTITION BY user_id, trip_id
                            ORDER BY ts DESC, event_id DESC) AS rkd
  FROM trips
), ends AS (
  SELECT user_id, trip_id,
         max(CASE WHEN rka = 1 THEN lat END) AS o_lat,
         max(CASE WHEN rka = 1 THEN lon END) AS o_lon,
         max(CASE WHEN rkd = 1 THEN lat END) AS d_lat,
         max(CASE WHEN rkd = 1 THEN lon END) AS d_lon
  FROM ranked GROUP BY user_id, trip_id
)
SELECT cast(floor(o_lat / 20.0) AS BIGINT) AS o_cx,
       cast(floor(o_lon / 20.0) AS BIGINT) AS o_cy,
       cast(floor(d_lat / 20.0) AS BIGINT) AS d_cx,
       cast(floor(d_lon / 20.0) AS BIGINT) AS d_cy,
       cast(count(*) AS BIGINT) AS n_trips
FROM ends GROUP BY o_cx, o_cy, d_cx, d_cy
ORDER BY o_cx, o_cy, d_cx, d_cy
""",
    doc="origin-destination trip matrix (operators/trajectory.od_matrix): "
    "gap-sessionized trips, per-trip first/last fix as combinable "
    "struct-min/max (no second sort), endpoints bucketed into a 20-degree "
    "grid and counted — OD flow aggregation whose output cardinality is "
    "bounded by the grid, not the data",
    tags=("mobility", "trajectory", "agg"),
)
def od_matrix_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import od_matrix

    ev = t(spark, sf_dir, "events")
    fixes = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    out = od_matrix(
        fixes,
        gap_s=86400,
        cell_lat_deg=20.0,
        cell_lon_deg=20.0,
        id_col="user_id",
        ts_col="ts",
        tiebreak_cols=("event_id",),
    )
    return out.select(
        "o_cx", "o_cy", "d_cx", "d_cy", "n_trips"
    ).orderBy("o_cx", "o_cy", "d_cx", "d_cy")


_CELL10 = """cast(floor((value % 80.0) / 10.0) AS BIGINT) AS cx,
         cast(floor(((value * 3.7) % 160.0) / 10.0) AS BIGINT) AS cy"""


@register(
    "mobility_location_entropy",
    oracle=f"""
WITH visits AS (
  SELECT user_id, {_CELL10}, count(*) AS n
  FROM events GROUP BY user_id, cx, cy
), per AS (
  SELECT user_id, sum(n) AS total,
         sum(cast(n AS DOUBLE) * ln(cast(n AS DOUBLE))) AS s
  FROM visits GROUP BY user_id
)
SELECT user_id, cast(total AS BIGINT) AS n_obs,
       round(ln(cast(total AS DOUBLE)) - s / total, 4) AS entropy_nats
FROM per ORDER BY user_id
""",
    doc="per-entity Shannon entropy of the cell-visit distribution "
    "(operators/mobility_metrics.location_entropy): the location-"
    "predictability statistic, computed as ln T - (sum n ln n)/T so both "
    "engines evaluate the identical expression tree",
    tags=("mobility", "agg"),
)
def mobility_location_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mobility_metrics import cell_visits, location_entropy

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    visits = cell_visits(ev, 10.0, 10.0, id_col="user_id")
    return location_entropy(visits, id_col="user_id").orderBy("user_id")


@register(
    "mobility_radius_of_gyration",
    oracle="""
WITH fixes AS (
  SELECT user_id, value % 80.0 AS lat, (value * 3.7) % 160.0 AS lon
  FROM events
), cent AS (
  SELECT user_id, avg(lat) AS clat, avg(lon) AS clon
  FROM fixes GROUP BY user_id
)
SELECT f.user_id, cast(count(*) AS BIGINT) AS n_obs,
       round(sqrt(avg(pow(2 * 6371008.8 * asin(sqrt(
           sin(radians(c.clat - f.lat) / 2) ^ 2
           + cos(radians(f.lat)) * cos(radians(c.clat))
             * sin(radians(c.clon - f.lon) / 2) ^ 2)), 2))), 2) AS rg_m
FROM fixes f JOIN cent c USING (user_id)
GROUP BY f.user_id ORDER BY f.user_id
""",
    doc="radius of gyration per entity (operators/mobility_metrics."
    "radius_of_gyration): sqrt of mean squared great-circle distance to "
    "the entity's position centroid — the travel-range statistic; "
    "centroid side is |entities| rows, broadcast back onto observations",
    tags=("mobility", "agg", "join"),
)
def mobility_radius_of_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mobility_metrics import radius_of_gyration

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    return radius_of_gyration(ev, id_col="user_id").orderBy("user_id")


@register(
    "mobility_frequent_locations",
    oracle=f"""
WITH visits AS (
  SELECT user_id, {_CELL10}, count(*) AS n
  FROM events GROUP BY user_id, cx, cy
), ranked AS (
  SELECT user_id, cx, cy, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, cx, cy) AS rk
  FROM visits
)
SELECT user_id, cast(rk AS BIGINT) AS rk, cx, cy, cast(n AS BIGINT) AS n_visits
FROM ranked WHERE rk <= 2
ORDER BY user_id, rk
""",
    doc="top-2 visited cells per entity (operators/mobility_metrics."
    "frequent_locations): the home/work-detection primitive — window rank "
    "over the cell-collapsed visit table, deterministic cell tie-break",
    tags=("mobility", "window"),
)
def mobility_frequent_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mobility_metrics import cell_visits, frequent_locations

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    visits = cell_visits(ev, 10.0, 10.0, id_col="user_id")
    out = frequent_locations(visits, k=2, id_col="user_id")
    return out.select(
        "user_id", F.col("rk").cast("long").alias("rk"), "cx", "cy", "n_visits"
    ).orderBy("user_id", "rk")


@register(
    "rollup_hourly_to_daily",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       cast(count(value) AS BIGINT) AS n,
       cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
       min(value) AS vmin,
       max(value) AS vmax,
       cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
           / count(value) AS vavg
FROM events
GROUP BY day, event_type
ORDER BY day, event_type
""",
    doc="continuous-aggregate rollup (operators/rollup.py): hourly "
    "mergeable partial states (sum/count/min/max) re-aggregated to daily "
    "per event type — the hypertable rollup pattern; the oracle aggregates "
    "the RAW table directly, asserting the two-level merge is exact, "
    "while the engine's daily pass touches only the hourly rollup",
    tags=("mobility", "time", "agg", "rollup"),
)
def rollup_hourly_to_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup import build_rollup, merge_rollup

    # sum in DECIMAL so the two-level merge is order-independent and the
    # rounded doubles agree with the oracle's single-pass sum
    # (spark-engine-parity-conventions: .xx5 boundary rule)
    ev = t(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    hourly = build_rollup(ev, "ts", "value", keys=("event_type",), bucket="hour")
    daily = merge_rollup(hourly, bucket="day", keys=("event_type",))
    # no rounding anywhere: the decimal sum is exact and order-independent,
    # its double cast and the IEEE division are bit-identical across
    # engines — rounded doubles would reintroduce .xx5-boundary flakiness
    return daily.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.col("total").cast("double").alias("total"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
        (F.col("total").cast("double") / F.col("n")).alias("vavg"),
    ).orderBy("day", "event_type")


@register(
    "rollup_distinct_sketch",
    # Error-bound-boolean pattern for the mergeable HLL distinct state
    # (round 7): exact distinct counts do not merge across buckets, so
    # the continuous-aggregate answer to COUNT(DISTINCT) is a
    # Datasketches HLL register set per bucket. The gate merges hourly
    # sketches to daily and asserts, IN-PLAN, (a) the merged estimate
    # tracks sketching the day's raw rows directly within 3 sigma —
    # conceptually union is register-wise max, but the library's union
    # gadget (HLL_8 target, sparse->dense transitions) shifts dense-mode
    # estimates slightly (measured max 1.05% of exact at sf0.1) — and
    # (b) the merged estimate sits within 5 sigma of the exact daily
    # distinct (rsd = 1.04/sqrt(2^12) ~ 1.6%; measured max 1.5%).
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       cast(count(value) AS BIGINT) AS n_events,
       cast(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS ok_merge, TRUE AS ok_estimate
FROM events
GROUP BY day
ORDER BY day
""",
    doc="mergeable approx-distinct rollup (operators/rollup.py + Spark "
    "4 hll_sketch_agg/hll_union_agg): hourly HLL states merged to daily "
    "track the direct daily sketch within 3 sigma and the exact count "
    "within 5 sigma, both asserted in-plan — the continuous-aggregate "
    "COUNT(DISTINCT) story",
    tags=("time", "agg", "rollup", "sketch"),
)
def rollup_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup import approx_distinct, build_rollup, merge_rollup

    ev = t(spark, sf_dir, "events")
    hourly = build_rollup(
        ev, "ts", "value", bucket="hour", distinct_col="user_id"
    )
    daily = approx_distinct(merge_rollup(hourly, bucket="day")).select(
        F.col("bucket_ts"), "n", F.col("approx_distinct").alias("est_merged")
    )
    direct = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_ts")
    ).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias(
            "est_direct"
        ),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    rsd = 1.04 / (2**12) ** 0.5
    return (
        daily.join(direct, "bucket_ts")
        .select(
            F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
            F.col("n").alias("n_events"),
            "exact_distinct",
            (
                F.abs(F.col("est_merged") - F.col("est_direct"))
                <= 3 * rsd * F.col("exact_distinct")
            ).alias("ok_merge"),
            (
                F.abs(F.col("est_merged") - F.col("exact_distinct"))
                <= 5 * rsd * F.col("exact_distinct")
            ).alias("ok_estimate"),
        )
        .orderBy("day")
    )


@register(
    "k_anonymity_cells",
    oracle=f"""
WITH obs AS (
  SELECT user_id, {_CELL10}
  FROM events
)
SELECT cx, cy,
       cast(count(DISTINCT user_id) AS BIGINT) AS n_entities,
       cast(count(*) AS BIGINT) AS n_obs,
       count(DISTINCT user_id) < 5 AS suppressed
FROM obs GROUP BY cx, cy
ORDER BY cx, cy
""",
    doc="location k-anonymity audit (operators/mobility_metrics."
    "k_anonymous_cells): per grid cell, exact distinct-entity count and a "
    "suppression flag for cells seen by fewer than k entities — the "
    "privacy gate applied before publishing location aggregates",
    tags=("mobility", "agg", "privacy"),
)
def k_anonymity_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mobility_metrics import k_anonymous_cells

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    out = k_anonymous_cells(
        ev, k=5, cell_lat_deg=10.0, cell_lon_deg=10.0, id_col="user_id"
    )
    return out.select("cx", "cy", "n_entities", "n_obs", "suppressed").orderBy(
        "cx", "cy"
    )


@register(
    "spatial_tile_pyramid",
    oracle="""
WITH obs AS (
  SELECT value % 80.0 AS lat, (value * 3.7) % 160.0 AS lon FROM events
)
SELECT 0 AS level,
       cast(floor(lat / 2.5) AS BIGINT) AS cx,
       cast(floor(lon / 2.5) AS BIGINT) AS cy,
       cast(count(*) AS BIGINT) AS n_obs
FROM obs GROUP BY cx, cy
UNION ALL
SELECT 1, cast(floor(lat / 5.0) AS BIGINT), cast(floor(lon / 5.0) AS BIGINT),
       cast(count(*) AS BIGINT)
FROM obs GROUP BY 2, 3
UNION ALL
SELECT 2, cast(floor(lat / 10.0) AS BIGINT), cast(floor(lon / 10.0) AS BIGINT),
       cast(count(*) AS BIGINT)
FROM obs GROUP BY 2, 3
UNION ALL
SELECT 3, cast(floor(lat / 20.0) AS BIGINT), cast(floor(lon / 20.0) AS BIGINT),
       cast(count(*) AS BIGINT)
FROM obs GROUP BY 2, 3
ORDER BY level, cx, cy
""",
    doc="multi-resolution tile pyramid (operators/mobility_metrics."
    "cell_pyramid): each coarser level aggregates the PREVIOUS level by "
    "integer cell division (floor-division identity makes it exactly the "
    "direct bucketing, which the oracle computes from raw data) — the "
    "map-tile pre-aggregation pattern; level-k work is |cells_k| rows, "
    "never the raw observations",
    tags=("mobility", "agg", "rollup"),
)
def spatial_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mobility_metrics import cell_pyramid, cell_visits

    ev = t(spark, sf_dir, "events").select(
        F.lit(0).alias("uuid"),
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    visits = cell_visits(ev, 2.5, 2.5, id_col="uuid").drop("uuid")
    return cell_pyramid(visits, n_levels=4).orderBy("level", "cx", "cy")


# ---------------------------------------------------------------------------
# Round 6: promote the two remaining pytest-only trajectory operators to
# oracle-checked gates — trip segmentation (sessionization on movement
# gaps) and stop detection (speed-threshold runs). Same pseudo lat/lon
# mapping as trajectory_step_metrics; thresholds calibrated to the
# synthetic fix spacing (median inter-fix gap ~7 h, so a 12 h gap cuts
# trips and a 120 m/s "slow" bound creates real runs — the logic, not the
# physics, is what the gate pins).
# ---------------------------------------------------------------------------

_TRIP_GAP_S = 43200
_STOP_SPEED = 120.0
_STOP_MIN_S = 3600

_HAV_SQL = (
    "2 * 6371008.8 * asin(sqrt("
    "sin(radians(lat - plat) / 2) ^ 2"
    " + cos(radians(plat)) * cos(radians(lat))"
    " * sin(radians(lon - plon) / 2) ^ 2))"
)


@register(
    "trajectory_trip_segments",
    oracle=f"""
WITH fixes AS (
  SELECT user_id, event_id, ts,
         value % 80.0          AS lat,
         (value * 3.7) % 160.0 AS lon
  FROM events WHERE user_id < 30
), stepped AS (
  SELECT user_id, ts, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
         epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000) OVER w AS dt_s
  FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), flagged AS (
  -- distance carried as INTEGER CENTIMETERS (lossless: step_m is a
  -- 2-decimal value) so the per-trip sum is order-invariant and the
  -- rounded quotient below is bit-identical to Spark's
  SELECT user_id, ts, dt_s,
         CASE WHEN dt_s IS NULL OR dt_s > {_TRIP_GAP_S} THEN 1 ELSE 0 END
             AS new_trip,
         CAST(round(round({_HAV_SQL}, 2) * 100) AS BIGINT) AS step_cm
  FROM stepped
), trips AS (
  SELECT *, CAST(sum(new_trip) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS trip_id
  FROM flagged
)
SELECT user_id, trip_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS trip_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS trip_end,
       count(*) AS n_fixes,
       round(coalesce(sum(CASE WHEN new_trip = 0 THEN step_cm END), 0)
             / 100.0, 2) AS total_m,
       round((coalesce(sum(CASE WHEN new_trip = 0 THEN step_cm END), 0)
              / 100.0)
             / nullif(cast(sum(CASE WHEN new_trip = 0 THEN dt_s END)
                           AS DOUBLE), 0), 4) AS mean_speed_mps
FROM trips GROUP BY user_id, trip_id ORDER BY user_id, trip_id
""",
    doc="trip segmentation (operators/trajectory.trip_segments): "
    "sessionization on movement gaps — per-entity lag window flags a new "
    "trip at gaps > 12 h, running sum numbers trips, per-trip distance/"
    "speed summaries exclude the inter-trip gap step. One window shuffle "
    "+ one group shuffle, both keyed by entity",
    tags=("mobility", "trajectory", "window"),
)
def trajectory_trip_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import trip_segments

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    fixes = ev.select(
        "user_id",
        "ts",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    trips = trip_segments(
        fixes, gap_s=_TRIP_GAP_S, id_col="user_id", ts_col="ts",
        lon_col="lon", lat_col="lat",
    )
    return trips.select(
        "user_id",
        "trip_id",
        F.date_format("trip_start", "yyyy-MM-dd HH:mm:ss").alias("trip_start"),
        F.date_format("trip_end", "yyyy-MM-dd HH:mm:ss").alias("trip_end"),
        "n_fixes",
        "total_m",
        "mean_speed_mps",
    ).orderBy("user_id", "trip_id")


@register(
    "trajectory_stop_detection",
    oracle=f"""
WITH fixes AS (
  SELECT user_id, event_id, ts,
         value % 80.0          AS lat,
         (value * 3.7) % 160.0 AS lon
  FROM events WHERE user_id < 30
), stepped AS (
  SELECT user_id, ts, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
         epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000) OVER w AS dt_s
  FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), speeds AS (
  SELECT user_id, ts, lat, lon,
         round({_HAV_SQL} / nullif(cast(dt_s AS DOUBLE), 0), 4) AS speed_mps
  FROM stepped
), runs AS (
  SELECT *,
         (speed_mps IS NOT NULL AND speed_mps < {_STOP_SPEED}) AS is_slow,
         row_number() OVER (PARTITION BY user_id ORDER BY ts)
         - row_number() OVER (
             PARTITION BY user_id,
                 (speed_mps IS NOT NULL AND speed_mps < {_STOP_SPEED})
             ORDER BY ts) AS run_key
  FROM speeds
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stop_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS stop_end,
       count(*) AS n_fixes,
       round(avg(lon), 6) AS stop_lon,
       round(avg(lat), 6) AS stop_lat
FROM runs WHERE is_slow
GROUP BY user_id, run_key
HAVING epoch_us(max(ts)) // 1000000 - epoch_us(min(ts)) // 1000000
       >= {_STOP_MIN_S}
ORDER BY user_id, stop_start
""",
    doc="stop detection (operators/trajectory.detect_stops): maximal runs "
    "of consecutive below-threshold-speed fixes lasting >= 1 h, grouped "
    "with the rank-difference trick (two windows over the same entity "
    "partition — one shuffle). The speed threshold is calibrated to the "
    "synthetic fixes; the run/dwell logic is what real stay-point "
    "detection runs on vehicle tracks",
    tags=("mobility", "trajectory", "window"),
)
def trajectory_stop_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import detect_stops

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    fixes = ev.select(
        "user_id",
        "ts",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    stops = detect_stops(
        fixes,
        speed_thresh_mps=_STOP_SPEED,
        min_duration_s=_STOP_MIN_S,
        id_col="user_id",
        ts_col="ts",
        lon_col="lon",
        lat_col="lat",
    )
    return stops.select(
        "user_id",
        F.date_format("stop_start", "yyyy-MM-dd HH:mm:ss").alias("stop_start"),
        F.date_format("stop_end", "yyyy-MM-dd HH:mm:ss").alias("stop_end"),
        "n_fixes",
        "stop_lon",
        "stop_lat",
    ).orderBy("user_id", "stop_start")


_DP_TOL = 30.0


@register(
    "trajectory_simplify_bounds",
    # Error-bound-boolean pattern (knn_recall_floor / dedup_simhash): the
    # Douglas-Peucker kept-set is produced by a recursive numpy kernel no
    # SQL twin can replay, but its defining guarantees are deterministic
    # in-plan claims: (a) both endpoints of every track survive; (b)
    # every DROPPED fix lies within tolerance of the segment between its
    # flanking KEPT fixes (in DP, an interval is only cleared when its
    # max deviation is <= tol, and its bounds are then adjacent in the
    # output); (c) the simplification actually reduces the corpus
    # (~40% of fixes drop at this tolerance on the synthetic tracks).
    oracle="""
WITH fixes AS (
  SELECT user_id, ts FROM events WHERE user_id < 30
)
SELECT user_id, count(*) AS n_points,
       TRUE AS endpoints_ok, TRUE AS dropped_ok,
       -- reduction is only claimable when some fix is DROPPABLE: DP
       -- always keeps both endpoints, so a corpus of <= 2 fixes per
       -- track cannot shrink (degenerate twin); on the synthetic
       -- tracks the measured ~40% drop makes this TRUE as before.
       -- NOTE (r11 ADVICE): this is a DATA-DEPENDENT PROXY, not an
       -- equivalence — 'droppable fixes exist' (here) vs 'a fix was
       -- actually dropped' (Spark's _tot_kept < _tot). A corpus whose
       -- every deviation exceeds tolerance would make this TRUE and
       -- Spark FALSE. It matches on the gate corpora (synthetic +
       -- degenerate twins, where drops always occur when droppable);
       -- tightening it to the exact kept/total counts would change the
       -- gate's declared output (frozen under the oracle-hash contract)
       (SELECT count(*) FROM fixes)
         > 2 * (SELECT count(DISTINCT user_id) FROM fixes)
         AS reduction_ok
FROM fixes GROUP BY user_id ORDER BY user_id
""",
    doc="Douglas-Peucker simplification bounds "
    "(operators/trajectory.simplify_tracks, tolerance 30 planar deg on "
    "the pseudo tracks): endpoints survive, every dropped fix is within "
    "tolerance of the segment between its flanking kept fixes "
    "(recomputed with window expressions over the kernel's output), and "
    "the corpus measurably shrinks — the recursive kernel's contract, "
    "value-checked without replaying the recursion",
    tags=("mobility", "trajectory", "kernel"),
)
def trajectory_simplify_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trajectory import simplify_tracks

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    fixes = ev.select(
        "user_id",
        "ts",
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    simp = simplify_tracks(
        fixes, tolerance_deg=_DP_TOL, id_col="user_id", ts_col="ts",
        lon_col="lon", lat_col="lat",
    ).select("user_id", "ts", F.lit(True).alias("kept"))
    w = Window.partitionBy("user_id").orderBy("ts")
    j = (
        fixes.join(simp, ["user_id", "ts"], "left")
        .withColumn("kept", F.coalesce("kept", F.lit(False)))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("user_id")))
    )
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_next = w.rowsBetween(1, Window.unboundedFollowing)
    klat = F.when(F.col("kept"), F.col("lat"))
    klon = F.when(F.col("kept"), F.col("lon"))
    j = j.withColumns(
        {
            "plat": F.last(klat, ignorenulls=True).over(w_prev),
            "plon": F.last(klon, ignorenulls=True).over(w_prev),
            "nlat": F.first(klat, ignorenulls=True).over(w_next),
            "nlon": F.first(klon, ignorenulls=True).over(w_next),
        }
    )
    dx = F.col("nlon") - F.col("plon")
    dy = F.col("nlat") - F.col("plat")
    seg = F.sqrt(dx * dx + dy * dy)
    # exactly the kernel's point-to-segment formula (planar degrees)
    dist = F.when(
        seg == 0.0,
        F.sqrt(
            (F.col("lon") - F.col("plon")) ** 2
            + (F.col("lat") - F.col("plat")) ** 2
        ),
    ).otherwise(
        F.abs(
            dx * (F.col("plat") - F.col("lat"))
            - dy * (F.col("plon") - F.col("lon"))
        )
        / seg
    )
    per_user = j.groupBy("user_id").agg(
        F.count("*").alias("n_points"),
        F.sum(F.col("kept").cast("int")).alias("_n_kept"),
        F.bool_and(
            F.when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.col("kept"))
            .otherwise(F.lit(True))
        ).alias("endpoints_ok"),
        F.bool_and(
            F.when(~F.col("kept"), dist <= F.lit(_DP_TOL) + 1e-9)
            .otherwise(F.lit(True))
        ).alias("dropped_ok"),
    )
    totals = per_user.agg(
        F.sum("n_points").alias("_tot"), F.sum("_n_kept").alias("_tot_kept")
    )
    return (
        per_user.crossJoin(F.broadcast(totals))
        .select(
            "user_id",
            "n_points",
            "endpoints_ok",
            "dropped_ok",
            (F.col("_tot_kept") < F.col("_tot")).alias("reduction_ok"),
        )
        .orderBy("user_id")
    )


@register(
    "rollup_quantile_sketch",
    # Mergeable percentiles (round 7): exact quantiles do not merge, the
    # KLL state does (published normalized rank error ~1.65% at k=200).
    # The gate merges hourly KLL states to daily and asserts in-plan
    # that each estimate lands between the exact order statistics at
    # p +/- 0.05 (a 3x margin on the rank error). Exact bounds are
    # DATA VALUES picked by rank — no interpolation arithmetic, so both
    # engines read the identical parquet double.
    oracle="""
WITH v AS (
  SELECT date_trunc('day', ts) AS d, value,
         row_number() OVER (PARTITION BY date_trunc('day', ts)
                            ORDER BY value) AS rk,
         count(*) OVER (PARTITION BY date_trunc('day', ts)) AS n
  FROM events
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       cast(max(n) AS BIGINT) AS n_events,
       round(max(CASE WHEN rk = (n - 1) // 2 + 1 THEN value END), 6)
           AS p50_value,
       TRUE AS ok_p50, TRUE AS ok_p95
FROM v GROUP BY d ORDER BY day
""",
    doc="mergeable percentile rollup (operators/rollup.py + Spark 4 "
    "kll_sketch_agg_double/kll_merge_agg_double): hourly KLL states "
    "merged to daily, p50/p95 estimates bounded in-plan by the exact "
    "rank-(p +/- 0.05) order statistics — the continuous-aggregate "
    "percentile story (TimescaleDB percentile_agg analogue)",
    tags=("time", "agg", "rollup", "sketch"),
)
def rollup_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup import (
        approx_quantiles,
        build_rollup,
        merge_rollup,
    )

    ev = t(spark, sf_dir, "events")
    hourly = build_rollup(ev, "ts", "value", bucket="hour", quantiles=True)
    daily = approx_quantiles(
        merge_rollup(hourly, bucket="day"), probs=(0.5, 0.95)
    ).select("bucket_ts", "n", "p50", "p95")

    w = Window.partitionBy(F.date_trunc("day", F.col("ts"))).orderBy("value")
    v = ev.select(
        F.date_trunc("day", F.col("ts")).alias("bucket_ts"),
        "value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(
            Window.partitionBy(F.date_trunc("day", F.col("ts")))
        ).alias("nn"),
    )

    def at_rank(rank_expr):
        return F.max(F.when(F.col("rk") == rank_expr, F.col("value")))

    r = lambda p: F.floor((F.col("nn") - 1) * p) + 1  # noqa: E731
    bounds = v.groupBy("bucket_ts").agg(
        at_rank(r(0.5)).alias("p50_value"),
        at_rank(r(0.45)).alias("_lo50"),
        at_rank(r(0.55)).alias("_hi50"),
        at_rank(r(0.90)).alias("_lo95"),
        F.max("value").alias("_hi95"),
    )
    return (
        daily.join(bounds, "bucket_ts")
        .select(
            F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
            F.col("n").alias("n_events"),
            F.round("p50_value", 6).alias("p50_value"),
            F.col("p50").between(F.col("_lo50"), F.col("_hi50")).alias(
                "ok_p50"
            ),
            F.col("p95").between(F.col("_lo95"), F.col("_hi95")).alias(
                "ok_p95"
            ),
        )
        .orderBy("day")
    )


@register(
    "mobility_hotspot_clusters",
    # Density hotspots via grid cells + connected components (round 7):
    # the DBSCAN core-cell idea at grid resolution. Spark merges
    # 8-adjacent dense cells with O(log diameter) pointer-doubling
    # label propagation (operators/components.py); the DuckDB twin
    # closes the same adjacency graph with a recursive CTE — the
    # iterative-algorithm gate pattern of dedup_drop_near_duplicates.
    oracle="""
WITH cells AS (
  SELECT cast(floor((value % 80.0) / 2.5) AS BIGINT)        AS cx,
         cast(floor(((value * 3.7) % 160.0) / 2.5) AS BIGINT) AS cy,
         count(*) AS n_points
  FROM events
  GROUP BY cx, cy
), stats AS (
  SELECT sum(n_points) AS total, count(*) AS n_cells FROM cells
), dense AS (
  -- scale-free density cut at 2x the mean cell count, compared in
  -- EXACT integer arithmetic (n * n_cells >= 2 * total) so no float
  -- threshold can flip a boundary cell between engines
  SELECT c.cx, c.cy, c.n_points FROM cells c, stats s
  WHERE c.n_points * s.n_cells >= 2 * s.total
), keyed AS (
  SELECT cx, cy, n_points,
         (cx + 2000000) * 4000000 + cy + 2000000 AS k
  FROM dense
), edges AS (
  SELECT a.k AS u, b.k AS v
  FROM keyed a JOIN keyed b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 AND a.k != b.k
), reach AS (
  WITH RECURSIVE walk(node, r) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.v, walk.r FROM walk JOIN edges e ON e.u = walk.node
  )
  SELECT node, min(r) AS component FROM walk GROUP BY node
)
SELECT keyed.cx, keyed.cy, cast(keyed.n_points AS BIGINT) AS n_points,
       coalesce(reach.component, keyed.k) AS cluster
FROM keyed LEFT JOIN reach ON reach.node = keyed.k
ORDER BY cx, cy
""",
    doc="spatial hotspot clustering (operators/mobility_metrics."
    "hotspot_clusters): grid-density core cells (>= 2x the mean cell "
    "count, integer-exact threshold) merged across the 8-neighborhood "
    "by connected components — the density-cluster primitive behind "
    "hotspot maps; dense-cell count bounds every downstream join, and "
    "the component loop is O(log diameter)",
    tags=("mobility", "spatial", "iterative"),
)
def mobility_hotspot_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mobility_metrics import hotspot_clusters

    ev = t(spark, sf_dir, "events").select(
        (F.col("value") % 80.0).alias("lat"),
        ((F.col("value") * 3.7) % 160.0).alias("lon"),
    )
    # scale-free density cut: ceil(2 * total / n_cells) is integer-
    # equivalent to the oracle's n * n_cells >= 2 * total predicate
    cells = ev.select(
        F.floor(F.col("lat") / 2.5).cast("long").alias("cx"),
        F.floor(F.col("lon") / 2.5).cast("long").alias("cy"),
    ).groupBy("cx", "cy").count()
    st = cells.agg(
        F.sum("count").alias("t"), F.count("*").alias("c")
    ).first()
    # empty input: no cells, the density cut is moot (the operator maps
    # zero cells to zero clusters) — any positive min_pts works and 1
    # avoids the int(None) crash (degenerate sweep, r11)
    min_pts = 1 if st["t"] is None else -((-2 * int(st["t"])) // int(st["c"]))
    out = hotspot_clusters(
        ev, cell_lat_deg=2.5, cell_lon_deg=2.5, min_pts=min_pts
    )
    return out.select(
        "cx", "cy", "n_points", "cluster"
    ).orderBy("cx", "cy")
