"""Scaling probe: replicate the test tables k-fold (key-consistent) and
time selected gate queries at 1x vs kx to expose any super-linear operator.

Replica i shifts every join key by i * (max key + 1), so joins stay
key-consistent and selectivities are preserved: k x rows -> k x matches,
never k^2. Dimension tables that the queries treat as fixed vocabularies
(nation, region) are NOT replicated.

Usage: python tools/scale_probe.py [k] [sf_dir] [query ...]
Writes replicated parquet under /tmp/scale_probe_kx and prints one JSON
line per query: {"query": ..., "base_s": ..., "scaled_s": ..., "ratio": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.plans import load_registry
from mobilitydatalakebenchmark_spark.session import get_spark, read_table

DEFAULT_QUERIES = [
    "flagship_pricing_summary",
    "tpch_q5_style_regional_revenue",
    "tpch_q18_style_large_orders",
    "text_tfidf_keywords",
    "contamination_check",
    "vec_nearest_centroid_confusion",
    "cohort_retention",
    "trajectory_step_metrics",
    "pack_sequences_contiguous",
]

# table -> columns shifted per replica (key families must shift together)
SHIFT_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# timestamp columns shifted per replica by (span + 1 day), for the same
# reason the keys shift: replicas sharing one time range would make every
# time-proximity operator (interval overlap, as-of, sessionization)
# cross-match between replicas, inflating TRUE output k^2-fold — a
# replication artifact, not an operator cost. Shifting keeps temporal
# selectivity consistent: k x rows -> k x matches.
SHIFT_TS = {"events": ["ts"]}
COPY_TABLES = ["nation", "region"]


def replicate(spark, sf_dir: str, out_dir: str, k: int) -> None:
    day_us = 86_400_000_000
    for table, keys in SHIFT_KEYS.items():
        df = read_table(spark, sf_dir, table)
        maxes = df.agg(*[F.max(c).alias(c) for c in keys]).first()
        # an empty source table makes every max/min aggregate NULL and
        # the span arithmetic below would raise a bare TypeError — fail
        # with the actual cause instead (ADVICE r10)
        if any(maxes[c] is None for c in keys):
            raise ValueError(
                f"replicate: table '{table}' in {sf_dir} is empty or has "
                f"all-NULL shift keys {keys}; cannot derive key offsets"
            )
        ts_cols = SHIFT_TS.get(table, [])
        spans = {}
        if ts_cols:
            row = df.agg(
                *[
                    F.expr(
                        f"unix_micros(max({c})) - unix_micros(min({c}))"
                    ).alias(c)
                    for c in ts_cols
                ]
            ).first()
            if any(row[c] is None for c in ts_cols):
                raise ValueError(
                    f"replicate: table '{table}' in {sf_dir} has all-NULL "
                    f"timestamp columns {ts_cols}; cannot derive spans"
                )
            spans = {c: row[c] + day_us for c in ts_cols}
        parts = []
        for i in range(k):
            rep = df
            for c in keys:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * (maxes[c] + 1)))
            for c in ts_cols:
                rep = rep.withColumn(
                    c,
                    F.expr(
                        f"timestamp_micros(unix_micros({c})"
                        f" + {i * spans[c]})"
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    for table in COPY_TABLES:
        read_table(spark, sf_dir, table).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )


def time_query(registry, name, spark, sf_dir) -> tuple[float, int]:
    best = float("inf")
    for _ in range(2):  # min of 2: drop JIT/listing noise
        t0 = time.time()
        registry[name].spark(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.time() - t0)
    # output size, untimed: lets the probe separate COMPUTE blowup from
    # RESULT growth — a 5.6x wall on 100x data is fine when the true
    # output also grew ~100x (interval joins), alarming when it is a
    # 1-row aggregate (VERDICT r10 item 5)
    n_out = registry[name].spark(spark, sf_dir).count()
    return round(best, 3), n_out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    queries = sys.argv[3:] or DEFAULT_QUERIES
    out_dir = f"/tmp/scale_probe_{k}x"
    registry = load_registry()
    spark = get_spark(
        "scale_probe", extra_conf={"spark.sql.files.maxPartitionBytes": "8m"}
    )
    replicate(spark, sf_dir, out_dir, k)
    for name in queries:
        base, base_rows = time_query(registry, name, spark, sf_dir)
        scaled, scaled_rows = time_query(registry, name, spark, out_dir)
        ratio = round(scaled / base, 2) if base else None
        rows_ratio = (
            round(scaled_rows / base_rows, 2) if base_rows else None
        )
        # wall ratio per unit of output growth: ~flat (<= a few x) means
        # the extra wall is the result, not the algorithm
        compute_ratio = (
            round(ratio / max(rows_ratio, 1.0), 2)
            if ratio is not None and rows_ratio is not None
            else None
        )
        print(
            json.dumps(
                {
                    "query": name,
                    "k": k,
                    "base_s": base,
                    "scaled_s": scaled,
                    "ratio": ratio,
                    "base_rows": base_rows,
                    "scaled_rows": scaled_rows,
                    "rows_ratio": rows_ratio,
                    "compute_ratio": compute_ratio,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
