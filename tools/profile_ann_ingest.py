"""Phase-level profile of streaming_ann_index_ingest (guide §1).

Replicates the gate body with a wall timer around each phase so the
26.8 s ORACLE-sweep wall can be attributed: build vs. the 3 streaming
micro-batches vs. probe vs. brute-force reference vs. final join.
Run:  python tools/profile_ann_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.operators.ann_index import IVFIndexStore
from mobilitydatalakebenchmark_spark.operators.similarity import brute_force_topk
from mobilitydatalakebenchmark_spark.plans import load_registry
from mobilitydatalakebenchmark_spark.plans.vectors import PROBE_IDS
from mobilitydatalakebenchmark_spark.session import get_spark
from mobilitydatalakebenchmark_spark.streaming.ingest import stream_to_ann_index


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("profile-ann-ingest")
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()  # warm

    phases: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        t1 = time.time()
        phases[name] = round(t1 - t0, 3)
        print(f"  {name}: {phases[name]:.3f}s", flush=True)
        return t1

    t_all = time.time()
    base = os.path.join(tempfile.gettempdir(), "spark_graft_profile_ann")
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.time()
    store = IVFIndexStore(os.path.join(base, "store"), n_centroids=8)
    store.build(e.filter(F.col("vec_id") % 5 != 3), lloyd_iters=1)
    t0 = mark("build", t0)

    held_out = e.filter(F.col("vec_id") % 5 == 3).select("vec_id", "embedding")
    for m in range(3):
        held_out.filter(F.col("vec_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    t0 = mark("write_source_batches", t0)

    stream = (
        spark.readStream.schema(held_out.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    stream_to_ann_index(stream, store, ckpt).awaitTermination()
    t0 = mark("stream_3_batches", t0)

    n_indexed = store.indexed_ids(spark).count()
    t0 = mark("indexed_ids_count", t0)

    probes = e.filter(F.col("vec_id").isin(PROBE_IDS)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    ann = store.topk(probes, k=5, nprobe=4).select("probe_id", "vec_id")
    exact = brute_force_topk(e, probes, k=5).select(
        F.col("probe_id").alias("exact_probe"),
        F.col("vec_id").alias("exact_id"),
    )
    hits = (
        ann.join(
            exact,
            (F.col("probe_id") == F.col("exact_probe"))
            & (F.col("vec_id") == F.col("exact_id")),
            "left",
        )
        .groupBy("probe_id")
        .agg(
            F.count("*").alias("n_returned"),
            F.count("exact_id").alias("n_hits"),
        )
    )
    out = hits.select(
        "probe_id",
        "n_returned",
        (F.col("n_returned") == 5).alias("returned_k"),
        (F.col("n_hits") >= 2).alias("recall_ok"),
        F.lit(n_indexed).cast("long").alias("n_indexed"),
    ).orderBy("probe_id")
    out.write.mode("overwrite").format("noop").save()
    t0 = mark("probe_and_compare", t0)

    phases["TOTAL"] = round(time.time() - t_all, 3)
    print(phases, flush=True)

    # second run through the registry entry for the end-to-end wall
    reg = load_registry()
    t0 = time.time()
    reg["streaming_ann_index_ingest"].spark(spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    print(f"registry end-to-end: {time.time() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
