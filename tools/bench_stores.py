"""Reference-workload benchmark harness (SURVEY.md §6, Phase 4 parity).

Reproduces the reference's three metrics per storage strategy
(``benchmark.py:42-104``): write time for MAX_DOCUMENTS snapshots, storage
bytes, and read time for RANDOM_READS seeded random point lookups — against
our Spark-native store pipelines on the synthesized snapshot stream.

Usage: python tools/bench_stores.py [--docs 100] [--reads 50] [--out stats.json]
Prints one JSON object per store plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mobilitydatalakebenchmark_spark.operators.document_store import (
    DocumentParquetStore,
    GzipJsonStore,
)
from mobilitydatalakebenchmark_spark.operators.flat_store import FlatParquetStore
from mobilitydatalakebenchmark_spark.operators.temporal_store import TemporalStore
from mobilitydatalakebenchmark_spark.operators.velocity_store import (
    VelocityParquetStore,
)
from mobilitydatalakebenchmark_spark.session import get_spark
from mobilitydatalakebenchmark_spark.sources.geojson import (
    generate_snapshots,
    snapshots_to_df,
)

MAX_DOCUMENTS = 100  # reference benchmark.py:16
RANDOM_READS = 1000  # reference benchmark.py:17 (scaled down via --reads)


def run_store(name, store, documents, timestamps, n_reads, spark, write_fn=None, read_fn=None):
    t0 = time.time()
    (write_fn or (lambda: store.write(documents)))()
    write_s = time.time() - t0

    size_b = store.total_size()

    # O4: seeded random choice of read keys (reference benchmark.py:74)
    rng = random.Random(42)
    probes = rng.choices(timestamps, k=n_reads)
    read = read_fn or (
        lambda ts: (
            store.get_document(spark, ts)
            if "spark" in store.get_document.__code__.co_varnames
            else store.get_document(ts)
        ).collect()
    )
    t0 = time.time()
    for ts in probes:
        read(ts)
    read_s = time.time() - t0

    return {
        "store": name,
        "write_s": round(write_s, 3),
        "size_mb": size_b // 1024 // 1024,
        "size_bytes": size_b,
        "reads": n_reads,
        "read_s": round(read_s, 3),
        "read_avg_ms": round(read_s / n_reads * 1000, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=MAX_DOCUMENTS)
    ap.add_argument("--reads", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("bench_stores")
    snaps = generate_snapshots(n_snapshots=args.docs)
    documents = snapshots_to_df(spark, snaps)
    documents.cache().count()
    timestamps = [ts for ts, _ in snaps]

    base = tempfile.mkdtemp(prefix="bench_stores_")
    from mobilitydatalakebenchmark_spark.operators.encoded_store import (
        CantorParquetStore,
        VelocitySplitParquetStore,
    )

    stores = [
        ("flat_parquet", FlatParquetStore(f"{base}/flat")),
        ("flat_segmented", FlatParquetStore(f"{base}/flatseg", segment_by="uuid")),
        ("velocity_parquet", VelocityParquetStore(f"{base}/velocity")),
        ("velocity_split", VelocitySplitParquetStore(f"{base}/vsplit")),
        ("cantor_packed", CantorParquetStore(f"{base}/cantor", packed=True)),
        ("temporal", TemporalStore(f"{base}/temporal")),
        ("document_parquet", DocumentParquetStore(f"{base}/docs")),
        ("gzip_json_single", GzipJsonStore(f"{base}/gz", single_file=True)),
    ]
    results = []
    for name, store in stores:
        res = run_store(name, store, documents, timestamps, args.reads, spark)
        results.append(res)
        print(json.dumps(res))

    # Batched random-read: the idiomatic Spark answer to point lookups —
    # per-lookup latency above is dominated by fixed job-scheduling overhead
    # (the reference's sub-ms reads are in-process pyarrow/PG calls); a
    # single job resolving ALL probes amortizes it and is how a 100 TB
    # deployment would serve a read storm.
    from pyspark.sql import functions as F

    from mobilitydatalakebenchmark_spark.operators.flat_store import renest_documents

    rng = random.Random(42)
    probes = rng.choices(timestamps, k=args.reads)
    flat_store = stores[0][1]
    t0 = time.time()
    flat = flat_store.scan().filter(F.col("timestamp").isin(list(set(probes))))
    n_docs = renest_documents(flat).count()
    batched = {
        "store": "flat_parquet_batched_read",
        "reads": args.reads,
        "distinct_probes": len(set(probes)),
        "docs_reconstructed": n_docs,
        "read_s": round(time.time() - t0, 3),
        "read_avg_ms": round((time.time() - t0) / args.reads * 1000, 1),
    }
    results.append(batched)
    print(json.dumps(batched))

    # Codec sweep on the flat store — the reference's central theme is the
    # storage-size/codec trade-off (snappy vs gzip across its stores);
    # parquet makes it one writer option.
    for codec in ["none", "snappy", "gzip", "zstd"]:
        store = FlatParquetStore(f"{base}/codec_{codec}", compression=codec)
        t0 = time.time()
        store.write(documents)
        res = {
            "store": f"flat_parquet[{codec}]",
            "write_s": round(time.time() - t0, 3),
            "size_bytes": store.total_size(),
            "read_avg_ms": None,
        }
        results.append(res)
        print(json.dumps(res))

    summary = {
        "metric": "store_benchmark",
        "docs": args.docs,
        "stores": {
            r["store"]: {
                "write_s": r.get("write_s"),
                "size_bytes": r.get("size_bytes"),
                "read_avg_ms": r["read_avg_ms"],
            }
            for r in results
        },
    }
    print(json.dumps(summary))
    if args.out:  # S16: stats JSON sink (reference benchmark.py:82-93)
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
