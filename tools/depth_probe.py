"""Per-batch cost flatness probe for the streaming maintainers
(VERDICT r11 item 7): does epoch N cost the same as epoch 3?

The incremental maintainers claim per-batch cost independent of history
length — the rollup upsert reads only the buckets a batch touches
(static partition pruning on the literal bucket list) and dynamically
overwrites only those partitions; the IVM delta rule joins only the
delta against the bases. The pytest probes run 3-6 epochs; this tool
runs EPOCHS epochs (default 100) of each maintainer and records the
per-epoch wall so the flatness claim is measured at depth, not assumed.

Usage: python tools/depth_probe.py [--epochs N] [--json OUT]

Each rollup epoch merges one NEW hour of synthetic events (so the
stored table grows linearly with history — the adversarial case for a
maintainer that accidentally re-reads everything); each IVM epoch
appends a constant-size left delta. A maintainer whose per-epoch wall
grows with epoch number fails the claim; the artifact records the
first-quartile/last-quartile mean ratio per maintainer.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.session import get_spark, local_df


def probe_rollup(spark, epochs: int) -> list[float]:
    from mobilitydatalakebenchmark_spark.streaming.rollup_stream import (
        upsert_rollup_batch,
    )

    base = tempfile.mkdtemp(prefix="depth_rollup_")
    path = os.path.join(base, "rollup.parquet")
    walls = []
    rows_per_epoch = 500
    try:
        for e in range(epochs):
            rows = [
                (
                    1_700_000_000_000_000 + e * 3_600_000_000 + i * 1_000_000,
                    float((e * 37 + i) % 100),
                    f"t{i % 5}",
                )
                for i in range(rows_per_epoch)
            ]
            batch = local_df(
                spark, rows, "us long, value double, event_type string"
            ).select(
                F.expr("timestamp_micros(us)").alias("ts"),
                "value",
                "event_type",
            )
            t0 = time.time()
            upsert_rollup_batch(
                batch,
                path,
                ts_col="ts",
                val_col="value",
                keys=("event_type",),
                bucket="hour",
                txn=("depthprobe", e),
            )
            walls.append(round(time.time() - t0, 3))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return walls


def probe_ivm(spark, epochs: int) -> list[float]:
    from mobilitydatalakebenchmark_spark.operators.ivm import MaterializedJoin

    base = tempfile.mkdtemp(prefix="depth_ivm_")
    mj = MaterializedJoin(os.path.join(base, "mj"), on="k")
    right = local_df(
        spark, [(k, f"r{k}") for k in range(200)], "k int, rv string"
    )
    mj.build(
        local_df(spark, [(0, "seed")], "k int, lv string"), right
    )
    walls = []
    rows_per_epoch = 200
    try:
        for e in range(epochs):
            delta = local_df(
                spark,
                [
                    (i % 200, f"l{e}_{i}")
                    for i in range(1, rows_per_epoch + 1)
                ],
                "k int, lv string",
            )
            t0 = time.time()
            mj.append(left_delta=delta)
            walls.append(round(time.time() - t0, 3))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return walls


def flatness(walls: list[float]) -> dict:
    q = max(1, len(walls) // 4)
    head = sorted(walls[2 : 2 + q])  # skip 2 warm-up epochs
    tail = sorted(walls[-q:])
    med_head = head[len(head) // 2]
    med_tail = tail[len(tail) // 2]
    return {
        "epochs": len(walls),
        "median_first_quartile_s": med_head,
        "median_last_quartile_s": med_tail,
        "last_over_first": round(med_tail / med_head, 3) if med_head else None,
        "walls": walls,
    }


def main() -> None:
    argv = list(sys.argv[1:])
    epochs = 100
    out = None
    if "--epochs" in argv:
        i = argv.index("--epochs")
        epochs = int(argv[i + 1])
        del argv[i : i + 2]
    if "--json" in argv:
        i = argv.index("--json")
        out = argv[i + 1]
        del argv[i : i + 2]
    spark = get_spark("depth_probe", cpus=8)
    result = {
        "rollup_upsert": flatness(probe_rollup(spark, epochs)),
        "ivm_append": flatness(probe_ivm(spark, epochs)),
    }
    for k, v in result.items():
        print(
            f"{k}: median epoch wall {v['median_first_quartile_s']}s (early)"
            f" -> {v['median_last_quartile_s']}s (late),"
            f" ratio {v['last_over_first']}"
        )
    if out:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, out), "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
