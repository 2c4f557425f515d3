"""Incremental Count-Min maintenance under Structured Streaming.

CMS cells merge by addition (operators/countmin.countmin_merge:
shard-then-combine == one-shot build), so the maintained state is just
the d*w cell table — constant-size regardless of stream length, the
ideal streaming summary. Each micro-batch: build the batch's own cells
(one bounded-width shuffle over the batch), add them to the stored
table, rewrite. The merged table is d*w rows (192 at the default 3x64),
so materializing it driver-side before the overwrite is bounded by the
SKETCH size, never the data — the same "collect only literals" budget
as the islands maintainer's bucket keys.

Idempotence follows the rollup discipline: every stored row carries the
(run, epoch) stamp of the merge that wrote it; a replayed epoch whose
stamp already matches is a no-op, and run identity is nonce-mixed per
checkpoint creation (run_identity.py) so a recreated checkpoint cannot
replay-mask fresh batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .run_identity import checkpoint_run_id
from ..operators.countmin import countmin_build


def upsert_countmin_batch(
    batch: DataFrame,
    table_path: str,
    key_col: str,
    d: int = 3,
    w: int = 64,
    txn: tuple[str, int] | None = None,
) -> None:
    """Add one micro-batch's counts into the stored cell table."""
    from ..session import local_df

    spark = batch.sparkSession
    if batch.isEmpty():
        return
    new_cells = countmin_build(batch, key_col, d=d, w=w)
    merged = {}
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
        if txn is not None:
            already = (
                existing.filter(
                    (existing["_txn_run"] == txn[0])
                    & (existing["_txn_epoch"] == txn[1])
                ).count()
                > 0
            )
            if already:  # replayed epoch: this merge is in the table
                return
        for r in existing.collect():  # d*w rows — sketch-sized, bounded
            merged[(r["r"], r["b"])] = r["cell"]
    for r in new_cells.collect():  # batch's cells — also <= d*w rows
        k = (r["r"], r["b"])
        merged[k] = merged.get(k, 0) + r["cell"]
    run_id, epoch = txn if txn is not None else (None, None)
    rows = [
        (int(r), int(b), int(c), run_id, epoch)
        for (r, b), c in sorted(merged.items())
    ]
    local_df(
        spark,
        rows,
        "r int, b long, cell long, _txn_run string, _txn_epoch long",
    ).coalesce(1).write.mode("overwrite").parquet(table_path)


def stream_countmin(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    key_col: str,
    d: int = 3,
    w: int = 64,
):
    """Attach the CMS-maintenance sink and start it (availableNow)."""
    run_id = checkpoint_run_id(checkpoint)  # nonce-mixed: a recreated
    # checkpoint gets a NEW identity, so epoch-0 restarts cannot
    # collide with a previous run's replay stamps

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        upsert_countmin_batch(
            batch, table_path, key_col, d=d, w=w, txn=(run_id, int(epoch_id))
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_countmin(spark, table_path: str) -> DataFrame:
    """The queryable cell table (txn stamps dropped) — feed straight
    into operators/countmin.countmin_estimates."""
    return spark.read.parquet(table_path).select("r", "b", "cell")
