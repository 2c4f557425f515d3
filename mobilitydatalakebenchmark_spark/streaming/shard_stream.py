"""Streaming training-shard export — the terminal pipeline stage under
Structured Streaming: arriving documents are appended to each source's
open shard against the persisted manifest, so a trainer can stream a
growing corpus without ever repacking it.

Each micro-batch goes through ``operators/shards.append_shards``: packed
in deterministic md5(id) order after the source's persisted fill level,
appended via dynamic-partition write (only the touched shard directories
change), manifest rows re-derived for touched shards only — cost per
batch is O(batch + touched shards), independent of corpus size, exactly
the ``rollup_stream`` posture.

Replay protection follows ``streaming/ingest.stream_to_ann_index``: the
append is IDEMPOTENT (each batch is stripped, via an executor-side
anti-join, of doc ids the store already holds — a replayed epoch, a
crash between the data append and the state write, or a fresh checkpoint
re-delivering old files cannot double-place a document), with a
per-checkpoint epoch high-water mark as the fast path. When a replayed
batch turns out partially-or-fully written, the manifest rows for the
shards holding it are re-derived from the data first (``repair_manifest``)
— healing the crash window between a data append and its manifest
rewrite, which would otherwise leave fill levels understated and place
later docs at overlapping offsets. State reads narrow their error
handling to missing-path shapes.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .run_identity import checkpoint_run_id
from ..session import local_df

from ..operators.shards import append_shards, repair_manifest

from ..errors import is_missing_store_error


def stream_to_shards(
    docs_stream: DataFrame,
    path: str,
    checkpoint: str,
    shard_tokens: int = 4096,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Stream documents into the shard store at ``path``. Streaming
    batches B1..Bn lands the same layout as calling ``append_shards``
    with the same batches in order (pinned by test), and the persisted
    manifest always matches the written data (``verify_shards``)."""

    state_path = f"{path}/stream_state.parquet"
    run_id = checkpoint_run_id(checkpoint)  # nonce-mixed: a recreated
    # checkpoint gets a NEW identity, so epoch-0 restarts cannot
    # collide with a previous run's replay stamps
    run_path = f"{state_path}/run_id={run_id}"

    def _last_epoch(spark) -> int:
        try:
            row = (
                spark.read.parquet(run_path)
                .agg(F.max("last_epoch").alias("e"))
                .first()
            )
        except Exception as exc:  # narrow: only "no state yet" shapes
            if not is_missing_store_error(exc):
                raise
            return -1
        return -1 if row is None or row["e"] is None else int(row["e"])

    def _existing_ids(spark) -> "DataFrame | None":
        try:
            return spark.read.parquet(f"{path}/data.parquet").select(id_col)
        except Exception as exc:  # narrow: empty store
            if not is_missing_store_error(exc):
                raise
            return None

    def flush(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if epoch_id <= _last_epoch(spark):
            return  # same-run replay: already fully applied
        existing = _existing_ids(spark)
        if existing is None:
            fresh, n_batch, n_fresh = batch, 1, 1  # empty store: all fresh
        else:
            # executor-side anti-join — never a driver id list (an
            # availableNow replay after a crash delivers the whole
            # backlog as one batch, the one case idempotence exists for)
            fresh = batch.join(existing, id_col, "left_anti").persist()
            n_batch = batch.count()
            n_fresh = fresh.count()
        try:
            if n_fresh < n_batch:
                # part (or all) of this batch is already in the data but
                # its manifest rewrite may have been lost to a crash:
                # re-derive manifest rows for the shards holding the
                # batch's ids from the written data BEFORE placing
                # anything, so fill levels are read from a repaired
                # manifest and offsets can never overlap
                repair_manifest(
                    spark,
                    path,
                    ids=batch.select(id_col),
                    source_col=source_col,
                    id_col=id_col,
                )
            if n_fresh > 0:
                append_shards(
                    fresh,
                    path,
                    shard_tokens=shard_tokens,
                    source_col=source_col,
                    id_col=id_col,
                    text_col=text_col,
                )
        finally:
            if existing is not None:
                fresh.unpersist()
        local_df(spark, [(int(epoch_id),)], "last_epoch long").coalesce(
            1
        ).write.mode("overwrite").parquet(run_path)

    return (
        docs_stream.writeStream.foreachBatch(flush)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
