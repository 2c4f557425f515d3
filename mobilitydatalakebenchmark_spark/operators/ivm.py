"""Incremental view maintenance for materialized equi-joins.

The rollup layer (operators/rollup.py, streaming/rollup_stream.py) keeps
AGGREGATES current without rescanning history; this module does the same
for a materialized inner equi-join — the other half of the classic IVM
pair. The delta rule for M = L ⋈ R under inserts is

    ΔM = ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR

so maintaining the view after a batch costs O(|Δ| · match rate) joins
against the CURRENT bases — never a recompute of L ⋈ R. At 100 TB that
is the difference between touching the arrivals and touching the world:
the base-side probes are keyed equi-joins that prune to the delta's key
set, and the view append is a dynamic-partition write into the key
buckets the delta touches.

Layout (plain parquet — reopenable by any session):

    <path>/left.parquet    current left base (owned copies, appended)
    <path>/right.parquet   current right base
    <path>/view.parquet    the materialized join, partitioned by a
                           bucket of the join key for downstream pruning

Inserts only (the reference's stores are append-only; deletes/updates
need tombstone joins or a transactional format — Delta's MERGE is the
gated variant). Equality with a from-scratch recompute after any
interleaving of appends is pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKETS = 32
_BUCKET_COL = "_key_bucket"


class MaterializedJoin:
    """A persisted inner equi-join maintained incrementally under
    append-only bases."""

    def __init__(self, path: str, on: str):
        self.path = path
        self.on = on

    # -- internals -----------------------------------------------------

    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            _BUCKET_COL, F.pmod(F.xxhash64(F.col(self.on)), _BUCKETS)
        )

    def _read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(f"{self.path}/{table}.parquet")

    def _write_view(self, delta_view: DataFrame) -> None:
        (
            self._bucket(delta_view)
            .write.mode("append")
            .partitionBy(_BUCKET_COL)
            .parquet(f"{self.path}/view.parquet")
        )

    def _append_base(self, delta: DataFrame, table: str) -> None:
        delta.write.mode("append").parquet(f"{self.path}/{table}.parquet")

    # -- API -----------------------------------------------------------

    def build(self, left: DataFrame, right: DataFrame) -> None:
        """Materialize L ⋈ R and snapshot both bases."""
        left.write.mode("overwrite").parquet(f"{self.path}/left.parquet")
        right.write.mode("overwrite").parquet(f"{self.path}/right.parquet")
        spark = left.sparkSession
        view = self._read(spark, "left").join(self._read(spark, "right"), self.on)
        (
            self._bucket(view)
            .write.mode("overwrite")
            .partitionBy(_BUCKET_COL)
            .parquet(f"{self.path}/view.parquet")
        )

    def append(
        self,
        left_delta: DataFrame | None = None,
        right_delta: DataFrame | None = None,
    ) -> None:
        """Apply one batch of inserts to either or both sides and bring
        the view current via the delta rule. The base probes join each
        delta against the PRE-APPEND persisted bases, plus the ΔL ⋈ ΔR
        cross-term, so a single call with both sides is equivalent to
        appending them "simultaneously" (and the sum of the three terms
        equals the recompute — pinned by test)."""
        spark = (left_delta or right_delta).sparkSession
        parts = []
        if left_delta is not None:
            parts.append(left_delta.join(self._read(spark, "right"), self.on))
        if right_delta is not None:
            parts.append(self._read(spark, "left").join(right_delta, self.on))
        if left_delta is not None and right_delta is not None:
            parts.append(left_delta.join(right_delta, self.on))
        delta_view = parts[0]
        for p in parts[1:]:
            delta_view = delta_view.unionByName(p)
        # materialize ΔM BEFORE touching the bases it was derived from —
        # appending a base first would double-count ΔL ⋈ ΔR through the
        # re-read, and the lazy plan would otherwise read post-append files
        delta_rows = delta_view.localCheckpoint(eager=True)
        self._write_view(delta_rows)
        if left_delta is not None:
            self._append_base(left_delta, "left")
        if right_delta is not None:
            self._append_base(right_delta, "right")

    def append_idempotent(self, left_delta: DataFrame, row_id_col: str) -> None:
        """Replay-safe left-side insert for at-least-once delivery
        (the streaming sink's path). ``append`` has a crash window: it
        writes the view delta, THEN the base — so a replay that dedups
        only against the base re-inserts view rows for a batch that
        crashed between the two writes. Here each persisted artifact is
        deduped INDEPENDENTLY against the batch by ``row_id_col``:

        - view delta is computed only for batch rows whose row id is not
          yet in the view (re-deriving an applied-but-unmatched row is a
          no-op: it joins to nothing);
        - the base append takes only batch rows not yet in the base.

        Whatever prefix of a previous attempt survived a crash, the
        replay completes exactly the missing remainder — each artifact
        receives each row at most once. Assumes a single writer per
        store and a right base that does not change between an attempt
        and its replay (the streaming sink owns both conditions).
        Everything is executor-side anti-joins; the driver never holds
        an id list. With a transactional format (Delta MERGE) the two
        dedups collapse into one atomic commit."""
        spark = left_delta.sparkSession
        view_fresh = left_delta.join(
            self._read(spark, "view").select(row_id_col),
            row_id_col,
            "left_anti",
        )
        # pin both fresh sets BEFORE any write: their plans read the
        # artifacts being appended to
        delta_view = view_fresh.join(
            self._read(spark, "right"), self.on
        ).localCheckpoint(eager=True)
        base_fresh = left_delta.join(
            self._read(spark, "left").select(row_id_col),
            row_id_col,
            "left_anti",
        ).localCheckpoint(eager=True)
        if not delta_view.isEmpty():
            self._write_view(delta_view)
        if not base_fresh.isEmpty():
            self._append_base(base_fresh, "left")

    def view(self, spark: SparkSession) -> DataFrame:
        return self._read(spark, "view").drop(_BUCKET_COL)

    def recompute(self, spark: SparkSession) -> DataFrame:
        """From-scratch join of the current bases (the test oracle)."""
        return self._read(spark, "left").join(self._read(spark, "right"), self.on)
