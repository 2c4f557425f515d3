"""Reference-contract adapter — the drop-in surface for reference users.

The reference defines one 4-method store contract
(``stores/base_store.py:4-22``):

    reset() / store_document(data, timestamp) / get_document(timestamp)
    / get_total_size()

This adapter exposes exactly that contract over any of our Spark store
pipelines, so code written against the reference runs unchanged. Two
ingest modes:

- buffered (default, ``batch_size`` like the reference's buffered stores,
  ``mobility_db_batch.py:70``): store_document buffers dicts and flushes a
  micro-batch DataFrame append every N snapshots — the Spark-appropriate
  write path.
- ``batch_size=1``: per-snapshot append, the reference's unbuffered
  behavior (correct but pays a Spark job per snapshot; for parity testing
  only).

get_document returns the plain Python FeatureCollection dict, exactly like
the reference.
"""

from __future__ import annotations

import shutil
from typing import Any

from pyspark.sql import SparkSession

from ..schemas import DOCUMENT_SCHEMA
from .flat_store import FlatParquetStore


class ReferenceStoreAdapter:
    """BaseStore-compatible facade over a Spark store pipeline."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        batch_size: int = 100,
        store: FlatParquetStore | None = None,
    ):
        self.spark = spark
        self.path = path
        self.batch_size = max(1, batch_size)
        self.store = store or FlatParquetStore(path)
        self._buffer: list[dict[str, Any]] = []
        self._written = False

    # -- reference contract ------------------------------------------------

    def reset(self) -> None:
        """Drop & recreate storage (base_store.py:8-10)."""
        self._buffer.clear()
        self._written = False
        shutil.rmtree(self.path, ignore_errors=True)

    def store_document(self, data: dict, timestamp: str) -> None:
        """Ingest one snapshot keyed by ISO timestamp (base_store.py:12-14)."""
        self._buffer.append({"timestamp": timestamp, "data": data})
        if len(self._buffer) >= self.batch_size:
            self.flush()

    def get_document(self, timestamp: str) -> dict | None:
        """Reconstruct the original FeatureCollection (base_store.py:16-18).
        Unflushed buffered snapshots are served from the buffer, so
        read-your-writes holds regardless of batch alignment."""
        for item in reversed(self._buffer):
            if item["timestamp"] == timestamp:
                return item["data"]
        if not self._written:
            return None
        rows = self.store.get_document(timestamp).collect()
        if not rows:
            return None
        return rows[0].asDict(recursive=True)["data"]

    def get_total_size(self) -> int:
        """Bytes on disk (base_store.py:20-22); flushes first so the number
        reflects everything ingested (the reference's all-in-one store has
        the same flush-on-size behavior)."""
        self.flush()
        return self.store.total_size() if self._written else 0

    # -- spark-side helpers ------------------------------------------------

    def flush(self) -> None:
        if not self._buffer:
            return
        df = self.spark.createDataFrame(self._buffer, schema=DOCUMENT_SCHEMA)
        self.store.write(df, mode="append" if self._written else "overwrite")
        self._written = True
        self._buffer.clear()
