"""Manifest-committed versioned parquet store — atomic commits and time
travel on any filesystem Spark can reach.

The reference's one transactional store is Delta
(``stores/delta_lake.py``), whose jars this image does not ship
(operators/delta_store.py is the env-gated port). This module provides
the two properties queries actually rely on — atomically-visible commits
and readable history — with nothing but parquet and one manifest file
per version, which is exactly the trick Delta/Iceberg build on:

    <path>/data/v<k>/...            immutable files written by commit k
    <path>/_manifests/<k>.parquet   rows (version, dir): the dirs that
                                    CONSTITUTE version k

Readers resolve the latest (or a requested) manifest and read only the
dirs it lists. The manifest write is the commit point: a crash while
writing data files leaves orphan dirs no manifest references — invisible
to every reader, cleaned by ``vacuum()``. Appends reference the previous
manifest's dirs plus the new one; overwrites reference only the new one,
leaving history readable (time travel) until vacuumed.

Not a concurrency-control layer: one writer at a time (the reference's
ingest model). Delta's MERGE/optimistic locking remain the gated path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class VersionedParquetStore:
    def __init__(self, path: str):
        self.path = path

    # -- internals -----------------------------------------------------

    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifests")

    def _versions(self) -> list[int]:
        d = self._manifest_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(d)
            if f.endswith(".parquet") and f.split(".")[0].isdigit()
        )

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _read_manifest(self, spark: SparkSession, version: int) -> list[str]:
        rows = spark.read.parquet(
            os.path.join(self._manifest_dir(), f"{version}.parquet")
        ).collect()
        return [r["dir"] for r in sorted(rows, key=lambda r: r["version"])]

    # -- API -----------------------------------------------------------

    def committed_txn_version(
        self, spark: SparkSession, txn: tuple[str, int]
    ) -> int | None:
        """The version a (run, epoch) transaction committed as, or None.
        Manifests are one tiny file per version; the scan is bounded by
        history length (and by ``vacuum``)."""
        for v in reversed(self._versions()):
            df = spark.read.parquet(
                os.path.join(self._manifest_dir(), f"{v}.parquet")
            )
            if "txn_run" not in df.columns:
                continue
            row = df.select("txn_run", "txn_epoch").first()
            if row and row["txn_run"] == txn[0] and row["txn_epoch"] == txn[1]:
                return v
        return None

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Write ``df`` as a new version; returns the version number.
        ``mode='append'``: the new version is previous + this batch.
        ``mode='overwrite'``: the new version is this batch alone (old
        versions stay readable). The data write happens FIRST and the
        manifest write is the single commit point — a crash before the
        manifest leaves an unreferenced dir, not a torn version (the data
        dir write is an overwrite, so a retried commit reclaims its own
        orphan). ``txn=(run_id, epoch)`` makes the commit idempotent: a
        transaction already recorded in a manifest is skipped and its
        version returned — the streaming replay guard."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported commit mode {mode!r}")
        spark = df.sparkSession
        if txn is not None:
            seen = self.committed_txn_version(spark, txn)
            if seen is not None:
                return seen
        prev = self.latest_version()
        version = 0 if prev is None else prev + 1
        new_dir = os.path.join(self.path, "data", f"v{version}")
        df.write.mode("overwrite").parquet(new_dir)
        dirs: list[tuple[int, str]] = []
        if mode == "append" and prev is not None:
            dirs = [
                (i, d) for i, d in enumerate(self._read_manifest(spark, prev))
            ]
        dirs.append((len(dirs), new_dir))
        run_id, epoch = txn if txn is not None else (None, None)
        spark.createDataFrame(
            [(i, d, run_id, epoch) for i, d in dirs],
            "version int, dir string, txn_run string, txn_epoch long",
        ).coalesce(1).write.mode("error").parquet(
            os.path.join(self._manifest_dir(), f"{version}.parquet")
        )
        return version

    def snapshot(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest). Reads ONLY the
        dirs that manifest lists — orphans from crashed commits and data
        from later versions are invisible."""
        if version is None:
            version = self.latest_version()
        if version is None:
            raise FileNotFoundError(f"no committed version under {self.path}")
        return spark.read.parquet(*self._read_manifest(spark, version))

    def history(self) -> list[int]:
        return self._versions()

    def vacuum(self, keep_latest: int = 1) -> list[str]:
        """Drop manifests older than the newest ``keep_latest`` versions
        and delete data dirs no surviving manifest references (including
        orphans from crashed commits). Returns the deleted dirs."""
        import shutil

        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        vs = self._versions()
        keep = set(vs[-keep_latest:]) if vs else set()
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._read_manifest(spark, v))
        for v in vs:
            if v not in keep:  # Spark writes each manifest as a directory
                shutil.rmtree(os.path.join(self._manifest_dir(), f"{v}.parquet"))
        deleted = []
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                full = os.path.join(data_root, d)
                if full not in referenced:
                    shutil.rmtree(full)
                    deleted.append(full)
        return deleted
