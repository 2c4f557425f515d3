"""Training-shard export: token-balanced assignment, reproducible layout,
manifest integrity, and the verify round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
# sources in the sf0.001 corpus carry ~1.2-1.7k tokens each; 512 forces
# 3-4 shards per source so boundary logic is actually exercised
SHARD_TOKENS = 512


@pytest.fixture(scope="module")
def documents(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    df.cache().count()
    return df


def test_every_doc_in_exactly_one_shard(spark, documents):
    from mobilitydatalakebenchmark_spark.operators.shards import assign_shards

    assigned = assign_shards(documents, SHARD_TOKENS)
    assert assigned.count() == documents.count()
    assert assigned.select("doc_id").distinct().count() == documents.count()


def test_shards_are_token_balanced(spark, documents):
    """Every shard except each source's last must carry at least
    shard_tokens - max_doc_tokens tokens (a boundary can only undershoot
    by less than one document)."""
    from mobilitydatalakebenchmark_spark.operators.shards import assign_shards

    assigned = assign_shards(documents, SHARD_TOKENS)
    max_doc = assigned.agg(F.max("n_tokens")).first()[0]
    bin_no = F.regexp_extract("shard", r"-(\d+)$", 1).cast("int")
    per_shard = assigned.groupBy("source", "shard").agg(
        F.sum("n_tokens").alias("tok"), F.first(bin_no).alias("bin")
    )
    w_last = per_shard.groupBy("source").agg(F.max("bin").alias("last_bin"))
    inner = per_shard.join(w_last, "source").filter(
        F.col("bin") != F.col("last_bin")
    )
    low = inner.agg(F.min("tok")).first()[0]
    assert low is not None and low > SHARD_TOKENS - max_doc


def test_assignment_is_partition_invariant(spark, documents):
    from mobilitydatalakebenchmark_spark.operators.shards import assign_shards

    a = sorted(
        (r.doc_id, r.shard, r.start_offset)
        for r in assign_shards(documents, SHARD_TOKENS).collect()
    )
    b = sorted(
        (r.doc_id, r.shard, r.start_offset)
        for r in assign_shards(documents.repartition(7), SHARD_TOKENS).collect()
    )
    assert a == b


def test_write_verify_roundtrip(spark, documents, tmp_path):
    from mobilitydatalakebenchmark_spark.operators.shards import (
        verify_shards,
        write_shards,
    )

    write_shards(documents, str(tmp_path / "shards"), SHARD_TOKENS)
    checks = verify_shards(spark, str(tmp_path / "shards")).collect()
    assert len(checks) > 1
    assert all(r.ok_docs and r.ok_tokens and r.ok_content for r in checks)
    manifest = spark.read.parquet(str(tmp_path / "shards" / "manifest.parquet"))
    total = manifest.agg(F.sum("n_docs")).first()[0]
    assert total == documents.count()


def test_verify_flags_lost_shard(spark, documents, tmp_path):
    """Deleting one shard directory must flip that shard's booleans to
    null/False in the verify join, not pass silently."""
    import shutil

    from mobilitydatalakebenchmark_spark.operators.shards import (
        verify_shards,
        write_shards,
    )

    path = str(tmp_path / "shards")
    write_shards(documents, path, SHARD_TOKENS)
    data_dir = tmp_path / "shards" / "data.parquet"
    victim = sorted(p for p in data_dir.iterdir() if p.name.startswith("shard="))[0]
    shutil.rmtree(victim)
    checks = verify_shards(spark, path).collect()
    bad = [r for r in checks if not (r.ok_docs and r.ok_tokens and r.ok_content)]
    assert len(bad) == 1
