"""applyInPandasWithState first-seen dedup: exactly one emission per
vehicle across micro-batches, matching the batch window-rank answer."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # r13: heavy suite, excluded from the default fast tier (run with -m "" or -m slow)

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.sources.geojson import write_snapshot_dir
from mobilitydatalakebenchmark_spark.streaming.ingest import read_snapshot_stream
from mobilitydatalakebenchmark_spark.streaming.stateful import streaming_first_seen


def test_streaming_first_seen_matches_batch(spark, tmp_path, snapshots, documents_df):
    data_dir = str(tmp_path / "data")
    write_snapshot_dir(snapshots, data_dir)
    stream = read_snapshot_stream(spark, data_dir)
    out = streaming_first_seen(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("first_seen")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.processAllAvailable()
        q.stop()
    got = {
        r.uuid: r.first_timestamp
        for r in spark.sql("SELECT * FROM first_seen").collect()
    }

    # batch oracle: window-rank first occurrence (A9)
    from pyspark.sql import Window

    from mobilitydatalakebenchmark_spark.operators.flat_store import explode_features

    flat = explode_features(documents_df)
    w = Window.partitionBy("uuid").orderBy("timestamp")
    want = {
        r.uuid: r.timestamp
        for r in flat.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert len(got) == len(want)
    # one emission per uuid, at the earliest timestamp, modulo micro-batch
    # boundaries: maxFilesPerTrigger=64 > 48 snapshots -> single batch, so
    # the timestamps must match exactly
    assert got == want


def test_state_survives_across_batches(spark, tmp_path, snapshots):
    """With 8 files per trigger (6 micro-batches), re-appearing vehicles
    must NOT re-emit: the boolean state persists in the state store."""
    data_dir = str(tmp_path / "data")
    write_snapshot_dir(snapshots, data_dir)
    stream = read_snapshot_stream(spark, data_dir, max_files_per_trigger=8)
    out = streaming_first_seen(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("first_seen_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.processAllAvailable()
        q.stop()
    rows = spark.sql("SELECT uuid, count(*) AS n FROM first_seen_mb GROUP BY uuid").collect()
    assert all(r.n == 1 for r in rows)
    n_vehicles = len({f["properties"]["uuid"] for _, d in snapshots for f in d["features"]})
    assert len(rows) == n_vehicles


def test_streaming_odometer_matches_batch_total(spark, tmp_path, snapshots):
    """transformWithStateInPandas odometer across 6 micro-batches must end
    at the batch-mode per-vehicle distance sum (state carries the last fix
    over every batch boundary)."""
    from mobilitydatalakebenchmark_spark.operators import trajectory
    from mobilitydatalakebenchmark_spark.operators.flat_store import explode_features
    from mobilitydatalakebenchmark_spark.sources.geojson import snapshots_to_df
    from mobilitydatalakebenchmark_spark.streaming.stateful import streaming_odometer

    data_dir = str(tmp_path / "data")
    write_snapshot_dir(snapshots, data_dir)
    stream = read_snapshot_stream(spark, data_dir, max_files_per_trigger=8)
    q = (
        streaming_odometer(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("odometer")
        .option("checkpointLocation", str(tmp_path / "ckpt_odo"))
        .trigger(availableNow=True)
        .start()
    )
    # under a loaded machine 300 s can elapse before the availableNow run
    # drains; drive remaining batches explicitly instead of failing on an
    # incomplete memory sink
    if not q.awaitTermination(300):
        q.processAllAvailable()
        q.stop()
    # running totals are monotone: the final value per uuid is the max
    got = {
        r.uuid: (r.total_m, r.n_fixes)
        for r in spark.sql(
            """SELECT uuid, max(total_m) AS total_m, max(n_fixes) AS n_fixes
               FROM odometer GROUP BY uuid"""
        ).collect()
    }

    flat = explode_features(snapshots_to_df(spark, snapshots)).withColumn(
        "ts", F.col("timestamp").cast("timestamp")
    )
    want = {
        r.uuid: (r.total, r.n)
        for r in trajectory.step_metrics(flat, ts_col="ts")
        .groupBy("uuid")
        .agg(
            F.coalesce(F.sum("step_m"), F.lit(0.0)).alias("total"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uuid, (total_m, n_fixes) in got.items():
        assert n_fixes == want[uuid][1]
        assert total_m == pytest.approx(want[uuid][0], rel=1e-4)


def test_stream_static_enrichment(spark, tmp_path, snapshots):
    """Every streamed observation picks up its route attributes from the
    static dim; lineIds absent from the dim survive with nulls (left)."""
    from mobilitydatalakebenchmark_spark.streaming.ingest import enrich_stream

    data_dir = str(tmp_path / "data")
    write_snapshot_dir(snapshots, data_dir)
    line_ids = sorted(
        {
            f["properties"]["lineId"]
            for _, doc in snapshots
            for f in doc["features"]
        }
    )
    # dim covers all but the last lineId -> that one must keep null attrs
    dim = spark.createDataFrame(
        [(lid, f"route-{lid}", i % 3) for i, lid in enumerate(line_ids[:-1])],
        "lineId string, route_name string, zone int",
    )
    stream = read_snapshot_stream(spark, data_dir)
    q = (
        enrich_stream(stream, dim)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.processAllAvailable()
        q.stop()
    got = spark.sql("SELECT * FROM enriched")
    n_obs = sum(len(doc["features"]) for _, doc in snapshots)
    assert got.count() == n_obs  # left join: nothing dropped or duplicated
    covered = got.filter(F.col("lineId") != line_ids[-1])
    assert covered.filter(F.col("route_name").isNull()).count() == 0
    uncovered = got.filter(F.col("lineId") == line_ids[-1])
    assert uncovered.count() > 0
    assert uncovered.filter(F.col("route_name").isNotNull()).count() == 0


def test_streaming_lsh_candidates_equal_batch(spark, tmp_path):
    """Streaming LSH candidates accumulated over 5 micro-batches must
    equal the batch candidate set (pairs sharing >= 1 band), regardless
    of which batch each member of a pair arrived in."""
    import random

    from mobilitydatalakebenchmark_spark.operators.dedup import (
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from mobilitydatalakebenchmark_spark.streaming.stateful import (
        streaming_lsh_candidates,
    )

    rng = random.Random(17)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    docs = [(i, " ".join(rng.choice(words) for _ in range(40))) for i in range(60)]
    # planted dups split ACROSS batches (copy arrives 3 batches later)
    docs.append((200, docs[0][1]))
    docs.append((201, docs[7][1]))

    data_dir = tmp_path / "docs_stream"
    data_dir.mkdir()
    chunk = (len(docs) + 4) // 5
    for b in range(5):
        part = docs[b * chunk : (b + 1) * chunk]
        if part:
            spark.createDataFrame(part, "doc_id long, text string").coalesce(
                1
            ).write.parquet(str(data_dir / f"batch_{b}"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(data_dir / "batch_*"))
    )
    q = (
        streaming_lsh_candidates(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_lsh"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.processAllAvailable()
        q.stop()
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM lsh_stream").collect()
    }

    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = minhash_signatures(batch_df)
    want = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(lsh_band_keys(sig)).collect()
    }
    assert (0, 200) in got and (7, 201) in got  # cross-batch dups found
    assert got == want
