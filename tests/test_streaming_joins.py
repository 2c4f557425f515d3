"""Stream-stream interval join: streamed result must equal the batch join
over the same files, and left-outer must emit unmatched rows (null-padded)
once the watermark proves no match can arrive."""

from __future__ import annotations

import datetime as dt

import pytest
pytestmark = pytest.mark.slow  # r13: heavy suite, excluded from the default fast tier (run with -m "" or -m slow)


from mobilitydatalakebenchmark_spark.streaming.joins import interval_join_streams

BASE = dt.datetime(2024, 3, 1, 8, 0, 0)
VIEW_SCHEMA = "user_id BIGINT, view_id BIGINT, l_ts TIMESTAMP"
BUY_SCHEMA = "user_id BIGINT, buy_id BIGINT, r_ts TIMESTAMP"


def _mins(m):
    return BASE + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def join_dirs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_joins"))
    # views: u1 at 0' and 40'; u2 at 0'; u3 at 5' (never buys)
    views = [
        (1, 101, _mins(0)),
        (1, 102, _mins(40)),
        (2, 201, _mins(0)),
        (3, 301, _mins(5)),
    ]
    # buys: u1 at 10' (matches view 101 only: 102 is later), u1 at 41'
    # (matches 102), u2 at 30' (outside 15' window of 201 -> no match)
    buys = [
        (1, 901, _mins(10)),
        (1, 902, _mins(41)),
        (2, 903, _mins(30)),
    ]
    # split into micro-files + a far-future flush pair to drive the
    # watermark past every real event (closes outer-join state)
    flush_v = [(9, 999, _mins(60 * 48))]
    flush_b = [(9, 998, _mins(60 * 48))]
    for i, chunk in enumerate([views[:2], views[2:], flush_v]):
        spark.createDataFrame(chunk, VIEW_SCHEMA).coalesce(1).write.parquet(
            f"{root}/views/vf={i}"
        )
    for i, chunk in enumerate([buys[:1], buys[1:], flush_b]):
        spark.createDataFrame(chunk, BUY_SCHEMA).coalesce(1).write.parquet(
            f"{root}/buys/bf={i}"
        )
    return root


def _streams(spark, root):
    v = (
        spark.readStream.schema(VIEW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/views")
    )
    b = (
        spark.readStream.schema(BUY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/buys")
    )
    return v, b


def _run(spark, root, how, out):
    v, b = _streams(spark, root)
    q = (
        interval_join_streams(v, b, how=how)
        .writeStream.format("parquet")
        .option("path", f"{root}/{out}")
        .option("checkpointLocation", f"{root}/{out}_ckpt")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if not q.awaitTermination(240):
        q.processAllAvailable()
        q.stop()
    return spark.read.parquet(f"{root}/{out}")


def test_inner_interval_join_matches_batch(spark, join_dirs):
    root = join_dirs
    got = {
        (r.user_id, r.view_id, r.buy_id)
        for r in _run(spark, root, "inner", "out_inner").collect()
        if r.user_id != 9
    }
    # batch truth: buy within [view, view+15']
    assert got == {(1, 101, 901), (1, 102, 902)}


def test_left_outer_emits_unmatched_after_watermark(spark, join_dirs):
    root = join_dirs
    rows = [
        (r.user_id, r.view_id, r.buy_id)
        for r in _run(spark, root, "left_outer", "out_left").collect()
        if r.user_id != 9
    ]
    matched = {t for t in rows if t[2] is not None}
    unmatched = {t[:2] for t in rows if t[2] is None}
    assert matched == {(1, 101, 901), (1, 102, 902)}
    # view 201 (buy outside window) and 301 (no buy at all) emit null-padded
    assert unmatched == {(2, 201), (3, 301)}
    assert len(rows) == 4
