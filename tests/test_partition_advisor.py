"""Capacity-advisor arithmetic: footer stats, scaling, broadcast cues."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.partition_advisor import BROADCAST_LIMIT, DECODE_INFLATION, advise, table_stats

SF = "/root/testdata/sf0.001"


def test_table_stats_reads_footers():
    s = table_stats(f"{SF}/lineitem.parquet")
    assert s["rows"] > 0 and s["bytes"] > 0
    assert s["avg_row_bytes"] > 0
    assert s["n_row_groups"] >= 1


def test_fixed_dims_do_not_scale():
    stats = {t: table_stats(f"{SF}/{t}.parquet") for t in ("region", "lineitem")}
    a1 = advise(stats, scale=1.0, cores=8)
    a100 = advise(stats, scale=100.0, cores=8)
    assert a100["per_table_scaled_bytes"]["region"] == a1["per_table_scaled_bytes"]["region"]
    assert a100["per_table_scaled_bytes"]["lineitem"] == 100 * a1["per_table_scaled_bytes"]["lineitem"]


def test_broadcast_cue_respects_threshold():
    stats = {t: table_stats(f"{SF}/{t}.parquet") for t in ("region", "nation", "lineitem")}
    a = advise(stats, scale=1.0, cores=8)
    assert {"region", "nation"} <= set(a["broadcastable"])
    # the cue compares ON-DISK bytes (Spark's own estimate basis): a
    # table whose disk size is just under the threshold stays
    # broadcastable even though its decoded footprint exceeds it...
    just_under = (BROADCAST_LIMIT - 1) / stats["lineitem"]["bytes"]
    a2 = advise(stats, scale=just_under, cores=8)
    assert "lineitem" in a2["broadcastable"]
    assert (
        a2["broadcast_decoded_cost_bytes"]["lineitem"] > BROADCAST_LIMIT
    )  # ...and the memory cost of doing so is reported
    # past the limit on disk: it must leave the broadcast set
    big = advise(stats, scale=(BROADCAST_LIMIT + 1) / stats["lineitem"]["bytes"], cores=8)
    assert "lineitem" not in big["broadcastable"]


def test_shuffle_partitions_cover_decoded_bytes():
    stats = {"lineitem": table_stats(f"{SF}/lineitem.parquet")}
    a = advise(stats, scale=1e6, cores=100)
    decoded = a["est_decoded_bytes"]
    parts = a["recommended"]["spark.sql.shuffle.partitions"]
    # each shuffle partition stays near the 128MB block target
    assert decoded / parts <= 128 * 1024 * 1024 * 1.01
    assert parts >= 200  # at least cores x waves
