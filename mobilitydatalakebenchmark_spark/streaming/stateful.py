"""Custom stateful streaming operators (applyInPandasWithState).

The reference's write paths keep driver-side mutable state: a first-seen
vehicle hash table (``apache_parquet_velocity.py:38-40,81-85``) and id
counters reset on bucket change (W2). In batch mode those become window
ranks (A9). In TRUE streaming, the state must live in the engine —
``applyInPandasWithState`` keys the state by vehicle uuid, so it shards
across executors and survives micro-batches (RocksDB/HDFS state store in
production; the semantics here are store-agnostic).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("uuid", T.StringType()),
        T.StructField("first_timestamp", T.StringType()),
        T.StructField("color", T.StringType()),
        T.StructField("lineId", T.StringType()),
    ]
)

_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _first_seen_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # vehicle already emitted in an earlier batch
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    first = rows.sort_values("timestamp").iloc[0]
    state.update((True,))
    yield pd.DataFrame(
        {
            "uuid": [key[0]],
            "first_timestamp": [first["timestamp"]],
            "color": [first["color"]],
            "lineId": [first["lineId"]],
        }
    )


def streaming_first_seen(documents: DataFrame) -> DataFrame:
    """Streaming A9/F5: emit each vehicle exactly once, at its first
    appearance across the whole stream. State = one boolean per uuid,
    sharded by the state store."""
    from ..operators.flat_store import explode_features

    flat = explode_features(documents).select("uuid", "timestamp", "color", "lineId")
    return flat.groupBy("uuid").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming odometer: per-vehicle cumulative distance. State = (running
# total, fix count, last fix position) so the distance chain survives
# micro-batch boundaries.
#
# Implementation note: Spark 4's transformWithStateInPandas is the richer
# API for this (typed value state, timers, TTL), but its Python worker
# needs the `protobuf` package, which this image lacks — so the operator
# uses applyInPandasWithState (GroupState), which has everything the
# odometer needs and no extra dependency. The state contract is identical.
# ---------------------------------------------------------------------------

ODOMETER_OUTPUT = T.StructType(
    [
        T.StructField("uuid", T.StringType()),
        T.StructField("total_m", T.DoubleType()),
        T.StructField("n_fixes", T.LongType()),
    ]
)


def _haversine_np(lat1, lon1, lat2, lon2):
    import numpy as np

    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, dtype="f8")) for x in (lat1, lon1, lat2, lon2))
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * 6371008.8 * np.arcsin(np.sqrt(a))


_ODO_STATE = T.StructType(
    [
        T.StructField("total_m", T.DoubleType()),
        T.StructField("n_fixes", T.LongType()),
        T.StructField("last_lon", T.DoubleType()),
        T.StructField("last_lat", T.DoubleType()),
    ]
)


def _odometer_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("timestamp")
    if batch.empty:
        return
    total, n, last_lon, last_lat = state.get if state.exists else (0.0, 0, None, None)
    lons = batch["coordinates_0"].to_numpy(dtype="f8")
    lats = batch["coordinates_1"].to_numpy(dtype="f8")
    if last_lon is not None:
        lons = np.concatenate(([last_lon], lons))
        lats = np.concatenate(([last_lat], lats))
    if len(lons) > 1:
        total += float(_haversine_np(lats[:-1], lons[:-1], lats[1:], lons[1:]).sum())
    n += len(batch)
    state.update((float(total), int(n), float(lons[-1]), float(lats[-1])))
    yield pd.DataFrame({"uuid": [key[0]], "total_m": [total], "n_fixes": [n]})


def streaming_odometer(documents: DataFrame) -> DataFrame:
    """Per-vehicle cumulative great-circle distance over the whole stream
    (streaming twin of operators/trajectory.step_metrics summed): one
    emission per (vehicle, micro-batch) with the running total."""
    from ..operators.flat_store import explode_features

    flat = explode_features(documents).select(
        "uuid", "timestamp", "coordinates_0", "coordinates_1"
    )
    return flat.groupBy("uuid").applyInPandasWithState(
        _odometer_fn,
        outputStructType=ODOMETER_OUTPUT,
        stateStructType=_ODO_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming LSH near-duplicate candidates: the dedup pipeline as data
# ARRIVES rather than as a batch sweep. Signatures and band keys are pure
# expressions (stateless, identical to operators/dedup.py); the state is
# the bucket membership — per (band_idx, band_hash) the doc ids already
# seen — so a new document emits one candidate pair per co-bucketed
# predecessor, exactly once, across any micro-batch boundary.
#
# Scale posture: state is sharded by the uniform 128-bit band hash (no hot
# keys by construction); each bucket's member list is small for real
# corpora (the same boundedness argument as batch lsh_candidate_pairs).
# Pairs may surface from several bands — consumers dedup on (doc_a,
# doc_b), which the batch twin does with .distinct(); a streaming global
# distinct would need its own keyed state and is left to the sink.
# ---------------------------------------------------------------------------

LSH_CANDIDATE_OUTPUT = T.StructType(
    [
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
    ]
)

_LSH_STATE = T.StructType([T.StructField("ids", T.ArrayType(T.LongType()))])


def _lsh_bucket_fn(
    key: Tuple[int, str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch = pd.concat(list(pdfs), ignore_index=True)
    if batch.empty:
        return
    (known,) = state.get if state.exists else ([],)
    known = list(known)
    new_ids = sorted(set(int(i) for i in batch["doc_id"]) - set(known))
    a_out, b_out = [], []
    for nid in new_ids:
        for old in known:
            lo, hi = (old, nid) if old < nid else (nid, old)
            a_out.append(lo)
            b_out.append(hi)
        known.append(nid)
    state.update((known,))
    if a_out:
        yield pd.DataFrame(
            {
                "doc_a": a_out,
                "doc_b": b_out,
                "band_idx": [int(key[0])] * len(a_out),
            }
        )


def streaming_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int | None = None,
) -> DataFrame:
    """Streaming twin of dedup.lsh_candidate_pairs: emits (doc_a, doc_b,
    band_idx) the moment the second member of a bucket arrives. The union
    of emissions over any arrival order equals the batch candidate set
    (pairs sharing >=1 band) — asserted by the equivalence test."""
    from ..operators.dedup import lsh_band_keys, minhash_signatures_rowwise

    # rowwise signatures: bit-identical to the batch path but with no
    # groupBy, which streaming append mode rejects without a watermark
    sig = minhash_signatures_rowwise(docs, text_col, id_col, n_hashes, shingle_n)
    bands_df = lsh_band_keys(sig, id_col, bands)
    return bands_df.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _lsh_bucket_fn,
        outputStructType=LSH_CANDIDATE_OUTPUT,
        stateStructType=_LSH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM monitor: the fixed-reference form of operators/
# timeseries.cusum_excursions as data ARRIVES. The mean-referenced batch
# form needs the whole series (the reference is a global statistic); the
# process-control form S_t = max(0, S_{t-1} + (x - ref)) needs only the
# current excursion — O(1) BIGINT state per entity, sharded by the state
# store. Everything stays exact integer cents, so the streamed series is
# bit-identical to the batch unrolling at every prefix.
# ---------------------------------------------------------------------------

CUSUM_OUTPUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("s_scaled", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("max_excursion_scaled", T.LongType()),
    ]
)

_CUSUM_STATE = T.StructType(
    [
        T.StructField("s", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("alarms", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def _make_cusum_fn(ref_cents: int, threshold_cents: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values("seq")
        s, n, alarms, peak = state.get if state.exists else (0, 0, 0, 0)
        for x in batch["cents"].astype("int64"):
            s = max(0, s + (int(x) - ref_cents))
            n += 1
            peak = max(peak, s)
            if s > threshold_cents:
                alarms += 1
        state.update((int(s), int(n), int(alarms), int(peak)))
        yield pd.DataFrame(
            {
                "entity": [key[0]],
                "s_scaled": [s],
                "n_events": [n],
                "n_alarms": [alarms],
                "max_excursion_scaled": [peak],
            }
        )

    return fn


def streaming_cusum(
    events: DataFrame,
    ref_cents: int,
    threshold_cents: int,
) -> DataFrame:
    """Per-entity streaming CUSUM over ``(entity string, seq, cents)``
    rows: one emission per (entity, micro-batch) carrying the current
    excursion and the cumulative alarm count / peak. Within a micro-batch
    rows are ordered by ``seq``; cross-batch ordering is arrival order
    (the monitoring contract — a replayed/late fix belongs to a watermark
    policy upstream)."""
    return events.groupBy("entity").applyInPandasWithState(
        _make_cusum_fn(int(ref_cents), int(threshold_cents)),
        outputStructType=CUSUM_OUTPUT,
        stateStructType=_CUSUM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming truncated EWMA: the 16-lag smoother (operators/timeseries.
# ewma_scaled) as data arrives. The truncation IS the streaming story:
# state carries exactly the last `window` cents per entity (a bounded
# array — lags 0..window-1 all contribute; the untruncated recursion
# would need unbounded history to replay), so the streamed scaled series
# is bit-identical to the batch window unrolling at every row.
# ---------------------------------------------------------------------------

EWMA_OUTPUT = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ewma_scaled", T.LongType()),
    ]
)

_EWMA_STATE = T.StructType([T.StructField("lags", T.ArrayType(T.LongType()))])


def _make_ewma_fn(window: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values("seq")
        (lags,) = state.get if state.exists else ([],)
        lags = [int(x) for x in lags]  # newest LAST
        out_seq, out_val = [], []
        for seq, x in zip(batch["seq"].astype("int64"), batch["cents"].astype("int64")):
            lags.append(int(x))
            if len(lags) > window:
                lags = lags[-window:]
            # y_t * 2^window = sum_j x_(t-j) * 2^(window-1-j), j = age
            val = sum(
                v << (window - 1 - age)
                for age, v in enumerate(reversed(lags))
            )
            out_seq.append(int(seq))
            out_val.append(int(val))
        state.update((lags,))
        yield pd.DataFrame(
            {
                "entity": [key[0]] * len(out_seq),
                "seq": out_seq,
                "ewma_scaled": out_val,
            }
        )

    return fn


def streaming_ewma(events: DataFrame, window: int = 16) -> DataFrame:
    """Per-entity streaming truncated EWMA over ``(entity string, seq,
    cents)`` rows: one emission PER ROW carrying the scaled smoother
    value — bit-identical to ``operators/timeseries.ewma_scaled`` on the
    same rows in ``seq`` order. State = the last ``window`` cents."""
    return events.groupBy("entity").applyInPandasWithState(
        _make_ewma_fn(int(window)),
        outputStructType=EWMA_OUTPUT,
        stateStructType=_EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters: the batch sketch (operators/
# text_analysis.misra_gries_candidates) as data arrives. The stream is
# SHARDED by a hash of the token (state key = shard id), and each shard
# maintains one MG counter table over its own token substream — state
# is bounded by n_counters per shard FOREVER, no matter how unbounded
# the vocabulary. Because sharding partitions the token space, each
# token's whole history lands in one shard, so the per-shard MG
# guarantee holds against that shard's running total: any token with
# frequency > n_shard/(k+1) survives, undercounted by at most
# n_shard/(k+1). Per batch each shard re-emits its full summary (at
# most n_counters rows); the LAST emission per shard is the live
# candidate set — union the shards and exact-recount for true top-k
# (the batch heavy_hitters_topk recipe, incrementally).
# ---------------------------------------------------------------------------

MG_OUTPUT = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("token", T.StringType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_MG_STATE = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _make_mg_fn(n_counters: int):
    def fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        if state.exists:
            toks, counts, n_seen = state.get
            counters = dict(zip(list(toks), [int(c) for c in counts]))
            n_seen = int(n_seen)
        else:
            counters, n_seen = {}, 0
        # identical merge rule to the batch kernel: value_counts in,
        # overflow decrements by the (k+1)-th largest
        for tok, cnt in batch["token"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(cnt)
        n_seen += len(batch)
        if len(counters) > n_counters:
            cut = sorted(counters.values(), reverse=True)[n_counters]
            counters = {t: c - cut for t, c in counters.items() if c - cut > 0}
        state.update(
            (list(counters), [int(c) for c in counters.values()], int(n_seen))
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "token": list(counters),
                "mg_count": list(counters.values()),
                "n_seen": [n_seen] * len(counters),
            }
        )

    return fn


def streaming_heavy_hitters(
    tokens: DataFrame,
    token_col: str = "token",
    n_counters: int = 64,
    n_shards: int = 8,
) -> DataFrame:
    """Streaming MG candidates over a token stream: one emission per
    (shard, surviving counter) per micro-batch. Take each shard's rows
    at its max ``n_seen`` for the live summary."""
    sharded = tokens.select(
        F.col(token_col).alias("token"),
        (F.crc32(F.col(token_col).cast("string")) % n_shards)
        .cast("int")
        .alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _make_mg_fn(int(n_counters)),
        outputStructType=MG_OUTPUT,
        stateStructType=_MG_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming A-Res weighted reservoir: the batch weighted_sample
# (operators/text_analysis.weighted_sample) as data arrives. Because the
# A-Res draw is DETERMINISTIC (md5 of the id — no RNG state), the
# streaming reservoir converges to the EXACT same row set the batch
# operator picks on the full data: merging a new row into the running
# top-k by (ares_key desc, id asc) commutes with arrival order. State =
# at most k (id, key) pairs per group, forever.
# ---------------------------------------------------------------------------

ARES_OUTPUT = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("ares_key", T.DoubleType()),
        T.StructField("rk", T.IntegerType()),
    ]
)

_ARES_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("keys", T.ArrayType(T.DoubleType())),
    ]
)


def _make_ares_fn(k: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        if state.exists:
            ids, keys = state.get
            pool = list(zip([int(i) for i in ids], [float(x) for x in keys]))
        else:
            pool = []
        pool.extend(
            (int(i), float(x))
            for i, x in zip(batch["doc_id"], batch["ares_key"])
        )
        # the batch operator's exact ordering: ares_key desc, id asc
        pool.sort(key=lambda p: (-p[1], p[0]))
        pool = pool[:k]
        state.update(([p[0] for p in pool], [p[1] for p in pool]))
        yield pd.DataFrame(
            {
                "group": [key[0]] * len(pool),
                "doc_id": [p[0] for p in pool],
                "ares_key": [p[1] for p in pool],
                "rk": list(range(1, len(pool) + 1)),
            }
        )

    return fn


def streaming_weighted_sample(
    rows: DataFrame,
    k: int,
    group_col: str = "group",
    id_col: str = "doc_id",
    weight_col: str = "weight",
    salt: str = "ares",
) -> DataFrame:
    """Streaming weighted reservoir over ``(group, id, weight)`` rows:
    each micro-batch re-emits the group's current top-k reservoir
    (``rk`` = rank). The draw expression is byte-identical to the batch
    operator's, so the final reservoir equals
    ``weighted_sample(all_rows, ...)`` exactly."""
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (v.cast("double") + 1.0) / 4294967296.0
    keyed = rows.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.round(F.log(u) / F.col(weight_col).cast("double"), 10).alias("ares_key"),
    )
    return keyed.groupBy("group").applyInPandasWithState(
        _make_ares_fn(int(k)),
        outputStructType=ARES_OUTPUT,
        stateStructType=_ARES_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
