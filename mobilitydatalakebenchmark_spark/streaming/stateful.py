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
