"""REST polling source (reference ``get_data.py:11-29``): fetch a JSON
endpoint on a fixed cadence and land each response as one snapshot file.

The reference's ingestion loop is ``while True: requests.get(url); save
json; sleep(20)``. The Spark-idiomatic shape is the same loop feeding the
file-stream bridge: each poll writes ``{ts}.json`` into a directory that
``streaming.ingest.read_snapshot_stream`` tails as a Structured Streaming
source — landing files is exactly how production REST ingestion bridges
into Spark when no Kafka hop exists (object-store landing zone). The
poller uses only the stdlib (urllib); ``fetch`` is injectable so tests
run against a local http.server and offline replays skip HTTP entirely.

Scale posture: the poller is a single lightweight ingestion client (the
reference's is too); throughput scales on the Spark side via the file
stream's ``maxFilesPerTrigger`` batching, not the poller. Many feeds =
many pollers landing into one partitioned directory tree.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
from typing import Callable

FetchFn = Callable[[str], bytes]


def http_fetch(url: str, timeout_s: float = 10.0) -> bytes:
    """GET ``url`` with the stdlib — no third-party HTTP dependency."""
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return resp.read()


def _snapshot_ts(doc: dict, fallback_ts: str) -> str:
    """Prefer a timestamp carried by the payload (deterministic replays);
    fall back to the poll wall-clock otherwise."""
    ts = doc.get("timestamp") if isinstance(doc, dict) else None
    return ts if isinstance(ts, str) and ts else fallback_ts


def poll_to_dir(
    url: str,
    out_dir: str,
    n_polls: int,
    interval_s: float = 20.0,
    fetch: FetchFn | None = None,
    clock: Callable[[], float] | None = None,
    sleep: Callable[[float], None] | None = None,
) -> list[str]:
    """Poll ``url`` ``n_polls`` times, landing each JSON response as
    ``{ts}.json`` (colons stored as ``_``, matching
    ``geojson.write_snapshot_dir``). Returns the written file paths.

    ``fetch``/``clock``/``sleep`` are injectable for hermetic tests; the
    defaults are real HTTP + wall clock, i.e. the reference's loop."""
    fetch = fetch or http_fetch
    clock = clock or time.time
    sleep = sleep or time.sleep
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []
    for i in range(n_polls):
        raw = fetch(url)
        doc = json.loads(raw)
        fallback = time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(clock()))
        ts = _snapshot_ts(doc, fallback)
        payload = doc.get("data", doc) if isinstance(doc, dict) else doc
        fname = os.path.join(out_dir, f"{ts.replace(':', '_')}.json")
        # two polls can carry the same payload timestamp (fast polls +
        # wall-clock fallback): uniquify instead of silently overwriting a
        # landed snapshot, so no response is lost
        seq = 1
        while os.path.exists(fname):
            fname = os.path.join(out_dir, f"{ts.replace(':', '_')}.{seq}.json")
            seq += 1
        # atomic landing: the directory is tailed by a Structured Streaming
        # file source, which may list a file the instant it appears — write
        # to a temp name and rename so no micro-batch sees a partial JSON
        tmp = fname + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, fname)
        written.append(fname)
        if i + 1 < n_polls:
            sleep(interval_s)
    return written
