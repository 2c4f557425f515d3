"""REST polling source: a real local HTTP server feeds poll_to_dir, and
the landed files round-trip through the standard snapshot reader."""

from __future__ import annotations

import http.server
import json
import os
import threading

from pyspark.sql import functions as F

from mobilitydatalakebenchmark_spark.sources.geojson import (
    generate_snapshots,
    read_snapshot_dir,
)
from mobilitydatalakebenchmark_spark.sources.rest import http_fetch, poll_to_dir


def _serve_snapshots(snaps):
    """One-shot server: each GET returns the next (ts, doc) envelope."""
    idx = {"i": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API name
            ts, doc = snaps[idx["i"] % len(snaps)]
            idx["i"] += 1
            body = json.dumps({"timestamp": ts, "data": doc}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence request logging
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_poll_real_http_roundtrip(spark, tmp_path):
    snaps = generate_snapshots(n_snapshots=4, n_vehicles=10, seed=3)
    srv = _serve_snapshots(snaps)
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/vehicle-position"
        out = str(tmp_path / "landing")
        written = poll_to_dir(url, out, n_polls=4, interval_s=0.0)
        assert len(written) == 4
        df = read_snapshot_dir(spark, out)
        assert df.count() == 4
        got_ts = sorted(r.timestamp for r in df.select("timestamp").collect())
        assert got_ts == sorted(ts for ts, _ in snaps)
        # per-snapshot uuid multiset survives the HTTP + landing hop
        got = {
            r.timestamp: sorted(u.uuid for u in r.uuids)
            for r in df.select(
                "timestamp",
                F.expr("transform(data.features, f -> struct(f.properties.uuid AS uuid))").alias("uuids"),
            ).collect()
        }
        want = {
            ts: sorted(f["properties"]["uuid"] for f in doc["features"])
            for ts, doc in snaps
        }
        assert got == want
    finally:
        srv.shutdown()


def test_poll_bare_featurecollection_and_cadence(tmp_path):
    """Endpoints returning a bare FeatureCollection land too, and the
    loop sleeps interval_s between polls (not after the last)."""
    calls = {"fetch": 0, "slept": []}

    def fake_fetch(url):
        calls["fetch"] += 1
        return json.dumps({"type": "FeatureCollection", "features": []}).encode()

    out = str(tmp_path / "landing2")
    written = poll_to_dir(
        "http://unused.invalid/feed",
        out,
        n_polls=3,
        interval_s=20.0,
        fetch=fake_fetch,
        clock=lambda: 1_700_000_000.0,
        sleep=lambda s: calls["slept"].append(s),
    )
    assert calls["fetch"] == 3
    assert calls["slept"] == [20.0, 20.0]
    # same fallback ts -> uniquified .1/.2 suffixes, no snapshot lost
    assert len(set(written)) == 3
    assert all(os.path.exists(p) for p in written)
    assert json.load(open(written[0]))["type"] == "FeatureCollection"


def test_http_fetch_is_stdlib_get(tmp_path):
    snaps = generate_snapshots(n_snapshots=1, n_vehicles=2, seed=9)
    srv = _serve_snapshots(snaps)
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/x"
        body = json.loads(http_fetch(url))
        assert body["timestamp"] == snaps[0][0]
    finally:
        srv.shutdown()


def test_pii_scrub_composes_with_streaming_ingest(spark, tmp_path):
    """PII scrubbing is pure expressions, so it drops into a streaming
    query unchanged: land documents as JSON, stream them, scrub, and
    assert no PII survives in the sink."""
    import json as _json

    from pyspark.sql import functions as F

    from mobilitydatalakebenchmark_spark.operators import pii

    data_dir = tmp_path / "docs"
    data_dir.mkdir()
    rows = [
        {"doc_id": 0, "text": "mail Me@Example.COM now"},
        {"doc_id": 1, "text": "server 10.0.0.1 ssn 078-05-1120"},
        {"doc_id": 2, "text": "clean"},
    ]
    with open(data_dir / "batch.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(str(data_dir))
    q = (
        pii.scrub_pii(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pii_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_pii"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.processAllAvailable()
        q.stop()
    got = {r.doc_id: r.text for r in spark.sql("SELECT * FROM pii_stream").collect()}
    assert got[0] == "mail [EMAIL] now"
    assert got[1] == "server [IPV4] ssn [SSN]"
    assert got[2] == "clean"
    residual = (
        spark.sql("SELECT text FROM pii_stream")
        .select(sum(pii.pii_counts(F.col("text")), F.lit(0)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert residual == 0
