"""Degenerate-input sweep: every gate against EMPTY tables.

Builds a zero-row copy of each test table (same parquet schema, via
pyarrow — no JVM needed) and runs the full gate registry plus its
DuckDB oracles against it with tools/check_oracle.py. The contract: no
gate may CRASH on empty input, and the Spark result must still match
the oracle (usually both empty, sometimes a single all-NULL/zero
aggregate row). This catches the NULL-vs-NaN / None-arithmetic class —
e.g. a driver-side seed collect or a max(ts) feeding datetime math —
before the driver or a 100 TB run with an empty partition does
(VERDICT r10 item 7).

Usage:
    python tools/degenerate_sweep.py [--build-only] [out_dir]
        builds the empty twin of /root/testdata/sf0.001 under out_dir
        (default /tmp/degenerate_sf), then execs check_oracle on it.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_empty_dir(src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        schema = pq.read_schema(src)
        pq.write_table(
            schema.empty_table(), os.path.join(out_dir, f"{t}.parquet")
        )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--build-only"]
    build_only = "--build-only" in sys.argv[1:]
    out_dir = args[0] if args else "/tmp/degenerate_sf"
    src = "/root/testdata/sf0.001"
    build_empty_dir(src, out_dir)
    print(f"empty twin of {src} built at {out_dir}")
    if build_only:
        return
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.call(
        [sys.executable, os.path.join(here, "tools", "check_oracle.py"),
         "--degenerate", out_dir, *args[1:]]
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
