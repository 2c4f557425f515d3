"""Degenerate-input sweep: every gate against EMPTY (or TINY) tables.

Builds a degenerate copy of each test table (same parquet schema, via
pyarrow — no JVM needed) and runs the full gate registry plus its
DuckDB oracles against it with tools/check_oracle.py. The contract: no
gate may CRASH on degenerate input, and the Spark result must still
match the oracle. Two shapes:

* default (0 rows) — catches the NULL-vs-NaN / None-arithmetic class:
  driver-side seed collects, max(ts) feeding datetime math, zero
  denominators, sinks never created by zero-batch streams
  (VERDICT r10 item 7; 32 gates hardened in r11, DEGENERATE_r11.json);
* ``--rows N`` (first N rows per table) — catches the SINGLE-SAMPLE
  class: sample stddev/variance of one row, percentiles and
  regressions over a single point, windows with no lag row.

Usage:
    python tools/degenerate_sweep.py [--build-only] [--rows N]
        [out_dir] [gate_filter ...]
        builds the twin of /root/testdata/sf0.001 under out_dir
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


def build_empty_dir(src_dir: str, out_dir: str, rows: int = 0) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if rows <= 0:
            table = pq.read_schema(src).empty_table()
        else:
            table = pq.read_table(src).slice(0, rows)
        pq.write_table(table, os.path.join(out_dir, f"{t}.parquet"))


def main() -> None:
    argv = list(sys.argv[1:])
    build_only = "--build-only" in argv
    if build_only:
        argv.remove("--build-only")
    rows = 0
    if "--rows" in argv:
        i = argv.index("--rows")
        rows = int(argv[i + 1])
        del argv[i : i + 2]
    out_dir = argv[0] if argv else "/tmp/degenerate_sf"
    src = "/root/testdata/sf0.001"
    build_empty_dir(src, out_dir, rows=rows)
    print(f"{rows}-row twin of {src} built at {out_dir}")
    if build_only:
        return
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.call(
        [sys.executable, os.path.join(here, "tools", "check_oracle.py"),
         "--degenerate", out_dir, *argv[1:]]
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
