"""Partition & capacity advisor — the 100 TB sizing math, mechanized.

Usage: python tools/partition_advisor.py [sf_dir] [--scale M] [--cores N]
       [--json out.json]

Reads parquet FOOTERS only (pyarrow metadata — no Spark, no data scan)
for every table in a test-data dir and prints, per table and for the
whole directory:

* on-disk bytes, rows, average encoded row width, row-group sizes;
* the decode inflation guess (encoded parquet -> in-memory columnar,
  dictionary/RLE typically 2-4x — reported, not hidden);
* recommended ``spark.sql.files.maxPartitionBytes`` so one scan task
  decodes to ~128 MB in memory (too big spills, too small drowns the
  scheduler);
* recommended ``spark.sql.shuffle.partitions`` for a given core count:
  ~2-3 waves of ~128 MB-sized shuffle blocks over the POST-decode bytes
  (AQE coalesces down, it never splits up — so err high);
* which tables are broadcastable — the join-strategy cue. The compare
  uses ON-DISK scaled bytes against the session's 64 MB
  autoBroadcastJoinThreshold, because that is what Spark's own size
  estimate for a parquet scan is based on (file size, not decoded
  size); the decoded footprint of a broadcast table is reported
  separately so the driver/executor memory cost is visible;
* all of it extrapolated to ``--scale M`` (fact tables scale linearly;
  the tiny dims — region/nation — do not, and are flagged as such).

The point: "would this hold at 1000x?" should be an arithmetic answer,
not a vibe. This tool is that arithmetic, runnable against any parquet
directory laid out like the test data.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# dims whose cardinality is fixed by the schema, not the scale factor
FIXED_DIMS = {"region", "nation"}

TARGET_TASK_MEM = 128 * 1024 * 1024     # in-memory bytes per scan task
BROADCAST_LIMIT = 64 * 1024 * 1024      # session.py's autoBroadcastJoinThreshold
DECODE_INFLATION = 3.0                  # encoded->in-memory guess (2-4x typical)
SHUFFLE_BLOCK = 128 * 1024 * 1024
WAVES = 2


def table_stats(path: str) -> dict | None:
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
    if not os.path.exists(files[0]):
        return None
    rows = 0
    byte_total = 0
    rg_sizes: list[int] = []
    n_cols = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        n_cols = md.num_columns
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            rg_sizes.append(rg.total_byte_size)
        byte_total += os.path.getsize(f)
    return {
        "bytes": byte_total,
        "rows": rows,
        "n_cols": n_cols,
        "avg_row_bytes": round(byte_total / max(rows, 1), 2),
        "n_row_groups": len(rg_sizes),
        "avg_row_group_bytes": int(sum(rg_sizes) / max(len(rg_sizes), 1)),
    }


def advise(stats: dict, scale: float, cores: int) -> dict:
    scaled_bytes = {
        t: int(s["bytes"] * (1.0 if t in FIXED_DIMS else scale))
        for t, s in stats.items()
    }
    total = sum(scaled_bytes.values())
    decoded = int(total * DECODE_INFLATION)
    # one scan task should decode to ~TARGET_TASK_MEM
    max_partition_bytes = int(TARGET_TASK_MEM / DECODE_INFLATION)
    # shuffle: the big joins move the fact tables; ~2 waves of 128MB blocks
    shuffle_parts = max(
        cores * WAVES, decoded // SHUFFLE_BLOCK or 1
    )
    return {
        "scale": scale,
        "cores": cores,
        "total_bytes_on_disk": total,
        "est_decoded_bytes": decoded,
        "recommended": {
            "spark.sql.files.maxPartitionBytes": max_partition_bytes,
            "spark.sql.shuffle.partitions": shuffle_parts,
            "note": (
                "AQE coalesces excess shuffle partitions but never splits "
                "an oversized one - err high; enable skew-join (on in "
                "session.py)"
            ),
        },
        # Spark's auto-broadcast decision estimates a parquet scan by its
        # FILE size, so the cue must compare on-disk bytes (a decoded
        # compare would wrongly exclude tables in the 21-64 MB band that
        # the session WILL broadcast)
        "broadcastable": sorted(
            t for t, b in scaled_bytes.items() if b < BROADCAST_LIMIT
        ),
        "broadcast_decoded_cost_bytes": {
            t: int(b * DECODE_INFLATION)
            for t, b in sorted(scaled_bytes.items())
            if b < BROADCAST_LIMIT
        },
        "fixed_dims_not_scaled": sorted(FIXED_DIMS),
        "per_table_scaled_bytes": scaled_bytes,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    def opt(name: str, default):
        for i, a in enumerate(sys.argv):
            if a == f"--{name}" and i + 1 < len(sys.argv):
                return type(default)(sys.argv[i + 1])
        return default

    scale = opt("scale", 1.0)
    cores = opt("cores", 32)
    out_json = opt("json", "")

    stats = {}
    for t in TABLES:
        s = table_stats(os.path.join(sf_dir, f"{t}.parquet"))
        if s:
            stats[t] = s
    report = {
        "sf_dir": sf_dir,
        "tables": stats,
        "advice": advise(stats, scale, cores),
    }
    line = json.dumps(report)
    if out_json:
        with open(out_json, "w") as f:
            f.write(json.dumps(report, indent=1))
    print(line)


if __name__ == "__main__":
    main()
