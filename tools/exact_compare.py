"""Zero-tolerance Spark-vs-DuckDB comparator (the r8 sweep).

check_oracle.py absorbs last-ulp float noise by rounding cells to 9dp —
which is the right call for the PASS gate, but it is structurally blind
to 1-ulp drift in raw float aggregates (the `anomaly_zscore_outliers`
std column: Spark 50.519601797606 vs DuckDB …601, Δ≈7e-15, invisible at
9dp yet red at the driver's typed hash). This tool compares BIT-EXACT:
floats by their IEEE-754 bit pattern, ints exactly, row order and
column order as returned. A gate that passes here will hash-match any
order- and type-faithful driver compare.

Usage: python tools/exact_compare.py [--json OUT] [sf_dir] [filter ...]
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mobilitydatalakebenchmark_spark.plans import load_registry
from mobilitydatalakebenchmark_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _bits(v):
    """Exact canonical form: floats -> IEEE bit pattern, Decimal -> exact
    string, everything else verbatim."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v).hex()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except Exception:
        pass
    return v


def _canon(cols, rows):
    # sort columns by name (the driver's compare does), keep exact cells;
    # sort rows by repr for order-insensitivity of the multiset compare —
    # bit-exact cells make the sort key itself exact
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_bits(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def main() -> None:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    name_filter = argv[1:]

    registry = load_registry()
    spark = get_spark("exact_compare")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )

    record: dict[str, dict] = {}
    n_exact = n_drift = n_skip = 0
    for name, q in sorted(registry.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        if q.oracle is None:
            n_skip += 1
            record[name] = {"status": "rows_only"}
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir)
            s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
        except Exception as exc:  # noqa: BLE001
            record[name] = {"status": "error", "err": str(exc)[:300]}
            print(f"✗ {name}: error: {str(exc).splitlines()[0][:200]}")
            n_drift += 1
            continue
        sc, dc = _canon(s_cols, s_rows), _canon(d_cols, d_rows)
        if sc == dc:
            n_exact += 1
            record[name] = {
                "status": "bit_exact",
                "rows": len(s_rows),
                "secs": round(time.time() - t0, 2),
            }
            print(f"✓ {name} bit-exact ({len(s_rows)} rows)")
        else:
            n_drift += 1
            diffs = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sc, dc))
                if a != b
            ][:3]
            record[name] = {
                "status": "drift",
                "rows": len(s_rows),
                "first_diffs": repr(diffs)[:500],
            }
            print(f"✗ {name}: DRIFT, first diffs: {repr(diffs)[:400]}")

    print(
        f"\n{n_exact} bit-exact, {n_drift} drifted/errored, {n_skip} "
        f"rows-only (of {len(registry)}) at {sf_dir}"
    )
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_bit_exact": n_exact,
                    "n_drift": n_drift,
                    "n_rows_only": n_skip,
                    "gates": record,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}")
    if n_drift:
        sys.exit(1)


if __name__ == "__main__":
    main()
