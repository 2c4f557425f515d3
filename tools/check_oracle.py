"""Local parity harness — replicates the driver's t2 correctness compare.

For every registry entry: run the Spark query and the DuckDB oracle on the
same sf dir, then compare (row count, column names, order-insensitive
value multiset with float tolerance). Exit non-zero on any mismatch.

Usage: python tools/check_oracle.py [--json out.json] [sf_dir] [name_filter ...]

``--json`` persists the per-gate verdicts (status, row counts, wall secs)
so a full-registry run is auditable from the repo (ORACLE_r{N}.json).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mobilitydatalakebenchmark_spark.plans import load_registry
from mobilitydatalakebenchmark_spark.session import get_spark
from tools.oracle_types import type_problems

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb last-ulp noise beyond the rounding both sides already do
        return round(v, 9)
    if isinstance(v, int):
        return v
    try:  # Decimal -> float
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [c for _, c in sorted(enumerate(cols), key=lambda t: t[1])], out


def main():
    argv = list(sys.argv[1:])
    # --degenerate: the input dir is INTENTIONALLY empty (degenerate
    # sweep) — a rows-only gate returning 0 rows is then the correct
    # outcome, not a red flag
    degenerate = "--degenerate" in argv
    if degenerate:
        argv.remove("--degenerate")
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracle.py [--json OUT] [sf_dir] [filter ...]")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    name_filter = argv[1:]
    registry = load_registry()
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    failures, passed, rows_only = [], 0, 0
    record: dict[str, dict] = {}
    for name, q in sorted(registry.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {exc}"))
            record[name] = {"status": "spark_error", "err": str(exc)[:300]}
            print(f"✗ {name}: spark error: {str(exc).splitlines()[0][:200]}")
            continue
        if q.oracle is None:
            rows_only += 1
            record[name] = {
                # an empty rows-only result IS a failure — the JSON must
                # say so per-gate, not only in the aggregate/exit code
                "status": "rows_only" if s_rows else "rows_only_empty",
                "spark_rows": len(s_rows),
                "secs": round(time.time() - t0, 2),
            }
            print(f"· {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            if len(s_rows) == 0 and not degenerate:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            # TYPE PARITY FIRST (lazy bind, no execution): the driver
            # hashes typed results — an oracle column DuckDB widened to
            # HUGEINT can never hash-equal Spark's int64 even when every
            # value is bit-exact (the r7 18-red-row failure class).
            spark_dec = {
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName().startswith("decimal")
            }
            tprobs = type_problems(con, q.oracle, name, spark_dec)
            if tprobs:
                failures.append((name, f"ORACLE TYPE: {'; '.join(tprobs)}"))
                record[name] = {
                    "status": "oracle_type",
                    "problems": "; ".join(tprobs)[:400],
                }
                print(f"✗ {name}: oracle type: {'; '.join(tprobs)[:300]}")
                continue
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            record[name] = {"status": "duckdb_error", "err": str(exc)[:300]}
            print(f"✗ {name}: duckdb error: {str(exc).splitlines()[0][:200]}")
            continue

        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"row count {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            _, sc = _canon_rows(s_cols, s_rows)
            _, dc = _canon_rows(d_cols, d_rows)
            if sc != dc:
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            record[name] = {
                "status": "mismatch",
                "problems": "; ".join(problems)[:400],
                "spark_rows": len(s_rows),
                "oracle_rows": len(d_rows),
            }
            print(f"✗ {name}: {'; '.join(problems)[:400]}")
        else:
            passed += 1
            record[name] = {
                "status": "matched",
                "spark_rows": len(s_rows),
                "oracle_rows": len(d_rows),
                "secs": round(time.time() - t0, 2),
            }
            print(f"✓ {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")

    print(
        f"\n{passed} matched, {rows_only} rows-only, {len(failures)} failed "
        f"(of {len(registry)} registered) at {sf_dir}"
    )
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_registered": len(registry),
                    "n_matched": passed,
                    "n_rows_only": rows_only,
                    "n_failed": len(failures),
                    "gates": record,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
