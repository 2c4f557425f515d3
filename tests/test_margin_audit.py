"""Rounding-boundary margin regression guard (the round-6 red-row class).

Every oracle's FINAL projection rounds must either sit clear of their
half-boundaries or be exempt-listed as order-invariant by construction
(tools/margin_probe.INVARIANT_SAFE). Runs the probe's transform through
DuckDB at sf0.001 only — the fast gate; the full 3-SF audit is
`python tools/margin_probe.py` (MARGIN_AUDIT.json). No Spark needed."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mobilitydatalakebenchmark_spark.plans import load_registry
from tools.margin_probe import (
    INVARIANT_SAFE,
    TABLES,
    THRESHOLD,
    transform_final_rounds,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_no_fragile_rounds_at_sf0001(con):
    registry = load_registry()
    fragile = []
    for name, q in sorted(registry.items()):
        if q.oracle is None or name in INVARIANT_SAFE:
            continue
        new_sql, aliases = transform_final_rounds(q.oracle)
        if not aliases:
            continue
        res = con.execute(new_sql)
        cols = [d[0] for d in res.description]
        idx = [cols.index(a) for a in aliases if a in cols]
        for r in res.fetchall():
            for j in idx:
                v = r[j]
                if isinstance(v, float) and v < THRESHOLD:
                    fragile.append((name, cols[j], v))
                    break
    assert not fragile, (
        "gates with pre-rounded values inside cross-engine flip range "
        f"(make them order-invariant or exempt with a reason): {fragile}"
    )


def test_exempt_list_names_real_gates():
    registry = load_registry()
    unknown = [n for n in INVARIANT_SAFE if n not in registry]
    assert not unknown, f"stale INVARIANT_SAFE entries: {unknown}"
