"""Rounding-boundary margin audit for every oracle-checked gate.

A rounded float cell can flip between engines when its pre-rounded
value sits within aggregation-order noise (~1e-13 relative for float
sums) of a rounding half-boundary. This tool finds every such landmine
BEFORE a driver run does. (Historical note: round 6's red row was
FIRST diagnosed as this class — the true cause turned out to be the
oracle-type bug fixed in r8, an un-cast window sum() that DuckDB
widened to HUGEINT against a type-sensitive driver hash. The audit
below remains sound and did catch three real .xx5-exact money-sum
landmines; the two rules that actually hold are: (i) cast every
oracle aggregate — the driver hash is TYPE-sensitive; (ii) only
fixed-order IEEE expression trees are safe un-rounded — float
AGGREGATES never are, see tools/exact_compare.py.)
For each gate's oracle SQL it rewrites
the FINAL top-level projection, replacing each outermost `round(X, k)`
with the margin expression

    abs(abs((X) * 10^k) % 1.0 - 0.5)

(distance of the pre-rounded value to the nearest rounding half-boundary,
in grid units; 0.5 = dead center of a grid cell, 0 = exactly on the
boundary), runs it in DuckDB at several scale factors, and reports the
minimum margin per gate. Margins below ~1e-6 grid units are inside
plausible cross-engine / aggregation-order noise and must be made
order-invariant (integer-scaled sums, as trip_segments now does).

Usage: python tools/margin_probe.py [--json out.json] [--sf-dirs d1,d2,...]
       [name_filter ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mobilitydatalakebenchmark_spark.plans import load_registry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

THRESHOLD = 1e-6  # grid units; below this a cell can flip across engines

# Gates whose pre-rounded value is ORDER-INVARIANT by construction: a tiny
# (even zero) margin cannot flip, because both engines round the exact same
# value and decimal/exact-half ties resolve identically (Java HALF_UP ==
# DuckDB half-away-from-zero for either sign). Audited by hand; still
# reported, but they do not fail the exit code.
INVARIANT_SAFE = {
    "flagship_pricing_summary": (
        "money summed as exact integer units (cents/1e-4/1e-6); the "
        "rounded values derive from exact sums via single IEEE divisions"
    ),
    "tpch_q9_style_nation_profit": (
        "decimal(18,6) exact sum rounded in decimal space before the "
        "double cast"
    ),
    "dedup_minhash_verified": (
        "jaccard is a single division of two exact integers — "
        "order-invariant; an exact-half double rounds identically in both "
        "engines"
    ),
    "text_lang_distribution": (
        "avg of integer n_chars: every partial sum is an exact integer "
        "< 2^53 in double, so the quotient is order-invariant"
    ),
    "trajectory_trip_segments": (
        "distance summed as integer centimeters, elapsed as integer "
        "seconds; the rounded quotient is derived from exact sums"
    ),
    "source_overlap_matrix": (
        "jaccard is a single division of two exact integers "
        "(n_shared / (n_a + n_b - n_shared)) — order-invariant; an "
        "exact-half double rounds identically in both engines"
    ),
    "text_readability_flesch": (
        "score = ONE correctly-rounded IEEE division of two exact "
        "BIGINTs ((206835·s·w − 1015·w² − 84600·syl·s) / (1000·s·w)) — "
        "both engines produce the bit-identical double, so the small "
        "integer ratios that land exactly on 4dp half-boundaries round "
        "identically (Java HALF_UP == DuckDB half-away-from-zero)"
    ),
}


def _depth0_positions(sql: str, token: str) -> list[int]:
    """Offsets of word-boundary `token` at paren depth 0 (case-insens)."""
    out, depth, i, n = [], 0, 0, len(sql)
    tok, tl = token.lower(), len(token)
    low = sql.lower()
    while i < n:
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and low.startswith(tok, i):
            before_ok = i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_")
            j = i + tl
            after_ok = j >= n or not (low[j].isalnum() or low[j] == "_")
            if before_ok and after_ok:
                out.append(i)
                i = j
                continue
        i += 1
    return out


def _match_paren(sql: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx."""
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced parens")


def _split_top_commas(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append("".join(cur))
    return parts


def transform_final_rounds(sql: str) -> tuple[str, list[str]]:
    """Rewrite the final top-level SELECT's outermost round() calls into
    margin expressions. Returns (new_sql, margin_column_aliases); empty
    alias list means the final projection rounds nothing (the gate is
    skipped and listed as such)."""
    selects = _depth0_positions(sql, "SELECT")
    if not selects:
        return sql, []
    start = selects[-1]
    froms = [p for p in _depth0_positions(sql, "FROM") if p > start]
    end = froms[0] if froms else len(sql)

    aliases: list[str] = []
    out = sql[:start]
    seg = sql[start:end]
    tail = sql[end:]
    low = seg.lower()

    def _item_end(pos: int) -> int:
        """End of the projection item containing `pos`: the next
        depth-0 comma (depth measured from the segment start) or the
        segment end."""
        depth = seg.count("(", 0, pos) - seg.count(")", 0, pos)
        for j in range(pos, len(seg)):
            c = seg[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                return j
        return len(seg)

    i, built = 0, []
    while i < len(seg):
        m = re.compile(r"\bround\s*\(").match(low, i)
        if not m:
            built.append(seg[i])
            i += 1
            continue
        open_idx = seg.index("(", m.start())
        close_idx = _match_paren(seg, open_idx)
        args = _split_top_commas(seg[open_idx + 1 : close_idx])
        expr = args[0].strip()
        k = int(args[1].strip()) if len(args) > 1 else 0
        repl = f"abs(abs(({expr}) * 1e{k}) % 1.0 - 0.5)"
        # the margin column's name is the TRAILING alias of the whole
        # projection item (a `cast(round(..) AS TYPE)` has an inner
        # `AS TYPE` that is a type, not an alias); invent one when the
        # item is a bare round call with no alias
        end_i = _item_end(close_idx)
        am = re.search(r"\bas\s+(\w+)\s*$", low[close_idx + 1 : end_i])
        if am:
            alias = seg[close_idx + 1 + am.start(1) : close_idx + 1 + am.end(1)]
            built.append(repl)
        elif seg[close_idx + 1 : end_i].strip() == "":
            alias = f"__margin_{len(aliases)}"
            built.append(f"{repl} AS {alias}")
        else:
            # round embedded in a larger unaliased expression — measured
            # under whatever name the engine assigns; track by position
            alias = f"__untracked_{len(aliases)}"
            built.append(repl)
        i = close_idx + 1
        aliases.append(alias)
    return out + "".join(built) + tail, aliases


def main() -> None:
    argv = list(sys.argv[1:])
    json_out = None
    sf_dirs = DEFAULT_SF_DIRS
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    if "--sf-dirs" in argv:
        i = argv.index("--sf-dirs")
        sf_dirs = argv[i + 1].split(",")
        del argv[i : i + 2]
    name_filter = argv

    registry = load_registry()
    report: dict[str, dict] = {}
    worst: list[tuple[float, str, str, str]] = []
    skipped_no_rounds: list[str] = []
    errors: list[str] = []

    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name, q in sorted(registry.items()):
            if name_filter and not any(f in name for f in name_filter):
                continue
            if q.oracle is None:
                continue
            try:
                new_sql, aliases = transform_final_rounds(q.oracle)
            except Exception as exc:  # noqa: BLE001
                errors.append(f"{name}: transform: {exc}")
                continue
            if not aliases:
                if sf_dir == sf_dirs[0]:
                    skipped_no_rounds.append(name)
                continue
            try:
                res = con.execute(new_sql)
                cols = [d[0] for d in res.description]
                rows = res.fetchall()
            except Exception as exc:  # noqa: BLE001
                errors.append(f"{name}@{sf_dir}: run: {str(exc)[:160]}")
                continue
            idx = [cols.index(a) for a in aliases if a in cols]
            gate = report.setdefault(name, {"min_margin": None, "argmin": None})
            for r in rows:
                for j in idx:
                    v = r[j]
                    if v is None or not isinstance(v, float):
                        continue
                    if gate["min_margin"] is None or v < gate["min_margin"]:
                        gate["min_margin"] = v
                        gate["argmin"] = f"{cols[j]}@{os.path.basename(sf_dir)}"
        con.close()

    for name, g in report.items():
        if g["min_margin"] is not None:
            worst.append((g["min_margin"], name, g["argmin"], ""))
    worst.sort()

    # count fragile gates over the FULL list (a >25-fragile audit must
    # not understate); slice only for printing
    n_bad = sum(
        1
        for margin, name, _, _ in worst
        if margin < THRESHOLD and name not in INVARIANT_SAFE
    )
    print(f"-- margin audit over {len(report)} gates, {len(sf_dirs)} SFs --")
    for margin, name, argmin, _ in worst[:25]:
        if margin < THRESHOLD and name in INVARIANT_SAFE:
            flag = "  (exempt: order-invariant by construction)"
        elif margin < THRESHOLD:
            flag = "  <-- FRAGILE"
        else:
            flag = ""
        print(f"{margin:.3e}  {name}  ({argmin}){flag}")
    if skipped_no_rounds:
        print(f"{len(skipped_no_rounds)} gates round nothing in the final "
              f"projection (skipped): {', '.join(skipped_no_rounds[:10])}"
              + (" ..." if len(skipped_no_rounds) > 10 else ""))
    for e in errors:
        print(f"ERROR {e}")
    print(f"\n{n_bad} gate(s) below threshold {THRESHOLD:g}")

    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "threshold": THRESHOLD,
                    "sf_dirs": sf_dirs,
                    "gates": {
                        n: {**g, **(
                            {"exempt": INVARIANT_SAFE[n]}
                            if n in INVARIANT_SAFE
                            else {}
                        )}
                        for n, g in sorted(report.items())
                    },
                    "no_final_rounds": skipped_no_rounds,
                    "errors": errors,
                    "n_fragile": n_bad,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}")
    if n_bad or errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
