"""Interleaved A/B bench between two checkouts (bench hygiene, r12
method, now committed as a tool): runs each tree's bench.py as a
subprocess in mirrored alternation (A B B A A B ...), takes the
per-query min over all reps of all runs per tree, and writes a
BENCH_AB-style JSON. Mirrored alternation cancels slow box drift; the
per-query min cancels one-off load spikes.

Usage:
  python tools/bench_ab.py <tree_a> <tree_b> <out.json> [passes]

Each pass runs each tree once; pass ordering alternates (A-first on
even passes, B-first on odd). Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
forwarded unchanged.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_bench(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True,
        text=True,
        cwd=tree,
        check=True,
    ).stdout
    lines = [l for l in out.splitlines() if l.strip().startswith("{")]
    detail = json.loads(lines[0])
    assert detail["metric"] == "headline_queries_detail"
    summary = json.loads(lines[-1])
    reps = detail.get("queries_reps") or {
        k: [v] for k, v in detail["queries"].items()
    }
    return {"reps": reps, "spread": summary["noise_probe"]["spread_pct"]}


def main() -> None:
    tree_a, tree_b, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    runs: dict[str, list[dict]] = {"a": [], "b": []}
    order_log = []
    for p in range(passes):
        order = [("a", tree_a), ("b", tree_b)]
        if p % 2:
            order.reverse()
        for label, tree in order:
            print(f"pass {p}: running {label} ({tree})", flush=True)
            r = run_bench(tree)
            runs[label].append(r)
            order_log.append(f"{label}(spread={r['spread']})")
            print(f"  done, probe spread {r['spread']}%", flush=True)
    mins: dict[str, dict[str, float]] = {}
    for label in ("a", "b"):
        per: dict[str, float] = {}
        for r in runs[label]:
            for q, reps in r["reps"].items():
                per[q] = min(per.get(q, 1e9), *reps)
        mins[label] = per
    shared = sorted(set(mins["a"]) & set(mins["b"]))
    sum_a = round(sum(mins["a"][q] for q in shared), 2)
    sum_b = round(sum(mins["b"][q] for q in shared), 2)
    movers = sorted(
        shared, key=lambda q: mins["b"][q] / max(mins["a"][q], 1e-9)
    )
    result = {
        "method": (
            f"mirrored interleaved subprocess bench runs ({passes} passes), "
            "per-query min over all reps of all runs; tree_a="
            + tree_a
            + " tree_b="
            + tree_b
        ),
        "order": order_log,
        "shared_queries": len(shared),
        "a_sum_of_min": sum_a,
        "b_sum_of_min": sum_b,
        "b_over_a": round(sum_b / sum_a, 3) if sum_a else None,
        "per_query": {
            q: {
                "a": round(mins["a"][q], 3),
                "b": round(mins["b"][q], 3),
                "ratio": round(mins["b"][q] / max(mins["a"][q], 1e-9), 3),
            }
            for q in shared
        },
        "largest_movers_both_directions": {
            q: {
                "a": round(mins["a"][q], 3),
                "b": round(mins["b"][q], 3),
                "ratio": round(mins["b"][q] / max(mins["a"][q], 1e-9), 3),
            }
            for q in movers[:5] + movers[-5:]
        },
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "per_query"}, indent=1))


if __name__ == "__main__":
    main()
