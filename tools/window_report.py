"""Driver-window introspection + rotation helper.

Prints the current FIRST-50 registry window with each gate's freshest
driver verdict block, and — given a CORRECTNESS_r{N}.json — the exact
graduation tuple to paste into plans/__init__.py as
DRIVER_VERIFIED_R{N} (hash-matched window gates only), plus the red
rows that must stay in the next window for a post-fix verdict. Removes
the transcription step that rotation mistakes come from.

Also prints a per-gate WALL ESTIMATE (secs from the newest ORACLE_r*.json
that has the gate, sf0.01 runs) and the window total — the r8 lesson:
write-path gates cost 4-30 s each at the driver, so the window wall must
be watched as they rotate in (keep it under ~90 s, max 2-3 write gates).

Usage:
    python tools/window_report.py                     # window + blocks
    python tools/window_report.py CORRECTNESS_r08.json 8   # + graduation
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mobilitydatalakebenchmark_spark import plans
from mobilitydatalakebenchmark_spark.plans import load_registry


def _wall_estimates() -> dict[str, float]:
    """Per-gate secs from the newest ORACLE_r*.json sweeps (newest file
    wins per gate; sf0.01 — the driver's correctness SF)."""
    import glob

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    secs: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(here, "ORACLE_r[0-9]*.json"))):
        if "sf0.1" in os.path.basename(path):
            continue
        try:
            with open(path) as fh:
                art = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in (art.get("gates") or {}).items():
            if isinstance(row, dict) and isinstance(row.get("secs"), (int, float)):
                secs[name] = float(row["secs"])
    return secs


def main() -> None:
    reg = load_registry()
    window = list(reg)[:50]
    blocks = {
        name: f"r{n}"
        for n, block in (
            (4, plans.DRIVER_VERIFIED_R4),
            (5, plans.DRIVER_VERIFIED_R5),
            (6, plans.DRIVER_VERIFIED_R6),
            (7, plans.DRIVER_VERIFIED_R7),
            (8, plans.DRIVER_VERIFIED_R8),
            (9, plans.DRIVER_VERIFIED_R9),
            (10, plans.DRIVER_VERIFIED_R10),
        )
        for name in block
    }
    secs = _wall_estimates()
    total = 0.0
    n_unknown = 0
    print(f"-- driver window ({len(window)} of {len(reg)} gates) --")
    for i, name in enumerate(window, 1):
        s = secs.get(name)
        if s is None:
            n_unknown += 1
            est = "   ?  "
        else:
            total += s
            est = f"{s:5.1f}s"
        print(f"{i:2d}  {est}  {name}  [{blocks.get(name, 'needs verdict')}]")
    note = f" (+{n_unknown} gates with no ORACLE secs yet)" if n_unknown else ""
    print(f"-- est. window wall at sf0.01: {total:.1f}s{note}; "
          f"keep under ~90s --")

    if len(sys.argv) >= 2:
        path = sys.argv[1]
        rnd = sys.argv[2] if len(sys.argv) > 2 else "N"
        with open(path) as fh:
            corr = json.load(fh)
        green = [n for n in window if corr.get(n, {}).get("hash_match")]
        red = [n for n in corr if n in window and not corr[n].get("hash_match")]
        missing = [n for n in window if n not in corr]
        body = ", ".join(f'"{n}"' for n in green)
        print(f"\n-- graduation from {path}: {len(green)} green, "
              f"{len(red)} red, {len(missing)} not in artifact --")
        print(f"DRIVER_VERIFIED_R{rnd} = (")
        print(textwrap.fill(body, width=72, initial_indent="    ",
                            subsequent_indent="    "))
        print(")")
        if red:
            print(f"\nred rows (keep in next window, fix first): {red}")
        if missing:
            print(f"window gates absent from the artifact: {missing}")


if __name__ == "__main__":
    main()
