"""Driver-window introspection + rotation helper.

Prints the current FIRST-50 registry window with each gate's freshest
driver verdict block, and — given a CORRECTNESS_r{N}.json — the exact
graduation tuple to paste into plans/__init__.py as
DRIVER_VERIFIED_R{N} (hash-matched window gates only), plus the red
rows that must stay in the next window for a post-fix verdict. Removes
the transcription step that rotation mistakes come from.

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


def main() -> None:
    reg = load_registry()
    window = list(reg)[:50]
    blocks = {
        name: f"r{n}"
        for n, block in (
            (3, plans.DRIVER_VERIFIED_R3),
            (4, plans.DRIVER_VERIFIED_R4),
            (5, plans.DRIVER_VERIFIED_R5),
            (6, plans.DRIVER_VERIFIED_R6),
            (7, plans.DRIVER_VERIFIED_R7),
        )
        for name in block
    }
    print(f"-- driver window ({len(window)} of {len(reg)} gates) --")
    for i, name in enumerate(window, 1):
        print(f"{i:2d}  {name}  [{blocks.get(name, 'needs verdict')}]")

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
