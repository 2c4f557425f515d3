"""Capture .explain("formatted") output for named gates into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> <gate> [<gate> ...]
Writes plans/$PLANS_ROUND/<gate>_<suffix>.txt (default r13) for each gate
(sf0.01 inputs — plan shape only, never FULLY executed: building a
range-rank/grouped-rank gate runs its driver-side counts jobs and the
checkpoint materialization at DataFrame-construction time, and store
gates run their build writes, so capture is not side-effect free).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mobilitydatalakebenchmark_spark.plans import load_registry
from mobilitydatalakebenchmark_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    gates = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        here, "plans", os.environ.get("PLANS_ROUND", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)
    registry = load_registry()
    spark = get_spark("capture_plans", cpus=8)
    for name in gates:
        df = registry[name].spark(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
