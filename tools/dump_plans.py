"""Dump `.explain("formatted")` for named keys into plans/<tag>/.

Usage: python tools/dump_plans.py TAGDIR SUFFIX KEY [KEY ...]

e.g. `python tools/dump_plans.py plans/r12 before x_power_iteration`
writes plans/r12/x_power_iteration_before.txt. Builds each DataFrame at
sf0.001 (plan shape is scale-invariant; streaming keys execute their
micro-batch loop at build time, so the cheapest fixture keeps this
fast) on the engine session, same as tools/plan_audit.py.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from googleanalytics_etl_spark import get_spark  # noqa: E402
from googleanalytics_etl_spark.registry import queries  # noqa: E402

from tools.plan_audit import formatted_plan  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    tagdir, suffix, *keys = sys.argv[1:]
    out = Path(tagdir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    q = queries()
    for key in keys:
        df = q[key](spark, SF_DIR)
        path = out / f"{key}_{suffix}.txt"
        path.write_text(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
