"""Dump `.explain("formatted")` for specific registry keys to files.

Usage: python tools/dump_key_plans.py <out_dir> <suffix> <key ...>

Writes <out_dir>/<key>_<suffix>.txt for each key — the round's
before/after plan evidence (plans/r15/). Plans are captured at sf0.01
like PLANS.md; `explain("formatted")` is the pre-execution physical
plan (AdaptiveSparkPlan isFinalPlan=false), which is the shape the
optimizer chose and the one code changes move.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from euclid_spark import registry
from euclid_spark.session import get_session

SF = "/root/testdata/sf0.01"


def main() -> None:
    out_dir, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("dump_key_plans")
    qs = registry.queries()
    for key in keys:
        df = qs[key](spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
