"""Per-query overhead profile for the headline bench (guide §1).

For each headline query, on a warm session, split the wall into:
  construct — time for queries()[name](spark, sf_dir) to RETURN a
              DataFrame (Python-side plan building, artifact loads,
              any bounded collect() round trips the builder performs);
  plan      — time to force analysis + optimization + physical
              planning of the returned frame (no stage execution);
  exec      — the noop-sink write of the planned frame;
  jobs      — Spark job count issued during construct+exec (each job
              is a scheduling round trip; AQE materializes one job
              per shuffle stage).

Warm protocol: each query runs twice, the SECOND run is recorded
(codegen cached, page cache warm) — matching bench.py's warm-min2
intent with half the reps since this is a diagnostic, not a record.

Usage: python tools/profile_overhead.py [sf_dir] [out_json] [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from euclid_spark import registry
from euclid_spark.cache import release_all
from euclid_spark.session import get_session


def profile_one(spark, qs, name: str, sf_dir: str) -> dict:
    tracker = spark.sparkContext.statusTracker()
    j0 = tracker.getJobIdsForGroup(None)
    n0 = len(j0) if j0 else 0

    t0 = time.perf_counter()
    df = qs[name](sf_dir=sf_dir, spark=spark)
    t1 = time.perf_counter()
    # force analysis+optimization+physical planning without executing
    df._jdf.queryExecution().executedPlan()
    t2 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()

    j1 = tracker.getJobIdsForGroup(None)
    n1 = len(j1) if j1 else 0
    release_all()
    return {
        "construct": round(t1 - t0, 3),
        "plan": round(t2 - t1, 3),
        "exec": round(t3 - t2, 3),
        "total": round(t3 - t0, 3),
        "jobs": n1 - n0,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_overhead.json"
    only = sys.argv[3:]
    names = only if only else HEADLINE

    spark = get_session("profile_overhead")
    qs = registry.queries()
    # session warmup (same as bench.py)
    qs["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001").count()
    qs["euclid_erc20_weighted_sum_u256"](spark, "/root/testdata/sf0.001").count()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        profile_one(spark, qs, name, sf_dir)  # warmup rep
        out[name] = profile_one(spark, qs, name, sf_dir)  # recorded rep
        print(
            f"{name:45s} total={out[name]['total']:6.2f} "
            f"construct={out[name]['construct']:6.2f} "
            f"plan={out[name]['plan']:5.2f} exec={out[name]['exec']:6.2f} "
            f"jobs={out[name]['jobs']}",
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    tot = {
        k: round(sum(v[k] for v in out.values()), 2)
        for k in ("construct", "plan", "exec", "total")
    }
    tot["jobs"] = sum(v["jobs"] for v in out.values())
    print("TOTALS:", json.dumps(tot))


if __name__ == "__main__":
    main()
