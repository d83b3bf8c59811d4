"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query executes its full physical plan into the noop sink (no driver
collect — we measure the engine, not row transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from euclid_spark import registry
from euclid_spark.session import get_session

HEADLINE = [
    "euclid_q2_distinct_keys",
    "euclid_erc20_weighted_sum",
    "euclid_storage_digest",
    "euclid_state_rollup",
    "euclid_block_db_chain",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q18_large_volume",
    "rel_window_running_agg",
    "rel_sessionize",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_session("euclid_spark_bench")

    qs = registry.queries()
    # JVM/session warmup on the smallest SF so measurements exclude startup
    qs["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
