"""10× worst-case scale probe (SURVEY.md §6): replicate the sf0.1
documents table 10× with offset doc_ids — 10 exact copies of EVERY
document, the heaviest duplicate load the bucketed joins can see — and
time a set of linear-design operators at 1× and 10×.

What "passes": wall time growing ≈ linearly (≤ ~10×, typically much
less on 32 cores absorbing parallel slack) and no skew-cap blowup. A
quadratic shape announces itself unmistakably (100× pair volume).

Usage: python tools/scale_probe.py [op ...]   (default: the linear set)
  --events        also replicate events (offset event_ids; block axis)
  --accounts      replicate events with offset USER ids too — the
                  account axis: |accounts| grows ×replicas while
                  per-account storage stays constant. This is the
                  dimension the eth_getProof capture's state trie
                  folds over (events-only scaling leaves it constant).
  --replicas N    replication factor (default 10)
  --mutate        make document replicas DISTINCT texts (append a
                  per-replica tag) instead of exact copies: exact
                  copies keep per-word caches hot (BPE) and dedup
                  indexes degenerate, so --mutate is the axis for
                  tokenizer/linguistic per-doc cost, plain replication
                  for worst-case duplicate load.
Writes one JSON line; temp corpus lives under /tmp and is removed.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from euclid_spark import registry
from euclid_spark.cache import release_all
from euclid_spark.session import get_session

SF = "/root/testdata/sf0.1"
REPLICAS = 10  # override with --replicas N (e.g. 100 for two-decade probes)
DEFAULT_OPS = [
    "text_bm25_topk",
    "text_rag_chunks",
    "text_data_card",
    "dedup_substring_spans",
    "dedup_minhash_lsh",
    "graph_doc_pagerank",
]
# --accounts default set: the faces whose cost scales with |accounts|.
# Cold = capture (trie build → artifact) + verify; warm = verify only.
ACCOUNT_OPS = [
    "euclid_eth_proof_verify",
    "stream_eth_account_state",
]


def build_10x(
    spark,
    out_dir: str,
    scale_events: bool = False,
    scale_accounts: bool = False,
    replicas: int = REPLICAS,
    mutate_docs: bool = False,
) -> None:
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    text_col = (
        F.concat(F.col("text"), F.lit(" zrep"), F.col("rep").cast("string"))
        if mutate_docs
        else F.col("text")
    )
    big = docs.join(reps).select(
        (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
        *[
            text_col.alias("text") if c == "text" else F.col(c)
            for c in docs.columns
            if c != "doc_id"
        ],
    )
    big.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    shared = (
        "region nation customer supplier part orders lineitem embeddings"
    ).split()
    if scale_events or scale_accounts:
        # --events: replicate the block dimension (offset event_ids) —
        # the probe for block-range structures: the range-tree query
        # must stay FLAT (cost ∝ log(range)) while the corpus grows 10×.
        # --accounts: ALSO offset user_ids, so the replicas are new
        # accounts instead of extra history on the same accounts — the
        # axis the eth_getProof capture's state-trie fold scales with.
        ev = spark.read.parquet(f"{SF}/events.parquet")
        m = ev.agg(F.max("event_id")).collect()[0][0] + 1
        cols = [(F.col("event_id") + F.col("rep") * m).alias("event_id")]
        rest = [c for c in ev.columns if c != "event_id"]
        if scale_accounts:
            u = ev.agg(F.max("user_id")).collect()[0][0] + 1
            cols.append(
                (F.col("user_id") + F.col("rep") * u).alias("user_id")
            )
            rest = [c for c in rest if c != "user_id"]
        bige = ev.join(reps).select(*cols, *rest)
        bige.write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet")
        )
    else:
        shared.append("events")
    for t in shared:
        os.symlink(f"{SF}/{t}.parquet", os.path.join(out_dir, f"{t}.parquet"))


def _time(qs, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    qs[name](sf_dir=sf_dir, spark=_time.spark).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - t0
    release_all()
    return round(dt, 2)


def main() -> None:
    args = sys.argv[1:]
    scale_events = "--events" in args
    scale_accounts = "--accounts" in args
    mutate_docs = "--mutate" in args
    args = [a for a in args if a not in ("--events", "--accounts", "--mutate")]
    replicas = REPLICAS
    if "--replicas" in args:
        i = args.index("--replicas")
        replicas = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    ops = args or (ACCOUNT_OPS if scale_accounts else DEFAULT_OPS)
    spark = get_session("scale_probe")
    _time.spark = spark
    qs = registry.queries()

    tmp = tempfile.mkdtemp(prefix="euclid_10x_")
    # keep 10× artifacts out of the repo store: they key on the temp
    # corpus and would be one-shot garbage there
    os.environ["EUCLID_SPARK_ARTIFACTS"] = os.path.join(tmp, "_arts")
    try:
        build_10x(
            spark,
            tmp,
            scale_events=scale_events,
            scale_accounts=scale_accounts,
            replicas=replicas,
            mutate_docs=mutate_docs,
        )
        axis = "accounts" if scale_accounts else (
            "events" if scale_events else "documents"
        )
        out = {"sf": "0.1", "replicas": replicas, "axis": axis,
               "mutate": mutate_docs, "ops": {}}
        for name in ops:
            one_cold = _time(qs, name, SF)
            one_warm = _time(qs, name, SF)
            ten_cold = _time(qs, name, tmp)
            ten_warm = _time(qs, name, tmp)
            out["ops"][name] = {
                "x1_cold": one_cold,
                "x1_warm": one_warm,
                f"x{replicas}_cold": ten_cold,
                f"x{replicas}_warm": ten_warm,
                "cold_ratio": round(ten_cold / max(one_cold, 1e-9), 1),
            }
            print(f"# {name}: 1x {one_cold}/{one_warm}s "
                  f"{replicas}x {ten_cold}/{ten_warm}s", file=sys.stderr)
        # peak DRIVER memory across the whole probe — the number that
        # catches an |accounts|-sized driver fold the wall-clock ratios
        # might forgive. Python side via ru_maxrss (KiB on linux); the
        # JVM driver is a child process, so read its VmHWM from /proc.
        import resource

        out["driver_py_peak_rss_mb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        )
        try:
            jvm_pid = spark.sparkContext._gateway.proc.pid
            with open(f"/proc/{jvm_pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmHWM:"):
                        out["driver_jvm_peak_rss_mb"] = round(
                            int(line.split()[1]) / 1024, 1
                        )
                        break
        except Exception:
            pass
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
