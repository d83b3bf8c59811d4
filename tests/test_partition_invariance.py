"""Partition-count invariance: results must be BIT-IDENTICAL under
different `spark.sql.shuffle.partitions` settings. This is the
determinism property the decimal/integer arithmetic rules exist for —
a float accumulation ordered differently across 2 vs 32 reducers must
never change a rounded digit (the q15 hazard), and rank/tie-break
rules must not depend on physical row order. Representative queries
from each family where the hazard is real."""

from __future__ import annotations

import pytest

from euclid_spark import registry
from euclid_spark.cache import release_all
from tests.conftest import SF_SMOKE

CASES = [
    "tpch_q15_top_supplier",       # decimal-exact argmax at a rounding edge
    "tpch_q1_pricing_summary",     # float aggs rounded
    "euclid_storage_digest",       # mod-prime commutative digest
    "dedup_minhash_lsh",           # min-aggregate signatures + bucket join
    "text_bm25_topk",              # rounded-score top-k tiebreak
    "graph_doc_pagerank",          # integer fixed-point iteration
    "rel_unpivot_measures",        # decimal rollup
    "rel_skew_salted_agg",         # salted partials re-folded (decimal, r7)
    "rel_hdr_quantile_sketch",     # integer buckets + window cum (r7)
    "euclid_range_tree_agg",       # tile cover + decimal/digest folds (r7)
    "euclid_erc20_batch_responses",  # u256 limb folds + sha2 paths (r7)
    "rel_linear_count_distinct",   # bit_or bitmap + libm-ln estimate (r7)
    "rel_time_weighted_avg",       # decimal v·Δt accumulation (r7)
    "rel_event_dedup_window",      # lag window tie-break on (ts, id) (r7)
    "rel_ohlc_resample",           # first/last selections by total order (r7)
    "rel_value_outliers",          # decimal sums -> shared double seq (r7)
    "euclid_q2_range_tree_topL",   # min-L lattice merges via collect_list (r8)
    "euclid_verify_response",      # sha2 path refolds + binding compare (r8)
    "rel_table_profile",           # stacked distincts + LC bitmap branch (r8)
    "sim_range_search",            # rounded-cosine threshold set (r8)
    "euclid_erc20_range_tree_reward",  # u256 limb tiles + carry at read (r8)
    "rel_data_drift_psi",          # rounded-ln decimal term sums (r13)
    "curation_epoch_shards",       # two-level prefix sum + checksums (r13)
    "mm_feature_census",           # decimal feature means off artifact (r13)
    "rel_data_drift_psi_quantile", # HDR-bucket edges + decimal terms (r14)
    "curation_shard_roundtrip",    # layout write + checksum matches (r14)
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_partitioning(spark, name, tmp_path, monkeypatch):
    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    qs = registry.queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("2", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(_rows(qs[name](spark, SF_SMOKE)))
            release_all()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1], f"{name} varies with partition count"
