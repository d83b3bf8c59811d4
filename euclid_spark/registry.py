"""Central registry: merges every operator module's QUERIES / ORACLES.

`__spark_entry__.py` (the driver contract) is a thin shim over this.
Every key in SURVEY.md §2 appears here once its module lands.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from euclid_spark.sources import bucketing, eth_proof, jsonl, partitioned, zorder
from euclid_spark.streaming import faces
from euclid_spark.operators import (
    cdc,
    cms_range,
    drift,
    components,
    contract_param,
    skew,
    curation,
    dedup,
    distinct_sketch,
    euclid,
    merkle,
    mpt_ingest,
    multimodal,
    preprocessing,
    quality_model,
    quantile_sketch,
    range_response,
    range_tree,
    relational,
    similarity,
    textops,
    timeseries,
)

# Newest faces first: the driver's per-round correctness gate compares the
# FIRST 50 registry keys against their DuckDB oracles, so the keys most in
# need of an independent gate (this round's and recent rounds' additions)
# must sit inside that window — not r1's long-proven euclid/tpch rows.
# Ordered newest → oldest by the round that introduced each key (r15 first);
# everything not listed follows in stable module order. A listed key that
# doesn't exist (yet) is skipped, so entries can be staged ahead of their
# module landing.
_NEWEST_FIRST = [
    # r15
    "text_quality_model",
    "text_quality_model_calibration",
    "stream_soft_dedup_weights",
    "curation_model_filtered_mix",
    "sim_matryoshka_recall_report",
    "stream_epoch_shards",
    # r14
    "sim_ivf_exact_fit_topk",
    "curation_shard_roundtrip",
    "text_safety_screen",
    "rel_data_drift_psi_quantile",
    # r13/r12
    "sim_ann_recall_report",
    "curation_epoch_shards",
    "curation_soft_dedup_weights",
    "rel_data_drift_psi",
    "src_jsonl_quarantine",
    "stream_jsonl_ingest",
    "stream_drift_psi",
    "text_tokenizer_fertility",
    "mm_audio_triage",
    "mm_feature_census",
    # r11/r10
    "euclid_eth_proof_verify",
    "euclid_verifiable_response_alt_contract",
    "stream_eth_account_state",
    # r9
    "euclid_q2_range_response",
    "euclid_erc20_range_response",
    "euclid_verify_q2_range_response",
    "euclid_verify_erc20_range_response",
    "euclid_q2_distinct_keys_alt_contract",
    "euclid_q2_range_tree_topL_alt_contract",
    "rel_events_profile",
    "stream_q2_cell_roots",
    "stream_erc20_cell_roots",
    # r8
    "euclid_q2_range_tree_topL",
    "euclid_erc20_range_tree_reward",
    "euclid_verify_response",
    "euclid_verify_erc20_response",
    "sim_range_search",
    "stream_q2_key_tiles",
    # r7 (fills the 50-key window)
    "euclid_range_tree_agg",
    "rel_hdr_quantile_sketch",
    "rel_hdr_range_quantiles",
    "rel_linear_count_distinct",
    "rel_lc_range_distinct",
    "rel_cms_range_topk",
    "rel_table_profile",
    "rel_gap_fill_locf",
    "rel_time_weighted_avg",
    "rel_ohlc_resample",
    "rel_event_dedup_window",
    "rel_value_outliers",
    "rel_seasonal_profile",
    "curation_leakage_safe_split",
    "dedup_provenance_report",
]

_MODULES = [
    euclid,
    relational,
    dedup,
    similarity,
    textops,
    multimodal,
    components,
    mpt_ingest,
    merkle,
    curation,
    preprocessing,
    skew,
    cdc,
    bucketing,
    partitioned,
    zorder,
    faces,
    range_tree,
    quantile_sketch,
    distinct_sketch,
    timeseries,
    cms_range,
    contract_param,   # } last: keep the driver's first-50 key prefix stable
    range_response,   # }
    eth_proof,        # }
    drift,            # }
    jsonl,            # }
    quality_model,    # r15 — gated via _NEWEST_FIRST
]

def _with_session_confs(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Pin the runtime confs results depend on, whatever session the
    caller built: UTC (date truncation and NTZ→TIMESTAMP casts must
    match the UTC-naive oracle)."""

    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # local-mode tuning only (results unaffected): a default 200
        # shuffle partitions over-parallelizes tiny local shuffles
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions", spark.sparkContext.defaultParallelism
            )
        return fn(spark, sf_dir)

    inner.__name__ = getattr(fn, "__name__", "query")
    inner.__doc__ = fn.__doc__
    return inner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        merged.update({k: _with_session_confs(v) for k, v in m.QUERIES.items()})
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        k: merged[k] for k in _NEWEST_FIRST if k in merged
    }
    out.update(merged)  # re-inserting an existing key keeps its position
    return out


def oracles(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Static ORACLES plus each module's DYNAMIC_ORACLES — generators
    called with the corpus dir at lookup time. Dynamic oracles exist for
    queries whose oracle takes a SERVED MODEL ARTIFACT as an input table
    (read_parquet of the fitted k-means centroids): the artifact path is
    corpus-fingerprint-keyed, so the SQL string depends on sf_dir. The
    default is the driver's correctness-gate corpus. A generator that
    raises (e.g. corpus missing) degrades that key to the rows-only
    check instead of failing the whole lookup."""
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
        for k, gen in getattr(m, "DYNAMIC_ORACLES", {}).items():
            try:
                out[k] = gen(sf_dir)
            except Exception:  # noqa: BLE001 — degrade to rows-only
                out.pop(k, None)
    return out
