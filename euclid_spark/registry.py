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
    quantile_sketch,
    range_response,
    range_tree,
    relational,
    similarity,
    textops,
    timeseries,
)

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
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update({k: _with_session_confs(v) for k, v in m.QUERIES.items()})
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
