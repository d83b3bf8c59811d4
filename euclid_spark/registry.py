"""Central registry: merges every operator module's QUERIES / ORACLES.

`__spark_entry__.py` (the driver contract) is a thin shim over this.
Every key in SURVEY.md §2 appears here once its module lands.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from euclid_spark.operators import euclid

_MODULES = [euclid]

try:  # modules land incrementally; keep the registry importable throughout
    from euclid_spark.operators import relational

    _MODULES.append(relational)
except ImportError:  # pragma: no cover
    pass
try:
    from euclid_spark.operators import dedup

    _MODULES.append(dedup)
except ImportError:  # pragma: no cover
    pass
try:
    from euclid_spark.operators import similarity

    _MODULES.append(similarity)
except ImportError:  # pragma: no cover
    pass
try:
    from euclid_spark.operators import textops

    _MODULES.append(textops)
except ImportError:  # pragma: no cover
    pass
try:
    from euclid_spark.operators import multimodal

    _MODULES.append(multimodal)
except ImportError:  # pragma: no cover
    pass


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
