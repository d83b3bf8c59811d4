"""Vector math over array<float> columns — pure higher-order functions.

All JVM-side (`zip_with` + `aggregate`): no Python UDF, no Arrow transfer,
stays inside whole-stage codegen. Elements are cast to double before
accumulation so results match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, 0-guarded like the reference guards division
    (query_erc20/storage/leaf.rs:93 ensures no div-by-zero in-circuit)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)
