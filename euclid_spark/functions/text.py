"""Text column expressions: normalization, tokenization, shingling,
MinHash terms — all built-in `F.*` compositions (codegen-friendly).

Cross-engine contract: every expression here has an exact DuckDB
equivalent used in the oracle SQL (md5 hex strings compare identically;
lexicographic MIN over hex == numeric MIN over the underlying value).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(col: Column | str) -> Column:
    """lower + collapse whitespace + trim; the dedup canonical form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def words(col: Column | str) -> Column:
    """Split normalized text on single spaces."""
    return F.split(normalized_text(col), " ")


def shingles(ws: Column, k: int = 3) -> Column:
    """k-word shingles as an array<string> (empty if fewer than k words).

    `ws` must be a *materialized* words array column (a projected
    `words(...)` output), NOT the inline expression: array indexing
    re-evaluates its child per access, so an inlined split/regex would run
    k× per shingle — staging the array first is >10× faster.

    Spark arrays are 0-indexed; the DuckDB oracle mirror uses 1-indexed
    list access — both produce words[i]..words[i+k-1] joined by spaces.
    """
    n = F.size(ws)
    idx = F.sequence(F.lit(0), n - F.lit(k))  # inclusive end
    make = lambda i: F.concat_ws(" ", *[F.get(ws, i + F.lit(j)) for j in range(k)])  # noqa: E731
    return F.when(n >= k, F.transform(idx, make)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_hex(shingle: Column, seed: Column) -> Column:
    """MinHash hash value for one (seed, shingle): first 16 hex chars of
    md5(seed || '|' || shingle). Compared lexicographically (hex), so MIN
    aggregation is engine-agnostic."""
    return F.substring(F.md5(F.concat(seed.cast("string"), F.lit("|"), shingle)), 1, 16)
