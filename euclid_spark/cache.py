"""Session-wide cache lifecycle (ADVICE r1).

Operators persist intermediates that are read more than once inside one
query (LSH signature tables, shingle inverted indexes, per-round labels).
A bare `.persist()` with no owner leaks: repeated invocations from a
bench loop or a long test session accumulate cached partitions for the
session lifetime. Rule here: operators register every persist through
`persist_tracked`, and the *caller* that owns the terminal action
(bench.py per query, tests per test via an autouse fixture) calls
`release_all()` once the results are materialized.

Double-unpersist is harmless (Spark no-ops), so releasing a frame the
operator already unpersisted (per-round loop frames) is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist `df` and register it for later release_all()."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_all() -> None:
    """Unpersist every tracked frame (newest first). Call after the
    terminal action of a query, not before — unpersisting a lazy result's
    inputs early just forfeits the reuse the persist bought."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass


def n_tracked() -> int:
    return len(_TRACKED)
