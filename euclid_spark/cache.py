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
# (scala SparkContext, rdd id) pairs created by local_checkpoint_tracked
_CKPT_IDS: list[tuple[object, int]] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist `df` and register it for later release_all()."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def _persistent_ids(jsc) -> set[int]:
    ids = set()
    it = jsc.getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def local_checkpoint_tracked(df: DataFrame) -> DataFrame:
    """`df.localCheckpoint(eager=True)` with deterministic release.

    A local checkpoint persists its RDD outside the DataFrame cache
    manager; nothing unpersists it until JVM GC + ContextCleaner get
    around to it, so iterative operators (components, merkle levels,
    trie walks) would strand one persisted RDD per round for the life
    of a long session. Record the RDD ids the checkpoint creates (the
    driver is single-threaded through an operator build, so the
    before/after diff is exactly this checkpoint) and unpersist them in
    release_all()."""
    jsc = df.sparkSession.sparkContext._jsc.sc()
    before = _persistent_ids(jsc)
    out = df.localCheckpoint(eager=True)
    for rid in _persistent_ids(jsc) - before:
        _CKPT_IDS.append((jsc, rid))
    return out


def release_checkpoints() -> None:
    """Unpersist every tracked local-checkpoint RDD (newest first)."""
    while _CKPT_IDS:
        jsc, rid = _CKPT_IDS.pop()
        try:
            opt = jsc.getPersistentRDDs().get(rid)
            if opt.isDefined():
                opt.get().unpersist(False)
        except Exception:  # session already stopped — nothing to release
            pass


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
    release_checkpoints()


def n_tracked() -> int:
    return len(_TRACKED)
