"""Small-file compaction (SURVEY.md §2.D14).

Streaming/incremental ingest (the block-DB append path) leaves a long
tail of small parquet files — the classic 100 TB operational failure:
scan parallelism degrades into per-file task overhead, and the NameNode/
object-store listing cost grows unbounded. Compaction rewrites a
directory into ~target-sized files, preserving rows exactly.

Spark-first shape: one distributed read → `repartition(n)` →
rename swap. `n` comes from the actual byte size on disk, not a
guess; `repartition` (round-robin) gives evenly-sized output files,
unlike `coalesce` which merges adjacent partitions unevenly and can
starve parallelism upstream of the write.

Swap semantics (two renames, NOT one atomic operation): readers never
observe a HALF-compacted directory — each rename is atomic, so they see
either the old files or the new — but between the two renames there is a
brief window where `path` does not exist, and a crash inside it leaves
the data only under the randomized `.old-*` / `.compact-*` names
(recovery: rename whichever survives back to `path`). Single-writer
maintenance jobs tolerate this; for concurrent readers swap via a
symlink or manifest/metastore pointer flip instead — on object stores
that is the only option anyway, and the Spark plan is identical."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # HDFS-block-ish output files


def dir_parquet_stats(path: str) -> "tuple[int, int]":
    """(n_files, total_bytes) of the parquet files under `path`."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> "tuple[int, int]":
    """Rewrite `path` into ⌈total_bytes / target⌉ files. Returns
    (files_before, files_after). Row-preserving by construction — the
    caller's tests compare counts/digests before and after."""
    n_before, total = dir_parquet_stats(path)
    n_out = max(1, -(-total // target_file_bytes))
    if n_before <= n_out:
        return n_before, n_before  # already compact — don't churn bytes
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).repartition(n_out).write.mode("overwrite").parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after, _ = dir_parquet_stats(path)
    return n_before, n_after
