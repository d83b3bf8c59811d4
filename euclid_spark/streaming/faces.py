"""Registry faces for the streaming twins (SURVEY.md §2.D25 / r6).

The incremental structures (D15-D24) were until now verified only by
pytest: the driver's DuckDB gate runs `queries()` entries, and a
streaming sink is not a DataFrame expression. These faces close that
gap: each one REALLY RUNS the Structured Streaming sink — the input
table split into adversarial micro-batches (hash-split, NOT
time-ordered, so late/out-of-order data exercises the merge), a real
file-source stream with `maxFilesPerTrigger=1`, a real checkpoint —
and returns the FINAL MAINTAINED STATE as a DataFrame. Because every
maintained structure is designed so that incremental == batch (the
IVC property of the reference's block DB, mr-plonky2-circuits/src/
block/mod.rs: proof_{n+1} = step(proof_n, block_{n+1}) must equal the
from-scratch proof), the batch SQL is a valid oracle for the streamed
result — the driver's gate now checks the streaming engine itself.

Faces:

- `stream_ivm_view`       — D19 maintained (user, day) count/sum/digest
                            view.  Oracle: the plain GROUP BY.  Sums are
                            DECIMAL so partial-merge order cannot drift
                            a float at a rounding boundary.
- `stream_state_rollup`   — D19 with the A7 argmax-by-event-id monoid
                            (the reference's account-state DB).
                            Oracle: A7's max_by SQL.
- `stream_block_db_chain` — D5's IncrementalDigest chain commitment
                            (the IVC step function itself). Oracle: the
                            whole-table digest — chain ≡ batch because
                            the fold is associative+commutative.
- `stream_dedup_pairs`    — D21 incremental MinHash/LSH index: the
                            append-only pair ledger after ingesting the
                            corpus in 3 adversarial batches.  Oracle:
                            C2's batch LSH pair SQL (the induction
                            argument in streaming/dedup_stream.py is
                            what makes this a theorem, the gate makes
                            it a checked theorem).
- `stream_curation_kept`  — D22 streaming curation pipeline: the
                            maintained curated set (kept ∖ revoked).
                            Oracle: the C25 composition with the
                            keep-list computed over the LSH candidate
                            pair closure (the pair set D21 maintains),
                            as a recursive CTE.
- `stream_substring_verdicts` — D24 incremental substring-span index
                            (retroactive re-scoring). Oracle: C28.
- `stream_mpt_entries`    — D15 park/resume MPT walk fed in node-hash
                            order. Oracle: A16's derivation SQL.
- `stream_ss_join`        — D13 watermarked stream-stream range join,
                            TIME-ORDERED feed (watermark eviction makes
                            arbitrary-order feeds out of contract —
                            see _write_time_splits). Oracle: the batch
                            range join.
- `stream_windowed_counts` — D4 watermarked tumbling-window standing
                            aggregation, complete mode, DECIMAL sums.
                            Oracle: the batch per-(hour, type) rollup.
- `stream_range_tree_tiles` — (r7) the A25 segment-tree tile store
                            maintained per micro-batch; oracle = the
                            batch per-(chunk, level, cell) SQL.
- `stream_hdr_quantile_tiles` — (r7) B47's per-day integer quantile-
                            histogram tiles; oracle = the batch bucket
                            SQL.
- `stream_lc_distinct_tiles` — (r7) B48's per-day distinct bitmaps
                            (idempotent bit_or); oracle = the batch
                            bitmap SQL.
- `stream_erc20_rewards`  — (r7) A13's u256 reward view maintained
                            incrementally (leaf circuit per batch,
                            limb-sum monoid, carry at read); oracle =
                            A13's HUGEINT SQL.
- `stream_ivf_assign`     — (r7, D27) the IVF inverted-list store
                            maintained incrementally: each batch of new
                            embeddings assigned to its nearest centroid
                            and merged into that cid's list partition.
                            Model pinned to a SQL-expressible seed so
                            the gate hash-checks the maintained store;
                            oracle = the batch argmin-cosine SQL.
- `stream_leakage_splits`  — (r7, D28) C46's dedup-aware train/valid/
                            test split served from the INCREMENTALLY
                            maintained component labels (D21): a newly
                            arrived near-dup inherits its partner's
                            split. Oracle = the same md5 rule over the
                            LSH-pair recursive closure.
- `stream_ohlc_bars`      — (r7) B56's per-(user, hour) OHLC bars as a
                            SELECTION monoid (state carries each
                            selection's order key), maintained per
                            micro-batch; oracle = the batch window SQL.

Cost model: a face pays the full streaming run ONCE per corpus version
— the final state is a fingerprint-keyed disk artifact
(euclid_spark/artifacts.py), so sweeps and repeated runs serve a plain
parquet scan. That mirrors production: the stream runs continuously,
queries read its committed output.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from euclid_spark.catalog import cached_parquet

from euclid_spark import artifacts
from euclid_spark.functions.hashing import DIGEST_PRIME, MIX, digest_agg, digest_term

N_SPLITS = 3


def _serve_streamed(
    spark: SparkSession,
    name: str,
    fp: str,
    build: "Callable[[str], DataFrame]",
) -> DataFrame:
    """serve_frame with a scratch dir: `build(tmp)` may use `tmp` for
    the feed files / checkpoint / view; the directory is removed once
    the result is committed to the artifact store."""
    cached = artifacts.load_frame(spark, name, fp)
    if cached is not None:
        return cached
    tmp = tempfile.mkdtemp(prefix=f"euclid_{name}_")
    try:
        artifacts.save_frame(build(tmp), name, fp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = artifacts.load_frame(spark, name, fp)
    assert out is not None
    return out


def _write_splits(df: DataFrame, feed_dir: str, key: str) -> int:
    """Split `df` into N_SPLITS parquet files by hash of `key` — a
    deterministic, deliberately NOT time-ordered partition of the
    input, so each micro-batch carries rows from the whole time range
    (the adversarial order the monoid merges must tolerate).

    Spark-native (no driver-side materialization — the input never
    leaves the executors): each split is a filtered write, its single
    part file moved into the flat feed directory the file source
    lists. Files land in batch order b0 < b1 < b2 by mtime. In
    production there is no feed construction at all — the stream IS
    the arrival order; this harness only manufactures an adversarial
    one.

    Returns the number of feed files ACTUALLY written (r7 ADVICE): an
    empty hash bucket (empty/degenerate corpus) may produce no part
    file, and whether a zero-row write emits one is an undocumented
    engine behavior — callers pass this count to _run_stream instead
    of assuming N_SPLITS micro-batches will fire."""
    import glob

    os.makedirs(feed_dir, exist_ok=True)
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(N_SPLITS))
    written = 0
    for i in range(N_SPLITS):
        part_dir = os.path.join(feed_dir, f"_tmp{i}")
        df.filter(bucket == i).coalesce(1).write.mode("overwrite").parquet(
            part_dir
        )
        parts = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        if parts:
            os.replace(parts[0], os.path.join(feed_dir, f"b{i}.parquet"))
            written += 1
        shutil.rmtree(part_dir, ignore_errors=True)
    return written


def _write_time_splits(df: DataFrame, feed_dir: str, ts_col: str) -> None:
    """Split into N_SPLITS consecutive event-time ranges (equal-width
    over [min, max]) — the approximately-ordered arrival a watermarked
    operator is specified against. Same executor-side mechanics as
    _write_splits; the range bounds come from one broadcast stats row."""
    import glob

    os.makedirs(feed_dir, exist_ok=True)
    # NTZ has no direct numeric cast — go through TIMESTAMP (UTC session)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    stats = df.agg(
        F.min(sec).alias("lo"), F.max(sec).alias("hi")
    )
    frac = (sec - F.col("lo")) / (F.col("hi") - F.col("lo") + F.lit(1e-9))
    withb = df.join(F.broadcast(stats)).withColumn(
        "_b", F.least(F.lit(N_SPLITS - 1), F.floor(frac * N_SPLITS).cast("int"))
    )
    for i in range(N_SPLITS):
        part_dir = os.path.join(feed_dir, f"_tmp{i}")
        withb.filter(F.col("_b") == i).drop("_b", "lo", "hi").coalesce(
            1
        ).write.mode("overwrite").parquet(part_dir)
        parts = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        if parts:
            os.replace(parts[0], os.path.join(feed_dir, f"b{i}.parquet"))
        shutil.rmtree(part_dir, ignore_errors=True)


def _run_stream(q, sink, n_expected: int) -> None:
    q.awaitTermination(600)
    if sink.last_batch_id < n_expected - 1:
        raise RuntimeError(
            f"stream face: only {sink.last_batch_id + 1}/{n_expected} "
            "micro-batches applied before timeout"
        )


# ---------------------------------------------------------------- D19 faces

def _dec_partial(events: DataFrame) -> DataFrame:
    """The D19 count/sum/digest partials with DECIMAL value sums:
    decimal addition is exact, so the streamed merge tree and the
    one-pass batch oracle agree bit-for-bit (a double sum could drift
    at a round-off boundary depending on merge order — the q15 hazard)."""
    term = digest_term(F.col("event_id").cast("long"), F.col("user_id").cast("long"))
    return (
        events.withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("total_value"),
            digest_agg(term).alias("digest"),
        )
    )


def _dec_merge(old: DataFrame, partial: DataFrame) -> DataFrame:
    return (
        old.unionByName(partial)
        .groupBy("user_id", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast("decimal(18,6)").alias("total_value"),
            (F.sum("digest") % F.lit(DIGEST_PRIME)).cast("long").alias("digest"),
        )
    )


def stream_ivm_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face — the maintained (user, day) view after streaming the
    events table through the IVM sink in N_SPLITS adversarial batches."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_ivm_view", n=N_SPLITS, v=2
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_dec_partial,
            merge_fn=_dec_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):  # zero-row corpus: nothing merged
            return spark.createDataFrame(
                [],
                "user_id long, day date, n_events bigint, "
                "total_value double, digest bigint",
            )
        return sink.view(spark).select(
            "user_id",
            "day",
            "n_events",
            F.col("total_value").cast("double").alias("total_value"),
            "digest",
        )

    return _serve_streamed(spark, "stream_ivm_view", fp, build)


def stream_state_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face with the A7 argmax-by-event-id monoid: the maintained
    per-(account, day) latest-state snapshot — the reference's state DB
    (state/lpn/) fed incrementally, compared against the batch rollup."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import (
        MaintainedAggregate,
        _rollup_merge,
        _rollup_partial,
    )

    fp = artifacts.corpus_fingerprint(
        # v=3: r8 changed _rollup_partial/_rollup_merge NULL-write
        # semantics (skip-NULL argmax, last_nn_id state column) — bump so
        # caches built with the old monoid rebuild instead of serving stale
        [f"{sf_dir}/events.parquet"], op="stream_state_rollup", n=N_SPLITS, v=3
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_rollup_partial,
            merge_fn=_rollup_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):  # zero-row corpus: nothing merged
            return spark.createDataFrame(
                [],
                "user_id long, day date, last_value double, "
                "last_event_id bigint, n_events bigint",
            )
        return sink.view(spark).select(
            "user_id", "day", "last_value", "last_event_id", "n_events"
        )

    return _serve_streamed(spark, "stream_state_rollup", fp, build)


def stream_block_db_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 face — the IncrementalDigest chain commitment after folding
    the corpus in N_SPLITS micro-batches: the IVC step function itself
    (block/mod.rs). chain = Σ batch_digest ≡ batch digest of the whole
    table (mod P), because the fold is associative and commutative."""
    from euclid_spark.streaming.block_db import read_event_stream, run_digest_chain

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_block_db_chain", n=N_SPLITS, v=2
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        q, sink = run_digest_chain(
            read_event_stream(spark, feed), os.path.join(tmp, "ck")
        )
        _run_stream(q, sink, n_feeds)
        return spark.createDataFrame(
            [(sink.chain, sink.n_rows)], "chain_digest long, n_rows long"
        )

    return _serve_streamed(spark, "stream_block_db_chain", fp, build)


# ---------------------------------------------------------------- D21 face

def _streamed_dedup_state(
    spark: SparkSession, sf_dir: str
) -> "tuple[DataFrame, DataFrame]":
    """Run the D21 incremental dedup stream ONCE per corpus version and
    serve BOTH of its maintained outputs — the pair ledger and the
    component labels — under one shared fingerprint. In production
    there is one maintained index with many consumers; before this
    refactor the pairs face and the splits face each ran their own
    stream over the same corpus."""
    from euclid_spark.operators import dedup as _d
    from euclid_spark.streaming.dedup_stream import (
        read_document_stream,
        run_incremental_dedup,
    )

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/documents.parquet"],
        op="stream_dedup_state",
        n=N_SPLITS,
        n_hashes=_d.N_HASHES,
        band=_d.BAND_SIZE,
        cap=_d.MAX_BUCKET,
        v=1,
    )
    pairs = artifacts.load_frame(spark, "stream_dedup_pairs", fp)
    labels = artifacts.load_frame(spark, "stream_dedup_labels", fp)
    if pairs is not None and labels is not None:
        return pairs, labels
    tmp = tempfile.mkdtemp(prefix="euclid_stream_dedup_state_")
    try:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            feed,
            "doc_id",
        )
        q, sink = run_incremental_dedup(
            read_document_stream(spark, feed), os.path.join(tmp, "state")
        )
        _run_stream(q, sink, n_feeds)
        artifacts.save_frame(sink.pairs(), "stream_dedup_pairs", fp)
        artifacts.save_frame(sink.labels(), "stream_dedup_labels", fp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    pairs = artifacts.load_frame(spark, "stream_dedup_pairs", fp)
    labels = artifacts.load_frame(spark, "stream_dedup_labels", fp)
    assert pairs is not None and labels is not None
    return pairs, labels


def stream_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D21 face — the candidate-pair ledger of the incremental
    MinHash/LSH index after ingesting the documents table in N_SPLITS
    batches. Equals C2's batch pair set by the induction argument
    (every pair is found when its younger member arrives); the oracle
    is C2's SQL, so the gate verifies the induction on real data.
    Served from the SHARED streamed-state build (_streamed_dedup_state
    — one stream run feeds this face and stream_leakage_splits)."""
    pairs, _ = _streamed_dedup_state(spark, sf_dir)
    return pairs


def stream_leakage_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D28 face — C46's leakage-safe train/valid/test split computed
    from the INCREMENTALLY MAINTAINED component labels (D21's streamed
    labeling after ingesting the corpus in N_SPLITS adversarial
    batches): the assignment a live ingestion pipeline would serve,
    where a newly arrived near-duplicate is pulled into its partner's
    component and therefore its partner's split — eval sets stay clean
    without re-running the batch dedup. Split rule identical to C46
    (md5-bucket of the component, fixed thresholds); oracle = the same
    rule over the LSH-pair recursive closure (the pair universe D21
    maintains — the stream_curation_kept precedent).

    Labels come from the SHARED streamed-state build
    (_streamed_dedup_state): ONE stream run per corpus version feeds
    this face and stream_dedup_pairs — the production
    one-index-many-consumers shape; the split projection itself is
    row-local over that served scan (no second stream, no extra
    artifact)."""
    from euclid_spark.operators.curation import SPLIT_TRAIN, SPLIT_VALID

    _, labels = _streamed_dedup_state(spark, sf_dir)
    docs = cached_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    assigned = docs.join(labels, "doc_id", "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col("doc_id"))
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("split|"), F.col("component").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    return assigned.select(
        "doc_id",
        "component",
        bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN, F.lit("train"))
        .when(bucket < SPLIT_VALID, F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )



def _leakage_splits_sql() -> str:
    from euclid_spark.operators.curation import SPLIT_TRAIN, SPLIT_VALID

    return f"""
        WITH RECURSIVE
        {_lsh_closure_ctes()},
        assign AS (
            SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        ),
        b AS (
            SELECT doc_id, component,
                   CAST('0x' || substr(md5('split|' ||
                        CAST(component AS VARCHAR)), 1, 8) AS BIGINT)
                   % 100 AS bucket
            FROM assign
        )
        SELECT doc_id, component, CAST(bucket AS BIGINT) AS bucket,
               CASE WHEN bucket < {SPLIT_TRAIN} THEN 'train'
                    WHEN bucket < {SPLIT_VALID} THEN 'valid'
                    ELSE 'test' END AS split
        FROM b
    """


# ---------------------------------------------------------------- D22 face

def stream_curation_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D22 face — the maintained curated training set (kept ∖ revoked)
    after streaming the corpus through the curation sink. The dedup
    stage is D21's LSH-candidate component labeling (revocation ledger),
    so the oracle composes sample/repetition/contamination with the
    recursive-CTE closure over the LSH pair set."""
    from euclid_spark.operators import dedup as _d
    from euclid_spark.operators.textops import BENCH_SOURCES, benchmark_shingles
    from euclid_spark.streaming.curation_stream import run_streaming_curation

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/documents.parquet"],
        op="stream_curation_kept",
        n=N_SPLITS,
        n_hashes=_d.N_HASHES,
        band=_d.BAND_SIZE,
        cap=_d.MAX_BUCKET,
        v=4,  # r15: C61 learned filter joined (r14 v=3: C60 safety)
    )

    def build(tmp: str) -> DataFrame:
        docs = cached_parquet(spark, f"{sf_dir}/documents.parquet")
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            docs.select("doc_id", "text", "lang", "source"), feed, "doc_id"
        )
        # the STATIC held-out benchmark index (the streaming contract:
        # the eval suite is fixed up front) — same set the batch
        # operator derives from the corpus's bench sources
        bench = benchmark_shingles(
            docs.filter(F.col("source").isin(*BENCH_SOURCES))
        )
        # the C61 model is STATIC too (offline-trained on the reference
        # corpus, served weights handed to the sink up front — r15)
        from euclid_spark.operators.quality_model import quality_model_weights

        model = quality_model_weights(spark, sf_dir)
        stream = (
            spark.readStream.schema("doc_id long, text string, lang string, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q, sink = run_streaming_curation(
            stream, os.path.join(tmp, "state"), bench, model
        )
        _run_stream(q, sink, n_feeds)
        return sink.kept()

    return _serve_streamed(spark, "stream_curation_kept", fp, build)


# ---------------------------------------------------------------- D24 face

def stream_substring_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D24 face — the incremental substring-span index's verdict table
    after ingesting the corpus in N_SPLITS batches. The index re-scores
    RETROACTIVELY (an old doc's verdict flips when its first duplicate
    arrives later), so the final table equals batch C28 — the oracle is
    C28's SQL, making the retroactive re-scoring gate-checked."""
    from euclid_spark.operators import dedup as _d
    from euclid_spark.streaming.spans_stream import run_incremental_spans

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/documents.parquet"],
        op="stream_substring_verdicts",
        n=N_SPLITS,
        w=_d.SPAN_W,
        frac=_d.SPAN_DUP_FRAC,
        v=2,
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            feed,
            "doc_id",
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q, sink = run_incremental_spans(stream, os.path.join(tmp, "state"))
        _run_stream(q, sink, n_feeds)
        return sink.verdicts()

    return _serve_streamed(spark, "stream_substring_verdicts", fp, build)


# ---------------------------------------------------------------- D15 face

def stream_mpt_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15 face — the incremental MPT reassembly's entries store after
    the raw trie nodes arrive in N_SPLITS batches in HASH order (parents
    and children scattered across batches, cursors parking on missing
    nodes). Equals batch A16 once every node has arrived, so A16's
    original-derivation SQL is the oracle — the park/resume walk is
    gate-checked."""
    from euclid_spark.operators.mpt_ingest import synthesize_owner_tries
    from euclid_spark.streaming.mpt_stream import (
        read_node_stream,
        run_incremental_mpt,
    )

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_mpt_entries", n=N_SPLITS, v=2
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        # hash-split on the content address: a child can arrive batches
        # before its parent and vice versa (structure-ignoring scatter)
        n_feeds = _write_splits(
            synthesize_owner_tries(spark, sf_dir), feed, "node_hash"
        )
        q, sink = run_incremental_mpt(
            read_node_stream(spark, feed), os.path.join(tmp, "state")
        )
        _run_stream(q, sink, n_feeds)
        if not sink.pending().isEmpty():
            raise RuntimeError("stream_mpt_entries: cursors still parked")
        return sink.entries()

    return _serve_streamed(spark, "stream_mpt_entries", fp, build)


# ---------------------------------------------------------------- D13 face

def stream_ss_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13 face — the watermarked STREAM-STREAM range join (purchase ⋈
    prior same-user clicks within 30 min) run as a real streaming
    query over the 3-batch adversarial feed, results landed by the
    parquet sink. Inner stream-stream joins emit on match, so once
    every batch is processed the landed pairs equal the batch range
    join — the oracle. The time-range predicate is what bounds both
    join states at scale (O(rate × window), not stream lifetime)."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.joins import purchases_with_clicks

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_ss_join", n=N_SPLITS, v=3
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        # TIME-RANGE splits, not the hash scatter: a watermarked join
        # CONTRACTUALLY drops rows later than the watermark bound, so
        # the feed must be approximately time-ordered (as a real stream
        # is) — the 1-hour watermark absorbs the boundary raggedness.
        # The monoid faces tolerate arbitrary order; eviction-based
        # operators define correctness only within their lateness bound.
        _write_time_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "ts"
        )
        out = os.path.join(tmp, "out")
        q = (
            purchases_with_clicks(read_event_stream(spark, feed))
            .select("purchase_id", "click_id", "p_user", "p_value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            raise RuntimeError("stream_ss_join: did not quiesce in time")
        schema = "purchase_id long, click_id long, p_user long, p_value double"
        import glob as _g

        if not _g.glob(os.path.join(out, "part-*")):  # no pairs landed
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(out)

    return _serve_streamed(spark, "stream_ss_join", fp, build)


# ---------------------------------------------------------------- D4 face

def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 face — the WATERMARKED TUMBLING-WINDOW aggregation (the
    standing query over the append stream) run as a real streaming
    query in complete mode over the time-split feed; the final state
    must equal the batch per-(hour, type) aggregate. DECIMAL sums so
    streamed partial merges and the one-pass oracle agree exactly."""
    from euclid_spark.streaming.block_db import read_event_stream

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_windowed_counts", n=N_SPLITS, v=1
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        _write_time_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "ts"
        )
        agg = (
            read_event_stream(spark, feed)
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("decimal(18,6)")
                .alias("total_value"),
            )
        )
        qname = f"wc_{fp[:12]}"
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            raise RuntimeError("stream_windowed_counts: did not quiesce")
        return spark.table(qname).select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            F.col("total_value").cast("double").alias("total_value"),
        )

    return _serve_streamed(spark, "stream_windowed_counts", fp, build)


# ---------------------------------------------------------------- oracles

# The streamed view sums DECIMAL(18,6); mirrored exactly.
_IVM_SQL = f"""
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(SUM((event_id * {MIX} + user_id * 97) % {DIGEST_PRIME})
                % {DIGEST_PRIME} AS BIGINT) AS digest
    FROM events GROUP BY user_id, CAST(ts AS DATE)
"""

_ROLLUP_SQL = """
    SELECT user_id, CAST(ts AS DATE) AS day,
           max_by(value, event_id) AS last_value,
           MAX(event_id) AS last_event_id,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id, CAST(ts AS DATE)
"""

_CHAIN_SQL = f"""
    SELECT CAST(SUM((event_id * {MIX} + user_id * 97) % {DIGEST_PRIME})
                % {DIGEST_PRIME} AS BIGINT) AS chain_digest,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
"""


def _lsh_closure_ctes() -> str:
    """LSH candidate pairs (C2's oracle CTE chain) → symmetrized edges
    → transitive closure → min-label components: the pair universe the
    incremental index maintains, as recursive SQL."""
    from euclid_spark.operators.dedup import (
        MAX_BUCKET,
        _BAND_SELECTS,
        _SH,
        _SIG_COLS,
    )

    return f"""
        {_SH},
        sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
        bands AS ({_BAND_SELECTS}),
        guarded AS (
            SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bucket_n
            FROM bands
        ),
        lsh_pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM guarded a JOIN guarded b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
            WHERE a.bucket_n <= {MAX_BUCKET} AND b.bucket_n <= {MAX_BUCKET}
        ),
        sym AS (
            SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
            UNION SELECT doc_b, doc_a FROM lsh_pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        ),
        comp AS (
            SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
            FROM reach GROUP BY a
        )
    """


def _dedup_pairs_sql() -> str:
    from euclid_spark.operators.dedup import ORACLES as _DO

    return _DO["dedup_minhash_lsh"]


def _curation_kept_sql() -> str:
    from euclid_spark.operators.quality_model import ORACLES as _QM
    from euclid_spark.operators.textops import BENCH_SOURCES, ORACLES as _TO

    samp = _TO["text_stratified_sample"]
    rep = _TO["text_repetition_filter"]
    contam = _TO["text_benchmark_overlap"]
    safety = _TO["text_safety_screen"]
    qmodel = _QM["text_quality_model"]
    bench = ", ".join(f"'{s}'" for s in BENCH_SOURCES)
    return f"""
        WITH RECURSIVE
        {_lsh_closure_ctes()}
        SELECT s.doc_id, s.lang, s.source, s.bucket_hex
        FROM ({samp}) s
        JOIN (SELECT doc_id FROM ({rep}) WHERE keep) r ON s.doc_id = r.doc_id
        LEFT JOIN (SELECT doc_id FROM ({contam}) WHERE contaminated) c
               ON s.doc_id = c.doc_id
        LEFT JOIN (SELECT doc_id FROM ({safety}) WHERE blocked) x
               ON s.doc_id = x.doc_id
        LEFT JOIN (SELECT doc_id FROM ({qmodel}) WHERE NOT model_keep) qm
               ON s.doc_id = qm.doc_id
        WHERE c.doc_id IS NULL
          AND x.doc_id IS NULL
          AND qm.doc_id IS NULL
          AND s.source NOT IN ({bench})
          AND s.doc_id NOT IN (
              SELECT doc_id FROM comp WHERE doc_id <> component
          )
    """


def _spans_sql() -> str:
    from euclid_spark.operators.dedup import ORACLES as _DO

    return _DO["dedup_substring_spans"]


def _mpt_sql() -> str:
    from euclid_spark.operators.mpt_ingest import ORACLES as _MO

    return _MO["euclid_mpt_reassemble"]


def stream_range_tree_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face with the A25 RANGE-TREE TILE monoid (r7): the
    hierarchical partial-aggregate store maintained per micro-batch
    over the adversarial hash-split feed — the streamed analog of
    `query2/block/partial_node.rs` (appending blocks updates one path
    of tiles, not the tree). The gate compares the FULL maintained tile
    store against the batch SQL computing every (chunk, level, cell)
    tile from the events table directly — incremental ≡ batch for the
    exact structure the O(log-range) query face reads."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import (
        _range_tree_merge,
        _range_tree_partial,
    )

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_range_tree", n=N_SPLITS, v=1
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_range_tree_partial,
            merge_fn=_range_tree_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):  # zero-row corpus: nothing merged
            return spark.createDataFrame(
                [],
                "day int, level int, cell long, n_events bigint, "
                "sum_value double, min_block long, max_block long, "
                "digest bigint",
            )
        return sink.view(spark).select(
            "day",
            "level",
            "cell",
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
            "min_block",
            "max_block",
            "digest",
        )

    return _serve_streamed(spark, "stream_range_tree_tiles", fp, build)


def stream_q2_key_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face with the A26 QUERY2 KEY-TILE monoid (r8): the
    per-(chunk, level, cell, owner) FIRST-L distinct-key tiles — the
    bounded min-L selection lattice of `query2/block/full_node.rs` —
    maintained per micro-batch over the adversarial hash-split feed.
    The interesting incremental property the gate checks: per-batch
    TRUNCATED partials must re-merge to exactly the from-scratch
    first-L (a dropped key is larger than ≥L keys of its own slice, so
    no truncation can ever evict a key the final answer needs). Output
    is the exploded (tile, pos, token_id) form so the oracle's
    ROW_NUMBER replay compares value-exactly."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import (
        _q2_tiles_merge,
        _q2_tiles_partial,
    )

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_q2_key_tiles",
        n=N_SPLITS, v=1,
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_q2_tiles_partial,
            merge_fn=_q2_tiles_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):  # zero-row corpus: nothing merged
            return spark.createDataFrame(
                [],
                "day int, level int, cell long, owner long, pos int, "
                "token_id long",
            )
        return (
            sink.view(spark)
            .select(
                "day", "level", "cell", "owner",
                F.posexplode("keys").alias("pos0", "token_id"),
            )
            .select(
                "day", "level", "cell", "owner",
                (F.col("pos0") + 1).cast("int").alias("pos"),
                "token_id",
            )
        )

    return _serve_streamed(spark, "stream_q2_key_tiles", fp, build)


def _q2_key_tiles_sql() -> str:
    from euclid_spark.operators.euclid import TOP_L
    from euclid_spark.operators.range_tree import TILE_SIZE
    from euclid_spark.streaming.parity import _RT_LEVELS

    return f"""
        WITH e AS (
            SELECT (event_id // {TILE_SIZE}) AS cell0, user_id AS owner,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS token_id
            FROM events
            WHERE event_type = 'purchase'
              AND json_extract_string(props, '$.k') IS NOT NULL
        ),
        x AS (
            SELECT DISTINCT CAST(cell0 >> {_RT_LEVELS} AS INT) AS day,
                   CAST(g.level AS INT) AS level,
                   cell0 >> g.level AS cell, owner, token_id
            FROM e CROSS JOIN
                 (SELECT unnest(range(0, {_RT_LEVELS + 1})) AS level) g
        )
        SELECT day, level, cell, owner, CAST(rn AS INT) AS pos, token_id
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY day, level, cell, owner ORDER BY token_id) AS rn
            FROM x
        )
        WHERE rn <= {TOP_L}
    """


def _range_tree_tiles_sql() -> str:
    from euclid_spark.operators.range_tree import TILE_SIZE
    from euclid_spark.streaming.parity import _RT_LEVELS

    return f"""
        SELECT CAST((event_id // {TILE_SIZE}) >> {_RT_LEVELS} AS INT) AS day,
               CAST(g.level AS INT) AS level,
               (event_id // {TILE_SIZE}) >> g.level AS cell,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               MIN(event_id) AS min_block,
               MAX(event_id) AS max_block,
               CAST(SUM((event_id * {MIX} + user_id * 97) % {DIGEST_PRIME})
                    % {DIGEST_PRIME} AS BIGINT) AS digest
        FROM events
        CROSS JOIN (SELECT unnest(range(0, {_RT_LEVELS + 1})) AS level) g
        GROUP BY 1, 2, 3
    """


def stream_hdr_quantile_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face with the B47 QUANTILE-SKETCH monoid (r7): per-day
    integer log-histogram tiles maintained per micro-batch; the gate
    compares the full maintained tile store against the batch SQL
    computing the same buckets from the events table — the mergeable-
    sketch path a 100 TB deployment serves quantiles from."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import _hdr_merge, _hdr_partial

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_hdr_tiles", n=N_SPLITS, v=1
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_hdr_partial,
            merge_fn=_hdr_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):
            return spark.createDataFrame(
                [], "day date, nbits int, sub long, cnt bigint"
            )
        return sink.view(spark).select("day", "nbits", "sub", "cnt")

    return _serve_streamed(spark, "stream_hdr_quantile_tiles", fp, build)


def stream_lc_distinct_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face with the B48 LINEAR-COUNTING bitmap monoid (r7):
    per-day distinct-user bitmaps maintained per micro-batch (bit_or
    merge — idempotent, so replay is free); gate = the batch bitmap
    SQL per day."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import _lc_merge, _lc_partial

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_lc_tiles", n=N_SPLITS, v=1
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_lc_partial,
            merge_fn=_lc_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):
            return spark.createDataFrame(
                [], "day date, word_idx int, word bigint"
            )
        return sink.view(spark).select("day", "word_idx", "word")

    return _serve_streamed(spark, "stream_lc_distinct_tiles", fp, build)




def _psi_from_tiles(spark: SparkSession, tiles: DataFrame) -> DataFrame:
    """The drift READ: PSI per event_type off the maintained tile
    store. Split day = the tile store's own day span midpoint (one
    bounded fold over index-sized tiles — never the raw events);
    smoothing runs over the per-type OBSERVED bucket support (HDR's
    bucket universe is open-ended, so there is no fixed B to close
    over — supp is part of the output so the reader sees the support
    the statistic was computed on)."""
    import datetime as _dt

    from pyspark.sql import Window

    from euclid_spark.operators.drift import PSI_ALERT

    row = tiles.agg(F.min("day").alias("d0"), F.max("day").alias("d1")).collect()[0]
    empty = spark.createDataFrame(
        [],
        "event_type string, n_ref bigint, n_cur bigint,"
        " n_buckets bigint, psi double, drifted boolean",
    )
    if row["d0"] is None:
        return empty
    split = row["d0"] + _dt.timedelta(days=(row["d1"] - row["d0"]).days // 2)
    split_lit = F.to_date(F.lit(split.isoformat()))
    perb = tiles.groupBy("event_type", "nbits", "sub").agg(
        F.sum(
            F.when(F.col("day") < split_lit, F.col("cnt")).otherwise(F.lit(0))
        ).alias("cnt_ref"),
        F.sum(
            F.when(F.col("day") < split_lit, F.lit(0)).otherwise(F.col("cnt"))
        ).alias("cnt_cur"),
    )
    w = Window.partitionBy("event_type")
    wt = perb.select(
        "*",
        F.sum("cnt_ref").over(w).alias("n_ref"),
        F.sum("cnt_cur").over(w).alias("n_cur"),
        F.count(F.lit(1)).over(w).alias("supp"),
    )
    pr = (F.col("cnt_ref") + F.lit(0.5)) / (F.col("n_ref") + F.col("supp") / F.lit(2.0))
    pc = (F.col("cnt_cur") + F.lit(0.5)) / (F.col("n_cur") + F.col("supp") / F.lit(2.0))
    term = F.round((pc - pr) * F.log(pc / pr), 9).cast("decimal(38,9)")
    return (
        wt.select("event_type", "n_ref", "n_cur", "supp", term.alias("term"))
        .groupBy("event_type")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.first("supp").alias("n_buckets"),
            F.round(F.sum("term").cast("double"), 6).alias("psi"),
        )
        .filter(F.col("n_ref") > 0)
        .select(
            "event_type", "n_ref", "n_cur", "n_buckets", "psi",
            (F.col("psi") > F.lit(PSI_ALERT)).alias("drifted"),
        )
    )


def stream_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D32 — the drift monitor SERVED FROM MAINTAINED STATE (r13): the
    B59 idea re-based on the D19 sink so a 100 TB deployment never
    rescans history to re-check drift — per-(event_type, day) HDR
    integer log-bucket tiles advance per micro-batch (additive count
    monoid, 18th D20 spec `drift_tiles`; bins are split-invariant by
    construction, unlike B59's reference-window-fitted bins, which is
    what makes the statistic maintainable), and the face READS the
    two-half-window PSI off the tile store: bounded per-type folds,
    cost ∝ tiles, not events. Gate = the identical derivation from raw
    events in DuckDB — binding partial → merge → read end to end.

    POPULATION CONTRACT (ADVICE r13, CLOSED r14): the tile store's
    original fixed-point filter (v = floor(value·100) ≥ 1) excluded
    values below 0.01 — zeros and negatives — from both windows, while
    batch B59 clamps every non-null value into bin 0, so the two
    monitors measured different populations. The tiles now carry a
    RESERVED UNDERFLOW bucket (nbits=0, sub=0 — one more additive
    tile row; same design as the r14 quantile-edge batch variant's
    key 0, drift.py _hdr_key), so batch and streamed monitoring see
    the identical row set and n_ref/n_cur agree. Tile schema bump =
    the v=2 fingerprint below (one rebuild per corpus version)."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import _drift_merge, _drift_partial

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_drift_psi", n=N_SPLITS,
        v=2,  # r14: underflow bucket joined the tile universe
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_drift_partial,
            merge_fn=_drift_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):
            return spark.createDataFrame(
                [],
                "event_type string, n_ref bigint, n_cur bigint,"
                " n_buckets bigint, psi double, drifted boolean",
            )
        tiles = sink.view(spark).select(
            "event_type", "day", "nbits", "sub", "cnt"
        )
        return _psi_from_tiles(spark, tiles)

    return _serve_streamed(spark, "stream_drift_psi", fp, build)


def _drift_psi_sql() -> str:
    from euclid_spark.operators.drift import PSI_ALERT
    from euclid_spark.operators.quantile_sketch import SUB_BITS

    lo, mask = 1 << (SUB_BITS + 1), (1 << SUB_BITS) - 1
    return f"""
        WITH vals AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(FLOOR(value * 100) AS BIGINT) AS v
            FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL
        ),
        sp AS (
            SELECT MIN(day) + CAST((MAX(day) - MIN(day)) // 2 AS INTEGER)
                   AS split_day
            FROM vals
        ),
        keyed AS (
            SELECT event_type, day,
                   CASE WHEN v < 1 THEN 0
                        WHEN v < {lo} THEN {SUB_BITS + 1}
                        ELSE LENGTH(printf('%b', v)) END AS nbits,
                   CASE WHEN v < 1 THEN 0
                        WHEN v < {lo} THEN v
                        ELSE (v >> (LENGTH(printf('%b', v)) - {SUB_BITS + 1}))
                             & {mask} END AS sub
            FROM vals
        ),
        perb AS (
            SELECT k.event_type, k.nbits, k.sub,
                   SUM(CASE WHEN k.day < sp.split_day THEN 1 ELSE 0 END)
                       AS cnt_ref,
                   SUM(CASE WHEN k.day < sp.split_day THEN 0 ELSE 1 END)
                       AS cnt_cur
            FROM keyed k, sp GROUP BY 1, 2, 3
        ),
        wt AS (
            SELECT *,
                   SUM(cnt_ref) OVER (PARTITION BY event_type) AS n_ref,
                   SUM(cnt_cur) OVER (PARTITION BY event_type) AS n_cur,
                   COUNT(*) OVER (PARTITION BY event_type) AS supp
            FROM perb
        ),
        terms AS (
            SELECT event_type, n_ref, n_cur, supp,
                   CAST(ROUND(
                       ((cnt_cur + 0.5) / (n_cur + supp / 2.0)
                        - (cnt_ref + 0.5) / (n_ref + supp / 2.0))
                       * ln(((cnt_cur + 0.5) / (n_cur + supp / 2.0))
                            / ((cnt_ref + 0.5) / (n_ref + supp / 2.0))),
                       9) AS DECIMAL(38,9)) AS term
            FROM wt
        ),
        agg AS (
            SELECT event_type, MIN(n_ref) AS n_ref, MIN(n_cur) AS n_cur,
                   MIN(supp) AS n_buckets,
                   ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi
            FROM terms GROUP BY 1
        )
        SELECT event_type, CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               CAST(n_buckets AS BIGINT) AS n_buckets, psi,
               psi > {PSI_ALERT} AS drifted
        FROM agg WHERE n_ref > 0
    """


def stream_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D33 — D31's STREAMING TWIN (r13): the damaged-JSONL feed arrives
    as a file stream (the tail of a crawl dump), each micro-batch is
    parsed PERMISSIVE with the same corrupt-record contract as the
    batch reader (from_json carries columnNameOfCorruptRecord), and the
    per-(quarantined, source) ingest ledger advances through the D19
    maintained-aggregate sink (additive count/char-mass monoid,
    partition key = the quarantine flag — a batch only rewrites the
    buckets it touches). The maintained ledger must equal the BATCH
    D31 summary over everything ingested — same oracle, so the gate
    binds stream parse → quarantine → merge against the parquet ground
    truth end to end."""
    from euclid_spark.sources.jsonl import _DOC_SCHEMA, jsonl_fixture_path
    from euclid_spark.streaming.ivm import MaintainedAggregate

    fixture = jsonl_fixture_path(spark, sf_dir)
    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/documents.parquet"], op="stream_jsonl_ingest",
        n=N_SPLITS, v=1,
    )

    def _partial(lines: DataFrame) -> DataFrame:
        d = F.from_json(
            "value",
            _DOC_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        )
        parsed = lines.select(d.alias("d"))
        return (
            parsed.select(
                F.col("d._corrupt").isNotNull().alias("quarantined"),
                F.col("d.source").alias("source"),
                F.col("d.n_chars").alias("n_chars"),
            )
            .groupBy("quarantined", "source")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_chars").alias("sum_chars"),
            )
        )

    def _merge(old: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            old.unionByName(partial)
            .groupBy("quarantined", "source")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("sum_chars").alias("sum_chars"),
            )
        )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        os.makedirs(feed, exist_ok=True)
        lines = spark.read.text(fixture)
        n_feeds = N_SPLITS
        for i in range(n_feeds):
            lines.filter(
                F.pmod(
                    F.conv(F.substring(F.md5("value"), 1, 8), 16, 10)
                    .cast("long"),
                    F.lit(n_feeds),
                )
                == i
            ).coalesce(1).write.mode("overwrite").text(
                os.path.join(feed, f"split_{i}")
            )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_partial,
            merge_fn=_merge,
            key_col="quarantined",
        )
        q = (
            spark.readStream.option("maxFilesPerTrigger", 1)
            .text(os.path.join(feed, "split_*"))
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):
            return spark.createDataFrame(
                [],
                "quarantined boolean, source string,"
                " n_rows bigint, sum_chars bigint",
            )
        return sink.view(spark).select(
            # the Hive-style partition directory round-trips the flag
            # through partition-value inference — pin it back to boolean
            F.col("quarantined").cast("boolean").alias("quarantined"),
            "source",
            "n_rows",
            "sum_chars",
        )

    return _serve_streamed(spark, "stream_jsonl_ingest", fp, build)


def stream_erc20_rewards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face with the ERC-20 u256 REWARD monoid (r7): A13's query
    maintained incrementally — the reference's IVC story applied to
    its own second query family (query_erc20 + block/mod.rs: each new
    block's entries fold into the running result). The leaf circuit
    runs per micro-batch; the maintained per-owner limb sums carry-
    normalize at read into the same reward_hex A13's HUGEINT oracle
    checks."""
    from euclid_spark.functions.u256 import u256_carry_hex
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import _erc20_merge, _erc20_partial

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_erc20_rewards", n=N_SPLITS, v=1
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_erc20_partial,
            merge_fn=_erc20_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):
            return spark.createDataFrame(
                [],
                "owner long, reward_hex string, n_zero_supply long, "
                "n_overflow long",
            )
        return sink.view(spark).select(
            "owner",
            u256_carry_hex(
                F.col("s0"), F.col("s1"), F.col("s2"), F.col("s3")
            ).alias("reward_hex"),
            F.col("zs").alias("n_zero_supply"),
            F.col("of").alias("n_overflow"),
        )

    return _serve_streamed(spark, "stream_erc20_rewards", fp, build)


def _erc20_rewards_sql() -> str:
    from euclid_spark.operators import euclid as _e

    return _e.ORACLES["euclid_erc20_weighted_sum_u256"]


def stream_erc20_cell_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face with the A31 RESPONSE-COMMITMENT monoid (r9): the
    per-(owner, cell) in-cell Merkle leaf sets of the arbitrary-range
    verifiable responses (range_response.serve_range_commitments'
    rr_erc20 trees) maintained per micro-batch over the adversarial
    hash-split feed, folded to CELL ROOTS at read — the reference's
    IVC story applied to the r9 response artifacts: a live ingest
    maintains the commitment structure responses open into, and the
    gate checks the maintained roots equal the from-raw-rows
    derivation (DuckDB replays the leaf circuit + the promotion
    pairing over 8 halving CTEs)."""
    from pyspark.sql import Window

    from euclid_spark.cache import persist_tracked
    from euclid_spark.operators.merkle import merkle_levels
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import (
        _rr_cell_leaves_merge,
        _rr_cell_leaves_partial,
    )

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_erc20_cell_roots",
        n=N_SPLITS, v=1,
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_rr_cell_leaves_partial,
            merge_fn=_rr_cell_leaves_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        empty_schema = "owner long, cell long, n_entries long, root string"
        if not os.path.exists(view):  # zero-row corpus: nothing merged
            return spark.createDataFrame([], empty_schema)
        lv = (
            sink.view(spark)
            .select(
                "owner", "cell",
                F.posexplode("leaves").alias("pos", "lf"),
            )
            .select(
                F.concat_ws("|", "owner", "cell").alias("group_key"),
                "owner", "cell", "pos",
                F.col("lf.node_hash").alias("node_hash"),
            )
        )
        lv = persist_tracked(lv)
        nodes, _ = merkle_levels(lv.select("group_key", "pos", "node_hash"))
        wl = Window.partitionBy("group_key")
        roots = (
            nodes.withColumn("ml", F.max("level").over(wl))
            .filter(F.col("level") == F.col("ml"))
            .select("group_key", F.col("node_hash").alias("root"))
        )
        meta = lv.groupBy("group_key", "owner", "cell").agg(
            F.count(F.lit(1)).alias("n_entries")
        )
        return meta.join(roots, "group_key").select(
            "owner", "cell", "n_entries", "root"
        )

    return _serve_streamed(spark, "stream_erc20_cell_roots", fp, build)


def stream_q2_cell_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q2 twin of stream_erc20_cell_roots (r9): the per-(owner,
    cell) DISTINCT-KEY leaf sets of the A30 Query2 range-response
    commitments maintained per micro-batch (idempotent set union —
    16th D20 spec rr_q2_cell_leaves), folded to in-cell roots at read.
    With the ERC-20 face this closes the pair: BOTH reference query
    families' response commitments now have gate-checked incremental
    maintenance."""
    from pyspark.sql import Window

    from euclid_spark.cache import persist_tracked
    from euclid_spark.operators.merkle import merkle_levels
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import (
        _rr_q2_cell_leaves_merge,
        _rr_q2_cell_leaves_partial,
    )

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_q2_cell_roots",
        n=N_SPLITS, v=1,
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_rr_q2_cell_leaves_partial,
            merge_fn=_rr_q2_cell_leaves_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        empty_schema = "owner long, cell long, n_keys long, root string"
        if not os.path.exists(view):  # zero-row corpus: nothing merged
            return spark.createDataFrame([], empty_schema)
        lv = (
            sink.view(spark)
            .select(
                "owner", "cell",
                F.posexplode("tokens").alias("pos", "token_id"),
            )
            .select(
                F.concat_ws("|", "owner", "cell").alias("group_key"),
                "owner", "cell", "pos",
                F.sha2(F.col("token_id").cast("string"), 256)
                .alias("node_hash"),
            )
        )
        lv = persist_tracked(lv)
        nodes, _ = merkle_levels(lv.select("group_key", "pos", "node_hash"))
        wl = Window.partitionBy("group_key")
        roots = (
            nodes.withColumn("ml", F.max("level").over(wl))
            .filter(F.col("level") == F.col("ml"))
            .select("group_key", F.col("node_hash").alias("root"))
        )
        meta = lv.groupBy("group_key", "owner", "cell").agg(
            F.count(F.lit(1)).alias("n_keys")
        )
        return meta.join(roots, "group_key").select(
            "owner", "cell", "n_keys", "root"
        )

    return _serve_streamed(spark, "stream_q2_cell_roots", fp, build)


def _q2_cell_roots_sql() -> str:
    from euclid_spark.operators.euclid import _TOKEN
    from euclid_spark.operators.range_tree import TILE_SIZE

    halvings = []
    for k in range(1, 9):
        halvings.append(
            f"""l{k} AS (
  SELECT owner, cell, pos // 2 AS pos,
         CASE WHEN count(*) = 2
              THEN sha256(string_agg(node_hash, '' ORDER BY pos))
              ELSE min(node_hash) END AS node_hash
  FROM l{k - 1} GROUP BY owner, cell, pos // 2
)"""
        )
    return f"""
WITH base AS (
  SELECT DISTINCT user_id AS owner, {_TOKEN} AS token_id,
         event_id // {TILE_SIZE} AS cell
  FROM events
  WHERE event_type = 'purchase' AND {_TOKEN} IS NOT NULL
),
l0 AS (
  SELECT owner, cell,
         row_number() OVER (PARTITION BY owner, cell
                            ORDER BY token_id) - 1 AS pos,
         sha256(token_id::VARCHAR) AS node_hash
  FROM base
),
{', '.join(halvings)},
counts AS (
  SELECT owner, cell, count(*) AS n_keys FROM l0 GROUP BY owner, cell
)
SELECT c.owner, c.cell, CAST(c.n_keys AS BIGINT) AS n_keys,
       r.node_hash AS root
FROM counts c JOIN l8 r ON r.owner = c.owner AND r.cell = c.cell
"""


def _erc20_cell_roots_sql() -> str:
    from euclid_spark.operators.euclid import REWARDS_RATE, _TOKEN
    from euclid_spark.operators.range_tree import TILE_SIZE

    halvings = []
    for k in range(1, 9):  # 2^8 = TILE_SIZE: a cell holds ≤ 256 entries
        halvings.append(
            f"""l{k} AS (
  SELECT owner, cell, pos // 2 AS pos,
         CASE WHEN count(*) = 2
              THEN sha256(string_agg(node_hash, '' ORDER BY pos))
              ELSE min(node_hash) END AS node_hash
  FROM l{k - 1} GROUP BY owner, cell, pos // 2
)"""
        )
    return f"""
WITH base AS (
  SELECT user_id AS owner, event_id,
         lpad(lower(to_hex(
             CASE WHEN tok IS NULL OR tok = 0 THEN CAST(0 AS HUGEINT)
                  ELSE (CAST(FLOOR(value * 10000) AS HUGEINT)
                        * CAST('18446744073709551616' AS HUGEINT)
                        + event_id) * {REWARDS_RATE} // tok
             END)), 64, '0') AS entry_reward_hex,
         event_id // {TILE_SIZE} AS cell
  FROM (SELECT user_id, event_id, value, {_TOKEN} AS tok FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL)
),
l0 AS (
  SELECT owner, cell,
         row_number() OVER (PARTITION BY owner, cell
                            ORDER BY event_id) - 1 AS pos,
         sha256(event_id::VARCHAR || ':' || entry_reward_hex) AS node_hash
  FROM base
),
{', '.join(halvings)},
counts AS (
  SELECT owner, cell, count(*) AS n_entries FROM l0 GROUP BY owner, cell
)
SELECT c.owner, c.cell, CAST(c.n_entries AS BIGINT) AS n_entries,
       r.node_hash AS root
FROM counts c JOIN l8 r ON r.owner = c.owner AND r.cell = c.cell
"""


def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 face with the B56 OHLC SELECTION monoid (late r7): per-
    (user, hour) open/high/low/close bars maintained per micro-batch —
    the candle-from-ticks pipeline. The maintained state carries each
    selection's (ts, event_id) order key beside its value, so the
    argmin/argmax lattice re-merges identically under any batch split;
    oracle = B56's batch window SQL."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.streaming.parity import _ohlc_merge, _ohlc_partial

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_ohlc_bars", n=N_SPLITS, v=1
    )

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=_ohlc_partial,
            merge_fn=_ohlc_merge,
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):
            return spark.createDataFrame(
                [],
                "user_id long, hour_start timestamp, open double, "
                "high double, low double, close double, n_ticks bigint",
            )
        return sink.view(spark).select(
            "user_id",
            "hour_start",
            F.col("o.v").alias("open"),
            "high",
            "low",
            F.col("c.v").alias("close"),
            "n_ticks",
        )

    return _serve_streamed(spark, "stream_ohlc_bars", fp, build)


def _ohlc_bars_sql() -> str:
    from euclid_spark.operators import timeseries as _t

    return _t.ORACLES["rel_ohlc_resample"]


# ---------------------------------------------------------------- D27 face

# seed-centroid count for the gate-checkable model — one constant with
# the batch search face (operators/similarity.sim_ivf_pinned_topk), so
# the maintained lists and the pinned search path describe the same model
from euclid_spark.operators.similarity import SEED_K as IVF_FACE_K  # noqa: E402


def stream_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D27 face — the IVF INVERTED-LIST STORE maintained incrementally:
    new corpus embeddings stream in and each micro-batch is assigned to
    its nearest centroid and merged into that centroid's list partition
    (the view is partitioned BY cid — a batch touches only the lists
    its vectors land in, the `day`-economics of D19 with the index's
    own key). This is how a 100 TB ANN index stays fresh: the model is
    trained once up front, arrivals are assigned incrementally, and
    the serving lists never need a rebuild scan.

    The MODEL here is pinned to a deterministic, SQL-expressible seed —
    the IVF_FACE_K lowest-vec_id corpus vectors — precisely so the
    DuckDB gate can hash-check the maintained store (the production
    path serves the k-means artifact via `similarity.ivf_centroids`;
    `sim_ivf_topk(centroids=...)` accepts any external model, and
    k-means itself is engine-side by design — C6/C12 are recall-gated
    instead). Assignment rule mirrors C5: rounded cosine, (csim DESC,
    cid ASC) tiebreak, zero-norm guarded."""
    from euclid_spark.functions.vectors import cosine
    from euclid_spark.operators.similarity import N_QUERIES
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from pyspark.sql import Window

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/embeddings.parquet"],
        op="stream_ivf_assign",
        n=N_SPLITS,
        k=IVF_FACE_K,
        v=1,
    )

    def build(tmp: str) -> DataFrame:
        corpus = cached_parquet(spark, f"{sf_dir}/embeddings.parquet").filter(
            F.col("vec_id") >= N_QUERIES
        )
        # the fixed up-front model: K lowest-vec_id corpus vectors
        # (bounded parameter fetch, broadcast into every batch)
        seed = corpus.orderBy("vec_id").limit(IVF_FACE_K).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
        )
        seed_rows = seed.collect()
        if not seed_rows:
            return spark.createDataFrame(
                [], "cid long, neighbor_id long, csim double"
            )
        cent = spark.createDataFrame(
            [(r["cid"], [float(x) for x in r["cemb"]]) for r in seed_rows],
            "cid long, cemb array<double>",
        )

        def assign_partial(batch: DataFrame) -> DataFrame:
            scored = batch.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ce"),
            ).crossJoin(F.broadcast(cent)).select(
                "cid",
                "neighbor_id",
                F.round(
                    cosine(
                        F.col("ce").cast("array<double>"), F.col("cemb")
                    ),
                    6,
                ).alias("csim"),
            )
            w = Window.partitionBy("neighbor_id").orderBy(
                F.desc("csim"), "cid"
            )
            return (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("cid", "neighbor_id", "csim")
            )

        def merge_lists(old: DataFrame, partial: DataFrame) -> DataFrame:
            # vec_ids are disjoint across batches (append-only corpus):
            # the per-list merge is a plain union; re-delivered batches
            # are excluded by the per-cid applied watermark upstream
            return old.unionByName(partial)

        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            corpus.select("vec_id", "embedding"), feed, "vec_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "ivm_state.json"),
            partial_fn=assign_partial,
            merge_fn=merge_lists,
            key_col="cid",
        )
        q = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):
            return spark.createDataFrame(
                [], "cid long, neighbor_id long, csim double"
            )
        return sink.view(spark).select("cid", "neighbor_id", "csim")

    return _serve_streamed(spark, "stream_ivf_assign", fp, build)


def _ivf_assign_sql() -> str:
    from euclid_spark.operators.similarity import _DOT, _NC, _NQ, N_QUERIES

    dot = _DOT.replace("qe", "cemb")
    nq = _NQ.replace("qe", "cemb")
    return f"""
        WITH c AS (SELECT vec_id AS neighbor_id, embedding AS ce
                   FROM embeddings WHERE vec_id >= {N_QUERIES}),
        cent AS (SELECT vec_id AS cid, embedding AS cemb
                 FROM embeddings WHERE vec_id >= {N_QUERIES}
                 ORDER BY vec_id LIMIT {IVF_FACE_K}),
        s AS (SELECT cid, neighbor_id,
                     ROUND(CASE WHEN {nq} * {_NC} = 0 THEN 0.0
                                ELSE {dot} / ({nq} * {_NC}) END, 6) AS csim
              FROM c CROSS JOIN cent),
        r AS (SELECT cid, neighbor_id, csim,
                     ROW_NUMBER() OVER (PARTITION BY neighbor_id
                         ORDER BY csim DESC, cid) AS rn
              FROM s)
        SELECT cid, neighbor_id, csim FROM r WHERE rn = 1
    """


def _hdr_tiles_sql() -> str:
    from euclid_spark.operators.quantile_sketch import SUB_BITS

    lo = 1 << (SUB_BITS + 1)
    mask = (1 << SUB_BITS) - 1
    return f"""
        WITH vals AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR(value * 100) AS BIGINT) AS v
            FROM events
        )
        SELECT day,
               CAST(CASE WHEN v < {lo} THEN {SUB_BITS + 1}
                         ELSE LENGTH(printf('%b', v)) END AS INT) AS nbits,
               CASE WHEN v < {lo} THEN v
                    ELSE (v >> (LENGTH(printf('%b', v)) - {SUB_BITS + 1}))
                         & {mask} END AS sub,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM vals WHERE v >= 1
        GROUP BY 1, 2, 3
    """


def _lc_tiles_sql() -> str:
    from euclid_spark.operators.distinct_sketch import LC_BITS

    return f"""
        WITH bits AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST('0x' || substr(md5(user_id::VARCHAR), 1, 8) AS BIGINT)
                       % {LC_BITS} AS bit
            FROM events
        )
        SELECT day, CAST(bit // 64 AS INT) AS word_idx,
               bit_or(CASE WHEN bit % 64 = 63
                           THEN -9223372036854775807 - 1
                           ELSE 1::BIGINT << (bit % 64) END) AS word
        FROM bits GROUP BY 1, 2
    """


def stream_eth_account_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D30 streamed (the 20th face) — the eth_getProof capture's
    ACCOUNT-STATE COMMITMENTS maintained as blocks arrive: the IVC
    property (block/mod.rs: step(commitment_n, batch) ≡ from-scratch)
    applied to the r11 real-chain surface. The maintained state is the
    distinct (owner, mapping-key) ledger — an idempotent set-union
    monoid, partition-pruned by owner bucket so a micro-batch rewrites
    only the buckets it touches; at read, each account's SECURE
    storage trie rebuilds from its maintained key set (the distributed
    level-batched keccak builder shared with the batch capture) and
    the roots must equal the BATCH capture's storageHash — the oracle
    reads the served eth_proof_fixture and re-derives nonce/balance
    relationally from raw events."""
    from euclid_spark.streaming.block_db import read_event_stream
    from euclid_spark.streaming.ivm import MaintainedAggregate
    from euclid_spark.sources.eth_proof import (
        MAPPING_SLOT,
        account_state_rows,
        eth_proof_fixture,
    )

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="stream_eth_state",
        n=N_SPLITS, slot=MAPPING_SLOT, v=1,
    )
    # the oracle compares against the batch capture — make sure it is
    # served (cheap load when cached; one-time build otherwise)
    eth_proof_fixture(spark, sf_dir)

    def _partial(batch: DataFrame) -> DataFrame:
        tok = F.get_json_object("props", "$.k").cast("long")
        return (
            batch.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id"), tok.alias("token_id"))
            .filter(F.col("token_id").isNotNull())
            .withColumn(
                "pb", F.pmod(F.col("user_id"), F.lit(16)).cast("int")
            )
            .select("pb", "user_id", "token_id")
            .distinct()
        )

    def _merge(old: DataFrame, part: DataFrame) -> DataFrame:
        return old.unionByName(part).distinct()

    def build(tmp: str) -> DataFrame:
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(
            cached_parquet(spark, f"{sf_dir}/events.parquet"), feed, "event_id"
        )
        view, ck = os.path.join(tmp, "view"), os.path.join(tmp, "ck")
        os.makedirs(ck, exist_ok=True)
        sink = MaintainedAggregate(
            view_path=view,
            state_path=os.path.join(ck, "eth_state.json"),
            partial_fn=_partial,
            merge_fn=_merge,
            key_col="pb",
        )
        q = (
            read_event_stream(spark, feed)
            .writeStream.foreachBatch(sink.process)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        _run_stream(q, sink, n_feeds)
        if not os.path.exists(view):  # zero-row corpus
            return spark.createDataFrame(
                [],
                "address string, nonce long, balance long, "
                "storage_root string",
            )
        pairs = sink.view(spark).select("user_id", "token_id")
        return account_state_rows(pairs)

    return _serve_streamed(spark, "stream_eth_state", fp, build)


def _eth_state_sql(sf_dir: str) -> str:
    """Oracle: the BATCH capture's commitments joined to relational
    expectations — streamed trie roots must equal the from-scratch
    capture's storageHash (the IVC gate)."""
    import os as _os

    from euclid_spark import artifacts as _arts
    from euclid_spark.sources.eth_proof import _fixture_fp

    path = _os.path.join(
        _arts.artifact_dir(),
        f"eth_proof_fixture_{_fixture_fp(sf_dir)}.parquet",
    )
    tok = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    return f"""
        WITH d AS (
            SELECT DISTINCT user_id, {tok} AS token_id
            FROM events
            WHERE event_type = 'purchase' AND {tok} IS NOT NULL
        ),
        per AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS nonce,
                   CAST(SUM(token_id) AS BIGINT) AS balance
            FROM d GROUP BY user_id
        ),
        fx AS (
            SELECT user_id, address, storageHash
            FROM read_parquet('{path}/*.parquet')
        )
        SELECT fx.address, per.nonce, per.balance,
               fx.storageHash AS storage_root
        FROM per JOIN fx USING (user_id)
    """


def stream_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D35 face (r15) — C54's soft-dedup TRAINING WEIGHTS computed from
    the INCREMENTALLY MAINTAINED component labels (the third consumer
    of the shared streamed dedup state, after D21's pair ledger and
    D28's leakage-safe splits — the production one-index-many-consumers
    shape): as near-duplicates stream in, cluster sizes grow and every
    member's weight 1/|cluster| decays WITHOUT re-running batch dedup —
    the sampling weights a soft-dedup trainer (Abbas et al. 2023,
    SemDeDup-style down-weighting practice) reads stay fresh against a
    growing corpus. Projection is two aggregates over the served label
    scan (groupBy component, then an equi-join on the same key — one
    exchange, reused); oracle = the same 1/|component| rule over the
    LSH-pair recursive closure (the pair universe D21 maintains)."""
    _, labels = _streamed_dedup_state(spark, sf_dir)
    docs = cached_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    assigned = docs.join(labels, "doc_id", "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col("doc_id"))
    )
    sizes = assigned.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(sizes, "component").select(
        "doc_id",
        "component",
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size"), 9).alias("weight"),
    )


def _soft_dedup_weights_sql() -> str:
    return f"""
        WITH RECURSIVE
        {_lsh_closure_ctes()},
        csize AS (
            SELECT component, COUNT(*) AS cluster_size
            FROM comp GROUP BY component
        ),
        assign AS (
            SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        )
        SELECT a.doc_id, a.component,
               CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size,
               ROUND(1.0 / COALESCE(s.cluster_size, 1), 9) AS weight
        FROM assign a LEFT JOIN csize s ON a.component = s.component
    """


def stream_epoch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D34 face (r15) — the epoch-shard manifest served from the
    INCREMENTALLY MAINTAINED bucket-keyed shard-row store after
    streaming the corpus through the D34 sink in N_SPLITS adversarial
    hash-split batches (shard_stream.py: per-doc tokenize+hash paid
    once at ingest, appends touch only the hash-buckets a batch hits).
    The gate compares the maintained manifest against C55's own batch
    SQL over the full corpus — incremental ≡ batch for the exact
    artifact a training dataloader consumes (the D19/D20 discipline)."""
    from euclid_spark.operators.curation import EPOCH_SEED, SHARD_TOKENS
    from euclid_spark.streaming.shard_stream import run_streaming_shards

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/documents.parquet"],
        op="stream_epoch_shards",
        n=N_SPLITS,
        seed=EPOCH_SEED,
        budget=SHARD_TOKENS,
        v=1,
    )

    def build(tmp: str) -> DataFrame:
        docs = cached_parquet(spark, f"{sf_dir}/documents.parquet")
        feed = os.path.join(tmp, "feed")
        n_feeds = _write_splits(docs.select("doc_id", "text"), feed, "doc_id")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q, sink = run_streaming_shards(stream, os.path.join(tmp, "state"))
        _run_stream(q, sink, n_feeds)
        return sink.manifest()

    return _serve_streamed(spark, "stream_epoch_shards", fp, build)


def _epoch_shards_sql() -> str:
    from euclid_spark.operators.curation import ORACLES as _CO

    return _CO["curation_epoch_shards"]


DYNAMIC_ORACLES = {"stream_eth_account_state": _eth_state_sql}


QUERIES = {
    "stream_eth_account_state": stream_eth_account_state,
    "stream_ivm_view": stream_ivm_view,
    "stream_state_rollup": stream_state_rollup,
    "stream_block_db_chain": stream_block_db_chain,
    "stream_dedup_pairs": stream_dedup_pairs,
    "stream_curation_kept": stream_curation_kept,
    "stream_substring_verdicts": stream_substring_verdicts,
    "stream_mpt_entries": stream_mpt_entries,
    "stream_ss_join": stream_ss_join,
    "stream_windowed_counts": stream_windowed_counts,
    "stream_range_tree_tiles": stream_range_tree_tiles,
    "stream_q2_key_tiles": stream_q2_key_tiles,
    "stream_hdr_quantile_tiles": stream_hdr_quantile_tiles,
    "stream_lc_distinct_tiles": stream_lc_distinct_tiles,
    "stream_erc20_rewards": stream_erc20_rewards,
    "stream_erc20_cell_roots": stream_erc20_cell_roots,
    "stream_q2_cell_roots": stream_q2_cell_roots,
    "stream_ivf_assign": stream_ivf_assign,
    "stream_leakage_splits": stream_leakage_splits,
    "stream_ohlc_bars": stream_ohlc_bars,
    "stream_drift_psi": stream_drift_psi,
    "stream_jsonl_ingest": stream_jsonl_ingest,
    "stream_epoch_shards": stream_epoch_shards,
    "stream_soft_dedup_weights": stream_soft_dedup_weights,
}

ORACLES = {
    "stream_epoch_shards": _epoch_shards_sql(),
    "stream_soft_dedup_weights": _soft_dedup_weights_sql(),
    "stream_range_tree_tiles": _range_tree_tiles_sql(),
    "stream_q2_key_tiles": _q2_key_tiles_sql(),
    "stream_hdr_quantile_tiles": _hdr_tiles_sql(),
    "stream_lc_distinct_tiles": _lc_tiles_sql(),
    "stream_erc20_rewards": _erc20_rewards_sql(),
    "stream_erc20_cell_roots": _erc20_cell_roots_sql(),
    "stream_q2_cell_roots": _q2_cell_roots_sql(),
    "stream_ivf_assign": _ivf_assign_sql(),
    "stream_leakage_splits": _leakage_splits_sql(),
    "stream_ohlc_bars": _ohlc_bars_sql(),
    "stream_drift_psi": _drift_psi_sql(),
    "stream_jsonl_ingest": __import__(
        "euclid_spark.sources.jsonl", fromlist=["ORACLES"]
    ).ORACLES["src_jsonl_quarantine"],
    "stream_ivm_view": _IVM_SQL,
    "stream_state_rollup": _ROLLUP_SQL,
    "stream_block_db_chain": _CHAIN_SQL,
    "stream_dedup_pairs": _dedup_pairs_sql(),
    "stream_curation_kept": _curation_kept_sql(),
    "stream_substring_verdicts": _spans_sql(),
    "stream_mpt_entries": _mpt_sql(),
    "stream_ss_join": """
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id AS p_user, p.value AS p_value
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    "stream_windowed_counts": """
        SELECT to_timestamp(FLOOR(epoch(ts) / 3600) * 3600) AS win_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_value
        FROM events
        GROUP BY 1, 2
    """,
}
