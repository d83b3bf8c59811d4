"""Physical-plan assertions (SURVEY.md §5 level 4): pushdown reaches the
scan, small dims broadcast, and no row-at-a-time Python evaluation sneaks
into hot-path operators. These guard the 100 TB properties the small-SF
row counts can't see."""

from __future__ import annotations

import pytest

from euclid_spark.operators import dedup, euclid, relational, similarity, textops
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_push_to_parquet(spark):
    plan = _plan(relational.q6_forecast_revenue(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    # the range predicate must appear among the pushed filters
    pushed = plan.split("PushedFilters:")[1]
    assert "l_shipdate" in pushed[:400] or "l_discount" in pushed[:400]


def test_block_range_scan_pushes_ts_range(spark):
    plan = _plan(euclid.block_range_scan(spark, SF_SMOKE))
    pushed = plan.split("PushedFilters:")[1]
    assert "ts" in pushed[:300], "timestamp range filter must push down"


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(relational.q5_local_supplier(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_membership_proof_broadcasts_digests(spark):
    plan = _plan(euclid.membership_proof(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_no_python_udf_in_hot_paths(spark):
    hot = [
        euclid.q2_distinct_keys,
        euclid.erc20_weighted_sum,
        euclid.storage_digest,
        relational.q1_pricing_summary,
        dedup.dedup_minhash_lsh,
        similarity.sim_topk_cosine,
        textops.text_fingerprint,
    ]
    for fn in hot:
        plan = _plan(fn(spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, f"{fn.__name__} fell off the JVM path"
        assert "ArrowEvalPython" not in plan, f"{fn.__name__} uses a pandas UDF"


def test_codegen_in_q1(spark):
    df = relational.q1_pricing_summary(spark, SF_SMOKE)
    df.collect()  # AQE finalizes the plan (isFinalPlan=true) on execution
    plan = _plan(df)
    # whole-stage codegen stages print as "*(n)" in the executed plan
    assert "*(1)" in plan and "partial_sum" in plan


@pytest.mark.parametrize(
    "fn", [euclid.q2_revelation_topl, relational.q3_shipping_priority]
)
def test_topn_uses_take_ordered(spark, fn):
    plan = _plan(fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, "LIMIT+ORDER BY must not global-sort"


def test_q19_disjunction_keeps_hash_join(spark):
    """The OR of three conjunct arms shares the p_partkey equi-key; the
    planner must extract it and keep a hash join (the residual OR is a
    post-join filter). A nested-loop/cartesian fallback here would scan
    part × lineitem — instant death at 100 TB."""
    plan = _plan(relational.q19_disjunctive_join(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_quantifiers_fold_into_one_fact_pass(spark):
    """r15: the EXISTS / NOT EXISTS pair is answered by a two-level
    per-order aggregate — the plan must scan lineitem exactly ONCE
    (the quantifier shape scanned it three times) and keep partial
    aggregation ahead of every exchange; no cartesian fallback."""
    plan = _plan(relational.q21_waiting_supplier(spark, SF_SMOKE))
    assert plan.count("lineitem.parquet") == 1, "fact must be scanned once"
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "partial_" in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_is_left_semi(spark):
    plan = _plan(relational.q4_order_priority(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_merkle_roots_join_has_no_static_broadcast_hint(spark):
    """VERDICT r4 #2: merkle_opening_paths is a generic operator — roots
    has one row per group, so a *forced* broadcast would OOM with a
    high-cardinality group key. The logical plan must carry no broadcast
    hint on the roots join; AQE may still pick a broadcast join at
    runtime when roots is genuinely small (that is the desired
    behavior, and not what this test forbids)."""
    from euclid_spark.operators import merkle

    df = merkle.merkle_membership_proof(spark, SF_SMOKE)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_preprocessing_pipeline_plan_shape(spark):
    """A19 composes five stages: the whole chain must stay JVM-side,
    push the range filter to the scan, and never collapse the history
    into a single partition (the chain prefix-sum is two-level)."""
    from euclid_spark.operators import preprocessing

    df = preprocessing.preprocessing_pipeline(spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q20_exists_chain_is_semi_joins(spark):
    """Q20's nested quantifiers must plan as LeftSemi hash joins on
    equi-keys — never a correlated per-row execution or cartesian."""
    plan = _plan(relational.q20_potential_promotion(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join(spark):
    plan = _plan(relational.q16_parts_supplier_relationship(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_new_tpch_stay_on_jvm(spark):
    for fn in [
        relational.q4_order_priority,
        relational.q12_ship_priority,
        relational.q15_top_supplier,
        relational.q17_small_quantity_revenue,
        relational.q19_disjunctive_join,
        relational.q21_waiting_supplier,
        relational.q22_global_sales_opportunity,
        relational.q2_min_cost_supplier,
        relational.q9_product_type_profit,
        relational.q11_important_stock,
        relational.q16_parts_supplier_relationship,
        relational.q20_potential_promotion,
    ]:
        plan = _plan(fn(spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, f"{fn.__name__} fell off the JVM path"
        assert "ArrowEvalPython" not in plan, f"{fn.__name__} uses a pandas UDF"


def test_benchmark_overlap_single_exchange_and_broadcast(spark):
    """C23's r5 one-pass shape: the train side must reach the doc_id
    aggregation through a BROADCAST join against the (fixed-size)
    benchmark shingle set — no shuffle of the corpus's shingle strings.
    Since r7 the registry face serves the verdict ARTIFACT (a plain
    scan), so this asserts the BUILD pipeline's plan — the shape the
    once-per-corpus-version build actually executes."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    is_bench = F.col("source").isin(*textops.BENCH_SOURCES)
    df = textops.contamination_overlap(
        docs.filter(~is_bench),
        textops.benchmark_shingles(docs.filter(is_bench)),
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "corpus-wide shingle shuffle is back"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_sequences_no_single_partition(spark):
    """C26's global prefix sum must be two-level (bucket window + 
    broadcast offsets) — a bare orderBy window would funnel the corpus
    through Exchange SinglePartition."""
    df = textops.text_pack_sequences(spark, SF_SMOKE)
    plan = _plan(df)
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temperature_sample_broadcasts_rates(spark):
    """C27's per-source rate table is scale-invariant (a handful of
    sources) — it must reach the corpus through a broadcast join, with
    no sort-merge shuffle of the documents and no single-partition
    exchange."""
    df = textops.text_temperature_sample(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange SinglePartition" not in plan


def test_substring_spans_no_pairwise_join(spark):
    """C28's whole point: duplicated-window detection has NO self-join —
    no CartesianProduct, no nested loop, and stays on the JVM. Assert
    on the BUILD plan (the registry query serves the artifact, whose
    plan is just a scan)."""
    from euclid_spark.operators.dedup import _substring_spans_build

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = _plan(_substring_spans_build(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LeftSemi" in plan  # dup-hash membership is a semi join


def test_dsir_bucket_lm_broadcasts(spark):
    """C29: the fixed-size bucket log-ratio table must broadcast into
    the per-doc scoring join (never shuffle the corpus against it).
    Asserted on the BUILD plan (the registry query serves the
    artifact)."""
    from euclid_spark.operators.textops import _dsir_build

    df = _dsir_build(spark, SF_SMOKE)
    df.collect()  # AQE finalizes
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_perplexity_cutoffs_broadcast(spark):
    """C30: the per-lang threshold table (one row per language) must
    broadcast; doc scores must not be re-shuffled by a global sort."""
    from euclid_spark.operators.textops import _ppl_buckets_build

    df = _ppl_buckets_build(spark, SF_SMOKE)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the one allowed SinglePartition shape is the bounded scalar-total
    # aggregate (same as unigram_logprob's corpus total); the histogram
    # window must stay partitioned by lang — a global-order window over
    # the docs would read "Window ... [lang-free ORDER BY]" with an
    # unpartitioned sort, which rangepartitioning(1 part) would betray
    assert "rangepartitioning" not in plan.split("Window")[0]


def test_training_mix_semi_joins_jvm_only(spark):
    """C32: survivorship checks are semi joins on doc_id; no pairwise
    join anywhere; everything on the JVM."""
    from euclid_spark.operators.curation import curation_training_mix

    df = curation_training_mix(spark, SF_SMOKE)
    df.collect()
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_time_range_window_orders_on_epoch(spark):
    """B41 stays a single window pass on the JVM."""
    from euclid_spark.operators.relational import window_time_range_agg

    plan = _plan(window_time_range_agg(spark, SF_SMOKE))
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_no_corpus_shuffle(spark):
    """C34: the only exchange may carry the ONE-ROW stats aggregate —
    scoring is row-local and the top-k is TakeOrderedAndProject, so no
    corpus-wide shuffle or sort exists anywhere in the plan."""
    plan = _plan(textops.text_bm25_topk(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # exchanges: exactly the scalar-stats aggregate (+ its broadcast)
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles <= 1, plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_rag_chunks_zero_exchanges(spark):
    """C36: chunking is entirely row-local — no exchange of any kind."""
    plan = _plan(textops.text_rag_chunks(spark, SF_SMOKE))
    assert "Exchange" not in plan, plan


def test_winnowing_only_selected_fingerprints_shuffle(spark):
    """C41: the only exchange is the final distinct over the SELECTED
    fingerprints (sampled density), never the token stream."""
    plan = _plan(textops.text_winnowing(spark, SF_SMOKE))
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles <= 1, plan
    assert "EvalPython" not in plan


def test_state_diff_broadcasts_heights(spark):
    """A22: the two probe heights join in as broadcasts; the account
    join keys on the aggregation key."""
    plan = _plan(euclid.state_diff(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_unpivot_is_single_rollup(spark):
    """B45: stack is row-local — exactly the rollup's exchange."""
    plan = _plan(relational.unpivot_measures(spark, SF_SMOKE))
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles <= 1, plan


def test_cms_sketch_is_bounded_broadcast(spark):
    """B44: the probe side joins the sketch via broadcast (the sketch
    is 1024 cells by construction) and the top-N is TakeOrdered."""
    plan = _plan(relational.heavy_hitters_cms(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_range_tree_reads_tiles_not_range(spark, tmp_path, monkeypatch):
    """A25: both scans carry pushed filters (the tile (level, cell)
    cover and the sub-tile edge ranges), and the only SinglePartition
    exchanges are the two bounded final folds — the plan must never
    scan the range interior."""
    from euclid_spark.operators import range_tree

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    plan = _plan(range_tree.range_tree_agg(spark, SF_SMOKE))
    pushed = [
        seg[:300] for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("level" in s and "cell" in s for s in pushed), \
        "tile cover not pushed to the tiles scan"
    assert any("event_id" in s for s in pushed), \
        "edge ranges not pushed to the events scan"
    assert plan.count("Exchange SinglePartition") <= 2


def test_erc20_responses_served_plans_have_no_arrow(spark, tmp_path, monkeypatch):
    """r7: the response faces fold owner totals from the served leaf
    artifact — the Arrow u256 stage must appear ONLY at artifact
    build, never in the served query plan."""
    from euclid_spark.operators import merkle

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    # first call builds the artifacts (Arrow allowed there)
    merkle.erc20_verifiable_response(spark, SF_SMOKE).collect()
    for fn in (
        merkle.erc20_verifiable_response,
        merkle.erc20_batch_verifiable_responses,
    ):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "ArrowEvalPython" not in plan, f"{fn.__name__} re-runs the leaf"
        assert "BatchEvalPython" not in plan


def test_quantile_sketch_stays_jvm_side(spark):
    """B47: integer bucketing is pure column arithmetic — no Python
    anywhere, and the sketch aggregation is a plain hash aggregate."""
    from euclid_spark.operators import quantile_sketch

    plan = _plan(quantile_sketch.hdr_quantiles(spark, SF_SMOKE))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_leakage_split_serves_labels_no_python(spark, tmp_path, monkeypatch):
    """C46: one doc_id join against the served labels artifact; the
    bucket hash and split CASE are row-local JVM expressions — no
    Python stage, no pairwise join, no shuffle beyond the join."""
    from euclid_spark.operators.curation import curation_leakage_safe_split

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    df = curation_leakage_safe_split(spark, SF_SMOKE)
    df.collect()  # builds + serves the labels artifact, finalizes AQE
    plan = _plan(curation_leakage_safe_split(spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # served path: the labels come from the artifact store, not a
    # re-run of the pair pipeline (no shingle explode in the plan)
    assert "posexplode" not in plan.lower()


def test_event_dedup_window_no_self_join(spark):
    """B54: one lag window on the (user, type) key — no events×events
    time-range join, no Python stage, timestamp filter arithmetic in
    integer microseconds."""
    from euclid_spark.operators.timeseries import event_dedup_window

    plan = _plan(event_dedup_window(spark, SF_SMOKE))
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"unexpected {bad} in B54 plan"


def test_triangle_count_serves_ledger_no_cartesian(spark, tmp_path, monkeypatch):
    """C47: edges come from the served LSH pair ledger (no signature
    rebuild — no shingle explode in the plan); the wedge and closing
    joins are equi-joins, never a cartesian product; everything JVM."""
    from euclid_spark.operators.components import graph_triangle_count

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    df = graph_triangle_count(spark, SF_SMOKE)
    df.collect()  # builds + serves the pair-ledger artifact
    plan = _plan(graph_triangle_count(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "posexplode" not in plan.lower().replace("explode(array", "")


def test_no_keyed_sort_aggregate_in_events_rollups(spark):
    """r12: a KEYED SortAggregate means an aggregation buffer went
    immutable (struct / string) and Spark silently swapped the hash
    aggregate for a full sort of the shuffled rows — the regression
    class the max_by(value, NULLed-ordering) rewrite removed from the
    row-scaling events rollups. Keyless SortAggregate (a plain fold,
    e.g. string min/max in the profiler) is fine."""
    import re

    from euclid_spark.operators import timeseries

    for fn in (
        euclid.state_rollup,
        euclid.state_diff,
        timeseries.gap_fill_locf,
        relational.table_profile,
    ):
        plan = _plan(fn(spark, SF_SMOKE))
        m = re.search(r"SortAggregate\(key=\[[^\]]", plan)
        assert not m, f"{fn.__name__} plans a keyed SortAggregate"


def test_a20_reveal_bound_reaches_leaf_scan(spark):
    """r15: A20's orderBy+limit reveal bound cannot push through the
    path aggregation, so the face filters pos < L at the leaf source —
    the served leaf scan must carry the LessThan(pos) pushed filter
    (openings are built for revealed rows only, never the owner's
    whole token set)."""
    from euclid_spark.operators import merkle

    plan = _plan(merkle.verifiable_query_response(spark, SF_SMOKE))
    assert "LessThan(pos" in plan, "reveal bound not pushed to leaf scan"


def test_preprocessing_shares_one_day_owner_exchange(spark):
    """r15: the extraction cache is repartitioned on (day, owner) and
    materialized before consumers plan, so the partials aggregate must
    NOT re-shuffle on its (day, owner, bucket) key — no exchange keyed
    by the bucket _groupingexpression — and the acct cardinality
    counters must run as per-column two-level distinct aggregates over
    the co-partitioned cache, never as a Catalyst multi-distinct (whose
    Expand forces two exchanges of the ×4-expanded entry set)."""
    from euclid_spark.operators import preprocessing

    plan = _plan(preprocessing.preprocessing_pipeline(spark, SF_SMOKE))
    assert "REPARTITION_BY_COL" in plan
    assert "Expand" not in plan, "acct counters regressed to multi-distinct"
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "_groupingexpression" in line:
            raise AssertionError(
                f"partials re-shuffled despite shared exchange: {line}"
            )


def _logical_node_counts(df) -> "dict[str, int]":
    """Class-name counts over the OPTIMIZED logical plan tree (walked
    via children(), so a cached InMemoryRelation is a LEAF — its inner
    plan re-print never inflates the counts, the ADVICE r15 brittleness
    of substring counting). A parquet read in the main tree is a
    LogicalRelation node; a cache read is an InMemoryRelation node."""
    counts: dict[str, int] = {}

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        counts[name] = counts.get(name, 0) + 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return counts


def test_block_db_chain_plan_one_scan(spark):
    """r16: the per-day aggregate is pinned — the main chain join and
    the epoch-offset triangular join (two references) must ALL read the
    cache: no LogicalRelation (direct corpus scan) may remain in the
    main tree, and the pinned frame must appear more than once."""
    counts = _logical_node_counts(euclid.block_db_chain(spark, SF_SMOKE))
    assert counts.get("LogicalRelation", 0) == 0, counts
    assert counts.get("InMemoryRelation", 0) >= 2, counts
    assert "Exchange SinglePartition" not in _plan(
        euclid.block_db_chain(spark, SF_SMOKE)
    )


def test_pack_sequences_plan_one_scan(spark):
    """r16: pack_stream pins its tokenized proxy and the bucket totals —
    the triangular-offset build and the final join read the caches
    instead of re-running the per-document tokenization (3 corpus
    passes -> 1)."""
    counts = _logical_node_counts(textops.text_pack_sequences(spark, SF_SMOKE))
    assert counts.get("LogicalRelation", 0) == 0, counts
    assert counts.get("InMemoryRelation", 0) >= 3, counts


def test_epoch_shards_plan_one_scan(spark):
    """r16: _assignments_from_rows pins the shard-row proxy and bucket
    totals — one documents scan feeds the whole two-level prefix sum."""
    from euclid_spark.operators import curation

    counts = _logical_node_counts(
        curation.curation_epoch_shards(spark, SF_SMOKE)
    )
    assert counts.get("LogicalRelation", 0) == 0, counts
    assert counts.get("InMemoryRelation", 0) >= 3, counts


def test_preprocessing_shared_exchange_survives_disk_only_pin(spark, monkeypatch):
    """r16 (VERDICT r15 #4): at 100 TB the full-extraction pin runs
    DISK_ONLY so it never competes with execution memory (guide §5).
    The knob must not change the plan shape: still Expand-free, still
    one (day, owner) exchange, and the pinned frame really is
    disk-only."""
    from euclid_spark import cache
    from euclid_spark.operators import preprocessing

    monkeypatch.setenv("EUCLID_CORPUS_PIN_LEVEL", "DISK_ONLY")
    plan = _plan(preprocessing.preprocessing_pipeline(spark, SF_SMOKE))
    assert "REPARTITION_BY_COL" in plan
    assert "Expand" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "_groupingexpression" in line:
            raise AssertionError(
                f"partials re-shuffled despite shared exchange: {line}"
            )
    with cache._LOCK:
        levels = [d.storageLevel for d in cache._TRACKED]
    assert any(
        lv.useDisk and not lv.useMemory for lv in levels
    ), f"no disk-only pin registered: {levels}"


def test_range_join_bucketed_matches_direct_inequality(spark):
    """r15: the cell width is now narrower than the interval window —
    the rewrite must still equal the direct inequality join (the
    residual filter is exact whatever the bucket size)."""
    from pyspark.sql import functions as F

    from euclid_spark.operators.relational import (
        RANGE_DAYS,
        RANGE_WATCHLIST,
        _t,
        range_join_bucketed,
    )

    got = {
        (r["o_orderkey"], r["n_lines"], r["revenue"])
        for r in range_join_bucketed(spark, SF_SMOKE).collect()
    }
    big = _t(spark, SF_SMOKE, "orders").filter(
        F.col("o_custkey") < RANGE_WATCHLIST
    )
    li = _t(spark, SF_SMOKE, "lineitem")
    direct = (
        li.join(
            big,
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.col("l_shipdate")
                < F.date_add(F.col("o_orderdate"), RANGE_DAYS)
            ),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(24,8)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
    )
    want = {
        (r["o_orderkey"], r["n_lines"], r["revenue"])
        for r in direct.collect()
    }
    assert got == want
