"""Physical-plan assertions: the scale properties SURVEY.md §4/§7 calls
for, locked in as tests so a refactor that silently loses pushdown, a
broadcast, or map-side partial aggregation fails here instead of at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from depositaja_spark import registry

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    return {
        name: plan_of(registry.QUERIES[name](spark, SF))
        for name in [
            "check_all",
            "valid_deposits",
            "balance_per_wallet",
            "tpch_q1",
            "tpch_q3_topk",
            "revenue_by_nation",
            "top3_customers_per_segment",
            "latest_flag",
        ]
    }


def test_filters_push_to_parquet_scan(plans):
    """P1 validation + the event-type predicate must reach the scan."""
    p = plans["valid_deposits"]
    assert "PushedFilters:" in p
    assert "EqualTo(event_type,purchase)" in p
    assert "GreaterThan(value,0.0)" in p


def test_scan_prunes_columns(plans):
    """The deposit mapping reads 4 of events' 6 columns — props and
    nothing else must never be scanned."""
    p = plans["valid_deposits"]
    assert "props" not in p


def test_check_all_broadcasts_flags_side(plans):
    """J1: the folded flag table is small → broadcast hash join, and both
    aggregations run with map-side partials."""
    p = plans["check_all"]
    assert "BroadcastHashJoin" in p
    assert "partial_sum" in p


def test_tpch_q1_partial_aggregation(plans):
    """Q1 is one shuffle with map-side combine: exactly one Exchange, with
    partial aggregation below it."""
    p = plans["tpch_q1"]
    assert "partial_sum" in p
    assert p.count("Exchange (") == 1


def test_q3_broadcasts_dimensions(plans):
    """Q3: filtered customer dimension broadcasts; date predicates reach
    both fact scans."""
    p = plans["tpch_q3_topk"]
    assert "BroadcastHashJoin" in p
    assert "PushedFilters" in p
    assert "c_mktsegment,BUILDING" in p.replace(" ", "")


def test_q5_single_fact_shuffle(plans):
    """Q5 shape: every dimension side broadcast — the only shuffle
    exchanges are for the fact join/agg, so SortMergeJoin must not appear."""
    p = plans["revenue_by_nation"]
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 4


def test_topk_single_shuffle(plans):
    """Top-k per group: one exchange on the partition key, then the rank
    filter — no second shuffle."""
    p = plans["top3_customers_per_segment"]
    assert p.count("Exchange (") == 1
    # Spark's rank-limit pushdown pre-filters to k rows per partition
    # BEFORE the shuffle — the property that makes top-k scale
    assert "WindowGroupLimit" in p


def test_latest_flag_fused_hash_aggregate(plans):
    """A4 fold (r13 fused form): the packed-long max aggregates partially
    before the shuffle AND stays a HashAggregate — the max_by(struct)
    formulation carries a struct buffer that degrades to SortAggregate
    with a per-partition sort on both sides of the exchange."""
    p = plans["latest_flag"]
    assert "partial_max" in p
    assert "SortAggregate" not in p
    assert "max_by" not in p


@pytest.fixture(scope="module")
def temporal_plans(spark):
    return {
        name: plan_of(registry.QUERIES[name](spark, SF))
        for name in ["asof_last_click", "purchase_error_pairs", "ann_topk_ivf"]
    }


def test_asof_join_single_exchange(temporal_plans):
    """The union-merge as-of join promises exactly ONE shuffle (on the key)
    — the property that separates it from the explode-then-rank naive
    formulation."""
    p = temporal_plans["asof_last_click"]
    assert p.count("Exchange (") == 1
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_range_join_is_equi_join(temporal_plans):
    """The binned range join must plan as a hash equi-join on (key, bin) —
    never a nested-loop over the inequality."""
    p = temporal_plans["purchase_error_pairs"]
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_ivf_ann_no_cartesian(temporal_plans):
    """IVF probe join is keyed on cell: no cross join anywhere in the
    candidate-generation plan (the whole point of the index)."""
    p = temporal_plans["ann_topk_ivf"]
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set is tiny by definition → its side of the
    contamination join must be a broadcast, so the corpus scan is never
    shuffled on the shingle."""
    p = plan_of(registry.QUERIES["decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_passage_dedup_single_passage_shuffle(spark):
    """Exact passage dedup is ONE hash exchange on the passage (the
    window partition key) — segmentation is row-local, so no other
    exchange may appear."""
    p = plan_of(registry.QUERIES["passage_dedup"](spark, SF))
    assert p.count("hashpartitioning(passage") == 1
    # the only other exchange is the test-fixture round-robin rebalance
    # (sources/tables.py:spread), never a second key shuffle
    assert p.count("hashpartitioning(") == 1


def test_mixture_sample_is_scan_local(spark):
    """Hash-threshold sampling is a row-local filter: no exchange at all,
    and column pruning keeps text out of the scan."""
    p = plan_of(registry.QUERIES["mixture_sample"](spark, SF))
    assert "hashpartitioning(" not in p


def test_train_val_split_no_shuffle(spark):
    p = plan_of(registry.QUERIES["train_val_split"](spark, SF))
    assert "hashpartitioning(" not in p


def test_pii_redact_no_shuffle(spark):
    """PII enrichment + redaction is a pure row-local projection — it must
    compile to scan → project with no exchange anywhere."""
    p = plan_of(registry.QUERIES["pii_redact"](spark, SF))
    assert "hashpartitioning(" not in p


def test_winnow_single_doc_exchange(spark):
    """Winnowing needs exactly one doc-keyed exchange (the sliding
    window-min); k-gram hashing and the encode/decode are row-local."""
    p = plan_of(registry.QUERIES["winnow_fingerprints"](spark, SF))
    assert p.count("hashpartitioning(doc_id") >= 1
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_tfidf_broadcasts_corpus_count(spark):
    """The 1-row corpus count joins by broadcast, never a shuffled cross
    join."""
    p = plan_of(registry.QUERIES["tfidf_top_terms"](spark, SF))
    assert "CartesianProduct" not in p


def test_q9_broadcasts_dims_and_pushes_part_filter(spark):
    """Q9 shape: part/supplier/nation are broadcast (no dim shuffle) and
    the p_name LIKE filter reaches the part scan."""
    p = plan_of(registry.QUERIES["profit_by_nation_year"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 3
    assert "widget" in p  # pushed into the part-side scan/filter


def test_q6_all_predicates_reach_scan(spark):
    """Q6 is scan + scalar combine: date/discount/quantity predicates all
    push into the parquet source, and no join appears anywhere."""
    p = plan_of(registry.QUERIES["forecast_revenue_change"](spark, SF))
    assert "PushedFilters" in p
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in p.split("PushedFilters", 1)[1][:400], frag
    assert "Join" not in p


def test_q15_scalar_max_from_aggregated_frame(spark):
    """Q15: lineitem is scanned once — the scalar max re-aggregates the
    per-supplier frame (ReusedExchange or a second small agg), never a
    second lineitem scan per branch plus no nested loop."""
    p = plan_of(registry.QUERIES["top_supplier_revenue"](spark, SF))
    assert "CartesianProduct" not in p
    # the date filter reaches the one fact scan
    assert "l_shipdate" in p.split("PushedFilters", 1)[1][:400]


def test_q21_exists_chains_are_hash_joins(spark):
    """Q21 shape: the EXISTS / NOT EXISTS pair must plan as left-semi and
    left-anti HASH joins on the order key plus a TakeOrdered top-10 —
    no sort of the full fact table, no nested loop."""
    p = plan_of(registry.QUERIES["waiting_suppliers"](spark, SF))
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_q2_argmin_window_partitions_on_partkey(spark):
    """Q2 shape: the argmin ranking window partitions on the
    high-cardinality part key (never a global or low-cardinality sort)
    and the p_size filter reaches the part scan."""
    p = plan_of(registry.QUERIES["min_cost_supplier"](spark, SF))
    assert "hashpartitioning(l_partkey" in p
    assert "TakeOrderedAndProject" in p
    assert "p_size" in p.split("PushedFilters", 1)[1][:600]


def test_q22_anti_join_on_pruned_orders_scan(spark):
    """Q22 shape: the NOT EXISTS is a left-anti join whose build side
    reads only o_custkey from orders (column pruning on the anti scan)."""
    p = plan_of(registry.QUERIES["global_sales_opportunity"](spark, SF))
    assert "LeftAnti" in p
    # the orders scan feeding the anti join must not read money columns
    orders_reads = [
        seg for seg in p.split("ReadSchema: ") if seg.startswith("struct<o_")
    ]
    assert any("o_totalprice" not in seg.split(">")[0] for seg in orders_reads)


def test_perplexity_buckets_no_lang_window(spark):
    """CCNet bucketing must label via broadcast bounds + CASE — a window
    partitioned by lang over the corpus would hot-spot one task."""
    p = plan_of(registry.QUERIES["perplexity_buckets"](spark, SF))
    assert "Window" not in p or "partitionBy" not in p  # no corpus window
    assert "BroadcastHashJoin" in p


def test_zipf_window_sees_only_topk(spark):
    """The Zipf ranking window consumes a TakeOrdered top-K frame, never
    the raw frequency table."""
    p = plan_of(registry.QUERIES["zipf_law_fit"](spark, SF))
    assert "TakeOrderedAndProject" in p


def test_zorder_keys_scan_local(spark):
    """The Morton key is pure projection bit math: the plan must contain
    NO Exchange — computing layout keys never shuffles."""
    p = plan_of(registry.QUERIES["zorder_layout_keys"](spark, SF))
    assert "Exchange" not in p
    assert "codegen id" in p  # the key projection runs inside codegen


def test_bloom_probe_joins_are_hash_joins(spark):
    """The bloom prefilter path: bitmap probe and exact verify are both
    equi hash joins (word_idx / shingle) — never nested-loop, and the
    raw document text never reaches an exchange (only doc_id + 60-bit
    hashes / fingerprints shuffle)."""
    p = plan_of(registry.QUERIES["incremental_dedup_bloom"](spark, SF))
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p
    for seg in p.split("Exchange hashpartitioning(")[1:]:
        keys = seg.split(")")[0]
        assert "text" not in keys


def test_cms_input_never_shuffles_raw_rows(spark):
    """Count-Min build: the only exchanges carry (row, pos) cells or the
    tiny probe frame — the events table itself is consumed map-side."""
    p = plan_of(registry.QUERIES["cms_event_counts"](spark, SF))
    assert "partial_count" in p  # map-side combine on the cell groupBy


def test_classifier_training_tokenizes_corpus_once(spark):
    """NB weights: the vocab aggregation feeds both the output and the
    normalizer — it must be a SHARED cached relation (both sides scan
    the same InMemoryRelation), not two independent corpus shuffles;
    the class-count sums map-side combine; the (tp, tn, v) normalizer
    attaches as a 1-row broadcast."""
    from depositaja_spark.functions.cache import release_caches

    try:
        p = plan_of(registry.QUERIES["domain_classifier_weights"](spark, SF))
        # tree nodes print as "InMemoryTableScan (n)" (the details
        # section uses "(n) InMemoryTableScan" — not counted)
        assert p.count("InMemoryTableScan (") == 2  # output + normalizer
        assert "partial_sum" in p  # map-side combine on the class counts
        assert "BroadcastExchange" in p  # the (tp, tn, v) 1-row frame
    finally:
        release_caches()


def test_classifier_scoring_vocab_join_not_hint_broadcast(spark):
    """The scoring join's vocabulary side must NOT carry a forced
    broadcast hint (AQE decides at runtime): the only broadcast
    exchanges in the plan are the 1-row normalizer/prior frames, which
    plan as single-partition aggregates."""
    df = registry.QUERIES["domain_classifier_scores"](spark, SF)
    # the analyzed plan records hints before the optimizer consumes them
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("UnresolvedHint") == 0  # all hints resolved
    # hint only on 1-row aggregates: the first Aggregate under every
    # ResolvedHint must have EMPTY grouping — an ungrouped Aggregate
    # prints one bracket list ("Aggregate [aggs]"), a grouped one prints
    # two ("Aggregate [keys], [outputs]")
    import re
    hints = list(re.finditer(r"ResolvedHint", analyzed))
    assert hints, "expected the 1-row normalizer broadcasts to be hinted"
    for m in hints:
        tail = analyzed[m.start() :]
        agg_line = next(
            ln for ln in tail.splitlines() if "Aggregate [" in ln
        )
        assert "], [" not in agg_line, (
            "broadcast hint sits above a GROUPED aggregate — an unbounded "
            f"frame is being force-broadcast: {agg_line[:160]}"
        )
    p = plan_of(df)
    assert "CartesianProduct" not in p


def test_triangle_count_all_keyed_joins(spark):
    """Degree-oriented wedge closure: every join in the plan is keyed
    (hash or sort-merge) — no nested loop anywhere, even though the
    naive formulation would be a 3-way near-cartesian."""
    p = plan_of(registry.QUERIES["copurchase_triangles"](spark, SF))
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p
    assert "LeftSemi" in p  # the closure join is a semi join


def test_fuzzy_join_dedups_before_pairing(spark):
    """The edit-distance join must run distinct BEFORE gram explode /
    pairing (values repeat ~30×; pairing first would square the
    multiplicity).  In the plan: a Deduplicate/HashAggregate over the
    raw name column feeds the gram explode, and the final verify is on
    candidate pairs only."""
    p = plan_of(registry.QUERIES["fuzzy_name_pairs"](spark, SF))
    assert "levenshtein" in p  # exact verify present
    assert "Generate explode" in p or "Generate" in p  # gram explode
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p


def test_check_many_probe_broadcasts_where_valid(spark):
    """The batch-probe lookup: both serving-table prunes are broadcast
    hash SEMI joins (the probe set builds, the table streams) — and the
    probe hint must NOT ride the outer left-outer assembly, where Spark
    rejects a build-left and silently drops the hint."""
    p = plan_of(registry.QUERIES["check_many"](spark, SF))
    semis = [ln for ln in p.splitlines()
             if "BroadcastHashJoin" in ln and "LeftSemi" in ln]
    assert len(semis) == 2


def test_span_gram_frame_is_shared(spark):
    """duplicated_positions' gram frame must be pinned: both the
    dup-gram aggregation and the position semi-join consume it, and an
    unpinned plan re-tokenizes + re-hashes the corpus per branch."""
    from depositaja_spark.functions.cache import release_caches

    try:
        p = plan_of(registry.QUERIES["duplicate_ngram_spans"](spark, SF))
        assert p.count("InMemoryTableScan (") >= 2  # both consumers read the cache
    finally:
        release_caches()


def test_dsir_feature_frame_is_shared(spark):
    from depositaja_spark.functions.cache import release_caches

    try:
        p = plan_of(registry.QUERIES["dsir_importance_weights"](spark, SF))
        assert p.count("InMemoryTableScan (") >= 2  # counts + scoring join
    finally:
        release_caches()


def test_embedder_sums_frame_is_shared(spark):
    from depositaja_spark.functions.cache import release_caches

    try:
        p = plan_of(registry.QUERIES["doc_hashed_embeddings"](spark, SF))
        assert p.count("InMemoryTableScan (") >= 2  # norm agg + normalization join
    finally:
        release_caches()


def test_semdedup_assignment_runs_once(spark):
    """The Arrow cluster-assignment UDF must appear in ONE live branch;
    every other reference reads the pinned frame."""
    from depositaja_spark.functions.cache import release_caches

    try:
        p = plan_of(registry.QUERIES["semantic_cluster_dedup"](spark, SF))
        assert p.count("InMemoryTableScan (") >= 2
    finally:
        release_caches()


def test_drop_reasons_partition_the_corpus(spark):
    """corpus_drop_reasons must classify EVERY document exactly once,
    and its 'kept' set must equal clean_corpus's survivors — the audit
    and the pipeline can never disagree."""
    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    reasons = {r.doc_id: r.reason for r in QUERIES["corpus_drop_reasons"](spark, sf).collect()}
    all_ids = {r.doc_id for r in load_table(spark, sf, "documents").select("doc_id").collect()}
    assert set(reasons) == all_ids
    kept = {d for d, r in reasons.items() if r == "kept"}
    survivors = {r.doc_id for r in QUERIES["clean_corpus"](spark, sf).collect()}
    assert kept == survivors
    assert set(reasons.values()) <= {
        "kept", "gate_quality", "gate_lang", "exact_dup", "near_dup"
    }
