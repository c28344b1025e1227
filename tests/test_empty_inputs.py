"""Empty-input robustness: every composite operator must return an empty
(or well-defined) result on a zero-row frame, never throw — the
behavior a scheduled 100 TB pipeline needs on an empty partition day."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
        ])
    )


def test_jaccard_pairs_empty(spark, empty_docs):
    import depositaja_spark.functions.dedup as dd

    assert dd.jaccard_pairs(empty_docs, n=3, threshold=0.1).count() == 0


def test_dedup_clusters_empty(spark, empty_docs):
    import depositaja_spark.functions.dedup as dd
    from depositaja_spark.functions.graph import dedup_clusters

    pairs = dd.jaccard_pairs(empty_docs, n=3, threshold=0.1)
    assert dedup_clusters(empty_docs, pairs).count() == 0


def test_clean_corpus_empty(spark, empty_docs):
    from depositaja_spark.plans.corpus_pipeline import clean_corpus

    assert clean_corpus(empty_docs).count() == 0


def test_incremental_dedup_empty_increment(spark, empty_docs):
    import depositaja_spark.functions.dedup as dd
    from depositaja_spark.sources import load_table

    old = load_table(spark, "/root/testdata/sf0.001", "documents")
    assert dd.incremental_dedup(old, empty_docs).count() == 0


def test_resample_empty(spark):
    from depositaja_spark.functions.temporal import resample_ffill

    empty_events = spark.createDataFrame(
        [], T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ])
    )
    assert resample_ffill(empty_events).count() == 0


def test_bpe_train_empty(spark, empty_docs):
    from depositaja_spark.functions.bpe import bpe_train

    assert bpe_train(empty_docs, num_merges=3) == []


def test_new_ops_deterministic_under_partitioning(spark):
    """The round-2 operators must return identical results regardless of
    input partitioning — no collect-order or partition-count dependence."""
    from depositaja_spark import registry
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    for name in ["winnow_fingerprints", "line_dedup", "tfidf_top_terms",
                 "weighted_sample_fixed_k", "incremental_dedup"]:
        a = {tuple(r) for r in registry.QUERIES[name](spark, sf).collect()}
        b = {
            tuple(r)
            for r in registry.QUERIES[name](spark, sf).repartition(7).collect()
        }
        assert a == b, f"{name} not partition-stable"


def test_bucketed_running_sum_empty(spark):
    from depositaja_spark.functions.windows import bucketed_running_sum

    df = spark.createDataFrame([], "doc_id long, lang string, n_tokens int")
    assert bucketed_running_sum(df, ["lang"], "doc_id", "n_tokens").count() == 0


def test_incremental_dedup_empty_increment(spark, empty_docs):
    """Empty increment against a non-empty history: no decisions, no
    throw — the empty-partition-day contract for the streaming loop."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.dedup import incremental_dedup

    old = spark.createDataFrame(
        [(1, "some history document text here")], "doc_id long, text string"
    )
    new = empty_docs.select("doc_id", "text")
    assert incremental_dedup(old, new).count() == 0
    release_caches()


def test_classifier_empty_corpus(spark, empty_docs):
    """Zero training docs: empty vocab, and scoring any frame against it
    yields prior-only scores without throwing."""
    from depositaja_spark.functions import classifier as clf

    w = clf.token_log_odds(empty_docs, F.col("source") == "src1")
    assert w.count() == 0
    held = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    (row,) = clf.score_documents(held, w, prior=1.5).collect()
    assert row["score"] == 1.5


def test_pagerank_empty_edges(spark):
    from depositaja_spark.functions.pagerank import pagerank

    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank(e, iterations=2).count() == 0


def test_triangle_count_empty_edges(spark):
    from depositaja_spark.functions.graph import triangle_count

    e = spark.createDataFrame([], "src long, dst long")
    (row,) = triangle_count(e).collect()
    assert row["n_triangles"] == 0


def test_k_core_empty_edges(spark):
    from depositaja_spark.functions.graph import k_core

    e = spark.createDataFrame([], "src long, dst long")
    assert k_core(e, k=2).count() == 0


def test_fuzzy_empty_strings_frame(spark):
    from depositaja_spark.functions.fuzzy import edit_distance_pairs

    e = spark.createDataFrame([], "s string")
    assert edit_distance_pairs(e, "s", max_dist=2).count() == 0


def test_spans_empty_corpus(spark, empty_docs):
    from depositaja_spark.functions import spans as sp

    d = empty_docs.select("doc_id", "text")
    assert sp.duplicate_spans(d).count() == 0
    assert sp.clip_duplicate_spans(d).count() == 0


def test_semdedup_empty_corpus(spark):
    from depositaja_spark.functions.similarity import semdedup

    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = semdedup(e, k=2, iterations=1)
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "cluster", "keep"}


def test_kmeans_empty_corpus_raises_clearly(spark):
    import pytest as _pytest

    from depositaja_spark.functions.kmeans import kmeanspp_seed

    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="non-empty"):
        kmeanspp_seed(e, k=2)


def test_dsir_features_empty_corpus(spark, empty_docs):
    from depositaja_spark.queries_ml import _hashed_feature_buckets

    assert _hashed_feature_buckets(empty_docs.select("doc_id", "text")).count() == 0


# --- round-7 operators --------------------------------------------------------


def test_prefix_jaccard_empty(spark, empty_docs):
    import depositaja_spark.functions.dedup as dd

    assert dd.prefix_jaccard_pairs(empty_docs, n=3, threshold=0.3).count() == 0


def test_skyline_empty(spark):
    from depositaja_spark.functions.skyline import skyline_2d

    df = spark.createDataFrame([], "id long, x double, y double")
    assert skyline_2d(df, "x", "y").count() == 0
    # all-NULL coordinates behave like empty (documented exclusion)
    df2 = spark.createDataFrame([(1, None, None)], "id long, x double, y double")
    assert skyline_2d(df2, "x", "y").count() == 0


def test_hard_negatives_empty(spark):
    from depositaja_spark.functions.similarity import (
        hard_negative_pairs,
        hard_negative_pairs_ivf2,
    )

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert hard_negative_pairs(emb).count() == 0
    assert hard_negative_pairs_ivf2(emb).count() == 0


def test_frequent_triples_empty(spark):
    from depositaja_spark.functions.mining import frequent_triples

    li2 = spark.createDataFrame([], "ok long, p long")
    assert frequent_triples(li2, 2).count() == 0


def test_personalized_pagerank_seeds_only(spark):
    """Empty edge set but non-empty seeds: the seeds hold all the mass
    (each iteration returns it through the dangling term)."""
    from depositaja_spark.functions.pagerank import personalized_pagerank

    e = spark.createDataFrame([], "src string, dst string")
    sd = spark.createDataFrame([("a",), ("b",)], "id string")
    got = {r.id: r.pr for r in personalized_pagerank(e, sd, iterations=2).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_ahash_pairs_empty(spark):
    from depositaja_spark.functions.multimodal import ahash_dup_pairs

    h = spark.createDataFrame([], "doc_id long, ahash long")
    assert ahash_dup_pairs(h).count() == 0


def test_asof_forward_empty_right(spark):
    from depositaja_spark.functions.temporal import asof_join

    left = spark.createDataFrame(
        [("k", 100)], "k string, ts long"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame([], "k string, ts timestamp, v string")
    (row,) = asof_join(left, right, on="k", direction="forward").collect()
    assert row.v_asof is None


def test_compact_empty_table(spark, tmp_path):
    from depositaja_spark.functions.layout import compact_table

    src = str(tmp_path / "src")
    spark.createDataFrame([], "a long, b string").write.parquet(src)
    out = compact_table(spark, src, str(tmp_path / "dst"), n_files=4)
    assert out.count() == 0


def test_session4_queries_empty_tables(spark, tmp_path):
    """Every session-4 registry query returns zero rows (never throws —
    no hidden 0/0 under the ANSI session, no unguarded collect) when its
    input tables are empty: the empty-partition-day contract."""
    from depositaja_spark import registry

    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    for name in [
        "mann_kendall_daily_trend", "interarrival_burstiness",
        "ks_test_value_dist", "mannwhitney_value_dist",
        "chi2_type_hour_independence", "spearman_daily_corr",
        "hourly_crosscorr_leadlag", "copurchase_link_prediction",
        "gini_split_stump", "hilbert_layout_keys",
        "signup_purchase_latency", "abc_part_classification",
        "classifier_auc", "markov_steady_state",
        "ab_conversion_ztest", "cuped_variance_reduction",
        "kfold_split_balance",
    ]:
        assert registry.QUERIES[name](spark, str(tmp_path)).count() == 0, name


def test_round9_queries_empty_tables(spark, tmp_path):
    """Round-9 queries under empty inputs: the zero-row set returns zero
    rows without throwing; the two profiling queries keep their fixed
    shape (a profile of an empty table is still a profile); the scalar
    folds degrade to a single all-NULL/zero row consistently with their
    oracles."""
    from depositaja_spark import registry

    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")

    d = str(tmp_path)
    for name in [
        "kaplan_meier_conversion", "weighted_sample_topk",
        "rolling_7d_active_users", "retrieval_eval_at_k",
        "brier_decomposition", "png_decode_stats",
        "copurchase_bfs_hops", "copurchase_degree_ccdf",
        "kmeans_cluster_sizes", "anova_value_by_type",
        "nelson_aalen_conversion", "vocab_growth_heaps",
        "calibration_curve", "token_pmi_topv", "doc_ngram_novelty",
        "user_value_time_decay", "user_event_entropy",
        "logrank_test_conversion", "ols_value_hour_dow", "pinball_loss_backtest",
        "copurchase_modularity", "hits_user_part",
        "changepoint_daily_value", "source_ngram_overlap_matrix",
        "cohort_ltv_matrix", "max_drawdown_daily", "missing_hours_report",
        "isotonic_calibration", "classifier_gains_table", "classifier_ks",
        "copurchase_clustering_coeff", "ship_latency_by_priority",
        "discount_effect_profile", "order_size_histogram",
        "holt_winters_daily_value", "jpeg_decode_stats", "image_ahash_dups",
        "hard_negative_pairs_ivf", "semdedup_sqrt_cells",
        "wav_decode_stats", "y4m_frame_stats", "payload_byte_histogram",
    ]:
        assert registry.QUERIES[name](spark, d).count() == 0, name

    prof = {
        r.col_name: (r.n_rows, r.n_null, r.n_distinct)
        for r in registry.QUERIES["events_profile"](spark, d).collect()
    }
    assert len(prof) == 6 and all(v == (0, 0, 0) for v in prof.values())

    (pk,) = registry.QUERIES["orders_pk_audit"](spark, d).collect()
    assert pk.n_keys == 0


def test_dq_checks_empty_is_six_zero_rows(spark, tmp_path):
    """The constraint audit keeps its fixed 6-row shape on an empty
    table — a clean/empty table is six visible zero rows, not silence."""
    from depositaja_spark import registry

    spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    rows = registry.QUERIES["lineitem_dq_checks"](spark, str(tmp_path)).collect()
    assert len(rows) == 6
    assert all(r.n_rows == 0 and r.n_violations == 0 for r in rows)


def test_weighted_sssp_empty_graph(spark):
    from depositaja_spark.functions.graph import weighted_sssp

    edges = spark.createDataFrame([], "u long, v long, w long")
    seeds = spark.createDataFrame([], "node long")
    assert weighted_sssp(edges, seeds, rounds=3).count() == 0


def test_weighted_pagerank_empty(spark):
    from depositaja_spark.functions.pagerank import weighted_pagerank

    edges = spark.createDataFrame([], "src string, dst string, w long")
    assert weighted_pagerank(edges, iterations=2).count() == 0


def test_jaro_winkler_pairs_empty_sides(spark):
    from depositaja_spark.functions.fuzzy import jaro_winkler_pairs

    empty = spark.createDataFrame([], "q string")
    corpus = spark.createDataFrame([("widget",)], ["c"])
    assert jaro_winkler_pairs(empty, corpus, q_col="q", c_col="c").count() == 0
    both = spark.createDataFrame([], "c string")
    assert (
        jaro_winkler_pairs(
            spark.createDataFrame([("x",)], ["q"]), both, q_col="q", c_col="c"
        ).count()
        == 0
    )


def test_readability_empty(spark, empty_docs):
    from depositaja_spark.queries_gov import readability_doc_metrics

    assert readability_doc_metrics(empty_docs).count() == 0


def test_interval_month_counts_empty(spark):
    from depositaja_spark.queries_gov import interval_month_counts

    iv = spark.createDataFrame([], "s timestamp, e timestamp")
    assert interval_month_counts(iv).count() == 0


def test_adpcm_empty_stream():
    import numpy as np

    from depositaja_spark.functions.multimodal import adpcm_decode, adpcm_encode

    assert adpcm_encode(np.array([], np.int64)) == b""
    assert adpcm_decode(b"", 0).tolist() == []
