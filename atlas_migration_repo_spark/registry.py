"""Named-query registry.

Every operator the engine claims (SURVEY.md §2) registers here exactly once:
a callable ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` /
``oracle_sql()`` are direct views over this dict, and the pytest harness
replays the driver's gate (row-count + schema + order-insensitive values)
against DuckDB locally before any query is declared.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None = None
    # tags: free-form markers ("streaming", "udf", "llm") used by bench/tests
    tags: frozenset[str] = field(default_factory=frozenset)


QUERIES: dict[str, QueryDef] = {}

# Keys that scale replays (tools/parity_replay.py) may record as
# "skipped" at sf1+, each with the standing justification. CI audits
# every committed PARITY_*.jsonl skip line against this dict
# (tests/test_docs_freshness.py) — an ad-hoc skip with no registered
# reason fails the suite, so the lone declared skip stays a pinned
# decision rather than a convention (VERDICT r8 "next" #6).
_EXACT_PAIR_SF10 = (
    "exact near-dup pair LISTING: candidate volume grows ~df^2 per "
    "shingle below the stop-shingle cap, and the round-9 sf10 run "
    "(500k near-dup-dense docs) measured the pair shuffle spilling past "
    "the sandbox's ~77 GB disk budget (java.io.IOException: No space "
    "left on device — recorded as fail lines in PARITY_SF10_r9.jsonl "
    "before this declaration). A real cluster sizes shuffle space in "
    "TBs, and the plan itself is the standard bounded-posting-list "
    "prune-then-verify (zero cartesians; sf1 hash-green in the "
    "full-registry log); the sf10-green scale siblings covering the "
    "semantics are dedup_near (MinHash LSH, 311 s) and dedup_simhash "
    "(174 s). Round-10 candidate: chunked pair materialization "
    "(partition the posting lists and verify per chunk) to fit "
    "fixed-disk boxes"
)

DECLARED_PARITY_SKIPS: dict[str, str] = {
    "fuzzy_match_names": (
        "declared quadratic-exact baseline (within-block all-pairs "
        "Levenshtein, kept as the unit-test ground truth); its scale "
        "shape fuzzy_match_banded computes the SAME pair set — equality "
        "unit-asserted at fixture scale (test_fuzzy_match_banded_equals_"
        "exact) — and replays green at sf1"
    ),
    "dedup_ngram_jaccard": _EXACT_PAIR_SF10,
    "dedup_containment": _EXACT_PAIR_SF10,
    "dedup_threshold_sweep": _EXACT_PAIR_SF10,
    "dedup_simhash_pairs": _EXACT_PAIR_SF10,
    "dedup_clusters": _EXACT_PAIR_SF10 + " (CC over the same pair graph)",
    "corpus_dedup_stages": _EXACT_PAIR_SF10 + " (staged composite over it)",
    "pipeline_corpus_clean": _EXACT_PAIR_SF10
    + " (composite whose dedup stage IS dedup_clusters)",
}

# The grading driver hash-verifies a PREFIX of the registry (first ~50
# entries in iteration order). Module import order alone would make that
# sample 3-4 modules deep, so after loading, the registry is reordered to
# put one representative of EVERY operator family first — scans, filters,
# aggregates, joins, windows, set ops, goldens, pivots, sources, ETL,
# subqueries, analytics, scalars, UDFs, streaming, text, dedup, pipeline,
# similarity, multimodal. Pure registration order; no semantics change.
# Round-8 rotation (protocol: VERDICT r3 "next" #4, re-affirmed every
# round since): ~20 fixed family representatives stay every round; the
# other ~30 slots rotate to oracle-gated registry keys the driver has
# NOT hash-verified in any prior round (r1∪…∪r7 covered 211 keys), so
# successive driver CORRECTNESS artifacts cumulatively cover the
# registry. This round fills the window with VERDICT r7 "next" #2's
# named list (join_asof_forward, feature_target_encode,
# quality_confusion_matrix, the outer stream-stream joins,
# udtf_analyze_dynamic, iceberg_row_lineage, hudi_metadata_files,
# delta_checkpoint_v2, lakehouse_uniform_dv_puffin) plus the queued
# candidate backlog (hudi bloom/async-compaction, the r7 corpus/feature
# keys, lakehouse sync pair, graph_shortest_cost, travel keys,
# sink_uniform_stream, geo_nearest_hub).
# Round-9 rotation: the queued candidate list from round 8,
# filled with the TPC-H golden tail, the window/setop/scalar batches,
# join_asof_nearest, and the text-family heads — all oracle-gated and
# never driver-sampled (verified against the r1-r8 artifact union).
# Round-10 rotation (this round, VERDICT r9 "next" #2): 30 fresh slots
# drawn from the queued candidates — remaining scalar batch (hash/array/
# map/explode/json), the sql_* surface, ts_* analytics, the dedup tail,
# events/orders analytics, and the text tail. Two fixed-rep slots
# (agg_grouping_sets, join_asof — both multiply driver-green, and their
# families keep another rep in the window) are lent to math_funcs and
# cast_types so the driver RE-verifies the two r9 hash fails with their
# dtype fixes in the same round.
# Round-11 rotation (this round, VERDICT r10 "next" #8): 32 fresh slots —
# the queued candidate list (str_* scalar tail, variant/xml/bitwise
# funcs, the udf family tail, win_* tail, embed_* family, stream_*
# leftovers, sink/source format batch) plus FIVE of this round's
# decimal→mantissa converted keys that the driver has never sampled
# (win_exclude_current, win_time_range, share_of_total, agg_weighted_avg,
# func_sql_udf — one per conversion shape: LOO subtraction, window msum,
# plain msum, decimal division, SQL-text msum), so CORRECTNESS_r11
# carries driver evidence for the riskiest r11 rewrite classes. The two
# slots lent to math_funcs/cast_types in r10 (both now driver-green)
# return to rotation. Cumulative driver coverage after r10: 301 keys.
# Round-12 rotation candidates (oracle-gated, never driver-sampled):
# the agg_* tail (agg_count_distinct_exact, agg_histogram_numeric-style
# keys), remaining ts_*/feature_* analytics, the iceberg/delta/hudi
# interop tails, graph_*, sketch_*, multimodal_* oracle-gated keys, and
# whatever this round's conversions leave unsampled (text_lm_score,
# text_lm_bigram, text_js_divergence, abc_classification, pct_change_mom,
# ts_time_weighted_avg, feature_zscore_normalize, orders_seasonality_index,
# xml_funcs if not drawn).
_DRIVER_SAMPLE_PREFIX = (
    # -- fixed family representatives (driver-green in r1-r6) -------------
    "scan_parquet",
    "filter_cmp",
    "agg_pricing_summary",
    "join_inner",
    "win_row_number",
    "topk_per_group",
    "sort_multi",
    "q3_shipping_priority",
    "pivot_status",
    "source_csv",
    "sink_parquet_partitioned",
    "scd2_history",
    "subq_correlated",
    "str_regexp",
    "udf_pandas",
    "stream_tumbling",
    "text_tfidf",
    "dedup_exact",
    # -- rotation (round 11): oracle-verified keys unseen by the driver
    # in r1-r10 (cumulative 301 keys covered), per VERDICT r10 "next" #8
    "str_mask",
    "str_collation",
    "str_url_funcs",
    "str_funcs2",
    "str_regexp_all",
    "str_printf",
    "variant_funcs",
    "xml_funcs",
    "bitwise_funcs",
    "udf_scalar",
    "udf_arrow_map",
    "udtf_table_arg",
    "udaf_grouped_arrow",
    "win_cume_dist",
    "win_percent_rank_nth",
    "win_nth_value",
    "win_lag_default",
    "embed_norm",
    "embed_cosine_hist",
    "embed_truncation_fidelity",
    "stream_dedup",
    "stream_global_agg",
    "stream_upsert_cdc",
    "sink_jsonl",
    "sink_csv_quoted",
    "source_xml",
    "source_text_lines",
    # -- r11 decimal→mantissa converted keys, never driver-sampled: one
    # per conversion shape so the driver re-proves the rewrites
    "win_exclude_current",
    "win_time_range",
    "share_of_total",
    "agg_weighted_avg",
    "func_sql_udf",
    # -- past the ~50-entry driver window. The r10 window block comes
    # first (kept listed for replay-tooling order stability), then the
    # earlier rotation blocks.
    "math_funcs",
    "cast_types",
    "hash_funcs",
    "array_funcs",
    "map_funcs",
    "explode_pos",
    "json_funcs",
    "sql_entrypoint",
    "sql_parameterized",
    "sql_group_by_all",
    "sql_pivot_clause",
    "sql_pipe_syntax",
    "ts_interp_linear",
    "ts_gap_detect",
    "ts_seasonal_decompose",
    "ts_holt_linear",
    "ts_bollinger_bands",
    "ts_downsample_ohlc",
    "dedup_fingerprint",
    "dedup_chunks",
    "dedup_keep_best",
    "dedup_incremental",
    "dedup_spans",
    "events_interarrival_histogram",
    "events_cumulative_unique_users",
    "orders_yoy_growth",
    "orders_cohort_ltv",
    "orders_gini_coefficient",
    "text_tokens",
    "text_fingerprint",
    "text_normalize",
    "text_pii_redact",
    "agg_grouping_sets",
    "join_asof",
    "q4_priority_check",
    "q6_forecast_revenue",
    "q8_market_share",
    "q11_important_stock",
    "q12_priority_lines",
    "q13_cust_distribution",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q19_disjunctive_filter",
    "q20_excess_shipments",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "join_asof_nearest",
    "win_moving_avg",
    "win_range_frame",
    "win_ntile",
    "win_first_last",
    "set_union_distinct",
    "set_except",
    "str_basic",
    "ts_funcs",
    "cond_expr",
    "text_stats",
    "text_ngram",
    "text_quality",
    "iceberg_merge_dv",
    "iceberg_eq_delete_dv",
    "set_except_all",
    "set_intersect_all",
    "join_asof_forward",
    "feature_target_encode",
    "quality_confusion_matrix",
    "stream_stream_left_join",
    "stream_stream_full_join",
    "udtf_analyze_dynamic",
    "iceberg_row_lineage",
    "hudi_metadata_files",
    "delta_checkpoint_v2",
    "lakehouse_uniform_dv_puffin",
    "hudi_compaction_async",
    "hudi_bloom_index",
    "corpus_shard_export",
    "corpus_shuffle_epochs",
    "text_gopher_rules",
    "tokenizer_oov_rate",
    "feature_winsorize",
    "ts_backtest_smape",
    "corpus_curriculum_order",
    "sample_negative_pairs",
    "iceberg_promote_evolution",
    "delta_stats_skipping",
    "sink_tablelog_txn",
    "lakehouse_uniform_sync",
    "lakehouse_uniform_reverse_sync",
    "graph_shortest_cost",
    "geo_nearest_hub",
    "fuzzy_match_banded",
    "iceberg_delete_dv",
    "hudi_column_stats",
    "delta_rename_travel",
    "delta_widen_travel",
    "sink_uniform_stream",
    "hudi_mor_upsert",
    "hudi_mor_read_optimized",
    "hudi_mor_delete",
    "hudi_compaction",
    "hudi_restore",
    "hudi_clean",
    "hudi_adopt_parquet",
    "hudi_adopt_append",
    "hudi_adopt_delta",
    "hudi_mor_incremental",
    "hudi_timeline_archive",
    "hudi_clustering_sorted",
    "sink_hudi_cdc",
    "stream_hudi",
    "lakehouse_uniform_hudi",
    "lakehouse_uniform_hudi_sync",
    "hudi_partition_pruning",
    "hudi_delete_cow",
    "hudi_insert_overwrite",
    "hudi_sink_txn",
    "hudi_event_range",
    "hudi_timeline",
    "sink_hudi_stream",
    "sample_importance_dsir",
    "graph_bfs_hops",
    "sketch_quantile_bottomk",
    "sketch_kmv_intersection",
    "pipeline_migrate_any",
    "delta_schema_evolution",
    "iceberg_schema_evolution",
    # -- family reps that keep the
    #    family-span invariant for modules already driver-covered, the
    #    r6-hashed lakehouse window (keeps ordering stable for replay
    #    tooling), plus rows-only entries (advisor: rows-only goes AFTER
    #    oracle-verified entries, never displacing them in the sample) ----
    "delta_roundtrip",
    "delta_checkpoint_read",
    "delta_merge",
    "delta_merge_partitioned",
    "delta_delete_range",
    "delta_cdf",
    "stream_delta_cdf",
    "delta_optimize",
    "delta_restore",
    "delta_convert_tablelog",
    "delta_sink_txn",
    "iceberg_roundtrip",
    "iceberg_partition_pruning",
    "iceberg_stats_skipping",
    "iceberg_hidden_partitioning",
    "iceberg_bucket_partitioning",
    "iceberg_incremental_scan",
    "iceberg_rename_travel",
    "iceberg_sink_txn",
    "lakehouse_uniform",
    "lakehouse_uniform_reverse",
    "delta_delete_dv",
    "delta_zorder",
    "delta_stream",
    "delta_adopt_tablelog",
    "hudi_roundtrip",
    "hudi_upsert_cow",
    "hudi_time_travel",
    "hudi_incremental",
    "hudi_clustering",
    "stream_watermark",
    "text_wordcount",
    "dedup_clusters",
    "source_avro",
    "merge_versioned",
    "table_log_changes",
    "stream_kafka_shaped",
    "pipeline_lakehouse_sync",
    "geo_haversine_pairs",
    "source_python_ds",
    "ts_ewma",
    "orders_rfm",
    "q14_promo_revenue",
    "graph_triangles",
    "sketch_countmin_estimate",
    "stream_stateful",
    "stream_stateful_ttl",
    "sink_foreachbatch",
    "pack_sequences",
    "multimodal_resize_ppm",
    "tokenizer_bpe_encode",
    "quality_logreg_score",
    "sim_knn_ann",
    "sim_semdedup",
    "sim_ann_index_sync",
    "sim_ann_index_topk",
    "dedup_containment",
)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a named query. Usage::

        @query("filter_cmp", oracle="SELECT ... FROM lineitem WHERE ...")
        def filter_cmp(spark, sf_dir):
            return load(spark, sf_dir, "lineitem").where(...)
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=frozenset(tags))
        return fn

    return deco


def load_all_modules() -> None:
    """Import every operator module so decorators populate QUERIES.

    Kept explicit (no pkgutil magic) so a broken module fails loudly and
    the import list is reviewable.
    """
    import importlib

    for mod in (
        "atlas_migration_repo_spark.operators.scans",
        "atlas_migration_repo_spark.operators.filters",
        "atlas_migration_repo_spark.operators.aggregates",
        "atlas_migration_repo_spark.operators.joins",
        "atlas_migration_repo_spark.operators.windows",
        "atlas_migration_repo_spark.operators.setops",
        "atlas_migration_repo_spark.operators.goldens",
        "atlas_migration_repo_spark.operators.goldens2",
        "atlas_migration_repo_spark.operators.pivots",
        "atlas_migration_repo_spark.operators.etl",
        "atlas_migration_repo_spark.operators.relational_ext",
        "atlas_migration_repo_spark.operators.analytics",
        "atlas_migration_repo_spark.operators.analytics2",
        "atlas_migration_repo_spark.operators.sketches",
        "atlas_migration_repo_spark.operators.graph",
        "atlas_migration_repo_spark.operators.geo",
        "atlas_migration_repo_spark.functions.scalars",
        "atlas_migration_repo_spark.functions.udfs",
        "atlas_migration_repo_spark.sources.files",
        "atlas_migration_repo_spark.sources.table_log",
        "atlas_migration_repo_spark.sources.kafka_shaped",
        "atlas_migration_repo_spark.sources.delta_interop",
        "atlas_migration_repo_spark.sources.iceberg_interop",
        "atlas_migration_repo_spark.sources.hudi_interop",
        "atlas_migration_repo_spark.sources.avro",
        "atlas_migration_repo_spark.streaming.windows",
        "atlas_migration_repo_spark.streaming.stateful",
        "atlas_migration_repo_spark.streaming.sinks",
        "atlas_migration_repo_spark.llm.text",
        "atlas_migration_repo_spark.llm.dedup",
        "atlas_migration_repo_spark.llm.pipeline",
        "atlas_migration_repo_spark.llm.similarity",
        "atlas_migration_repo_spark.llm.ann_index",
        "atlas_migration_repo_spark.llm.multimodal",
        "atlas_migration_repo_spark.llm.tokenizer",
        "atlas_migration_repo_spark.llm.quality_model",
    ):
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Modules land incrementally across milestones; only swallow
            # "THIS module doesn't exist yet". A typo'd internal import
            # inside an existing module (e.name != mod) must fail loudly,
            # or its whole query set silently vanishes from the registry.
            if e.name != mod:
                raise

    # tolerate absent names (modules land incrementally); a test asserts
    # the full prefix resolves once all modules are in
    present = [n for n in _DRIVER_SAMPLE_PREFIX if n in QUERIES]
    ordered = {n: QUERIES[n] for n in present}
    for n, qd in QUERIES.items():
        if n not in ordered:
            ordered[n] = qd
    QUERIES.clear()
    QUERIES.update(ordered)
