"""Aggregated query + oracle registries (the SURVEY.md §2 coverage surface).

Every operator module contributes QUERIES (name -> (spark, sf_dir) ->
DataFrame) and ORACLE (name -> DuckDB SQL). Names are stable contract keys:
the driver hash-compares each pair at sf0.01.
"""

from __future__ import annotations

from . import gateway, multimodal
from .events import destinations, destinations_crm, layouts
from .plans import throttle
from .sources import jsonl
from .operators import (
    asof,
    bloom,
    bpe,
    paragraphs,
    clustering,
    corpus,
    corpus_stats,
    dedup,
    embedding_prep,
    pq,
    events_ops,
    geo,
    identity,
    packing,
    profiles,
    quality_filters,
    quality_model,
    relational,
    relational_ext,
    reports,
    rollup,
    sampling,
    similarity,
    text_embed,
    text_ops,
    training_pipeline,
)

_MODULES = [
    bloom,
    bpe,
    paragraphs,
    relational,
    relational_ext,
    asof,
    sampling,
    packing,
    corpus,
    events_ops,
    reports,
    text_ops,
    quality_filters,
    quality_model,
    dedup,
    corpus_stats,
    training_pipeline,
    similarity,
    clustering,
    text_embed,
    pq,
    embedding_prep,
    layouts,
    profiles,
    identity,
    geo,
    gateway,
    destinations,
    destinations_crm,
    multimodal,
    rollup,
    throttle,
    jsonl,
]

_ALL_QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        assert _k not in _ALL_QUERIES, f"duplicate query name {_k}"
        _ALL_QUERIES[_k] = _v
    ORACLES.update(getattr(_m, "ORACLE", {}))

# The driver samples the FIRST ~50 entries in insertion order for its
# per-round correctness run (CORRECTNESS_r{N}.json). The prefix rotates
# each round so every family periodically converts judge-verified rows
# into driver-verified ones. Round-10 rotation (VERDICT r9 #2): q1
# first, then the NEW r10 entries (the frozen-artifact learn/apply
# splits, the perceptual-hash image family) and the surfaces r10
# touched (the slimmed ann_ivfpq_topk, the refactored simhash store),
# then the entries CORRECTNESS_r09.json did NOT sample, oldest checks
# first within VERDICT r9's ordering: the r8-new report/fingerprint
# families -> the retrieval/selection block -> the dedup/ANN/embedding
# families (incl. the r1-vintage cosine/IVF/knn entries, unchecked by
# the driver since round 1) -> the r4-vintage rollup/report block ->
# layouts/identity/geo. Names absent from the registry are ignored, so
# this list can't break imports when operators are renamed.
_PRIORITY = [
    "q1_pricing_summary",
    # -- new in r10 --
    "bloom_dedup_gate", "quality_threshold_sweep",
    "audience_overlap_sketch",
    "paragraph_dedup_docs", "paragraph_dup_stats", "source_overlap_matrix",
    "paragraph_dedup_incremental", "normalized_dedup_map",
    "training_shuffle_order",
    "audio_fingerprints", "audio_near_dup_pairs", "corpus_shard_manifest",
    "quality_score_fixed_model", "pca_project_fixed_basis",
    "image_perceptual_hashes", "image_near_dup_pairs",
    # -- touched in r10 --
    "ann_ivfpq_topk", "simhash", "simhash_near_dups",
    # -- r8-new families, last driver-checked r8 --
    "rfm_segments", "session_stats_report", "winnowing_fingerprints",
    "collocation_pmi_topk", "tfidf_top_terms", "scd2_user_attribute",
    "user_burst_detection", "ngram_novelty_curve", "zipf_fit_report",
    "events_log_tail",
    # -- retrieval / selection block --
    "bm25_topk", "hybrid_search_rrf", "dsir_select", "token_budget_select",
    # -- dedup / ANN / embedding families --
    "dedup_exact", "minhash_signatures", "minhash_lsh_pairs",
    "near_dup_gate_incremental", "near_dup_clusters", "lsh_recall_report",
    "dedup_keep_list", "cosine_topk_bruteforce", "ann_ivf_topk",
    "embedding_cosine_dups", "knn_label_predict", "binary_hamming_topk",
    "opq_train_report", "whitening_report",
    "embedding_dim_truncation_report", "pca_project_report",
    "embedding_int8_quantize", "embedding_binary_quantize",
    "text_semantic_dups", "embedding_near_dups_approx",
    # -- r1/r4-vintage rollup / report block --
    "media_feature_extract", "incremental_rollup_equivalence",
    "metrics_rollup_minute", "active_users_daily",
    "event_value_percentiles", "report_event_stat",
    "signup_no_purchase_except", "props_json_extract", "metrics_anomaly",
    "event_type_filter", "active_users_daily_approx",
    "report_rollup_totals",
    # -- layouts / identity / geo (last checked r8) --
    "layout_single_table_typed", "layout_segment_fanout",
    "layout_jitsu_legacy_typed", "profile_build", "identity_stitch",
    "id_graph", "geo_enrich_range_join", "ua_parse_bot_filter",
    "sql_gateway_limit", "ga4_mapping_typed", "mixpanel_mapping_typed",
    "hubspot_mapping_typed", "intercom_mapping_typed",
    "profile_traits_fold", "ur_backfill_enrich",
    # -- r6-vintage quality / corpus-stats tail --
    "series_correlation", "gopher_quality_flags", "repetition_stats",
    "pii_redact", "contamination_check", "quality_percentile_gate",
    "text_quality_score", "lang_id_heuristic", "token_count_by_source",
    "doc_fingerprint", "length_histogram", "unigram_surprisal",
    "url_stats_by_source", "chunk_documents", "embedding_norm_stats",
    "boilerplate_shingle_stats", "ngram_topk", "duplicate_span_report",
    "duplicate_span_dedup", "semantic_dedup_keep_list",
    "embedding_cluster_assign", "cluster_quality_report",
    "cluster_prototype_prune", "cluster_balanced_sample",
    "semantic_curation_pipeline", "doc_feature_hash_embed",
    "ann_ivfpq_bulk_topk", "throttle_shed_events",
    "workspace_throttle_events", "stratified_sample_documents",
    "train_test_split_documents", "source_mix_resample",
    "temperature_resample", "sequence_pack_bins", "leakage_safe_split",
    "corpus_prep_pipeline",
]

QUERIES = {}
for _k in _PRIORITY:
    if _k in _ALL_QUERIES:
        QUERIES[_k] = _ALL_QUERIES[_k]
for _k, _v in _ALL_QUERIES.items():
    if _k not in QUERIES:
        QUERIES[_k] = _v
