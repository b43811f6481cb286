"""Aggregated query + oracle registries (the SURVEY.md §2 coverage surface).

Every operator module contributes QUERIES (name -> (spark, sf_dir) ->
DataFrame) and ORACLE (name -> DuckDB SQL). Names are stable contract keys:
the driver hash-compares each pair at sf0.01.
"""

from __future__ import annotations

from . import gateway, multimodal
from .events import destinations, destinations_crm, layouts
from .plans import throttle
from .operators import (
    asof,
    bpe,
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
)

_MODULES = [
    bpe,
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
]

_ALL_QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        assert _k not in _ALL_QUERIES, f"duplicate query name {_k}"
        _ALL_QUERIES[_k] = _v
    ORACLES.update(getattr(_m, "ORACLE", {}))

# The driver samples the FIRST ~50 entries in insertion order for its
# per-round correctness run (CORRECTNESS_r{N}.json). Rounds 1-4 always
# sampled the same module-order prefix, so the text/dedup/similarity/
# clustering/layout/gateway surface never received a driver row. Promote
# those entries to the front (q1 stays first as the smoke query; then the
# 33 never-driver-checked names; then the 27 checked only before r04) so
# round 5's sample converts judge-verified entries into driver-verified
# ones. Names absent from the registry are ignored, so this list can't
# break imports when operators are renamed.
_PRIORITY = [
    "q1_pricing_summary",
    # -- new in r5 --
    "bpe_learn_merges",
    "corpus_snapshot_diff",
    "quality_classifier_score",
    "tokenize_pack_pipeline",
    "pca_project_report",
    "bpe_trained_token_count",
    "token_budget_select",
    "duplicate_span_dedup",
    "embedding_int8_quantize",
    "pq_recall_report",
    # -- never driver-checked through r04 --
    "bpe_token_count", "url_stats_by_source", "length_histogram",
    "gopher_quality_flags", "repetition_stats", "pii_redact",
    "contamination_check", "chunk_documents", "quality_percentile_gate",
    "embedding_norm_stats", "near_dup_clusters", "lsh_recall_report",
    "dedup_keep_list", "boilerplate_shingle_stats", "ngram_topk",
    "duplicate_span_report", "unigram_surprisal", "semantic_dedup_keep_list",
    "embedding_cluster_assign", "cluster_quality_report",
    "cluster_prototype_prune", "cluster_balanced_sample",
    "semantic_curation_pipeline", "doc_feature_hash_embed",
    "text_semantic_dups", "ann_ivfpq_topk", "ann_ivfpq_bulk_topk",
    "embedding_near_dups_approx", "whitening_report",
    "hubspot_mapping_typed", "intercom_mapping_typed",
    "throttle_shed_events", "workspace_throttle_events",
    # -- last driver-checked before r04 --
    "series_correlation", "text_quality_score", "token_count_by_source",
    "lang_id_heuristic", "doc_fingerprint", "dedup_exact",
    "minhash_signatures", "minhash_lsh_pairs", "ngram_jaccard_dups",
    "simhash", "cosine_topk_bruteforce", "ann_ivf_topk",
    "embedding_cosine_dups", "knn_label_predict",
    "layout_single_table_typed", "layout_segment_fanout",
    "layout_jitsu_legacy_typed", "profile_build", "identity_stitch",
    "id_graph", "geo_enrich_range_join", "ua_parse_bot_filter",
    "sql_gateway_limit", "ga4_mapping_typed", "mixpanel_mapping_typed",
    "media_feature_extract", "incremental_rollup_equivalence",
]

QUERIES = {}
for _k in _PRIORITY:
    if _k in _ALL_QUERIES:
        QUERIES[_k] = _ALL_QUERIES[_k]
for _k, _v in _ALL_QUERIES.items():
    if _k not in QUERIES:
        QUERIES[_k] = _v
