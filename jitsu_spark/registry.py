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
# into driver-verified ones. Round-8 rotation: the NEW r8 entries lead
# (RFM / session stats / containment / MRL truncation / novelty), then
# every surface round 8 touched (zipf top-V rank, DSIR sum key, SCD2
# oracle cast, the invariant-carrying reports, the two-phase-topk
# consumers whose persist policy changed, profile_build whose UDAF path
# gained the isolation seam, jsonl roundtrip whose cache moved), then
# the layout/destination/identity/geo/gateway families (last driver-
# sampled r5-r7), then dedup/similarity/cluster staples. Names absent
# from the registry are ignored, so this list can't break imports when
# operators are renamed.
_PRIORITY = [
    # -- new in r8 --
    "rfm_segments", "session_stats_report", "containment_dup_pairs",
    "embedding_dim_truncation_report", "ngram_novelty_curve",
    "engagement_histogram", "dedup_cascade_report",
    "funnel_time_to_convert", "collocation_pmi_topk",
    "winnowing_fingerprints", "tfidf_top_terms",
    # -- touched in r8 --
    "zipf_fit_report", "dsir_select", "scd2_user_attribute",
    "pq_recall_report", "opq_train_report", "whitening_report",
    "pca_project_report", "bm25_topk", "hybrid_search_rrf",
    "binary_hamming_topk", "profile_build", "jsonl_ingest_roundtrip",
    "ngram_jaccard_dups", "user_burst_detection",
    "near_dup_gate_incremental", "quality_classifier_score",
    # -- layouts / destinations / identity / geo / gateway: r5-r7 rows --
    "layout_single_table_typed", "layout_segment_fanout",
    "layout_jitsu_legacy_typed", "ga4_mapping_typed",
    "mixpanel_mapping_typed", "hubspot_mapping_typed",
    "intercom_mapping_typed", "identity_stitch", "id_graph",
    "ur_backfill_enrich", "geo_enrich_range_join", "ua_parse_bot_filter",
    "sql_gateway_limit", "events_log_tail", "profile_traits_fold",
    # -- dedup / similarity / clustering staples --
    "dedup_exact", "minhash_signatures", "minhash_lsh_pairs",
    "simhash", "simhash_near_dups", "near_dup_clusters",
    "dedup_keep_list", "lsh_recall_report", "cosine_topk_bruteforce",
    "ann_ivf_topk", "ann_ivfpq_topk", "embedding_cluster_assign",
    "cluster_quality_report", "doc_feature_hash_embed",
    "embedding_int8_quantize", "media_feature_extract",
    # -- relational spot checks (full family driver-green r7) --
    "q1_pricing_summary", "q9_product_profit", "q21_waiting_suppliers",
]

QUERIES = {}
for _k in _PRIORITY:
    if _k in _ALL_QUERIES:
        QUERIES[_k] = _ALL_QUERIES[_k]
for _k, _v in _ALL_QUERIES.items():
    if _k not in QUERIES:
        QUERIES[_k] = _v
