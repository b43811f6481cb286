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
# into driver-verified ones. Round-7 rotation (r6 review item 2): the
# relational q-family last had driver rows in r4 — it leads; then every
# surface round 7 touches (BPE canonicalization, quality-model
# checkpoint fix, PQ zero-norm reporting, embedding-prep sort key,
# gateway allowlist, multimodal video gate, the composed incremental-
# corpus entry); then the events/funnel/sampling families last sampled
# r1-r4. Names absent from the registry are ignored, so this list can't
# break imports when operators are renamed.
_PRIORITY = [
    "q1_pricing_summary",
    # -- relational q-family: last driver-sampled r4 --
    "q2_min_cost_supplier", "q3_top_revenue_orders", "q4_priority_count",
    "q5_region_revenue", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q11_important_parts", "q12_late_priority_lines",
    "q13_order_count_distribution", "q14_promo_share", "q15_top_supplier",
    "q16_supplier_count_by_part", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_disjunctive_revenue", "q20_excess_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    # -- touched in r7 --
    "bpe_trained_token_count", "bpe_token_count", "bpe_learn_merges",
    "corpus_increment_pipeline", "simhash_near_dups", "bigram_lm_nll",
    "near_dup_gate_incremental", "quality_funnel_report",
    "quality_classifier_score",
    "bm25_topk", "dsir_select", "event_path_topk", "attribution_multi_touch",
    "retrieval_contamination", "jsonl_ingest_roundtrip",
    "bpe_fertility_by_lang", "metrics_gap_fill",
    "scd2_user_attribute", "length_outlier_mad",
    "embedding_binary_quantize", "binary_hamming_topk",
    "opq_train_report", "hybrid_search_rrf", "corpus_datacard",
    "dau_wau_mau", "user_burst_detection", "zipf_fit_report",
    "pq_recall_report", "whitening_report", "pca_project_report",
    "sql_gateway_limit", "media_feature_extract", "profile_build",
    "funnel_3step_windowed",
    # -- events / funnel / sampling families: last sampled r1-r4 --
    "sessionize", "metrics_rollup_minute", "active_users_daily",
    "active_users_daily_approx", "asof_signup_attribution",
    "funnel_signup_purchase", "retention_cohorts", "event_transitions",
    "event_transition_probs", "audience_overlap", "event_value_percentiles",
    "report_event_stat", "report_rollup_totals", "signup_no_purchase_except",
    "events_log_tail", "props_json_extract", "metrics_anomaly",
    "stratified_sample_documents", "train_test_split_documents",
    "source_mix_resample", "temperature_resample", "sequence_pack_bins",
    "leakage_safe_split", "corpus_prep_pipeline",
]

QUERIES = {}
for _k in _PRIORITY:
    if _k in _ALL_QUERIES:
        QUERIES[_k] = _ALL_QUERIES[_k]
for _k, _v in _ALL_QUERIES.items():
    if _k not in QUERIES:
        QUERIES[_k] = _v
