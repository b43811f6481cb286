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
# into driver-verified ones. Round-9 rotation (VERDICT r8 #2): q1 first,
# then the NEW r9 entry and every surface r9 touched (the memoized
# pair-core consumers, the one-pass engagement histogram, the bounded
# funnel aggregate, the parity-carrying ANN entries, the relaxed recall
# gate, the symlink-refusing jsonl cache), then the 104 entries r8 did
# NOT sample: asof -> corpus increment -> the full q2-q22 relational
# block -> the sessionize/attribution/events family -> sampling/packing/
# corpus -> quality families (all last driver-checked r7). Names absent
# from the registry are ignored, so this list can't break imports when
# operators are renamed.
_PRIORITY = [
    "q1_pricing_summary",
    # -- new in r9 --
    "bpe_learned_token_count", "kneser_ney_bigram_nll",
    "source_unigram_kl", "distinct_ngram_diversity",
    "quantile_sketch_rollup", "c4_page_filter_report",
    # -- touched in r9 --
    "engagement_histogram", "funnel_time_to_convert",
    "ngram_jaccard_dups", "containment_dup_pairs",
    "dedup_cascade_report", "ann_ivfpq_topk", "pq_recall_report",
    "jsonl_ingest_roundtrip", "bpe_learn_merges",
    # -- rotation: unsampled in r8, last driver-checked r7 --
    "asof_signup_attribution", "corpus_increment_pipeline",
    "q2_min_cost_supplier", "q3_top_revenue_orders", "q4_priority_count",
    "q5_region_revenue", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q11_important_parts", "q12_late_priority_lines",
    "q13_order_count_distribution", "q14_promo_share", "q15_top_supplier",
    "q16_supplier_count_by_part", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_disjunctive_revenue", "q20_excess_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    # -- sessionize / attribution / events-reports family --
    "sessionize", "attribution_multi_touch", "dau_wau_mau",
    "event_path_topk", "funnel_signup_purchase", "retention_cohorts",
    "event_transitions", "event_transition_probs", "audience_overlap",
    "funnel_3step_windowed", "metrics_gap_fill", "metrics_rollup_minute",
    "active_users_daily", "event_value_percentiles", "report_event_stat",
    "signup_no_purchase_except", "props_json_extract", "metrics_anomaly",
    "series_correlation",
    # -- sampling / packing / corpus --
    "stratified_sample_documents", "train_test_split_documents",
    "source_mix_resample", "temperature_resample", "token_budget_select",
    "sequence_pack_bins", "leakage_safe_split", "tokenize_pack_pipeline",
    "corpus_prep_pipeline", "corpus_snapshot_diff", "corpus_datacard",
    # -- quality / text-analysis families --
    "gopher_quality_flags", "repetition_stats", "pii_redact",
    "contamination_check", "quality_percentile_gate",
    "quality_funnel_report", "text_quality_score", "lang_id_heuristic",
    "token_count_by_source", "doc_fingerprint", "length_histogram",
    "unigram_surprisal", "bigram_lm_nll", "length_outlier_mad",
    "bpe_trained_token_count", "bpe_fertility_by_lang", "bpe_token_count",
]

QUERIES = {}
for _k in _PRIORITY:
    if _k in _ALL_QUERIES:
        QUERIES[_k] = _ALL_QUERIES[_k]
for _k, _v in _ALL_QUERIES.items():
    if _k not in QUERIES:
        QUERIES[_k] = _v
