"""Scale-probe bench: measure the slowest query family at sf0.1 vs the
derived 10x dataset (tools/gen_scale_probe.py) and print per-query
growth factors — the empirical check of SCALING.md's sub-quadratic
claims. A factor near 10 is linear; materially above ~15 on a 10x input
(beyond shuffle/setup noise) flags super-linear behavior.

Usage: python tools/bench_scale.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "ngram_jaccard_dups",
    "near_dup_clusters",
    "dedup_keep_list",
    "id_graph",
    "ann_ivf_topk",
    "minhash_lsh_pairs",
    # round-4 additions: shingle-heavy corpus stats
    "duplicate_span_report",
    "boilerplate_shingle_stats",
    "unigram_surprisal",
    # round-4 additions: cluster curation + data-derived resampling
    "embedding_cluster_assign",
    "cluster_prototype_prune",
    "temperature_resample",
    # round-5 re-planned ranks + new linear scans
    "quality_percentile_gate",
    "cluster_balanced_sample",
    "bpe_trained_token_count",
    "token_budget_select",
    # round-5 late additions: tokenizer training, incremental diff,
    # model-based quality scoring
    "bpe_learn_merges",
    "corpus_snapshot_diff",
    "quality_classifier_score",
    # round-7 additions: retrieval, selection, journeys, attribution
    "bm25_topk",
    "dsir_select",
    "event_path_topk",
    "attribution_multi_touch",
    "retrieval_contamination",
    "jsonl_ingest_roundtrip",
    "bpe_fertility_by_lang",
    "metrics_gap_fill",
    "scd2_user_attribute",
    "length_outlier_mad",
    "embedding_binary_quantize",
    "binary_hamming_topk",
    "hybrid_search_rrf",
    "corpus_datacard",
    "opq_train_report",
    "dau_wau_mau",
    "user_burst_detection",
    "zipf_fit_report",
]


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    sf01_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf1_dir):
        raise SystemExit(
            f"{sf1_dir} missing — run tools/gen_scale_probe.py first"
        )

    from jitsu_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        "bench-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()

    # warm the JVM + Python-worker paths so sf0.1 isn't billed the spin-up
    queries["ngram_jaccard_dups"](spark, "/root/testdata/sf0.001").count()

    probe = PROBE
    subset = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    if subset:
        probe = [n for n in subset.split(",") if n]
        unknown = [n for n in probe if n not in queries]
        if unknown:
            raise SystemExit(
                f"unknown probe queries: {unknown} (check spelling against "
                "the registry)"
            )

    report = {}
    for name in probe:
        q = queries[name]
        times = {}
        for label, d in (("sf0.1", sf01_dir), ("sf1", sf1_dir)):
            t0 = time.time()
            # noop write = full materialization of every column (count()
            # lets Catalyst prune computed columns, under-measuring
            # scan-heavy projections); row count taken untimed after
            q(spark, d).write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 2)
            times[label] = {"sec": sec, "rows": q(spark, d).count()}
        growth = round(times["sf1"]["sec"] / max(times["sf0.1"]["sec"], 1e-9), 1)
        report[name] = {**times, "growth_10x": growth}
        print(
            f"{name:26s} sf0.1={times['sf0.1']['sec']:7.2f}s "
            f"({times['sf0.1']['rows']} rows)  "
            f"sf1={times['sf1']['sec']:7.2f}s "
            f"({times['sf1']['rows']} rows)  growth={growth}x",
            flush=True,
        )
    print(json.dumps({"metric": "scale_probe_growth", "queries": report}))
    spark.stop()


if __name__ == "__main__":
    main()
