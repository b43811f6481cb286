"""Scale-probe bench: measure queries at sf0.1 vs the derived 10x
dataset (tools/gen_scale_probe.py) and print per-query growth factors —
the empirical check of SCALING.md's sub-quadratic claims. A factor near
10 is linear; materially above ~15 on a 10x input (beyond shuffle/setup
noise) flags super-linear behavior.

Round 9 (VERDICT r8 #1): `--full` runs the WHOLE registry (not the
hand-picked probe list), emits a machine-readable report via `--out
BENCH_SCALE_r{N}.json`, and — given the previous round's file via
`--prev` — flags every entry whose growth ratio worsened >= 1.5x
round-over-round in the report's `regressions` key. The full mode also
benches a synthetic >2^20-distinct-value histogram through
`plans/cumsum.histogram_cnt_better`'s distributed branch, which every
real entry at test SF routes around via its declared
`small_value_space` bound.

Usage:
  python tools/bench_scale.py [sf1_dir]                  # legacy probe list
  python tools/bench_scale.py [sf1_dir] --full \
      --out BENCH_SCALE_r09.json [--prev BENCH_SCALE_r08.json]
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

# Synthetic bench: a histogram whose DISTINCT-value count exceeds 2^20,
# so histogram_cnt_better's distributed branch (range exchange + Arrow
# local prefix + partition-count offset window) actually executes under
# bench — the r8 verdict's deliberate nit: every real entry at test SF
# declares a small value space and takes the cheap window.
CUMSUM_BASE_N = 1 << 21


def _cumsum_distributed(spark, n: int):
    from jitsu_spark.plans.cumsum import histogram_cnt_better

    # n distinct values with a non-monotonic on-disk order (hash-mixed),
    # 1-3 rows per value
    df = spark.range(n).selectExpr(
        "cast(hash(id) as double) / 64.0 AS v",
        "cast(1 + pmod(id, 3) as int) AS w",
    )
    rows = df.selectExpr("v", "explode(array_repeat(1, w)) AS one").select(
        "v"
    )
    return histogram_cnt_better(rows, "v", small_value_space=False)


def main() -> None:
    args = [a for a in sys.argv[1:]]

    def _flag_val(flag: str) -> str | None:
        if flag in args:
            i = args.index(flag)
            if i + 1 >= len(args):
                raise SystemExit(f"{flag} requires a value")
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return None

    full = "--full" in args
    if full:
        args.remove("--full")
    out_path = _flag_val("--out")
    prev_path = _flag_val("--prev")
    sf1_dir = args[0] if args else "/tmp/spark_graft_sf1"
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

    probe = list(queries) if full else PROBE
    subset = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    if subset:
        probe = [n for n in subset.split(",") if n]
        unknown = [n for n in probe if n not in queries]
        if unknown:
            raise SystemExit(
                f"unknown probe queries: {unknown} (check spelling against "
                "the registry)"
            )

    from jitsu_spark.plans.store_builds import BUILDS
    from jitsu_spark.plans.topk import release_persisted

    count_rows = not full  # full mode skips the untimed row re-count

    report = {}
    store_builds: dict[str, list] = {}
    for name in probe:
        q = queries[name]
        times = {}
        for label, d in (("sf0.1", sf01_dir), ("sf1", sf1_dir)):
            n_builds = len(BUILDS)
            t0 = time.time()
            # noop write = full materialization of every column (count()
            # lets Catalyst prune computed columns, under-measuring
            # scan-heavy projections); row count taken untimed after
            q(spark, d).write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 2)
            times[label] = {"sec": sec}
            if count_rows:
                times[label]["rows"] = q(spark, d).count()
            if len(BUILDS) > n_builds:
                paid = BUILDS[n_builds:]
                store_builds[f"{name}@{label}"] = paid
                # whichever entry runs FIRST pays each memoized store
                # build — registry-order rotation then flips which entry
                # absorbs it, faking growth regressions (r10: the
                # rotated-to-front ann_ivfpq_topk read 3.5x gross but
                # 0.7x net). Track the net number and gate on IT.
                times[label]["sec_net_of_builds"] = round(
                    max(sec - sum(b["seconds"] for b in paid), 0.0), 2
                )
            release_persisted()
        growth = round(
            times["sf1"]["sec"] / max(times["sf0.1"]["sec"], 1e-9), 1
        )
        net1 = times["sf1"].get("sec_net_of_builds", times["sf1"]["sec"])
        net0 = times["sf0.1"].get(
            "sec_net_of_builds", times["sf0.1"]["sec"]
        )
        report[name] = {**times, "growth_10x": growth}
        if net1 != times["sf1"]["sec"] or net0 != times["sf0.1"]["sec"]:
            # a ledger-build cost can exceed the measured wall (clock
            # overlap), clamping a net time to ~0; dividing by the
            # epsilon would fabricate a ~1e9 "regression" (or, flipped,
            # a 0.0 that hides one). Below the clamp floor the net
            # number carries no signal — fall back to the gross ratio.
            if net0 > 0.05 and net1 > 0.05:
                report[name]["growth_10x_net"] = round(net1 / net0, 1)
        print(
            f"{name:32s} sf0.1={times['sf0.1']['sec']:7.2f}s  "
            f"sf1={times['sf1']['sec']:7.2f}s  growth={growth}x",
            flush=True,
        )

    if full:
        # the >2^20-value distributed prefix: base vs 10x value space
        times = {}
        for label, n in (("sf0.1", CUMSUM_BASE_N), ("sf1", CUMSUM_BASE_N * 10)):
            t0 = time.time()
            _cumsum_distributed(spark, n).write.format("noop").mode(
                "overwrite"
            ).save()
            times[label] = {"sec": round(time.time() - t0, 2), "n_values": n}
        growth = round(
            times["sf1"]["sec"] / max(times["sf0.1"]["sec"], 1e-9), 1
        )
        report["cumsum_distributed_prefix"] = {**times, "growth_10x": growth}
        print(
            f"{'cumsum_distributed_prefix':32s} "
            f"sf0.1={times['sf0.1']['sec']:7.2f}s  "
            f"sf1={times['sf1']['sec']:7.2f}s  growth={growth}x",
            flush=True,
        )

    # round-over-round regression gate: growth ratio worsened >= 1.5x
    regressions = {}
    if prev_path and os.path.exists(prev_path):
        with open(prev_path) as fh:
            prev = json.load(fh).get("queries", {})
        for name, cur in report.items():
            pe = prev.get(name, {})
            p = pe.get("growth_10x_net", pe.get("growth_10x"))
            g = cur.get("growth_10x_net", cur.get("growth_10x"))
            if p and g and p > 0 and g / p >= 1.5:
                regressions[name] = {"prev_growth": p, "growth": g}
        if regressions:
            print(
                "REGRESSIONS (growth ratio worsened >=1.5x): "
                + ", ".join(
                    f"{n} {v['prev_growth']}x->{v['growth']}x"
                    for n, v in sorted(regressions.items())
                ),
                flush=True,
            )
        else:
            print("no growth-ratio regressions vs " + prev_path, flush=True)

    result = {
        "metric": "scale_probe_growth",
        "mode": "full" if full else "probe",
        "n_queries": len(report),
        "queries": report,
        "store_builds": store_builds,
        "regressions": regressions,
        "prev": prev_path,
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
