"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Round-10 protocol (VERDICT r9 #1 — load-robust measurement):
  (a) every memoized store (shingle pair core, LSH cluster map, SimHash
      table, IVF-PQ store, perceptual-hash table, JSONL export) is
      PRE-BUILT in a warmup phase and reported only under
      `store_builds["_prebuild"]`, so no query's headline number absorbs
      a build and per-entry deltas are comparable round over round;
  (b) each query runs N=3 MEASURED passes INTERLEAVED (full pass 1,
      full pass 2, full pass 3 — so a transient host-load spike degrades
      one pass of every query rather than all passes of a few) and
      reports the per-query MEDIAN. A full UNMEASURED warmup pass runs
      first: back-to-back full-run comparison (r10 validation) showed
      the first sweep of a session is uniformly 30-50% colder (codegen
      JIT per query, OS page cache, shuffle-service buffers) and keeps
      converging into pass 2-3, so medians that include it mix cold and
      warm regimes. The warmup pass is recorded under `warmup_pass` for
      transparency and excluded from every median;
  (c) a fixed synthetic CANARY (pure-JVM range aggregation, immune to
      code changes) is measured once per pass; `canary_median` and the
      canary-normalized headline (`value_canary_normalized` =
      value * CANARY_REF_SEC / canary_median) are reported alongside the
      raw value, so a uniform host-speed shift (the documented 1.45x
      r9 drift) is divided out while real plan regressions are not.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    # event pipeline
    "metrics_rollup_minute",
    "active_users_daily",
    "profile_traits_fold",
    "sessionize",
    "ur_backfill_enrich",
    "layout_single_table_typed",
    "ga4_mapping_typed",
    "geo_enrich_range_join",
    # identity + profiles
    "identity_stitch",
    "profile_build",
    # training-data ops
    "dedup_exact",
    "minhash_lsh_pairs",
    "cosine_topk_bruteforce",
    "media_feature_extract",
]

# Idle-host canary reference, calibrated once on the round-10 host
# (idle, driver's local[32], post-warmup) and FROZEN: every recorded
# value_canary_normalized from the r10 close onward is expressed
# against this constant, so changing it breaks round-over-round
# comparability. (The original calibration note listed only 4 of its
# 5 post-warmup samples [0.449, 0.372, 0.395, 0.339, —]; the 0.395
# median is the constant of record — review finding, late r10. If a
# future recalibration is ever needed, add a protocol note in
# BASELINE.md and restate prior rounds' normalized values.) A run
# whose canary_median is c executed on a host running at
# CANARY_REF_SEC / c of reference speed; multiplying raw wall times
# by that ratio maps them onto the reference host. Only meaningful at
# the standard SPARK_GRAFT_CPUS=32 (the canary scales with cores).
CANARY_REF_SEC = 0.395


def _canary_once(spark) -> float:
    """Fixed pure-JVM workload: a 200M-row range aggregation with a
    hash-heavy projection — saturates the same JVM/codegen/parallelism
    budget the queries use, touches no tables, and never changes when
    operators do."""
    t0 = time.time()
    (
        spark.range(0, 200_000_000, 1, 64)
        .selectExpr(
            "sum(id * 2) AS s",
            "sum(pmod(xxhash64(id), 1000003)) AS h",
            "avg(pmod(id, 97)) AS a",
        )
        .collect()
    )
    return time.time() - t0


def prebuild_stores(spark, sf_dir: str) -> list:
    """Pay every memoized store build up front; returns the ledger
    slice so the report shows what the warmup paid."""
    from jitsu_spark.multimodal import (
        _ensure_afp_store,
        _ensure_phash_store,
        _ensure_vfp_store,
    )
    from jitsu_spark.operators.dedup import (
        ensure_cluster_map,
        ensure_pair_shingle_counts,
        ensure_simhash_store,
    )
    from jitsu_spark.operators.pq import _ensure_store as ensure_ivfpq_store
    from jitsu_spark.operators.quality_model import ensure_quality_model
    from jitsu_spark.plans.store_builds import BUILDS
    from jitsu_spark.sources.jsonl import export_documents_jsonl

    n0 = len(BUILDS)
    ensure_pair_shingle_counts(spark, sf_dir)
    ensure_cluster_map(spark, sf_dir)
    ensure_simhash_store(spark, sf_dir)
    # r13: ensure_semantic_cluster_map is no longer prebuilt —
    # `semantic_dedup_keep_list` computes its labeling live again
    # (VERDICT r12 "What's wrong" #1: the r12 store-served branch made
    # that entry's bench number a store probe). The store builder remains
    # a product feature reachable via the explicit `clusters=` parameter.
    ensure_ivfpq_store(spark, sf_dir)
    _ensure_phash_store(spark, sf_dir)
    _ensure_afp_store(spark, sf_dir)
    _ensure_vfp_store(spark, sf_dir)
    ensure_quality_model(spark, sf_dir)
    export_documents_jsonl(spark, sf_dir)
    return list(BUILDS[n0:])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3") or "3")

    from jitsu_spark.registry import QUERIES
    from jitsu_spark.session import get_spark

    spark = get_spark("jitsu-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the tiny sf so first-query JIT cost doesn't
    # pollute the measurement.
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").count()
    # Python-worker warmup: the first Pandas-UDF query in a session pays
    # worker spawn + numpy import (~2s across 32 workers); pay it here so
    # per-query numbers reflect steady state regardless of registry order.
    QUERIES["media_feature_extract"](spark, "/root/testdata/sf0.001").count()
    QUERIES["knn_label_predict"](spark, "/root/testdata/sf0.001").count()
    _canary_once(spark)  # canary codegen warmup — first pass pays JIT

    # All registered queries, headline-first (round-over-round regressions
    # stay visible per query); SPARK_GRAFT_BENCH_QUERIES narrows the set.
    names = [n for n in HEADLINE if n in QUERIES] + [
        n for n in QUERIES if n not in HEADLINE
    ]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in QUERIES]

    # Keep Python workers alive across the run: Spark reaps idle pyspark
    # workers after ~60 s, so a Pandas-UDF query that happens to follow a
    # long JVM-only stretch would be billed 32 worker respawns + numpy
    # imports (~3-6 s of pure startup — measured on embedding_cosine_dups,
    # 1.2 s steady-state vs 8 s after reaping). The warmup above already
    # declares spawn cost out of scope; this keep-alive just makes that
    # hold for EVERY query position, independent of registry order.
    # one 2-row partition per core so every worker slot is touched
    keepalive_df = spark.range(0, 2 * cpus, 1, cpus).toDF("id")

    def _noop(batches):
        for b in batches:
            yield b

    # (a) prebuild phase — no query pays a memoized store build
    prebuilt = prebuild_stores(spark, sf_dir)
    from jitsu_spark.plans.store_builds import BUILDS

    runs: dict[str, list[float]] = {n: [] for n in names}
    canary_runs: list[float] = []
    warmup_pass: dict[str, float] = {}
    store_builds: dict[str, list] = {"_prebuild": prebuilt}
    from jitsu_spark.plans.topk import release_persisted

    # passes: one unmeasured warmup sweep (index -1), then n_runs
    # measured sweeps — identical code path so the warmup also JITs
    # every query's codegen and faults in its pages
    for pass_idx in range(-1, max(1, n_runs)):
        measured = pass_idx >= 0
        c = round(_canary_once(spark), 3)
        if measured:
            canary_runs.append(c)
        for name in names:
            keepalive_df.mapInPandas(_noop, "id long").count()
            n_builds = len(BUILDS)
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            # Materialize fully (all rows) without driver collect overhead.
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            if measured:
                runs[name].append(sec)
            else:
                warmup_pass[name] = sec
            if len(BUILDS) > n_builds:
                # a build the prebuild phase missed — attribute it so the
                # gap is visible, and only the FIRST pass pays it
                store_builds.setdefault(name, []).extend(BUILDS[n_builds:])
            # eager cache release between queries: scored-frame persists
            # are intra-query (two walks of one frame); holding them
            # across queries only pins block-manager memory (plans/topk.py)
            release_persisted()

    timings = {n: round(statistics.median(v), 3) for n, v in runs.items()}
    canary_median = round(statistics.median(canary_runs), 3)

    # Parameterized-retrieval workload side channel (round 9, VERDICT r8
    # #9): the 1000-query bm25/hybrid growth tracked per round so the
    # two-phase-rank shape's scaling regressions surface like any other
    # bench delta. Full-suite runs only — subset runs skip it. Median of
    # the same interleaved passes.
    retrieval_1000q: dict = {}
    if not extra:
        from jitsu_spark.operators.text_ops import (
            bm25_topk_df,
            hybrid_search_rrf_df,
            workload_queries_df,
        )
        from jitsu_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        qdf = workload_queries_df(docs, n_queries=1000)
        r1000_runs: dict[str, list[float]] = {}
        # same warmup-then-measure protocol as the main sweep
        for pass_idx in range(-1, max(1, n_runs)):
            for label, fn in (
                ("bm25_topk_df", bm25_topk_df),
                ("hybrid_search_rrf_df", hybrid_search_rrf_df),
            ):
                keepalive_df.mapInPandas(_noop, "id long").count()
                t0 = time.time()
                fn(docs, qdf).write.format("noop").mode("overwrite").save()
                if pass_idx >= 0:
                    r1000_runs.setdefault(label, []).append(
                        round(time.time() - t0, 3)
                    )
                release_persisted()
        retrieval_1000q = {
            k: round(statistics.median(v), 3) for k, v in r1000_runs.items()
        }
        retrieval_1000q["n_queries"] = 1000
        # canary-normalize the channel like the headline (VERDICT r10
        # "What's wrong" #1: the r10 raw numbers read as a regression
        # until divided by the host-speed canary)
        if canary_median > 0:
            for k in ("bm25_topk_df", "hybrid_search_rrf_df"):
                retrieval_1000q[f"{k}_normalized"] = round(
                    retrieval_1000q[k] * CANARY_REF_SEC / canary_median, 3
                )

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf
    # `value` stays the 17-query headline sum so it is comparable round
    # over round (BASELINE.md tracks that subset); the full-suite total is
    # reported alongside.
    headline_total = round(
        sum(t for n, t in timings.items() if n in HEADLINE), 3
    )
    # A narrowed run (env override) reports under a DIFFERENT metric name
    # with the subset recorded, so round-over-round comparisons of the
    # headline metric never silently compare different query sets.
    result = {
        "metric": (
            "headline_query_wall_seconds"
            if not extra
            else "custom_query_subset_wall_seconds"
        ),
        "value": headline_total if not extra else round(sum(timings.values()), 3),
        "unit": "sec",
        "all_queries_wall_seconds": round(sum(timings.values()), 3),
        "n_queries": len(timings),
        "n_runs_per_query": max(1, n_runs),
        "canary_median": canary_median,
        "canary_ref": CANARY_REF_SEC,
        "value_canary_normalized": round(
            (headline_total if not extra else sum(timings.values()))
            * CANARY_REF_SEC
            / canary_median,
            3,
        )
        if canary_median > 0
        else None,
        "queries": timings,
        "store_builds": store_builds,
        "retrieval_1000q": retrieval_1000q,
        "sf": sf_num,
    }
    if extra:
        result["query_subset"] = names
    print(json.dumps(result))
    # compact one-line tail summary LAST (VERDICT r10 "What's wrong"
    # #4): the driver's tail capture truncated the full dump in r10
    # (BENCH_r10 parsed: null) — a short final line always survives a
    # tail-capturing harness and carries the headline fields.
    print(json.dumps({
        "metric": result["metric"] + "_tail",
        "value": result["value"],
        "unit": "sec",
        "value_canary_normalized": result["value_canary_normalized"],
        "canary_median": canary_median,
        "all_queries_wall_seconds": result["all_queries_wall_seconds"],
        "n_queries": result["n_queries"],
        "sf": sf_num,
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
    }))
    # The driver records only the stdout tail, which has truncated the
    # headline value in past rounds (BENCH_r04). Persist the full summary
    # (plus the per-pass raw timings the stdout line omits) so
    # round-over-round comparison never depends on tail truncation —
    # full-suite runs only: a narrowed subset run must not clobber the
    # committed full summary.
    summary_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SUMMARY.json"
    )
    if extra:
        spark.stop()
        return  # subset runs never clobber the full-suite summary
    try:
        with open(summary_path, "w") as fh:
            full = dict(result)
            full["runs"] = runs
            full["canary_runs"] = canary_runs
            full["warmup_pass"] = warmup_pass
            json.dump(full, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout line remains the contract
    spark.stop()


if __name__ == "__main__":
    main()
