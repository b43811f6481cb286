"""In-process subset benchmark with job-count accounting (r13).

Measures registry entries with the bench.py methodology (unmeasured
warmup pass, then N interleaved measured passes, per-query median, noop
sink, keepalive, canary per pass) and ADDITIONALLY counts the Spark jobs
each query submits (construction + action) via a per-measurement job
group — the "serial stage/persist/checkpoint waves" quantity VERDICT r12
asked to drive down for the composed pipelines.

Usage:
  python tools/ab_bench.py q1,q2,... [--runs 5] [--out file.json]

Job counts come from the LAST measured pass (steady state: memoized
driver artifacts warm, persists rebuilt per pass).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    runs = 5
    out_path = None
    args = sys.argv[2:]
    while args:
        a = args.pop(0)
        if a == "--runs":
            runs = int(args.pop(0))
        elif a == "--out":
            out_path = args.pop(0)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32")

    from jitsu_spark.registry import QUERIES
    from jitsu_spark.session import get_spark
    from jitsu_spark.plans.topk import release_persisted

    spark = get_spark("ab-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def canary() -> float:
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

    keepalive = spark.range(0, 2 * cpus, 1, cpus).toDF("id")

    def _noop(batches):
        for b in batches:
            yield b

    QUERIES[names[0]](spark, "/root/testdata/sf0.001").count()
    canary()

    wall: dict[str, list[float]] = {n: [] for n in names}
    jobs: dict[str, int] = {}
    canaries: list[float] = []
    for pass_idx in range(-1, runs):
        measured = pass_idx >= 0
        c = canary()
        if measured:
            canaries.append(round(c, 3))
        for name in names:
            keepalive.mapInPandas(_noop, "id long").count()
            group = f"ab_{name}_{pass_idx}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            sc.setJobGroup(None, None)
            if measured:
                wall[name].append(round(sec, 3))
                jobs[name] = len(
                    sc.statusTracker().getJobIdsForGroup(group)
                )
            release_persisted()

    report = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "runs": runs,
        "canary_median": round(statistics.median(canaries), 3),
        "canaries": canaries,
        "median": {
            n: round(statistics.median(v), 3) for n, v in wall.items()
        },
        "wall": wall,
        "jobs_last_pass": jobs,
    }
    print(json.dumps(report, indent=1))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
