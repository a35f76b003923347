"""Round-8 optimization probe: per-query plan dump + isolated timing.

For each named query: dump `explain("formatted")` to <outdir>/<name>_<tag>.txt
and (optionally) time min-of-N executions into the noop sink — the guide §1
discipline (plan shape + isolated computation time, no sink cost).

Usage:

    python tools/opt_probe.py SF_DIR OUTDIR TAG N_RUNS QUERY [QUERY ...]

N_RUNS=0 dumps plans only (no timing). Prints one JSON line with timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_for_autonomous_vehicles_spark.caching import release_plan_caches
from data_pipeline_for_autonomous_vehicles_spark.operators import all_queries
from data_pipeline_for_autonomous_vehicles_spark.plans.audit import plan_text
from data_pipeline_for_autonomous_vehicles_spark.session import get_spark


def main() -> None:
    sf_dir, outdir, tag, n_runs = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
    names = sys.argv[5:]
    os.makedirs(outdir, exist_ok=True)
    queries = all_queries()
    spark = get_spark("opt_probe")
    # warmup: JVM + codegen at the smallest sf
    if n_runs:
        for w in ("q1_pricing_summary", "token_counts"):
            queries[w](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        release_plan_caches()
        spark.catalog.clearCache()
    timings: dict[str, float] = {}
    for name in names:
        df = queries[name](spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan_text(df))
        release_plan_caches()
        spark.catalog.clearCache()
        if n_runs:
            spark.sparkContext.setJobDescription(f"opt_probe:{name}")
            best = float("inf")
            for _ in range(n_runs):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            release_plan_caches()
            spark.catalog.clearCache()
            timings[name] = round(best, 3)
    print(json.dumps({"sf_dir": sf_dir, "tag": tag, "timings": timings}))


if __name__ == "__main__":
    main()
