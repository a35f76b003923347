"""Measure a fused multi-artifact job versus its standalone runs.

Default mode — the fused curation job (round-6 verdict task 2): materializing
`substring_dup_removal` + `substring_dup_removal_audit` +
`curated_training_shards` in ONE job through a shared cached
`_removal_frame` (`corpus.fused_curation_frame`) versus the three
standalone runs, each of which re-derives the windows→islands→excision
pass. Same discipline as bench.py: noop sink, warmup pass, scoped cache
release between standalone runs.

    python tools/fused_bench.py [sf_dir]          # default: the ~sf1 replica
    python tools/fused_bench.py [sf_dir] boiler   # boilerplate removal+audit
                                                  # through fused_boiler_frame

Prints ONE JSON line: per-part walls for both modes plus totals. The
fused total is expected to be measurably below the standalone total —
the delta is the re-derived excision passes the cache removes. Recorded
in SCALE.md §"Fused curation job".
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from data_pipeline_for_autonomous_vehicles_spark.caching import release_plan_caches
from data_pipeline_for_autonomous_vehicles_spark.operators import corpus
from data_pipeline_for_autonomous_vehicles_spark.session import get_spark

PARTS = {
    "removal": corpus.substring_dup_removal,
    "audit": corpus.substring_dup_removal_audit,
    "shards": corpus.curated_training_shards,
}

BOILER_PARTS = {
    "removal": corpus.boilerplate_segment_removal,
    "audit": corpus.boilerplate_removal_audit,
}


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scaled_10x"
    mode = sys.argv[2] if len(sys.argv) > 2 else "curation"
    if mode not in ("curation", "boiler"):
        sys.exit(f"usage: fused_bench.py [sf_dir] [curation|boiler] (got {mode!r})")
    parts = BOILER_PARTS if mode == "boiler" else PARTS
    fused_builder = (
        corpus.fused_boiler_frame if mode == "boiler" else corpus.fused_curation_frame
    )
    warm = (
        corpus.boilerplate_segment_removal
        if mode == "boiler"
        else corpus.substring_dup_removal
    )
    spark = get_spark("fused_bench")
    # warmup: JVM + codegen on the smallest sf
    _noop(warm(spark, "/root/testdata/sf0.001"))
    release_plan_caches()
    spark.catalog.clearCache()

    standalone: dict[str, float] = {}
    for name, fn in parts.items():
        t0 = time.perf_counter()
        _noop(fn(spark, sf))
        standalone[name] = round(time.perf_counter() - t0, 2)
        release_plan_caches()
        spark.catalog.clearCache()

    fused: dict[str, float] = {}
    t0 = time.perf_counter()
    frame = fused_builder(spark, sf)
    for name, fn in parts.items():
        t1 = time.perf_counter()
        _noop(fn(spark, sf, frame))
        fused[name] = round(time.perf_counter() - t1, 2)
    fused_total = round(time.perf_counter() - t0, 2)
    release_plan_caches(blocking=True)
    spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "mode": mode,
                "sf_dir": sf,
                "standalone": standalone,
                "standalone_total": round(sum(standalone.values()), 2),
                "fused": fused,
                "fused_total": fused_total,
            }
        )
    )


if __name__ == "__main__":
    main()
