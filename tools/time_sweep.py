"""Full-registry timing sweep: run EVERY queries() entry to completion at a
given SF directory and emit one JSON object {query: seconds} plus a total.
No oracle comparison (that's check_oracle.py) — this is the wall-clock net
for scale probes (SCALE.md §6).

Usage:
    python tools/time_sweep.py [sf_dir] [out.json] [only ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    only = set(sys.argv[3:])

    import __spark_entry__ as entrymod
    from data_pipeline_for_autonomous_vehicles_spark.session import get_spark

    spark = get_spark("time_sweep")
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(entrymod.queries().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            n = len(fn(spark, sf_dir).collect())
            times[name] = round(time.time() - t0, 3)
            print(f"{name}: {times[name]:.1f}s ({n} rows)", flush=True)
        except Exception as e:
            errors[name] = str(e).splitlines()[0][:200]
            print(f"FAIL {name}: {errors[name]}", flush=True)
        finally:
            from data_pipeline_for_autonomous_vehicles_spark.caching import release_plan_caches

            release_plan_caches()
            spark.catalog.clearCache()
    result = {
        "sf_dir": sf_dir,
        "n_queries": len(times),
        "total_sec": round(sum(times.values()), 1),
        "errors": errors,
        "queries": times,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({k: result[k] for k in ("sf_dir", "n_queries", "total_sec")}))
    print(f"{len(errors)} errors" + (f": {sorted(errors)}" if errors else ""))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
