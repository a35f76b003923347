"""RocksDB large-state soak (round-4 verdict task 6).

The provider toggle is behavior-proven by
tests/test_streaming.py::test_streaming_state_green_under_rocksdb_provider,
but that run holds only a few thousand state rows. This soak exercises
state that is actually large: the at-least-once dedup pipeline
(`dropDuplicatesWithinWatermark` keyed by event_id — the same shape as
`streaming_dedup_counts`) over the ~sf1 replica's doubled event stream:
2M input rows, **1M+ distinct state keys**, run under the RocksDB
state-store provider in its own Spark session (fresh process: provider
class is a session-start decision in production, not a runtime flip).

Asserts, from the StreamingQuery progress telemetry:
  - the state operator reports >= EXPECT_KEYS rows in the store at
    completion (the state really went through RocksDB);
  - RocksDB custom metrics are present and non-trivial
    (rocksdbSstFileSize / memory usage counters exist in customMetrics);
  - state actually reached disk: max observed SST file size > 0 (the
    write buffer is shrunk to 1 MB so the ~1M-key load forces flushes);
  - dedup semantics hold: distinct event count == the batch COUNT(*).

Prints one JSON line with wall time + state metrics; SCALE.md records the
calm-run result.

Usage:  python tools/rocksdb_soak.py [sf_dir]   (default /tmp/sf_scaled_10x)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scaled_10x"
    if not os.path.isdir(sf_dir):
        print(f"replica missing: {sf_dir} (run tools/scale_gate.py first)")
        return 2

    from pyspark.sql import functions as F

    from data_pipeline_for_autonomous_vehicles_spark.session import get_spark
    from data_pipeline_for_autonomous_vehicles_spark.streaming.rules import stream_events

    spark = get_spark("rocksdb_soak", rocksdb_state_store=True)
    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    assert "RocksDBStateStoreProvider" in provider, provider
    # Round-6 verdict task: the SSD-backed claim must rest on OBSERVED SST
    # files, not configuration. 1M narrow keys fit RocksDB's default 64 MB
    # memtable, so nothing ever flushed; shrink the write buffer so the
    # soak's ~1M-key insert load forces memtable -> SST flushes, making
    # rocksdbSstFileSize a real disk observation.
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB", "1")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber", "2")

    n_batch = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id")
        .distinct()
        .count()
    )

    doubled = stream_events(spark, sf_dir).union(stream_events(spark, sf_dir))
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    counted = deduped.groupBy().count()

    t0 = time.time()
    q = (
        counted.writeStream.format("memory")
        .queryName("rocksdb_soak_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0

    # the dedup operator's state: one row per distinct event_id inside the
    # watermark horizon; scan all progress frames for its high-water mark
    state_rows_max = 0
    custom: dict = {}
    for p in q.recentProgress:
        for op in p.get("stateOperators", []):
            state_rows_max = max(state_rows_max, op.get("numRowsTotal", 0) or 0)
            if op.get("customMetrics"):
                # merge across ALL frames (a final frame without the
                # memory/SST counters must not erase an earlier one that
                # had them); per-key max keeps each counter's high-water
                for k, v in op["customMetrics"].items():
                    prev = custom.get(k)
                    if isinstance(v, (int, float)) and isinstance(prev, (int, float)):
                        custom[k] = max(prev, v)
                    else:
                        custom[k] = v

    n_stream = spark.table("rocksdb_soak_sink").collect()[0]["count"]

    expect_keys = n_batch  # every distinct event_id becomes a state row
    ok_state = state_rows_max >= expect_keys
    # Spark's RocksDB custom metric names: rocksdbSstFileSize,
    # rocksdbTotalMemoryUsageBytes, rocksdbPinnedBlocksMemoryUsage, ...
    rocks_metrics = {
        k: v
        for k, v in custom.items()
        if "sstfilesize" in k.lower() or "memoryusage" in k.lower()
    }
    # require the SPECIFIC counters this soak exists to observe, not just
    # any rocksdb-prefixed key (a name-filter miss must fail loudly)
    ok_rocks = any("sstfilesize" in k.lower() for k in custom) and any(
        "memoryusage" in k.lower() for k in custom
    )
    # the state must have actually hit disk: max observed SST bytes > 0
    sst_bytes = max(
        (int(v) for k, v in custom.items() if "sstfilesize" in k.lower()),
        default=0,
    )
    ok_sst = sst_bytes > 0
    ok_semantics = n_stream == n_batch

    print(
        json.dumps(
            {
                "metric": "rocksdb_soak",
                "sf_dir": sf_dir,
                "wall_sec": round(wall, 1),
                "distinct_keys": n_batch,
                "state_rows_max": state_rows_max,
                "stream_count": n_stream,
                "rocksdb_metrics_sample": dict(list(rocks_metrics.items())[:4]),
                "sst_bytes_max": sst_bytes,
                "ok_state_size": ok_state,
                "ok_rocksdb_metrics": ok_rocks,
                "ok_sst_on_disk": ok_sst,
                "ok_semantics": ok_semantics,
            }
        )
    )
    return 0 if (ok_state and ok_rocks and ok_sst and ok_semantics) else 1


if __name__ == "__main__":
    raise SystemExit(main())
