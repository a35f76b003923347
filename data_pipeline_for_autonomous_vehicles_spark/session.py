"""SparkSession factory.

Tuned for the local[N] test/bench harness but with settings that hold on a
real multi-executor cluster (AQE on, UTC session TZ, Arrow enabled). At
cluster scale the same code runs unchanged: shuffle partition count and
broadcast thresholds are the knobs an operator would override per-deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_pipeline_for_autonomous_vehicles_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults follow the local-mode guidance: shuffle partitions ≈ cores
    (not 200), AQE enabled for runtime re-planning (skew joins, partition
    coalescing), UTC timezone so timestamp semantics match the ANSI oracle,
    and Arrow for any pandas interchange.

    ``rocksdb_state_store=True`` switches Structured Streaming state to the
    RocksDB provider (bundled rocksdbjni). The default HDFS-backed store
    holds every key's state on-heap — the known cliff for 100 M-key
    sessionization at production scale; RocksDB spills state to local SSD
    with bounded heap. State semantics are identical (the streaming suite
    runs green under either provider); flip it for any large-state
    deployment. Note: provider is fixed per query's checkpoint lineage —
    restarting an existing checkpoint under a different provider fails, so
    toggle only with fresh checkpoints.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            n = int(cpus) if cpus else (os.cpu_count() or 8)
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(4, n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark's 10 MB default broadcast cutoff is sized for laptops; on the
        # target deployment (>=4 GB/core, SCALE.md §1) every true dimension
        # of this schema fits comfortably at 64 MB, keeping q5/q21-class
        # multi-dim joins broadcast even when dimensions grow 100x.
        # Caveat (round-2 advice): a STATICALLY chosen broadcast — picked
        # from compressed parquet scan estimates — is never demoted at
        # runtime; AQE can only upgrade/downgrade joins at shuffle-stage
        # boundaries, and columnar compression can understate in-memory
        # build size several-fold. Budget accordingly: 64 MB parquet ≈
        # ≤~400 MB hydrated worst-case, well inside the 8 GB driver /
        # >=4 GB-per-core executor floor this engine targets; deployments
        # with thinner drivers should lower this via extra_conf.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
        # the driver's events.parquet stores TIMESTAMP(NANOS); read as int64
        # nanos and convert in catalog.load_table (Spark has no ns timestamps)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Whole-stage codegen emits one compiled class per distinct plan; a
        # long session running many distinct queries (the bench, the driver's
        # correctness sweep) fills the JVM's default 240 MB code cache, after
        # which the JIT disables itself and everything runs interpreted
        # (observed 4-6x slowdowns on late-bench queries). Reserve enough to
        # keep compilation alive for hundreds of distinct plans.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if rocksdb_state_store:
        # runtime SQL confs — apply even when getOrCreate() reused an
        # existing session (builder confs would be silently ignored then);
        # each newly STARTED streaming query picks them up
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        # snapshot+changelog uploads instead of full snapshots per commit —
        # the production-recommended mode for large state
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark
