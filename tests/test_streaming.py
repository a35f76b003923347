"""Streaming pipeline tests: bounded runs (Trigger.AvailableNow) mirroring
the reference's local no-Docker harness (run_full_pipeline_local.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.operators.metrics import alerts_batch
from data_pipeline_for_autonomous_vehicles_spark.operators.windows import user_sessions
from data_pipeline_for_autonomous_vehicles_spark.streaming import aggregates, rules


def test_streaming_alerts_equal_batch(spark, sf_dir):
    stream_out = rules.streaming_alerts_table(spark, sf_dir)
    batch_out = alerts_batch(spark, sf_dir)
    a = sorted(map(tuple, stream_out.collect()))
    b = sorted(map(tuple, batch_out.collect()))
    assert a == b


def test_alert_pipeline_foreachbatch_sink(spark, sf_dir, tmp_path):
    out = tmp_path / "alerts_out"
    ckpt = tmp_path / "ckpt"
    n = rules.run_alert_pipeline(spark, sf_dir, str(out), str(ckpt))
    assert n == alerts_batch(spark, sf_dir).count()
    written = spark.read.parquet(str(out))
    # data columns plus the sink's layout partitions (batch-scoped
    # exactly-once dir + date pruning)
    assert set(written.columns) == {
        "time",
        "vehicle_id",
        "alert_type",
        "alert_message",
        "batch_id",
        "event_date",
    }
    # exactly-once: re-running with the same checkpoint adds nothing
    n2 = rules.run_alert_pipeline(spark, sf_dir, str(out), str(ckpt))
    assert n2 == n


def test_streaming_daily_counts_equal_batch(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table

    stream_out = aggregates.streaming_daily_event_counts(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    s = {(r["day"], r["event_type"]): r["n_events"] for r in stream_out}
    b = {(r["day"], r["event_type"]): r["n_events"] for r in batch}
    assert s == b


def test_streaming_seasonal_anomalies_flags_consistent(spark, sf_dir):
    """Every hourly window carries a flag consistent with its own numbers
    (integer cross-multiplication, re-derived here), totals cover every
    event, and all three flag classes occur on the driver data."""
    out = aggregates.streaming_seasonal_anomalies(spark, sf_dir).collect()
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in out) == n_events
    flags = {r["flag"] for r in out}
    assert "normal" in flags and flags <= {"high", "low", "normal", "novel"}
    assert flags != {"normal"}  # the gate actually fires on this data
    for r in out:
        if r["flag"] == "novel":
            assert r["baseline"] is None  # cell absent from the training window
            continue
        ratio = r["n_events"] / r["baseline"]
        if r["flag"] == "high":
            assert ratio > 1.99
        elif r["flag"] == "low":
            assert ratio < 0.51
        else:
            assert 0.49 < ratio < 2.01


def test_streaming_sessions_match_batch_sessionization(spark, sf_dir):
    stream_out = aggregates.streaming_user_sessions(spark, sf_dir).collect()
    batch_out = user_sessions(spark, sf_dir).collect()
    s = {r["user_id"]: r["n_sessions"] for r in stream_out}
    b = {r["user_id"]: r["n_sessions"] for r in batch_out}
    assert s == b


def test_streaming_dedup_removes_doubled_delivery(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.aggregates import (
        streaming_dedup_counts,
    )

    out = {r["event_type"]: r["n_events"] for r in streaming_dedup_counts(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    batch = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert out == batch


def test_stream_stream_join_matches_batch_self_join(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.joins import (
        streaming_view_purchase_pairs,
    )

    out = {
        r["user_id"]: (r["n_pairs"], r["n_attributed_views"], r["n_attributing_purchases"])
        for r in streaming_view_purchase_pairs(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    batch = (
        v.join(
            p,
            (F.col("user_id") == F.col("uid"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("vid").alias("nv"),
            F.countDistinct("pid").alias("np"),
        )
        .collect()
    )
    assert out == {r["user_id"]: (r["n"], r["nv"], r["np"]) for r in batch}


def test_stream_stream_left_outer_matches_batch_anti_join(spark, sf_dir):
    """Left-outer interval join null-emits must equal the batch NOT-EXISTS
    twin inside the watermark-flushed region (view_ts <= max_ts - 3h)."""
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.joins import (
        streaming_unconverted_views,
    )

    out = {
        r["user_id"]: r["n_unconverted"]
        for r in streaming_unconverted_views(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        (
            F.least(
                F.max(F.when(F.col("event_type") == "view", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            )
            - F.expr("INTERVAL 3 HOUR")
        ).alias("cutoff")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(F.broadcast(cutoff))
        .filter(F.col("ts") <= F.col("cutoff"))
        .select("user_id", F.col("ts").alias("vts"), F.col("event_id").alias("vid"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"), F.col("ts").alias("pts")
    )
    batch = {
        r["user_id"]: r["n"]
        for r in v.join(
            p,
            (F.col("user_id") == F.col("uid"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
            "left_anti",
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == batch
    assert sum(out.values()) > 0  # the region is non-degenerate at test SF


def test_stream_static_enrichment_matches_batch_join(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.joins import (
        streaming_enriched_nation_counts,
    )

    out = {
        r["c_nationkey"]: (r["n_events"], r["n_users"])
        for r in streaming_enriched_nation_counts(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    batch = {
        r["c_nationkey"]: (r["n"], r["nu"])
        for r in ev.join(cust, "user_id")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("nu"))
        .collect()
    }
    assert out == batch


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics, end to end: a row arriving after the watermark
    has passed its window must be dropped, and the finalized window's
    count must reflect only the on-time rows. Three single-file
    micro-batches (mtime-ordered, maxFilesPerTrigger=1): on-time rows →
    watermark-advancing row → late row."""
    import os
    import time as _t

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    src = tmp_path / "late_src"
    src.mkdir()

    def _write(name, rows, mtime):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        p = str(src / name)
        df.write.mode("overwrite").parquet(p)
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))
        os.utime(p, (mtime, mtime))

    import datetime as dt

    d = dt.datetime(2024, 1, 1)
    now = _t.time()
    _write("a.parquet", [(d.replace(hour=10, minute=5), 1), (d.replace(hour=10, minute=15), 2)], now - 400)
    _write("b.parquet", [(d.replace(hour=20, minute=0), 3)], now - 300)
    # c's batch runs with watermark 19:00 → window 10–11 is finalized
    # (emitted + evicted) BEFORE the late row exists in the stream
    _write("c.parquet", [(d.replace(hour=20, minute=30), 4)], now - 200)
    _write("d.parquet", [(d.replace(hour=10, minute=20), 5)], now - 100)  # late

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src) + "/*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )
    name = "late_drop_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    ten = [r["n"] for r in rows if r["w_start"] == d.replace(hour=10)]
    # the 10:00 window finalized with ONLY the two on-time rows, emitted
    # exactly once; the late 10:20 row (behind the 19:00 watermark, window
    # already evicted) was dropped — neither merged nor re-emitted
    assert ten == [2]


def test_online_outliers_batch_split_invariant(spark, sf_dir):
    # the state fold must give the same answer for any micro-batch split:
    # folding a user's ordered events in one go == folding them in two
    # chunks carrying the integer-moment state across the boundary
    import pandas as pd

    from data_pipeline_for_autonomous_vehicles_spark.streaming.online import _fold

    cents = [100, 120, 110, 95, 130, 5000, 99, 101, 7000, 98]
    one_shot = _fold((0, 0, 0, 0), cents)
    for cut in range(len(cents) + 1):
        assert _fold(_fold((0, 0, 0, 0), cents[:cut]), cents[cut:]) == one_shot
    # the injected 5000/7000 spikes get flagged once warmup (5 priors) passed
    assert one_shot[3] == 2


def test_online_outliers_matches_batch_window_formulation(spark, sf_dir):
    # stream (stateful fold) == batch (running-window SQL twin semantics
    # re-expressed on DataFrames) on the driver data
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.online import (
        MIN_PRIOR,
        SIGMAS,
        streaming_online_outliers,
    )

    got = streaming_online_outliers(spark, sf_dir)

    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = (
        ev.select("user_id", "ts", "event_id", cents.alias("cents"))
        .withColumn("n_prior", F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)))
        .withColumn("s_prior", F.coalesce(F.sum("cents").over(w), F.lit(0)))
        .withColumn("q_prior", F.coalesce(F.sum(F.col("cents") * F.col("cents")).over(w), F.lit(0)))
    )
    n_d = F.when(F.col("n_prior") > 0, F.col("n_prior").cast("double"))  # NULL at 0
    mean = F.col("s_prior").cast("double") / n_d
    var = F.col("q_prior").cast("double") / n_d - mean * mean
    flagged = F.when(
        (F.col("n_prior") >= MIN_PRIOR)
        & (
            F.col("cents").cast("double")
            > mean + F.lit(SIGMAS) * F.sqrt(F.greatest(var, F.lit(0.0)))
        ),
        1,
    ).otherwise(0)
    want = (
        prior.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(flagged).cast("long").alias("n_flagged"),
        )
        .orderBy("user_id")
    )
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]


def test_event_time_timer_expires_silent_users(spark, sf_dir):
    """EventTimeTimeout path (the timer half of the stateful API): expiry
    rows are emitted ONLY by timers firing against the final watermark —
    the update path yields nothing — so the sink must contain exactly the
    users silent for EXPIRY_S before (max event time − watermark delay),
    each with their full pre-expiry event count."""
    from pyspark.sql import functions as F

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.stateful import (
        EXPIRY_S,
        WM_DELAY_S,
        streaming_expired_sessions,
    )

    got = {r["user_id"]: r for r in streaming_expired_sessions(spark, sf_dir).collect()}
    assert got  # the fixture data spans long enough for some users to expire

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"), F.count(F.lit(1)).alias("n")
    )
    wm_ms = (
        ev.agg(F.max(F.unix_micros("ts"))).first()[0] // 1000 - WM_DELAY_S * 1000
    )
    expected = {
        r["user_id"]: r
        for r in per_user.collect()
        if r["last_us"] // 1000 + EXPIRY_S * 1000 < wm_ms
    }
    assert set(got) == set(expected)
    for uid, r in got.items():
        assert r["last_seen_us"] == expected[uid]["last_us"]
        assert r["events_before_expiry"] == expected[uid]["n"]


def test_streaming_state_green_under_rocksdb_provider(spark, sf_dir):
    """The RocksDB state-store toggle (session.get_spark) must leave state
    semantics identical: a watermarked stateful aggregation and the v1
    custom stateful operator produce the same rows under the RocksDB
    provider as under the default HDFS-backed one. At production scale
    RocksDB is the difference between on-heap state OOM and SSD-backed
    state; here we prove the swap is behavior-neutral."""
    from data_pipeline_for_autonomous_vehicles_spark.session import get_spark
    from data_pipeline_for_autonomous_vehicles_spark.streaming import aggregates

    keys = (
        "spark.sql.streaming.stateStore.providerClass",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
    )
    default_rows = aggregates.streaming_daily_event_counts(spark, sf_dir).collect()
    prev = {k: spark.conf.get(k, None) for k in keys}
    get_spark(rocksdb_state_store=True)  # reuses the session, sets runtime confs
    try:
        assert "RocksDBStateStoreProvider" in spark.conf.get(keys[0])
        rocks_rows = aggregates.streaming_daily_event_counts(spark, sf_dir).collect()
    finally:
        for k, v in prev.items():  # restore BOTH confs — no cross-test leak
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert rocks_rows == default_rows


def test_stream_cdc_upsert_converges_and_replay_is_noop(spark, sf_dir, tmp_path):
    """foreachBatch CDC apply: a change stream chunked into micro-batches
    converges the partitioned table to the same state as a single batch
    merge_upsert of all changes (per-key changes arrive in seq order — the
    standard CDC delivery contract), and replaying the whole stream with a
    fresh checkpoint leaves the table unchanged (keyed merge idempotence)."""
    import json

    from pyspark.sql import types as T

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.maintenance import merge_upsert
    from data_pipeline_for_autonomous_vehicles_spark.sinks import PARTITION_COL, write_time_partitioned
    from data_pipeline_for_autonomous_vehicles_spark.streaming.cdc import stream_cdc_upsert

    ev = load_table(spark, sf_dir, "events")
    path_stream, path_batch = str(tmp_path / "t_stream"), str(tmp_path / "t_batch")
    write_time_partitioned(ev, path_stream, time_col="ts", sort_cols=("event_id",))
    write_time_partitioned(ev, path_batch, time_col="ts", sort_cols=("event_id",))

    rows = ev.orderBy("event_id").limit(3).collect()
    upd, dele, base_new = (r.asDict() for r in rows)
    new_row = dict(base_new, event_id=999_999_999, value=7.25)

    def _j(d, op):
        out = dict(d, _op=op)
        out["ts"] = out["ts"].isoformat()
        return json.dumps(out)

    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    # batch 1: update + insert; batch 2: re-update the same key (newer seq)
    # + tombstone — per-key seq order holds across files
    upd2 = dict(upd, ts=upd["ts"].replace(year=upd["ts"].year + 1), value=222.5)
    (cdc_dir / "b1.jsonl").write_text(_j(dict(upd, value=111.5), "U") + "\n" + _j(new_row, "I") + "\n")
    (cdc_dir / "b2.jsonl").write_text(_j(upd2, "U") + "\n" + _j(dele, "D") + "\n")

    schema = T.StructType(list(ev.schema.fields) + [T.StructField("_op", T.StringType())])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(cdc_dir))
    )
    q = stream_cdc_upsert(
        stream, path_stream, key_cols=("event_id",), seq_col="ts", op_col="_op",
        checkpoint=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination()

    all_updates = spark.read.schema(schema).json(str(cdc_dir))
    merge_upsert(spark, path_batch, all_updates, key_cols=("event_id",), seq_col="ts", op_col="_op")

    cols = ev.columns

    def _state(p):
        return sorted(
            tuple(r[c] for c in cols) for r in spark.read.parquet(p).select(cols).collect()
        )

    assert _state(path_stream) == _state(path_batch)

    # replay the entire stream with a fresh checkpoint: keyed merge is a no-op
    before = _state(path_stream)
    q2 = stream_cdc_upsert(
        (spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(str(cdc_dir))),
        path_stream, key_cols=("event_id",), seq_col="ts", op_col="_op",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination()
    assert _state(path_stream) == before


def test_streaming_novelty_probe_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """The stream-static novelty probe must be chunking-invariant: the
    delta docs split across 3 files, streamed one file per micro-batch
    against the once-materialized corpus index, yields exactly the batch
    minhash_delta_probe verdicts (and every batch saw only its own docs)."""
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import (
        _is_delta,
        corpus_band_index,
        minhash_delta_probe,
    )
    from data_pipeline_for_autonomous_vehicles_spark.streaming import novelty

    delta = load_table(spark, sf_dir, "documents").where(_is_delta())
    split_dir = tmp_path / "delta_files"
    # three disjoint slices, one file each, so maxFilesPerTrigger=1 yields
    # three genuine micro-batches
    for i in range(3):
        delta.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(split_dir))

    index = corpus_band_index(spark, sf_dir).localCheckpoint(eager=True)
    stream = (
        spark.readStream.schema(novelty.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(split_dir))
    )
    batches: list[tuple[int, list]] = []
    novelty.run_novelty_probe(
        stream, index, lambda df, bid: batches.append((bid, df.collect()))
    )
    assert len(batches) >= 3  # genuinely chunked
    streamed = sorted(
        tuple(r) for _, rows in batches for r in rows
    )
    expected = sorted(tuple(r) for r in minhash_delta_probe(spark, sf_dir).collect())
    assert streamed == expected
    # no doc is ever verdicted twice across batches
    ids = [r[0] for _, rows in batches for r in rows]
    assert len(ids) == len(set(ids))


def test_streaming_curation_verdicts_multibatch_and_funnel_agreement(
    spark, sf_dir, tmp_path
):
    """The full streaming admission (novelty + quality + classifier +
    fluency) is chunking-invariant, and agrees stage-for-stage with the
    batch funnel (`curation_kept_docs`) on the delta slice everywhere the
    two dedup gates agree — the near-dup stage is the ONLY semantic
    difference (cluster-canonical election needs the whole corpus; the
    stream substitutes index novelty)."""
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators.corpus import (
        curation_kept_docs,
    )
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import (
        _is_delta,
        corpus_band_index,
    )
    from data_pipeline_for_autonomous_vehicles_spark.streaming import novelty

    delta = load_table(spark, sf_dir, "documents").where(_is_delta())
    split_dir = tmp_path / "delta_files"
    for i in range(3):
        delta.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(split_dir))

    index = corpus_band_index(spark, sf_dir).localCheckpoint(eager=True)
    model = novelty.corpus_bigram_model(spark, sf_dir).localCheckpoint(eager=True)

    # one-shot batch twin over the whole delta slice
    batch_verdicts = {
        r["doc_id"]: r["verdict"]
        for r in novelty.curation_verdict_frame(delta, index, model).collect()
    }

    # genuinely chunked stream: one file per micro-batch
    stream = (
        spark.readStream.schema(novelty.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(split_dir))
    )
    batches: list[tuple[int, list]] = []

    def _probe(df, bid):
        if df.isEmpty():
            return
        batches.append(
            (bid, novelty.curation_verdict_frame(df, index, model).collect())
        )

    q = stream.writeStream.foreachBatch(_probe).trigger(availableNow=True).start()
    q.awaitTermination()
    assert len(batches) >= 3
    streamed = {r["doc_id"]: r["verdict"] for _, rows in batches for r in rows}
    assert streamed == batch_verdicts
    ids = [r["doc_id"] for _, rows in batches for r in rows]
    assert len(ids) == len(set(ids))

    # registry form ≡ the same verdicts
    reg = {
        r["doc_id"]: r["verdict"]
        for r in novelty.streaming_curation_verdicts(spark, sf_dir).collect()
    }
    assert reg == batch_verdicts

    # stage-2..4 agreement with the batch funnel: wherever both dedup gates
    # admit, or both drop at a later stage, the verdicts are identical
    funnel = {
        r["doc_id"]: r["verdict"]
        for r in curation_kept_docs(spark, sf_dir).collect()
        if r["doc_id"] in streamed
    }
    assert set(funnel) == set(streamed)
    downstream = 0
    for did, v in streamed.items():
        fv = funnel[did]
        if v != "dropped_near_dup" and fv != "dropped_near_dup":
            assert v == fv, (did, v, fv)
            downstream += 1
    assert downstream > 0  # the agreement check is non-vacuous
    # and the ladder bites on the stream too
    assert "kept" in streamed.values()
    assert any(v != "kept" for v in streamed.values())


def test_streaming_boilerplate_gate_multibatch_equals_probe_known(
    spark, sf_dir, tmp_path
):
    """The on-sight boilerplate gate is chunking-invariant (verdicts depend
    only on the static digest index), and equals exactly the `known`
    component of the batch `boilerplate_delta_probe` — the causal-gate /
    batch-reconcile split pinned as code, not prose."""
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators.corpus import (
        boilerplate_delta_probe,
    )
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import _is_delta
    from data_pipeline_for_autonomous_vehicles_spark.streaming import novelty

    delta = load_table(spark, sf_dir, "documents").where(_is_delta())
    split_dir = tmp_path / "delta_files"
    for i in range(3):
        delta.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(split_dir))

    index = novelty.corpus_boiler_index(spark, sf_dir).localCheckpoint(eager=True)
    stream = (
        spark.readStream.schema(novelty.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(split_dir))
    )
    batches: list[tuple[int, list]] = []

    def _probe(df, bid):
        if df.isEmpty():
            return
        batches.append((bid, novelty.boilerplate_gate_frame(df, index).collect()))

    q = stream.writeStream.foreachBatch(_probe).trigger(availableNow=True).start()
    q.awaitTermination()
    assert len(batches) >= 3
    streamed = {
        r["doc_id"]: (r["n_segments"], r["n_known_boiler"], r["n_cut_tokens"])
        for _, rows in batches
        for r in rows
    }
    probe = {
        r["doc_id"]: r for r in boilerplate_delta_probe(spark, sf_dir).collect()
    }
    assert set(streamed) == set(probe)
    for did, (n_seg, n_known, _) in streamed.items():
        assert n_seg == probe[did]["n_segments"]
        assert n_known == probe[did]["n_known_boiler"]
    # the gate's cut is a subset of the reconciled (known + new) cut, and
    # the gap is exactly the newly-minted segments' doing: where the probe
    # minted nothing, gate cut == probe cut; where it did, gate cut < probe
    for d, (_, _, gate_cut) in streamed.items():
        if probe[d]["n_new_boiler"] == 0:
            assert gate_cut == probe[d]["n_cut_tokens"]
        else:
            assert gate_cut < probe[d]["n_cut_tokens"]
    ids = [r["doc_id"] for _, rows in batches for r in rows]
    assert len(ids) == len(set(ids))


def test_boilerplate_delta_probe_minted_branch_fires(spark, tmp_path):
    """Pins the NEWLY-minted branch on a constructed corpus: a segment with
    df_corpus=1 that two delta docs tip to df=3 is `new` (cut by the
    reconciler, NOT by the on-sight gate), while a df_corpus=3 segment is
    `known` (cut by both)."""
    from pyspark.sql import Row

    from data_pipeline_for_autonomous_vehicles_spark.operators.corpus import (
        boilerplate_delta_probe,
    )
    from data_pipeline_for_autonomous_vehicles_spark.streaming import novelty

    known = " ".join(f"k{i}" for i in range(1, 9))  # corpus df=3: boiler already
    mint = " ".join(f"m{i}" for i in range(1, 9))   # corpus df=1 + delta df=2 -> 3
    rows = [
        # corpus slice (doc_id % 5 != 4)
        Row(doc_id=0, text=known, lang="en", source="s", n_chars=0),
        Row(doc_id=1, text=known, lang="en", source="s", n_chars=0),
        Row(doc_id=2, text=known + " " + mint, lang="en", source="s", n_chars=0),
        # delta slice (doc_id % 5 == 4)
        Row(doc_id=4, text=known + " " + mint, lang="en", source="s", n_chars=0),
        Row(doc_id=9, text=mint, lang="en", source="s", n_chars=0),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows).coalesce(1).write.parquet(d + "/documents.parquet")

    probe = {r["doc_id"]: r for r in boilerplate_delta_probe(spark, d).collect()}
    assert probe[4]["n_known_boiler"] == 1 and probe[4]["n_new_boiler"] == 1
    assert probe[4]["n_cut_tokens"] == 16
    assert probe[9]["n_known_boiler"] == 0 and probe[9]["n_new_boiler"] == 1
    assert probe[9]["n_cut_tokens"] == 8

    # the on-sight gate cuts only the known segment — minted ones pass
    index = novelty.corpus_boiler_index(spark, d).localCheckpoint(eager=True)
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import _is_delta

    gate = {
        r["doc_id"]: r
        for r in novelty.boilerplate_gate_frame(
            load_table(spark, d, "documents").where(_is_delta()), index
        ).collect()
    }
    assert gate[4]["n_cut_tokens"] == 8 and gate[9]["n_cut_tokens"] == 0
