"""Z-order layout: file-level min/max stats prune point/range predicates on
BOTH clustered dimensions, where a linear sort only prunes its sort key."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.layout import write_zordered

N_FILES = 16


def _file_bounds(path: str, cols: tuple[str, str]):
    """Per-file [min, max] of each column from parquet footer statistics —
    exactly the metadata a scan planner uses for skipping."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        bounds = {}
        for c in cols:
            lo = min(md.row_group(g).column(idx[c]).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx[c]).statistics.max for g in range(md.num_row_groups))
            bounds[c] = (lo, hi)
        out.append(bounds)
    return out


def _overlapping(bounds, col, lo, hi):
    return sum(1 for b in bounds if not (b[col][1] < lo or b[col][0] > hi))


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(ev, zpath, "user_id", "value", N_FILES)
    # the baseline every warehouse ships: a global sort on one key
    (
        ev.repartitionByRange(N_FILES, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zb = _file_bounds(zpath, ("user_id", "value"))
    lb = _file_bounds(lpath, ("user_id", "value"))
    # range partitioning may leave a few boundary partitions empty
    assert len(zb) >= N_FILES // 2 and len(lb) >= N_FILES // 2

    mid_user = ev.agg(F.expr("percentile_approx(user_id, 0.5)")).collect()[0][0]

    # sort-key predicate: both layouts prune hard
    assert _overlapping(lb, "user_id", mid_user, mid_user) <= 2
    assert _overlapping(zb, "user_id", mid_user, mid_user) <= len(zb) // 2
    # second-dimension predicate: linear layout reads ~everything,
    # z-order still skips most files
    lin_v = _overlapping(lb, "value", 40.0, 50.0)
    z_v = _overlapping(zb, "value", 40.0, 50.0)
    assert lin_v >= int(len(lb) * 0.8), f"linear layout unexpectedly pruned: {lin_v}/{len(lb)}"
    assert z_v <= len(zb) // 2, f"z-order failed to prune value dim: {z_v}/{len(zb)}"

    # layout changes bytes, never rows
    assert spark.read.parquet(zpath).count() == ev.count()
    got = sorted(r["event_id"] for r in spark.read.parquet(zpath).collect())
    assert got == sorted(r["event_id"] for r in ev.collect())
