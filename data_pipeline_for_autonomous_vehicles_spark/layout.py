"""Multi-dimensional clustering (Z-order) for parquet file skipping.

A sorted layout prunes scans on the sort key only: sorting by `user_id`
makes every file's `value` min/max span the whole domain, so a value
predicate reads the entire table. The reference leans on TimescaleDB's
secondary composite indexes for its second access path
(sql/01_schema.sql:72-75); a parquet lake has no indexes — what it has is
per-file and per-row-group min/max statistics, and those only help if the
layout makes them tight. Z-ordering interleaves the bits of several
normalized dimensions into one clustering key, so files cover small
HYPER-RECTANGLES of the key space instead of slabs of one dimension:
min/max stats stay tight on EVERY clustered column and a predicate on any
of them skips most files.

Two details make this work on real (skewed) data:

  * **Equi-depth cells.** Min-max normalization puts most of a skewed
    column in a handful of cells, so dense-region predicates stop pruning.
    Cell boundaries here are approximate QUANTILES (`approxQuantile` — a
    sampled sketch, driver cost is 2^bits floats, never data), so every
    cell holds ~equal rows no matter the distribution.
  * **Grid ≈ file count.** With far more cells than files, a range
    predicate's cells scatter across nearly every file and skipping
    collapses. The grid is sized so (2^bits)² ≈ n_files: one dimension
    fixed → ~sqrt(n_files) files touched, the Z-order optimum.

At 100 TB this replaces composite indexes with pure layout — no index
maintenance, no side structure; the clustering job itself is one range
exchange (the same machinery as a global sort).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int) -> Column:
    """Interleave the low `bits` of two non-negative ints: the Morton
    (Z-curve) key. A static O(bits) expression tree — JVM-side, codegen'd."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def _equi_depth_cell(col: Column, cuts: list[float]) -> Column:
    """Cell coordinate = number of quantile cut points <= value. len(cuts)
    is 2^bits - 1, so this is a short codegen'd comparison chain."""
    cell = F.lit(0)
    for c in cuts:
        cell = cell + F.when(col >= F.lit(c), 1).otherwise(0)
    return cell.cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int | None = None,
) -> None:
    """Write `df` as ~`n_files` parquet files clustered on the Z-curve over
    (col_a, col_b), with equi-depth cells sized so the grid matches the
    file count (override via `bits`)."""
    if bits is None:
        bits = max(1, round(math.log2(max(n_files, 4)) / 2))
    n_cells = 1 << bits
    qs = [i / n_cells for i in range(1, n_cells)]
    cuts_a, cuts_b = (
        df.stat.approxQuantile([col_a, col_b], qs, 0.001) if qs else ([], [])
    )
    z = zvalue(
        _equi_depth_cell(F.col(col_a), cuts_a),
        _equi_depth_cell(F.col(col_b), cuts_b),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
