"""Exact interpolated quantiles from value-frequency cells — the scale-safe
substitute for `F.percentile` when the value DOMAIN is bounded.

`F.percentile` (exact percentile aggregate) buffers every value of a group
in one aggregation buffer: at 100 TB a popular group holds billions of rows
and the buffer OOMs a single executor. When distinct values are bounded by
the domain (cent-priced amounts, quantized scores, small measurement
grids), the same exact result comes from the CDF over (key, value, count)
CELLS: a running count over cells ordered by value locates the two order
statistics around position p·(n−1), and the interpolation is re-derived
with Spark's own formula, so results are bit-identical to `F.percentile`
(and therefore keep existing DuckDB `quantile_cont` oracle parity through
the shared rounding):

    pos    = p · (n − 1)                      (double)
    lower  = floor(pos), higher = ceil(pos)   (order-stat indexes, 0-based)
    result = value[lower]                        if higher == lower
           = (higher − pos)·value[lower]
             + (pos − lower)·value[higher]       otherwise
    (org.apache.spark.sql.catalyst.expressions.aggregate.Percentile)

Scale shape: one partial+final hash agg collapses facts to cells (the
shuffle carries |keys|·|domain| rows, never the data), then the per-key
window sorts CELLS — thousands per key, independent of row count. For
unbounded domains (raw micros gaps, per-entity totals) cells degenerate to
rows and this helper buys nothing; that's what the mergeable-sketch path
(`approx_value_percentiles`) is for.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantiles_from_cells(
    cells: DataFrame,
    keys: Sequence[str],
    value_col: str,
    count_col: str,
    ps: Sequence[float],
    names: Sequence[str],
) -> DataFrame:
    """Per-key exact interpolated quantiles of `value_col` weighted by
    `count_col`, one double output column per (p, name) pair.

    `cells` must hold one row per (keys..., value): pre-aggregated counts.
    With empty `keys` the single window runs over the global cell frame —
    still bounded by the value domain, never by row count.
    """
    if len(ps) != len(names):
        raise ValueError("ps and names must pair up")
    # F.percentile (and DuckDB quantile_cont) ignore NULL inputs; a NULL
    # cell would instead sort first in the CDF window and shift every rank
    # (and could itself cover a target rank, yielding a NULL quantile) —
    # drop NULL-value cells so the bit-identity contract holds on nullable
    # columns, not just on null-free fixtures.
    cells = cells.filter(F.col(value_col).isNotNull())
    key_win = Window.partitionBy(*keys)
    cdf_win = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        cells.withColumn("__n", F.sum(count_col).over(key_win))
        .withColumn("__run", F.sum(count_col).over(cdf_win))
        .withColumn("__start", F.col("__run") - F.col(count_col) + F.lit(1))
    )

    def _pos(p: float) -> Column:
        return F.lit(float(p)) * (F.col("__n") - F.lit(1)).cast("double")

    aggs = [F.max("__n").alias("__n")]
    for p, nm in zip(ps, names):
        # 1-based ranks of the two order statistics straddling pos
        r_lo = F.floor(_pos(p)) + F.lit(1)
        r_hi = F.ceil(_pos(p)) + F.lit(1)
        covers_lo = (F.col("__start") <= r_lo) & (r_lo <= F.col("__run"))
        covers_hi = (F.col("__start") <= r_hi) & (r_hi <= F.col("__run"))
        aggs.append(
            F.min(F.when(covers_lo, F.col(value_col))).cast("double").alias(f"__lo_{nm}")
        )
        aggs.append(
            F.min(F.when(covers_hi, F.col(value_col))).cast("double").alias(f"__hi_{nm}")
        )
    g = d.groupBy(*keys).agg(*aggs)

    out = list(keys)
    for p, nm in zip(ps, names):
        pos, lo, hi = _pos(p), F.col(f"__lo_{nm}"), F.col(f"__hi_{nm}")
        lower, higher = F.floor(pos), F.ceil(pos)
        q = F.when(higher == lower, lo).otherwise(
            (higher.cast("double") - pos) * lo + (pos - lower.cast("double")) * hi
        )
        out.append(q.alias(nm))
    return g.select(*out)
