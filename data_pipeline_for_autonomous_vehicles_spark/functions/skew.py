"""Skew mitigation: salted equi-join.

AQE's skew-join handles most runtime skew (enabled in session.py), but when
one join key carries a pathological share of a 100 TB fact table (the
single-depot vehicle, the empty-string document), explicit salting is the
deterministic fix: the big side's rows get a random salt in [0, n), the
small-but-not-broadcastable side is replicated n ways, and the join key
becomes (key, salt) — splitting each hot key across n tasks.

The salt values are `rand`-drawn (partition-order dependent) but provably
irrelevant to the RESULT: every (key, salt) pair on the left finds exactly
the right rows of its key because the right side carries all n salts. Only
task placement changes — the join output is identical to the unsalted join
(asserted by tests/test_skew.py on a skewed fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` (large, skewed) with `right` (moderate: too big to
    broadcast, small enough to replicate n_salt×) on `on`, spreading each
    hot left key over n_salt reducers.

    Supports inner and left joins (the shapes where replication is sound;
    right/full outer would duplicate right-side null matches).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(
        SALT_COL, (F.rand(seed=0) * n_salt).cast("int")
    )
    salted_right = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_left.join(salted_right, keys + [SALT_COL], how).drop(SALT_COL)
