"""Physical-plan inspection utilities.

The engine's scale posture (SCALE.md) is defined by plan properties —
which filters reached the scan, which joins broadcast, whether top-k
compiled to TakeOrderedAndProject. This module extracts those facts from
`explain("formatted")` output so tests (tests/test_plans.py) and users can
assert them instead of eyeballing explain dumps.
"""

from .audit import (
    exchange_count,
    join_strategies,
    plan_text,
    pushed_filters,
    scan_read_schemas,
    unpartitioned_windows,
    uses_cartesian_product,
)

__all__ = [
    "plan_text",
    "pushed_filters",
    "scan_read_schemas",
    "join_strategies",
    "exchange_count",
    "unpartitioned_windows",
    "uses_cartesian_product",
]
