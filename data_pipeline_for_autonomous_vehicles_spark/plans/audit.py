"""Extract structured facts from a DataFrame's formatted physical plan."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

_JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def plan_text(df: DataFrame) -> str:
    """The `explain("formatted")` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parentheses — filter exprs contain commas
    (`EqualTo(c_mktsegment,BUILDING)`)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def pushed_filters(df: DataFrame) -> list[str]:
    """Every scan's PushedFilters list, flattened (empty entries dropped)."""
    out: list[str] = []
    for line in plan_text(df).splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]", line)
        if m and m.group(1).strip():
            out.extend(_split_top_level(m.group(1)))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """Each scan's ReadSchema struct string — what actually gets read; a
    scan reading columns the query never uses is a pruning failure."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan_text(df).splitlines()
        if "ReadSchema:" in line
    ]


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in plan order (duplicates = multiple joins)."""
    text = plan_text(df)
    out: list[str] = []
    for line in text.splitlines():
        m = re.match(r"\(\d+\) (\w+)", line.strip())
        if m and m.group(1) in _JOIN_KINDS:
            out.append(m.group(1))
    return out


def exchange_count(df: DataFrame) -> int:
    """Data-moving shuffles (hashpartitioning/rangepartitioning exchanges;
    broadcast exchanges excluded — they ship dimension tables, not facts)."""
    return sum(
        1
        for line in plan_text(df).splitlines()
        if line.strip().startswith("Arguments: hashpartitioning")
        or line.strip().startswith("Arguments: rangepartitioning")
    )


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window specs with NO partition columns — each one is a global sort
    funneled through a single task (Exchange SinglePartition), the classic
    100×-scale killer. Returns the offending spec strings (empty = safe).

    Detection: in a `windowspecdefinition(part…, order…, frame)` the
    partition columns come first without sort markers. The partition list
    is empty when the FIRST top-level argument either carries ASC/DESC
    NULLS ordering (ordered global window) or IS the frame spec itself
    (`specifiedwindowframe(...)` — an order-less global window such as
    `max(...).over(Window.partitionBy())`, which Spark also funnels
    through a single partition)."""
    out: list[str] = []
    text = plan_text(df)
    for m in re.finditer(r"windowspecdefinition\(", text):
        start = m.end()
        depth, i = 1, start
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        args = _split_top_level(text[start : i - 1])
        if args and (
            " ASC NULLS" in args[0]
            or " DESC NULLS" in args[0]
            or args[0].startswith("specifiedwindowframe(")
        ):
            out.append(text[m.start() : i])
    return out


def uses_cartesian_product(df: DataFrame) -> bool:
    """True if any join degenerated to an unkeyed cross product — at fact
    scale that is always a plan bug (bucket it or broadcast it)."""
    return any(k in ("CartesianProduct",) for k in join_strategies(df))
