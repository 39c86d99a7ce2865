"""Physical-plan audits — assertions about what Catalyst actually did.

The reference gets its physical guarantees from Postgres EXPLAIN and
index definitions (SURVEY.md §4); this engine's equivalents are plan
properties: filters pushed to the parquet scan, scans pruned to the
referenced columns, small dimensions broadcast, no accidental
shuffles in narrow pipelines. These helpers parse
`df.explain('formatted')` output so tests can pin those properties —
a plan regression (lost pushdown, join flipping to sort-merge) fails
CI instead of silently costing 10× at 100 TB.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet scan accepted (PushedFilters: [...])."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column sets each file scan reads (ReadSchema struct fields) —
    the column-pruning audit."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        fields = [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
        out.append(fields)
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of distinct shuffle-exchange operators in the physical plan.

    Counts tree entries `Exchange (<id>)` by node id, so the formatted
    output's details section (which repeats every node as `(<id>) Exchange`)
    is not double-counted, and `ReusedExchange`/`BroadcastExchange`
    (no word boundary before `Exchange`) never match."""
    plan = explain_str(df)
    ids = set(re.findall(r"(?<![A-Za-z])Exchange \((\d+)\)", plan))
    return len(ids)


def has_no_shuffle(df: DataFrame) -> bool:
    return shuffle_count(df) == 0


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)
