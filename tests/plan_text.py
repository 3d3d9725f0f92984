"""Tiny parser over `executedPlan().toString()` trees for plan
assertions that must distinguish operators the plan EXECUTES from
operators that merely appear inside a printed InMemoryRelation cached
plan (a pinned frame prints its full cached plan — including its own
exchanges, twice under AQE — beneath every InMemoryTableScan that
reads it)."""

from __future__ import annotations


def _marker_indent(line: str) -> int | None:
    """Column of the `+-` node marker (None for non-node lines)."""
    i = line.find("+- ")
    return i if i >= 0 else None


def count_outside_cache(plan: str, needle: str) -> int:
    """Occurrences of ``needle`` (case-insensitive) on node lines that
    are NOT inside an InMemoryRelation subtree.  Subtree membership is
    by marker indentation: a node belongs to the most recent
    InMemoryRelation whose marker sits at a strictly smaller indent,
    until a node at <= that indent closes the subtree."""
    needle = needle.lower()
    n = 0
    cache_stack: list[int] = []
    for line in plan.splitlines():
        ind = _marker_indent(line)
        if ind is None:
            # root line ("AdaptiveSparkPlan ...") or wrapped detail text
            if needle in line.lower() and not cache_stack and "+-" not in line:
                # only count root-level operator lines, not wrapped args
                if line.strip().lower().startswith(needle):
                    n += 1
            continue
        while cache_stack and ind <= cache_stack[-1]:
            cache_stack.pop()
        inside = bool(cache_stack)
        if "InMemoryRelation" in line:
            cache_stack.append(ind)
        if not inside and needle in line.lower():
            n += 1
    return n
