"""tidyselect-style column selection DSL.

Same semantics as the reference's ColumnSelector
(/root/reference/src/pytimetk/utils/selection.py:13-110): a selector is a
string, a sequence of strings, a compiled regex, a callable over the column
list, or None (= all columns). Pure Python — resolved against df.columns
before the plan is built, so Catalyst sees plain column references.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable, Sequence

ColumnSelector = (
    str | Sequence[str] | re.Pattern | Callable[[Sequence[str]], Iterable[str]] | None
)


def resolve_columns(columns: Sequence[str], selector: ColumnSelector) -> list[str]:
    if selector is None:
        return list(columns)
    if isinstance(selector, str):
        if selector not in columns:
            raise KeyError(f"column {selector!r} not in {list(columns)}")
        return [selector]
    if isinstance(selector, re.Pattern):
        return [c for c in columns if selector.search(c)]
    if callable(selector):
        picked = list(selector(columns))
        missing = [c for c in picked if c not in columns]
        if missing:
            raise KeyError(f"selector returned unknown columns: {missing}")
        return picked
    out: list[str] = []
    for item in selector:
        out.extend(resolve_columns(columns, item))
    seen: set[str] = set()
    return [c for c in out if not (c in seen or seen.add(c))]


def contains(substr: str) -> Callable[[Sequence[str]], list[str]]:
    return lambda cols: [c for c in cols if substr in c]


def starts_with(prefix: str) -> Callable[[Sequence[str]], list[str]]:
    return lambda cols: [c for c in cols if c.startswith(prefix)]


def ends_with(suffix: str) -> Callable[[Sequence[str]], list[str]]:
    return lambda cols: [c for c in cols if c.endswith(suffix)]


def matches(pattern: str) -> Callable[[Sequence[str]], list[str]]:
    rx = re.compile(pattern)
    return lambda cols: [c for c in cols if rx.search(c)]
