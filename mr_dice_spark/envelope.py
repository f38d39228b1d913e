"""Uniform result envelope.

The reference wraps every tool result in a ``FetchResult`` TypedDict with
``code`` 0 on success, -1 on error, and -9999 when zero rows matched
(reference: optimade_database/Optimade_Server/server.py:44-50,196 and the
identical TypedDicts in the other four modules). We keep those exact
semantics but carry a DataFrame instead of materialized dicts, plus a
bounded ``cleaned`` preview (the reference's MAX_RETURNED_STRUCTS=30
truncation, e.g. Optimade_Server/server.py:21,190).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame

OK = 0
ERROR = -1
NO_RESULTS = -9999

MAX_RETURNED_ROWS = 30


@dataclass
class FetchResult:
    """Result envelope for every engine entry point."""

    df: Optional[DataFrame]
    n_found: int
    code: int
    message: str
    cleaned: list[dict[str, Any]] = field(default_factory=list)
    output_dir: Optional[str] = None
    truncated: bool = False  # more rows matched than the preview carries

    @property
    def ok(self) -> bool:
        return self.code == OK


def wrap(df: DataFrame, max_rows: int = MAX_RETURNED_ROWS) -> FetchResult:
    """Evaluate ``df`` far enough to produce the reference envelope.

    Collects at most ``max_rows + 1`` rows (limit pushdown short-circuits the
    scan); ``n_found`` reports the preview size, capped notation matching the
    reference's truncate-to-30 behavior.
    """
    # max_rows + 1: the sentinel row is how truncation becomes DETECTABLE —
    # without it, 'exactly max_rows matched' and 'more matched' are
    # indistinguishable to the caller
    rows = df.limit(max_rows + 1).collect()
    truncated = len(rows) > max_rows
    rows = rows[:max_rows]
    n = len(rows)
    if n == 0:
        return FetchResult(df=df, n_found=0, code=NO_RESULTS, message="no results matched")
    return FetchResult(
        df=df,
        n_found=n,
        code=OK,
        message="success (truncated)" if truncated else "success",
        cleaned=[r.asDict(recursive=True) for r in rows],
        truncated=truncated,
    )


def error(message: str) -> FetchResult:
    return FetchResult(df=None, n_found=0, code=ERROR, message=message)
