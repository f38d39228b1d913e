"""Custom stateful streaming operator (north-star extension; the reference
has no streaming at all — SURVEY.md §2.10).

``user_value_ema`` keeps an exponential moving average of ``value`` per
user across micro-batches with ``applyInPandasWithState`` — the escape
hatch for stateful logic the built-in windowed aggregates can't express
(an EMA is order-dependent and unbounded, so no window/watermark rewrite
exists). State per group is O(1) (ema, count); Spark shuffles each batch
by user_id, the state store holds the rest.

The same function body runs in batch mode via ``applyInPandas`` (no state
across calls, one call per group) — used as the oracle in tests: streaming
over a finite source must equal the batch result.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, ema double, last_ts timestamp"
_STATE_SCHEMA = "n long, ema double"


def _ema_update(n: int, ema: float, values: list[float], alpha: float) -> Tuple[int, float]:
    for v in values:
        ema = v if n == 0 else alpha * v + (1.0 - alpha) * ema
        n += 1
    return n, ema


def user_value_ema(
    events: DataFrame,
    alpha: float = 0.3,
    watermark: str = "2 hours",
    idle_timeout_minutes: int | None = None,
) -> DataFrame:
    """Per-user EMA of ``value``, one output row per user per micro-batch.

    Events are processed in ``ts`` order within each batch; state carries
    (count, ema) across batches. Batch DataFrames take the
    ``applyInPandas`` path with identical semantics.

    ``idle_timeout_minutes`` bounds state for churning key populations: a
    user idle longer than the bound has their state evicted (the EMA
    restarts on their next event). Default None keeps state forever —
    correct for stable populations, unbounded for session-scoped ids.
    """

    def with_state(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, ema = state.get if state.exists else (0, 0.0)
        # a group larger than the Arrow batch size arrives as MULTIPLE
        # chunks; sorting per chunk would fold late chunks' early events
        # after earlier chunks' late ones — concatenate, then sort ONCE
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        n, ema = _ema_update(n, float(ema), pdf["value"].tolist(), alpha)
        last_ts = pdf["ts"].max()
        state.update((n, float(ema)))
        if idle_timeout_minutes is not None:
            state.setTimeoutDuration(idle_timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ema": [ema], "last_ts": [last_ts]}
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        n, ema = _ema_update(0, 0.0, pdf["value"].tolist(), alpha)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [n],
                "ema": [ema],
                "last_ts": [pdf["ts"].iloc[-1]],
            }
        )

    src = events.select("user_id", "ts", "value")
    if events.isStreaming:
        timeout = (
            GroupStateTimeout.NoTimeout
            if idle_timeout_minutes is None
            else GroupStateTimeout.ProcessingTimeTimeout
        )
        return (
            src.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                with_state,
                outputStructType=OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout,
            )
        )
    return src.groupBy("user_id").applyInPandas(batch_fn, schema=OUT_SCHEMA)
