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
) -> DataFrame:
    """Per-user EMA of ``value``, one output row per user per micro-batch.

    Events are processed in ``ts`` order within each batch; state carries
    (count, ema) across batches. Batch DataFrames take the
    ``applyInPandas`` path with identical semantics.
    """

    def with_state(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, ema = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            n, ema = _ema_update(n, float(ema), pdf["value"].tolist(), alpha)
            last_ts = pdf["ts"].iloc[-1]
        state.update((n, float(ema)))
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
        return (
            src.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                with_state,
                outputStructType=OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    return src.groupBy("user_id").applyInPandas(batch_fn, schema=OUT_SCHEMA)
