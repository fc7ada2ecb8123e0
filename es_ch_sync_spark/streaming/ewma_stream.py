"""Stateful streaming EWMA via applyInPandasWithState.

The batch operator (operators/analytics.py::ewma_last) folds each key's
full history; the streaming analog carries the recursion state — (current
ewma, observation count) per key — across micro-batches, so each batch
folds only its own rows on top of the persisted state.  Same tier
rationale as sessionize_stream: no built-in streaming operator expresses
a sequential per-key recursion.

Exactness contract: the in-batch fold uses plain Python floats —
`α·x + (1-α)·acc` — the identical IEEE double chain the batch fold and
the DuckDB list_reduce oracle execute, so an AvailableNow drain's final
state per key is BIT-IDENTICAL to the batch EWMA over the same rows (the
registered query's gate; the multi-batch carry is pinned in pytest).

Emission: one row per key per micro-batch holding the running state;
``n_obs`` is monotone per key, so the final state is the argmax-n row —
downstream either upserts on key (the usual sink) or reduces by max n.
Scale: state is two scalars per key; each batch shuffles only its own
rows on the key (the same exchange the batch groupBy would do).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

# carried state: (ewma double, n long)
EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ew", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def ewma_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.3,
    idle_timeout_seconds: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Per-key streaming EWMA; state persists across micro-batches.

    ``idle_timeout_seconds`` arms an event-time timeout that EVICTS a
    key's state once the watermark passes its last event plus the
    timeout — safe to drop because the running (ewma, n_obs) was already
    emitted in the batch that last updated it (every batch emits the
    key's current state), so eviction loses nothing downstream; it only
    bounds the state store to keys active within the horizon.  A key
    reappearing after eviction restarts its recursion — the documented
    semantic of the horizon (same as the reference restarting a device's
    running aggregate after a retention gap)."""
    timeout_ms = None if idle_timeout_seconds is None else idle_timeout_seconds * 1000

    def fold(key_t: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key_t
        if timeout_ms is not None and state.hasTimedOut:
            state.remove()  # final value already emitted; just evict
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        if state.exists:
            ew, n = state.get
        else:
            ew, n = None, 0
        for x in rows["value"]:
            x = float(x)
            ew = x if ew is None else alpha * x + (1.0 - alpha) * ew
            n += 1
        state.update((ew, n))
        if timeout_ms is not None and len(rows):
            last_ms = int(pd.to_datetime(rows["ts"]).max().value // 1_000_000)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_ms + timeout_ms, wm + 1))
        yield pd.DataFrame({"user_id": [user_id], "n_obs": [n], "ewma": [ew]})

    stream = events.selectExpr(
        f"{key} AS user_id",
        f"{ts_col} AS ts",
        f"{id_col} AS event_id",
        f"{value_col} AS value",
    )
    conf = GroupStateTimeout.NoTimeout
    if timeout_ms is not None:
        stream = stream.withWatermark("ts", watermark_delay)
        conf = GroupStateTimeout.EventTimeTimeout
    return stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
