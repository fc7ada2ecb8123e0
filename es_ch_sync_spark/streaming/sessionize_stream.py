"""Custom stateful streaming operator: session windows via
applyInPandasWithState.

The batch sessionizer (operators/analytics.py::sessionize) is a window
function; its streaming analog needs *state* — a session stays open across
micro-batches until a gap exceeds the threshold.  This is the engine's
example of the "custom stateful operator" tier (the brief's
applyInPandasWithState path): used only because no built-in streaming
operator expresses emit-on-gap session aggregation with per-key state.

Semantics: per key, events extend the current session while the gap to the
previous event is ≤ gap_seconds; a larger gap CLOSES the previous session
(emitted downstream) and opens a new one.  The open session rides in
GroupState between micro-batches; out-of-order events within a batch are
sorted before folding.

Scale: state is O(keys) tiny tuples; each micro-batch shuffles only its own
events by key (same exchange a batch groupBy would do).  For production,
pair with an event-time timeout so idle keys flush their open session when
the watermark passes (kept optional here: AvailableNow drain tests don't
advance wall-clock).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open-session state: (start_us, last_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_us.sort()

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = -1
        n = 0

    closed: list[tuple[Any, ...]] = []
    for t in ts_us:
        if start_us < 0:
            start_us = last_us = t
            n = 1
        elif t - last_us <= gap_us:
            last_us = t
            n += 1
        else:
            closed.append((user_id, start_us, last_us, n))
            start_us = last_us = t
            n = 1
    state.update((start_us, last_us, n))

    if closed:
        out = pd.DataFrame(closed, columns=["user_id", "session_start", "session_end", "n_events"])
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out


def sessionize_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 3600,
) -> DataFrame:
    """Emit CLOSED sessions per key as the stream progresses; the open
    session per key persists in GroupState across micro-batches."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_us)

    return (
        events.selectExpr(f"{key} AS user_id", f"{ts_col} AS ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
