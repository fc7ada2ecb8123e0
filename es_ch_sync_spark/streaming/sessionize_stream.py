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

Scale: state is O(keys) tiny tuples per LIVE key; each micro-batch shuffles
only its own events by key (same exchange a batch groupBy would do).
``idle_timeout_seconds`` bounds the live-key set: with an event-time
timeout, a key idle past the horizon FLUSHES its open session and its
state is REMOVED — without this, 100 TB key cardinality (every device ever
seen) accumulates forever in the state store.  The eviction is pinned by
test (idle key's session emitted by watermark, state gone afterwards).
Production state-store config: RocksDBStateStoreProvider
(session.cluster_conf) keeps per-executor state off-heap and
incrementally checkpointed — the in-memory HDFS-backed default holds
every key in executor heap.
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


def _emit(closed: list[tuple[Any, ...]]) -> Iterator[pd.DataFrame]:
    out = pd.DataFrame(
        closed, columns=["user_id", "session_start", "session_end", "n_events"]
    )
    out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
    out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
    yield out


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if timeout_ms is not None and state.hasTimedOut:
        # idle key: the watermark passed last_event + timeout — flush the
        # open session and EVICT the state (the unbounded-state guard)
        if state.exists:
            start_us, last_us, n = state.get
            state.remove()
            if start_us >= 0:
                yield from _emit([(user_id, start_us, last_us, n)])
        else:  # pragma: no cover — defensive: timeout without state
            state.remove()
        return

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
    if timeout_ms is not None and last_us >= 0:
        # event-time timeout must sit above the current watermark
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_us // 1000 + timeout_ms, wm + 1))

    if closed:
        yield from _emit(closed)


def sessionize_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 3600,
    idle_timeout_seconds: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Emit CLOSED sessions per key as the stream progresses; the open
    session per key persists in GroupState across micro-batches.

    ``idle_timeout_seconds`` (recommended in production) arms an
    EVENT-TIME timeout: when the watermark passes a key's last event plus
    the timeout, the open session is flushed downstream and the key's
    state is deleted — state size is then O(keys active within the
    horizon), not O(keys ever seen).  Requires a watermark, applied here
    with ``watermark_delay``.  Timeouts only fire when a later micro-batch
    runs (event-time timeouts advance with data, by design — a stream
    that stops entirely flushes on the next arrival, same as the
    reference's poll loop)."""
    gap_us = gap_seconds * 1_000_000
    timeout_ms = None if idle_timeout_seconds is None else idle_timeout_seconds * 1000

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_us, timeout_ms)

    stream = events.selectExpr(f"{key} AS user_id", f"{ts_col} AS ts")
    conf = GroupStateTimeout.NoTimeout
    if timeout_ms is not None:
        stream = stream.withWatermark("ts", watermark_delay)
        conf = GroupStateTimeout.EventTimeTimeout
    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
