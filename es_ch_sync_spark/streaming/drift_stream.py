"""Stateful streaming Page-Hinkley drift detector via
applyInPandasWithState.

The batch operator (operators/analytics.py::page_hinkley_daily) folds a
key's full daily series; the streaming analog carries the recursion
state — (n, Σx, m, min m) per key, all exact micro-BIGINTs — across
micro-batches, so each batch folds only its own rows on top of the
persisted state.  Same tier rationale as ewma_stream: the PH recursion
(running mean inside a cumulative sum inside a running min) is a
sequential per-key fold no built-in streaming operator expresses.

Exactness contract: the in-batch fold quantizes each term
round(x − Σx/n − δ) to an INTEGER exactly like the batch operator's
window chain, so an AvailableNow drain's final state per key is
BIT-IDENTICAL to page_hinkley_daily over the same rows (pinned in
pytest).  Emission: one row per key per micro-batch with the running
(n_obs, ph_stat, alarm); n_obs is monotone, so the final state is the
argmax-n row.  State is four integers per key."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PH_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("ph_stat", T.DoubleType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

PH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cs", T.LongType()),
        T.StructField("m", T.LongType()),
        T.StructField("mmin", T.LongType()),
    ]
)


def page_hinkley_stream(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 50.0,
) -> DataFrame:
    """Per-key streaming Page-Hinkley; state persists across batches.

    Values fold in (ts) order within each batch; the four-integer state
    makes the multi-batch carry exact (no float accumulates across
    batch boundaries)."""
    delta_micro = delta * 1e6
    lam_micro = int(lam * 1e6)

    def _half_up(x: float) -> int:
        # Spark's F.round is HALF_UP (away from zero); Python's round is
        # half-even — they differ exactly on the .5 boundaries integer
        # micro terms can hit (n·x − Σx ≡ n/2 mod n)
        import math

        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    def fold(key_t: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (k,) = key_t
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts"], kind="mergesort")
        if state.exists:
            n, cs, m, mmin = state.get
        else:
            n, cs, m, mmin = 0, 0, 0, 0
        for x in rows["value"]:
            xm = _half_up(float(x) * 1e6)
            n += 1
            cs += xm
            term = _half_up(xm - cs / n - delta_micro)
            m += term
            mmin = min(mmin, m) if n > 1 else m
        state.update((n, cs, m, mmin))
        ph = m - mmin
        yield pd.DataFrame(
            {
                "key": [k],
                "n_obs": [n],
                "ph_stat": [ph / 1e6],
                "alarm": [ph > lam_micro],
            }
        )

    stream = events.selectExpr(
        f"CAST({key} AS STRING) AS key",
        f"{ts_col} AS ts",
        f"{value_col} AS value",
    )
    return stream.groupBy("key").applyInPandasWithState(
        fold,
        outputStructType=PH_SCHEMA,
        stateStructType=PH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
