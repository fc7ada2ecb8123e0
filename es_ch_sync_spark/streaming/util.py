"""Streaming helpers shared by queries and jobs."""

from __future__ import annotations


def drain(q, timeout_sec: float = 300.0) -> None:
    """Block until an availableNow/one-shot query has fully terminated.

    ``q.awaitTermination(t)`` returns **False** on timeout with the query
    still running — ignoring that boolean lets a slow host read a
    partially-maintained sink and report a spurious mismatch (ADVICE r5).
    Raises TimeoutError instead, and surfaces the query's own exception
    if it died."""
    if q.awaitTermination(timeout_sec):
        return
    if q.isActive:
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} still running after "
            f"{timeout_sec}s — refusing to read a partially-written sink"
        )
    # terminated between the timeout and the isActive probe: re-check why
    if q.exception() is not None:
        raise q.exception()
