"""Shared streaming-harness plumbing."""

from __future__ import annotations


def await_or_raise(q, timeout_sec: int, what: str = "streaming query") -> None:
    """Await a (finite-source) streaming query's termination and STOP it;
    raise if the timeout elapsed first.

    ``awaitTermination(timeout)`` returns False on timeout — silently
    accepting that would hand the caller a PARTIAL result (a truncated
    replay table, a half-committed ingest) as if the stream completed.
    A query error propagates as StreamingQueryException as usual.
    """
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"{what} did not finish within {timeout_sec}s; "
                "result would be partial — raise timeout_sec or check the source"
            )
    finally:
        q.stop()
