"""Deterministic completion wait for availableNow streaming queries."""

from __future__ import annotations


def await_done(q, timeout: float = 600) -> None:
    """Wait until the availableNow query ``q`` terminates; fail loudly otherwise.

    ``q.awaitTermination(t)`` returns False on timeout WITHOUT stopping the
    query, so a bare call lets the test proceed while the final micro-batch is
    still writing and then read a partially-committed store (the VERIFY_r12
    flake: on a loaded box the 120 s budget expired mid-batch and the snapshot
    missed the last batch's semantic-store docs). Asserting the return makes
    the wait deterministic: either every micro-batch committed, or the test
    fails with a timeout message instead of a wrong-contents assertion
    downstream. The budget is deliberately generous — an availableNow query
    terminates on its own, so the timeout only binds when the box is slow.
    """
    if not q.awaitTermination(timeout):
        try:
            q.stop()
        except Exception:
            pass
        raise AssertionError(
            f"streaming query {q.name or q.id} did not terminate within {timeout}s"
        )
