"""Prover-path counters: which round implementation actually ran.

The reference has no observability beyond a benchmark macro
(reference src/lib.rs:10-18); this framework runs the SAME protocol
round through several interchangeable engines (streamed device rounds,
chunked oversized rounds, shard_map rounds, the host tail), all
bit-identical.  Tests that claim "the sharded prove exercised the device
path" must be able to ASSERT that - otherwise a routing regression
silently turns them into host-vs-host comparisons (the round-2 verdict
caught exactly that).  ``counters`` is bumped by the round drivers;
``reset()`` + read is the test-side contract.

Not thread-safe by design: the prover drivers are single-threaded hosts
dispatching async device work.
"""

from __future__ import annotations

from typing import Dict

counters: Dict[str, int] = {}


def bump(name: str, n: int = 1) -> None:
    counters[name] = counters.get(name, 0) + n


def reset() -> None:
    counters.clear()


def get(name: str) -> int:
    return counters.get(name, 0)
