"""Profiling and benchmarking utilities.

The reference's entire observability story is the ``benchmark!`` macro
(reference src/lib.rs:10-18) printing wall-clock around expressions.  Here:
:func:`benchmark` is the same idea as a context manager (it blocks on all
device work so timings are honest), and :func:`trace` wraps
``jax.profiler.trace`` for XLA-level timelines viewable in TensorBoard /
Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


def enable_persistent_cache() -> None:
    """Point JAX at the repo's persistent compilation cache (.jax_cache).

    Remote XLA compiles over the axon tunnel cost 40-120 s EACH; the
    persistent cache is keyed on debug-stripped HLO and works across
    processes.  Every tool/bench entry point must call this before its
    first jit or it silently recompiles the world (a tpu_checks run
    without it spent 30+ min blocked on the compile pool).
    """
    import os

    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@contextlib.contextmanager
def benchmark(label: str) -> Iterator[None]:
    """Print wall-clock for the enclosed block (device-synchronized)."""
    import jax

    t0 = time.perf_counter()
    try:
        yield
    finally:
        # flush any async device work so the number means something
        try:
            jax.effects_barrier()
        except Exception:
            pass
        print(f"{label}{time.perf_counter() - t0:.4f}s")


@contextlib.contextmanager
def trace(log_dir: str, label: Optional[str] = None) -> Iterator[None]:
    """Capture an XLA profiler trace of the enclosed block."""
    import jax

    with jax.profiler.trace(log_dir):
        if label:
            with jax.profiler.TraceAnnotation(label):
                yield
        else:
            yield


# -- phase map ----------------------------------------------------------------
#
# Per-phase wall-clock attribution for the PCS prover (bench.py --phases).
# Inactive by default: PhaseTimer.mark is a no-op unless collect_phases()
# is live, so the hot path pays one None check per phase boundary.  When
# active, each mark fetches an O(1) slice of the given array first -
# block_until_ready is not a reliable completion barrier over the remote
# tunnel, a tiny device_get is (CLAUDE.md).

_PHASES: Optional[dict] = None


@contextlib.contextmanager
def collect_phases() -> Iterator[dict]:
    """Activate phase collection; yields the dict the timers fill."""
    global _PHASES
    _PHASES = {}
    try:
        yield _PHASES
    finally:
        _PHASES = None


class PhaseTimer:
    def __init__(self):
        self._t = time.perf_counter() if _PHASES is not None else None

    def mark(self, name: str, sync=None) -> None:
        """Attribute time since the previous mark to ``name``.

        ``sync``: optional device array whose first element is fetched to
        force completion of the phase's async work before reading the
        clock.
        """
        if _PHASES is None:
            return
        if sync is not None:
            import jax

            jax.device_get(sync.reshape(-1)[:1])
        now = time.perf_counter()
        _PHASES[name] = _PHASES.get(name, 0.0) + now - self._t
        self._t = now
