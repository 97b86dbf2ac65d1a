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
