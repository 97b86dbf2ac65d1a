"""Failure detection + retry for the shared-chip reality (SURVEY.md 5).

The reference has no failure handling at all; this framework's production
concern is concrete: the shared TPU sporadically throws RESOURCE_EXHAUSTED
under co-tenant HBM pressure (CLAUDE.md) - not deterministically, and
usually against the largest single programs.  ``prove_with_retry`` wraps
any deterministic prove callable:

* a transient RESOURCE_EXHAUSTED triggers a retry with a tighter program
  budget (halved ``fused_round_max_code`` / ``kernel_chunk``) - smaller
  bounded dispatches survive pressure spikes at a small speed cost;
* proofs are deterministic, so a retry from scratch is always sound
  (byte-identical transcript), and the original config is restored after;
* non-OOM errors propagate unchanged.

For multi-hour proofs, combine with PCSProverSession.save/resume
(checkpoint.py) - this module handles the in-process spike case.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, TypeVar

from .config import get_config, set_config

T = TypeVar("T")


def is_resource_exhausted(exc: BaseException) -> bool:
    """True for XLA RESOURCE_EXHAUSTED / out-of-memory failures."""
    text = f"{type(exc).__name__}: {exc}"
    return "RESOURCE_EXHAUSTED" in text or "Out of memory" in text


def prove_with_retry(prove: Callable[[], T], max_retries: int = 2) -> T:
    """Run ``prove`` with OOM-pressure retries under tighter budgets.

    ``prove`` must be a deterministic zero-argument callable (e.g.
    ``lambda: PCSProof.prove(inputs, output, evals, Transcript())`` -
    note a FRESH transcript per attempt).  Each retry halves the fused-
    program and chunk budgets before re-running, then the original
    config is restored.
    """
    import jax

    original = get_config()
    try:
        for attempt in range(max_retries + 1):
            try:
                return prove()
            except Exception as exc:  # noqa: BLE001 - filtered below
                if attempt >= max_retries or not is_resource_exhausted(exc):
                    raise
                cfg = get_config()
                set_config(
                    replace(
                        cfg,
                        stream_oversized=False,
                        stream_round_pairs=False,
                        fused_round_max_code=max(
                            cfg.fused_round_max_code // 2, 1 << 18
                        ),
                        kernel_chunk=max(cfg.kernel_chunk // 2, 1 << 18),
                    )
                )
                # drop traced programs so the tighter budgets actually
                # produce smaller dispatches (trace-time config reads)
                jax.clear_caches()
    finally:
        set_config(original)
    raise AssertionError("unreachable")
