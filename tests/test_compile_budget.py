"""Compile-time regression guards (round-4 postmortem).

Round 4 shipped kernel forms (K-shift reduction folds) that were runtime
wins on TPU but exploded XLA:CPU compile time 5-26x — `_fold_kernel` at a
(8, 2, 1024) table went from 2.3 s to >300 s, which broke the driver's
multichip dryrun gate (MULTICHIP_r04 rc=124) and made whole test files
un-runnable cold.  These tests pin trace+compile wall time for the
programs the gate needs, so a kernel rewrite can never silently blow up
the CPU build again.

Budgets are deliberately generous (~5x the measured healthy time on this
machine) to absorb machine variance; the failure mode they catch is a
10-100x pathology, not a 2x slowdown.  The persistent cache does not mask
regressions: any kernel rewrite changes the debug-stripped HLO key, so a
regressed form always pays (and fails on) a real compile.
"""

import time

import jax
import jax.numpy as jnp
import pytest

from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp, TWO_INV, P, pow2_generator

# measured healthy: _fold_kernel 2.3 s, _fold_codeword 3.7 s, entry 9.6 s
FOLD_BUDGET_S = 20.0
ENTRY_BUDGET_S = 60.0


def _compile_seconds(jitted, *args) -> float:
    t0 = time.perf_counter()
    lowered = jitted.lower(*args) if hasattr(jitted, "lower") else jax.jit(jitted).lower(*args)
    lowered.compile()
    return time.perf_counter() - t0


def _round_args(n_vars: int):
    h = 1 << n_vars
    m = 2 * h
    data = jnp.asarray(
        limbs.pack_ints(
            [i * 7 + 3 for i in range(h)] + [i + 1 for i in range(h)], shape=(2, h)
        )
    )
    code = jnp.asarray(limbs.pack_ints([i * 5 + 2 for i in range(m)]))
    inv_gen = pow2_generator(n_vars + 1).inv().v
    tw_vals, acc = [], 1
    for _ in range(m // 2):
        tw_vals.append(acc)
        acc = acc * inv_gen % P
    twiddles = jnp.asarray(limbs.pack_ints(tw_vals))
    r = jnp.asarray(limbs.pack_scalar(Fp(123456789)))
    half = jnp.asarray(limbs.pack_scalar(TWO_INV))
    return data, code, twiddles, r, half


def test_fold_kernel_compile_budget():
    from multilinear_tpu.sumcheck import _fold_kernel

    data, _, _, r, _ = _round_args(10)
    dt = _compile_seconds(_fold_kernel, data, r)
    assert dt < FOLD_BUDGET_S, f"_fold_kernel compile took {dt:.1f} s (budget {FOLD_BUDGET_S})"


def test_fold_codeword_compile_budget():
    from multilinear_tpu import fri

    _, code, twiddles, r, half = _round_args(10)
    dt = _compile_seconds(fri._fold_codeword, code, twiddles, r, half)
    assert dt < FOLD_BUDGET_S, f"_fold_codeword compile took {dt:.1f} s (budget {FOLD_BUDGET_S})"


def test_entry_round_compile_budget():
    """The exact program the driver compile-checks (__graft_entry__.entry)."""
    from multilinear_tpu.parallel.step import pcs_prover_round

    args = _round_args(10)
    dt = _compile_seconds(pcs_prover_round, *args)
    assert dt < ENTRY_BUDGET_S, f"entry round compile took {dt:.1f} s (budget {ENTRY_BUDGET_S})"


def test_kshift_forms_match_wide_forms():
    """Both reduction-fold forms produce identical canonical values.

    The backend gate (ops._use_kshift) makes the form a pure compile-time
    choice; this pins the math equivalence the gate relies on.
    """
    import random

    import numpy as np

    from multilinear_tpu.field import ops

    rng = random.Random(7)
    vals = [rng.randrange(P) for _ in range(64)]
    a = jnp.asarray(limbs.pack_ints(vals[:32]))
    b = jnp.asarray(limbs.pack_ints(vals[32:]))
    old = ops._FORCE_KSHIFT
    try:
        ops._FORCE_KSHIFT = False
        jax.clear_caches()
        wide = np.asarray(ops.mul(a, b))
        ops._FORCE_KSHIFT = True
        jax.clear_caches()
        shift = np.asarray(ops.mul(a, b))
    finally:
        ops._FORCE_KSHIFT = old
        jax.clear_caches()
    assert (wide == shift).all()
