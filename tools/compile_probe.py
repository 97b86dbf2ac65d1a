"""Measure XLA:CPU trace+compile wall time of the hot jitted programs.

The round-4 kernel rewrites (K-shift folds, multiply-free half, 2-mul FRI
fold) regressed XLA:CPU compile time 5-26x (round-4 verdict, weak #1) and
broke the driver's multichip dryrun gate.  This probe is the A/B harness:
run it on any tree to get cold trace+compile seconds for the programs the
gate needs.  No persistent cache is enabled, so numbers are true cold
compiles regardless of .jax_cache state.

Usage:  python tools/compile_probe.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{label:32s} trace {t1-t0:7.2f} s   compile {t2-t1:7.2f} s")
    return t2 - t0


def main():
    from multilinear_tpu.field import limbs, ops
    from multilinear_tpu import fri

    n = 1 << 10
    a = jnp.asarray(limbs.pack_ints([i * 3 + 1 for i in range(n)]))
    b = jnp.asarray(limbs.pack_ints([i * 5 + 2 for i in range(n)]))
    timed("ops.mul (2^10)", ops.mul._fun if hasattr(ops.mul, "_fun") else ops.mul, a, b)

    from multilinear_tpu.field.scalar import Fp, TWO_INV, pow2_generator, P

    m = 1 << 10
    code = jnp.asarray(limbs.pack_ints([i * 5 + 2 for i in range(m)]))
    inv_gen = pow2_generator(10).inv().v
    tw_vals, acc = [], 1
    for _ in range(m // 2):
        tw_vals.append(acc)
        acc = acc * inv_gen % P
    twiddles = jnp.asarray(limbs.pack_ints(tw_vals))
    r = jnp.asarray(limbs.pack_scalar(Fp(123456789)))
    half = jnp.asarray(limbs.pack_scalar(TWO_INV))
    timed("_fold_codeword (2^10)", fri._fold_codeword, code, twiddles, r, half)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    timed("entry pcs_prover_round (2^10)", fn, *args)


if __name__ == "__main__":
    main()
