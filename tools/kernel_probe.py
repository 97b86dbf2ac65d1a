"""Locate where the Pallas field-mul time goes (compute vs traffic vs grid).

The measured mul is ~3.7 ms per 2^22 elements = 110 GB/s of the 819 GB/s
HBM roofline - neither bandwidth- nor obviously compute-bound.  This tool
times COST-PROBE variants of the kernel (same block structure, reduced
math; the math-reduced variants return WRONG field values on purpose) with
the chained methodology from tools/roofline.py, so the gap decomposes:

  copy      : DMA/grid floor (no compute)
  addmask   : 64 fake "products" replaced by cheap add+mask (no u32 mul)
  prodonly  : real 64 products + lo/hi accumulation, no reduction/carries
  full      : the real kernel (bit-exact field mul)

Run on the TPU: python tools/kernel_probe.py [log_n]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

HBM_GBPS = 819.0


def main() -> int:
    import jax

    from multilinear_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from multilinear_tpu.field import ops
    from multilinear_tpu.field.pallas_ops import (
        _MASK,
        _SUB,
        _mul_limbs,
        _wide_cols,
    )
    from multilinear_tpu.field.limbs import NLIMBS

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return 1

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    N = 1 << log_n

    rng = np.random.default_rng(11)

    def rand_limbs(n):
        a = rng.integers(0, 1 << 16, size=(8, n), dtype=np.uint32)
        a[7] &= 0x7FFF
        return jnp.asarray(a)

    def make_kernel(body):
        def kernel(a_ref, b_ref, o_ref):
            al = [a_ref[i] for i in range(NLIMBS)]
            bl = [b_ref[i] for i in range(NLIMBS)]
            out = body(al, bl)
            for i in range(NLIMBS):
                o_ref[i] = out[i]

        @jax.jit
        def flat(a, b):
            m = a.shape[1]
            spec = pl.BlockSpec(
                (NLIMBS, _SUB, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NLIMBS, m, 128), jnp.uint32),
                grid=(m // _SUB,),
                in_specs=[spec, spec],
                out_specs=spec,
            )(a, b)

        return flat

    def body_copy(al, bl):
        return [x + y for x, y in zip(al[:4], bl[:4])] + al[4:]

    def body_addmask(al, bl):
        # same loop structure/accumulator count as _wide_cols, no u32 mul
        zero = jnp.zeros_like(al[0])
        cols_lo = [zero] * 15
        cols_hi = [zero] * 15
        for i in range(8):
            for j in range(8):
                p = al[i] + bl[j]
                k = i + j
                cols_lo[k] = cols_lo[k] + (p & _MASK)
                cols_hi[k] = cols_hi[k] + (p >> 16)
        return [(cols_lo[i] + cols_hi[i]) & _MASK for i in range(8)]

    def body_prodonly(al, bl):
        t = _wide_cols(al, bl)
        return [x & _MASK for x in t[:8]]

    variants = {
        "copy": make_kernel(body_copy),
        "addmask": make_kernel(body_addmask),
        "prodonly": make_kernel(body_prodonly),
        "full": make_kernel(_mul_limbs),
    }

    a = rand_limbs(N).reshape(NLIMBS, N // 128, 128)
    b = rand_limbs(N).reshape(NLIMBS, N // 128, 128)

    K = 16
    traffic = 3 * a.nbytes

    for name, fn in variants.items():
        @jax.jit
        def chain(x, fn=fn):
            for _ in range(K):
                x = fn(x, b)
            return x

        out = chain(a)
        jax.device_get(out.reshape(-1)[:8])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(a)
            jax.device_get(out.reshape(-1)[:8])
            best = min(best, time.perf_counter() - t0)
        per = best / K
        print(
            f"{name:9s} 2^{log_n}: {per*1e3:.3f} ms"
            f"  ({traffic/per/1e9:.0f} GB/s of {HBM_GBPS:.0f})"
        )

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
