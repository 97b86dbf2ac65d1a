"""Find the DMA-floor-optimal Pallas block size for the field kernels.

kernel_probe.py showed the mul kernel at 2^22 is ~91% copy floor (3.04 of
3.35 ms) and the floor itself is only ~130 GB/s of the 819 GB/s HBM
roofline: with _SUB=8 each grid step DMAs eight separate 4 KB limb-plane
chunks per operand (the (8, M, 128) layout strides limbs by M*128*4 B) and
the grid has 4096 steps.  This tool times the copy floor and the full mul
at several sublane block sizes to pick _SUB.

Run on the TPU: python tools/block_probe.py [log_n]
"""

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

    from multilinear_tpu.field.pallas_ops import _mul_limbs
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

    def make(body, sub):
        def kernel(a_ref, b_ref, o_ref):
            al = [a_ref[i] for i in range(NLIMBS)]
            bl = [b_ref[i] for i in range(NLIMBS)]
            out = body(al, bl)
            for i in range(NLIMBS):
                o_ref[i] = out[i]

        def flat(a, b):
            m = a.shape[1]
            spec = pl.BlockSpec(
                (NLIMBS, sub, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NLIMBS, m, 128), jnp.uint32),
                grid=(m // sub,),
                in_specs=[spec, spec],
                out_specs=spec,
            )(a, b)

        return jax.jit(flat)

    def body_copy(al, bl):
        return [x + y for x, y in zip(al[:4], bl[:4])] + al[4:]

    a = rand_limbs(N).reshape(NLIMBS, N // 128, 128)
    b = rand_limbs(N).reshape(NLIMBS, N // 128, 128)

    K = 16
    traffic = 3 * a.nbytes

    for sub in (8, 16, 32, 64, 128, 256, 512):
        if (N // 128) % sub:
            continue
        for name, body in (("copy", body_copy), ("mul", _mul_limbs)):
            fn = make(body, sub)

            @jax.jit
            def chain(x, fn=fn):
                for _ in range(K):
                    x = fn(x, b)
                return x

            try:
                out = chain(a)
                jax.device_get(out.reshape(-1)[:8])
            except Exception as e:  # noqa: BLE001
                print(f"{name}@sub={sub}: FAILED {type(e).__name__}: {e}")
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = chain(a)
                jax.device_get(out.reshape(-1)[:8])
                best = min(best, time.perf_counter() - t0)
            per = best / K
            print(
                f"{name:5s} sub={sub:4d} 2^{log_n}: {per*1e3:.3f} ms"
                f"  ({traffic/per/1e9:.0f} GB/s of {HBM_GBPS:.0f})"
            )

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
