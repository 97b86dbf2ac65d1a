"""Decompose the PCS encode phase (1.2 s of the 3.45 s 2^24 prove).

encode_mle_for_fri = Moebius transform + coefficient bit-reversal +
zero-pad (one jit) -> four-step NTT at 2^(n+1) (one jit).  This times
each piece as its own chained jit so the 1.2 s attributes to transform
vs bit-reversal vs NTT, plus the NTT's sub-kernels.

Run on the TPU: python tools/encode_probe.py [log_n]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    from multilinear_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from multilinear_tpu import mle
    from multilinear_tpu import ntt as ntt_mod
    from multilinear_tpu.field.scalar import pow2_generator
    from multilinear_tpu.fri import _coeffs_for_fri, encode_mle_for_fri
    from multilinear_tpu.ntt import LOG_BLOWUP

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return 1

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    N = 1 << log_n

    rng = np.random.default_rng(5)
    a = rng.integers(0, 1 << 16, size=(8, N), dtype=np.uint32)
    a[7] &= 0x7FFF
    evals = jnp.asarray(a)

    def timed(label, fn, *args, reps=3):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:24s} {best*1e3:8.1f} ms")
        return out

    to_coeffs_jit = jax.jit(mle.to_coeffs)
    bitrev_jit = jax.jit(mle.bit_reverse)

    coeffs = timed("moebius (to_coeffs)", to_coeffs_jit, evals)
    timed("bit_reverse", bitrev_jit, coeffs)
    padded = timed("coeffs_for_fri (all 3)", _coeffs_for_fri, evals)

    gen = pow2_generator(log_n + LOG_BLOWUP).v
    timed(
        f"fourstep 2^{log_n + LOG_BLOWUP}",
        lambda x: ntt_mod.fourstep_transform(x, gen, log_n + LOG_BLOWUP),
        padded,
    )
    timed("encode (full)", encode_mle_for_fri, evals)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
