"""Roofline reconciliation for the hot kernels (round-1 weak item 2).

Round 1 claimed "~40 us per 2^22 mul", which is ~12x over what v5e HBM
bandwidth permits for 402 MB of traffic - the timing harness was not
forcing execution the way it believed.  This tool measures each kernel
with a methodology that provably cannot under-count:

* CHAINED iterations: out_{i+1} = kernel(out_i, ...) for K iterations
  inside one jit, then ONE O(1) fetch.  Every iteration's output feeds
  the next, so no lazy-slice or dead-code elimination can skip work;
  wall-clock / K is the amortized per-call time at steady state.
* A cross-check with the naive slice-fetch timing, so the gap between
  the two methodologies is itself reported.

Prints achieved GB/s against the ~819 GB/s v5e HBM roofline.

Run on the TPU: python tools/roofline.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

HBM_GBPS = 819.0  # v5e peak HBM bandwidth


def main() -> int:
    import jax

    from multilinear_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from multilinear_tpu import config as cfg
    from multilinear_tpu import sha256, sha256_pallas
    from multilinear_tpu.field import limbs, ops
    from multilinear_tpu.field.scalar import Fp, TWO_INV
    from multilinear_tpu import fri as fri_mod

    if jax.default_backend() != "tpu":
        print("needs the TPU backend")
        return 1

    # one kernel flavor per PROCESS: use_pallas is read at trace time and
    # jit caches by shape, so toggling mid-process silently reuses the
    # first-traced kernel (round-1 advisor finding - this very bug made
    # round 1's "pallas" timings measure the jnp kernels)
    flavor = sys.argv[1] if len(sys.argv) > 1 else "auto"
    if flavor in ("pallas", "jnp"):
        cfg.get_config().use_pallas = flavor == "pallas"

    rng = np.random.default_rng(7)

    def rand_limbs(n):
        a = rng.integers(0, 1 << 16, size=(8, n), dtype=np.uint32)
        a[7] &= 0x7FFF
        return jnp.asarray(a)

    K = 16

    def timed_chain(step, x0, reps=3):
        """jit a K-iteration dependency chain; min wall over reps / K."""

        @jax.jit
        def chain(x):
            for _ in range(K):
                x = step(x)
            return x

        out = chain(x0)
        jax.device_get(out.reshape(-1)[:8])  # warm + load
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = chain(x0)
            jax.device_get(out.reshape(-1)[:8])
            best = min(best, time.perf_counter() - t0)
        return best / K

    def timed_naive(fn, *args, reps=3):
        out = fn(*args)
        jax.device_get(out.reshape(-1)[:8])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.device_get(out.reshape(-1)[:8])
            best = min(best, time.perf_counter() - t0)
        return best

    N = 1 << 22
    a, b = rand_limbs(N), rand_limbs(N)

    if True:
        from multilinear_tpu.config import pallas_enabled

        tag = "pallas" if pallas_enabled() else "jnp"

        # --- field mul: traffic = in 2x134MB + out 134MB (chained reuses
        # one input, so per-iteration traffic is 2 reads + 1 write of the
        # evolving operand + 1 read of b: model 3 arrays min, 402 MB)
        per = timed_chain(lambda x: ops.mul(x, b), a)
        naive = timed_naive(ops.mul, a, b)
        traffic = 3 * a.nbytes
        print(
            f"mul[{tag}] 2^22: chained {per*1e3:.3f} ms ({traffic/per/1e9:.0f} GB/s"
            f" of {HBM_GBPS:.0f}), naive-slice {naive*1e3:.3f} ms"
        )

        # --- FRI fold: code 2x134MB read + tw 67MB read + out 67MB write
        code, tw = rand_limbs(2 * N), rand_limbs(N)
        r = jnp.asarray(limbs.pack_scalar(Fp(1234567890123)))
        hlf = jnp.asarray(limbs.pack_scalar(TWO_INV))

        def fold_step(x):
            folded = fri_mod._fold_codeword(x, tw, r, hlf)  # (8, N)
            return jnp.concatenate([folded, folded], axis=-1)  # keep shape

        per = timed_chain(fold_step, code)
        traffic = code.nbytes + tw.nbytes + code.nbytes // 2 + code.nbytes
        print(
            f"fold[{tag}] 2^23: chained {per*1e3:.3f} ms"
            f" ({traffic/per/1e9:.0f} GB/s incl. re-concat)"
        )

        # --- SHA-256, 16-word messages x 2^20 lanes: 64MB read + 32MB write
        msgs = jnp.asarray(
            rng.integers(0, 1 << 32, size=(16, 1 << 20), dtype=np.uint32)
        )
        sha_fn = sha256_pallas.sha256_words if tag == "pallas" else sha256.sha256_words

        def sha_step(m):
            d = sha_fn(m, 16)  # (8, n)
            return jnp.concatenate([d, d], axis=0)  # back to 16 rows

        per = timed_chain(sha_step, msgs)
        nh = msgs.shape[1]
        print(
            f"sha256[{tag}] 2^20 msgs: chained {per*1e3:.3f} ms"
            f" ({nh/per/1e6:.0f} Mhash/s)"
        )

        # --- zeta/Moebius transform (to_coeffs): log n bit-stages.
        # jnp path sweeps HBM once per bit (2 x 134 MB x 22 stages at
        # 2^22); the multi-stage kernel sweeps ceil(22/8)+transpose passes.
        from multilinear_tpu import mle

        def moeb_step(x):
            return mle.to_coeffs(x)

        per = timed_chain(moeb_step, a)
        print(
            f"to_coeffs[{tag}] 2^22: chained {per*1e3:.3f} ms"
            f" ({2*a.nbytes/per/1e9:.0f} GB/s per-sweep-pair equiv)"
        )

        # --- NTT 2^22 (four-step: butterflies + twiddle mul + transposes)
        from multilinear_tpu.ntt import ntt

        per = timed_chain(lambda x: ntt(x), a)
        naive = timed_naive(ntt, a)
        print(
            f"ntt[{tag}] 2^22: chained {per*1e3:.3f} ms, naive-slice {naive*1e3:.3f} ms"
        )

        # --- delta-table build via kron (2^22 table from 256/256/64 subs)
        from multilinear_tpu.mle import delta_subtables, combine_subtables

        # 24 vars -> 8+8+8 chunks (the kron kernel needs the trailing
        # factor divisible by 128); output (8, 2^24) = 512 MB
        subs = delta_subtables([Fp(i * 3 + 5) for i in range(24)])
        kron_jit = jax.jit(combine_subtables)
        naive = timed_naive(kron_jit, subs)
        out_bytes = 8 * (1 << 24) * 4
        print(
            f"delta/kron[{tag}] 2^24: {naive*1e3:.3f} ms"
            f" ({out_bytes/naive/1e9:.0f} GB/s output write rate)"
        )

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
