"""Sweep the SHA-256 Pallas kernel's sublane block size on hardware.

The compression has a long per-round dependency chain, so with sub=8 (one
(8,128) vreg per live word) the VPU ports are starved by latency; larger
sub gives sub/8 independent instruction streams - but each live word then
costs sub/8 vregs, and SHA keeps ~80 live words, so past the register file
(~few hundred vregs) Mosaic spills every round.  This sweep finds the knee.

Timing forces execution via a chained dependency (output feeds the next
iteration) and a final O(1) device_get, like tools/roofline.py.

Run on the TPU: python tools/sha_probe.py [log_lanes]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multilinear_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    log_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log_lanes
    n_words = 16  # one Merkle pair leaf / node message: 64 bytes

    from multilinear_tpu import sha256_pallas as sp

    rng = np.random.default_rng(0)
    msg = jnp.asarray(rng.integers(0, 1 << 32, size=(n_words, n), dtype=np.uint64).astype(np.uint32))

    # reference digest (jnp scan path) for parity
    from multilinear_tpu.sha256 import sha256_words as sha_jnp

    want = np.asarray(jax.device_get(sha_jnp(msg, n_words))[:, :4])

    for sub in (8, 16, 32, 64, 128):
        if (n // 128) % sub:
            print(f"sub={sub:4d}: skipped (does not divide)")
            continue

        def run(m, sub=sub):
            return sp._sha_flat(
                m.reshape(n_words, n // 128, 128), n_words, sub=sub
            ).reshape(8, n)

        out = run(msg)
        got = np.asarray(jax.device_get(out)[:, :4])
        ok = bool((got == want).all())
        # chained timing: feed 16 copies of the digest back as the message
        def chained(m, reps=8, sub=sub):
            x = m
            for _ in range(reps):
                d = run(x)
                x = jnp.concatenate([d, d], axis=0)  # (16, n) again
            return d

        chained(msg)  # warm/compile
        jax.device_get(chained(msg)[:, :1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(chained(msg)[:, :1])
            best = min(best, time.perf_counter() - t0)
        per_call = best / 8
        # each call = n messages of 2 blocks (16 words + padding block)
        mhs = n / per_call / 1e6
        print(
            f"sub={sub:4d}: parity={'OK ' if ok else 'BAD'} "
            f"{per_call*1e3:7.2f} ms/call  {mhs:8.1f} Mhash/s  "
            f"({2*mhs:7.1f} Mblock/s)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
