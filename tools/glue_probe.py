"""Compare formulations of the Merkle level de-interleave on hardware.

tools/merkle_probe.py pinned the tree cost to the per-level glue (extract
digests of children 2i/2i+1 into a (16, n/2) message block): ~15 ms at
2^21 nodes where the hash itself is ~1 ms.  This times candidate
lowerings of the same permutation.

Run on the TPU: python tools/glue_probe.py [log_n]
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


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log_n
    cur = jnp.asarray(
        np.random.default_rng(1).integers(0, 1 << 32, (8, n), dtype=np.uint32)
    )

    @jax.jit
    def glue_gather(cur):
        pairs = cur.reshape(8, n // 2, 2)
        return jnp.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=0)

    @jax.jit
    def glue_moveaxis(cur):
        pairs = cur.reshape(8, n // 2, 2)
        return jnp.moveaxis(pairs, 2, 1).reshape(16, n // 2)

    @jax.jit
    def glue_strided(cur):
        return jnp.concatenate([cur[:, 0::2], cur[:, 1::2]], axis=0)

    @jax.jit
    def glue_blocked(cur):
        # the same global even/odd de-interleave, expressed as a
        # minor-dims transpose: lane l = i*256 + 2j + k -> (k, i*128 + j)
        b = cur.reshape(8, n // 256, 128, 2)
        t = jnp.moveaxis(b, 3, 0)  # (2, 8, n/256, 128)
        return t.reshape(16, n // 2)

    outs = {}
    for name, fn in [
        ("gather (current)", glue_gather),
        ("moveaxis", glue_moveaxis),
        ("strided slices", glue_strided),
        ("blocked transpose", glue_blocked),
    ]:
        try:
            t = timeit(lambda f=fn: f(cur))
            outs[name] = np.asarray(fn(cur))
            print(f"  {name:20s} {t*1e3:8.2f} ms")
        except Exception as e:
            print(f"  {name:20s} FAILED {type(e).__name__}")
    ref = outs.get("gather (current)")
    for name, v in outs.items():
        if ref is not None and not (v == ref).all():
            print(f"  {name}: OUTPUT MISMATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
