"""Decompose the device Merkle commit: where does tree time go?

tools/pcs_round_probe.py measured tree_commit at a 2^22-pair round ~5x
over the raw SHA-256 block throughput (73 ms vs ~14 ms of blocks at the
sha_probe-measured 900 Mblock/s).  This times each piece at one size:
leaf hashing, each level's hash pass, the de-interleave+concat glue, and
the raw Pallas SHA call on identical shapes.

Run on the TPU: python tools/merkle_probe.py [log_pairs]
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
    log_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log_pairs

    from multilinear_tpu.field import limbs
    from multilinear_tpu.merkle import _commit_layers, _leaf_hashes, _tree_levels
    from multilinear_tpu.sha256 import limbs_to_words, sha256_words

    leaf_cols = jnp.asarray(
        limbs.pack_ints(np.arange(2 * n, dtype=np.uint64) * 5 + 1, shape=(2, n))
    )

    t_all = timeit(lambda: _commit_layers(leaf_cols, 2))
    t_leaf = timeit(lambda: _leaf_hashes(leaf_cols, 2))
    leaves = _leaf_hashes(leaf_cols, 2)
    leaves.block_until_ready()
    t_levels = timeit(lambda: _tree_levels(leaves))

    # raw SHA at the leaf shape: (8, n) words -> 1-block hashes
    words8 = limbs_to_words(leaf_cols[:, 0, :])
    words8 = jnp.concatenate([words8, words8], axis=0)  # (8, n)
    t_sha_leafshape = timeit(lambda: sha256_words(words8, 8))

    # raw SHA at the level-1 shape: (16, n/2) -> 2-block hashes
    msg16 = jnp.concatenate(
        [leaves[:, : n // 2], leaves[:, n // 2 :]], axis=0
    )
    msg16.block_until_ready()
    t_sha_nodeshape = timeit(lambda: sha256_words(msg16, 16))

    # the de-interleave+concat glue alone at level 1
    @jax.jit
    def glue(cur):
        pairs = cur.reshape(8, cur.shape[1] // 2, 2)
        return jnp.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=0)

    t_glue = timeit(lambda: glue(leaves))

    # one full level (glue + hash) at level 1
    @jax.jit
    def level1(cur):
        pairs = cur.reshape(8, cur.shape[1] // 2, 2)
        msg = jnp.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=0)
        return sha256_words(msg, 16)

    t_level1 = timeit(lambda: level1(leaves))

    print(f"pairs=2^{log_pairs}")
    print(f"  full commit (all levels):   {t_all*1e3:8.2f} ms")
    print(f"  leaf hashes only:           {t_leaf*1e3:8.2f} ms")
    print(f"  all levels above leaves:    {t_levels*1e3:8.2f} ms")
    print(f"  raw SHA leaf shape (8,n):   {t_sha_leafshape*1e3:8.2f} ms")
    print(f"  raw SHA node shape (16,n/2):{t_sha_nodeshape*1e3:8.2f} ms")
    print(f"  level-1 glue alone:         {t_glue*1e3:8.2f} ms")
    print(f"  level-1 glue+hash:          {t_level1*1e3:8.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
