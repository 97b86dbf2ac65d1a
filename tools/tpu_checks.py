"""On-hardware parity + micro-benchmark checks for the Pallas kernels.

The CPU test suite pins the Pallas kernel MATH (pure-jnp body parity and
interpret-mode grid plumbing, tests/test_pallas.py); this script checks the
real Mosaic lowering on the TPU chip and reports kernel wall-clock.  Run it
after touching any kernel in field/pallas_ops.py or sha256_pallas.py:

    python tools/tpu_checks.py            # parity + timings, ~2-4 min warm

Timing methodology: block_until_ready is NOT a reliable completion barrier
over the axon tunnel - every timed region ends with a device_get of an
O(1) slice (see CLAUDE.md).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def _set_pallas(v):
    # use_pallas is read at TRACE time and jit caches by shape: without
    # clearing the trace caches, toggling mid-process silently keeps the
    # first-traced kernel (round-1 advisor finding).  The persistent
    # compile cache makes the retraces cheap.
    import jax

    from multilinear_tpu import config as cfg

    cfg.get_config().use_pallas = v
    jax.clear_caches()


def _timed(fn, *args, reps: int = 3):
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
        best = min(best, time.perf_counter() - t0)
    return out, best


def main() -> int:
    import jax

    from multilinear_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from multilinear_tpu import config as cfg
    from multilinear_tpu import fri as fri_mod
    from multilinear_tpu import sha256, sha256_pallas
    from multilinear_tpu.field import limbs, ops, pallas_ops
    from multilinear_tpu.field.scalar import Fp, TWO_INV

    if jax.default_backend() != "tpu":
        print("no TPU backend - nothing to check (CPU parity lives in tests/)")
        return 0

    rng = np.random.default_rng(7)
    failures = 0

    def rand_limbs(n):
        a = rng.integers(0, 1 << 16, size=(8, n), dtype=np.uint32)
        a[7] &= 0x7FFF  # < 2^127 < p
        return jnp.asarray(a)

    N = 1 << 22
    a, b = rand_limbs(N), rand_limbs(N)

    # --- field mul -------------------------------------------------------
    _set_pallas(False)
    want, _ = _timed(ops.mul, a, b)
    _set_pallas(True)
    got, dt = _timed(ops.mul, a, b)
    okay = np.array_equal(np.asarray(want), np.asarray(got))
    failures += not okay
    print(f"mul 2^22: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # --- fused FRI fold --------------------------------------------------
    code, tw = rand_limbs(2 * N), rand_limbs(N)
    r = jnp.asarray(limbs.pack_scalar(Fp(1234567890123)))
    h = jnp.asarray(limbs.pack_scalar(TWO_INV))
    _set_pallas(False)
    want, _ = _timed(fri_mod._fold_codeword, code, tw, r, h)
    _set_pallas(True)
    got, dt = _timed(fri_mod._fold_codeword, code, tw, r, h)
    okay = np.array_equal(np.asarray(want), np.asarray(got))
    failures += not okay
    print(f"fold 2^23->2^22: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # --- fused fold + leaf-hash round kernel ------------------------------
    from multilinear_tpu.merkle import _commit_layers

    _set_pallas(False)
    want_nxt, _ = _timed(fri_mod._fold_codeword, code, tw, r, h)
    want_layers, _ = _timed(
        lambda nx: _commit_layers(nx.reshape(8, 2, nx.shape[-1] // 2), 2), want_nxt
    )
    _set_pallas(True)
    (got_nxt, got_pairs, got_layers), dt = _timed(
        fri_mod._fold_and_commit, code, tw, r, h
    )
    okay = np.array_equal(np.asarray(want_nxt), np.asarray(got_nxt)) and all(
        np.array_equal(np.asarray(w), np.asarray(g))
        for w, g in zip(want_layers, got_layers)
    )
    failures += not okay
    print(f"fold+commit 2^23: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # --- SHA-256 ---------------------------------------------------------
    msgs = jnp.asarray(rng.integers(0, 1 << 32, size=(16, 1 << 20), dtype=np.uint32))
    _set_pallas(False)
    want, _ = _timed(lambda m: sha256.sha256_words(m, 16), msgs)
    _set_pallas(True)
    got, dt = _timed(lambda m: sha256_pallas.sha256_words(m, 16), msgs)
    okay = np.array_equal(np.asarray(want), np.asarray(got))
    failures += not okay
    print(f"sha256 2^20x16w: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # --- NTT (butterfly kernel path vs jnp path) -------------------------
    from multilinear_tpu.ntt import ntt

    x = rand_limbs(1 << 20)
    _set_pallas(False)
    want, _ = _timed(ntt, x)
    _set_pallas(True)
    got, dt = _timed(ntt, x)
    okay = np.array_equal(np.asarray(want), np.asarray(got))
    failures += not okay
    print(f"ntt 2^20: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # odd-log size: the Pease sub-transforms have log_m = 11, exercising
    # the twiddle-free final-stage kernel (butterfly_notw) on hardware
    x = rand_limbs(1 << 21)
    _set_pallas(False)
    want, _ = _timed(ntt, x)
    _set_pallas(True)
    got, dt = _timed(ntt, x)
    okay = np.array_equal(np.asarray(want), np.asarray(got))
    failures += not okay
    print(f"ntt 2^21: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # --- zeta/Moebius multi-stage butterfly (to_coeffs path) -------------
    from multilinear_tpu.mle import to_coeffs

    x = rand_limbs(1 << 20)
    _set_pallas(False)
    want, _ = _timed(to_coeffs, x)
    _set_pallas(True)
    got, dt = _timed(to_coeffs, x)
    okay = np.array_equal(np.asarray(want), np.asarray(got))
    failures += not okay
    print(f"to_coeffs 2^20: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # --- kron tensor-product multiply (delta-table build) ----------------
    from multilinear_tpu.mle import _kron_mul

    t8, s8 = rand_limbs(1 << 14), rand_limbs(256)
    kron_jit = jax.jit(_kron_mul)
    _set_pallas(False)
    want, _ = _timed(kron_jit, t8, s8)
    _set_pallas(True)
    got, dt = _timed(kron_jit, t8, s8)
    okay = np.array_equal(np.asarray(want), np.asarray(got))
    failures += not okay
    print(f"kron 2^14x256: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # --- shard_map round with Pallas body (multi-chip fast path) ---------
    from multilinear_tpu.parallel import hypercube_sharding, make_mesh
    from multilinear_tpu.parallel.shard_step import make_sharded_round
    from multilinear_tpu.parallel.step import pcs_prover_round

    mesh = make_mesh()  # 1 real chip here; same code spans real meshes
    hn = 1 << 20
    data = jax.device_put(
        jnp.stack([rand_limbs(hn), rand_limbs(hn)], axis=1),
        hypercube_sharding(mesh, 3),
    )
    codearr = jax.device_put(rand_limbs(2 * hn), hypercube_sharding(mesh, 2))
    tw2 = jax.device_put(rand_limbs(hn), hypercube_sharding(mesh, 2))
    _set_pallas(False)
    want, _ = _timed(pcs_prover_round, data, codearr, tw2, r, h)
    _set_pallas(True)
    got, dt = _timed(make_sharded_round(mesh), data, codearr, tw2, r, h)
    okay = all(
        np.array_equal(np.asarray(w), np.asarray(g)) for w, g in zip(want, got)
    )
    failures += not okay
    print(f"shard_map round 2^20: {'OK' if okay else 'MISMATCH'}  pallas={dt*1e3:.2f} ms")

    # --- full shard_map PCS round (the production multi-chip path) -------
    # parity vs the jnp streamed round AND a Mosaic-lowering assertion:
    # the compiled shard_map round must contain tpu_custom_call (the
    # Pallas kernels), which the GSPMD round cannot have on a >1-device
    # mesh (VERDICT r2 item 4 'done' criterion; a 1-chip mesh runs the
    # identical shard_map code path).
    from multilinear_tpu import device_transcript as dtr
    from multilinear_tpu.ntt import inv_gen_pows
    from multilinear_tpu.parallel.sharded_rounds import make_pcs_round
    from multilinear_tpu.pcs import _device_pcs_round
    from multilinear_tpu.transcript import Transcript

    log_n = 18
    hn2 = 1 << log_n
    data_np = np.stack(
        [np.asarray(rand_limbs(hn2)), np.asarray(rand_limbs(hn2))], axis=1
    )
    code_np = np.asarray(rand_limbs(2 * hn2))
    inv_pows = inv_gen_pows(log_n + 1)
    prev = jnp.asarray(limbs.pack_scalar(Fp(424242)))

    _set_pallas(False)
    tr0 = dtr.state_from_host(Transcript())
    want = _device_pcs_round(
        jnp.asarray(data_np), jnp.asarray(code_np), inv_pows, tr0, prev, 0
    )
    want_leaves = jax.tree_util.tree_leaves(want)
    jax.device_get(want_leaves[0].reshape(-1)[:8])

    _set_pallas(True)
    rnd = make_pcs_round(mesh)
    tr1 = dtr.state_from_host(Transcript())
    args = (jnp.asarray(data_np), jnp.asarray(code_np), inv_pows, tr1, prev)
    compiled = rnd.lower(*args, 0).compile()
    hlo = compiled.as_text()
    has_mosaic = "tpu_custom_call" in hlo
    got, dt = _timed(lambda *a: rnd(*a, 0), *args)
    got_leaves = jax.tree_util.tree_leaves(got)
    okay = has_mosaic and len(want_leaves) == len(got_leaves) and all(
        np.array_equal(np.asarray(w), np.asarray(g))
        for w, g in zip(want_leaves, got_leaves)
    )
    failures += not okay
    print(
        f"shard_map FULL round 2^{log_n}: {'OK' if okay else 'MISMATCH'}"
        f"  mosaic_custom_call={has_mosaic}  pallas={dt*1e3:.2f} ms"
    )

    _set_pallas(None)
    print("ALL OK" if not failures else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
