"""Decompose rounds_streaming of the 2^24 PCS (round-4: the 0.71 s phase).

Times every streamed round DISPATCH with a hard sync after each (device_get
of an O(1) slice - block_until_ready is unreliable over the tunnel), then
decomposes one mid-size round (k=2, code 2^23) into its component kernels:
codeword fold, Merkle tree commit (SHA-256), sumcheck table fold, partial
sums.  This says whether the phase is bandwidth (folds), compute (SHA),
or dispatch-latency bound per round.

Run on the TPU: python tools/pcs_round_probe.py [log_n]
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
    """Force execution: fetch one element of the newest output."""
    jax.device_get(jax.tree_util.tree_leaves(x)[0][..., :1])


def main() -> int:
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    from multilinear_tpu import device_transcript as dtr
    from multilinear_tpu.config import get_config
    from multilinear_tpu.field import limbs
    from multilinear_tpu.field.scalar import TWO_INV, Fp
    from multilinear_tpu.fri import FriProverData, encode_mle_for_fri
    from multilinear_tpu.merkle import MerkleTree
    from multilinear_tpu.ntt import LOG_BLOWUP, inv_gen_pows
    from multilinear_tpu.pcs import (
        _device_pcs_round,
        _device_pcs_round2,
        _device_pcs_round_big,
        _fold_and_commit,
        _fold_kernel,
    )
    from multilinear_tpu.sumcheck import HOST_THRESHOLD, SumcheckTables
    from multilinear_tpu.transcript import Transcript

    n = 1 << log_n
    cfg = get_config()
    print(f"log_n={log_n}  fused_round_max_code=2^{cfg.fused_round_max_code.bit_length()-1}"
          f"  host_threshold={HOST_THRESHOLD()}  chunk={cfg.kernel_chunk}")

    evals = jnp.asarray(
        limbs.pack_ints(np.arange(n, dtype=np.uint64) * 7 + 3, shape=(n,))
    )
    inputs = [Fp(i + 2) for i in range(log_n)]

    transcript = Transcript()
    code = encode_mle_for_fri(evals)
    fri_data = FriProverData.init(code, transcript)
    tables = SumcheckTables.for_pcs(inputs, evals)
    sync(tables.data)
    del evals, code
    fri_data.trees = []  # the L0 tree is not needed for round timing
    print("setup done (encode + commit_l0 + tables)")

    inv_pows = inv_gen_pows(fri_data._log_domain)
    tr_state = dtr.state_from_host(transcript)
    prev = jnp.asarray(limbs.pack_scalar(Fp(0)))  # value-irrelevant for timing
    half_limbs = jnp.asarray(limbs.pack_scalar(TWO_INV))
    blowup = 1 << LOG_BLOWUP

    # -- per-round dispatch timings (each synced) ---------------------------
    # pass 0 warms (first in-process execution pays ~10-15 s/program
    # loading cached executables over the tunnel); pass 1 is the timing.
    C = cfg.kernel_chunk
    for p in range(2):
        data, cur = tables.data, fri_data._current
        k = 0
        total = 0.0
        rows = []
        while True:
            m = cur.shape[-1]
            half = m // 2
            if not (half > blowup and half > HOST_THRESHOLD()):
                break
            if m > cfg.fused_round_max_code:
                t0 = time.perf_counter()
                data, cur, pairs, layers, tr_state, meta = _device_pcs_round_big(
                    data, cur, inv_pows, tr_state, prev, k, C
                )
                sync(meta[3]); dt = time.perf_counter() - t0
                rows.append(f"  k={k:2d} code=2^{m.bit_length()-1} BIG      {dt*1e3:8.2f} ms")
                prev = meta[3]; k += 1
            elif half // 2 > blowup and half // 2 > HOST_THRESHOLD():
                t0 = time.perf_counter()
                data, cur, (pa, la), (pb, lb), tr_state, (ma, mb) = _device_pcs_round2(
                    data, cur, inv_pows, tr_state, prev, k
                )
                sync(mb[3]); dt = time.perf_counter() - t0
                rows.append(f"  k={k:2d} code=2^{m.bit_length()-1} PAIR     {dt*1e3:8.2f} ms")
                prev = mb[3]; k += 2
            else:
                t0 = time.perf_counter()
                data, cur, pairs, layers, tr_state, meta = _device_pcs_round(
                    data, cur, inv_pows, tr_state, prev, k
                )
                sync(meta[3]); dt = time.perf_counter() - t0
                rows.append(f"  k={k:2d} code=2^{m.bit_length()-1} SINGLE   {dt*1e3:8.2f} ms")
                prev = meta[3]; k += 1
            total += dt
        if p == 1:
            print("\n".join(rows))
            print(f"  sum of synced round dispatches (warm): {total*1e3:.1f} ms")

    # -- component decomposition at one mid-size round ----------------------
    # rebuild a k=2-sized state (code 2^(log_n-1), tables 2^(log_n-2))
    for probe_k in (2, 6, 10):
        msize = (1 << (log_n + LOG_BLOWUP)) >> probe_k
        if msize // 2 <= max(blowup, HOST_THRESHOLD()):
            continue
        codek = jnp.asarray(
            limbs.pack_ints(
                np.arange(msize, dtype=np.uint64) * 5 + 1, shape=(msize,)
            )
        )
        datak = jnp.asarray(
            limbs.pack_ints(
                np.arange(msize, dtype=np.uint64) * 3 + 2, shape=(msize,)
            )
        ).reshape(8, 2, msize // 2)
        r = jnp.asarray(limbs.pack_scalar(Fp(12345)))
        twid = inv_pows[:, :: 1 << probe_k][:, : msize // 2]

        def timeit(fn, *args, reps=5):
            out = fn(*args); sync(out)  # warm (compile/load)
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(*args)
                sync(out)
                best = min(best, time.perf_counter() - t0)
            return best

        from multilinear_tpu.fri import _fold_codeword
        from multilinear_tpu.merkle import _commit_layers

        t_fold = timeit(_fold_codeword, codek, twid, r, half_limbs)
        pairs = codek.reshape(8, 2, msize // 2)
        t_tree = timeit(lambda p: _commit_layers(p, 2), pairs)
        t_tblfold = timeit(_fold_kernel, datak, r)
        print(
            f"  components k={probe_k} (code 2^{msize.bit_length()-1}): "
            f"codeword_fold {t_fold*1e3:7.2f} ms   tree_commit {t_tree*1e3:7.2f} ms   "
            f"table_fold {t_tblfold*1e3:7.2f} ms"
        )
    # -- oversized-round (k=0) decomposition + Pallas alternatives ----------
    # The BIG rounds (m > fused_round_max_code) run chunked jnp kernels
    # (fori_loop + dynamic_slice).  This times each component at 2^25 and
    # the Pallas fused fold+leaf-hash at the same size - grid-streamed
    # VMEM temporaries, so the HBM live set is just the in/out buffers.
    def timeit2(fn, *args, reps=4):
        out = fn(*args)
        sync(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    from multilinear_tpu.fri import _fold_codeword_chunked_kernel
    from multilinear_tpu.merkle import _commit_layers_chunked_fused
    from multilinear_tpu.sumcheck import (
        _chunked_fold_kernel, _chunked_partial_sums_kernel,
    )
    from multilinear_tpu.sumcheck import identity_composition as idc

    # free every earlier probe array before the full-size section (the
    # first run of this section OOMed while the round-walk state was live)
    del data, cur, tables, fri_data, codek, datak, pairs
    msize = 1 << (log_n + LOG_BLOWUP)
    code0 = jnp.asarray(
        limbs.pack_ints(np.arange(msize, dtype=np.uint64) * 5 + 1, shape=(msize,))
    )
    data0 = jnp.asarray(
        limbs.pack_ints(np.arange(msize, dtype=np.uint64) * 3 + 2, shape=(msize,))
    ).reshape(8, 2, msize // 2)
    r = jnp.asarray(limbs.pack_scalar(Fp(12345)))
    aux0 = jnp.zeros((0, 8), jnp.uint32)
    try:
        t_ps = timeit2(
            lambda: _chunked_partial_sums_kernel(data0, aux0, C, 2, idc)
        )
        t_tf = timeit2(lambda: _chunked_fold_kernel(data0, r, C))
        t_cf = timeit2(
            lambda: _fold_codeword_chunked_kernel(code0, inv_pows, r, half_limbs, 0, C)
        )
        pairs0 = code0.reshape(8, 2, msize // 2)
        t_cm = timeit2(lambda: _commit_layers_chunked_fused(pairs0, 2))
        print(
            f"  BIG k=0 components (2^{log_n + LOG_BLOWUP}): partial_sums {t_ps*1e3:7.2f} ms   "
            f"table_fold {t_tf*1e3:7.2f} ms   code_fold {t_cf*1e3:7.2f} ms   "
            f"commit {t_cm*1e3:7.2f} ms"
        )
    except Exception as e:
        print(f"  BIG k=0 components failed: {type(e).__name__}: {e}")

    try:
        from multilinear_tpu.field import pallas_ops

        if pallas_ops.fold_commit_supported(msize):
            tw0 = inv_pows[:, : msize // 2]
            t_pfc = timeit2(
                lambda: pallas_ops.fold_commit_leaves(code0, tw0, r, half_limbs)
            )
            print(f"  PALLAS fold+leaf-hash at 2^{log_n + LOG_BLOWUP}: {t_pfc*1e3:7.2f} ms")
    except Exception as e:
        print(f"  PALLAS fold+commit at full size failed: {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
