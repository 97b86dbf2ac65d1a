"""Quantify round-level pipelining in the streamed PCS prover (PP row).

SURVEY.md section 2.3 frames pipeline parallelism for this protocol as
"overlap Merkle hashing of layer k with fold of layer k+1".  On TPU a
core executes ONE compute stream, so *within* a chip XLA serializes the
fold and hash ops of a round program - the protocol's real pipelining
opportunity is between the HOST (Fiat-Shamir, dispatch, tunnel latency)
and the DEVICE: streamed rounds carry the transcript on device, so round
k+1's program is enqueued before round k finishes and the per-dispatch
latency (~10 ms locally, worse over the axon tunnel) hides behind device
compute instead of serializing with it.

This probe measures exactly that overlap, on hardware:

* ``pipelined``  - N consecutive streamed rounds dispatched back-to-back,
  ONE final synchronization (how pcs._device_rounds actually runs);
* ``serialized`` - the same N round programs, but each dispatch is
  synchronized before the next is issued (what a host-driven round loop
  would pay).

overlap_saving_s = serialized - pipelined is the wall-clock the streaming
design removes per prove; it also bounds what any further intra-round
scheduling could save.  Run on the TPU:  python tools/overlap_probe.py [log_n]
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from multilinear_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from multilinear_tpu import device_transcript as dtr
from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp
from multilinear_tpu.ntt import inv_gen_pows
from multilinear_tpu.pcs import _device_pcs_round
from multilinear_tpu.transcript import Transcript


def _args(log_n: int):
    h = 1 << log_n
    m = 2 * h
    import numpy as np

    data = jnp.asarray(
        limbs.pack_ints(
            np.concatenate(
                [np.arange(h, dtype=np.uint64) * 7 + 3, np.arange(h, dtype=np.uint64) + 1]
            ),
            shape=(2, h),
        )
    )
    code = jnp.asarray(limbs.pack_ints(np.arange(m, dtype=np.uint64) * 5 + 2))
    inv_pows = inv_gen_pows(log_n + 1)
    tr = dtr.state_from_host(Transcript())
    prev = jnp.asarray(limbs.pack_scalar(Fp(12345)))
    return data, code, inv_pows, tr, prev


def _run(log_n: int, n_rounds: int, sync_each: bool) -> float:
    data, code, inv_pows, tr, prev = _args(log_n)
    jax.block_until_ready((data, code, inv_pows))
    t0 = time.perf_counter()
    outs = []
    for k in range(n_rounds):
        data, code, pairs, layers, tr, meta = _device_pcs_round(
            data, code, inv_pows, tr, prev, k
        )
        prev = meta[3]
        outs.append(meta[0])
        if sync_each:
            jax.device_get(meta[0][:1])
    jax.device_get([o[:1] for o in outs])
    return time.perf_counter() - t0


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # warm both schedules (compiles + per-process executable loads)
    _run(log_n, n_rounds, False)
    _run(log_n, n_rounds, True)
    pipelined = min(_run(log_n, n_rounds, False) for _ in range(2))
    serialized = min(_run(log_n, n_rounds, True) for _ in range(2))
    print(
        json.dumps(
            {
                "metric": f"streamed_round_overlap_2^{log_n}x{n_rounds}",
                "pipelined_s": round(pipelined, 4),
                "serialized_s": round(serialized, 4),
                "overlap_saving_s": round(serialized - pipelined, 4),
                "unit": "s",
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
