"""Explicit-SPMD prover round: shard_map body with per-shard Pallas kernels.

Round-1 gap: Pallas (Mosaic) kernels are opaque to the GSPMD partitioner,
so the sharded path silently fell back to the jnp kernels
(config.pallas_enabled required exactly one device).  The fix is the
idiomatic one: split the round into

* a PAIR REGROUP outside shard_map - slicing the MSB-sharded halves
  (i, i + h/2) re-shards both halves across all devices; XLA places the
  cross-shard collective-permutes exactly as it does for the GSPMD round
  (tests/test_gspmd_evidence.py); and
* a purely LOCAL elementwise body inside ``jax.shard_map`` - linear
  extensions, table fold, FRI fold combine, and the partial-sum reduction
  (``lax.psum`` over the mesh axis).  Inside the body every array is a
  single-device block, so the hot multiplies can dispatch to the Pallas
  kernels regardless of mesh size.

Results are bit-identical to the GSPMD round and to the host reference
(pinned by tests/test_shard_step.py on the 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..field import ops
from . import ROWS


def _local_mul(a, b):
    """Field mul on a local (single-device) block: Pallas on TPU.

    Inside shard_map each block is device-local, so the single-device
    Pallas kernels are safe at ANY mesh size - this is the multi-chip
    fast path the plain config gate cannot express.
    """
    total = 1
    for d in a.shape[1:]:
        total *= d
    if a.shape == b.shape and total >= 4096 and jax.default_backend() == "tpu":
        from ..config import get_config

        if get_config().use_pallas is not False:
            from ..field import pallas_ops

            return pallas_ops.mul(a, b)
    return ops.mul(a, b)


def _body(data_lo, data_hi, code_lo, code_hi, twiddles, r_limbs, half_limbs):
    """Local block of one interleaved sumcheck+FRI round.

    data_*: (8, 2, hb); code_*: (8, mb); twiddles: (8, mb); r/half: (8,).
    Returns (partial_sums (8, 2) [psum'd], folded data (8, 2, hb),
    folded code (8, mb)).
    """
    # linear extensions at X = 1, 2 (no muls: ext(X+1) = ext(X) + diff)
    diff = ops.sub(data_hi, data_lo)
    e1 = data_hi
    e2 = ops.add(data_hi, diff)
    # identity composition: s(X) = sum_i mx(X)_i * dx(X)_i
    sums = []
    for e in (e1, e2):
        prod = _local_mul(e[:, 0], e[:, 1])
        sums.append(ops.sum_mod(prod, axis=1))
    partial = jnp.stack(sums, axis=1)  # (8, 2) local
    partial = _psum_mod(partial)

    # fold tables: lo + r*(hi - lo)
    rb = ops.broadcast_scalar(r_limbs, diff.shape[1:])
    new_data = ops.add(data_lo, _local_mul(rb, diff))

    # FRI fold: ((a+b) + r*(a-b)*tw) / 2, in the 2-multiply
    # half(a+b) + (a-b)*tw*(r/2) form (see fri._rh_scalar)
    even = ops.half(ops.add(code_lo, code_hi))
    odd = _local_mul(ops.sub(code_lo, code_hi), twiddles)
    rh = ops.mul(r_limbs.reshape(8, 1), half_limbs.reshape(8, 1))[:, 0]
    rb2 = ops.broadcast_scalar(rh, odd.shape[1:])
    new_code = ops.add(even, _local_mul(rb2, odd))
    return partial, new_data, new_code


def _psum_mod(x):
    """psum the per-device canonical partial sums, then renormalize.

    Local partials have 16-bit limbs, so a raw limb-wise psum stays far
    below uint32 overflow for any realistic device count (< 2^15), and
    one carry-normalize restores the canonical residue.  The result is
    the canonical residue of the exact integer sum - identical to the
    single-device reduction order.
    """
    s = jax.lax.psum(x, ROWS)
    return ops.normalize_wide(ops._split_arr(s), extra_bits=15)


def make_sharded_round(mesh):
    """Build the jitted shard_map round for ``mesh``.

    Returns ``fn(data, code, twiddles, r_limbs, half_limbs)`` with the
    same signature and bit-identical outputs as
    ``parallel.step.pcs_prover_round``.
    """
    shard = P(None, None, ROWS)
    shard2 = P(None, ROWS)
    rep = P()
    body = jax.shard_map(
        _body,
        mesh=mesh,
        in_specs=(shard, shard, shard2, shard2, shard2, rep, rep),
        out_specs=(rep, shard, shard2),
        # Pallas calls don't carry varying-mesh-axes metadata, so the
        # static replication check cannot see through them; outputs'
        # actual replication is pinned by tests/test_shard_step.py
        check_vma=False,
    )

    @jax.jit
    def rnd(data, code, twiddles, r_limbs, half_limbs):
        h = data.shape[-1]
        m = code.shape[-1]
        off, half = h // 2, m // 2
        # pair regroup: GSPMD re-shards each MSB half across the full mesh
        # (the cross-shard collective-permutes land here, outside the
        # opaque Pallas body)
        data_lo, data_hi = data[..., :off], data[..., off:]
        code_lo, code_hi = code[..., :half], code[..., half:]
        return body(data_lo, data_hi, code_lo, code_hi, twiddles, r_limbs, half_limbs)

    return rnd
