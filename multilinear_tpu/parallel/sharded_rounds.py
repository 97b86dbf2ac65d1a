"""Streamed PCS rounds for multi-chip meshes: shard_map + per-shard Pallas.

Round-2 gap (VERDICT item 4): ``parallel/shard_step.py`` proved the
shard_map round pattern (Pallas kernels are opaque to the GSPMD
partitioner, so per-shard LOCAL bodies are the only way a >1-device mesh
gets the Mosaic kernels), but the real prover never dispatched it - under
a multi-device mesh ``pcs._device_rounds`` streamed the jnp GSPMD round.

This module is the production wiring: ONE complete PCS round (round
polynomial, on-device Fiat-Shamir, table+codeword fold, Merkle commit,
root absorb) as a single jitted program whose hot elementwise sections run
inside ``jax.shard_map`` blocks:

* partial sums  - local extension products + ``lax.psum`` (exact: canonical
  residues are order-independent);
* folds         - the (i, i+h/2) pair regroup happens OUTSIDE the bodies
  (GSPMD places the cross-shard collective-permutes), the combine is local;
* Merkle commit - leaf hashes and the per-shard SUBTREE levels are local,
  the top log(#devices) levels hash the gathered per-shard roots.

Every local block is a single-device array, so the Pallas field-mul /
SHA-256 kernels dispatch at ANY mesh size on TPU; on CPU meshes the same
bodies run the jnp kernels, which is how byte parity is pinned in
tests/test_parallel.py without TPU hardware.  Transcript schedule and
round scalars are shared verbatim with the single-device streamed round
(pcs._round_scalars), so proofs are bit-identical across all paths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..field import limbs, ops
from ..field.scalar import TWO_INV
from ..sha256 import limbs_to_words, sha256_words
from . import ROWS
from .shard_step import _local_mul, _psum_mod


def _local_sha256(words, n_words: int):
    """SHA-256 on a local (single-device) block: Pallas on TPU.

    Mirrors the gate in sha256.sha256_words, minus its device-count check
    (inside shard_map the block IS single-device regardless of mesh size).
    """
    if words.ndim == 2 and words.shape[-1] >= 512 and jax.default_backend() == "tpu":
        from ..config import get_config

        if get_config().use_pallas is not False:
            from .. import sha256_pallas

            return sha256_pallas.sha256_words(words, n_words)
    return sha256_words(words, n_words)


def _psums_body(d_lo, d_hi):
    """Local identity-composition partial sums at X = 1, 2.

    d_*: (8, w+1, hb) packed-table halves (trace col 0, delta col last).
    Returns the GLOBAL (8, 2) sums - psum'd over the mesh axis.
    """
    w = d_lo.shape[1] - 1
    diff = ops.sub(d_hi, d_lo)
    e1 = d_hi
    e2 = ops.add(d_hi, diff)
    sums = []
    for e in (e1, e2):
        prod = _local_mul(e[:, w], e[:, 0])
        sums.append(ops.sum_mod(prod, axis=1))
    return _psum_mod(jnp.stack(sums, axis=1))


def _folds_body(d_lo, d_hi, c_lo, c_hi, tw, r_limbs, half_limbs):
    """Local table fold (lo + r*(hi-lo)) + FRI fold (((a+b)+r*(a-b)*tw)/2)."""
    diff = ops.sub(d_hi, d_lo)
    rb = ops.broadcast_scalar(r_limbs, diff.shape[1:])
    new_data = ops.add(d_lo, _local_mul(rb, diff))

    even = ops.add(c_lo, c_hi)
    odd = _local_mul(ops.sub(c_lo, c_hi), tw)
    rb2 = ops.broadcast_scalar(r_limbs, odd.shape[1:])
    hb2 = ops.broadcast_scalar(half_limbs, odd.shape[1:])
    new_code = _local_mul(ops.add(even, _local_mul(rb2, odd)), hb2)
    return new_data, new_code


def _commit_body(n_lo, n_hi):
    """Local pair-leaf hashes + the per-shard subtree levels.

    n_*: (8, qb) folded-codeword halves (leaf i = H(nxt[i] || nxt[i+q])).
    Returns one (8, qb/2^j) level per local tree level, leaf level first;
    adjacent leaves stay within a shard under contiguous sharding, so
    every level down to one digest per device is collective-free.
    """
    words = jnp.concatenate([limbs_to_words(n_lo), limbs_to_words(n_hi)], axis=0)
    cur = _local_sha256(words, 8)
    levels = [cur]
    while cur.shape[1] > 1:
        pairs = cur.reshape(8, cur.shape[1] // 2, 2)
        msg = jnp.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=0)
        cur = _local_sha256(msg, 16)
        levels.append(cur)
    return tuple(levels)


_ROUND_CACHE = {}


def make_pcs_round(mesh):
    """Jitted full-round program for ``mesh`` (cached per mesh).

    Same signature, outputs, and transcript bytes as pcs._pcs_round_body;
    requires data-half and codeword-quarter lengths divisible by mesh.size
    (pcs._device_rounds checks before dispatching).
    """
    if mesh in _ROUND_CACHE:
        return _ROUND_CACHE[mesh]

    shard3, shard2, rep = P(None, None, ROWS), P(None, ROWS), P()
    psums = jax.shard_map(
        _psums_body, mesh=mesh, in_specs=(shard3, shard3), out_specs=rep,
        check_vma=False,
    )
    folds = jax.shard_map(
        _folds_body, mesh=mesh,
        in_specs=(shard3, shard3, shard2, shard2, shard2, rep, rep),
        out_specs=(shard3, shard2),
        check_vma=False,
    )
    commit = jax.shard_map(
        _commit_body, mesh=mesh, in_specs=(shard2, shard2),
        out_specs=P(None, ROWS), check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(5,))
    def rnd(data, code, inv_pows, tr_state, prev_sum, k: int):
        from .. import device_transcript as dtr
        from ..pcs import _round_scalars

        off = data.shape[-1] // 2
        half = code.shape[-1] // 2
        sums = psums(data[..., :off], data[..., off:])
        tr, r, c1, c2, new_prev = _round_scalars(sums, prev_sum, tr_state)

        half_limbs = jnp.asarray(limbs.pack_scalar(TWO_INV))
        tw = inv_pows[:, :: 1 << k][:, :half]
        new_data, nxt = folds(
            data[..., :off], data[..., off:],
            code[..., :half], code[..., half:],
            tw, r, half_limbs,
        )
        q = half // 2
        layers = list(commit(nxt[:, :q], nxt[:, q:]))
        # top levels: hash the gathered per-shard roots (tiny, replicated)
        cur = layers[-1]
        while cur.shape[1] > 1:
            pairs = cur.reshape(8, cur.shape[1] // 2, 2)
            msg = jnp.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=0)
            cur = sha256_words(msg, 16)
            layers.append(cur)
        pairs_arr = nxt.reshape(8, 2, q)
        tr = dtr.absorb_words(tr, layers[-1][:, 0])
        return new_data, nxt, pairs_arr, tuple(layers), tr, (r, c1, c2, new_prev)

    _ROUND_CACHE[mesh] = rnd
    return rnd


def mesh_of(x):
    """The concrete >1-device mesh an array lives on, else None.

    Multi-controller jit outputs sometimes carry a GSPMDSharding (no
    ``.mesh``); a 1-axis mesh is rebuilt from its device assignment.  Any
    layout is safe: the shard_map round's jit reshards inputs to its
    in_specs, and transcripts are layout-independent (pinned by tests).
    """
    sh = getattr(x, "sharding", None)
    if sh is None:
        return None
    mesh = getattr(sh, "mesh", None)
    if mesh is None:
        devs = getattr(sh, "_device_assignment", None)
        if devs is not None and len(devs) > 1:
            import numpy as np

            return jax.sharding.Mesh(np.asarray(list(devs)), (ROWS,))
        return None
    if isinstance(mesh, jax.sharding.AbstractMesh):
        return None
    if getattr(mesh, "size", 1) <= 1:
        return None
    return mesh
