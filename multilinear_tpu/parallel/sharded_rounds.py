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
from ..merkle import _pair_msg
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


def _code_fold_body(c_lo, c_hi, tw, r_limbs, half_limbs):
    """Local FRI fold: ((a+b) + r*(a-b)*tw) / 2, in the 2-multiply
    half(a+b) + (a-b)*tw*(r/2) form (see fri._rh_scalar)."""
    even = ops.half(ops.add(c_lo, c_hi))
    odd = _local_mul(ops.sub(c_lo, c_hi), tw)
    rh = ops.mul(r_limbs.reshape(8, 1), half_limbs.reshape(8, 1))[:, 0]
    rb2 = ops.broadcast_scalar(rh, odd.shape[1:])
    return ops.add(even, _local_mul(rb2, odd))


def _folds_body(d_lo, d_hi, c_lo, c_hi, tw, r_limbs, half_limbs):
    """Local table fold (lo + r*(hi-lo)) + FRI fold (((a+b)+r*(a-b)*tw)/2)."""
    diff = ops.sub(d_hi, d_lo)
    rb = ops.broadcast_scalar(r_limbs, diff.shape[1:])
    new_data = ops.add(d_lo, _local_mul(rb, diff))
    new_code = _code_fold_body(c_lo, c_hi, tw, r_limbs, half_limbs)
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
        msg = _pair_msg(cur)
        cur = _local_sha256(msg, 16)
        levels.append(cur)
    return tuple(levels)


def _psums_body_big(d_lo, d_hi, C: int):
    """Chunked local partial sums: fori_loop over C-sized windows of the
    LOCAL block, accumulating with the exact mod-p add.  Live temporaries
    stay one chunk; chunk order does not matter (canonical residues)."""
    w1 = d_lo.shape[1]
    n = d_lo.shape[-1]

    def chunk_sums(lo, hi):
        w = w1 - 1
        diff = ops.sub(hi, lo)
        e1 = hi
        e2 = ops.add(hi, diff)
        sums = []
        for e in (e1, e2):
            prod = _local_mul(e[:, w], e[:, 0])
            sums.append(ops.sum_mod(prod, axis=1))
        return jnp.stack(sums, axis=1)

    def body(i, acc):
        s = i * C
        lo = jax.lax.dynamic_slice(d_lo, (0, 0, s), (8, w1, C))
        hi = jax.lax.dynamic_slice(d_hi, (0, 0, s), (8, w1, C))
        return ops.add(acc, chunk_sums(lo, hi))

    acc = jax.lax.fori_loop(0, n // C, body, jnp.zeros((8, 2), jnp.uint32))
    return _psum_mod(acc)


def _folds_body_big(d_lo, d_hi, c_lo, c_hi, tw, r_limbs, half_limbs, C: int):
    """Chunked local folds: window loops with dynamic_update_slice so the
    live set is input + output + one chunk's temporaries (the GSPMD
    partitioning of the equivalent global fori_loop replicates outputs
    and gathers slices - measured ~13.4 GiB/device at 2 devices/2^24)."""
    w1 = d_lo.shape[1]
    nd = d_lo.shape[-1]
    nc = c_lo.shape[-1]

    def dbody(i, out):
        s = i * C
        lo = jax.lax.dynamic_slice(d_lo, (0, 0, s), (8, w1, C))
        hi = jax.lax.dynamic_slice(d_hi, (0, 0, s), (8, w1, C))
        diff = ops.sub(hi, lo)
        rb = ops.broadcast_scalar(r_limbs, diff.shape[1:])
        return jax.lax.dynamic_update_slice(
            out, ops.add(lo, _local_mul(rb, diff)), (0, 0, s)
        )

    new_data = jax.lax.fori_loop(
        0, nd // C, dbody, jnp.zeros((8, w1, nd), jnp.uint32)
    )

    rh = ops.mul(r_limbs.reshape(8, 1), half_limbs.reshape(8, 1))[:, 0]

    def cbody(i, out):
        s = i * C
        a = jax.lax.dynamic_slice(c_lo, (0, s), (8, C))
        b = jax.lax.dynamic_slice(c_hi, (0, s), (8, C))
        t = jax.lax.dynamic_slice(tw, (0, s), (8, C))
        even = ops.half(ops.add(a, b))
        odd = _local_mul(ops.sub(a, b), t)
        rb2 = ops.broadcast_scalar(rh, odd.shape[1:])
        nxt = ops.add(even, _local_mul(rb2, odd))
        return jax.lax.dynamic_update_slice(out, nxt, (0, s))

    new_code = jax.lax.fori_loop(
        0, nc // C, cbody, jnp.zeros((8, nc), jnp.uint32)
    )
    return new_data, new_code


def _commit_body_big(n_lo, n_hi, C: int):
    """Chunked local leaf hashing, then the (already small) subtree."""
    q = n_lo.shape[-1]

    def body(i, out):
        s = i * C
        lo = jax.lax.dynamic_slice(n_lo, (0, s), (8, C))
        hi = jax.lax.dynamic_slice(n_hi, (0, s), (8, C))
        words = jnp.concatenate([limbs_to_words(lo), limbs_to_words(hi)], axis=0)
        return jax.lax.dynamic_update_slice(out, _local_sha256(words, 8), (0, s))

    cur = jax.lax.fori_loop(0, q // C, body, jnp.zeros((8, q), jnp.uint32))
    levels = [cur]
    while cur.shape[1] > 1:
        msg = _pair_msg(cur)
        cur = _local_sha256(msg, 16)
        levels.append(cur)
    return tuple(levels)


_ROUND_CACHE = {}


def make_pcs_round(mesh, chunk: int = None):
    """Jitted full-round program for ``mesh`` (cached per (mesh, chunk)).

    Same signature, outputs, and transcript bytes as pcs._pcs_round_body;
    requires data-half and codeword-quarter lengths divisible by mesh.size
    (pcs._device_rounds checks before dispatching).

    ``chunk``: None fuses each local body (the default while per-device
    shapes fit the program budget); an int C runs the local bodies as
    C-windowed fori_loops - the OVERSIZED multi-chip round, whose live
    set per device stays input + output + one chunk (the GSPMD chunked
    round replicates its outputs instead; tests/test_sharding_scale.py).
    Bit-identical either way.
    """
    key = (mesh, chunk)
    if key in _ROUND_CACHE:
        return _ROUND_CACHE[key]

    if chunk is None:
        psums_body, folds_body, commit_body = (
            _psums_body, _folds_body, _commit_body,
        )
    else:
        psums_body = partial(_psums_body_big, C=chunk)
        folds_body = partial(_folds_body_big, C=chunk)
        commit_body = partial(_commit_body_big, C=chunk)

    shard3, shard2, rep = P(None, None, ROWS), P(None, ROWS), P()
    psums = jax.shard_map(
        psums_body, mesh=mesh, in_specs=(shard3, shard3), out_specs=rep,
        check_vma=False,
    )
    folds = jax.shard_map(
        folds_body, mesh=mesh,
        in_specs=(shard3, shard3, shard2, shard2, shard2, rep, rep),
        out_specs=(shard3, shard2),
        check_vma=False,
    )
    commit = jax.shard_map(
        commit_body, mesh=mesh, in_specs=(shard2, shard2),
        out_specs=P(None, ROWS), check_vma=False,
    )

    @partial(jax.jit, static_argnums=(5,))
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
            msg = _pair_msg(cur)
            cur = sha256_words(msg, 16)
            layers.append(cur)
        pairs_arr = nxt.reshape(8, 2, q)
        tr = dtr.absorb_words(tr, layers[-1][:, 0])
        return new_data, nxt, pairs_arr, tuple(layers), tr, (r, c1, c2, new_prev)

    _ROUND_CACHE[key] = rnd
    return rnd


def make_fri_round(mesh):
    """Jitted standalone-FRI round for ``mesh`` (cached per mesh).

    Same outputs and transcript bytes as fri._device_fri_round (challenge
    from the on-device transcript, fold, commit, absorb root), with the
    fold and the Merkle leaf/subtree hashing in shard_map local bodies.
    """
    key = (mesh, "fri")
    if key in _ROUND_CACHE:
        return _ROUND_CACHE[key]

    shard2, rep = P(None, ROWS), P()
    folds = jax.shard_map(
        _code_fold_body, mesh=mesh,
        in_specs=(shard2, shard2, shard2, rep, rep), out_specs=shard2,
        check_vma=False,
    )
    commit = jax.shard_map(
        _commit_body, mesh=mesh, in_specs=(shard2, shard2),
        out_specs=P(None, ROWS), check_vma=False,
    )

    @partial(jax.jit, static_argnums=(3,))
    def rnd(code, inv_pows, tr_state, k: int):
        from .. import device_transcript as dtr

        r = dtr.challenge(tr_state)
        half = code.shape[-1] // 2
        half_limbs = jnp.asarray(limbs.pack_scalar(TWO_INV))
        tw = inv_pows[:, :: 1 << k][:, :half]
        nxt = folds(code[..., :half], code[..., half:], tw, r, half_limbs)
        q = half // 2
        layers = list(commit(nxt[:, :q], nxt[:, q:]))
        cur = layers[-1]
        while cur.shape[1] > 1:
            msg = _pair_msg(cur)
            cur = sha256_words(msg, 16)
            layers.append(cur)
        pairs_arr = nxt.reshape(8, 2, q)
        tr = dtr.absorb_words(tr_state, layers[-1][:, 0])
        return nxt, pairs_arr, tuple(layers), tr

    _ROUND_CACHE[key] = rnd
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
