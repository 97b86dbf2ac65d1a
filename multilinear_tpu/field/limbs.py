"""Limb packing for GF(p) elements on TPU.

Representation: a field array of value-shape ``S`` is a ``uint32`` array of
shape ``(8,) + S`` holding eight 16-bit little-endian limbs (limb 0 is the
least significant).  Canonical arrays have every limb < 2^16 and every value
in [0, p).

Why 16-bit limbs in 32-bit lanes: the TPU VPU has no 64-bit integer multiply,
but a 16x16 -> 32 product is exact in a single uint32 lane multiply, so the
whole schoolbook product of two 128-bit numbers is 64 native lane ops.  Limbs
live on axis 0 so the *value* dimensions occupy the TPU's (sublane, lane)
tiles - every limb plane is a large contiguous vector.

This module is host-side packing glue (numpy); device arithmetic is in
:mod:`multilinear_tpu.field.ops`.
"""

from __future__ import annotations

import numpy as np

from .scalar import Fp, P

NLIMBS = 8
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

P_LIMBS = np.array([(P >> (16 * i)) & LIMB_MASK for i in range(NLIMBS)], dtype=np.uint32)
K = (1 << 128) - P  # 45*2^40 - 1, the 2^128 fold constant
K_LIMBS = np.array([(K >> (16 * i)) & LIMB_MASK for i in range(3)], dtype=np.uint32)
assert K < (1 << 48)


def pack_int(v: int) -> np.ndarray:
    """Pack one canonical integer into an (8,) uint32 limb vector."""
    v %= P
    return np.array([(v >> (16 * i)) & LIMB_MASK for i in range(NLIMBS)], dtype=np.uint32)


def pack_scalar(x) -> np.ndarray:
    return pack_int(x.v if isinstance(x, Fp) else int(x))


def pack_ints(vs, shape=None) -> np.ndarray:
    """Pack an iterable of ints/Fp into an (8, N) limb array (or (8,)+shape).

    Values already below 2^64 take a fully vectorized numpy path (the
    common case for synthetic/benchmark data); anything larger falls back
    to exact object-array arithmetic.
    """
    if isinstance(vs, np.ndarray) and vs.dtype == np.uint64:
        small = vs.reshape(-1)
        n = small.shape[0]
        out = np.zeros((NLIMBS, n), dtype=np.uint32)
        for i in range(4):
            out[i] = ((small >> np.uint64(16 * i)) & np.uint64(LIMB_MASK)).astype(np.uint32)
        if shape is not None:
            out = out.reshape((NLIMBS,) + tuple(shape))
        return out
    vals = [(v.v if isinstance(v, Fp) else int(v)) % P for v in vs]
    n = len(vals)
    if n and max(vals) < (1 << 64):
        return pack_ints(np.array(vals, dtype=np.uint64), shape=shape)
    out = np.empty((NLIMBS, n), dtype=np.uint32)
    arr = np.array(vals, dtype=object)
    for i in range(NLIMBS):
        out[i] = ((arr >> (16 * i)) & LIMB_MASK).astype(np.uint32)
    if shape is not None:
        out = out.reshape((NLIMBS,) + tuple(shape))
    return out


def unpack_int(limbs) -> int:
    """Unpack an (8,) limb vector into an int."""
    limbs = np.asarray(limbs)
    v = 0
    for i in range(NLIMBS - 1, -1, -1):
        v = (v << 16) | int(limbs[i])
    return v


def unpack_ints(limbs) -> np.ndarray:
    """Unpack an (8,)+S limb array into an object ndarray of Python ints."""
    limbs = np.asarray(limbs)
    flat = limbs.reshape(NLIMBS, -1)
    vals = np.zeros(flat.shape[1], dtype=object)
    for i in range(NLIMBS - 1, -1, -1):
        vals = (vals << 16) | flat[i].astype(object)
    return vals.reshape(limbs.shape[1:])


def unpack_fps(limbs):
    """Unpack a (8, N) limb array into a list of Fp."""
    return [Fp(int(v)) for v in unpack_ints(limbs).reshape(-1)]


def to_le_bytes(limbs) -> bytes:
    """Serialize an (8,)+S limb array to concatenated 16-LE-byte encodings.

    Matches the reference byte view (src/field.rs:33-38): each element is the
    16 little-endian bytes of its canonical residue; elements follow in
    C-order of the value shape.
    """
    limbs = np.asarray(limbs, dtype=np.uint32)
    flat = limbs.reshape(NLIMBS, -1)  # (8, N)
    n = flat.shape[1]
    out = np.empty((n, NLIMBS, 2), dtype=np.uint8)
    for i in range(NLIMBS):
        out[:, i, 0] = flat[i] & 0xFF
        out[:, i, 1] = (flat[i] >> 8) & 0xFF
    return out.tobytes()


def from_le_bytes(b: bytes, shape=None) -> np.ndarray:
    """Inverse of :func:`to_le_bytes`."""
    raw = np.frombuffer(b, dtype=np.uint8).reshape(-1, NLIMBS, 2)
    n = raw.shape[0]
    out = np.empty((NLIMBS, n), dtype=np.uint32)
    for i in range(NLIMBS):
        out[i] = raw[:, i, 0].astype(np.uint32) | (raw[:, i, 1].astype(np.uint32) << 8)
    if shape is not None:
        out = out.reshape((NLIMBS,) + tuple(shape))
    return out
