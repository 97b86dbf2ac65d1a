"""ctypes bindings for the native host runtime (native/mlt_native.cpp).

The TPU owns bulk compute; the native library owns the host tail - exact
GF(p) u128 arithmetic, SHA-256/Merkle, FRI fold helpers - replacing Python
bigint loops.  Every function has a pure-Python fallback with identical
semantics, used when no compiler is available; ``HAVE_NATIVE`` says which
path is live.

All field values cross this boundary as numpy uint8 arrays of shape
(n, 16): 16 little-endian bytes of the canonical residue per element (the
reference's serialization layout, quirk Q9).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import List, Optional, Tuple

import numpy as np

from .field.scalar import P, TWO_INV

_LIB: Optional[ctypes.CDLL] = None
HAVE_NATIVE = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_SRC, "libmlt_native.so")


def _build() -> bool:
    cpp = os.path.join(_SRC, "mlt_native.cpp")
    if not os.path.exists(cpp):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", cpp, "-o", _SO_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> None:
    global _LIB, HAVE_NATIVE
    if _LIB is not None:
        return
    if not os.path.exists(_SO_PATH) or (
        os.path.exists(os.path.join(_SRC, "mlt_native.cpp"))
        and os.path.getmtime(_SO_PATH) < os.path.getmtime(os.path.join(_SRC, "mlt_native.cpp"))
    ):
        if not _build():
            return
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mlt_vec_mul.argtypes = [u8p, u8p, u8p, ctypes.c_uint64]
    lib.mlt_vec_add.argtypes = [u8p, u8p, u8p, ctypes.c_uint64]
    lib.mlt_vec_sub.argtypes = [u8p, u8p, u8p, ctypes.c_uint64]
    lib.mlt_fold.argtypes = [u8p, u8p, u8p, u8p, ctypes.c_uint64]
    lib.mlt_fri_fold.argtypes = [u8p, ctypes.c_uint64, u8p, u8p, u8p]
    lib.mlt_pcs_partial_sums.argtypes = [u8p, u8p, ctypes.c_uint64, ctypes.c_uint64, u8p]
    lib.mlt_fingerprint.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64, u8p, u8p]
    lib.mlt_sha256.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.mlt_sha256_many.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64, u8p]
    lib.mlt_merkle_layers.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.mlt_merkle_verify.argtypes = [
        u8p, ctypes.c_uint64, u8p, u8p, ctypes.c_uint64, u8p,
    ]
    lib.mlt_merkle_verify.restype = ctypes.c_longlong
    _LIB = lib
    HAVE_NATIVE = True


_load()


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# -- byte/int conversion helpers ------------------------------------------------


def ints_to_bytes_arr(vals) -> np.ndarray:
    """List of ints -> (n, 16) uint8 LE array."""
    n = len(vals)
    out = np.empty((n, 16), dtype=np.uint8)
    for i, v in enumerate(vals):
        out[i] = np.frombuffer(int(v).to_bytes(16, "little"), dtype=np.uint8)
    return out


def bytes_arr_to_ints(arr: np.ndarray) -> List[int]:
    """(n, 16) uint8 LE array -> list of ints (vectorized via uint64 views)."""
    a = np.ascontiguousarray(arr)
    lo = a[:, :8].copy().view(np.uint64).reshape(-1)
    hi = a[:, 8:].copy().view(np.uint64).reshape(-1)
    return [int(l) | (int(h) << 64) for l, h in zip(lo.tolist(), hi.tolist())]


def byte_row_to_int(row: np.ndarray) -> int:
    return int.from_bytes(row.tobytes(), "little")


def int_to_byte_row(v: int) -> np.ndarray:
    return np.frombuffer(int(v).to_bytes(16, "little"), dtype=np.uint8).copy()


# -- field vector ops -------------------------------------------------------------


def fold(lo: np.ndarray, hi: np.ndarray, r: int) -> np.ndarray:
    """(n,16),(n,16) -> (n,16): lo + r*(hi - lo) mod p."""
    n = lo.shape[0]
    out = np.empty_like(lo)
    if HAVE_NATIVE:
        r16 = int_to_byte_row(r)
        _LIB.mlt_fold(_p(np.ascontiguousarray(lo)), _p(np.ascontiguousarray(hi)), _p(r16), _p(out), n)
        return out
    los, his = bytes_arr_to_ints(lo), bytes_arr_to_ints(hi)
    return ints_to_bytes_arr([(l + r * (h - l)) % P for l, h in zip(los, his)])


def fri_fold(code: np.ndarray, r: int, tw_step: int) -> np.ndarray:
    """(2h,16) codeword -> (h,16): ((a+b) + r*(a-b)*tw_i)/2, tw_i = tw_step^i."""
    half = code.shape[0] // 2
    out = np.empty((half, 16), dtype=np.uint8)
    if HAVE_NATIVE:
        _LIB.mlt_fri_fold(
            _p(np.ascontiguousarray(code)), half, _p(int_to_byte_row(r)), _p(int_to_byte_row(tw_step)), _p(out)
        )
        return out
    vals = bytes_arr_to_ints(code)
    inv2 = TWO_INV.v
    res, tw = [], 1
    for i in range(half):
        a, b = vals[i], vals[i + half]
        res.append(((a + b) + r * ((a - b) * tw % P)) % P * inv2 % P)
        tw = tw * tw_step % P
    return ints_to_bytes_arr(res)


def pcs_partial_sums(matrix: np.ndarray, delta: np.ndarray, total_degree: int) -> List[int]:
    """Identity-composition partial sums s(1..d) over (h,16) byte tables."""
    h = matrix.shape[0]
    if HAVE_NATIVE:
        out = np.empty((total_degree, 16), dtype=np.uint8)
        _LIB.mlt_pcs_partial_sums(
            _p(np.ascontiguousarray(matrix)), _p(np.ascontiguousarray(delta)), h, total_degree, _p(out)
        )
        return bytes_arr_to_ints(out)
    m, d = bytes_arr_to_ints(matrix), bytes_arr_to_ints(delta)
    off = h // 2
    sums = []
    for x in range(1, total_degree + 1):
        s = 0
        for i in range(off):
            mx = (m[i] + x * (m[i + off] - m[i])) % P
            dx = (d[i] + x * (d[i + off] - d[i])) % P
            s = (s + mx * dx) % P
        sums.append(s)
    return sums


def fingerprint_rlc(vecs: np.ndarray, r: int) -> np.ndarray:
    """(B, n, 16) -> (n, 16): Horner RLC over the B axis (quirk Q6)."""
    b, n, _ = vecs.shape
    if HAVE_NATIVE:
        out = np.empty((n, 16), dtype=np.uint8)
        _LIB.mlt_fingerprint(_p(np.ascontiguousarray(vecs)), b, n, _p(int_to_byte_row(r)), _p(out))
        return out
    cols = [bytes_arr_to_ints(vecs[j]) for j in range(b)]
    acc = [0] * n
    for col in cols:
        acc = [(a * r + v) % P for a, v in zip(acc, col)]
    return ints_to_bytes_arr(acc)


# -- hashing ----------------------------------------------------------------------


def sha256_many(msgs: np.ndarray) -> np.ndarray:
    """(n, L) uint8 messages -> (n, 32) digests."""
    n, L = msgs.shape
    if HAVE_NATIVE:
        out = np.empty((n, 32), dtype=np.uint8)
        _LIB.mlt_sha256_many(_p(np.ascontiguousarray(msgs)), L, n, _p(out))
        return out
    out = np.empty((n, 32), dtype=np.uint8)
    for i in range(n):
        out[i] = np.frombuffer(hashlib.sha256(msgs[i].tobytes()).digest(), dtype=np.uint8)
    return out


def merkle_layers(leaves: np.ndarray) -> List[np.ndarray]:
    """(n, 32) leaf digests -> list of (m, 32) layers up to the root."""
    n = leaves.shape[0]
    if HAVE_NATIVE:
        total = 2 * n - 1
        buf = np.empty((total, 32), dtype=np.uint8)
        _LIB.mlt_merkle_layers(_p(np.ascontiguousarray(leaves)), n, _p(buf))
        layers, off, m = [], 0, n
        while True:
            layers.append(buf[off : off + m])
            off += m
            if m == 1:
                break
            m //= 2
        return layers
    layers = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        nxt = np.empty((cur.shape[0] // 2, 32), dtype=np.uint8)
        for i in range(nxt.shape[0]):
            nxt[i] = np.frombuffer(
                hashlib.sha256(cur[2 * i].tobytes() + cur[2 * i + 1].tobytes()).digest(),
                dtype=np.uint8,
            )
        layers.append(nxt)
        cur = nxt
    return layers


def merkle_verify(leaf_bytes: bytes, sibs: List[bytes], dirs: List[int], root: bytes) -> Tuple[bool, int]:
    """Returns (root_ok, recomputed_index)."""
    if HAVE_NATIVE and sibs:
        sib_arr = np.frombuffer(b"".join(sibs), dtype=np.uint8)
        dir_arr = np.asarray(dirs, dtype=np.uint8)
        leaf_arr = np.frombuffer(leaf_bytes, dtype=np.uint8)
        root_arr = np.frombuffer(root, dtype=np.uint8)
        idx = _LIB.mlt_merkle_verify(
            _p(leaf_arr), len(leaf_bytes), _p(sib_arr), _p(dir_arr), len(dirs), _p(root_arr)
        )
        if idx < 0:
            return False, -1
        return True, int(idx)
    h = hashlib.sha256(leaf_bytes).digest()
    index = 0
    for i, (sib, d) in enumerate(zip(sibs, dirs)):
        if d:
            index += 1 << i
            h = hashlib.sha256(sib + h).digest()
        else:
            h = hashlib.sha256(h + sib).digest()
    return h == root, index
