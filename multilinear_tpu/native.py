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
    lib.mlt_encode_mle.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.mlt_delta_table.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.mlt_fingerprint.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64, u8p, u8p]
    lib.mlt_sha256.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.mlt_sha256_many.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64, u8p]
    lib.mlt_sha_init.argtypes = [u8p]
    lib.mlt_sha_update.argtypes = [u8p, u8p, ctypes.c_uint64]
    lib.mlt_sha_digest.argtypes = [u8p, u8p]
    lib.mlt_merkle_layers.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.mlt_merkle_verify.argtypes = [
        u8p, ctypes.c_uint64, u8p, u8p, ctypes.c_uint64, u8p,
    ]
    lib.mlt_merkle_verify.restype = ctypes.c_longlong
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_longlong)
    lib.mlt_merkle_verify_many.argtypes = [
        u8p, u64p, u8p, u8p, u64p, u8p, ctypes.c_uint64, i64p,
    ]
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


def delta_table(point_vals: List[int]) -> np.ndarray:
    """eq(points, bits(i)) over {0,1}^n as a (2^n, 16) byte array,
    big-endian variable order (quirk Q8)."""
    n_vars = len(point_vals)
    out = np.empty((1 << n_vars, 16), dtype=np.uint8)
    if HAVE_NATIVE:
        pts = ints_to_bytes_arr(point_vals)
        _LIB.mlt_delta_table(_p(pts), n_vars, _p(out))
        return out
    table = [1]
    for p in point_vals:
        om = (1 - p) % P
        table = [v * w % P for v in table for w in (om, p)]
    return ints_to_bytes_arr(table)


def encode_mle(evals: np.ndarray) -> np.ndarray:
    """(h,16) MLE evals -> (2h,16) RS codeword: Moebius transform,
    coefficient bit-reversal (Q8), zero-pad x2, NTT over the 2h domain.
    Bit-identical to the device fri.encode_mle_for_fri (pinned by tests)."""
    h = evals.shape[0]
    out = np.empty((2 * h, 16), dtype=np.uint8)
    if HAVE_NATIVE:
        _LIB.mlt_encode_mle(_p(np.ascontiguousarray(evals)), h, _p(out))
        return out
    a = bytes_arr_to_ints(evals)
    step = 1
    while step < h:
        for i in range(h):
            if i & step:
                a[i] = (a[i] - a[i ^ step]) % P
        step <<= 1
    hbits = h.bit_length() - 1
    a = [a[int(format(i, f"0{hbits}b")[::-1], 2)] for i in range(h)] if hbits else a
    n = 2 * h
    a = a + [0] * h
    nbits = hbits + 1
    a = [a[int(format(i, f"0{nbits}b")[::-1], 2)] for i in range(n)]
    w_n = pow(3, (P - 1) // n, P)
    length = 2
    while length <= n:
        wl = pow(w_n, n // length, P)
        for blk in range(0, n, length):
            tw = 1
            for j in range(length // 2):
                u, v = a[blk + j], a[blk + j + length // 2] * tw % P
                a[blk + j] = (u + v) % P
                a[blk + j + length // 2] = (u - v) % P
                tw = tw * wl % P
        length <<= 1
    return ints_to_bytes_arr(a)


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


class Sha256Stream:
    """Streaming SHA-256 with an exportable/importable midstate.

    hashlib cannot export its internal state, but the Fiat-Shamir
    transcript must hop between host and device (device kernels absorb
    round data and derive challenges without a host round-trip), so the
    transcript runs on this implementation: native C++ when available,
    exact pure Python otherwise.  Digest semantics match hashlib exactly.

    Midstate layout: (8 x u32 chaining state, partial block bytes, total
    absorbed length).
    """

    __slots__ = ("_ctx", "_st", "_buf", "_total")

    def __init__(self):
        if HAVE_NATIVE:
            self._ctx = np.zeros(112, dtype=np.uint8)
            _LIB.mlt_sha_init(_p(self._ctx))
        else:
            self._st = list(_SHA_H0)
            self._buf = b""
            self._total = 0

    def update(self, data: bytes) -> None:
        if HAVE_NATIVE:
            arr = np.frombuffer(data, dtype=np.uint8)
            if arr.size:
                _LIB.mlt_sha_update(_p(self._ctx), _p(arr), arr.size)
            return
        self._total += len(data)
        self._buf += data
        while len(self._buf) >= 64:
            _sha_compress_py(self._st, self._buf[:64])
            self._buf = self._buf[64:]

    def digest(self) -> bytes:
        """Finalize a CLONE; the stream itself does not advance."""
        if HAVE_NATIVE:
            out = np.empty(32, dtype=np.uint8)
            _LIB.mlt_sha_digest(_p(self._ctx), _p(out))
            return out.tobytes()
        st = list(self._st)
        fill = len(self._buf)
        tail = self._buf + b"\x80"
        blocks = 1 if fill + 1 + 8 <= 64 else 2
        tail += b"\x00" * (64 * blocks - len(tail) - 8)
        tail += (self._total * 8).to_bytes(8, "big")
        for i in range(blocks):
            _sha_compress_py(st, tail[64 * i : 64 * i + 64])
        return b"".join(int(w).to_bytes(4, "big") for w in st)

    def copy(self) -> "Sha256Stream":
        t = Sha256Stream.__new__(Sha256Stream)
        if HAVE_NATIVE:
            t._ctx = self._ctx.copy()
        else:
            t._st = list(self._st)
            t._buf = self._buf
            t._total = self._total
        return t

    # -- midstate export/import (for host<->device transcript hopping) -----
    def export_state(self):
        """Returns (state words (8,) uint32, partial block bytes, total_len)."""
        if HAVE_NATIVE:
            st = self._ctx[:32].view(np.uint32).copy()
            fill = int(self._ctx[104:108].view(np.uint32)[0])
            buf = self._ctx[32 : 32 + fill].tobytes()
            total = int(self._ctx[96:104].view(np.uint64)[0])
            return st, buf, total
        return (
            np.asarray(self._st, dtype=np.uint32),
            self._buf,
            self._total,
        )

    @staticmethod
    def import_state(st_words, buf: bytes, total: int) -> "Sha256Stream":
        t = Sha256Stream()
        if HAVE_NATIVE:
            t._ctx[:32] = np.asarray(st_words, dtype=np.uint32).view(np.uint8)
            t._ctx[32 : 32 + len(buf)] = np.frombuffer(buf, dtype=np.uint8)
            t._ctx[96:104] = np.frombuffer(
                np.asarray([total], dtype=np.uint64).tobytes(), dtype=np.uint8
            )
            t._ctx[104:108] = np.frombuffer(
                np.asarray([len(buf)], dtype=np.uint32).tobytes(), dtype=np.uint8
            )
        else:
            t._st = [int(w) for w in np.asarray(st_words, dtype=np.uint32)]
            t._buf = bytes(buf)
            t._total = int(total)
        return t


_SHA_H0 = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

_SHA_K = (
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
)


def _sha_compress_py(st: List[int], block: bytes) -> None:
    M = 0xFFFFFFFF

    def rotr(x, r):
        return ((x >> r) | (x << (32 - r))) & M

    w = list(int.from_bytes(block[4 * t : 4 * t + 4], "big") for t in range(16))
    for t in range(16, 64):
        s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
        s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
        w.append((w[t - 16] + s0 + w[t - 7] + s1) & M)
    a, b, c, d, e, f, g, h = st
    for t in range(64):
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g & M)
        t1 = (h + S1 + ch + _SHA_K[t] + w[t]) & M
        S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & M
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & M, c, b, a, (t1 + t2) & M
    st[0] = (st[0] + a) & M
    st[1] = (st[1] + b) & M
    st[2] = (st[2] + c) & M
    st[3] = (st[3] + d) & M
    st[4] = (st[4] + e) & M
    st[5] = (st[5] + f) & M
    st[6] = (st[6] + g) & M
    st[7] = (st[7] + h) & M


def merkle_verify_many(items) -> List[Tuple[bool, int]]:
    """Batch-verify inclusion paths in ONE native call.

    ``items``: list of (leaf_bytes, sibs, dirs, root) exactly as
    :func:`merkle_verify` takes them.  Returns [(root_ok, index)] in order.
    The per-call ctypes marshalling of merkle_verify is ~half the host
    verifier's Merkle cost at 128 queries x ~24 layers (round-3 VERDICT
    item 3); batching makes it one call per proof.
    """
    if not HAVE_NATIVE or not items or any(not it[1] for it in items):
        return [merkle_verify(*it) for it in items]
    n = len(items)
    leaves = np.frombuffer(b"".join(it[0] for it in items), dtype=np.uint8)
    leaf_len = np.asarray([len(it[0]) for it in items], dtype=np.uint64)
    sibs = np.frombuffer(
        b"".join(s for it in items for s in it[1]), dtype=np.uint8
    )
    dirs = np.asarray([d for it in items for d in it[2]], dtype=np.uint8)
    depth = np.asarray([len(it[2]) for it in items], dtype=np.uint64)
    roots = np.frombuffer(b"".join(it[3] for it in items), dtype=np.uint8)
    out = np.empty(n, dtype=np.int64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_longlong)
    _LIB.mlt_merkle_verify_many(
        _p(leaves),
        leaf_len.ctypes.data_as(u64p),
        _p(sibs),
        _p(dirs),
        depth.ctypes.data_as(u64p),
        _p(roots),
        n,
        out.ctypes.data_as(i64p),
    )
    return [(int(v) >= 0, int(v)) for v in out]


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
