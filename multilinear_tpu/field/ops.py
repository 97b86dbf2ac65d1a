"""Device (TPU) arithmetic in GF(p), p = 2^128 - 45*2^40 + 1.

All functions operate on limb arrays of shape ``(8,) + S`` (uint32, 16-bit
limbs, limb 0 least significant; see :mod:`multilinear_tpu.field.limbs`) and
are pure jnp -> XLA fuses them into single elementwise kernels on the VPU.

Design notes (TPU-first, not a port):

* 16x16 -> 32 bit products are exact in one uint32 lane multiply, so a full
  128x128 -> 256 bit schoolbook product is 64 lane multiplies plus shifts and
  adds.  Column sums are accumulated as split lo/hi 16-bit streams so no
  accumulator ever exceeds 2^19 - no 64-bit integers needed anywhere.

* Reduction exploits the sparse modulus: 2^128 = K (mod p) with
  K = 45*2^40 - 1 < 2^46, so a 256-bit product folds to canonical form with
  three short "multiply the high part by K and add" passes plus one
  conditional subtract.  Each pass has a proven static bound (comments
  below), so there is no data-dependent looping - everything is a fixed
  straight-line program, which is exactly what XLA wants.

* Sums over large axes never carry element-by-element: limbs are < 2^16, so
  up to 2^16 values can be added in plain uint32 lanes before one vectorized
  carry-normalize.  This makes sumcheck partial sums pure `jnp.sum` calls.

Reference semantics being reproduced: winterfell f128 canonical arithmetic
(reference src/field.rs), used by every layer above.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import K_LIMBS, LIMB_MASK, NLIMBS, P_LIMBS

_P = [np.uint32(int(x)) for x in P_LIMBS]  # np scalars: safe to close over in Pallas kernels
_K = [np.uint32(int(x)) for x in K_LIMBS]  # 3 limbs of K = 45*2^40 - 1

# (p+1)/2 = the field inverse of 2 (p is odd): used by the multiply-free
# halving (see ``half``).
from .limbs import P as _P_INT

_HALF_P1 = [
    np.uint32(((_P_INT + 1) // 2 >> (16 * i)) & int(LIMB_MASK)) for i in range(8)
]

# ---------------------------------------------------------------------------
# limb-list helpers.  A "limb list" is a Python list of equally-shaped uint32
# arrays; list index = limb index.  Static Python loops unroll into straight-
# line XLA ops.
# ---------------------------------------------------------------------------


def _split(a):
    """(8,)+S array -> list of 8 S-shaped limb planes."""
    return [a[i] for i in range(NLIMBS)]


def _join(limbs):
    return jnp.stack(limbs, axis=0)


def _add_chain(a, b):
    """Add two same-length clean (<2^16) limb lists; return (limbs, carry)."""
    out = []
    carry = None
    for x, y in zip(a, b):
        v = x + y if carry is None else x + y + carry
        out.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS_SHIFT
    return out, carry


LIMB_BITS_SHIFT = 16


def _sub_chain(a, b):
    """Subtract clean limb lists (a - b); return (limbs, borrow in {0,1})."""
    out = []
    borrow = np.uint32(0)
    for x, y in zip(a, b):
        yb = y + borrow  # <= 2^16, no overflow
        d = x - yb  # uint32 wraparound; low 16 bits are the true limb
        out.append(d & LIMB_MASK)
        borrow = (x < yb).astype(jnp.uint32)
    return out, borrow


def _canon_sub_p(limbs):
    """Map a clean 8-limb value < 2^128 into [0, p) by one conditional -p.

    Valid because 2^128 < 2p.
    """
    diff, borrow = _sub_chain(limbs, _P)
    lt_p = borrow != 0
    return [jnp.where(lt_p, x, d) for x, d in zip(limbs, diff)]


# K = 45*2^40 - 1 = 11520*2^32 - 1, so K*x = ((11520*x) << 32) - x: ONE
# small-constant lane multiply per limb (11520*x_i < 2^30, exact in uint32)
# instead of the 3L-product schoolbook.
_K_SHIFT_MUL = np.uint32(11520)  # 45 * 2^8

# Which reduction-fold form to trace.  The K-shift form is a measured win
# on TPU (fewer lane multiplies, round-4 BENCH history), but XLA:CPU's
# compile time explodes on it at rank-3 value shapes: _fold_kernel at
# (8, 2, 1024) compiles in 2.3 s with the schoolbook form vs >300 s with
# K-shift (round-4 verdict weak #1; reproduce with tools/compile_probe.py).
# Both forms produce identical canonical values (pinned by every golden /
# parity test), so the choice is made per backend at TRACE time.  Tests
# can force a form via this module global.
_FORCE_KSHIFT = None  # None = auto (TPU yes, others no); True/False force


def _use_kshift() -> bool:
    if _FORCE_KSHIFT is not None:
        return _FORCE_KSHIFT
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _mul_k_shift(hi):
    """K * hi via the K-shift identity (TPU form; see _K_SHIFT_MUL).

    Computed as (11520*hi) << 32  minus  hi: the shifted product A >= hi
    always, so the subtract chain never underflows, and K*hi < 2^46 *
    2^(16L) fits L+3 limbs with zero final carry.
    """
    L = len(hi)
    zero = jnp.zeros_like(hi[0])
    m = [h * _K_SHIFT_MUL for h in hi]  # each < 2^30
    cols = []
    for k in range(L + 3):
        c = zero
        if 2 <= k < L + 2:
            c = c + (m[k - 2] & LIMB_MASK)
        if 3 <= k < L + 3:
            c = c + (m[k - 3] >> 16)
        cols.append(c)
    a, _ca = _carry_normalize(cols, L + 3)  # A < 2^(16L+46): carry 0
    d, _borrow = _sub_chain(a, hi + [zero] * 3)  # A >= hi: borrow 0
    return d


def _mul_k_wide(hi):
    """K * hi via the 3-limb schoolbook product (XLA:CPU-friendly form).

    Column accumulators stay < 3 * 2^16 < 2^18; tree-merged like `mul`.
    """
    L = len(hi)
    k_arrs = [jnp.broadcast_to(k, hi[0].shape) for k in _K]
    cols = _wide_mul_cols(hi, k_arrs)  # L+3 columns
    out, _carry = _carry_normalize(cols, L + 3)
    # K*hi < 2^46 * 2^(16L) fits in L+3 limbs; final carry provably 0.
    return out


def _mul_k(hi):
    """Multiply a clean limb list (len L) by K (3 limbs); returns L+3 clean limbs."""
    return _mul_k_shift(hi) if _use_kshift() else _mul_k_wide(hi)


def _fold_ge8_shift(t):
    """K-shift fold (TPU form; see _use_kshift for why it is gated).

    Fused as  t_lo + ((11520*t_hi) << 32)  minus  t_hi  (see _K_SHIFT_MUL):
    L lane multiplies instead of 3L.  Returns (limbs, carry) with
    len(limbs) = max(8, L+3), exactly the old _add_chain contract: the
    value  t_lo + K*t_hi  is unchanged, and since A = t_lo + 11520*t_hi*2^32
    >= t_hi the final  carry = ca - borrow  is always >= 0.
    """
    lo, hi = t[:8], t[8:]
    L = len(hi)
    n = max(8, L + 3)
    zero = jnp.zeros_like(lo[0])
    m = [h * _K_SHIFT_MUL for h in hi]  # each < 2^30
    cols = []
    for k in range(n):
        c = lo[k] if k < 8 else zero
        if 2 <= k < L + 2:
            c = c + (m[k - 2] & LIMB_MASK)
        if 3 <= k < L + 3:
            c = c + (m[k - 3] >> 16)
        cols.append(c)
    a, ca = _carry_normalize(cols, n)  # A < 2^128 + 2^(16L+46)
    d, borrow = _sub_chain(a, hi + [zero] * (n - L))
    return d, ca - borrow


def _fold_ge8_wide(t):
    """Schoolbook fold: lo + K*hi via _mul_k_wide then one add chain."""
    lo, hi = t[:8], t[8:]
    kh = _mul_k_wide(hi)  # len(hi)+3 clean limbs
    n = max(8, len(kh))
    a = lo + [jnp.zeros_like(lo[0])] * (n - 8)
    b = kh + [jnp.zeros_like(lo[0])] * (n - len(kh))
    s, carry = _add_chain(a, b)
    return s, carry


def _fold_ge8(t):
    """Fold a clean limb list of length > 8 once: t[:8] + K * t[8:]."""
    return _fold_ge8_shift(t) if _use_kshift() else _fold_ge8_wide(t)


# ---------------------------------------------------------------------------
# public field ops
# ---------------------------------------------------------------------------


@jax.jit
def add(a, b):
    """(a + b) mod p for canonical limb arrays."""
    al, bl = _split(a), _split(b)
    s, carry = _add_chain(al, bl)
    # carry==1  =>  a+b = 2^128 + s_lo, and a+b - p = s_lo + K  (< p, no carry)
    # carry==0  =>  result is s mod p via one conditional subtract.
    k_or_zero = [jnp.where(carry != 0, k, np.uint32(0)) for k in _K]
    k_or_zero += [jnp.zeros_like(s[0])] * (NLIMBS - 3)
    t, _ = _add_chain(s, k_or_zero)
    return _join(_canon_sub_p(t))


@jax.jit
def sub(a, b):
    """(a - b) mod p for canonical limb arrays."""
    al, bl = _split(a), _split(b)
    d, borrow = _sub_chain(al, bl)
    # borrow==1 => true value is d + 2^128 - ... we want a-b+p = d - K (no borrow:
    # d >= 2^128 - p + 1 = K + 1 whenever a < b).
    k_or_zero = [jnp.where(borrow != 0, k, np.uint32(0)) for k in _K]
    k_or_zero += [jnp.zeros_like(d[0])] * (NLIMBS - 3)
    out, _ = _sub_chain(d, k_or_zero)
    return _join(out)


@jax.jit
def neg(a):
    """(-a) mod p."""
    al = _split(a)
    d, _ = _sub_chain(_P, al)
    is_zero = is_zero_mask(a)
    return _join([jnp.where(is_zero, np.uint32(0), x) for x in d])


def _half_list(al):
    """x * 2^{-1} mod p on a canonical limb LIST - no field multiply.

    p is odd, so x/2 = (x >> 1) when x is even and (x + p)/2 =
    (x >> 1) + (p+1)/2 when x is odd (x + p is even and < 2p, so the
    division is exact and the result < p).  The bit shift crosses limbs
    (bit 0 of limb i+1 becomes bit 15 of limb i) and the conditional add
    of the (p+1)/2 constant cannot overflow: (x>>1) + (p+1)/2 <=
    (p-2)/2 + (p+1)/2 = p - 1/2 < p, so the final carry is provably 0.
    Usable both from jnp code and inside Pallas kernel bodies (constants
    are np scalars).
    """
    odd = al[0] & np.uint32(1)
    sh = [
        (al[i] >> 1) | ((al[i + 1] & np.uint32(1)) << 15)
        for i in range(NLIMBS - 1)
    ] + [al[NLIMBS - 1] >> 1]
    addl = [jnp.where(odd != 0, h, np.uint32(0)) for h in _HALF_P1]
    out, _carry = _add_chain(sh, addl)  # provably 0 (see above)
    return out


@jax.jit
def half(a):
    """(a * 2^{-1}) mod p for a canonical limb array - shift-add, no multiply.

    Bit-identical to ``mul(a, broadcast_scalar(pack(TWO_INV)))`` (same
    canonical field value), at the cost of one cross-limb shift and one
    conditional add instead of a full 128-bit multiply."""
    return _join(_half_list(_split(a)))


def is_zero_mask(a):
    """Boolean mask of value-shape S: True where the element is 0."""
    m = a[0] == 0
    for i in range(1, NLIMBS):
        m = m & (a[i] == 0)
    return m


# ---------------------------------------------------------------------------
# tree-structured schoolbook product
#
# The straightforward 64-term accumulation emits ~600 HLO ops per mul and
# XLA compile time scales with graph size - with a mul inside every kernel
# that was the build's bottleneck, not runtime.  This formulation computes
# the same column sums c_k = sum_{i+j=k} a_i*b_j with O(log) tensor-level
# ops: one outer product, then a binary tree of pad-and-add merges along
# the limb axis (merging two row groups offset by 2^level), then one short
# carry chain.  ~3x smaller graphs, identical results.
# ---------------------------------------------------------------------------


def _antidiagonal_sums(o):
    """o: (R, C)+S array of row vectors; returns (R+C-1,)+S anti-diagonal sums
    c_k = sum_i o[i, k-i], via a pad-and-add halving tree."""
    R = o.shape[0]
    C = o.shape[1]
    rows = o
    width = C
    count = R
    # invariant: rows[g] holds the partial sum of original rows in group g,
    # already aligned so that column c of group g maps to output k = g*stride + c.
    stride = 1
    while count > 1:
        if count % 2 == 1:
            pad = [(0, 1)] + [(0, 0)] * (rows.ndim - 1)
            rows = jnp.pad(rows, pad)
            count += 1
        even = rows[0::2]
        odd = rows[1::2]
        # group 2g+1 is offset by `stride` columns relative to group 2g
        pad_e = [(0, 0), (0, stride)] + [(0, 0)] * (rows.ndim - 2)
        pad_o = [(0, 0), (stride, 0)] + [(0, 0)] * (rows.ndim - 2)
        rows = jnp.pad(even, pad_e) + jnp.pad(odd, pad_o)
        width += stride
        stride *= 2
        count //= 2
    return rows[0]


def _carry_normalize(cols, out_len):
    """cols: list/array of uint32 column sums (< 2^31); returns out_len clean
    limbs via one sequential carry chain."""
    out = []
    carry = jnp.zeros_like(cols[0])
    n = len(cols)
    for k in range(out_len):
        v = carry + (cols[k] if k < n else 0)
        out.append(v & LIMB_MASK)
        carry = v >> 16
    return out, carry


def _wide_mul_cols(al, bl):
    """Column sums of the 2^16-radix product of two clean limb lists.

    Returns a list of len(a)+len(b)-1+1 uint32 arrays, each < 2^21.
    """
    a = jnp.stack(al, axis=0)
    b = jnp.stack(bl, axis=0)
    o = a[:, None] * b[None, :]  # (La, Lb)+S, 16x16 -> 32 exact
    lo = o & LIMB_MASK
    hi = o >> 16
    c_lo = _antidiagonal_sums(lo)  # (La+Lb-1,)+S, each < min(La,Lb)*2^16
    c_hi = _antidiagonal_sums(hi)
    ncols = c_lo.shape[0] + 1
    # t_k = c_lo[k] + c_hi[k-1]  (the hi halves weigh one limb more)
    zero = jnp.zeros_like(c_lo[0])
    cols = [c_lo[0]] + [
        (c_lo[k] if k < c_lo.shape[0] else zero) + c_hi[k - 1] for k in range(1, ncols)
    ]
    return cols


# The tree-structured product materializes the (8 x 8)-limb outer product
# (64 uint32 planes = 256 B per element).  Above this many value elements
# the multiply runs chunk-by-chunk under fori_loop so the temp stays ~1 GB
# instead of value_size * 256 B (8 GB at 2^25 - an instant HBM OOM).
_MUL_CHUNK = 1 << 22


@jax.jit
def mul(a, b):
    """(a * b) mod p.  The hot primitive."""
    total = 1
    for d in a.shape[1:]:
        total *= d
    if a.shape == b.shape and total >= 4096:
        from ..config import pallas_enabled

        if pallas_enabled():
            from . import pallas_ops

            return pallas_ops.mul(a, b)
    if a.shape == b.shape and total > _MUL_CHUNK:
        S = a.shape[1:]
        af = a.reshape(8, total)
        bf = b.reshape(8, total)
        k = -(-total // _MUL_CHUNK)
        pad = k * _MUL_CHUNK - total
        if pad:
            af = jnp.pad(af, ((0, 0), (0, pad)))
            bf = jnp.pad(bf, ((0, 0), (0, pad)))

        def body(i, out):
            sa = jax.lax.dynamic_slice(af, (0, i * _MUL_CHUNK), (8, _MUL_CHUNK))
            sb = jax.lax.dynamic_slice(bf, (0, i * _MUL_CHUNK), (8, _MUL_CHUNK))
            return jax.lax.dynamic_update_slice(out, _mul_core(sa, sb), (0, i * _MUL_CHUNK))

        out = jax.lax.fori_loop(0, k, body, jnp.zeros_like(af))
        if pad:
            out = out[:, :total]
        return out.reshape((8,) + S)
    return _mul_core(a, b)


def _mul_core(a, b):
    al, bl = _split(a), _split(b)
    cols = _wide_mul_cols(al, bl)  # 16 columns, each < 2^20
    t, cy = _carry_normalize(cols, 16)  # product < 2^256: carry provably 0

    # --- sparse-modulus reduction, three bounded folds --------------------
    # t (16 limbs) -> y = t_lo + K*t_hi            < 2^128 + 2^174 : 11 limbs
    y, cy = _fold_ge8(t)  # len 11, carry provably 0 (2^175 < 2^176)
    del cy
    # y (11 limbs) -> z = y_lo + K*y_hi            < 2^128 + 2^94  : 9 limbs
    z, cz = _fold_ge8(y[:11])
    z = z + [cz]
    # NOTE: len(y[8:]) == 3 -> kh len 6 -> sum len 8 with a real carry bit cz
    # (z < 2^129, top in {0,1}).
    # z (9 limbs) -> w = z_lo + K*z[8].  If z[8]==1 then z_lo < 2^94 so no
    # carry; if z[8]==0 addend is 0.  Result fits 8 limbs, < 2^128.
    kh = _mul_k([z[8]])  # 4 limbs
    addend = kh + [jnp.zeros_like(z[0])] * 4
    w, cw = _add_chain(z[:8], addend)
    del cw  # provably 0
    return _join(_canon_sub_p(w))


@partial(jax.jit, static_argnums=(1,))
def mul_small(a, k: int):
    """(a * k) mod p for a small Python-int constant 0 <= k < 2^16."""
    if k == 0:
        return jnp.zeros_like(a)
    if k == 1:
        return a
    al = _split(a)
    kk = np.uint32(k)
    out = []
    carry = np.uint32(0)
    for i in range(NLIMBS):
        v = al[i] * kk + carry  # < 2^32 (a_i*k < 2^32-2^16, carry < 2^16)
        out.append(v & LIMB_MASK)
        carry = v >> 16
    # value = out + 2^128*carry, carry < 2^16 -> fold K*carry (4 limbs)
    kh = _mul_k([carry])
    addend = kh + [jnp.zeros_like(al[0])] * 4
    w, cw = _add_chain(out, addend)
    # w < 2^128 + 2^62 may carry into 2^128: fold once more (cw in {0,1};
    # if cw==1 then w < 2^62 so adding K cannot carry).
    k_or_zero = [jnp.where(cw != 0, kj, np.uint32(0)) for kj in _K]
    k_or_zero += [jnp.zeros_like(al[0])] * (NLIMBS - 3)
    w2, _ = _add_chain(w, k_or_zero)
    return _join(_canon_sub_p(w2))


def normalize_wide(limbs32, extra_bits=16):
    """Reduce a limb list whose limbs may be as large as 2^32 - 1.

    Used after unchained `jnp.sum` accumulation.  Returns a canonical
    (8,)+S array.
    """
    # carry-normalize into clean limbs (+ spill limbs for the high carries)
    n = len(limbs32)
    spill = (extra_bits + 15) // 16 + 1
    out = []
    carry = jnp.zeros_like(limbs32[0])
    for i in range(n + spill):
        v = carry
        if i < n:
            v = v + limbs32[i]
        out.append(v & LIMB_MASK)
        carry = v >> 16
    t = out
    while len(t) > 8:
        s, c = _fold_ge8(t)
        t = s if c is None else s + [c]
        # strip statically-zero top limbs is not possible here; but each fold
        # shrinks the value by ~82 bits, so this loop terminates: lengths go
        # n -> max(8, n-5)+1 strictly decreasing until 9, then the {0,1} top
        # limb folds to < 2^62 additions.
        if len(t) == 9:
            kh = _mul_k([t[8]])
            addend = kh + [jnp.zeros_like(t[0])] * 4
            w, cw = _add_chain(t[:8], addend)
            k_or_zero = [jnp.where(cw != 0, kj, np.uint32(0)) for kj in _K]
            k_or_zero += [jnp.zeros_like(t[0])] * (NLIMBS - 3)
            t, _ = _add_chain(w, k_or_zero)
    return _join(_canon_sub_p(t))


@partial(jax.jit, static_argnums=(1,))
def sum_mod(a, axis=1):
    """Sum a canonical limb array over one value axis, mod p.

    Chunks the axis so plain uint32 `jnp.sum` never overflows (limbs < 2^16
    allow 2^15-element chunks with headroom), then carry-normalizes once per
    level.  This keeps the whole reduction on the VPU with zero carry chains
    in the inner loop.
    """
    if a.shape[axis] == 0:
        raise ValueError("empty sum")
    CH = 1 << 15
    while a.shape[axis] > 1:
        n = a.shape[axis]
        if n <= CH:
            s32 = jnp.sum(a, axis=axis, dtype=jnp.uint32)
            return normalize_wide(_split_arr(s32), extra_bits=15)
        chunks = -(-n // CH)
        pad = chunks * CH - n
        if pad:
            padw = [(0, 0)] * a.ndim
            padw[axis] = (0, pad)
            a = jnp.pad(a, padw)
        shp = list(a.shape)
        shp[axis : axis + 1] = [chunks, CH]
        a = a.reshape(shp)
        s32 = jnp.sum(a, axis=axis + 1, dtype=jnp.uint32)  # limbs < 2^31
        a = normalize_wide(_split_arr(s32), extra_bits=15)
    return jnp.squeeze(a, axis=axis)


def _split_arr(a):
    return [a[i] for i in range(a.shape[0])]


def select(mask, a, b):
    """Elementwise select between two limb arrays by a value-shaped bool mask."""
    return jnp.where(mask[None], a, b)


def full_like_zero(shape):
    return jnp.zeros((NLIMBS,) + tuple(shape), dtype=jnp.uint32)


def broadcast_scalar(limbs8, shape):
    """Broadcast an (8,) scalar limb vector to (8,)+shape."""
    x = jnp.asarray(limbs8, dtype=jnp.uint32)
    return jnp.broadcast_to(x.reshape((NLIMBS,) + (1,) * len(shape)), (NLIMBS,) + tuple(shape))


@partial(jax.jit, static_argnums=(2,))
def dot_mod(a, b, axis=1):
    """sum(a*b) mod p over one value axis."""
    return sum_mod(mul(a, b), axis=axis)


def pow_const(a, e: int):
    """a ** e for a Python-int exponent, square-and-multiply (host unrolled)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if result is None:
        one = np.zeros((NLIMBS,) + a.shape[1:], np.uint32)
        one[0] = 1
        return jnp.asarray(one)
    return result


class FA:
    """Thin operator-overloading wrapper so constraint ``Expr`` callables can
    run unchanged over device limb arrays (prover) and host ``Fp`` scalars
    (verifier).  Mirrors reference Expr = fn(&[F], &[F]) -> F
    (src/constraint_system/constraints.rs:3-10).
    """

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a

    def __add__(self, o):
        return FA(add(self.a, _coerce(o, self.a)))

    __radd__ = __add__

    def __sub__(self, o):
        return FA(sub(self.a, _coerce(o, self.a)))

    def __rsub__(self, o):
        return FA(sub(_coerce(o, self.a), self.a))

    def __mul__(self, o):
        return FA(mul(self.a, _coerce(o, self.a)))

    __rmul__ = __mul__

    def __neg__(self):
        return FA(neg(self.a))


def _coerce(o, like):
    if isinstance(o, FA):
        return o.a
    from .limbs import pack_scalar

    if isinstance(o, int) or hasattr(o, "v"):
        return broadcast_scalar(pack_scalar(o), like.shape[1:])
    return o


# ---------------------------------------------------------------------------
# debug-mode sanitizer (SURVEY.md section 5: overflow-guard analog)
# ---------------------------------------------------------------------------


def _canonical_violation(arr) -> str:
    """Host check: '' if every element is a canonical residue."""
    a = np.asarray(arr)
    if (a >> 16).any():
        return "limb >= 2^16"
    flat = a.reshape(NLIMBS, -1).astype(object)
    v = np.zeros(flat.shape[1], dtype=object)
    for i in range(NLIMBS - 1, -1, -1):
        v = (v << 16) | flat[i]
    p = 0
    for i in range(NLIMBS - 1, -1, -1):
        p = (p << 16) | int(_P[i])
    if (v >= p).any():
        return "value >= p"
    return ""


def debug_guard(x, tag: str):
    """Attach a canonical-form assertion to ``x`` when debug_checks is on.

    Identity (zero cost) unless ``config.debug_checks`` was True when the
    enclosing function was TRACED.  With it on, a ``jax.debug.callback``
    ships the array to the host and raises on the first non-canonical
    element - catching limb-arithmetic bugs (overflowed accumulators,
    missed reductions) at the kernel that produced them rather than as a
    wrong proof far downstream.
    """
    from ..config import get_config

    if not get_config().debug_checks:
        return x

    def _check(a, tag=tag):
        msg = _canonical_violation(a)
        if msg:
            raise AssertionError(f"non-canonical field element after {tag}: {msg}")

    jax.debug.callback(_check, x)
    return x
