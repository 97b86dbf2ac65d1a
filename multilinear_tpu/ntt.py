"""Radix-2 NTT / iNTT over GF(p) as a lax.scan of vectorized butterflies.

p has two-adicity 40 with multiplicative generator 3 (reference constants:
src/ntt/mod.rs:34-54); the 2^k-domain generator is 3^((p-1)/2^k).

TPU-first design: instead of the reference's nested per-block scalar loops
(src/ntt/mod.rs:81-107), every Cooley-Tukey stage is ONE elementwise pass
over the whole array, and the stages run under ``lax.scan`` with a shape-
invariant body (XOR-gather the butterfly partner, gather the twiddle from
the power table, one field mul, add/sub/select).  The scan keeps the traced
graph a CONSTANT size regardless of n - compile once, run any stage count -
which matters because XLA compile time scales with graph size and the limb
arithmetic expands ~200 HLO ops per field multiply.

Twiddle tables are powers of the domain generator, built as a tensor
product of host-computed 256-entry sub-tables combined by O(1) device
multiplies (see mle._product_table); they are cached per domain size.

Output matches the reference exactly: ``ntt(coeffs)[i] = p(g^i)`` in natural
order, ``intt`` inverts with the 1/n scale (src/ntt/mod.rs:131-174).

Batched: all functions operate on the LAST axis of ``(8, ..., n)`` arrays,
so a stack of B codewords transforms in one pass (used by the batched PCS).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from .field import limbs, ops
from .field.scalar import Fp, P, pow2_generator
from .mle import _product_table, bit_reverse

LOG_BLOWUP = 1  # Reed-Solomon rate 1/2 (reference src/fri/mod.rs:16)


@lru_cache(maxsize=48)
def _pow_table(gen_v: int, log_size: int):
    """Device array (8, 2^log_size) of [1, g, g^2, ...].

    g^i = prod_{bit j of i} g^(2^j): a tensor-product table whose per-bit
    factors (1, g^(2^j)) are host scalars - big-endian, so factor order is
    reversed (bit log_size-1 first).
    """
    if log_size == 0:
        return jnp.asarray(limbs.pack_ints([1]))
    factors = [
        (1, pow(gen_v, 1 << j, P)) for j in range(log_size - 1, -1, -1)
    ]
    return _product_table(factors)


def gen_pows(log_size: int):
    """Powers of the 2^log_size-domain generator, FIRST HALF of the cycle.

    Every twiddle exponent in the Pease NTT and the FRI fold is < 2^(log-1),
    so only [1, g, ..., g^(2^(log-1)-1)] is materialized - half the HBM of
    the reference's full table (pow_2_generator_powers, src/ntt/mod.rs:18-28).
    """
    if log_size == 0:
        return _pow_table(1, 0)
    return _pow_table(pow2_generator(log_size).v, log_size - 1)


def inv_gen_pows(log_size: int):
    """First-half powers of the inverse domain generator (iNTT, FRI fold)."""
    if log_size == 0:
        return _pow_table(1, 0)
    return _pow_table(pow2_generator(log_size).inv().v, log_size - 1)


def _pease_axis2(x, pows, log_m: int):
    """Constant-geometry (Pease) DIF butterflies along axis -2, under
    lax.scan.

    x: lead + (M, C).  Every stage has IDENTICAL data movement - split row
    halves, butterfly, interleave rows - so the scan body is shape-
    invariant, and because interleaving happens on axis -2 the trailing
    dimension C stays wide (tiny trailing dims get padded ~16-64x by TPU
    tiling).  Natural row order in, BIT-REVERSED row order out:

        y[2i]   = x[i] + x[i + M/2]
        y[2i+1] = (x[i] - x[i + M/2]) * g^(((i >> s) mod 2^(L-1-s)) << s)
    """
    if log_m == 0:
        return x
    M = 1 << log_m
    half = M // 2
    C = x.shape[-1]
    iota = jnp.arange(half, dtype=jnp.int32)
    stages = jnp.arange(log_m, dtype=jnp.int32)
    lead = x.shape[:-2]

    def body(x, s):
        u = x[..., :half, :]
        v = x[..., half:, :]
        exp = ((iota >> s) & ((half - 1) >> s)) << s
        tw = jnp.take(pows, exp, axis=-1)  # (8, half)
        tw = tw.reshape((8,) + (1,) * (len(lead) - 1) + (half, 1))
        tw = jnp.broadcast_to(tw, u.shape)
        p = ops.add(u, v)
        q = ops.mul(ops.sub(u, v), tw)
        out = jnp.stack([p, q], axis=-2).reshape(x.shape)
        return out, None

    x, _ = jax.lax.scan(body, x, stages)
    return x


def _bitrev_axis2(x, log_m: int):
    """Bit-reverse the axis -2 index (small gather; M <= ~2^13)."""
    from .mle import _bitrev_indices

    if log_m <= 1:
        return x
    idx = jnp.asarray(_bitrev_indices(1 << log_m).astype("int32"))
    return jnp.take(x, idx, axis=x.ndim - 2)


def _ntt_fourstep_impl(x, pows, log_n: int):
    """Four-step NTT: natural order in, natural order out.

    n = A*B with A, B ~ sqrt(n): column NTTs (axis -2), a twiddle-matrix
    multiply, a gather-transpose, then row-group NTTs (again axis -2).
    Every intermediate keeps a wide trailing dimension and every data
    permutation is a gather (standard layouts) - the flat Pease scan's
    trailing-2 interleave made XLA lay the carry out limbs-minor, a 16x
    tile-padding blowup at 2^24.  ``pows``: (8, n/2) first-half power
    table of the full domain.  Verified bit-exact vs the scalar model.
    """
    n = 1 << log_n
    if log_n == 0:
        return x
    a = (log_n + 1) // 2
    b = log_n - a
    A, B = 1 << a, 1 << b
    lead = x.shape[1:-1]
    M = x.reshape((8,) + lead + (A, B))

    # powers of w^B (the A-domain root) and w^A (the B-domain root)
    powsA = pows[:, ::B][:, : max(A // 2, 1)]
    powsB = pows[:, ::A][:, : max(B // 2, 1)]

    F = _bitrev_axis2(_pease_axis2(M, powsA, a), a)

    # twiddle matrix T[k1][n2] = w^(k1*n2), from the half table with the
    # w^(n/2) = -1 sign trick
    ia = jnp.arange(A, dtype=jnp.uint32)
    ib = jnp.arange(B, dtype=jnp.uint32)
    e = (ia[:, None] * ib[None, :]) & jnp.uint32(n - 1)
    e_lo = (e & jnp.uint32(n // 2 - 1)).astype(jnp.int32)
    negate = e >= jnp.uint32(n // 2)
    T = jnp.take(pows, e_lo, axis=-1)  # (8, A, B)
    T = ops.select(jnp.broadcast_to(negate, T.shape[1:]), ops.neg(T), T)
    if lead:
        T = T.reshape((8,) + (1,) * len(lead) + (A, B))
        T = jnp.broadcast_to(T, F.shape)
    G = ops.mul(F, T)

    # gather-transpose to lead + (B, A)
    j = jnp.arange(n, dtype=jnp.uint32)
    idx_t = ((j & jnp.uint32(A - 1)) * jnp.uint32(B) + (j >> a)).astype(jnp.int32)
    Gt = jnp.take(G.reshape((8,) + lead + (n,)), idx_t, axis=-1)
    Gt = Gt.reshape((8,) + lead + (B, A))

    H = _bitrev_axis2(_pease_axis2(Gt, powsB, b), b)
    # flat(H)[k2*A + k1] = out[k1 + A*k2]: already the natural order
    return H.reshape((8,) + lead + (n,))


_ntt_fourstep = partial(jax.jit, static_argnums=(2,))(_ntt_fourstep_impl)
# Donating variant for call sites whose input is transient (the RS-encode
# pipeline): frees the 1 GB padded-coefficient buffer at 2^25, where HBM
# is the binding constraint.
_ntt_fourstep_donated = partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))(
    _ntt_fourstep_impl
)


def ntt(coeffs, pows=None):
    """Forward NTT along the last axis: out[i] = p(g^i), natural order."""
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    if pows is None:
        pows = gen_pows(log_n)
    return _ntt_fourstep(coeffs, pows, log_n)


@jax.jit
def _scale(x, s_limbs):
    s = ops.broadcast_scalar(s_limbs, x.shape[1:])
    return ops.mul(x, s)


def intt(evals, inv_pows=None):
    """Inverse NTT along the last axis (reference src/ntt/mod.rs:131-174)."""
    n = evals.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if inv_pows is None:
        inv_pows = inv_gen_pows(log_n)
    x = _ntt_fourstep(evals, inv_pows, log_n)
    n_inv = limbs.pack_scalar(Fp(n).inv())
    return _scale(x, jnp.asarray(n_inv))


def reed_solomon(coeffs, log_blowup: int = LOG_BLOWUP):
    """RS-encode: zero-pad coefficients x2^log_blowup, NTT over the big domain.

    Reference: src/fri/mod.rs:19-28 (rate 1/2).
    """
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    pad_width = [(0, 0)] * coeffs.ndim
    pad_width[-1] = (0, ((1 << log_blowup) - 1) * n)
    padded = jnp.pad(coeffs, pad_width)
    # padded is created here and never reused: donate it to the transform
    log_m = log_n + log_blowup
    return _ntt_fourstep_donated(padded, gen_pows(log_m), log_m)
