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


@partial(jax.jit, static_argnums=(2,))
def _ntt_stages(x, pows, log_n: int):
    """Constant-geometry (Pease) DIF butterflies under lax.scan.

    Every stage has IDENTICAL data movement - split halves, butterfly,
    interleave - so the scan body is shape-invariant and the twiddle
    multiply touches only HALF the array:

        y[2i]   = x[i] + x[i + n/2]
        y[2i+1] = (x[i] - x[i + n/2]) * g^(((i >> s) mod 2^(L-1-s)) << s)

    Natural-order input, bit-reversed output (callers bit-reverse once at
    the end).  Verified bit-exact against the scalar DIF model.  No data
    gathers: only a (8, n/2) twiddle gather per stage, computed from the
    cached power table.
    """
    n = 1 << log_n
    half = n // 2
    iota = jnp.arange(half, dtype=jnp.int32)
    stages = jnp.arange(log_n, dtype=jnp.int32)

    def body(x, s):
        u = x[..., :half]
        v = x[..., half:]
        exp = ((iota >> s) & ((half - 1) >> s)) << s
        tw = jnp.take(pows, exp, axis=-1)  # (8, half)
        if x.ndim > 2:
            tw = tw.reshape((8,) + (1,) * (x.ndim - 2) + (half,))
            tw = jnp.broadcast_to(tw, u.shape)
        p = ops.add(u, v)
        q = ops.mul(ops.sub(u, v), tw)
        out = jnp.stack([p, q], axis=-1).reshape(x.shape)
        return out, None

    x, _ = jax.lax.scan(body, x, stages)
    return x


def ntt(coeffs, pows=None):
    """Forward NTT along the last axis: out[i] = p(g^i), natural order."""
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    if pows is None:
        pows = gen_pows(log_n)
    return bit_reverse(_ntt_stages(coeffs, pows, log_n))


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
    x = bit_reverse(_ntt_stages(evals, inv_pows, log_n))
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
    return ntt(padded, gen_pows(log_n + log_blowup))
