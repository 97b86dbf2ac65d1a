"""Radix-2 NTT / iNTT over GF(p) as staged, fully-vectorized device passes.

p has two-adicity 40 with multiplicative generator 3 (reference constants:
src/ntt/mod.rs:34-54); the 2^k-domain generator is 3^((p-1)/2^k).

TPU-first design: instead of the reference's nested per-block scalar loops
(src/ntt/mod.rs:81-107), every Cooley-Tukey stage here is ONE elementwise
pass over the whole array - a reshape exposing the butterfly pairing, a
broadcast twiddle multiply, and an add/sub.  Input is bit-reversed once via
a gather.  Twiddle tables are powers of the domain generator built on device
by log-doubling (O(log n) multiplies of geometrically growing arrays), then
strided-sliced per stage; they are cached per domain size.

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
from .mle import bit_reverse

LOG_BLOWUP = 1  # Reed-Solomon rate 1/2 (reference src/fri/mod.rs:16)


@lru_cache(maxsize=48)
def _pow_table(gen_v: int, log_size: int):
    """Device array (8, 2^log_size) of [1, g, g^2, ...] built by log-doubling."""
    pows = jnp.zeros((8, 1), dtype=jnp.uint32).at[0, 0].set(1)
    step = Fp(gen_v)
    for _ in range(log_size):
        s = ops.broadcast_scalar(limbs.pack_scalar(step), pows.shape[1:])
        pows = jnp.concatenate([pows, ops.mul(pows, s)], axis=1)
        step = step * step
    return pows


def gen_pows(log_size: int):
    """Powers of the 2^log_size-domain generator (reference
    pow_2_generator_powers, src/ntt/mod.rs:18-28)."""
    return _pow_table(pow2_generator(log_size).v, log_size)


def inv_gen_pows(log_size: int):
    """Powers of the inverse domain generator (for iNTT and FRI fold)."""
    return _pow_table(pow2_generator(log_size).inv().v, log_size)


@partial(jax.jit, static_argnums=(2,))
def _ntt_stages(x, pows, log_n):
    """All butterfly stages after bit-reversal.  x: (8, ..., n); pows: (8, n)."""
    n = 1 << log_n
    lead = x.shape[1:-1]
    for s in range(1, log_n + 1):
        length = 1 << s
        half = length >> 1
        # twiddles for this stage: g^(n/length * j), j in [0, half)
        tw = pows[:, :: n >> s][:, :half]  # (8, half)
        v = x.reshape((8,) + lead + (n // length, 2, half))
        u = v[..., 0, :]
        w = v[..., 1, :]
        if s > 1:
            twb = tw.reshape((8,) + (1,) * (len(lead) + 1) + (half,))
            w = ops.mul(w, jnp.broadcast_to(twb, w.shape))
        x = jnp.concatenate([ops.add(u, w), ops.sub(u, w)], axis=-1)
        x = x.reshape((8,) + lead + (n,))
    return x


def ntt(coeffs, pows=None):
    """Forward NTT along the last axis: out[i] = p(g^i), natural order."""
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    if pows is None:
        pows = gen_pows(log_n)
    x = bit_reverse(coeffs)
    return _ntt_stages(x, pows, log_n)


@partial(jax.jit, static_argnums=(2,))
def _intt_scale(x, n_inv, log_n):
    s = ops.broadcast_scalar(n_inv, x.shape[1:])
    return ops.mul(x, s)


def intt(evals, inv_pows=None):
    """Inverse NTT along the last axis (reference src/ntt/mod.rs:131-174)."""
    n = evals.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if inv_pows is None:
        inv_pows = inv_gen_pows(log_n)
    x = bit_reverse(evals)
    x = _ntt_stages(x, inv_pows, log_n)
    n_inv = limbs.pack_scalar(Fp(n).inv())
    return _intt_scale(x, jnp.asarray(n_inv), log_n)


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
