"""Multilinear polynomials on the boolean hypercube - device kernels.

A multilinear polynomial in n variables is held as a ``(8, ..., 2^n)`` limb
array (coefficient or evaluation form over {0,1}^n).  All transforms run as
fused elementwise passes on the TPU:

* zeta / Moebius butterflies convert between forms in n vectorized stages
  (reference semantics: src/polynomials.rs:111-124, 150-163);
* the eq/delta weight table is built by O(2^n) tensor-product doubling
  (same output as the reference's O(n 2^n) per-row Mask loop,
  src/constraint_system/evaluation.rs:50-91, but restructured for the VPU);
* evaluation at a point is a delta-table dot product.

Variable order is big-endian (quirk Q8): the FIRST variable corresponds to
the MOST significant bit of the hypercube index.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .field import limbs, ops
from .field.scalar import Fp, ONE


# ---------------------------------------------------------------------------
# form conversions (zeta / Moebius transforms)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=())
def _to_evals_impl(coeffs):
    x = coeffs
    n = x.shape[-1]
    n_vars = n.bit_length() - 1
    lead = x.shape[:-1]
    for i in range(n_vars):
        v = x.reshape(lead + (n >> (i + 1), 2, 1 << i))
        lo = v[..., 0, :]
        hi = ops.add(v[..., 1, :], lo)
        x = jnp.stack([lo, hi], axis=-2).reshape(lead + (n,))
    return x


@partial(jax.jit, static_argnums=())
def _to_coeffs_impl(evals):
    x = evals
    n = x.shape[-1]
    n_vars = n.bit_length() - 1
    lead = x.shape[:-1]
    for i in range(n_vars):
        v = x.reshape(lead + (n >> (i + 1), 2, 1 << i))
        lo = v[..., 0, :]
        hi = ops.sub(v[..., 1, :], lo)
        x = jnp.stack([lo, hi], axis=-2).reshape(lead + (n,))
    return x


def to_evals(coeffs):
    """Coefficient -> evaluation form over {0,1}^n (zeta transform)."""
    return _to_evals_impl(coeffs)


def to_coeffs(evals):
    """Evaluation -> coefficient form (Moebius transform)."""
    return _to_coeffs_impl(evals)


# ---------------------------------------------------------------------------
# eq / delta tables and evaluation
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(2,))
def _delta_table_impl(points, one_minus, n_vars):
    """points, one_minus: (8, n_vars).  Returns (8, 2^n_vars) with
    out[i] = prod_j (bit_j(i) ? points[j] : 1 - points[j]), big-endian:
    j = 0 is the MSB of i.
    """
    d = jnp.zeros((8, 1), dtype=jnp.uint32).at[0, 0].set(1)
    for j in range(n_vars):
        pt = points[:, j : j + 1]
        om = one_minus[:, j : j + 1]
        lo = ops.mul(d, jnp.broadcast_to(om, d.shape))
        hi = ops.mul(d, jnp.broadcast_to(pt, d.shape))
        d = jnp.stack([lo, hi], axis=-1).reshape(8, -1)
    return d


def delta_table(points):
    """eq(points, .) over all 2^n hypercube corners, as a device limb array.

    ``points`` is a list of Fp (or ints).  Big-endian: points[0] pairs with
    the MSB of the table index - matching the reference Mask convention
    (src/constraint_system/evaluation.rs:62-70).
    """
    pts = [Fp(p) for p in points]
    n_vars = len(pts)
    if n_vars == 0:
        return jnp.zeros((8, 1), dtype=jnp.uint32).at[0, 0].set(1)
    p_arr = jnp.asarray(limbs.pack_ints([p.v for p in pts]))
    om_arr = jnp.asarray(limbs.pack_ints([(ONE - p).v for p in pts]))
    return _delta_table_impl(p_arr, om_arr, n_vars)


@partial(jax.jit, static_argnums=(1,))
def _weight_table_impl(points, n_vars):
    """Monomial weights: out[i] = prod_{bit_j(i)=1} points[j] (big-endian)."""
    d = jnp.zeros((8, 1), dtype=jnp.uint32).at[0, 0].set(1)
    for j in range(n_vars):
        pt = points[:, j : j + 1]
        hi = ops.mul(d, jnp.broadcast_to(pt, d.shape))
        d = jnp.stack([d, hi], axis=-1).reshape(8, -1)
    return d


def evaluate_evals(evals, points):
    """Evaluate an MLE in evaluation form at an arbitrary point (device).

    Semantics of reference src/polynomials.rs:165-188.
    """
    d = delta_table(points)
    return ops.dot_mod(d, evals, axis=1)


def evaluate_coeffs(coeffs, points):
    """Evaluate coefficient form at a point (reference src/polynomials.rs:126-147)."""
    pts = [Fp(p) for p in points]
    n_vars = len(pts)
    if n_vars == 0:
        return coeffs[:, 0]
    p_arr = jnp.asarray(limbs.pack_ints([p.v for p in pts]))
    w = _weight_table_impl(p_arr, n_vars)
    return ops.dot_mod(w, coeffs, axis=1)


def evaluate_evals_host(evals, points):
    """Convenience: evaluate and return a host Fp."""
    return Fp(limbs.unpack_int(np.asarray(evaluate_evals(evals, points))))


# ---------------------------------------------------------------------------
# host reference helpers (exact, for tests and the verifier)
# ---------------------------------------------------------------------------


def eq_scalar(a, b):
    """eq(a, b) = prod a_i b_i + (1-a_i)(1-b_i) on host Fp lists.

    Reference Delta::evaluate (src/constraint_system/evaluation.rs:80-91).
    """
    acc = ONE
    for x, y in zip(a, b):
        x, y = Fp(x), Fp(y)
        acc = acc * (x * y + (ONE - x) * (ONE - y))
    return acc


def mask_scalar(index: int, n_vars: int, points):
    """eq(points, bits(index)) big-endian (reference Mask::evaluate)."""
    acc = ONE
    for i in range(n_vars):
        pt = Fp(points[n_vars - 1 - i])
        acc = acc * (pt if (index >> i) & 1 else ONE - pt)
    return acc


@lru_cache(maxsize=64)
def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def bit_reverse(x):
    """Bit-reverse permutation along the last value axis (device gather).

    Reference: src/ntt/mod.rs:113-123.
    """
    n = x.shape[-1]
    idx = jnp.asarray(_bitrev_indices(n))
    return jnp.take(x, idx, axis=x.ndim - 1)
