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


def _bit_passes(x, op):
    """Apply the per-bit butterfly hi' = op(hi, lo) for every index bit.

    The per-bit passes commute, so bits are processed in two groups to
    keep EVERY intermediate view's trailing dimension >= sqrt(n): high
    bits on the leading half-axis, one 2-D transpose, low bits likewise.
    (Views with tiny trailing dims get padded ~16x by TPU tiling - at
    2^24 that is the difference between 1 GB and 16 GB per buffer.)
    """
    n = x.shape[-1]
    bits = n.bit_length() - 1
    lead = x.shape[:-1]
    if bits == 0:
        return x

    def passes_over_second_to_last(v, log_m):
        # v: lead + (M, K); butterfly every bit of the M axis
        M = 1 << log_m
        K = v.shape[-1]
        if log_m and len(lead) == 1:
            from .config import pallas_enabled
            from .field import pallas_ops

            if pallas_enabled() and pallas_ops.zm_supported(M, K):
                # multi-stage kernel: ~8 bit-stages per HBM pass instead
                # of one (bit-identical - same exact mod-p stage ops)
                return pallas_ops.zm_butterfly_axis2(v, log_m, op is ops.add)
        for i in range(log_m):
            w = v.reshape(lead + (M >> (i + 1), 2, 1 << i, K))
            lo = w[..., 0, :, :]
            hi = op(w[..., 1, :, :], lo)
            v = jnp.stack([lo, hi], axis=-3).reshape(lead + (M, K))
        return v

    b = bits // 2
    a = bits - b
    A, B = 1 << a, 1 << b
    # transposed phase FIRST, natural-layout phase LAST: ending on the
    # un-transposed axis keeps the output in the standard minor-to-major
    # layout (XLA otherwise propagates the transposed layout into
    # consumers, putting the 8-limb axis in the lane dimension - a 16x
    # tile-padding blowup at 2^24)
    v = x.reshape(lead + (A, B))
    if b:
        v = jnp.swapaxes(v, -1, -2)  # lead + (B, A)
        v = passes_over_second_to_last(v, b)  # bits 0..b-1
        v = jnp.swapaxes(v, -1, -2)
    v = passes_over_second_to_last(v, a)  # bits b..bits-1 (the A axis)
    return v.reshape(lead + (n,))


@partial(jax.jit, static_argnums=())
def _to_evals_impl(coeffs):
    return _bit_passes(coeffs, ops.add)


@partial(jax.jit, static_argnums=())
def _to_coeffs_impl(evals):
    return _bit_passes(evals, ops.sub)


def to_evals(coeffs):
    """Coefficient -> evaluation form over {0,1}^n (zeta transform)."""
    return _to_evals_impl(coeffs)


def to_coeffs(evals):
    """Evaluation -> coefficient form (Moebius transform)."""
    return _to_coeffs_impl(evals)


# ---------------------------------------------------------------------------
# eq / delta tables and evaluation
# ---------------------------------------------------------------------------


# Tensor-product tables are built hybrid: exact host bigint arithmetic for
# sub-tables of <= _CHUNK_VARS variables (a few hundred multiplies), then
# O(1) big device `mul` passes to kron them together.  This keeps the
# traced graph at ~ceil(n/8) multiplies regardless of n (a naive doubling
# loop puts 2n muls in the graph and XLA compile time explodes), while all
# O(2^n) arithmetic still happens on device.
_CHUNK_VARS = 8


def _kron_mul(a, b):
    """Tensor-product combine: (8, m), (8, n) -> (8, m*n), out[i*n+j] = a[i]*b[j]."""
    m, n = a.shape[1], b.shape[1]
    from .config import pallas_enabled
    from .field import pallas_ops

    if pallas_enabled() and pallas_ops.kron_supported(m, n):
        # factors stream as tiny blocks; no HBM broadcast materialization
        return pallas_ops.kron_mul(a, b)
    aa = jnp.broadcast_to(a[:, :, None], (8, m, n))
    bb = jnp.broadcast_to(b[:, None, :], (8, m, n))
    return ops.mul(aa, bb).reshape(8, m * n)


def combine_subtables(subs):
    """Traceable left fold of sub-table tensor products: (c0 (x) c1) (x) c2 ...

    Callers that need the full table in their own jit (e.g. the fused
    sumcheck-table build) trace this directly, turning the whole delta
    construction into part of ONE program instead of one eager dispatch
    per kron level.
    """
    d = subs[0]
    for s in subs[1:]:
        d = _kron_mul(d, s)
    return d


_combine_subtables_jit = jax.jit(combine_subtables)


def factor_subtables(factors):
    """Host-built device sub-tables of <= _CHUNK_VARS variables each."""
    chunks = [factors[i : i + _CHUNK_VARS] for i in range(0, len(factors), _CHUNK_VARS)]
    return [jnp.asarray(limbs.pack_ints(_host_factor_table(c))) for c in chunks]


def delta_subtables(points):
    """Sub-tables whose tensor product is delta_table(points), or None if empty."""
    pts = [Fp(p) for p in points]
    if not pts:
        return None
    return factor_subtables([((ONE - p).v, p.v) for p in pts])


def _host_factor_table(factors):
    """Product table of per-variable (f0_j, f1_j) factor pairs, big-endian.

    factors: list of (f0, f1) int pairs; out[i] = prod_j f_{bit_j}(j) where
    points earlier in the list pair with more significant index bits.
    """
    from .field.scalar import P

    table = [1]
    for f0, f1 in factors:
        table = [v * f % P for v in table for f in (f0, f1)]
    return table


def _product_table(factors):
    """Device (8, 2^n) table from per-variable factor pairs (host ints)."""
    return _combine_subtables_jit(factor_subtables(factors))


def delta_table(points):
    """eq(points, .) over all 2^n hypercube corners, as a device limb array.

    ``points`` is a list of Fp (or ints).  Big-endian: points[0] pairs with
    the MSB of the table index - matching the reference Mask convention
    (src/constraint_system/evaluation.rs:62-70).
    """
    pts = [Fp(p) for p in points]
    if not pts:
        return jnp.zeros((8, 1), dtype=jnp.uint32).at[0, 0].set(1)
    return _product_table([((ONE - p).v, p.v) for p in pts])


def _weight_table(points):
    """Monomial weights: out[i] = prod_{bit_j(i)=1} points[j] (big-endian)."""
    pts = [Fp(p) for p in points]
    if not pts:
        return jnp.zeros((8, 1), dtype=jnp.uint32).at[0, 0].set(1)
    return _product_table([(1, p.v) for p in pts])


def evaluate_evals(evals, points):
    """Evaluate an MLE in evaluation form at an arbitrary point (device).

    ``evals``: (8, ..., 2^n) limb array; reduces the LAST axis, so a batch
    of B MLEs (8, B, 2^n) evaluates in one pass.
    Semantics of reference src/polynomials.rs:165-188.
    """
    d = delta_table(points)
    d = d.reshape((8,) + (1,) * (evals.ndim - 2) + (evals.shape[-1],))
    return ops.dot_mod(jnp.broadcast_to(d, evals.shape), evals, axis=evals.ndim - 1)


def evaluate_coeffs(coeffs, points):
    """Evaluate coefficient form at a point (reference src/polynomials.rs:126-147)."""
    pts = [Fp(p) for p in points]
    if not pts:
        return coeffs[:, 0]
    w = _weight_table(pts)
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


class MultilinearPolynomial:
    """Coefficient-form MLE wrapper (reference src/polynomials.rs:100-147).

    Thin object API over the functional kernels; ``data`` is the (8, 2^n)
    device limb array.
    """

    __slots__ = ("data",)

    def __init__(self, data):
        if not hasattr(data, "shape"):
            data = jnp.asarray(limbs.pack_ints([Fp(v).v for v in data]))
        self.data = data

    @property
    def n_vars(self) -> int:
        return self.data.shape[-1].bit_length() - 1

    def to_evaluation(self) -> "MultilinearPolynomialEvals":
        return MultilinearPolynomialEvals(to_evals(self.data))

    def evaluate(self, args) -> Fp:
        out = evaluate_coeffs(self.data, args)
        return Fp(limbs.unpack_int(np.asarray(out)))

    def coefficients(self):
        return [Fp(int(v)) for v in limbs.unpack_ints(np.asarray(self.data))]


class MultilinearPolynomialEvals:
    """Evaluation-form MLE wrapper (reference src/polynomials.rs:149-188)."""

    __slots__ = ("data",)

    def __init__(self, data):
        if not hasattr(data, "shape"):
            data = jnp.asarray(limbs.pack_ints([Fp(v).v for v in data]))
        self.data = data

    @property
    def n_vars(self) -> int:
        return self.data.shape[-1].bit_length() - 1

    def to_coefficient(self) -> "MultilinearPolynomial":
        return MultilinearPolynomial(to_coeffs(self.data))

    def evaluate(self, args) -> Fp:
        return evaluate_evals_host(self.data, args)

    def evaluations(self):
        return [Fp(int(v)) for v in limbs.unpack_ints(np.asarray(self.data))]


@lru_cache(maxsize=64)
def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def bit_reverse(x):
    """Bit-reverse permutation along the last value axis.

    Two-level form for n >= 256: with i = a*B + b, rev(i) = rev_a(b)*B' ...
    concretely ``out2d[c, d] = x2d[rev_a(d), rev_b(c)]`` - one tiled
    transpose plus two SMALL-index gathers (extent <= sqrt(n)), instead of
    a flat 2^n-element gather (~275 ms at 2^24 vs ~30 ms for the tiled
    transpose).  The trailing gather materializes a standard layout, so
    nothing transposed leaks to consumers.  Below 256 the flat device-
    computed gather is used.  Reference: src/ntt/mod.rs:113-123.
    """
    n = x.shape[-1]
    bits = n.bit_length() - 1
    if bits <= 1:
        return x
    if n >= 256:
        a = (bits + 1) // 2
        b = bits - a
        A, B = 1 << a, 1 << b
        lead = x.shape[:-1]
        y = jnp.swapaxes(x.reshape(lead + (A, B)), -1, -2)  # (B, A)
        ib = jnp.asarray(_bitrev_indices(B).astype(np.int32))
        ia = jnp.asarray(_bitrev_indices(A).astype(np.int32))
        y = jnp.take(y, ib, axis=y.ndim - 2)
        y = jnp.take(y, ia, axis=y.ndim - 1)
        return y.reshape(lead + (n,))
    iota = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.zeros_like(iota)
    for b in range(bits):
        rev = rev | (((iota >> b) & 1) << (bits - 1 - b))
    return jnp.take(x, rev, axis=x.ndim - 1)
