"""The fused per-round prover step, as one jittable pure function.

One PCS prover round (reference call stack 3.2 in SURVEY.md: sumcheck
partial sums -> fold tables -> FRI fold) expressed as a single traced
function of arrays only - the host Fiat-Shamir driver feeds the challenge
in as a scalar limb vector.  This is the unit the driver compile-checks
single-chip (``__graft_entry__.entry``) and dry-runs over a device mesh
(``__graft_entry__.dryrun_multichip``): under row-sharded inputs XLA
lowers the partial-sum reductions to local-reduce + psum and the (i,
i+h/2) halving folds to neighbor ppermutes over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..field import ops
from ..sumcheck import _fold_kernel, _lin_ext_small
from ..fri import _fold_codeword


@jax.jit
def pcs_prover_round(matrix, delta, code, twiddles, r_limbs, half_limbs):
    """One interleaved sumcheck+FRI round with challenge r.

    matrix: (8, w, h); delta: (8, h); code: (8, m); twiddles: (8, m/2).
    Returns (partial_sums (8, 2), folded matrix/delta/code).
    """
    h = matrix.shape[-1]
    off = h // 2
    m_lo, m_hi = matrix[..., :off], matrix[..., off:]
    d_lo, d_hi = delta[..., :off], delta[..., off:]
    # round-poly evaluations s(1), s(2) for the identity composition
    sums = []
    for x in (1, 2):
        mx = _lin_ext_small(m_lo[:, 0], m_hi[:, 0], x)
        dx = _lin_ext_small(d_lo, d_hi, x)
        sums.append(ops.sum_mod(ops.mul(dx, mx), axis=1))
    partial_sums = jnp.stack(sums, axis=1)

    new_matrix, new_delta = _fold_kernel(matrix, delta, r_limbs)
    new_code = _fold_codeword(code, twiddles, r_limbs, half_limbs)
    return partial_sums, new_matrix, new_delta, new_code
