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

import jax
import jax.numpy as jnp

from ..field import ops
from ..fri import _fold_codeword
from ..sumcheck import _extensions, _fold_kernel


@jax.jit
def pcs_prover_round(data, code, twiddles, r_limbs, half_limbs):
    """One interleaved sumcheck+FRI round with challenge r.

    data: (8, 2, h) packed table (MLE column + delta column);
    code: (8, m); twiddles: (8, m/2).
    Returns (partial_sums (8, 2), folded data, folded code).
    """
    exts = _extensions(data, 2)  # s(X) at X = 1, 2
    dx = jnp.stack([e[:, 1] for e in exts], axis=1)  # (8, 2, h/2)
    mx = jnp.stack([e[:, 0] for e in exts], axis=1)
    partial_sums = ops.sum_mod(ops.mul(dx, mx), axis=2)

    new_data = _fold_kernel(data, r_limbs)
    new_code = _fold_codeword(code, twiddles, r_limbs, half_limbs)
    return partial_sums, new_data, new_code
