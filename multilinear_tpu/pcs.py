"""FRI-based multilinear polynomial commitment scheme (PCS).

Proves p(inputs) = output for one MLE by running sumcheck over
sum_x eq(inputs, x) * p(x) = output while folding the Reed-Solomon
codeword of p with the SAME per-round challenge - each sumcheck challenge
doubles as the FRI fold challenge (reference src/fri/multilinear_pcs.rs).

Wire/transcript schedule (must match the reference bit-for-bit):
  absorb(root_0);
  per round k: absorb(round-poly nonzero coeffs), r_k = challenge,
               fold sumcheck tables AND FRI codeword with r_k,
               absorb(root_{k+1}) (or last_elem on the final round);
  then 128 queries as plain FRI.

The final verifier link: eq(inputs, randoms) * last_elem == s_last(r_last)
(reference multilinear_pcs.rs:179-184).

Device work per round: one fused partial-sum kernel + two fold kernels +
one Merkle layer hash; the host only sees O(1) field elements per round.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp

from .field import limbs
from .field.scalar import Fp, TWO_INV
from .fri import (
    FriError,
    FriProof,
    FriProverData,
    HOST_THRESHOLD,
    NUM_QUERIES,
    QueryProof,
    _fold_and_commit,
    encode_mle_for_fri,
)
from .merkle import MerkleTree
from .mle import eq_scalar
from .ntt import LOG_BLOWUP, inv_gen_pows
from .sumcheck import SumcheckPoly, SumcheckTables, _fold_kernel, identity_composition
from .transcript import Transcript


@jax.jit
def _pcs_round_tail(data, code, twiddles, r_limbs, half_limbs):
    """Everything after the challenge, in ONE device dispatch: fold the
    packed sumcheck table, fold the codeword, hash the next Merkle tree."""
    new_data = _fold_kernel(data, r_limbs)
    nxt, pairs, layers = _fold_and_commit(code, twiddles, r_limbs, half_limbs)
    return new_data, nxt, pairs, layers


def fused_pcs_fold(tables: SumcheckTables, fri_data: FriProverData, k: int, r: Fp, transcript: Transcript) -> None:
    """Fold sumcheck tables + FRI codeword with the shared challenge r.

    Uses the single-dispatch fused kernel while both live on device and
    the next layer is committed on device; falls back to the separate
    paths near the host-threshold tail.
    """
    blowup = 1 << LOG_BLOWUP
    if not tables.on_host and fri_data._current_host is None:
        m = fri_data._current.shape[-1]
        half = m // 2
        if half > blowup and half > HOST_THRESHOLD():
            inv_pows = inv_gen_pows(fri_data._log_domain)
            tw = inv_pows[:, :: 1 << k][:, :half]
            new_data, nxt, pairs, layers = _pcs_round_tail(
                tables.data,
                fri_data._current,
                tw,
                jnp.asarray(limbs.pack_scalar(r)),
                jnp.asarray(limbs.pack_scalar(TWO_INV)),
            )
            tables.apply_folded(new_data)
            fri_data._current = nxt
            tree = MerkleTree(list(layers), pairs)
            fri_data.trees.append(tree)
            transcript.absorb(tree.root_bytes())
            return
    tables.fold(r)
    fri_data.fold_step(k, r, transcript)


@dataclass
class PCSProof:
    """FRI proof + sumcheck round polynomials + the claim
    (reference PCSProof, src/fri/multilinear_pcs.rs:79-87)."""

    fri_proof: FriProof
    sumcheck_polynomials: List[SumcheckPoly]
    inputs: List[Fp]
    output: Fp

    @staticmethod
    def prove(inputs: Sequence[Fp], output: Fp, evals, transcript: Transcript) -> "PCSProof":
        """``evals``: the MLE in evaluation form, (8, 2^n) device limb array.

        Reference flow: src/fri/multilinear_pcs.rs:89-136.
        """
        inputs = [Fp(x) for x in inputs]
        n_vars = len(inputs)
        height = evals.shape[-1]
        assert 1 << n_vars == height
        log_domain_size = n_vars + LOG_BLOWUP

        code = encode_mle_for_fri(evals)
        fri_data = FriProverData.init(code, transcript)
        tables = SumcheckTables.for_pcs(inputs, evals)

        num_steps = n_vars
        previous_sum = Fp(output)
        pols: List[SumcheckPoly] = []
        for k in range(num_steps):
            pol, r, previous_sum = tables.round_poly(
                identity_composition, 2, previous_sum, transcript
            )
            pols.append(pol)
            fused_pcs_fold(tables, fri_data, k, r, transcript)
        assert fri_data.last_element is not None

        domain_size = 1 << log_domain_size
        indices = []
        for _ in range(NUM_QUERIES):
            idx = transcript.random_index(domain_size // 2)
            indices.append(idx)
            transcript.absorb_index(idx)
        queries = fri_data.open_queries(indices)

        fri_proof = FriProof(
            commitments=fri_data.fold_roots(),
            queries=queries,
            last_elem=fri_data.last_element,
            last_random=transcript.random(),
        )
        return PCSProof(fri_proof, pols, list(inputs), Fp(output))

    def verify(self, transcript: Transcript) -> None:
        """Replay the interleaved transcript, telescope the sumcheck, check
        the eq-link, then verify FRI queries (reference
        src/fri/multilinear_pcs.rs:138-190)."""
        if len(self.fri_proof.queries) != NUM_QUERIES:
            raise FriError("wrong number of queries")
        n = len(self.fri_proof.commitments)
        if n != len(self.sumcheck_polynomials) or n != len(self.inputs):
            raise FriError("inconsistent proof dimensions")

        random_elements: List[Fp] = []
        for root, pol in zip(self.fri_proof.commitments, self.sumcheck_polynomials):
            transcript.absorb(root)
            pol.absorb_into(transcript)
            random_elements.append(transcript.next_challenge())
        transcript.absorb(self.fri_proof.last_elem.to_bytes())

        # telescoping sumcheck replay
        it = iter(self.sumcheck_polynomials)
        rit = iter(random_elements)
        pol = next(it).to_polynomial(self.output)
        for sc_pol in it:
            r = next(rit)
            pol = sc_pol.to_polynomial(pol.evaluate(r))
        r = next(rit)

        delta = eq_scalar(self.inputs, random_elements)
        if delta * self.fri_proof.last_elem != pol.evaluate(r):
            raise FriError("PCS link check failed: eq * last_elem != s_last(r)")

        self.fri_proof.verify_queries(transcript, random_elements)
