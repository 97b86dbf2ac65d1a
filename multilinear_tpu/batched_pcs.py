"""Batched multilinear PCS: the same claim point for B MLEs, one proof.

Protocol parity with reference src/fri/batched_pcs.rs: the claim
(inputs then outputs) is absorbed first, batched-FRI init yields
``fingerprint_r``, the B polynomials are RLC'd EVAL-WISE into one MLE for
the sumcheck whose target sum is fingerprint(r, outputs), the first FRI
fold is batched and the rest plain, and the final link is the same
eq(inputs, randoms) * last_elem check as the plain PCS.

TPU-first: the B MLEs and their B codewords are (8, B, 2^n) device arrays;
eval-wise RLC and RS encoding are batched single passes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp

from .batched_fri import (
    BatchedFriProof,
    BatchedFriProverData,
    BatchedQueryProof,
    _fingerprint_codes,
    fingerprint,
)
from .field import limbs
from .field.scalar import Fp
from .fri import FriError, NUM_QUERIES
from .mle import bit_reverse, eq_scalar, to_coeffs
from .ntt import LOG_BLOWUP, reed_solomon
from .sumcheck import SumcheckPoly, SumcheckTables, identity_composition
from .transcript import Transcript


@dataclass
class BatchedPCSClaim:
    """Shared input point + per-polynomial outputs (reference batched_pcs.rs:31-34)."""

    inputs: List[Fp]
    outputs: List[Fp]

    def absorb_into(self, transcript: Transcript) -> None:
        for x in self.inputs:
            transcript.absorb(x.to_bytes())
        for x in self.outputs:
            transcript.absorb(x.to_bytes())


@dataclass
class BatchedPCSProof:
    """Reference BatchedPCSProof (src/fri/batched_pcs.rs:23-29)."""

    fri_proof: BatchedFriProof
    sumcheck_polynomials: List[SumcheckPoly]
    claim: BatchedPCSClaim

    @staticmethod
    def prove(claim: BatchedPCSClaim, polys, transcript: Transcript) -> "BatchedPCSProof":
        """``polys``: (8, B, 2^n) device limb array of B MLEs in eval form.

        Reference flow: src/fri/batched_pcs.rs:36-186.
        """
        _, B, height = polys.shape
        n_vars = len(claim.inputs)
        assert 1 << n_vars == height
        assert len(claim.outputs) == B
        log_domain_size = n_vars + LOG_BLOWUP

        # RS-encode every polynomial in one batched pass (coeffs bit-reversed, Q8)
        codes = reed_solomon(bit_reverse(to_coeffs(polys)))

        claim.absorb_into(transcript)
        fri_data = BatchedFriProverData.init(codes, transcript)

        # eval-wise Horner RLC of the B MLEs into one sumcheck polynomial
        from .sumcheck import HOST_THRESHOLD, _host_delta_table

        if height <= HOST_THRESHOLD():
            import numpy as np

            from . import native

            raw = limbs.to_le_bytes(np.asarray(polys))
            polys_bytes = np.frombuffer(raw, dtype=np.uint8).reshape(B, height, 16)
            rlc = native.fingerprint_rlc(polys_bytes, fri_data.fingerprint_r.v)
            tables = SumcheckTables._host_from_ints(
                [rlc], _host_delta_table(claim.inputs), 1, height
            )
        else:
            rlc_evals = _fingerprint_codes(
                polys, jnp.asarray(limbs.pack_scalar(fri_data.fingerprint_r))
            )
            tables = SumcheckTables.for_pcs(claim.inputs, rlc_evals)

        previous_sum = fingerprint(fri_data.fingerprint_r, claim.outputs)
        pols: List[SumcheckPoly] = []
        from .pcs import _device_rounds, fused_pcs_fold

        # round 0: batched fold (host-driven - it draws fingerprint-linked
        # state and hits the batch layer exactly once)
        pol, r, previous_sum = tables.round_poly(
            identity_composition, 2, previous_sum, transcript
        )
        pols.append(pol)
        tables.fold(r)
        fri_data.batched_fold_step(r, transcript)

        # rounds 1..: stream full rounds on device (Fiat-Shamir included,
        # zero per-round host sync), exactly as the plain PCS does; the
        # global FRI twiddle stride continues at k=1.  Oversized rounds
        # (program budget) run host-driven with chunked kernels, then
        # streaming resumes.
        k = 1
        while k < n_vars:
            dev_rounds, dev_pols, previous_sum = _device_rounds(
                tables, fri_data.fri_data, transcript, previous_sum, start_k=k
            )
            if dev_rounds:
                pols.extend(dev_pols)
                k += dev_rounds
                continue
            pol, r, previous_sum = tables.round_poly(
                identity_composition, 2, previous_sum, transcript
            )
            pols.append(pol)
            fused_pcs_fold(tables, fri_data.fri_data, k, r, transcript)
            k += 1
        assert fri_data.fri_data.last_element is not None

        domain_size = 1 << log_domain_size
        indices = []
        for _ in range(NUM_QUERIES):
            idx = transcript.random_index(domain_size // 2)
            indices.append(idx)
            transcript.absorb_index(idx)
        queries = fri_data.open_queries(indices)

        fri_proof = BatchedFriProof(
            batch_commitment=fri_data.batch_tree.root_bytes(),
            commitments=fri_data.fri_data.fold_roots(),
            queries=queries,
            last_elem=fri_data.fri_data.last_element,
            last_random=transcript.random(),
        )
        return BatchedPCSProof(fri_proof, pols, claim)

    def verify(self, transcript: Transcript) -> None:
        """Reference verify (src/fri/batched_pcs.rs:188-253)."""
        if len(self.fri_proof.queries) != NUM_QUERIES:
            raise FriError("wrong number of queries")
        n = len(self.fri_proof.commitments) + 1
        if n != len(self.sumcheck_polynomials) or n != len(self.claim.inputs):
            raise FriError("inconsistent proof dimensions")
        # degree-2 round polynomials, as in the plain PCS
        if any(len(p.nonzero_coeffs) != 2 for p in self.sumcheck_polynomials):
            raise FriError("sumcheck round polynomial exceeds degree bound")

        self.claim.absorb_into(transcript)
        random_elements: List[Fp] = []
        fingerprint_r = Fp(0)
        for i, pol in enumerate(self.sumcheck_polynomials):
            if i == 0:
                transcript.absorb(self.fri_proof.batch_commitment)
                fingerprint_r = transcript.next_challenge()
                transcript.absorb(fingerprint_r.to_bytes())
            else:
                transcript.absorb(self.fri_proof.commitments[i - 1])
            pol.absorb_into(transcript)
            random_elements.append(transcript.next_challenge())
        transcript.absorb(self.fri_proof.last_elem.to_bytes())

        # telescoping sumcheck replay from the fingerprinted output sum
        it = iter(self.sumcheck_polynomials)
        rit = iter(random_elements)
        sum_value = fingerprint(fingerprint_r, self.claim.outputs)
        pol = next(it).to_polynomial(sum_value)
        for sc_pol in it:
            r = next(rit)
            pol = sc_pol.to_polynomial(pol.evaluate(r))
        r = next(rit)

        delta = eq_scalar(self.claim.inputs, random_elements)
        if delta * self.fri_proof.last_elem != pol.evaluate(r):
            raise FriError("batched PCS link check failed")

        self.fri_proof.verify_queries(transcript, random_elements, fingerprint_r)
