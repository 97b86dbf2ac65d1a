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
        session = BatchedPCSProverSession(claim, polys, transcript)
        session.run_rounds()
        return session.finish()

    def verify(self, transcript: Transcript) -> None:
        """Reference verify (src/fri/batched_pcs.rs:188-253)."""
        return self._verify_impl(transcript)

    def _verify_impl(self, transcript: Transcript) -> None:
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


class BatchedPCSProverSession:
    """Stage-by-stage batched-PCS prover with checkpoint/resume support.

    Mirrors :class:`pcs.PCSProverSession` for the batched protocol
    (reference src/fri/batched_pcs.rs:36-186): setup RS-encodes the B
    MLEs, commits the batch column tree, draws ``fingerprint_r`` and runs
    round 0 (the batched fold) host-driven; rounds 1.. stream on device
    exactly as the plain PCS.  ``save()`` is valid at any round boundary
    k >= 1 (the batch codewords are consumed by round 0, so only the
    batch tree + inner FRI state persist); resumed proofs are
    byte-identical to uninterrupted ones (tested).
    """

    def __init__(self, claim: BatchedPCSClaim, polys, transcript: Transcript):
        _, B, height = polys.shape
        self.claim = claim
        self.n_vars = len(claim.inputs)
        assert 1 << self.n_vars == height
        assert len(claim.outputs) == B
        self.transcript = transcript

        # RS-encode every polynomial in one batched pass (coeffs
        # bit-reversed, Q8)
        codes = reed_solomon(bit_reverse(to_coeffs(polys)))

        claim.absorb_into(transcript)
        self.bfri = BatchedFriProverData.init(codes, transcript)

        # eval-wise Horner RLC of the B MLEs into one sumcheck polynomial
        from .sumcheck import HOST_THRESHOLD, _host_delta_table

        if height <= HOST_THRESHOLD():
            import numpy as np

            from . import native

            raw = limbs.to_le_bytes(np.asarray(polys))
            polys_bytes = np.frombuffer(raw, dtype=np.uint8).reshape(B, height, 16)
            rlc = native.fingerprint_rlc(polys_bytes, self.bfri.fingerprint_r.v)
            self.tables = SumcheckTables._host_from_ints(
                [rlc], _host_delta_table(claim.inputs), 1, height
            )
        else:
            rlc_evals = _fingerprint_codes(
                polys, jnp.asarray(limbs.pack_scalar(self.bfri.fingerprint_r))
            )
            self.tables = SumcheckTables.for_pcs(claim.inputs, rlc_evals)

        self.previous_sum = fingerprint(self.bfri.fingerprint_r, claim.outputs)
        self.pols: List[SumcheckPoly] = []

        # round 0: batched fold (host-driven - it draws fingerprint-linked
        # state and hits the batch layer exactly once)
        pol, r, self.previous_sum = self.tables.round_poly(
            identity_composition, 2, self.previous_sum, transcript
        )
        self.pols.append(pol)
        self.tables.fold(r)
        self.bfri.batched_fold_step(r, transcript)
        # the batch codewords are fully consumed by round 0 (queries only
        # touch the batch tree); drop them so checkpoints and live memory
        # carry one codeword, not B+1
        self.bfri._codes = None
        self.bfri._codes_host = None
        self.k = 1

    def run_rounds(self, max_rounds: int = None) -> int:
        """Run up to ``max_rounds`` sumcheck+FRI rounds; returns rounds done.

        Rounds 1.. stream complete rounds on device (Fiat-Shamir included,
        zero per-round host sync) when running to completion; the global
        FRI twiddle stride continues at k=1.  Oversized rounds (program
        budget) run host-driven with chunked kernels, then streaming
        resumes.
        """
        from .pcs import _device_rounds, fused_pcs_fold

        end = self.n_vars if max_rounds is None else min(
            self.n_vars, self.k + max_rounds
        )
        done = 0
        while self.k < end:
            if max_rounds is None:
                dev_done, dev_pols, self.previous_sum = _device_rounds(
                    self.tables,
                    self.bfri.fri_data,
                    self.transcript,
                    self.previous_sum,
                    start_k=self.k,
                )
                if dev_done:
                    self.pols.extend(dev_pols)
                    self.k += dev_done
                    done += dev_done
                    continue
            pol, r, self.previous_sum = self.tables.round_poly(
                identity_composition, 2, self.previous_sum, self.transcript
            )
            self.pols.append(pol)
            fused_pcs_fold(self.tables, self.bfri.fri_data, self.k, r, self.transcript)
            self.k += 1
            done += 1
        return done

    def finish(self) -> "BatchedPCSProof":
        assert self.k == self.n_vars
        assert self.bfri.fri_data.last_element is not None
        transcript = self.transcript
        domain_size = 1 << (self.n_vars + LOG_BLOWUP)
        indices = []
        for _ in range(NUM_QUERIES):
            idx = transcript.random_index(domain_size // 2)
            indices.append(idx)
            transcript.absorb_index(idx)
        queries = self.bfri.open_queries(indices)

        fri_proof = BatchedFriProof(
            batch_commitment=self.bfri.batch_tree.root_bytes(),
            commitments=self.bfri.fri_data.fold_roots(),
            queries=queries,
            last_elem=self.bfri.fri_data.last_element,
            last_random=transcript.random(),
        )
        return BatchedPCSProof(fri_proof, self.pols, self.claim)

    # -- persistence -----------------------------------------------------------
    def save(self, path: str) -> None:
        import json

        from .checkpoint import normalize_ckpt_path, save_batched_pcs_state

        path = normalize_ckpt_path(path)
        save_batched_pcs_state(
            path,
            self.tables,
            self.bfri,
            self.transcript,
            self.k,
            self.previous_sum,
            self.pols,
        )
        with open(path + ".claim", "w") as f:
            json.dump(
                {
                    "inputs": [x.v for x in self.claim.inputs],
                    "outputs": [x.v for x in self.claim.outputs],
                },
                f,
            )

    @staticmethod
    def resume(path: str) -> "BatchedPCSProverSession":
        import json

        from .checkpoint import load_batched_pcs_state, normalize_ckpt_path

        path = normalize_ckpt_path(path)
        s = BatchedPCSProverSession.__new__(BatchedPCSProverSession)
        (
            s.tables,
            s.bfri,
            s.transcript,
            s.k,
            s.previous_sum,
            s.pols,
        ) = load_batched_pcs_state(path)
        with open(path + ".claim") as f:
            claim = json.load(f)
        s.claim = BatchedPCSClaim(
            inputs=[Fp(int(v)) for v in claim["inputs"]],
            outputs=[Fp(int(v)) for v in claim["outputs"]],
        )
        s.n_vars = len(s.claim.inputs)
        return s
