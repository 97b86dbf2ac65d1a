"""Batched FRI: B codewords in one column-wise Merkle commitment, folded
into a single codeword by a Horner random linear combination.

Protocol parity with reference src/fri/batched_fri.rs: the batch layer
commits leaf i = H(code_0[i] || code_0[i+n/2] || code_1[i] || ...), the
transcript then yields ``fingerprint_r`` (which is absorbed back - unlike
plain challenges), the FIRST fold step operates on Horner fingerprints of
the B columns (first code gets the HIGHEST power of r, quirk Q6), and all
later steps are plain FRI.

TPU-first: the B codewords live as one (8, B, n) device array; the Horner
RLC is a fused scan over the B axis (B is small), and everything else
reuses the plain-FRI fold/commit kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .field import limbs, ops
from .field.scalar import Fp, TWO_INV, pow2_generator
from .fri import (
    FriError,
    FriProverData,
    NUM_QUERIES,
    QueryProof,
    _commit_code,
    _fold_codeword,
    _layer_inv_gens,
)
from .merkle import MerklePath, MerkleTree
from .ntt import LOG_BLOWUP, inv_gen_pows
from .transcript import Transcript


def fingerprint(r: Fp, items: Sequence[Fp]) -> Fp:
    """Horner RLC: items[0]*r^(B-1) + ... + items[B-1] (quirk Q6;
    reference src/fri/batched_fri.rs:30-38)."""
    acc = Fp(0)
    for x in items:
        acc = acc * r + x
    return acc


@jax.jit
def _fingerprint_codes(codes, r_limbs):
    """Horner RLC over axis 1: codes (8, B, n) -> (8, n)."""
    B = codes.shape[1]
    acc = codes[:, 0]
    rb = ops.broadcast_scalar(r_limbs, acc.shape[1:])
    for j in range(1, B):
        acc = ops.add(ops.mul(acc, rb), codes[:, j])
    return acc


class BatchedFriProverData:
    """Batch commitment + fingerprint challenge + inner plain-FRI state.

    Like plain FRI, small codewords live on the host (exact ints) instead
    of paying per-shape device compiles.
    """

    def __init__(self, batch_tree, fingerprint_r: Fp, codes, codes_host=None):
        self.batch_tree = batch_tree
        self.fingerprint_r = fingerprint_r
        self.fri_data = FriProverData()
        self._codes = codes  # (8, B, n) device array or None
        self._codes_host = codes_host  # list of B int lists or None
        if codes is not None:
            self._log_domain = codes.shape[-1].bit_length() - 1
        else:
            self._log_domain = len(codes_host[0]).bit_length() - 1

    @staticmethod
    def init(codes, transcript: Transcript) -> "BatchedFriProverData":
        """codes: (8, B, n) device limb array of B equal-length codewords.

        Reference init (src/fri/batched_fri.rs:41-99): batch-commit, absorb
        root, draw fingerprint_r, absorb fingerprint_r.
        """
        from .fri import HOST_THRESHOLD
        from .merkle import FieldHostTree

        _, B, n = codes.shape
        assert n & (n - 1) == 0, "code size must be a power of two"
        half = n // 2
        codes_host = None
        if n <= HOST_THRESHOLD():
            raw = limbs.to_le_bytes(np.asarray(codes))
            codes_host = np.frombuffer(raw, dtype=np.uint8).reshape(B, n, 16).copy()
            cols = []
            for j in range(B):
                cols.append(codes_host[j][:half])
                cols.append(codes_host[j][half:])
            batch_tree = FieldHostTree(cols)
            codes_dev = None
        else:
            # leaf i = code_0[i] || code_0[i+half] || code_1[i] || ...
            cols = codes.reshape(8, B, 2, half).reshape(8, 2 * B, half)
            batch_tree = MerkleTree.commit(cols)
            codes_dev = codes
        transcript.absorb(batch_tree.root_bytes())
        fingerprint_r = transcript.next_challenge()
        transcript.absorb(fingerprint_r.to_bytes())
        return BatchedFriProverData(batch_tree, fingerprint_r, codes_dev, codes_host)

    def batched_fold_step(self, r: Fp, transcript: Transcript) -> None:
        """First fold: RLC the B columns, then the k=0 fold formula
        (reference batched_fold_step, src/fri/batched_fri.rs:101-205)."""
        from .field.scalar import P

        blowup = 1 << LOG_BLOWUP
        self.fri_data._log_domain = self._log_domain
        if self._codes_host is not None:
            from . import native

            n = self._codes_host.shape[1]
            if n <= blowup:
                return
            self.fri_data._current_host = native.fingerprint_rlc(
                self._codes_host, self.fingerprint_r.v
            )
            nxt_host = self.fri_data._fold_host(0, r)
            self.fri_data._current_host = nxt_host
            half = n // 2
            if half == blowup:
                if not bool(np.all(nxt_host == nxt_host[0])):
                    raise FriError("not an RS code")
                first = Fp(int.from_bytes(nxt_host[0].tobytes(), "little"))
                self.fri_data.last_element = first
                transcript.absorb(first.to_bytes())
                return
            from .fri import _host_commit_code

            tree = _host_commit_code(nxt_host)
            self.fri_data.trees.append(tree)
            transcript.absorb(tree.root_bytes())
            return

        n = self._codes.shape[-1]
        if n <= blowup:
            return
        from .fri import _fold_codeword_k

        rlc = _fingerprint_codes(self._codes, jnp.asarray(limbs.pack_scalar(self.fingerprint_r)))
        half = n // 2
        inv_pows = inv_gen_pows(self._log_domain)
        nxt = _fold_codeword_k(
            rlc,
            inv_pows,
            jnp.asarray(limbs.pack_scalar(r)),
            jnp.asarray(limbs.pack_scalar(TWO_INV)),
            0,
        )
        self.fri_data._current = nxt
        self.fri_data._maybe_to_host()
        if half == blowup:
            ch = self.fri_data._current_host
            if ch is not None:
                if not bool(np.all(ch == ch[0])):
                    raise FriError("not an RS code")
                first = Fp(int.from_bytes(ch[0].tobytes(), "little"))
            else:
                vals = limbs.unpack_ints(np.asarray(nxt))
                first = Fp(int(vals[0]))
                if not all(int(v) == first.v for v in vals):
                    raise FriError("not an RS code")
            self.fri_data.last_element = first
            transcript.absorb(first.to_bytes())
            return
        if self.fri_data._current_host is not None:
            from .fri import _host_commit_code

            tree = _host_commit_code(self.fri_data._current_host)
        else:
            tree = _commit_code(nxt)
        self.fri_data.trees.append(tree)
        transcript.absorb(tree.root_bytes())

    @staticmethod
    def fold(codes, transcript: Transcript) -> "BatchedFriProverData":
        """init + batched first step + plain steps (reference :207-224).

        Plain steps stream on device when shapes fit, exactly like
        FriProverData.fold."""
        from .fri import _device_fri_rounds

        data = BatchedFriProverData.init(codes, transcript)
        num_steps = codes.shape[-1].bit_length() - 1 - LOG_BLOWUP
        r = transcript.next_challenge()
        data.batched_fold_step(r, transcript)
        k = 1
        while k < num_steps:
            done = _device_fri_rounds(data.fri_data, transcript)
            if done:
                k += done
                continue
            r = transcript.next_challenge()
            data.fri_data.fold_step(k, r, transcript)
            k += 1
        assert data.fri_data.last_element is not None
        return data

    def open_queries(self, indices: Sequence[int]) -> List["BatchedQueryProof"]:
        batch_paths = self.batch_tree.open_batch(indices)
        inner_n = self.batch_tree.num_leaves // 2
        inner = (
            self.fri_data.open_queries([i % inner_n for i in indices])
            if self.fri_data.trees
            else [QueryProof([]) for _ in indices]
        )
        return [BatchedQueryProof(bp, qp) for bp, qp in zip(batch_paths, inner)]

    def open_query_at(self, index: int) -> "BatchedQueryProof":
        return self.open_queries([index])[0]


@dataclass
class BatchedQueryProof:
    """Batch-layer column path + inner plain-FRI query proof."""

    batch_path: MerklePath
    query_proof: QueryProof

    def verify(
        self,
        proof: "BatchedFriProof",
        n: int,
        index: int,
        gen: Fp,
        random_elements: Sequence[Fp],
        fingerprint_r: Fp,
        inv_gens: Sequence[Fp] = None,
    ) -> None:
        """Reference BatchedQueryProof::verify (src/fri/batched_fri.rs:227-283).

        ``inv_gens``: per-layer inverse generators shared across queries
        (see fri._layer_inv_gens) - replaces the reference's per-layer
        division (one inversion per query per layer) with the identical
        value TWO_INV * inv_gen^index."""
        if len(self.query_proof.paths) != len(proof.commitments):
            raise FriError("wrong number of paths")
        if inv_gens is None:
            inv_gens = _layer_inv_gens(gen, len(proof.commitments) + 1)
        if not self.batch_path.verify(proof.batch_commitment, index):
            raise FriError("batch inclusion path failed")
        # column layout: [c0_val, c0_minus, c1_val, c1_minus, ...]
        values = self.batch_path.values[0::2]
        minus_values = self.batch_path.values[1::2]
        value = fingerprint(fingerprint_r, values)
        minus_value = fingerprint(fingerprint_r, minus_values)
        even = (value + minus_value) * TWO_INV
        odd = (value - minus_value) * TWO_INV * (inv_gens[0] ** index)
        folded = even + random_elements[0] * odd
        if not self.query_proof.paths:
            if proof.last_elem != folded:
                raise FriError("query mismatch at batch layer")
            return
        next_n = n // 2
        next_index = index % next_n
        next_path = self.query_proof.paths[0]
        next_value = next_path.values[0] if next_index == index else next_path.values[1]
        if next_value != folded:
            raise FriError("query mismatch at batch layer")
        self.query_proof.verify(
            proof.commitments,
            proof.last_elem,
            next_n,
            next_index,
            gen * gen,
            random_elements[1:],
            inv_gens=inv_gens[1:],
        )


@dataclass
class BatchedFriProof:
    """Reference BatchedFriProof (src/fri/batched_fri.rs:22-28)."""

    batch_commitment: bytes
    commitments: List[bytes]
    queries: List[BatchedQueryProof]
    last_elem: Fp
    last_random: bytes

    @staticmethod
    def prove(codes, transcript: Transcript) -> "BatchedFriProof":
        domain_size = codes.shape[-1]
        data = BatchedFriProverData.fold(codes, transcript)
        indices = []
        for _ in range(NUM_QUERIES):
            idx = transcript.random_index(domain_size // 2)
            indices.append(idx)
            transcript.absorb_index(idx)
        queries = data.open_queries(indices)
        return BatchedFriProof(
            batch_commitment=data.batch_tree.root_bytes(),
            commitments=data.fri_data.fold_roots(),
            queries=queries,
            last_elem=data.fri_data.last_element,
            last_random=transcript.random(),
        )

    def verify(self) -> None:
        """Reference verify (src/fri/batched_fri.rs:330-365)."""
        transcript = Transcript()
        transcript.absorb(self.batch_commitment)
        fingerprint_r = transcript.next_challenge()
        transcript.absorb(fingerprint_r.to_bytes())
        random_elements = [transcript.next_challenge()]
        for root in self.commitments:
            transcript.absorb(root)
            random_elements.append(transcript.next_challenge())
        transcript.absorb(self.last_elem.to_bytes())
        self.verify_queries(transcript, random_elements, fingerprint_r)

    def verify_queries(
        self,
        transcript: Transcript,
        random_elements: Sequence[Fp],
        fingerprint_r: Fp,
    ) -> None:
        if len(self.queries) != NUM_QUERIES:
            raise FriError("wrong number of queries")
        log_domain_size = len(self.commitments) + 1 + LOG_BLOWUP
        domain_size = 1 << log_domain_size
        gen = pow2_generator(log_domain_size)
        inv_gens = _layer_inv_gens(gen, len(self.commitments) + 1)
        n = domain_size // 2
        for query in self.queries:
            idx = transcript.random_index(n)
            query.verify(
                self, n, idx, gen, random_elements, fingerprint_r,
                inv_gens=inv_gens,
            )
            transcript.absorb_index(idx)
        if self.last_random != transcript.random():
            raise FriError("incompatible last_random transcript fingerprint")
