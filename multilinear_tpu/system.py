"""AIR-style constraint system: Expr, ConstraintSet, Trace, System.

Capability parity with reference src/constraint_system/{constraints,trace,
system}.rs.  A constraint is a plain Python callable over operator-
overloading values, so the SAME expression runs (a) vectorized over device
limb arrays inside the sumcheck partial-sum kernel (via ops.FA) and (b) on
host Fp scalars inside the verifier - mirroring the reference's
``Expr = fn(&[F], &[F]) -> F`` (constraints.rs:3-10) without duplicating
constraint definitions.

Behavioral quirks preserved for transcript parity:

* Q2 - all ChallengeSet challenges are one identical element: the reference
  builds each vector with ``vec![transcript.next_challenge(); n]`` and
  absorbs nothing in between (system.rs:131-146), and next_challenge does
  not advance the sponge (Q1).
* Q3 - the trace ``Commitment`` is a stub that never binds the trace
  (trace.rs:40-48); reproduced as :class:`Commitment` below.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .field import limbs
from .field.scalar import Fp, ZERO
from .mle import eq_scalar, evaluate_evals, mask_scalar
from .sumcheck import SumcheckTables, replay_sumcheck
from .transcript import Transcript

# An Expr takes (values, randoms) and returns a value; polymorphic over
# ops.FA device arrays and host Fp scalars.
Expr = Callable[[Sequence, Sequence], object]


@dataclass
class ConstraintSet:
    """Constraints of the form ``expr = 0`` plus their max degree.

    Reference: ConstraintSet (src/constraint_system/constraints.rs:12-34).
    """

    constraints: List[Expr]
    degree: int

    def composition_fn(self):
        """Stable two-argument composition: sum_i mask_i * C_i(cols, randoms).

        The challenges and masks arrive via the traced ``aux`` list
        (randoms first, then one mask per constraint) instead of being
        closed over - the SAME callable (and therefore the same compiled
        programs) serves every proof with this constraint set.  Cached on
        the instance so jit's static-argument key is stable.
        """
        if getattr(self, "_comp_fn", None) is None:
            cs = list(self.constraints)
            n = len(cs)

            def comp(cols, aux):
                randoms = aux[: len(aux) - n]
                masks = aux[len(aux) - n :]
                acc = None
                for expr, m in zip(cs, masks):
                    term = expr(cols, randoms) * m
                    acc = term if acc is None else acc + term
                return acc if acc is not None else ZERO

            object.__setattr__(self, "_comp_fn", comp)
        return self._comp_fn


class Trace:
    """Row-major execution trace; height must be a power of two.

    Reference: Trace (src/constraint_system/trace.rs:3-38).  Stored as host
    ints plus a lazily-built (8, w, h) device limb array of the columns.
    """

    def __init__(self, matrix: Sequence, width: int):
        vals = [Fp(v).v for v in matrix]
        assert len(vals) % width == 0
        self.width = width
        self.height = len(vals) // width
        assert self.height & (self.height - 1) == 0, "height must be a power of two"
        self.matrix = vals  # row-major canonical ints
        self._columns_dev = None

    def get(self, i: int, j: int) -> Fp:
        return Fp(self.matrix[i * self.width + j])

    def columns_device(self):
        """(8, w, h) limb array, column c at [:, c, :]."""
        if self._columns_dev is None:
            arr = np.array(self.matrix, dtype=object).reshape(self.height, self.width)
            cols = limbs.pack_ints(arr.T.reshape(-1), shape=(self.width, self.height))
            self._columns_dev = jnp.asarray(cols)
        return self._columns_dev

    def evaluate(self, points: Sequence[Fp]) -> List[Fp]:
        """MLE of every column at ``points`` (reference evaluation.rs:31-48).

        Runs as one delta-table dot product per call on device.
        """
        out = evaluate_evals(self.columns_device(), points)  # (8, w)
        vals = limbs.unpack_ints(np.asarray(out))
        return [Fp(int(v)) for v in vals]


class Commitment:
    """TODO-stub trace commitment, reproducing reference quirk Q3
    (src/constraint_system/trace.rs:40-48): never binds the trace."""

    def __init__(self, trace: Optional[Trace] = None):
        pass


@dataclass
class WitnessLayout:
    """Witness shape config (reference system.rs:17-30).

    ``pre_random_columns`` and ``sum_columns`` are scaffolding for a future
    RAP-style protocol, declared-but-unused exactly as in the reference.
    """

    columns: int
    randoms: int = 0
    pre_random_columns: int = 0
    sum_columns: List[int] = field(default_factory=list)


class ChallengeSet:
    """Row/trace/constraint challenges drawn at construction.

    Quirk Q2: each vector is n copies of ONE next_challenge() result and
    nothing is absorbed in between, so every challenge in the set is the
    same element (reference system.rs:131-146).
    """

    def __init__(
        self,
        transcript: Transcript,
        num_randoms: int,
        log_num_constraints: int,
        log_num_rows: int,
    ):
        self.row = [transcript.next_challenge()] * log_num_rows
        self.trace = [transcript.next_challenge()] * num_randoms
        self.constraint = [transcript.next_challenge()] * log_num_constraints


class System:
    """Prover/verifier context tying constraints, challenges and the trace.

    Reference: System (src/constraint_system/system.rs:8-128).
    """

    def __init__(
        self,
        transcript: Transcript,
        constraints: ConstraintSet,
        layout: WitnessLayout,
        commitment: Commitment,
        log_num_rows: int,
        trace: Optional[Trace],
    ):
        n_constraints = len(constraints.constraints)
        log_num_constraints = max(n_constraints - 1, 0).bit_length()
        self.constraints = constraints
        self.layout = layout
        self.commitment = commitment
        self.trace = trace
        self.challenges = ChallengeSet(
            transcript, layout.randoms, log_num_constraints, log_num_rows
        )
        cc = self.challenges.constraint
        self.constraint_mask = [
            mask_scalar(i, len(cc), cc) for i in range(n_constraints)
        ]

    @staticmethod
    def prover(
        transcript: Transcript,
        constraints: ConstraintSet,
        layout: WitnessLayout,
        trace: Trace,
    ) -> "System":
        log_num_rows = trace.height.bit_length() - 1
        return System(
            transcript, constraints, layout, Commitment(trace), log_num_rows, trace
        )

    @staticmethod
    def verifier(
        transcript: Transcript,
        constraints: ConstraintSet,
        layout: WitnessLayout,
        commitment: Commitment,
        log_num_rows: int,
    ) -> "System":
        return System(transcript, constraints, layout, commitment, log_num_rows, None)

    # -- composition / delta glue (reference evaluation.rs:4-29) -------------
    def evaluate_composition(self, values: Sequence) -> object:
        """sum_i mask_i * C_i(values, randoms); polymorphic (FA or Fp)."""
        assert len(values) == self.layout.columns
        randoms = self.challenges.trace
        acc = None
        for expr, mask in zip(self.constraints.constraints, self.constraint_mask):
            term = expr(values, randoms) * mask
            acc = term if acc is None else acc + term
        return acc if acc is not None else ZERO

    def evaluate_delta(self, inputs: Sequence[Fp]) -> Fp:
        return eq_scalar(self.challenges.row, inputs)

    # -- prover flow ----------------------------------------------------------
    def build_tables(self) -> SumcheckTables:
        assert self.trace is not None
        return SumcheckTables.for_trace(self.challenges.row, self.trace.columns_device())

    def compute_sumcheck_polynomials(
        self, transcript: Transcript, tables: SumcheckTables, sum_value: Fp
    ):
        return tables.compute_all_rounds(
            self.constraints.composition_fn(),
            self.constraints.degree,
            transcript,
            sum_value,
            aux=list(self.challenges.trace) + list(self.constraint_mask),
        )

    # -- verifier flow ---------------------------------------------------------
    def verify_sumcheck_debug(self, transcript: Transcript, pols, sum_value: Fp) -> None:
        """Prover-side debug verification: re-evaluates the trace MLE
        (reference sumcheck.rs:55-89)."""
        rs, final = replay_sumcheck(transcript, pols, sum_value)
        assert self.trace is not None
        output = self.trace.evaluate(rs)
        delta = self.evaluate_delta(rs)
        composition = self.evaluate_composition(output)
        if delta * composition != final:
            raise AssertionError("Does not match polynomial evaluation")

    def verify_with_evaluations(
        self, transcript: Transcript, pols, sum_value: Fp, output: Sequence[Fp]
    ) -> None:
        """Verifier-side check against claimed column evaluations
        (reference sumcheck.rs:91-124)."""
        rs, final = replay_sumcheck(
            transcript, pols, sum_value, degree=self.constraints.degree + 1
        )
        delta = self.evaluate_delta(rs)
        composition = self.evaluate_composition(list(output))
        if delta * composition != final:
            raise AssertionError("Does not match polynomial evaluation")

    # -- end-to-end SNARK (sumcheck + PCS) -------------------------------------
    def prove_snark(self, transcript: Transcript, sum_value: Fp = None) -> "SnarkProof":
        """Full proof: sumcheck over the composed constraints, then a PCS
        opening of the trace columns at the sumcheck point.

        Width-1 traces use the plain PCS - the exact reference snark_test
        flow (src/fri/multilinear_pcs.rs:279-316).  Multi-column traces use
        the batched PCS with the shared sumcheck point, which the reference
        describes as the intended tool but never wires up (SURVEY.md 3.4);
        this is a capability EXTENSION with its own transcript schedule.
        """
        from .pcs import PCSProof

        assert self.trace is not None
        sum_value = Fp(0) if sum_value is None else sum_value
        tables = self.build_tables()
        pols, randoms = self.compute_sumcheck_polynomials(transcript, tables, sum_value)
        outputs = self.trace.evaluate(randoms)
        cols = self.trace.columns_device()
        if self.trace.width == 1:
            pcs = PCSProof.prove(randoms, outputs[0], cols[:, 0, :], transcript)
        else:
            from .batched_pcs import BatchedPCSClaim, BatchedPCSProof

            claim = BatchedPCSClaim(inputs=list(randoms), outputs=list(outputs))
            pcs = BatchedPCSProof.prove(claim, cols, transcript)
        return SnarkProof(pols, list(outputs), pcs, sum_value)

    def verify_snark(self, transcript: Transcript, proof: "SnarkProof") -> None:
        """Verify a :class:`SnarkProof` (sumcheck replay + PCS verify)."""
        self.verify_with_evaluations(
            transcript, proof.sumcheck_polynomials, proof.sum_value, proof.outputs
        )
        proof.pcs.verify(transcript)


class SnarkProof:
    """Sumcheck round polynomials + claimed column evaluations + PCS proof."""

    def __init__(self, sumcheck_polynomials, outputs, pcs, sum_value: Fp):
        self.sumcheck_polynomials = sumcheck_polynomials
        self.outputs = outputs
        self.pcs = pcs
        self.sum_value = sum_value
