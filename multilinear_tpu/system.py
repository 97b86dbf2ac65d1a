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

    Reference: Trace (src/constraint_system/trace.rs:3-38).  The reference
    (and the row-major ``__init__``) hold h*w host ints, which at the
    2^24 north star is tens of GB of Python objects before the first
    kernel runs - so large traces are built with :meth:`from_columns`
    instead, which takes packed (8, w, h) limb arrays (or per-column
    uint64 numpy arrays) and never materializes host ints.
    """

    def __init__(self, matrix: Sequence, width: int):
        vals = [Fp(v).v for v in matrix]
        assert len(vals) % width == 0
        self.width = width
        self.height = len(vals) // width
        assert self.height & (self.height - 1) == 0, "height must be a power of two"
        self.matrix = vals  # row-major canonical ints
        self._columns_dev = None

    @staticmethod
    def from_columns(columns) -> "Trace":
        """Device/numpy-backed construction (no per-element host ints).

        ``columns``: an (8, w, h) uint32 limb array (canonical residues,
        device or numpy), or a sequence of w per-column arrays each either
        an (8, h) limb array or a 1-D uint64 numpy array of small values
        (packed via the vectorized limbs.pack_ints path).
        """
        import numpy as _np

        if not hasattr(columns, "shape") or getattr(columns, "ndim", 0) != 3:
            packed = []
            for col in columns:
                col = _np.asarray(col) if not hasattr(col, "ndim") else col
                if col.ndim == 2 and col.shape[0] == limbs.NLIMBS:
                    packed.append(jnp.asarray(col))
                elif col.ndim == 1:
                    packed.append(
                        jnp.asarray(limbs.pack_ints(_np.asarray(col, dtype=_np.uint64)))
                    )
                else:
                    raise ValueError(f"bad column shape {col.shape}")
            columns = jnp.stack(packed, axis=1)
        t = Trace.__new__(Trace)
        t.width = int(columns.shape[1])
        t.height = int(columns.shape[2])
        assert t.height & (t.height - 1) == 0, "height must be a power of two"
        t.matrix = None  # no host-int mirror; get() fetches on demand
        t._columns_dev = jnp.asarray(columns)
        return t

    def get(self, i: int, j: int) -> Fp:
        if self.matrix is not None:
            return Fp(self.matrix[i * self.width + j])
        v = np.asarray(self._columns_dev[:, j, i])  # (8,) limb fetch
        return Fp(limbs.unpack_int(v))

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


class SnarkProverSession:
    """Checkpointable SNARK prover (trace sumcheck, then a PCS opening).

    ``System.prove_snark`` is the one-shot wrapper; this session runs the
    two phases a few rounds at a time so a preempted prover can ``save()``
    at any round boundary and ``resume()`` in another process.  The
    sumcheck phase snapshots the trace columns, drawn challenges and fold
    state; the PCS phase delegates to :class:`pcs.PCSProverSession`
    (width 1) or :class:`batched_pcs.BatchedPCSProverSession` plus a
    ``.snark`` sidecar holding the finished sumcheck transcript pieces.
    Resumed proofs are byte-identical to uninterrupted ones (tested).

    Constraint callables cannot be serialized (same stance as the
    reference's fn-pointer Expr, src/constraint_system/constraints.rs:3-10),
    so ``resume`` takes the ConstraintSet + WitnessLayout from the caller.
    """

    def __init__(
        self,
        transcript: Transcript,
        constraints: ConstraintSet,
        layout: WitnessLayout,
        trace: Trace,
        sum_value: Fp = None,
    ):
        self.system = System.prover(transcript, constraints, layout, trace)
        self.transcript = transcript
        self.trace = trace
        self.sum_value = Fp(0) if sum_value is None else sum_value
        self.tables = self.system.build_tables()
        self.n_rounds = trace.height.bit_length() - 1
        self.k = 0
        self.previous_sum = self.sum_value
        self.pols: List = []
        self.randoms: List[Fp] = []
        self.outputs: Optional[List[Fp]] = None
        self.pcs_session = None

    # -- phase 1: trace sumcheck ------------------------------------------------
    def run_sumcheck_rounds(self, max_rounds: int = None) -> int:
        """Run up to ``max_rounds`` trace-sumcheck rounds; returns rounds done.

        Full runs (``max_rounds=None``) use the scan-tail / streamed device
        engines exactly as ``compute_all_rounds``; bounded runs step one
        host-driven round at a time to keep checkpoint boundaries exact.
        """
        from .sumcheck import _device_sc_fused, _device_sc_rounds, _device_sc_scan_tail

        comp = self.system.constraints.composition_fn()
        total_degree = self.system.constraints.degree + 1
        aux = list(self.system.challenges.trace) + list(self.system.constraint_mask)
        end = self.n_rounds if max_rounds is None else min(
            self.n_rounds, self.k + max_rounds
        )
        done = 0
        while self.k < end:
            if max_rounds is None:
                d, dev_pols, dev_randoms, prev2 = _device_sc_fused(
                    self.tables, self.transcript, self.previous_sum,
                    total_degree, comp, aux,
                )
                if not d:
                    d, dev_pols, dev_randoms, prev2 = _device_sc_scan_tail(
                        self.tables, self.transcript, self.previous_sum,
                        total_degree, comp, aux,
                    )
                if not d:
                    d, dev_pols, dev_randoms, prev2 = _device_sc_rounds(
                        self.tables, self.transcript, self.previous_sum,
                        total_degree, comp, aux,
                    )
                if d:
                    self.pols.extend(dev_pols)
                    self.randoms.extend(dev_randoms)
                    self.previous_sum = prev2
                    self.k += d
                    done += d
                    continue
            pol, r, self.previous_sum = self.tables.compute_round(
                comp, total_degree, self.previous_sum, self.transcript, aux
            )
            self.pols.append(pol)
            self.randoms.append(r)
            self.k += 1
            done += 1
        return done

    # -- phase 2: PCS opening ---------------------------------------------------
    def start_pcs(self) -> None:
        """Evaluate the trace columns at the sumcheck point and open the PCS."""
        assert self.k == self.n_rounds, "sumcheck phase not finished"
        assert self.pcs_session is None
        self.outputs = self.trace.evaluate(self.randoms)
        cols = self.trace.columns_device()
        if self.trace.width == 1:
            from .pcs import PCSProverSession

            self.pcs_session = PCSProverSession(
                self.randoms, self.outputs[0], cols[:, 0, :], self.transcript
            )
        else:
            from .batched_pcs import BatchedPCSClaim, BatchedPCSProverSession

            claim = BatchedPCSClaim(
                inputs=list(self.randoms), outputs=list(self.outputs)
            )
            self.pcs_session = BatchedPCSProverSession(claim, cols, self.transcript)

    def run_pcs_rounds(self, max_rounds: int = None) -> int:
        if self.pcs_session is None:
            self.start_pcs()
        return self.pcs_session.run_rounds(max_rounds)

    def finish(self) -> SnarkProof:
        if self.pcs_session is None:
            self.start_pcs()
        self.pcs_session.run_rounds()
        pcs = self.pcs_session.finish()
        return SnarkProof(self.pols, list(self.outputs), pcs, self.sum_value)

    # -- persistence -------------------------------------------------------------
    def save(self, path: str) -> None:
        import json

        from .checkpoint import normalize_ckpt_path, save_snark_sumcheck_state

        path = normalize_ckpt_path(path)
        if self.pcs_session is None:
            save_snark_sumcheck_state(
                path,
                self.trace.columns_device(),
                self.tables,
                self.transcript,
                self.k,
                self.previous_sum,
                self.pols,
                self.randoms,
                self.system.challenges,
                self.sum_value,
            )
            return
        self.pcs_session.save(path)
        with open(path + ".snark", "w") as f:
            json.dump(
                {
                    "width": self.trace.width,
                    "sum_value": self.sum_value.v,
                    "pols": [[c.v for c in p.nonzero_coeffs] for p in self.pols],
                    "outputs": [x.v for x in self.outputs],
                },
                f,
            )

    @staticmethod
    def resume(
        path: str, constraints: ConstraintSet, layout: WitnessLayout
    ) -> "SnarkProverSession":
        import json
        import os

        from .checkpoint import (
            load_snark_sumcheck_state,
            normalize_ckpt_path,
        )
        from .sumcheck import SumcheckPoly

        path = normalize_ckpt_path(path)
        s = SnarkProverSession.__new__(SnarkProverSession)
        if not os.path.exists(path + ".snark"):
            # sumcheck phase
            (
                trace_cols,
                s.tables,
                s.transcript,
                s.k,
                s.previous_sum,
                s.pols,
                s.randoms,
                ch,
                s.sum_value,
            ) = load_snark_sumcheck_state(path)
            s.trace = Trace.from_columns(trace_cols)
            s.n_rounds = s.trace.height.bit_length() - 1
            s.outputs = None
            s.pcs_session = None
            sys_obj = System.__new__(System)
            sys_obj.constraints = constraints
            sys_obj.layout = layout
            sys_obj.commitment = Commitment()
            sys_obj.trace = s.trace
            chs = ChallengeSet.__new__(ChallengeSet)
            chs.row, chs.trace, chs.constraint = (
                ch["row"], ch["trace"], ch["constraint"],
            )
            sys_obj.challenges = chs
            sys_obj.constraint_mask = [
                mask_scalar(i, len(chs.constraint), chs.constraint)
                for i in range(len(constraints.constraints))
            ]
            s.system = sys_obj
            return s

        # PCS phase: the trace sumcheck is complete; only the PCS session
        # and the sidecar are needed to finish
        with open(path + ".snark") as f:
            sm = json.load(f)
        if sm["width"] == 1:
            from .pcs import PCSProverSession

            s.pcs_session = PCSProverSession.resume(path)
        else:
            from .batched_pcs import BatchedPCSProverSession

            s.pcs_session = BatchedPCSProverSession.resume(path)
        s.transcript = s.pcs_session.transcript
        s.sum_value = Fp(int(sm["sum_value"]))
        s.pols = [
            SumcheckPoly([Fp(int(c)) for c in cs]) for cs in sm["pols"]
        ]
        s.outputs = [Fp(int(v)) for v in sm["outputs"]]
        s.randoms = None
        s.trace = None
        s.tables = None
        s.system = None
        s.n_rounds = s.k = len(sm["pols"])
        return s
