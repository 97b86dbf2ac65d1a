"""Batched FRI, batched PCS, and the end-to-end SNARK flow.

Covers reference tests batched_fri_verify_test / batched_fri_benchmark
(src/fri/batched_fri.rs:406-479), batched_pcs_verify_test
(src/fri/batched_pcs.rs:261-306) and snark_test
(src/fri/multilinear_pcs.rs:279-316) at reduced sizes.
"""

import jax.numpy as jnp
import pytest

from multilinear_tpu.batched_fri import BatchedFriProof, fingerprint
from multilinear_tpu.batched_pcs import BatchedPCSClaim, BatchedPCSProof
from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp
from multilinear_tpu.fri import FriError
from multilinear_tpu.mle import evaluate_evals_host
from multilinear_tpu.ntt import reed_solomon
from multilinear_tpu.pcs import PCSProof
from multilinear_tpu.system import Commitment, ConstraintSet, System, Trace, WitnessLayout
from multilinear_tpu.transcript import Transcript


def _device(vals, shape=None):
    return jnp.asarray(limbs.pack_ints(vals, shape=shape))


def test_fingerprint_horner_order():
    """Quirk Q6: first item gets the highest power of r."""
    r = Fp(10)
    assert fingerprint(r, [Fp(1), Fp(2), Fp(3)]) == Fp(123)


def test_batched_fri_single_code():
    """Reference batched_fri_verify_test: one code at 2^4."""
    log_n = 4
    values = [Fp(i * 7 + 3) for i in range(1 << log_n)]
    codes = reed_solomon(_device(values).reshape(8, 1, -1))
    proof = BatchedFriProof.prove(codes, Transcript())
    proof.verify()


def test_batched_fri_four_codes():
    """Reference batched_fri_benchmark shape: 4 codes at 2^6."""
    log_n = 6
    vals = []
    for j in range(4):
        vals.extend(Fp((i * 7 + 3) + j * 100) for i in range(1 << log_n))
    codes = reed_solomon(_device(vals, shape=(4, 1 << log_n)))
    proof = BatchedFriProof.prove(codes, Transcript())
    assert len(proof.queries) == 128
    proof.verify()


def test_batched_fri_rejects_corruption():
    log_n = 5
    vals = []
    for j in range(3):
        vals.extend(Fp(i + j * 31) for i in range(1 << log_n))
    codes = reed_solomon(_device(vals, shape=(3, 1 << log_n)))
    proof = BatchedFriProof.prove(codes, Transcript())

    import copy

    bad = copy.deepcopy(proof)
    bad.queries[3].batch_path.values[0] = bad.queries[3].batch_path.values[0] + Fp(1)
    with pytest.raises(FriError):
        bad.verify()

    bad2 = copy.deepcopy(proof)
    bad2.batch_commitment = bytes(32)
    with pytest.raises(FriError):
        bad2.verify()


def test_batched_pcs_roundtrip():
    """Reference batched_pcs_verify_test semantics: 5 polys at n_vars=7."""
    n_vars = 7
    height = 1 << n_vars
    num_polys = 5
    inputs = [Fp(i) for i in range(n_vars)]

    all_vals = []
    for i in range(num_polys):
        all_vals.extend(Fp((j * 3 + i * 5) % 100) for j in range(height))
    polys = _device(all_vals, shape=(num_polys, height))
    outputs = [
        evaluate_evals_host(polys[:, i, :], inputs) for i in range(num_polys)
    ]

    claim = BatchedPCSClaim(inputs=inputs, outputs=outputs)
    proof = BatchedPCSProof.prove(claim, polys, Transcript())
    assert len(proof.sumcheck_polynomials) == n_vars
    proof.verify(Transcript())


def test_batched_pcs_rejects_wrong_output():
    n_vars = 5
    height = 1 << n_vars
    inputs = [Fp(i + 1) for i in range(n_vars)]
    vals = [Fp(j * j + 7) for j in range(height)] + [Fp(j * 5 + 1) for j in range(height)]
    polys = _device(vals, shape=(2, height))
    outputs = [evaluate_evals_host(polys[:, i, :], inputs) for i in range(2)]
    claim = BatchedPCSClaim(inputs=inputs, outputs=[outputs[0], outputs[1] + Fp(1)])
    proof = BatchedPCSProof.prove(claim, polys, Transcript())
    with pytest.raises((FriError, AssertionError)):
        proof.verify(Transcript())


def test_snark_end_to_end():
    """Reference snark_test: System + sumcheck + PCS, width-1 trace."""
    total_log_height = 8
    base = [3, 5, 8, 7, 20, 12, 9, 28, 11, 16, 33, 48, 13, 36, 39, 65]
    rows = base[:]
    while len(rows) < (1 << total_log_height):
        rows = rows + rows
    trace = Trace(rows, 1)
    constraints = ConstraintSet(constraints=[lambda v, r: Fp(0)], degree=1)
    layout = WitnessLayout(columns=1)

    prover_transcript = Transcript()
    prover = System.prover(prover_transcript, constraints, layout, trace)
    tables = prover.build_tables()
    pols, inputs = prover.compute_sumcheck_polynomials(prover_transcript, tables, Fp(0))
    evals_dev = trace.columns_device()[:, 0, :]
    output = evaluate_evals_host(evals_dev, inputs)
    pcs_proof = PCSProof.prove(inputs, output, evals_dev, prover_transcript)

    verifier_transcript = Transcript()
    verifier = System.verifier(
        verifier_transcript, constraints, layout, Commitment(), total_log_height
    )
    verifier.verify_with_evaluations(verifier_transcript, pols, Fp(0), [pcs_proof.output])
    pcs_proof.verify(verifier_transcript)


def test_snark_driver_width1():
    """System.prove_snark / verify_snark convenience on a width-1 trace."""
    rows = [3, 5, 8, 7, 20, 12, 9, 28, 11, 16, 33, 48, 13, 36, 39, 65] * 8
    trace = Trace(rows, 1)
    constraints = ConstraintSet(constraints=[lambda v, r: Fp(0)], degree=1)
    layout = WitnessLayout(columns=1)

    pt = Transcript()
    prover = System.prover(pt, constraints, layout, trace)
    proof = prover.prove_snark(pt)

    vt = Transcript()
    verifier = System.verifier(vt, constraints, layout, Commitment(), 7)
    verifier.verify_snark(vt, proof)


def test_snark_driver_multicolumn():
    """EXTENSION beyond the reference: a multi-column trace proved end to
    end via sumcheck + batched PCS at the shared sumcheck point."""
    base = [
        3, 4, 5, 7, 5, 12, 13, 17, 8, 15, 17, 23, 7, 24, 25, 31,
        20, 21, 29, 41, 12, 35, 37, 47, 9, 40, 41, 49, 28, 45, 53, 73,
        11, 60, 61, 71, 16, 63, 65, 79, 33, 56, 65, 89, 48, 55, 73, 103,
        13, 84, 85, 97, 36, 77, 85, 113, 39, 80, 89, 119, 65, 72, 97, 137,
    ]
    rows = base * 4  # 64 rows x 4 columns
    trace = Trace(rows, 4)
    constraints = ConstraintSet(
        constraints=[
            lambda v, r: v[0] * v[0] + v[1] * v[1] - v[2] * v[2],
            lambda v, r: v[0] + v[1] - v[3],
        ],
        degree=2,
    )
    layout = WitnessLayout(columns=4)

    pt = Transcript()
    prover = System.prover(pt, constraints, layout, trace)
    proof = prover.prove_snark(pt)

    vt = Transcript()
    verifier = System.verifier(vt, constraints, layout, Commitment(), 6)
    verifier.verify_snark(vt, proof)

    # corrupting a claimed output must fail
    vt2 = Transcript()
    verifier2 = System.verifier(vt2, constraints, layout, Commitment(), 6)
    proof.outputs[1] = proof.outputs[1] + Fp(1)
    with pytest.raises((AssertionError, FriError)):
        verifier2.verify_snark(vt2, proof)


def test_batched_pcs_full_transcript_matches_golden():
    """The entire batched-PCS transcript - batch root, fold roots, round
    polys, last element, final state - matches the scalar golden model."""
    import golden_model as gm

    n_vars = 5
    height = 1 << n_vars
    B = 3
    inputs = [Fp(i + 4) for i in range(n_vars)]
    vals = []
    for j in range(B):
        vals.extend(Fp((i * 7 + j * 13 + 1)) for i in range(height))
    polys = _device(vals, shape=(B, height))
    outputs = [evaluate_evals_host(polys[:, i, :], inputs) for i in range(B)]

    claim = BatchedPCSClaim(inputs=inputs, outputs=outputs)
    transcript = Transcript()
    proof = BatchedPCSProof.prove(claim, polys, transcript)

    gt = gm.GoldenTranscript()
    g_polys = [[Fp((i * 7 + j * 13 + 1)).v for i in range(height)] for j in range(B)]
    batch_root, roots, pols, last_elem, final_state = gm.batched_pcs_prove(
        [x.v for x in inputs], g_polys, gt
    )
    assert proof.fri_proof.batch_commitment == batch_root
    assert proof.fri_proof.commitments == roots
    assert [[c.v for c in p.nonzero_coeffs] for p in proof.sumcheck_polynomials] == pols
    assert proof.fri_proof.last_elem.v == last_elem
    assert proof.fri_proof.last_random == final_state
    assert transcript.random() == final_state


def test_batched_pcs_device_rounds_bit_identical():
    """Batched PCS with streaming device rounds == pure host-tail path,
    byte for byte (device Fiat-Shamir + start_k=1 twiddle stride)."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.serialize import batched_pcs_proof_to_bytes

    n_vars = 7
    height = 1 << n_vars
    B = 3
    inputs = [Fp(i + 4) for i in range(n_vars)]
    vals = []
    for j in range(B):
        vals.extend(Fp(i * 11 + j * 17 + 2) for i in range(height))
    polys = _device(vals, shape=(B, height))
    from multilinear_tpu.mle import evaluate_evals_host

    outputs = [evaluate_evals_host(polys[:, j], inputs) for j in range(B)]

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=1 << 12))  # all-host reference
        ref = BatchedPCSProof.prove(
            BatchedPCSClaim(list(inputs), list(outputs)), polys, Transcript()
        )
        set_config(ProverConfig(host_threshold=16))  # device rounds + device FS
        got = BatchedPCSProof.prove(
            BatchedPCSClaim(list(inputs), list(outputs)), polys, Transcript()
        )
    finally:
        set_config(old)
    assert batched_pcs_proof_to_bytes(got) == batched_pcs_proof_to_bytes(ref)
    got.verify(Transcript())
