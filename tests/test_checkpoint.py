"""Checkpoint/resume: interrupted proofs resume byte-identically."""

import jax.numpy as jnp
import pytest

from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp
from multilinear_tpu.mle import evaluate_evals_host
from multilinear_tpu.pcs import PCSProof, PCSProverSession
from multilinear_tpu.serialize import pcs_proof_to_bytes
from multilinear_tpu.transcript import Transcript


def test_resume_mid_proof_identical(tmp_path):
    n_vars = 8
    evals = [Fp(i * 13 + 7) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i + 5) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    ref = PCSProof.prove(inputs, output, dev, Transcript())

    session = PCSProverSession(inputs, output, dev, Transcript())
    session.run_rounds(max_rounds=3)
    ckpt = str(tmp_path / "mid.npz")
    session.save(ckpt)
    del session

    resumed = PCSProverSession.resume(ckpt)
    assert resumed.k == 3
    resumed.run_rounds()
    proof = resumed.finish()
    assert pcs_proof_to_bytes(proof) == pcs_proof_to_bytes(ref)
    proof.verify(Transcript())


def test_resume_with_device_tables(tmp_path):
    """Checkpoint while the tables are still device-resident."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config

    n_vars = 7
    evals = [Fp(i * 3 + 2) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i + 1) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=8))
        ref = PCSProof.prove(inputs, output, dev, Transcript())
        session = PCSProverSession(inputs, output, dev, Transcript())
        session.run_rounds(max_rounds=2)
        assert not session.tables.on_host  # device-resident at save time
        ckpt = str(tmp_path / "dev.npz")
        session.save(ckpt)
        resumed = PCSProverSession.resume(ckpt)
        resumed.run_rounds()
        proof = resumed.finish()
    finally:
        set_config(old)
    assert pcs_proof_to_bytes(proof) == pcs_proof_to_bytes(ref)


def test_save_resume_without_npz_suffix(tmp_path):
    """np.savez appends '.npz' when missing; save/resume must agree on the
    final file name either way (advisor finding, round 1)."""
    n_vars = 6
    evals = [Fp(i * 5 + 1) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i + 3) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    ref = PCSProof.prove(inputs, output, dev, Transcript())

    session = PCSProverSession(inputs, output, dev, Transcript())
    session.run_rounds(max_rounds=2)
    session.save(str(tmp_path / "noext"))  # no .npz suffix
    resumed = PCSProverSession.resume(str(tmp_path / "noext"))
    resumed.run_rounds()
    proof = resumed.finish()
    assert pcs_proof_to_bytes(proof) == pcs_proof_to_bytes(ref)


# -- batched PCS sessions (round-3 VERDICT item 7) ----------------------------


def _batched_fixture(n_vars=6, B=3):
    import jax.numpy as jnp

    from multilinear_tpu.batched_pcs import BatchedPCSClaim

    polys = jnp.stack(
        [
            jnp.asarray(limbs.pack_ints([Fp(i * 7 + b + 1) for i in range(1 << n_vars)]))
            for b in range(B)
        ],
        axis=1,
    )
    inputs = [Fp(i + 2) for i in range(n_vars)]
    outputs = [evaluate_evals_host(polys[:, b, :], inputs) for b in range(B)]
    return BatchedPCSClaim(inputs=inputs, outputs=outputs), polys


def test_batched_pcs_resume_mid_proof_identical(tmp_path):
    from multilinear_tpu.batched_pcs import BatchedPCSProof, BatchedPCSProverSession
    from multilinear_tpu.serialize import batched_pcs_proof_to_bytes

    claim, polys = _batched_fixture()
    ref = BatchedPCSProof.prove(claim, polys, Transcript())

    session = BatchedPCSProverSession(claim, polys, Transcript())
    assert session.k == 1  # round 0 (the batched fold) runs at construction
    session.run_rounds(max_rounds=2)
    ckpt = str(tmp_path / "batched.npz")
    session.save(ckpt)
    del session

    resumed = BatchedPCSProverSession.resume(ckpt)
    assert resumed.k == 3
    resumed.run_rounds()
    proof = resumed.finish()
    assert batched_pcs_proof_to_bytes(proof) == batched_pcs_proof_to_bytes(ref)
    proof.verify(Transcript())


def test_batched_pcs_resume_with_device_tables(tmp_path):
    from multilinear_tpu.batched_pcs import BatchedPCSProof, BatchedPCSProverSession
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.serialize import batched_pcs_proof_to_bytes

    claim, polys = _batched_fixture(n_vars=7, B=2)
    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=8))
        ref = BatchedPCSProof.prove(claim, polys, Transcript())
        session = BatchedPCSProverSession(claim, polys, Transcript())
        session.run_rounds(max_rounds=2)
        assert not session.tables.on_host
        ckpt = str(tmp_path / "batched_dev.npz")
        session.save(ckpt)
        resumed = BatchedPCSProverSession.resume(ckpt)
        resumed.run_rounds()
        proof = resumed.finish()
    finally:
        set_config(old)
    assert batched_pcs_proof_to_bytes(proof) == batched_pcs_proof_to_bytes(ref)


# -- SNARK sessions (both phases) ----------------------------------------------


def _snark_fixture(width):
    import numpy as np

    from multilinear_tpu.system import ConstraintSet, Trace, WitnessLayout

    log_n = 6
    base = np.arange(1 << log_n, dtype=np.uint64)
    if width == 1:
        cols = [(base * 7 + 3) % 97]
        cs = ConstraintSet(constraints=[lambda v, r: v[0] - v[0]], degree=1)
    else:
        a, b = (base * 3 + 1) % 97, (base * 4 + 2) % 97
        cols = [a, b, a * b, a + b]
        cs = ConstraintSet(
            constraints=[
                lambda v, r: v[0] * v[1] - v[2],
                lambda v, r: v[0] + v[1] - v[3],
            ],
            degree=2,
        )
    return cs, WitnessLayout(columns=width), Trace.from_columns(cols)


@pytest.mark.parametrize("width", [1, 4])
def test_snark_session_resume_both_phases(tmp_path, width):
    """Checkpoint once mid trace-sumcheck and once mid-PCS; the final proof
    must be byte-identical to an uninterrupted prove_snark and verify."""
    from multilinear_tpu.serialize import snark_proof_to_bytes
    from multilinear_tpu.system import Commitment, SnarkProverSession, System

    cs, layout, trace = _snark_fixture(width)
    tr = Transcript()
    ref = System.prover(tr, cs, layout, trace).prove_snark(tr)
    ref_bytes = snark_proof_to_bytes(ref)

    sess = SnarkProverSession(Transcript(), cs, layout, trace)
    sess.run_sumcheck_rounds(max_rounds=3)
    p1 = str(tmp_path / "snark_sc.npz")
    sess.save(p1)
    del sess

    r1 = SnarkProverSession.resume(p1, cs, layout)
    assert r1.k == 3
    r1.run_sumcheck_rounds()
    r1.start_pcs()
    r1.run_pcs_rounds(max_rounds=2)
    p2 = str(tmp_path / "snark_pcs.npz")
    r1.save(p2)
    del r1

    r2 = SnarkProverSession.resume(p2, cs, layout)
    proof = r2.finish()
    assert snark_proof_to_bytes(proof) == ref_bytes

    vt = Transcript()
    verifier = System.verifier(vt, cs, layout, Commitment(), trace.height.bit_length() - 1)
    verifier.verify_snark(vt, proof)
