"""Checkpoint/resume: interrupted proofs resume byte-identically."""

import jax.numpy as jnp

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
