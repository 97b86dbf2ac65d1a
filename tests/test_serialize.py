"""Proof serialization round-trips (reference src/fri/mod.rs:367-397)."""

import jax.numpy as jnp
import pytest

from multilinear_tpu import serialize
from multilinear_tpu.batched_pcs import BatchedPCSClaim, BatchedPCSProof
from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp
from multilinear_tpu.fri import FriProof
from multilinear_tpu.mle import evaluate_evals_host
from multilinear_tpu.ntt import reed_solomon
from multilinear_tpu.pcs import PCSProof
from multilinear_tpu.transcript import Transcript


def test_fri_proof_roundtrip():
    values = [Fp(i * 7 + 3) for i in range(1 << 6)]
    code = reed_solomon(jnp.asarray(limbs.pack_ints(values)))
    proof = FriProof.prove(code, Transcript())
    buf = serialize.fri_proof_to_bytes(proof)
    back = serialize.fri_proof_from_bytes(buf)
    assert serialize.fri_proof_to_bytes(back) == buf
    back.verify()
    print(f"FRI proof size at 2^6: {len(buf)} bytes")


def test_fri_proof_truncation_rejected():
    values = [Fp(i) for i in range(1 << 5)]
    code = reed_solomon(jnp.asarray(limbs.pack_ints(values)))
    proof = FriProof.prove(code, Transcript())
    buf = serialize.fri_proof_to_bytes(proof)
    with pytest.raises(ValueError):
        serialize.fri_proof_from_bytes(buf[:-3])
    with pytest.raises(ValueError):
        serialize.fri_proof_from_bytes(buf + b"\x00")


def test_pcs_proof_roundtrip():
    n_vars = 6
    evals = [Fp(i * 3 + 5) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)
    proof = PCSProof.prove(inputs, output, dev, Transcript())
    buf = serialize.pcs_proof_to_bytes(proof)
    back = serialize.pcs_proof_from_bytes(buf)
    assert serialize.pcs_proof_to_bytes(back) == buf
    back.verify(Transcript())


def test_batched_pcs_proof_roundtrip():
    n_vars = 5
    height = 1 << n_vars
    inputs = [Fp(i + 1) for i in range(n_vars)]
    vals = [Fp(j * 2 + 1) for j in range(height)] + [Fp(j * j + 3) for j in range(height)]
    polys = jnp.asarray(limbs.pack_ints(vals, shape=(2, height)))
    outputs = [evaluate_evals_host(polys[:, i, :], inputs) for i in range(2)]
    claim = BatchedPCSClaim(inputs=inputs, outputs=outputs)
    proof = BatchedPCSProof.prove(claim, polys, Transcript())
    buf = serialize.batched_pcs_proof_to_bytes(proof)
    back = serialize.batched_pcs_proof_from_bytes(buf)
    assert serialize.batched_pcs_proof_to_bytes(back) == buf
    back.verify(Transcript())


def _snark_proof(width: int):
    from multilinear_tpu.system import (
        Commitment, ConstraintSet, System, Trace, WitnessLayout,
    )

    log_h = 6
    rows = [(i * 7 + 3) % 97 for i in range((1 << log_h) * width)]
    if width == 1:
        cs = ConstraintSet(constraints=[lambda v, r: v[0] - v[0]], degree=1)
    else:
        cs = ConstraintSet(
            constraints=[lambda v, r: v[0] + v[1] - v[0] - v[1]], degree=1
        )
    layout = WitnessLayout(columns=width)
    t = Transcript()
    prover = System.prover(t, cs, layout, Trace(rows, width))
    proof = prover.prove_snark(t)
    vt = Transcript()
    verifier = System.verifier(vt, cs, layout, Commitment(), log_h)
    return proof, verifier


def test_snark_proof_roundtrip_plain():
    proof, verifier = _snark_proof(width=1)
    buf = serialize.snark_proof_to_bytes(proof)
    back = serialize.snark_proof_from_bytes(buf)
    assert serialize.snark_proof_to_bytes(back) == buf
    vt = Transcript()
    verifier2 = verifier
    verifier2.verify_snark(vt, back)


def test_snark_proof_roundtrip_batched():
    proof, verifier = _snark_proof(width=2)
    buf = serialize.snark_proof_to_bytes(proof)
    back = serialize.snark_proof_from_bytes(buf)
    assert serialize.snark_proof_to_bytes(back) == buf
    vt = Transcript()
    verifier.verify_snark(vt, back)


def test_snark_proof_truncation_rejected():
    import struct

    proof, _ = _snark_proof(width=1)
    buf = serialize.snark_proof_to_bytes(proof)
    with pytest.raises((ValueError, struct.error)):
        serialize.snark_proof_from_bytes(buf[:-7])


def test_non_canonical_field_encoding_rejected():
    """Encodings >= p must be rejected at deserialization (malleability:
    v and v+p would otherwise replay identically)."""
    from multilinear_tpu.field.scalar import P, Fp
    from multilinear_tpu.fri import FriProof
    from multilinear_tpu.ntt import reed_solomon

    with pytest.raises(ValueError):
        Fp.from_bytes((P + 1).to_bytes(16, "little"))
    with pytest.raises(ValueError):
        Fp.from_bytes(b"\xff" * 16)

    # end-to-end: overwrite the proof's last_elem with an all-ones
    # encoding (2^128 - 1 >= p) - the parser must reject it
    code = reed_solomon(jnp.asarray(limbs.pack_ints([1, 2, 3, 4])))
    from multilinear_tpu.transcript import Transcript

    proof = FriProof.prove(code, Transcript())
    buf = bytearray(serialize.fri_proof_to_bytes(proof))
    # last 48 bytes = last_elem (16) + last_random (32)
    off = len(buf) - 48
    buf[off : off + 16] = b"\xff" * 16
    with pytest.raises(ValueError):
        serialize.fri_proof_from_bytes(bytes(buf))
