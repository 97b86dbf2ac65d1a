"""Device transcript ops vs the host transcript, bit for bit."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from multilinear_tpu import device_transcript as dt
from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp, P
from multilinear_tpu.transcript import Transcript

rng = random.Random(17)


def _digest_bytes(state):
    return np.asarray(dt.digest_words(state)).astype(">u4").tobytes()


def test_fresh_state_matches_empty_transcript():
    assert _digest_bytes(dt.fresh_state()) == Transcript().random()


def test_absorb_and_digest_parity():
    host = Transcript()
    dev = dt.fresh_state()
    for _ in range(25):
        nw = rng.choice([2, 4, 8])
        data = bytes(rng.randrange(256) for _ in range(4 * nw))
        host.absorb(data)
        words = jnp.asarray(np.frombuffer(data, dtype=">u4").astype(np.uint32))
        dev = dt.absorb_words(dev, words)
        assert _digest_bytes(dev) == host.random()


def test_challenge_parity():
    host = Transcript()
    dev = dt.fresh_state()
    for i in range(8):
        x = Fp(rng.randrange(P))
        host.absorb(x.to_bytes())
        dev = dt.absorb_field_limbs(dev, jnp.asarray(limbs.pack_scalar(x)))
        want = host.next_challenge()
        got = Fp(limbs.unpack_int(np.asarray(dt.challenge(dev))))
        assert got == want, f"challenge mismatch at step {i}"


def test_state_hopping_roundtrip():
    """host -> device -> host keeps the stream identical to staying on host."""
    host = Transcript()
    host.absorb(b"0123456789abcdef" * 3)  # 48 bytes: partial block, word-aligned
    ref = host.clone()

    dev = dt.state_from_host(host)
    dev = dt.absorb_field_limbs(dev, jnp.asarray(limbs.pack_scalar(Fp(42))))
    back = dt.state_to_host(dev)

    ref.absorb(Fp(42).to_bytes())
    assert back.random() == ref.random()
    back.absorb(b"tail")
    ref.absorb(b"tail")
    assert back.random() == ref.random()
    assert back.next_challenge() == ref.next_challenge()


def test_unaligned_midstate_rejected():
    host = Transcript()
    host.absorb(b"abc")  # 3 bytes: not word-aligned
    import pytest

    with pytest.raises(ValueError):
        dt.state_from_host(host)


def test_device_rounds_proof_bit_identical():
    """PCS proofs with on-device Fiat-Shamir rounds are byte-identical to
    the pure host-tail path."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.serialize import pcs_proof_to_bytes

    n_vars = 8
    evals = [Fp(i * 9 + 4) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i + 2) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=1 << 12))  # all-host reference
        ref = PCSProof.prove(inputs, output, dev, Transcript())
        set_config(ProverConfig(host_threshold=16))  # device rounds + device FS
        got = PCSProof.prove(inputs, output, dev, Transcript())
    finally:
        set_config(old)
    assert pcs_proof_to_bytes(got) == pcs_proof_to_bytes(ref)
    got.verify(Transcript())


def test_device_rounds_after_prior_absorbs():
    """Device rounds also work mid-protocol (non-empty transcript)."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.serialize import pcs_proof_to_bytes

    n_vars = 7
    evals = [Fp(i * 5 + 1) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i + 1) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=1 << 12))
        t1 = Transcript(); t1.absorb(Fp(777).to_bytes())
        ref = PCSProof.prove(inputs, output, dev, t1)
        set_config(ProverConfig(host_threshold=16))
        t2 = Transcript(); t2.absorb(Fp(777).to_bytes())
        got = PCSProof.prove(inputs, output, dev, t2)
        assert t1.random() == t2.random()  # transcripts end identical
    finally:
        set_config(old)
    assert pcs_proof_to_bytes(got) == pcs_proof_to_bytes(ref)


def test_round_pair_fusion_bit_identical():
    """Two-rounds-per-dispatch streaming (stream_round_pairs) produces
    byte-identical proofs to single-round dispatches."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.serialize import pcs_proof_to_bytes

    n_vars = 8
    evals = [Fp(i * 11 + 2) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i + 5) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=16, stream_round_pairs=False))
        ref = PCSProof.prove(inputs, output, dev, Transcript())
        set_config(ProverConfig(host_threshold=16, stream_round_pairs=True))
        got = PCSProof.prove(inputs, output, dev, Transcript())
    finally:
        set_config(old)
    assert pcs_proof_to_bytes(got) == pcs_proof_to_bytes(ref)
    got.verify(Transcript())


def test_chunked_big_round_path_bit_identical():
    """Oversized-round path (chunked partial sums / folds / commits, host-
    driven Fiat-Shamir) produces byte-identical proofs to the fused
    streaming path."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.serialize import pcs_proof_to_bytes

    n_vars = 8
    evals = [Fp(i * 13 + 6) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i + 3) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=16))  # streaming reference
        ref = PCSProof.prove(inputs, output, dev, Transcript())
        # force the first rounds through the STREAMED big-round path
        # (one chunked device program per round, zero host syncs)
        set_config(
            ProverConfig(
                host_threshold=16, fused_round_max_code=64, kernel_chunk=16
            )
        )
        got_streamed = PCSProof.prove(inputs, output, dev, Transcript())
        # ... and through the host-driven chunked fallback
        set_config(
            ProverConfig(
                host_threshold=16,
                fused_round_max_code=64,
                kernel_chunk=16,
                stream_oversized=False,
            )
        )
        got_host = PCSProof.prove(inputs, output, dev, Transcript())
    finally:
        set_config(old)
    assert pcs_proof_to_bytes(got_streamed) == pcs_proof_to_bytes(ref)
    assert pcs_proof_to_bytes(got_host) == pcs_proof_to_bytes(ref)
    got_streamed.verify(Transcript())
