"""Transcript golden vectors, univariate interpolation, MLE transforms."""

import hashlib

import jax.numpy as jnp
import numpy as np

from multilinear_tpu import mle
from multilinear_tpu.field import limbs, ops
from multilinear_tpu.field.scalar import Fp, P
from multilinear_tpu.poly import Polynomial, PolynomialEvals
from multilinear_tpu.transcript import Transcript


def test_transcript_empty_state_challenge():
    """Golden: challenge from the pristine transcript = SHA-256("")[:16] LE mod p."""
    t = Transcript()
    empty_digest = hashlib.sha256(b"").digest()
    want = int.from_bytes(empty_digest[:16], "little") % P
    assert t.next_challenge().v == want
    # Q1: the state did not advance - same challenge again
    assert t.next_challenge().v == want


def test_transcript_absorb_and_clone():
    t = Transcript()
    t.absorb(b"hello")
    d = hashlib.sha256(b"hello").digest()
    assert t.random() == d
    c = t.clone()
    t.absorb(b" world")
    assert c.random() == d  # clone is independent
    assert t.random() == hashlib.sha256(b"hello world").digest()
    # absorb_field uses 16 LE bytes
    t2 = Transcript()
    t2.absorb_field(Fp(0x1234))
    assert t2.random() == hashlib.sha256((0x1234).to_bytes(16, "little")).digest()


def test_interpolation_roundtrip():
    evals = PolynomialEvals([Fp(v) for v in [0, 1, 4, 8, 9, 3]])
    pol = evals.interpolate()
    assert pol.evaluate_over_domain() == evals


def test_horner():
    pol = Polynomial([Fp(3), Fp(0), Fp(2)])  # 3 + 2X^2
    assert pol.evaluate(Fp(5)).v == (3 + 2 * 25) % P


def test_mle_conversion_roundtrip():
    vals = [0, 1, 4, 8, 9, 3, 7, 2]
    evals = jnp.asarray(limbs.pack_ints(vals))
    coeffs = mle.to_coeffs(evals)
    back = mle.to_evals(coeffs)
    assert list(limbs.unpack_ints(np.asarray(back))) == vals


def test_mle_transform_model():
    """to_coeffs must equal the in-place Moebius butterfly model."""
    import random

    rng = random.Random(7)
    n_vars = 5
    vals = [rng.randrange(P) for _ in range(1 << n_vars)]
    got = limbs.unpack_ints(np.asarray(mle.to_coeffs(jnp.asarray(limbs.pack_ints(vals)))))
    model = list(vals)
    for i in range(n_vars):
        mask = 1 << i
        for j in range(1 << n_vars):
            if j & mask:
                model[j] = (model[j] - model[j ^ mask]) % P
    assert list(got) == model


def test_mle_evaluate_big_endian():
    """Evaluation convention Q8: first variable = MSB of the index."""
    n_vars = 3
    # delta: evals = one-hot at index 5 = 0b101 -> evaluate at bool point
    vals = [0] * 8
    vals[5] = 1
    evals = jnp.asarray(limbs.pack_ints(vals))
    # big-endian: index 5 bits (MSB..LSB) = 1,0,1 -> point (1,0,1)
    out = mle.evaluate_evals_host(evals, [Fp(1), Fp(0), Fp(1)])
    assert out.v == 1
    out0 = mle.evaluate_evals_host(evals, [Fp(1), Fp(0), Fp(0)])
    assert out0.v == 0


def test_mle_evaluate_vs_host_model():
    import random

    rng = random.Random(3)
    n_vars = 4
    vals = [rng.randrange(P) for _ in range(1 << n_vars)]
    pts = [Fp(rng.randrange(P)) for _ in range(n_vars)]
    evals = jnp.asarray(limbs.pack_ints(vals))
    got = mle.evaluate_evals_host(evals, pts)
    # host model: sum_i vals[i] * mask_i(points)
    want = sum((Fp(v) * mle.mask_scalar(i, n_vars, pts) for i, v in enumerate(vals)), Fp(0))
    assert got == want
    # coefficient-form evaluation agrees
    coeffs = mle.to_coeffs(evals)
    got2 = Fp(limbs.unpack_int(np.asarray(mle.evaluate_coeffs(coeffs, pts))))
    assert got2 == want


def test_delta_matches_mask():
    pts = [Fp(11), Fp(22), Fp(33)]
    tab = np.asarray(mle.delta_table(pts))
    got = list(limbs.unpack_ints(tab))
    want = [mle.mask_scalar(i, 3, pts).v for i in range(8)]
    assert got == want


def test_eq_scalar_delta():
    a = [Fp(3), Fp(4)]
    b = [Fp(5), Fp(6)]
    want = (Fp(3) * 5 + (1 - Fp(3)) * (1 - Fp(5))) * (Fp(4) * 6 + (1 - Fp(4)) * (1 - Fp(6)))
    assert mle.eq_scalar(a, b) == want


def test_bit_reverse():
    x = jnp.asarray(limbs.pack_ints(list(range(8))))
    got = list(limbs.unpack_ints(np.asarray(mle.bit_reverse(x))))
    assert got == [0, 4, 2, 6, 1, 5, 3, 7]


def test_mle_wrapper_classes():
    """Reference-style object API: to_evaluation/to_coefficient round-trip."""
    from multilinear_tpu.mle import MultilinearPolynomial, MultilinearPolynomialEvals
    from multilinear_tpu.field.scalar import Fp

    coeffs = [Fp(i * 3 + 1) for i in range(16)]
    p = MultilinearPolynomial(coeffs)
    e = p.to_evaluation()
    back = e.to_coefficient()
    assert back.coefficients() == coeffs
    args = [Fp(7), Fp(11), Fp(13), Fp(17)]
    assert p.evaluate(args) == e.evaluate(args)


def test_config_host_threshold_is_live():
    """Setting host_threshold actually changes the host/device crossover."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.sumcheck import SumcheckTables
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.field import limbs
    import jax.numpy as jnp

    evals = jnp.asarray(limbs.pack_ints([Fp(i) for i in range(1 << 5)]))
    inputs = [Fp(i + 1) for i in range(5)]
    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=1))
        t = SumcheckTables.for_pcs(inputs, evals)
        assert not t.on_host
        set_config(ProverConfig(host_threshold=1 << 12))
        t2 = SumcheckTables.for_pcs(inputs, evals)
        assert t2.on_host
    finally:
        set_config(old)


def test_benchmark_util(capsys):
    from multilinear_tpu.utils import benchmark

    with benchmark("timed: "):
        _ = sum(range(1000))
    out = capsys.readouterr().out
    assert out.startswith("timed: ") and out.strip().endswith("s")
