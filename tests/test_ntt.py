"""NTT/iNTT: bit-exact vs a Python bignum DFT model, round-trips, RS encode."""

import random

import jax.numpy as jnp
import numpy as np

from multilinear_tpu import ntt
from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp, P, pow2_generator

rng = random.Random(42)


def naive_dft(coeffs, g):
    n = len(coeffs)
    out = []
    for i in range(n):
        x = pow(g, i, P)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % P
        out.append(acc)
    return out


def test_ntt_matches_naive_dft():
    log_n = 4
    n = 1 << log_n
    coeffs = [rng.randrange(P) for _ in range(n)]
    g = pow2_generator(log_n).v
    got = list(limbs.unpack_ints(np.asarray(ntt.ntt(jnp.asarray(limbs.pack_ints(coeffs))))))
    assert got == naive_dft(coeffs, g)


def test_intt_roundtrip():
    log_n = 10
    n = 1 << log_n
    coeffs = [rng.randrange(P) for _ in range(n)]
    arr = jnp.asarray(limbs.pack_ints(coeffs))
    back = ntt.intt(ntt.ntt(arr))
    assert list(limbs.unpack_ints(np.asarray(back))) == coeffs


def test_ntt_batched():
    log_n = 3
    n = 1 << log_n
    rows = [[rng.randrange(P) for _ in range(n)] for _ in range(4)]
    arr = jnp.asarray(limbs.pack_ints([v for row in rows for v in row], shape=(4, n)))
    out = np.asarray(ntt.ntt(arr))
    g = pow2_generator(log_n).v
    for b in range(4):
        got = list(limbs.unpack_ints(out[:, b, :]))
        assert got == naive_dft(rows[b], g)


def test_reed_solomon():
    """RS code = poly evals over the 2n-domain; check rate-1/2 and values."""
    log_n = 3
    n = 1 << log_n
    coeffs = [rng.randrange(P) for _ in range(n)]
    code = np.asarray(ntt.reed_solomon(jnp.asarray(limbs.pack_ints(coeffs))))
    assert code.shape == (8, 2 * n)
    g2 = pow2_generator(log_n + 1).v
    got = list(limbs.unpack_ints(code))
    assert got == naive_dft(coeffs + [0] * n, g2)


def test_gen_pows_table():
    # tables hold the FIRST HALF of the cycle (all twiddle exponents < n/2)
    log_n = 6
    pows = np.asarray(ntt.gen_pows(log_n))
    g = pow2_generator(log_n).v
    got = list(limbs.unpack_ints(pows))
    assert got == [pow(g, i, P) for i in range(1 << (log_n - 1))]
    inv = np.asarray(ntt.inv_gen_pows(log_n))
    gi = pow(g, P - 2, P)
    assert list(limbs.unpack_ints(inv)) == [pow(gi, i, P) for i in range(1 << (log_n - 1))]
