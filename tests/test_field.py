"""Field arithmetic: device limb kernels vs exact Python bignum model.

The reference has no field tests of its own (it delegates to winterfell);
SURVEY.md S4 calls for property tests of the limb arithmetic against Python
int arithmetic mod p, which is what these are.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from multilinear_tpu.field import limbs, ops
from multilinear_tpu.field.scalar import Fp, P, pow2_generator

rng = random.Random(0xC0FFEE)


def rand_ints(n, lo=0, hi=P - 1):
    return [rng.randint(lo, hi) for _ in range(n)]


def test_pack_roundtrip():
    vals = rand_ints(64) + [0, 1, P - 1, P - 2, (1 << 128) % P]
    arr = limbs.pack_ints(vals)
    assert arr.shape == (8, len(vals))
    back = limbs.unpack_ints(arr)
    assert list(back) == [v % P for v in vals]


def test_le_bytes_roundtrip():
    vals = rand_ints(10)
    arr = limbs.pack_ints(vals)
    b = limbs.to_le_bytes(arr)
    assert len(b) == 16 * len(vals)
    # parity with the scalar encoding (reference src/field.rs:33-38)
    for i, v in enumerate(vals):
        assert b[16 * i : 16 * i + 16] == Fp(v).to_bytes()
    back = limbs.from_le_bytes(b)
    assert list(limbs.unpack_ints(back)) == vals


@pytest.mark.parametrize("op,pyop", [
    (ops.add, lambda a, b: (a + b) % P),
    (ops.sub, lambda a, b: (a - b) % P),
    (ops.mul, lambda a, b: (a * b) % P),
])
def test_binary_ops(op, pyop):
    n = 257
    a_v = rand_ints(n) + [0, 0, P - 1, P - 1, 1]
    b_v = rand_ints(n) + [0, P - 1, P - 1, 1, P - 1]
    a = jnp.asarray(limbs.pack_ints(a_v))
    b = jnp.asarray(limbs.pack_ints(b_v))
    got = list(limbs.unpack_ints(np.asarray(op(a, b))))
    want = [pyop(x, y) for x, y in zip(a_v, b_v)]
    assert got == want


def test_neg():
    vals = rand_ints(50) + [0, 1, P - 1]
    a = jnp.asarray(limbs.pack_ints(vals))
    got = list(limbs.unpack_ints(np.asarray(ops.neg(a))))
    assert got == [(-v) % P for v in vals]


def test_mul_small():
    vals = rand_ints(50) + [0, P - 1, P - 2]
    a = jnp.asarray(limbs.pack_ints(vals))
    for k in [0, 1, 2, 3, 7, 65535]:
        got = list(limbs.unpack_ints(np.asarray(ops.mul_small(a, k))))
        assert got == [(v * k) % P for v in vals], f"k={k}"


def test_sum_mod_large():
    n = (1 << 16) + 123  # crosses the chunking threshold
    vals = [(i * i * 2654435761 + 17) % P for i in range(n)]
    a = jnp.asarray(limbs.pack_ints(vals))
    got = limbs.unpack_int(np.asarray(ops.sum_mod(a, axis=1)))
    assert got == sum(vals) % P


def test_dot_mod():
    n = 300
    a_v, b_v = rand_ints(n), rand_ints(n)
    a = jnp.asarray(limbs.pack_ints(a_v))
    b = jnp.asarray(limbs.pack_ints(b_v))
    got = limbs.unpack_int(np.asarray(ops.dot_mod(a, b)))
    assert got == sum(x * y for x, y in zip(a_v, b_v)) % P


def test_pow_const():
    g = pow2_generator(20)
    a = jnp.asarray(limbs.pack_ints([g.v, 5]))
    got = list(limbs.unpack_ints(np.asarray(ops.pow_const(a, (1 << 20) - 1))))
    assert got == [pow(g.v, (1 << 20) - 1, P), pow(5, (1 << 20) - 1, P)]


def test_scalar_field():
    a, b = Fp(rng.randint(0, P - 1)), Fp(rng.randint(0, P - 1))
    assert (a * b).v == a.v * b.v % P
    assert (a / b) * b == a
    assert (a - a).v == 0
    assert Fp(-1).v == ((1 << 128) - 1) % P  # Q4 wrap semantics
    g = pow2_generator(40)
    assert (g ** (1 << 40)).v == 1
    assert (g ** (1 << 39)).v == P - 1


def test_fa_wrapper():
    vals_a, vals_b = rand_ints(8), rand_ints(8)
    A = ops.FA(jnp.asarray(limbs.pack_ints(vals_a)))
    B = ops.FA(jnp.asarray(limbs.pack_ints(vals_b)))
    expr = lambda x, y: x * x + y * y - x * y + 3
    got = list(limbs.unpack_ints(np.asarray(expr(A, B).a)))
    want = [(a * a + b * b - a * b + 3) % P for a, b in zip(vals_a, vals_b)]
    assert got == want
