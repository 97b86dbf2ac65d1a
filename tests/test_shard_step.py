"""shard_map prover round: bit-identical to the GSPMD round on the
8-device CPU mesh, with the partial-sum psum and sharded folds intact.

On TPU the shard_map body dispatches the Pallas kernels per shard (any
mesh size) - the round-1 gap where multi-chip proving silently fell back
to jnp kernels.  CPU runs take the jnp body; bitwise parity here pins
that both bodies compute the identical function.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multilinear_tpu.field import limbs
from multilinear_tpu.parallel import hypercube_sharding, make_mesh
from multilinear_tpu.parallel.shard_step import make_sharded_round
from multilinear_tpu.parallel.step import pcs_prover_round


def _rand_limbs(rng, shape):
    a = rng.integers(0, 1 << 16, size=(8,) + shape, dtype=np.uint32)
    a[7] &= 0x7FFF
    return a


def test_sharded_round_matches_gspmd_round():
    rng = np.random.default_rng(11)
    h = 1 << 10
    mesh = make_mesh()
    data = jax.device_put(
        jnp.asarray(_rand_limbs(rng, (2, h))), hypercube_sharding(mesh, 3)
    )
    code = jax.device_put(
        jnp.asarray(_rand_limbs(rng, (2 * h,))), hypercube_sharding(mesh, 2)
    )
    tw = jax.device_put(
        jnp.asarray(_rand_limbs(rng, (h,))), hypercube_sharding(mesh, 2)
    )
    r = jnp.asarray(limbs.pack_int(123456789123456789))
    hl = jnp.asarray(limbs.pack_int(987654321987654321))

    sums_ref, data_ref, code_ref = pcs_prover_round(data, code, tw, r, hl)
    sums_got, data_got, code_got = make_sharded_round(mesh)(data, code, tw, r, hl)

    assert np.array_equal(np.asarray(sums_ref), np.asarray(sums_got))
    assert np.array_equal(np.asarray(data_ref), np.asarray(data_got))
    assert np.array_equal(np.asarray(code_ref), np.asarray(code_got))


def test_sharded_round_outputs_stay_sharded():
    rng = np.random.default_rng(12)
    h = 1 << 10
    mesh = make_mesh()
    data = jax.device_put(
        jnp.asarray(_rand_limbs(rng, (2, h))), hypercube_sharding(mesh, 3)
    )
    code = jax.device_put(
        jnp.asarray(_rand_limbs(rng, (2 * h,))), hypercube_sharding(mesh, 2)
    )
    tw = jax.device_put(
        jnp.asarray(_rand_limbs(rng, (h,))), hypercube_sharding(mesh, 2)
    )
    r = jnp.asarray(limbs.pack_int(5))
    hl = jnp.asarray(limbs.pack_int(7))
    sums, new_data, new_code = make_sharded_round(mesh)(data, code, tw, r, hl)
    # folded outputs sharded over rows; sums replicated for Fiat-Shamir
    assert new_data.sharding.spec[-1] == "rows"
    assert new_code.sharding.spec[-1] == "rows"
    assert sums.sharding.is_fully_replicated
