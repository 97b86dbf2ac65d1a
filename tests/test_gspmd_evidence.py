"""Evidence that GSPMD PARTITIONS the prover rather than replicating it.

Round-1 gap: the parallel tests pinned bit-identical outputs but a
degenerate all-gather-to-one-device lowering would have passed them.
These tests compile the fused prover round under the 8-device mesh and
assert on the COMPILED artifact itself:

* collective ops appear in the optimized HLO - all-reduce for the
  partial-sum psum, collective-permute for the (i, i+h/2) halving folds
  that pair elements across the MSB-sharded boundary;
* per-device argument bytes are ~1/8 of the global operand footprint;
* the folded outputs STAY sharded on the rows axis (no gather-to-one).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multilinear_tpu.parallel import ROWS, hypercube_sharding, make_mesh
from multilinear_tpu.parallel.step import pcs_prover_round


def _compiled_round(h: int):
    mesh = make_mesh()
    data = jax.device_put(jnp.zeros((8, 2, h), jnp.uint32), hypercube_sharding(mesh, 3))
    code = jax.device_put(jnp.zeros((8, 2 * h), jnp.uint32), hypercube_sharding(mesh, 2))
    tw = jax.device_put(jnp.zeros((8, h), jnp.uint32), hypercube_sharding(mesh, 2))
    r = jnp.zeros((8,), jnp.uint32)
    hl = jnp.zeros((8,), jnp.uint32)
    return pcs_prover_round.lower(data, code, tw, r, hl).compile(), (data, code, tw, r, hl)


def test_collectives_present_in_compiled_hlo():
    compiled, _ = _compiled_round(1 << 12)
    txt = compiled.as_text()
    assert txt.count("all-reduce") >= 1, "no psum for the sharded partial sums"
    assert txt.count("collective-permute") >= 1, (
        "no neighbor exchange for the cross-shard halving folds"
    )


def test_per_device_memory_is_sharded():
    h = 1 << 12
    compiled, args = _compiled_round(h)
    global_bytes = sum(a.nbytes for a in args)
    per_device = compiled.memory_analysis().argument_size_in_bytes
    # a replicating lowering would hold the full operands on every device;
    # a sharded one holds ~1/8 (plus the two (8,) scalars)
    assert per_device < 0.2 * global_bytes, (per_device, global_bytes)

    # and the INPUT placement itself is 1/8 per device
    data = args[0]
    assert data.addressable_shards[0].data.shape == (8, 2, h // 8)


def test_streamed_round_pair_partitions():
    """The fused two-round streaming program (the default streamed path)
    also partitions under the mesh: collectives present, per-device
    argument bytes ~1/8 of global."""
    from multilinear_tpu import device_transcript as dtr
    from multilinear_tpu.pcs import _device_pcs_round2

    mesh = make_mesh()
    h = 1 << 12
    data = jax.device_put(
        jnp.zeros((8, 2, h), jnp.uint32), hypercube_sharding(mesh, 3)
    )
    code = jax.device_put(
        jnp.zeros((8, 2 * h), jnp.uint32), hypercube_sharding(mesh, 2)
    )
    inv_pows = jax.device_put(
        jnp.zeros((8, h), jnp.uint32), hypercube_sharding(mesh, 2)
    )
    tr = dtr.fresh_state()
    prev = jnp.zeros((8,), jnp.uint32)
    compiled = _device_pcs_round2.lower(
        data, code, inv_pows, tr, prev, 0
    ).compile()
    txt = compiled.as_text()
    assert txt.count("all-reduce") >= 1
    assert txt.count("collective-permute") >= 1
    global_bytes = data.nbytes + code.nbytes + inv_pows.nbytes
    per_device = compiled.memory_analysis().argument_size_in_bytes
    assert per_device < 0.2 * global_bytes, (per_device, global_bytes)


def test_folded_outputs_stay_sharded():
    compiled, _ = _compiled_round(1 << 12)
    sums_sh, data_sh, code_sh = compiled.output_shardings
    assert data_sh.spec == P(None, None, ROWS)
    assert code_sh.spec == P(None, ROWS)
    # the (8, 2) partial sums are replicated - every host needs them for
    # the Fiat-Shamir transcript
    assert sums_sh.spec == P()
