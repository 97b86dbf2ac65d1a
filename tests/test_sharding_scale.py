"""North-star-size sharding evidence (round-2 VERDICT item 7).

The GSPMD evidence at toy shapes (tests/test_gspmd_evidence.py) proves
collectives are placed; it says nothing about whether the 2^24-table /
2^25-codeword round actually FITS per device.  These tests AOT-compile the
real multi-chip round programs at the BASELINE.json north-star size under
2- and 8-device meshes (CPU devices - XLA's SPMD partitioner and memory
assignment are backend-portable) and assert:

* per-device argument bytes are a proper fraction of the global bytes
  (a replicating lowering fails);
* per-device peak memory (arguments + outputs + temporaries) fits the
  16 GB v5e HBM budget with headroom (a memory-blowing lowering fails).

Compile time is op-count-bound, not shape-bound, so compiling at full
shape costs no more than the toy-shape tests.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multilinear_tpu.parallel import ROWS, make_mesh

HBM_BYTES = 16 * 1024**3  # v5e per-chip HBM
LOG_N = 24  # north-star table size; codeword = 2^25


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


@pytest.fixture(scope="module")
def mesh2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    return make_mesh(jax.devices()[:2])


def _round_args(mesh, log_n: int):
    """ShapeDtypeStructs of one streamed-PCS-round invocation at 2^log_n."""
    h = 1 << log_n
    m = 2 * h
    shard3 = NamedSharding(mesh, P(None, None, ROWS))
    shard2 = NamedSharding(mesh, P(None, ROWS))
    rep = NamedSharding(mesh, P())

    def sds(shape, sharding):
        return jax.ShapeDtypeStruct(shape, jnp.uint32, sharding=sharding)

    data = sds((8, 2, h), shard3)
    code = sds((8, m), shard2)
    inv_pows = sds((8, m // 2), shard2)
    tr_state = (sds((8,), rep), sds((16,), rep), sds((), rep), sds((), rep))
    prev = sds((8,), rep)
    return data, code, inv_pows, tr_state, prev


def _assert_memory(compiled, mesh, global_arg_bytes: int, budget=HBM_BYTES // 2):
    ma = compiled.memory_analysis()
    arg = ma.argument_size_in_bytes
    peak = (
        ma.argument_size_in_bytes
        + ma.output_size_in_bytes
        + ma.temp_size_in_bytes
        - ma.alias_size_in_bytes
    )
    # sharded lowering: per-device arguments must be a fraction of global
    assert arg < 0.7 * global_arg_bytes, (
        f"arguments look replicated: {arg} vs global {global_arg_bytes}"
    )
    assert peak < budget, f"per-device peak {peak} exceeds budget {budget}"
    return arg, peak


def _global_arg_bytes(args) -> int:
    leaves = jax.tree.leaves(args)
    return sum(
        4 * int(jnp.prod(jnp.asarray(l.shape))) if l.shape else 4 for l in leaves
    )


@pytest.mark.slow
def test_shard_map_round_fits_8_devices_at_2pow24(mesh8):
    """The production multi-chip round (parallel/sharded_rounds.py) at the
    full 2^24-table shape on 8 devices: compiles, stays sharded, fits."""
    from multilinear_tpu.parallel.sharded_rounds import make_pcs_round

    args = _round_args(mesh8, LOG_N)
    compiled = make_pcs_round(mesh8).lower(*args, 0).compile()
    arg, peak = _assert_memory(compiled, mesh8, _global_arg_bytes(args))
    # the folded table/codeword outputs must remain sharded, not gathered
    out_sh = jax.tree.leaves(compiled.output_shardings)
    big = [s for s in out_sh[:2]]  # new_data, nxt
    for s in big:
        assert not s.is_fully_replicated, "big outputs were replicated"
    print(f"8-dev per-device arg={arg>>20} MiB peak={peak>>20} MiB")


@pytest.mark.slow
def test_gspmd_streamed_round_fits_2_devices_at_2pow23(mesh2):
    """The jnp GSPMD streamed round on a 2-device mesh at its largest
    legal shape (fused_round_max_code = 2^23 codeword elements/device):
    per-device memory fits the HBM budget."""
    from multilinear_tpu.pcs import _device_pcs_round

    args = _round_args(mesh2, 23)
    compiled = _device_pcs_round.lower(*args, 0).compile()
    arg, peak = _assert_memory(compiled, mesh2, _global_arg_bytes(args))
    print(f"2-dev per-device arg={arg>>20} MiB peak={peak>>20} MiB")


@pytest.mark.slow
def test_chunked_shard_map_round_fits_2_devices_at_2pow24(mesh2):
    """The chunked shard_map round - the round the prover actually
    dispatches at 2 devices/2^24 (per-device codeword over the fused
    budget): local C-windowed fori_loops keep the live set bounded and
    the outputs sharded, unlike the GSPMD chunked round below."""
    from multilinear_tpu.parallel.sharded_rounds import make_pcs_round

    args = _round_args(mesh2, LOG_N)
    compiled = make_pcs_round(mesh2, 1 << 22).lower(*args, 0).compile()
    # measured here: arg 1280 MiB (= global/2, sharded), out 1024 MiB
    # (sharded - the GSPMD round replicates ~2 GiB/dev), temp ~7.7 GiB,
    # alias 0.  Aliasing is structurally impossible for this round, not a
    # CPU artifact: every output (folded table (8,2,h/2), folded codeword
    # (8,m/2), tree levels) is at most HALF the byte size of any input, so
    # no donation could ever fire - which is why the round programs carry
    # no donate_argnums (round-3 VERDICT items 8/9).  The 9-10 GiB CPU-
    # measured peak is therefore the real per-device bound up to backend
    # scheduling differences.  Budget 12 GiB = comfortably under HBM AND
    # strictly tighter than the GSPMD fallback's measured 13.4 GiB.
    arg, peak = _assert_memory(
        compiled, mesh2, _global_arg_bytes(args), budget=12 * 1024**3
    )
    out_sh = jax.tree.leaves(compiled.output_shardings)
    for s in out_sh[:2]:  # new_data, nxt
        assert not s.is_fully_replicated, "big outputs were replicated"
    print(f"2-dev chunked-shard_map per-device arg={arg>>20} MiB peak={peak>>20} MiB")


@pytest.mark.slow
def test_oversized_chunked_round_fits_2_devices_at_2pow24(mesh2):
    """The GSPMD chunked oversized round at 2^24 under 2 devices - now
    only the FALLBACK (non-divisible shapes / shard_map_rounds=False);
    the prover's primary 2-device 2^24 path is the chunked shard_map
    round above.

    Measured reality (documentation of record): the GSPMD partitioning
    of the fori_loop/dynamic_slice chunk walk REPLICATES the round
    outputs (~2 GiB/device at any mesh size) and peaks at ~13.4 GiB per
    device on 2 devices - it FITS the 16 GB v5e HBM, with thin headroom.
    This measured blow-up is exactly why the chunked shard_map round
    exists; this test pins that the fallback still fits the physical
    budget."""
    from multilinear_tpu.pcs import _device_pcs_round_big

    args = _round_args(mesh2, LOG_N)
    compiled = _device_pcs_round_big.lower(*args, 0, 1 << 22).compile()
    arg, peak = _assert_memory(
        compiled, mesh2, _global_arg_bytes(args), budget=15 * 1024**3
    )
    print(f"2-dev oversized per-device arg={arg>>20} MiB peak={peak>>20} MiB")
