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


def _encode_fn_and_args(mesh, log_n: int):
    """The sharded encode exactly as encode_mle_for_fri dispatches it on a
    mesh: the Moebius/bitrev/pad program pinned to a sharded output feeding
    the EXPLICIT shard_map four-step (local sub-NTTs + 3 all-to-alls), plus
    ShapeDtypeStructs at 2^log_n evals (codeword 2^{log_n+1})."""
    import jax.numpy as jnp

    from multilinear_tpu.fri import _coeffs_for_fri_impl
    from multilinear_tpu.ntt import LOG_BLOWUP, _fourstep_shard_map

    log_m = log_n + LOG_BLOWUP
    a = (log_m + 1) // 2
    b = log_m - a
    A, B = 1 << a, 1 << b
    S = 1 << (a // 2)

    def constrain(x):
        spec = P(*((None,) * (x.ndim - 1) + (ROWS,)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    fourstep = _fourstep_shard_map(mesh, log_m, False)

    def encode(evals, powsA, powsB, Tc, Tf):
        padded = constrain(_coeffs_for_fri_impl(evals))
        return fourstep(padded, powsA, powsB, Tc, Tf)

    def sds(shape, spec):
        return jax.ShapeDtypeStruct(
            shape, jnp.uint32, sharding=NamedSharding(mesh, spec)
        )

    args = (
        sds((8, 1 << log_n), P(None, ROWS)),
        sds((8, A // 2), P()),
        sds((8, B // 2), P()),
        sds((8, A // S, B), P(None, None, ROWS)),
        sds((8, S, B), P(None, None, ROWS)),
    )
    return jax.jit(encode), args


@pytest.mark.slow
def test_sharded_encode_fits_and_scales_at_2pow24(mesh8, mesh2):
    """North-star-size sharded ENCODE artifact (round-3 VERDICT item 4).

    AOT-compiles the 2^24-eval / 2^25-codeword encode (Moebius + bitrev +
    pad + four-step NTT) under 2- and 8-device meshes and pins:

    * the codeword output stays sharded (unconstrained, GSPMD replicates
      it - measured 1024 MiB/dev at every mesh size);
    * per-device peak memory fits HBM with headroom AND shrinks with mesh
      size (the unconstrained lowering was flat at ~10.8 GiB/dev for both
      2 and 8 devices - i.e. not actually distributing the transform);
    * the compiled HLO contains the expected reshard collectives around
      the four-step transposes (all-to-all / collective-permute) - the
      distributed-FFT decomposition of SURVEY section 3.5 (the loop nest
      being sharded is reference src/ntt/mod.rs:69-110).
    """
    peaks = {}
    for mesh in (mesh2, mesh8):
        fn, args = _encode_fn_and_args(mesh, LOG_N)
        compiled = fn.lower(*args).compile()
        ma = compiled.memory_analysis()
        peak = (
            ma.argument_size_in_bytes
            + ma.output_size_in_bytes
            + ma.temp_size_in_bytes
            - ma.alias_size_in_bytes
        )
        arg = ma.argument_size_in_bytes
        assert arg < 0.7 * _global_arg_bytes(args), "arguments look replicated"
        out_sh = jax.tree.leaves(compiled.output_shardings)[0]
        assert not out_sh.is_fully_replicated, "codeword output was replicated"
        hlo = compiled.as_text()
        assert ("all-to-all" in hlo) or ("collective-permute" in hlo), (
            "no reshard collective around the four-step transpose"
        )
        peaks[mesh.size] = peak
        print(f"{mesh.size}-dev encode peak={peak>>20} MiB/dev")
    # fits with headroom, and the per-device footprint actually scales down
    assert peaks[2] < 8 * 1024**3, f"2-dev peak {peaks[2]>>20} MiB"
    assert peaks[8] < 0.75 * peaks[2], (
        f"per-device peak does not scale: {peaks[8]>>20} vs {peaks[2]>>20} MiB"
    )


def _quad_composition(cols, aux=None):
    """Degree-2 width-4 constraint composition (a real SNARK-shaped row
    expression, not the identity): c0*c1 + c2 - c3."""
    return cols[0] * cols[1] + cols[2] - cols[3]


@pytest.mark.slow
def test_trace_sumcheck_round_fits_2_devices_at_2pow24x4(mesh2):
    """The streamed trace-sumcheck round (the SNARK's inner loop) at the
    BASELINE.json config-5 scale: a 2^24-row, 4-column trace (packed table
    (8, 5, 2^24) = 2.5 GiB global).  AOT under a 2-device mesh: sharded
    arguments, bounded per-device peak, sharded folded-table output."""
    import jax.numpy as jnp

    from multilinear_tpu.sumcheck import _device_sc_round

    h = 1 << LOG_N
    shard3 = NamedSharding(mesh2, P(None, None, ROWS))
    rep = NamedSharding(mesh2, P())

    def sds(shape, sharding):
        return jax.ShapeDtypeStruct(shape, jnp.uint32, sharding=sharding)

    data = sds((8, 5, h), shard3)
    tr_state = (sds((8,), rep), sds((16,), rep), sds((), rep), sds((), rep))
    prev = sds((8,), rep)
    vinv = sds((3, 3, 8), rep)
    aux = sds((0, 8), rep)
    compiled = _device_sc_round.lower(
        data, tr_state, prev, vinv, aux, 2, _quad_composition
    ).compile()
    arg, peak = _assert_memory(
        compiled, mesh2, _global_arg_bytes((data, tr_state, prev, vinv, aux)),
        budget=12 * 1024**3,
    )
    out_sh = jax.tree.leaves(compiled.output_shardings)[0]  # new_data
    assert not out_sh.is_fully_replicated, "folded table was replicated"
    print(f"2-dev trace-sc round per-device arg={arg>>20} MiB peak={peak>>20} MiB")


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
