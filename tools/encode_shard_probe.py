"""AOT-compile the 2^24-eval encode under virtual CPU meshes (VERDICT r3 #4).

Reports per-device memory analysis and which collectives the GSPMD
partitioner placed around the four-step NTT's transposes, for each
candidate input sharding.  Informs tests/test_sharding_scale.py's pinned
assertions and whether the encode needs explicit sharding constraints.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/encode_shard_probe.py [log_n] [n_devices]
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multilinear_tpu.parallel import ROWS, make_mesh

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ndev = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mesh = make_mesh(jax.devices()[:ndev])

    from multilinear_tpu.field.scalar import pow2_generator
    from multilinear_tpu.fri import _coeffs_for_fri
    from multilinear_tpu.ntt import (
        LOG_BLOWUP,
        _ntt_fourstep_impl,
        _pow_table,
        _twiddle_factors_cached,
    )

    log_m = log_n + LOG_BLOWUP
    gen_v = pow2_generator(log_m).v
    # twiddle shapes without building the real (huge) tables
    a = (log_m + 1) // 2
    b = log_m - a
    A, B = 1 << a, 1 << b
    S = 1 << (a // 2)

    from jax.sharding import NamedSharding as NS

    def constrain(x):
        spec = P(*((None,) * (x.ndim - 1) + (ROWS,)))
        return jax.lax.with_sharding_constraint(x, NS(mesh, spec))

    def encode(evals, pows, Tc, Tf):
        padded = _coeffs_for_fri(evals)
        return _ntt_fourstep_impl(padded, pows, Tc, Tf, log_m)

    def encode_constrained(evals, pows, Tc, Tf):
        padded = constrain(_coeffs_for_fri(evals))
        return _ntt_fourstep_impl(padded, pows, Tc, Tf, log_m, constrain)

    fn = jax.jit(encode)
    fnc = jax.jit(encode_constrained)

    def sds(shape, spec):
        return jax.ShapeDtypeStruct(
            shape, jnp.uint32, sharding=NamedSharding(mesh, spec)
        )

    cases = {
        "constrained_tw_repl": (
            fnc,
            sds((8, 1 << log_n), P(None, ROWS)),
            sds((8, 1 << (log_m - 1)), P()),
            sds((8, A // S, B), P()),
            sds((8, S, B), P()),
        ),
        "evals_rows_tw_repl": (
            fn,
            sds((8, 1 << log_n), P(None, ROWS)),
            sds((8, 1 << (log_m - 1)), P()),
            sds((8, A // S, B), P()),
            sds((8, S, B), P()),
        ),
    }

    for name, (f, *args) in cases.items():
        print(f"== {name} ({ndev} devices, 2^{log_n} evals)")
        try:
            lowered = f.lower(*args)
            compiled = lowered.compile()
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        ma = compiled.memory_analysis()
        arg = ma.argument_size_in_bytes
        out = ma.output_size_in_bytes
        tmp = ma.temp_size_in_bytes
        peak = arg + out + tmp - ma.alias_size_in_bytes
        print(
            f"  arg={arg>>20} MiB out={out>>20} MiB temp={tmp>>20} MiB "
            f"alias={ma.alias_size_in_bytes>>20} MiB peak={peak>>20} MiB/dev"
        )
        out_sh = jax.tree.leaves(compiled.output_shardings)[0]
        print(f"  output replicated: {out_sh.is_fully_replicated}")
        hlo = compiled.as_text()
        colls = {}
        for op in ("all-to-all", "collective-permute", "all-gather",
                   "all-reduce", "reduce-scatter"):
            cnt = len(re.findall(re.escape(op), hlo))
            if cnt:
                colls[op] = cnt
        print(f"  collectives: {colls}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
