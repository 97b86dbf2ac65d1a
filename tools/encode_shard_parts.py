"""Decompose the sharded-encode memory footprint: AOT-compile the Moebius/
bitrev/pad stage and the constrained four-step NTT SEPARATELY under a
virtual mesh and report per-device memory + collectives for each.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/encode_shard_parts.py [log_n] [n_devices]
"""

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
    ndev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mesh = make_mesh(jax.devices()[:ndev])

    from multilinear_tpu.field.scalar import pow2_generator
    from multilinear_tpu.fri import _coeffs_for_fri_impl
    from multilinear_tpu.ntt import LOG_BLOWUP, _ntt_fourstep_impl

    log_m = log_n + LOG_BLOWUP
    gen_v = pow2_generator(log_m).v
    a = (log_m + 1) // 2
    b = log_m - a
    A, B = 1 << a, 1 << b
    S = 1 << (a // 2)

    def constrain(x):
        spec = P(*((None,) * (x.ndim - 1) + (ROWS,)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def sds(shape, spec):
        return jax.ShapeDtypeStruct(
            shape, jnp.uint32, sharding=NamedSharding(mesh, spec)
        )

    def report(name, fn, *args):
        import re

        print(f"== {name} ({ndev} devices)")
        try:
            compiled = jax.jit(fn).lower(*args).compile()
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}")
            return
        ma = compiled.memory_analysis()
        peak = (
            ma.argument_size_in_bytes
            + ma.output_size_in_bytes
            + ma.temp_size_in_bytes
            - ma.alias_size_in_bytes
        )
        print(
            f"  arg={ma.argument_size_in_bytes>>20} out={ma.output_size_in_bytes>>20}"
            f" temp={ma.temp_size_in_bytes>>20} peak={peak>>20} MiB/dev"
        )
        hlo = compiled.as_text()
        colls = {}
        for op in ("all-to-all", "collective-permute", "all-gather",
                   "all-reduce", "reduce-scatter"):
            cnt = len(re.findall(re.escape(op), hlo))
            if cnt:
                colls[op] = cnt
        print(f"  collectives: {colls}")
        shapes = {}
        for line in hlo.splitlines():
            m = re.search(r"= (\S+) (all-gather|all-to-all)\(", line)
            if m:
                shapes.setdefault((m.group(2), m.group(1)), 0)
                shapes[(m.group(2), m.group(1))] += 1
        for (op, shape), cnt in sorted(shapes.items()):
            print(f"    {op} {shape} x{cnt}")

    report(
        "coeffs (Moebius+bitrev+pad), constrained out",
        lambda ev: constrain(_coeffs_for_fri_impl(ev)),
        sds((8, 1 << log_n), P(None, ROWS)),
    )
    report(
        "fourstep constrained",
        lambda x, pows, Tc, Tf: _ntt_fourstep_impl(x, pows, Tc, Tf, log_m, constrain),
        sds((8, 1 << log_m), P(None, ROWS)),
        sds((8, 1 << (log_m - 1)), P()),
        sds((8, A // S, B), P()),
        sds((8, S, B), P()),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
