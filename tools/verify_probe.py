"""Profile the host PCS verifier (VERDICT round-3 item 3: verify <= 0.2 s).

First run proves once at the requested size (TPU or CPU backend), caches
the serialized proof under /tmp so later profiling iterations skip the
prove, then times verify and prints a cProfile top-20.

Run: python tools/verify_probe.py [log_n]
"""

import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    from multilinear_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    from multilinear_tpu.serialize import pcs_proof_from_bytes, pcs_proof_to_bytes
    from multilinear_tpu.transcript import Transcript

    cache = Path(f"/tmp/mlt_pcs_proof_{log_n}.bin")
    if cache.exists():
        proof = pcs_proof_from_bytes(cache.read_bytes())
        print(f"loaded cached proof ({cache}, {cache.stat().st_size} bytes)")
    else:
        import numpy as np
        import jax.numpy as jnp

        from multilinear_tpu.field import limbs
        from multilinear_tpu.field.scalar import Fp
        from multilinear_tpu.mle import evaluate_evals_host
        from multilinear_tpu.pcs import PCSProof

        h = 1 << log_n
        vals = (np.arange(h, dtype=np.uint64) * 7 + 3).tolist()
        evals = jnp.asarray(limbs.pack_ints(vals))
        evals.block_until_ready()
        inputs = [Fp(i) for i in range(log_n)]
        output = evaluate_evals_host(evals, inputs)
        t0 = time.perf_counter()
        proof = PCSProof.prove(inputs, output, evals, Transcript())
        print(f"proved in {time.perf_counter() - t0:.3f} s")
        cache.write_bytes(pcs_proof_to_bytes(proof))

    # timed runs
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        proof.verify(Transcript())
        best = min(best, time.perf_counter() - t0)
    print(f"verify 2^{log_n}: {best:.4f} s")

    pr = cProfile.Profile()
    pr.enable()
    proof.verify(Transcript())
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(22)
    print(s.getvalue())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
