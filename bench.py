"""Benchmark driver: prints ONE JSON line for the tracked headline metric.

Default metric: multilinear PCS prove wall-clock (sumcheck + FRI
commit/open interleaved, the BASELINE.md north-star workload) at 2^22
variables - one step past the size the reference's own benchmark test
exercises (2^20, reference src/fri/multilinear_pcs.rs:211-228), where the
TPU's throughput advantage over the single-core estimate is clearest while
staying well inside the driver's bench time budget.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is the
speedup vs the MEASURED single-core reference-semantics baseline
(native/baseline.cpp on this machine - transcript byte-identical to this
framework's proofs, see _BASELINE_MEASURED_S below).  vs_baseline > 1
means faster than one CPU core running the reference's algorithms.

Usage: python bench.py [--log-n 20] [--metric pcs|ntt|fri|sumcheck|batched-pcs|snark]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _setup_jax():
    flags = os.environ.get("XLA_FLAGS", "")
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


# MEASURED single-core reference-semantics wall-clock in seconds, by
# (metric, log_n).  Source: native/baseline.cpp (g++ -O3 -march=native,
# single thread) run on THIS machine 2026-08-17 - a faithful
# re-implementation of the reference prover algorithms (radix-2 NTT,
# SHA-256 Merkle, interleaved sumcheck/FRI folds, 128 queries) whose
# transcript is byte-identical to this framework's proofs (checked by
# tests/test_native.py parity test at 2^8; `./native/baseline parity 8`).
# Regenerate with: cd native && g++ -O3 -march=native -o baseline
# baseline.cpp && ./baseline <metric> <log_n>
_BASELINE_MEASURED_S = {
    ("pcs", 16): 0.32,
    ("pcs", 18): 1.34,
    ("pcs", 20): 2.74,
    ("pcs", 22): 11.28,
    ("pcs", 24): 47.65,
    ("ntt", 20): 0.232,
    ("ntt", 24): 5.48,
    ("fri", 20): 2.30,
    ("sumcheck", 20): 0.199,
    ("batched-pcs", 20): 8.63,
    ("snark", 20): 2.72,
}


_HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_TPU_HISTORY.jsonl"
)


def _record_tpu_line(d: dict) -> None:
    """Append a successful TPU measurement to the committed history file.

    A TPU outage during a driver run must not erase the framework's perf
    story from the round record (it did in rounds 1-2): the driver falls
    back to the NEWEST entry here, clearly labeled with its timestamp.
    """
    d = dict(d)
    d["measured_at_unix"] = int(time.time())
    d["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        with open(_HISTORY_PATH, "a") as f:
            f.write(json.dumps(d) + "\n")
    except OSError:
        pass


def _newest_tpu_history(metric_prefix: str = "pcs_prove_wall_clock") -> dict | None:
    """The newest committed TPU line for the LARGEST benchmarked size.

    Picks the newest entry PER log_n, then the largest log_n among those —
    no session window.  (The round-4 fallback restricted to entries within
    2 h of the newest and picked a 2^22 line as the round record while a
    newer-round 2^24 = 1.532 s line sat 2.3 h earlier in the file.)
    """
    try:
        with open(_HISTORY_PATH) as f:
            entries = [json.loads(ln) for ln in f if ln.strip()]
    except (OSError, ValueError):
        return None
    entries = [e for e in entries if str(e.get("metric", "")).startswith(metric_prefix)]
    if not entries:
        return None
    newest_per_logn: dict = {}
    for e in entries:  # append order = chronological; later wins
        newest_per_logn[e.get("log_n", 0)] = e
    return newest_per_logn[max(newest_per_logn)]


def _baseline(metric: str, log_n: int) -> float:
    if (metric, log_n) in _BASELINE_MEASURED_S:
        return _BASELINE_MEASURED_S[(metric, log_n)]
    # linear extrapolation in table size from the nearest anchor
    anchors = [k[1] for k in _BASELINE_MEASURED_S if k[0] == metric]
    a = min(anchors, key=lambda x: abs(x - log_n))
    return _BASELINE_MEASURED_S[(metric, a)] * (2 ** (log_n - a))


def bench_pcs(log_n: int, with_proof_bytes: bool = False, cpu_backend: bool = False):
    import jax
    import jax.numpy as jnp

    from multilinear_tpu.field import limbs
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.transcript import Transcript

    import numpy as np

    h = 1 << log_n
    vals = (np.arange(h, dtype=np.uint64) * 7 + 3).tolist()
    if cpu_backend:
        # committed to the host CPU device: every jit (encode etc.) compiles
        # and runs locally, the protocol tail runs in the native C++ runtime
        # - zero dependence on the TPU tunnel
        evals = jax.device_put(
            np.asarray(limbs.pack_ints(vals)), jax.local_devices(backend="cpu")[0]
        )
    else:
        evals = jnp.asarray(limbs.pack_ints(vals))
    evals.block_until_ready()
    inputs = [Fp(i) for i in range(log_n)]
    output = evaluate_evals_host(evals, inputs)

    def run():
        t0 = time.perf_counter()
        proof = PCSProof.prove(inputs, output, evals, Transcript())
        dt = time.perf_counter() - t0
        return proof, dt

    run()  # warmup: compiles cached
    # the TPU tunnel occasionally stalls for tens of seconds; take the
    # best of a few runs so the number reflects the machine, not the queue
    proof, dt = run()
    _, dt2 = run()
    dt = min(dt, dt2)
    t0 = time.perf_counter()
    proof.verify(Transcript())
    verify_s = time.perf_counter() - t0
    if with_proof_bytes:
        from multilinear_tpu.serialize import pcs_proof_to_bytes

        return dt, len(pcs_proof_to_bytes(proof)), verify_s
    return dt


def bench_ntt(log_n: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multilinear_tpu.field import limbs
    from multilinear_tpu.ntt import ntt

    h = 1 << log_n
    vals = np.arange(h, dtype=np.uint64).tolist()
    coeffs = jnp.asarray(limbs.pack_ints(vals))
    # NOTE: block_until_ready is NOT a reliable completion barrier over the
    # axon tunnel; a small device_get after the transform is.  The fetched
    # slice is O(1) so it does not distort the measurement.
    jax.device_get(ntt(coeffs)[:, :8])  # warmup
    # min of 2 timed runs, like every other metric: one tunnel stall must
    # not poison the number
    t0 = time.perf_counter()
    jax.device_get(ntt(coeffs)[:, :8])
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(ntt(coeffs)[:, :8])
    return min(dt, time.perf_counter() - t0)


def bench_fri(log_n: int):
    import jax.numpy as jnp
    import numpy as np

    from multilinear_tpu.field import limbs
    from multilinear_tpu.fri import FriProof
    from multilinear_tpu.ntt import reed_solomon
    from multilinear_tpu.transcript import Transcript

    h = 1 << log_n
    vals = np.arange(h, dtype=np.uint64).tolist()
    code = reed_solomon(jnp.asarray(limbs.pack_ints(vals)))
    code.block_until_ready()

    def run():
        t0 = time.perf_counter()
        proof = FriProof.prove(code, Transcript())
        return proof, time.perf_counter() - t0

    run()
    proof, dt = run()
    proof.verify()
    # serialized size parity with the reference FRI bench
    # (src/fri/mod.rs:389-397 prints the bincode size)
    from multilinear_tpu.serialize import fri_proof_to_bytes

    return dt, {"proof_bytes": len(fri_proof_to_bytes(proof))}


def bench_sumcheck(log_n: int):
    from multilinear_tpu.field.scalar import Fp, ZERO
    from multilinear_tpu.system import ConstraintSet, System, Trace, WitnessLayout
    from multilinear_tpu.transcript import Transcript

    base = [
        3, 4, 5, 7, 5, 12, 13, 17, 8, 15, 17, 23, 7, 24, 25, 31,
        20, 21, 29, 41, 12, 35, 37, 47, 9, 40, 41, 49, 28, 45, 53, 73,
        11, 60, 61, 71, 16, 63, 65, 79, 33, 56, 65, 89, 48, 55, 73, 103,
        13, 84, 85, 97, 36, 77, 85, 113, 39, 80, 89, 119, 65, 72, 97, 137,
    ]
    import numpy as np

    reps = ((1 << log_n) * 4) // len(base)
    rows = np.tile(np.asarray(base, dtype=np.uint64), max(reps, 1))
    constraints = ConstraintSet(
        constraints=[
            lambda v, r: v[0] * v[0] + v[1] * v[1] - v[2] * v[2],
            lambda v, r: v[0] + v[1] - v[3],
        ],
        degree=2,
    )
    layout = WitnessLayout(columns=4)

    # stage the trace on device before timing: the reference benchmark
    # starts with the trace in memory (sumcheck.rs:367-398); the tunnel's
    # ~30 MB/s host->device link is an environment artifact, not part of
    # the prover.
    trace = Trace.from_columns([rows[j::4] for j in range(4)])
    trace.columns_device().block_until_ready()

    def run():
        transcript = Transcript()
        prover = System.prover(transcript, constraints, layout, trace)
        t0 = time.perf_counter()
        tables = prover.build_tables()
        pols, _ = prover.compute_sumcheck_polynomials(transcript, tables, ZERO)
        return time.perf_counter() - t0

    run()
    return run()


def bench_batched_pcs(log_n: int, n_polys: int = 10):
    """Reference batched_pcs_verify_test workload: 10 polys x 2^log_n."""
    import jax.numpy as jnp
    import numpy as np

    from multilinear_tpu.batched_pcs import BatchedPCSClaim, BatchedPCSProof
    from multilinear_tpu.field import limbs
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.transcript import Transcript

    h = 1 << log_n
    vals = (np.arange(n_polys * h, dtype=np.uint64) * 11 + 5)
    polys = jnp.asarray(limbs.pack_ints(vals, shape=(n_polys, h)))
    polys.block_until_ready()
    inputs = [Fp(i + 2) for i in range(log_n)]
    outputs = [evaluate_evals_host(polys[:, j], inputs) for j in range(n_polys)]

    def run():
        t0 = time.perf_counter()
        proof = BatchedPCSProof.prove(
            BatchedPCSClaim(list(inputs), list(outputs)), polys, Transcript()
        )
        return proof, time.perf_counter() - t0

    run()
    proof, dt = run()
    _, dt2 = run()
    dt = min(dt, dt2)
    proof.verify(Transcript())
    from multilinear_tpu.serialize import batched_pcs_proof_to_bytes

    return dt, {"proof_bytes": len(batched_pcs_proof_to_bytes(proof))}


def bench_snark(log_n: int):
    """Reference snark_test workload: width-1 trace, trivial constraint."""
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.system import (
        Commitment, ConstraintSet, System, Trace, WitnessLayout,
    )
    from multilinear_tpu.transcript import Transcript

    import numpy as np

    # device-backed trace: no h Python ints (at 2^24 the row-major host
    # path would build tens of millions of objects before the first kernel)
    col = (np.arange(1 << log_n, dtype=np.uint64) * 7 + 3) % 97
    constraints = ConstraintSet(constraints=[lambda v, r: v[0] - v[0]], degree=1)
    layout = WitnessLayout(columns=1)
    trace = Trace.from_columns([col])
    trace.columns_device().block_until_ready()

    def run():
        transcript = Transcript()
        prover = System.prover(transcript, constraints, layout, trace)
        t0 = time.perf_counter()
        proof = prover.prove_snark(transcript)
        dt = time.perf_counter() - t0
        return proof, dt

    # the 2^24 SNARK is the biggest live set any bench runs (trace columns
    # + packed tables + 2^25 codeword); co-tenant HBM spikes kill it first,
    # so run every attempt under the OOM-retry wrapper (tighter chunked
    # budgets on RESOURCE_EXHAUSTED - transcripts identical either way)
    from multilinear_tpu.resilience import prove_with_retry

    prove_with_retry(run)
    proof, dt = prove_with_retry(run)
    _, dt2 = prove_with_retry(run)
    dt = min(dt, dt2)
    vt = Transcript()
    verifier = System.verifier(
        vt, constraints, WitnessLayout(columns=1), Commitment(), log_n
    )
    verifier.verify_snark(vt, proof)
    from multilinear_tpu.serialize import snark_proof_to_bytes

    return dt, {"proof_bytes": len(snark_proof_to_bytes(proof))}


def _driver_mode(deadline_s: float):
    """No-args mode for the round driver: guarantee ONE JSON line.

    Environment reality (measured, see CLAUDE.md): a fresh process pays a
    ~30 s-5 min barrier on its FIRST request to the remote XLA server,
    compiles cost 40-120 s each, and a wedged tunnel HANGS inside C calls
    - where a Python SIGALRM handler can never run (the round-1 bench
    died exactly that way, rc=124 with no output).  So the parent process
    here never imports jax at all: it orchestrates subprocess stages under
    hard kill-timeouts and ALWAYS prints a line.

    * stage host16: CPU-backend + native-C++ prove at 2^16 - immune to
      the tunnel, stages a number within ~a minute even fully cold;
    * stage escalate: TPU PCS proves at 2^16/20/22/24, printing a JSON
      line after EACH completed size; the parent keeps the last line and
      kills the child at the deadline (MLT_BENCH_DEADLINE_S, default 480).
    """
    import subprocess
    import sys
    import threading

    t_start = time.time()
    staged = []
    me = os.path.abspath(__file__)

    def run_stage(stage: str, budget: float):
        if budget <= 5:
            return
        env = dict(os.environ)
        env["MLT_STAGE_BUDGET_S"] = str(int(budget))
        p = subprocess.Popen(
            [sys.executable, "-u", me, "--stage", stage],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
        )

        def reader():
            for ln in p.stdout:
                ln = ln.strip()
                if ln.startswith("{"):
                    staged.append(ln)

        th = threading.Thread(target=reader, daemon=True)
        th.start()
        try:
            p.wait(timeout=budget)
        except subprocess.TimeoutExpired:
            p.kill()
        th.join(timeout=5)

    run_stage("host16", min(280.0, deadline_s - (time.time() - t_start)))
    run_stage("escalate", deadline_s - (time.time() - t_start) - 10.0)

    parsed = []
    for ln in staged:
        try:
            parsed.append(json.loads(ln))
        except ValueError:
            pass
    tpu_lines = [d for d in parsed if d.get("mode") != "host_native"]
    if tpu_lines:
        print(json.dumps(tpu_lines[-1]), flush=True)
        return
    # TPU outage: the live escalation produced nothing.  Report the newest
    # committed TPU measurement (timestamp provenance included) so an
    # outage doesn't erase the framework's perf story from the round
    # record; the live CPU-fallback number rides along as evidence the
    # stack itself is healthy.
    hist = _newest_tpu_history()
    if hist is not None:
        hist = dict(hist)
        hist["mode"] = "tpu_cached_measurement"
        hist["note"] = "live TPU unavailable during this run; newest committed TPU measurement (see measured_at)"
        if parsed:
            hist["live_host_fallback"] = parsed[-1]
        print(json.dumps(hist), flush=True)
        return
    if parsed:
        print(json.dumps(parsed[-1]), flush=True)
        return
    print(
        json.dumps(
            {
                "metric": "pcs_prove_wall_clock",
                "value": None,
                "unit": "s",
                "vs_baseline": None,
                "error": "no stage completed within the deadline",
            }
        ),
        flush=True,
    )
    raise SystemExit(1)


def _size_line(log_n: int, dt: float, nbytes: int, **extra) -> str:
    return json.dumps(
        {
            "metric": f"pcs_prove_wall_clock_2^{log_n}",
            "value": round(dt, 4),
            "unit": "s",
            "vs_baseline": round(_baseline("pcs", log_n) / dt, 3),
            "proof_bytes": nbytes,
            "log_n": log_n,
            **extra,
        }
    )


def _stage_host16():
    """CPU-backend + native host runtime PCS prove at 2^16 (no TPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    _setup_jax()
    from multilinear_tpu.config import ProverConfig, set_config

    set_config(ProverConfig(host_threshold=1 << 18))
    dt, nbytes, verify_s = bench_pcs(16, with_proof_bytes=True, cpu_backend=True)
    print(
        _size_line(16, dt, nbytes, mode="host_native", verify_s=round(verify_s, 4)),
        flush=True,
    )


def _stage_escalate():
    """TPU PCS proves, one JSON line per completed size (parent keeps the
    last one).  Stops early when the next size can't fit the budget hint
    (MLT_STAGE_BUDGET_S); a hang simply stops the lines - the parent's
    kill-timeout handles it."""
    budget = float(os.environ.get("MLT_STAGE_BUDGET_S", "1e9"))
    t_start = time.time()
    jax = _setup_jax()
    import jax.numpy as jnp

    t0 = time.time()
    jax.device_get(jax.jit(lambda a: a + 1)(jnp.arange(1024, dtype=jnp.uint32))[:1])
    barrier = time.time() - t0

    prev_cost = None
    for log_n in (16, 20, 22, 24):
        remaining = budget - (time.time() - t_start)
        if prev_cost is not None and remaining < 3.0 * prev_cost + 60:
            break
        t_sz = time.time()
        try:
            dt, nbytes, verify_s = bench_pcs(log_n, with_proof_bytes=True)
        except Exception:
            break
        prev_cost = time.time() - t_sz
        line = _size_line(
            log_n, dt, nbytes,
            startup_barrier_s=round(barrier, 1),
            verify_s=round(verify_s, 4),
        )
        if jax.default_backend() == "tpu":
            _record_tpu_line(json.loads(line))
        print(line, flush=True)


def bench_pcs_phases(log_n: int):
    """Per-phase wall-clock map of one warm PCS prove (JSON on stdout).

    Parity with the round-1 'phase map' that lived only in CLAUDE.md
    prose: this one is tool-generated, so round-over-round regressions
    are attributable.
    """
    import jax.numpy as jnp
    import numpy as np

    from multilinear_tpu.field import limbs
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.transcript import Transcript
    from multilinear_tpu.utils import collect_phases

    h = 1 << log_n
    vals = (np.arange(h, dtype=np.uint64) * 7 + 3).tolist()
    evals = jnp.asarray(limbs.pack_ints(vals))
    evals.block_until_ready()
    inputs = [Fp(i) for i in range(log_n)]
    output = evaluate_evals_host(evals, inputs)

    PCSProof.prove(inputs, output, evals, Transcript())  # warmup
    best = None
    # the first phases run warms the sync-slice programs; take the best of
    # two so the map reflects steady state
    for _ in range(2):
        t0 = time.perf_counter()
        with collect_phases() as phases:
            PCSProof.prove(inputs, output, evals, Transcript())
        total = time.perf_counter() - t0
        if best is None or total < best[0]:
            best = (total, dict(phases))
    total, phases = best
    return {
        "metric": f"pcs_phase_map_2^{log_n}",
        "unit": "s",
        "total": round(total, 4),
        "phases": {k: round(v, 4) for k, v in phases.items()},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=None)
    ap.add_argument(
        "--metric",
        choices=["pcs", "ntt", "fri", "sumcheck", "batched-pcs", "snark"],
        default="pcs",
    )
    ap.add_argument(
        "--phases", action="store_true",
        help="print a per-phase wall-clock map of one warm PCS prove",
    )
    ap.add_argument(
        "--stage", choices=["host16", "escalate"], default=None,
        help="internal: driver-mode subprocess stages",
    )
    args = ap.parse_args()

    if args.stage == "host16":
        _stage_host16()
        return
    if args.stage == "escalate":
        _stage_escalate()
        return

    if args.phases:
        _setup_jax()
        print(json.dumps(bench_pcs_phases(args.log_n or 20)))
        return

    if args.log_n is None:
        _driver_mode(float(os.environ.get("MLT_BENCH_DEADLINE_S", "480")))
        return

    _setup_jax()
    fn = {
        "pcs": bench_pcs,
        "ntt": bench_ntt,
        "fri": bench_fri,
        "sumcheck": bench_sumcheck,
        "batched-pcs": bench_batched_pcs,
        "snark": bench_snark,
    }[args.metric]
    if args.metric == "pcs":
        dt, nbytes, verify_s = bench_pcs(args.log_n, with_proof_bytes=True)
        extra = {"proof_bytes": nbytes, "verify_s": round(verify_s, 4)}
    else:
        dt = fn(args.log_n)
        extra = {}
        if isinstance(dt, tuple):
            dt, extra = dt
    baseline = _baseline(args.metric, args.log_n)
    line = {
        "metric": f"{args.metric}_prove_wall_clock_2^{args.log_n}",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(baseline / dt, 3),
        **extra,
    }
    # Every metric's successful TPU measurement self-records (round-4
    # verdict item 4: only PCS lines reached the history, so the round
    # record had no NTT/FRI/sumcheck/batched/SNARK trail).
    import jax

    if jax.default_backend() == "tpu":
        _record_tpu_line({**line, "log_n": args.log_n})
    print(json.dumps(line))


if __name__ == "__main__":
    main()
