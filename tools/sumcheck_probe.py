"""Decompose the standalone-sumcheck bench (bench.py bench_sumcheck) into
phases so perf work targets the real cost, not a guess.

Reference workload: src/constraint_system/sumcheck.rs:367-398 (2^20 x 4
columns, two degree-2 constraints; C++ baseline 0.199 s).

Usage: python tools/sumcheck_probe.py [log_n]

Phases reported (all warm, second run):
  challenges   ChallengeSet + constraint masks (host transcript work)
  build_tables pack (cols || delta) device program, synced
  dev_rounds   streamed device rounds incl. the single device_get sync
  host_tail    host-native rounds below host_threshold
Plus the stats counters saying which round engine ran how many times.
"""

import sys
import time

sys.path.insert(0, ".")

from multilinear_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax

from multilinear_tpu import stats
from multilinear_tpu.field.scalar import ZERO, Fp
from multilinear_tpu.sumcheck import _device_sc_rounds
from multilinear_tpu.system import ConstraintSet, System, Trace, WitnessLayout
from multilinear_tpu.transcript import Transcript


def build_trace(log_n: int) -> Trace:
    base = [
        3, 4, 5, 7, 5, 12, 13, 17, 8, 15, 17, 23, 7, 24, 25, 31,
        20, 21, 29, 41, 12, 35, 37, 47, 9, 40, 41, 49, 28, 45, 53, 73,
        11, 60, 61, 71, 16, 63, 65, 79, 33, 56, 65, 89, 48, 55, 73, 103,
        13, 84, 85, 97, 36, 77, 85, 113, 39, 80, 89, 119, 65, 72, 97, 137,
    ]
    rows = base[:]
    while len(rows) < (1 << log_n) * 4:
        rows = rows + rows
    return Trace(rows, 4)


CONSTRAINTS = ConstraintSet(
    constraints=[
        lambda v, r: v[0] * v[0] + v[1] * v[1] - v[2] * v[2],
        lambda v, r: v[0] + v[1] - v[3],
    ],
    degree=2,
)


def run_once(trace: Trace, record: bool):
    layout = WitnessLayout(columns=4)
    phases = {}
    stats.reset()

    t0 = time.perf_counter()
    transcript = Transcript()
    prover = System.prover(transcript, CONSTRAINTS, layout, trace)
    phases["challenges"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    tables = prover.build_tables()
    if not tables.on_host:
        jax.block_until_ready(tables.data)
    phases["build_tables"] = time.perf_counter() - t0

    # replicate compute_all_rounds with timing around the two engines
    composition = CONSTRAINTS.composition_fn()
    aux = list(prover.challenges.trace) + list(prover.constraint_mask)
    total_degree = CONSTRAINTS.degree + 1
    n_rounds = tables.height.bit_length() - 1
    prev = ZERO
    k = 0
    phases["dev_rounds"] = 0.0
    phases["host_tail"] = 0.0
    pols = []
    while k < n_rounds:
        t0 = time.perf_counter()
        done, dev_pols, _, prev2 = _device_sc_rounds(
            tables, transcript, prev, total_degree, composition, aux
        )
        phases["dev_rounds"] += time.perf_counter() - t0
        if done:
            pols.extend(dev_pols)
            prev = prev2
            k += done
            continue
        t0 = time.perf_counter()
        pol, _, prev = tables.compute_round(
            composition, total_degree, prev, transcript, aux
        )
        phases["host_tail"] += time.perf_counter() - t0
        pols.append(pol)
        k += 1

    total = sum(phases.values())
    if record:
        print(f"log_n={trace.height.bit_length() - 1} total={total:.4f}s")
        for k2, v in phases.items():
            print(f"  {k2:14s} {v:8.4f}s  {100 * v / total:5.1f}%")
        print(f"  counters: {dict(stats.counters)}")
        print(f"  rounds' polys: {len(pols)}")
    return total


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    trace = build_trace(log_n)
    trace.columns_device().block_until_ready()
    run_once(trace, record=False)  # warmup: compiles / cached-program loads
    run_once(trace, record=True)
    run_once(trace, record=True)


if __name__ == "__main__":
    main()
