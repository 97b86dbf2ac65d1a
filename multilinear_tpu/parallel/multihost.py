"""Multi-host (multi-process) SPMD setup.

One function to bring up the distributed runtime and build the global
mesh.  The proving stack needs nothing else for multi-host operation:

* all kernels are GSPMD-annotated pure functions, so the same jit lowers
  to ICI collectives within a slice and DCN collectives across hosts;
* the Fiat-Shamir transcript is deterministic - every process absorbs
  identical bytes (Merkle roots and round coefficients are global values
  produced by collectives), so challenges agree without communication
  (SURVEY.md section 7, "exact transcript parity across hosts");
* Merkle roots and partial sums reach every host because the reductions
  and the top ("cap") tree levels are replicated by XLA - each process's
  host code sees the same 32-byte digests.

Usage (same program on every host):

    from multilinear_tpu.parallel.multihost import initialize_and_mesh
    mesh = initialize_and_mesh()          # env-configured (TPU pods), or
    mesh = initialize_and_mesh(coordinator="host0:1234",
                               num_processes=2, process_id=me)
    evals = shard_hypercube(local_data, mesh)
    proof = PCSProof.prove(inputs, output, evals, Transcript())

Every process computes the identical proof object; exactly-once output is
the caller's choice (e.g. ``if jax.process_index() == 0``).
"""

from __future__ import annotations

from typing import Optional

from . import make_mesh


def initialize_and_mesh(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize + a global 1-D ``rows`` mesh.

    With no arguments, relies on the TPU pod environment (the usual case:
    JAX auto-discovers the coordinator on Cloud TPU).  Call ONCE per
    process, before any jax computation.
    """
    import jax

    # NB: must not touch jax.devices()/process_count() before initialize -
    # those calls initialise the XLA backend and make initialize() raise.
    if not jax.distributed.is_initialized():
        if coordinator or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            try:
                jax.distributed.initialize()
            except Exception:
                pass  # single-process environment
    return make_mesh(jax.devices())
