"""Multi-chip parallelism: mesh construction + hypercube sharding.

The reference is single-threaded (SURVEY.md section 2.3); all parallelism
here is new, TPU-first design:

* ONE logical mesh axis, ``rows``, shards the hypercube/codeword axis (the
  last value axis of every (8, ..., 2^k) limb array) across all chips.
  Leading index bits map to devices, so the first log(#devices) sumcheck /
  FRI folds pair elements living on different devices - XLA lowers the
  halving slice + elementwise combine to a neighbor ``ppermute`` over ICI -
  and every later round is purely local.
* Partial sums / table reductions keep their sharded layout; ``jnp.sum``
  under jit lowers to a local reduction + ``psum`` (all-reduce over ICI).
* The NTT scan's XOR-gathers span shards in the high stages; XLA inserts
  the equivalent of an ``all_to_all`` reshard between stage groups.

Everything is GSPMD: kernels are written once (see ops/ntt/sumcheck/fri
modules), sharding comes from annotating the INPUTS with
``jax.sharding.NamedSharding`` and letting the compiler place collectives.
This is the idiomatic scaling path on TPU - collectives ride ICI inside a
slice and DCN across slices without code changes.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``;
the mesh then spans all processes' devices and the same annotations drive
DCN collectives.  Fiat-Shamir stays deterministic because every host runs
the identical transcript on identical absorbed bytes (SURVEY.md section 7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS = "rows"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``rows``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (ROWS,))


def hypercube_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """NamedSharding placing the LAST axis of an ndim-array on ``rows``.

    Limb axis (0) and any batch axes stay replicated; the hypercube /
    codeword axis is contiguously sharded, so element i lives on device
    i >> (k - log n_devices) - leading index bits = device id.
    """
    spec = [None] * (ndim - 1) + [ROWS]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_hypercube(arr, mesh: Mesh):
    """Place a (8, ..., 2^k) limb array with the hypercube axis sharded."""
    return jax.device_put(arr, hypercube_sharding(mesh, arr.ndim))


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """NamedSharding distributing the BATCH axis (axis 1 of (8, B, h))
    across devices - the expert-parallel analog for the batched PCS
    (SURVEY.md section 2.3): each device owns whole polynomials, so the
    per-poly encodes (Moebius + bit-reversal + NTT) run with zero
    cross-device traffic and only the column Merkle commit and the
    fingerprint RLC reduce across the mesh."""
    spec = [None] * ndim
    spec[1] = ROWS
    return NamedSharding(mesh, P(*spec))


def shard_batch(polys, mesh: Mesh):
    """Place a (8, B, 2^k) batched-MLE array with the batch axis sharded."""
    return jax.device_put(polys, batch_sharding(mesh, polys.ndim))
