"""Cross-process-safe device-to-host fetches.

In single-process runs (one chip, or an 8-device test mesh in one
process) every jax.Array is fully addressable and these helpers are plain
``np.asarray`` / ``jax.device_get``.  Under multi-host SPMD
(jax.distributed + a mesh spanning processes) an array sharded over the
``rows`` axis spans non-addressable devices, and fetching it directly
raises.  The prover's device->host crossings (host-tail transitions, the
query phase, Merkle roots) route through here: a non-addressable array is
first replicated by an SPMD all-gather - a one-op jit with replicated
out_shardings that every process executes collectively - after which each
process reads its local replica.

This is the TPU-idiomatic multi-host story: compute stays sharded, and
the few O(log n)-sized host crossings gather over ICI/DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec


def _replicate(x):
    """All-gather a cross-process sharded array into full replication.

    Handles both NamedSharding outputs and the GSPMDSharding that
    multi-controller jit outputs sometimes carry (no ``.mesh`` attribute;
    the mesh is reconstructed from the device assignment - the order only
    fixes which device holds which replica, so any consistent order is
    correct)."""
    sh = x.sharding
    mesh = getattr(sh, "mesh", None)
    if mesh is None:
        devs = list(getattr(sh, "_device_assignment", None) or sorted(
            x.devices(), key=lambda d: d.id
        ))
        mesh = jax.sharding.Mesh(np.asarray(devs), ("_gather",))
    return jax.jit(
        lambda a: a, out_shardings=NamedSharding(mesh, PartitionSpec())
    )(x)


def _needs_gather(x) -> bool:
    return (
        isinstance(x, jax.Array)
        and not x.is_fully_addressable
        and not x.is_fully_replicated
    )


def fetch(x) -> np.ndarray:
    """``np.asarray`` that works for cross-process sharded arrays."""
    if _needs_gather(x):
        x = _replicate(x)
    return np.asarray(x)


def device_get_tree(tree):
    """``jax.device_get`` of a pytree, gathering non-addressable leaves.

    Keeps the single-batch transfer of ``jax.device_get`` (one tunnel
    round-trip) for the already-addressable leaves.
    """
    leaves, treedef = jax.tree.flatten(tree)
    leaves = [_replicate(l) if _needs_gather(l) else l for l in leaves]
    return jax.tree.unflatten(treedef, jax.device_get(leaves))
