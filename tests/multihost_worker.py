"""Subprocess body for tests/test_multihost.py (2-process jax.distributed).

Run: python multihost_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax

jax.config.update("jax_platforms", "cpu")

from multilinear_tpu.parallel.multihost import initialize_and_mesh

mesh = initialize_and_mesh(
    coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
)
print(f"[{pid}] process_count={jax.process_count()} devices={len(jax.devices())} local={len(jax.local_devices())}", flush=True)

import jax.numpy as jnp
import numpy as np

from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp
from multilinear_tpu.mle import evaluate_evals_host
from multilinear_tpu.parallel import shard_hypercube
from multilinear_tpu.pcs import PCSProof
from multilinear_tpu.serialize import pcs_proof_to_bytes
from multilinear_tpu.transcript import Transcript

n = 10
h = 1 << n
vals = (np.arange(h, dtype=np.uint64) * 7 + 3).tolist()
host_arr = limbs.pack_ints(vals)
evals = shard_hypercube(jnp.asarray(host_arr), mesh)
print(f"[{pid}] sharding: {evals.sharding}", flush=True)
inputs = [Fp(i) for i in range(n)]
output = evaluate_evals_host(jnp.asarray(host_arr), inputs)

proof = PCSProof.prove(inputs, output, evals, Transcript())
buf = pcs_proof_to_bytes(proof)
import hashlib

print(f"[{pid}] PROOF_SHA {hashlib.sha256(buf).hexdigest()}", flush=True)
proof.verify(Transcript())
print(f"[{pid}] VERIFY_OK", flush=True)
