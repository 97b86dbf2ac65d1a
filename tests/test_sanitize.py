"""Debug-mode limb sanitizer (SURVEY.md section 5 overflow-guard analog):
with config.debug_checks on, protocol kernels assert canonical residues
via a host callback; corrupted inputs are caught at the producing kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multilinear_tpu.config import get_config
from multilinear_tpu.field import limbs, ops


@pytest.fixture
def debug_checks():
    get_config().debug_checks = True
    jax.clear_caches()  # the flag is read at trace time
    yield
    get_config().debug_checks = False
    jax.clear_caches()


def test_clean_prove_passes_under_sanitizer(debug_checks):
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.transcript import Transcript

    n = 6
    evals = [Fp(i * 3 + 1) for i in range(1 << n)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i) for i in range(n)]
    output = evaluate_evals_host(dev, inputs)
    PCSProof.prove(inputs, output, dev, Transcript()).verify(Transcript())


def test_corrupt_limb_detected(debug_checks):
    from multilinear_tpu.sumcheck import _fold_kernel

    data = jnp.asarray(limbs.pack_ints(list(range(1, 1 + (2 << 13))), shape=(2, 1 << 13)))
    bad = data.at[0, 0, 0].set(np.uint32(1 << 20))  # limb >= 2^16
    r = jnp.asarray(limbs.pack_int(7))
    with pytest.raises(Exception, match="non-canonical"):
        jax.block_until_ready(_fold_kernel(bad, r))


def test_guard_is_identity_when_off():
    x = jnp.asarray(limbs.pack_ints([5, 6, 7, 8]))
    assert ops.debug_guard(x, "t") is x
