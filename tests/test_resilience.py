"""Retry-under-memory-pressure wrapper (SURVEY.md section 5 failure
detection): transient RESOURCE_EXHAUSTED retries with tighter budgets,
other errors propagate, config is restored afterward."""

import pytest

from multilinear_tpu.config import get_config
from multilinear_tpu.resilience import is_resource_exhausted, prove_with_retry


class FakeOOM(RuntimeError):
    pass


def test_retries_on_resource_exhausted_and_tightens_budget():
    calls = []
    orig_budget = get_config().fused_round_max_code

    def prove():
        calls.append(get_config().fused_round_max_code)
        if len(calls) == 1:
            raise FakeOOM("RESOURCE_EXHAUSTED: Out of memory allocating ...")
        return "proof"

    assert prove_with_retry(prove) == "proof"
    assert len(calls) == 2
    assert calls[0] == orig_budget
    assert calls[1] == orig_budget // 2
    # config restored
    assert get_config().fused_round_max_code == orig_budget


def test_non_oom_errors_propagate():
    def prove():
        raise ValueError("bad proof input")

    with pytest.raises(ValueError):
        prove_with_retry(prove)


def test_gives_up_after_max_retries():
    n = []

    def prove():
        n.append(1)
        raise FakeOOM("RESOURCE_EXHAUSTED")

    with pytest.raises(FakeOOM):
        prove_with_retry(prove, max_retries=2)
    assert len(n) == 3
    assert get_config().fused_round_max_code  # restored, no exception


def test_detector():
    assert is_resource_exhausted(FakeOOM("RESOURCE_EXHAUSTED: foo"))
    assert is_resource_exhausted(RuntimeError("Out of memory while ..."))
    assert not is_resource_exhausted(ValueError("nope"))


def test_end_to_end_small_prove_succeeds_via_wrapper():
    import jax.numpy as jnp

    from multilinear_tpu.field import limbs
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.transcript import Transcript

    n = 6
    evals = [Fp(i * 3 + 1) for i in range(1 << n)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i) for i in range(n)]
    output = evaluate_evals_host(dev, inputs)
    proof = prove_with_retry(
        lambda: PCSProof.prove(inputs, output, dev, Transcript())
    )
    proof.verify(Transcript())
