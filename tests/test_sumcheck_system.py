"""Sumcheck engine + constraint system tests.

Covers reference tests sumcheck_test / sumcheck_high_bench
(src/constraint_system/sumcheck.rs:350-398) and pins bit-exact transcript
parity against the pure-Python golden model.
"""

import pytest

from multilinear_tpu.field.scalar import Fp, ZERO
from multilinear_tpu.sumcheck import SumcheckTables, identity_composition, replay_sumcheck
from multilinear_tpu.system import ConstraintSet, System, Trace, WitnessLayout
from multilinear_tpu.transcript import Transcript

import golden_model as gm

# Pythagorean-triples trace from the reference test suite
# (src/constraint_system/sumcheck.rs:286-320): columns 0..2 are triples,
# column 3 = col0 + col1.
PYTHAGOREAN = [
    3, 4, 5, 7, 5, 12, 13, 17, 8, 15, 17, 23, 7, 24, 25, 31,
    20, 21, 29, 41, 12, 35, 37, 47, 9, 40, 41, 49, 28, 45, 53, 73,
    11, 60, 61, 71, 16, 63, 65, 79, 33, 56, 65, 89, 48, 55, 73, 103,
    13, 84, 85, 97, 36, 77, 85, 113, 39, 80, 89, 119, 65, 72, 97, 137,
]


def pythagorean_system(transcript, log_height=4):
    rows = PYTHAGOREAN[:]
    while len(rows) < (1 << log_height) * 4:
        rows = rows + rows
    trace = Trace(rows, 4)
    constraints = ConstraintSet(
        constraints=[
            lambda v, r: v[0] * v[0] + v[1] * v[1] - v[2] * v[2],
            lambda v, r: v[0] + v[1] - v[3],
        ],
        degree=2,
    )
    layout = WitnessLayout(columns=4)
    return System.prover(transcript, constraints, layout, trace)


def test_sumcheck_pythagorean_roundtrip():
    """Full prove + debug-verify on the 16-row Pythagorean trace."""
    transcript = Transcript()
    prover = pythagorean_system(transcript)
    verifier_transcript = transcript.clone()
    tables = prover.build_tables()
    pols, randoms = prover.compute_sumcheck_polynomials(transcript, tables, ZERO)
    assert len(pols) == 4
    # round polys have degree 3 => 3 nonzero coeffs
    assert all(len(p.nonzero_coeffs) == 3 for p in pols)
    prover.verify_sumcheck_debug(verifier_transcript, pols, ZERO)


def test_sumcheck_matches_golden_model():
    """Bit-exact parity: polys and challenges equal the scalar golden model."""
    transcript = Transcript()
    prover = pythagorean_system(transcript)
    golden_t = gm.GoldenTranscript()
    golden_t.h = transcript._state.copy()

    tables = prover.build_tables()
    pols, randoms = prover.compute_sumcheck_polynomials(transcript, tables, ZERO)

    # golden: same delta table, same composition, scalar arithmetic
    row = [c.v for c in prover.challenges.row]
    height = 1 << 4
    delta = [gm.mask_eval(i, 4, row) for i in range(height)]
    mask = [m.v for m in prover.constraint_mask]

    def comp(vals):
        c1 = (vals[0] * vals[0] + vals[1] * vals[1] - vals[2] * vals[2]) % gm.P
        c2 = (vals[0] + vals[1] - vals[3]) % gm.P
        return (mask[0] * c1 + mask[1] * c2) % gm.P

    g_pols, g_randoms = gm.sumcheck_prove(
        [v % gm.P for v in PYTHAGOREAN], 4, delta, comp, 2, golden_t, 0
    )
    assert [[c.v for c in p.nonzero_coeffs] for p in pols] == g_pols
    assert [r.v for r in randoms] == [r % gm.P for r in g_randoms]
    # transcript states agree at the end
    assert transcript.random() == golden_t.state()


def test_verify_with_evaluations():
    """Verifier-side check with claimed column evaluations."""
    transcript = Transcript()
    prover = pythagorean_system(transcript)
    verifier_transcript = transcript.clone()
    tables = prover.build_tables()
    pols, randoms = prover.compute_sumcheck_polynomials(transcript, tables, ZERO)
    outputs = prover.trace.evaluate(randoms)
    prover.verify_with_evaluations(verifier_transcript, pols, ZERO, outputs)


def test_sumcheck_rejects_corruption():
    transcript = Transcript()
    prover = pythagorean_system(transcript)
    verifier_transcript = transcript.clone()
    tables = prover.build_tables()
    pols, _ = prover.compute_sumcheck_polynomials(transcript, tables, ZERO)
    pols[1].nonzero_coeffs[0] = pols[1].nonzero_coeffs[0] + Fp(1)
    with pytest.raises(AssertionError):
        prover.verify_sumcheck_debug(verifier_transcript, pols, ZERO)


def test_challenge_set_quirk_q2():
    """All ChallengeSet challenges are the same single element (quirk Q2)."""
    transcript = Transcript()
    prover = pythagorean_system(transcript)
    ch = prover.challenges
    vals = set(c.v for c in ch.row) | set(c.v for c in ch.constraint)
    assert len(vals) == 1
    # equals the challenge of the (empty) starting transcript
    assert ch.row[0] == Transcript().next_challenge()


def test_pcs_style_identity_sumcheck():
    """Width-1 identity composition: sum = claimed evaluation telescopes."""
    import jax.numpy as jnp
    from multilinear_tpu.field import limbs
    from multilinear_tpu.mle import evaluate_evals_host

    n_vars = 6
    evals = [Fp(i * 7 + 3) for i in range(1 << n_vars)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i) for i in range(n_vars)]
    output = evaluate_evals_host(dev, inputs)

    transcript = Transcript()
    tables = SumcheckTables.for_pcs(inputs, dev)
    pols, randoms = tables.compute_all_rounds(identity_composition, 1, transcript, output)

    # verifier replay: telescoping must end at eq(inputs, rs) * p(rs)
    vt = Transcript()
    rs, final = replay_sumcheck(vt, pols, output)
    assert rs == randoms
    from multilinear_tpu.mle import eq_scalar

    p_at_rs = evaluate_evals_host(dev, rs)
    assert eq_scalar(inputs, rs) * p_at_rs == final


def test_streaming_device_sumcheck_rounds_bit_identical():
    """Standalone sumcheck with streaming device rounds (on-device
    Fiat-Shamir + V^{-1} interpolation) == exact host-int path."""
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.system import ConstraintSet, System, Trace, WitnessLayout
    from multilinear_tpu.field.scalar import ZERO

    log_h = 8
    rows = []
    i = 0
    while len(rows) < (1 << log_h) * 4:
        rows.extend([3 + i, 4 + i, 5 + i, 7 + i])
        i += 1
    constraints = ConstraintSet(
        constraints=[
            lambda v, r: v[0] * v[0] + v[1] * v[1] - v[2] * v[2],
            lambda v, r: v[0] + v[1] - v[3],
        ],
        degree=2,
    )
    layout = WitnessLayout(columns=4)

    def run():
        trace = Trace(rows, 4)
        transcript = Transcript()
        prover = System.prover(transcript, constraints, layout, trace)
        tables = prover.build_tables()
        pols, randoms = prover.compute_sumcheck_polynomials(
            transcript, tables, ZERO
        )
        return pols, randoms, transcript.random()

    from multilinear_tpu import stats

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=1 << 12))  # all-host reference
        ref_pols, ref_rs, ref_state = run()
        # per-round streamed device rounds (scan tail disabled)
        set_config(ProverConfig(host_threshold=16, sc_scan_tail_height=0))
        got_pols, got_rs, got_state = run()
        # the TPU-default deep tail: stream EVERY round on device (the host
        # tail is a Python composition loop, ~0.2 s/prove at threshold 4096
        # - see config.sc_host_threshold); must stay byte-identical
        set_config(
            ProverConfig(
                host_threshold=1 << 12, sc_host_threshold=2, sc_scan_tail_height=0
            )
        )
        stats.reset()
        deep_pols, deep_rs, deep_state = run()
        assert stats.get("sc_rounds_streamed") == log_h - 1  # down to h=2
        assert stats.get("sc_rounds_host") == 1  # the final h=2 round
        # the scan tail: ALL rounds in ONE device program (lax.scan at
        # fixed shape, config.sc_scan_tail_height)
        set_config(ProverConfig(host_threshold=1 << 12, sc_host_threshold=2))
        stats.reset()
        scan_pols, scan_rs, scan_state = run()
        assert stats.get("sc_rounds_scanned") == log_h
        assert stats.get("sc_rounds_streamed") == 0
        assert stats.get("sc_rounds_host") == 0
    finally:
        set_config(old)
    for pols2, rs2, state2 in [
        (got_pols, got_rs, got_state),
        (deep_pols, deep_rs, deep_state),
        (scan_pols, scan_rs, scan_state),
    ]:
        assert state2 == ref_state
        assert rs2 == ref_rs
        assert [p.nonzero_coeffs for p in pols2] == [
            p.nonzero_coeffs for p in ref_pols
        ]


@pytest.mark.slow
def test_one_dispatch_sumcheck_bit_identical():
    """The ONE-DISPATCH fused sumcheck (sumcheck._sc_fused_all: streamed
    rounds at shrinking shapes + the masked scan tail, all in one device
    program) == the exact host path, byte for byte.

    Slow: the program embeds the 4-column degree-2 composition three times
    (2 streamed + 1 scan) and XLA:CPU takes ~9 min to compile it cold even
    at this tiny shape - which is exactly why config.sc_one_dispatch gates
    the path to TPU backends by default.  The persistent cache makes warm
    reruns cheap.
    """
    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.system import ConstraintSet, System, Trace, WitnessLayout
    from multilinear_tpu.field.scalar import ZERO
    from multilinear_tpu import stats

    log_h = 8
    rows = []
    i = 0
    while len(rows) < (1 << log_h) * 4:
        rows.extend([3 + i, 4 + i, 5 + i, 7 + i])
        i += 1
    constraints = ConstraintSet(
        constraints=[
            lambda v, r: v[0] * v[0] + v[1] * v[1] - v[2] * v[2],
            lambda v, r: v[0] + v[1] - v[3],
        ],
        degree=2,
    )
    layout = WitnessLayout(columns=4)

    def run():
        trace = Trace(rows, 4)
        transcript = Transcript()
        prover = System.prover(transcript, constraints, layout, trace)
        tables = prover.build_tables()
        pols, randoms = prover.compute_sumcheck_polynomials(transcript, tables, ZERO)
        return pols, randoms, transcript.random()

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=1 << 12))  # all-host reference
        ref_pols, ref_rs, ref_state = run()
        set_config(
            ProverConfig(
                host_threshold=16,
                sc_host_threshold=2,
                sc_scan_tail_height=1 << 6,
                sc_one_dispatch=True,
            )
        )
        stats.reset()
        got_pols, got_rs, got_state = run()
        assert stats.get("sc_rounds_fused_one_dispatch") == log_h
        assert stats.get("sc_rounds_scanned") == 0
        assert stats.get("sc_rounds_streamed") == 0
    finally:
        set_config(old)
    assert got_state == ref_state
    assert got_rs == ref_rs
    assert [p.nonzero_coeffs for p in got_pols] == [
        p.nonzero_coeffs for p in ref_pols
    ]
