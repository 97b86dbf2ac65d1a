"""Native host runtime (native/mlt_native.cpp) parity vs exact Python."""

import os
import hashlib
import random

import numpy as np
import pytest

from multilinear_tpu import native
from multilinear_tpu.field.scalar import P, TWO_INV

rng = random.Random(41)


def _rand(n):
    return [rng.randrange(P) for _ in range(n)]


def test_bytes_roundtrip():
    vals = _rand(33)
    arr = native.ints_to_bytes_arr(vals)
    assert native.bytes_arr_to_ints(arr) == vals


def test_fold_parity():
    lo, hi = _rand(64), _rand(64)
    r = rng.randrange(P)
    got = native.bytes_arr_to_ints(
        native.fold(native.ints_to_bytes_arr(lo), native.ints_to_bytes_arr(hi), r)
    )
    assert got == [(l + r * (h - l)) % P for l, h in zip(lo, hi)]


def test_fri_fold_parity():
    code = _rand(64)
    r, step = rng.randrange(P), rng.randrange(1, P)
    got = native.bytes_arr_to_ints(
        native.fri_fold(native.ints_to_bytes_arr(code), r, step)
    )
    inv2, tw, want = TWO_INV.v, 1, []
    for i in range(32):
        a, b = code[i], code[i + 32]
        want.append(((a + b) + r * ((a - b) * tw % P)) % P * inv2 % P)
        tw = tw * step % P
    assert got == want


def test_pcs_partial_sums_parity():
    m, d = _rand(32), _rand(32)
    got = native.pcs_partial_sums(
        native.ints_to_bytes_arr(m), native.ints_to_bytes_arr(d), 2
    )
    off = 16
    want = []
    for x in (1, 2):
        s = 0
        for i in range(off):
            mx = (m[i] + x * (m[i + off] - m[i])) % P
            dx = (d[i] + x * (d[i + off] - d[i])) % P
            s = (s + mx * dx) % P
        want.append(s)
    assert got == want


def test_fingerprint_parity():
    vecs = np.stack([native.ints_to_bytes_arr(_rand(9)) for _ in range(4)])
    r = rng.randrange(P)
    got = native.bytes_arr_to_ints(native.fingerprint_rlc(vecs, r))
    cols = [native.bytes_arr_to_ints(vecs[j]) for j in range(4)]
    want = []
    for i in range(9):
        acc = 0
        for j in range(4):
            acc = (acc * r + cols[j][i]) % P
        want.append(acc)
    assert got == want


def test_sha_and_merkle_parity():
    msgs = np.frombuffer(
        bytes(rng.randrange(256) for _ in range(8 * 48)), dtype=np.uint8
    ).reshape(8, 48).copy()
    d = native.sha256_many(msgs)
    for i in range(8):
        assert d[i].tobytes() == hashlib.sha256(msgs[i].tobytes()).digest()
    layers = native.merkle_layers(d)
    assert len(layers) == 4 and layers[-1].shape[0] == 1
    # recompute root with hashlib
    cur = [d[i].tobytes() for i in range(8)]
    while len(cur) > 1:
        cur = [hashlib.sha256(cur[i] + cur[i + 1]).digest() for i in range(0, len(cur), 2)]
    assert layers[-1][0].tobytes() == cur[0]


def test_merkle_verify_parity():
    leaf = b"hello merkle"
    sibs = [bytes([i] * 32) for i in range(3)]
    dirs = [0, 1, 0]
    h = hashlib.sha256(leaf).digest()
    h = hashlib.sha256(h + sibs[0]).digest()
    h = hashlib.sha256(sibs[1] + h).digest()
    h = hashlib.sha256(h + sibs[2]).digest()
    ok, idx = native.merkle_verify(leaf, sibs, dirs, h)
    assert ok and idx == 2
    ok, _ = native.merkle_verify(leaf, sibs, dirs, bytes(32))
    assert not ok


def test_delta_table_parity():
    """native.delta_table == Python bigint doubling == device delta."""
    import jax.numpy as jnp

    from multilinear_tpu.field import limbs
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.mle import delta_subtables, combine_subtables

    pts = _rand(9)
    got = native.delta_table(pts)

    table = [1]
    for p in pts:
        table = [v * w % P for v in table for w in ((1 - p) % P, p)]
    assert native.bytes_arr_to_ints(got) == table

    dev = combine_subtables(delta_subtables([Fp(p) for p in pts]))
    assert list(limbs.unpack_ints(np.asarray(dev))) == table

    if native.HAVE_NATIVE:
        import multilinear_tpu.native as nat

        orig = nat.HAVE_NATIVE
        try:
            nat.HAVE_NATIVE = False
            got_py = native.delta_table(pts)
        finally:
            nat.HAVE_NATIVE = orig
        assert np.array_equal(got_py, got)


def test_encode_mle_parity():
    """native.encode_mle == the device encode (Moebius + bitrev + RS NTT),
    native vs pure-Python fallback vs jit path all byte-identical."""
    import jax.numpy as jnp

    from multilinear_tpu.field import limbs
    from multilinear_tpu.fri import encode_mle_for_fri

    vals = _rand(1 << 8)
    evals_bytes = native.ints_to_bytes_arr(vals)
    got = native.encode_mle(evals_bytes)

    dev = jnp.asarray(limbs.pack_ints(vals))
    want_limbs = np.asarray(encode_mle_for_fri(dev))
    want = np.frombuffer(
        limbs.to_le_bytes(want_limbs), dtype=np.uint8
    ).reshape(-1, 16)
    assert np.array_equal(got, want)

    if native.HAVE_NATIVE:  # also pin the pure-Python fallback
        import multilinear_tpu.native as nat

        orig = nat.HAVE_NATIVE
        try:
            nat.HAVE_NATIVE = False
            got_py = native.encode_mle(evals_bytes)
        finally:
            nat.HAVE_NATIVE = orig
        assert np.array_equal(got_py, want)


def test_host_native_prove_bit_identical():
    """The fully-host prove (native encode + host rounds) produces byte-
    identical proofs to the device-encode path."""
    import jax.numpy as jnp

    from multilinear_tpu.config import ProverConfig, get_config, set_config
    from multilinear_tpu.field import limbs
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.serialize import pcs_proof_to_bytes
    from multilinear_tpu.transcript import Transcript

    n = 8
    evals = [Fp(i * 3 + 11) for i in range(1 << n)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i + 4) for i in range(n)]
    output = evaluate_evals_host(dev, inputs)

    old = get_config()
    try:
        set_config(ProverConfig(host_threshold=16))  # device-encode reference
        ref = PCSProof.prove(inputs, output, dev, Transcript())
        set_config(ProverConfig(host_threshold=1 << 10))  # fully-host path
        got = PCSProof.prove(inputs, output, dev, Transcript())
    finally:
        set_config(old)
    assert pcs_proof_to_bytes(got) == pcs_proof_to_bytes(ref)
    got.verify(Transcript())


def test_baseline_binary_transcript_parity():
    """The measured single-core CPU baseline (native/baseline.cpp) must
    perform the reference's exact work: its PCS transcript digests are
    byte-identical to this framework's proof at 2^8.  last_random covers
    the ENTIRE transcript history (roots, round coeffs, challenges, all
    128 query indices), so matching it pins the whole protocol."""
    import json as _json
    import subprocess

    import jax.numpy as jnp

    from multilinear_tpu.field import limbs
    from multilinear_tpu.field.scalar import Fp
    from multilinear_tpu.mle import evaluate_evals_host
    from multilinear_tpu.pcs import PCSProof
    from multilinear_tpu.transcript import Transcript

    src_dir = os.path.join(os.path.dirname(__file__), "..", "native")
    exe = os.path.join(src_dir, "baseline")
    src = os.path.join(src_dir, "baseline.cpp")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-o", exe, src], check=True, capture_output=True,
            timeout=300,
        )
    out = subprocess.run(
        [exe, "parity", "8"], check=True, capture_output=True, timeout=120
    )
    d = _json.loads(out.stdout)

    n = 8
    evals = [Fp(i * 7 + 3) for i in range(1 << n)]
    dev = jnp.asarray(limbs.pack_ints(evals))
    inputs = [Fp(i) for i in range(n)]
    output = evaluate_evals_host(dev, inputs)
    proof = PCSProof.prove(inputs, output, dev, Transcript())

    assert d["root0"] == proof.fri_proof.commitments[0].hex()
    assert d["last_element"] == proof.fri_proof.last_elem.to_bytes().hex()
    assert d["last_random"] == proof.fri_proof.last_random.hex()
