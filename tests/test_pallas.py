"""Parity tests for the Pallas kernel math (CPU).

The Pallas kernels (field mul, fused FRI fold, SHA-256) must be
bit-identical to the jnp reference kernels - protocol transcripts pin on
it.  On CPU the kernel BODIES are exercised two ways:

* the limb/round math as pure jnp functions on tiny arrays (fast), and
* one interpret-mode ``pallas_call`` with a multi-step grid + lane
  padding, covering the BlockSpec indexing and the wrapper reshapes.

The real Mosaic lowering is checked on hardware by the TPU parity script
(the kernels are also exercised by every on-TPU bench run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multilinear_tpu.field import limbs, ops, pallas_ops
from multilinear_tpu.field.scalar import Fp, P, TWO_INV


def _rand_vals(rng, n):
    return [(int(x) * (P - 3) + int(y)) % P
            for x, y in zip(rng.integers(0, 1 << 63, size=n),
                            rng.integers(0, 1 << 63, size=n))]


def _pack(vals):
    return jnp.asarray(limbs.pack_ints(vals))


def test_mul_limbs_math_parity():
    """_mul_limbs (the kernel body) == ops._mul_core on full-range values."""
    rng = np.random.default_rng(11)
    a = _pack(_rand_vals(rng, 256) + [0, 1, P - 1, P - 2])
    b = _pack(_rand_vals(rng, 256) + [P - 1, P - 1, P - 1, 0])
    al = [a[i] for i in range(8)]
    bl = [b[i] for i in range(8)]
    got = jnp.stack(pallas_ops._mul_limbs(al, bl))
    want = ops._mul_core(a, b)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_sha_rounds_math_parity():
    """_compress_unrolled (the kernel body) == the lax.scan compression."""
    from multilinear_tpu import sha256, sha256_pallas

    rng = np.random.default_rng(12)
    msgs = jnp.asarray(rng.integers(0, 1 << 32, size=(16, 64), dtype=np.uint32))
    state = [jnp.broadcast_to(h, (64,)) for h in sha256.H0]
    w = [msgs[i] for i in range(16)]
    got = jnp.stack(sha256_pallas._compress_unrolled(state, w))
    want = jnp.stack(sha256._compress(state, w))
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_pallas_call_plumbing_interpret(monkeypatch):
    """Grid indexing + padding via interpret-mode pallas_call (small)."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    rng = np.random.default_rng(13)
    n = 2 * pallas_ops._BLK + 100  # multi-block grid + lane padding
    a = _pack(_rand_vals(rng, n))
    b = _pack(_rand_vals(rng, n))
    got = pallas_ops.mul(a, b)
    want = ops._mul_core(a, b)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fold_kernel_math_parity():
    """The fused fold kernel body == fri._fold_codeword's jnp math."""
    from multilinear_tpu import fri as fri_mod

    rng = np.random.default_rng(14)
    m = 512
    code = _pack(_rand_vals(rng, m))
    tw = _pack(_rand_vals(rng, m // 2))
    r = jnp.asarray(limbs.pack_scalar(Fp(987654321987654321)))
    h = jnp.asarray(limbs.pack_scalar(TWO_INV))

    class _Ref:
        """Minimal ref shim so the kernel body runs as plain jnp."""

        def __init__(self, arr):
            self.arr = arr

        def __getitem__(self, i):
            return self.arr[i]

    out = np.zeros((8, m // 2), np.uint32)

    class _Out:
        def __setitem__(self, i, v):
            out[i] = np.asarray(v)

    half = m // 2
    rh = ops.mul(r.reshape(8, 1), h.reshape(8, 1))[:, 0]  # r * 2^{-1}
    pallas_ops._fold_kernel(
        _Ref(code[:, :half]),
        _Ref(code[:, half:]),
        _Ref(tw),
        _Ref(rh.reshape(8, 1)),
        _Out(),
    )
    want = fri_mod._fold_codeword(code, tw, r, h)
    assert np.array_equal(out, np.asarray(want))


def test_fold_commit_kernel_math_parity():
    """The fused fold+leaf-hash kernel body == fold + Merkle leaf hashing."""
    from multilinear_tpu import fri as fri_mod
    from multilinear_tpu.sha256 import limbs_to_words, sha256_words

    rng = np.random.default_rng(15)
    m = 512
    q = m // 4
    code = _pack(_rand_vals(rng, m))
    tw = _pack(_rand_vals(rng, m // 2))
    r = jnp.asarray(limbs.pack_scalar(Fp(246813579246813579)))
    h = jnp.asarray(limbs.pack_scalar(TWO_INV))
    rh = ops.mul(r.reshape(8, 1), h.reshape(8, 1))[:, 0]

    class _Ref:
        def __init__(self, arr):
            self.arr = arr

        def __getitem__(self, i):
            return self.arr[i]

    pairs = np.zeros((8, 2, q), np.uint32)
    digs = np.zeros((8, q), np.uint32)

    class _Pairs:
        def __setitem__(self, key, v):
            i, k = key
            pairs[i, k] = np.asarray(v)

    class _Digs:
        def __setitem__(self, i, v):
            digs[i] = np.asarray(v)

    pallas_ops._fold_commit_kernel(
        _Ref(code.reshape(8, 4, q)),
        _Ref(tw.reshape(8, 2, q)),
        _Ref(rh.reshape(8, 1)),
        _Pairs(),
        _Digs(),
    )
    nxt = fri_mod._fold_codeword(code, tw, r, h)
    want_pairs = np.asarray(nxt).reshape(8, 2, q)
    assert np.array_equal(pairs, want_pairs)
    words = jnp.concatenate(
        [limbs_to_words(nxt[:, :q]), limbs_to_words(nxt[:, q:])], axis=0
    )
    want_digs = np.asarray(sha256_words(words, 8))
    assert np.array_equal(digs, want_digs)


def test_butterfly_kernel_math_parity():
    """The fused butterfly kernel body == the jnp Pease scan body math."""
    from multilinear_tpu import ntt as ntt_mod

    rng = np.random.default_rng(15)
    H, C = 4, 8
    u = _pack(_rand_vals(rng, H * C)).reshape(8, H, C)
    v = _pack(_rand_vals(rng, H * C)).reshape(8, H, C)
    tw = _pack(_rand_vals(rng, H)).reshape(8, H, 1)

    out = np.zeros((8, H, 2, C), np.uint32)

    class _Ref:
        def __init__(self, arr):
            self.arr = arr

        def __getitem__(self, i):
            return self.arr[i]

    class _Out:
        def __setitem__(self, idx, val):
            out[idx] = np.asarray(val)

    pallas_ops._butterfly_kernel(_Ref(u), _Ref(v), _Ref(tw), _Out())

    p = ops.add(u, v)
    q = ops.mul(ops.sub(u, v), jnp.broadcast_to(tw, u.shape))
    want = np.stack([np.asarray(p), np.asarray(q)], axis=2)
    assert np.array_equal(out, want)


def test_pease_pallas_path_matches_jnp(monkeypatch):
    """Interpret-mode pallas Pease scan == the jnp scan path, full stage set."""
    from jax.experimental import pallas as pl

    import multilinear_tpu.config as cfgmod
    from multilinear_tpu import ntt as ntt_mod

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    rng = np.random.default_rng(16)
    log_m, C = 4, 128
    M = 1 << log_m
    x = _pack(_rand_vals(rng, M * C)).reshape(8, M, C)
    pows = ntt_mod.gen_pows(log_m + 1)  # enough twiddles for the stage set

    want = ntt_mod._pease_axis2(x, pows, log_m)  # jnp path (pallas off on CPU)

    monkeypatch.setattr(cfgmod.get_config(), "use_pallas", True)
    got = ntt_mod._pease_axis2(x, pows, log_m)
    monkeypatch.setattr(cfgmod.get_config(), "use_pallas", None)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_pease_pallas_double_stage_matches_jnp(monkeypatch):
    """Interpret-mode fused DOUBLE-stage path == the jnp scan path.

    log_m = 5 (odd: exercises the leftover final radix-2 stage) and 6
    (even: pure double-stage scan); M >= 32 so butterfly2 is supported.
    """
    from jax.experimental import pallas as pl

    import multilinear_tpu.config as cfgmod
    from multilinear_tpu import ntt as ntt_mod
    from multilinear_tpu.field import pallas_ops as po

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    rng = np.random.default_rng(17)
    for log_m in (5, 6):
        M, C = 1 << log_m, 128
        assert po.butterfly2_supported(M, C)
        x = _pack(_rand_vals(rng, M * C)).reshape(8, M, C)
        pows = ntt_mod.gen_pows(log_m + 1)

        want = ntt_mod._pease_axis2(x, pows, log_m)  # jnp path (pallas off)

        monkeypatch.setattr(cfgmod.get_config(), "use_pallas", True)
        got = ntt_mod._pease_axis2(x, pows, log_m)
        monkeypatch.setattr(cfgmod.get_config(), "use_pallas", None)
        assert np.array_equal(np.asarray(got), np.asarray(want)), log_m


def test_butterfly_notw_parity(monkeypatch):
    """Interpret-mode parity: butterfly_notw == butterfly with all-ones
    twiddles (the final Pease stage case), real field math."""
    from jax.experimental import pallas as pl

    from multilinear_tpu.field import pallas_ops as po

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    rng = np.random.default_rng(19)
    H, C = 8, 128
    u = _pack(_rand_vals(rng, H * C)).reshape(8, H, C)
    v = _pack(_rand_vals(rng, H * C)).reshape(8, H, C)
    ones = _pack([1] * H).reshape(8, H, 1)
    want = np.asarray(po.butterfly(u, v, ones))
    got = np.asarray(po.butterfly_notw(u, v))
    assert np.array_equal(got, want)


def test_kron_mul_parity(monkeypatch):
    """Interpret-mode parity: the Pallas kron kernel equals the broadcast
    ops.mul tensor product (real field multiply)."""
    from jax.experimental import pallas as pl

    from multilinear_tpu.field import pallas_ops as po

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    rng = np.random.default_rng(31)
    m, n = 16, 256
    assert po.kron_supported(m, n)
    a = _pack(_rand_vals(rng, m))
    b = _pack(_rand_vals(rng, n))
    aa = jnp.broadcast_to(a[:, :, None], (8, m, n))
    bb = jnp.broadcast_to(b[:, None, :], (8, m, n))
    want = np.asarray(ops.mul(aa, bb).reshape(8, m * n))
    got = np.asarray(po.kron_mul(a, b))
    assert np.array_equal(got, want)


def test_zm_butterfly_multistage_parity(monkeypatch):
    """Interpret-mode parity: the multi-stage zeta/Moebius kernel equals
    the per-bit jnp loop (real field add/sub), across pass splits."""
    from jax.experimental import pallas as pl

    from multilinear_tpu.field import pallas_ops as po

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    # force multi-pass coverage at a small size (log_m=5 -> 3 passes)
    monkeypatch.setattr(po, "_ZM_BITS", 2)

    rng = np.random.default_rng(29)
    M, K = 32, 128
    x = _pack(_rand_vals(rng, M * K)).reshape(8, M, K)

    for opname, op in (("add", ops.add), ("sub", ops.sub)):
        v = jnp.asarray(x)
        log_m = 5
        for i in range(log_m):
            w = v.reshape(8, M >> (i + 1), 2, 1 << i, K)
            lo = w[:, :, 0]
            hi = op(w[:, :, 1], lo)
            v = jnp.stack([lo, hi], axis=2).reshape(8, M, K)
        want = np.asarray(v)
        got = np.asarray(po.zm_butterfly_axis2(jnp.asarray(x), log_m, op is ops.add))
        assert np.array_equal(got, want), opname


def test_twiddle_mul3_plumbing(monkeypatch):
    """Interpret-mode check of twiddle_mul3's BlockSpec plumbing (which
    Tc row / Tf row reaches which F block) with `_mul_limbs` stubbed to a
    cheap elementwise op.

    Interpret-mode execution of two CHAINED in-kernel `_mul_limbs` calls
    is pathologically slow on CPU (>10 min for a (8,16,128) input, vs
    3.7 s for one), so real-field-math parity of the composition runs on
    hardware via tools/tpu_checks.py (the 2^20/2^21 NTT checks route
    through twiddle_mul3); `_mul_limbs` itself is pinned against ops.mul
    by the kernels above.
    """
    from jax.experimental import pallas as pl

    from multilinear_tpu.field import pallas_ops as po

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    def stub_mul(al, bl):
        # limb-wise a*3 + b: non-commutative in (block, factor) pairing,
        # so any index-map mistake changes the output
        return [a * jnp.uint32(3) + b for a, b in zip(al, bl)]

    monkeypatch.setattr(po, "_mul_limbs", stub_mul)

    rng = np.random.default_rng(23)
    A, S, B = 32, 8, 128
    assert po.twiddle3_supported(A, S, B)
    F = _pack(_rand_vals(rng, A * B)).reshape(8, A, B)
    Tc = _pack(_rand_vals(rng, (A // S) * B)).reshape(8, A // S, B)
    Tf = _pack(_rand_vals(rng, S * B)).reshape(8, S, B)
    Fr = np.asarray(F).reshape(8, A // S, S, B)
    Tc_b = np.broadcast_to(np.asarray(Tc).reshape(8, A // S, 1, B), Fr.shape)
    Tf_b = np.broadcast_to(np.asarray(Tf).reshape(8, 1, S, B), Fr.shape)
    want = ((Fr * 3 + Tc_b) * 3 + Tf_b).astype(np.uint32).reshape(8, A, B)
    got3 = np.asarray(po.twiddle_mul3(F, Tc, Tf, S))
    assert np.array_equal(got3, want)
