"""Pallas (Mosaic) lane-parallel SHA-256 for Merkle layer hashing.

The jnp path (:mod:`multilinear_tpu.sha256`) runs the 64 compression
rounds under ``lax.scan``; every round streams the (8+16, N) carry through
HBM, ~100 B per lane per round - the Merkle phases of the prover are pure
HBM bandwidth at 64x the algorithmic traffic.  This kernel unrolls the 64
rounds inside one Pallas program so the chaining state and the sliding
message window live in vector registers; per lane the kernel reads the
message words once and writes the 32-byte digest once.

Bit-identical to hashlib/sha256.py (pinned by tests in interpreter mode
and the on-TPU parity checks).  Reference behavior: sequential per-item
SHA-256 in src/merkle_tree/mod.rs:178-189.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sha256 import _H0, _K

_BLK = 1024  # flat lane multiple arrays are padded to (= 8 * 128)
_SUB = 8  # minimum sublane tile: every vector op runs on (8, 128) full vregs
_SUB_MAX = 64  # SHA keeps ~80 live (sub, 128) words; cap VMEM at ~2.5 MB


def _pick_sub(m: int) -> int:
    """Largest sublane block that divides m (DMA chunks grow with sub; see
    field.pallas_ops._pick_sub for the measured copy-floor numbers)."""
    sub = _SUB_MAX
    while m % sub:
        sub //= 2
    return sub


def _rotr(x, r):
    return (x >> r) | (x << (32 - r))


def _compress_unrolled(state, w):
    """One SHA-256 compression, 64 straight-line rounds.

    state: list of 8 arrays; w: list of 16 message-word arrays (consumed).
    """
    a, b, c, d, e, f, g, h = state
    w = list(w)
    for t in range(64):
        if t >= 16:
            w1 = w[t - 15]
            w14 = w[t - 2]
            s0 = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> 3)
            s1 = _rotr(w14, 17) ^ _rotr(w14, 19) ^ (w14 >> 10)
            w.append(w[t - 16] + s0 + w[t - 7] + s1)
        wt = w[t]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + np.uint32(_K[t]) + wt
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
    return [
        state[0] + a, state[1] + b, state[2] + c, state[3] + d,
        state[4] + e, state[5] + f, state[6] + g, state[7] + h,
    ]


def _make_kernel(n_words: int):
    bit_len = 32 * n_words
    n_blocks = (n_words + 1 + 2 + 15) // 16
    total = n_blocks * 16

    def kernel(msg_ref, out_ref):
        shape = msg_ref.shape[1:]

        def const(v):
            return jnp.full(shape, np.uint32(v), jnp.uint32)

        words = [msg_ref[i] for i in range(n_words)]
        words.append(const(0x80000000))
        while len(words) < total - 2:
            words.append(const(0))
        words.append(const(bit_len >> 32))
        words.append(const(bit_len & 0xFFFFFFFF))

        state = [const(int(h)) for h in _H0]
        for blk in range(n_blocks):
            state = _compress_unrolled(state, words[16 * blk : 16 * blk + 16])
        for i in range(8):
            out_ref[i] = state[i]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_words", "sub"))
def _sha_flat(msg_words, n_words: int, sub: int = _SUB):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = msg_words.shape[1]
    grid = (m // sub,)
    return pl.pallas_call(
        _make_kernel(n_words),
        out_shape=jax.ShapeDtypeStruct((8, m, 128), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_words, sub, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (8, sub, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
    )(msg_words)


def sha256_words(msg_words, n_words: int):
    """Drop-in Pallas variant of sha256.sha256_words for (n_words, N) input."""
    assert msg_words.ndim == 2 and msg_words.shape[0] == n_words
    n = msg_words.shape[1]
    pad = (-n) % _BLK
    if pad:
        msg_words = jnp.pad(msg_words, ((0, 0), (0, pad)))
    w = msg_words.shape[1]
    out = _sha_flat(
        msg_words.reshape(n_words, w // 128, 128), n_words, sub=_pick_sub(w // 128)
    )
    out = out.reshape(8, w)
    if pad:
        out = out[:, :n]
    return out
