"""Lane-parallel SHA-256 on the TPU VPU.

Merkle layer hashing is one of the two bulk workloads of the prover (the
other is field multiplication).  The reference hashes leaves one at a time
on the CPU (src/merkle_tree/mod.rs:178-189); here a whole layer of N
messages is hashed in ONE fused elementwise pass: every one of the 64
SHA-256 rounds is ~12 uint32 lane ops applied to N-wide vectors, so the
hash throughput scales with VPU width instead of clock speed.

Data layout: a block batch is ``(16, N)`` uint32 big-endian message words
(word axis 0, lanes on axis 1+), chaining state is ``(8, N)``.  Multi-block
messages iterate the compression over a static block count.

The digest equals byte-for-byte standard SHA-256 of the corresponding
message bytes - verified against hashlib in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)

H0 = [jnp.uint32(int(h)) for h in _H0]


def _rotr(x, r):
    return (x >> r) | (x << (32 - r))


def _compress(state, w):
    """One SHA-256 compression via lax.scan over the 64 rounds.

    state: list of 8 arrays; w: list of 16 message-word arrays.  The scan
    keeps the traced graph constant-size (~25 ops) instead of unrolling
    64 rounds - XLA compile time on the limb/word kernels is the build's
    scarce resource, not runtime.  The message schedule is carried as a
    sliding 16-word window.
    """
    window = jnp.stack(w, axis=0)  # (16,) + S
    st = jnp.stack(state, axis=0)  # (8,) + S
    k_table = jnp.asarray(_K)  # (64,)
    ts = jnp.arange(64, dtype=jnp.int32)

    def body(carry, t):
        st, window = carry
        # schedule: for t >= 16 compute from the window, else window[0] is w_t
        w0, w1, w9, w14 = window[0], window[1], window[9], window[14]
        s0 = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> 3)
        s1 = _rotr(w14, 17) ^ _rotr(w14, 19) ^ (w14 >> 10)
        w_next = w0 + s0 + w9 + s1  # becomes w_{t+16}
        w_t = window[0]

        a, b, c, d, e, f, g, h = (st[i] for i in range(8))
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + k_table[t] + w_t
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        new_st = jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g], axis=0)
        new_window = jnp.concatenate([window[1:], w_next[None]], axis=0)
        return (new_st, new_window), None

    (st, _), _ = jax.lax.scan(body, (st, window), ts)
    return [state[i] + st[i] for i in range(8)]


@partial(jax.jit, static_argnums=(1,))
def sha256_words(msg_words, n_words: int):
    """SHA-256 of word-aligned messages.

    ``msg_words``: (n_words,) + S uint32 big-endian words (message byte
    length = 4*n_words, same for every lane).  Returns (8,) + S digest words.
    """
    S = msg_words.shape[1:]
    if len(S) == 1 and S[0] >= 512:
        from .config import pallas_enabled

        if pallas_enabled():
            from . import sha256_pallas

            return sha256_pallas.sha256_words(msg_words, n_words)
    bit_len = 32 * n_words
    # number of 64-byte blocks after the mandatory 0x80... + 8-byte length pad
    n_blocks = (n_words + 1 + 2 + 15) // 16
    total = n_blocks * 16

    def const(v):
        return jnp.broadcast_to(jnp.uint32(v), S)

    words = [msg_words[i] for i in range(n_words)]
    words.append(const(0x80000000))
    while len(words) < total - 2:
        words.append(const(0))
    words.append(const(bit_len >> 32))
    words.append(const(bit_len & 0xFFFFFFFF))

    state = [jnp.broadcast_to(h, S) for h in H0]
    for blk in range(n_blocks):
        state = _compress(state, words[16 * blk : 16 * blk + 16])
    return jnp.stack(state, axis=0)


def limbs_to_words(a):
    """(8,)+S field limb array (16-bit LE limbs) -> (4,)+S big-endian SHA words.

    Matches hashing the element's 16 little-endian bytes (quirk Q9).
    """
    out = []
    for j in range(4):
        l0 = a[2 * j]
        l1 = a[2 * j + 1]
        w = (
            ((l0 & 0xFF) << 24)
            | ((l0 >> 8) << 16)
            | ((l1 & 0xFF) << 8)
            | (l1 >> 8)
        )
        out.append(w)
    return jnp.stack(out, axis=0)


def digest_to_bytes(words) -> bytes:
    """(8,) uint32 digest words -> 32 bytes (big-endian per word)."""
    return np.asarray(words, dtype=">u4").tobytes()


def digests_to_bytes(words) -> np.ndarray:
    """(8, N) digest words -> (N, 32) uint8."""
    w = np.asarray(words)  # (8, N)
    return np.ascontiguousarray(w.T).astype(">u4").view(np.uint8).reshape(w.shape[1], 32)
