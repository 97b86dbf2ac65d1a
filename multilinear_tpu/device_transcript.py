"""Fiat-Shamir transcript ops ON DEVICE.

The host transcript (transcript.py) is the protocol's source of truth; its
midstate (8 chaining words + partial block + length) can hop INTO these
pure-jax ops so that a whole prover round - absorb round-poly coefficients,
derive the challenge, fold, commit, absorb the root - runs as one device
program with no host synchronization.  The host only re-imports the state
when the device phase ends.  Bit-compatibility with the host SHA-256 is
pinned by tests.

Restrictions: absorbs must be 4-byte-aligned (every protocol absorb is 16,
32 or 8 bytes); the partial block at hop time must hold a whole number of
words (callers fall back to host rounds otherwise).

State pytree: (st (8,) uint32, buf (16,) uint32 BE words,
nwords () int32 filled, total_words () int32 absorbed).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sha256 import _compress


def fresh_state():
    return (
        jnp.asarray(np.array([
            0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
            0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], np.uint32)),
        jnp.zeros(16, jnp.uint32),
        jnp.int32(0),
        jnp.int32(0),
    )


def state_from_host(transcript) -> Tuple:
    """Export a host Transcript's midstate into device arrays.

    Raises ValueError if the partial block is not word-aligned.
    """
    st, buf, total = transcript.export_state()
    if len(buf) % 4 != 0 or total % 4 != 0:
        raise ValueError("transcript midstate is not word-aligned")
    words = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
    wbuf = np.zeros(16, np.uint32)
    wbuf[: len(words)] = words
    return (
        jnp.asarray(np.asarray(st, np.uint32)),
        jnp.asarray(wbuf),
        jnp.int32(len(words)),
        jnp.int32(total // 4),
    )


def state_to_host(state):
    """Import a device transcript state back into a host Transcript."""
    from .transcript import Transcript

    st, buf, nwords, total_words = (np.asarray(x) for x in state)
    n = int(nwords)
    partial_bytes = buf[:n].astype(">u4").tobytes()
    return Transcript.import_state(st, partial_bytes, int(total_words) * 4)


def _compress_words(st, block_words):
    """block_words: (16,) uint32 -> new (8,) uint32 state."""
    out = _compress([st[i] for i in range(8)], [block_words[i] for i in range(16)])
    return jnp.stack(out)


def absorb_words(state, words):
    """Absorb a STATIC number of 32-bit BE words (k <= 16).

    Equivalent to host transcript.absorb of the same bytes.
    """
    st, buf, nwords, total_words = state
    k = words.shape[0]
    assert k <= 16
    # place the new words after the current fill inside a 32-word window
    window = jnp.zeros(32, jnp.uint32)
    window = jax.lax.dynamic_update_slice(window, buf, (0,))
    window = jax.lax.dynamic_update_slice(window, words, (nwords,))
    new_fill = nwords + k

    def with_compress(args):
        st, window, new_fill = args
        st2 = _compress_words(st, window[:16])
        rest = window[16:]
        return st2, rest, new_fill - 16

    def without(args):
        st, window, new_fill = args
        return st, window[:16], new_fill

    st, buf, nwords = jax.lax.cond(
        new_fill >= 16, with_compress, without, (st, window, new_fill)
    )
    return st, buf, nwords, total_words + k


def digest_words(state):
    """Finalize a CLONE of the state -> (8,) uint32 digest words.

    Matches hashlib SHA-256 of the absorbed bytes (the state itself does
    not advance - quirk Q1 semantics live here).
    """
    st, buf, nwords, total_words = state
    # two-block tail: block 1 = buf + 0x80...0 pad (+ length if it fits),
    # block 2 = zeros + length (used when nwords > 13)
    tail = jnp.zeros(32, jnp.uint32)
    tail = jax.lax.dynamic_update_slice(tail, buf, (0,))
    tail = jax.lax.dynamic_update_slice(
        tail, jnp.asarray([0x80000000], jnp.uint32), (nwords,)
    )
    # bitlen = total_words * 32 as a 64-bit quantity split into two u32 words
    tw = total_words.astype(jnp.uint32)
    hi = tw >> 27
    lo = tw << 5
    one_block = nwords <= 13
    # place the length at words (14,15) or (30,31)
    pos = jnp.where(one_block, 14, 30)
    tail = jax.lax.dynamic_update_slice(tail, jnp.stack([hi, lo]), (pos,))
    st1 = _compress_words(st, tail[:16])
    st2 = _compress_words(st1, tail[16:])
    return jnp.where(one_block, st1, st2)


def challenge(state):
    """next_challenge on device: first 16 digest bytes, LE u128, mod p.

    Returns an (8,) limb vector (16-bit limbs).  Does not advance the state.
    """
    d = digest_words(state)  # (8,) BE words; bytes 0..15 are words 0..3
    limbs_out = []
    for k in range(8):
        b0 = (d[k // 2] >> (8 * (3 - (2 * k) % 4))) & 0xFF
        b1 = (d[k // 2] >> (8 * (3 - (2 * k + 1) % 4))) & 0xFF
        limbs_out.append(b0 | (b1 << 8))
    x = jnp.stack(limbs_out)  # (8,) value < 2^128
    # reduce into [0, p): one conditional subtract (2^128 < 2p)
    from .field.ops import _canon_sub_p, _split

    return jnp.stack(_canon_sub_p(_split(x.reshape(8, 1))), axis=0)[:, 0]


def absorb_field_limbs(state, limb_vec):
    """Absorb one field element given as an (8,) limb vector (16 LE bytes)."""
    from .sha256 import limbs_to_words

    return absorb_words(state, limbs_to_words(limb_vec.reshape(8, 1))[:, 0])
