"""Vectorized SHA-256 vs hashlib; Merkle commit/open/verify (device + host)."""

import hashlib
import random

import jax.numpy as jnp
import numpy as np

from multilinear_tpu import merkle
from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp, P
from multilinear_tpu.sha256 import (
    digest_to_bytes,
    digests_to_bytes,
    limbs_to_words,
    sha256_words,
)

rng = random.Random(99)


def _words_from_bytes(b: bytes):
    """bytes (multiple of 4) -> list of BE uint32 words."""
    return np.frombuffer(b, dtype=">u4").astype(np.uint32)


def test_sha256_single_block():
    msgs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(5)]
    words = np.stack([_words_from_bytes(m) for m in msgs], axis=1)  # (8, 5)
    out = sha256_words(jnp.asarray(words), 8)
    got = digests_to_bytes(np.asarray(out))
    for i, m in enumerate(msgs):
        assert got[i].tobytes() == hashlib.sha256(m).digest()


def test_sha256_two_blocks():
    # 64-byte message needs 2 compression blocks after padding
    msgs = [bytes(rng.randrange(256) for _ in range(64)) for _ in range(3)]
    words = np.stack([_words_from_bytes(m) for m in msgs], axis=1)  # (16, 3)
    out = sha256_words(jnp.asarray(words), 16)
    got = digests_to_bytes(np.asarray(out))
    for i, m in enumerate(msgs):
        assert got[i].tobytes() == hashlib.sha256(m).digest()


def test_sha256_multiblock_long():
    # 10 field elements = 160 bytes -> 3 blocks
    msg = bytes(rng.randrange(256) for _ in range(160))
    words = _words_from_bytes(msg).reshape(40, 1)
    out = sha256_words(jnp.asarray(words), 40)
    assert digest_to_bytes(np.asarray(out)[:, 0]) == hashlib.sha256(msg).digest()


def test_limbs_to_words_matches_le_bytes():
    vals = [rng.randrange(P) for _ in range(6)]
    arr = jnp.asarray(limbs.pack_ints(vals))
    words = np.asarray(limbs_to_words(arr))  # (4, 6)
    for i, v in enumerate(vals):
        want = np.frombuffer(Fp(v).to_bytes(), dtype=">u4").astype(np.uint32)
        assert list(words[:, i]) == list(want)


def test_device_merkle_vs_host_model():
    n = 16
    vals = [rng.randrange(P) for _ in range(n)]
    minus = [rng.randrange(P) for _ in range(n)]
    cols = jnp.asarray(
        np.stack([limbs.pack_ints(vals), limbs.pack_ints(minus)], axis=1)
    )  # (8, 2, n)
    tree = merkle.MerkleTree.commit(cols)

    # host model: leaf i = H(value_i || minus_i)
    leaves = [Fp(vals[i]).to_bytes() + Fp(minus[i]).to_bytes() for i in range(n)]
    host = merkle.MerkleHost(leaves)
    assert tree.root_bytes() == host.root()

    paths = tree.open_batch([0, 5, 15])
    for idx, p in zip([0, 5, 15], paths):
        assert p.values[0] == Fp(vals[idx]) and p.values[1] == Fp(minus[idx])
        assert p.verify(tree.root_bytes(), idx)
        assert not p.verify(tree.root_bytes(), idx ^ 1)  # wrong index rejected


def test_host_merkle_single_bytes():
    data = [bytes([v]) for v in [0, 8, 4, 1, 5, 7, 6, 1]]
    t = merkle.MerkleHost(data)
    leaf, path = t.open(5)
    assert leaf == bytes([7])
    assert merkle.MerkleHost.verify(t.root(), 5, leaf, path)
    assert not merkle.MerkleHost.verify(t.root(), 4, leaf, path)


def test_host_batched_merkle():
    b0 = [bytes([v]) for v in [0, 8, 4, 1, 5, 7, 6, 1]]
    b1 = [bytes([v]) for v in [1, 3, 2, 3, 2, 1, 2, 3]]
    t = merkle.MerkleHost.batch_commit([b0, b1])
    col, path = t.open(5)
    assert col == bytes([7]) + bytes([1])
    assert merkle.MerkleHost.verify(t.root(), 5, col, path)
    assert not merkle.MerkleHost.verify(t.root(), 1, col, path)


def test_batched_device_merkle_columns():
    """B=4 codes committed column-wise in one tree (reference batch_commit)."""
    n, B = 8, 4
    data = [[rng.randrange(P) for _ in range(n)] for _ in range(B)]
    # leaf payload order: code0[i], code1[i], ... (each one element here)
    cols = jnp.asarray(np.stack([limbs.pack_ints(d) for d in data], axis=1))
    tree = merkle.MerkleTree.commit(cols)
    leaves = [b"".join(Fp(data[b][i]).to_bytes() for b in range(B)) for i in range(n)]
    host = merkle.MerkleHost(leaves)
    assert tree.root_bytes() == host.root()
    p = tree.open(3)
    assert [v.v for v in p.values] == [data[b][3] for b in range(B)]
    assert p.verify(tree.root_bytes(), 3)


def test_chunked_commit_matches_fused(monkeypatch):
    """The chunked large-tree commit path == the fused single-program path."""
    import multilinear_tpu.merkle as mk

    vals = [Fp(i * 31 + 5) for i in range(512)]
    cols = jnp.asarray(limbs.pack_ints(vals)).reshape(8, 2, 256)
    ref = mk.MerkleTree.commit(cols)
    monkeypatch.setattr(mk, "_COMMIT_FUSE_MAX", 64)
    monkeypatch.setattr(mk, "_COMMIT_CHUNK", 64)
    got = mk.MerkleTree.commit(cols)
    assert got.root_bytes() == ref.root_bytes()
    assert len(got.layers) == len(ref.layers)
    for a, b in zip(got.layers, ref.layers):
        assert np.array_equal(np.asarray(a), np.asarray(b))
