"""SHA-256 Merkle commitments: device-hashed layers, host path logic.

Capability parity with reference src/merkle_tree/mod.rs (commit,
batch_commit, open, batch_open, verify, batch_verify; no leaf/node domain
separation; Direction-encoded paths whose directions also re-derive the
leaf index on verify), re-architected for TPU:

* every tree level is hashed in one lane-parallel SHA-256 pass
  (:mod:`multilinear_tpu.sha256`), leaves included - the reference hashes
  sequentially per item;
* the digest layers stay on device; opening queries gathers the needed
  sibling columns for ALL queries at once, one small transfer per level;
* path verification is host-side hashlib (it is O(queries * log n)).

Leaf payloads here are field-element vectors: a leaf's message bytes are
the concatenated 16-LE-byte encodings of its elements, exactly matching the
reference's ``ReedSolomonPair`` / column byte views (src/fri/mod.rs:37-43).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .dist import device_get_tree, fetch
from .field.scalar import Fp
from .sha256 import digests_to_bytes, limbs_to_words, sha256_words

# Direction encoding, matching the reference enum (src/merkle_tree/mod.rs:13-18):
# the direction tells where the SIBLING sits relative to the path node.
RIGHT = 0  # current index even: sibling is the right child
LEFT = 1  # current index odd:  sibling is the left child


from functools import partial

import jax


def _pair_msg(cur):
    """(8, n) digest words -> (16, n/2) left||right node messages, natural
    sibling order (children 2i / 2i+1 adjacent in ``cur``).

    The naive stride-2 lane gather (pairs[:, :, 0] / [:, :, 1]) costs
    ~14 ms at 2^21 nodes on the v5e - XLA lowers it as a full-lane
    shuffle.  The SAME permutation expressed as a minor-dims transpose of
    128-lane blocks (lane l = i*256 + 2j + k -> row k, lane i*128 + j)
    lowers ~3x faster (tools/glue_probe.py: 14 ms -> 5 ms real cost at
    2^22).  Bit-identical outputs (asserted in the probe and pinned by
    every Merkle/golden test).

    Either form still makes XLA reserve GiB-scale temps at big widths
    (the intermediate carries a minormost dim of 2, which tile-padding
    inflates ~64x: gather form 8.2 GiB, blocked form 4.4 GiB reserved at
    2^23).  The single-chip commit paths therefore store tree levels in
    BITREV order instead (see ``_halving_walk``) and only the shard_map
    subtree bodies (small per-shard widths) still use this.
    """
    n = cur.shape[1]
    if n >= 256:
        b = cur.reshape(8, n // 256, 128, 2)
        return jnp.moveaxis(b, 3, 0).reshape(16, n // 2)
    pairs = cur.reshape(8, n // 2, 2)
    return jnp.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=0)


def _halving_walk(cur):
    """All tree levels above ``cur``, with every level stored in BITREV
    order; ``cur`` itself must already be bitrev-ordered.

    With a level stored bitrev, the two children of the node at stored
    position p sit at positions (p, p + width/2) of the level below -
    CONTIGUOUS halves, so building each level's message block is two free
    slices instead of an even/odd lane de-interleave.  This cuts the
    XLA temp reservation of a 2^23-leaf tree walk from 4.4 GiB to
    0.5 GiB and removes the residual shuffle cost per level.  The stored
    arrays are a per-level permutation of the natural-order tree: the
    digest VALUES, the root, and every opened path are identical; only
    gather positions change (see _gather_one's index mapping).
    """
    layers = []
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        msg = jnp.concatenate([cur[:, :half], cur[:, half:]], axis=0)
        cur = sha256_words(msg, 16)
        layers.append(cur)
    return tuple(layers)


@partial(jax.jit, static_argnums=(1,))
def _commit_layers(leaf_columns, B: int):
    """Hash leaves and every tree level in ONE traced computation.

    Fusing all levels into a single dispatch matters on TPU: the driver
    loop otherwise pays a host->device round trip per level, and with the
    remote-tunnel dispatch latency that dominates the hash work itself.
    Returns a tuple of (8, n_i) digest-word arrays, leaf level first:
    layer 0 in natural leaf order, upper levels in bitrev order (see
    _halving_walk).
    """
    from .mle import bit_reverse

    words = jnp.concatenate(
        [limbs_to_words(leaf_columns[:, b, :]) for b in range(B)], axis=0
    )  # (4B, n)
    cur = sha256_words(words, 4 * B)
    return (cur,) + _halving_walk(bit_reverse(cur))


@partial(jax.jit, static_argnums=(1,))
def _leaf_hashes(leaf_columns, B: int):
    """Hash the leaf level only: (8, B, n) -> (8, n) digest words."""
    words = jnp.concatenate(
        [limbs_to_words(leaf_columns[:, b, :]) for b in range(B)], axis=0
    )
    return sha256_words(words, 4 * B)


@jax.jit
def _tree_levels(leaves):
    """All levels above NATURAL-order leaf digests: (8, n) -> tuple of
    (8, n/2)... levels in BITREV order (see _halving_walk)."""
    from .mle import bit_reverse

    return _halving_walk(bit_reverse(leaves))


@jax.jit
def _halving_level_chunk(lo, hi):
    """One bitrev-level chunk: digests of H(lo[i] || hi[i])."""
    return sha256_words(jnp.concatenate([lo, hi], axis=0), 16)


# Above this leaf count the single fused commit program exceeds the
# backend's per-program resource budget (the axon TPU rejects programs
# whose live allocations total ~2 GiB with RESOURCE_EXHAUSTED, while the
# same buffers and the same work split across dispatches are fine).
# Chunk the leaf hashing and the big levels into bounded dispatches and
# fuse only the small tail of the tree.
_COMMIT_FUSE_MAX = 1 << 23
_COMMIT_CHUNK = 1 << 22


def _commit_layers_chunked(leaf_columns, B: int):
    """Chunked commit as traceable ops (callers decide the jit boundary).

    Layer 0 natural, upper levels bitrev (see _halving_walk); the bitrev
    pairing makes the big-level chunking two contiguous half-slices per
    chunk instead of even-offset pair windows.
    """
    from .mle import bit_reverse

    n = leaf_columns.shape[-1]
    leaf_digs = [
        _leaf_hashes(leaf_columns[:, :, s : s + _COMMIT_CHUNK], B)
        for s in range(0, n, _COMMIT_CHUNK)
    ]
    leaf_level = jnp.concatenate(leaf_digs, axis=1)
    layers = [leaf_level]
    cur = bit_reverse(leaf_level)
    # big levels: one bounded program per chunk
    while cur.shape[1] > _COMMIT_FUSE_MAX:
        half = cur.shape[1] // 2
        step = _COMMIT_CHUNK
        outs = [
            _halving_level_chunk(cur[:, s : s + step], cur[:, half + s : half + s + step])
            for s in range(0, half, step)
        ]
        cur = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        layers.append(cur)
    layers.extend(_halving_walk(cur))
    return tuple(layers)


# The oversized layer-0 commit as ONE device program: the eager chunk walk
# above costs ~9 tunnel dispatches at 2^24 leaves (~10 ms latency each -
# measured 0.27 s of the 2^24 prove's commit_l0 phase); fused it is one
# dispatch with the same bounded chunk schedule.  Gated on
# config.stream_oversized exactly like the streamed oversized rounds, so
# the RESOURCE_EXHAUSTED retry path falls back to the eager chunks.
_commit_layers_chunked_fused = partial(jax.jit, static_argnums=(1,))(
    _commit_layers_chunked
)


def _rev_idx(idx, bits: int):
    """Bit-reverse an int32 index array within ``bits`` bits (traced)."""
    out = jnp.zeros_like(idx)
    for b in range(bits):
        out = out | (((idx >> b) & 1) << (bits - 1 - b))
    return out


def _gather_one(layers, leaf_columns, idx, bitrev_levels: bool):
    if leaf_columns.ndim == 2:
        # flat (8, m) codeword standing in for its (8, 2, m/2) pair view
        # (stored flat so the streamed big rounds output ONE buffer; the
        # reshape here is free inside the gather jit)
        leaf_columns = leaf_columns.reshape(8, 2, leaf_columns.shape[1] // 2)
    vals = jnp.take(leaf_columns, idx, axis=2)
    sibs = []
    cur = idx
    for l, layer in enumerate(layers[:-1]):
        pos = cur ^ 1
        if bitrev_levels and l > 0:
            # upper levels are stored bitrev (see _halving_walk): node i
            # of a width-w level sits at stored position rev_log2(w)(i)
            pos = _rev_idx(pos, layer.shape[1].bit_length() - 1)
        sibs.append(jnp.take(layer, pos, axis=1))
        cur = cur // 2
    return vals, jnp.stack(sibs, axis=0)


@partial(jax.jit, static_argnums=(3,))
def _gather_openings(layers, leaf_columns, idx, bitrev_levels: bool):
    """Leaf payloads + sibling digests for ALL queries in one dispatch.

    idx: (nq,) int32 leaf indices.  Returns ((8, B, nq) values,
    (L, 8, nq) sibling digests stacked over levels) - exactly TWO arrays,
    so the host pays two transfers per tree instead of one per level.
    """
    return _gather_one(layers, leaf_columns, idx, bitrev_levels)


@partial(jax.jit, static_argnums=(3,))
def _gather_openings_multi(layers_per_tree, leaf_cols_per_tree, idx_per_tree, bitrev_flags):
    """Query openings for MANY trees in one dispatch (tuple pytree args).

    The FRI query phase opens every fold layer's tree at related indices;
    batching all trees into one launch removes a per-tree dispatch
    round-trip (the remote-tunnel latency otherwise dominates).
    ``bitrev_flags``: per-tree level-storage-order flags (static)."""
    return tuple(
        _gather_one(ls, lc, ix, br)
        for ls, lc, ix, br in zip(
            layers_per_tree, leaf_cols_per_tree, idx_per_tree, bitrev_flags
        )
    )


class MerkleTree:
    """Binary SHA-256 tree over a power-of-two number of leaves.

    ``leaf_columns`` holds the committed payload as limb arrays of shape
    (8, B, n) - B field elements per leaf, leaf index on the last axis.
    """

    def __init__(self, layers, leaf_columns, bitrev_levels: bool = True):
        self.layers = layers  # list of (8, n_i) digest word arrays, leaf level first
        # (8, B, n) limb array; a flat (8, 2n) codeword is also accepted
        # as shorthand for its B=2 pair view (reshaped lazily in the
        # gather jits - lets streamed rounds output a single buffer)
        self.leaf_columns = leaf_columns
        # True: upper levels stored in bitrev order (every single-chip
        # commit path, see _halving_walk); False: natural order (the
        # shard_map per-shard subtree bodies).  Storage order only -
        # digest values, root and opened paths are identical either way.
        self.bitrev_levels = bitrev_levels
        self._root_bytes = None

    # -- commitment ---------------------------------------------------------
    @staticmethod
    def commit(leaf_columns) -> "MerkleTree":
        """Commit to leaves whose payload is B field elements each.

        leaf_columns: (8, B, n) limb array; leaf i's message is the
        concatenation of the B elements' 16-LE-byte encodings (so B=2 gives
        the FRI pair leaves; B=2*batch gives column-batched commitment,
        reference src/merkle_tree/mod.rs:92-131).  One fused device
        dispatch hashes every level.
        """
        _, B, n = leaf_columns.shape
        assert n & (n - 1) == 0, "leaf count must be a power of two"
        if n > _COMMIT_FUSE_MAX:
            from .config import get_config

            fn = (
                _commit_layers_chunked_fused
                if get_config().stream_oversized
                else _commit_layers_chunked
            )
            return MerkleTree(list(fn(leaf_columns, B)), leaf_columns)
        return MerkleTree(list(_commit_layers(leaf_columns, B)), leaf_columns)

    # -- accessors -----------------------------------------------------------
    @property
    def num_leaves(self) -> int:
        return self.layers[0].shape[1]

    def root_bytes(self) -> bytes:
        if self._root_bytes is None:
            self._root_bytes = digests_to_bytes(fetch(self.layers[-1]))[0].tobytes()
        return self._root_bytes

    # -- opening -------------------------------------------------------------
    def open_batch(self, indices: Sequence[int]) -> List["MerklePath"]:
        """Open many indices at once: ONE device dispatch gathers all leaf
        payloads and sibling digests for every query and level."""
        idx = np.asarray(list(indices), dtype=np.int32)
        vals_dev, sibs_dev = device_get_tree(
            _gather_openings(
                tuple(self.layers), self.leaf_columns, jnp.asarray(idx),
                self.bitrev_levels,
            )
        )
        return _assemble_paths(vals_dev, sibs_dev, idx)

    @staticmethod
    def open_batch_many(trees: Sequence["MerkleTree"], idx_lists) -> List[List["MerklePath"]]:
        """Open several trees at once in ONE device dispatch."""
        idx_arrays = [np.asarray(list(il), dtype=np.int32) for il in idx_lists]
        outs = _gather_openings_multi(
            tuple(tuple(t.layers) for t in trees),
            tuple(t.leaf_columns for t in trees),
            tuple(jnp.asarray(ix) for ix in idx_arrays),
            tuple(t.bitrev_levels for t in trees),
        )
        # ONE bulk device->host fetch for every tree's gathered arrays: per-
        # array np.asarray would pay a tunnel round-trip each (~8 trees x 2
        # arrays dominated the whole query phase at 2^20).
        outs = device_get_tree(outs)
        return [
            _assemble_paths(vals, sibs, ix)
            for (vals, sibs), ix in zip(outs, idx_arrays)
        ]

    def open(self, index: int) -> "MerklePath":
        return self.open_batch([index])[0]


def _assemble_paths(vals_dev, sibs_dev, idx: np.ndarray) -> List["MerklePath"]:
    """Host assembly of MerklePath objects from gathered device arrays."""
    vals = np.asarray(vals_dev)  # (8, B, nq)
    B = vals.shape[1]
    from .field.limbs import unpack_ints

    ints = unpack_ints(vals)  # (B, nq) Python ints
    sibs = np.asarray(sibs_dev)  # (L, 8, nq)
    sib_bytes_per_level = [digests_to_bytes(sibs[l]) for l in range(sibs.shape[0])]

    paths = []
    for q in range(len(idx)):
        path = []
        cur_i = int(idx[q])
        for sb in sib_bytes_per_level:
            direction = RIGHT if cur_i % 2 == 0 else LEFT
            path.append((sb[q].tobytes(), direction))
            cur_i //= 2
        leaf_vals = [Fp(int(ints[b, q])) for b in range(B)]
        paths.append(MerklePath(leaf_vals, path))
    return paths


@dataclass
class MerklePath:
    """Inclusion path: leaf payload + (sibling digest, direction) per level.

    Matches reference MerkleInclusionPath (src/merkle_tree/mod.rs:20-24);
    ``verify`` recomputes both the root and the index from the directions
    (src/merkle_tree/mod.rs:216-246).
    """

    values: List[Fp]  # the leaf's field elements
    path: List[Tuple[bytes, int]]  # (sibling digest bytes, LEFT/RIGHT)

    def leaf_bytes(self) -> bytes:
        return b"".join(v.to_bytes() for v in self.values)

    def verify(self, root: bytes, index: int) -> bool:
        from . import native

        ok, computed_index = native.merkle_verify(
            self.leaf_bytes(),
            [sib for sib, _ in self.path],
            [d for _, d in self.path],
            root,
        )
        return ok and computed_index == index


class FieldHostTree:
    """Host tree over field-element column leaves (native SHA-256 core).

    Same API as :class:`MerkleTree` (root_bytes / num_leaves / open_batch /
    open) so protocol drivers can switch to the host path once folded
    arrays are small - the tail layers of FRI are tiny and a device
    round-trip per layer costs more than hashing a few thousand leaves on
    the host.  ``columns``: B arrays of (n, 16) LE field bytes (or lists of
    Fp, converted); leaf i = H(col_0[i] || col_1[i] || ...).
    """

    def __init__(self, columns):
        from . import native

        cols = []
        for c in columns:
            if isinstance(c, np.ndarray):
                cols.append(np.ascontiguousarray(c, dtype=np.uint8))
            else:
                cols.append(native.ints_to_bytes_arr([Fp(v).v for v in c]))
        n = cols[0].shape[0]
        assert n & (n - 1) == 0 and n > 0, "leaf count must be a power of two"
        assert all(c.shape == (n, 16) for c in cols)
        self.columns = cols
        msgs = np.concatenate(cols, axis=1)  # (n, 16*B)
        leaves = native.sha256_many(msgs)
        self.layers = native.merkle_layers(leaves)

    @property
    def num_leaves(self) -> int:
        return self.layers[0].shape[0]

    def root_bytes(self) -> bytes:
        return self.layers[-1][0].tobytes()

    def open_batch(self, indices: Sequence[int]) -> List["MerklePath"]:
        return [self.open(i) for i in indices]

    def open(self, index: int) -> "MerklePath":
        path = []
        cur = index
        for layer in self.layers[:-1]:
            sib = cur ^ 1
            path.append((layer[sib].tobytes(), RIGHT if cur % 2 == 0 else LEFT))
            cur //= 2
        values = [Fp(int.from_bytes(c[index].tobytes(), "little")) for c in self.columns]
        return MerklePath(values, path)


# ---------------------------------------------------------------------------
# host-side generic byte-leaf tree (small inputs, tests, arbitrary payloads)
# ---------------------------------------------------------------------------


class MerkleHost:
    """Plain host Merkle over arbitrary byte-string leaves (hashlib).

    Functional parity with reference Merkle::commit/open for non-field
    payloads; the device tree above is the production path.
    """

    def __init__(self, data: List[bytes]):
        n = len(data)
        assert n & (n - 1) == 0 and n > 0, "leaf count must be a power of two"
        self.data = list(data)
        layers = [[hashlib.sha256(d).digest() for d in data]]
        while len(layers[-1]) > 1:
            prev = layers[-1]
            layers.append(
                [hashlib.sha256(prev[i] + prev[i + 1]).digest() for i in range(0, len(prev), 2)]
            )
        self.layers = layers

    @staticmethod
    def batch_commit(batches: List[List[bytes]]) -> "MerkleHost":
        """Column-wise batched commit: leaf i = H(b_0[i] || b_1[i] || ...).

        Reference: src/merkle_tree/mod.rs:92-131.
        """
        n = len(batches[0])
        assert all(len(b) == n for b in batches), "all batches must have the same length"
        joined = [b"".join(b[i] for b in batches) for i in range(n)]
        t = MerkleHost(joined)
        t.columns = [[b[i] for b in batches] for i in range(n)]
        return t

    def root(self) -> bytes:
        return self.layers[-1][0]

    def open(self, index: int):
        path = []
        cur = index
        for layer in self.layers[:-1]:
            sib = cur ^ 1
            path.append((layer[sib], RIGHT if cur % 2 == 0 else LEFT))
            cur //= 2
        return self.data[index], path

    @staticmethod
    def verify(root: bytes, index: int, leaf: bytes, path) -> bool:
        h = hashlib.sha256(leaf).digest()
        computed_index = 0
        for i, (sib, direction) in enumerate(path):
            if direction == LEFT:
                computed_index += 1 << i
                h = hashlib.sha256(sib + h).digest()
            else:
                h = hashlib.sha256(h + sib).digest()
        return h == root and computed_index == index
