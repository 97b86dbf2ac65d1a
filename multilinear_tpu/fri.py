"""FRI low-degree test: device fold + lane-parallel Merkle, host queries.

Protocol parity with reference src/fri/mod.rs: pair leaves
(value = p(g^i), minus_value = p(-g^i) = p(g^{i+n/2})), the fold
next(x^2) = ((p(x)+p(-x)) + r*(p(x)-p(-x))*g^{-i*2^k}) / 2, one Merkle root
absorbed per layer, 128 transcript-drawn query indices with 8-LE-byte
absorption (quirk Q5), and the redundant ``last_random`` transcript
fingerprint checked at the end.

TPU-first architecture: every fold step is ONE fused elementwise pass over
the codeword (split halves, twiddle multiply from a strided slice of the
inverse power table, linear combine); every Merkle layer hashes in one
lane-parallel SHA-256 pass.  The reference walks elements one at a time
(src/fri/mod.rs:96-114).  Queries gather all 128 sibling columns per level
in a single device gather (merkle.MerkleTree.open_batch).  Only Merkle
roots (32 bytes/round) and challenges (16 bytes/round) cross the
host<->device boundary during folding.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .field import limbs, ops
from .dist import device_get_tree, fetch
from .field.scalar import Fp, P, TWO_INV, pow2_generator
from .merkle import FieldHostTree, MerklePath, MerkleTree
from .ntt import LOG_BLOWUP, inv_gen_pows
from .transcript import Transcript

NUM_QUERIES = 128  # reference src/fri/mod.rs:17

# Codewords at or below this length fold and hash on the host: the tail
# layers are tiny and a per-layer device round-trip + per-shape compile
# costs more than a few thousand host multiplies/hashes.  Tunable via
# config.ProverConfig.host_threshold.
def HOST_THRESHOLD():
    from .config import get_config

    return get_config().host_threshold


class FriError(Exception):
    pass


def _rh_scalar(r_limbs, half_limbs):
    """(8,) limbs of r * 2^{-1}: ONE scalar field multiply, traced.

    The fold formula ((a+b) + r*(a-b)*tw) / 2 is computed as
    half(a+b) + (a-b)*tw*(r/2): the division by two becomes a multiply-
    free shift-add (ops.half) and the r and 1/2 scalars collapse into one
    broadcast factor - 2 full-size field multiplies per output instead
    of 3.  Same canonical field value (pinned byte-identical by tests).
    """
    return ops.mul(r_limbs.reshape(8, 1), half_limbs.reshape(8, 1))[:, 0]


@jax.jit
def _fold_codeword(code, twiddles, r_limbs, half_limbs):
    """One FRI fold: code (8, m) -> (8, m/2).

    next[i] = ((a+b) + r * (a-b) * tw[i]) * 1/2 with a = code[i],
    b = code[i + m/2], tw[i] = g^{-i*2^k} (strided inverse power table);
    evaluated in the 2-multiply form (see _rh_scalar).
    """
    m = code.shape[-1]
    half = m // 2
    if code.ndim == 2 and half >= 4096:
        from .config import pallas_enabled

        if pallas_enabled():
            from .field import pallas_ops

            return pallas_ops.fold_codeword(code, twiddles, r_limbs, half_limbs)
    a, b = code[..., :half], code[..., half:]
    even = ops.half(ops.add(a, b))
    odd = ops.mul(ops.sub(a, b), twiddles)
    rb = ops.broadcast_scalar(_rh_scalar(r_limbs, half_limbs), odd.shape[1:])
    return ops.debug_guard(ops.add(even, ops.mul(rb, odd)), "FRI fold")


def _commit_code(code) -> MerkleTree:
    """Merkle-commit a codeword as (value, minus_value) pair leaves
    (reference commit_rs_code, src/fri/mod.rs:46-56).

    The pair view IS the codeword buffer: (8, m) reshaped to (8, 2, m/2)
    pairs leaf i with i + m/2 at zero copy (a stack would retain a full
    duplicate of every layer's codeword for the query phase - 2x the
    codeword footprint at 2^24, where HBM is the binding constraint).
    """
    half = code.shape[-1] // 2
    return MerkleTree.commit(code.reshape(8, 2, half))


@jax.jit
def _fold_and_commit(code, twiddles, r_limbs, half_limbs):
    """Fold + pair + hash every Merkle level in ONE device dispatch.

    Keeps the per-round host<->device traffic to a single launch; with
    remote-tunnel dispatch latency this beats separate fold/commit calls.
    On single-chip TPU the fold and the leaf hashing run as ONE fused
    Pallas pass (pallas_ops.fold_commit_leaves): the folded codeword is
    hashed while still in vregs instead of being re-read from HBM.
    """
    from .merkle import _commit_layers, _tree_levels

    if code.ndim == 2 and code.shape[-1] // 2 >= 4096:
        from .config import pallas_enabled

        if pallas_enabled():
            from .field import pallas_ops

            if pallas_ops.fold_commit_supported(code.shape[-1]):
                pairs, leaf = pallas_ops.fold_commit_leaves(
                    code, twiddles, r_limbs, half_limbs
                )
                layers = (leaf,) + _tree_levels(leaf)
                return pairs.reshape(8, code.shape[-1] // 2), pairs, layers

    nxt = _fold_codeword(code, twiddles, r_limbs, half_limbs)
    half_n = nxt.shape[-1] // 2
    pairs = nxt.reshape(8, 2, half_n)  # zero-copy pair view (see _commit_code)
    layers = _commit_layers(pairs, 2)
    return nxt, pairs, layers


@partial(jax.jit, static_argnums=(4,))
def _fold_and_commit_k(code, inv_pows, r_limbs, half_limbs, k: int):
    """_fold_and_commit with the stride-2^k twiddle slice done IN-JIT
    (eager per-round slicing costs a tunnel dispatch each)."""
    half = code.shape[-1] // 2
    return _fold_and_commit(code, inv_pows[:, :: 1 << k][:, :half], r_limbs, half_limbs)


@partial(jax.jit, static_argnums=(4,))
def _fold_codeword_k(code, inv_pows, r_limbs, half_limbs, k: int):
    half = code.shape[-1] // 2
    return _fold_codeword(code, inv_pows[:, :: 1 << k][:, :half], r_limbs, half_limbs)


@jax.jit
def _fold_halves(a, b, twiddles, r_limbs, half_limbs):
    """The fold formula on explicit halves - the bounded per-chunk program
    of the big-round path (2-multiply form, see _rh_scalar)."""
    even = ops.half(ops.add(a, b))
    odd = ops.mul(ops.sub(a, b), twiddles)
    rb = ops.broadcast_scalar(_rh_scalar(r_limbs, half_limbs), odd.shape[1:])
    return ops.add(even, ops.mul(rb, odd))


@partial(jax.jit, static_argnums=(4, 5))
def _fold_codeword_chunked_kernel(code, inv_pows, r_limbs, half_limbs, k: int, C: int):
    """Chunked oversized-codeword fold as ONE bounded program.

    Chunks are a static-unrolled loop of strided lax.slice windows written
    into the output with dynamic_update_slice - the live set stays at the
    input + output + one chunk's temporaries (the earlier per-chunk eager
    slices queued ~12 programs each holding the 1 GiB codeword, which is
    exactly what dies when a co-tenant spikes HBM).  The strided slice of
    the inverse power table replaces materializing the full stride-2^k
    twiddle view.
    """
    m = code.shape[-1]
    half = m // 2
    out = jnp.zeros(code.shape[:-1] + (half,), jnp.uint32)
    for ci in range(half // C):
        s = ci * C
        a = jax.lax.slice_in_dim(code, s, s + C, axis=-1)
        b = jax.lax.slice_in_dim(code, half + s, half + s + C, axis=-1)
        tw = jax.lax.slice(
            inv_pows, (0, s << k), (8, (s + C) << k), (1, 1 << k)
        )
        out = jax.lax.dynamic_update_slice(
            out, _fold_halves(a, b, tw, r_limbs, half_limbs), (0, s)
        )
    return out


def _fold_codeword_chunked(code, inv_pows, r_limbs, half_limbs, k: int):
    """Fold an oversized codeword with a bounded-memory program.

    Bit-identical to _fold_codeword (pinned by tests)."""
    from .config import get_config

    C = get_config().kernel_chunk
    half = code.shape[-1] // 2
    if half % C:  # tiny test configs: per-chunk dispatches
        tw = inv_pows[:, :: 1 << k][:, :half] if k else inv_pows[:, :half]
        outs = [
            _fold_halves(
                code[..., s : s + min(C, half - s)],
                code[..., half + s : half + s + min(C, half - s)],
                tw[..., s : s + min(C, half - s)],
                r_limbs,
                half_limbs,
            )
            for s in range(0, half, C)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return _fold_codeword_chunked_kernel(code, inv_pows, r_limbs, half_limbs, k, C)


@partial(jax.jit, static_argnums=(3,))
def _device_fri_round(code, inv_pows, tr_state, k: int):
    """One COMPLETE standalone-FRI round on device: draw the fold
    challenge from the on-device transcript (clone-finalize, quirk Q1),
    fold + commit, absorb the new root.  Zero host synchronization."""
    from . import device_transcript as dtr
    from .field.scalar import TWO_INV as _TI

    r = dtr.challenge(tr_state)
    half = code.shape[-1] // 2
    tw = inv_pows[:, :: 1 << k][:, :half]
    half_limbs = jnp.asarray(limbs.pack_scalar(_TI))
    nxt, pairs, layers = _fold_and_commit(code, tw, r, half_limbs)
    tr2 = dtr.absorb_words(tr_state, layers[-1][:, 0])
    return nxt, pairs, layers, tr2


@partial(jax.jit, static_argnums=(3,))
def _device_fri_round2(code, inv_pows, tr_state, k: int):
    """TWO consecutive streamed FRI rounds in one device program (same op
    sequence as two ``_device_fri_round`` dispatches - bit-identical; see
    pcs._device_pcs_round2 for the rationale)."""
    from . import device_transcript as dtr
    from .field.scalar import TWO_INV as _TI

    half_limbs = jnp.asarray(limbs.pack_scalar(_TI))
    r = dtr.challenge(tr_state)
    half = code.shape[-1] // 2
    tw = inv_pows[:, :: 1 << k][:, :half]
    nxt, pairs_a, layers_a = _fold_and_commit(code, tw, r, half_limbs)
    tr = dtr.absorb_words(tr_state, layers_a[-1][:, 0])

    r2 = dtr.challenge(tr)
    tw2 = inv_pows[:, :: 1 << (k + 1)][:, : half // 2]
    nxt2, pairs_b, layers_b = _fold_and_commit(nxt, tw2, r2, half_limbs)
    tr = dtr.absorb_words(tr, layers_b[-1][:, 0])
    return nxt2, (pairs_a, layers_a), (pairs_b, layers_b), tr


@partial(jax.jit, static_argnums=(3,))
def _device_fri_round4(code, inv_pows, tr_state, k: int):
    """FOUR consecutive streamed FRI rounds in one device program.

    Mid-size gate and rationale exactly as pcs._device_pcs_round4: the
    tunnel's dispatch floor dominates rounds whose fold+hash compute is a
    few ms, and XLA:CPU compile cost keeps this TPU-only
    (config.stream_round_quad_max_code).
    """
    from . import device_transcript as dtr
    from .field.scalar import TWO_INV as _TI

    half_limbs = jnp.asarray(limbs.pack_scalar(_TI))
    outs = []
    cur, tr = code, tr_state
    for i in range(4):
        r = dtr.challenge(tr)
        half = cur.shape[-1] // 2
        tw = inv_pows[:, :: 1 << (k + i)][:, :half]
        cur, pairs, layers = _fold_and_commit(cur, tw, r, half_limbs)
        tr = dtr.absorb_words(tr, layers[-1][:, 0])
        outs.append((pairs, layers))
    return cur, tuple(outs), tr


def _device_fri_rounds(data: "FriProverData", transcript: Transcript) -> int:
    """Stream as many plain-FRI rounds as possible entirely on device.

    Leaves ``data`` and the caller's transcript exactly as the host path
    would (bit-identical).  Returns the number of rounds done."""
    from . import device_transcript as dtr
    from .config import get_config

    blowup = 1 << LOG_BLOWUP
    if data._current_host is not None or data._current is None:
        return 0
    try:
        tr_state = dtr.state_from_host(transcript)
    except ValueError:
        return 0
    inv_pows = inv_gen_pows(data._log_domain)
    done = 0
    while True:
        m = data._current.shape[-1]
        half = m // 2
        if not (half > blowup and half > HOST_THRESHOLD()):
            break
        k = data._log_domain - (m.bit_length() - 1)
        quarter = half // 2
        # multi-chip fast path: shard_map round with per-shard local
        # kernels (parallel/sharded_rounds.py), exactly as the PCS rounds
        if get_config().shard_map_rounds is not False:
            from . import stats
            from .parallel.sharded_rounds import make_fri_round, mesh_of

            mesh = mesh_of(data._current)
            D = mesh.size if mesh is not None else 0
            if (
                mesh is not None
                and quarter >= D
                and quarter % D == 0
                and half % D == 0
                and m // D <= get_config().fused_round_max_code
            ):
                nxt, pairs, layers, tr_state = make_fri_round(mesh)(
                    data._current, inv_pows, tr_state, k
                )
                stats.bump("fri_rounds_shard_map")
                data._current = nxt
                # shard_map subtree levels are stored in NATURAL order
                data.trees.append(MerkleTree(list(layers), pairs, bitrev_levels=False))
                done += 1
                continue
        if m > get_config().fused_round_max_code:
            break
        from .config import stream_round_quad_value

        quad_max = stream_round_quad_value()
        if (
            get_config().stream_round_pairs
            and quad_max
            and m <= quad_max
            and all(
                (half >> i) > blowup and (half >> i) > HOST_THRESHOLD()
                for i in range(1, 4)
            )
        ):
            from . import stats

            nxt, quad_outs, tr_state = _device_fri_round4(
                data._current, inv_pows, tr_state, k
            )
            data._current = nxt
            for pairs_i, layers_i in quad_outs:
                data.trees.append(MerkleTree(list(layers_i), pairs_i))
            stats.bump("fri_rounds_streamed_quad", 4)
            done += 4
            continue
        if (
            get_config().stream_round_pairs
            and half <= get_config().fused_round_max_code
            and quarter > blowup
            and quarter > HOST_THRESHOLD()
        ):
            nxt, (pairs_a, layers_a), (pairs_b, layers_b), tr_state = (
                _device_fri_round2(data._current, inv_pows, tr_state, k)
            )
            data._current = nxt
            data.trees.append(MerkleTree(list(layers_a), pairs_a))
            data.trees.append(MerkleTree(list(layers_b), pairs_b))
            done += 2
            continue
        nxt, pairs, layers, tr_state = _device_fri_round(
            data._current, inv_pows, tr_state, k
        )
        data._current = nxt
        data.trees.append(MerkleTree(list(layers), pairs))
        done += 1
    if done:
        tr_h = device_get_tree(tr_state)
        transcript._state = dtr.state_to_host(tr_h)._state
    return done


@jax.jit
def _absorb_root_device(tr_state, root_words):
    """Absorb an (8,) root-word vector into a device transcript state."""
    from . import device_transcript as dtr

    return dtr.absorb_words(tr_state, root_words)


def _host_commit_code(code_bytes: np.ndarray) -> FieldHostTree:
    half = code_bytes.shape[0] // 2
    return FieldHostTree([code_bytes[:half], code_bytes[half:]])


class FriProverData:
    """Prover state: one codeword + Merkle tree per fold layer.

    The codeword lives on device while large (fused fold kernel +
    lane-parallel hashing) and moves to the host - as an (n, 16) LE byte
    array driven through the native runtime - once it shrinks below
    HOST_THRESHOLD.
    """

    def __init__(self):
        self.trees: List = []  # MerkleTree (device) or FieldHostTree
        self.last_element: Optional[Fp] = None
        self._log_domain: int = 0
        self._current = None  # device (8, m) array
        self._current_host: Optional[np.ndarray] = None  # (m, 16) uint8
        # Zero-sync init (init(defer_absorb=True)): a device transcript
        # state with the L0 root already absorbed, while the HOST
        # transcript has NOT been advanced.  Consumed by the streamed
        # round driver (which syncs the host transcript when it fetches
        # the final round state); any host-driven consumer must call
        # ensure_transcript() first.
        self._pending_tr_state = None

    def _maybe_to_host(self) -> None:
        if self._current_host is None and self._current.shape[-1] <= HOST_THRESHOLD():
            raw = limbs.to_le_bytes(fetch(self._current))
            self._current_host = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 16).copy()
            self._current = None

    @staticmethod
    def init(code, transcript: Transcript, defer_absorb: bool = False) -> "FriProverData":
        """Commit to the initial codeword and absorb the root.

        ``defer_absorb``: absorb the root into a DEVICE transcript state
        instead of fetching it to the host - ``root_bytes()`` is a
        device_get round trip (~9-26 ms over the tunnel) and the ONLY
        hard host sync between encode and the streamed rounds.  The host
        transcript catches up when the round driver fetches the final
        round state (or via ``ensure_transcript``).  Transcript bytes are
        identical either way (pinned by the golden/parity tests).
        """
        n = code.shape[-1]
        assert n & (n - 1) == 0, "input size must be a power of two"
        data = FriProverData()
        data._log_domain = n.bit_length() - 1
        data._current = code
        data._maybe_to_host()
        if data._current_host is not None:
            tree = _host_commit_code(data._current_host)
            data.trees.append(tree)
            transcript.absorb(tree.root_bytes())
            return data
        tree = _commit_code(code)
        data.trees.append(tree)
        if defer_absorb:
            from . import device_transcript as dtr

            try:
                tr_state = dtr.state_from_host(transcript)
            except ValueError:
                pass  # non-word-aligned: fall through to the host absorb
            else:
                data._pending_tr_state = _absorb_root_device(
                    tr_state, tree.layers[-1][:, 0]
                )
                return data
        transcript.absorb(tree.root_bytes())
        return data

    def ensure_transcript(self, transcript: Transcript) -> None:
        """Materialize a deferred L0-root absorb into the HOST transcript.

        Must be called before any host-driven transcript use (host round
        fallback, checkpoint save) when ``init(defer_absorb=True)`` was
        used and the streamed rounds have not run yet."""
        if self._pending_tr_state is not None:
            self._pending_tr_state = None
            transcript.absorb(self.trees[0].root_bytes())

    @staticmethod
    def init_from_host_bytes(code_bytes: np.ndarray, transcript: Transcript) -> "FriProverData":
        """init() for a codeword already materialized as (n, 16) LE bytes
        on the host (the fully-host prover path - native.encode_mle)."""
        n = code_bytes.shape[0]
        assert n & (n - 1) == 0
        data = FriProverData()
        data._log_domain = n.bit_length() - 1
        data._current_host = np.ascontiguousarray(code_bytes)
        tree = _host_commit_code(data._current_host)
        data.trees.append(tree)
        transcript.absorb(tree.root_bytes())
        return data

    def _fold_host(self, k: int, r: Fp) -> np.ndarray:
        from . import native

        inv_gen = pow2_generator(self._log_domain).inv().v
        step = pow(inv_gen, 1 << k, P)
        return native.fri_fold(self._current_host, r.v, step)

    def fold_step(self, k: int, r: Fp, transcript: Transcript) -> None:
        """Fold the current codeword with challenge r; commit or finish.

        Reference fold_step (src/fri/mod.rs:79-134); the tail-indexed
        inverse twiddle gen_pows[len - i*2^k] equals inv_gen^(i*2^k), read
        here as a strided slice of the inverse power table.
        """
        blowup = 1 << LOG_BLOWUP
        if self._current_host is not None:
            m = self._current_host.shape[0]
            if m <= blowup:
                return
            nxt_host = self._fold_host(k, r)
            self._current_host = nxt_host
            half = m // 2
            if half == blowup:
                if not bool(np.all(nxt_host == nxt_host[0])):
                    raise FriError("not an RS code")
                first = Fp(int.from_bytes(nxt_host[0].tobytes(), "little"))
                self.last_element = first
                transcript.absorb(first.to_bytes())
                return
            tree = _host_commit_code(nxt_host)
            self.trees.append(tree)
            transcript.absorb(tree.root_bytes())
            return

        code = self._current
        m = code.shape[-1]
        if m <= blowup:
            return
        half = m // 2
        inv_pows = inv_gen_pows(self._log_domain)  # (8, 2^(log_domain-1))
        r_limbs = jnp.asarray(limbs.pack_scalar(r))
        half_limbs = jnp.asarray(limbs.pack_scalar(TWO_INV))
        from .config import get_config

        if m > get_config().fused_round_max_code:
            # oversized round: bounded chunked fold + chunked commit
            nxt = _fold_codeword_chunked(code, inv_pows, r_limbs, half_limbs, k)
            self._current = nxt
            tree = MerkleTree.commit(nxt.reshape(8, 2, half // 2))
            self.trees.append(tree)
            transcript.absorb(tree.root_bytes())
            return
        if half > HOST_THRESHOLD() and half > blowup:
            # fused fold + full Merkle commit: one device dispatch per round
            nxt, pairs, layers = _fold_and_commit_k(code, inv_pows, r_limbs, half_limbs, k)
            self._current = nxt
            tree = MerkleTree(list(layers), pairs)
            self.trees.append(tree)
            transcript.absorb(tree.root_bytes())
            return
        nxt = _fold_codeword_k(code, inv_pows, r_limbs, half_limbs, k)
        self._current = nxt
        self._maybe_to_host()
        if half == blowup:
            if self._current_host is not None:
                ch = self._current_host
                if not bool(np.all(ch == ch[0])):
                    raise FriError("not an RS code")
                first = Fp(int.from_bytes(ch[0].tobytes(), "little"))
            else:
                vals = limbs.unpack_ints(fetch(nxt))
                first = Fp(int(vals[0]))
                if not all(int(v) == first.v for v in vals):
                    raise FriError("not an RS code")
            self.last_element = first
            transcript.absorb(first.to_bytes())
            return
        if self._current_host is not None:
            tree = _host_commit_code(self._current_host)
        else:
            tree = _commit_code(nxt)
        self.trees.append(tree)
        transcript.absorb(tree.root_bytes())

    @staticmethod
    def fold(code, transcript: Transcript) -> "FriProverData":
        """init + all fold rounds, drawing one challenge per round
        (reference src/fri/mod.rs:136-145).

        Streams complete rounds on device (Fiat-Shamir included) whenever
        shapes fit; host-driven rounds cover the oversized head and the
        tiny tail.  Transcripts are bit-identical either way (pinned)."""
        data = FriProverData.init(code, transcript)
        num_steps = code.shape[-1].bit_length() - 1 - LOG_BLOWUP
        k = 0
        while k < num_steps:
            done = _device_fri_rounds(data, transcript)
            if done:
                k += done
                continue
            r = transcript.next_challenge()
            data.fold_step(k, r, transcript)
            k += 1
        assert data.last_element is not None
        return data

    def fold_roots(self) -> List[bytes]:
        # bulk-fetch all device trees' root digests in one transfer before
        # the per-tree root_bytes() calls (which would each pay a tunnel
        # round-trip for 32 bytes).
        pending = [
            t for t in self.trees
            if isinstance(t, MerkleTree) and t._root_bytes is None
        ]
        if pending:
            from .sha256 import digests_to_bytes

            fetched = device_get_tree(tuple(t.layers[-1] for t in pending))
            for t, words in zip(pending, fetched):
                t._root_bytes = digests_to_bytes(words)[0].tobytes()
        return [t.root_bytes() for t in self.trees]

    def open_queries(self, indices: Sequence[int]) -> List["QueryProof"]:
        """Open many query indices at once: all device trees' gathers run
        in ONE dispatch, host trees open locally.

        Per-query index halves each layer (reference open_query_at,
        src/fri/mod.rs:154-174: current_index %= current_n after halving).
        """
        idx_per_tree = []
        cur = list(indices)
        cur_n = self.trees[0].num_leaves
        for _ in self.trees:
            idx_per_tree.append(cur)
            cur_n //= 2
            cur = [c % cur_n for c in cur]

        dev_pos = [i for i, t in enumerate(self.trees) if isinstance(t, MerkleTree)]
        per_layer_paths: List[Optional[List[MerklePath]]] = [None] * len(self.trees)
        if dev_pos:
            dev_paths = MerkleTree.open_batch_many(
                [self.trees[i] for i in dev_pos], [idx_per_tree[i] for i in dev_pos]
            )
            for i, paths in zip(dev_pos, dev_paths):
                per_layer_paths[i] = paths
        for i, tree in enumerate(self.trees):
            if per_layer_paths[i] is None:
                per_layer_paths[i] = tree.open_batch(idx_per_tree[i])
        return [
            QueryProof([per_layer_paths[l][q] for l in range(len(self.trees))])
            for q in range(len(indices))
        ]

    def open_query_at(self, index: int) -> "QueryProof":
        return self.open_queries([index])[0]


def _batch_verify_paths(queries, indices, commitments, n: int) -> None:
    """Verify every (query, layer) Merkle inclusion path in ONE native call.

    Expected per-layer indices are the deterministic halving walk of each
    query index (reference open_query_at, src/fri/mod.rs:154-174), so they
    are computable without the fold values.  Raises FriError exactly where
    the per-layer walk would.
    """
    from . import native

    items = []
    for query, idx in zip(queries, indices):
        if len(query.paths) != len(commitments):
            raise FriError("wrong number of paths")
        cur, cn = idx, n
        for path, root in zip(query.paths, commitments):
            items.append(
                (
                    path.leaf_bytes(),
                    [s for s, _ in path.path],
                    [d for _, d in path.path],
                    root,
                )
            )
            cn //= 2
            cur %= max(cn, 1)
    results = native.merkle_verify_many(items)
    k = 0
    for q, (query, idx) in enumerate(zip(queries, indices)):
        cur, cn = idx, n
        for i in range(len(query.paths)):
            ok, got_idx = results[k]
            k += 1
            if not ok or got_idx != cur:
                raise FriError(f"inclusion path failed at layer {i}")
            cn //= 2
            cur %= max(cn, 1)


def _layer_inv_gens(gen: Fp, n_layers: int) -> List[Fp]:
    """[gen^(-2^i) for i in range(n_layers)]: ONE inversion, then squarings."""
    inv = gen.inv()
    out = [inv]
    for _ in range(n_layers - 1):
        inv = inv * inv
        out.append(inv)
    return out


@dataclass
class QueryProof:
    """One Merkle pair-path per fold layer (reference QueryProof)."""

    paths: List[MerklePath]

    def verify(
        self,
        commitments: Sequence[bytes],
        last_element: Fp,
        n: int,
        index: int,
        gen: Fp,
        random_elements: Sequence[Fp],
        inv_gens: Sequence[Fp] = None,
        paths_preverified: bool = False,
    ) -> None:
        """Walk the layers recomputing the fold (reference src/fri/mod.rs:183-237).

        ``n`` is the pair count of layer 0 (codeword/2); ``gen`` the full-
        domain generator.  Raises FriError on mismatch.

        ``inv_gens``: optional per-layer INVERSE generators (inv_gens[i] =
        gen^(-2^i)), shared across the 128 queries by verify_queries.  The
        reference divides by 2*gen^index per layer
        (src/fri/mod.rs:199-205) - one modular inversion per (query,
        layer), ~3000 per proof at 2^24; with the inverse generator the
        identical value is TWO_INV * inv_gen_i^index, needing ONE
        inversion per proof.  Acceptance is unchanged (same field value).

        ``paths_preverified``: the caller already checked every layer's
        inclusion path + index (the batched native call in verify_queries);
        skip the per-layer path walk here.
        """
        if len(self.paths) != len(commitments):
            raise FriError("wrong number of paths")
        if inv_gens is None:
            inv_gens = _layer_inv_gens(gen, len(commitments))
        # the walk runs on raw canonical ints mod p (exact Python bigint
        # arithmetic = Fp semantics without per-op wrapper objects: the Fp
        # churn was ~40% of verify time at 128 queries x 24 layers)
        from .field.scalar import P as _P

        two_inv = TWO_INV.v
        inv_gens_v = [g.v for g in inv_gens]
        randoms_v = [r.v for r in random_elements]
        last_v = last_element.v
        current_n = n
        current_index = index
        for i, (path, root) in enumerate(zip(self.paths, commitments)):
            if not paths_preverified and not path.verify(root, current_index):
                raise FriError(f"inclusion path failed at layer {i}")
            value, minus_value = path.values[0].v, path.values[1].v
            even = (value + minus_value) * two_inv % _P
            odd = (
                (value - minus_value)
                * two_inv
                * pow(inv_gens_v[i], current_index, _P)
                % _P
            )
            folded = (even + randoms_v[i] * odd) % _P
            if i == len(self.paths) - 1:
                if last_v != folded:
                    raise FriError(f"query mismatch at last layer {i}")
                break
            next_index = current_index % (current_n // 2)
            next_path = self.paths[i + 1]
            next_value = (
                next_path.values[0].v
                if next_index == current_index
                else next_path.values[1].v
            )
            if next_value != folded:
                raise FriError(f"query mismatch at layer {i}")
            current_n //= 2
            current_index = next_index


@dataclass
class FriProof:
    """commitments + queries + final constant + transcript fingerprint
    (reference FriProof, src/fri/mod.rs:240-248)."""

    commitments: List[bytes]
    queries: List[QueryProof]
    last_elem: Fp
    last_random: bytes

    @staticmethod
    def prove(code, transcript: Transcript) -> "FriProof":
        """Fold + 128 transcript-drawn queries (reference src/fri/mod.rs:261-285)."""
        domain_size = code.shape[-1]
        data = FriProverData.fold(code, transcript)
        indices = []
        for _ in range(NUM_QUERIES):
            idx = transcript.random_index(domain_size // 2)
            indices.append(idx)
            transcript.absorb_index(idx)
        queries = data.open_queries(indices)
        return FriProof(
            commitments=data.fold_roots(),
            queries=queries,
            last_elem=data.last_element,
            last_random=transcript.random(),
        )

    def verify(self) -> None:
        """Standalone verification with a fresh transcript
        (reference src/fri/mod.rs:311-340)."""
        if len(self.queries) != NUM_QUERIES:
            raise FriError("wrong number of queries")
        transcript = Transcript()
        random_elements = []
        for root in self.commitments:
            transcript.absorb(root)
            random_elements.append(transcript.next_challenge())
        transcript.absorb(self.last_elem.to_bytes())
        self.verify_queries(transcript, random_elements)

    def verify_queries(self, transcript: Transcript, random_elements: Sequence[Fp]) -> None:
        log_domain_size = len(self.commitments) + LOG_BLOWUP
        domain_size = 1 << log_domain_size
        gen = pow2_generator(log_domain_size)
        inv_gens = _layer_inv_gens(gen, len(self.commitments))
        n = domain_size // 2
        # draw all indices first (transcript-identical: nothing inside the
        # per-query verification touches the transcript), then check every
        # (query, layer) inclusion path in ONE batched native call
        indices = []
        for _ in self.queries:
            idx = transcript.random_index(n)
            transcript.absorb_index(idx)
            indices.append(idx)
        _batch_verify_paths(self.queries, indices, self.commitments, n)
        for query, idx in zip(self.queries, indices):
            query.verify(
                self.commitments, self.last_elem, n, idx, gen, random_elements,
                inv_gens=inv_gens, paths_preverified=True,
            )
        if self.last_random != transcript.random():
            raise FriError("incompatible last_random transcript fingerprint")


def _coeffs_for_fri_impl(evals):
    from .mle import bit_reverse, to_coeffs

    coeffs = bit_reverse(to_coeffs(evals))
    pad_width = [(0, 0)] * coeffs.ndim
    pad_width[-1] = (0, ((1 << LOG_BLOWUP) - 1) * coeffs.shape[-1])
    return jnp.pad(coeffs, pad_width)


# Moebius transform + coefficient bit-reversal + zero-pad.  Kept as its
# OWN jit, separate from the NTT scan: program boundaries force standard
# layouts, which stops XLA from assigning the pad a limb-minor layout
# (a 16x tile-padding blowup at 2^24).
_coeffs_for_fri = jax.jit(_coeffs_for_fri_impl)


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _coeffs_for_fri_sharded(mesh):
    """_coeffs_for_fri pinned to hand its output back hypercube-sharded on
    ``mesh`` so the sharded four-step NTT receives a sharded buffer
    (unconstrained, GSPMD sometimes replicates the pad's output)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from .parallel import ROWS

    out = NamedSharding(mesh, PartitionSpec(None, ROWS))
    return jax.jit(_coeffs_for_fri_impl, out_shardings=out)


def encode_mle_for_fri(evals):
    """eval form -> bit-reversed coefficient form -> RS codeword.

    The coefficient bit-reversal aligns FRI's even/odd low-bit split with
    sumcheck's MSB top/bottom-half fold (reference
    multilinear_pcs.rs:101-107, Q8).

    On a >1-device mesh the whole pipeline stays hypercube-sharded: the
    Moebius/pad program pins a sharded output and the four-step NTT runs
    with last-axis sharding constraints (local sub-NTTs, one all-to-all
    at the central transpose - ntt._fourstep_sharded_jit).
    """
    from .field.scalar import pow2_generator
    from .ntt import fourstep_transform

    mesh = None
    if not isinstance(evals, jax.core.Tracer):
        from .parallel.sharded_rounds import mesh_of

        mesh = mesh_of(evals)
    if mesh is not None and mesh.size > 1:
        padded = _coeffs_for_fri_sharded(mesh)(evals)
    else:
        mesh = None
        padded = _coeffs_for_fri(evals)
    log_m = padded.shape[-1].bit_length() - 1
    return fourstep_transform(
        padded, pow2_generator(log_m).v, log_m, donate=True, mesh=mesh
    )
