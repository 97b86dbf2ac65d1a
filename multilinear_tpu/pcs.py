"""FRI-based multilinear polynomial commitment scheme (PCS).

Proves p(inputs) = output for one MLE by running sumcheck over
sum_x eq(inputs, x) * p(x) = output while folding the Reed-Solomon
codeword of p with the SAME per-round challenge - each sumcheck challenge
doubles as the FRI fold challenge (reference src/fri/multilinear_pcs.rs).

Wire/transcript schedule (must match the reference bit-for-bit):
  absorb(root_0);
  per round k: absorb(round-poly nonzero coeffs), r_k = challenge,
               fold sumcheck tables AND FRI codeword with r_k,
               absorb(root_{k+1}) (or last_elem on the final round);
  then 128 queries as plain FRI.

The final verifier link: eq(inputs, randoms) * last_elem == s_last(r_last)
(reference multilinear_pcs.rs:179-184).

Device work per round: one fused partial-sum kernel + two fold kernels +
one Merkle layer hash; the host only sees O(1) field elements per round.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp

from .dist import device_get_tree
from .field import limbs, ops
from .field.scalar import Fp, TWO_INV
from .fri import (
    FriError,
    FriProof,
    FriProverData,
    HOST_THRESHOLD,
    NUM_QUERIES,
    _fold_and_commit,
    encode_mle_for_fri,
)
from .merkle import MerkleTree
from .mle import eq_scalar
from .ntt import LOG_BLOWUP, inv_gen_pows
from .sumcheck import SumcheckPoly, SumcheckTables, _fold_kernel, identity_composition
from .transcript import Transcript


@partial(jax.jit, static_argnums=(5,))
def _pcs_round_tail(data, code, inv_pows, r_limbs, half_limbs, k: int):
    """Everything after the challenge, in ONE device dispatch: fold the
    packed sumcheck table, fold the codeword, hash the next Merkle tree.

    The twiddle slice (stride 2^k of the inverse power table) happens
    INSIDE the jit: eager per-round slicing costs a device dispatch each
    over the remote tunnel.
    """
    half = code.shape[-1] // 2
    twiddles = inv_pows[:, :: 1 << k][:, :half]
    new_data = _fold_kernel(data, r_limbs)
    nxt, pairs, layers = _fold_and_commit(code, twiddles, r_limbs, half_limbs)
    return new_data, nxt, pairs, layers


def _stride_pow2_slice(arr, k: int):
    """arr[:, ::2**k] without the stride-2^k lane gather.

    Expressed as k blocked minor-dims de-interleaves (each takes the even
    component of a 128-lane-block transpose) - the direct strided slice
    lowers as a full-lane shuffle, ~3x slower at big sizes
    (tools/glue_probe.py).  Identical values.
    """
    for _ in range(k):
        n = arr.shape[1]
        if n >= 256:
            b = arr.reshape(8, n // 256, 128, 2)
            arr = jnp.moveaxis(b, 3, 1)[:, 0].reshape(8, n // 2)
        else:
            arr = arr[:, 0::2]
    return arr


def _round_scalars(sums, prev_sum, tr_state):
    """Traced scalar tail of a PCS round: interpolate the degree-2 round
    polynomial from its sums at X=1,2, absorb the nonzero coefficients,
    draw the challenge, and advance the running sum.

    Shared verbatim between the dense and the chunked (oversized) round
    programs so both trace the identical op sequence.
    """
    from . import device_transcript as dtr
    from .field import limbs as _limbs

    s1, s2 = sums[:, 0], sums[:, 1]
    s0 = ops.sub(prev_sum.reshape(8, 1), s1.reshape(8, 1))[:, 0]
    # degree-2 interpolation over {0,1,2}: c2 = (s2 - 2 s1 + s0)/2,
    # c1 = s1 - s0 - c2, c0 = s0
    inv2 = ops.broadcast_scalar(jnp.asarray(_limbs.pack_scalar(TWO_INV)), ())
    a = ops.add(s2.reshape(8, 1), s0.reshape(8, 1))
    b = ops.add(s1.reshape(8, 1), s1.reshape(8, 1))
    c2 = ops.mul(ops.sub(a, b), inv2.reshape(8, 1))[:, 0]
    c1 = ops.sub(
        ops.sub(s1.reshape(8, 1), s0.reshape(8, 1)), c2.reshape(8, 1)
    )[:, 0]

    tr = dtr.absorb_field_limbs(tr_state, c1)
    tr = dtr.absorb_field_limbs(tr, c2)
    r = dtr.challenge(tr)

    # new_prev = s0 + r*(c1 + r*c2)
    rr = r.reshape(8, 1)
    inner = ops.add(c1.reshape(8, 1), ops.mul(rr, c2.reshape(8, 1)))
    new_prev = ops.add(s0.reshape(8, 1), ops.mul(rr, inner))[:, 0]
    return tr, r, c1, c2, new_prev


def _pcs_round_body(data, code, inv_pows, tr_state, prev_sum, k: int):
    """One COMPLETE PCS round as a traceable body, Fiat-Shamir included.

    Computes the round polynomial, absorbs its nonzero coefficients into
    the on-device transcript, derives the challenge, folds the sumcheck
    table and the codeword, hashes the next Merkle tree and absorbs its
    root - zero host synchronization, so consecutive rounds stream through
    the async dispatch queue and the tunnel latency overlaps with compute.

    Returns (new_data, new_code, pairs, layers, new_tr_state,
    (r, c1, c2, new_prev_sum)) with all scalars as (8,) limb vectors.
    """
    from . import device_transcript as dtr
    from .field import limbs as _limbs
    from .sumcheck import _extensions

    # round polynomial s(X) at X = 1, 2 (identity composition)
    exts = _extensions(data, 2)
    dx = jnp.stack([e[:, 1] for e in exts], axis=1)  # (8, 2, off)
    mx = jnp.stack([e[:, 0] for e in exts], axis=1)
    sums = jnp.stack(
        [ops.sum_mod(ops.mul(dx[:, i], mx[:, i]), axis=1) for i in range(2)], axis=1
    )  # (8, 2)
    tr, r, c1, c2, new_prev = _round_scalars(sums, prev_sum, tr_state)

    half_limbs = jnp.asarray(_limbs.pack_scalar(TWO_INV))
    half = code.shape[-1] // 2
    twiddles = inv_pows[:, :: 1 << k][:, :half]
    new_data = _fold_kernel(data, r)
    nxt, pairs, layers = _fold_and_commit(code, twiddles, r, half_limbs)
    tr = dtr.absorb_words(tr, layers[-1][:, 0])
    return new_data, nxt, pairs, layers, tr, (r, c1, c2, new_prev)


# Round inputs are deliberately NOT donated: every output (folded table,
# folded codeword, tree levels) is at most HALF each input's size, so XLA
# can never alias them - a donate_argnums here is a no-op that emits a
# "donated buffers were not usable" warning per shape (round-3 VERDICT
# item 8).  Same reasoning in fri.py and parallel/sharded_rounds.py.
_device_pcs_round = partial(jax.jit, static_argnums=(5,))(
    _pcs_round_body
)


@partial(jax.jit, static_argnums=(5,))
def _device_pcs_round2(data, code, inv_pows, tr_state, prev_sum, k: int):
    """TWO consecutive streamed PCS rounds in ONE device program.

    Exactly the op sequence of dispatching ``_device_pcs_round`` for k and
    then k+1 (bit-identical transcript - the body is shared verbatim), but
    one dispatch and ONE compiled program per code-size pair: halves both
    the per-round dispatch overhead and the number of distinct round
    executables a fresh process must load over the tunnel.
    """
    d1, c1, pairs_a, layers_a, tr, meta_a = _pcs_round_body(
        data, code, inv_pows, tr_state, prev_sum, k
    )
    d2, c2, pairs_b, layers_b, tr, meta_b = _pcs_round_body(
        d1, c1, inv_pows, tr, meta_a[3], k + 1
    )
    return d2, c2, (pairs_a, layers_a), (pairs_b, layers_b), tr, (meta_a, meta_b)


@partial(jax.jit, static_argnums=(5,))
def _device_pcs_round4(data, code, inv_pows, tr_state, prev_sum, k: int):
    """FOUR consecutive streamed PCS rounds in ONE device program.

    Same shared body as ``_device_pcs_round2`` (bit-identical transcript),
    gated to MID-SIZE rounds (config.stream_round_quad_max_code): the
    dispatch floor over the axon tunnel is ~9-26 ms, so for rounds whose
    per-round compute is only a few ms the dispatch count IS the cost.
    The top rounds keep the pair program (their graphs and live sets are
    the big ones), and compile cost stays bounded because the quad only
    exists at sizes where the traced bodies are small.
    """
    outs = []
    d, c, prev = data, code, prev_sum
    tr = tr_state
    for i in range(4):
        d, c, pairs, layers, tr, meta = _pcs_round_body(
            d, c, inv_pows, tr, prev, k + i
        )
        prev = meta[3]
        outs.append((pairs, layers, meta))
    return d, c, tuple(outs), tr


@partial(jax.jit, static_argnums=(5, 6))
def _device_pcs_round_big(data, code, inv_pows, tr_state, prev_sum, k: int, C: int):
    """One COMPLETE OVERSIZED PCS round on device, Fiat-Shamir included.

    Same schedule and bit-identical transcript as ``_device_pcs_round``,
    with every O(n) pass replaced by its bounded-memory chunked kernel
    (fori_loop partial sums / folds, chunked Merkle levels) so the live
    temporaries stay one ``C``-sized chunk.  This lets the two leading
    rounds at 2^24 stream through the async queue with ZERO host syncs -
    the host-driven chunked path cost ~0.34 s/round in per-round fetches
    and separate dispatches.  prove_with_retry falls back to the host-
    driven path (config.stream_oversized=False) under OOM pressure.
    """
    from . import device_transcript as dtr
    from .field import limbs as _limbs
    from .fri import _fold_codeword_chunked_kernel
    from .merkle import _commit_layers_chunked
    from .sumcheck import _chunked_fold_kernel, _chunked_partial_sums_kernel

    aux = jnp.zeros((0, 8), jnp.uint32)
    sums = _chunked_partial_sums_kernel(data, aux, C, 2, identity_composition)
    tr, r, c1, c2, new_prev = _round_scalars(sums, prev_sum, tr_state)

    half_limbs = jnp.asarray(_limbs.pack_scalar(TWO_INV))
    new_data = _chunked_fold_kernel(data, r, C)

    nxt = _fold_codeword_chunked_kernel(code, inv_pows, r, half_limbs, k, C)
    pairs = nxt.reshape(8, 2, nxt.shape[-1] // 2)
    layers = _commit_layers_chunked(pairs, 2)
    tr = dtr.absorb_words(tr, layers[-1][:, 0])
    return new_data, nxt, pairs, layers, tr, (r, c1, c2, new_prev)


@partial(jax.jit, static_argnums=(3,))
def _device_pcs_round_big_a(data, tr_state, prev_sum, C: int):
    """Sumcheck half of an oversized round: chunked partial sums, the
    Fiat-Shamir scalars, and the chunked table fold.  Split from the
    fold+commit half (``_device_pcs_round_big_b``) so each program's live
    set stays under the backend's per-program budget - the one-program
    Pallas variant OOMed at 2^25 (code + tables + pairs + digests + tree
    in one live set)."""
    from .sumcheck import _chunked_fold_kernel, _chunked_partial_sums_kernel

    aux = jnp.zeros((0, 8), jnp.uint32)
    sums = _chunked_partial_sums_kernel(data, aux, C, 2, identity_composition)
    tr, r, c1, c2, new_prev = _round_scalars(sums, prev_sum, tr_state)
    new_data = _chunked_fold_kernel(data, r, C)
    return new_data, tr, (r, c1, c2, new_prev)


# NOTE: ``code`` is NOT donated in the fold+commit programs - the Merkle
# trees alias the codeword buffer as their pair-leaf payload (see
# fri._commit_code), so the input must stay live for the query phase.
@partial(jax.jit, static_argnums=(3,))
def _device_pcs_round_big_b1(code, inv_pows, r_limbs, k: int):
    """Fold+leaf-hash of an oversized round via the fused Pallas kernel
    (grid-streamed VMEM tiles - works at any codeword size; measured
    44 ms at 2^25 vs 88+135 ms for the chunked jnp fold + commit,
    tools/pcs_round_probe.py).  Kept as its OWN program: composing it
    with the tree walk in one jit made XLA reserve 4.9 GiB of temps
    (layout blowup) and the following pair round died RESOURCE_EXHAUSTED.
    """
    from .field import pallas_ops
    from .field import limbs as _limbs

    m = code.shape[-1]
    half_limbs = jnp.asarray(_limbs.pack_scalar(TWO_INV))
    tw = _stride_pow2_slice(inv_pows, k)[:, : m // 2]
    pairs, leaf = pallas_ops.fold_commit_leaves(code, tw, r_limbs, half_limbs)
    # ONE codeword buffer out (its pair view is derived lazily in the
    # Merkle gather jits) - returning pairs AND the flat fold separately
    # retained an extra ~0.5 GiB that tipped the following pair round
    # into RESOURCE_EXHAUSTED
    return pairs.reshape(8, m // 2), leaf


@jax.jit
def _device_pcs_round_big_b2(leaf, tr_state):
    """Tree levels ABOVE the leaf digests + on-device root absorb.

    The leaf level itself is not returned (the caller already holds it
    from b1; returning an input as an output would materialize a copy)."""
    from . import device_transcript as dtr
    from .merkle import _tree_levels

    uppers = _tree_levels(leaf)
    tr = dtr.absorb_words(tr_state, uppers[-1][:, 0])
    return uppers, tr


def _device_rounds(
    tables: SumcheckTables,
    fri_data: FriProverData,
    transcript: Transcript,
    previous_sum: Fp,
    start_k: int = 0,
):
    """Run as many full PCS rounds as possible entirely on device.

    ``start_k``: the global FRI round index of the first round (the fold
    twiddle stride is 2^k relative to the ORIGINAL domain) - 0 for the
    plain PCS, 1 when resuming after the batched PCS's batched round 0.

    Returns (rounds_done, pols, new_previous_sum) and leaves both the
    tables/FRI state and the CALLER'S transcript advanced exactly as the
    host path would have (bit-identical, pinned by tests).
    """
    import numpy as np

    from . import device_transcript as dtr, stats
    from .field.limbs import unpack_int

    blowup = 1 << LOG_BLOWUP
    if tables.on_host or fri_data._current_host is not None:
        return 0, [], previous_sum
    if fri_data._pending_tr_state is not None:
        # zero-sync init: the L0 root was absorbed on device and the host
        # transcript is behind; the fetch at the end of this function
        # brings it up to date (pending cleared only if rounds ran)
        tr_state = fri_data._pending_tr_state
    else:
        try:
            tr_state = dtr.state_from_host(transcript)
        except ValueError:  # non-word-aligned prior absorbs: host rounds only
            return 0, [], previous_sum

    prev = jnp.asarray(limbs.pack_scalar(previous_sum))
    inv_pows = inv_gen_pows(fri_data._log_domain)
    outs = []
    k = 0
    from .config import get_config

    while True:
        m = fri_data._current.shape[-1]
        half = m // 2
        if not (half > blowup and half > HOST_THRESHOLD()):
            break
        cfg = get_config()
        # multi-chip fast path: shard_map round with per-shard Pallas
        # kernels (parallel/sharded_rounds.py) whenever the arrays live on
        # a >1-device mesh and every sharded axis divides the mesh
        if cfg.shard_map_rounds is not False:
            from .parallel.sharded_rounds import make_pcs_round, mesh_of

            mesh = mesh_of(fri_data._current) or mesh_of(tables.data)
            D = mesh.size if mesh is not None else 0
            d_off = tables.data.shape[-1] // 2
            q = half // 2
            rnd = None
            if (
                mesh is not None
                and q >= D
                and q % D == 0
                and d_off >= D
                and d_off % D == 0
                and half % D == 0
            ):
                if m // D <= cfg.fused_round_max_code:
                    rnd, counter = make_pcs_round(mesh), "rounds_shard_map"
                else:
                    # per-device shapes exceed the fused program budget:
                    # the chunked shard_map round (C-windowed local
                    # fori_loops, bounded live set, outputs stay sharded)
                    C = cfg.kernel_chunk
                    if (
                        cfg.stream_oversized
                        and d_off // D >= C
                        and (d_off // D) % C == 0
                        and (half // D) % C == 0
                        and (q // D) % C == 0
                    ):
                        rnd = make_pcs_round(mesh, C)
                        counter = "rounds_shard_map_oversized"
            if rnd is not None:
                new_data, nxt, pairs, layers, tr_state, meta = rnd(
                    tables.data, fri_data._current, inv_pows, tr_state, prev,
                    start_k + k,
                )
                stats.bump(counter)
                tables.apply_folded(new_data)
                fri_data._current = nxt
                # shard_map subtree levels are stored in NATURAL order
                fri_data.trees.append(MerkleTree(list(layers), pairs, bitrev_levels=False))
                prev = meta[3]
                outs.append(meta)
                k += 1
                continue
        if m > cfg.fused_round_max_code:
            C = cfg.kernel_chunk
            d_off = tables.data.shape[-1] // 2
            if (
                not cfg.stream_oversized
                or d_off < C
                or d_off % C
                or half % C
            ):
                break  # oversized round: the chunked host-driven path handles it
            from .config import pallas_enabled

            # Pallas split big round: measured ~130 ms faster at 2^24
            # (fold+leaf-hash 44 ms vs 88+135 ms chunked) but its extra
            # transient footprint loses the co-tenant HBM lottery more
            # often than the chunked program (repeated RESOURCE_EXHAUSTED
            # at the following round in this round's testing, while the
            # chunked path ran clean) - so it is opt-in until the chip's
            # ambient pressure story changes.  See config field docs.
            use_split = False
            if get_config().oversized_pallas_split and pallas_enabled():
                from .field import pallas_ops
                from .merkle import _COMMIT_FUSE_MAX

                use_split = (
                    pallas_ops.fold_commit_supported(m)
                    and m // 4 <= _COMMIT_FUSE_MAX
                )
            if use_split:
                # three bounded programs, zero host syncs between them:
                # the challenge r and the leaf digests stay on device
                new_data, tr_state, meta = _device_pcs_round_big_a(
                    tables.data, tr_state, prev, C
                )
                nxt, leaf = _device_pcs_round_big_b1(
                    fri_data._current, inv_pows, meta[0], start_k + k
                )
                uppers, tr_state = _device_pcs_round_big_b2(leaf, tr_state)
                layers = (leaf,) + tuple(uppers)
                pairs = nxt  # flat codeword; pair view derived in the gathers
                stats.bump("rounds_streamed_oversized_pallas")
            else:
                new_data, nxt, pairs, layers, tr_state, meta = _device_pcs_round_big(
                    tables.data, fri_data._current, inv_pows, tr_state, prev,
                    start_k + k, C,
                )
            stats.bump("rounds_streamed_oversized")
        else:
            # fuse FOUR rounds for mid-size codewords (the dispatch floor
            # dominates there; see _device_pcs_round4)...
            def _streams(sz: int) -> bool:
                return sz > blowup and sz > HOST_THRESHOLD()

            from .config import stream_round_quad_value

            quad_max = stream_round_quad_value()
            if (
                cfg.stream_round_pairs
                and quad_max
                and m <= quad_max
                and all(_streams(half >> i) for i in range(1, 4))
            ):
                new_data, nxt, quad_outs, tr_state = _device_pcs_round4(
                    tables.data,
                    fri_data._current,
                    inv_pows,
                    tr_state,
                    prev,
                    start_k + k,
                )
                tables.apply_folded(new_data, levels=4)
                fri_data._current = nxt
                for pairs_i, layers_i, meta_i in quad_outs:
                    fri_data.trees.append(MerkleTree(list(layers_i), pairs_i))
                    outs.append(meta_i)
                prev = quad_outs[-1][2][3]
                stats.bump("rounds_streamed", 4)
                stats.bump("rounds_streamed_quad", 4)
                k += 4
                continue
            # ...else fuse with the NEXT round when it would also stream
            # (same conditions at half the code size) - one dispatch
            quarter = half // 2
            if (
                cfg.stream_round_pairs
                and quarter > blowup
                and quarter > HOST_THRESHOLD()
            ):
                (
                    new_data,
                    nxt,
                    (pairs_a, layers_a),
                    (pairs_b, layers_b),
                    tr_state,
                    (meta_a, meta_b),
                ) = _device_pcs_round2(
                    tables.data,
                    fri_data._current,
                    inv_pows,
                    tr_state,
                    prev,
                    start_k + k,
                )
                tables.apply_folded(new_data, levels=2)
                fri_data._current = nxt
                fri_data.trees.append(MerkleTree(list(layers_a), pairs_a))
                fri_data.trees.append(MerkleTree(list(layers_b), pairs_b))
                prev = meta_b[3]
                outs.extend([meta_a, meta_b])
                stats.bump("rounds_streamed", 2)
                k += 2
                continue
            new_data, nxt, pairs, layers, tr_state, meta = _device_pcs_round(
                tables.data, fri_data._current, inv_pows, tr_state, prev, start_k + k
            )
            stats.bump("rounds_streamed")
        tables.apply_folded(new_data)
        fri_data._current = nxt
        fri_data.trees.append(MerkleTree(list(layers), pairs))
        prev = meta[3]
        outs.append(meta)
        k += 1
    if k == 0:
        return 0, [], previous_sum
    # rounds ran from the deferred state: the host transcript is synced by
    # the fetch below, so the pending absorb is consumed
    fri_data._pending_tr_state = None

    # one synchronization: fetch the round scalars + final transcript state
    fetched = device_get_tree((outs, tr_state, prev))
    outs_h, tr_h, prev_h = fetched
    pols = [
        SumcheckPoly([
            Fp(unpack_int(np.asarray(c1))),
            Fp(unpack_int(np.asarray(c2))),
        ])
        for (_r, c1, c2, _p) in outs_h
    ]
    transcript._state = dtr.state_to_host(tr_h)._state
    return k, pols, Fp(unpack_int(np.asarray(prev_h)))


def fused_pcs_fold(tables: SumcheckTables, fri_data: FriProverData, k: int, r: Fp, transcript: Transcript) -> None:
    """Fold sumcheck tables + FRI codeword with the shared challenge r.

    Uses the single-dispatch fused kernel while both live on device and
    the next layer is committed on device; falls back to the separate
    paths near the host-threshold tail.
    """
    from . import stats
    from .config import get_config

    blowup = 1 << LOG_BLOWUP
    if not tables.on_host and fri_data._current_host is None:
        m = fri_data._current.shape[-1]
        half = m // 2
        if (
            half > blowup
            and half > HOST_THRESHOLD()
            and m <= get_config().fused_round_max_code
        ):
            inv_pows = inv_gen_pows(fri_data._log_domain)
            new_data, nxt, pairs, layers = _pcs_round_tail(
                tables.data,
                fri_data._current,
                inv_pows,
                jnp.asarray(limbs.pack_scalar(r)),
                jnp.asarray(limbs.pack_scalar(TWO_INV)),
                k,
            )
            tables.apply_folded(new_data)
            fri_data._current = nxt
            tree = MerkleTree(list(layers), pairs)
            fri_data.trees.append(tree)
            transcript.absorb(tree.root_bytes())
            stats.bump("rounds_fused_tail")
            return
    stats.bump("rounds_host" if tables.on_host else "rounds_chunked_hostdriven")
    tables.fold(r)
    fri_data.fold_step(k, r, transcript)


@dataclass
class PCSProof:
    """FRI proof + sumcheck round polynomials + the claim
    (reference PCSProof, src/fri/multilinear_pcs.rs:79-87)."""

    fri_proof: FriProof
    sumcheck_polynomials: List[SumcheckPoly]
    inputs: List[Fp]
    output: Fp

    @staticmethod
    def prove(inputs: Sequence[Fp], output: Fp, evals, transcript: Transcript) -> "PCSProof":
        """``evals``: the MLE in evaluation form, (8, 2^n) device limb array.

        Reference flow: src/fri/multilinear_pcs.rs:89-136.
        """
        session = PCSProverSession(inputs, output, evals, transcript)
        session.run_rounds()
        return session.finish()


    def verify(self, transcript: Transcript) -> None:
        """Replay the interleaved transcript, telescope the sumcheck, check
        the eq-link, then verify FRI queries (reference
        src/fri/multilinear_pcs.rs:138-190)."""
        if len(self.fri_proof.queries) != NUM_QUERIES:
            raise FriError("wrong number of queries")
        n = len(self.fri_proof.commitments)
        if n != len(self.sumcheck_polynomials) or n != len(self.inputs):
            raise FriError("inconsistent proof dimensions")
        # PCS round polynomials are degree 2 (identity composition, reference
        # src/fri/multilinear_pcs.rs:56-57); a longer coefficient vector from
        # a hostile proof would loosen the sumcheck soundness bound.
        if any(len(p.nonzero_coeffs) != 2 for p in self.sumcheck_polynomials):
            raise FriError("sumcheck round polynomial exceeds degree bound")

        random_elements: List[Fp] = []
        for root, pol in zip(self.fri_proof.commitments, self.sumcheck_polynomials):
            transcript.absorb(root)
            pol.absorb_into(transcript)
            random_elements.append(transcript.next_challenge())
        transcript.absorb(self.fri_proof.last_elem.to_bytes())

        # telescoping sumcheck replay
        it = iter(self.sumcheck_polynomials)
        rit = iter(random_elements)
        pol = next(it).to_polynomial(self.output)
        for sc_pol in it:
            r = next(rit)
            pol = sc_pol.to_polynomial(pol.evaluate(r))
        r = next(rit)

        delta = eq_scalar(self.inputs, random_elements)
        if delta * self.fri_proof.last_elem != pol.evaluate(r):
            raise FriError("PCS link check failed: eq * last_elem != s_last(r)")

        self.fri_proof.verify_queries(transcript, random_elements)


class PCSProverSession:
    """Stage-by-stage PCS prover with checkpoint/resume support.

    ``PCSProof.prove`` is the one-shot wrapper; a long-running prover can
    instead run a few rounds at a time, ``save()`` to disk, and ``resume``
    later (even in another process) - the finished proof is byte-identical
    to an uninterrupted run.
    """

    def __init__(self, inputs, output, evals, transcript: Transcript):
        self.inputs = [Fp(x) for x in inputs]
        self.output = Fp(output)
        self.n_vars = len(self.inputs)
        height = evals.shape[-1]
        assert 1 << self.n_vars == height
        self.transcript = transcript
        from .utils import PhaseTimer

        pt = PhaseTimer()
        if (height << LOG_BLOWUP) <= HOST_THRESHOLD():
            # fully-host prove: encode in the native C++ runtime instead of
            # paying the XLA limb-arithmetic encode (bit-identical; at the
            # driver's TPU-free fallback size this is the 4.4 s -> ~0.1 s
            # difference)
            import numpy as np

            from . import native
            from .dist import fetch

            evals_bytes = np.frombuffer(
                limbs.to_le_bytes(fetch(evals)), dtype=np.uint8
            ).reshape(-1, 16)
            code_bytes = native.encode_mle(evals_bytes)
            pt.mark("encode")
            self.fri_data = FriProverData.init_from_host_bytes(
                code_bytes, transcript
            )
        else:
            code = encode_mle_for_fri(evals)
            pt.mark("encode", sync=code)
            # defer_absorb: the L0 root is absorbed into the DEVICE
            # transcript so no host round trip sits between the commit and
            # the streamed rounds (the only mid-prove hard sync otherwise)
            self.fri_data = FriProverData.init(code, transcript, defer_absorb=True)
            root_sync = self.fri_data.trees[0].layers[-1]
            pt.mark("commit_l0", sync=root_sync)
        if self.fri_data._current_host is not None:
            pt.mark("commit_l0")  # host commit: root_bytes was the sync
        self.tables = SumcheckTables.for_pcs(self.inputs, evals)
        if self.tables.data is not None:
            pt.mark("tables", sync=self.tables.data)
        else:
            pt.mark("tables")
        self.k = 0
        self.previous_sum = self.output
        self.pols: List[SumcheckPoly] = []

    def run_rounds(self, max_rounds: int = None) -> int:
        """Run up to ``max_rounds`` sumcheck+FRI rounds; returns rounds done."""
        end = self.n_vars if max_rounds is None else min(
            self.n_vars, self.k + max_rounds
        )
        done = 0
        # device-transcript streaming only when running to completion keeps
        # checkpoint boundaries simple; partial runs use the host path.
        # Oversized leading rounds (program budget, config
        # fused_round_max_code) run host-driven with chunked kernels; the
        # zero-sync streaming resumes as soon as shapes fit.
        from .utils import PhaseTimer

        pt = PhaseTimer()
        while self.k < end:
            if max_rounds is None:
                dev_done, dev_pols, self.previous_sum = _device_rounds(
                    self.tables,
                    self.fri_data,
                    self.transcript,
                    self.previous_sum,
                    start_k=self.k,
                )
                if dev_done:
                    self.pols.extend(dev_pols)
                    self.k += dev_done
                    done += dev_done
                    pt.mark("rounds_streaming")  # ends in its own device_get
                    continue
            # host-driven round: materialize the deferred L0-root absorb
            # into the host transcript first (no-op unless pending)
            self.fri_data.ensure_transcript(self.transcript)
            pol, r, self.previous_sum = self.tables.round_poly(
                identity_composition, 2, self.previous_sum, self.transcript
            )
            self.pols.append(pol)
            fused_pcs_fold(self.tables, self.fri_data, self.k, r, self.transcript)
            # oversized chunked rounds sync per-round via the round poly;
            # host-tail rounds are host work already
            pt.mark(
                "rounds_oversized"
                if self.tables.data is not None
                else "rounds_host_tail"
            )
            self.k += 1
            done += 1
        return done

    def finish(self) -> "PCSProof":
        assert self.k == self.n_vars
        assert self.fri_data.last_element is not None
        from .utils import PhaseTimer

        pt = PhaseTimer()
        transcript = self.transcript
        domain_size = 1 << (self.n_vars + LOG_BLOWUP)
        indices = []
        for _ in range(NUM_QUERIES):
            idx = transcript.random_index(domain_size // 2)
            indices.append(idx)
            transcript.absorb_index(idx)
        queries = self.fri_data.open_queries(indices)
        pt.mark("queries")
        fri_proof = FriProof(
            commitments=self.fri_data.fold_roots(),
            queries=queries,
            last_elem=self.fri_data.last_element,
            last_random=transcript.random(),
        )
        return PCSProof(fri_proof, self.pols, list(self.inputs), self.output)

    # -- persistence -----------------------------------------------------------
    def save(self, path: str) -> None:
        from .checkpoint import normalize_ckpt_path, save_pcs_state

        # checkpoints serialize the HOST transcript: flush any deferred
        # device-side L0-root absorb before snapshotting
        self.fri_data.ensure_transcript(self.transcript)
        path = normalize_ckpt_path(path)
        save_pcs_state(
            path,
            self.tables,
            self.fri_data,
            self.transcript,
            self.k,
            self.previous_sum,
            self.pols,
        )
        import json

        with open(path + ".claim", "w") as f:
            json.dump(
                {"inputs": [x.v for x in self.inputs], "output": self.output.v}, f
            )

    @staticmethod
    def resume(path: str) -> "PCSProverSession":
        import json

        from .checkpoint import load_pcs_state, normalize_ckpt_path

        path = normalize_ckpt_path(path)

        s = PCSProverSession.__new__(PCSProverSession)
        (
            s.tables,
            s.fri_data,
            s.transcript,
            s.k,
            s.previous_sum,
            s.pols,
        ) = load_pcs_state(path)
        with open(path + ".claim") as f:
            claim = json.load(f)
        s.inputs = [Fp(int(v)) for v in claim["inputs"]]
        s.output = Fp(int(claim["output"]))
        s.n_vars = len(s.inputs)
        return s
