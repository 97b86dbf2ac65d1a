"""The sumcheck engine: device partial-sum/fold kernels + host round driver.

Protocol semantics match the reference engine
(src/constraint_system/sumcheck.rs) exactly - same round-polynomial wire
format (constant coefficient stripped, quirk Q7), same transcript schedule
(absorb nonzero coeffs, then draw the challenge), same table fold
lo' = (1-r)*lo + r*hi pairing row i with i + h/2 (MSB fold, big-endian
variable order).

TPU-first architecture: the reference walks rows one at a time
(sumcheck.rs:204-247); here each round is TWO fused device passes over the
whole table:

* ``partial-sum``: for every X in 1..=d the tables are linearly extended to
  X (lo + X*(hi-lo), X a tiny static int so the multiply is a cheap
  ``mul_small``), the composition polynomial is evaluated columnwise on the
  VPU, weighted by the extended delta table, and reduced with the
  carry-free chunked ``sum_mod``.  All d extension points go in one kernel.
* ``fold``: lo + r*(hi-lo) on matrix and delta with the drawn challenge.

The per-round host<->device traffic is O(d) field elements (the partial
sums) plus one 16-byte challenge - the sequential Fiat-Shamir skeleton -
while all O(h*w) work stays on device.  Shapes halve every round; each
round size jit-compiles once and is cached.

Sharding: both kernels are elementwise over rows + one reduction, so under
a row-sharded mesh XLA lowers ``sum_mod`` to a local reduce + psum and the
fold's (i, i+h/2) pairing to a neighbor ppermute for the first
log(#devices) rounds (see multilinear_tpu.parallel).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .field import limbs, ops
from .dist import device_get_tree, fetch
from .field.scalar import Fp, TWO_INV, ZERO
from .mle import combine_subtables, delta_subtables
from .poly import Polynomial, PolynomialEvals
from .transcript import Transcript


@jax.jit
def _pack_tables_kernel(cols, subs):
    """Build the packed (columns || delta) table in ONE device program.

    ``cols``: (8, h) one MLE or (8, w, h) trace columns; ``subs``: the
    delta sub-tables (mle.delta_subtables).  Fusing the tensor-product
    kron levels and the concatenation removes the per-level eager
    dispatches that made table construction a 0.6 s phase at 2^24.
    """
    if cols.ndim == 2:
        cols = cols.reshape(8, 1, cols.shape[-1])
    h = cols.shape[-1]
    delta = combine_subtables(subs)
    return jnp.concatenate([cols, delta.reshape(8, 1, h)], axis=1)


def _host_delta_table(points: Sequence[Fp]):
    """eq(points, .) over {0,1}^n, big-endian doubling, as a (2^n, 16)
    byte array computed in the native runtime (Python-bigint fallback in
    native.delta_table; reference evaluation.rs:50-91 semantics)."""
    from . import native

    return native.delta_table([Fp(pt).v for pt in points])

# A composition maps a list of per-column FA arrays to one FA array.
# Mirrors the reference composition closure (sumcheck.rs:47-52) but
# vectorized over all rows.  Two calling conventions:
#   composition(cols)        - aux-free (e.g. identity_composition)
#   composition(cols, aux)   - randoms/masks arrive as TRACED aux values
# The aux form keeps the traced graph independent of the per-proof
# challenge values, so jit programs are reused across proofs (a
# composition closing over host Fp constants bakes them into the graph
# and retraces every proof - seconds per round at 2^20).
Composition = Callable[..., ops.FA]


def _call_comp(composition, cols, aux):
    return composition(cols) if aux is None else composition(cols, aux)


def _aux_limbs_arr(aux):
    """Pack a list of Fp aux scalars into an (A, 8) device constant."""
    if not aux:
        return jnp.zeros((0, 8), jnp.uint32)
    return jnp.asarray(np.stack([limbs.pack_scalar(Fp(a)) for a in aux]))


@dataclass
class SumcheckPoly:
    """Round-polynomial wire format: constant coefficient stripped (Q7).

    Reference: SumcheckPolynomial (src/constraint_system/sumcheck.rs:263-276).
    """

    nonzero_coeffs: List[Fp]

    def to_polynomial(self, sum_value: Fp) -> Polynomial:
        """Recover the full polynomial from p(0) + p(1) = sum_value."""
        sum_coeff = ZERO
        for c in self.nonzero_coeffs:
            sum_coeff = sum_coeff + c
        a0 = (sum_value - sum_coeff) * TWO_INV
        return Polynomial([a0] + self.nonzero_coeffs)

    def absorb_into(self, transcript: Transcript) -> None:
        for c in self.nonzero_coeffs:
            transcript.absorb(c.to_bytes())


def _lin_ext(lo, hi, r_limbs):
    """lo + r*(hi - lo) for a full field scalar r."""
    rb = ops.broadcast_scalar(r_limbs, lo.shape[1:])
    return ops.add(lo, ops.mul(rb, ops.sub(hi, lo)))


def _extensions_pair(lo, hi, total_degree: int):
    """Linear extensions at X = 1..total_degree from explicit table halves.

    Uses the incremental form ext(X+1) = ext(X) + (hi - lo): NO field
    multiplies - the only muls of a round-poly evaluation are the
    composition itself and the final delta product.
    """
    diff = ops.sub(hi, lo)
    exts = [hi]
    cur = hi
    for _ in range(2, total_degree + 1):
        cur = ops.add(cur, diff)
        exts.append(cur)
    return exts


def _extensions(data, total_degree: int):
    """Linear extensions of the packed table at X = 1..total_degree.

    data: (8, w+1, h).  Returns a list of (8, w+1, h/2) arrays.
    """
    h = data.shape[-1]
    off = h // 2
    return _extensions_pair(data[..., :off], data[..., off:], total_degree)


def _aux_fas(aux_limbs, shape):
    """(A, 8) aux limb array -> list of FA wrappers broadcast to shape."""
    A = aux_limbs.shape[0]
    if A == 0:
        return None
    return [
        ops.FA(jnp.broadcast_to(aux_limbs[i].reshape(8, 1), (8,) + tuple(shape)))
        for i in range(A)
    ]


@partial(jax.jit, static_argnums=(2, 3))
def _partial_sums_kernel(data, aux_limbs, total_degree: int, composition: Composition):
    """Round polynomial evaluations s(X) for X = 1..total_degree.

    data: (8, w+1, h) packed table - trace columns 0..w-1, delta weights in
    the LAST column.  aux_limbs: (A, 8) traced challenge/mask scalars for
    two-argument compositions.  Returns (8, total_degree).  For the
    identity composition all X points share one batched multiply.
    """
    w = data.shape[1] - 1
    exts = _extensions(data, total_degree)
    if composition is identity_composition:
        dx = jnp.stack([e[:, w] for e in exts], axis=1)  # (8, d, off)
        mx = jnp.stack([e[:, 0] for e in exts], axis=1)
        return ops.sum_mod(ops.mul(dx, mx), axis=2)
    outs = []
    for e in exts:
        dx = e[:, w]
        cols = [ops.FA(e[:, j]) for j in range(w)]
        comp = _call_comp(composition, cols, _aux_fas(aux_limbs, dx.shape[1:]))
        if isinstance(comp, ops.FA):
            carr = comp.a
        else:  # composition collapsed to a host scalar (e.g. a constant Expr)
            carr = ops.broadcast_scalar(limbs.pack_scalar(comp), dx.shape[1:])
        outs.append(ops.sum_mod(ops.mul(dx, carr), axis=1))
    return jnp.stack(outs, axis=1)


@jax.jit
def _fold_kernel(data, r_limbs):
    """Fold the packed table with challenge r: lo + r*(hi - lo); ONE multiply
    covers all trace columns and the delta column."""
    h = data.shape[-1]
    off = h // 2
    # guard the INPUT as well: the limb-masked arithmetic silently drops
    # out-of-range bits, so output-only checks would launder corruption
    data = ops.debug_guard(data, "sumcheck fold input")
    return ops.debug_guard(
        _lin_ext(data[..., :off], data[..., off:], r_limbs), "sumcheck fold"
    )


@partial(jax.jit, static_argnums=(3, 4))
def _partial_sums_pair_kernel(lo, hi, aux_limbs, total_degree: int, composition: Composition):
    """Partial sums from explicit (8, w+1, C) table halves - the bounded
    per-chunk program of the big-round path (see _chunked_partial_sums)."""
    w = lo.shape[1] - 1
    exts = _extensions_pair(lo, hi, total_degree)
    if composition is identity_composition:
        dx = jnp.stack([e[:, w] for e in exts], axis=1)
        mx = jnp.stack([e[:, 0] for e in exts], axis=1)
        return ops.sum_mod(ops.mul(dx, mx), axis=2)
    outs = []
    for e in exts:
        dx = e[:, w]
        cols = [ops.FA(e[:, j]) for j in range(w)]
        comp = _call_comp(composition, cols, _aux_fas(aux_limbs, dx.shape[1:]))
        carr = comp.a if isinstance(comp, ops.FA) else ops.broadcast_scalar(
            limbs.pack_scalar(comp), dx.shape[1:]
        )
        outs.append(ops.sum_mod(ops.mul(dx, carr), axis=1))
    return jnp.stack(outs, axis=1)


@jax.jit
def _fold_pair_kernel(lo, hi, r_limbs):
    return _lin_ext(lo, hi, r_limbs)


@partial(jax.jit, static_argnums=(2,))
def _chunked_fold_kernel(data, r_limbs, C: int):
    """Fold an oversized packed table as ONE bounded program: a fori_loop
    of dynamic_slice chunk folds written into the output buffer."""
    off = data.shape[-1] // 2
    n_chunks = off // C
    out = jnp.zeros(data.shape[:-1] + (off,), jnp.uint32)

    def body(i, out):
        s = i * C
        lo = jax.lax.dynamic_slice(data, (0, 0, s), (8, data.shape[1], C))
        hi = jax.lax.dynamic_slice(data, (0, 0, off + s), (8, data.shape[1], C))
        return jax.lax.dynamic_update_slice(out, _lin_ext(lo, hi, r_limbs), (0, 0, s))

    return jax.lax.fori_loop(0, n_chunks, body, out)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _chunked_partial_sums_kernel(data, aux_limbs, C: int, total_degree: int, composition):
    """Round-poly sums for oversized tables: ONE program, bounded memory.

    The axon backend rejects single programs with ~2 GiB of live
    allocations; at 2^24 rows the one-shot partial-sum program is ~3 GiB.
    A fori_loop walks chunk windows with dynamic_slice, so the live set is
    the input + one chunk's temporaries, and chunk results accumulate with
    the (exact) mod-p add.  Bit-identical to the fused kernel.
    """
    h = data.shape[-1]
    off = h // 2
    n_chunks = off // C

    def body(i, acc):
        s = i * C
        lo = jax.lax.dynamic_slice(data, (0, 0, s), (8, data.shape[1], C))
        hi = jax.lax.dynamic_slice(data, (0, 0, off + s), (8, data.shape[1], C))
        part = _partial_sums_pair_kernel(lo, hi, aux_limbs, total_degree, composition)
        return ops.add(acc, part)

    init = jnp.zeros((8, total_degree), jnp.uint32)
    return jax.lax.fori_loop(0, n_chunks, body, init)


def _chunked_partial_sums(data, aux_limbs, total_degree: int, composition: Composition):
    from .config import get_config

    C = get_config().kernel_chunk
    off = data.shape[-1] // 2
    if off % C:  # non-divisible (tiny test configs): per-chunk dispatches
        from .field.scalar import P

        totals = [0] * total_degree
        chunk_sums = [
            _partial_sums_pair_kernel(
                data[..., s : s + min(C, off - s)],
                data[..., off + s : off + s + min(C, off - s)],
                aux_limbs, total_degree, composition,
            )
            for s in range(0, off, C)
        ]
        for dev in device_get_tree(chunk_sums):
            vals = limbs.unpack_ints(dev)
            for i in range(total_degree):
                totals[i] = (totals[i] + int(vals[i])) % P
        return totals
    sums_dev = _chunked_partial_sums_kernel(
        data, aux_limbs, C, total_degree, composition
    )
    return [int(v) for v in limbs.unpack_ints(fetch(sums_dev))]


def identity_composition(cols: Sequence[ops.FA]) -> ops.FA:
    """The PCS composition: x -> x[0] (reference multilinear_pcs.rs:56)."""
    return cols[0]


from functools import lru_cache


@lru_cache(maxsize=8)
def _vandermonde_inv_limbs(n: int):
    """V^{-1} over {0..n-1} as an (n, n, 8) limb array (device constant).

    coeffs = V^{-1} @ evals reproduces PolynomialEvals.interpolate exactly
    (interpolation is unique and both are exact field arithmetic), so the
    on-device round-polynomial coefficients are bit-identical to the host
    path's.
    """
    from .field.scalar import ONE, ZERO

    V = [[Fp(i) ** j for j in range(n)] for i in range(n)]
    I = [[ONE if i == j else ZERO for j in range(n)] for i in range(n)]
    for col in range(n):
        piv = next(r for r in range(col, n) if V[r][col] != ZERO)
        V[col], V[piv] = V[piv], V[col]
        I[col], I[piv] = I[piv], I[col]
        inv = V[col][col].inv()
        V[col] = [x * inv for x in V[col]]
        I[col] = [x * inv for x in I[col]]
        for r in range(n):
            if r != col and V[r][col] != ZERO:
                f = V[r][col]
                V[r] = [a - f * b for a, b in zip(V[r], V[col])]
                I[r] = [a - f * b for a, b in zip(I[r], I[col])]
    arr = np.zeros((n, n, 8), np.uint32)
    for j in range(n):
        for i in range(n):
            arr[j, i] = limbs.pack_scalar(I[j][i])
    return jnp.asarray(arr)


def _sc_round_body(data, tr_state, prev, vinv, aux_limbs, total_degree: int, composition):
    """One COMPLETE standalone-sumcheck round as a traceable body,
    Fiat-Shamir included: partial sums, s(0) recovery, interpolation
    (V^{-1} matvec), coefficient absorption, challenge, fold, and the
    telescoped next sum.

    Zero host synchronization - consecutive rounds stream through the
    dispatch queue exactly like the PCS device rounds.
    """
    from . import device_transcript as dtr

    sums = _partial_sums_kernel(data, aux_limbs, total_degree, composition)  # (8, d)
    s0 = ops.sub(prev.reshape(8, 1), sums[:, 0].reshape(8, 1))[:, 0]
    evals = [s0] + [sums[:, i] for i in range(total_degree)]
    coeffs = []
    for j in range(total_degree + 1):
        acc = None
        for i in range(total_degree + 1):
            term = ops.mul(vinv[j, i].reshape(8, 1), evals[i].reshape(8, 1))
            acc = term if acc is None else ops.add(acc, term)
        coeffs.append(acc[:, 0])
    tr = tr_state
    for c in coeffs[1:]:
        tr = dtr.absorb_field_limbs(tr, c)
    r = dtr.challenge(tr)
    rr = r.reshape(8, 1)
    acc = coeffs[-1].reshape(8, 1)
    for c in reversed(coeffs[:-1]):
        acc = ops.add(ops.mul(acc, rr), c.reshape(8, 1))
    new_prev = acc[:, 0]
    new_data = _fold_kernel(data, r)
    return new_data, tr, (r, jnp.stack(coeffs[1:], axis=0), new_prev)


# NOT donated: every output of the round is strictly smaller than the
# (8, w+1, h) input (the fold halves it), so XLA can never alias the
# donation and warned "donated buffers were not usable" on every shape;
# the old table's buffer is released by apply_folded dropping the last
# Python reference right after dispatch.
_device_sc_round = partial(jax.jit, static_argnums=(5, 6))(_sc_round_body)


def _sc_scan_tail(data, tr_state, prev, vinv, aux_limbs, halfs, total_degree: int, composition):
    """ALL remaining standalone-sumcheck rounds as ONE device program.

    The streamed per-round path costs one dispatch per halved shape; over
    the tunnel that dispatch latency (~9 ms) dwarfs the tail rounds'
    compute (tools/sumcheck_probe.py: 19 dispatches = 0.167 s of a 0.197 s
    prove at 2^20).  Round-PAIR fusion was rejected in round 2 because
    embedding the user composition twice made XLA compile time explode;
    a ``lax.scan`` embeds it ONCE at a fixed shape instead:

    * the (8, w+1, h0) table keeps its entry shape through every round;
      the active prefix halves each iteration (``halfs`` = h0/2, h0/4...),
    * ``hi`` is a dynamic_slice at the traced active half; lanes at or
      beyond the active half are masked to zero in the delta extension
      (so they add exact zeros to the partial sums - mod-p addition is
      order-independent and exact) and in the fold output (so the zero
      tail is maintained for the next iteration),
    * Fiat-Shamir (absorb coefficients, draw r), V^{-1} interpolation and
      the telescoped next sum run on device exactly as _sc_round_body.

    Per-iteration compute is O(h0) instead of O(h0 >> i) - the fixed-shape
    overhead is bounded by entering the scan only at h0 <=
    config.sc_scan_tail_height (~2^16: the whole scan is a few ms).
    Byte-identical to the host path (pinned by tests).
    """
    from . import device_transcript as dtr

    w = data.shape[1] - 1
    lanes = data.shape[-1] // 2
    pos = jax.lax.broadcasted_iota(jnp.uint32, (lanes,), 0)

    def body(carry, half):
        data, tr, prev = carry
        active = pos < half.astype(jnp.uint32)
        lo = data[..., :lanes]
        hi = jax.lax.dynamic_slice(
            data, (0, 0, half), (8, w + 1, lanes)
        )
        exts = _extensions_pair(lo, hi, total_degree)
        if composition is identity_composition:
            dx = jnp.stack(
                [jnp.where(active, e[:, w], jnp.uint32(0)) for e in exts], axis=1
            )
            mx = jnp.stack([e[:, 0] for e in exts], axis=1)
            sums = ops.sum_mod(ops.mul(dx, mx), axis=2)
        else:
            outs = []
            for e in exts:
                dx = jnp.where(active, e[:, w], jnp.uint32(0))
                cols = [ops.FA(e[:, j]) for j in range(w)]
                comp = _call_comp(
                    composition, cols, _aux_fas(aux_limbs, dx.shape[1:])
                )
                carr = comp.a if isinstance(comp, ops.FA) else ops.broadcast_scalar(
                    limbs.pack_scalar(comp), dx.shape[1:]
                )
                outs.append(ops.sum_mod(ops.mul(dx, carr), axis=1))
            sums = jnp.stack(outs, axis=1)
        s0 = ops.sub(prev.reshape(8, 1), sums[:, 0].reshape(8, 1))[:, 0]
        evals = [s0] + [sums[:, i] for i in range(total_degree)]
        coeffs = []
        for j in range(total_degree + 1):
            acc = None
            for i in range(total_degree + 1):
                term = ops.mul(vinv[j, i].reshape(8, 1), evals[i].reshape(8, 1))
                acc = term if acc is None else ops.add(acc, term)
            coeffs.append(acc[:, 0])
        for c in coeffs[1:]:
            tr = dtr.absorb_field_limbs(tr, c)
        r = dtr.challenge(tr)
        rr = r.reshape(8, 1)
        acc = coeffs[-1].reshape(8, 1)
        for c in reversed(coeffs[:-1]):
            acc = ops.add(ops.mul(acc, rr), c.reshape(8, 1))
        new_prev = acc[:, 0]
        folded = _lin_ext(lo, hi, r)
        folded = jnp.where(active, folded, jnp.uint32(0))
        data = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=-1)
        return (data, tr, new_prev), (r, jnp.stack(coeffs[1:], axis=0))

    (data, tr_state, prev), ys = jax.lax.scan(
        body, (data, tr_state, prev), halfs
    )
    return data, tr_state, prev, ys


# NOTE: the jitted wrapper keeps the plain body's name so the persistent
# compilation cache keys (which include the HLO module name,
# "jit__sc_scan_tail") survive the round-5 refactor that exposed the body
# for reuse by _sc_fused_all.
_sc_scan_tail_jit = partial(jax.jit, static_argnums=(6, 7))(_sc_scan_tail)


@partial(jax.jit, static_argnums=(6, 7, 8))
def _sc_fused_all(
    data, tr_state, prev, vinv, aux_limbs, halfs, n_stream: int, total_degree: int, composition
):
    """The ENTIRE standalone sumcheck as ONE device program.

    ``n_stream`` complete rounds at shrinking static shapes (the same op
    sequence as n_stream ``_device_sc_round`` dispatches), then the
    fixed-shape masked scan over the remaining ``len(halfs)`` rounds -
    byte-identical to the streamed + scan-tail path (pinned by tests),
    but one dispatch instead of n_stream+1.  Per-dispatch tunnel latency
    (~9 ms) was the dominant standalone-sumcheck cost at 2^20 (round-4
    BASELINE table: 0.208 s vs the 0.199 s single-core baseline), so
    collapsing the dispatch count is the whole point.

    Compile-time note: the trace composition is embedded n_stream+1 times
    (round-2 showed embedding a user composition TWICE in one program
    explodes XLA:CPU compile); this program is gated to TPU by
    config.sc_one_dispatch where the Mosaic/XLA:TPU pipeline handles it,
    and tests pin parity at tiny shapes.
    """
    metas = []
    for _ in range(n_stream):
        data, tr_state, meta = _sc_round_body(
            data, tr_state, prev, vinv, aux_limbs, total_degree, composition
        )
        prev = meta[2]
        metas.append(meta)
    data, tr_state, prev, ys = _sc_scan_tail(
        data, tr_state, prev, vinv, aux_limbs, halfs, total_degree, composition
    )
    return data, tr_state, prev, tuple(metas), ys


def _device_sc_fused(tables, transcript, previous_sum, total_degree, composition, aux=None):
    """Dispatch the whole sumcheck as one device program when profitable.

    Returns (rounds_done, pols, randoms, new_previous_sum); 0 rounds when
    the fused path is not applicable (host tables, oversized, gated off,
    non-word-aligned transcript, or nothing above the scan floor - the
    plain scan tail is already one dispatch there)."""
    from . import device_transcript as dtr
    from .config import get_config, sc_one_dispatch_enabled, sc_scan_tail_value

    cfg = get_config()
    h0 = tables.height
    floor = min(sc_scan_tail_value(), cfg.fused_round_max_code)
    if (
        not sc_one_dispatch_enabled()
        or tables.on_host
        or h0 <= floor          # scan tail alone already does one dispatch
        or h0 > cfg.fused_round_max_code
        or floor < 2
    ):
        return 0, [], [], previous_sum
    try:
        tr_state = dtr.state_from_host(transcript)
    except ValueError:
        return 0, [], [], previous_sum
    from . import stats

    n_stream = (h0 // floor).bit_length() - 1
    n_scan = floor.bit_length() - 1
    halfs = jnp.asarray([floor >> (i + 1) for i in range(n_scan)], jnp.int32)
    vinv = _vandermonde_inv_limbs(total_degree + 1)
    aux_limbs = _aux_limbs_arr(aux)
    prev = jnp.asarray(limbs.pack_scalar(previous_sum))
    data, tr_state, prev, metas, ys = _sc_fused_all(
        tables.data, tr_state, prev, vinv, aux_limbs, halfs,
        n_stream, total_degree, composition,
    )
    n_rounds = n_stream + n_scan
    stats.bump("sc_rounds_fused_one_dispatch", n_rounds)
    (metas_h, (rs_h, coeffs_h)), tr_h, prev_h = device_get_tree(
        ((metas, ys), tr_state, prev)
    )
    pols = []
    randoms = []
    for r_l, cs, _p in metas_h:
        pols.append(
            SumcheckPoly(
                [Fp(limbs.unpack_int(np.asarray(cs[i]))) for i in range(cs.shape[0])]
            )
        )
        randoms.append(Fp(limbs.unpack_int(np.asarray(r_l))))
    for k in range(n_scan):
        pols.append(
            SumcheckPoly(
                [
                    Fp(limbs.unpack_int(np.asarray(coeffs_h[k, i])))
                    for i in range(coeffs_h.shape[1])
                ]
            )
        )
        randoms.append(Fp(limbs.unpack_int(np.asarray(rs_h[k]))))
    tables.apply_folded(data[..., :1], levels=n_rounds)
    transcript._state = dtr.state_to_host(tr_h)._state
    return n_rounds, pols, randoms, Fp(limbs.unpack_int(np.asarray(prev_h)))


def _device_sc_scan_tail(tables, transcript, previous_sum, total_degree, composition, aux=None):
    """Dispatch the scan-tail program when the whole remaining table fits.

    Returns (rounds_done, pols, randoms, new_previous_sum) exactly like
    _device_sc_rounds; 0 rounds when the tail is not scannable (host
    tables, oversized, disabled, or a non-word-aligned transcript)."""
    from . import device_transcript as dtr
    from .config import get_config

    from .config import sc_scan_tail_value

    cfg = get_config()
    h0 = tables.height
    if (
        tables.on_host
        or h0 < 2
        or h0 > min(sc_scan_tail_value(), cfg.fused_round_max_code)
    ):
        return 0, [], [], previous_sum
    try:
        tr_state = dtr.state_from_host(transcript)
    except ValueError:
        return 0, [], [], previous_sum
    from . import stats

    n_rounds = h0.bit_length() - 1
    halfs = jnp.asarray([h0 >> (i + 1) for i in range(n_rounds)], jnp.int32)
    vinv = _vandermonde_inv_limbs(total_degree + 1)
    aux_limbs = _aux_limbs_arr(aux)
    prev = jnp.asarray(limbs.pack_scalar(previous_sum))
    data, tr_state, prev, ys = _sc_scan_tail_jit(
        tables.data, tr_state, prev, vinv, aux_limbs, halfs, total_degree, composition
    )
    stats.bump("sc_rounds_scanned", n_rounds)
    (rs_h, coeffs_h), tr_h, prev_h = device_get_tree((ys, tr_state, prev))
    pols = []
    randoms = []
    for k in range(n_rounds):
        pols.append(
            SumcheckPoly(
                [
                    Fp(limbs.unpack_int(np.asarray(coeffs_h[k, i])))
                    for i in range(coeffs_h.shape[1])
                ]
            )
        )
        randoms.append(Fp(limbs.unpack_int(np.asarray(rs_h[k]))))
    tables.apply_folded(data[..., :1], levels=n_rounds)
    transcript._state = dtr.state_to_host(tr_h)._state
    return n_rounds, pols, randoms, Fp(limbs.unpack_int(np.asarray(prev_h)))


def _device_sc_rounds(tables, transcript, previous_sum, total_degree, composition, aux=None):
    """Stream as many standalone-sumcheck rounds as possible on device.

    Returns (rounds_done, pols, randoms, new_previous_sum), leaving the
    tables and the caller's transcript exactly as the host path would
    (bit-identical; pinned by tests)."""
    from . import device_transcript as dtr
    from .config import get_config

    if tables.on_host:
        return 0, [], [], previous_sum
    try:
        tr_state = dtr.state_from_host(transcript)
    except ValueError:  # non-word-aligned prior absorbs
        return 0, [], [], previous_sum
    vinv = _vandermonde_inv_limbs(total_degree + 1)
    aux_limbs = _aux_limbs_arr(aux)
    prev = jnp.asarray(limbs.pack_scalar(previous_sum))
    metas = []
    # NOTE: no two-rounds-per-dispatch fusion here, deliberately.  The PCS
    # and FRI streamed rounds fuse in pairs (stream_round_pairs), but the
    # standalone-sumcheck round embeds the user COMPOSITION (constraints x
    # eq-mask x X=1..d extensions); doubling that body made XLA compile
    # time explode superlinearly (identity composition: 50 s on CPU; the
    # 4-column degree-2 test composition: >12 min, vs seconds for the
    # single round).  The dispatch saving (~tens of ms/proof) cannot repay
    # a per-(composition, shape) compile that large.
    # stop streaming once the scan tail can take over: everything at or
    # below sc_scan_tail_height goes in one dispatch instead of one per
    # halved shape
    from .config import sc_scan_tail_value

    stream_floor = max(tables.host_threshold, sc_scan_tail_value())
    while (
        not tables.on_host
        and stream_floor < tables.height <= get_config().fused_round_max_code
        and tables.height > 1
    ):
        new_data, tr_state, meta = _device_sc_round(
            tables.data, tr_state, prev, vinv, aux_limbs, total_degree, composition
        )
        tables.apply_folded(new_data)
        prev = meta[2]
        metas.append(meta)
    if not metas:
        return 0, [], [], previous_sum
    from . import stats

    stats.bump("sc_rounds_streamed", len(metas))
    metas_h, tr_h, prev_h = device_get_tree((metas, tr_state, prev))
    pols = []
    randoms = []
    for r_l, cs, _p in metas_h:
        pols.append(
            SumcheckPoly(
                [Fp(limbs.unpack_int(np.asarray(cs[i]))) for i in range(cs.shape[0])]
            )
        )
        randoms.append(Fp(limbs.unpack_int(np.asarray(r_l))))
    from . import device_transcript as dtr2

    transcript._state = dtr2.state_to_host(tr_h)._state
    return len(metas), pols, randoms, Fp(limbs.unpack_int(np.asarray(prev_h)))


# Below this height the tables move to the host and rounds run as exact
# integer arithmetic via the native runtime: the tail rounds of a proof are
# tiny, and a device kernel launch + fresh XLA compile per halved shape
# costs far more than a few thousand host multiplies.  The big rounds
# (where the FLOPs are) stay on device.  Tunable via
# config.ProverConfig.host_threshold.
def HOST_THRESHOLD() -> int:
    from .config import get_config

    return get_config().host_threshold

_P_INT = None


def _p() -> int:
    global _P_INT
    if _P_INT is None:
        from .field.scalar import P

        _P_INT = P
    return _P_INT


class SumcheckTables:
    """Prover state: trace columns + delta table, packed as one array.

    Device mode: ``data`` is (8, width+1, height) with the delta (eq-weight)
    table in the LAST column slot - packing means the per-round fold is ONE
    field multiply over everything.  Host mode (height <= HOST_THRESHOLD):
    column-major Python int lists.
    """

    def __init__(self, data, width: int, height: int, host_threshold: int = None):
        self.data = data  # device (8, w+1, h) or None
        self.width = width
        self.height = height
        # captured at construction (tests swap config around whole proves);
        # for_trace tables stream deeper than PCS tables - their host tail
        # is a Python composition loop, not the native identity kernel.
        self.host_threshold = (
            HOST_THRESHOLD() if host_threshold is None else host_threshold
        )
        self.host_matrix = None  # list of w column lists of ints
        self.host_delta = None  # list of ints
        self._maybe_to_host()

    @property
    def on_host(self) -> bool:
        return self.host_matrix is not None

    def _maybe_to_host(self) -> None:
        if self.host_matrix is not None or self.height > self.host_threshold:
            return
        raw = limbs.to_le_bytes(fetch(self.data))
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(self.width + 1, self.height, 16)
        self.host_matrix = [arr[j].copy() for j in range(self.width)]
        self.host_delta = arr[self.width].copy()
        self.data = None

    @staticmethod
    def _host_from_ints(matrix_cols, delta_ints, width, height) -> "SumcheckTables":
        """Host-mode tables from per-column int lists (or (h,16) byte arrays)."""
        from . import native

        def conv(c):
            return c if isinstance(c, np.ndarray) else native.ints_to_bytes_arr(c)

        t = SumcheckTables.__new__(SumcheckTables)
        t.data = None
        t.width = width
        t.height = height
        t.host_threshold = HOST_THRESHOLD()
        t.host_matrix = [conv(c) for c in matrix_cols]
        t.host_delta = conv(delta_ints)
        return t

    @staticmethod
    def for_pcs(inputs: Sequence[Fp], evals) -> "SumcheckTables":
        """Tables for the PCS claim p(inputs) = output.

        ``evals`` is the MLE in evaluation form, (8, 2^n) limb array.
        Reference: build_tables_for_pcs (sumcheck.rs:128-145), with the
        delta table built by tensor-product doubling instead of per-row
        Mask loops.
        """
        height = evals.shape[-1]
        n_vars = len(inputs)
        assert 1 << n_vars == height
        if height <= HOST_THRESHOLD():
            col = [int(v) for v in limbs.unpack_ints(fetch(evals))]
            return SumcheckTables._host_from_ints(
                [col], _host_delta_table(inputs), 1, height
            )
        data = _pack_tables_kernel(evals, delta_subtables(inputs))
        return SumcheckTables(data, 1, height)

    @staticmethod
    def for_trace(row_challenges: Sequence[Fp], trace_columns) -> "SumcheckTables":
        """Tables for a constraint-system trace.

        ``trace_columns``: (8, w, h) limb array of the trace columns' MLEs.
        delta[i] = eq(row_challenges, bits(i)) (reference build_tables,
        sumcheck.rs:22-38).
        """
        from .config import sc_host_threshold_value

        _, width, height = trace_columns.shape
        assert 1 << len(row_challenges) == height
        thresh = sc_host_threshold_value()
        if height <= thresh:
            m = limbs.unpack_ints(fetch(trace_columns))
            cols = [[int(v) for v in m[j]] for j in range(width)]
            return SumcheckTables._host_from_ints(
                cols, _host_delta_table(row_challenges), width, height
            )
        data = _pack_tables_kernel(trace_columns, delta_subtables(row_challenges))
        return SumcheckTables(data, width, height, host_threshold=thresh)

    # -- one round ----------------------------------------------------------
    def round_poly(
        self,
        composition: Composition,
        total_degree: int,
        previous_sum: Fp,
        transcript: Transcript,
        aux=None,
    ):
        """Compute + absorb the round polynomial and draw r, WITHOUT folding.

        Mirrors compute_sumcheck_polynomial (sumcheck.rs:174-202) up to the
        fold: evaluate s at X=1..d, recover s(0) = previous_sum - s(1),
        interpolate, absorb the nonzero coefficients, draw the challenge.
        Callers that interleave FRI (the PCS) fuse the fold with the FRI
        fold+commit into one device dispatch.
        """
        from . import stats

        if self.on_host:
            stats.bump("sc_rounds_host")
            sums = self._partial_sums_host(composition, total_degree, aux)
        else:
            from .config import get_config

            aux_limbs = _aux_limbs_arr(aux)
            if self.height > get_config().fused_round_max_code:
                stats.bump("sc_rounds_chunked_hostdriven")
                sums = _chunked_partial_sums(
                    self.data, aux_limbs, total_degree, composition
                )
            else:
                stats.bump("sc_rounds_hostdriven")
                sums_dev = _partial_sums_kernel(
                    self.data, aux_limbs, total_degree, composition
                )
                sums = [int(v) for v in limbs.unpack_ints(fetch(sums_dev))]
        evals = [ZERO] * (total_degree + 1)
        for i in range(1, total_degree + 1):
            evals[i] = Fp(sums[i - 1])
        evals[0] = previous_sum - evals[1]
        pol = PolynomialEvals(evals).interpolate()
        sc_pol = SumcheckPoly(pol.coeffs[1:])
        sc_pol.absorb_into(transcript)
        r = transcript.next_challenge()
        new_sum = pol.evaluate(r)
        return sc_pol, r, new_sum

    def compute_round(
        self,
        composition: Composition,
        total_degree: int,
        previous_sum: Fp,
        transcript: Transcript,
        aux=None,
    ):
        """One full sumcheck round: round_poly + fold."""
        sc_pol, r, new_sum = self.round_poly(
            composition, total_degree, previous_sum, transcript, aux
        )
        self.fold(r)
        return sc_pol, r, new_sum

    def _partial_sums_host(self, composition: Composition, total_degree: int, aux=None):
        from . import native

        if composition is identity_composition and self.width == 1:
            return native.pcs_partial_sums(
                self.host_matrix[0], self.host_delta, total_degree
            )
        P = _p()
        off = self.height >> 1
        m = [native.bytes_arr_to_ints(c) for c in self.host_matrix]
        d = native.bytes_arr_to_ints(self.host_delta)
        aux_fp = None if aux is None else [Fp(a) for a in aux]
        out = []
        for x in range(1, total_degree + 1):
            s = 0
            for i in range(off):
                dx = (d[i] + x * (d[i + off] - d[i])) % P
                vals = [Fp((c[i] + x * (c[i + off] - c[i])) % P) for c in m]
                s = (s + dx * _call_comp(composition, vals, aux_fp).v) % P
            out.append(s)
        return out

    def apply_folded(self, new_data, levels: int = 1) -> None:
        """Install an externally-folded table (from a fused round-tail
        dispatch) and account for ``levels`` halvings of the height (2 for
        the two-rounds-per-dispatch program)."""
        self.data = new_data
        self.height >>= levels
        self._maybe_to_host()

    def fold(self, r: Fp) -> None:
        if self.on_host:
            from . import native

            rv = r.v
            off = self.height >> 1
            self.host_delta = native.fold(
                self.host_delta[:off], self.host_delta[off:], rv
            )
            self.host_matrix = [
                native.fold(c[:off], c[off:], rv) for c in self.host_matrix
            ]
            self.height = off
            return
        r_limbs = jnp.asarray(limbs.pack_scalar(r))
        from .config import get_config

        cfg = get_config()
        if self.height > cfg.fused_round_max_code:
            C = cfg.kernel_chunk
            off = self.height >> 1
            if off % C:
                outs = [
                    _fold_pair_kernel(
                        self.data[..., s : s + min(C, off - s)],
                        self.data[..., off + s : off + s + min(C, off - s)],
                        r_limbs,
                    )
                    for s in range(0, off, C)
                ]
                self.apply_folded(
                    outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
                )
                return
            self.apply_folded(_chunked_fold_kernel(self.data, r_limbs, C))
            return
        self.apply_folded(_fold_kernel(self.data, r_limbs))

    # -- all rounds (standalone sumcheck) ------------------------------------
    def compute_all_rounds(
        self,
        composition: Composition,
        composition_degree: int,
        transcript: Transcript,
        sum_value: Fp,
        aux=None,
    ):
        """Run all log2(height) rounds (sumcheck.rs:147-172).

        Returns (pols, randoms).  Round degree = composition degree + 1
        (the delta factor is multilinear).
        """
        total_degree = composition_degree + 1
        n_rounds = self.height.bit_length() - 1
        pols: List[SumcheckPoly] = []
        randoms: List[Fp] = []
        prev = sum_value
        k = 0
        while k < n_rounds:
            # the whole PROTOCOL in one device dispatch when profitable
            # (TPU, see _sc_fused_all); else the remaining tail in one
            # dispatch (see _sc_scan_tail); otherwise stream complete
            # rounds on device (zero per-round host sync) while shapes fit
            # the program budget; host-driven rounds (with chunked kernels
            # for oversized tables) cover the rest.
            done, dev_pols, dev_randoms, prev2 = _device_sc_fused(
                self, transcript, prev, total_degree, composition, aux
            )
            if not done:
                done, dev_pols, dev_randoms, prev2 = _device_sc_scan_tail(
                    self, transcript, prev, total_degree, composition, aux
                )
            if not done:
                done, dev_pols, dev_randoms, prev2 = _device_sc_rounds(
                    self, transcript, prev, total_degree, composition, aux
                )
            if done:
                pols.extend(dev_pols)
                randoms.extend(dev_randoms)
                prev = prev2
                k += done
                continue
            pol, r, prev = self.compute_round(
                composition, total_degree, prev, transcript, aux
            )
            pols.append(pol)
            randoms.append(r)
            k += 1
        return pols, randoms


def replay_sumcheck(
    transcript: Transcript,
    pols: Sequence[SumcheckPoly],
    sum_value: Fp,
    degree: int = None,
):
    """Verifier-side telescoping replay for the standalone protocol.

    Absorbs each round polynomial and draws the challenges exactly as the
    prover did (reference verify_sumcheck_debug / verify_with_evaluations,
    sumcheck.rs:55-124).  Returns (randoms, final_value) where final_value
    = p_last(r_last) must equal delta(rs) * composition(trace(rs)).

    ``degree``: round-polynomial total degree bound (composition degree + 1).
    When given, a proof whose coefficient vectors are longer is rejected
    before replaying - the wire format sends coeffs[1..], so the expected
    length is exactly ``degree``.
    """
    assert pols, "at least one round polynomial is expected"
    if degree is not None and any(len(p.nonzero_coeffs) != degree for p in pols):
        raise ValueError("sumcheck round polynomial exceeds degree bound")
    rs: List[Fp] = []
    it = iter(pols)
    first = next(it)
    first.absorb_into(transcript)
    pol = first.to_polynomial(sum_value)
    for sc_pol in it:
        r = transcript.next_challenge()
        sc_pol.absorb_into(transcript)
        pol = sc_pol.to_polynomial(pol.evaluate(r))
        rs.append(r)
    r = transcript.next_challenge()
    rs.append(r)
    return rs, pol.evaluate(r)
