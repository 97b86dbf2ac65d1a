"""Radix-2 NTT / iNTT over GF(p) as a lax.scan of vectorized butterflies.

p has two-adicity 40 with multiplicative generator 3 (reference constants:
src/ntt/mod.rs:34-54); the 2^k-domain generator is 3^((p-1)/2^k).

TPU-first design: instead of the reference's nested per-block scalar loops
(src/ntt/mod.rs:81-107), every Cooley-Tukey stage is ONE elementwise pass
over the whole array, and the stages run under ``lax.scan`` with a shape-
invariant body (XOR-gather the butterfly partner, gather the twiddle from
the power table, one field mul, add/sub/select).  The scan keeps the traced
graph a CONSTANT size regardless of n - compile once, run any stage count -
which matters because XLA compile time scales with graph size and the limb
arithmetic expands ~200 HLO ops per field multiply.

Twiddle tables are powers of the domain generator, built as a tensor
product of host-computed 256-entry sub-tables combined by O(1) device
multiplies (see mle._product_table); they are cached per domain size.

Output matches the reference exactly: ``ntt(coeffs)[i] = p(g^i)`` in natural
order, ``intt`` inverts with the 1/n scale (src/ntt/mod.rs:131-174).

Batched: all functions operate on the LAST axis of ``(8, ..., n)`` arrays,
so a stack of B codewords transforms in one pass (used by the batched PCS).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp

from .field import limbs, ops
from .field.scalar import Fp, P, pow2_generator
from .mle import _product_table, bit_reverse

LOG_BLOWUP = 1  # Reed-Solomon rate 1/2 (reference src/fri/mod.rs:16)


def _tracer_safe_cache(maxsize: int):
    """Size-keyed memoizer for device-constant tables that is safe to hit
    INSIDE a jax trace.  lru_cache would store the staged (tracer) result
    and poison every later call in the process (a user jitting around
    ntt()/delta_table() hit exactly this via tools/roofline.py); here a
    result containing tracers is returned uncached, while concrete device
    arrays computed eagerly are memoized as before."""

    def deco(fn):
        cache: dict = {}

        def wrapper(*key):
            hit = cache.get(key)
            if hit is not None:
                return hit
            out = fn(*key)
            if not any(
                isinstance(leaf, jax.core.Tracer)
                for leaf in jax.tree_util.tree_leaves(out)
            ):
                if len(cache) >= maxsize:
                    cache.pop(next(iter(cache)))
                cache[key] = out
            return out

        wrapper.cache_clear = cache.clear
        return wrapper

    return deco


@_tracer_safe_cache(maxsize=48)
def _pow_table(gen_v: int, log_size: int):
    """Device array (8, 2^log_size) of [1, g, g^2, ...].

    g^i = prod_{bit j of i} g^(2^j): a tensor-product table whose per-bit
    factors (1, g^(2^j)) are host scalars - big-endian, so factor order is
    reversed (bit log_size-1 first).
    """
    if log_size == 0:
        return jnp.asarray(limbs.pack_ints([1]))
    factors = [
        (1, pow(gen_v, 1 << j, P)) for j in range(log_size - 1, -1, -1)
    ]
    return _product_table(factors)


def gen_pows(log_size: int):
    """Powers of the 2^log_size-domain generator, FIRST HALF of the cycle.

    Every twiddle exponent in the Pease NTT and the FRI fold is < 2^(log-1),
    so only [1, g, ..., g^(2^(log-1)-1)] is materialized - half the HBM of
    the reference's full table (pow_2_generator_powers, src/ntt/mod.rs:18-28).
    """
    if log_size == 0:
        return _pow_table(1, 0)
    return _pow_table(pow2_generator(log_size).v, log_size - 1)


def inv_gen_pows(log_size: int):
    """First-half powers of the inverse domain generator (iNTT, FRI fold)."""
    if log_size == 0:
        return _pow_table(1, 0)
    return _pow_table(pow2_generator(log_size).inv().v, log_size - 1)


def _pease_axis2(x, pows, log_m: int, constrain=None):
    """Constant-geometry (Pease) DIF butterflies along axis -2, under
    lax.scan.  ``constrain`` (multi-chip): re-pin the scan carry's
    last-axis sharding each stage - GSPMD does not propagate shardings
    into scan bodies on its own and falls back to a replicated carry
    (measured: per-device temp stuck at ~8 GiB for the 2^25 encode at
    any mesh size without this).

    x: lead + (M, C).  Every stage has IDENTICAL data movement - split row
    halves, butterfly, interleave rows - so the scan body is shape-
    invariant, and because interleaving happens on axis -2 the trailing
    dimension C stays wide (tiny trailing dims get padded ~16-64x by TPU
    tiling).  Natural row order in, BIT-REVERSED row order out:

        y[2i]   = x[i] + x[i + M/2]
        y[2i+1] = (x[i] - x[i + M/2]) * g^(((i >> s) mod 2^(L-1-s)) << s)
    """
    if log_m == 0:
        return x
    M = 1 << log_m
    half = M // 2
    C = x.shape[-1]
    iota = jnp.arange(half, dtype=jnp.int32)
    stages = jnp.arange(log_m, dtype=jnp.int32)
    lead = x.shape[:-2]

    from .config import pallas_enabled

    if len(lead) == 1:  # (8, M, C): the plain-codeword case
        from .field import pallas_ops

        def _stage_exp(s, idx):
            return ((idx >> s) & ((half - 1) >> s)) << s

        if (
            pallas_enabled()
            and log_m >= 2
            and pallas_ops.butterfly2_supported(M, C)
            and (log_m % 2 == 0 or pallas_ops.butterfly_supported(half, C))
        ):
            # fused DOUBLE stages: two radix-2 stages per HBM pass
            # (bit-identical op sequence; halves the per-pair sweep traffic)
            n_pairs = log_m // 2
            quarter = M // 4
            i4 = jnp.arange(quarter, dtype=jnp.int32)
            tw_quads = jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.take(pows, _stage_exp(2 * ps, i4), axis=-1),
                            jnp.take(pows, _stage_exp(2 * ps, i4 + quarter), axis=-1),
                            jnp.take(pows, _stage_exp(2 * ps + 1, 2 * i4), axis=-1),
                            jnp.take(
                                pows, _stage_exp(2 * ps + 1, 2 * i4 + 1), axis=-1
                            ),
                        ],
                        axis=-1,
                    )
                    for ps in range(n_pairs)
                ],
                axis=0,
            )  # (n_pairs, 8, quarter, 4)

            def bf2_body(x, tw_q):
                return pallas_ops.butterfly2(x, tw_q), None

            x, _ = jax.lax.scan(bf2_body, x, tw_quads)
            if log_m % 2:
                # leftover final stage: its twiddles are all g^0 = 1, so
                # the twiddle-free kernel (no multiply) is bit-identical
                out = pallas_ops.butterfly_notw(x[:, :half], x[:, half:])
                x = out.reshape(8, M, C)
            return x

        if pallas_enabled() and pallas_ops.butterfly_supported(half, C):
            # per-stage twiddle columns, (log_m, 8, half) - tiny gathers
            tw_all = jnp.stack(
                [
                    jnp.take(pows, ((iota >> s) & ((half - 1) >> s)) << s, axis=-1)
                    for s in range(log_m)
                ],
                axis=0,
            )

            def bf_body(x, tw_s):
                u = x[:, :half]
                v = x[:, half:]
                out = pallas_ops.butterfly(u, v, tw_s.reshape(8, half, 1))
                return out.reshape(8, M, C), None

            x, _ = jax.lax.scan(bf_body, x, tw_all)
            return x

    def body(x, s):
        u = x[..., :half, :]
        v = x[..., half:, :]
        exp = ((iota >> s) & ((half - 1) >> s)) << s
        tw = jnp.take(pows, exp, axis=-1)  # (8, half)
        tw = tw.reshape((8,) + (1,) * (len(lead) - 1) + (half, 1))
        tw = jnp.broadcast_to(tw, u.shape)
        p = ops.add(u, v)
        q = ops.mul(ops.sub(u, v), tw)
        out = jnp.stack([p, q], axis=-2).reshape(x.shape)
        if constrain is not None:
            out = constrain(out)
        return out, None

    if constrain is not None:
        # multi-chip: UNROLL the stages.  GSPMD cannot partition the scan's
        # while-loop body here and falls back to a replicated carry - each
        # device then runs the FULL transform between reshards (measured:
        # ~8.6 GiB/device of temps at ANY mesh size).  Straight-line stages
        # partition cleanly; the graph-size cost is bounded (log_m stages)
        # and only the mesh variant pays it.
        x = constrain(x)
        for s in range(log_m):
            x, _ = body(x, jnp.int32(s))
        return x
    x, _ = jax.lax.scan(body, x, stages)
    return x


def _bitrev_axis2(x, log_m: int):
    """Bit-reverse the axis -2 index (small gather; M <= ~2^13)."""
    from .mle import _bitrev_indices

    if log_m <= 1:
        return x
    idx = jnp.asarray(_bitrev_indices(1 << log_m).astype("int32"))
    return jnp.take(x, idx, axis=x.ndim - 2)


@partial(jax.jit, static_argnums=(1, 2))
def _build_twiddle_factors(pows, log_n: int, split: int):
    """Rank-structured four-step twiddles: two SMALL factor matrices.

    The dense (8, A, B) matrix T[a, b] = w^(a*b mod n) is 1 GiB at the
    2^25 encode domain and cost a full-size gather to build every call.
    Factor the row index a = k*S + d (S = 2^split):

        T[a, b] = w^(k*S*b) * w^(d*b) = Tc[k, b] * Tf[d, b]

    exactly in the field, so the transform multiplies by two broadcast
    factors of (A/S)*B and S*B entries (~a few MB total at 2^25) instead
    of materializing T at all.  This removes both the build gather and
    the HBM-pressure reason the dense cache was capped at 2^24.
    """
    n = 1 << log_n
    a = (log_n + 1) // 2
    b = log_n - a
    A, B = 1 << a, 1 << b
    S = 1 << split
    ib = jnp.arange(B, dtype=jnp.uint32)

    def factor(rows: int, step: int):
        ir = jnp.arange(rows, dtype=jnp.uint32) * jnp.uint32(step)
        e = (ir[:, None] * ib[None, :]) & jnp.uint32(n - 1)
        e_lo = (e & jnp.uint32(n // 2 - 1)).astype(jnp.int32)
        negate = e >= jnp.uint32(n // 2)
        T = jnp.take(pows, e_lo, axis=-1)
        return ops.select(jnp.broadcast_to(negate, T.shape[1:]), ops.neg(T), T)

    return factor(A // S, S), factor(S, 1)


@_tracer_safe_cache(maxsize=32)
def _twiddle_factors_cached(gen_v: int, log_n: int):
    a = (log_n + 1) // 2
    split = a // 2  # balances the two factor sizes at ~sqrt(A)*B each
    pows = _pow_table(gen_v, log_n - 1) if log_n else _pow_table(1, 0)
    return _build_twiddle_factors(pows, log_n, split)


def _ntt_fourstep_impl(x, pows, Tc, Tf, log_n: int, constrain=None):
    """Four-step NTT: natural order in, natural order out.

    n = A*B with A, B ~ sqrt(n): column NTTs (axis -2), the twiddle
    multiply via the two rank-structured factors ``Tc``/``Tf`` (see
    _build_twiddle_factors - no dense (8, A, B) matrix is ever
    materialized), an XLA tiled transpose, then row-group NTTs (again
    axis -2).  Every intermediate keeps a wide trailing dimension.
    ``pows``: (8, n/2) first-half power table of the full domain.
    Verified bit-exact vs the scalar model.

    (History: the transpose was once a flat gather to dodge transposed-
    layout propagation; measured at 2^24 the tiled ``swapaxes`` transpose
    is 8.6x faster and, feeding straight into the next sub-transform's
    scan inside this one jit, no longer leaks layouts across program
    boundaries.)

    ``constrain``: optional callback applying a last-axis sharding
    constraint (multi-chip meshes - see _fourstep_sharded_jit).  With the
    LAST axis sharded, every sub-NTT (a lax.scan of butterflies along
    axis -2) and the twiddle multiply are collective-free local work, and
    the one reshard GSPMD must insert is an all-to-all at the central
    transpose - the classic distributed four-step/FFT decomposition
    (SURVEY section 3.5; the work being distributed is the reference's
    src/ntt/mod.rs:69-110 loop nest).  Left unconstrained, the
    partitioner replicates the output and the per-device temp does not
    scale down with mesh size (measured: ~9.2 GiB/device at BOTH 2 and 8
    devices for the 2^25 encode; constrained it drops with D - pinned by
    tests/test_sharding_scale.py).
    """
    n = 1 << log_n
    if log_n == 0:
        return x
    a = (log_n + 1) // 2
    b = log_n - a
    A, B = 1 << a, 1 << b
    lead = x.shape[1:-1]
    M = x.reshape((8,) + lead + (A, B))
    if constrain is not None:
        M = constrain(M)  # shard B: column sub-NTTs along A are local

    # powers of w^B (the A-domain root) and w^A (the B-domain root)
    powsA = pows[:, ::B][:, : max(A // 2, 1)]
    powsB = pows[:, ::A][:, : max(B // 2, 1)]

    F = _bitrev_axis2(_pease_axis2(M, powsA, a, constrain), a)
    if constrain is not None:
        F = constrain(F)

    # twiddle multiply: T[a, b] = Tc[a >> split, b] * Tf[a & (S-1), b];
    # the broadcasts fuse into the muls inside this jit - no dense T
    S = Tf.shape[-2]
    from .config import pallas_enabled as _pe
    from .field import pallas_ops as _po

    if not lead and _pe() and _po.twiddle3_supported(A, S, B):
        # one fused pass: both muls in VMEM, factors stream as small blocks
        G = _po.twiddle_mul3(F, Tc, Tf, S)
    else:
        Fr = F.reshape((8,) + lead + (A // S, S, B))
        lead1 = (1,) * len(lead)
        Tc_b = jnp.broadcast_to(
            Tc.reshape((8,) + lead1 + (A // S, 1, B)), Fr.shape
        )
        Tf_b = jnp.broadcast_to(
            Tf.reshape((8,) + lead1 + (1, S, B)), Fr.shape
        )
        G = ops.mul(ops.mul(Fr, Tc_b), Tf_b).reshape(F.shape)
    if constrain is not None:
        G = constrain(G)

    Gt = jnp.swapaxes(G, G.ndim - 2, G.ndim - 1)  # lead + (B, A)
    if constrain is not None:
        Gt = constrain(Gt)  # shard A: the all-to-all reshard lands HERE

    H = _bitrev_axis2(_pease_axis2(Gt, powsB, b, constrain), b)
    # flat(H)[k2*A + k1] = out[k1 + A*k2]: already the natural order
    out = H.reshape((8,) + lead + (n,))
    if constrain is not None:
        out = constrain(out)  # hand the codeword back hypercube-sharded
    return out


_ntt_fourstep = partial(jax.jit, static_argnums=(4,))(_ntt_fourstep_impl)
# Donating variant for call sites whose coefficient buffer is transient
# (the RS-encode pipeline - frees 1 GB at 2^25).  The twiddle factors are
# a few MB and cached across proofs at every size, so they are never
# donated.
_ntt_fourstep_donated = partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))(
    _ntt_fourstep_impl
)


@functools.lru_cache(maxsize=8)
def _fourstep_shard_map(mesh, log_n: int, donate: bool):
    """EXPLICIT distributed four-step NTT: shard_map with local sub-NTTs
    and exactly three all-to-alls (the optimal reshard count for natural
    order in, natural order out).

    GSPMD left to its own devices mis-partitions the butterfly stages at
    north-star scale - measured at the 2^25 domain on 8 virtual devices it
    all-gathers the FULL array once per stage (81 all-gathers, ~33 GiB of
    per-device temps), while the same program at 2^21 partitions cleanly.
    The explicit decomposition never depends on the partitioner's cost
    model:

      local (8, A/D, B) chunk
        --all-to-all-->  (8, A, B/D)   column NTTs along A: LOCAL
        twiddle multiply (Tc/Tf arrive pre-sharded on B): LOCAL
        --all-to-all-->  (8, A/D, B) -> transpose -> (8, B, A/D)
                                        row NTTs along B: LOCAL
        --all-to-all-->  (8, B/D, A) = the contiguous flat output chunk

    Output values are bit-identical to the single-device transform (same
    per-element op sequence; pinned by tests/test_parallel.py).  Per-device
    memory is O(n/D) + the all-to-all buffers, and the collectives ride
    ICI on real multi-chip meshes (SURVEY section 3.5; the loop nest being
    distributed is reference src/ntt/mod.rs:69-110).
    """
    from jax.sharding import PartitionSpec as PS

    from .parallel import ROWS

    a = (log_n + 1) // 2
    b = log_n - a
    A, B = 1 << a, 1 << b
    D = mesh.size

    def body(x, powsA, powsB, Tc, Tf):
        M = x.reshape(8, A // D, B)
        M = jax.lax.all_to_all(M, ROWS, split_axis=2, concat_axis=1, tiled=True)
        F = _bitrev_axis2(_pease_axis2(M, powsA, a), a)  # (8, A, B/D)
        S = Tf.shape[-2]
        Fr = F.reshape(8, A // S, S, B // D)
        Tc_b = jnp.broadcast_to(Tc.reshape(8, A // S, 1, B // D), Fr.shape)
        Tf_b = jnp.broadcast_to(Tf.reshape(8, 1, S, B // D), Fr.shape)
        G = ops.mul(ops.mul(Fr, Tc_b), Tf_b).reshape(F.shape)
        G = jax.lax.all_to_all(G, ROWS, split_axis=1, concat_axis=2, tiled=True)
        Gt = jnp.swapaxes(G, 1, 2)  # (8, B, A/D)
        H = _bitrev_axis2(_pease_axis2(Gt, powsB, b), b)
        H = jax.lax.all_to_all(H, ROWS, split_axis=1, concat_axis=2, tiled=True)
        return H.reshape(8, (B // D) * A)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(PS(None, ROWS), PS(), PS(), PS(None, None, ROWS), PS(None, None, ROWS)),
        out_specs=PS(None, ROWS),
        check_vma=False,
    )
    kw = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(fn, **kw)


@functools.lru_cache(maxsize=8)
def _fourstep_sharded_jit(mesh, donate: bool):
    """Jitted four-step transform with last-axis sharding constraints for
    ``mesh`` (see _ntt_fourstep_impl's ``constrain`` doc).  Cached per mesh
    so repeated proves reuse one compiled program."""
    from jax.sharding import NamedSharding, PartitionSpec

    from .parallel import ROWS

    def constrain(x):
        spec = PartitionSpec(*((None,) * (x.ndim - 1) + (ROWS,)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    kw = dict(static_argnums=(4,))
    if donate:
        kw["donate_argnums"] = (0,)
    return partial(jax.jit, **kw)(
        lambda x, pows, Tc, Tf, log_n: _ntt_fourstep_impl(
            x, pows, Tc, Tf, log_n, constrain
        )
    )


def fourstep_transform(x, gen_v: int, log_n: int, donate: bool = False, mesh=None):
    """Four-step transform for the domain generated by ``gen_v``.

    Resolves the cached power table and twiddle factors for the generator
    and dispatches the (optionally input-donating) jitted transform.
    ``mesh``: a >1-device Mesh routes through the sharding-constrained
    variant (auto-detected from ``x``'s sharding when None).
    """
    if log_n == 0:
        return x
    pows = _pow_table(gen_v, log_n - 1)
    Tc, Tf = _twiddle_factors_cached(gen_v, log_n)
    if mesh is None and not isinstance(x, jax.core.Tracer):
        from .parallel.sharded_rounds import mesh_of

        mesh = mesh_of(x)
    if mesh is not None and mesh.size > 1:
        a = (log_n + 1) // 2
        A, B = 1 << a, 1 << (log_n - a)
        D = mesh.size
        if x.ndim == 2 and A % D == 0 and B % D == 0:
            # explicit shard_map four-step (3 all-to-alls, local sub-NTTs)
            powsA = pows[:, ::B][:, : max(A // 2, 1)]
            powsB = pows[:, ::A][:, : max(B // 2, 1)]
            return _fourstep_shard_map(mesh, log_n, donate)(
                x, powsA, powsB, Tc, Tf
            )
        # non-divisible / batched shapes: GSPMD with sharding constraints
        return _fourstep_sharded_jit(mesh, donate)(x, pows, Tc, Tf, log_n)
    fn = _ntt_fourstep_donated if donate else _ntt_fourstep
    return fn(x, pows, Tc, Tf, log_n)


def ntt(coeffs, pows=None):
    """Forward NTT along the last axis: out[i] = p(g^i), natural order.

    ``pows`` is accepted for API compatibility but ignored - the cached
    power table and twiddle matrix of the standard 2^log_n-domain
    generator are used.
    """
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    if log_n == 0:
        return coeffs
    return fourstep_transform(coeffs, pow2_generator(log_n).v, log_n)


@jax.jit
def _scale(x, s_limbs):
    s = ops.broadcast_scalar(s_limbs, x.shape[1:])
    return ops.mul(x, s)


def intt(evals, inv_pows=None):
    """Inverse NTT along the last axis (reference src/ntt/mod.rs:131-174)."""
    n = evals.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if inv_pows is None:
        inv_pows = inv_gen_pows(log_n)
    x = fourstep_transform(evals, pow2_generator(log_n).inv().v, log_n)
    n_inv = limbs.pack_scalar(Fp(n).inv())
    return _scale(x, jnp.asarray(n_inv))


def reed_solomon(coeffs, log_blowup: int = LOG_BLOWUP):
    """RS-encode: zero-pad coefficients x2^log_blowup, NTT over the big domain.

    Reference: src/fri/mod.rs:19-28 (rate 1/2).
    """
    n = coeffs.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    pad_width = [(0, 0)] * coeffs.ndim
    pad_width[-1] = (0, ((1 << log_blowup) - 1) * n)
    padded = jnp.pad(coeffs, pad_width)
    # padded is created here and never reused: donate it to the transform
    log_m = log_n + log_blowup
    return fourstep_transform(padded, pow2_generator(log_m).v, log_m, donate=True)
