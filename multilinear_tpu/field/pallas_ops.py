"""Pallas (Mosaic) TPU kernels for the hot field primitives.

The pure-jnp kernels in :mod:`multilinear_tpu.field.ops` lower to XLA
fusions that materialize the 64-plane outer product and the carry chains
in HBM (the chunked ``mul`` path literally writes them); at 2^20+ elements
the multiply is HBM-bandwidth-bound at ~10x its compute roofline.  These
Pallas kernels keep every intermediate of the schoolbook product and the
sparse-modulus reduction in VMEM/vregs: per element the multiply touches
HBM for exactly 64 B read + 32 B write.

The math is limb-for-limb identical to ``ops._mul_core`` (same column
sums, same three-fold reduction, same canonical subtract), so results are
bit-exact vs the jnp path - pinned by tests/test_pallas.py in interpreter
mode and by the on-TPU parity script.

Reference semantics: winterfell f128 canonical arithmetic
(reference src/field.rs); this file only changes WHERE the limb ops run,
not what they compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_MASK, NLIMBS

# Each grid step processes sub*128 elements; value vectors inside the
# kernel are (sub, 128) tiles so every op uses all 8 VPU sublanes.  sub=8
# is the minimum (one full vreg per limb); LARGER blocks amortize the
# per-limb DMA (the (8, M, 128) layout makes each block 8 separate
# sub*512-byte limb-plane chunks): measured copy floor at 2^22 goes
# 3.04 ms (sub=8) -> 2.32 ms (sub=128), and the Karatsuba mul rides at
# the floor.  _pick_sub chooses the largest size that divides the array.
_BLK = 1024  # flat lane multiple arrays are padded to (= 8 * 128)
_SUB = 8  # minimum sublane tile
_SUB_MAX = 128


def _pick_sub(m: int) -> int:
    sub = _SUB_MAX
    while m % sub:
        sub //= 2
    return sub

_MASK = int(LIMB_MASK)


def _wide_cols(al, bl):
    """Column sums of the 2^16-radix product via lo/hi split accumulation.

    Same values as ops._wide_mul_cols but built limb-list-wise with NO
    stacked 3-D intermediates (Mosaic cannot lower the pad-and-add tree's
    strided gathers; straight-line unrolled code lowers cleanly and lives
    in vregs anyway).  Accumulators stay < min(La,Lb)*2^16 * 2 < 2^20.
    """
    La, Lb = len(al), len(bl)
    nc = La + Lb - 1
    zero = jnp.zeros_like(al[0])
    cols_lo = [zero] * nc
    cols_hi = [zero] * nc
    for i in range(La):
        for j in range(Lb):
            p = al[i] * bl[j]  # 16x16 -> 32 exact
            k = i + j
            cols_lo[k] = cols_lo[k] + (p & _MASK)
            cols_hi[k] = cols_hi[k] + (p >> 16)
    # t_k = cols_lo[k] + cols_hi[k-1]  (hi halves weigh one limb more)
    return [cols_lo[0]] + [
        (cols_lo[k] if k < nc else zero) + cols_hi[k - 1] for k in range(1, nc + 1)
    ]


def _cols4(al, bl):
    """8 column sums of a 4x4 limb product (lo/hi split), each < 2^19."""
    zero = jnp.zeros_like(al[0])
    cols_lo = [zero] * 7
    cols_hi = [zero] * 7
    for i in range(4):
        for j in range(4):
            p = al[i] * bl[j]  # 16x16 -> 32 exact
            k = i + j
            cols_lo[k] = cols_lo[k] + (p & _MASK)
            cols_hi[k] = cols_hi[k] + (p >> 16)
    return [cols_lo[0]] + [
        (cols_lo[k] if k < 7 else zero) + cols_hi[k - 1] for k in range(1, 8)
    ]


def _halves_abs_diff(x):
    """Split an 8-limb list at 4: returns (x0, x1, |x0-x1| limbs, x0<x1)."""
    from . import ops

    x0, x1 = x[:4], x[4:]
    d01, b01 = ops._sub_chain(x0, x1)
    d10, _ = ops._sub_chain(x1, x0)
    neg = b01 != 0
    return x0, x1, [jnp.where(neg, q, p) for p, q in zip(d01, d10)], neg


def _wide_cols_karatsuba(al, bl):
    """Signed (int32) column sums of the 8x8-limb product, one Karatsuba level.

    a*b = z0 + z1*2^64 + z2*2^128 with z1 = z0 + z2 - (a0-a1)(b0-b1): 48
    lane multiplies instead of 64.  The middle product's sign is data-
    dependent, so columns are combined in int32 (|col| < 5*2^19 < 2^22) and
    carry-normalized with an arithmetic-shift chain; the grand total is the
    exact nonnegative product, so the signed chain ends with zero carry and
    every emitted limb equals the schoolbook path's (pinned by tests).
    """
    a0, a1, da, na = _halves_abs_diff(al)
    b0, b1, db, nb = _halves_abs_diff(bl)
    z0 = _cols4(a0, b0)
    z2 = _cols4(a1, b1)
    m = _cols4(da, db)
    # signs equal => (a0-a1)(b0-b1) = +|da||db| => z1 subtracts m
    sub_m = na == nb
    ms = [
        jnp.where(sub_m, -(c.astype(jnp.int32)), c.astype(jnp.int32)) for c in m
    ]
    cols = []
    for k in range(16):
        c = jnp.zeros(al[0].shape, jnp.int32)
        if k < 8:
            c = c + z0[k].astype(jnp.int32)
        if 4 <= k < 12:
            c = c + z0[k - 4].astype(jnp.int32) + z2[k - 4].astype(jnp.int32) + ms[k - 4]
        if 8 <= k:
            c = c + z2[k - 8].astype(jnp.int32)
        cols.append(c)
    return cols


def _carry_normalize_signed(cols, out_len):
    """int32 column sums -> clean uint32 limbs via an arithmetic-shift carry
    chain (floor semantics keep every limb in [0, 2^16) even while running
    partial sums dip negative; the exact total is nonnegative so the final
    carry is 0)."""
    out = []
    carry = jnp.zeros_like(cols[0])
    n = len(cols)
    for k in range(out_len):
        v = carry + (cols[k] if k < n else 0)
        out.append((v & 0xFFFF).astype(jnp.uint32))
        carry = v >> 16  # arithmetic shift = floor division
    return out


def _mul_limbs(al, bl):
    """Karatsuba product + sparse-modulus reduction on 8-limb lists.

    al, bl: lists of 8 same-shaped uint32 arrays (clean limbs < 2^16).
    Returns 8 clean limbs of (a*b) mod p - value-identical to
    ops._mul_core (same reduction; the product columns are combined
    Karatsuba-style, 48 lane multiplies instead of 64, and the folds use
    the K = 11520*2^32 - 1 shift-multiply form: ~59 multiplies total
    vs the old ~100)."""
    from . import ops

    t = _carry_normalize_signed(_wide_cols_karatsuba(al, bl), 16)
    y, _ = ops._fold_ge8(t)
    z, cz = ops._fold_ge8(y[:11])
    z = z + [cz]
    # z[8] is in {0,1}: K*z[8] is a select of the 3-limb K constant
    k_or_zero = [jnp.where(z[8] != 0, k, np.uint32(0)) for k in ops._K]
    addend = k_or_zero + [jnp.zeros_like(z[0])] * 5
    w, _ = ops._add_chain(z[:8], addend)
    return ops._canon_sub_p(w)


def _mul_kernel(a_ref, b_ref, o_ref):
    al = [a_ref[i] for i in range(NLIMBS)]
    bl = [b_ref[i] for i in range(NLIMBS)]
    out = _mul_limbs(al, bl)
    for i in range(NLIMBS):
        o_ref[i] = out[i]


@functools.partial(jax.jit, static_argnames=("sub",))
def _mul_flat(a, b, sub: int = _SUB):
    """(8, M, 128) x (8, M, 128) field multiply, M a multiple of sub.

    Each grid step works on an (8, sub, 128) block; slicing limb l yields
    a (sub, 128) tile that fills all 8 VPU sublanes (a (1, blk) row layout
    would use 1 of 8 sublanes and run the whole kernel at 1/8 throughput).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = a.shape[1]
    grid = (m // sub,)
    spec = pl.BlockSpec(
        (NLIMBS, sub, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, m, 128), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b)


def mul(a, b):
    """(a * b) mod p via the Pallas kernel; shapes must match.

    Flattens value dims, pads the lane axis to a block multiple, and
    restores the shape.  Callers guarantee canonical (< p) inputs.
    """
    assert a.shape == b.shape
    S = a.shape[1:]
    total = 1
    for d in S:
        total *= d
    af = a.reshape(NLIMBS, total)
    bf = b.reshape(NLIMBS, total)
    pad = (-total) % _BLK
    if pad:
        af = jnp.pad(af, ((0, 0), (0, pad)))
        bf = jnp.pad(bf, ((0, 0), (0, pad)))
    n = af.shape[1]
    out = _mul_flat(
        af.reshape(NLIMBS, n // 128, 128),
        bf.reshape(NLIMBS, n // 128, 128),
        sub=_pick_sub(n // 128),
    ).reshape(NLIMBS, n)
    if pad:
        out = out[:, :total]
    return out.reshape((NLIMBS,) + S)


# ---------------------------------------------------------------------------
# fused FRI fold:  next = ((a + b) + r * (a - b) * tw) * 1/2, evaluated in
# the 2-multiply form  half(a+b) + (a-b) * tw * (r/2)  (the division by two
# is a multiply-free shift-add and the r and 1/2 scalars collapse into the
# precomputed rh = r * 2^{-1}; same canonical value - see fri._rh_scalar).
# One pass, two in-VMEM multiplies, 96 B read + 32 B write per output.
# ---------------------------------------------------------------------------


def _fold_kernel(a_ref, b_ref, tw_ref, rh_ref, o_ref):
    from . import ops

    al = [a_ref[i] for i in range(NLIMBS)]
    bl = [b_ref[i] for i in range(NLIMBS)]
    tw = [tw_ref[i] for i in range(NLIMBS)]
    shape = al[0].shape
    rhl = [jnp.broadcast_to(rh_ref[i], shape) for i in range(NLIMBS)]

    even = ops._half_list(_add_mod(al, bl))

    diff, borrow = ops._sub_chain(al, bl)
    k_or_zero = [jnp.where(borrow != 0, k, jnp.uint32(0)) for k in ops._K]
    k_or_zero += [jnp.zeros_like(diff[0])] * (NLIMBS - 3)
    odd, _ = ops._sub_chain(diff, k_or_zero)

    odd = _mul_limbs(odd, tw)
    odd = _mul_limbs(rhl, odd)

    out = _add_mod(even, odd)
    for i in range(NLIMBS):
        o_ref[i] = out[i]


@functools.partial(jax.jit, static_argnames=("sub",))
def _fold_flat(a, b, tw, rh_limbs, sub: int = _SUB):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = a.shape[1]
    grid = (m // sub,)
    spec = pl.BlockSpec(
        (NLIMBS, sub, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec(
        (NLIMBS, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _fold_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, m, 128), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec, spec, sspec],
        out_specs=spec,
    )(a, b, tw, rh_limbs.reshape(NLIMBS, 1, 1))


# ---------------------------------------------------------------------------
# fused NTT butterfly:  p = u + v,  q = (u - v) * tw[row],  rows interleaved.
# The jnp scan body had to materialize the broadcast twiddle operand (the
# elementwise mul kernel wants equal shapes) - 1 GB of extra traffic per
# stage at 2^24.  Here the per-row twiddle is read as an (8, R, 1) block
# and broadcast in-kernel.
# ---------------------------------------------------------------------------

_BF_R = 8  # butterfly rows per block (sublane dim of each limb tile)


def _butterfly_kernel(u_ref, v_ref, tw_ref, o_ref):
    from . import ops

    ul = [u_ref[i] for i in range(NLIMBS)]  # (R, BLK)
    vl = [v_ref[i] for i in range(NLIMBS)]
    shape = ul[0].shape
    twl = [jnp.broadcast_to(tw_ref[i], shape) for i in range(NLIMBS)]

    # p = u + v (mod p), exactly as ops.add
    s, carry = ops._add_chain(ul, vl)
    k_or_zero = [jnp.where(carry != 0, k, jnp.uint32(0)) for k in ops._K]
    k_or_zero += [jnp.zeros_like(s[0])] * (NLIMBS - 3)
    p, _ = ops._add_chain(s, k_or_zero)
    p = ops._canon_sub_p(p)

    # q = (u - v) * tw (mod p), exactly as ops.sub then mul
    d, borrow = ops._sub_chain(ul, vl)
    k_or_zero = [jnp.where(borrow != 0, k, jnp.uint32(0)) for k in ops._K]
    k_or_zero += [jnp.zeros_like(d[0])] * (NLIMBS - 3)
    diff, _ = ops._sub_chain(d, k_or_zero)
    q = _mul_limbs(diff, twl)

    for i in range(NLIMBS):
        o_ref[i, :, 0, :] = p[i]
        o_ref[i, :, 1, :] = q[i]


@jax.jit
def _butterfly_flat(u, v, tw_col):
    """u, v: (8, H, C); tw_col: (8, H, 1).  Returns (8, H, 2, C) with
    out[:, i, 0] = u[i]+v[i] and out[:, i, 1] = (u[i]-v[i])*tw[i]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, C = u.shape[1], u.shape[2]
    grid = (H // _BF_R, C // 128)
    io_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    tw_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 1), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 2, 128), lambda i, j: (0, i, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _butterfly_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, H, 2, C), jnp.uint32),
        grid=grid,
        in_specs=[io_spec, io_spec, tw_spec],
        out_specs=out_spec,
    )(u, v, tw_col)


def butterfly_supported(half: int, C: int) -> bool:
    return half % _BF_R == 0 and C % 128 == 0


def butterfly(u, v, tw_col):
    """Fused Pease butterfly stage; see _butterfly_flat for the contract."""
    return _butterfly_flat(u, v, tw_col)


# ---------------------------------------------------------------------------
# fused DOUBLE butterfly stage: two consecutive Pease radix-2 stages in one
# HBM pass.  Identical op sequence to applying the radix-2 butterfly twice
# (bit-exact), but the intermediate layer never round-trips through HBM -
# the per-double-stage traffic halves.  For groups i in [0, M/4):
#     A = x0+x2, Bta = (x0-x2)*ta,  C = x1+x3, Dtb = (x1-x3)*tb
#     z[4i]   = A + C          z[4i+1] = (A - C) * tc
#     z[4i+2] = Bta + Dtb      z[4i+3] = (Bta - Dtb) * td
# where (x0..x3) are the row quarters and (ta, tb, tc, td) the stage-s /
# stage-(s+1) twiddles at (i, i+M/4, 2i, 2i+1).
# ---------------------------------------------------------------------------


def _add_mod(ul, vl):
    from . import ops

    s, carry = ops._add_chain(ul, vl)
    k_or_zero = [jnp.where(carry != 0, k, jnp.uint32(0)) for k in ops._K]
    k_or_zero += [jnp.zeros_like(s[0])] * (NLIMBS - 3)
    p, _ = ops._add_chain(s, k_or_zero)
    return ops._canon_sub_p(p)


def _sub_mod(ul, vl):
    from . import ops

    d, borrow = ops._sub_chain(ul, vl)
    k_or_zero = [jnp.where(borrow != 0, k, jnp.uint32(0)) for k in ops._K]
    k_or_zero += [jnp.zeros_like(d[0])] * (NLIMBS - 3)
    out, _ = ops._sub_chain(d, k_or_zero)
    return out


def _butterfly2_kernel(x_ref, tw_ref, o_ref):
    shape = x_ref[0, 0].shape  # (R, 128)

    def tw(k):
        return [
            jnp.broadcast_to(tw_ref[i, :, k : k + 1], shape) for i in range(NLIMBS)
        ]

    x0 = [x_ref[i, 0] for i in range(NLIMBS)]
    x1 = [x_ref[i, 1] for i in range(NLIMBS)]
    x2 = [x_ref[i, 2] for i in range(NLIMBS)]
    x3 = [x_ref[i, 3] for i in range(NLIMBS)]

    A = _add_mod(x0, x2)
    Bta = _mul_limbs(_sub_mod(x0, x2), tw(0))
    C = _add_mod(x1, x3)
    Dtb = _mul_limbs(_sub_mod(x1, x3), tw(1))

    z0 = _add_mod(A, C)
    z1 = _mul_limbs(_sub_mod(A, C), tw(2))
    z2 = _add_mod(Bta, Dtb)
    z3 = _mul_limbs(_sub_mod(Bta, Dtb), tw(3))

    for i in range(NLIMBS):
        o_ref[i, :, 0, :] = z0[i]
        o_ref[i, :, 1, :] = z1[i]
        o_ref[i, :, 2, :] = z2[i]
        o_ref[i, :, 3, :] = z3[i]


@jax.jit
def _butterfly2_flat(xq, tw4):
    """xq: (8, 4, Q, C) row quarters; tw4: (8, Q, 4).  Returns
    (8, Q, 4, C): out[:, i, k] = z[4i+k] of the fused double stage."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, C = xq.shape[2], xq.shape[3]
    grid = (Q // _BF_R, C // 128)
    in_spec = pl.BlockSpec(
        (NLIMBS, 4, _BF_R, 128), lambda i, j: (0, 0, i, j), memory_space=pltpu.VMEM
    )
    tw_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 4), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 4, 128), lambda i, j: (0, i, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _butterfly2_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, Q, 4, C), jnp.uint32),
        grid=grid,
        in_specs=[in_spec, tw_spec],
        out_specs=out_spec,
    )(xq, tw4)


def _butterfly_notw_kernel(u_ref, v_ref, o_ref):
    ul = [u_ref[i] for i in range(NLIMBS)]
    vl = [v_ref[i] for i in range(NLIMBS)]
    p = _add_mod(ul, vl)
    q = _sub_mod(ul, vl)
    for i in range(NLIMBS):
        o_ref[i, :, 0, :] = p[i]
        o_ref[i, :, 1, :] = q[i]


@jax.jit
def _butterfly_notw_flat(u, v):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, C = u.shape[1], u.shape[2]
    grid = (H // _BF_R, C // 128)
    io_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 2, 128), lambda i, j: (0, i, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _butterfly_notw_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, H, 2, C), jnp.uint32),
        grid=grid,
        in_specs=[io_spec, io_spec],
        out_specs=out_spec,
    )(u, v)


def butterfly_notw(u, v):
    """Twiddle-free butterfly (p = u+v, q = u-v) for stages whose twiddles
    are all g^0 = 1 (the final Pease stage): mul-by-1 returns its canonical
    operand unchanged, so dropping the multiply is bit-identical and saves
    a full in-VMEM field multiply per element."""
    return _butterfly_notw_flat(u, v)


# ---------------------------------------------------------------------------
# fused four-step twiddle multiply: G[a, b] = F[a, b] * Tc[a>>split, b]
# * Tf[a & (S-1), b] in ONE pass (the jnp path runs two full-size muls).
# Row blocks of 8 share their Tc row when S >= 8 and iterate d = a & (S-1)
# within a block, so both factors stream as small broadcast blocks.
# ---------------------------------------------------------------------------


def _twiddle_mul3_kernel(f_ref, tc_ref, tf_ref, o_ref):
    fl = [f_ref[i] for i in range(NLIMBS)]
    shape = fl[0].shape
    # tc_ref blocks are (1, 1, 128) per limb (see tc_spec): squeeze the
    # unit row axis, then broadcast the shared coarse twiddle over the block
    tcl = [jnp.broadcast_to(tc_ref[i, 0], shape) for i in range(NLIMBS)]
    tfl = [tf_ref[i] for i in range(NLIMBS)]
    out = _mul_limbs(_mul_limbs(fl, tcl), tfl)
    for i in range(NLIMBS):
        o_ref[i] = out[i]


@functools.partial(jax.jit, static_argnames=("S",))
def _twiddle_mul3_flat(F, Tc, Tf, S: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, B = F.shape[1], F.shape[2]
    d_blocks = S // _BF_R
    grid = (A // _BF_R, B // 128)
    f_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    # Mosaic requires each block's LAST TWO dims to be (multiples of 8, 128)
    # or exactly the array dims.  A (1, 128) row-slice of the (A/S, B) coarse
    # table violates the sublane rule whenever A/S > 1, so Tc is lifted to
    # (8, A/S, 1, B): the unit axis becomes the block's sublane dim and the
    # row selection i // d_blocks moves to a leading (unconstrained) axis.
    tc_spec = pl.BlockSpec(
        (NLIMBS, 1, 1, 128),
        lambda i, j: (0, i // d_blocks, 0, j),
        memory_space=pltpu.VMEM,
    )
    tf_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 128), lambda i, j: (0, i % d_blocks, j),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _twiddle_mul3_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, A, B), jnp.uint32),
        grid=grid,
        in_specs=[f_spec, tc_spec, tf_spec],
        out_specs=f_spec,
    )(F, Tc.reshape(NLIMBS, A // S, 1, B), Tf)


def twiddle3_supported(A: int, S: int, B: int) -> bool:
    return A % _BF_R == 0 and S % _BF_R == 0 and B % 128 == 0


def twiddle_mul3(F, Tc, Tf, S: int):
    """G[a, b] = F[a, b] * Tc[a >> log2(S), b] * Tf[a & (S-1), b], one pass.

    Bit-identical to mul(mul(F, broadcast(Tc)), broadcast(Tf)) - the jnp
    four-step twiddle multiply - because each elementwise multiply is the
    same canonical field op on the same operands."""
    return _twiddle_mul3_flat(F, Tc, Tf, S)


# ---------------------------------------------------------------------------
# tensor-product (kron) multiply: out[a, b] = t[a] * s[b].  The jnp path
# (mle._kron_mul) broadcasts BOTH operands to the full (8, m, n) output
# before the multiply - at the 2^24 delta table that materializes ~1 GB of
# broadcast operands in HBM.  Here each factor streams as a tiny block
# ((R, 1) rows / (1, 128) cols) and broadcasts in VMEM.
# ---------------------------------------------------------------------------


def _kron_kernel(t_ref, s_ref, o_ref):
    shape = o_ref[0].shape  # (R, 128)
    tl = [jnp.broadcast_to(t_ref[i], shape) for i in range(NLIMBS)]
    sl = [jnp.broadcast_to(s_ref[i], shape) for i in range(NLIMBS)]
    out = _mul_limbs(tl, sl)
    for i in range(NLIMBS):
        o_ref[i] = out[i]


@jax.jit
def _kron_flat(t, s):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n = t.shape[1], s.shape[1]
    grid = (m // _BF_R, n // 128)
    t_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 1), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec(
        (NLIMBS, 1, 128), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (NLIMBS, _BF_R, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _kron_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, m, n), jnp.uint32),
        grid=grid,
        in_specs=[t_spec, s_spec],
        out_specs=o_spec,
    )(t.reshape(NLIMBS, m, 1), s.reshape(NLIMBS, 1, n))


def kron_supported(m: int, n: int) -> bool:
    return m % _BF_R == 0 and n % 128 == 0


def kron_mul(a, b):
    """(8, m), (8, n) -> (8, m*n) with out[i*n+j] = a[i]*b[j]; same
    canonical field multiply as ops.mul on the broadcast operands."""
    m, n = a.shape[1], b.shape[1]
    return _kron_flat(a, b).reshape(NLIMBS, m * n)


# ---------------------------------------------------------------------------
# multi-stage zeta/Moebius butterfly: ALL butterflies for a GROUP of axis -2
# index bits in one HBM pass.  The jnp path (mle._bit_passes) runs one full
# read+write sweep per bit (log n sweeps at 2^n); here 2^c rows sit in VMEM
# and c bit-stages run in-register, so a 2^24 transform needs ceil(24/c)
# sweeps.  Bits >= c are handled OUTSIDE by viewing (M, K) as
# (M >> d, K << d) - merging 2^d consecutive rows into longer rows makes
# bit d the lowest axis -2 bit, with no data movement (row-major view).
# Pure add/sub: bit-identical to ops.add/ops.sub stage by stage.
# ---------------------------------------------------------------------------

_ZM_BITS = 8  # index bits butterflied per pass (2^8 rows x 128 lanes in VMEM)


def _zm_group_kernel(add: bool, c: int):
    def kernel(x_ref, o_ref):
        rows = 1 << c
        v = [x_ref[i] for i in range(NLIMBS)]  # (rows, 128) per limb
        for s in range(c):
            q = rows >> (s + 1)
            w = [vv.reshape(q, 2, 1 << s, 128) for vv in v]
            lo = [ww[:, 0] for ww in w]
            hi = [ww[:, 1] for ww in w]
            hi2 = _add_mod(hi, lo) if add else _sub_mod(hi, lo)
            v = [
                jnp.concatenate([l[:, None], h[:, None]], axis=1).reshape(rows, 128)
                for l, h in zip(lo, hi2)
            ]
        for i in range(NLIMBS):
            o_ref[i] = v[i]

    return kernel


@functools.partial(jax.jit, static_argnames=("c", "add"))
def _zm_group_flat(x, c: int, add: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape[1], x.shape[2]
    rows = 1 << c
    grid = (M // rows, K // 128)
    spec = pl.BlockSpec(
        (NLIMBS, rows, 128), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _zm_group_kernel(add, c),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, M, K), jnp.uint32),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
    )(x)


def zm_supported(M: int, K: int) -> bool:
    return M >= 2 and K % 128 == 0


def zm_butterfly_axis2(x, log_m: int, add: bool):
    """hi' = hi op lo for EVERY bit of the axis -2 index of (8, M, K).

    Same per-stage op sequence as mle._bit_passes' per-bit loop (exact
    mod-p arithmetic is order-independent and each stage's canonical
    output is identical), in ceil(log_m / _ZM_BITS) HBM passes.
    """
    M, K = x.shape[1], x.shape[2]
    done = 0
    while done < log_m:
        c = min(_ZM_BITS, log_m - done)
        v = x.reshape(8, M >> done, K << done)
        v = _zm_group_flat(v, c, add)
        x = v.reshape(8, M, K)
        done += c
    return x


def butterfly2_supported(M: int, C: int) -> bool:
    return M >= 4 and (M // 4) % _BF_R == 0 and C % 128 == 0


def butterfly2(x, tw4):
    """Fused double Pease stage on (8, M, C); tw4: (8, M/4, 4) packed
    (ta, tb, tc, td) twiddles.  Returns (8, M, C), bit-identical to two
    consecutive radix-2 stages."""
    M, C = x.shape[1], x.shape[2]
    out = _butterfly2_flat(x.reshape(8, 4, M // 4, C), tw4)
    return out.reshape(8, M, C)


# ---------------------------------------------------------------------------
# fused FRI fold + pair-leaf SHA-256: ONE HBM pass per round producing BOTH
# the folded codeword (already in the (2, q) Merkle pair layout) and the
# leaf digest level.  The separate commit otherwise re-reads the folded
# codeword from HBM (m/2 * 32 B per round) just to hash it; here each leaf's
# two elements are folded and hashed while still in vregs.  Grid block i
# covers leaves [i*sub*128, ...): it reads code quarters a_lo/a_hi/b_lo/b_hi
# (nxt[i] = fold(a[i], b[i]); leaf i = H(nxt[i] || nxt[i+q])), the two
# twiddle halves, folds both, writes the pair block, and runs one unrolled
# SHA-256 compression (32-byte message = 1 block) for the digest.
# ---------------------------------------------------------------------------

_FC_SUB_MAX = 32  # fold operands + ~80 live SHA words: cap VMEM per block


def _limb_words(l):
    """8 clean 16-bit limbs -> 4 big-endian SHA words; exactly
    sha256.limbs_to_words' byte layout (quirk Q9)."""
    out = []
    for j in range(4):
        l0, l1 = l[2 * j], l[2 * j + 1]
        out.append(
            ((l0 & 0xFF) << 24) | ((l0 >> 8) << 16) | ((l1 & 0xFF) << 8) | (l1 >> 8)
        )
    return out


def _fold_commit_kernel(x_ref, tw_ref, rh_ref, o_ref, d_ref):
    from . import ops
    from ..sha256 import _H0
    from ..sha256_pallas import _compress_unrolled

    def quarter(k):
        return [x_ref[i, k] for i in range(NLIMBS)]

    a_lo, a_hi = quarter(0), quarter(1)
    b_lo, b_hi = quarter(2), quarter(3)
    tw_lo = [tw_ref[i, 0] for i in range(NLIMBS)]
    tw_hi = [tw_ref[i, 1] for i in range(NLIMBS)]
    shape = a_lo[0].shape
    rhl = [jnp.broadcast_to(rh_ref[i], shape) for i in range(NLIMBS)]

    def fold(al, bl, twl):
        even = ops._half_list(_add_mod(al, bl))
        odd = _mul_limbs(_mul_limbs(_sub_mod(al, bl), twl), rhl)
        return _add_mod(even, odd)

    n_lo = fold(a_lo, b_lo, tw_lo)
    n_hi = fold(a_hi, b_hi, tw_hi)
    for i in range(NLIMBS):
        o_ref[i, 0] = n_lo[i]
        o_ref[i, 1] = n_hi[i]

    # SHA-256 of the 32-byte pair message: 8 words + standard 1-block pad
    def const(v):
        return jnp.full(shape, np.uint32(v), jnp.uint32)

    words = _limb_words(n_lo) + _limb_words(n_hi)
    words.append(const(0x80000000))
    words += [const(0)] * 5
    words += [const(0), const(256)]  # bit length 32*8 = 256
    state = _compress_unrolled([const(int(h)) for h in _H0], words)
    for i in range(8):
        d_ref[i] = state[i]


@functools.partial(jax.jit, static_argnames=("sub",))
def _fold_commit_flat(x, tw, rh_limbs, sub: int = _SUB):
    """x: (8, 4, Q, 128) code quarters; tw: (8, 2, Q, 128); rh: (8,).
    Returns ((8, 2, Q, 128) folded pairs, (8, Q, 128) leaf digests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = x.shape[2]
    grid = (Q // sub,)
    x_spec = pl.BlockSpec(
        (NLIMBS, 4, sub, 128), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )
    tw_spec = pl.BlockSpec(
        (NLIMBS, 2, sub, 128), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec(
        (NLIMBS, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (NLIMBS, 2, sub, 128), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )
    d_spec = pl.BlockSpec(
        (8, sub, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _fold_commit_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NLIMBS, 2, Q, 128), jnp.uint32),
            jax.ShapeDtypeStruct((8, Q, 128), jnp.uint32),
        ),
        grid=grid,
        in_specs=[x_spec, tw_spec, s_spec],
        out_specs=(o_spec, d_spec),
    )(x, tw, rh_limbs.reshape(NLIMBS, 1, 1))


def fold_commit_supported(m: int) -> bool:
    """True when the fused fold+leaf-hash kernel handles an m-codeword
    (quarters must stay whole (sub, 128) tiles - no pad path: a padded
    lane would hash garbage into a real digest slot)."""
    return m % (4 * _BLK) == 0


def fold_commit_leaves(code, twiddles, r_limbs, half_limbs):
    """One FRI fold + leaf hashing of the pair view, fused.

    code: (8, m); twiddles: (8, m/2); returns (pairs (8, 2, m/4),
    leaf_digests (8, m/4)) with pairs == fold(code).reshape(8, 2, m/4) and
    digests == the Merkle leaf level over those pairs - bit-identical to
    fri._fold_codeword + merkle leaf hashing (pinned by tests).
    """
    from . import ops

    m = code.shape[-1]
    q = m // 4
    rh = ops.mul(r_limbs.reshape(NLIMBS, 1), half_limbs.reshape(NLIMBS, 1))[:, 0]
    x = code.reshape(NLIMBS, 4, q // 128, 128)
    tw = twiddles.reshape(NLIMBS, 2, q // 128, 128)
    sub = _FC_SUB_MAX
    while (q // 128) % sub:
        sub //= 2
    pairs, digs = _fold_commit_flat(x, tw, rh, sub=sub)
    return pairs.reshape(NLIMBS, 2, q), digs.reshape(8, q)


def fold_codeword(code, twiddles, r_limbs, half_limbs):
    """One FRI fold (8, m) -> (8, m/2), fully fused in VMEM.

    Same semantics as fri._fold_codeword: next[i] = ((a+b) + r*(a-b)*tw)/2,
    evaluated in the 2-multiply half(a+b) + (a-b)*tw*(r/2) form.
    """
    from . import ops

    m = code.shape[-1]
    half = m // 2
    a, b = code[..., :half], code[..., half:]
    tw = twiddles
    rh = ops.mul(r_limbs.reshape(NLIMBS, 1), half_limbs.reshape(NLIMBS, 1))[:, 0]
    pad = (-half) % _BLK
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, pad)))
        tw = jnp.pad(tw, ((0, 0), (0, pad)))
    n = a.shape[1]
    out = _fold_flat(
        a.reshape(NLIMBS, n // 128, 128),
        b.reshape(NLIMBS, n // 128, 128),
        tw.reshape(NLIMBS, n // 128, 128),
        rh,
        sub=_pick_sub(n // 128),
    ).reshape(NLIMBS, n)
    if pad:
        out = out[:, :half]
    return out
