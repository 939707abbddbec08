"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic in 2x uint32 lanes.

The production 64-bit field for the perf configs (the reference only exercises
<=21-bit test moduli, but BASELINE.md's field-ops/s metric wants a real 64-bit
prime). Elements are stored canonical (< p) as a structure-of-arrays pair
``(lo, hi)`` of uint32 — SoA keeps every op elementwise on the VPU with
perfect (8,128) tiling.

Reduction uses 2^64 === 2^32 - 1 =: EPS (mod p) and 2^96 === -1 (mod p), so a
128-bit product n3*2^96 + n2*2^64 + (n1,n0) reduces to
(n1,n0) + n2*EPS - n3 with a couple of conditional EPS fixups — no Montgomery
form needed. All helpers are pure jnp on uint32 arrays, usable inside jit and
Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from .backend32 import mul32_hilo, mul32_hilo_k3

import numpy as np

U32 = jnp.uint32
# numpy scalars (not jnp arrays): they embed as literals in traced code,
# which keeps these functions usable inside Pallas kernel bodies
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)
EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 === 2^64 mod p


def _carry_add(x, y):
    """(x + y) wrapping uint32, plus carry-out in {0,1}."""
    s = x + y
    return s, (s < x).astype(U32)


def _add64(alo, ahi, blo, bhi):
    """Wrapping 64-bit add on uint32 pairs -> (lo, hi, carry_out)."""
    lo, c0 = _carry_add(alo, blo)
    t, c1 = _carry_add(ahi, bhi)
    hi, c2 = _carry_add(t, c0)
    return lo, hi, c1 + c2  # carries are exclusive; sum is 0 or 1


def _sub64(alo, ahi, blo, bhi):
    """Wrapping 64-bit sub on uint32 pairs -> (lo, hi, borrow_out)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    t = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi = t - b0
    b2 = (t < b0).astype(U32)
    return lo, hi, b1 + b2


def _geq_p(lo, hi):
    return (hi == P_HI) & (lo >= P_LO)


# Conditional-fixup style: every fixup below applies "+/- EPS when a
# carry/borrow bit fired" / "- p when >= p". Two formulations, bit-exact
# identical values either way (benchmarks flip the switch and clear jit
# caches, like set_karatsuba):
#
# - select (style 1): compute the fixed-up pair unconditionally and
#   jnp.where on the condition — the original formulation.
# - arithmetic mask (style 0): for a condition bit c in {0, 1},
#   (0 - c) = 0 or 0xFFFFFFFF = c * EPS, so adding/subtracting
#   (0 - c, 0) applies the EPS fixup exactly when c = 1, and
#   p * c = (c, 0 - c) subtracts p exactly when c = 1 — two selects
#   become one negation.
#
# Measured (bench_logs/r4, 2^23 fused round): the mulcost microbench
# prices a standalone select at 1.5x an add, but in the fused kernels XLA
# lowers the select formulation 2.3x FASTER (sustained_xla 1.68 ms vs
# 3.91 ms; Pallas is indifferent, 1.33 vs 1.31) — selects are the
# default; masks stay behind the switch for hardware studies.

_SELECT_FIXUPS = [True]


def set_select_fixups(on) -> None:
    """Select the fixup formulation: True = jnp.where selects, False =
    arithmetic masks. Bit-identical outputs; benchmarks only. Callers
    must clear jit caches when flipping mid-process."""
    _SELECT_FIXUPS[0] = bool(on)


def _reduce_once(lo, hi):
    """Subtract p once if (lo,hi) >= p. Input < 2^64."""
    if _SELECT_FIXUPS[0]:
        need = _geq_p(lo, hi)
        slo, shi, _ = _sub64(lo, hi, P_LO, P_HI)
        return jnp.where(need, slo, lo), jnp.where(need, shi, hi)
    need = _geq_p(lo, hi).astype(U32)
    slo, shi, _ = _sub64(lo, hi, need, jnp.zeros_like(hi) - need)
    return slo, shi


def add(alo, ahi, blo, bhi):
    """Modular add of canonical elements."""
    lo, hi, carry = _add64(alo, ahi, blo, bhi)
    # On 2^64 wraparound the true value is (lo,hi) + EPS (mod p); the fixup
    # cannot re-carry because a+b < 2p => wrapped < 2^64 - 2^33 + 2.
    if _SELECT_FIXUPS[0]:
        lo2, hi2, _ = _add64(lo, hi, EPS, jnp.zeros_like(hi))
        lo = jnp.where(carry == 1, lo2, lo)
        hi = jnp.where(carry == 1, hi2, hi)
    else:
        lo, hi, _ = _add64(
            lo, hi, jnp.zeros_like(lo) - carry, jnp.zeros_like(hi)
        )
    return _reduce_once(lo, hi)


def sub(alo, ahi, blo, bhi):
    lo, hi, borrow = _sub64(alo, ahi, blo, bhi)
    # Borrow: true value = wrapped - 2^64 === wrapped - EPS (mod p).
    if _SELECT_FIXUPS[0]:
        lo2, hi2, _ = _sub64(lo, hi, EPS, jnp.zeros_like(hi))
        return (
            jnp.where(borrow == 1, lo2, lo),
            jnp.where(borrow == 1, hi2, hi),
        )
    lo, hi, _ = _sub64(
        lo, hi, jnp.zeros_like(lo) - borrow, jnp.zeros_like(hi)
    )
    return lo, hi


def neg(alo, ahi):
    is_zero = (alo == 0) & (ahi == 0)
    lo, hi, _ = _sub64(P_LO, P_HI, alo, ahi)
    return jnp.where(is_zero, alo, lo), jnp.where(is_zero, ahi, hi)


def _mul_words(alo, ahi, blo, bhi):
    """Full 64x64 -> 128-bit product as four uint32 words (w0..w3).

    Dispatches on the module switch (see :func:`set_karatsuba`):
    level 0 = schoolbook (four 32x32 products = 16 lane multiplies),
    level 1 = Karatsuba over 32-bit halves (three 32x32 = 12 lane
    multiplies), level 2 = Karatsuba at BOTH levels (three 3-multiply
    32x32s = 9 lane multiplies, more carry/select bookkeeping). All
    produce the identical exact words, so the switch can never change a
    transcript byte; which level is fastest depends on the VPU's
    multiply : add cost ratio (benches/roofline.py --mulcost)."""
    level = _KARATSUBA_LEVEL[0]
    if level >= 1:
        return _mul_words_karatsuba(
            alo, ahi, blo, bhi, mul32_hilo_k3 if level >= 2 else mul32_hilo
        )
    return _mul_words_school(alo, ahi, blo, bhi)


def set_karatsuba(level) -> None:
    """Select the 64x64 limb-product decomposition: 0/False = schoolbook,
    1/True = 3x 32x32 Karatsuba, 2 = recursive (9 lane multiplies).
    Callers must clear jit caches themselves if flipping mid-process
    (benchmarks only)."""
    _KARATSUBA_LEVEL[0] = int(level)


_KARATSUBA_LEVEL = [0]


def _mul_words_school(alo, ahi, blo, bhi):
    """Schoolbook 64x64 -> 128: four 32x32 partial products."""
    h0, l0 = mul32_hilo(alo, blo)
    h1, l1 = mul32_hilo(alo, bhi)
    h2, l2 = mul32_hilo(ahi, blo)
    h3, l3 = mul32_hilo(ahi, bhi)

    w0 = l0
    acc1, ca = _carry_add(h0, l1)
    acc1, cb = _carry_add(acc1, l2)
    w1 = acc1
    c1 = ca + cb  # 0..2

    acc2, da = _carry_add(h1, h2)
    acc2, db = _carry_add(acc2, l3)
    acc2, dc = _carry_add(acc2, c1)
    w2 = acc2
    w3 = h3 + da + db + dc  # exact: total product < 2^128
    return w0, w1, w2, w3


def _mul_words_karatsuba(alo, ahi, blo, bhi, mul32=mul32_hilo):
    """Karatsuba 64x64 -> 128: THREE 32x32 products instead of four
    (VERDICT r2 next-round #4 — the round kernel is VPU-multiply bound).

    mid = alo*bhi + ahi*blo is recovered as (alo+ahi)(blo+bhi) - ll - hh.
    The 33-bit sums are carried as (u32, carry-bit); the cross terms the
    carries drop are added back as predicated 2^32-offset adds (selects,
    not multiplies). All words exact — output identical to _mul_words.
    ``mul32`` selects the 32x32 primitive (4-multiply schoolbook or the
    3-multiply backend32.mul32_hilo_k3 for the recursive level).
    """
    hl0, ll0 = mul32(alo, blo)  # ll = alo*blo
    hh1, lh1 = mul32(ahi, bhi)  # hh = ahi*bhi
    sa, ca = _carry_add(alo, ahi)
    sb, cb = _carry_add(blo, bhi)
    sh, sl = mul32(sa, sb)
    zero = jnp.zeros_like(alo)
    # m (96-bit, m2 <= 3 transiently) = sa*sb + ca*sb*2^32 + cb*sa*2^32
    #                                 + ca*cb*2^64
    m0 = sl
    m1, c0 = _carry_add(sh, jnp.where(ca == 1, sb, zero))
    m2 = (ca & cb) + c0
    m1, c1 = _carry_add(m1, jnp.where(cb == 1, sa, zero))
    m2 = m2 + c1
    # m -= ll (96-bit borrow chain); true mid >= 0 so m2 cannot underflow
    m0, b0 = _sub_borrow(m0, ll0)
    m1, b1 = _sub_borrow(m1, hl0)
    m1, b2 = _sub_borrow(m1, b0)
    m2 = m2 - b1 - b2
    # m -= hh
    m0, b0 = _sub_borrow(m0, lh1)
    m1, b1 = _sub_borrow(m1, hh1)
    m1, b2 = _sub_borrow(m1, b0)
    m2 = m2 - b1 - b2  # now m2 in {0, 1}: mid < 2^65
    # words: (ll) + (mid << 32) + (hh << 64)
    w0 = ll0
    w1, c0 = _carry_add(hl0, m0)
    w2, c1 = _carry_add(lh1, m1)
    w2, c2 = _carry_add(w2, c0)
    w3 = hh1 + m2 + c1 + c2  # exact: total product < 2^128
    return w0, w1, w2, w3


def _sub_borrow(x, y):
    """(x - y) wrapping uint32, plus borrow-out in {0,1}."""
    d = x - y
    return d, (x < y).astype(U32)


def _reduce128(w0, w1, w2, w3):
    """Reduce a 128-bit value (w3*2^96 + w2*2^64 + w1*2^32 + w0) mod p.

    plonky2-style: n === (w1,w0) - w3 + w2*EPS (mod p).
    """
    zero = jnp.zeros_like(w0)
    # t0 = (w1,w0) - w3, with borrow fixup (-2^64 === -EPS)
    t0lo, t0hi, borrow = _sub64(w0, w1, w3, zero)
    if _SELECT_FIXUPS[0]:
        f_lo, f_hi, _ = _sub64(t0lo, t0hi, EPS, zero)
        t0lo = jnp.where(borrow == 1, f_lo, t0lo)
        t0hi = jnp.where(borrow == 1, f_hi, t0hi)
    else:
        t0lo, t0hi, _ = _sub64(t0lo, t0hi, zero - borrow, zero)
    # t1 = w2 * EPS = (w2 << 32) - w2 as a 64-bit value
    t1lo = zero - w2
    t1hi = w2 - (w2 != 0).astype(U32)
    # res = t0 + t1, carry fixup (+2^64 === +EPS, cannot re-carry)
    rlo, rhi, carry = _add64(t0lo, t0hi, t1lo, t1hi)
    if _SELECT_FIXUPS[0]:
        g_lo, g_hi, _ = _add64(rlo, rhi, EPS, zero)
        rlo = jnp.where(carry == 1, g_lo, rlo)
        rhi = jnp.where(carry == 1, g_hi, rhi)
    else:
        rlo, rhi, _ = _add64(rlo, rhi, zero - carry, zero)
    return _reduce_once(rlo, rhi)


def mul(alo, ahi, blo, bhi):
    """Modular product of canonical elements."""
    return _reduce128(*_mul_words(alo, ahi, blo, bhi))


def _add64_into_words(w0, w1, w2, w3, blo, bhi):
    """128-bit words += a 64-bit value. Exact when the total stays
    < 2^128 (the caller's range argument)."""
    lo, c0 = _carry_add(w0, blo)
    t, c1 = _carry_add(w1, bhi)
    w1b, c2 = _carry_add(t, c0)  # carries exclusive; c1 + c2 in {0, 1}
    w2b, c3 = _carry_add(w2, c1 + c2)
    return lo, w1b, w2b, w3 + c3


def fold(llo, lhi, hlo, hhi, rlo, rhi):
    """Fused sumcheck fold lo + r*(hi - lo) mod p (canonical inputs).

    The hot per-round op (reference identity: matrix-multiplication/
    src/lib.rs:114-122). Fusing the trailing modular add into the
    128-bit product reduction does ONE `_reduce128` instead of a
    reduction plus a full modular add: d*r + lo <= (p-1)^2 + (p-1)
    = p(p-1) < 2^128, so adding lo into the raw product words is exact
    and the canonical result is bit-identical to
    ``add(lo, mul(sub(hi, lo), r))``.
    """
    dlo, dhi = sub(hlo, hhi, llo, lhi)
    w = _mul_words(dlo, dhi, rlo, rhi)
    return _reduce128(*_add64_into_words(*w, llo, lhi))


_LANE_CHUNK = 1 << 16  # 16-bit lanes summed over <= 2^16 terms stay < 2^32


def _lane_partials(lo, hi):
    """Split canonical (lo, hi) into four 16-bit lanes and native-sum each
    over the last axis — ONE fused XLA reduction per lane, exact because
    lane_max * axis_len = (2^16 - 1) * 2^16 < 2^32."""
    mask = np.uint32(0xFFFF)
    out = []
    for limb in (lo, hi):
        for s in (np.uint32(0), np.uint32(16)):
            out.append(
                jnp.sum((limb >> s) & mask, axis=-1, dtype=jnp.uint32)
            )
    return out  # [s0, s1, s2, s3] raw uint32 sums, weights 2^(16 i)


_C48_LO = np.uint32(((1 << 48) % ((1 << 64) - (1 << 32) + 1)) & 0xFFFFFFFF)
_C48_HI = np.uint32(((1 << 48) % ((1 << 64) - (1 << 32) + 1)) >> 32)


def _lane_combine(s0, s1, s2, s3):
    """sum_i s_i * 2^(16 i) mod p for raw uint32 lane sums."""
    zero = jnp.zeros_like(s0)
    # s0 + s1 * 2^16 < 2^32 + 2^48 < 2^49 < p: exact 64-bit add, canonical
    t01_lo, t01_hi, _ = _add64(s0, zero, s1 << np.uint32(16), s1 >> np.uint32(16))
    # s2 * 2^32 = (0, s2) < 2^64: one conditional subtract canonicalizes
    t2_lo, t2_hi = _reduce_once(zero, s2)
    # s3 * 2^48 via a full modular multiply
    t3_lo, t3_hi = mul(s3, zero, _C48_LO, _C48_HI)
    acc = add(t01_lo, t01_hi, t2_lo, t2_hi)
    return add(*acc, t3_lo, t3_hi)


# 2^(32 j) mod p as canonical (lo, hi) pairs, j = 1..3 (j = 0 is identity):
# 2^32, 2^64 === EPS, 2^96 === -1 === p - 1
_POW32_LO = (np.uint32(0), EPS, np.uint32(0))
_POW32_HI = (np.uint32(1), np.uint32(0), np.uint32(0xFFFFFFFF))


def dot_mod(alo, ahi, blo, bhi):
    """Exact modular sum over ALL elements of the elementwise product a*b.

    Skips the per-element 128-bit reduction (``_reduce128``): each product
    stays as its four raw uint32 words w0..w3, every 16-bit lane of every
    word is native-``jnp.sum``med per <= 2^16-element chunk (lane sums
    < 2^32, exact), and the chunk word-totals T_j = sum w_j (< 2^49 < p,
    so already canonical 64-bit pairs) recombine with the constants
    2^(32 j) mod p — ONE modular combine per chunk instead of one
    reduction per element. Returns scalar canonical (lo, hi)."""
    shape = jnp.broadcast_shapes(alo.shape, blo.shape)
    alo, ahi, blo, bhi = (
        jnp.broadcast_to(x, shape).reshape(-1) for x in (alo, ahi, blo, bhi)
    )
    w = _mul_words(alo, ahi, blo, bhi)
    n = w[0].shape[0]
    chunk = min(n, _LANE_CHUNK)
    pad = (-n) % chunk
    if pad:
        w = tuple(jnp.pad(x, (0, pad)) for x in w)
    c = (n + pad) // chunk
    mask = np.uint32(0xFFFF)
    s16 = np.uint32(16)
    acc = None
    for j in range(4):
        shaped = w[j].reshape(c, chunk)
        se = jnp.sum(shaped & mask, axis=-1, dtype=jnp.uint32)
        so = jnp.sum(shaped >> s16, axis=-1, dtype=jnp.uint32)
        # T_j = se + so * 2^16 < 2^32 + 2^48 < p: exact, canonical
        tlo, thi, _ = _add64(se, jnp.zeros_like(se), so << s16, so >> s16)
        if j:
            tlo, thi = mul(tlo, thi, _POW32_LO[j - 1], _POW32_HI[j - 1])
        acc = (tlo, thi) if acc is None else add(*acc, tlo, thi)
    return sum_mod(acc[0], acc[1], 0)


def sum_mod(lo, hi, axis: int, force_lanes: bool = False):
    """Exact modular sum along ``axis``.

    Large axes use the 16-bit-lane native-reduction path (one fused
    jnp.sum per lane per 2^16-chunk) — the pairwise-tree fallback costs
    ~log2(n) sliced elementwise passes, which dominated the fused round
    kernel's HBM traffic (see benches/roofline.py). Both orders produce
    the same exact value mod p.

    ``force_lanes`` routes even tiny axes through the lane path: a
    pairwise tree over a MESH-SHARDED axis makes GSPMD emit one scalar
    collective-permute chain per tree level, while the lane path's native
    ``jnp.sum`` partitions into per-shard partial sums + ONE all-reduce
    (see parallel/sharded._mb_term_total)."""
    n = lo.shape[axis]
    if n > 64 or (force_lanes and n > 1):
        lo = jnp.moveaxis(lo, axis, -1)
        hi = jnp.moveaxis(hi, axis, -1)
        while lo.shape[-1] > 1:
            n = lo.shape[-1]
            chunk = min(n, _LANE_CHUNK)
            pad = (-n) % chunk
            if pad:
                widths = [(0, 0)] * (lo.ndim - 1) + [(0, pad)]
                lo = jnp.pad(lo, widths)
                hi = jnp.pad(hi, widths)
            shape = lo.shape[:-1] + ((n + pad) // chunk, chunk)
            s0, s1, s2, s3 = _lane_partials(
                lo.reshape(shape), hi.reshape(shape)
            )
            lo, hi = _lane_combine(s0, s1, s2, s3)
        return (
            jnp.squeeze(jnp.moveaxis(lo, -1, axis), axis=axis),
            jnp.squeeze(jnp.moveaxis(hi, -1, axis), axis=axis),
        )
    lo = jnp.moveaxis(lo, axis, 0)
    hi = jnp.moveaxis(hi, axis, 0)
    while lo.shape[0] > 1:
        if lo.shape[0] % 2 == 1:
            llast, hlast = lo[-1:], hi[-1:]
            lo, hi = lo[:-1], hi[:-1]
            l0, h0 = add(lo[:1], hi[:1], llast, hlast)
            lo = jnp.concatenate([l0, lo[1:]], axis=0)
            hi = jnp.concatenate([h0, hi[1:]], axis=0)
        half = lo.shape[0] // 2
        lo, hi = add(lo[:half], hi[:half], lo[half:], hi[half:])
    return (
        jnp.squeeze(jnp.moveaxis(lo, 0, axis), axis=axis),
        jnp.squeeze(jnp.moveaxis(hi, 0, axis), axis=axis),
    )
