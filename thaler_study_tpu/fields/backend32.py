"""Montgomery field arithmetic for p < 2^31 in uint32 lanes.

The device analogue of arkworks' ``MontBackend<_, 1>`` (the reference's field
substrate for test moduli 5, 389, 1572869). Elements are stored in the
Montgomery domain with R = 2^32: ``x_stored = x * 2^32 mod p``. Multiplication
is REDC built from 16x16-bit partial products so that every intermediate fits
a uint32 lane — TPUs have no native 64-bit integer path, and this keeps the
whole hot loop on the VPU.

All functions are pure jnp on uint32 arrays, traceable inside jit, shard_map,
and Pallas kernel bodies alike. The modulus and Montgomery constants enter as
Python ints and become compile-time constants.
"""

from __future__ import annotations

import jax.numpy as jnp

import numpy as np

U32 = jnp.uint32
# numpy scalar so the constant embeds as a literal (Pallas-compatible)
_MASK16 = np.uint32(0xFFFF)


def mul32_hilo(a, b):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32 pairs.

    Exact: built from four 16x16 partial products, each < 2^32.
    """
    a = a.astype(U32)
    b = b.astype(U32)
    a_lo = a & _MASK16
    a_hi = a >> 16
    b_lo = b & _MASK16
    b_hi = b >> 16

    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi

    mid = lh + hl  # may wrap: carry tracked below
    mid_carry = (mid < lh).astype(U32)

    lo = ll + (mid << 16)
    lo_carry = (lo < ll).astype(U32)

    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return hi, lo


def mul32_hilo_k3(a, b):
    """Full 32x32 -> 64 as (hi, lo) with THREE 16x16 lane multiplies.

    Karatsuba at the 16-bit level: mid = a_lo*b_hi + a_hi*b_lo is recovered
    from (a_lo + a_hi)(b_lo + b_hi) - ll - hh. The 17-bit limb sums split
    as (16-bit word, carry bit); the carry cross terms come back as
    predicated shifted adds (selects, no multiplies). Word-exact vs
    :func:`mul32_hilo` — see ``fields/goldilocks.set_karatsuba(2)``.
    """
    a = a.astype(U32)
    b = b.astype(U32)
    a_lo = a & _MASK16
    a_hi = a >> 16
    b_lo = b & _MASK16
    b_hi = b >> 16

    ll = a_lo * b_lo
    hh = a_hi * b_hi
    sa = a_lo + a_hi  # <= 2^17 - 2
    sb = b_lo + b_hi
    ea = sa >> 16  # 0 or 1
    eb = sb >> 16
    u = sa & _MASK16
    v = sb & _MASK16
    m = u * v  # exact: < 2^32

    # sa*sb as 64-bit (s_hi, s_lo) = m + (ea?v:0 + eb?u:0) << 16 + (ea&eb) << 32
    zero = jnp.zeros_like(a)
    t = jnp.where(ea == 1, v, zero) + jnp.where(eb == 1, u, zero)  # <= 2^17-2
    s_lo = m + (t << 16)
    s_hi = (ea & eb) + (t >> 16) + (s_lo < m).astype(U32)
    # mid = sa*sb - ll - hh  (= a_lo*b_hi + a_hi*b_lo < 2^33, so s_hi ends
    # in {0, 1}; it cannot underflow because the true mid is >= 0)
    d0 = s_lo - ll
    s_hi = s_hi - (s_lo < ll).astype(U32)
    s_lo = d0
    d1 = s_lo - hh
    s_hi = s_hi - (s_lo < hh).astype(U32)
    s_lo = d1

    lo = ll + (s_lo << 16)
    lo_carry = (lo < ll).astype(U32)
    hi = hh + (s_lo >> 16) + (s_hi << 16) + lo_carry
    return hi, lo


def mullo32(a, b):
    """Low 32 bits of the product (wrapping uint32 multiply)."""
    return (a.astype(U32) * b.astype(U32)).astype(U32)


def mont_mul(p: int, pinv_neg: int, a, b):
    """Montgomery product REDC(a*b): returns a*b*R^{-1} mod p, canonical (<p).

    Requires p < 2^31 so that t_hi + mp_hi + 1 cannot overflow uint32 and the
    final value is < 2p.
    """
    t_hi, t_lo = mul32_hilo(a, b)
    m = mullo32(t_lo, jnp.uint32(pinv_neg))
    mp_hi, _ = mul32_hilo(m, jnp.uint32(p))
    # t_lo + mp_lo === 0 (mod 2^32) by construction; carry is 1 iff t_lo != 0.
    carry = (t_lo != 0).astype(U32)
    t = t_hi + mp_hi + carry
    return jnp.where(t >= jnp.uint32(p), t - jnp.uint32(p), t)


def add(p: int, a, b):
    """Modular add; inputs canonical (< p < 2^31) so no uint32 overflow."""
    s = a + b
    return jnp.where(s >= jnp.uint32(p), s - jnp.uint32(p), s)


def sub(p: int, a, b):
    return jnp.where(a >= b, a - b, a + (jnp.uint32(p) - b))


def neg(p: int, a):
    return jnp.where(a == 0, a, jnp.uint32(p) - a)


def to_mont(p: int, pinv_neg: int, r2: int, a):
    """Canonical -> Montgomery domain: montmul(a, R^2)."""
    return mont_mul(p, pinv_neg, a, jnp.full_like(a, jnp.uint32(r2)))


def from_mont(p: int, pinv_neg: int, a):
    """Montgomery -> canonical: montmul(a, 1)."""
    return mont_mul(p, pinv_neg, a, jnp.ones_like(a))


_LANE_CHUNK = 1 << 16


def _pinv_neg(p: int) -> int:
    """-p^{-1} mod 2^32 (the REDC constant), from the modulus alone."""
    return (-pow(p, -1, 1 << 32)) % (1 << 32)


def dot_mod(p: int, pinv_neg: int, a, b):
    """Exact Montgomery-domain modular sum over ALL elements of a*b.

    Skips the per-element REDC: each raw 64-bit product stays as its
    (hi, lo) uint32 words, every 16-bit lane is native-``jnp.sum``med per
    <= 2^16-element chunk (lane sums < 2^32, exact), the chunk lane totals
    s_i recombine mod p with weights 2^(16 i) (via mont_mul by the
    constants (2^(16 i) << 32) mod p), and ONE REDC per chunk converts
    sum(mont(x) mont(y)) = R^2 sum(xy) back to mont(sum(xy)). Returns a
    scalar in the Montgomery domain, identical to summing mont_mul(a, b).
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a, b = (jnp.broadcast_to(x, shape).reshape(-1) for x in (a, b))
    t_hi, t_lo = mul32_hilo(a, b)
    n = t_lo.shape[0]
    chunk = min(n, _LANE_CHUNK)
    pad = (-n) % chunk
    if pad:
        t_lo = jnp.pad(t_lo, (0, pad))
        t_hi = jnp.pad(t_hi, (0, pad))
    c = (n + pad) // chunk
    mask = np.uint32(0xFFFF)
    s16 = np.uint32(16)
    acc = None
    for i, w in enumerate((t_lo, t_hi)):
        shaped = w.reshape(c, chunk)
        for lane, s in enumerate((jnp.sum(shaped & mask, axis=-1, dtype=jnp.uint32),
                                  jnp.sum(shaped >> s16, axis=-1, dtype=jnp.uint32))):
            w16 = ((1 << (16 * (2 * i + lane))) << 32) % p  # mont weight
            term = mont_mul(p, pinv_neg, s, jnp.full_like(s, jnp.uint32(w16)))
            acc = term if acc is None else add(p, acc, term)
    # acc === R^2 * chunk_dot (mod p); one REDC -> mont(chunk_dot)
    acc = from_mont(p, pinv_neg, acc)
    return sum_mod(p, acc, 0)


def sum_mod(p: int, a, axis: int, force_lanes: bool = False):
    """Exact modular sum along ``axis``.

    Large axes: split residues (< p < 2^31) into two 16-bit lanes and
    native-``jnp.sum`` each over <= 2^16-element chunks (lane sums stay
    < 2^32), then recombine with mont_mul by constants — one fused XLA
    reduction per lane instead of log2(n) sliced passes. Small axes keep
    the pairwise-tree (cheaper at tiny sizes). Same exact value mod p.

    ``force_lanes``: route even tiny axes through the lane path — over a
    mesh-sharded axis the native jnp.sum partitions into ONE all-reduce
    where the pairwise tree becomes per-level scalar collective-permute
    chains (see goldilocks.sum_mod).
    """
    pinv_neg = _pinv_neg(p)
    r1 = (1 << 32) % p  # mont_mul(x, R) = x mod p
    c16 = ((1 << 16) << 32) % p  # mont_mul(x, c16) = x * 2^16 mod p
    n = a.shape[axis]
    if n > 64 or (force_lanes and n > 1):
        a = jnp.moveaxis(a, axis, -1)
        mask = np.uint32(0xFFFF)
        while a.shape[-1] > 1:
            n = a.shape[-1]
            chunk = min(n, _LANE_CHUNK)
            pad = (-n) % chunk
            if pad:
                a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
            shaped = a.reshape(a.shape[:-1] + ((n + pad) // chunk, chunk))
            s0 = jnp.sum(shaped & mask, axis=-1, dtype=jnp.uint32)
            s1 = jnp.sum(shaped >> np.uint32(16), axis=-1, dtype=jnp.uint32)
            a = add(
                p,
                mont_mul(p, pinv_neg, s0, jnp.full_like(s0, np.uint32(r1))),
                mont_mul(p, pinv_neg, s1, jnp.full_like(s1, np.uint32(c16))),
            )
        return jnp.squeeze(jnp.moveaxis(a, -1, axis), axis=axis)
    a = jnp.moveaxis(a, axis, 0)
    while a.shape[0] > 1:
        if a.shape[0] % 2 == 1:
            last = a[-1:]
            a = a[:-1]
            a = jnp.concatenate([add(p, a[:1], last), a[1:]], axis=0)
        half = a.shape[0] // 2
        a = add(p, a[:half], a[half:])
    return jnp.squeeze(jnp.moveaxis(a, 0, axis), axis=axis)
