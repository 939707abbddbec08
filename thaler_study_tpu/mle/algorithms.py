"""Standalone MLE evaluation algorithms.

Re-implements the two algorithms of the reference's
``multilinear-extensions`` crate with TPU-native kernels:

- :func:`vsbw_multilinear_from_evaluations`
  (multilinear-extensions/src/lib.rs:6-24): build the full 2^n table of
  Lagrange-basis weights by an iterated tensor product, then inner-product
  with the evaluations. O(2^n) time *and* memory.

- :func:`cti_multilinear_from_evaluations`
  (multilinear-extensions/src/lib.rs:29-48): stream over evaluation indices,
  weighting each by eq(r, bits(i)). O(2^n * n) time, O(n) extra memory.
  (The reference's guard at :51 compares ``x.len() != x.len()`` — a latent
  no-op bug we do not reproduce; we validate dimensions properly.)

Both take evaluations in arkworks (little-endian) index order, like the
reference, and agree with each other and with :meth:`DenseMLE.evaluate`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..fields import FArray, Felt


def eq_weight_table(point: Sequence[Felt], *, lsb_order: bool = True) -> FArray:
    """The 2^n table of Lagrange basis weights eq(point, w), w in {0,1}^n.

    The tensor-product construction of the reference's vsbw algorithm
    (multilinear-extensions/src/lib.rs:7-18): start from [1] and repeatedly
    expand ``w -> [w*(1-r_j), w*r_j]``.

    With ``lsb_order=True`` the returned index order is arkworks'
    (index bit j = variable j); otherwise internal MSB-first order.
    One fused device program per (n, field).
    """
    field = point[0].field
    r = FArray.from_felts(list(point), field)
    return _eq_table_jit(r, len(point), lsb_order)


def _eq_table_impl(r: FArray, n: int, lsb_order: bool) -> FArray:
    one = FArray(
        tuple(jnp.ones((1,), jnp.uint32) * l for l in _one_limbs(r)), r.field
    )
    w = one
    # Concatenating [lo, hi] makes the *expanded* variable the new MSB, so the
    # last-expanded variable ends up most significant:
    #   lsb_order (arkworks: var j = index bit j)  -> expand 0..n-1
    #   internal  (var 0 = MSB)                    -> expand n-1..0
    order = range(n) if lsb_order else reversed(range(n))
    for j in order:
        hi = w * r[j]
        lo = w - hi  # w*(1-r) = w - w*r: one multiply per element
        w = lo.concatenate(hi, axis=0)
    return w


def _one_limbs(r: FArray):
    """Limb representation of the constant 1 in r's field."""
    f = r.field
    if f.backend == "mont32":
        return (jnp.uint32(f.mont_r),)
    return (jnp.uint32(1), jnp.uint32(0))


_eq_table_jit = jax.jit(_eq_table_impl, static_argnums=(1, 2))


def vsbw_multilinear_from_evaluations(
    evals: Sequence[Felt], r: Sequence[Felt]
) -> Felt:
    """Table-based MLE evaluation (ref multilinear-extensions/src/lib.rs:6-24).

    Builds the full weight table then inner-products with the evaluations.
    Note: this crate's index convention is *big-endian* (variable 0 = MSB of
    the table index — verified against the reference's book test,
    multilinear-extensions/src/lib.rs:76-120), unlike ark-poly's
    DenseMultilinearExtension. Big-endian equals our internal order.
    """
    assert len(evals) == 1 << len(r)
    field = r[0].field
    table = eq_weight_table(r, lsb_order=False)
    ev = FArray.from_felts(list(evals), field)
    return _dot_jit(table, ev).item()


def _dot_impl(a: FArray, b: FArray) -> FArray:
    return (a * b).sum(axis=0)


_dot_jit = jax.jit(_dot_impl)


def cti_multilinear_from_evaluations(
    evals: Sequence[Felt], r: Sequence[Felt]
) -> Felt:
    """Streaming MLE evaluation (ref multilinear-extensions/src/lib.rs:29-48).

    Host-side streaming with O(n) live state per element, as in the
    reference; exact but not the production path (use DenseMLE/vsbw on
    device for bulk work). Note the reference decodes index bits
    *big-endian* (:37-42) — with its Lagrange-basis convention this makes
    bit j of i correspond to r[n-1-j]; we reproduce that behavior exactly.
    """
    assert len(evals) == 1 << len(r)
    field = r[0].field
    n = len(r)
    acc = field.zero()
    one = field.one()
    for i, ev in enumerate(evals):
        w = [(one if (i >> j) & 1 else field.zero()) for j in reversed(range(n))]
        basis = one
        for x_i, w_i in zip(r, w):
            basis = basis * (x_i * w_i + (one - x_i) * (one - w_i))
        acc = acc + ev * basis
    return acc
