"""Dense multilinear extensions over the boolean hypercube.

The TPU counterpart of ark-poly's ``DenseMultilinearExtension`` (used
throughout the reference: gkr-protocol/src/lib.rs:378-416,
matrix-multiplication/src/lib.rs:81-92). A :class:`DenseMLE` is a 2^n
evaluation table held on device as an :class:`FArray`.

Variable order
--------------
arkworks indexes evaluations little-endian: bit j of the table index is the
value of variable x_j, and ``fix_variables`` folds *adjacent pairs*
(even/odd). On TPU, strided pair access tiles badly, so internally we store
the table **bit-reversed**: variable 0 is the *most significant* index bit.
Folding variable 0 is then a contiguous top-half/bottom-half combine

    t' = lo + r * (hi - lo),   lo = t[:2^(n-1)], hi = t[2^(n-1):]

which is a perfectly-tiled VPU stream, and — crucially — the layout is
self-maintaining: after the fold, variable 1 is the new MSB. Conversions to
and from arkworks order happen only at host boundaries
(``from_evals_lsb`` / ``to_evaluations``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FArray, Felt, FieldConfig


def bitrev_perm(n: int) -> np.ndarray:
    """The bit-reversal permutation on [0, 2^n): vectorized numpy."""
    idx = np.arange(1 << n, dtype=np.uint64)
    rev = np.zeros_like(idx)
    for j in range(n):
        rev |= ((idx >> np.uint64(j)) & np.uint64(1)) << np.uint64(n - 1 - j)
    return rev.astype(np.int64)


def _device_bitrev(limb: jnp.ndarray, n: int) -> jnp.ndarray:
    """Bit-reverse a 2^n-element axis on device via reshape/transpose."""
    if n <= 1:
        return limb
    shaped = limb.reshape((2,) * n)
    return jnp.transpose(shaped, tuple(reversed(range(n)))).reshape(-1)


class DenseMLE:
    """A dense MLE table on device (internal MSB-first variable order)."""

    __slots__ = ("evals", "num_vars")

    def __init__(self, evals: FArray, num_vars: int):
        assert evals.shape == (1 << num_vars,), (evals.shape, num_vars)
        self.evals = evals
        self.num_vars = num_vars

    @property
    def field(self) -> FieldConfig:
        return self.evals.field

    # ---- constructors ----
    @classmethod
    def from_evals_lsb(cls, values, num_vars: int, field: FieldConfig) -> "DenseMLE":
        """From evaluations in arkworks index order (index bit j = var x_j).

        ``values``: ints / Felts / numpy array. Host-side permutation.
        """
        if len(values) > 0 and isinstance(values[0], Felt):
            values = [v.v for v in values]
        arr = np.asarray(values, dtype=np.uint64)
        assert arr.shape == (1 << num_vars,)
        arr = arr[bitrev_perm(num_vars)]
        return cls(FArray.from_ints(arr, field), num_vars)

    @classmethod
    def from_evals_msb(cls, evals: FArray, num_vars: int) -> "DenseMLE":
        """From a device table already in internal (MSB-first) order."""
        return cls(evals, num_vars)

    @classmethod
    def from_evals_lsb_farray(cls, evals: FArray, num_vars: int) -> "DenseMLE":
        """From a device table in arkworks order: bit-reverse on device."""
        limbs = tuple(_device_bitrev(l, num_vars) for l in evals.limbs)
        return cls(FArray(limbs, evals.field), num_vars)

    # ---- core ops ----
    def fix_variables(self, rs: Sequence[Felt]) -> "DenseMLE":
        """Fold the first ``len(rs)`` variables at the given points.

        Matches arkworks ``fix_variables`` semantics
        (ark-poly DenseMultilinearExtension; reference uses it at e.g.
        matrix-multiplication/src/lib.rs:83-86). One fused device program.
        """
        if not rs:
            return self
        r_arr = FArray.from_felts(list(rs), self.field)
        evals = _fold_jit(self.evals, r_arr, len(rs))
        return DenseMLE(evals, self.num_vars - len(rs))

    def evaluate(self, point: Sequence[Felt]) -> Felt:
        """Evaluate the MLE at an arbitrary field point (fold all vars)."""
        assert len(point) == self.num_vars
        if self.num_vars == 0:
            return self.evals.item()
        return self.fix_variables(list(point)).evals.item()

    def evaluate_many(self, points: Sequence[Sequence[Felt]]) -> list:
        """Evaluate at P points with ONE device program (batched folds).

        The fold chain runs on a [P, 2^n] broadcast of the table — P times
        the flops of one evaluation but a single dispatch + transfer, which
        wins whenever dispatch latency matters (e.g. GKR's restrict_poly
        needs n+1 line-point evaluations per layer)."""
        assert all(len(pt) == self.num_vars for pt in points)
        if self.num_vars == 0:
            v = self.evals.item()
            return [v for _ in points]
        flat = [f.v for pt in points for f in pt]
        r_arr = FArray.from_ints(
            np.array(flat, dtype=object), self.field
        ).reshape(len(points), self.num_vars)
        out = _eval_many_jit(self.evals, r_arr, self.num_vars)
        return out.to_felts()

    def relabel(self, a: int, b: int, k: int) -> "DenseMLE":
        """Swap variable blocks [a, a+k) and [b, b+k).

        Mirrors ark-poly ``relabel`` (used by the matmul IP to move A's row
        variables out of the way: matrix-multiplication/src/lib.rs:82).
        Device transpose; O(2^n) copy.
        """
        n = self.num_vars
        perm = list(range(n))
        for i in range(k):
            perm[a + i], perm[b + i] = perm[b + i], perm[a + i]
        limbs = tuple(
            jnp.transpose(l.reshape((2,) * n), perm).reshape(-1)
            for l in self.evals.limbs
        )
        return DenseMLE(FArray(limbs, self.field), n)

    def sum(self) -> Felt:
        """Sum of all evaluations over the hypercube (the sumcheck C_1)."""
        return self.evals.sum(axis=0).item()

    def to_evaluations(self) -> list:
        """Host Felts in arkworks (little-endian) index order."""
        ints = self.evals.to_ints()
        ints = ints[bitrev_perm(self.num_vars)]  # involution: msb -> lsb order
        return [Felt(int(v), self.field) for v in ints]

    def to_evals_lsb_farray(self) -> FArray:
        """Device table in arkworks order (device bit-reversal)."""
        limbs = tuple(_device_bitrev(l, self.num_vars) for l in self.evals.limbs)
        return FArray(limbs, self.field)

    def __repr__(self):
        return f"DenseMLE(n={self.num_vars}, {self.field.name})"


def fold_msb(table: FArray, r: FArray) -> FArray:
    """One fold step: t' = lo + r*(hi - lo), halving the table.

    The reference's even/odd pair identity (matrix-multiplication/
    src/lib.rs:114-122) in contiguous-halves form. ``r`` is a 0-d FArray.
    """
    half = table.shape[0] // 2
    return FArray.fold(table[:half], table[half:], r)


def _fold_impl(table: FArray, rs: FArray, k: int) -> FArray:
    for j in range(k):
        table = fold_msb(table, rs[j])
    return table


_fold_jit = jax.jit(_fold_impl, static_argnums=2)


def _eval_many_impl(table: FArray, rs: FArray, n: int) -> FArray:
    """rs: [P, n] points -> [P] evaluations; one fused fold chain."""
    p_count = rs.shape[0]
    t = FArray(
        tuple(
            jnp.broadcast_to(l[None, :], (p_count, l.shape[0]))
            for l in table.limbs
        ),
        table.field,
    )
    for j in range(n):
        half = t.shape[1] // 2
        lo, hi = t[:, :half], t[:, half:]
        r_j = t.__class__(
            tuple(l[:, j : j + 1] for l in rs.limbs), rs.field
        )
        t = t.__class__.fold(lo, hi, r_j)
    return t.reshape(p_count)


_eval_many_jit = jax.jit(_eval_many_impl, static_argnums=2)
