"""Mesh-sharded sumcheck proving — the distributed prover core.

The reference is single-threaded (SURVEY.md section 2: no rayon, no
threads); its data-parallel object is implicit — the 2^n evaluation table.
Here that table is explicitly sharded over a ``jax.sharding.Mesh``:

Layout
------
A factor table of n = n_local + n_shard variables is a 2-D array

    [2^n_shard, 2^n_local]   with axis 0 sharded over the mesh axis

- axis 1 (local) holds protocol variables 0..n_local-1, MSB-first: every
  fold of the first n_local rounds is a contiguous column-halving that
  touches no interconnect;
- axis 0 (sharded) holds the *last* protocol variables n_local..n-1 (axis-0
  index bit j = variable n_local + j), so they fold last.

Per round, XLA's GSPMD partitioner compiles the fused (fold + partial sums)
program so that the only communication is the all-reduce of the (degree+1)
round sums — the ``psum`` pattern of SURVEY.md section 5 — plus the
replicated challenge broadcast.

When the local variables are exhausted the residual [2^n_shard, 1] tables
are gathered (2^n_shard elements — trivially small) and the remaining
rounds run replicated via the ordinary :class:`ProductPoly`; axis-0's
MSB-first bit order makes the gathered vector already internally ordered.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import FArray, Felt, FieldConfig
from ..ops.round_kernel import PolySpec
from ..protocols.factor_poly import ProductPoly
from ..sumcheck.univariate import UniPoly, interpolate_at_small_points

AXIS = "hypercube"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    """A 1-D device mesh over the hypercube axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), (axis,))


def shard_factor(
    table: FArray, mesh: Mesh, n_shard: int, axis=None
) -> FArray:
    """Reshape a 1-D internal-order table to the sharded 2-D layout.

    Internal 1-D order has variable 0 at the MSB; the sharded layout wants
    the *last* n_shard variables on axis 0, so this is a [L, S] reshape
    followed by a transpose, then a device_put with the row sharding.

    ``axis`` defaults to ALL mesh axes (outermost first): on a 2-axis
    ('dcn', 'ici') mesh the shard dimension splits hierarchically with the
    highest bits on DCN (see parallel/multihost.py).
    """
    if axis is None:
        axis = tuple(mesh.axis_names)
    n = table.shape[0].bit_length() - 1
    n_local = n - n_shard
    ndev = mesh.devices.size
    if (1 << n_shard) % ndev != 0:
        raise ValueError(
            f"2^n_shard={1 << n_shard} must be divisible by the mesh size "
            f"{ndev} (shard at least log2(ndev) variables)"
        )
    sharding = NamedSharding(mesh, P(axis, None))
    limbs = tuple(
        jax.device_put(
            l.reshape(1 << n_local, 1 << n_shard).T, sharding
        )
        for l in table.limbs
    )
    return FArray(limbs, table.field)


def _is_scalar(t: FArray) -> bool:
    return t.shape == (1, 1)


def _fold2d(tables: Sequence[FArray], r: FArray) -> Tuple[FArray, ...]:
    out = []
    for t in tables:
        if _is_scalar(t):
            out.append(t)
            continue
        half = t.shape[1] // 2
        out.append(FArray.fold(t[:, :half], t[:, half:], r))
    return tuple(out)


def _sums2d(
    tables: Sequence[FArray], degree: int, terms: Tuple[Tuple[int, ...], ...]
) -> FArray:
    """Round sums s(0..degree) for a sum of products of same-block factors
    (scalar (1,1) factors broadcast; they have no block-0 variable)."""
    parts = []
    for t in tables:
        if _is_scalar(t):
            parts.append((t, None))
            continue
        half = t.shape[1] // 2
        parts.append((t[:, :half], t[:, half:]))
    deltas = [
        (hi - lo) if hi is not None else None for lo, hi in parts
    ]
    prev = None
    sums = []
    for t_val in range(degree + 1):
        if t_val == 0:
            views = [lo for lo, _ in parts]
        elif t_val == 1:
            views = [hi if hi is not None else lo for lo, hi in parts]
        else:
            views = [
                v + d if d is not None else v
                for v, d in zip(prev, deltas)
            ]
        prev = views
        acc = None
        for term in terms:
            prod = views[term[0]]
            for k in term[1:]:
                prod = prod * views[k]
            # local (axis 1) reduction first, then the small sharded axis —
            # GSPMD turns the axis-0 reduction into the round-sum all-reduce
            total = prod.sum(axis=1).sum(axis=0)
            acc = total if acc is None else acc + total
        sums.append(acc.reshape((1,)))
    out = sums[0]
    for s in sums[1:]:
        out = out.concatenate(s, axis=0)
    return out


@lru_cache(maxsize=None)
def _sharded_round_jit(
    do_fold: bool,
    degree: int,
    terms: Tuple[Tuple[int, ...], ...],
    field: FieldConfig,
):
    def impl(tables, r):
        if do_fold:
            tables = _fold2d(tables, r)
        return _sums2d(tables, degree, terms), tables

    return jax.jit(impl)


@lru_cache(maxsize=None)
def _fold2d_jit(nfac: int, field: FieldConfig):
    def impl(tables, r):
        return _fold2d(tables, r)

    return jax.jit(impl)


@lru_cache(maxsize=None)
def _sharded_c1_jit(terms: Tuple[Tuple[int, ...], ...], field: FieldConfig):
    def impl(tables):
        acc = None
        for term in terms:
            prod = tables[term[0]]
            for k in term[1:]:
                prod = prod * tables[k]
            total = prod.sum(axis=1).sum(axis=0)
            acc = total if acc is None else acc + total
        return acc

    return jax.jit(impl)


class ShardedProductPoly:
    """A sharded single-block product polynomial (the SumCheckPolynomial
    hot-path interface: round_univariate + sum_evaluations).

    Covers the BASELINE sumcheck configs (products of full-hypercube MLE
    factors, e.g. the matmul IP). Multi-block protocols shard analogously
    per block (future work; see parallel/__init__ notes).
    """

    def __init__(
        self,
        tables: Sequence[FArray],
        n_local: int,
        n_shard: int,
        mesh: Mesh,
        terms: Optional[Tuple[Tuple[int, ...], ...]] = None,
        degree: Optional[int] = None,
    ):
        self.tables = tuple(tables)  # 2-D [2^n_shard, 2^n_local_remaining],
        # except scalar factors which are (1, 1)
        self.n_local = n_local
        self.n_shard = n_shard
        self.mesh = mesh
        self.terms = (
            (tuple(range(len(self.tables))),) if terms is None else tuple(terms)
        )
        if degree is None:
            degree = max(
                sum(1 for k in term if not _is_scalar(self.tables[k]))
                for term in self.terms
            )
        self._degree = degree
        self._local_poly: Optional[ProductPoly] = None

    @classmethod
    def from_internal_tables(
        cls,
        tables: Sequence[FArray],
        mesh: Mesh,
        n_shard: Optional[int] = None,
        terms: Optional[Tuple[Tuple[int, ...], ...]] = None,
    ) -> "ShardedProductPoly":
        """Shard 1-D internal-order tables; length-1 tables are treated as
        scalar (blockless) factors and stay replicated.

        ``n_shard`` default: ``FrameworkConfig.shard_vars`` from the active
        config if set, else log2 of the mesh size (capped at n-1)."""
        from ..utils.config import get_config

        n = max(t.shape[0] for t in tables).bit_length() - 1
        if n_shard is None:
            n_shard = get_config().shard_vars
        if n_shard is None:
            n_shard = min(
                (mesh.devices.size - 1).bit_length(), max(n - 1, 0)
            )
        sharded = [
            t.reshape(1, 1)
            if t.shape[0] == 1
            else shard_factor(t, mesh, n_shard)
            for t in tables
        ]
        return cls(sharded, n - n_shard, n_shard, mesh, terms=terms)

    @property
    def field(self) -> FieldConfig:
        return self.tables[0].field

    def _main_cols(self) -> int:
        for t in self.tables:
            if not _is_scalar(t):
                return t.shape[1]
        return 1

    def num_vars(self) -> int:
        if self._local_poly is not None:
            return self._local_poly.num_vars()
        return self._main_cols().bit_length() - 1 + self.n_shard

    def _gather_to_local(self) -> ProductPoly:
        """Residual [2^n_shard, 1] tables -> replicated local ProductPoly."""
        spec = PolySpec(
            block_sizes=(self.n_shard,),
            table_blocks=tuple(
                () if _is_scalar(t) else (0,) for t in self.tables
            ),
            terms=self.terms,
        )
        gathered = []
        for t in self.tables:
            ints = t.to_ints().reshape(-1)  # axis-0 MSB order == internal
            gathered.append(FArray.from_ints(
                np.array([int(v) for v in ints], dtype=object), self.field
            ))
        return ProductPoly(spec, gathered)

    def round_univariate(
        self, r_prev: Optional[Felt]
    ) -> Tuple[UniPoly, "ShardedProductPoly"]:
        if self._local_poly is not None:
            uni, new_local = self._local_poly.round_univariate(r_prev)
            return uni, self._copy_with(local=new_local)
        cols = self._main_cols()
        if r_prev is None:
            if cols == 1:
                # no local vars at all: run everything replicated
                local = self._gather_to_local()
                uni, new_local = local.round_univariate(None)
                return uni, self._copy_with(local=new_local)
            fn = _sharded_round_jit(
                False, self._degree, self.terms, self.field
            )
            sums, tables = fn(self.tables, FArray.zeros((), self.field))
            uni = interpolate_at_small_points(sums.to_felts(), self.field)
            return uni, self._copy_with(tables=tables)
        if cols == 2:
            # this fold consumes the last local variable: fold on device,
            # then gather the [2^n_shard, 1] residue and continue replicated
            fn = _fold2d_jit(len(self.tables), self.field)
            tables = fn(self.tables, FArray.scalar(r_prev))
            new = self._copy_with(tables=tables)
            local = new._gather_to_local()
            uni, new_local = local.round_univariate(None)
            return uni, new._copy_with(local=new_local)
        fn = _sharded_round_jit(True, self._degree, self.terms, self.field)
        sums, tables = fn(self.tables, FArray.scalar(r_prev))
        uni = interpolate_at_small_points(sums.to_felts(), self.field)
        return uni, self._copy_with(tables=tables)

    def fix_variables(self, partial_point: Sequence[Felt]) -> "ShardedProductPoly":
        """Fold-only state transition (no round sums) — mirrors exactly the
        folds ``round_univariate`` would apply, including the gather to a
        replicated local poly when the last local column pair is consumed.
        Used by checkpoint-resume fast-forwarding (Prover.advance)."""
        new = self
        for r in partial_point:
            if new._local_poly is not None:
                new = new._copy_with(local=new._local_poly.fix_variables([r]))
                continue
            cols = new._main_cols()
            fn = _fold2d_jit(len(new.tables), new.field)
            tables = fn(new.tables, FArray.scalar(r))
            new = new._copy_with(tables=tables)
            if cols == 2:
                new = new._copy_with(local=new._gather_to_local())
        return new

    def _copy_with(self, tables=None, local=None) -> "ShardedProductPoly":
        new = ShardedProductPoly(
            tables if tables is not None else self.tables,
            self.n_local,
            self.n_shard,
            self.mesh,
            terms=self.terms,
            degree=self._degree,
        )
        new._local_poly = local if local is not None else self._local_poly
        return new

    def sum_evaluations(self) -> Felt:
        if self._local_poly is not None:
            return self._local_poly.sum_evaluations()
        fn = _sharded_c1_jit(self.terms, self.field)
        return fn(self.tables).item()

    # the oracle path for tests: gather everything and evaluate locally
    def evaluate(self, point: Sequence[Felt]) -> Felt:
        poly = self._local_poly
        if poly is None:
            # rebuild a local ProductPoly over all remaining variables
            n_cols = self._main_cols().bit_length() - 1
            spec = PolySpec(
                block_sizes=(n_cols + self.n_shard,),
                table_blocks=tuple(
                    () if _is_scalar(t) else (0,) for t in self.tables
                ),
                terms=self.terms,
            )
            flats = []
            for t in self.tables:
                ints = np.asarray(t.to_ints())  # [S, L]
                # interleave back to internal 1-D: local vars are MSB
                flat = ints.T.reshape(-1)
                flats.append(
                    FArray.from_ints(
                        np.array([int(v) for v in flat], dtype=object),
                        self.field,
                    )
                )
            poly = ProductPoly(spec, flats)
        return poly.evaluate(point)

    def num_vars_total(self) -> int:
        return self.num_vars()


# ---------------------------------------------------------------------------
# Multi-block sharding (VERDICT r1 next-round #5)
#
# ShardedProductPoly covers single-block products; the triangle IP (blocks
# X, Y, Z — triangle-counting/src/lib.rs:22-51) and the dense-W GKR round
# polynomial (blocks b, c — gkr-protocol/src/round_polynomial.rs:23-28) need
# block-aware sharding. ShardedBlockPoly shards the TRAILING s variables of
# the LAST block: those are the last variables the sumcheck folds, so every
# earlier fold is local, and the only communication is the GSPMD all-reduce
# of the (degree+1) round sums (plus the trivially small residual gather
# when the local variables are exhausted) — identical structure to the
# single-block case, generalized to arbitrary PolySpecs.
#
# Layout per factor table k:
#   - k contains the last block: [2^s, 2^(local vars of k)], axis 0 sharded
#     over the mesh; axis 1 is the table's internal MSB-first order with the
#     last block's size reduced by s.
#   - otherwise: [1, 2^(vars of k)], replicated.
# Terms that do not cover the sharded variables are scaled by the 2^missing
# multiplicity exactly like ops.round_kernel._round_sums.
# ---------------------------------------------------------------------------


def _mb_dims(
    spec: PolySpec, k: int, s_axis: int, halve_block0: bool
) -> Tuple[int, ...]:
    dims = [s_axis]
    for b in range(len(spec.block_sizes)):
        if b in spec.table_blocks[k]:
            d = 1 << spec.block_sizes[b]
            if b == 0 and halve_block0:
                d //= 2
            dims.append(d)
        else:
            dims.append(1)
    return tuple(dims)


def _mb_fold(spec: PolySpec, tables: Sequence[FArray], r: FArray):
    out = []
    for k, t in enumerate(tables):
        if 0 in spec.table_blocks[k] and spec.block_sizes[0] > 0:
            half = t.shape[1] // 2
            out.append(FArray.fold(t[:, :half], t[:, half:], r))
        else:
            out.append(t)
    return tuple(out)


def _mb_term_total(
    spec: PolySpec,
    has_shard: Tuple[bool, ...],
    term: Tuple[int, ...],
    views: Sequence[FArray],
) -> FArray:
    """Sum a term's product over its covered variables (incl. the sharded
    axis 0, whose pairwise tree GSPMD turns into the round-sum all-reduce).

    Mirrors ops.round_kernel._term_total: the 3-block triangle pattern —
    f1(X,Y) * f2(Y,Z) * f3(X,Z) with the sharded variables (if any) in the
    contracted Z block — contracts per shard row above _CONTRACT_THRESHOLD,
    s = sum_{x,y} f1[x,y] * sum_shard (f3_s @ f2_s^T)[x,y], via the batched
    modular matmul (MXU digit path at >=2^24 grids) instead of materializing
    the O(|X||Y||Z|) broadcast grid on every device.
    """
    from ..ops.round_kernel import _CONTRACT_THRESHOLD

    tbs = [spec.table_blocks[k] for k in term]
    if len(term) == 3 and sorted(len(tb) for tb in tbs) == [2, 2, 2]:
        blocks = sorted(set().union(*map(set, tbs)))
        if len(blocks) == 3:
            x_b, y_b, z_b = blocks
            by_cover = {frozenset(tb): k for tb, k in zip(tbs, term)}
            k1 = by_cover.get(frozenset((x_b, y_b)))
            k2 = by_cover.get(frozenset((y_b, z_b)))
            k3 = by_cover.get(frozenset((x_b, z_b)))
            if (
                None not in (k1, k2, k3)
                and not has_shard[k1]  # shard vars must live in Z only
                and has_shard[k2] == has_shard[k3]
            ):
                f1, f2, f3 = views[k1], views[k2], views[k3]
                dx, dy = f1.shape[1 + x_b], f1.shape[1 + y_b]
                dz = f2.shape[1 + z_b]
                s_axis = max(f2.shape[0], f3.shape[0])
                if dx * dy * dz * s_axis > _CONTRACT_THRESHOLD:
                    from ..ops.modmatmul import (
                        _mxu_modmatmul_batched_impl,
                        modmatmul_batched_impl,
                    )

                    f2b = f2.reshape(f2.shape[0], dy, dz)
                    f3b = f3.reshape(f3.shape[0], dx, dz)
                    if dx * dy * dz * s_axis >= (1 << 24):
                        m = _mxu_modmatmul_batched_impl(f3b, f2b)
                    else:
                        m = modmatmul_batched_impl(f3b, f2b)
                    prod = f1.reshape(1, dx, dy) * m  # [S, X, Y]
                    prod = prod.sum(axis=2).sum(axis=1)
                    return prod.sum(axis=0, force_lanes=True)

    prod = views[term[0]]
    for k in term[1:]:
        prod = prod * views[k]
    # reduce local axes first; the sharded axis 0 last, on the lane path
    # so GSPMD lowers it to per-shard partial sums + ONE all-reduce of
    # the round sum (a pairwise tree would become a scalar
    # collective-permute chain per level — tests/test_multihost.py
    # asserts the lowered collectives)
    while prod.ndim > 1:
        prod = prod.sum(axis=prod.ndim - 1)
    return prod.sum(axis=0, force_lanes=True)


def _mb_sums(
    spec: PolySpec,
    has_shard: Tuple[bool, ...],
    tables: Sequence[FArray],
    degree: int,
    s: int,
    claim: Optional[FArray] = None,
) -> FArray:
    """Round sums s(0..degree). ``claim``, when given (scalar FArray in the
    sums domain), replaces the t = 1 product pass with s(1) = claim - s(0)
    — the fused Fiat-Shamir prover's shortcut (see ops.round_kernel
    ._round_sums); exact mod p, transcripts unchanged."""
    if degree < 1:
        claim = None
    field = tables[0].field
    total_vars = spec.num_vars() + s
    shaped = []
    for k, t in enumerate(tables):
        dims = _mb_dims(spec, k, t.shape[0], halve_block0=True)
        if 0 in spec.table_blocks[k] and spec.block_sizes[0] > 0:
            half = t.shape[1] // 2
            lo = t[:, :half].reshape(dims)
            hi = t[:, half:].reshape(dims)
            shaped.append((lo, hi, hi - lo))
        else:
            dims = _mb_dims(spec, k, t.shape[0], halve_block0=False)
            shaped.append((t.reshape(dims), None, None))
    prev = None
    sums = []
    from ..ops.round_kernel import _pow2_scalar

    for t_val in range(degree + 1):
        if t_val == 0:
            views = [lo for lo, _, _ in shaped]
        elif t_val == 1:
            views = [hi if hi is not None else lo for lo, hi, _ in shaped]
        else:
            views = [
                v + d if d is not None else v
                for v, (_, _, d) in zip(prev, shaped)
            ]
        prev = views
        if claim is not None and t_val == 1:
            sums.append(None)  # filled from the claim below
            continue
        acc = None
        for term in spec.terms:
            blocks = set()
            for k in term:
                blocks.update(spec.table_blocks[k])
            covered_shard = any(has_shard[k] for k in term)
            nvars = sum(spec.block_sizes[b] for b in blocks) + (
                s if covered_shard else 0
            )
            total = _mb_term_total(spec, has_shard, term, views)
            missing = total_vars - 1 - (nvars - 1 if 0 in blocks else nvars)
            if missing:
                total = total * _pow2_scalar(field, missing)
            acc = total if acc is None else acc + total
        sums.append(acc.reshape((1,)))
    if claim is not None:
        sums[1] = claim.reshape((1,)) - sums[0]
    out = sums[0]
    for v in sums[1:]:
        out = out.concatenate(v, axis=0)
    return out


@lru_cache(maxsize=None)
def _mb_round_jit(
    spec: PolySpec,
    has_shard: Tuple[bool, ...],
    do_fold: bool,
    degree: int,
    s: int,
    field: FieldConfig,
):
    def impl(tables, r):
        cur = spec
        if do_fold:
            tables = _mb_fold(cur, tables, r)
            cur = cur.after_fold()
        return _mb_sums(cur, has_shard, tables, degree, s), tables

    return jax.jit(impl)


@lru_cache(maxsize=None)
def _mb_fold_jit(spec: PolySpec, nfac: int, field: FieldConfig):
    def impl(tables, r):
        return _mb_fold(spec, tables, r)

    return jax.jit(impl)


@lru_cache(maxsize=None)
def _mb_c1_jit(
    spec: PolySpec,
    has_shard: Tuple[bool, ...],
    s: int,
    field: FieldConfig,
):
    from ..ops.round_kernel import _pow2_scalar

    def impl(tables):
        total_vars = spec.num_vars() + s
        acc = None
        for term in spec.terms:
            blocks = set()
            for k in term:
                blocks.update(spec.table_blocks[k])
            covered_shard = any(has_shard[k] for k in term)
            nvars = sum(spec.block_sizes[b] for b in blocks) + (
                s if covered_shard else 0
            )
            views = [
                tables[k].reshape(
                    _mb_dims(spec, k, tables[k].shape[0], halve_block0=False)
                )
                if k in term
                else None
                for k in range(len(tables))
            ]
            total = _mb_term_total(spec, has_shard, term, views)
            if total_vars - nvars:
                total = total * _pow2_scalar(tables[0].field, total_vars - nvars)
            acc = total if acc is None else acc + total
        return acc

    return jax.jit(impl)


class ShardedBlockPoly:
    """A multi-block product polynomial sharded on the trailing variables of
    its last block (the SumCheckPolynomial hot-path interface).

    Byte-identical transcripts to the local ProductPoly over the same spec
    and tables (tests/test_parallel.py)."""

    def __init__(
        self,
        spec_local: PolySpec,
        tables: Sequence[FArray],
        has_shard: Tuple[bool, ...],
        n_shard: int,
        mesh: Mesh,
    ):
        self.spec = spec_local
        self.tables = tuple(tables)
        self.has_shard = tuple(has_shard)
        self.n_shard = n_shard
        self.mesh = mesh
        self._local_poly: Optional[ProductPoly] = None

    @classmethod
    def from_internal_tables(
        cls,
        spec: PolySpec,
        tables: Sequence[FArray],
        mesh: Mesh,
        n_shard: Optional[int] = None,
        axis=None,
    ) -> "ShardedBlockPoly":
        """Shard 1-D internal-order tables of a full PolySpec.

        ``n_shard`` defaults to the active config's ``shard_vars``, else
        log2 of the mesh size — capped at the last block's size."""
        from ..utils.config import get_config

        last = len(spec.block_sizes) - 1
        if n_shard is None:
            n_shard = get_config().shard_vars
        if n_shard is None:
            n_shard = (mesh.devices.size - 1).bit_length()
        n_shard = min(n_shard, spec.block_sizes[last])
        ndev = mesh.devices.size
        if (1 << n_shard) % ndev != 0:
            raise ValueError(
                f"2^n_shard={1 << n_shard} must be divisible by the mesh "
                f"size {ndev}"
            )
        sizes = list(spec.block_sizes)
        sizes[last] -= n_shard
        spec_local = PolySpec(
            block_sizes=tuple(sizes),
            table_blocks=spec.table_blocks,
            terms=spec.terms,
        )
        sharded_tables = []
        has_shard = []
        if axis is None:
            axis = tuple(mesh.axis_names)
        shard_spec = NamedSharding(mesh, P(axis, None))
        repl_spec = NamedSharding(mesh, P(None, None))
        for k, t in enumerate(tables):
            nv = t.shape[0].bit_length() - 1
            if last in spec.table_blocks[k] and n_shard > 0:
                limbs = tuple(
                    jax.device_put(
                        l.reshape(1 << (nv - n_shard), 1 << n_shard).T,
                        shard_spec,
                    )
                    for l in t.limbs
                )
                has_shard.append(True)
            else:
                limbs = tuple(
                    jax.device_put(l.reshape(1, 1 << nv), repl_spec)
                    for l in t.limbs
                )
                has_shard.append(False)
            sharded_tables.append(FArray(limbs, t.field))
        return cls(spec_local, sharded_tables, tuple(has_shard), n_shard, mesh)

    @property
    def field(self) -> FieldConfig:
        return self.tables[0].field

    def num_vars(self) -> int:
        if self._local_poly is not None:
            return self._local_poly.num_vars()
        return self.spec.num_vars() + self.n_shard

    def _gather_to_local(self) -> ProductPoly:
        """Residual [2^s, 1] tables -> replicated local ProductPoly over the
        s sharded variables (axis-0 bit order == internal MSB-first)."""
        spec = PolySpec(
            block_sizes=(self.n_shard,),
            table_blocks=tuple(
                (0,) if hs else () for hs in self.has_shard
            ),
            terms=self.spec.terms,
        )
        gathered = []
        for t in self.tables:
            ints = t.to_ints().reshape(-1)
            gathered.append(
                FArray.from_ints(
                    np.array([int(v) for v in ints], dtype=object), self.field
                )
            )
        return ProductPoly(spec, gathered)

    def round_univariate(
        self, r_prev: Optional[Felt]
    ) -> Tuple[UniPoly, "ShardedBlockPoly"]:
        if self._local_poly is not None:
            uni, new_local = self._local_poly.round_univariate(r_prev)
            return uni, self._copy_with(local=new_local)
        if r_prev is None:
            if self.spec.num_vars() == 0:
                local = self._gather_to_local()
                uni, new_local = local.round_univariate(None)
                return uni, self._copy_with(local=new_local)
            degree = self.spec.degree()
            fn = _mb_round_jit(
                self.spec, self.has_shard, False, degree, self.n_shard,
                self.field,
            )
            sums, tables = fn(self.tables, FArray.zeros((), self.field))
            uni = interpolate_at_small_points(sums.to_felts(), self.field)
            return uni, self._copy_with(tables=tables)
        if self.spec.num_vars() == 1:
            # the fold consumes the last local variable: fold on device,
            # gather the residue, continue replicated
            fn = _mb_fold_jit(self.spec, len(self.tables), self.field)
            tables = fn(self.tables, FArray.scalar(r_prev))
            new = self._copy_with(tables=tables, spec=self.spec.after_fold())
            local = new._gather_to_local()
            uni, new_local = local.round_univariate(None)
            return uni, new._copy_with(local=new_local)
        degree = self.spec.after_fold().degree()
        fn = _mb_round_jit(
            self.spec, self.has_shard, True, degree, self.n_shard, self.field
        )
        sums, tables = fn(self.tables, FArray.scalar(r_prev))
        uni = interpolate_at_small_points(sums.to_felts(), self.field)
        return uni, self._copy_with(
            tables=tables, spec=self.spec.after_fold()
        )

    def fix_variables(self, partial_point: Sequence[Felt]) -> "ShardedBlockPoly":
        """Fold-only transition mirroring round_univariate (resume path)."""
        new = self
        for r in partial_point:
            if new._local_poly is not None:
                new = new._copy_with(local=new._local_poly.fix_variables([r]))
                continue
            fn = _mb_fold_jit(new.spec, len(new.tables), new.field)
            tables = fn(new.tables, FArray.scalar(r))
            was_last = new.spec.num_vars() == 1
            new = new._copy_with(tables=tables, spec=new.spec.after_fold())
            if was_last:
                new = new._copy_with(local=new._gather_to_local())
        return new

    def sum_evaluations(self) -> Felt:
        if self._local_poly is not None:
            return self._local_poly.sum_evaluations()
        fn = _mb_c1_jit(self.spec, self.has_shard, self.n_shard, self.field)
        return fn(self.tables).item()

    def evaluate(self, point: Sequence[Felt]) -> Felt:
        """Oracle path (tests): gather everything, evaluate locally."""
        if self._local_poly is not None:
            return self._local_poly.evaluate(point)
        last = len(self.spec.block_sizes) - 1
        sizes = list(self.spec.block_sizes)
        sizes[last] += self.n_shard
        spec = PolySpec(
            block_sizes=tuple(sizes),
            table_blocks=self.spec.table_blocks,
            terms=self.spec.terms,
        )
        flats = []
        for t in self.tables:
            ints = np.asarray(t.to_ints())  # [S, L] (or [1, L])
            flat = ints.T.reshape(-1)  # internal order: local MSB, shard LSB
            flats.append(
                FArray.from_ints(
                    np.array([int(v) for v in flat], dtype=object), self.field
                )
            )
        return ProductPoly(spec, flats).evaluate(point)

    def _copy_with(self, tables=None, local=None, spec=None) -> "ShardedBlockPoly":
        new = ShardedBlockPoly(
            spec if spec is not None else self.spec,
            tables if tables is not None else self.tables,
            self.has_shard,
            self.n_shard,
            self.mesh,
        )
        new._local_poly = local if local is not None else self._local_poly
        return new
