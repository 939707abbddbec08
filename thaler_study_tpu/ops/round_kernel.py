"""The fused sumcheck round kernel — one program per round.

This generalizes the reference's optimized matmul round loop
(matrix-multiplication/src/lib.rs:110-131: one pass over even/odd pairs
computing s(0), s(1), s(2) with the fold identity f(t) = f_even + t*(f_odd -
f_even)) to *any* polynomial of the form

    g(x) = sum_over_terms  prod_over_factors  T_k(x_{blocks(k)})

where each factor T_k is a dense MLE over a subset of variable *blocks*.
This covers every protocol in the reference:

- matmul IP:      1 block,  terms = [A*B]                       (deg 2)
- triangle IP:    3 blocks (X,Y,Z), terms = [f1(X,Y)*f2(Y,Z)*f3(X,Z)]
- GKR round W:    2 blocks (b,c),
                  terms = [add*(Wb), add*(Wc), mul*Wb*Wc]       (deg 2)
- generic MLE:    1 block, 1 single-factor term                 (deg 1)

Internally every factor table is stored MSB-first (variable 0 of its first
remaining block = most significant index bit), so the per-round fold and the
t-point evaluations are contiguous half-table streams — ideal for TPU VPU
tiling and for mesh sharding of the low-order (late-folded) blocks.

One jitted program per (spec, fold?) pair performs:
  1. fold of the previous challenge into every factor containing block 0
  2. evaluation of each such factor at t = 0..degree (add chains, no mul)
  3. the broadcast product over remaining variables, term-summed
  4. an exact modular tree-reduction to the (degree+1) round sums
Only (degree+1) field elements leave the device per round.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax

from ..fields import FArray, FieldConfig


@dataclasses.dataclass(frozen=True)
class PolySpec:
    """Static structure of a multi-term product polynomial.

    - ``block_sizes[i]``: number of boolean variables in block i. Global
      variable order = block 0 vars, block 1 vars, ... The sumcheck folds
      block 0 first.
    - ``table_blocks[k]``: the (strictly increasing) block ids that table k
      ranges over. Its index space is the concatenation of those blocks'
      variables, MSB-first.
    - ``terms[t]``: table ids whose product forms term t; g = sum of terms.
    """

    block_sizes: Tuple[int, ...]
    table_blocks: Tuple[Tuple[int, ...], ...]
    terms: Tuple[Tuple[int, ...], ...]

    def degree(self) -> int:
        """Max per-term count of factors involving block 0 = the degree of
        the current round's univariate polynomial."""
        return max(
            sum(1 for k in term if 0 in self.table_blocks[k])
            for term in self.terms
        )

    def num_vars(self) -> int:
        return sum(self.block_sizes)

    def round_degrees(self) -> Tuple[int, ...]:
        """Per-round univariate degrees for a full sumcheck over this spec:
        entry j is ``degree()`` of the spec after j folds. Static — this is
        what a strict verifier enforces without being told ``max_degree``."""
        degs = []
        spec = self
        for _ in range(self.num_vars()):
            degs.append(spec.degree())
            spec = spec.after_fold()
        return tuple(degs)

    def after_fold(self) -> "PolySpec":
        """The spec after folding one variable of block 0."""
        sizes = list(self.block_sizes)
        sizes[0] -= 1
        if sizes[0] > 0:
            return dataclasses.replace(self, block_sizes=tuple(sizes))
        # drop block 0, renumber blocks down by one
        return PolySpec(
            block_sizes=tuple(sizes[1:]),
            table_blocks=tuple(
                tuple(b - 1 for b in tb if b != 0) for tb in self.table_blocks
            ),
            terms=self.terms,
        )


def _table_shape(spec: PolySpec, k: int) -> Tuple[int, ...]:
    return tuple(2 ** spec.block_sizes[b] for b in spec.table_blocks[k]) or (1,)


def _broadcast_dims(spec: PolySpec, k: int) -> Tuple[int, ...]:
    """Shape that table k broadcasts to within the global block grid."""
    return tuple(
        2 ** spec.block_sizes[b] if b in spec.table_blocks[k] else 1
        for b in range(len(spec.block_sizes))
    )


def _fold_tables(
    spec: PolySpec, tables: Sequence[FArray], r: FArray
) -> Tuple[FArray, ...]:
    """Fold the current (block-0 MSB) variable at r in every table that
    contains block 0. Tables are flat 1-D; block 0 occupies the top bits."""
    out = []
    for k, t in enumerate(tables):
        if 0 in spec.table_blocks[k]:
            half = t.shape[0] // 2
            out.append(FArray.fold(t[:half], t[half:], r))
        else:
            out.append(t)
    return tuple(out)


def _term_vars(spec: PolySpec, term: Tuple[int, ...]) -> Tuple[set, int]:
    """(set of blocks covered by the term, number of vars covered)."""
    blocks = set()
    for k in term:
        blocks.update(spec.table_blocks[k])
    return blocks, sum(spec.block_sizes[b] for b in blocks)


def _pow2_scalar(field: FieldConfig, e: int) -> FArray:
    return FArray.from_ints([pow(2, e, field.p)], field).reshape(())


def _sum_all_axes(x: FArray) -> FArray:
    for _ in range(x.ndim):
        x = x.sum(axis=0)
    return x


def _dot_all(a: FArray, b: FArray) -> FArray:
    """sum over every element of a*b (with broadcasting), via the backends'
    lazy-word dot: raw product words are lane-summed per chunk and reduced
    ONCE per chunk instead of once per element (fields/goldilocks.dot_mod,
    fields/backend32.dot_mod). Bit-identical to _sum_all_axes(a * b)."""
    from ..fields import backend32 as b32
    from ..fields import goldilocks as gl

    f = a.field
    if f.backend == "goldilocks":
        lo, hi = gl.dot_mod(a.limbs[0], a.limbs[1], b.limbs[0], b.limbs[1])
        return FArray((lo, hi), f)
    return FArray(
        (b32.dot_mod(f.p, f.mont_pinv_neg, a.limbs[0], b.limbs[0]),), f
    )


# terms whose broadcast grid exceeds this use the pairwise contraction
# (memory O(n^2) instead of O(n^3); identical modular result)
_CONTRACT_THRESHOLD = 1 << 22


def _term_total(
    spec: PolySpec, term, views, halved_block0: bool
) -> FArray:
    """Sum a term's product over its covered variables.

    Detects the triangle pattern — three 2-block factors covering
    (X,Y), (Y,Z), (X,Z) — and, above a grid-size threshold, contracts
    s = sum_{x,y} f1[x,y] * (f3 @ f2^T)[x,y] via the chunked modular
    matmul instead of materializing the 3-D broadcast grid.
    """
    from .modmatmul import modmatmul_impl

    def dims_of(k):
        out = []
        for b in spec.table_blocks[k]:
            d = 1 << spec.block_sizes[b]
            if b == 0 and halved_block0:
                d //= 2
            out.append(d)
        return tuple(out) if out else (1,)

    tbs = [spec.table_blocks[k] for k in term]
    if len(term) == 3 and sorted(len(tb) for tb in tbs) == [2, 2, 2]:
        blocks = sorted(set().union(*map(set, tbs)))
        if len(blocks) == 3:
            x_b, y_b, z_b = blocks
            by_cover = {frozenset(tb): k for tb, k in zip(tbs, term)}
            k1 = by_cover.get(frozenset((x_b, y_b)))
            k2 = by_cover.get(frozenset((y_b, z_b)))
            k3 = by_cover.get(frozenset((x_b, z_b)))
            if None not in (k1, k2, k3):
                d1, d2, d3 = dims_of(k1), dims_of(k2), dims_of(k3)
                grid = d1[0] * d1[1] * d2[1]
                if grid > _CONTRACT_THRESHOLD:
                    from .modmatmul import _mxu_modmatmul_impl

                    f1 = views[k1].reshape(*d1)
                    f2 = views[k2].reshape(*d2)
                    f3 = views[k3].reshape(*d3)
                    if grid >= (1 << 24):
                        m = _mxu_modmatmul_impl(f3, f2)  # [X, Y] on the MXU
                    else:
                        m = modmatmul_impl(f3, f2)
                    return _dot_all(f1, m)

    if len(term) == 1:
        return _sum_all_axes(views[term[0]])
    prod = views[term[0]]
    for k in term[1:-1]:
        prod = prod * views[k]
    return _dot_all(prod, views[term[-1]])


def _round_sums(
    spec: PolySpec,
    tables: Sequence[FArray],
    degree: int,
    claim: Optional[FArray] = None,
) -> FArray:
    """Partial sums s(t), t = 0..degree, of the current round.

    When the round claim c = s(0) + s(1) is already known (every round but
    the first of a Fiat-Shamir proof: c = g_prev(r_prev)), pass it as
    ``claim`` (scalar FArray in the sums domain) and the t = 1 hypercube
    product-sum is replaced by the subtraction s(1) = c - s(0) — exact mod
    p, so transcripts are unchanged, and one of the degree+1 product
    passes disappears (the classic sumcheck prover shortcut)."""
    if degree < 1:
        claim = None
    field = tables[0].field
    total_vars = spec.num_vars()
    # Views of each table at t: for tables with block 0, (lo, hi) halves give
    # T_0 = lo, T_1 = hi, T_t = T_{t-1} + (hi - lo)  — adds only, no muls.
    shaped = []
    for k, t in enumerate(tables):
        dims = list(_broadcast_dims(spec, k))
        if 0 in spec.table_blocks[k]:
            half = t.shape[0] // 2
            lo, hi = t[:half], t[half:]
            dims[0] //= 2
            lo = lo.reshape(tuple(dims))
            hi = hi.reshape(tuple(dims))
            shaped.append((lo, hi, hi - lo))
        else:
            shaped.append((t.reshape(tuple(dims)), None, None))
    per_t_views = []  # [t][k]
    for t_val in range(degree + 1):
        views = []
        for k in range(len(tables)):
            lo, hi, delta = shaped[k]
            if hi is None:
                views.append(lo)
            elif t_val == 0:
                views.append(lo)
            elif t_val == 1:
                views.append(hi)
            else:
                views.append(per_t_views[t_val - 1][k] + delta)
        per_t_views.append(views)

    sums = []
    for t_val in range(degree + 1):
        if claim is not None and t_val == 1:
            sums.append(None)  # filled from the claim below
            continue
        views = per_t_views[t_val]
        acc = None
        for term in spec.terms:
            blocks, nvars = _term_vars(spec, term)
            # sum over the variables the term actually covers, then account
            # for the 2^missing multiplicity of the ones it does not (the
            # current variable is excluded from the rest-sum)
            missing = total_vars - 1 - (nvars - 1 if 0 in blocks else nvars)
            contrib = _term_total(spec, term, views, halved_block0=True)
            if missing:
                contrib = contrib * _pow2_scalar(field, missing)
            acc = contrib if acc is None else acc + contrib
        sums.append(acc.reshape((1,)))
    if claim is not None:
        sums[1] = claim.reshape((1,)) - sums[0]
    out = sums[0]
    for s in sums[1:]:
        out = out.concatenate(s, axis=0)
    return out


def _round_step(
    spec: PolySpec, do_fold: bool, degree: int, use_claim: bool = False
):
    """Build the fused (fold + sums) program for one round; jit-cached.

    When folding, the sums run against the advanced spec (the fold consumed
    one block-0 variable)."""
    sums_spec = spec.after_fold() if do_fold else spec

    def impl(tables, r, claim=None):
        if do_fold:
            tables = _fold_tables(spec, tables, r)
        return (
            _round_sums(
                sums_spec, tables, degree, claim=claim if use_claim else None
            ),
            tables,
        )

    return impl


@lru_cache(maxsize=None)
def _round_step_jit(
    spec: PolySpec,
    do_fold: bool,
    degree: int,
    field: FieldConfig,
    use_claim: bool = False,
):
    return jax.jit(_round_step(spec, do_fold, degree, use_claim))


def round_step(
    spec: PolySpec,
    tables: Sequence[FArray],
    r_prev: Optional[FArray],
    degree: Optional[int] = None,
    claim: Optional[FArray] = None,
) -> Tuple[FArray, Tuple[FArray, ...]]:
    """Run one fused prover round on device.

    Returns (sums[degree+1], new_tables). If ``r_prev`` is given the fold
    happens first and ``new_tables`` reflect it (spec then advances via
    ``spec.after_fold()`` on the host side). ``claim`` (scalar FArray in
    the sums domain, = g_prev(r_prev)) lets the round skip the t = 1
    product pass: s(1) = claim - s(0), exact mod p, sums unchanged.
    """
    from ..utils.config import get_config

    field = tables[0].field
    default_degree = (spec.after_fold() if r_prev is not None else spec).degree()
    if degree is None:
        degree = default_degree
    if degree < 1:
        claim = None
    # The Pallas kernel (16-bit-lane tile reductions, single VMEM pass) is
    # bit-exact vs this XLA path and ~1.3x faster at 2^23 on v5e, so it is
    # the default where supports() holds; THALER_PALLAS=0 / config opts out.
    cfg = get_config()
    if r_prev is not None and degree == default_degree and cfg.use_pallas:
        from . import pallas_round

        if pallas_round.supports(
            spec, field, tables[0].shape[0], min_vars=cfg.pallas_min_vars
        ):
            return pallas_round.pallas_round_step(
                spec, tables, r_prev, claim=claim
            )
    use_claim = claim is not None
    fn = _round_step_jit(spec, r_prev is not None, degree, field, use_claim)
    if r_prev is None:
        # pass a dummy 0-d scalar so the traced signature stays uniform
        r_prev = FArray.zeros((), field)
    if claim is None:
        claim = FArray.zeros((), field)  # dummy; unused when use_claim=False
    sums, new_tables = fn(tuple(tables), r_prev, claim)
    return sums, new_tables


@lru_cache(maxsize=None)
def _fold_step_jit(spec: PolySpec, field: FieldConfig):
    def impl(tables, r):
        return _fold_tables(spec, tables, r)

    return jax.jit(impl)


def fold_step(
    spec: PolySpec, tables: Sequence[FArray], r: FArray
) -> Tuple[FArray, ...]:
    """Fold-only step (the parity ``fix_variables`` path)."""
    return _fold_step_jit(spec, tables[0].field)(tuple(tables), r)


@lru_cache(maxsize=None)
def _sum_products_jit(spec: PolySpec, field: FieldConfig):
    total_vars = spec.num_vars()

    def impl(tables):
        views = [
            tables[k].reshape(_broadcast_dims(spec, k))
            for k in range(len(tables))
        ]
        acc = None
        for term in spec.terms:
            blocks, nvars = _term_vars(spec, term)
            contrib = _term_total(spec, term, views, halved_block0=False)
            if total_vars - nvars:
                contrib = contrib * _pow2_scalar(field, total_vars - nvars)
            acc = contrib if acc is None else acc + contrib
        return acc

    return jax.jit(impl)


def sum_products(spec: PolySpec, tables: Sequence[FArray]) -> FArray:
    """Sum of g over the whole hypercube — the prover's C_1 (one program)."""
    return _sum_products_jit(spec, tables[0].field)(tuple(tables))


@lru_cache(maxsize=None)
def _product_evals_jit(spec: PolySpec, field: FieldConfig):
    def impl(tables):
        acc = None
        for term in spec.terms:
            prod = tables[term[0]].reshape(_broadcast_dims(spec, term[0]))
            for k in term[1:]:
                prod = prod * tables[k].reshape(_broadcast_dims(spec, k))
            acc = prod if acc is None else acc + prod
        # broadcast to the full grid then flatten (MSB-first global order)
        full = tuple(2**s for s in spec.block_sizes)
        limbs = tuple(
            jax.numpy.broadcast_to(l, full).reshape(-1) for l in acc.limbs
        )
        return FArray(limbs, acc.field)

    return jax.jit(impl)


def product_evals(spec: PolySpec, tables: Sequence[FArray]) -> FArray:
    """Dense evaluations of g on the hypercube, internal MSB-first order."""
    return _product_evals_jit(spec, tables[0].field)(tuple(tables))
