"""Pallas TPU kernel for the fused sumcheck round step (single-block products).

One HBM pass per round instead of XLA's multi-pass reduction tree:

    per tile of the quarter-size grid:
      load 4 slices of each factor table (the two fold inputs for each of
      the folded table's lo/hi halves),
      fold:      f = lo + r*(hi - lo)            (written back to HBM)
      products:  s0 += sum(prod_k f_lo_k)
                 s1 += sum(prod_k f_hi_k)
                 s_t += sum(prod_k (f_hi_k + (t-1)*delta_k))   t = 2..d
      with the modular tile reduction done entirely in VMEM/registers.

The limb arithmetic is the same jnp code the XLA path uses
(fields/backend32.py, fields/goldilocks.py) — Pallas kernel bodies trace
ordinary jnp — so the kernel is differential-tested against the XLA path
bit-for-bit. Grid iteration on TPU is sequential per core, so the (d+1)
round sums accumulate in a revisited output block.

Covers k-factor single-block products (matmul IP, generic MLE products —
the BASELINE throughput configs). Multi-block specs fall back to the XLA
path in ops/round_kernel.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FArray, FieldConfig
from ..fields import backend32 as b32
from ..fields import goldilocks as gl

try:  # pallas is TPU/Mosaic-specific; keep importable on plain CPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# minimum table size for the pallas path; below this the XLA path is fine
MIN_VARS = 12
_LANES = 128
_SUBLANES = 8

# test hook: run kernels in interpreter mode (works on CPU); tests flip this
# and clear _build_call.cache_clear()
INTERPRET = False

# log2 of the max tile (elements per factor per grid step). 2^13 = [64, 128]
# uint32 blocks (the measured default). Larger tiles cut grid steps (and
# per-step pipeline overhead) at the cost of VMEM: 2^15 tiles for k=2
# goldilocks hold 16 input + 8 fold-output blocks of 128 KiB — ~6 MiB with
# double buffering, still under the 16 MiB VMEM. Benchmarks sweep this via
# set_tile_log; the default only moves on measurement (benches/roofline.py
# --tile-log).
_TILE_LOG = [13]


def set_tile_log(v: int) -> None:
    """Select the kernel tile size (log2 elements); benchmarks only.
    Callers must clear _build_call caches when flipping mid-process."""
    _TILE_LOG[0] = int(v)


def _field_ops(field: FieldConfig):
    """(num_limbs, add, sub, mul, fold) over limb tuples for the field.

    ``fold(lo, hi, r)`` = lo + r*(hi - lo): goldilocks uses the fused
    single-reduction form (fields/goldilocks.fold, bit-identical)."""
    if field.backend == "mont32":
        p, pinv = field.p, field.mont_pinv_neg

        def add(a, b):
            return (b32.add(p, a[0], b[0]),)

        def sub(a, b):
            return (b32.sub(p, a[0], b[0]),)

        def mul(a, b):
            return (b32.mont_mul(p, pinv, a[0], b[0]),)

        def fold1(lo, hi, r):
            return add(lo, mul(sub(hi, lo), r))

        return 1, add, sub, mul, fold1

    def add2(a, b):
        return gl.add(a[0], a[1], b[0], b[1])

    def sub2(a, b):
        return gl.sub(a[0], a[1], b[0], b[1])

    def mul2(a, b):
        return gl.mul(a[0], a[1], b[0], b[1])

    def fold2(lo, hi, r):
        from ..fields.farray import _FUSED_FOLD

        if not _FUSED_FOLD[0]:  # benchmark A/B switch (trace-time read)
            return add2(lo, mul2(sub2(hi, lo), r))
        return gl.fold(lo[0], lo[1], hi[0], hi[1], r[0], r[1])

    return 2, add2, sub2, mul2, fold2


def _tree_reduce(vals: Tuple, add) -> Tuple:
    """Modular reduction of a [rows, 128] tile to a (1, 128) row, then to a
    (1, 1) scalar via a lane-halving tree. All in VMEM."""
    rows = vals[0].shape[0]
    while rows > 1:
        half = rows // 2
        vals = add(tuple(v[:half] for v in vals), tuple(v[half:] for v in vals))
        rows = half
    lanes = vals[0].shape[1]
    while lanes > 1:
        half = lanes // 2
        vals = add(
            tuple(v[:, :half] for v in vals), tuple(v[:, half:] for v in vals)
        )
        lanes = half
    return vals


def _lane_reduce_tile(field: FieldConfig, vals: Tuple) -> Tuple:
    """Exact modular tile reduction via 16-bit-lane native sums.

    Splits each uint32 limb of the [rows, 128] tile into two 16-bit lanes,
    ``jnp.sum``s each (rows*128 <= 2^15 elements -> lane sums < 2^31, no
    overflow), then recombines mod p — replacing the ~13-step sliced
    modular-add tree that made the original kernel lose to XLA."""
    mask = np.uint32(0xFFFF)
    s16 = np.uint32(16)
    sums = []
    for limb in vals:
        # Mosaic has no unsigned reductions; lane sums are < 2^31 (lane
        # max 0xFFFF * <=2^15 tile elements), so sum in int32 and bitcast.
        for lane in (limb & mask, limb >> s16):
            s = jnp.sum(lane.astype(jnp.int32), dtype=jnp.int32)
            sums.append(s.astype(jnp.uint32).reshape(1, 1))
    if field.backend == "goldilocks":
        return gl._lane_combine(sums[0], sums[1], sums[2], sums[3])
    p, pinv = field.p, field.mont_pinv_neg
    r1 = np.uint32((1 << 32) % p)
    c16 = np.uint32(((1 << 16) << 32) % p)
    return (
        b32.add(
            p,
            b32.mont_mul(p, pinv, sums[0], jnp.full_like(sums[0], r1)),
            b32.mont_mul(p, pinv, sums[1], jnp.full_like(sums[1], c16)),
        ),
    )


def _lane_reduce_words(field: FieldConfig, a: Tuple, b: Tuple) -> Tuple:
    """Exact modular tile-sum of the elementwise product a*b WITHOUT the
    per-element 128-bit reduction (the Pallas twin of the backends'
    ``dot_mod``): the raw product words are lane-summed natively (tile
    <= 2^13 elements, 16-bit lanes -> sums < 2^29, no overflow) and the
    word totals recombine mod p once per tile."""
    mask = np.uint32(0xFFFF)
    s16 = np.uint32(16)
    if field.backend == "goldilocks":
        w = gl._mul_words(a[0], a[1], b[0], b[1])
        acc = None
        for j in range(4):
            se = (
                jnp.sum((w[j] & mask).astype(jnp.int32), dtype=jnp.int32)
                .astype(jnp.uint32)
                .reshape(1, 1)
            )
            so = (
                jnp.sum((w[j] >> s16).astype(jnp.int32), dtype=jnp.int32)
                .astype(jnp.uint32)
                .reshape(1, 1)
            )
            tlo, thi, _ = gl._add64(
                se, jnp.zeros_like(se), so << s16, so >> s16
            )
            if j:
                tlo, thi = gl.mul(
                    tlo, thi, gl._POW32_LO[j - 1], gl._POW32_HI[j - 1]
                )
            acc = (tlo, thi) if acc is None else gl.add(*acc, tlo, thi)
        return acc
    p, pinv = field.p, field.mont_pinv_neg
    t_hi, t_lo = b32.mul32_hilo(a[0], b[0])
    acc = None
    for i, word in enumerate((t_lo, t_hi)):
        for lane_idx, lane in enumerate((word & mask, word >> s16)):
            s = (
                jnp.sum(lane.astype(jnp.int32), dtype=jnp.int32)
                .astype(jnp.uint32)
                .reshape(1, 1)
            )
            w16 = np.uint32(((1 << (16 * (2 * i + lane_idx))) << 32) % p)
            term = b32.mont_mul(p, pinv, s, jnp.full_like(s, w16))
            acc = term if acc is None else b32.add(p, acc, term)
    return (b32.from_mont(p, pinv, acc),)


def _make_kernel(
    field: FieldConfig, k: int, degree: int, rows: int, skip_t1: bool = False
):
    """``skip_t1``: the round claim c = s(0) + s(1) is known to the caller
    (every Fiat-Shamir round after the first), so the t = 1 hypercube
    product pass — one full _mul_words + lane reduction over the tile —
    is skipped; the caller fills s(1) = c - s(0). The t >= 2 views still
    accumulate through the same adds, so all other sums are bit-identical."""
    nl, add, sub, mul, fold = _field_ops(field)

    def kernel(*refs):
        # refs: [r_smem] + per-factor per-limb 4 slices (q0,q1,q2,q3)
        #       + outputs: per-factor per-limb folded lo & hi + sums accum
        r_ref = refs[0]
        n_in = k * nl * 4
        in_refs = refs[1 : 1 + n_in]
        out_refs = refs[1 + n_in :]
        fold_refs = out_refs[: k * nl * 2]
        sums_ref = out_refs[k * nl * 2]

        i = pl.program_id(0)

        r = tuple(r_ref[0, limb] for limb in range(nl))
        r_bcast = tuple(jnp.full((rows, _LANES), x, jnp.uint32) for x in r)

        f_lo, f_hi, deltas = [], [], []
        for f in range(k):
            base = f * nl * 4
            q = [
                tuple(in_refs[base + limb * 4 + j][0] for limb in range(nl))
                for j in range(4)
            ]
            # folded lo half: fold(q0, q2); folded hi half: fold(q1, q3)
            lo = fold(q[0], q[2], r_bcast)
            hi = fold(q[1], q[3], r_bcast)
            for limb in range(nl):
                fold_refs[(f * nl + limb) * 2][0] = lo[limb]
                fold_refs[(f * nl + limb) * 2 + 1][0] = hi[limb]
            f_lo.append(lo)
            f_hi.append(hi)
            deltas.append(sub(hi, lo))

        # partial sums at t = 0..degree
        views = None
        tile_sums = []
        for t in range(degree + 1):
            if t == 0:
                views = list(f_lo)
            elif t == 1:
                views = list(f_hi)
            else:
                views = [add(v, d) for v, d in zip(views, deltas)]
            if t == 1 and skip_t1:
                tile_sums.append(None)  # s(1) = claim - s(0), host-filled
                continue
            if len(views) == 1:
                tile_sums.append(_lane_reduce_tile(field, views[0]))
            else:
                prod = views[0]
                for v in views[1:-1]:
                    prod = mul(prod, v)
                tile_sums.append(
                    _lane_reduce_words(field, prod, views[-1])
                )

        @pl.when(i == 0)
        def _():
            sums_ref[...] = jnp.zeros_like(sums_ref)

        for t in range(degree + 1):
            if tile_sums[t] is None:
                continue
            cur = tuple(
                sums_ref[t : t + 1, limb : limb + 1] for limb in range(nl)
            )
            new = add(cur, tile_sums[t])
            for limb in range(nl):
                sums_ref[t : t + 1, limb : limb + 1] = new[limb]

    return kernel


@lru_cache(maxsize=None)
def _build_call(
    field: FieldConfig,
    k: int,
    degree: int,
    n_points: int,
    skip_t1: bool = False,
    tile_log: int = 13,
):
    """Build the pallas_call for a round over tables of n_points entries."""
    nl = _field_ops(field)[0]
    quarter = n_points // 4
    tile = min(quarter, 1 << tile_log)
    assert quarter % tile == 0
    rows = tile // _LANES
    num_tiles = quarter // tile
    grid = (num_tiles,)

    def slice_spec(which):
        # table viewed as [4, quarter]; slice `which` of tile i
        return pl.BlockSpec(
            (1, rows, _LANES),
            lambda i, w=which: (w, i, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # r scalar (1, nl)
    for _ in range(k * nl):
        for j in range(4):
            in_specs.append(slice_spec(j))

    out_specs = []
    out_shapes = []
    for _ in range(k * nl):
        for _half in range(2):
            out_specs.append(
                pl.BlockSpec(
                    (1, rows, _LANES),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shapes.append(
                jax.ShapeDtypeStruct((1, quarter // _LANES, _LANES), jnp.uint32)
            )
    out_specs.append(
        pl.BlockSpec((degree + 1, nl), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    out_shapes.append(jax.ShapeDtypeStruct((degree + 1, nl), jnp.uint32))

    kernel = _make_kernel(field, k, degree, rows, skip_t1=skip_t1)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=INTERPRET,
    )

    def run(tables: Sequence[FArray], r: FArray, claim: Optional[FArray] = None):
        args = [jnp.stack([l.reshape(()) for l in r.limbs]).reshape(1, nl)]
        for t in tables:
            for l in t.limbs:
                shaped = l.reshape(4, quarter // _LANES, _LANES)
                # one copy per slice spec (q0..q3 views of the same array)
                args.extend([shaped] * 4)
        outs = call(*args)
        folded = []
        idx = 0
        for f in range(k):
            limbs = []
            for limb in range(nl):
                lo = outs[idx].reshape(-1)
                hi = outs[idx + 1].reshape(-1)
                limbs.append(jnp.concatenate([lo, hi]))
                idx += 2
            folded.append(FArray(tuple(limbs), field))
        sums_raw = outs[idx]
        sums = FArray(
            tuple(sums_raw[:, limb] for limb in range(nl)), field
        )
        if skip_t1:
            # s(1) = claim - s(0): exact mod p, bit-identical to the
            # skipped product pass (the classic FS prover shortcut)
            s1 = (claim.reshape(()) - sums[0]).reshape((1,))
            tail = FArray(
                tuple(sums_raw[2:, limb] for limb in range(nl)), field
            )
            sums = sums[0:1].concatenate(s1, axis=0).concatenate(tail, axis=0)
        return sums, tuple(folded)

    return run


@lru_cache(maxsize=None)
def _build_call_jit(
    field: FieldConfig,
    k: int,
    degree: int,
    n_points: int,
    skip_t1: bool = False,
    tile_log: int = 13,
):
    return jax.jit(_build_call(field, k, degree, n_points, skip_t1, tile_log))


def supports(
    spec, field: FieldConfig, n_points: int, min_vars: Optional[int] = None
) -> bool:
    """Can the pallas path run this round? (single-block pure product,
    large enough, divisible tiling, on TPU). ``min_vars`` defaults to the
    module MIN_VARS; callers plumb FrameworkConfig.pallas_min_vars here."""
    if not HAVE_PALLAS:
        return False
    if len(spec.block_sizes) != 1 or len(spec.terms) != 1:
        return False
    if sorted(spec.terms[0]) != list(range(len(spec.table_blocks))):
        return False
    if any(tb != (0,) for tb in spec.table_blocks):
        return False
    if n_points < (1 << (MIN_VARS if min_vars is None else min_vars)):
        return False
    if INTERPRET:
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def pallas_round_step(
    spec, tables: Sequence[FArray], r: FArray, claim: Optional[FArray] = None
):
    """Fused fold + round sums via the Pallas kernel.

    Matches ops.round_kernel.round_step(spec, tables, r) for supported
    specs. With ``claim`` (the known round claim c = g_prev(r_prev), a
    scalar FArray), the t = 1 product pass is skipped in the kernel and
    s(1) = claim - s(0) — exact mod p, transcripts unchanged.
    """
    field = tables[0].field
    k = len(tables)
    degree = spec.after_fold().degree()
    skip = claim is not None and degree >= 1
    fn = _build_call_jit(
        field, k, degree, tables[0].shape[0], skip, _TILE_LOG[0]
    )
    if skip:
        return fn(tuple(tables), r, claim)
    return fn(tuple(tables), r)


def pallas_round_step_raw(
    spec, tables: Sequence[FArray], r: FArray, claim: Optional[FArray] = None
):
    """Unjitted traceable body — for embedding inside outer jitted loops
    (a nested jit around pallas_call breaks fori_loop lowering)."""
    field = tables[0].field
    degree = spec.after_fold().degree()
    skip = claim is not None and degree >= 1
    fn = _build_call(
        field, len(tables), degree, tables[0].shape[0], skip, _TILE_LOG[0]
    )
    if skip:
        return fn(tuple(tables), r, claim)
    return fn(tuple(tables), r)
