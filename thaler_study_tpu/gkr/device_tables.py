"""Device-side GKR bookkeeping: eq tables, gathers, modular scatter-adds.

VERDICT r1 missing #5 / next-round #4: the LibraW phase tables (A1/A2 and
B1/B2 — see gkr/linear.py) and the circuit forward pass were O(gates)
*host* work per layer per phase (runtime/native.cpp scatters), serial on
the CPU while the TPU idled. This module re-expresses that bookkeeping as
jnp gathers + ``jax.ops.segment_sum`` so a whole phase build is ONE device
program.

The reference materializes dense 2^(k_i + 2 k_{i+1}) wiring tables
(gkr-protocol/src/lib.rs:388-404); both our host and device paths use the
sparse one-contribution-per-gate formulation instead (same values — the
wiring predicate has exactly one (a,b,c) triple per gate).

Exact modular segment-sum
-------------------------
``segment_sum`` accumulates in uint32 lanes, which would overflow for field
values. Each stored uint32 limb is split into four 8-bit lanes; each lane's
per-segment sum stays below 2^32 for up to 2^24 contributions per segment
(255 * 2^24 < 2^32) — gates-per-layer bound documented here. The lane sums
(raw integers < 2^32) are then recombined as
``sum_i lane_i * 2^(8 i) mod p`` with constant multiplies:

- goldilocks: canonical storage; ``gl.mul`` on (lane, 0) pairs.
- mont32: Montgomery storage. Sums of Montgomery residues are Montgomery
  residues of the sum (linearity), and scaling a raw residue x by a plain
  constant c uses ``mont_mul(x, (c << 32) % p)`` = x * c mod p (the REDC
  bound T < p*2^32 holds since x < 2^32, c_mont < p).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FArray, FieldConfig
from ..fields import backend32 as b32
from ..fields import goldilocks as gl

U32 = jnp.uint32


def _scale_raw(arr: jnp.ndarray, c: int, field: FieldConfig) -> FArray:
    """FArray of ``arr * c mod p`` where ``arr`` holds raw residues < 2^32
    in the field's stored domain and ``c`` is a plain integer constant."""
    c = c % field.p
    if field.backend == "goldilocks":
        lo, hi = gl.mul(
            arr, jnp.zeros_like(arr), U32(c & 0xFFFFFFFF), U32(c >> 32)
        )
        return FArray((lo, hi), field)
    c_mont = (c << 32) % field.p
    res = b32.mont_mul(
        field.p, field.mont_pinv_neg, arr, jnp.full_like(arr, U32(c_mont))
    )
    return FArray((res,), field)


def scatter_add_mod_many(
    idx: jnp.ndarray,
    vals_list: Sequence[FArray],
    size: int,
    lane_bits: int = 8,
) -> Tuple[FArray, ...]:
    """grid_v[idx[g]] += vals_list[v][g] (mod p) for several value arrays
    sharing one index vector, over fresh zero grids, on device.

    All ``lane_bits``-bit lanes of every limb of every value array are
    packed into ONE ``segment_sum`` over a [g, lanes] block (a single
    scatter pass instead of 8 per limb-pair table — the dominant fused-GKR
    layer cost per the r2 --breakdown). Exactness bound per grid cell:
    (2^lane_bits - 1) * contributions < 2^32, i.e. up to 2^24
    contributions at 8-bit lanes, 2^16 at 16-bit. Callers that know the
    max scatter fan-in statically (gate wiring) pick 16-bit lanes to halve
    the scatter traffic (see ``wiring_lane_bits``).
    """
    field = vals_list[0].field
    per_limb = 32 // lane_bits
    mask = U32((1 << lane_bits) - 1)
    lanes = []
    for vals in vals_list:
        for limb in vals.limbs:
            for s in range(per_limb):
                lanes.append((limb >> U32(lane_bits * s)) & mask)
    data = jnp.stack(lanes, axis=1)  # [g, n_vals * n_limbs * per_limb]
    seg = jax.ops.segment_sum(data, idx, num_segments=size)
    out = []
    col = 0
    for vals in vals_list:
        acc = None
        for limb_i in range(len(vals.limbs)):
            for s in range(per_limb):
                part = _scale_raw(
                    seg[:, col], 1 << (32 * limb_i + lane_bits * s), field
                )
                acc = part if acc is None else acc + part
                col += 1
        out.append(acc)
    return tuple(out)


def gather_plan(idx: np.ndarray, size: int) -> np.ndarray:
    """Host-precomputed inverse of a static scatter: plan[cell, slot] = the
    gate ids contributing to ``cell`` (padded with len(idx) = a zero row).

    TPU scatters (jax.ops.segment_sum) serialize badly on the VPU; gate
    wiring is STATIC per circuit, so the scatter-add inverts once on the
    host into a dense [size, max_fanin] gather + an axis-1 lane reduction —
    all contiguous TPU-friendly reads (see gather_add_mod_many). Cached by
    callers alongside the wiring uploads."""
    idx = np.asarray(idx, dtype=np.int64)
    g = len(idx)
    counts = np.bincount(idx, minlength=size)
    maxf = int(counts.max()) if g else 1
    starts = np.zeros(size + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    order = np.argsort(idx, kind="stable").astype(np.int64)
    plan = np.full((size, max(maxf, 1)), g, np.int32)
    sorted_idx = idx[order]
    pos_in_cell = np.arange(g, dtype=np.int64) - starts[sorted_idx]
    plan[sorted_idx, pos_in_cell] = order.astype(np.int32)
    return plan


def gather_add_mod_many(
    plan: jnp.ndarray, vals_list: Sequence[FArray]
) -> Tuple[FArray, ...]:
    """grid_v[cell] = sum over plan[cell, :] of vals_list[v][gate] (mod p)
    — the gather-formulated scatter-add (see :func:`gather_plan`).

    Each value array is zero-padded by one row (the pad target), gathered
    to [size, max_fanin] per 16-bit lane, and native-summed along axis 1 —
    exact because max_fanin <= 2^16 (callers fall back to segment_sum
    otherwise) so lane sums stay below 2^32.
    """
    field = vals_list[0].field
    out = []
    for vals in vals_list:
        acc = None
        for limb_i, limb in enumerate(vals.limbs):
            padded = jnp.concatenate(
                [limb, jnp.zeros((1,), limb.dtype)]
            )
            rows = jnp.take(padded, plan, axis=0)  # [size, maxf]
            for s in range(2):
                lane = (rows >> U32(16 * s)) & U32(0xFFFF)
                seg = jnp.sum(lane, axis=1, dtype=jnp.uint32)
                part = _scale_raw(seg, 1 << (32 * limb_i + 16 * s), field)
                acc = part if acc is None else acc + part
        out.append(acc)
    return tuple(out)


# gather plans above this fan-in would waste 2^k x max_fanin memory on a
# skewed wiring; such layers keep the segment_sum path
MAX_PLAN_FANIN = 64


def scan_plan(idx: np.ndarray, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-precomputed sort structure for the scan-formulated scatter-add:
    ``order`` permutes the gate axis so equal target cells are contiguous;
    ``starts[c]`` is the first sorted position of cell c (``starts`` has
    size+1 entries, cumulative-count form). Static wiring means this is
    computed once per layer per circuit (cached with the wiring uploads).
    """
    idx = np.asarray(idx, dtype=np.int64)
    order = np.argsort(idx, kind="stable").astype(np.int32)
    counts = np.bincount(idx, minlength=size)
    starts = np.zeros(size + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    return order, starts.astype(np.int32)


# A/B switch for the scan-formulated scatter-add core: "cumsum" (r5
# default — per-lane native u32 prefix sums with wraparound, exact by the
# lane bound) vs "assoc" (r4 — modular tuple-carry associative_scan,
# measured ~214 ms standalone at 2^20x2 arrays vs the builds' ~130 ms;
# the 4-array carry with a ~30-slot combiner defeats XLA's scan
# lowering). Trace-time read; flip in a fresh process for benches.
_SCAN_CORE = ["cumsum"]


def set_scan_core(mode: str) -> None:
    assert mode in ("cumsum", "assoc")
    _SCAN_CORE[0] = mode


def scan_add_mod_many(
    order: jnp.ndarray,
    starts: jnp.ndarray,
    vals_list: Sequence[FArray],
    lane_bits: int = 16,
) -> Tuple[FArray, ...]:
    """grid_v[idx[g]] += vals_list[v][g] (mod p) via sort + prefix scan —
    no scatter at all (the TPU-first scatter-add; VERDICT r3 #5).

    ``jax.ops.segment_sum`` lowers to a TPU scatter that serializes on
    duplicate indices (~400 ns/gate measured at 2^20 gates/layer); the
    gather-plan inverse (r3) pays [2^k, max_fanin] dense reads. This
    formulation is all vectorized primitives: permute the values so equal
    cells are contiguous (host-precomputed ``order``), prefix-sum along
    the gate axis, and read each cell as the difference of boundary
    prefixes: out[c] = S_pad[starts[c+1]] - S_pad[starts[c]] with
    S_pad = [0, S]. Empty cells subtract equal prefixes and yield 0.

    Two exact cores (bit-identical results, ``set_scan_core``):

    - **cumsum** (default): split each u32 limb into ``lane_bits``-bit
      lanes and take a NATIVE ``jnp.cumsum`` per lane with u32
      wraparound. Boundary differences of wrapped prefixes are exact
      whenever each cell's true lane sum is < 2^32 — guaranteed by the
      same bound as the packed segment_sum (max fan-in <= 2^16 at
      16-bit lanes, <= 2^24 at 8-bit; ``wiring_lane_bits``). The wrapped
      lane sums are then recombined mod p exactly like
      scatter_add_mod_many.
    - **assoc**: an EXACT modular inclusive prefix scan
      (``jax.lax.associative_scan`` with the field add) on the limb
      tuple, subtracting boundary prefixes mod p. Simpler, but the
      multi-array carry scans ~7x slower on v5e.
    """
    field = vals_list[0].field
    p = field.p
    hi_ix = starts[1:]
    lo_ix = starts[:-1]
    out = []
    if _SCAN_CORE[0] == "cumsum":
        # 2-D formulation: a TPU gather costs ~per-ROW regardless of row
        # width (measured ~7-15 ms per 2^20-random-index take of a scalar
        # column, while cumsum is ~free), so all lanes ride TWO row
        # gathers — one for the sort permutation, one for the cell
        # boundaries — instead of 2-3 takes per lane.
        per_limb = 32 // lane_bits
        mask = U32((1 << lane_bits) - 1)
        cols = []
        for vals in vals_list:
            for limb in vals.limbs:
                for s in range(per_limb):
                    cols.append((limb >> U32(lane_bits * s)) & mask)
        lanes2d = jnp.stack(cols, axis=1)  # [g, n_lanes]
        sorted2d = jnp.take(lanes2d, order, axis=0)
        csum = jnp.cumsum(sorted2d, axis=0, dtype=jnp.uint32)
        pad = jnp.concatenate(
            [jnp.zeros((1, csum.shape[1]), U32), csum], axis=0
        )
        bounds = jnp.take(pad, starts, axis=0)  # [size+1, n_lanes]
        seg2d = bounds[1:] - bounds[:-1]  # exact: true lane sums < 2^32
        col = 0
        for vals in vals_list:
            acc = None
            for limb_i in range(len(vals.limbs)):
                for s in range(per_limb):
                    part = _scale_raw(
                        seg2d[:, col],
                        1 << (32 * limb_i + lane_bits * s),
                        field,
                    )
                    acc = part if acc is None else acc + part
                    col += 1
            out.append(acc)
        return tuple(out)
    if field.backend == "goldilocks":

        def comb(a, b):
            lo, hi = gl.add(a[0], a[1], b[0], b[1])
            return (lo, hi)

    else:

        def comb(a, b):
            return (b32.add(p, a[0], b[0]),)

    for vals in vals_list:
        sorted_limbs = tuple(
            jnp.take(l, order, axis=0) for l in vals.limbs
        )
        s = jax.lax.associative_scan(comb, sorted_limbs)
        s_pad = tuple(
            jnp.concatenate([jnp.zeros((1,), U32), x]) for x in s
        )
        a = tuple(jnp.take(x, hi_ix) for x in s_pad)
        b = tuple(jnp.take(x, lo_ix) for x in s_pad)
        if field.backend == "goldilocks":
            out.append(FArray(gl.sub(a[0], a[1], b[0], b[1]), field))
        else:
            out.append(FArray((b32.sub(p, a[0], b[0]),), field))
    return tuple(out)


def wiring_lane_bits(b_idx: np.ndarray, c_idx: np.ndarray) -> int:
    """The widest exact scatter lane for a layer's wiring: 16-bit lanes
    when no wire feeds more than 2^16 gates (the common case — halves the
    segment_sum traffic), else the always-safe 8-bit lanes (exact to 2^24
    gates per wire, the documented layer bound)."""
    fanin = 0
    for idx in (b_idx, c_idx):
        counts = np.bincount(np.asarray(idx, dtype=np.int64))
        if counts.size:
            fanin = max(fanin, int(counts.max()))
    return 16 if fanin <= (1 << 16) else 8


def scatter_add_mod(
    idx: jnp.ndarray, vals: FArray, size: int
) -> FArray:
    """grid[idx[g]] += vals[g] (mod p) over a fresh zero grid, on device.

    Exact for up to 2^24 contributions per grid cell (see module docstring).
    """
    return scatter_add_mod_many(idx, (vals,), size)[0]


def eq_table_dev(r: FArray, n: int) -> FArray:
    """eq(x, r) weights over little-endian indices (index bit j = r[j]),
    matching runtime.eq_table — built with n interleave steps on device."""
    field = r.field
    t = FArray.from_ints(np.array([1], dtype=np.uint64), field)
    for j in reversed(range(n)):
        rj = r[j]
        hi = t * rj
        lo = t - hi
        limbs = tuple(
            jnp.stack([ll, hl], axis=1).reshape(-1)
            for ll, hl in zip(lo.limbs, hi.limbs)
        )
        t = FArray(limbs, field)
    return t


def gather(table: FArray, idx: jnp.ndarray) -> FArray:
    """Random-index gather of all limbs. Multi-limb tables ride ONE row
    gather over limbs stacked as columns — a TPU gather costs ~per-row
    regardless of row width (same measurement as the 2-D scatter core),
    so this halves the gather cost for goldilocks."""
    if len(table.limbs) > 1:
        stacked = jnp.stack(table.limbs, axis=1)  # [n, n_limbs]
        rows = jnp.take(stacked, idx, axis=0)
        return FArray(
            tuple(rows[:, i] for i in range(len(table.limbs))),
            table.field,
        )
    return FArray(
        tuple(jnp.take(l, idx, axis=0) for l in table.limbs), table.field
    )


def dot_mod(a: FArray, b: FArray) -> FArray:
    """sum_i a[i] * b[i] (mod p) — exact pairwise-tree reduction."""
    prod = a * b
    return prod.sum(axis=0)


# ---------------------------------------------------------------------------
# LibraW phase builders (one jitted program each)
# ---------------------------------------------------------------------------


def phase1_tables(
    r_i,
    w_lsb,
    b_idx,
    c_idx,
    is_mul,
    k_cur: int,
    k: int,
    lane_bits: int = 8,
    b_plan=None,
    b_scan=None,
):
    """Traceable LibraW phase-1 build:
    (r_i [k_cur], w_lsb [2^k], wiring) -> (a1_lsb, a2_lsb, eq_r [2^k_cur]).
    ``b_plan`` (see :func:`gather_plan`) replaces the segment_sum scatter
    with dense gathers when given; ``b_scan`` (an (order, starts) pair,
    see :func:`scan_plan`) replaces it with the sort + prefix-scan form
    and takes precedence."""
    eq_r = eq_table_dev(r_i, k_cur)
    g = b_idx.shape[0]
    eq_r_g = eq_r[:g] if eq_r.shape[0] != g else eq_r
    w_at_c = gather(w_lsb, c_idx)
    eqr_w = eq_r_g * w_at_c
    # A1: add gates contribute eq_r, mul gates eq_r * W(c)
    mask = is_mul
    vals_a1 = FArray(
        tuple(
            jnp.where(mask, mw, aw)
            for mw, aw in zip(eqr_w.limbs, eq_r_g.limbs)
        ),
        w_lsb.field,
    )
    # A2: add gates contribute eq_r * W(c), mul gates nothing
    vals_a2 = FArray(
        tuple(jnp.where(mask, jnp.zeros_like(l), l) for l in eqr_w.limbs),
        w_lsb.field,
    )
    if b_scan is not None:
        a1, a2 = scan_add_mod_many(
            b_scan[0], b_scan[1], (vals_a1, vals_a2), lane_bits=lane_bits
        )
    elif b_plan is not None:
        a1, a2 = gather_add_mod_many(b_plan, (vals_a1, vals_a2))
    else:
        a1, a2 = scatter_add_mod_many(
            b_idx, (vals_a1, vals_a2), 1 << k, lane_bits=lane_bits
        )
    return a1, a2, eq_r


def phase2_tables(
    u,
    w_lsb,
    eq_r,
    b_idx,
    c_idx,
    is_mul,
    k: int,
    lane_bits: int = 8,
    c_plan=None,
    c_scan=None,
):
    """Traceable LibraW phase-2 build:
    (u [k], w_lsb [2^k], eq_r, wiring) -> (b1_lsb, b2_lsb, w_u [1]).
    ``c_plan`` (see :func:`gather_plan`) replaces the segment_sum scatter
    with dense gathers when given; ``c_scan`` (see :func:`scan_plan`)
    replaces it with the sort + prefix-scan form and takes precedence."""
    eq_u = eq_table_dev(u, k)
    g = b_idx.shape[0]
    eq_r_g = eq_r[:g] if eq_r.shape[0] != g else eq_r
    t = eq_r_g * gather(eq_u, b_idx)
    vals_b1 = FArray(
        tuple(jnp.where(is_mul, jnp.zeros_like(l), l) for l in t.limbs),
        w_lsb.field,
    )
    vals_b2 = FArray(
        tuple(jnp.where(is_mul, l, jnp.zeros_like(l)) for l in t.limbs),
        w_lsb.field,
    )
    if c_scan is not None:
        b1, b2 = scan_add_mod_many(
            c_scan[0], c_scan[1], (vals_b1, vals_b2), lane_bits=lane_bits
        )
    elif c_plan is not None:
        b1, b2 = gather_add_mod_many(c_plan, (vals_b1, vals_b2))
    else:
        b1, b2 = scatter_add_mod_many(
            c_idx, (vals_b1, vals_b2), 1 << k, lane_bits=lane_bits
        )
    w_u = dot_mod(w_lsb, eq_u).reshape((1,))
    return b1, b2, w_u


def line_restrict_coeffs(w_lsb: FArray, u: FArray, delta: FArray, k: int) -> FArray:
    """Coefficients (ascending powers of t) of q(t) = W~(u + t*delta), the
    degree-k line restriction of the multilinear W (ref restrict_poly,
    gkr-protocol/src/lib.rs — there: evaluate at k+1 points + interpolate).

    Instead of k+1 separate full MLE evaluations (each an eq-table build +
    dot product, ~3*2^k modular muls apiece, ~63*2^k total at k=20 — the
    dominant phase-2 cost per benches/gkr_parts.py), fold W one variable at
    a time with the affine coordinate r_j(t) = u_j + t*delta_j carried
    symbolically: table entries become polynomials in t whose degree grows
    by 1 per fold while the table halves, so the total work is
    sum_j 2^(k-j-1) * 2(j+1) = 4*2^k scalar muls — ~16x fewer. Every step
    is exact mod p, so the resulting coefficients are bit-identical to the
    evaluate+interpolate form (asserted in tests/test_gkr_fused.py).

    ``w_lsb`` [2^k] is in label (little-endian) order: index bit j is
    variable j, matching eq_table_dev's convention, so the fold combines
    adjacent pairs (even = x_j=0, odd = x_j=1) at every step.
    """
    field = w_lsb.field
    arr = w_lsb.reshape(-1, 1)  # [2^k, 1]: degree-0 polynomials in t
    for j in range(k):
        uj = u[j]
        dj = delta[j]
        half = arr.shape[0] // 2
        pairs = arr.reshape(half, 2, arr.shape[1])
        even = pairs[:, 0, :]
        odd = pairs[:, 1, :]
        diff = odd - even  # degree-j poly per entry
        # r_j(t) * diff(t) = u_j*diff + t * (delta_j*diff): degree j+1
        a = diff * uj
        b = diff * dj
        zero_col = FArray.zeros((half, 1), field)
        prod = a.concatenate(zero_col, axis=1) + zero_col.concatenate(
            b, axis=1
        )
        arr = even.concatenate(zero_col, axis=1) + prod
    return arr.reshape(-1)  # [k+1] coefficients of t^0 .. t^k


def wiring_plan_or_none(idx: np.ndarray, size: int):
    """The gather plan for one scatter key, or None when the wiring's max
    fan-in exceeds MAX_PLAN_FANIN (skewed layers keep segment_sum)."""
    counts = np.bincount(np.asarray(idx, dtype=np.int64), minlength=size)
    if counts.size and int(counts.max()) > MAX_PLAN_FANIN:
        return None
    return gather_plan(idx, size)


@lru_cache(maxsize=None)
def _phase1_jit(
    k_cur: int,
    k: int,
    field: FieldConfig,
    lane_bits: int = 8,
    mode: str = "segment",
):
    """(r_i [k_cur], w_lsb [2^k], b_idx, c_idx, is_mul[, plan-args]) ->
    (a1_lsb, a2_lsb, eq_r [2^k_cur]). ``mode``: "segment" (no extra args),
    "plan" (+b_plan), "scan" (+order, starts)."""

    if mode == "plan":

        def impl(r_i, w_lsb, b_idx, c_idx, is_mul, b_plan):
            return phase1_tables(
                r_i, w_lsb, b_idx, c_idx, is_mul, k_cur, k,
                lane_bits=lane_bits, b_plan=b_plan,
            )

    elif mode == "scan":

        def impl(r_i, w_lsb, b_idx, c_idx, is_mul, order, starts):
            return phase1_tables(
                r_i, w_lsb, b_idx, c_idx, is_mul, k_cur, k,
                lane_bits=lane_bits, b_scan=(order, starts),
            )

    else:

        def impl(r_i, w_lsb, b_idx, c_idx, is_mul):
            return phase1_tables(
                r_i, w_lsb, b_idx, c_idx, is_mul, k_cur, k,
                lane_bits=lane_bits,
            )

    return jax.jit(impl)


@lru_cache(maxsize=None)
def _phase2_jit(
    k: int, field: FieldConfig, lane_bits: int = 8, mode: str = "segment"
):
    """(u [k], w_lsb [2^k], eq_r, b_idx, c_idx, is_mul[, plan-args]) ->
    (b1_lsb, b2_lsb, w_u [1]). ``mode`` as in :func:`_phase1_jit`."""

    if mode == "plan":

        def impl(u, w_lsb, eq_r, b_idx, c_idx, is_mul, c_plan):
            return phase2_tables(
                u, w_lsb, eq_r, b_idx, c_idx, is_mul, k,
                lane_bits=lane_bits, c_plan=c_plan,
            )

    elif mode == "scan":

        def impl(u, w_lsb, eq_r, b_idx, c_idx, is_mul, order, starts):
            return phase2_tables(
                u, w_lsb, eq_r, b_idx, c_idx, is_mul, k,
                lane_bits=lane_bits, c_scan=(order, starts),
            )

    else:

        def impl(u, w_lsb, eq_r, b_idx, c_idx, is_mul):
            return phase2_tables(
                u, w_lsb, eq_r, b_idx, c_idx, is_mul, k,
                lane_bits=lane_bits,
            )

    return jax.jit(impl)


def lsb_to_msb(table: FArray, n: int) -> FArray:
    """Label (little-endian) order -> internal MSB-first order, on device."""
    from ..mle.dense import _device_bitrev

    return FArray(
        tuple(_device_bitrev(l, n) for l in table.limbs), table.field
    )
