"""Fused non-interactive GKR proving — two device dispatches per layer.

The message-passing prover (gkr/transcript.py::generate_gkr_transcript)
pays one host round-trip per inner sumcheck round: ~2k rounds x 16 layers =
640 synchronous tunnel crossings at 2^24 gates (BENCHMARKS.md config 5 —
~57 ms each, vs ~ms of device work). This module proves each layer's whole
inner sumcheck on device:

- **dispatch A** (phase 1, rounds 0..k-1): LibraW A1/A2 table build
  (gkr/device_tables.py), the layer claim c_1, k fused fold+sum rounds,
  arkworks-canonical serialization, and the Fiat-Shamir challenge chain —
  all inside one program. The SHA-256 midstate rides along as traced state
  (ops/sha_chain.py), so one compiled program serves EVERY layer despite
  their different transcript offsets.
- **dispatch B** (phase 2, rounds k..2k-1): B1/B2 build from phase-1
  challenges u, k-1 fused rounds, the count-2 draw (r_{2k-2}, r_last — ref
  challenge schedule in gkr/transcript.py), the FinalRoundMessage (last
  round polynomial p plus the line restriction q = W~(l(t)) interpolated
  from k+1 on-device MLE evaluations), the r* draw, and the next layer's
  point r_{i+1} = l(r*).

Nothing blocks on the host between layers: chain state, challenges, and
r_{i+1} flow device-to-device, so the 2L dispatches pipeline through the
remote tunnel and ONE final pull retrieves every coefficient, from which the
host reassembles the byte transcript. Output is byte-identical to
generate_gkr_transcript (asserted in tests/test_gkr_fused.py).

Like ops/fs_kernel.py, static message shapes assume every serialized
coefficient is nonzero (arkworks drops zero terms); violations are detected
on device and the caller falls back to the exact host path.

Scope: goldilocks, empty DST, every layer with k >= 2 variables.
"""

from __future__ import annotations

import struct
import time
from functools import lru_cache
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FArray, FieldConfig
from ..fields import goldilocks as gl
from ..ops.fs_kernel import _claim_at, _felt_bytes_le, _interp_coeffs
from ..ops.round_kernel import PolySpec, _fold_tables, _round_sums
from ..ops.sha_chain import DevChain, default_unroll, hash_to_field_chain
from .device_tables import (
    dot_mod,
    eq_table_dev,
    line_restrict_coeffs,
    lsb_to_msb,
    phase1_tables,
    phase2_tables,
)

U8 = jnp.uint8
U32 = jnp.uint32

# Line-restriction algorithm for dispatch B: "fold" = symbolic coefficient
# fold (4*2^k muls, device_tables.line_restrict_coeffs, the default);
# "interp" = k+1 eq-table evaluations + exact interpolation (~63*2^k muls,
# the r2-r4 form, kept as the A/B control). Bit-identical outputs. Read at
# trace time — _layer_phase2_jit is cached, so flip it in a fresh process
# (the benches do; same caveat as fields.goldilocks.set_karatsuba).
_LINE_RESTRICT = ["fold"]


def set_line_restrict(mode: str) -> None:
    assert mode in ("fold", "interp")
    _LINE_RESTRICT[0] = mode


def _np_bytes(raw: bytes) -> jnp.ndarray:
    return jnp.asarray(np.frombuffer(raw, dtype=np.uint8))


def _le8_from_u32(x) -> jnp.ndarray:
    """Traced uint32 scalar -> 8 little-endian bytes (usize-as-u64)."""
    lo = [((x >> U32(8 * i)) & U32(0xFF)).astype(U8) for i in range(4)]
    return jnp.stack(lo + [jnp.zeros((), U8)] * 4)


def _msg_sumcheck(coeffs) -> jnp.ndarray:
    """SumCheckProverMessage bytes: tag 0x02 + SparsePolynomial (all terms
    nonzero; see module docstring)."""
    parts = [
        _np_bytes(bytes([2])),
        _np_bytes(struct.pack("<Q", len(coeffs))),
    ]
    for t, (lo, hi) in enumerate(coeffs):
        parts.append(_np_bytes(struct.pack("<Q", t)))
        parts.append(_felt_bytes_le(lo, hi))
    return jnp.concatenate(parts)


def _poly_bytes(coeffs) -> List[jnp.ndarray]:
    parts = [_np_bytes(struct.pack("<Q", len(coeffs)))]
    for t, (lo, hi) in enumerate(coeffs):
        parts.append(_np_bytes(struct.pack("<Q", t)))
        parts.append(_felt_bytes_le(lo, hi))
    return parts


def _track_zero(any_zero, coeffs):
    for lo, hi in coeffs:
        any_zero = any_zero | ((lo == U32(0)) & (hi == U32(0)))
    return any_zero


def _phase1_spec(k: int) -> PolySpec:
    return PolySpec(
        block_sizes=(k,), table_blocks=((0,), (0,), (0,)), terms=((0, 1), (2,))
    )


def _phase2_spec(k: int) -> PolySpec:
    return PolySpec(
        block_sizes=(k,),
        table_blocks=((0,), (0,), (0,), ()),
        terms=((0, 3), (0, 2), (1, 3, 2)),
    )


# ---------------------------------------------------------------------------
# dispatch A: phase-1 build + rounds 0..k-1
# ---------------------------------------------------------------------------


def _phase1_body(
    k_cur, k, field, lane_bits, mode, unroll,
    state, buf, nbytes, layer_idx, r_i, w_lsb, b_idx, c_idx, is_mul,
    extra,
):
    """Traceable dispatch-A body (phase-1 build + rounds 0..k-1) — shared
    verbatim by the per-layer jit and the whole-proof layer scan
    (_scan_proof_jit) so the two paths are byte-identical by
    construction."""
    chain = DevChain(state, buf, nbytes, unroll)
    a1_lsb, a2_lsb, eq_r = phase1_tables(
        r_i, w_lsb, b_idx, c_idx, is_mul, k_cur, k,
        lane_bits=lane_bits,
        b_plan=extra[0] if mode == "plan" else None,
        b_scan=tuple(extra) if mode == "scan" else None,
    )
    tables = (
        lsb_to_msb(w_lsb, k),
        lsb_to_msb(a1_lsb, k),
        lsb_to_msb(a2_lsb, k),
    )
    spec = _phase1_spec(k)
    any_zero = jnp.asarray(False)
    coeff_rows = []
    u_scalars = []
    r = None
    dom_coeffs = None
    c1 = None
    for j in range(k):
        if r is not None:
            tables = _fold_tables(spec, tables, r)
            spec = spec.after_fold()
            claim = _claim_at(field, dom_coeffs, r)
        else:
            claim = None
        sums = _round_sums(spec, tables, 2, claim=claim)
        if j == 0:
            # the layer claim (StartSumCheck.c_1) = s(0) + s(1) of the
            # first round — no separate full-grid product pass needed
            c1 = FArray(
                gl.add(
                    sums.limbs[0][0],
                    sums.limbs[1][0],
                    sums.limbs[0][1],
                    sums.limbs[1][1],
                ),
                field,
            )
            start_msg = jnp.concatenate(
                [
                    _np_bytes(bytes([1])),
                    _felt_bytes_le(c1.limbs[0], c1.limbs[1]),
                    _le8_from_u32(layer_idx),
                    _np_bytes(struct.pack("<Q", 2 * k)),
                ]
            )
            chain = chain.absorb(start_msg)
        coeffs, dom_coeffs = _interp_coeffs(sums, 2)
        any_zero = _track_zero(any_zero, coeffs)
        coeff_rows.append(coeffs)
        chain = chain.absorb(_msg_sumcheck(coeffs))
        ((rlo, rhi),) = hash_to_field_chain(chain, field, 1)
        u_scalars.append((rlo, rhi))
        r = FArray((rlo, rhi), field)
    u = FArray(
        (
            jnp.stack([s[0] for s in u_scalars]),
            jnp.stack([s[1] for s in u_scalars]),
        ),
        field,
    )
    coeff_lo = jnp.stack([jnp.stack([c[0] for c in row]) for row in coeff_rows])
    coeff_hi = jnp.stack([jnp.stack([c[1] for c in row]) for row in coeff_rows])
    return (
        chain.state,
        chain.buf,
        chain.nbytes,
        jnp.stack(c1.limbs),
        coeff_lo,
        coeff_hi,
        u,
        eq_r,
        any_zero,
    )


@lru_cache(maxsize=None)
def _layer_phase1_jit(
    k_cur: int,
    k: int,
    g: int,
    field: FieldConfig,
    lane_bits: int = 8,
    mode: str = "segment",
):
    unroll = default_unroll()

    def impl(
        state, buf, nbytes, layer_idx, r_i, w_lsb, b_idx, c_idx, is_mul,
        *extra,
    ):
        return _phase1_body(
            k_cur, k, field, lane_bits, mode, unroll,
            state, buf, nbytes, layer_idx, r_i, w_lsb, b_idx, c_idx,
            is_mul, extra,
        )

    return jax.jit(impl)


# ---------------------------------------------------------------------------
# dispatch B: phase-2 build + rounds k..2k-1 + final message + r*
# ---------------------------------------------------------------------------


def _phase2_body(
    k, field, lane_bits, mode, unroll,
    state, buf, nbytes, u, a_lo, a_hi, w_lsb, eq_r, b_idx, c_idx,
    is_mul, extra,
):
    """Traceable dispatch-B body (phase-2 build + rounds k..2k-1 + final
    message + r*) — shared by the per-layer jit and the whole-proof
    layer scan."""
    # phase 1's full coefficient rows come in; the claim seed needs only
    # the last row — slice INSIDE the jit (an eager host-side slice
    # would be its own remote dispatch per layer through the tunnel)
    last_lo, last_hi = a_lo[-1], a_hi[-1]
    chain = DevChain(state, buf, nbytes, unroll)
    b1_lsb, b2_lsb, w_u = phase2_tables(
        u, w_lsb, eq_r, b_idx, c_idx, is_mul, k,
        lane_bits=lane_bits,
        c_plan=extra[0] if mode == "plan" else None,
        c_scan=tuple(extra) if mode == "scan" else None,
    )
    tables = (
        lsb_to_msb(b1_lsb, k),
        lsb_to_msb(b2_lsb, k),
        lsb_to_msb(w_lsb, k),
        w_u,
    )
    spec = _phase2_spec(k)
    any_zero = jnp.asarray(False)
    coeff_rows = []
    c_scalars = []
    r = None
    # claim chain seed: phase 1's last polynomial (coeffs passed in)
    # evaluated at its challenge u_{k-1}
    dom_coeffs = [(last_lo[t], last_hi[t]) for t in range(3)]
    prev_r = FArray((u.limbs[0][k - 1], u.limbs[1][k - 1]), field)
    # rounds k .. 2k-2: the k-1 inner messages of phase 2
    for j in range(k - 1):
        if r is not None:
            tables = _fold_tables(spec, tables, r)
            spec = spec.after_fold()
        claim = _claim_at(field, dom_coeffs, prev_r)
        sums = _round_sums(spec, tables, 2, claim=claim)
        coeffs, dom_coeffs = _interp_coeffs(sums, 2)
        any_zero = _track_zero(any_zero, coeffs)
        coeff_rows.append(coeffs)
        chain = chain.absorb(_msg_sumcheck(coeffs))
        if j < k - 2:
            ((rlo, rhi),) = hash_to_field_chain(chain, field, 1)
        else:
            # second-to-last message overall: draw r_{2k-2} AND r_last
            (rlo, rhi), (llo, lhi) = hash_to_field_chain(chain, field, 2)
            c_last = (llo, lhi)
        c_scalars.append((rlo, rhi))
        r = FArray((rlo, rhi), field)
        prev_r = r
    c_scalars.append(c_last)
    # final round polynomial p: fold r_{2k-2}, one variable remains
    tables = _fold_tables(spec, tables, r)
    spec = spec.after_fold()
    claim = _claim_at(field, dom_coeffs, prev_r)
    sums = _round_sums(spec, tables, 2, claim=claim)
    p_coeffs, _ = _interp_coeffs(sums, 2)
    any_zero = _track_zero(any_zero, p_coeffs)
    # q = W~ restricted to the line through b=u, c (ref restrict_poly)
    c_arr = FArray(
        (
            jnp.stack([s[0] for s in c_scalars]),
            jnp.stack([s[1] for s in c_scalars]),
        ),
        field,
    )
    delta = c_arr - u
    if _LINE_RESTRICT[0] == "fold":
        qc = line_restrict_coeffs(w_lsb, u, delta, k)
        q_coeffs = [
            (qc.limbs[0][t], qc.limbs[1][t]) for t in range(k + 1)
        ]
    else:
        evals = []
        for t in range(k + 1):
            t_s = FArray.from_ints([t], field).reshape(())
            point = u + delta * t_s
            evals.append(dot_mod(w_lsb, eq_table_dev(point, k)))
        q_vals = FArray(
            tuple(
                jnp.stack([e.limbs[i] for e in evals])
                for i in range(len(evals[0].limbs))
            ),
            field,
        )
        q_coeffs, _ = _interp_coeffs(q_vals, k)
    any_zero = _track_zero(any_zero, q_coeffs)
    final_msg = jnp.concatenate(
        [_np_bytes(bytes([3]))]
        + _poly_bytes(p_coeffs)
        + _poly_bytes(q_coeffs)
    )
    chain = chain.absorb(final_msg)
    ((slo, shi),) = hash_to_field_chain(chain, field, 1)
    r_star = FArray((slo, shi), field)
    r_next = u + delta * r_star
    coeff_lo = jnp.stack([jnp.stack([c[0] for c in row]) for row in coeff_rows])
    coeff_hi = jnp.stack([jnp.stack([c[1] for c in row]) for row in coeff_rows])
    p_lo = jnp.stack([c[0] for c in p_coeffs])
    p_hi = jnp.stack([c[1] for c in p_coeffs])
    q_lo = jnp.stack([c[0] for c in q_coeffs])
    q_hi = jnp.stack([c[1] for c in q_coeffs])
    return (
        chain.state,
        chain.buf,
        chain.nbytes,
        coeff_lo,
        coeff_hi,
        p_lo,
        p_hi,
        q_lo,
        q_hi,
        r_next,
        any_zero,
    )


@lru_cache(maxsize=None)
def _layer_phase2_jit(
    k: int,
    g: int,
    field: FieldConfig,
    lane_bits: int = 8,
    mode: str = "segment",
):
    unroll = default_unroll()

    def impl(
        state, buf, nbytes, u, a_lo, a_hi, w_lsb, eq_r, b_idx, c_idx,
        is_mul, *extra,
    ):
        return _phase2_body(
            k, field, lane_bits, mode, unroll,
            state, buf, nbytes, u, a_lo, a_hi, w_lsb, eq_r, b_idx,
            c_idx, is_mul, extra,
        )

    return jax.jit(impl)


# ---------------------------------------------------------------------------
# whole-proof layer scan: ONE dispatch for every layer of a uniform circuit
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _scan_proof_jit(
    num_layers: int,
    k: int,
    g: int,
    field: FieldConfig,
    lane_bits: int = 8,
):
    """The r5 dispatch-count killer: for circuits whose layers all have
    the same width (the flagship 16 x 2^20 family and the benchmark
    family), the 2L per-layer dispatches collapse into ONE
    ``jax.lax.scan`` over stacked wiring + layer values, with the SHA-256
    chain state, the layer index, and r_i carried. The r4e/r5 breakdowns
    showed the pipelined wall (12.9-16.7 s at 2^24) exceeding the synced
    device totals (9.2 s) by ~3.5 s of per-dispatch tunnel enqueue drag —
    this removes 31 of the 32 dispatches. Scan-mode scatter only (the
    shipped default). Byte-identity with the per-layer path is by shared
    bodies (_phase1_body/_phase2_body) and asserted in
    tests/test_gkr_fused.py."""
    unroll = default_unroll()

    def impl(
        state, buf, nbytes, r0, ws_list, b_idxs, c_idxs, is_muls,
        b_orders, b_starts, c_orders, c_starts,
    ):
        # stack the per-layer value tables INSIDE the program: eager
        # host-side jnp.stack would be its own 64 MB-input dispatch per
        # proof through the tunnel (fresh provers can't reuse a cache)
        ws = FArray(
            tuple(
                jnp.stack([w.limbs[j] for w in ws_list])
                for j in range(len(ws_list[0].limbs))
            ),
            field,
        )

        def body(carry, xs):
            state, buf, nbytes, layer_idx, r_i = carry
            (w_lsb, b_idx, c_idx, is_mul, b_o, b_s, c_o, c_s) = xs
            a = _phase1_body(
                k, k, field, lane_bits, "scan", unroll,
                state, buf, nbytes, layer_idx, r_i, w_lsb, b_idx,
                c_idx, is_mul, (b_o, b_s),
            )
            state, buf, nbytes, c1, a_lo, a_hi, u, eq_r, az_a = a
            b = _phase2_body(
                k, field, lane_bits, "scan", unroll,
                state, buf, nbytes, u, a_lo, a_hi, w_lsb, eq_r,
                b_idx, c_idx, is_mul, (c_o, c_s),
            )
            state, buf, nbytes = b[0], b[1], b[2]
            r_next = b[9]
            outs = (c1, a_lo, a_hi) + tuple(b[3:9]) + (az_a | b[10],)
            return (
                state, buf, nbytes, layer_idx + jnp.uint32(1), r_next
            ), outs

        carry0 = (state, buf, nbytes, jnp.uint32(0), r0)
        _, ys = jax.lax.scan(
            body, carry0, (ws, b_idxs, c_idxs, is_muls, b_orders,
                           b_starts, c_orders, c_starts),
        )
        return ys

    return jax.jit(impl)


def _scan_supported(circuit, mode: str, lane_bits, mesh) -> bool:
    """Uniform layer widths + scan scatter mode + uniform lane bits +
    unsharded — the whole-proof scan's compile key must be one (k, g)."""
    if mode != "scan" or mesh is not None:
        return False
    num_layers = len(circuit.layers)
    ks = {circuit.num_vars_at(i) for i in range(num_layers + 1)}
    return len(ks) == 1 and len(set(lane_bits)) == 1


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------


@jax.jit
def _pack_outputs(xs):
    """Concatenate arbitrary uint32/bool arrays into one flat uint32 vector
    (ONE device-to-host transfer for the whole proof)."""
    return jnp.concatenate(
        [jnp.ravel(x).astype(jnp.uint32) for x in xs]
    )


def _felt_bytes_host(lo: int, hi: int) -> bytes:
    return (int(lo) | (int(hi) << 32)).to_bytes(8, "little")


def _poly_bytes_host(lo_row, hi_row) -> bytes:
    out = [struct.pack("<Q", len(lo_row))]
    for t in range(len(lo_row)):
        out.append(struct.pack("<Q", t))
        out.append(_felt_bytes_host(lo_row[t], hi_row[t]))
    return b"".join(out)


def supports_fused_gkr(circuit, field: FieldConfig, dst: bytes) -> bool:
    if dst != b"" or field.backend != "goldilocks":
        return False
    return all(
        circuit.num_vars_at(i + 1) >= 2 for i in range(len(circuit.layers))
    )


def generate_gkr_transcript_fused(
    prover,
    field: FieldConfig,
    dst: bytes = b"",
    timings: Optional[list] = None,
    mesh=None,
):
    """Drop-in for generate_gkr_transcript: fused device proving with exact
    host fallback (unsupported configs, or a zero serialized coefficient).

    ``prover`` is a fresh gkr.Prover. The fused path only uses its circuit
    and forward-pass values; on fallback the prover runs the host protocol.

    With ``mesh`` (a jax.sharding.Mesh) the SAME two layer programs run
    sharded across the mesh under GSPMD: layer values and gate wiring enter
    with the mesh axes over their leading dimension and XLA partitions the
    phase-table scatters, folds, and round sums, inserting the collectives
    (the scalar SHA-256 challenge chain replicates, so every shard derives
    identical challenges with no broadcast). Transcripts are byte-identical
    across mesh shapes and to the unsharded path — modular arithmetic is
    exact, so partitioning cannot change any value. This composes the
    fastest path with the distributed path the way the reference's single
    prover serves every config (fiat-shamir/src/lib.rs:75-98).
    """
    from .transcript import GKRTranscript, generate_gkr_transcript

    circuit = prover.circuit
    if not supports_fused_gkr(circuit, field, dst):
        return generate_gkr_transcript(prover, field, dst)
    msgs = _prove_fused(prover, field, timings=timings, mesh=mesh)
    if msgs is None:  # zero-coefficient fallback (probability ~ rounds/p)
        return generate_gkr_transcript(prover, field, dst)
    return GKRTranscript(msgs)


def _mesh_put(mesh):
    """A placer: shard a leading dimension over ALL mesh axes when it
    divides evenly (gate lists, layer tables), replicate otherwise
    (challenges, chain state, tiny layers)."""
    from jax.sharding import NamedSharding, PartitionSpec

    axes = tuple(mesh.axis_names)
    ndev = mesh.devices.size
    row = NamedSharding(mesh, PartitionSpec(axes))
    repl = NamedSharding(mesh, PartitionSpec())

    def put(x):
        shape = getattr(x, "shape", ())
        ok = len(shape) >= 1 and shape[0] % ndev == 0 and shape[0] >= ndev
        return jax.device_put(x, row if ok else repl)

    def put_f(fa: FArray) -> FArray:
        return FArray(tuple(put(l) for l in fa.limbs), fa.field)

    return put, put_f


def _prove_fused(
    prover,
    field: FieldConfig,
    timings: Optional[list] = None,
    mesh=None,
) -> Optional[List[bytes]]:
    """``timings``, when given, receives ("phase1"|"phase2"|"pull", layer,
    seconds) tuples with a device sync after every dispatch — the fused-path
    cost breakdown (benches/gkr_benchmark.py --breakdown). Syncing defeats
    the cross-layer pipelining, so only profile runs pass it."""
    from ..runtime import sha256_midstate
    from ..fiat_shamir.hash_to_field import DefaultFieldHasher
    from .transcript import serialize_gkr_message
    from .protocol import Begin

    circuit = prover.circuit
    num_layers = len(circuit.layers)
    # forward-pass values on device, label (lsb) order
    if prover.device_forward:
        layers_dev = prover.layers_dev
    else:
        layers_dev = [
            FArray.from_ints(np.asarray(v, dtype=np.uint64), field)
            for v in prover.layers_u64
        ]

    t_prelude0 = time.perf_counter()
    begin_raw = serialize_gkr_message(prover.start_protocol())
    hasher = DefaultFieldHasher(field, b"")
    k0 = circuit.num_vars_at(0)
    r0 = hasher.hash_to_field(begin_raw, k0)

    # seed the device chain with the midstate over Z_pad || Begin
    full = bytes(64) + begin_raw
    nfull = len(full) // 64
    state = jnp.asarray(sha256_midstate(full[: 64 * nfull]))
    buf_np = np.zeros(64, np.uint8)
    rem = full[64 * nfull :]
    buf_np[: len(rem)] = np.frombuffer(rem, np.uint8)
    buf = jnp.asarray(buf_np)
    nbytes = jnp.uint32(len(begin_raw))

    # Wiring tables (and scan/gather plans) are a property of the CIRCUIT,
    # not the prover: cache them on the circuit object so repeated proofs
    # over the same circuit — even with fresh provers — never re-upload
    # them. Re-sending 3 x width indices (plus 2 x width plan rows in scan
    # mode) per layer per run dominates warm-run enqueue time through a
    # remote tunnel. One cached copy per (placement, scatter mode).
    from ..utils.config import get_config

    mode = get_config().gkr_scatter_mode
    wiring_caches = getattr(circuit, "_fused_wiring_cache", None)
    if wiring_caches is None:
        wiring_caches = circuit._fused_wiring_cache = {}
    lane_bits = getattr(circuit, "_fused_lane_bits", None)
    if lane_bits is None:
        from .device_tables import wiring_lane_bits

        lane_bits = circuit._fused_lane_bits = [
            wiring_lane_bits(circuit._wiring[i][0], circuit._wiring[i][1])
            for i in range(num_layers)
        ]
    wkey = (mesh, mode)  # None-mesh for single-device; Mesh is hashable
    if wkey not in wiring_caches:
        from .device_tables import scan_plan, wiring_plan_or_none

        base_dev = circuit._device_wiring()  # one upload per circuit
        wiring_dev = []
        for i in range(num_layers):
            b_idx, c_idx, is_mul = circuit._wiring[i]
            size = 1 << circuit.num_vars_at(i + 1)
            b_extra = c_extra = ()
            if mode == "plan":
                b_plan = wiring_plan_or_none(b_idx, size)
                c_plan = wiring_plan_or_none(c_idx, size)
                b_extra = () if b_plan is None else (jnp.asarray(b_plan),)
                c_extra = () if c_plan is None else (jnp.asarray(c_plan),)
            elif mode == "scan":
                b_extra = tuple(
                    jnp.asarray(x) for x in scan_plan(b_idx, size)
                )
                c_extra = tuple(
                    jnp.asarray(x) for x in scan_plan(c_idx, size)
                )
            wiring_dev.append(base_dev[i] + (b_extra, c_extra))
        if mesh is not None:
            put, _ = _mesh_put(mesh)
            wiring_dev = [
                tuple(
                    tuple(put(x) for x in w) if isinstance(w, tuple) else put(w)
                    for w in row
                )
                for row in wiring_dev
            ]
        wiring_caches[wkey] = wiring_dev
    wiring_dev = wiring_caches[wkey]

    # layer VALUES are per-prover (they depend on the inputs)
    layer_caches = getattr(prover, "_fused_dev_cache", None)
    if layer_caches is None:
        layer_caches = prover._fused_dev_cache = {}
    if mesh not in layer_caches:
        layers_put = layers_dev
        if mesh is not None:
            _, put_f = _mesh_put(mesh)
            layers_put = [put_f(t) for t in layers_dev]
        layer_caches[mesh] = layers_put
    layers_dev = layer_caches[mesh]

    r_i = FArray.from_ints(np.array([f.v for f in r0], dtype=object), field)
    timings_t0 = [time.perf_counter()]
    if timings is not None:
        # Begin pull+serialize, the 8.4 MB begin hash, the midstate seed,
        # wiring upload/caching — everything before the first dispatch
        timings.append(("prelude", -1, timings_t0[0] - t_prelude0))

    if _scan_supported(circuit, mode, lane_bits, mesh):
        # ONE dispatch for all layers (see _scan_proof_jit). Stacked
        # wiring is a circuit property (cached), stacked layer values a
        # prover property.
        L = num_layers
        k = circuit.num_vars_at(0)
        g = 1 << k
        skey = (mesh, mode, "stacked")
        if skey not in wiring_caches:
            wiring_caches[skey] = tuple(
                jnp.stack(xs)
                for xs in (
                    [wiring_dev[i][0] for i in range(L)],
                    [wiring_dev[i][1] for i in range(L)],
                    [wiring_dev[i][2] for i in range(L)],
                    [wiring_dev[i][3][0] for i in range(L)],
                    [wiring_dev[i][3][1] for i in range(L)],
                    [wiring_dev[i][4][0] for i in range(L)],
                    [wiring_dev[i][4][1] for i in range(L)],
                )
            )
        stacked = wiring_caches[skey]
        ws_list = tuple(layers_dev[i + 1] for i in range(L))
        fn = _scan_proof_jit(L, k, g, field, lane_bits[0])
        ys = fn(state, buf, nbytes, r_i, ws_list, *stacked)
        if timings is not None:
            jax.block_until_ready(ys[0])
            now = time.perf_counter()
            timings.append(("scan_layers", -1, now - timings_t0[0]))
            timings_t0[0] = now
        leaves = jax.tree_util.tree_leaves(ys)
        flat = np.asarray(_pack_outputs(tuple(leaves)))
        vals = []
        off = 0
        for x in leaves:
            size = int(np.prod(x.shape)) if x.shape else 1
            vals.append(flat[off : off + size].reshape(x.shape))
            off += size
        ys_np = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(ys), vals
        )
        (c1s, a_los, a_his, b_los, b_his, p_los, p_his, q_los, q_his, azs) = (
            ys_np
        )
        if timings is not None:
            now = time.perf_counter()
            timings.append(("pull", -1, now - timings_t0[0]))
            timings_t0[0] = now
        pulled = [
            (
                k, c1s[i], a_los[i], a_his[i], b_los[i], b_his[i],
                p_los[i], p_his[i], q_los[i], q_his[i], azs[i], azs[i],
            )
            for i in range(L)
        ]
        msgs = _assemble_msgs(begin_raw, pulled)
        if timings is not None:
            timings.append(
                ("assemble", -1, time.perf_counter() - timings_t0[0])
            )
        return msgs

    outs = []
    for i in range(num_layers):
        k_cur = circuit.num_vars_at(i)
        k = circuit.num_vars_at(i + 1)
        b_idx, c_idx, is_mul, b_extra, c_extra = wiring_dev[i]
        # per-layer effective mode: "plan" degrades to "segment" when the
        # layer's fan-in exceeded MAX_PLAN_FANIN (empty extra)
        b_mode = mode if b_extra else "segment"
        c_mode = mode if c_extra else "segment"
        g = len(b_idx)
        w_lsb = layers_dev[i + 1]
        p1_args = (
            state, buf, nbytes, jnp.uint32(i), r_i, w_lsb, b_idx, c_idx,
            is_mul,
        ) + tuple(b_extra)
        a = _layer_phase1_jit(
            k_cur, k, g, field,
            lane_bits=lane_bits[i], mode=b_mode,
        )(*p1_args)
        state, buf, nbytes, c1, a_lo, a_hi, u, eq_r, az_a = a
        if timings is not None:
            jax.block_until_ready(state)
            now = time.perf_counter()
            timings.append(("phase1", i, now - timings_t0[0]))
            timings_t0[0] = now
        p2_args = (
            state, buf, nbytes, u, a_lo, a_hi, w_lsb, eq_r, b_idx,
            c_idx, is_mul,
        ) + tuple(c_extra)
        b = _layer_phase2_jit(
            k, g, field,
            lane_bits=lane_bits[i], mode=c_mode,
        )(*p2_args)
        state, buf, nbytes = b[0], b[1], b[2]
        r_i = b[9]
        if timings is not None:
            jax.block_until_ready(state)
            now = time.perf_counter()
            timings.append(("phase2", i, now - timings_t0[0]))
            timings_t0[0] = now
        outs.append((k, c1, a_lo, a_hi) + tuple(b[3:9]) + (az_a, b[10]))

    # ONE synchronization point AND one transfer: concatenate every layer's
    # outputs into a single uint32 vector on device (per-array np.asarray
    # would pay one tunnel round-trip per array — ~200 of them)
    arrs = [x for row in outs for x in row[1:]]
    flat = np.asarray(_pack_outputs(tuple(arrs)))
    vals = []
    off = 0
    for x in arrs:
        size = int(np.prod(x.shape)) if x.shape else 1
        vals.append(flat[off : off + size].reshape(x.shape))
        off += size
    it = iter(vals)
    pulled = [(row[0],) + tuple(next(it) for _ in row[1:]) for row in outs]
    if timings is not None:
        now = time.perf_counter()
        timings.append(("pull", -1, now - timings_t0[0]))
    return _assemble_msgs(begin_raw, pulled)


def _assemble_msgs(begin_raw: bytes, pulled) -> Optional[List[bytes]]:
    """Host reassembly of the byte transcript from pulled coefficient
    rows; None on any zero serialized coefficient (exact host fallback)."""
    msgs = [begin_raw]
    for i, row in enumerate(pulled):
        (k, c1, a_lo, a_hi, b_lo, b_hi, p_lo, p_hi, q_lo, q_hi, az_a, az_b) = row
        if bool(az_a) or bool(az_b):
            return None
        msgs.append(
            bytes([1])
            + _felt_bytes_host(c1[0], c1[1])
            + struct.pack("<QQ", i, 2 * int(k))
        )
        for j in range(a_lo.shape[0]):
            msgs.append(bytes([2]) + _poly_bytes_host(a_lo[j], a_hi[j]))
        for j in range(b_lo.shape[0]):
            msgs.append(bytes([2]) + _poly_bytes_host(b_lo[j], b_hi[j]))
        msgs.append(
            bytes([3])
            + _poly_bytes_host(p_lo, p_hi)
            + _poly_bytes_host(q_lo, q_hi)
        )
    return msgs
