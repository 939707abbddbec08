"""Per-part cost attribution for ONE fused GKR layer dispatch.

The fused prover's ``--breakdown`` (benches/gkr_benchmark.py) gives
phase1/phase2/pull totals per layer; this bench splits one layer's
dispatch-A (and B) cost into its constituent device programs so the
multi-second phase totals at 2^24 gates (BENCHMARKS.md config 5) can be
attributed and attacked (VERDICT r3 #5 part 2):

- ``eq``       eq_table_dev(r, k) — the 2^k eq-table build (k doublings)
- ``scan``     scan_add_mod_many on 2 value arrays (the scatter-add)
- ``build1``   phase1_tables full (eq + gather + products + scatter)
- ``build2``   phase2_tables full
- ``msb``      lsb_to_msb x3 (label order -> internal MSB-first)
- ``rounds``   the k fused fold+sum rounds of dispatch A, SHA removed
               (challenges passed in) — pure sumcheck compute
- ``sha``      the per-round serialization + SHA-256 absorb +
               expand_message_xmd challenge chain alone (k rounds over a
               realistic 57-byte SumCheckProverMessage each)
- ``p1``       the real dispatch A (_layer_phase1_jit) — should be ~
               build1 + msb + rounds + sha
- ``p2``       the real dispatch B (_layer_phase2_jit)

Wiring matches benches/gkr_benchmark.py's circuit family: uniform random
b/c wires over the layer (average fan-in 1), 50% MUL. Reference hot loop
this profiles the replacement of: gkr-protocol/src/lib.rs:388-404.

Usage: python benches/gkr_parts.py [--k 20] [--reps 3] [--mode scan]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _digest(*leaves):
    """Reduce arbitrary program outputs to ONE u32 scalar on device, so
    timing pulls a 4-byte result per rep. block_until_ready does NOT
    actually block through the remote-execution tunnel (observed —
    benches/roofline.py notes; the first committed run of this bench
    reported the full dispatch at 0.2 ms against a 157 ms part); a host
    pull of a scalar that data-depends on every output is the only honest
    sync, and the scalar keeps the pull itself off the timing."""
    acc = jnp.uint32(0)
    for a in leaves:
        acc = acc + jnp.sum(
            jnp.ravel(a).astype(jnp.uint32), dtype=jnp.uint32
        )
    return acc


def djit(fn):
    """jit(fn) wrapped to return the u32 digest of all its outputs."""
    return jax.jit(
        lambda *a: _digest(*jax.tree_util.tree_leaves(fn(*a)))
    )


def timed(fn, reps):
    """Warm (compile) then time: median of ``reps`` calls, each synced by
    a host pull of the 4-byte digest (see _digest)."""
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=20, help="layer variables")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", default="scan",
                    choices=["scan", "segment", "plan"])
    args = ap.parse_args()

    from thaler_study_tpu.fields import GOLDILOCKS as F
    from thaler_study_tpu.fields import FArray
    from thaler_study_tpu.gkr.device_tables import (
        eq_table_dev,
        lsb_to_msb,
        phase1_tables,
        phase2_tables,
        scan_add_mod_many,
        scan_plan,
        wiring_plan_or_none,
    )
    from thaler_study_tpu.gkr.fused import (
        _layer_phase1_jit,
        _layer_phase2_jit,
        _msg_sumcheck,
        _phase1_spec,
    )
    from thaler_study_tpu.ops.fs_kernel import _claim_at, _interp_coeffs
    from thaler_study_tpu.ops.round_kernel import _fold_tables, _round_sums
    from thaler_study_tpu.ops.sha_chain import (
        DevChain,
        default_unroll,
        hash_to_field_chain,
    )
    from thaler_study_tpu.runtime import sha256_midstate

    k = args.k
    g = 1 << k
    rng = np.random.default_rng(0)

    def farr(n):
        return FArray.from_ints(
            rng.integers(0, F.p, n, dtype=np.uint64), F
        )

    w_lsb = farr(g)
    r_i = farr(k)
    u = farr(k)
    b_idx_np = rng.integers(0, g, g)
    c_idx_np = rng.integers(0, g, g)
    b_idx = jnp.asarray(b_idx_np)
    c_idx = jnp.asarray(c_idx_np)
    is_mul = jnp.asarray(rng.random(g) < 0.5)
    b_scan = tuple(jnp.asarray(x) for x in scan_plan(b_idx_np, g))
    c_scan = tuple(jnp.asarray(x) for x in scan_plan(c_idx_np, g))
    b_plan_np = wiring_plan_or_none(b_idx_np, g)
    b_plan = None if b_plan_np is None else jnp.asarray(b_plan_np)
    c_plan_np = wiring_plan_or_none(c_idx_np, g)
    c_plan = None if c_plan_np is None else jnp.asarray(c_plan_np)
    jax.block_until_ready(
        (w_lsb.limbs, r_i.limbs, b_idx, c_idx, is_mul, b_scan, c_scan)
    )

    res = {"k": k, "g": g, "mode": args.mode, "reps": args.reps}

    # --- null-dispatch baseline: every part timing includes one tunnel
    # round-trip for the 4-byte digest pull; subtract this to compare
    # device-side work
    sync_jit = djit(lambda x: x + jnp.uint32(1))
    res["sync_ms"] = (
        timed(lambda: sync_jit(jnp.uint32(0)), args.reps) * 1e3
    )

    # --- eq table build
    eq_jit = djit(lambda r: eq_table_dev(r, k).limbs)
    res["eq_ms"] = timed(lambda: eq_jit(r_i), args.reps) * 1e3

    # --- scatter-add alone (2 value arrays, the phase-1 shape)
    vals_a = farr(g)
    vals_b = farr(g)
    if args.mode == "scan":
        sc_jit = djit(
            lambda o, s, va, vb: tuple(
                x.limbs for x in scan_add_mod_many(o, s, (va, vb))
            )
        )
        res["scatter_ms"] = (
            timed(lambda: sc_jit(b_scan[0], b_scan[1], vals_a, vals_b),
                  args.reps) * 1e3
        )
    elif args.mode == "plan":
        from thaler_study_tpu.gkr.device_tables import gather_add_mod_many

        sc_jit = djit(
            lambda p, va, vb: tuple(
                x.limbs for x in gather_add_mod_many(p, (va, vb))
            )
        )
        res["scatter_ms"] = (
            timed(lambda: sc_jit(b_plan, vals_a, vals_b), args.reps) * 1e3
        )
    else:
        from thaler_study_tpu.gkr.device_tables import scatter_add_mod_many

        sc_jit = djit(
            lambda i, va, vb: tuple(
                x.limbs
                for x in scatter_add_mod_many(i, (va, vb), g, lane_bits=16)
            )
        )
        res["scatter_ms"] = (
            timed(lambda: sc_jit(b_idx, vals_a, vals_b), args.reps) * 1e3
        )

    def extra(which):
        if args.mode == "scan":
            return {"b_scan" if which == 1 else "c_scan":
                    b_scan if which == 1 else c_scan}
        if args.mode == "plan":
            return (
                {"b_plan": b_plan} if which == 1 else {"c_plan": c_plan}
            )
        return {}

    # --- phase builds, full
    b1_jit = djit(
        lambda r, w, bi, ci, m: tuple(
            x.limbs for x in phase1_tables(
                r, w, bi, ci, m, k, k, lane_bits=16, **extra(1)
            )
        )
    )
    res["build1_ms"] = (
        timed(lambda: b1_jit(r_i, w_lsb, b_idx, c_idx, is_mul), args.reps)
        * 1e3
    )
    eq_r = eq_table_dev(r_i, k)
    jax.block_until_ready(eq_r.limbs)
    b2_jit = djit(
        lambda uu, w, er, bi, ci, m: tuple(
            x.limbs for x in phase2_tables(
                uu, w, er, bi, ci, m, k, lane_bits=16, **extra(2)
            )
        )
    )
    res["build2_ms"] = (
        timed(lambda: b2_jit(u, w_lsb, eq_r, b_idx, c_idx, is_mul),
              args.reps) * 1e3
    )

    # --- order relabel x3
    msb_jit = djit(
        lambda a, b, c: (
            lsb_to_msb(a, k).limbs,
            lsb_to_msb(b, k).limbs,
            lsb_to_msb(c, k).limbs,
        )
    )
    res["msb3_ms"] = (
        timed(lambda: msb_jit(w_lsb, vals_a, vals_b), args.reps) * 1e3
    )

    # --- the k fused rounds alone (challenges given; no SHA, no serialize)
    chal = farr(k)

    def rounds_impl(t0, t1, t2, ch):
        spec = _phase1_spec(k)
        tables = (t0, t1, t2)
        dom_coeffs = None
        r = None
        outs = []
        for j in range(k):
            if r is not None:
                tables = _fold_tables(spec, tables, r)
                spec = spec.after_fold()
                claim = _claim_at(F, dom_coeffs, r)
            else:
                claim = None
            sums = _round_sums(spec, tables, 2, claim=claim)
            coeffs, dom_coeffs = _interp_coeffs(sums, 2)
            outs.extend(coeffs[0])
            r = FArray((ch.limbs[0][j], ch.limbs[1][j]), F)
        return tuple(outs)

    rounds_jit = djit(rounds_impl)
    t0a, t1a, t2a = farr(g), farr(g), farr(g)
    res["rounds_ms"] = (
        timed(lambda: rounds_jit(t0a, t1a, t2a, chal), args.reps) * 1e3
    )

    # --- the line restriction q(t) = W~(u + t*delta): old (k+1 eq-table
    # evaluations + interpolation) vs new (symbolic coefficient fold) —
    # the dominant phase-2 cost found in r5 (VERDICT r4 #3)
    from thaler_study_tpu.gkr.device_tables import (
        dot_mod,
        line_restrict_coeffs,
    )
    from thaler_study_tpu.ops.fs_kernel import (
        _interp_coeffs as interp_coeffs,
    )

    delta = farr(k)

    def qline_interp_impl(w, uu, dd):
        evals = []
        for t in range(k + 1):
            t_s = FArray.from_ints([t], F).reshape(())
            point = uu + dd * t_s
            evals.append(dot_mod(w, eq_table_dev(point, k)))
        q_vals = FArray(
            tuple(
                jnp.stack([e.limbs[i] for e in evals]) for i in range(2)
            ),
            F,
        )
        coeffs, _ = interp_coeffs(q_vals, k)
        return tuple(c for pair in coeffs for c in pair)

    qi_jit = djit(qline_interp_impl)
    res["qline_interp_ms"] = (
        timed(lambda: qi_jit(w_lsb, u, delta), args.reps) * 1e3
    )

    qf_jit = djit(
        lambda w, uu, dd: line_restrict_coeffs(w, uu, dd, k).limbs
    )
    res["qline_fold_ms"] = (
        timed(lambda: qf_jit(w_lsb, u, delta), args.reps) * 1e3
    )

    # --- the SHA absorb + hash_to_field chain alone, k rounds
    unroll = default_unroll()
    state0 = jnp.asarray(sha256_midstate(bytes(64)))
    buf0 = jnp.zeros(64, jnp.uint8)
    msg_coeffs = [
        (jnp.uint32(1 + 2 * t), jnp.uint32(2 + t)) for t in range(3)
    ]

    def sha_impl(state, buf):
        chain = DevChain(state, buf, jnp.uint32(0), unroll)
        outs = []
        for _ in range(k):
            chain = chain.absorb(_msg_sumcheck(msg_coeffs))
            ((rlo, rhi),) = hash_to_field_chain(chain, F, 1)
            outs.append(rlo)
            outs.append(rhi)
        return tuple(outs) + (chain.state,)

    sha_jit = djit(sha_impl)
    res["sha_ms"] = timed(lambda: sha_jit(state0, buf0), args.reps) * 1e3

    # --- the real dispatches, for the cross-check
    p1 = _layer_phase1_jit(k, k, g, F, lane_bits=16, mode=args.mode)
    p1_args = (
        state0, buf0, jnp.uint32(0), jnp.uint32(0), r_i, w_lsb, b_idx,
        c_idx, is_mul,
    )
    if args.mode == "scan":
        p1_args += b_scan
    elif args.mode == "plan":
        p1_args += (b_plan,)
    p1d = djit(lambda *a: p1(*a))
    res["p1_ms"] = timed(lambda: p1d(*p1_args), args.reps) * 1e3

    p2 = _layer_phase2_jit(k, g, F, lane_bits=16, mode=args.mode)
    a_lo = jnp.ones((k, 3), jnp.uint32)
    a_hi = jnp.ones((k, 3), jnp.uint32)
    p2_args = (
        state0, buf0, jnp.uint32(0), u, a_lo, a_hi, w_lsb, eq_r, b_idx,
        c_idx, is_mul,
    )
    if args.mode == "scan":
        p2_args += c_scan
    elif args.mode == "plan":
        p2_args += (c_plan,)
    p2d = djit(lambda *a: p2(*a))
    res["p2_ms"] = timed(lambda: p2d(*p2_args), args.reps) * 1e3

    res["p1_parts_sum_ms"] = round(
        res["build1_ms"] + res["msb3_ms"] + res["rounds_ms"] + res["sha_ms"],
        3,
    )
    for key in list(res):
        if key.endswith("_ms"):
            res[key] = round(res[key], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
