"""GKR prover benchmark: wall-clock over a large layered circuit.

BASELINE config 5: full GKR prover on a 2^24-gate layered circuit. Builds a
depth x width random ADD/MUL circuit (width*depth gates), runs the complete
protocol (linear-time prover + sparse verifier), and reports per-phase
timings. Defaults to 2^22 gates (16 x 2^18) for a quick run; pass
--depth 16 --width-log 20 for the full 2^24.

Usage: python benches/gkr_benchmark.py [--depth 16] [--width-log 18]
"""

import argparse
import json
import os
import random
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

import numpy as np  # noqa: E402


def build_circuit(depth, width_log, rng):
    from thaler_study_tpu.gkr import Circuit, CircuitLayer, Gate, GateType

    width = 1 << width_log
    layers = []
    for _ in range(depth):
        b = rng.integers(0, width, width)
        c = rng.integers(0, width, width)
        mul = rng.random(width) < 0.5
        layers.append(
            CircuitLayer(
                [
                    Gate(GateType.MUL if m else GateType.ADD, (int(x), int(y)))
                    for x, y, m in zip(b, c, mul)
                ]
            )
        )
    return Circuit(layers, width)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--width-log", type=int, default=18)
    ap.add_argument("--runs", type=int, default=2,
                    help="protocol repetitions; the last run is fully warm "
                         "(per-program first-call costs ~1.3s through the "
                         "remote tunnel, paid once per process)")
    ap.add_argument("--fused", action="store_true",
                    help="prove through the fused non-interactive path "
                         "(gkr/fused.py: two device dispatches per layer, "
                         "challenges from the on-device FS chain) and check "
                         "the transcript with verify_gkr_transcript")
    ap.add_argument("--breakdown", action="store_true",
                    help="fused mode: sync after every per-layer dispatch "
                         "and report phase1/phase2/pull totals (defeats "
                         "pipelining; for profiling only)")
    ap.add_argument("--skip-verify", action="store_true",
                    help="fused mode: skip transcript verification (the "
                         "host verifier replay, timed separately anyway)")
    args = ap.parse_args()

    from thaler_study_tpu.fields import GOLDILOCKS as F
    from thaler_study_tpu.gkr import Prover, R, Verifier
    from thaler_study_tpu.sumcheck import SeededRng

    rng = np.random.default_rng(0)
    circuit = build_circuit(args.depth, args.width_log, rng)
    inputs = F.felts(rng.integers(0, 1 << 62, 1 << args.width_log).tolist())

    for run_idx in range(args.runs):
        t0 = time.perf_counter()
        prover = Prover(circuit, inputs, F)
        t_forward = time.perf_counter() - t0
        if args.fused:
            run_fused(
                args, circuit, inputs, F, prover, run_idx == args.runs - 1,
                t_forward,
            )
        else:
            run_one(
                args, circuit, inputs, F, prover, run_idx == args.runs - 1,
                t_forward,
            )


def run_fused(args, circuit, inputs, F, prover, emit, t_forward):
    """Whole-proof fused path: one timed generate_gkr_transcript_fused call
    (device dispatches pipeline; a single host pull at the end), then the
    host verifier replay."""
    from thaler_study_tpu.gkr import Verifier
    from thaler_study_tpu.gkr.fused import generate_gkr_transcript_fused
    from thaler_study_tpu.gkr.transcript import verify_gkr_transcript

    timings = [] if args.breakdown else None
    t0 = time.perf_counter()
    transcript = generate_gkr_transcript_fused(prover, F, timings=timings)
    t_prove = time.perf_counter() - t0

    ok = True
    t_verify = 0.0
    if not args.skip_verify:
        t0 = time.perf_counter()
        ok = verify_gkr_transcript(
            transcript, Verifier(circuit, F), inputs, F
        )
        t_verify = time.perf_counter() - t0
    if not emit:
        assert ok
        return
    print(
        json.dumps(
            {
                "bench": "gkr_prover_fused_noninteractive",
                "gates": args.depth << args.width_log,
                "depth": args.depth,
                "width": 1 << args.width_log,
                "field": F.name,
                "accepted": bool(ok),
                "prover_s": round(t_forward + t_prove, 3),
                "verifier_s": round(t_verify, 3),
                "messages": len(transcript.g),
                "transcript_bytes": sum(len(m) for m in transcript.g),
                "breakdown": {
                    "forward_pass_s": round(t_forward, 3),
                    "fused_layers_s": round(t_prove, 3),
                    **(
                        {
                            "phase1_s": round(
                                sum(s for p, _, s in timings if p == "phase1"),
                                3,
                            ),
                            "phase2_s": round(
                                sum(s for p, _, s in timings if p == "phase2"),
                                3,
                            ),
                            "prelude_s": round(
                                sum(
                                    s
                                    for p, _, s in timings
                                    if p == "prelude"
                                ),
                                3,
                            ),
                            "scan_layers_s": round(
                                sum(
                                    s
                                    for p, _, s in timings
                                    if p == "scan_layers"
                                ),
                                3,
                            ),
                            "assemble_s": round(
                                sum(
                                    s
                                    for p, _, s in timings
                                    if p == "assemble"
                                ),
                                3,
                            ),
                            "final_pull_s": round(
                                sum(s for p, _, s in timings if p == "pull"), 3
                            ),
                            "note": "per-dispatch sync defeats pipelining; "
                            "phase totals exceed the pipelined wall time",
                        }
                        if timings
                        else {}
                    ),
                },
                "device": str(jax.devices()[0]),
            }
        ),
        flush=True,
    )
    assert ok


def run_one(args, circuit, inputs, F, prover, emit, t_forward):
    """Drive the protocol with a per-phase cost breakdown (VERDICT r1 weak
    #5): forward pass / phase-1 table build (start_round, includes C_1) /
    phase-2 table build (the round_msg(k) call) / ordinary sumcheck rounds /
    final round (restrict_poly) / verifier."""
    from thaler_study_tpu.gkr import R, Verifier
    from thaler_study_tpu.sumcheck import SeededRng

    srng = SeededRng(0)
    verifier = Verifier(circuit, F)
    t0 = time.perf_counter()
    r_i = verifier.receive_prover_msg(prover.start_protocol(), srng).r
    buckets = {
        "phase1_tables_s": 0.0,
        "phase2_tables_s": 0.0,
        "sumcheck_rounds_s": 0.0,
        "final_restrict_s": 0.0,
    }
    t_verify = 0.0
    n_rounds = 0
    for i in range(args.depth):
        k = circuit.num_vars_at(i + 1)
        ta = time.perf_counter()
        msg = prover.start_round(i, r_i)
        buckets["phase1_tables_s"] += time.perf_counter() - ta
        nv = 2 * k
        tb = time.perf_counter()
        verifier.receive_prover_msg(msg, srng)
        t_verify += time.perf_counter() - tb
        for j in range(nv - 1):
            ta = time.perf_counter()
            pm = prover.round_msg(j)
            dt = time.perf_counter() - ta
            # round_msg(k) performs the phase-1 -> phase-2 transition
            # (B1/B2 scatter build) inside LibraW
            if j == k:
                buckets["phase2_tables_s"] += dt
            else:
                buckets["sumcheck_rounds_s"] += dt
            n_rounds += 1
            tb = time.perf_counter()
            vm = verifier.receive_prover_msg(pm, srng)
            t_verify += time.perf_counter() - tb
            prover.receive_verifier_msg(vm)
        prover.receive_verifier_msg(verifier.final_random_point(srng))
        ta = time.perf_counter()
        pm = prover.round_msg(nv - 1)
        buckets["final_restrict_s"] += time.perf_counter() - ta
        n_rounds += 1
        tb = time.perf_counter()
        vm = verifier.receive_prover_msg(pm, srng)
        t_verify += time.perf_counter() - tb
        assert isinstance(vm, R)
        r_i = vm.r
    ok = verifier.check_input(inputs)
    total = time.perf_counter() - t0
    if not emit:
        assert ok
        return

    t_prove = t_forward + sum(buckets.values())
    from thaler_study_tpu.utils import get_config

    print(
        json.dumps(
            {
                "bench": "gkr_prover_full_protocol",
                "gates": args.depth << args.width_log,
                "depth": args.depth,
                "width": 1 << args.width_log,
                "field": F.name,
                "accepted": bool(ok),
                "prover_s": round(t_prove, 3),
                "verifier_s": round(t_verify, 3),
                "wall_s": round(total + t_forward, 3),
                "inner_rounds": n_rounds,
                "device_tables": get_config().gkr_device_tables,
                "breakdown": {
                    "forward_pass_s": round(t_forward, 3),
                    **{kk: round(vv, 3) for kk, vv in buckets.items()},
                },
                "device": str(jax.devices()[0]),
            }
        ),
        flush=True,
    )
    assert ok


if __name__ == "__main__":
    main()
