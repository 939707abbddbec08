"""Benchmark: whole-proof Fiat-Shamir sumcheck throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is prover field-operations per second (muls + adds, modeled
exactly from the kernel structure by utils/counters) for COMPLETE
non-interactive sumcheck proofs through the production fused path
(ops/fs_kernel.py::fs_prove_device_batch): every fold, round sum,
arkworks-canonical serialization, and SHA-256 Fiat-Shamir challenge in one
batched device dispatch, host byte-assembly included. This is the
whole-protocol analogue of the reference's criterion harness, which clones
the prover and runs all rounds per iteration
(matrix-multiplication/benches/mm_benchmark.rs:64-101); the hot loop it
generalizes is matrix-multiplication/src/lib.rs:110-131. The reference
publishes no numbers (BASELINE.json "published": {}), so vs_baseline is
reported as 1.0 by convention.

Configuration: B independent 2-factor Goldilocks product proofs over a
2^n-point hypercube per dispatch (n = BENCH_N_VARS, default 22; B =
BENCH_BATCH, default 64). Batching amortizes the sequential SHA-256
challenge chain (vmapped across the batch) and the remote-tunnel dispatch
latency (~25 ms/call on this container) the way a production prover
amortizes them across independent proofs. Measured scaling on v5e:
~160 ms fixed (chain + dispatch) + ~2.6 ms/proof marginal (the HBM-bound
fold+sum passes), i.e. 1.6 G field-ops/s at B=4 -> 10 G at B=64.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N_VARS = int(os.environ.get("BENCH_N_VARS", "22"))
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
REPS = int(os.environ.get("BENCH_REPS", "4"))


def main():
    import numpy as np

    from thaler_study_tpu.fields import GOLDILOCKS, FArray
    from thaler_study_tpu.ops.fs_kernel import fs_prove_device_batch
    from thaler_study_tpu.ops.round_kernel import PolySpec
    from thaler_study_tpu.utils.counters import COUNTS, count_round

    field = GOLDILOCKS
    n = N_VARS
    spec = PolySpec(block_sizes=(n,), table_blocks=((0,), (0,)), terms=((0, 1),))

    rng = np.random.default_rng(42)
    tables = tuple(
        FArray(
            (
                jax.numpy.asarray(
                    rng.integers(0, 1 << 32, size=(BATCH, 1 << n), dtype=np.uint32)
                ),
                jax.numpy.asarray(
                    rng.integers(0, 1 << 31, size=(BATCH, 1 << n), dtype=np.uint32)
                ),
            ),
            field,
        )
        for _ in range(2)
    )

    # field ops for ONE whole proof: n rounds, fold from round 1 on
    # field ops for ONE whole proof under the STANDARD sumcheck algorithm
    # (all degree+1 evaluation passes per round) — the work a reference
    # prover performs for the same proof, and the numerator convention
    # (like FLOPs-for-FFT) that keeps field-ops/s comparable across
    # algorithmic shortcuts. The kernel itself does LESS: rounds after the
    # first derive s(1) = claim - s(0) (ops/round_kernel claim shortcut),
    # reported as kernel_actual_field_ops below.
    COUNTS.reset()
    s = spec
    for j in range(n):
        count_round(s, fold=j > 0)
        if j < n - 1:
            s = s.after_fold()
    ops_per_proof = COUNTS.field_muls + COUNTS.field_adds
    COUNTS.reset()
    s = spec
    for j in range(n):
        count_round(s, fold=j > 0, claim_known=j > 0)
        if j < n - 1:
            s = s.after_fold()
    kernel_ops_per_proof = COUNTS.field_muls + COUNTS.field_adds

    # warm-up / compile
    msgs = fs_prove_device_batch(spec, tables)
    assert msgs is not None and len(msgs) == BATCH

    # adaptive rep count: the remote tunnel has degraded phases (seconds
    # per call); probe one rep and shrink REPS so the bench always finishes
    t0 = time.perf_counter()
    fs_prove_device_batch(spec, tables)
    probe_s = time.perf_counter() - t0
    reps = REPS if probe_s < 2.0 else max(2, min(REPS, int(60 / probe_s)))

    t0 = time.perf_counter()
    for _ in range(reps):
        msgs = fs_prove_device_batch(spec, tables)
    elapsed = time.perf_counter() - t0
    assert msgs is not None

    proofs = reps * BATCH
    ops_per_sec = ops_per_proof * proofs / elapsed

    print(
        json.dumps(
            {
                "metric": "fs_sumcheck_whole_proof_field_ops_per_s",
                "value": round(ops_per_sec),
                "unit": "field_ops/s/chip",
                "vs_baseline": 1.0,
                "detail": {
                    "field": "goldilocks(2^64-2^32+1)",
                    "hypercube_points": 1 << n,
                    "batch": BATCH,
                    "rounds_per_proof": n,
                    "field_ops_per_proof": ops_per_proof,
                    "kernel_actual_field_ops": kernel_ops_per_proof,
                    "proof_ms": elapsed / proofs * 1e3,
                    "dispatch_ms": elapsed / reps * 1e3,
                    "reps": reps,
                    "transcript_hash": "sha256/expand_message_xmd on device",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
