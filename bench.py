"""Benchmark: fused sumcheck round-kernel throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is prover field-operations per second (muls + adds, modeled
exactly from the kernel structure by utils/counters) for the fused
fold + degree-2 partial-sum round step of a 2-factor Goldilocks product
over a 2^22-point hypercube — the hot loop of every protocol in the stack
(ref hot loop: matrix-multiplication/src/lib.rs:110-131; metric:
BASELINE.md 'sumcheck prover field-ops/s per chip'). The reference
publishes no numbers (BASELINE.json "published": {}), so vs_baseline is
reported as 1.0 by convention.

Methodology: each rep uses a fresh challenge and pulls the round sums to
host before the next dispatch — exactly the dependency structure of a
real sumcheck loop (the next challenge derives from the sums). On this
container the chip sits behind a remote-execution tunnel adding ~25 ms
per synchronous call, which dominates the ~2-3 ms device compute; the
sustained device-side round time (measured separately with periodic
result observation, see BENCHMARKS.md) is ~2.8 ms at 2^23 points.
Overlapped-dispatch timings are not used: through this tunnel they
report physically impossible (>HBM-bandwidth) figures.
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
REPS = int(os.environ.get("BENCH_REPS", "20"))


def main():
    import numpy as np

    from thaler_study_tpu.fields import GOLDILOCKS, FArray
    from thaler_study_tpu.ops.round_kernel import PolySpec, _round_step_jit
    from thaler_study_tpu.utils.counters import COUNTS, count_round

    field = GOLDILOCKS
    n = N_VARS
    spec = PolySpec(block_sizes=(n + 1,), table_blocks=((0,), (0,)), terms=((0, 1),))
    sums_spec = spec.after_fold()

    rng = np.random.default_rng(42)
    tables = tuple(
        FArray(
            (
                jax.numpy.asarray(
                    rng.integers(0, 1 << 32, size=1 << (n + 1), dtype=np.uint32)
                ),
                jax.numpy.asarray(
                    rng.integers(0, 1 << 31, size=1 << (n + 1), dtype=np.uint32)
                ),
            ),
            field,
        )
        for _ in range(2)
    )
    rs = [
        FArray.scalar(field.felt(123456789123456789 + 7919 * i))
        for i in range(REPS + 1)
    ]
    step = _round_step_jit(spec, True, 2, field)
    # warm-up / compile
    sums, _ = step(tables, rs[REPS])
    jax.block_until_ready(sums.limbs)

    # adaptive rep count: the remote tunnel has degraded phases (seconds
    # per call); probe one rep and shrink REPS so the bench always finishes
    t0 = time.perf_counter()
    sums, _ = step(tables, rs[0])
    np.asarray(sums.limbs[0])
    probe_s = time.perf_counter() - t0
    reps = REPS if probe_s < 1.0 else max(2, min(REPS, int(60 / probe_s)))

    t0 = time.perf_counter()
    for i in range(reps):
        sums, _ = step(tables, rs[i])
        np.asarray(sums.limbs[0])  # sync: observe the round sums on host
    elapsed = time.perf_counter() - t0
    sync_round_ms = elapsed / reps * 1e3

    COUNTS.reset()
    count_round(sums_spec, fold=True)
    ops_per_round = COUNTS.field_muls + COUNTS.field_adds
    ops_per_sec = ops_per_round * reps / elapsed

    print(
        json.dumps(
            {
                "metric": "sumcheck_round_kernel_field_ops_per_s",
                "value": round(ops_per_sec),
                "unit": "field_ops/s/chip",
                "vs_baseline": 1.0,
                "detail": {
                    "field": "goldilocks(2^64-2^32+1)",
                    "hypercube_points": 1 << (n + 1),
                    "field_muls_per_round": COUNTS.field_muls,
                    "field_adds_per_round": COUNTS.field_adds,
                    "round_ms": elapsed / reps * 1e3,
                    "sync_round_ms": sync_round_ms,
                    "reps": reps,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
