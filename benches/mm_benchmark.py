"""MatMul-IP prover benchmark sweep — the criterion harness analogue.

Mirrors the reference's ``benchmark_g_prover``
(matrix-multiplication/benches/mm_benchmark.rs:62-101): for each p in the
sweep, build G for random 2^p x 2^p matrices and time a full prover run
(construction + every round with pseudo-random challenges), reporting
throughput in ``num_vars`` elements like criterion's
``Throughput::Elements`` (:85). Field defaults to Goldilocks (the perf
field) instead of the reference's F5 — override with --field f5.

Usage: python benches/mm_benchmark.py [--pmax 10] [--samples 3] [--field f5]
Emits one JSON line per size.
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


def run_prover(g, field, rng):
    """One full prover run: all rounds with random challenges (the
    criterion closure, mm_benchmark.rs:86-99)."""
    from thaler_study_tpu.sumcheck import Prover

    prover = Prover(g)
    r_j = field.one()
    for j in range(g.num_vars()):
        uni = prover.round(r_j, j)
        r_j = field.felt(rng.randrange(field.p))
    return uni


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pmin", type=int, default=2)
    ap.add_argument("--pmax", type=int, default=10)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--field", default="goldilocks", choices=["goldilocks", "f5"])
    args = ap.parse_args()

    from thaler_study_tpu.fields import F5, GOLDILOCKS
    from thaler_study_tpu.protocols import MatMulG
    from thaler_study_tpu.utils.counters import COUNTS

    field = GOLDILOCKS if args.field == "goldilocks" else F5
    rng = random.Random(0)

    for p in range(args.pmin, args.pmax + 1):
        n = 1 << p
        a = [rng.randrange(field.p) for _ in range(n * n)]
        b = [rng.randrange(field.p) for _ in range(n * n)]
        point = [field.felt(rng.randrange(field.p)) for _ in range(2 * p)]

        g = MatMulG.new(p, a, b, point, field)
        run_prover(g, field, rng)  # warm-up: compiles every round program

        COUNTS.reset()
        times = []
        for _ in range(args.samples):
            t0 = time.perf_counter()
            run_prover(g, field, rng)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            json.dumps(
                {
                    "bench": "matmul_g_prover_full_run",
                    "matrix_dim": n,
                    "num_vars": p,
                    "field": field.name,
                    "best_s": best,
                    "throughput_elements_per_s": p / best,
                    "field_ops_per_run": (COUNTS.field_muls + COUNTS.field_adds)
                    // args.samples,
                    "samples": args.samples,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
