"""Sumcheck + MLE benchmarks for the BASELINE configs 1 and 2.

- config 1: full non-interactive (Fiat-Shamir) sumcheck over a 2^16-point
  2-factor product, 64-bit field — end-to-end prove + verify wall clock.
- config 2: MLE evaluation of a 2^20-point table (vsbw weight-table path
  on device) plus the eq-table build itself.

Emits one JSON line per config. Like the GKR bench, the second repetition
is the warm measurement.
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


def bench_sumcheck(n_vars: int):
    from thaler_study_tpu.fields import GOLDILOCKS as F
    from thaler_study_tpu.fiat_shamir import (
        SumcheckInteractiveProver,
        SumcheckInteractiveVerifier,
        generate_transcript,
        verify_transcript,
    )
    from thaler_study_tpu.mle.dense import DenseMLE
    from thaler_study_tpu.ops.round_kernel import PolySpec
    from thaler_study_tpu.protocols import ProductPoly
    from thaler_study_tpu.sumcheck import Prover, Verifier
    from thaler_study_tpu.utils.counters import COUNTS

    rng = np.random.default_rng(0)
    spec = PolySpec(
        block_sizes=(n_vars,), table_blocks=((0,), (0,)), terms=((0, 1),)
    )
    tables = tuple(
        DenseMLE.from_evals_lsb(
            rng.integers(0, 1 << 62, 1 << n_vars), n_vars, F
        ).evals
        for _ in range(2)
    )

    results = {}
    for run in range(2):
        g = ProductPoly(spec, tables)
        COUNTS.reset()
        t0 = time.perf_counter()
        transcript = generate_transcript(
            SumcheckInteractiveProver(Prover(g)), F
        )
        t_prove = time.perf_counter() - t0
        t0 = time.perf_counter()
        ok = verify_transcript(
            transcript,
            SumcheckInteractiveVerifier(Verifier(n_vars, g), F),
            F,
        )
        t_verify = time.perf_counter() - t0
        results = {
            "bench": "fs_sumcheck_end_to_end",
            "hypercube_points": 1 << n_vars,
            "field": F.name,
            "verified": bool(ok),
            "prove_s": round(t_prove, 4),
            "verify_s": round(t_verify, 4),
            "field_ops": COUNTS.field_muls + COUNTS.field_adds,
            "proof_bytes": len(transcript.to_bytes()),
            "device": str(jax.devices()[0]),
        }
        assert ok
    print(json.dumps(results), flush=True)


def bench_mle(n_vars: int):
    from thaler_study_tpu.fields import GOLDILOCKS as F
    from thaler_study_tpu.mle import eq_weight_table
    from thaler_study_tpu.mle.dense import DenseMLE

    rng = np.random.default_rng(1)
    pyrng = random.Random(2)
    mle = DenseMLE.from_evals_lsb(
        rng.integers(0, 1 << 62, 1 << n_vars), n_vars, F
    )
    point = [F.felt(pyrng.randrange(F.p)) for _ in range(n_vars)]

    for run in range(2):
        t0 = time.perf_counter()
        value = mle.evaluate(point)
        t_eval = time.perf_counter() - t0
        t0 = time.perf_counter()
        w = eq_weight_table(point)
        jax.block_until_ready(w.limbs)
        t_eq = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "bench": "mle_eval_and_eq_table",
                "hypercube_points": 1 << n_vars,
                "field": F.name,
                "eval_s": round(t_eval, 4),
                "eq_table_s": round(t_eq, 4),
                "value_low64": value.v & ((1 << 64) - 1),
                "device": str(jax.devices()[0]),
            }
        ),
        flush=True,
    )


def bench_batched(n_vars: int, batch: int):
    """Batched FS proving: batch proofs per device program (amortizes the
    per-round dispatch latency across statements)."""
    from thaler_study_tpu.fields import GOLDILOCKS as F
    from thaler_study_tpu.mle.dense import DenseMLE
    from thaler_study_tpu.protocols import (
        BatchedProductPoly,
        generate_transcripts_batch,
    )

    rng = np.random.default_rng(5)
    instances = [
        [
            DenseMLE.from_evals_lsb(
                rng.integers(0, 1 << 62, 1 << n_vars), n_vars, F
            ).evals
            for _ in range(2)
        ]
        for _ in range(batch)
    ]
    for run in range(2):
        t0 = time.perf_counter()
        transcripts = generate_transcripts_batch(
            BatchedProductPoly.stack(instances), F
        )
        t_prove = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "bench": "fs_sumcheck_batched",
                "batch": batch,
                "hypercube_points": 1 << n_vars,
                "field": F.name,
                "prove_s_total": round(t_prove, 4),
                "prove_s_per_proof": round(t_prove / batch, 4),
                "proofs": len(transcripts),
                "device": str(jax.devices()[0]),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sumcheck-vars", type=int, default=16)
    ap.add_argument("--mle-vars", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    bench_sumcheck(args.sumcheck_vars)
    bench_mle(args.mle_vars)
    bench_batched(args.sumcheck_vars, args.batch)
