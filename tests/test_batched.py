"""Batched proving: transcripts byte-identical to per-instance runs."""

import numpy as np

from thaler_study_tpu.fields import GOLDILOCKS as F
from thaler_study_tpu.fiat_shamir import (
    SumcheckInteractiveProver,
    SumcheckInteractiveVerifier,
    generate_transcript,
    verify_transcript,
)
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.ops.round_kernel import PolySpec
from thaler_study_tpu.protocols import (
    BatchedProductPoly,
    ProductPoly,
    generate_transcripts_batch,
)
from thaler_study_tpu.sumcheck import Prover, Verifier


def test_batched_transcripts_match_individual(rng):
    n, k, B = 5, 2, 4
    spec = PolySpec(
        block_sizes=(n,), table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    instances = []
    for _ in range(B):
        tabs = [
            DenseMLE.from_evals_lsb(
                np.array([rng.randrange(F.p) for _ in range(1 << n)],
                         dtype=np.uint64), n, F,
            ).evals
            for _ in range(k)
        ]
        instances.append(tabs)

    batched = BatchedProductPoly.stack(instances)
    batch_transcripts = generate_transcripts_batch(batched, F)

    for i in range(B):
        solo = generate_transcript(
            SumcheckInteractiveProver(Prover(ProductPoly(spec, instances[i]))),
            F,
        )
        assert batch_transcripts[i].to_bytes() == solo.to_bytes(), f"inst {i}"
        # and each verifies
        g = ProductPoly(spec, instances[i])
        assert verify_transcript(
            batch_transcripts[i],
            SumcheckInteractiveVerifier(Verifier(n, g), F),
            F,
        )
