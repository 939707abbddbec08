"""Default-tier mesh smoke: the heavy tier owns the GSPMD-compile-bound
sharded suites (tests/test_parallel.py, test_multihost.py, ...), so this
file keeps ONE fast sharded-vs-local byte-identity check in every default
run — the survey's core multi-host invariant (SURVEY.md section 4: same
protocol, 1-chip and sharded, identical transcripts) must never leave the
quick signal.

Scales are deliberately tiny (n=6, per-round dispatch path — no
whole-proof GSPMD compile), so this runs in seconds even on a cold cache.
"""

import pytest

from thaler_study_tpu.fields import GOLDILOCKS
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.ops.round_kernel import PolySpec
from thaler_study_tpu.parallel import ShardedProductPoly, make_mesh
from thaler_study_tpu.protocols import ProductPoly
from thaler_study_tpu.sumcheck import Prover
from thaler_study_tpu.fiat_shamir import (
    SumcheckInteractiveProver,
    generate_transcript,
)


def test_sharded_transcript_smoke(rng):
    """Byte-identical FS transcripts: 8-device sharded vs single-device."""
    n, k, n_shard = 6, 2, 3
    field = GOLDILOCKS
    tables = [
        DenseMLE.from_evals_lsb(
            [rng.randrange(field.p) for _ in range(1 << n)], n, field
        ).evals
        for _ in range(k)
    ]
    mesh = make_mesh()
    assert mesh.devices.size == 8

    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    local = ProductPoly(spec, tables)
    sharded = ShardedProductPoly.from_internal_tables(
        tables, mesh, n_shard=n_shard
    )

    t_local = generate_transcript(
        SumcheckInteractiveProver(Prover(local)), field
    )
    t_sharded = generate_transcript(
        SumcheckInteractiveProver(Prover(sharded)), field
    )
    assert t_local.to_bytes() == t_sharded.to_bytes()
