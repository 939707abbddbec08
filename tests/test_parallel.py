"""Sharded-prover tests on the virtual 8-device CPU mesh.

The survey's multi-host test strategy (SURVEY.md section 4): run the same
protocol 1-chip and sharded and assert identical transcripts — the
reference's single-process determinism is the spec.
"""

import random

import jax
import pytest

from thaler_study_tpu.fields import F1572869, GOLDILOCKS, FArray
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.ops.round_kernel import PolySpec
from thaler_study_tpu.parallel import ShardedProductPoly, make_mesh
from thaler_study_tpu.protocols import ProductPoly
from thaler_study_tpu.sumcheck import Prover
from thaler_study_tpu.fiat_shamir import (
    SumcheckInteractiveProver,
    generate_transcript,
)


def _product_tables(field, n, k, rng):
    tables = []
    for _ in range(k):
        evals = [rng.randrange(field.p) for _ in range(1 << n)]
        tables.append(DenseMLE.from_evals_lsb(evals, n, field).evals)
    return tables


@pytest.mark.parametrize("field", [F1572869, GOLDILOCKS], ids=lambda f: f.name)
@pytest.mark.parametrize("n_shard", [3, 4])
def test_sharded_transcript_equals_local(field, n_shard, rng):
    """Byte-identical FS transcripts: sharded (8 devices) vs single-device."""
    n, k = 6, 2
    tables = _product_tables(field, n, k, rng)
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
    assert sharded.num_vars() == n

    t_local = generate_transcript(
        SumcheckInteractiveProver(Prover(local)), field
    )
    t_sharded = generate_transcript(
        SumcheckInteractiveProver(Prover(sharded)), field
    )
    assert t_local.to_bytes() == t_sharded.to_bytes()


def test_sharded_c1_and_rounds_exact(rng):
    field = GOLDILOCKS
    n, k = 5, 3
    tables = _product_tables(field, n, k, rng)
    mesh = make_mesh()
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    local = ProductPoly(spec, tables)
    sharded = ShardedProductPoly.from_internal_tables(tables, mesh, n_shard=3)
    assert sharded.sum_evaluations() == local.sum_evaluations()

    # interactive round-by-round equality across the local->sharded boundary
    r_prev = None
    lp, sp = local, sharded
    for j in range(n):
        lu, lp = lp.round_univariate(r_prev)
        su, sp = sp.round_univariate(r_prev)
        assert lu == su, f"round {j} mismatch"
        r_prev = field.felt(rng.randrange(field.p))


def test_round_sums_actually_sharded(rng):
    """The sharded tables really live distributed: each limb's sharding
    spans all 8 devices before the fold rounds."""
    field = F1572869
    tables = _product_tables(field, 6, 2, rng)
    mesh = make_mesh()
    sharded = ShardedProductPoly.from_internal_tables(tables, mesh, n_shard=3)
    limb = sharded.tables[0].limbs[0]
    assert len(limb.sharding.device_set) == 8
