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

# GSPMD-compile-bound file: whole-proof/sharded program compiles dominate
# its runtime on a cold cache. Excluded from the default tier (pyproject
# addopts); run with `pytest -m heavy`. tests/test_sharded_smoke.py keeps
# a fast mesh-coverage smoke in the default tier.
pytestmark = pytest.mark.heavy



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


# ---------------------------------------------------------------------------
# Multi-block sharding (ShardedBlockPoly, VERDICT r1 next-round #5)
# ---------------------------------------------------------------------------


def test_triangle_sharded_transcript_equals_local(rng):
    """TriangleG (3 blocks X, Y, Z) sharded on Z across the 8-device mesh:
    byte-identical FS transcript vs the local prover."""
    from thaler_study_tpu.parallel import ShardedBlockPoly
    from thaler_study_tpu.protocols import TriangleG

    field = F1572869
    n = 8  # nodes -> k = 3 vars/block, 9 total
    adj = [[False] * n for _ in range(n)]
    for x in range(n):
        for y in range(x + 1, n):
            v = rng.random() < 0.5
            adj[x][y] = adj[y][x] = v
    g = TriangleG.new_adj_matrix(6, [x for row in adj for x in row], field)
    mesh = make_mesh()
    sharded = ShardedBlockPoly.from_internal_tables(
        g.spec, g.tables, mesh, n_shard=3
    )
    assert sharded.num_vars() == 9
    # table 0 covers (X, Y): replicated; tables 1, 2 cover Z: sharded
    assert sharded.has_shard == (False, True, True)
    assert len(sharded.tables[1].limbs[0].sharding.device_set) == 8

    t_local = generate_transcript(
        SumcheckInteractiveProver(
            Prover(TriangleG.new_adj_matrix(6, [x for row in adj for x in row], field))
        ),
        field,
    )
    t_sharded = generate_transcript(
        SumcheckInteractiveProver(Prover(sharded)), field
    )
    assert t_local.to_bytes() == t_sharded.to_bytes()


def test_dense_w_sharded_transcript_equals_local(rng):
    """The dense-W GKR round polynomial (blocks b, c) sharded on c:
    byte-identical FS transcript vs local, including the scalar-free
    multi-term spec add*Wb + add*Wc + mul*Wb*Wc."""
    from thaler_study_tpu.gkr import W
    from thaler_study_tpu.mle.dense import DenseMLE
    from thaler_study_tpu.parallel import ShardedBlockPoly

    field = GOLDILOCKS
    k = 3

    def tbl(nv):
        return DenseMLE.from_evals_lsb(
            [rng.randrange(field.p) for _ in range(1 << nv)], nv, field
        )

    add_i, mul_i, w_b = tbl(2 * k), tbl(2 * k), tbl(k)
    local = W.new(add_i, mul_i, w_b, w_b)
    mesh = make_mesh()
    sharded = ShardedBlockPoly.from_internal_tables(
        local.spec, local.tables, mesh, n_shard=3
    )
    # add, mul, w_c contain block c (last): sharded; w_b replicated
    assert sharded.has_shard == (True, True, False, True)

    t_local = generate_transcript(
        SumcheckInteractiveProver(Prover(W.new(add_i, mul_i, w_b, w_b))),
        field,
    )
    t_sharded = generate_transcript(
        SumcheckInteractiveProver(Prover(sharded)), field
    )
    assert t_local.to_bytes() == t_sharded.to_bytes()


def test_sharded_block_oracle_and_c1(rng):
    """c_1 and full-point oracle evaluation agree with the local poly; the
    interactive verifier with a sharded oracle accepts."""
    from thaler_study_tpu.parallel import ShardedBlockPoly
    from thaler_study_tpu.protocols import TriangleG
    from thaler_study_tpu.sumcheck import (
        FinalRound,
        JthRound,
        SeededRng,
        Verifier,
    )

    field = F1572869
    n = 4
    adj = [[False] * n for _ in range(n)]
    for x in range(n):
        for y in range(x + 1, n):
            v = rng.random() < 0.6
            adj[x][y] = adj[y][x] = v
    g = TriangleG.new_adj_matrix(4, [x for row in adj for x in row], field)
    mesh2 = make_mesh(jax.devices()[:4])
    sharded = ShardedBlockPoly.from_internal_tables(
        g.spec, g.tables, mesh2, n_shard=2
    )
    assert sharded.sum_evaluations() == g.sum_evaluations()
    pt = [field.felt(rng.randrange(field.p)) for _ in range(6)]
    assert sharded.evaluate(pt) == g.evaluate(pt)

    prover = Prover(
        ShardedBlockPoly.from_internal_tables(g.spec, g.tables, mesh2, n_shard=2)
    )
    verifier = Verifier(6, sharded)
    verifier.set_c_1(prover.c_1())
    r_j = field.one()
    srng = SeededRng(3)
    accepted = None
    for j in range(6):
        res = verifier.round(prover.round(r_j, j), srng)
        if isinstance(res, JthRound):
            r_j = res.r
        else:
            assert isinstance(res, FinalRound)
            accepted = res.accepted
    assert accepted is True


def test_sharded_block_fix_variables_matches_local(rng):
    """The fold-only resume path crosses the gather boundary correctly."""
    from thaler_study_tpu.parallel import ShardedBlockPoly
    from thaler_study_tpu.protocols import TriangleG

    field = F1572869
    n = 4
    adj = [[rng.random() < 0.5 for _ in range(n)] for _ in range(n)]
    g = TriangleG.new_adj_matrix(4, [x for row in adj for x in row], field)
    mesh2 = make_mesh(jax.devices()[:4])
    sharded = ShardedBlockPoly.from_internal_tables(
        g.spec, g.tables, mesh2, n_shard=2
    )
    rs = [field.felt(rng.randrange(field.p)) for _ in range(5)]
    lp = g.fix_variables(rs)
    sp = sharded.fix_variables(rs)
    # one variable remains; next round message must agree
    lu, _ = lp.round_univariate(None)
    su, _ = sp.round_univariate(None)
    assert lu == su


def test_triangle_sharded_contraction_transcript(rng, monkeypatch):
    """ROADMAP r2 #3: with the contraction threshold forced low, the sharded
    triangle X-phase runs the per-shard batched modmatmul + all-reduce path
    and the FS transcript stays byte-identical to the local prover (which
    itself is anchored to 6*#triangles by sum_evaluations)."""
    import numpy as np

    from thaler_study_tpu.ops import round_kernel
    from thaler_study_tpu.parallel import ShardedBlockPoly
    from thaler_study_tpu.parallel import sharded as sharded_mod
    from thaler_study_tpu.protocols import TriangleG

    field = GOLDILOCKS
    n = 16  # 4 vars/block, 12 total
    adj = [[False] * n for _ in range(n)]
    for x in range(n):
        for y in range(x + 1, n):
            v = rng.random() < 0.5
            adj[x][y] = adj[y][x] = v
    flat = [x for row in adj for x in row]

    for cache in (
        round_kernel._round_step_jit,
        round_kernel._sum_products_jit,
        sharded_mod._mb_round_jit,
        sharded_mod._mb_c1_jit,
    ):
        cache.cache_clear()
    monkeypatch.setattr(round_kernel, "_CONTRACT_THRESHOLD", 8)

    g = TriangleG.new_adj_matrix(8, flat, field)
    a_np = np.array(adj, dtype=np.int64)
    tri6 = int(np.trace(a_np @ a_np @ a_np))
    assert g.sum_evaluations().v == tri6 % field.p

    mesh = make_mesh()
    sharded = ShardedBlockPoly.from_internal_tables(
        g.spec, g.tables, mesh, n_shard=3
    )
    t_local = generate_transcript(
        SumcheckInteractiveProver(
            Prover(TriangleG.new_adj_matrix(8, flat, field))
        ),
        field,
    )
    t_sharded = generate_transcript(
        SumcheckInteractiveProver(Prover(sharded)), field
    )
    assert t_local.to_bytes() == t_sharded.to_bytes()

    for cache in (
        round_kernel._round_step_jit,
        round_kernel._sum_products_jit,
        sharded_mod._mb_round_jit,
        sharded_mod._mb_c1_jit,
    ):
        cache.cache_clear()
