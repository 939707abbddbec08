"""Multi-host scaffolding on the virtual 8-device CPU mesh: 2-axis
(DCN x ICI) meshes of every shape produce byte-identical transcripts
(VERDICT r1 next-round #6). Real multi-host scaling cannot be measured in
this container (one chip); these tests validate the complete code path."""

import jax
import pytest

from thaler_study_tpu.fields import GOLDILOCKS, F1572869
from thaler_study_tpu.fiat_shamir import (
    SumcheckInteractiveProver,
    generate_transcript,
)
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.ops.round_kernel import PolySpec
from thaler_study_tpu.parallel import (
    DCN_AXIS,
    ICI_AXIS,
    ShardedBlockPoly,
    ShardedProductPoly,
    make_mesh_2d,
)
from thaler_study_tpu.protocols import ProductPoly, TriangleG
from thaler_study_tpu.sumcheck import Prover

# GSPMD-compile-bound file: whole-proof/sharded program compiles dominate
# its runtime on a cold cache. Excluded from the default tier (pyproject
# addopts); run with `pytest -m heavy`. tests/test_sharded_smoke.py keeps
# a fast mesh-coverage smoke in the default tier.
pytestmark = pytest.mark.heavy



def _tables(field, n, k, rng):
    return [
        DenseMLE.from_evals_lsb(
            [rng.randrange(field.p) for _ in range(1 << n)], n, field
        ).evals
        for _ in range(k)
    ]


def test_make_mesh_2d_shapes():
    for dcn in (1, 2, 4, 8):
        mesh = make_mesh_2d(dcn_size=dcn)
        assert mesh.axis_names == (DCN_AXIS, ICI_AXIS)
        assert mesh.devices.shape == (dcn, 8 // dcn)


@pytest.mark.parametrize("dcn", [1, 2, 8], ids=["1x8", "2x4", "8x1"])
def test_transcript_identical_across_mesh_shapes(dcn, rng):
    """The same proof over 1x8, 2x4 and 8x1 (dcn, ici) meshes, and over no
    mesh at all, is byte-identical — mesh shape must be unobservable."""
    field = GOLDILOCKS
    n, k = 6, 2
    tables = _tables(field, n, k, rng)
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    t_local = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    mesh = make_mesh_2d(dcn_size=dcn)
    poly = ShardedBlockPoly.from_internal_tables(spec, tables, mesh, n_shard=3)
    t_mesh = generate_transcript(
        SumcheckInteractiveProver(Prover(poly)), field
    )
    assert t_mesh.to_bytes() == t_local.to_bytes()
    # the sharded tables really span all 8 devices
    assert len(poly.tables[0].limbs[0].sharding.device_set) == 8


def test_single_block_class_on_2d_mesh(rng):
    """ShardedProductPoly also accepts the 2-axis mesh (composite sharding
    over ('dcn','ici'))."""
    field = F1572869
    n, k = 6, 2
    tables = _tables(field, n, k, rng)
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    t_local = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    mesh = make_mesh_2d(dcn_size=2)
    sharded = ShardedProductPoly.from_internal_tables(tables, mesh, n_shard=3)
    t_mesh = generate_transcript(
        SumcheckInteractiveProver(Prover(sharded)), field
    )
    assert t_mesh.to_bytes() == t_local.to_bytes()


def test_triangle_on_2d_mesh(rng):
    """Multi-block (X, Y, Z) spec over a 2x4 mesh."""
    field = F1572869
    n = 8
    adj = [[False] * n for _ in range(n)]
    for x in range(n):
        for y in range(x + 1, n):
            adj[x][y] = adj[y][x] = rng.random() < 0.5
    flat = [v for row in adj for v in row]
    g = TriangleG.new_adj_matrix(6, flat, field)
    t_local = generate_transcript(
        SumcheckInteractiveProver(
            Prover(TriangleG.new_adj_matrix(6, flat, field))
        ),
        field,
    )
    mesh = make_mesh_2d(dcn_size=2)
    poly = ShardedBlockPoly.from_internal_tables(
        g.spec, g.tables, mesh, n_shard=3
    )
    t_mesh = generate_transcript(
        SumcheckInteractiveProver(Prover(poly)), field
    )
    assert t_mesh.to_bytes() == t_local.to_bytes()


@pytest.mark.parametrize(
    "dcn",
    [
        1,
        # one mesh shape in the default tier is the composition smoke test;
        # the other shapes recompile the whole GSPMD program (minutes each)
        pytest.param(2, marks=pytest.mark.slow),
        pytest.param(8, marks=pytest.mark.slow),
    ],
    ids=["1x8", "2x4", "8x1"],
)
def test_fused_sharded_transcript_identical(dcn, rng):
    """The FUSED whole-proof kernel under mesh sharding: one GSPMD device
    program across every mesh shape, byte-identical to the host loop and
    to the unsharded fused kernel (VERDICT r2 next-round #1)."""
    from thaler_study_tpu.ops.fs_kernel import (
        fs_prove_device,
        fs_prove_device_sharded,
    )

    field = GOLDILOCKS
    n, k = 6, 2
    tables = _tables(field, n, k, rng)
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    host = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    unsharded = fs_prove_device(spec, tables)
    mesh = make_mesh_2d(dcn_size=dcn)
    sharded = fs_prove_device_sharded(spec, tables, mesh, n_shard=3)
    assert sharded is not None and unsharded is not None
    assert [m.hex() for m in sharded] == [m.hex() for m in host.g]
    assert sharded == unsharded


def test_fused_sharded_mont32_transcript(rng):
    """mont32 fields through the sharded fused kernel (the Montgomery-
    domain tables and big-endian Horner hash-to-field lift must survive
    GSPMD partitioning unchanged): byte-identical to the host loop."""
    from thaler_study_tpu.ops.fs_kernel import fs_prove_device_sharded
    from thaler_study_tpu.parallel import make_mesh

    field = F1572869
    n, k = 5, 2
    tables = _tables(field, n, k, rng)
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    host = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    sharded = fs_prove_device_sharded(spec, tables, make_mesh(), n_shard=3)
    assert sharded is not None
    assert [m.hex() for m in sharded] == [m.hex() for m in host.g]


def test_fused_sharded_triangle_transcript(rng):
    """Multi-block (triangle) spec through the sharded fused kernel: the
    trailing Z variables shard over the mesh; transcript byte-identical."""
    from thaler_study_tpu.ops.fs_kernel import fs_prove_device_sharded
    from thaler_study_tpu.parallel import make_mesh

    field = GOLDILOCKS
    k = 3
    size = 1 << k
    matrix = [rng.randrange(2) for _ in range(size * size)]
    for i in range(size):
        matrix[i * size + i] = 0
    g = TriangleG.new_adj_matrix(2 * k, matrix, field)
    host = generate_transcript(
        SumcheckInteractiveProver(
            Prover(TriangleG.new_adj_matrix(2 * k, matrix, field))
        ),
        field,
    )
    mesh = make_mesh()
    sharded = fs_prove_device_sharded(g.spec, g.tables, mesh, n_shard=3)
    assert sharded is not None
    assert [m.hex() for m in sharded] == [m.hex() for m in host.g]


@pytest.mark.slow  # ~6 fresh GSPMD whole-proof compiles
def test_fused_sharded_random_specs(rng):
    """Property fuzz: random multi-block PolySpecs through the sharded
    fused kernel vs the exact host loop (the sharded analogue of
    tests/test_round_kernel_fuzz.py). Fixed seed so the compile cache
    holds across runs."""
    import random as _random

    from thaler_study_tpu.ops.fs_kernel import (
        fs_prove_device_sharded,
        supports_fused_fs,
    )
    from thaler_study_tpu.parallel import make_mesh

    field = GOLDILOCKS
    srng = _random.Random(777)
    mesh = make_mesh()
    ran = 0
    for _ in range(10):
        if ran >= 5:
            break
        nblocks = srng.choice([1, 2, 3])
        sizes = [srng.randint(1, 2) for _ in range(nblocks)]
        sizes[-1] = srng.randint(3, 4)  # last block shards over the mesh
        ntables = srng.randint(1, 3)
        table_blocks = []
        for _ in range(ntables):
            cover = sorted(srng.sample(range(nblocks), srng.randint(1, nblocks)))
            table_blocks.append(tuple(cover))
        covered = set().union(*map(set, table_blocks))
        for b in range(nblocks):
            if b not in covered:
                table_blocks[0] = tuple(sorted(set(table_blocks[0]) | {b}))
        terms = tuple(
            tuple(sorted(srng.sample(range(ntables), srng.randint(1, ntables))))
            for _ in range(srng.randint(1, 2))
        )
        spec = PolySpec(tuple(sizes), tuple(table_blocks), terms)
        if not supports_fused_fs(spec, field, b""):
            continue
        tables = [
            _tables(field, sum(sizes[b] for b in tb), 1, rng)[0]
            for tb in table_blocks
        ]
        host = generate_transcript(
            SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))),
            field,
        )
        sharded = fs_prove_device_sharded(spec, tables, mesh, n_shard=3)
        if sharded is None:  # zero-coefficient fallback: the host loop IS it
            continue
        assert [m.hex() for m in sharded] == [m.hex() for m in host.g], spec
        ran += 1
    assert ran >= 3, "fuzz exercised too few supported specs"


def test_fused_sharded_full_shard(rng):
    """Edge case: EVERY variable of the last block sharded (no local Z
    columns) still produces the byte-identical transcript."""
    from thaler_study_tpu.ops.fs_kernel import fs_prove_device_sharded
    from thaler_study_tpu.parallel import make_mesh

    field = GOLDILOCKS
    n, k = 3, 2
    tables = _tables(field, n, k, rng)
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    host = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    sharded = fs_prove_device_sharded(spec, tables, make_mesh(), n_shard=3)
    assert sharded is not None
    assert [m.hex() for m in sharded] == [m.hex() for m in host.g]


def test_sharded_fused_collective_contract(rng):
    """HLO-level proof of the sharded fused kernel's communication claim
    (ops/fs_kernel.py mesh section; VERDICT r3 #4): in the compiled
    8-device program,

    - each sharded round's ONLY collective is one all-reduce whose payload
      is the round sums' scalar lane partials (a handful of u32 scalars);
    - the ONLY all-gathers are the tail transition's replication of the
      residual [2^n_shard] tables (#tables x #limbs of them);
    - there are NO all-to-alls and NO collective-permutes (the failure
      mode this pins down: a pairwise modular sum tree over the sharded
      axis lowers to one scalar permute chain per level — 258 collectives
      for this exact program before sum_mod(force_lanes=True));
    - no collective moves table-sized data (a silent GSPMD reshard of the
      [2^n_shard, 2^local] factor tables would be invisible to every
      byte-identity test).
    """
    import re

    from thaler_study_tpu.ops.fs_kernel import _fs_prove_sharded_jit
    from thaler_study_tpu.fields import FArray
    from thaler_study_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    field = GOLDILOCKS
    n, k, n_shard = 8, 2, 3
    tables = _tables(field, n, k, rng)
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    mesh = make_mesh()
    shard_spec = NamedSharding(mesh, P(tuple(mesh.axis_names), None))
    sharded = []
    for t in tables:
        limbs = tuple(
            jax.device_put(
                l.reshape(1 << (n - n_shard), 1 << n_shard).T, shard_spec
            )
            for l in t.limbs
        )
        sharded.append(FArray(limbs, field))
    fn = _fs_prove_sharded_jit(spec, n_shard, field, mesh)
    hlo = fn.lower(tuple(sharded)).compile().as_text()

    assert " all-to-all(" not in hlo
    assert " collective-permute(" not in hlo
    assert " reduce-scatter(" not in hlo

    # one all-reduce per sharded round (n - n_shard of them), each moving
    # only u32[] / u32[1] scalars (possibly tupled by XLA)
    ar_lines = [l for l in hlo.splitlines() if " all-reduce(" in l]
    assert len(ar_lines) == n - n_shard, ar_lines
    for line in ar_lines:
        result_ty = line.split(" all-reduce(")[0].split(" = ")[1]
        for dims in re.findall(r"u32\[([\d,]*)\]", result_ty):
            elems = 1
            for d in filter(None, dims.split(",")):
                elems *= int(d)
            assert elems <= 4, (elems, line)

    # all-gathers: exactly the tail transition's #tables x #limbs
    # replications of the residual [2^n_shard] columns
    ag_lines = [l for l in hlo.splitlines() if " all-gather(" in l]
    assert len(ag_lines) == k * len(tables[0].limbs), ag_lines
    for line in ag_lines:
        result_ty = line.split(" all-gather(")[0].split(" = ")[1]
        dims = re.search(r"u32\[([\d,]*)\]", result_ty).group(1)
        elems = 1
        for d in filter(None, dims.split(",")):
            elems *= int(d)
        assert elems <= 1 << n_shard, (elems, line)
