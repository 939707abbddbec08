"""Differential tests: Pallas fused round kernel vs the XLA path.

Runs in interpreter mode on the CPU test mesh; the kernel body is the same
jnp limb arithmetic either way, so results must match bit-for-bit.
"""

import random

import numpy as np
import pytest

from thaler_study_tpu.fields import F1572869, GOLDILOCKS, FArray
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.ops import round_kernel
from thaler_study_tpu.ops import pallas_round
from thaler_study_tpu.ops.round_kernel import PolySpec

# GSPMD-compile-bound file: whole-proof/sharded program compiles dominate
# its runtime on a cold cache. Excluded from the default tier (pyproject
# addopts); run with `pytest -m heavy`. tests/test_sharded_smoke.py keeps
# a fast mesh-coverage smoke in the default tier.
pytestmark = pytest.mark.heavy



@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_round.INTERPRET = True
    pallas_round._build_call.cache_clear()
    yield
    pallas_round.INTERPRET = False
    pallas_round._build_call.cache_clear()


# goldilocks is validated on the real TPU (interpret-mode XLA-CPU compiles
# of the 2-limb kernel are pathologically slow); mont32 covers the kernel
# structure differentially here
@pytest.mark.parametrize("field", [F1572869], ids=lambda f: f.name)
@pytest.mark.parametrize("k", [2, 3])
def test_pallas_matches_xla_round(field, k, rng):
    n = 12  # above MIN_VARS so the pallas path engages
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    tables = []
    for _ in range(k):
        evals = np.array(
            [rng.randrange(field.p) for _ in range(1 << n)], dtype=np.uint64
        )
        tables.append(DenseMLE.from_evals_lsb(evals, n, field).evals)
    r = FArray.scalar(field.felt(rng.randrange(field.p)))

    assert pallas_round.supports(spec, field, 1 << n)
    sums_p, folded_p = pallas_round.pallas_round_step(spec, tables, r)

    sums_x, folded_x = round_kernel.round_step(spec, tables, r)

    assert [int(v) for v in sums_p.to_ints()] == [
        int(v) for v in sums_x.to_ints()
    ]
    for fp, fx in zip(folded_p, folded_x):
        assert (np.asarray(fp.to_ints()) == np.asarray(fx.to_ints())).all()


def test_supports_rejects_unsuitable():
    spec_multi = PolySpec(
        block_sizes=(3, 3), table_blocks=((0, 1), (0,)), terms=((0, 1),)
    )
    assert not pallas_round.supports(spec_multi, GOLDILOCKS, 1 << 13)
    spec_small = PolySpec(block_sizes=(4,), table_blocks=((0,), (0,)), terms=((0, 1),))
    assert not pallas_round.supports(spec_small, GOLDILOCKS, 1 << 4)


@pytest.mark.parametrize("field", [F1572869], ids=lambda f: f.name)
def test_pallas_claim_shortcut_bit_identical(field, rng):
    """The claim-shortcut kernel (t = 1 product pass skipped, s(1) filled
    as claim - s(0)) returns bit-identical sums and folded tables."""
    n, k = 12, 2
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    tables = []
    for _ in range(k):
        evals = np.array(
            [rng.randrange(field.p) for _ in range(1 << n)], dtype=np.uint64
        )
        tables.append(DenseMLE.from_evals_lsb(evals, n, field).evals)
    r = FArray.scalar(field.felt(rng.randrange(field.p)))

    sums_ref, folded_ref = pallas_round.pallas_round_step(spec, tables, r)
    felts = sums_ref.to_felts()
    claim = FArray.scalar(felts[0] + felts[1])  # the true round claim

    sums_c, folded_c = pallas_round.pallas_round_step(
        spec, tables, r, claim=claim
    )
    assert [int(v) for v in sums_c.to_ints()] == [
        int(v) for v in sums_ref.to_ints()
    ]
    for fc, fr in zip(folded_c, folded_ref):
        assert (np.asarray(fc.to_ints()) == np.asarray(fr.to_ints())).all()


def test_pallas_tile_sizes_bit_identical(rng):
    """Every tile size (set_tile_log; the grid-step/VMEM trade) produces
    bit-identical sums and folded tables — the tile only re-chunks the
    grid, so flipping the default after measurement can never change a
    transcript byte. n = 12: quarter = 2^10, so tile_log 13+ clamps to
    one tile and 10 exercises multi-tile accumulation."""
    field = F1572869
    n = 12
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=((0,), (0,)),
        terms=((0, 1),),
    )
    tables = []
    for _ in range(2):
        evals = np.array(
            [rng.randrange(field.p) for _ in range(1 << n)], dtype=np.uint64
        )
        tables.append(DenseMLE.from_evals_lsb(evals, n, field).evals)
    r = FArray.scalar(field.felt(rng.randrange(field.p)))

    results = []
    prev = pallas_round._TILE_LOG[0]
    try:
        for tl in (10, 13, 15):
            pallas_round.set_tile_log(tl)
            pallas_round._build_call.cache_clear()
            pallas_round._build_call_jit.cache_clear()
            sums, folded = pallas_round.pallas_round_step(spec, tables, r)
            results.append(
                (
                    [int(v) for v in sums.to_ints()],
                    [np.asarray(f.to_ints()) for f in folded],
                )
            )
    finally:
        pallas_round.set_tile_log(prev)
        pallas_round._build_call.cache_clear()
        pallas_round._build_call_jit.cache_clear()
    for sums_i, folded_i in results[1:]:
        assert sums_i == results[0][0]
        for fa_, fb_ in zip(folded_i, results[0][1]):
            assert (fa_ == fb_).all()
