"""MLE layer tests: golden vectors from the reference + randomized checks."""

import random

import numpy as np
import pytest

from thaler_study_tpu.fields import F5, F389, GOLDILOCKS, FArray, Felt
from thaler_study_tpu.mle import (
    DenseMLE,
    bitrev_perm,
    cti_multilinear_from_evaluations,
    vsbw_multilinear_from_evaluations,
)


def test_book_table_both_algorithms():
    """The 5x5 extension table of evals [1,2,1,4] over F5 — the reference's
    golden test (multilinear-extensions/src/lib.rs:76-120)."""
    evals = F5.felts([1, 2, 1, 4])
    expected = [
        [1, 2, 3, 4, 0],
        [1, 4, 2, 0, 3],
        [1, 1, 1, 1, 1],
        [1, 3, 0, 2, 4],
        [1, 0, 4, 3, 2],
    ]
    for i in range(5):
        for j in range(5):
            r = [F5.felt(i), F5.felt(j)]
            assert vsbw_multilinear_from_evaluations(evals, r).v == expected[i][j]
            assert cti_multilinear_from_evaluations(evals, r).v == expected[i][j]


def _brute_mle_eval(evals_lsb, point):
    """Exact MLE evaluation, arkworks little-endian convention, host ints."""
    field = point[0].field
    n = len(point)
    acc = field.zero()
    one = field.one()
    for i, ev in enumerate(evals_lsb):
        w = one
        for j in range(n):
            bit = (i >> j) & 1
            w = w * (point[j] if bit else (one - point[j]))
        acc = acc + ev * w
    return acc


@pytest.mark.parametrize("field", [F389, GOLDILOCKS], ids=lambda f: f.name)
def test_dense_mle_evaluate_matches_brute(field, rng):
    for n in (1, 2, 3, 5):
        evals = [field.felt(rng.randrange(field.p)) for _ in range(1 << n)]
        point = [field.felt(rng.randrange(field.p)) for _ in range(n)]
        mle = DenseMLE.from_evals_lsb(evals, n, field)
        assert mle.evaluate(point) == _brute_mle_eval(evals, point)


def test_fix_variables_matches_reference_semantics(rng):
    """fix_variables folds the low-index variables first (arkworks pairs)."""
    field = F389
    n = 4
    evals = [field.felt(rng.randrange(field.p)) for _ in range(1 << n)]
    r = field.felt(rng.randrange(field.p))
    mle = DenseMLE.from_evals_lsb(evals, n, field)
    fixed = mle.fix_variables([r])
    # arkworks: new[i] = old[2i] + r*(old[2i+1] - old[2i])
    want = [evals[2 * i] + r * (evals[2 * i + 1] - evals[2 * i]) for i in range(8)]
    assert fixed.to_evaluations() == want
    # multi-variable fix == sequential fixes
    r2 = field.felt(rng.randrange(field.p))
    assert mle.fix_variables([r, r2]).to_evaluations() == fixed.fix_variables(
        [r2]
    ).to_evaluations()


def test_to_evaluations_roundtrip(rng):
    field = F389
    n = 5
    evals = [field.felt(rng.randrange(field.p)) for _ in range(1 << n)]
    mle = DenseMLE.from_evals_lsb(evals, n, field)
    assert mle.to_evaluations() == evals
    assert mle.sum() == sum(evals, field.zero())


def test_relabel_matmul_style(rng):
    """relabel(0, n, n) swaps the two variable halves (matmul IP usage,
    matrix-multiplication/src/lib.rs:82)."""
    field = F389
    n = 2  # 2n = 4 variables
    evals = [field.felt(rng.randrange(field.p)) for _ in range(1 << (2 * n))]
    mle = DenseMLE.from_evals_lsb(evals, 2 * n, field)
    swapped = mle.relabel(0, n, n)
    point = [field.felt(rng.randrange(field.p)) for _ in range(2 * n)]
    swapped_point = point[n:] + point[:n]
    assert swapped.evaluate(point) == mle.evaluate(swapped_point)


def test_bitrev_perm_involution():
    for n in (0, 1, 3, 6):
        p = bitrev_perm(n)
        assert (p[p] == np.arange(1 << n)).all()
