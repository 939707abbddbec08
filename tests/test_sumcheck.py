"""Sumcheck protocol tests mirroring the reference's test strategy
(sum-check-protocol/src/lib.rs:333-522)."""

import random

import pytest

from thaler_study_tpu.fields import F5, F389
from thaler_study_tpu.sumcheck import (
    FinalRound,
    JthRound,
    Prover,
    SeededRng,
    SparseMultiPoly,
    UniPoly,
    Verifier,
    interpolate_at_small_points,
)


def test_fix_variables_basic():
    """Reference basic_test (sum-check-protocol/src/lib.rs:383-416):
    2*x1*x2 + 3*x1^2*x2^2 fixed at x1=2 over F5 -> 4*x1 + 2*x1^2."""
    poly = SparseMultiPoly(
        2,
        [(F5.felt(2), [(0, 1), (1, 1)]), (F5.felt(3), [(0, 2), (1, 2)])],
        F5,
    )
    res = poly.fix_variables([F5.felt(2)])
    expected = SparseMultiPoly(
        1, [(F5.felt(4), [(0, 1)]), (F5.felt(2), [(0, 2)])], F5
    )
    assert res == expected


def _run_protocol(g, rng, expect_accept=True):
    prover = Prover(g)
    c_1 = prover.c_1()
    verifier = Verifier(g.num_vars(), g)
    verifier.set_c_1(c_1)
    r_j = g.field.one()
    for j in range(g.num_vars()):
        g_j = prover.round(r_j, j)
        res = verifier.round(g_j, rng)
        if isinstance(res, JthRound):
            r_j = res.r
        else:
            assert isinstance(res, FinalRound)
            assert res.accepted == expect_accept
            return
    raise AssertionError("protocol did not reach the final round")


def test_from_book():
    """g = 2*x1^3 + x1*x3 + x2*x3 over F5 (ref test_from_book :418-459)."""
    g = SparseMultiPoly(
        3,
        [
            (F5.felt(2), [(0, 3)]),
            (F5.felt(1), [(0, 1), (2, 1)]),
            (F5.felt(1), [(1, 1), (2, 1)]),
        ],
        F5,
    )
    # book check: C_1 = 12 mod 5 = 2
    prover = Prover(g)
    assert prover.c_1() == F5.felt(12)
    _run_protocol(g, SeededRng(0))


def _rand_poly(l, d, field, rng):
    """Random l-variate poly of max individual degree d (ref rand_poly
    :357-381)."""
    terms = [(field.felt(rng.randrange(field.p)), [])]
    for _ in range(rng.randrange(1, 60)):
        vps = [
            (i, rng.randrange(1, d + 1)) for i in range(l) if rng.random() < 0.5
        ]
        terms.append((field.felt(rng.randrange(field.p)), vps))
    return SparseMultiPoly(l, terms, field)


def test_protocol_randomized():
    """Reference protocol_test (:494-521): n in 2..10, degree 3."""
    rng = random.Random(17)
    for n in range(2, 8):
        g = _rand_poly(n, 3, F5, rng)
        _run_protocol(g, SeededRng(n))


def test_c1_matches_brute_force():
    rng = random.Random(3)
    g = _rand_poly(4, 3, F389, rng)
    brute = F389.zero()
    for evaluation in g.to_evaluations():
        brute = brute + evaluation
    assert Prover(g).c_1() == brute


def test_cheating_prover_detected():
    """A corrupted c_1 must be rejected in round 0 (ref :284-297)."""
    from thaler_study_tpu.sumcheck import ProverClaimMismatch

    g = SparseMultiPoly(
        2, [(F5.felt(3), [(0, 1)]), (F5.felt(2), [(1, 1)])], F5
    )
    prover = Prover(g)
    verifier = Verifier(2, g)
    verifier.set_c_1(prover.c_1() + F5.one())  # lie
    g_0 = prover.round(F5.one(), 0)
    with pytest.raises(ProverClaimMismatch):
        verifier.round(g_0, SeededRng(0))


def test_unipoly_interpolation_roundtrip():
    field = F389
    rng = random.Random(5)
    coeffs = [field.felt(rng.randrange(field.p)) for _ in range(4)]
    p = UniPoly.from_coeffs(coeffs, field)
    values = [p.evaluate(field.felt(t)) for t in range(4)]
    assert interpolate_at_small_points(values, field) == p
    # interpolating on a larger domain gives the same (sparse) coefficients
    values5 = [p.evaluate(field.felt(t)) for t in range(6)]
    from thaler_study_tpu.sumcheck import lagrange_interpolate

    pts = [(field.felt(t), v) for t, v in enumerate(values5)]
    assert lagrange_interpolate(pts, field) == p
