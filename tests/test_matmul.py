"""MatMul IP tests (mirrors matrix-multiplication/src/lib.rs:149-375)."""

import random

from thaler_study_tpu.fields import F5, F389, GOLDILOCKS
from thaler_study_tpu.protocols import MatMulG
from thaler_study_tpu.sumcheck import FinalRound, JthRound, Prover, SeededRng, Verifier


def _u32_to_boolean_vec(v, bits, field):
    return [field.one() if (v >> j) & 1 else field.zero() for j in range(bits)]


def _matmul(a, b, n, p):
    c = [[0] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            c[i][j] = sum(a[i][k] * b[k][j] for k in range(n)) % p
    return c


def _run(g, rng):
    """Reference-style driver: FinalRound only fires for n > 1 (with n = 1
    round 0 takes the first-round branch, as in the reference where its
    n=1 book test never executes the final assert —
    matrix-multiplication/src/lib.rs:290-300)."""
    prover = Prover(g)
    c_1 = prover.c_1()
    verifier = Verifier(g.num_vars(), g)
    verifier.set_c_1(c_1)
    r_j = g.field.one()
    accepted = g.num_vars() == 1
    for j in range(g.num_vars()):
        res = verifier.round(prover.round(r_j, j), rng)
        if isinstance(res, JthRound):
            r_j = res.r
        else:
            assert isinstance(res, FinalRound)
            accepted = res.accepted
    return c_1, accepted


def test_example_from_book():
    """2x2 example over F5 (ref example_from_book :246-303)."""
    a = [0, 1, 2, 0]
    b = [1, 0, 0, 4]
    rng = SeededRng(0)
    for i in range(2):
        for j in range(2):
            point = _u32_to_boolean_vec(i, 1, F5) + _u32_to_boolean_vec(j, 1, F5)
            g = MatMulG.new(1, a, b, point)
            c_1, accepted = _run(g, rng)
            assert accepted
            # C = A*B = [[0,4],[2,0]]
            expected = [[0, 4], [2, 0]][i][j]
            assert c_1.v == expected


def test_randomized(rng):
    """Random matrices (ref randomized_test :315-374): c_1 == C[i][j] and a
    manual sum cross-check."""
    for field in (F5, GOLDILOCKS):
        for p_log in (2, 3):
            n = 1 << p_log
            a = [[rng.randrange(field.p) for _ in range(n)] for _ in range(n)]
            b = [[rng.randrange(field.p) for _ in range(n)] for _ in range(n)]
            c = _matmul(a, b, n, field.p)
            flat_a = [x for row in a for x in row]
            flat_b = [x for row in b for x in row]
            srng = SeededRng(1)
            for i, j in [(0, 0), (n - 1, n // 2), (1, n - 1)]:
                point = _u32_to_boolean_vec(i, p_log, field) + _u32_to_boolean_vec(
                    j, p_log, field
                )
                g = MatMulG.new(p_log, flat_a, flat_b, point)
                # evaluate() sum over the cube == c_1 (ref :342-352)
                manual = field.zero()
                for z in range(n):
                    pt = _u32_to_boolean_vec(z, p_log, field)
                    manual = manual + g.evaluate(pt)
                c_1, accepted = _run(g, srng)
                assert accepted
                assert c_1.v == c[i][j]
                assert manual == c_1


def test_round_kernel_matches_reference_shape(rng):
    """g_j from the fused kernel is quadratic and satisfies the sumcheck
    invariant g(0)+g(1) == previous claim."""
    field = F389
    n = 3
    a = [rng.randrange(field.p) for _ in range(64)]
    b = [rng.randrange(field.p) for _ in range(64)]
    point = [field.felt(rng.randrange(field.p)) for _ in range(6)]
    g = MatMulG.new(n, a, b, point)
    g0, g_next = g.round_univariate(None)
    assert g0.degree() <= 2
    c_1 = g.sum_evaluations()
    assert g0.evaluate(field.zero()) + g0.evaluate(field.one()) == c_1
    r = field.felt(7)
    g1, _ = g_next.round_univariate(r)
    assert g1.evaluate(field.zero()) + g1.evaluate(field.one()) == g0.evaluate(r)
