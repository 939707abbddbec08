"""Triangle-counting IP tests (mirrors triangle-counting/src/lib.rs:174-318)."""

import random

from thaler_study_tpu.fields import F389, F1572869
from thaler_study_tpu.protocols import TriangleG
from thaler_study_tpu.sumcheck import FinalRound, JthRound, Prover, SeededRng, Verifier


def _run(g, rng):
    prover = Prover(g)
    c_1 = prover.c_1()
    verifier = Verifier(g.num_vars(), g)
    verifier.set_c_1(c_1)
    r_j = g.field.one()
    final = None
    for j in range(g.num_vars()):
        res = verifier.round(prover.round(r_j, j), rng)
        if isinstance(res, JthRound):
            r_j = res.r
        else:
            assert isinstance(res, FinalRound)
            final = res.accepted
    return c_1, final


def _triangle_count_6x(adj, n):
    count = 0
    for x in range(n):
        for y in range(n):
            for z in range(n):
                if adj[x][y] and adj[y][z] and adj[x][z]:
                    count += 1
    return count  # = 6 * triangles


def test_simple_matrix():
    """The reference's fixed 4-node graph with one triangle over F389
    (triangle-counting/src/lib.rs:224-266)."""
    adj = [
        [False, True, True, False],
        [True, False, True, False],
        [True, True, False, False],
        [False, False, False, False],
    ]
    g = TriangleG.new_adj_matrix(4, [x for row in adj for x in row], F389)
    assert g.num_vars() == 6
    c_1, accepted = _run(g, SeededRng(0))
    assert accepted is True
    assert c_1.v == 6  # one triangle -> 6Delta = 6


def test_randomized(rng):
    """Random symmetric graphs, c_1 == 6 * brute-force count over F1572869
    (ref randomized_test :268-318)."""
    field = F1572869
    for i in (1, 2, 3):
        n = 1 << i
        adj = [[False] * n for _ in range(n)]
        for x in range(n):
            for y in range(x + 1, n):
                v = rng.random() < 0.5
                adj[x][y] = adj[y][x] = v
        g = TriangleG.new_adj_matrix(
            2 * i, [x for row in adj for x in row], field
        )
        c_1, accepted = _run(g, SeededRng(i))
        assert c_1.v == _triangle_count_6x(adj, n)
        if g.num_vars() > 1:
            assert accepted is True


def test_block_transitions(rng):
    """Folding across X->Y->Z block boundaries keeps the sumcheck invariant
    g_{j-1}(r) == g_j(0) + g_j(1) at every round."""
    field = F389
    n = 4
    adj = [[False] * n for _ in range(n)]
    for x in range(n):
        for y in range(x + 1, n):
            v = rng.random() < 0.6
            adj[x][y] = adj[y][x] = v
    g = TriangleG.new_adj_matrix(4, [x for row in adj for x in row], field)
    c_1 = g.sum_evaluations()
    prev_poly, cur = None, g
    prev_r = None
    claims = [c_1]
    for j in range(g.num_vars()):
        uni, cur = cur.round_univariate(prev_r)
        assert uni.evaluate(field.zero()) + uni.evaluate(field.one()) == claims[-1]
        prev_r = field.felt(rng.randrange(field.p))
        claims.append(uni.evaluate(prev_r))
    # final claim == g evaluated at all the r's
    rs = []  # replay: we did not record r's; rerun explicitly
    cur = g
    prev_r = None
    claim = c_1
    rng2 = random.Random(99)
    for j in range(g.num_vars()):
        uni, cur = cur.round_univariate(prev_r)
        assert uni.evaluate(field.zero()) + uni.evaluate(field.one()) == claim
        prev_r = field.felt(rng2.randrange(field.p))
        rs.append(prev_r)
        claim = uni.evaluate(prev_r)
    assert g.evaluate(rs) == claim
