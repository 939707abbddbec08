"""Modular matmul contraction: exactness + triangle-kernel equivalence."""

import random

import numpy as np

from thaler_study_tpu.fields import F1572869, GOLDILOCKS, FArray
from thaler_study_tpu.ops import round_kernel
from thaler_study_tpu.ops.modmatmul import modmatmul
from thaler_study_tpu.protocols import TriangleG
from thaler_study_tpu.sumcheck import Prover, SeededRng, Verifier, JthRound, FinalRound


def test_modmatmul_exact(rng):
    for field in (F1572869, GOLDILOCKS):
        m, n, k = 8, 4, 16
        a_vals = [[rng.randrange(field.p) for _ in range(k)] for _ in range(m)]
        b_vals = [[rng.randrange(field.p) for _ in range(k)] for _ in range(n)]
        a = FArray.from_ints(np.array(a_vals, dtype=object), field)
        b = FArray.from_ints(np.array(b_vals, dtype=object), field)
        c = modmatmul(a, b).to_ints()
        for i in range(m):
            for j in range(n):
                want = (
                    sum(a_vals[i][t] * b_vals[j][t] for t in range(k)) % field.p
                )
                assert int(c[i][j]) == want


def test_triangle_contraction_matches_broadcast(rng, monkeypatch):
    """Forcing the contraction path on a small triangle instance gives the
    exact same transcript as the broadcast path."""
    field = F1572869
    n_nodes = 8
    adj = [[False] * n_nodes for _ in range(n_nodes)]
    for x in range(n_nodes):
        for y in range(x + 1, n_nodes):
            v = rng.random() < 0.5
            adj[x][y] = adj[y][x] = v
    flat = [x for row in adj for x in row]

    def run():
        g = TriangleG.new_adj_matrix(6, flat, field)
        prover = Prover(g)
        out = [prover.c_1().v]
        r = field.one()
        srng = random.Random(3)
        for j in range(g.num_vars()):
            uni = prover.round(r, j)
            out.append(tuple((d, c.v) for d, c in uni.terms))
            r = field.felt(srng.randrange(field.p))
        return out

    baseline = run()
    # clear kernel caches, then force every term through the contraction
    round_kernel._round_step_jit.cache_clear()
    round_kernel._sum_products_jit.cache_clear()
    monkeypatch.setattr(round_kernel, "_CONTRACT_THRESHOLD", 1)
    contracted = run()
    round_kernel._round_step_jit.cache_clear()
    round_kernel._sum_products_jit.cache_clear()
    assert baseline == contracted


def test_triangle_protocol_with_contraction(rng, monkeypatch):
    """Full interactive triangle protocol accepted with contraction forced."""
    field = GOLDILOCKS
    monkeypatch.setattr(round_kernel, "_CONTRACT_THRESHOLD", 1)
    round_kernel._round_step_jit.cache_clear()
    round_kernel._sum_products_jit.cache_clear()
    n_nodes = 4
    adj = [[False] * n_nodes for _ in range(n_nodes)]
    for x in range(n_nodes):
        for y in range(x + 1, n_nodes):
            v = rng.random() < 0.6
            adj[x][y] = adj[y][x] = v
    g = TriangleG.new_adj_matrix(4, [x for row in adj for x in row], field)
    prover = Prover(g)
    verifier = Verifier(g.num_vars(), g)
    verifier.set_c_1(prover.c_1())
    r = field.one()
    srng = SeededRng(0)
    accepted = None
    for j in range(g.num_vars()):
        res = verifier.round(prover.round(r, j), srng)
        if isinstance(res, JthRound):
            r = res.r
        else:
            assert isinstance(res, FinalRound)
            accepted = res.accepted
    round_kernel._round_step_jit.cache_clear()
    round_kernel._sum_products_jit.cache_clear()
    assert accepted is True


def test_mxu_modmatmul_exact(rng):
    """int8-digit MXU path == bigint result on both backends."""
    for field in (F1572869, GOLDILOCKS):
        m, n, k = 8, 8, 256
        a_vals = [[rng.randrange(field.p) for _ in range(k)] for _ in range(m)]
        b_vals = [[rng.randrange(field.p) for _ in range(k)] for _ in range(n)]
        a = FArray.from_ints(np.array(a_vals, dtype=object), field)
        b = FArray.from_ints(np.array(b_vals, dtype=object), field)
        c = modmatmul(a, b, use_mxu=True).to_ints()
        for i in range(0, m, 3):
            for j in range(0, n, 3):
                want = (
                    sum(a_vals[i][t] * b_vals[j][t] for t in range(k)) % field.p
                )
                assert int(c[i][j]) == want, (field.name, i, j)


def test_mxu_matches_vpu_path(rng):
    field = GOLDILOCKS
    m, n, k = 16, 16, 64
    a = FArray.from_ints(
        np.array([[rng.randrange(field.p) for _ in range(k)] for _ in range(m)],
                 dtype=object), field)
    b = FArray.from_ints(
        np.array([[rng.randrange(field.p) for _ in range(k)] for _ in range(n)],
                 dtype=object), field)
    c1 = modmatmul(a, b, use_mxu=False).to_ints()
    c2 = modmatmul(a, b, use_mxu=True).to_ints()
    assert (np.asarray(c1) == np.asarray(c2)).all()


def test_batched_modmatmul_exact(rng):
    """Batched (per-shard) VPU and MXU paths == bigint per-batch results."""
    import jax

    from thaler_study_tpu.ops.modmatmul import (
        _mxu_modmatmul_batched_impl,
        modmatmul_batched_impl,
    )

    for field in (F1572869, GOLDILOCKS):
        s, m, n, k = 4, 4, 8, 32
        a_vals = [
            [[rng.randrange(field.p) for _ in range(k)] for _ in range(m)]
            for _ in range(s)
        ]
        b_vals = [
            [[rng.randrange(field.p) for _ in range(k)] for _ in range(n)]
            for _ in range(s)
        ]
        a = FArray.from_ints(np.array(a_vals, dtype=object), field)
        b = FArray.from_ints(np.array(b_vals, dtype=object), field)
        vpu = jax.jit(modmatmul_batched_impl)(a, b).to_ints()
        mxu = jax.jit(_mxu_modmatmul_batched_impl)(a, b).to_ints()
        for bi in range(s):
            for i in range(0, m, 2):
                for j in range(0, n, 3):
                    want = (
                        sum(
                            a_vals[bi][i][t] * b_vals[bi][j][t]
                            for t in range(k)
                        )
                        % field.p
                    )
                    assert int(vpu[bi][i][j]) == want, (field.name, bi, i, j)
                    assert int(mxu[bi][i][j]) == want, (field.name, bi, i, j)
