"""Native C++ host runtime: build, exactness vs python bigints."""

import random

import numpy as np

from thaler_study_tpu import runtime
from thaler_study_tpu.fields import F1572869, GOLDILOCKS


def test_native_builds():
    assert runtime.available(), "g++ toolchain should build the native lib"


def test_eq_table_exact(rng):
    for field in (F1572869, GOLDILOCKS):
        n = 6
        r = [rng.randrange(field.p) for _ in range(n)]
        got = runtime.eq_table(r, field.p)
        for idx in (0, 1, 17, (1 << n) - 1):
            want = 1
            for j in range(n):
                want = want * (r[j] if (idx >> j) & 1 else (1 - r[j])) % field.p
            assert int(got[idx]) == want % field.p


def test_mle_eval_exact(rng):
    for field in (F1572869, GOLDILOCKS):
        n = 8
        evals = [rng.randrange(field.p) for _ in range(1 << n)]
        point = [rng.randrange(field.p) for _ in range(n)]
        got = runtime.mle_eval(evals, point, field.p)
        w = runtime.eq_table(point, field.p)
        want = sum(int(a) * int(b) for a, b in zip(evals, w)) % field.p
        assert got == want


def test_circuit_layer_exact(rng):
    p = GOLDILOCKS.p
    cur = [rng.randrange(p) for _ in range(8)]
    b_idx = [rng.randrange(8) for _ in range(16)]
    c_idx = [rng.randrange(8) for _ in range(16)]
    is_mul = [rng.random() < 0.5 for _ in range(16)]
    got = runtime.circuit_layer(cur, b_idx, c_idx, is_mul, p)
    for g in range(16):
        l, r_ = cur[b_idx[g]], cur[c_idx[g]]
        want = (l * r_) % p if is_mul[g] else (l + r_) % p
        assert int(got[g]) == want


def test_wiring_scatter_duplicates(rng):
    p = F1572869.p
    # two gates landing on the same (b, c) position must accumulate
    b_idx, c_idx = [1, 1, 0], [0, 0, 1]
    sel = [True, True, False]
    w = [123, 456, 789]
    grid = runtime.wiring_scatter(b_idx, c_idx, sel, w, 1, p)
    assert int(grid[(0 << 1) | 1]) == (123 + 456) % p
    assert int(grid[(1 << 1) | 0]) == 0


def test_large_eq_table_speed():
    """2^20 eq table must complete fast (native path sanity)."""
    import time

    r = list(range(1, 21))
    t0 = time.time()
    out = runtime.eq_table(r, GOLDILOCKS.p)
    assert len(out) == 1 << 20
    assert time.time() - t0 < 2.0
