"""Differential tests of the device field backends vs exact Python ints.

Mirrors the reference's reliance on arkworks' own field-arithmetic tests: here
every backend op is checked against arbitrary-precision host arithmetic
(SURVEY.md section 7 order-of-construction step 1).
"""

import random

import numpy as np
import pytest

from thaler_study_tpu.fields import (
    BABYBEAR,
    F5,
    F389,
    F1572869,
    GOLDILOCKS,
    FArray,
    Felt,
)

FIELDS = [F5, F389, F1572869, BABYBEAR, GOLDILOCKS]


def _rand_ints(field, n, rng):
    return [rng.randrange(field.p) for _ in range(n)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_roundtrip(field, rng):
    vals = _rand_ints(field, 64, rng) + [0, 1, field.p - 1]
    arr = FArray.from_ints(np.array(vals, dtype=object), field)
    back = [int(v) for v in arr.to_ints()]
    assert back == [v % field.p for v in vals]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("op", ["add", "sub", "mul", "neg"])
def test_elementwise_vs_bigint(field, op, rng):
    n = 257  # odd size: exercises broadcasting/padding-free paths
    a_vals = _rand_ints(field, n, rng)
    b_vals = _rand_ints(field, n, rng)
    # always include the boundary cases
    a_vals[:4] = [0, field.p - 1, field.p - 1, 1]
    b_vals[:4] = [0, field.p - 1, 1, field.p - 1]
    a = FArray.from_ints(np.array(a_vals, dtype=object), field)
    b = FArray.from_ints(np.array(b_vals, dtype=object), field)
    if op == "add":
        got, want = a + b, [(x + y) % field.p for x, y in zip(a_vals, b_vals)]
    elif op == "sub":
        got, want = a - b, [(x - y) % field.p for x, y in zip(a_vals, b_vals)]
    elif op == "mul":
        got, want = a * b, [(x * y) % field.p for x, y in zip(a_vals, b_vals)]
    else:
        got, want = -a, [(-x) % field.p for x in a_vals]
    assert [int(v) for v in got.to_ints()] == want


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_sum_mod(field, rng):
    for n in (1, 2, 3, 7, 64, 1000):
        vals = _rand_ints(field, n, rng)
        arr = FArray.from_ints(np.array(vals, dtype=object), field)
        got = arr.sum(axis=0)
        assert int(got.to_ints()) == sum(vals) % field.p


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_scalar_broadcast(field, rng):
    vals = _rand_ints(field, 33, rng)
    s = rng.randrange(field.p)
    arr = FArray.from_ints(np.array(vals, dtype=object), field)
    got = arr * Felt(s, field)
    assert [int(v) for v in got.to_ints()] == [(v * s) % field.p for v in vals]
    got = arr + Felt(s, field)
    assert [int(v) for v in got.to_ints()] == [(v + s) % field.p for v in vals]


def test_felt_host_arithmetic():
    a, b = F389.felt(377), F389.felt(212)
    assert (a + b).v == (377 + 212) % 389
    assert (a - b).v == (377 - 212) % 389
    assert (a * b).v == (377 * 212) % 389
    assert (a / b * b) == a
    assert (a**3).v == pow(377, 3, 389)
    assert -F389.zero() == F389.zero()
    assert a.inverse() * a == F389.one()


def test_goldilocks_known_values():
    p = GOLDILOCKS.p
    assert p == 2**64 - 2**32 + 1
    # worst-case products near the modulus
    cases = [
        (p - 1, p - 1),
        (p - 1, 2**32),
        (2**32 - 1, 2**32 - 1),
        (2**63, 2**63),
        (p - 2, p - 3),
    ]
    a = FArray.from_ints(np.array([c[0] for c in cases], dtype=object), GOLDILOCKS)
    b = FArray.from_ints(np.array([c[1] for c in cases], dtype=object), GOLDILOCKS)
    got = (a * b).to_ints()
    for (x, y), g in zip(cases, got):
        assert int(g) == (x * y) % p


def test_serialization_le_bytes():
    # arkworks Fp serializes ceil(MODULUS_BIT_SIZE/8) bytes little-endian of
    # the canonical value (ark-ff serialize_with_flags) — 3 bytes for the
    # 21-bit modulus 1572869, 8 bytes for Goldilocks.
    f = F1572869.felt(1234567)
    assert f.to_bytes_le() == (1234567).to_bytes(3, "little")
    assert Felt.from_bytes_le(f.to_bytes_le(), F1572869) == f
    g = GOLDILOCKS.felt(1234567)
    assert g.to_bytes_le() == (1234567).to_bytes(8, "little")


def test_fuzz_mul_randomized():
    rng = random.Random(42)
    for field in (F1572869, GOLDILOCKS, BABYBEAR):
        n = 4096
        a_vals = [rng.randrange(field.p) for _ in range(n)]
        b_vals = [rng.randrange(field.p) for _ in range(n)]
        a = FArray.from_ints(np.array(a_vals, dtype=object), field)
        b = FArray.from_ints(np.array(b_vals, dtype=object), field)
        got = (a * b).to_ints()
        want = [(x * y) % field.p for x, y in zip(a_vals, b_vals)]
        assert [int(v) for v in got] == want


def test_karatsuba_mul_words_identical():
    """The 3-mul Karatsuba 64x64 limb product produces the exact same
    four product words as the schoolbook path — on random inputs and on
    every all-ones/zero corner (so flipping the switch can never change a
    transcript byte)."""
    import jax.numpy as jnp

    from thaler_study_tpu.fields import goldilocks as gl

    rng = random.Random(7)
    corners = [0, 1, 0xFFFFFFFF, 0xFFFF0000, 0x0000FFFF, 0x80000000]
    vals = [
        (rng.randrange(1 << 32), rng.randrange(1 << 32),
         rng.randrange(1 << 32), rng.randrange(1 << 32))
        for _ in range(2048)
    ] + [(a, b, c, d) for a in corners for b in corners[:3]
         for c in corners[:3] for d in corners[:3]]
    cols = [jnp.asarray(np.array(c, dtype=np.uint32)) for c in zip(*vals)]
    from thaler_study_tpu.fields.backend32 import mul32_hilo_k3

    school = gl._mul_words_school(*cols)
    kara = gl._mul_words_karatsuba(*cols)
    kara2 = gl._mul_words_karatsuba(*cols, mul32=mul32_hilo_k3)
    for s, k, k2 in zip(school, kara, kara2):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(k))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(k2))
    # the 3-mul 32x32 primitive alone, against the 4-mul one
    h4, l4 = gl.mul32_hilo(cols[0], cols[1])
    h3, l3 = mul32_hilo_k3(cols[0], cols[1])
    np.testing.assert_array_equal(np.asarray(h4), np.asarray(h3))
    np.testing.assert_array_equal(np.asarray(l4), np.asarray(l3))
    # and the full 128-bit value matches python bigints
    w = [np.asarray(x, dtype=np.uint64) for x in kara]
    for i, (alo, ahi, blo, bhi) in enumerate(vals):
        a = alo | (ahi << 32)
        b = blo | (bhi << 32)
        got = int(w[0][i]) | (int(w[1][i]) << 32) | (int(w[2][i]) << 64) | (
            int(w[3][i]) << 96
        )
        assert got == a * b


def test_goldilocks_fixup_styles_bit_identical(rng):
    """Both conditional-fixup formulations (jnp.where selects vs
    arithmetic masks, goldilocks.set_select_fixups) produce bit-identical
    add/sub/mul results, including the boundary cases that exercise every
    carry/borrow/geq-p fixup."""
    import numpy as np

    from thaler_study_tpu.fields import GOLDILOCKS, FArray
    from thaler_study_tpu.fields import goldilocks as gl

    p = GOLDILOCKS.p
    edge = [0, 1, 2**32 - 1, 2**32, 2**63, p - 2, p - 1]
    vals_a = edge + [rng.randrange(p) for _ in range(64)]
    vals_b = list(reversed(edge)) + [rng.randrange(p) for _ in range(64)]
    a = FArray.from_ints(np.array(vals_a, dtype=object), GOLDILOCKS)
    b = FArray.from_ints(np.array(vals_b, dtype=object), GOLDILOCKS)

    def run_all():
        return [
            [int(v) for v in (a + b).to_ints()],
            [int(v) for v in (a - b).to_ints()],
            [int(v) for v in (a * b).to_ints()],
        ]

    base = run_all()
    gl.set_select_fixups(True)
    try:
        # trace fresh programs under the select style
        import jax

        jax.clear_caches()
        alt = run_all()
    finally:
        gl.set_select_fixups(False)
        import jax

        jax.clear_caches()
    assert alt == base
    expect = [
        [(x + y) % p for x, y in zip(vals_a, vals_b)],
        [(x - y) % p for x, y in zip(vals_a, vals_b)],
        [(x * y) % p for x, y in zip(vals_a, vals_b)],
    ]
    assert base == expect


@pytest.mark.parametrize("field", [GOLDILOCKS, F389], ids=lambda f: f.name)
def test_fused_fold_bit_identical(field, rng):
    """FArray.fold (goldilocks: fields/goldilocks.fold, one 128-bit
    reduction instead of mul + modular add) is bit-identical to the
    composed lo + r*(hi - lo) and to the bigint oracle, on boundary
    cases that exercise every carry/fixup — so routing every fold site
    through it can never change a transcript byte (the fold identity:
    matrix-multiplication/src/lib.rs:114-122)."""
    from thaler_study_tpu.fields import farray as fa

    p = field.p
    edge = [0, 1, p - 1, p - 2, (1 << 32) % p, ((1 << 32) - 1) % p]
    vals_lo = edge + [rng.randrange(p) for _ in range(128)]
    vals_hi = list(reversed(edge)) + [rng.randrange(p) for _ in range(128)]
    lo = FArray.from_ints(np.array(vals_lo, dtype=object), field)
    hi = FArray.from_ints(np.array(vals_hi, dtype=object), field)
    for rv in [0, 1, p - 1, rng.randrange(p)]:
        r = FArray.from_ints([rv], field).reshape(())
        fused = [int(v) for v in FArray.fold(lo, hi, r).to_ints()]
        fa.set_fused_fold(False)
        try:
            composed = [int(v) for v in FArray.fold(lo, hi, r).to_ints()]
        finally:
            fa.set_fused_fold(True)
        oracle = [
            (l + rv * ((h - l) % p)) % p for l, h in zip(vals_lo, vals_hi)
        ]
        assert fused == composed == oracle
