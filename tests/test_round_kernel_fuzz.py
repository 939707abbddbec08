"""Property-based fuzz: the fused round kernel vs an exact host oracle.

Random PolySpecs (blocks, factor coverage, terms — including terms that do
NOT cover every block, exercising the 2^missing multiplicity logic), random
tables; check C_1 and every round's univariate against a brute-force
big-int evaluation of g over the hypercube.
"""

import random

import numpy as np
import pytest

from thaler_study_tpu.fields import F1572869, GOLDILOCKS
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.ops.round_kernel import PolySpec
from thaler_study_tpu.protocols import ProductPoly


def _host_eval(spec, tables_ints, point_ints, p):
    """Evaluate g at an arbitrary field point with python ints.

    tables_ints[k]: dict-free dense list over the factor's own variables in
    little-endian order? No — internal MSB order; evaluate via weights.
    """
    # per-block variable values
    sizes = spec.block_sizes
    offsets = []
    off = 0
    for s in sizes:
        offsets.append(off)
        off += s
    val = 0
    for term in spec.terms:
        prod = 1
        for k in term:
            tb = spec.table_blocks[k]
            # the factor's variables: concat of its blocks' vars, MSB-first
            vars_ = []
            for b in tb:
                vars_.extend(point_ints[offsets[b] : offsets[b] + sizes[b]])
            # MLE eval: sum over its table entries (internal MSB order)
            acc = 0
            nv = len(vars_)
            for idx, e in enumerate(tables_ints[k]):
                w = 1
                for bit in range(nv):
                    x = vars_[bit]  # var `bit` is MSB-first
                    is_one = (idx >> (nv - 1 - bit)) & 1
                    w = w * (x if is_one else (1 - x)) % p
                acc = (acc + e * w) % p
            prod = prod * acc % p
        val = (val + prod) % p
    return val


def _host_round_sums(spec, tables_ints, p, degree):
    """s(t) for t=0..degree by brute force over the remaining hypercube."""
    n = spec.num_vars()
    out = []
    for t in range(degree + 1):
        s = 0
        for rest in range(1 << (n - 1)):
            point = [t] + [(rest >> b) & 1 for b in range(n - 1)]
            s = (s + _host_eval(spec, tables_ints, point, p)) % p
        out.append(s)
    return out


def _rand_spec(rng):
    nblocks = rng.choice([1, 1, 2, 3])
    sizes = tuple(rng.randint(1, 2) for _ in range(nblocks))
    ntables = rng.randint(1, 4)
    table_blocks = []
    for _ in range(ntables):
        cover = sorted(
            rng.sample(range(nblocks), rng.randint(1, nblocks))
        )
        table_blocks.append(tuple(cover))
    # ensure every block is covered by at least one table (else a variable
    # would belong to no factor, which the protocol never produces)
    covered = set().union(*map(set, table_blocks))
    for b in range(nblocks):
        if b not in covered:
            table_blocks[0] = tuple(sorted(set(table_blocks[0]) | {b}))
    nterms = rng.randint(1, 3)
    terms = tuple(
        tuple(
            sorted(rng.sample(range(ntables), rng.randint(1, ntables)))
        )
        for _ in range(nterms)
    )
    return PolySpec(tuple(sizes), tuple(table_blocks), terms)


@pytest.mark.parametrize("field", [F1572869, GOLDILOCKS], ids=lambda f: f.name)
def test_round_kernel_random_specs(field):
    rng = random.Random(1234)
    p = field.p
    for trial in range(12):
        spec = _rand_spec(rng)
        # every term must involve the current variable's block or another
        # block — fine either way; build tables
        tables_ints = []
        tables = []
        for tb in spec.table_blocks:
            nv = sum(spec.block_sizes[b] for b in tb)
            vals = [rng.randrange(p) for _ in range(1 << nv)]
            tables_ints.append(vals)
            # convert internal-MSB ints -> DenseMLE via lsb ordering:
            # internal index bits are var0..var_{nv-1} MSB-first; the
            # from_evals_lsb constructor expects little-endian, so feed the
            # bit-reversed list
            lsb = [0] * (1 << nv)
            for idx, v in enumerate(vals):
                rev = int(bin(idx)[2:].zfill(nv)[::-1], 2) if nv else 0
                lsb[rev] = v
            tables.append(
                DenseMLE.from_evals_lsb(
                    np.array(lsb, dtype=np.uint64), nv, field
                ).evals
            )
        poly = ProductPoly(spec, tables)

        # C_1
        want_c1 = 0
        n = spec.num_vars()
        for x in range(1 << n):
            point = [(x >> b) & 1 for b in range(n)]
            want_c1 = (want_c1 + _host_eval(spec, tables_ints, point, p)) % p
        assert poly.sum_evaluations().v == want_c1, (trial, spec)

        # round 0 univariate values at t = 0..degree
        uni, _ = poly.round_univariate(None)
        degree = spec.degree()
        want = _host_round_sums(spec, tables_ints, p, degree)
        for t, w in enumerate(want):
            assert uni.evaluate(field.felt(t)).v == w, (trial, spec, t)
