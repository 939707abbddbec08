"""Static VPU-op census of the fused round kernel (no device needed).

VERDICT r4 #4 asked which cost model the round kernel obeys — the r3
latency-chain probes said mul:add = 1.15x, the r4 throughput probes said
3.06x, and the Karatsuba A/B kept losing either way. This census settles
it from the instruction mix itself: trace the claim-round program
(fold + degree-2 sums with the s(1) = claim - s(0) shortcut) at the
roofline shape (2^23 points, k = 2 goldilocks factors) and count every
traced primitive, element-weighted.

Key output (2026-08-20, this file's committed run is bench_logs/r5/
op_census.log): ~2.63 B element-ops per round, of which integer
multiplies are ~201 M (~8%); adds (570 M), compares (lt 436 M),
dtype converts (445 M, the bool->u32 carry materializations),
selects (185 M), subs (180 M) and shifts (235 M) — i.e. the carry
discipline of 64-bit-in-2x-u32 limb emulation — are ~80% of the issue
load. Dividing by the measured 1.149 ms claim round gives an effective
~2.3 Tops/s issue rate ~= 60% of the v5e VPU's ~3.9 Tops (4 ALUs x
(8,128) lanes x 940 MHz): the kernel is VPU-ISSUE-SLOT bound, and no
multiply diet can win because multiplies are a small slice of the slots.

Usage: python benches/op_census.py [--vars 23] [--factors 2]
"""

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def census(fn, *args):
    """Element-weighted primitive counts of fn's jaxpr (recursing into
    inner jits/scans)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    counts = collections.Counter()

    def walk(jpr):
        for eqn in jpr.eqns:
            sz = 1
            for v in eqn.outvars:
                s = int(np.prod(v.aval.shape)) if v.aval.shape else 1
                sz = max(sz, s)
            counts[eqn.primitive.name] += sz
            for p in eqn.params.values():
                if hasattr(p, "eqns"):
                    walk(p)
                if hasattr(p, "jaxpr") and hasattr(p.jaxpr, "eqns"):
                    walk(p.jaxpr)

    walk(jaxpr.jaxpr)
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vars", type=int, default=23)
    ap.add_argument("--factors", type=int, default=2)
    args = ap.parse_args()

    from thaler_study_tpu.fields import GOLDILOCKS as F
    from thaler_study_tpu.fields import FArray
    from thaler_study_tpu.ops.round_kernel import (
        PolySpec,
        _fold_tables,
        _round_sums,
    )

    n, k = 1 << args.vars, args.factors
    spec0 = PolySpec(
        (args.vars,), tuple((0,) for _ in range(k)), (tuple(range(k)),)
    )
    spec1 = spec0.after_fold()

    tabs = tuple(
        FArray.from_ints(np.arange(n, dtype=np.uint64) % F.p, F)
        for _ in range(k)
    )
    r = FArray.from_ints([5], F).reshape(())
    c = FArray.from_ints([7], F).reshape(())

    def claim_round(tables, r, claim):
        tables = _fold_tables(spec0, tables, r)
        return _round_sums(spec1, tables, k, claim=claim), tables

    def first_round(tables):
        return _round_sums(spec0, tables, k)

    out = {"vars": args.vars, "factors": k}
    for name, cnts in (
        ("claim_round", census(claim_round, tabs, r, c)),
        ("first_round", census(first_round, tabs)),
    ):
        data_ops = {
            p: int(cnt)
            for p, cnt in cnts.most_common()
            if cnt >= (n >> 4)  # full-size vector ops only
        }
        out[name] = {
            "total_element_ops": int(sum(data_ops.values())),
            "mul_ops": data_ops.get("mul", 0),
            "by_primitive": data_ops,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
