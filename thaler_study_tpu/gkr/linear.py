"""Linear-time GKR layer sumcheck (Libra-style bookkeeping tables).

The reference pays O(2^(k_i + 2k_{i+1})) per layer to materialize the dense
wiring tables (gkr-protocol/src/lib.rs:388-404) and O(4^k) per sumcheck
round over the dense (b, c) grid. That caps circuits at toy sizes. This
module proves the *same* layer claim

    sum_{b,c} [ add~(r,b,c) (W(b) + W(c)) + mul~(r,b,c) W(b) W(c) ]

with O(gates) host bookkeeping + O(2^k) device sumcheck work, split into
two phases (the Libra algorithm, Xie et al. 2019 — public technique):

phase 1 (rounds over b): h(b) = W(b)*A1(b) + A2(b), where
    A1(b) = sum_c add~(r,b,c) + sum_c mul~(r,b,c) W(c)
    A2(b) = sum_c add~(r,b,c) W(c)
are one-scatter-per-gate tables (native runtime).

phase 2 (rounds over c), b fixed at u: f(u,c) =
    B1(c)*w_u + B1(c)*W(c) + B2(c)*w_u*W(c), where
    B1(c) = add~(r,u,c), B2(c) = mul~(r,u,c)   (again one scatter per gate)
    w_u = W~(u)  (a scalar factor in the product spec).

Because sumcheck round messages are determined by the summed polynomial
itself, the transcript is bit-identical to the dense-W path — asserted in
tests/test_gkr_linear.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .. import runtime
from ..fields import FArray, Felt, FieldConfig
from ..mle.dense import DenseMLE
from ..ops.round_kernel import PolySpec
from ..protocols.factor_poly import ProductPoly
from ..sumcheck.univariate import UniPoly
from .circuit import Circuit


def _mulmod_arr(a: np.ndarray, b: np.ndarray, p: int) -> np.ndarray:
    lib = runtime._load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty(len(a), dtype=np.uint64)
    if lib is None:
        for i in range(len(a)):
            out[i] = int(a[i]) * int(b[i]) % p
        return out
    lib.ts_mulmod_arr(
        runtime._ptr(a, runtime._U64P),
        runtime._ptr(b, runtime._U64P),
        runtime._ptr(out, runtime._U64P),
        len(a),
        p,
    )
    return out


class LibraW:
    """The layer-i GKR round polynomial, proven in linear time.

    Implements the sumcheck hot-path interface (round_univariate /
    sum_evaluations) consumed by sumcheck.Prover.
    """

    def __init__(
        self,
        circuit: Circuit,
        layer_i: int,
        r_i: List[Felt],
        w_next,  # layer i+1 values: canonical uint64 array OR label-order FArray
        field: FieldConfig,
        mesh=None,
        n_shard=None,
        device_tables: bool = None,
    ):
        from ..utils.config import get_config

        self.field = field
        self.mesh = mesh
        self.n_shard = n_shard
        p = field.p
        k = circuit.num_vars_at(layer_i + 1)
        k_cur = circuit.num_vars_at(layer_i)
        self.k = k
        self.j = 0  # next round index (0..2k-1)
        self.u: List[Felt] = []  # phase-1 challenges
        b_idx, c_idx, is_mul = circuit._wiring[layer_i]
        self._wiring = (b_idx, c_idx, is_mul)
        if device_tables is None:
            device_tables = get_config().gkr_device_tables
        self.device_tables = device_tables

        if device_tables:
            from .device_tables import (
                _phase1_jit,
                lsb_to_msb,
                wiring_lane_bits,
                wiring_plan_or_none,
            )

            import jax.numpy as jnp

            self._lane_bits = wiring_lane_bits(b_idx, c_idx)
            self._b_plan = self._c_plan = None
            self._b_scan = self._c_scan = None
            mode = get_config().gkr_scatter_mode
            if mode == "plan":
                b_plan = wiring_plan_or_none(b_idx, 1 << k)
                c_plan = wiring_plan_or_none(c_idx, 1 << k)
                if b_plan is not None:
                    self._b_plan = jnp.asarray(b_plan)
                if c_plan is not None:
                    self._c_plan = jnp.asarray(c_plan)
            elif mode == "scan":
                from .device_tables import scan_plan

                self._b_scan = tuple(
                    jnp.asarray(x) for x in scan_plan(b_idx, 1 << k)
                )
                self._c_scan = tuple(
                    jnp.asarray(x) for x in scan_plan(c_idx, 1 << k)
                )
            if isinstance(w_next, FArray):
                w_lsb = w_next
            else:
                w_lsb = FArray.from_ints(
                    np.ascontiguousarray(w_next, dtype=np.uint64), field
                )
            self._w_lsb = w_lsb
            r_arr = FArray.from_ints(
                np.array([f.v for f in r_i], dtype=object), field
            )
            if self._b_scan is not None:
                b_extra, b_mode = self._b_scan, "scan"
            elif self._b_plan is not None:
                b_extra, b_mode = (self._b_plan,), "plan"
            else:
                b_extra, b_mode = (), "segment"
            p1_args = (
                r_arr,
                w_lsb,
                jnp.asarray(b_idx),
                jnp.asarray(c_idx),
                jnp.asarray(is_mul),
            ) + tuple(b_extra)
            a1_lsb, a2_lsb, eq_r_dev = _phase1_jit(
                k_cur, k, field,
                lane_bits=self._lane_bits,
                mode=b_mode,
            )(*p1_args)
            self._eq_r_dev = eq_r_dev
            tables = (
                lsb_to_msb(w_lsb, k),
                lsb_to_msb(a1_lsb, k),
                lsb_to_msb(a2_lsb, k),
            )
        else:
            if isinstance(w_next, FArray):
                w_next = np.asarray(w_next.to_ints(), dtype=np.uint64)
            self.w_next = np.ascontiguousarray(w_next, dtype=np.uint64)
            eq_r = runtime.eq_table([f.v for f in r_i], p)
            self.eq_r = eq_r
            w_at_c = self.w_next[c_idx]
            eqr_w = _mulmod_arr(eq_r[: len(b_idx)], w_at_c, p)
            # A1: add gates contribute eq_r, mul gates eq_r * W(c)
            vals_a1 = np.where(is_mul, eqr_w, eq_r[: len(b_idx)])
            a1 = runtime.scatter_add(
                b_idx.astype(np.int64), vals_a1, 1 << k, p
            )
            # A2: add gates contribute eq_r * W(c)
            vals_a2 = np.where(is_mul, np.uint64(0), eqr_w)
            a2 = runtime.scatter_add(
                b_idx.astype(np.int64), vals_a2, 1 << k, p
            )
            w_mle = DenseMLE.from_evals_lsb(self.w_next, k, field)
            a1_mle = DenseMLE.from_evals_lsb(a1, k, field)
            a2_mle = DenseMLE.from_evals_lsb(a2, k, field)
            tables = (w_mle.evals, a1_mle.evals, a2_mle.evals)
        terms = ((0, 1), (2,))
        if mesh is not None:
            from ..parallel import ShardedProductPoly

            self._inner = ShardedProductPoly.from_internal_tables(
                tables, mesh, n_shard=n_shard, terms=terms
            )
        else:
            spec = PolySpec(
                block_sizes=(k,),
                table_blocks=((0,), (0,), (0,)),
                terms=terms,
            )
            self._inner = ProductPoly(spec, tables)

    def num_vars(self) -> int:
        return 2 * self.k

    def sum_evaluations(self) -> Felt:
        return self._inner.sum_evaluations()

    def _enter_phase2(self, r_last: Felt) -> None:
        p = self.field.p
        k = self.k
        b_idx, c_idx, is_mul = self._wiring
        self.u.append(r_last)
        if self.device_tables:
            from .device_tables import _phase2_jit, lsb_to_msb

            import jax.numpy as jnp

            u_arr = FArray.from_ints(
                np.array([f.v for f in self.u], dtype=object), self.field
            )
            if self._c_scan is not None:
                c_extra, c_mode = self._c_scan, "scan"
            elif self._c_plan is not None:
                c_extra, c_mode = (self._c_plan,), "plan"
            else:
                c_extra, c_mode = (), "segment"
            p2_args = (
                u_arr,
                self._w_lsb,
                self._eq_r_dev,
                jnp.asarray(b_idx),
                jnp.asarray(c_idx),
                jnp.asarray(is_mul),
            ) + tuple(c_extra)
            b1_lsb, b2_lsb, w_u_arr = _phase2_jit(
                k, self.field,
                lane_bits=self._lane_bits,
                mode=c_mode,
            )(*p2_args)
            tables = (
                lsb_to_msb(b1_lsb, k),
                lsb_to_msb(b2_lsb, k),
                lsb_to_msb(self._w_lsb, k),
                w_u_arr,
            )
        else:
            eq_u = runtime.eq_table([f.v for f in self.u], p)
            w_u = runtime.mle_eval(self.w_next, [f.v for f in self.u], p)
            t = _mulmod_arr(self.eq_r[: len(b_idx)], eq_u[b_idx], p)
            b1 = runtime.scatter_add(
                c_idx.astype(np.int64),
                np.where(is_mul, np.uint64(0), t),
                1 << k,
                p,
            )
            b2 = runtime.scatter_add(
                c_idx.astype(np.int64),
                np.where(is_mul, t, np.uint64(0)),
                1 << k,
                p,
            )
            b1_mle = DenseMLE.from_evals_lsb(b1, k, self.field)
            b2_mle = DenseMLE.from_evals_lsb(b2, k, self.field)
            wc_mle = DenseMLE.from_evals_lsb(self.w_next, k, self.field)
            w_u_arr = FArray.from_ints(
                np.array([w_u], dtype=np.uint64), self.field
            )
            tables = (b1_mle.evals, b2_mle.evals, wc_mle.evals, w_u_arr)
        terms = ((0, 3), (0, 2), (1, 3, 2))
        if self.mesh is not None:
            from ..parallel import ShardedProductPoly

            self._inner = ShardedProductPoly.from_internal_tables(
                tables, self.mesh, n_shard=self.n_shard, terms=terms
            )
        else:
            spec = PolySpec(
                block_sizes=(k,),
                table_blocks=((0,), (0,), (0,), ()),
                terms=terms,
            )
            self._inner = ProductPoly(spec, tables)

    def round_univariate(
        self, r_prev: Optional[Felt]
    ) -> Tuple[UniPoly, "LibraW"]:
        j = self.j
        self.j += 1
        if j == 0:
            uni, self._inner = self._inner.round_univariate(None)
            return uni, self
        if j < self.k:
            self.u.append(r_prev)
            uni, self._inner = self._inner.round_univariate(r_prev)
            return uni, self
        if j == self.k:
            # r_prev completes u; fold it into phase 1 is unnecessary —
            # phase 2 is built directly from u and starts fresh over c
            self._enter_phase2(r_prev)
            uni, self._inner = self._inner.round_univariate(None)
            return uni, self
        uni, self._inner = self._inner.round_univariate(r_prev)
        return uni, self

    def advance(self, r_prev: Optional[Felt]) -> "LibraW":
        """``round_univariate``'s state transition without the round sums —
        the checkpoint-resume fast-forward (folds + phase switch only)."""
        j = self.j
        self.j += 1
        if j == 0:
            assert r_prev is None
            return self
        if j < self.k:
            self.u.append(r_prev)
            self._inner = self._inner.fix_variables([r_prev])
            return self
        if j == self.k:
            self._enter_phase2(r_prev)
            return self
        self._inner = self._inner.fix_variables([r_prev])
        return self
