"""Layered arithmetic circuits for GKR (ref: gkr-protocol/src/circuit.rs).

A circuit is a list of fan-in-2 layers stored *output-first, input-last*
(ref :72-79), each gate naming two input labels in the next layer. Layer
sizes must be powers of two (``num_vars_at`` uses trailing_zeros like the
reference :86-96).

Two evaluation paths:

- :meth:`Circuit.evaluate` — host ints, exact mirror of the reference's
  layer loop (ref :99-124); used for parity tests and small circuits.
- :meth:`Circuit.evaluate_device` — the TPU forward pass: per layer one
  fused gather/gather/select program over FArray tables; used by the prover
  on large circuits.

Wiring predicates: ``add_i``/``mul_i`` booleans (ref :127-138) and their
MLE restrictions ``add_i_ext``/``mul_i_ext``. The reference materializes the
dense 2^(k_i + 2k_{i+1}) truth table then folds r_i into it (ref :152-212) —
exponentially wasteful; here the identical MLE value is produced sparsely:

    add~_i(r, b, c) = sum over add-gates a of eq(r, bits(a)) * [b=b_a][c=c_a]

i.e. one eq-table build plus a scatter-add of one weight per gate into the
2^(2k_{i+1}) (b,c) grid. Behaviorally identical (same polynomial), and the
only way to reach 2^24-gate circuits.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Sequence

import numpy as np

from ..fields import FArray, Felt, FieldConfig
from ..mle.dense import DenseMLE


class GateType(enum.Enum):
    ADD = "add"
    MUL = "mul"


@dataclasses.dataclass(frozen=True)
class Gate:
    """A fan-in-2 gate: type + two input labels into the next layer
    (ref circuit.rs:18-31)."""

    ttype: GateType
    inputs: tuple

    def __init__(self, ttype: GateType, inputs):
        object.__setattr__(self, "ttype", ttype)
        object.__setattr__(self, "inputs", tuple(inputs))


class CircuitLayer:
    """One layer of gates (ref circuit.rs:35-53)."""

    def __init__(self, gates: Sequence[Gate]):
        self.gates = list(gates)

    def __len__(self):
        return len(self.gates)


class CircuitEvaluation:
    """Per-layer value vectors, output layer first (ref circuit.rs:58-68)."""

    def __init__(self, layers: List[list]):
        self.layers = layers

    def w(self, layer: int, label: int):
        return self.layers[layer][label]


class Circuit:
    """A layered circuit; layer 0 is the output layer (ref circuit.rs:72-79)."""

    def __init__(self, layers: Sequence[CircuitLayer], num_inputs: int):
        self.layers = list(layers)
        self.num_inputs = num_inputs
        # precomputed wiring arrays per layer for the device paths
        self._wiring = [
            (
                np.array([g.inputs[0] for g in l.gates], dtype=np.int32),
                np.array([g.inputs[1] for g in l.gates], dtype=np.int32),
                np.array(
                    [g.ttype is GateType.MUL for g in l.gates], dtype=bool
                ),
            )
            for l in self.layers
        ]

    # ---- shape queries ----
    def num_vars_at(self, layer: int):
        """log2 of the layer size via trailing_zeros (ref :86-96; requires
        power-of-two layers, like the reference)."""
        if layer < len(self.layers):
            n = len(self.layers[layer])
        elif layer == len(self.layers):
            n = self.num_inputs
        else:
            return None
        return (n & -n).bit_length() - 1

    def num_outputs(self) -> int:
        return len(self.layers[0])

    # ---- evaluation ----
    def evaluate(self, inputs: Sequence) -> CircuitEvaluation:
        """Host forward pass, exact reference mirror (ref :99-124)."""
        layers = [list(inputs)]
        current = list(inputs)
        for layer in reversed(self.layers):
            nxt = []
            for g in layer.gates:
                a, b = current[g.inputs[0]], current[g.inputs[1]]
                nxt.append(a * b if g.ttype is GateType.MUL else a + b)
            layers.append(nxt)
            current = nxt
        layers.reverse()
        return CircuitEvaluation(layers)

    def evaluate_host_u64(self, inputs, p: int) -> List[np.ndarray]:
        """Native-runtime forward pass on uint64 residues (for big circuits
        whose layer values feed the prover as numpy arrays)."""
        from .. import runtime

        layers = [np.ascontiguousarray(inputs, dtype=np.uint64)]
        cur = layers[0]
        for b_idx, c_idx, is_mul in reversed(self._wiring):
            cur = runtime.circuit_layer(cur, b_idx, c_idx, is_mul, p)
            layers.append(cur)
        layers.reverse()
        return layers

    def _device_wiring(self):
        """Device-resident wiring, cached on the circuit: the r5 prelude
        profile showed a fresh prover re-uploading ~3 x width indices per
        layer per proof (~270 MB at 2^24 through the remote tunnel — the
        dominant 'prelude' cost in bench_logs/r5/gkr24_cs_bd.log).
        Wiring is static per circuit, so upload once."""
        import jax.numpy as jnp

        cached = getattr(self, "_dev_wiring_cache", None)
        if cached is None:
            cached = self._dev_wiring_cache = [
                (jnp.asarray(b), jnp.asarray(c), jnp.asarray(m))
                for b, c, m in self._wiring
            ]
        return cached

    def evaluate_device(self, inputs: FArray) -> List[FArray]:
        """TPU forward pass: per layer, two gathers + add/mul + select.

        Returns per-layer FArrays, output layer first (little-endian/label
        index order, i.e. position = gate label). Uniform-width circuits
        run the whole pass as ONE jitted ``lax.scan`` dispatch (the
        per-layer loop pays ~16 tunnel enqueues); mixed widths keep the
        per-layer jit."""
        import jax
        import jax.numpy as jnp

        def layer_step(cur: FArray, b_idx, c_idx, is_mul):
            lhs = FArray(tuple(jnp.take(l, b_idx, axis=0) for l in cur.limbs), cur.field)
            rhs = FArray(tuple(jnp.take(l, c_idx, axis=0) for l in cur.limbs), cur.field)
            added = lhs + rhs
            mulled = lhs * rhs
            mask = jnp.asarray(is_mul)
            limbs = tuple(
                jnp.where(mask, ml, al)
                for ml, al in zip(mulled.limbs, added.limbs)
            )
            return FArray(limbs, cur.field)

        wiring_dev = self._device_wiring()
        n_layers = len(self.layers)
        widths = {self.num_vars_at(i) for i in range(n_layers + 1)}
        if len(widths) == 1 and n_layers > 1:
            key = ("fwd_scan", n_layers, inputs.field)
            cache = getattr(self, "_fwd_scan_cache", None)
            if cache is None:
                cache = self._fwd_scan_cache = {}
            if key not in cache:
                stacked = tuple(
                    jnp.stack([wiring_dev[i][j] for i in range(n_layers)])
                    for j in range(3)
                )

                def impl(inp, bs, cs, ms):
                    def body(cur, xs):
                        nxt = layer_step(cur, *xs)
                        return nxt, nxt
                    # wiring is output-first; forward consumes input-first
                    _, ys = jax.lax.scan(
                        body, inp, (bs, cs, ms), reverse=True
                    )
                    # unstack INSIDE the program: one dispatch, L outputs
                    return tuple(ys[i] for i in range(n_layers))

                cache[key] = (jax.jit(impl), stacked)
            fn, stacked = cache[key]
            layers = fn(inputs, *stacked)  # output layer first
            return list(layers) + [inputs]

        step = jax.jit(layer_step)
        out = [inputs]
        cur = inputs
        for b_idx, c_idx, is_mul in reversed(wiring_dev):
            cur = step(cur, b_idx, c_idx, is_mul)
            out.append(cur)
        out.reverse()
        return out

    # ---- wiring predicates ----
    def add_i(self, i: int, a: int, b: int, c: int) -> bool:
        g = self.layers[i].gates[a]
        return g.ttype is GateType.ADD and g.inputs == (b, c)

    def mul_i(self, i: int, a: int, b: int, c: int) -> bool:
        g = self.layers[i].gates[a]
        return g.ttype is GateType.MUL and g.inputs == (b, c)

    def _wiring_ext(
        self, r_i: Sequence[Felt], i: int, want_mul: bool, field: FieldConfig
    ) -> DenseMLE:
        """add~_i / mul~_i fixed at r_i, as a dense MLE over (b, c).

        Sparse construction: eq-table over the layer-i variables gathered at
        each gate's output label, scattered into the (b, c) grid at
        ((c << k) | b) — the index layout the reference's dense triple loop
        produces (circuit.rs:163-173: a innermost, then b, then c).
        """
        from .. import runtime

        k_next = self.num_vars_at(i + 1)
        b_idx, c_idx, is_mul = self._wiring[i]
        sel = is_mul == want_mul
        # eq(r_i, bits(a)) for every gate label a, little-endian bit order,
        # then one scatter-add per selected gate — O(gates) on the native
        # host runtime (exact u64 arithmetic, p < 2^64)
        w = runtime.eq_table([f.v for f in r_i], field.p)
        grid = runtime.wiring_scatter(b_idx, c_idx, sel, w, k_next, field.p)
        return DenseMLE.from_evals_lsb(grid, 2 * k_next, field)

    def add_i_ext(self, r_i: Sequence[Felt], i: int) -> DenseMLE:
        """Dense MLE of add_i fixed at r_i (ref circuit.rs:152-181)."""
        return self._wiring_ext(r_i, i, False, r_i[0].field)

    def mul_i_ext(self, r_i: Sequence[Felt], i: int) -> DenseMLE:
        """Dense MLE of mul_i fixed at r_i (ref circuit.rs:183-212)."""
        return self._wiring_ext(r_i, i, True, r_i[0].field)


def circuit_from_book() -> Circuit:
    """Thaler fig. 4.12 test circuit (ref circuit.rs:215-253)."""
    return Circuit(
        [
            CircuitLayer(
                [Gate(GateType.MUL, (0, 1)), Gate(GateType.MUL, (2, 3))]
            ),
            CircuitLayer(
                [
                    Gate(GateType.MUL, (0, 0)),
                    Gate(GateType.MUL, (1, 1)),
                    Gate(GateType.MUL, (1, 2)),
                    Gate(GateType.MUL, (3, 3)),
                ]
            ),
        ],
        4,
    )
