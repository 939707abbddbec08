"""Reference-parity protocol scales on CPU (VERDICT r1 next-round #7).

The reference's correctness net tops out at: matmul 32x32
(matrix-multiplication/src/lib.rs:319), triangle graphs of 128 nodes
(triangle-counting/src/lib.rs:279), Fiat-Shamir generic sumcheck n in 2..10
(fiat-shamir/src/lib.rs:223), GKR 3-layer circuits
(gkr-protocol/src/lib.rs:627-703). These tests match or exceed those sizes
using the device-table protocol paths (not SparseMultiPoly brute force) so
they stay CI-fast on the virtual CPU mesh.
"""

import numpy as np

from thaler_study_tpu.fields import F1572869, GOLDILOCKS
from thaler_study_tpu.gkr import Circuit, CircuitLayer, Gate, GateType
from thaler_study_tpu.protocols import MatMulG, TriangleG
from thaler_study_tpu.sumcheck import (
    FinalRound,
    JthRound,
    Prover,
    SeededRng,
    Verifier,
)


def _u32_to_boolean_vec(v, bits, field):
    return [field.one() if (v >> j) & 1 else field.zero() for j in range(bits)]


def _run(g, rng):
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


def test_matmul_32x32(rng):
    """32x32 matrices, 10 sumcheck variables — the reference's largest
    matmul scale (matrix-multiplication/src/lib.rs:319-321)."""
    field = GOLDILOCKS
    p_log, n = 5, 32
    a = np.array(
        [[rng.randrange(field.p) for _ in range(n)] for _ in range(n)],
        dtype=object,
    )
    b = np.array(
        [[rng.randrange(field.p) for _ in range(n)] for _ in range(n)],
        dtype=object,
    )
    c = (a @ b) % field.p
    srng = SeededRng(5)
    for i, j in [(0, 0), (n - 1, n // 2)]:
        point = _u32_to_boolean_vec(i, p_log, field) + _u32_to_boolean_vec(
            j, p_log, field
        )
        g = MatMulG.new(p_log, list(a.reshape(-1)), list(b.reshape(-1)), point)
        c_1, accepted = _run(g, srng)
        assert accepted
        assert c_1.v == int(c[i][j])


def test_triangles_128_nodes(rng):
    """128-node graph, 21 variables over F1572869 — the reference's largest
    triangle scale (triangle-counting/src/lib.rs:279-281)."""
    field = F1572869
    n = 128
    bits = 7
    upper = np.triu(
        (np.array([[rng.random() for _ in range(n)] for _ in range(n)]) < 0.5),
        k=1,
    )
    adj = upper | upper.T
    ints = adj.astype(np.int64)
    six_delta = int(((ints @ ints) * ints).sum())
    g = TriangleG.new_adj_matrix(
        2 * bits, [bool(x) for x in adj.reshape(-1)], field
    )
    assert g.num_vars() == 3 * bits
    c_1, accepted = _run(g, SeededRng(7))
    assert accepted is True
    assert c_1.v == six_delta % field.p


def _tree_circuit(depth: int, muls_at: int):
    """A fan-in-2 reduction tree: 2^depth inputs, depth gate layers with
    2^(depth-1) ... 1 gates; layer ``muls_at`` uses MUL gates (others ADD).
    Stored output-first like the reference (circuit.rs:72-79)."""
    layers = []
    for li in range(depth):
        size = 1 << li  # output layer first: 1 gate ... 2^(depth-1) gates
        kind = GateType.MUL if li == muls_at else GateType.ADD
        layers.append(
            CircuitLayer([Gate(kind, (2 * g, 2 * g + 1)) for g in range(size)])
        )
    return Circuit(layers, 1 << depth)


def test_gkr_five_layer_circuit(rng):
    """A 5-gate-layer (32-input) circuit — deeper than the reference's
    3-layer maximum (gkr-protocol/src/lib.rs:627-703). Drives the full
    protocol and checks the verifier accepts and the outputs match a host
    evaluation."""
    from tests.test_gkr import _drive_protocol

    field = F1572869
    depth = 5
    circuit = _tree_circuit(depth, muls_at=2)
    inputs = [rng.randrange(100) for _ in range(1 << depth)]
    ev = circuit.evaluate(inputs)
    # independent host recomputation of the tree
    vals = [v % field.p for v in inputs]
    for li in range(depth - 1, -1, -1):
        nxt = []
        for gi in range(1 << li):
            a, b = vals[2 * gi], vals[2 * gi + 1]
            nxt.append(
                (a * b) % field.p if li == 2 else (a + b) % field.p
            )
        vals = nxt
    assert [v % field.p for v in ev.layers[0]] == vals
    _drive_protocol(circuit, inputs, field, SeededRng(11), vals)
