"""Fused device GKR proving (gkr/fused.py) vs the host message loop.

The fused prover runs each layer's whole inner sumcheck — LibraW table
builds, folds, round sums, serialization, and the Fiat-Shamir challenge
chain — in two device dispatches, with the SHA-256 midstate carried as
traced state. Its output must be byte-identical to
``generate_gkr_transcript`` (the per-message host loop over the same
challenge schedule) and must verify through the unmodified interactive
verifier. Non-goldilocks fields and 1-variable layers take the exact host
fallback, which must also be byte-identical (trivially — it IS the host
path) and verified here so the dispatch logic stays honest.
"""

import random

import pytest

from thaler_study_tpu.fields import F389, GOLDILOCKS
from thaler_study_tpu.gkr import (
    Circuit,
    CircuitLayer,
    Gate,
    GateType,
    Prover,
    Verifier,
    circuit_from_book,
)
from thaler_study_tpu.gkr.fused import (
    generate_gkr_transcript_fused,
    supports_fused_gkr,
)
from thaler_study_tpu.gkr.transcript import (
    generate_gkr_transcript,
    verify_gkr_transcript,
)

# GSPMD-compile-bound file: whole-proof/sharded program compiles dominate
# its runtime on a cold cache. Excluded from the default tier (pyproject
# addopts); run with `pytest -m heavy`. tests/test_sharded_smoke.py keeps
# a fast mesh-coverage smoke in the default tier.
pytestmark = pytest.mark.heavy



def _random_circuit(depth, width_log, num_inputs_log, rng):
    layers = []
    sizes = [1 << width_log for _ in range(depth)] + [1 << num_inputs_log]
    for li in range(depth):
        next_size = sizes[li + 1]
        gates = [
            Gate(
                GateType.MUL if rng.random() < 0.5 else GateType.ADD,
                (rng.randrange(next_size), rng.randrange(next_size)),
            )
            for _ in range(sizes[li])
        ]
        layers.append(CircuitLayer(gates))
    return Circuit(layers, 1 << num_inputs_log)


def _inputs(n, field, rng):
    return field.felts([rng.randrange(1, field.p) for _ in range(n)])


@pytest.mark.parametrize("depth,width_log,inputs_log", [(2, 2, 2), (3, 3, 3)])
def test_fused_matches_host_transcript(depth, width_log, inputs_log):
    rng = random.Random(depth * 100 + width_log)
    circuit = _random_circuit(depth, width_log, inputs_log, rng)
    inputs = _inputs(1 << inputs_log, GOLDILOCKS, rng)
    assert supports_fused_gkr(circuit, GOLDILOCKS, b"")

    t_host = generate_gkr_transcript(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    t_fused = generate_gkr_transcript_fused(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    assert len(t_host.g) == len(t_fused.g)
    for i, (a, b) in enumerate(zip(t_host.g, t_fused.g)):
        assert a == b, f"message {i} differs"

    assert verify_gkr_transcript(
        t_fused, Verifier(circuit, GOLDILOCKS), inputs, GOLDILOCKS
    )


def test_fused_mixed_layer_sizes():
    """Layers of different widths compile distinct programs per shape but
    share one chain; transcript still byte-identical."""
    rng = random.Random(11)
    sizes = [2, 3, 2]  # k_i: 4-gate, 8-gate, 4-gate layers over 2^2 inputs
    layers = []
    all_sizes = [1 << s for s in sizes] + [4]
    for li in range(len(sizes)):
        next_size = all_sizes[li + 1]
        gates = [
            Gate(
                GateType.MUL if rng.random() < 0.5 else GateType.ADD,
                (rng.randrange(next_size), rng.randrange(next_size)),
            )
            for _ in range(all_sizes[li])
        ]
        layers.append(CircuitLayer(gates))
    circuit = Circuit(layers, 4)
    inputs = _inputs(4, GOLDILOCKS, rng)

    t_host = generate_gkr_transcript(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    t_fused = generate_gkr_transcript_fused(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    assert list(t_host.g) == list(t_fused.g)


@pytest.mark.slow  # minutes-long GSPMD compiles of the fused layer programs
@pytest.mark.parametrize("dcn", [1, 2, 8], ids=["1x8", "2x4", "8x1"])
def test_fused_sharded_matches_host_transcript(dcn):
    """The fused prover across a mesh (GSPMD-partitioned layer programs):
    byte-identical to the host loop and the unsharded fused path on every
    mesh shape (VERDICT r2 next-round #1, GKR half)."""
    from thaler_study_tpu.parallel import make_mesh_2d

    rng = random.Random(dcn + 17)
    circuit = _random_circuit(3, 4, 4, rng)  # 16-gate layers shard over 8
    inputs = _inputs(1 << 4, GOLDILOCKS, rng)
    t_host = generate_gkr_transcript(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    mesh = make_mesh_2d(dcn_size=dcn)
    t_sharded = generate_gkr_transcript_fused(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS, mesh=mesh
    )
    assert list(t_host.g) == list(t_sharded.g)
    assert verify_gkr_transcript(
        t_sharded, Verifier(circuit, GOLDILOCKS), inputs, GOLDILOCKS
    )


def test_fused_sharded_mixed_small_layers():
    """Layers too small to split (2^k < mesh size) replicate while larger
    ones shard — one proof can mix placements; transcript unchanged."""
    from thaler_study_tpu.parallel import make_mesh

    rng = random.Random(29)
    sizes = [2, 4, 2]  # 4-gate (replicated), 16-gate (sharded), 4-gate
    layers = []
    all_sizes = [1 << s for s in sizes] + [8]
    for li in range(len(sizes)):
        next_size = all_sizes[li + 1]
        gates = [
            Gate(
                GateType.MUL if rng.random() < 0.5 else GateType.ADD,
                (rng.randrange(next_size), rng.randrange(next_size)),
            )
            for _ in range(all_sizes[li])
        ]
        layers.append(CircuitLayer(gates))
    circuit = Circuit(layers, 8)
    inputs = _inputs(8, GOLDILOCKS, rng)
    t_host = generate_gkr_transcript(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    t_sharded = generate_gkr_transcript_fused(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS, mesh=make_mesh()
    )
    assert list(t_host.g) == list(t_sharded.g)


def test_fused_fallback_non_goldilocks():
    """mont32 fields are out of fused scope -> exact host fallback."""
    circuit = circuit_from_book()
    inputs = F389.felts([3, 2, 3, 1])
    assert not supports_fused_gkr(circuit, F389, b"")
    t = generate_gkr_transcript_fused(Prover(circuit, inputs, F389), F389)
    t_host = generate_gkr_transcript(Prover(circuit, inputs, F389), F389)
    assert list(t.g) == list(t_host.g)


def test_fused_fallback_small_layer():
    """A k=1 next layer (2 inputs) is below fused scope -> host fallback."""
    rng = random.Random(3)
    layers = [
        CircuitLayer(
            [
                Gate(GateType.ADD, (0, 1)),
                Gate(GateType.MUL, (0, 1)),
            ]
        )
    ]
    circuit = Circuit(layers, 2)
    inputs = _inputs(2, GOLDILOCKS, rng)
    assert not supports_fused_gkr(circuit, GOLDILOCKS, b"")
    t = generate_gkr_transcript_fused(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    t_host = generate_gkr_transcript(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    assert list(t.g) == list(t_host.g)


@pytest.mark.slow  # fresh scan-variant layer programs compile for minutes on CPU
def test_fused_scan_mode_byte_identical():
    """The fused layer programs under gkr_scatter_mode='scan' (sort +
    prefix-scan phase builds, no scatter op) emit the byte-identical
    transcript."""
    from thaler_study_tpu.utils.config import FrameworkConfig, use_config

    rng = random.Random(42)
    circuit = _random_circuit(2, 3, 3, rng)
    inputs = _inputs(8, GOLDILOCKS, rng)
    t_ref = generate_gkr_transcript_fused(
        Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
    )
    with use_config(FrameworkConfig(gkr_scatter_mode="scan")):
        t_scan = generate_gkr_transcript_fused(
            Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
        )
    assert [m.hex() for m in t_scan.g] == [m.hex() for m in t_ref.g]


def test_line_restrict_coeffs_bit_identical():
    """The symbolic coefficient fold (device_tables.line_restrict_coeffs,
    the r5 default — ~16x fewer muls) must produce bit-identical line
    restriction coefficients to the k+1-evaluation + exact-interpolation
    form it replaced (both are exact mod p, so equality is exact)."""
    import numpy as np

    from thaler_study_tpu.fields import FArray
    from thaler_study_tpu.gkr.device_tables import (
        dot_mod,
        eq_table_dev,
        line_restrict_coeffs,
    )
    from thaler_study_tpu.ops.fs_kernel import _interp_coeffs

    nrng = np.random.default_rng(7)
    for k in (2, 3, 5, 8):
        w = FArray.from_ints(
            nrng.integers(0, GOLDILOCKS.p, 1 << k, dtype=np.uint64),
            GOLDILOCKS,
        )
        u = FArray.from_ints(
            nrng.integers(0, GOLDILOCKS.p, k, dtype=np.uint64), GOLDILOCKS
        )
        c = FArray.from_ints(
            nrng.integers(0, GOLDILOCKS.p, k, dtype=np.uint64), GOLDILOCKS
        )
        delta = c - u
        qc = line_restrict_coeffs(w, u, delta, k)
        evals = []
        for t in range(k + 1):
            t_s = FArray.from_ints([t], GOLDILOCKS).reshape(())
            point = u + delta * t_s
            evals.append(dot_mod(w, eq_table_dev(point, k)))
        import jax.numpy as jnp

        q_vals = FArray(
            tuple(
                jnp.stack([e.limbs[i] for e in evals]) for i in range(2)
            ),
            GOLDILOCKS,
        )
        ref, _ = _interp_coeffs(q_vals, k)
        got = qc.to_ints()
        want = [int(lo) | (int(hi) << 32) for lo, hi in ref]
        assert [int(x) for x in got] == want, f"k={k}"


def test_scan_proof_single_dispatch_byte_identical():
    """The whole-proof layer scan (fused._scan_proof_jit — ONE dispatch
    for every layer of a uniform-width circuit, the r5 enqueue-drag
    killer) must emit the byte-identical transcript to the per-layer
    dispatch path (forced via segment mode) and the host message loop."""
    from thaler_study_tpu.gkr.fused import _scan_supported
    from thaler_study_tpu.utils.config import FrameworkConfig, use_config

    rng = random.Random(11)
    circuit = _random_circuit(3, 3, 3, rng)  # uniform 2^3 widths
    inputs = _inputs(8, GOLDILOCKS, rng)
    t_host = generate_gkr_transcript(Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS)
    with use_config(FrameworkConfig(gkr_scatter_mode="scan")):
        lane_bits = [16] * len(circuit.layers)
        assert _scan_supported(circuit, "scan", lane_bits, None)
        t_scan = generate_gkr_transcript_fused(
            Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
        )
    with use_config(FrameworkConfig(gkr_scatter_mode="segment")):
        t_layer = generate_gkr_transcript_fused(
            Prover(circuit, inputs, GOLDILOCKS), GOLDILOCKS
        )
    assert [m.hex() for m in t_scan.g] == [m.hex() for m in t_host.g]
    assert [m.hex() for m in t_layer.g] == [m.hex() for m in t_host.g]

    # mixed layer sizes must NOT take the scan path (falls back per-layer)
    mixed = _random_circuit(2, 3, 2, rng)
    assert not _scan_supported(mixed, "scan", [16, 16], None)
    mi = _inputs(4, GOLDILOCKS, rng)
    t_mixed = generate_gkr_transcript_fused(
        Prover(mixed, mi, GOLDILOCKS), GOLDILOCKS
    )
    t_mixed_host = generate_gkr_transcript(
        Prover(mixed, mi, GOLDILOCKS), GOLDILOCKS
    )
    assert [m.hex() for m in t_mixed.g] == [m.hex() for m in t_mixed_host.g]
