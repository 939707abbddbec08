"""Linear-time GKR: transcript identity with the dense-W path + scale."""

import random

import pytest

import numpy as np

from thaler_study_tpu.fields import F389, GOLDILOCKS
from thaler_study_tpu.gkr import (
    Circuit,
    CircuitLayer,
    Gate,
    GateType,
    Prover,
    R,
    Verifier,
    circuit_from_book,
)
from thaler_study_tpu.sumcheck import SeededRng

# GSPMD-compile-bound file: whole-proof/sharded program compiles dominate
# its runtime on a cold cache. Excluded from the default tier (pyproject
# addopts); run with `pytest -m heavy`. tests/test_sharded_smoke.py keeps
# a fast mesh-coverage smoke in the default tier.
pytestmark = pytest.mark.heavy



def _random_circuit(depth, width_log, num_inputs_log, rng):
    """Random layered circuit with power-of-two layer widths."""
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


def _drive(circuit, inputs, field, seed, use_linear):
    """Run the full protocol, recording every prover message."""
    rng = SeededRng(seed)
    felt_inputs = field.felts(inputs)
    prover = Prover(circuit, felt_inputs, field, use_linear=use_linear)
    log = []

    msg = prover.start_protocol()
    log.append([f.v for f in msg.circuit_outputs])
    verifier = Verifier(circuit, field)
    r_i = verifier.receive_prover_msg(msg, rng).r

    for i in range(len(circuit.layers)):
        msg = prover.start_round(i, r_i)
        log.append(("c1", msg.c_1.v, msg.num_vars))
        num_vars = 2 * circuit.num_vars_at(i + 1)
        verifier.receive_prover_msg(msg, rng)
        for j in range(num_vars - 1):
            pm = prover.round_msg(j)
            log.append(("p", tuple((d, c.v) for d, c in pm.p.terms)))
            vm = verifier.receive_prover_msg(pm, rng)
            prover.receive_verifier_msg(vm)
        prover.receive_verifier_msg(verifier.final_random_point(rng))
        pm = prover.round_msg(num_vars - 1)
        log.append(("pq", tuple((d, c.v) for d, c in pm.p.terms),
                    tuple((d, c.v) for d, c in pm.q.terms)))
        vm = verifier.receive_prover_msg(pm, rng)
        assert isinstance(vm, R)
        r_i = vm.r

    assert verifier.check_input(felt_inputs)
    return log


def test_linear_matches_dense_book():
    circuit = circuit_from_book()
    log_dense = _drive(circuit, [3, 2, 3, 1], F389, 7, use_linear=False)
    log_linear = _drive(circuit, [3, 2, 3, 1], F389, 7, use_linear=True)
    assert log_dense == log_linear


def test_linear_matches_dense_random():
    rng = random.Random(5)
    for field in (F389, GOLDILOCKS):
        circuit = _random_circuit(3, 3, 3, rng)
        inputs = [rng.randrange(field.p) for _ in range(8)]
        log_dense = _drive(circuit, inputs, field, 11, use_linear=False)
        log_linear = _drive(circuit, inputs, field, 11, use_linear=True)
        assert log_dense == log_linear


def test_linear_larger_circuit():
    """A circuit too wide for the dense path's 4^k tables to be pleasant
    (width 2^7 -> dense (b,c) grid 2^14 per entry of 2^7-var a-grid) runs
    end-to-end with the linear prover + sparse verifier."""
    rng = random.Random(1)
    field = GOLDILOCKS
    circuit = _random_circuit(3, 7, 7, rng)
    inputs = [rng.randrange(field.p) for _ in range(1 << 7)]
    _drive(circuit, inputs, field, 13, use_linear=True)


def test_sharded_gkr_matches_local():
    """GKR over the 8-device mesh == single-device, message for message."""
    from thaler_study_tpu.parallel import make_mesh

    rng = random.Random(21)
    field = GOLDILOCKS
    circuit = _random_circuit(2, 5, 5, rng)
    inputs = [rng.randrange(field.p) for _ in range(1 << 5)]

    def drive(mesh):
        srng = SeededRng(3)
        felt_inputs = field.felts(inputs)
        prover = Prover(circuit, felt_inputs, field, mesh=mesh, n_shard=3)
        log = []
        msg = prover.start_protocol()
        verifier = Verifier(circuit, field)
        r_i = verifier.receive_prover_msg(msg, srng).r
        for i in range(len(circuit.layers)):
            msg = prover.start_round(i, r_i)
            log.append(msg.c_1.v)
            nv = 2 * circuit.num_vars_at(i + 1)
            verifier.receive_prover_msg(msg, srng)
            for j in range(nv - 1):
                pm = prover.round_msg(j)
                log.append(tuple((d, c.v) for d, c in pm.p.terms))
                vm = verifier.receive_prover_msg(pm, srng)
                prover.receive_verifier_msg(vm)
            prover.receive_verifier_msg(verifier.final_random_point(srng))
            pm = prover.round_msg(nv - 1)
            log.append(tuple((d, c.v) for d, c in pm.p.terms))
            vm = verifier.receive_prover_msg(pm, srng)
            r_i = vm.r
        assert verifier.check_input(felt_inputs)
        return log

    local = drive(None)
    sharded = drive(make_mesh())
    assert local == sharded


def test_device_tables_transcript_identical_to_host(rng):
    """The device-side bookkeeping (segment_sum scatters, device eq tables,
    device forward pass — gkr/device_tables.py) must produce byte-identical
    GKR transcripts to the host C++ runtime path, for both backends."""
    from thaler_study_tpu.fields import F1572869, GOLDILOCKS
    from thaler_study_tpu.gkr import Prover, generate_gkr_transcript
    from thaler_study_tpu.utils import FrameworkConfig, use_config
    from tests.test_reference_scales import _tree_circuit

    circuit = _tree_circuit(3, muls_at=1)
    for field in (GOLDILOCKS, F1572869):
        inputs = field.felts([rng.randrange(100) for _ in range(8)])
        with use_config(FrameworkConfig(gkr_device_tables=True)):
            t_dev = generate_gkr_transcript(
                Prover(circuit, inputs, field), field
            )
        with use_config(FrameworkConfig(gkr_device_tables=False)):
            t_host = generate_gkr_transcript(
                Prover(circuit, inputs, field), field
            )
        assert t_dev.to_bytes() == t_host.to_bytes(), field.name


def test_device_scatter_and_eq_exact(rng):
    """Device scatter_add_mod / eq_table_dev equal the host runtime."""
    import jax.numpy as jnp
    import numpy as np

    from thaler_study_tpu import runtime
    from thaler_study_tpu.fields import F389, GOLDILOCKS, FArray
    from thaler_study_tpu.gkr.device_tables import (
        eq_table_dev,
        scatter_add_mod,
    )

    for field in (GOLDILOCKS, F389):
        p = field.p
        # eq table
        rs = [rng.randrange(p) for _ in range(4)]
        host = runtime.eq_table(rs, p)
        dev = eq_table_dev(
            FArray.from_ints(np.array(rs, dtype=object), field), 4
        )
        assert [int(v) for v in dev.to_ints()] == [int(v) for v in host]
        # scatter with heavy collisions (all into few cells)
        m, size = 500, 8
        idx = np.array([rng.randrange(size) for _ in range(m)], dtype=np.int32)
        vals = np.array([rng.randrange(p) for _ in range(m)], dtype=object)
        host = runtime.scatter_add(
            idx.astype(np.int64), np.array(vals, dtype=np.uint64), size, p
        )
        dev = scatter_add_mod(
            jnp.asarray(idx), FArray.from_ints(vals, field), size
        )
        assert [int(v) for v in dev.to_ints()] == [int(v) for v in host]


def test_gather_plan_matches_scatter():
    """The host-precomputed gather plan (scatter inverted to dense gathers
    + 16-bit lane sums) produces the exact scatter_add_mod_many grids,
    including empty cells, repeated indices, and multi-table packing."""
    import jax.numpy as jnp
    import numpy as np

    from thaler_study_tpu.fields import GOLDILOCKS, FArray
    from thaler_study_tpu.gkr.device_tables import (
        gather_add_mod_many,
        gather_plan,
        scatter_add_mod_many,
    )

    rng = np.random.default_rng(3)
    g, size = 300, 64
    idx = jnp.asarray(
        np.concatenate(
            [rng.integers(0, size, g - 8), np.full(8, 17)]  # hot cell
        ).astype(np.int32)
    )
    vals = [
        FArray(
            (
                jnp.asarray(rng.integers(0, 1 << 32, g).astype(np.uint32)),
                jnp.asarray(rng.integers(0, 1 << 31, g).astype(np.uint32)),
            ),
            GOLDILOCKS,
        )
        for _ in range(2)
    ]
    want = scatter_add_mod_many(np.asarray(idx), tuple(vals), size)
    plan = jnp.asarray(gather_plan(np.asarray(idx), size))
    got = gather_add_mod_many(plan, tuple(vals))
    for w, a in zip(want, got):
        assert [int(x) for x in w.to_ints()] == [int(x) for x in a.to_ints()]


def test_scan_plan_matches_scatter():
    """The sort + prefix-scan scatter-add (scan_add_mod_many — no scatter
    op at all) produces the exact scatter_add_mod_many grids, including
    empty cells, a hot cell, and multi-table packing, for both backends."""
    import jax.numpy as jnp
    import numpy as np

    from thaler_study_tpu.fields import F1572869, GOLDILOCKS, FArray
    from thaler_study_tpu.gkr.device_tables import (
        scan_add_mod_many,
        scan_plan,
        scatter_add_mod_many,
    )

    rng = np.random.default_rng(7)
    g, size = 300, 64
    idx = np.concatenate(
        [rng.integers(0, size, g - 40), np.full(40, 5)]  # hot cell
    ).astype(np.int32)

    vals_gl = [
        FArray(
            (
                jnp.asarray(rng.integers(0, 1 << 32, g).astype(np.uint32)),
                jnp.asarray(rng.integers(0, 1 << 31, g).astype(np.uint32)),
            ),
            GOLDILOCKS,
        )
        for _ in range(2)
    ]
    vals_m32 = [
        FArray.from_ints(
            rng.integers(0, F1572869.p, g).astype(np.uint64), F1572869
        )
    ]
    for vals in (vals_gl, vals_m32):
        want = scatter_add_mod_many(idx, tuple(vals), size)
        order, starts = scan_plan(idx, size)
        got = scan_add_mod_many(
            jnp.asarray(order), jnp.asarray(starts), tuple(vals)
        )
        for w, a in zip(want, got):
            assert [int(x) for x in w.to_ints()] == [
                int(x) for x in a.to_ints()
            ]


def test_scan_mode_transcript_identical():
    """The full GKR protocol under gkr_scatter_mode='scan' (sort +
    prefix-scan phase builds) logs messages identical to the segment_sum
    default — on the book circuit and a random goldilocks circuit."""
    from thaler_study_tpu.utils.config import FrameworkConfig, use_config

    circuit = circuit_from_book()
    with use_config(FrameworkConfig(gkr_scatter_mode="scan")):
        log_scan = _drive(circuit, [3, 2, 3, 1], F389, 7, use_linear=True)
    log_seg = _drive(circuit, [3, 2, 3, 1], F389, 7, use_linear=True)
    assert log_scan == log_seg

    rng = random.Random(11)
    circuit = _random_circuit(2, 4, 3, rng)
    inputs = [rng.randrange(1 << 30) for _ in range(8)]
    with use_config(FrameworkConfig(gkr_scatter_mode="scan")):
        log_scan = _drive(circuit, inputs, GOLDILOCKS, 3, use_linear=True)
    log_seg = _drive(circuit, inputs, GOLDILOCKS, 3, use_linear=True)
    assert log_scan == log_seg


def test_scan_add_cumsum_core_worst_case_exact():
    """The r5 cumsum scan core relies on wrapped u32 prefix differences
    being exact when each cell's true lane sum is < 2^32. Drive the
    worst case the 16-bit-lane bound permits — EVERY gate feeding one
    cell with all-ones lanes — plus the assoc-core A/B, against a
    python-bigint oracle."""
    import numpy as np
    import jax.numpy as jnp

    from thaler_study_tpu.fields import GOLDILOCKS, FArray
    from thaler_study_tpu.gkr.device_tables import (
        scan_add_mod_many,
        scan_plan,
        set_scan_core,
    )

    g, size = 1 << 10, 1 << 10
    idx = np.zeros(g, np.int64)  # max fan-in: every gate -> cell 0
    # all-ones 16-bit lanes in both limbs: the largest per-lane values
    vals = FArray(
        (
            jnp.full((g,), np.uint32(0xFFFFFFFF)),
            jnp.full((g,), np.uint32(0x7FFFFFFF)),
        ),
        GOLDILOCKS,
    )
    p = GOLDILOCKS.p
    want = [0] * size
    raw = (0xFFFFFFFF | (0x7FFFFFFF << 32)) % p
    want[0] = (g * raw) % p
    order, starts = scan_plan(idx, size)
    order, starts = jnp.asarray(order), jnp.asarray(starts)
    try:
        for core in ("cumsum", "assoc"):
            set_scan_core(core)
            (got,) = scan_add_mod_many(order, starts, (vals,))
            assert [int(x) for x in got.to_ints()] == want, core
    finally:
        set_scan_core("cumsum")
