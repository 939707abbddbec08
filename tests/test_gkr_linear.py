"""Linear-time GKR: transcript identity with the dense-W path + scale."""

import random

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
