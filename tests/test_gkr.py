"""GKR protocol tests (mirrors gkr-protocol/src/{lib,circuit}.rs tests)."""

from thaler_study_tpu.fields import F389
from thaler_study_tpu.gkr import (
    Circuit,
    CircuitLayer,
    Gate,
    GateType,
    Prover,
    R,
    Verifier,
    circuit_from_book,
    restrict_poly,
)
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.sumcheck import SeededRng


def test_circuit_from_book():
    """Fig. 4.12 evaluation layers + mul_1 truth table sweep
    (ref circuit.rs:259-284)."""
    circuit = circuit_from_book()
    ev = circuit.evaluate([3, 2, 3, 1])
    assert ev.layers == [[36, 6], [9, 4, 6, 1], [3, 2, 3, 1]]
    for a in range(4):
        for b in range(4):
            for c in range(4):
                expected = (
                    ((a == 0 or a == 1) and a == b and a == c)
                    or (a == 2 and b == 1 and c == 2)
                    or (a == b and b == c and a == 3)
                )
                assert circuit.mul_i(1, a, b, c) == expected


def test_circuit_device_evaluation():
    """Device forward pass matches the host loop on the book circuit."""
    from thaler_study_tpu.fields import FArray

    circuit = circuit_from_book()
    inputs = FArray.from_ints([3, 2, 3, 1], F389)
    layers = circuit.evaluate_device(inputs)
    got = [[int(v) for v in l.to_ints()] for l in layers]
    assert got == [[36, 6], [9, 4, 6, 1], [3, 2, 3, 1]]


def test_restrict_poly_golden():
    """Golden coefficients [32, 385, 383] over F389 (ref :506-548)."""
    b = F389.felts([2, 4])
    c = F389.felts([3, 2])
    evals = F389.felts([0, 0, 2, 5])
    mle = DenseMLE.from_evals_lsb(evals, 2, F389)
    poly = restrict_poly(b, c, mle)
    assert [co.v for co in poly.coeffs_dense()] == [32, 385, 383]


def _drive_protocol(circuit, inputs, field, rng, expected_outputs=None):
    """The reference's end-to-end driver loop (ref :551-624)."""
    felt_inputs = field.felts(inputs)
    prover = Prover(circuit, felt_inputs, field)

    msg = prover.start_protocol()
    if expected_outputs is not None:
        assert [o.v for o in msg.circuit_outputs] == expected_outputs

    verifier = Verifier(circuit, field)
    vmsg = verifier.receive_prover_msg(msg, rng)
    assert isinstance(vmsg, R)
    r_i = vmsg.r

    for i in range(len(circuit.layers)):
        msg = prover.start_round(i, r_i)
        num_vars = 2 * circuit.num_vars_at(i + 1)
        verifier.receive_prover_msg(msg, rng)

        for j in range(num_vars - 1):
            prover_msg = prover.round_msg(j)
            verifier_msg = verifier.receive_prover_msg(prover_msg, rng)
            prover.receive_verifier_msg(verifier_msg)

        last_rand = verifier.final_random_point(rng)
        prover.receive_verifier_msg(last_rand)

        prover_msg = prover.round_msg(num_vars - 1)
        verifier_msg = verifier.receive_prover_msg(prover_msg, rng)
        assert isinstance(verifier_msg, R)
        r_i = verifier_msg.r

    assert verifier.check_input(felt_inputs)


def test_protocol_from_book():
    """Full GKR on the fig. 4.12 circuit over F389, outputs [36, 6]
    (ref protocol_test_from_book :551-624)."""
    _drive_protocol(
        circuit_from_book(), [3, 2, 3, 1], F389, SeededRng(0), [36, 6]
    )


def _three_layer_circuit():
    return Circuit(
        [
            CircuitLayer(
                [Gate(GateType.ADD, (0, 1)), Gate(GateType.ADD, (2, 3))]
            ),
            CircuitLayer(
                [
                    Gate(GateType.ADD, (0, 1)),
                    Gate(GateType.ADD, (2, 3)),
                    Gate(GateType.ADD, (4, 5)),
                    Gate(GateType.ADD, (6, 7)),
                ]
            ),
        ],
        8,
    )


def test_three_layer_protocol():
    """All-Add 3-layer circuit over F389, outputs [2, 2]
    (ref three_layer_protocol_test :627-703)."""
    _drive_protocol(
        _three_layer_circuit(),
        [0, 1, 0, 1, 0, 1, 0, 1],
        F389,
        SeededRng(1),
        [2, 2],
    )


def test_wiring_ext_matches_dense_reference():
    """The sparse eq-scatter add_i_ext equals the reference's dense
    truth-table + fold construction."""
    import random

    circuit = circuit_from_book()
    rng = random.Random(4)
    for i in range(2):
        k_cur = circuit.num_vars_at(i)
        k_next = circuit.num_vars_at(i + 1)
        r_i = [F389.felt(rng.randrange(389)) for _ in range(k_cur)]
        for want_mul, ext in ((False, circuit.add_i_ext), (True, circuit.mul_i_ext)):
            sparse = ext(r_i, i)
            # dense reference construction (circuit.rs:163-181)
            table = []
            for c in range(1 << k_next):
                for b in range(1 << k_next):
                    for a in range(1 << k_cur):
                        pred = (
                            circuit.mul_i(i, a, b, c)
                            if want_mul
                            else circuit.add_i(i, a, b, c)
                        )
                        table.append(F389.one() if pred else F389.zero())
            dense = DenseMLE.from_evals_lsb(
                table, k_cur + 2 * k_next, F389
            ).fix_variables(r_i)
            assert sparse.to_evaluations() == dense.to_evaluations()
