"""Strict-soundness mode: checks the reference OMITS (final-round
sum-consistency, sum-check-protocol/src/lib.rs:298-310; the q-degree TODO
at gkr-protocol/src/lib.rs:149-151) are enforced under ``strict=True`` and
stay un-enforced by default (behavior parity with the reference).

Each tamper test constructs a cheating prover that predicts the verifier's
challenges (possible here because SeededRng draws do not depend on the
messages) and forges a final message every DEFAULT verifier accepts; only
strict mode rejects it."""

import pytest

from thaler_study_tpu.fields import F389, Felt
from thaler_study_tpu.gkr import (
    Circuit,
    CircuitLayer,
    Gate,
    GateType,
    GKRError,
    Prover as GKRProver,
    Verifier as GKRVerifier,
)
from thaler_study_tpu.gkr.protocol import FinalRoundMessage, R
from thaler_study_tpu.sumcheck import (
    FinalRound,
    JthRound,
    Prover,
    ProverClaimMismatch,
    SeededRng,
    SparseMultiPoly,
    UniPoly,
    Verifier,
)


def _lagrange3(points, field):
    """The unique quadratic through three (x, y) points (host Felt math)."""
    out = UniPoly.zero(field)
    for i, (xi, yi) in enumerate(points):
        num = UniPoly.from_coeffs([yi], field)
        for j, (xj, _) in enumerate(points):
            if i == j:
                continue
            inv = (xi - xj).inverse()
            num = num * UniPoly.from_coeffs([-xj * inv, inv], field)
        out = out + num
    return out


def _book_poly():
    """2*x1^3 + x1*x3 + x2*x3 over F389 (3 variables)."""
    return SparseMultiPoly(
        3,
        [
            (F389.felt(2), [(0, 3)]),
            (F389.felt(1), [(0, 1), (2, 1)]),
            (F389.felt(1), [(1, 1), (2, 1)]),
        ],
        F389,
    )


def _forged_final_messages():
    """Honest messages g_1..g_{n-1} plus a forged g_n with the correct
    oracle evaluation g_n(r_n) but an inconsistent g_n(0) + g_n(1)."""
    field = F389
    g = _book_poly()
    n = g.num_vars()
    # honest pass to learn the challenge stream
    rng = SeededRng(3)
    challenges = [rng.draw(field) for _ in range(n)]
    prover = Prover(_book_poly())
    msgs = [prover.round(field.one(), 0)]
    for j in range(1, n):
        msgs.append(prover.round(challenges[j - 1], j))
    # forge the last message: right value at r_n, wrong sum at {0, 1}
    r_n = challenges[-1]
    oracle = g.evaluate(challenges)
    honest_last = msgs[-1]
    bad_sum0 = honest_last.evaluate(field.zero()) + field.one()
    forged = _lagrange3(
        [
            (field.zero(), bad_sum0),
            (field.one(), honest_last.evaluate(field.one())),
            (r_n, oracle),
        ],
        field,
    )
    assert forged.evaluate(r_n) == oracle
    msgs[-1] = forged
    return msgs, Prover(_book_poly()).c_1()


def _drive(verifier, msgs, rng):
    res = None
    for m in msgs:
        res = verifier.round(m, rng)
    return res


def test_default_accepts_forged_final_round():
    """Parity: the reference-shaped verifier only checks the oracle
    evaluation in its final round, so the forgery passes."""
    msgs, c_1 = _forged_final_messages()
    v = Verifier(3, _book_poly())
    v.set_c_1(c_1)
    res = _drive(v, msgs, SeededRng(3))
    assert isinstance(res, FinalRound) and res.accepted


def test_strict_rejects_forged_final_round():
    msgs, c_1 = _forged_final_messages()
    v = Verifier(3, _book_poly(), strict=True)
    v.set_c_1(c_1)
    with pytest.raises(ProverClaimMismatch):
        _drive(v, msgs, SeededRng(3))


def test_strict_accepts_honest_run():
    """Strict mode changes nothing for an honest prover."""
    field = F389
    g = _book_poly()
    prover = Prover(_book_poly())
    v = Verifier(3, g, strict=True, max_degree=3)
    v.set_c_1(prover.c_1())
    rng = SeededRng(3)
    r_j = field.one()
    for j in range(3):
        res = v.round(prover.round(r_j, j), rng)
        if isinstance(res, JthRound):
            r_j = res.r
    assert isinstance(res, FinalRound) and res.accepted


def _forged_overdegree_middle():
    """Honest messages except g_2 is replaced by g_2 + x(x-1)(x-r_2): the
    vanishing factor preserves g_2(0), g_2(1) and g_2(r_2), so every sum /
    oracle check still passes — but deg(g_2') = 3 > deg_{x_2}(g) = 1."""
    field = F389
    n = 3
    rng = SeededRng(3)
    challenges = [rng.draw(field) for _ in range(n)]
    prover = Prover(_book_poly())
    msgs = [prover.round(field.one(), 0)]
    for j in range(1, n):
        msgs.append(prover.round(challenges[j - 1], j))
    r_2 = challenges[1]
    vanish = UniPoly.from_coeffs(
        [field.zero(), r_2, -(field.one() + r_2), field.one()], field
    )
    forged = msgs[1] + vanish
    assert forged.evaluate(field.zero()) == msgs[1].evaluate(field.zero())
    assert forged.evaluate(field.one()) == msgs[1].evaluate(field.one())
    assert forged.evaluate(r_2) == msgs[1].evaluate(r_2)
    assert forged.degree() == 3
    msgs[1] = forged
    return msgs, Prover(_book_poly()).c_1()


def test_default_accepts_overdegree_middle_round():
    """Parity: the reference never bounds deg(g_j), so the forgery passes."""
    msgs, c_1 = _forged_overdegree_middle()
    v = Verifier(3, _book_poly())
    v.set_c_1(c_1)
    res = _drive(v, msgs, SeededRng(3))
    assert isinstance(res, FinalRound) and res.accepted


def test_strict_rejects_overdegree_middle_round_no_args():
    """strict=True alone (no max_degree) now derives deg_{x_j}(g) from the
    oracle's structure and rejects the over-degree middle round."""
    msgs, c_1 = _forged_overdegree_middle()
    v = Verifier(3, _book_poly(), strict=True)
    v.set_c_1(c_1)
    with pytest.raises(ProverClaimMismatch, match="degree bound"):
        _drive(v, msgs, SeededRng(3))


def test_strict_self_derived_bound_accepts_honest_run():
    """strict with no max_degree: honest degrees (3, 1, 1) all pass."""
    field = F389
    g = _book_poly()
    assert [g.round_degree(j) for j in range(3)] == [3, 1, 1]
    prover = Prover(_book_poly())
    v = Verifier(3, g, strict=True)
    v.set_c_1(prover.c_1())
    rng = SeededRng(3)
    r_j = field.one()
    for j in range(3):
        res = v.round(prover.round(r_j, j), rng)
        if isinstance(res, JthRound):
            r_j = res.r
    assert isinstance(res, FinalRound) and res.accepted


def test_product_poly_round_degrees():
    """PolySpec round degrees: 2-factor product over one 3-var block is
    degree 2 each round; a triangle-style 3-block spec steps 2/2/2 per
    block phase (each factor pair shares the active block)."""
    from thaler_study_tpu.ops.round_kernel import PolySpec

    spec = PolySpec(
        block_sizes=(3,), table_blocks=((0,), (0,)), terms=((0, 1),)
    )
    assert spec.round_degrees() == (2, 2, 2)
    tri = PolySpec(
        block_sizes=(1, 1, 1),
        table_blocks=((0, 1), (1, 2), (0, 2)),
        terms=((0, 1, 2),),
    )
    assert tri.round_degrees() == (2, 2, 2)


# ---------------------------------------------------------------------------
# GKR: the q-degree TODO (ref gkr-protocol/src/lib.rs:149-151)
# ---------------------------------------------------------------------------


def _book_circuit():
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


def _drive_gkr_tampered(strict: bool):
    """Full GKR run over the book circuit with layer-0's final q replaced
    by q' = q + x (x-1) (x - r_star): q'(0), q'(1), q'(r_star) all match q,
    so every default check (and the rest of the protocol) still passes —
    but deg(q') = 3 > k = 2."""
    field = F389
    circuit = _book_circuit()
    inputs = field.felts([3, 2, 3, 1])
    prover = GKRProver(circuit, inputs, field)
    verifier = GKRVerifier(circuit, field, strict=strict)
    rng = SeededRng(0)

    # predict r_star of layer 0: draws before it are num_vars_at(0) (Begin)
    # + (2k - 1) inner rounds + 1 final_random_point
    k = circuit.num_vars_at(1)
    peek = SeededRng(0)
    for _ in range(circuit.num_vars_at(0) + 2 * k):
        peek.draw(field)
    r_star = peek.draw(field)

    msg = prover.start_protocol()
    r_i = verifier.receive_prover_msg(msg, rng).r
    for i in range(len(circuit.layers)):
        msg = prover.start_round(i, r_i)
        num_vars = 2 * circuit.num_vars_at(i + 1)
        verifier.receive_prover_msg(msg, rng)
        for j in range(num_vars - 1):
            vm = verifier.receive_prover_msg(prover.round_msg(j), rng)
            prover.receive_verifier_msg(vm)
        last = verifier.final_random_point(rng)
        prover.receive_verifier_msg(last)
        final = prover.round_msg(num_vars - 1)
        if i == 0:
            assert isinstance(final, FinalRoundMessage)
            # x (x - 1) (x - r_star) = x^3 - (1 + r*) x^2 + r* x
            vanish = UniPoly.from_coeffs(
                [field.zero(), r_star, -(field.one() + r_star), field.one()],
                field,
            )
            q_bad = final.q + vanish
            assert q_bad.evaluate(field.zero()) == final.q.evaluate(field.zero())
            assert q_bad.evaluate(r_star) == final.q.evaluate(r_star)
            assert q_bad.degree() == 3 > k
            final = FinalRoundMessage(p=final.p, q=q_bad)
        vm = verifier.receive_prover_msg(final, rng)
        assert isinstance(vm, R)
        r_i = vm.r
    return verifier.check_input(inputs)


def test_default_accepts_overdegree_q():
    assert _drive_gkr_tampered(strict=False)


def test_strict_rejects_overdegree_q():
    with pytest.raises(GKRError, match="deg\\(q\\)"):
        _drive_gkr_tampered(strict=True)


def test_strict_gkr_honest_run():
    """Strict mode accepts the honest book-circuit protocol end to end."""
    field = F389
    circuit = _book_circuit()
    inputs = field.felts([3, 2, 3, 1])
    prover = GKRProver(circuit, inputs, field)
    verifier = GKRVerifier(circuit, field, strict=True)
    rng = SeededRng(0)
    msg = prover.start_protocol()
    r_i = verifier.receive_prover_msg(msg, rng).r
    for i in range(len(circuit.layers)):
        msg = prover.start_round(i, r_i)
        num_vars = 2 * circuit.num_vars_at(i + 1)
        verifier.receive_prover_msg(msg, rng)
        for j in range(num_vars - 1):
            vm = verifier.receive_prover_msg(prover.round_msg(j), rng)
            prover.receive_verifier_msg(vm)
        last = verifier.final_random_point(rng)
        prover.receive_verifier_msg(last)
        vm = verifier.receive_prover_msg(prover.round_msg(num_vars - 1), rng)
        r_i = vm.r
    assert verifier.check_input(inputs)
