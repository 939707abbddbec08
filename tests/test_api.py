"""One-call API round trips + the strict degree-check mode."""

import pytest

from thaler_study_tpu import api
from thaler_study_tpu.fields import F389, GOLDILOCKS
from thaler_study_tpu.gkr import circuit_from_book


def test_matmul_api(rng):
    n_log, n = 2, 4
    field = GOLDILOCKS
    a = [rng.randrange(field.p) for _ in range(n * n)]
    b = [rng.randrange(field.p) for _ in range(n * n)]
    claim, transcript = api.prove_matmul_entry(n_log, a, b, 1, 3, field)
    # the claim is the true product entry
    want = sum(a[1 * n + k] * b[k * n + 3] for k in range(n)) % field.p
    assert claim.v == want
    assert api.verify_matmul_entry(n_log, a, b, 1, 3, transcript, field)
    # a different entry does not verify against this transcript
    ok = True
    try:
        ok = api.verify_matmul_entry(n_log, a, b, 0, 0, transcript, field)
    except Exception:
        ok = False
    assert not ok


def test_triangle_api(rng):
    n = 4
    adj = [[False] * n for _ in range(n)]
    adj[0][1] = adj[1][0] = True
    adj[1][2] = adj[2][1] = True
    adj[0][2] = adj[2][0] = True
    flat = [x for row in adj for x in row]
    count6, transcript = api.prove_triangle_count(flat, n, F389)
    assert count6 == 6  # exactly one triangle
    assert api.verify_triangle_count(flat, n, transcript, F389)


def test_gkr_api():
    outputs, accepted = api.run_gkr(
        circuit_from_book(), [3, 2, 3, 1], F389
    )
    assert [o.v for o in outputs] == [36, 6]
    assert accepted


def test_strict_degree_mode(rng):
    """max_degree rejects an over-degree round polynomial that the lax
    (reference-parity) verifier would accept."""
    from thaler_study_tpu.sumcheck import (
        Prover,
        ProverClaimMismatch,
        SeededRng,
        UniPoly,
        Verifier,
    )
    from thaler_study_tpu.protocols import MatMulG

    field = F389
    a = [rng.randrange(field.p) for _ in range(16)]
    b = [rng.randrange(field.p) for _ in range(16)]
    point = [field.felt(rng.randrange(field.p)) for _ in range(4)]
    g = MatMulG.new(2, a, b, point, field)
    prover = Prover(g)
    verifier = Verifier(2, g, max_degree=2)
    verifier.set_c_1(prover.c_1())
    g0 = prover.round(field.one(), 0)
    # forge a degree-5 poly with matching g(0)+g(1): add c*(x^5 - x)
    c = field.felt(7)
    forged = g0 + UniPoly([(5, c), (1, -c)], field)
    assert forged.evaluate(field.zero()) + forged.evaluate(
        field.one()
    ) == g0.evaluate(field.zero()) + g0.evaluate(field.one())
    with pytest.raises(ProverClaimMismatch):
        verifier.round(forged, SeededRng(0))
    # the lax verifier (reference behavior) accepts the same forgery
    lax = Verifier(2, g)
    lax.set_c_1(prover.c_1())
    lax.round(forged, SeededRng(0))
