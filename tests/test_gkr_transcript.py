"""Non-interactive GKR transcripts: determinism, verification, tampering,
serialization round-trip, and byte-identical checkpoint/resume
(VERDICT r1 next-round #8)."""

import pytest

from thaler_study_tpu.fiat_shamir import SerializationError
from thaler_study_tpu.fields import F389, F1572869
from thaler_study_tpu.gkr import (
    GKRTranscript,
    Prover,
    Verifier,
    circuit_from_book,
    deserialize_gkr_message,
    generate_gkr_transcript,
    resume_gkr_transcript,
    serialize_gkr_message,
    verify_gkr_transcript,
)
from thaler_study_tpu.gkr.protocol import GKRError
from thaler_study_tpu.sumcheck import SumCheckError


def _book_setup(field=F389):
    circuit = circuit_from_book()
    inputs = field.felts([3, 2, 3, 1])
    return circuit, inputs


def _fresh_prover(circuit, inputs, field, use_linear=True):
    return Prover(circuit, inputs, field, use_linear=use_linear)


def test_generate_and_verify_book_circuit():
    field = F389
    circuit, inputs = _book_setup(field)
    t = generate_gkr_transcript(_fresh_prover(circuit, inputs, field), field)
    assert verify_gkr_transcript(t, Verifier(circuit, field), inputs, field)


def test_transcript_deterministic_and_linear_matches_dense():
    """Same circuit/inputs -> byte-identical transcripts, and the
    linear-time (Libra) prover emits the same bytes as the dense-W prover."""
    field = F389
    circuit, inputs = _book_setup(field)
    t1 = generate_gkr_transcript(_fresh_prover(circuit, inputs, field), field)
    t2 = generate_gkr_transcript(_fresh_prover(circuit, inputs, field), field)
    assert t1.to_bytes() == t2.to_bytes()
    t3 = generate_gkr_transcript(
        _fresh_prover(circuit, inputs, field, use_linear=False), field
    )
    assert t1.to_bytes() == t3.to_bytes()


def test_serialization_roundtrip():
    field = F389
    circuit, inputs = _book_setup(field)
    t = generate_gkr_transcript(_fresh_prover(circuit, inputs, field), field)
    blob = t.to_bytes()
    t2 = GKRTranscript.from_bytes(blob)
    assert t2.g == t.g
    for raw in t.g:
        msg = deserialize_gkr_message(raw, field)
        assert serialize_gkr_message(msg) == raw
    assert verify_gkr_transcript(t2, Verifier(circuit, field), inputs, field)


def test_tampering_detected():
    field = F389
    circuit, inputs = _book_setup(field)
    t = generate_gkr_transcript(_fresh_prover(circuit, inputs, field), field)
    for k in range(len(t.g)):
        bad = [bytes(m) for m in t.g]
        tampered = bytearray(bad[k])
        tampered[-1] ^= 1
        bad[k] = bytes(tampered)
        verifier = Verifier(circuit, field)
        try:
            ok = verify_gkr_transcript(
                GKRTranscript(bad), verifier, inputs, field
            )
        except (GKRError, SerializationError, SumCheckError, ValueError):
            continue
        assert not ok, f"tampered message {k} verified"


def test_wrong_inputs_rejected():
    field = F389
    circuit, inputs = _book_setup(field)
    t = generate_gkr_transcript(_fresh_prover(circuit, inputs, field), field)
    wrong = field.felts([3, 2, 3, 2])
    assert not verify_gkr_transcript(t, Verifier(circuit, field), wrong, field)


@pytest.mark.parametrize("use_linear", [True, False], ids=["libra", "dense"])
def test_resume_byte_identical_every_cut(use_linear):
    """Checkpoint after every possible message count, resume with a fresh
    prover, bytes must equal the uninterrupted run — for both the
    linear-time and dense-W prover paths."""
    field = F389
    circuit, inputs = _book_setup(field)
    full = generate_gkr_transcript(
        _fresh_prover(circuit, inputs, field, use_linear), field
    )
    for cut in range(len(full.g) + 1):
        partial = GKRTranscript(full.g[:cut])
        resumed = resume_gkr_transcript(
            _fresh_prover(circuit, inputs, field, use_linear), field, partial
        )
        assert resumed.to_bytes() == full.to_bytes(), f"cut={cut}"


def test_resume_verify_prefix_detects_foreign_checkpoint():
    field = F389
    circuit, inputs = _book_setup(field)
    full = generate_gkr_transcript(_fresh_prover(circuit, inputs, field), field)
    # clean resume with verification enabled
    resumed = resume_gkr_transcript(
        _fresh_prover(circuit, inputs, field),
        field,
        GKRTranscript(full.g[:3]),
        verify_prefix=True,
    )
    assert resumed.to_bytes() == full.to_bytes()
    # a checkpoint from different inputs must be rejected
    other = generate_gkr_transcript(
        Prover(circuit, F389.felts([1, 1, 2, 2]), field), field
    )
    with pytest.raises(SerializationError):
        resume_gkr_transcript(
            _fresh_prover(circuit, inputs, field),
            field,
            GKRTranscript(other.g[:3]),
            verify_prefix=True,
        )


def test_five_layer_transcript_and_resume(rng):
    """Deeper circuit (5 gate layers) over F1572869: full NI round-trip and
    a couple of resume cuts."""
    from tests.test_reference_scales import _tree_circuit

    field = F1572869
    circuit = _tree_circuit(4, muls_at=1)
    inputs = field.felts([rng.randrange(50) for _ in range(16)])
    full = generate_gkr_transcript(Prover(circuit, inputs, field), field)
    assert verify_gkr_transcript(
        full, Verifier(circuit, field), inputs, field
    )
    for cut in (1, 5, len(full.g) // 2, len(full.g) - 1):
        resumed = resume_gkr_transcript(
            Prover(circuit, inputs, field), field, GKRTranscript(full.g[:cut])
        )
        assert resumed.to_bytes() == full.to_bytes(), f"cut={cut}"
