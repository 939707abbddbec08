"""Fiat-Shamir tests: RFC 9380 expander vectors, serialization layout,
and non-interactive protocol round-trips (mirrors fiat-shamir/src/lib.rs
tests plus byte-level checks)."""

import random

import pytest

from thaler_study_tpu.fields import F5, F389, GOLDILOCKS, Felt
from thaler_study_tpu.fiat_shamir import (
    DefaultFieldHasher,
    FiatShamirTranscript,
    SumcheckInteractiveProver,
    SumcheckInteractiveVerifier,
    expand_message_xmd,
    generate_transcript,
    serialize_c1_and_poly,
    serialize_unipoly,
    verify_transcript,
)
from thaler_study_tpu.protocols import MatMulG
from thaler_study_tpu.sumcheck import (
    Prover,
    SparseMultiPoly,
    UniPoly,
    Verifier,
)


def test_expand_message_xmd_rfc9380_vectors():
    """RFC 9380 K.1 test vectors (SHA-256, len 0x20)."""
    dst = b"QUUX-V01-CS02-with-expander-SHA256-128"
    cases = [
        (b"", "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"),
        (b"abc", "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"),
        (
            b"abcdef0123456789",
            "eff31487c770a893cfb36f912fbfcbff40d5661771ca4b2cb4eafe524333f5c1",
        ),
    ]
    for msg, want in cases:
        assert expand_message_xmd(msg, dst, 0x20).hex() == want


def test_expand_message_xmd_long_output():
    """len 0x80 exercises the ell>1 XOR loop (RFC 9380 K.1)."""
    dst = b"QUUX-V01-CS02-with-expander-SHA256-128"
    out = expand_message_xmd(b"", dst, 0x80)
    assert (
        out.hex()
        == "af84c27ccfd45d41914fdff5df25293e221afc53d8ad2ac06d5e3e29485dadbe"
        "e0d121587713a3e0dd4d5e69e93eb7cd4f5df4cd103e188cf60cb02edc3edf18"
        "eda8576c412b18ffb658e3dd6ec849469b979d444cf7b26911a08e63cf31f9dc"
        "c541708d3491184472c2c29bb749d4286b004ceb5ee6b9a7fa5b646c993f0ced"
    )


def test_len_per_elem():
    # ceil((bit_size(p) + 128)/8): F5 -> 17, Goldilocks -> 24
    assert DefaultFieldHasher(F5).len_per_base_elem == 17
    assert DefaultFieldHasher(GOLDILOCKS).len_per_base_elem == 24


def test_serialization_layout():
    """Exact arkworks byte layout: Vec u64-LE len prefix + per-term (u64-LE
    degree, ceil(bits(p)/8)-byte LE coeff) pairs. Field elements are NOT limb
    width: ark-ff Fp::serialize_with_flags writes
    buffer_byte_size(MODULUS_BIT_SIZE) bytes (F5 -> 1, F389 -> 2,
    Goldilocks -> 8)."""
    p = UniPoly([(0, F5.felt(3)), (2, F5.felt(1))], F5)
    data = serialize_unipoly(p)
    assert data == (
        (2).to_bytes(8, "little")
        + (0).to_bytes(8, "little")
        + (3).to_bytes(1, "little")
        + (2).to_bytes(8, "little")
        + (1).to_bytes(1, "little")
    )
    msg = serialize_c1_and_poly(F5.felt(4), p)
    assert msg == (4).to_bytes(1, "little") + data
    # zero coefficients are dropped before serialization
    q = UniPoly([(1, F5.felt(0)), (3, F5.felt(2))], F5)
    assert serialize_unipoly(q)[:8] == (1).to_bytes(8, "little")
    # per-field widths
    assert F5.byte_size == 1
    assert F389.byte_size == 2
    assert GOLDILOCKS.byte_size == 8


def _rand_poly(l, d, field, rng):
    terms = [(field.felt(rng.randrange(field.p)), [])]
    for _ in range(rng.randrange(1, 40)):
        vps = [
            (i, rng.randrange(1, d + 1)) for i in range(l) if rng.random() < 0.5
        ]
        terms.append((field.felt(rng.randrange(field.p)), vps))
    return SparseMultiPoly(l, terms, field)


def test_it_works_generic():
    """Reference it_works (fiat-shamir/src/lib.rs:219-235): n in 2..10
    random polys over F5, transcript generates and verifies — full
    reference range."""
    rng = random.Random(0)
    for n in range(2, 10):
        g = _rand_poly(n, 3, F5, rng)
        prover = SumcheckInteractiveProver(Prover(g))
        verifier = SumcheckInteractiveVerifier(Verifier(n, g), F5)
        transcript = generate_transcript(prover, F5)
        assert verify_transcript(transcript, verifier, F5)


@pytest.mark.parametrize("field", [F389, GOLDILOCKS], ids=lambda f: f.name)
def test_matmul_non_interactive(field, rng):
    """FS transform over the device-backed matmul IP, plus tamper checks."""
    n = 2
    size = 1 << n
    a = [rng.randrange(field.p) for _ in range(size * size)]
    b = [rng.randrange(field.p) for _ in range(size * size)]
    point = [field.felt(rng.randrange(field.p)) for _ in range(2 * n)]
    g = MatMulG.new(n, a, b, point, field)
    prover = SumcheckInteractiveProver(Prover(g))
    transcript = generate_transcript(prover, field)
    verifier = SumcheckInteractiveVerifier(Verifier(n, g), field)
    assert verify_transcript(transcript, verifier, field)

    # transcript serialization round-trip
    blob = transcript.to_bytes()
    transcript2 = FiatShamirTranscript.from_bytes(blob)
    verifier2 = SumcheckInteractiveVerifier(Verifier(n, g), field)
    assert verify_transcript(transcript2, verifier2, field)

    # tampering any message must break verification
    from thaler_study_tpu.sumcheck import SumCheckError
    from thaler_study_tpu.fiat_shamir import SerializationError

    bad = [bytes(m) for m in transcript.g]
    tampered = bytearray(bad[0])
    tampered[0] ^= 1
    bad[0] = bytes(tampered)
    verifier3 = SumcheckInteractiveVerifier(Verifier(n, g), field)
    with pytest.raises((SumCheckError, SerializationError, AssertionError)):
        ok = verify_transcript(FiatShamirTranscript(bad), verifier3, field)
        assert ok, "tampered transcript verified"


def test_transcript_deterministic(rng):
    """Same inputs -> byte-identical transcripts (the bit-exactness anchor)."""
    field = F389
    a = [rng.randrange(field.p) for _ in range(16)]
    b = [rng.randrange(field.p) for _ in range(16)]
    point = [field.felt(rng.randrange(field.p)) for _ in range(4)]
    t1 = generate_transcript(
        SumcheckInteractiveProver(Prover(MatMulG.new(2, a, b, point, field))),
        field,
    )
    t2 = generate_transcript(
        SumcheckInteractiveProver(Prover(MatMulG.new(2, a, b, point, field))),
        field,
    )
    assert t1.to_bytes() == t2.to_bytes()


def test_resume_transcript_byte_identical(rng):
    """Checkpoint after m rounds, resume with a fresh prover -> identical
    bytes; tampered checkpoints detected with verify_prefix."""
    from thaler_study_tpu.fiat_shamir import (
        SerializationError,
        resume_transcript,
    )

    field = F389
    n = 3
    size = 1 << n
    a = [rng.randrange(field.p) for _ in range(size * size)]
    b = [rng.randrange(field.p) for _ in range(size * size)]
    point = [field.felt(rng.randrange(field.p)) for _ in range(2 * n)]

    def fresh():
        return SumcheckInteractiveProver(
            Prover(MatMulG.new(n, a, b, point, field))
        )

    full = generate_transcript(fresh(), field)
    for cut in (0, 1, 2):
        partial = FiatShamirTranscript(full.g[:cut])
        resumed = resume_transcript(fresh(), field, partial)
        assert resumed.to_bytes() == full.to_bytes(), f"cut={cut}"
    # verify_prefix re-derives and checks the prefix
    resumed = resume_transcript(
        fresh(), field, FiatShamirTranscript(full.g[:2]), verify_prefix=True
    )
    assert resumed.to_bytes() == full.to_bytes()
    # a foreign checkpoint is rejected under verify_prefix
    bad = bytearray(full.g[0])
    bad[0] ^= 1
    with pytest.raises(SerializationError):
        resume_transcript(
            fresh(),
            field,
            FiatShamirTranscript([bytes(bad)] + full.g[1:2]),
            verify_prefix=True,
        )


def test_xmd_chain_matches_full_rehash():
    """XmdChain (carried SHA-256 midstate) must be byte-identical to
    DefaultFieldHasher over the full running concatenation, for arbitrary
    absorb chunkings, draw counts, and DSTs (incl. oversize)."""
    from thaler_study_tpu.fiat_shamir.hash_to_field import XmdChain

    rng = random.Random(0xC4A1)
    for field in (F389, GOLDILOCKS):
        for dst in (b"", b"thaler-tpu", bytes(range(256))):
            chain = XmdChain(field, dst)
            hasher = DefaultFieldHasher(field, dst)
            msg = bytearray()
            for _ in range(12):
                chunk = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
                chain.absorb(chunk)
                msg.extend(chunk)
                count = rng.randrange(0, 4)
                assert chain.draw(count) == hasher.hash_to_field(bytes(msg), count)
