"""Fused on-device Fiat-Shamir prover: byte-identity vs the host loop,
device hash-to-field exactness, and the zero-coefficient fallback."""

import random

import numpy as np
import pytest

from thaler_study_tpu.fields import FArray, GOLDILOCKS, F389
from thaler_study_tpu.fiat_shamir import (
    DefaultFieldHasher,
    SumcheckInteractiveProver,
    SumcheckInteractiveVerifier,
    generate_transcript,
    generate_transcript_device,
    verify_transcript,
)
from thaler_study_tpu.ops.fs_kernel import (
    _hash_to_field_gl,
    _interp_matrix,
    fs_prove_device,
)
from thaler_study_tpu.ops.round_kernel import PolySpec
from thaler_study_tpu.protocols import MatMulG
from thaler_study_tpu.protocols.factor_poly import ProductPoly
from thaler_study_tpu.sumcheck import Prover, Verifier

# GSPMD-compile-bound file: whole-proof/sharded program compiles dominate
# its runtime on a cold cache. Excluded from the default tier (pyproject
# addopts); run with `pytest -m heavy`. tests/test_sharded_smoke.py keeps
# a fast mesh-coverage smoke in the default tier.
pytestmark = pytest.mark.heavy



def test_device_hash_to_field_matches_host(rng):
    """The on-device expand_message_xmd + BE reduction equals the host
    DefaultFieldHasher for goldilocks across message lengths."""
    import jax
    import jax.numpy as jnp

    hasher = DefaultFieldHasher(GOLDILOCKS)
    fn = jax.jit(_hash_to_field_gl)
    for ln in (1, 17, 63, 64, 65, 200):
        msg = bytes(rng.randrange(256) for _ in range(ln))
        lo, hi = fn(jnp.asarray(np.frombuffer(msg, dtype=np.uint8)))
        got = int(lo) | (int(hi) << 32)
        want = hasher.hash_to_field(msg, 1)[0].v
        assert got == want, f"len={ln}"


def test_interp_matrix_exact():
    p = GOLDILOCKS.p
    for d in (1, 2, 3):
        m = _interp_matrix(d, p)
        # coeffs of f(t) = t^d: values at 0..d -> unit vector at degree d
        vals = [pow(t, d, p) for t in range(d + 1)]
        coeffs = [
            sum(m[i][t] * vals[t] for t in range(d + 1)) % p
            for i in range(d + 1)
        ]
        assert coeffs == [0] * d + [1]


@pytest.mark.parametrize("n,k", [(3, 2), (5, 2), (4, 3), (6, 1)])
def test_fused_transcript_byte_identical(n, k, rng):
    """One-dispatch proof == per-round host loop, byte for byte, across
    hypercube sizes and factor counts (degrees 1..3)."""
    field = GOLDILOCKS
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    tables = tuple(
        FArray.from_ints(
            np.array(
                [rng.randrange(field.p) for _ in range(1 << n)], dtype=object
            ),
            field,
        )
        for _ in range(k)
    )
    poly = ProductPoly(spec, tables)
    host = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    fused = generate_transcript_device(poly, field)
    assert [m.hex() for m in fused.g] == [m.hex() for m in host.g]
    # and it verifies
    verifier = SumcheckInteractiveVerifier(
        Verifier(n, ProductPoly(spec, tables)), field
    )
    assert verify_transcript(fused, verifier, field)


def test_fused_matmul_transcript(rng):
    field = GOLDILOCKS
    n = 3
    size = 1 << n
    a = [rng.randrange(field.p) for _ in range(size * size)]
    b = [rng.randrange(field.p) for _ in range(size * size)]
    point = [field.felt(rng.randrange(field.p)) for _ in range(2 * n)]
    g = MatMulG.new(n, a, b, point, field)
    host = generate_transcript(
        SumcheckInteractiveProver(Prover(MatMulG.new(n, a, b, point, field))),
        field,
    )
    fused = generate_transcript_device(g, field)
    assert fused.to_bytes() == host.to_bytes()


def test_zero_coefficient_fallback():
    """An all-zeros table forces zero coefficients: the device kernel must
    flag it and the wrapper must fall back to the exact host loop."""
    field = GOLDILOCKS
    n = 3
    spec = PolySpec(block_sizes=(n,), table_blocks=((0,), (0,)), terms=((0, 1),))
    tables = (
        FArray.from_ints(np.zeros(1 << n, dtype=object), field),
        FArray.from_ints(np.arange(1 << n, dtype=object), field),
    )
    assert fs_prove_device(spec, tables) is None  # flagged on device
    poly = ProductPoly(spec, tables)
    host = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    fused = generate_transcript_device(poly, field)
    assert fused.to_bytes() == host.to_bytes()


@pytest.mark.parametrize("fname", ["F389", "F5", "F1572869"])
def test_mont32_fused_byte_identical(fname, rng):
    """mont32 fields run the fused device path too (Horner hash-to-field
    reduction + ceil(bits/8)-byte serialization), byte-identical to host."""
    from thaler_study_tpu.fields import F5, F1572869

    field = {"F389": F389, "F5": F5, "F1572869": F1572869}[fname]
    n = 4
    spec = PolySpec(block_sizes=(n,), table_blocks=((0,), (0,)), terms=((0, 1),))
    tables = tuple(
        FArray.from_ints(
            np.array(
                [rng.randrange(1, field.p) for _ in range(1 << n)],
                dtype=object,
            ),
            field,
        )
        for _ in range(2)
    )
    host = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    fused = generate_transcript_device(ProductPoly(spec, tables), field)
    assert fused.to_bytes() == host.to_bytes()
    if field is not F5:  # F5's tiny modulus makes zero coeffs likely
        assert fs_prove_device(spec, tables) is not None


def test_batched_fused_transcripts_byte_identical(rng):
    """vmapped whole-proof kernel: B proofs in one dispatch == per-instance
    host transcripts, byte for byte; and the batched API takes this path."""
    import jax.numpy as jnp

    from thaler_study_tpu.ops.fs_kernel import fs_prove_device_batch
    from thaler_study_tpu.protocols import (
        BatchedProductPoly,
        generate_transcripts_batch,
    )

    field = GOLDILOCKS
    n, k, B = 4, 2, 3
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    instances = []
    for _ in range(B):
        instances.append(
            [
                FArray.from_ints(
                    np.array(
                        [rng.randrange(field.p) for _ in range(1 << n)],
                        dtype=object,
                    ),
                    field,
                )
                for _ in range(k)
            ]
        )
    batched = BatchedProductPoly.stack(instances)
    out = fs_prove_device_batch(spec, batched.tables)
    assert out is not None and len(out) == B
    for b in range(B):
        host = generate_transcript(
            SumcheckInteractiveProver(
                Prover(ProductPoly(spec, instances[b]))
            ),
            field,
        )
        assert [m.hex() for m in out[b]] == [m.hex() for m in host.g]
    # the public batched API returns the same transcripts
    ts = generate_transcripts_batch(BatchedProductPoly.stack(instances), field)
    for b in range(B):
        assert ts[b].to_bytes() == generate_transcript(
            SumcheckInteractiveProver(Prover(ProductPoly(spec, instances[b]))),
            field,
        ).to_bytes()


def test_fused_triangle_transcript(rng):
    """Multi-block specs run the fused whole-proof path too: the triangle
    IP's 3-block spec proves in one dispatch, byte-identical to host."""
    from thaler_study_tpu.ops.fs_kernel import supports_fused_fs
    from thaler_study_tpu.protocols import TriangleG

    field = GOLDILOCKS
    k = 2
    size = 1 << k
    # dense-ish random adjacency so zero coefficients stay unlikely
    matrix = [rng.randrange(2) for _ in range(size * size)]
    for i in range(size):
        matrix[i * size + i] = 0
    g = TriangleG.new_adj_matrix(2 * k, matrix, field)
    assert supports_fused_fs(g.spec, field, b"")
    host = generate_transcript(
        SumcheckInteractiveProver(
            Prover(TriangleG.new_adj_matrix(2 * k, matrix, field))
        ),
        field,
    )
    fused = generate_transcript_device(g, field)
    assert [m.hex() for m in fused.g] == [m.hex() for m in host.g]


def test_fused_multiblock_mixed_degree(rng):
    """A 2-block spec whose round degree differs between blocks (deg 2 over
    block 0, deg 1 over block 1) serializes per-round-degree messages,
    byte-identical to the host loop."""
    field = GOLDILOCKS
    n0, n1 = 2, 3
    spec = PolySpec(
        block_sizes=(n0, n1),
        table_blocks=((0,), (0, 1)),
        terms=((0, 1),),
    )
    tables = tuple(
        FArray.from_ints(
            np.array([rng.randrange(1, field.p) for _ in range(1 << nv)], dtype=object),
            field,
        )
        for nv in (n0, n0 + n1)
    )
    host = generate_transcript(
        SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), field
    )
    fused = generate_transcript_device(ProductPoly(spec, tables), field)
    assert fused.to_bytes() == host.to_bytes()


def test_batched_per_instance_fallback(rng):
    """A zero coefficient in ONE instance re-proves only that instance on
    the host loop; the rest of the batch keeps the fused device result."""
    from thaler_study_tpu.ops.fs_kernel import fs_prove_device_batch
    from thaler_study_tpu.protocols import (
        BatchedProductPoly,
        generate_transcripts_batch,
    )

    field = GOLDILOCKS
    n, k = 3, 2
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(k)),
        terms=(tuple(range(k)),),
    )
    instances = [
        [
            FArray.from_ints(
                np.array([rng.randrange(1, field.p) for _ in range(1 << n)], dtype=object),
                field,
            )
            for _ in range(k)
        ]
        for _ in range(3)
    ]
    # instance 1: an all-zeros factor forces zero coefficients
    instances[1][0] = FArray.from_ints(np.zeros(1 << n, dtype=object), field)
    batched = BatchedProductPoly.stack(instances)
    out = fs_prove_device_batch(spec, batched.tables)
    assert out is not None and out[1] is None
    assert out[0] is not None and out[2] is not None
    ts = generate_transcripts_batch(BatchedProductPoly.stack(instances), field)
    for b in range(3):
        host = generate_transcript(
            SumcheckInteractiveProver(Prover(ProductPoly(spec, instances[b]))),
            field,
        )
        assert ts[b].to_bytes() == host.to_bytes(), f"instance {b}"
