"""arkworks-compatible canonical serialization (uncompressed).

Byte-level clone of what the reference's Fiat-Shamir transform writes into
transcripts (fiat-shamir/src/lib.rs:44-66):

- ``Fp64`` element: canonical integer, 8 bytes little-endian (one 64-bit limb).
- ``univariate::SparsePolynomial<F>`` (= ``Vec<(usize, F)>`` of (degree,
  coeff), sorted, zero coeffs dropped): u64-LE length prefix, then per term
  a u64-LE degree and the 8-byte coefficient.
- tuple ``(F, SparsePolynomial<F>)``: concatenation.

Bit-exact transcripts vs the Rust reference hinge on these layouts plus the
hash-to-field in ``hash_to_field.py`` (SURVEY.md section 3.2: the FS path is
the deterministic bit-exactness anchor).
"""

from __future__ import annotations

import struct

from ..fields import Felt, FieldConfig
from ..sumcheck.univariate import UniPoly


def serialize_felt(f: Felt) -> bytes:
    return f.v.to_bytes(f.field.byte_size, "little")


def deserialize_felt(data: bytes, offset: int, field: FieldConfig) -> tuple:
    size = field.byte_size
    v = int.from_bytes(data[offset : offset + size], "little")
    if v >= field.p:
        raise ValueError("non-canonical field element")
    return Felt(v, field), offset + size


def serialize_unipoly(p: UniPoly) -> bytes:
    out = [struct.pack("<Q", len(p.terms))]
    for d, c in p.terms:
        out.append(struct.pack("<Q", d))
        out.append(serialize_felt(c))
    return b"".join(out)


def deserialize_unipoly(
    data: bytes, offset: int, field: FieldConfig
) -> tuple:
    (n,) = struct.unpack_from("<Q", data, offset)
    offset += 8
    terms = []
    for _ in range(n):
        (d,) = struct.unpack_from("<Q", data, offset)
        offset += 8
        c, offset = deserialize_felt(data, offset, field)
        terms.append((d, c))
    return UniPoly(terms, field), offset


def serialize_c1_and_poly(c_1: Felt, p: UniPoly) -> bytes:
    """The round-0 message: the tuple (c_1, g_1) (ref :48-51)."""
    return serialize_felt(c_1) + serialize_unipoly(p)


def deserialize_c1_and_poly(data: bytes, field: FieldConfig) -> tuple:
    c_1, offset = deserialize_felt(data, 0, field)
    p, offset = deserialize_unipoly(data, offset, field)
    if offset != len(data):
        raise ValueError("trailing bytes in round-0 message")
    return c_1, p
