#!/usr/bin/env python3
"""Derive golden Fiat-Shamir transcript vectors INDEPENDENTLY of the framework.

This script is the external anchor for the framework's bit-exactness claim
(BASELINE.md: "transcripts bit-exact vs the Rust reference"). It deliberately
imports NOTHING from ``thaler_study_tpu`` — only ``hashlib``/``json`` — and
re-derives, straight from the published specifications, the exact bytes the
Rust reference produces for its Fiat-Shamir sumcheck transcript:

  * reference transcript structure: fiat-shamir/src/lib.rs:75-98
    (challenge r_j = H(g_1 || ... || g_j) over the running concatenation,
    H = DefaultFieldHasher<Sha256> with empty DST, fiat-shamir/src/lib.rs:78,
    221-229); prover round semantics sum-check-protocol/src/lib.rs:88-117
    (round 0 = (c_1, to_univariate()); round j>=1 = fix_variables([r_j]) then
    to_univariate(), generic impl :158-224).
  * serialization: arkworks 0.6 semantics (the version the reference pins,
    /root/reference/Cargo.toml):
      - Fp element (CanonicalSerialize, uncompressed = compressed for fields):
        ark-ff Fp::serialize_with_flags writes the little-endian canonical
        integer truncated to buffer_byte_size(MODULUS_BIT_SIZE + 0) =
        ceil(bits(p)/8) bytes. F5 -> 1 byte.
      - univariate::SparsePolynomial<F> (derived CanonicalSerialize on
        struct { coeffs: Vec<(usize, F)> }): u64-LE length prefix, then per
        term a u64-LE degree (ark-serialize serializes usize as u64 LE) and
        the field element. Terms sorted by degree, zero coefficients dropped
        (SparsePolynomial::from_coefficients invariant).
      - tuple (F, SparsePolynomial<F>): element-wise concatenation.
  * hash-to-field: ark-ff field_hashers::DefaultFieldHasher<Sha256, 128> =
    RFC 9380 expand_message_xmd (SHA-256, block size 64) with
    len_per_base_elem = ceil((MODULUS_BIT_SIZE + 128)/8), then BIG-endian
    reduction mod p (ark-ff from_be_bytes_mod_order). For F5:
    len_per_base_elem = ceil((3+128)/8) = 17.

Rust-toolchain note (VERDICT round 1, next-round #1a): this container has no
cargo/rustc and zero network egress ("which cargo rustc rustup" -> none;
pip/apt installs forbidden), so these vectors CANNOT be produced by running
the reference. They are hand-derived from the specs above instead. If a Rust
toolchain ever becomes available, run the reference's fiat-shamir crate on
the same polynomial and diff against fs_golden.json.

Run:  python tests/data/derive_fs_golden.py   (rewrites fs_golden.json)
"""

import hashlib
import json
import os

# --------------------------------------------------------------------------
# RFC 9380 expand_message_xmd (SHA-256). Independent re-implementation; the
# framework has its own copy in thaler_study_tpu/fiat_shamir/hash_to_field.py.
# --------------------------------------------------------------------------


def expand_message_xmd(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    b_len = 32
    block_size = 64
    ell = -(-len_in_bytes // b_len)
    assert ell <= 255 and len_in_bytes <= 0xFFFF
    if len(dst) > 255:
        dst = hashlib.sha256(b"H2C-OVERSIZE-DST-" + dst).digest()
    dst_prime = dst + bytes([len(dst)])
    b_0 = hashlib.sha256(
        bytes(block_size) + msg + len_in_bytes.to_bytes(2, "big") + b"\x00" + dst_prime
    ).digest()
    b_i = hashlib.sha256(b_0 + b"\x01" + dst_prime).digest()
    out = bytearray(b_i)
    for i in range(2, ell + 1):
        b_i = hashlib.sha256(
            bytes(x ^ y for x, y in zip(b_0, b_i)) + bytes([i]) + dst_prime
        ).digest()
        out.extend(b_i)
    return bytes(out[:len_in_bytes])


def hash_to_field(msg: bytes, p: int) -> int:
    """DefaultFieldHasher<Sha256, 128>::hash_to_field::<1> with empty DST."""
    length = (p.bit_length() + 128 + 7) // 8
    uniform = expand_message_xmd(msg, b"", length)
    return int.from_bytes(uniform, "big") % p


# --------------------------------------------------------------------------
# arkworks serialization (see module docstring for the exact provenance).
# --------------------------------------------------------------------------


def ser_felt(v: int, p: int) -> bytes:
    return (v % p).to_bytes((p.bit_length() + 7) // 8, "little")


def ser_unipoly(terms, p: int) -> bytes:
    """terms: {degree: coeff} -> sorted, zero coeffs dropped."""
    live = sorted((d, c % p) for d, c in terms.items() if c % p != 0)
    out = [len(live).to_bytes(8, "little")]
    for d, c in live:
        out.append(d.to_bytes(8, "little"))
        out.append(ser_felt(c, p))
    return b"".join(out)


# --------------------------------------------------------------------------
# The reference's generic multivariate SumCheckPolynomial, re-derived from
# sum-check-protocol/src/lib.rs:158-224 with plain integers.
# A polynomial is a list of (coeff, ((var, power), ...)) terms.
# --------------------------------------------------------------------------


def term_eval(term, point, p):
    acc = 1
    for var, power in term:
        acc = acc * pow(point[var], power, p) % p
    return acc


def fix_variables(poly, num_vars, partial, p):
    """ref :163-187 — pad the point with ones, re-index surviving variables."""
    k = len(partial)
    full = list(partial) + [1] * (num_vars - k)
    acc = {}
    for coeff, term in poly:
        ev = term_eval(term, full, p) * coeff % p
        new_term = tuple((v - k, pw) for v, pw in term if v >= k)
        acc[new_term] = (acc.get(new_term, 0) + ev) % p
    return [(c, t) for t, c in acc.items() if c != 0], num_vars - k


def to_univariate(poly, num_vars, p):
    """ref :189-213 — sum over the (n-1)-cube collecting coeffs by the degree
    of variable 0 (point[0] fixed to 1 so its factor contributes nothing)."""
    coeffs = {}
    for mask in range(1 << (num_vars - 1)):
        point = [1] + [(mask >> b) & 1 for b in range(num_vars - 1)]
        for coeff, term in poly:
            ev = term_eval(term, point, p) * coeff % p
            power = next((pw for v, pw in term if v == 0), 0)
            coeffs[power] = (coeffs.get(power, 0) + ev) % p
    return coeffs


def sum_over_cube(poly, num_vars, p):
    total = 0
    for mask in range(1 << num_vars):
        point = [(mask >> b) & 1 for b in range(num_vars)]
        for coeff, term in poly:
            total = (total + term_eval(term, point, p) * coeff) % p
    return total


def generate_transcript(poly, num_vars, p):
    """ref fiat-shamir/src/lib.rs:75-98. Returns (messages, challenges)."""
    c_1 = sum_over_cube(poly, num_vars, p)
    g_1 = ser_felt(c_1, p) + ser_unipoly(to_univariate(poly, num_vars, p), p)
    messages = [g_1]
    challenges = []
    hash_input = bytearray(g_1)
    cur, nv = poly, num_vars
    for _ in range(1, num_vars):
        r_j = hash_to_field(bytes(hash_input), p)
        challenges.append(r_j)
        cur, nv = fix_variables(cur, nv, [r_j], p)
        g_j = ser_unipoly(to_univariate(cur, nv, p), p)
        hash_input.extend(g_j)
        messages.append(g_j)
    return c_1, messages, challenges


def main():
    p = 5
    cases = []

    # Case 1: the book polynomial g = 2*x1^3 + x1*x3 + x2*x3 over F5
    # (Thaler ex. 4.1; reference test sum-check-protocol/src/lib.rs:418-459).
    # Variables 0-indexed: 2*x0^3 + x0*x2 + x1*x2, 3 variables.
    book = [
        (2, ((0, 3),)),
        (1, ((0, 1), (2, 1))),
        (1, ((1, 1), (2, 1))),
    ]
    c_1, msgs, chals = generate_transcript(book, 3, p)
    cases.append(
        {
            "name": "book_2x1c_x1x3_x2x3",
            "p": p,
            "num_vars": 3,
            "terms": [[c, list(map(list, t))] for c, t in book],
            "c_1": c_1,
            "messages_hex": [m.hex() for m in msgs],
            "challenges": chals,
        }
    )

    # Case 2: 2 variables with a constant term and a zero-producing cancel,
    # exercising degree-0 terms and the zero-coeff-drop path.
    # g = 3 + 4*x0 + x0^2*x1 + 2*x1
    g2 = [
        (3, ()),
        (4, ((0, 1),)),
        (1, ((0, 2), (1, 1))),
        (2, ((1, 1),)),
    ]
    c_1, msgs, chals = generate_transcript(g2, 2, p)
    cases.append(
        {
            "name": "two_var_constant",
            "p": p,
            "num_vars": 2,
            "terms": [[c, list(map(list, t))] for c, t in g2],
            "c_1": c_1,
            "messages_hex": [m.hex() for m in msgs],
            "challenges": chals,
        }
    )

    # Case 3: F389 (2-byte elements) — checks the serialization width rule
    # on a multi-byte field. g = 100 + 37*x0^3*x1 + 250*x1*x2 + 5*x2^2
    p389 = 389
    g3 = [
        (100, ()),
        (37, ((0, 3), (1, 1))),
        (250, ((1, 1), (2, 1))),
        (5, ((2, 2),)),
    ]
    c_1, msgs, chals = generate_transcript(g3, 3, p389)
    cases.append(
        {
            "name": "f389_three_var",
            "p": p389,
            "num_vars": 3,
            "terms": [[c, list(map(list, t))] for c, t in g3],
            "c_1": c_1,
            "messages_hex": [m.hex() for m in msgs],
            "challenges": chals,
        }
    )

    out = os.path.join(os.path.dirname(__file__), "fs_golden.json")
    with open(out, "w") as f:
        json.dump({"cases": cases}, f, indent=1)
    print(f"wrote {out}")
    for c in cases:
        print(c["name"], "c_1 =", c["c_1"], "challenges =", c["challenges"])


if __name__ == "__main__":
    main()
