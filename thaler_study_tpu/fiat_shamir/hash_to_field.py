"""SHA-256 hash-to-field, byte-compatible with arkworks' DefaultFieldHasher.

The reference draws every Fiat-Shamir challenge as
``DefaultFieldHasher<Sha256>::hash_to_field::<1>(transcript_bytes)`` with an
empty domain-separation tag (fiat-shamir/src/lib.rs:78-88,221-229).

ark-ff's ``DefaultFieldHasher`` (SEC_PARAM = 128) is RFC 9380
``expand_message_xmd`` (the ``BlockSizeUser`` bound supplies the 64-byte
SHA-256 input block size for Z_pad) followed by big-endian reduction:

  len_per_base_elem = ceil((MODULUS_BIT_SIZE + 128) / 8)
  uniform = expand_message_xmd(msg, dst, len_per_base_elem)
  element = int.from_bytes(uniform, 'big') mod p

Pure-host implementation (challenges are O(rounds) scalars); an on-device
Pallas SHA-256 is a possible later optimization, not a correctness need.
"""

from __future__ import annotations

import hashlib

from ..fields import Felt, FieldConfig

_LONG_DST_PREFIX = b"H2C-OVERSIZE-DST-"


def expand_message_xmd(
    msg: bytes, dst: bytes, len_in_bytes: int, block_size: int = 64
) -> bytes:
    """RFC 9380 expand_message_xmd with SHA-256."""
    b_len = 32  # SHA-256 output size
    ell = (len_in_bytes + b_len - 1) // b_len
    if ell > 255:
        raise ValueError("expand_message_xmd: ell > 255")
    if len_in_bytes > 0xFFFF:
        raise ValueError("expand_message_xmd: len_in_bytes too large")
    if len(dst) > 255:
        dst = hashlib.sha256(_LONG_DST_PREFIX + dst).digest()
    dst_prime = dst + bytes([len(dst)])
    z_pad = bytes(block_size)
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b_0 = hashlib.sha256(z_pad + msg + l_i_b_str + b"\x00" + dst_prime).digest()
    b_i = hashlib.sha256(b_0 + b"\x01" + dst_prime).digest()
    uniform = bytearray(b_i)
    for i in range(2, ell + 1):
        mixed = bytes(x ^ y for x, y in zip(b_0, b_i))
        b_i = hashlib.sha256(mixed + bytes([i]) + dst_prime).digest()
        uniform.extend(b_i)
    return bytes(uniform[:len_in_bytes])


class DefaultFieldHasher:
    """ark-ff ``DefaultFieldHasher<Sha256, 128>`` clone for prime fields."""

    SEC_PARAM = 128

    def __init__(self, field: FieldConfig, dst: bytes = b""):
        self.field = field
        self.dst = dst
        self.len_per_base_elem = (field.bit_size + self.SEC_PARAM + 7) // 8

    def hash_to_field(self, msg: bytes, count: int = 1) -> list:
        """The ``hash_to_field::<N>`` call; extension degree m = 1."""
        len_in_bytes = count * self.len_per_base_elem
        uniform = expand_message_xmd(msg, self.dst, len_in_bytes)
        out = []
        for i in range(count):
            chunk = uniform[
                i * self.len_per_base_elem : (i + 1) * self.len_per_base_elem
            ]
            out.append(
                Felt(int.from_bytes(chunk, "big") % self.field.p, self.field)
            )
        return out


def _sha256_finish(midstate, absorbed: int, remaining: bytes) -> bytes:
    """Finish a SHA-256 over ``absorbed`` already-compressed bytes (a
    midstate) plus ``remaining`` trailing bytes: apply the standard
    merkle-damgard padding and compress the leftover blocks."""
    from ..runtime import sha256_midstate

    total = absorbed + len(remaining)
    pad_zeros = (55 - total) % 64
    tail = remaining + b"\x80" + bytes(pad_zeros) + (total * 8).to_bytes(8, "big")
    state = sha256_midstate(tail, midstate)
    return b"".join(int(w).to_bytes(4, "big") for w in state)


class XmdChain:
    """Incremental ``DefaultFieldHasher`` over a *growing* message prefix.

    The reference derives challenge j by re-hashing the full running
    concatenation g_1||...||g_j (fiat-shamir/src/lib.rs:82-93) — O(T^2)
    bytes hashed over a T-byte transcript. RFC 9380 expand_message_xmd
    computes ``b_0 = SHA256(Z_pad || msg || l_i_b || 0x00 || DST')`` with
    Z_pad exactly one 64-byte SHA-256 block, so the chain can instead carry
    a SHA-256 **midstate** over ``Z_pad || msg`` and pay only
    O(new bytes + suffix) per draw. Byte-identical to
    ``DefaultFieldHasher(field, dst).hash_to_field(msg_so_far, count)``.
    """

    def __init__(self, field: FieldConfig, dst: bytes = b""):
        from ..runtime import sha256_midstate

        self.field = field
        if len(dst) > 255:
            dst = hashlib.sha256(_LONG_DST_PREFIX + dst).digest()
        self.dst_prime = dst + bytes([len(dst)])
        self.len_per_base_elem = (
            field.bit_size + DefaultFieldHasher.SEC_PARAM + 7
        ) // 8
        self._mid = sha256_midstate(bytes(64))  # Z_pad block
        self._tail = b""
        self._absorbed = 64

    def absorb(self, data: bytes) -> None:
        from ..runtime import sha256_midstate

        buf = self._tail + bytes(data)
        n_full = len(buf) & ~63
        if n_full:
            self._mid = sha256_midstate(buf[:n_full], self._mid)
            self._absorbed += n_full
        self._tail = buf[n_full:]

    def draw(self, count: int = 1) -> list:
        if count == 0:
            return []
        len_in_bytes = count * self.len_per_base_elem
        ell = (len_in_bytes + 31) // 32
        if ell > 255:
            raise ValueError("expand_message_xmd: ell > 255")
        suffix = len_in_bytes.to_bytes(2, "big") + b"\x00" + self.dst_prime
        b_0 = _sha256_finish(self._mid, self._absorbed, self._tail + suffix)
        b_i = hashlib.sha256(b_0 + b"\x01" + self.dst_prime).digest()
        uniform = bytearray(b_i)
        for i in range(2, ell + 1):
            mixed = bytes(x ^ y for x, y in zip(b_0, b_i))
            b_i = hashlib.sha256(mixed + bytes([i]) + self.dst_prime).digest()
            uniform.extend(b_i)
        w = self.len_per_base_elem
        return [
            Felt(int.from_bytes(uniform[i * w : (i + 1) * w], "big") % self.field.p, self.field)
            for i in range(count)
        ]
