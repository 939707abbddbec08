"""Carried-midstate Fiat-Shamir hash chain for device programs.

The reference's transform hashes the *running concatenation* of every
serialized message for each challenge draw (fiat-shamir/src/lib.rs:82-93):
``r_j = hash_to_field(msg_1 || ... || msg_j)``. Re-hashing the whole prefix
per draw is O(transcript^2) — tolerable on host hashlib, pathological inside
a device program where each SHA-256 compression is a serial 64-step chain
(the first fused kernel spent ~1 s/proof there at n=22).

Because RFC 9380 ``expand_message_xmd`` prepends a fixed 64-byte Z_pad and
the transcript only ever grows, the SHA-256 midstate over
``Z_pad || transcript`` can be carried: absorbing a message advances the
midstate over its full 64-byte blocks and keeps the <= 63-byte remainder in
a buffer; a draw finishes the hash (buffer + l_i_b_str/DST suffix + SHA
padding) WITHOUT disturbing the carried state. Each draw then costs O(1)
compressions instead of O(transcript).

Two offset modes, same byte semantics:

- **static**: ``nbytes`` is a python int at trace time (plain FS sumcheck —
  the whole proof is one program, every message length is static).
- **traced**: ``nbytes`` is a uint32 scalar (fused GKR layers — one compiled
  program serves every layer, whose transcript offsets differ; block counts
  are handled with predicated compressions). See gkr/fused.py.

Scope: empty DST (the reference's test config, dst_prime = [0]) and
len_in_bytes <= 0xFFFF. Bit-exactness vs the host hasher
(fiat_shamir/hash_to_field.py) is asserted in tests/test_sha_chain.py.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldConfig
from ..fields import backend32 as b32
from ..fields import goldilocks as gl
from ..fields.field import GOLDILOCKS_P
from .sha256 import _H0, _compress, _py_compress

U8 = jnp.uint8
U32 = jnp.uint32

# midstate after the all-zero Z_pad block (host-computed constant)
_ZPAD_STATE = _H0.copy()
_py_compress(_ZPAD_STATE, bytes(64))

_C64 = (1 << 64) % GOLDILOCKS_P
_C128 = (1 << 128) % GOLDILOCKS_P


def default_unroll() -> int:
    """SHA round-loop unroll: the TPU pays ~per-iteration sequencing
    overhead on tiny scalar bodies, XLA:CPU pays compile time for big
    unrolled graphs (tests force an 8-device CPU mesh)."""
    return 8 if jax.default_backend() == "tpu" else 1


def _words_of(block_bytes: jnp.ndarray) -> jnp.ndarray:
    """[64] uint8 -> [16] uint32 big-endian words."""
    b = block_bytes.reshape(16, 4).astype(U32)
    return (
        (b[:, 0] << U32(24))
        | (b[:, 1] << U32(16))
        | (b[:, 2] << U32(8))
        | b[:, 3]
    )


def _digest_bytes(words: jnp.ndarray) -> jnp.ndarray:
    """[8] uint32 digest words -> [32] uint8 (big-endian per word)."""
    w = words.reshape(8, 1)
    shifts = jnp.asarray([24, 16, 8, 0], dtype=U32).reshape(1, 4)
    return ((w >> shifts) & U32(0xFF)).astype(U8).reshape(32)


@dataclasses.dataclass
class DevChain:
    """Running-concat FS chain with carried SHA-256 midstate (trace-time).

    ``state``: [8] uint32 midstate over Z_pad plus all full 64-byte blocks
    of the transcript. ``buf``: [64] uint8 holding the partial-block tail
    (first ``nbytes % 64`` bytes valid, rest garbage). ``nbytes``: total
    transcript bytes absorbed — python int (static mode) or uint32 scalar
    (traced mode).
    """

    state: jnp.ndarray
    buf: jnp.ndarray
    nbytes: Union[int, jnp.ndarray]
    unroll: int = 1

    @classmethod
    def fresh(cls, unroll: int = 1) -> "DevChain":
        return cls(
            state=jnp.asarray(_ZPAD_STATE),
            buf=jnp.zeros((64,), U8),
            nbytes=0,
            unroll=unroll,
        )

    @property
    def _static(self) -> bool:
        return isinstance(self.nbytes, int)

    def _fill(self):
        return self.nbytes % 64 if self._static else self.nbytes % U32(64)

    # -- absorb -----------------------------------------------------------

    def absorb(self, msg: jnp.ndarray) -> "DevChain":
        """Append ``msg`` ([M] uint8, static M) to the transcript."""
        m = int(msg.shape[0])
        if m == 0:
            return self
        state, unroll = self.state, self.unroll
        if self._static:
            fill = self.nbytes % 64
            scratch = jnp.concatenate([self.buf[:fill], msg])
            total = fill + m
            nfull = total // 64
            for b in range(nfull):
                state = _compress(
                    state, _words_of(scratch[64 * b : 64 * (b + 1)]), unroll
                )
            rem = total - 64 * nfull
            buf = jnp.zeros((64,), U8).at[:rem].set(scratch[64 * nfull :])
            return DevChain(state, buf, self.nbytes + m, unroll)
        # traced offsets: lay msg at the (traced) fill position and run
        # predicated compressions over the bounded block count
        fill = self._fill()
        nb_max = (63 + m) // 64
        scratch = jnp.zeros((64 * nb_max + 64,), U8)
        scratch = scratch.at[:64].set(self.buf)
        scratch = jax.lax.dynamic_update_slice(
            scratch, msg, (fill.astype(jnp.int32),)
        )
        total = fill + U32(m)
        nfull = total // U32(64)
        for b in range(nb_max):
            new_state = _compress(
                state, _words_of(scratch[64 * b : 64 * (b + 1)]), unroll
            )
            state = jnp.where(U32(b) < nfull, new_state, state)
        buf = jax.lax.dynamic_slice(
            scratch, ((U32(64) * nfull).astype(jnp.int32),), (64,)
        )
        return DevChain(state, buf, self.nbytes + U32(m), unroll)

    # -- draw -------------------------------------------------------------

    def _finish_b0(self, len_in_bytes: int) -> jnp.ndarray:
        """b_0 = H(Z_pad || transcript || l_i_b_str || 0x00 || dst_prime)
        using the carried midstate; does not modify the chain."""
        suffix = np.array(
            [len_in_bytes >> 8, len_in_bytes & 0xFF, 0, 0], dtype=np.uint8
        )
        state, unroll = self.state, self.unroll
        if self._static:
            fill = self.nbytes % 64
            msg_len = 64 + self.nbytes + 4  # z_pad + transcript + suffix
            pad = (56 - (msg_len + 1) % 64) % 64
            tail = np.zeros(1 + pad + 8, dtype=np.uint8)
            tail[0] = 0x80
            tail[-8:] = np.frombuffer(
                (8 * msg_len).to_bytes(8, "big"), dtype=np.uint8
            )
            rest = jnp.concatenate(
                [self.buf[:fill], jnp.asarray(suffix), jnp.asarray(tail)]
            )
            for b in range(rest.shape[0] // 64):
                state = _compress(
                    state, _words_of(rest[64 * b : 64 * (b + 1)]), unroll
                )
            return state
        # traced: fill <= 63, so fill + suffix(4) + 0x80(1) spans at most
        # two blocks; the 8-byte big-endian bit length lands at offset 56
        # (fill <= 51) or 120 (fill >= 52)
        fill = self._fill()
        mask = jnp.arange(64, dtype=U32) < fill
        buf = jnp.where(mask, self.buf, U8(0))
        scratch = jnp.zeros((128,), U8).at[:64].set(buf)
        suf = np.zeros(5, dtype=np.uint8)
        suf[:4] = suffix
        suf[4] = 0x80
        scratch = jax.lax.dynamic_update_slice(
            scratch, jnp.asarray(suf), (fill.astype(jnp.int32),)
        )
        bits = (U32(64) + self.nbytes + U32(4)) * U32(8)  # < 2^32: < 512 MB
        bit_bytes = jnp.stack(
            [
                jnp.zeros((), U8),
                jnp.zeros((), U8),
                jnp.zeros((), U8),
                jnp.zeros((), U8),
                ((bits >> U32(24)) & U32(0xFF)).astype(U8),
                ((bits >> U32(16)) & U32(0xFF)).astype(U8),
                ((bits >> U32(8)) & U32(0xFF)).astype(U8),
                (bits & U32(0xFF)).astype(U8),
            ]
        )
        two_blocks = fill > U32(51)
        pos = jnp.where(two_blocks, jnp.int32(120), jnp.int32(56))
        scratch = jax.lax.dynamic_update_slice(scratch, bit_bytes, (pos,))
        state = _compress(state, _words_of(scratch[:64]), unroll)
        state2 = _compress(state, _words_of(scratch[64:]), unroll)
        return jnp.where(two_blocks, state2, state)

    def draw_uniform(self, len_in_bytes: int) -> List[jnp.ndarray]:
        """RFC 9380 expand_message_xmd over the current transcript: the
        uniform bytes as ``ell`` digests of [8] uint32 words each."""
        ell = (len_in_bytes + 31) // 32
        b_0 = self._finish_b0(len_in_bytes)
        b0_bytes = _digest_bytes(b_0)
        out = []
        b_prev = None
        for i in range(1, ell + 1):
            if i == 1:
                head = b0_bytes
            else:
                head = _digest_bytes(b_0 ^ b_prev)
            # one padded block: 32 bytes + [i, dst_prime=0] + 0x80 + zeros
            # + bitlen(8*34 = 272)
            tail = np.zeros(32, dtype=np.uint8)
            tail[0] = i
            tail[1] = 0
            tail[2] = 0x80
            tail[-8:] = np.frombuffer(
                (8 * 34).to_bytes(8, "big"), dtype=np.uint8
            )
            block = jnp.concatenate([head, jnp.asarray(tail)])
            b_prev = _compress(
                jnp.asarray(_H0), _words_of(block), self.unroll
            )
            out.append(b_prev)
        return out


# ---------------------------------------------------------------------------
# hash_to_field on top of draw_uniform
# ---------------------------------------------------------------------------


def _gl_from_be_words(w: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """6 big-endian uint32 words (24 bytes) -> canonical Goldilocks
    (lo, hi): value = (w0 w1)*2^128 + (w2 w3)*2^64 + (w4 w5) mod p."""
    hi_lo, hi_hi = w[1], w[0]
    mid_lo, mid_hi = w[3], w[2]
    lo_lo, lo_hi = w[5], w[4]
    hi_lo, hi_hi = gl._reduce_once(hi_lo, hi_hi)
    mid_lo, mid_hi = gl._reduce_once(mid_lo, mid_hi)
    lo_lo, lo_hi = gl._reduce_once(lo_lo, lo_hi)
    c64 = (U32(_C64 & 0xFFFFFFFF), U32(_C64 >> 32))
    c128 = (U32(_C128 & 0xFFFFFFFF), U32(_C128 >> 32))
    acc = gl.add(lo_lo, lo_hi, *gl.mul(mid_lo, mid_hi, *c64))
    return gl.add(*acc, *gl.mul(hi_lo, hi_hi, *c128))


def hash_to_field_chain(
    chain: DevChain, field: FieldConfig, count: int
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """``DefaultFieldHasher<Sha256,128>::hash_to_field::<count>`` over the
    chain's transcript. Returns per element canonical (lo, hi) uint32
    scalars for goldilocks, or (mont, zero) MONTGOMERY scalars for mont32
    (the domain the fold kernels consume)."""
    length = (field.bit_size + 128 + 7) // 8
    digests = chain.draw_uniform(count * length)
    words = [d[j] for d in digests for j in range(8)]
    out = []
    if field.backend == "goldilocks":
        assert length == 24
        for e in range(count):
            out.append(_gl_from_be_words(words[6 * e : 6 * e + 6]))
        return out
    # mont32: big-endian Horner over the element's bytes, then lift
    p = field.p
    pinv = field.mont_pinv_neg
    c256 = U32((256 << 32) % p)
    for e in range(count):
        acc = U32(0) * words[0]
        for i in range(length):
            byte_idx = e * length + i
            byte = (words[byte_idx // 4] >> U32(24 - 8 * (byte_idx % 4))) & U32(
                0xFF
            )
            acc = b32.mont_mul(p, pinv, acc, c256)
            acc = acc + byte
            acc = jnp.where(acc >= U32(p), acc - U32(p), acc)
        mont = b32.to_mont(p, pinv, field.mont_r2, acc)
        out.append((mont, jnp.zeros_like(mont)))
    return out
