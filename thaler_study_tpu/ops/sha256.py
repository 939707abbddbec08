"""SHA-256 as a jit-traceable jnp computation (uint32 lanes).

SURVEY.md section 2 lists the transcript hash (SHA-256 hash-to-field,
fiat-shamir/src/lib.rs:80-95) among the native components to re-kernel.
Challenges are tiny, so the production path hashes on host today — but a
device-side SHA-256 is the prerequisite for fusing the whole Fiat-Shamir
round loop into one program (ROADMAP item 1: derive r_j from the round
sums without leaving the chip). This implementation is exact (tested
against hashlib across message lengths) and runs under jit on CPU and TPU;
all state is uint32, mapping directly onto the VPU.

Messages must have a length known at trace time (true for FS transcripts:
serialization sizes are static per round).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5,
        0x3956C25B, 0x59F111F1, 0x923F82A4, 0xAB1C5ED5,
        0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174,
        0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC,
        0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7,
        0xC6E00BF3, 0xD5A79147, 0x06CA6351, 0x14292967,
        0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
        0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3,
        0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5,
        0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F, 0x682E6FF3,
        0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

_H0 = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _compress(state, block, unroll: int = 1):
    """One SHA-256 compression: state [8] uint32, block [16] uint32 (BE words).

    Rounds and the message schedule run as lax.fori_loops (a fully unrolled
    scalar chain compiles pathologically slowly under XLA:CPU's forced
    multi-device mode, which the test mesh uses). On TPU the per-iteration
    loop overhead dominates the tiny scalar body, so hot callers pass
    ``unroll`` > 1 (ops/sha_chain.py) — same values, fewer loop trips."""
    w0 = jnp.zeros(64, jnp.uint32).at[:16].set(block)

    def sched(i, w):
        x = w[i - 15]
        y = w[i - 2]
        s0 = _rotr(x, 7) ^ _rotr(x, 18) ^ (x >> jnp.uint32(3))
        s1 = _rotr(y, 17) ^ _rotr(y, 19) ^ (y >> jnp.uint32(10))
        return w.at[i].set(w[i - 16] + s0 + w[i - 7] + s1)

    w = jax.lax.fori_loop(16, 64, sched, w0, unroll=unroll)
    k = jnp.asarray(_K)

    def rnd(i, v):
        a, b, c, d, e, f, g, h = (v[j] for j in range(8))
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + k[i] + w[i]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        return jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g])

    v = jax.lax.fori_loop(0, 64, rnd, state, unroll=unroll)
    return state + v


def _py_compress(state: np.ndarray, block: bytes) -> None:
    """Pure-python SHA-256 compression, in place on state [8] uint32 — the
    ``runtime.sha256_midstate`` fallback when the C++ runtime is absent."""
    M = 0xFFFFFFFF

    def rotr(x, n):
        return ((x >> n) | (x << (32 - n))) & M

    w = list(np.frombuffer(block, dtype=">u4").astype(np.uint64))
    w = [int(x) for x in w]
    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & M)
    a, b, c, d, e, f, g, h = (int(x) for x in state)
    for i in range(64):
        s1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + s1 + ch + int(_K[i]) + w[i]) & M
        s0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (s0 + maj) & M
        a, b, c, d, e, f, g, h = (t1 + t2) & M, a, b, c, (d + t1) & M, e, f, g
    for i, v in enumerate((a, b, c, d, e, f, g, h)):
        state[i] = (int(state[i]) + v) & M


def pad_message(msg_len: int) -> int:
    """Number of 64-byte blocks for a message of msg_len bytes."""
    return (msg_len + 8) // 64 + 1


def sha256_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """Digest of pre-padded big-endian word blocks [n_blocks, 16] uint32.

    Static n_blocks; the per-block loop unrolls at trace time.
    """
    state = jnp.asarray(_H0)
    for i in range(blocks.shape[0]):
        state = _compress(state, blocks[i])
    return state


def bytes_to_blocks(msg: bytes) -> np.ndarray:
    """Host-side SHA-256 padding -> [n_blocks, 16] big-endian uint32 words."""
    ln = len(msg)
    padded = msg + b"\x80"
    while len(padded) % 64 != 56:
        padded += b"\x00"
    padded += (8 * ln).to_bytes(8, "big")
    arr = np.frombuffer(padded, dtype=">u4").astype(np.uint32)
    return arr.reshape(-1, 16)


_sha256_jit = jax.jit(sha256_blocks)


def sha256_device(msg: bytes) -> bytes:
    """End-to-end device hash of a host byte string (for testing/validation;
    the on-device FS loop will build the blocks on device instead)."""
    words = _sha256_jit(jnp.asarray(bytes_to_blocks(msg)))
    return np.asarray(words).astype(">u4").tobytes()
