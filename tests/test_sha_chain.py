"""Carried-midstate FS chain (ops/sha_chain.py) vs the host hasher.

The chain must reproduce DefaultFieldHasher<Sha256,128>.hash_to_field over
the running transcript byte-for-byte, for any split of the transcript into
absorbed messages, in both offset modes (static python ints vs traced
uint32 scalars) — it replaces the per-draw full re-hash inside the fused
proof kernels (ref chain semantics: fiat-shamir/src/lib.rs:82-93).
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thaler_study_tpu.fiat_shamir.hash_to_field import DefaultFieldHasher
from thaler_study_tpu.fields import F1572869, GOLDILOCKS
from thaler_study_tpu.fields import backend32 as b32
from thaler_study_tpu.ops.sha_chain import DevChain, hash_to_field_chain
from thaler_study_tpu.runtime import sha256_midstate


def _chain_values(pairs, field):
    """Canonical ints from hash_to_field_chain output pairs."""
    out = []
    for lo, hi in pairs:
        if field.backend == "goldilocks":
            out.append(int(np.asarray(lo)) | (int(np.asarray(hi)) << 32))
        else:
            out.append(
                int(
                    np.asarray(
                        b32.from_mont(
                            field.p, field.mont_pinv_neg, jnp.asarray(lo)
                        )
                    )
                )
            )
    return out


@pytest.mark.parametrize("field", [GOLDILOCKS, F1572869])
def test_static_chain_matches_host(rng, field):
    """Absorb a random message split; every draw (count 1, 2, 5) matches the
    host hasher over the byte concatenation, at varied tail offsets."""
    msgs = [
        bytes(rng.randrange(256) for _ in range(ln))
        for ln in (3, 57, 64, 128, 40, 1)
    ]
    hasher = DefaultFieldHasher(field)

    def run(counts):
        chain = DevChain.fresh()
        outs = []
        for m, count in zip(msgs, counts):
            chain = chain.absorb(jnp.asarray(np.frombuffer(m, np.uint8)))
            outs.extend(hash_to_field_chain(chain, field, count))
        return outs

    counts = [1, 2, 1, 5, 2, 1]
    got = _chain_values(jax.jit(lambda: run(counts))(), field)
    want = []
    prefix = b""
    for m, count in zip(msgs, counts):
        prefix += m
        want.extend(f.v for f in hasher.hash_to_field(prefix, count))
    assert got == want


@pytest.mark.parametrize("offset", [0, 1, 51, 52, 63, 64, 119])
def test_traced_chain_matches_host(rng, offset):
    """Traced-offset mode: the host seeds (midstate, buf, nbytes) from an
    arbitrary prefix via runtime.sha256_midstate, the device absorbs one
    more message and draws — byte-identical to hashing the whole transcript
    on host. Offsets straddle the one/two-tail-block boundary (fill 51/52)."""
    field = GOLDILOCKS
    prefix = bytes(rng.randrange(256) for _ in range(offset))
    msg = bytes(rng.randrange(256) for _ in range(37))

    full = bytes(64) + prefix
    nfull = len(full) // 64
    state = sha256_midstate(full[: 64 * nfull])
    buf = np.zeros(64, np.uint8)
    rem = full[64 * nfull :]
    buf[: len(rem)] = np.frombuffer(rem, np.uint8)

    @jax.jit
    def run(state, buf, nbytes, msg_arr):
        chain = DevChain(state, buf, nbytes)
        chain = chain.absorb(msg_arr)
        return hash_to_field_chain(chain, field, 2)

    got = _chain_values(
        run(
            jnp.asarray(state),
            jnp.asarray(buf),
            jnp.uint32(len(prefix)),
            jnp.asarray(np.frombuffer(msg, np.uint8)),
        ),
        field,
    )
    want = [
        f.v
        for f in DefaultFieldHasher(field).hash_to_field(prefix + msg, 2)
    ]
    assert got == want


def test_sha256_midstate_matches_hashlib():
    """The native (or fallback) block compressor tracks hashlib exactly."""
    data = bytes(range(256)) * 3  # 768 bytes = 12 blocks
    state = sha256_midstate(data)
    # finishing the stream by hand must give hashlib's digest
    msg_len = len(data)
    tail = b"\x80" + bytes((56 - (msg_len + 1)) % 64) + (8 * msg_len).to_bytes(
        8, "big"
    )
    final = sha256_midstate(tail, state)
    digest = b"".join(int(w).to_bytes(4, "big") for w in final)
    assert digest == hashlib.sha256(data).digest()
