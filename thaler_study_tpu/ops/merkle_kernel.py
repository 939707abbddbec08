"""Batched device SHA-256 Merkle tree build.

The PCS commits with a SHA-256 Merkle tree (pcs/merkle.py; the reference's
arkworks ``MerkleTree`` with its pluggable hash — relaxed-pcs/src/lib.rs:
241-284). The host build hashes 2n-1 nodes one hashlib call at a time; here
every tree level is ONE vmapped SHA-256 compression over the whole level —
n leaf hashes in parallel, then n/2, n/4, ... two-to-one compressions —
and the entire tree is a single jitted device program per (n, byte_size).

Digests are byte-identical to the host tree (same ``leaf:``/``node:``
domain-separated preimages), differential-tested in tests/test_pcs.py.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sha256 import _compress, _H0
from .sha_chain import default_unroll

U8 = jnp.uint8
U32 = jnp.uint32

_LEAF_PREFIX = np.frombuffer(b"leaf:", np.uint8)
_NODE_PREFIX = np.frombuffer(b"node:", np.uint8)


def _pack_words(b: jnp.ndarray) -> jnp.ndarray:
    """[n, L] uint8 (L % 4 == 0) -> [n, L//4] big-endian uint32 words."""
    n, L = b.shape
    w = b.reshape(n, L // 4, 4).astype(U32)
    return (
        (w[..., 0] << U32(24))
        | (w[..., 1] << U32(16))
        | (w[..., 2] << U32(8))
        | w[..., 3]
    )


def _digest_bytes(words: jnp.ndarray) -> jnp.ndarray:
    """[n, 8] uint32 digest words -> [n, 32] uint8 (big-endian per word)."""
    n = words.shape[0]
    parts = [
        ((words >> U32(s)) & U32(0xFF)).astype(U8) for s in (24, 16, 8, 0)
    ]
    return jnp.stack(parts, axis=-1).reshape(n, 32)


def _sha_pad_tail(n: int, msg_len: int, tail_zeros: int) -> jnp.ndarray:
    """The 0x80 marker, ``tail_zeros`` zero bytes, and the 8-byte big-endian
    bit length that close a SHA-256 message of ``msg_len`` bytes."""
    tail = np.zeros(1 + tail_zeros + 8, np.uint8)
    tail[0] = 0x80
    tail[-8:] = np.frombuffer((8 * msg_len).to_bytes(8, "big"), np.uint8)
    return jnp.broadcast_to(jnp.asarray(tail), (n, tail.size))


def _compress_batch(state: jnp.ndarray, blocks: jnp.ndarray, unroll: int):
    """state [n, 8], blocks [n, 16] -> [n, 8] (one compression per row)."""
    return jax.vmap(partial(_compress, unroll=unroll))(state, blocks)


def _leaf_hashes(vals: jnp.ndarray, byte_size: int, unroll: int) -> jnp.ndarray:
    """sha256(b"leaf:" + value_le_bytes) for every row of [n, byte_size]."""
    n = vals.shape[0]
    msg_len = 5 + byte_size
    assert msg_len + 9 <= 64, "leaf message must fit one block"
    msg = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(_LEAF_PREFIX), (n, 5)),
            vals,
            _sha_pad_tail(n, msg_len, 64 - msg_len - 9),
        ],
        axis=1,
    )
    state = jnp.broadcast_to(jnp.asarray(_H0), (n, 8))
    return _compress_batch(state, _pack_words(msg), unroll)


def _node_hashes(
    left: jnp.ndarray, right: jnp.ndarray, unroll: int
) -> jnp.ndarray:
    """sha256(b"node:" + left + right) for digest rows [n, 8] -> [n, 8]."""
    n = left.shape[0]
    # 5 + 32 + 32 = 69 bytes -> two blocks (128 padded bytes)
    msg = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(_NODE_PREFIX), (n, 5)),
            _digest_bytes(left),
            _digest_bytes(right),
            _sha_pad_tail(n, 69, 128 - 69 - 9),
        ],
        axis=1,
    )
    words = _pack_words(msg).reshape(n, 2, 16)
    state = jnp.broadcast_to(jnp.asarray(_H0), (n, 8))
    state = _compress_batch(state, words[:, 0], unroll)
    return _compress_batch(state, words[:, 1], unroll)


@lru_cache(maxsize=None)
def _build_tree_jit(n: int, byte_size: int, unroll: int):
    def impl(vals: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        level = _leaf_hashes(vals, byte_size, unroll)
        levels = [level]
        while level.shape[0] > 1:
            level = _node_hashes(level[0::2], level[1::2], unroll)
            levels.append(level)
        return tuple(levels)

    return jax.jit(impl)


def build_tree_device(vals_le: np.ndarray) -> List[np.ndarray]:
    """Build the full Merkle tree on device.

    ``vals_le``: [n, byte_size] uint8 little-endian serialized leaf values
    (n a power of two). Returns the tree levels, leaves first, each as a
    host [n_i, 8] uint32 digest-word array — byte-identical to the host
    hashlib build.
    """
    n, byte_size = vals_le.shape
    fn = _build_tree_jit(n, byte_size, default_unroll())
    return [np.asarray(lvl) for lvl in fn(jnp.asarray(vals_le))]
