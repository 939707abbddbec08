"""SHA-256 Merkle tree over field-element leaves.

The reference commits with an arkworks ``MerkleTree`` whose hashes are
pluggable (its tests pick Pedersen over JubJub — relaxed-pcs/src/lib.rs:
241-284). The hash family is a test-configuration choice, not protocol
structure; this framework's instantiation uses SHA-256 for both the leaf
hash and the two-to-one compression (the same primitive as the Fiat-Shamir
transcript), keeping the tree deterministic and dependency-free.

Leaves are canonical serialized field elements (8-byte LE, matching
fiat_shamir.serialize).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

from ..fields import Felt


def _leaf_hash(data: bytes) -> bytes:
    return hashlib.sha256(b"leaf:" + data).digest()


def _node_hash(left: bytes, right: bytes) -> bytes:
    return hashlib.sha256(b"node:" + left + right).digest()


class MerklePath:
    """Sibling path from a leaf to the root (ref arkworks Path)."""

    def __init__(self, index: int, leaf_hash: bytes, siblings: List[bytes]):
        self.index = index
        self.leaf_hash = leaf_hash
        self.siblings = siblings

    def verify(self, root: bytes, leaf: Felt) -> bool:
        if _leaf_hash(leaf.to_bytes_le()) != self.leaf_hash:
            return False
        h = self.leaf_hash
        idx = self.index
        for sib in self.siblings:
            h = _node_hash(h, sib) if idx % 2 == 0 else _node_hash(sib, h)
            idx //= 2
        return h == root


class MerkleTree:
    """A complete binary Merkle tree over a power-of-two leaf list.

    Above ``FrameworkConfig.merkle_device_min_leaves`` the build runs as
    one device program — every level a batched SHA-256 compression
    (ops/merkle_kernel.py) — with byte-identical digests; smaller trees
    (and ``merkle_device_min_leaves = 0``) hash per node with hashlib.
    """

    def __init__(self, values: Sequence[Felt]):
        n = len(values)
        assert n & (n - 1) == 0 and n > 0, "leaf count must be a power of two"
        self.values = list(values)
        from ..utils.config import get_config

        min_leaves = get_config().merkle_device_min_leaves
        if min_leaves and n >= min_leaves:
            self.levels = self._build_device(values)
            return
        level = [_leaf_hash(v.to_bytes_le()) for v in values]
        self.levels = [level]
        while len(level) > 1:
            level = [
                _node_hash(level[i], level[i + 1])
                for i in range(0, len(level), 2)
            ]
            self.levels.append(level)

    @staticmethod
    def _build_device(values: Sequence[Felt]) -> List[List[bytes]]:
        import numpy as np

        from ..ops.merkle_kernel import build_tree_device

        byte_size = values[0].field.byte_size
        vals_le = np.frombuffer(
            b"".join(v.to_bytes_le() for v in values), np.uint8
        ).reshape(len(values), byte_size)
        levels = build_tree_device(vals_le)
        return [
            [row.astype(">u4").tobytes() for row in lvl] for lvl in levels
        ]

    def root(self) -> bytes:
        return self.levels[-1][0]

    def generate_proof(self, index: int) -> MerklePath:
        siblings = []
        idx = index
        for level in self.levels[:-1]:
            siblings.append(level[idx ^ 1])
            idx //= 2
        return MerklePath(index, self.levels[0][index], siblings)
