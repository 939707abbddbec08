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


class MerkleMultiPath:
    """Batch opening of several leaves with deduplicated siblings.

    The single-leaf ``MerklePath`` costs height siblings per leaf; a batch
    of k openings shares interior nodes, so the multiproof carries only the
    frontier siblings no other opened leaf can reconstruct (the standard
    Merkle multiproof). ``siblings`` is the flat digest list in the
    deterministic bottom-up, index-ascending consumption order that
    ``verify`` replays.
    """

    def __init__(self, indices: List[int], height: int, siblings: List[bytes]):
        self.indices = list(indices)
        self.height = height
        self.siblings = list(siblings)

    def verify(self, root: bytes, leaves: Sequence[Felt]) -> bool:
        """Check that ``leaves`` (aligned with ``indices``) hash up to
        ``root`` using the recorded siblings."""
        if len(leaves) != len(self.indices):
            return False
        nodes = {
            i: _leaf_hash(v.to_bytes_le())
            for i, v in zip(self.indices, leaves)
        }
        stream = iter(self.siblings)
        try:
            for _ in range(self.height):
                nxt = {}
                for i in sorted(nodes):
                    if i ^ 1 in nodes and i % 2 == 1:
                        continue  # handled with its even partner
                    sib = nodes[i ^ 1] if i ^ 1 in nodes else next(stream)
                    left, right = (
                        (nodes[i], sib) if i % 2 == 0 else (sib, nodes[i])
                    )
                    nxt[i // 2] = _node_hash(left, right)
                nodes = nxt
        except StopIteration:
            return False
        if next(stream, None) is not None:
            return False  # trailing unused digests
        return nodes == {0: root}


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

    def generate_multi_proof(self, indices: Sequence[int]) -> MerkleMultiPath:
        """Batch opening of ``indices`` with shared siblings emitted once,
        in the order MerkleMultiPath.verify consumes them."""
        idxs = sorted(set(indices))
        assert idxs, "at least one index"
        siblings: List[bytes] = []
        cur = idxs
        for level in self.levels[:-1]:
            known = set(cur)
            for i in cur:
                if i ^ 1 in known:
                    if i % 2 == 1:
                        continue
                else:
                    siblings.append(level[i ^ 1])
            cur = sorted({i // 2 for i in cur})
        return MerkleMultiPath(idxs, len(self.levels) - 1, siblings)
