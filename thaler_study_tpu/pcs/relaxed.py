"""The relaxed polynomial commitment scheme (Thaler ch. 7 warm-up).

Re-implements relaxed-pcs/src/lib.rs (excluded from the reference's
workspace build — Cargo.toml:9-10 — but part of the repo's capability
surface): the prover commits to *all* |F|^m evaluations of a multilinear
polynomial in a Merkle tree; the verifier checks a claimed line
restriction by opening one committed point on a random line.

Only sensible for tiny fields (the reference tests use F5 with m=2); the
enumeration cost is inherent to the "relaxed" scheme, not an implementation
limit.
"""

from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

from ..fields import Felt, FieldConfig
from ..gkr.protocol import line, restrict_poly
from ..mle.dense import DenseMLE
from ..sumcheck.hypercube import FeltRng
from ..sumcheck.univariate import UniPoly
from .merkle import MerklePath, MerkleTree


class PCSError(Exception):
    """Crate error type (ref relaxed-pcs/src/lib.rs:22-41)."""


class EvalMismatch(PCSError):
    """Evaluation does not match the committed leaf (ref :27-28)."""


class DegreeMismatch(PCSError):
    """Prover claim degree mismatch (ref :39-40)."""


class NoProverPoly(PCSError):
    """Prover has not committed a polynomial (ref :30-31)."""


def all_field_values(field: FieldConfig) -> List[Felt]:
    """The IF trait's value enumeration (ref :47-53)."""
    return [field.felt(v) for v in range(field.p)]


def all_multidimensional_values(field: FieldConfig, m: int) -> List[Tuple[Felt, ...]]:
    """All of F^m in sorted order (ref :55-61 + permutations.rs)."""
    vals = all_field_values(field)
    return [tuple(p) for p in itertools.product(vals, repeat=m)]


class Prover:
    """PCS prover (ref :152-214)."""

    def __init__(self, poly: DenseMLE):
        self.poly = poly
        field = poly.field
        points = all_multidimensional_values(field, poly.num_vars)
        # one batched device program for all |F|^m evaluations
        values = poly.evaluate_many([list(pt) for pt in points])
        # pad to a power of two with zeros (ref :172-177)
        target = 1 << (len(values) - 1).bit_length()
        values = values + [field.zero()] * (target - len(values))
        self.values = values
        self.point_index = {pt: i for i, pt in enumerate(points)}
        self.tree = MerkleTree(values)

    def merkle_root(self) -> bytes:
        return self.tree.root()

    def poly_restriction_to_line(
        self, b: Sequence[Felt], c: Sequence[Felt]
    ) -> UniPoly:
        """q(t) = poly(l(t)) (ref :202-204, via gkr restrict_poly)."""
        return restrict_poly(b, c, self.poly)

    def challenge(self, point: Sequence[Felt]) -> Tuple[MerklePath, Felt]:
        """Open the committed evaluation at ``point`` (ref :207-213)."""
        idx = self.point_index[tuple(point)]
        return self.tree.generate_proof(idx), self.values[idx]


class Verifier:
    """PCS verifier (ref :65-149)."""

    def __init__(self, num_vars: int, degree: int, merkle_root: bytes):
        self.num_vars = num_vars
        self.degree = degree * num_vars  # ref :89: total degree bound
        self.merkle_root = merkle_root
        self.line: List[UniPoly] = []
        self.x: Felt = None
        self.challenge_point: List[Felt] = []
        self.prover_univariate: UniPoly = None

    def random_line(self, rng: FeltRng, field: FieldConfig):
        """Draw the random challenge line (ref :100-105)."""
        b = [rng.draw(field) for _ in range(self.num_vars)]
        c = [rng.draw(field) for _ in range(self.num_vars)]
        self.line = line(b, c)
        return b, c

    def commited_univariate(self, p: UniPoly) -> None:
        """Receive q with a degree check (ref :108-114) — note the PCS *does*
        enforce the degree bound the sumcheck verifier skips."""
        if p.degree() != self.degree:
            raise DegreeMismatch(
                f"expected degree {self.degree}, got {p.degree()}"
            )
        self.prover_univariate = p

    def challenge_prover(self, rng: FeltRng, field: FieldConfig) -> List[Felt]:
        """Pick x, send the line point l(x) (ref :117-125)."""
        self.x = rng.draw(field)
        self.challenge_point = [l.evaluate(self.x) for l in self.line]
        return list(self.challenge_point)

    def verify_prover_reply(self, path: MerklePath, leaf: Felt) -> None:
        """Verify the Merkle opening and q(x) == leaf (ref :128-148)."""
        if not path.verify(self.merkle_root, leaf):
            raise PCSError("merkle path verification failed")
        if self.prover_univariate is None:
            raise NoProverPoly()
        evaluation = self.prover_univariate.evaluate(self.x)
        if leaf != evaluation:
            raise EvalMismatch(f"{leaf} != {evaluation}")
