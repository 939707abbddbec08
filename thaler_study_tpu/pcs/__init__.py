"""Relaxed polynomial commitment scheme (ref: relaxed-pcs crate)."""

from .merkle import MerklePath, MerkleTree
from .relaxed import (
    DegreeMismatch,
    EvalMismatch,
    NoProverPoly,
    PCSError,
    Prover,
    Verifier,
    all_field_values,
    all_multidimensional_values,
)

__all__ = [
    "MerkleTree",
    "MerklePath",
    "Prover",
    "Verifier",
    "PCSError",
    "EvalMismatch",
    "DegreeMismatch",
    "NoProverPoly",
    "all_field_values",
    "all_multidimensional_values",
]
