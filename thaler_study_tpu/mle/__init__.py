"""Multilinear extensions over the boolean hypercube (ref: multilinear-extensions crate + ark-poly DenseMultilinearExtension)."""

from .dense import DenseMLE, bitrev_perm, fold_msb
from .algorithms import (
    cti_multilinear_from_evaluations,
    eq_weight_table,
    vsbw_multilinear_from_evaluations,
)

__all__ = [
    "DenseMLE",
    "bitrev_perm",
    "fold_msb",
    "eq_weight_table",
    "vsbw_multilinear_from_evaluations",
    "cti_multilinear_from_evaluations",
]
