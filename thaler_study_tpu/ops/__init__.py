"""Fused TPU kernels: sumcheck round steps, folds, eq tables."""

from .round_kernel import (
    PolySpec,
    fold_step,
    product_evals,
    round_step,
    sum_products,
)

__all__ = ["PolySpec", "fold_step", "product_evals", "round_step", "sum_products"]
