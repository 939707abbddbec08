"""Special-purpose interactive proofs (ref: matrix-multiplication + triangle-counting crates)."""

from .batched import BatchedProductPoly, generate_transcripts_batch
from .factor_poly import ProductPoly
from .matmul import MatMulG
from .triangles import TriangleG

__all__ = [
    "ProductPoly",
    "MatMulG",
    "TriangleG",
    "BatchedProductPoly",
    "generate_transcripts_batch",
]
