"""The matrix-multiplication IP (Thaler ch. 4.4).

Re-implements the reference's ``G`` polynomial
(matrix-multiplication/src/lib.rs:12-147):

    g(z) = f~_A(r1, z) * f~_B(z, r2)

so that sumcheck over g proves C[r1][r2] = (A*B)[r1][r2]. The reference's
hand-optimized ``to_univariate`` (one pass over even/odd pairs, evals at
t in {0,1,2}, explicit quadratic interpolation — :110-131) is exactly what
the generic fused round kernel produces for a 2-factor single-block product.
"""

from __future__ import annotations

from typing import Sequence

from ..fields import Felt, FieldConfig
from ..mle.dense import DenseMLE
from ..ops.round_kernel import PolySpec
from .factor_poly import ProductPoly


class MatMulG(ProductPoly):
    """g(z) = f~_A(r1,z) * f~_B(z,r2) over log(n) variables."""

    @classmethod
    def new(
        cls,
        n: int,
        a: Sequence,
        b: Sequence,
        point: Sequence[Felt],
        field: FieldConfig = None,
    ) -> "MatMulG":
        """Build g for the (r1, r2) entry of A*B.

        - ``n``: log2 of the matrix dimension (number of z variables).
        - ``a``, ``b``: row-major entries of the two 2^n x 2^n matrices
          (ints or Felts).
        - ``point``: (r1, r2) in F^{2n}.

        Mirrors the reference constructor (matrix-multiplication/
        src/lib.rs:77-92): f_a = MLE(a).relabel(0,n,n).fix(r1);
        f_b = MLE(b).fix(r2). Construction is O(n * 2^2n) device folds.
        """
        field = field or point[0].field
        a = [x.v if isinstance(x, Felt) else int(x) for x in a]
        b = [x.v if isinstance(x, Felt) else int(x) for x in b]
        f_a = (
            DenseMLE.from_evals_lsb(a, 2 * n, field)
            .relabel(0, n, n)
            .fix_variables(list(point[:n]))
        )
        f_b = DenseMLE.from_evals_lsb(b, 2 * n, field).fix_variables(
            list(point[n:])
        )
        assert f_a.num_vars == n and f_b.num_vars == n
        spec = PolySpec(
            block_sizes=(n,),
            table_blocks=((0,), (0,)),
            terms=((0, 1),),
        )
        return cls(spec, (f_a.evals, f_b.evals))
