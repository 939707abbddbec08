"""Prime-field arithmetic for the TPU prover.

The reference delegates field arithmetic to arkworks' ``Fp64<MontBackend<_, 1>>``
(64-bit Montgomery fields; test moduli 5, 389, 1572869 — see e.g.
sum-check-protocol/src/lib.rs:349-354). Here a field is described by a
:class:`FieldConfig`, host-side scalars are exact-integer :class:`Felt` values,
and device-side tables are uint32 limb arrays operated on by the backends in
``backend32`` (p < 2^31, Montgomery R=2^32) and ``goldilocks``
(p = 2^64 - 2^32 + 1, the production 64-bit field).
"""

from .field import FieldConfig, Felt, FeltVector, F5, F389, F1572869, GOLDILOCKS, BABYBEAR
from .farray import FArray

__all__ = [
    "FieldConfig",
    "Felt",
    "FeltVector",
    "FArray",
    "F5",
    "F389",
    "F1572869",
    "GOLDILOCKS",
    "BABYBEAR",
]
