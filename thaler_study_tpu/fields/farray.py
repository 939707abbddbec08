"""Device-side arrays of field elements.

:class:`FArray` is the framework's core datatype — the TPU analogue of a
``Vec<F>`` of arkworks field elements (and of ark-poly's evaluation vectors).
It is a pytree of uint32 limb arrays plus a static :class:`FieldConfig`, so it
flows through ``jit`` / ``shard_map`` / ``vmap`` transparently. Arithmetic
dispatches to the ``mont32`` or ``goldilocks`` backend.

Representation:

- mont32 fields:     1 limb,  Montgomery domain (x * 2^32 mod p)
- goldilocks field:  2 limbs (lo, hi), canonical
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import backend32 as b32
from . import goldilocks as gl
from .field import Felt, FieldConfig


@jax.tree_util.register_pytree_node_class
class FArray:
    """An n-dimensional array of field elements on device."""

    __slots__ = ("limbs", "field")

    def __init__(self, limbs: tuple, field: FieldConfig):
        self.limbs = tuple(limbs)
        self.field = field

    # -- pytree protocol --
    def tree_flatten(self):
        return self.limbs, self.field

    @classmethod
    def tree_unflatten(cls, field, limbs):
        return cls(limbs, field)

    # -- shape --
    @property
    def shape(self):
        return self.limbs[0].shape

    @property
    def ndim(self):
        return self.limbs[0].ndim

    def __len__(self):
        return self.shape[0]

    def reshape(self, *shape) -> "FArray":
        return FArray(tuple(l.reshape(*shape) for l in self.limbs), self.field)

    def __getitem__(self, idx) -> "FArray":
        return FArray(tuple(l[idx] for l in self.limbs), self.field)

    # -- constructors --
    @classmethod
    def from_ints(cls, values, field: FieldConfig, shape=None) -> "FArray":
        """Build from canonical Python ints / numpy ints (host -> device).

        The Montgomery conversion happens on host (exact numpy/py-int math) so
        that construction never launches a device computation — important on
        remote-compile TPU setups where every eager op pays a compile.
        """
        if isinstance(values, np.ndarray) and np.issubdtype(
            values.dtype, np.integer
        ):
            # fast vectorized path: values already machine ints
            obj = values
            vals64 = obj.astype(np.uint64).ravel()
            if (vals64 >= np.uint64(field.p)).any():
                vals64 = vals64 % np.uint64(field.p)
        else:
            # exact path: arbitrary python ints (numpy would silently convert
            # ints >= 2^63 in a list to float64, losing precision)
            obj = np.asarray(values, dtype=object)
            vals64 = np.array(
                [int(v) % field.p for v in obj.ravel()], dtype=np.uint64
            )
        arr_shape = obj.shape if shape is None else shape
        if field.backend == "mont32":
            # (v * R) % p: v, R < 2^31 so the product fits uint64 exactly
            mont = ((vals64 * np.uint64(field.mont_r)) % np.uint64(field.p)).astype(
                np.uint32
            )
            return cls((jnp.asarray(mont.reshape(arr_shape)),), field)
        lo = (vals64 & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(arr_shape)
        hi = (vals64 >> np.uint64(32)).astype(np.uint32).reshape(arr_shape)
        return cls((jnp.asarray(lo), jnp.asarray(hi)), field)

    @classmethod
    def from_felts(cls, felts: Sequence[Felt], field: FieldConfig = None) -> "FArray":
        field = field or felts[0].field
        return cls.from_ints([f.v for f in felts], field)

    @classmethod
    def zeros(cls, shape, field: FieldConfig) -> "FArray":
        n = field.num_limbs
        return cls(tuple(jnp.zeros(shape, dtype=jnp.uint32) for _ in range(n)), field)

    @classmethod
    def full(cls, shape, value: Felt) -> "FArray":
        one = cls.from_ints(np.array([value.v], dtype=object), value.field)
        return cls(
            tuple(jnp.broadcast_to(l[0], shape) for l in one.limbs), value.field
        )

    @classmethod
    def scalar(cls, value: Felt) -> "FArray":
        """A 0-d FArray (broadcasts against any shape)."""
        arr = cls.from_ints(np.array([value.v], dtype=object), value.field)
        return cls(tuple(l.reshape(()) for l in arr.limbs), value.field)

    # -- extraction (device -> host, exact) --
    def to_ints(self) -> np.ndarray:
        """Canonical integer values as a numpy object array.

        Pure host math (no device computation launched): the Montgomery
        un-scaling is done with python ints after the device_get.
        """
        f = self.field
        if f.backend == "mont32":
            raw = np.asarray(jax.device_get(self.limbs[0]))
            rinv = np.uint64(pow(f.mont_r, -1, f.p))
            # v * R^{-1} % p: both < 2^31 so the product fits uint64 exactly
            canon = np.asarray((raw.astype(np.uint64) * rinv) % np.uint64(f.p))
            return canon.astype(object)
        lo = np.asarray(jax.device_get(self.limbs[0])).astype(object)
        hi = np.asarray(jax.device_get(self.limbs[1])).astype(object)
        return np.asarray(lo + (hi << 32), dtype=object)

    def to_u64(self) -> np.ndarray:
        """Canonical integer values as np.uint64 — exact for every backend
        (p < 2^64), and ~100x cheaper than the object-array :meth:`to_ints`
        at 2^20+ elements (no per-element python-int boxing)."""
        f = self.field
        if f.backend == "mont32":
            raw = np.asarray(jax.device_get(self.limbs[0]))
            rinv = np.uint64(pow(f.mont_r, -1, f.p))
            return (raw.astype(np.uint64) * rinv) % np.uint64(f.p)
        lo = np.asarray(jax.device_get(self.limbs[0])).astype(np.uint64)
        hi = np.asarray(jax.device_get(self.limbs[1])).astype(np.uint64)
        return lo | (hi << np.uint64(32))

    def to_felts(self) -> list:
        return [Felt(int(v), self.field) for v in self.to_ints().ravel()]

    def item(self) -> Felt:
        vals = np.asarray(self.to_ints()).ravel()
        assert vals.size == 1
        return Felt(int(vals[0]), self.field)

    # -- arithmetic (elementwise, broadcasting like jnp) --
    def _coerce(self, other) -> "FArray":
        if isinstance(other, FArray):
            return other
        if isinstance(other, Felt):
            return FArray.scalar(other)
        raise TypeError(f"cannot operate FArray with {type(other)}")

    def __add__(self, other) -> "FArray":
        o = self._coerce(other)
        f = self.field
        if f.backend == "mont32":
            return FArray((b32.add(f.p, self.limbs[0], o.limbs[0]),), f)
        return FArray(gl.add(*self.limbs, *o.limbs), f)

    def __sub__(self, other) -> "FArray":
        o = self._coerce(other)
        f = self.field
        if f.backend == "mont32":
            return FArray((b32.sub(f.p, self.limbs[0], o.limbs[0]),), f)
        return FArray(gl.sub(*self.limbs, *o.limbs), f)

    def __mul__(self, other) -> "FArray":
        o = self._coerce(other)
        f = self.field
        if f.backend == "mont32":
            return FArray(
                (b32.mont_mul(f.p, f.mont_pinv_neg, self.limbs[0], o.limbs[0]),), f
            )
        return FArray(gl.mul(*self.limbs, *o.limbs), f)

    @classmethod
    def fold(cls, lo: "FArray", hi: "FArray", r) -> "FArray":
        """The sumcheck fold lo + r*(hi - lo) (reference identity:
        matrix-multiplication/src/lib.rs:114-122). Goldilocks fuses the
        trailing modular add into the product's 128-bit reduction
        (fields/goldilocks.fold) — bit-identical to the composed ops."""
        o = lo._coerce(r)
        f = lo.field
        if f.backend == "mont32" or not _FUSED_FOLD[0]:
            return lo + (hi - lo) * o
        return cls(gl.fold(*lo.limbs, *hi.limbs, *o.limbs), f)

    def __neg__(self) -> "FArray":
        f = self.field
        if f.backend == "mont32":
            return FArray((b32.neg(f.p, self.limbs[0]),), f)
        return FArray(gl.neg(*self.limbs), f)

    def double(self) -> "FArray":
        return self + self

    def sum(self, axis: int = 0, force_lanes: bool = False) -> "FArray":
        """Exact modular reduction along one axis. ``force_lanes`` keeps
        even tiny axes on the native-jnp.sum lane path — required when the
        axis is mesh-sharded so GSPMD emits one all-reduce, not a scalar
        collective-permute chain per tree level (backends' sum_mod)."""
        f = self.field
        if f.backend == "mont32":
            return FArray(
                (b32.sum_mod(f.p, self.limbs[0], axis, force_lanes),), f
            )
        return FArray(
            gl.sum_mod(self.limbs[0], self.limbs[1], axis, force_lanes), f
        )

    def sum_all(self) -> "FArray":
        out = self
        for _ in range(self.ndim):
            out = out.sum(axis=0)
        return out

    def concatenate(self, other: "FArray", axis: int = 0) -> "FArray":
        return FArray(
            tuple(
                jnp.concatenate([a, b], axis=axis)
                for a, b in zip(self.limbs, other.limbs)
            ),
            self.field,
        )

    def __repr__(self):
        return f"FArray({self.field.name}, shape={self.shape})"


# Fused-fold switch: True = goldilocks folds use the single-reduction form.
# Bit-identical either way (differential-tested); the switch exists so
# benchmarks can A/B the op-count diet (benches/roofline.py --no-fused-fold).
_FUSED_FOLD = [True]


def set_fused_fold(on) -> None:
    """Benchmarks only; callers must clear jit caches when flipping."""
    _FUSED_FOLD[0] = bool(on)
