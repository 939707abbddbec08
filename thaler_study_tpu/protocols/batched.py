"""Batched proving: many independent sumcheck instances per device program.

A prover service rarely proves one statement at a time. For B independent
instances of the *same shape* (e.g. B matmul entries, B MLE products), all
B rounds-j can run in one fused program: tables carry a leading batch axis
[B, 2^n], the per-instance challenges enter as a [B] vector (each
instance's Fiat-Shamir chain differs), and the (degree+1) round sums come
back as a [B, degree+1] block — one dispatch amortized over B proofs.

Transcripts are byte-identical to proving each instance alone (tested),
because batching changes scheduling, not math.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax

from ..fields import FArray, Felt, FieldConfig
from ..sumcheck.univariate import UniPoly, interpolate_at_small_points


def _fold_batch(tables: Sequence[FArray], r: FArray) -> Tuple[FArray, ...]:
    """Fold each instance's current variable at its own challenge.

    tables: [B, N] per factor; r: [B] -> broadcast [B, 1]."""
    out = []
    r2 = r.reshape(r.shape[0], 1)
    for t in tables:
        half = t.shape[1] // 2
        out.append(FArray.fold(t[:, :half], t[:, half:], r2))
    return tuple(out)


def _sums_batch(tables: Sequence[FArray], degree: int) -> FArray:
    """Round sums per instance: [B, degree+1]."""
    half = tables[0].shape[1] // 2
    parts = [(t[:, :half], t[:, half:]) for t in tables]
    deltas = [hi - lo for lo, hi in parts]
    prev = None
    cols = []
    for t_val in range(degree + 1):
        if t_val == 0:
            views = [lo for lo, _ in parts]
        elif t_val == 1:
            views = [hi for _, hi in parts]
        else:
            views = [v + d for v, d in zip(prev, deltas)]
        prev = views
        prod = views[0]
        for v in views[1:]:
            prod = prod * v
        cols.append(prod.sum(axis=1).reshape(-1, 1))
    out = cols[0]
    for c in cols[1:]:
        out = out.concatenate(c, axis=1)
    return out


@lru_cache(maxsize=None)
def _batch_round_jit(do_fold: bool, degree: int, nfac: int, field: FieldConfig):
    def impl(tables, r):
        if do_fold:
            tables = _fold_batch(tables, r)
        return _sums_batch(tables, degree), tables

    return jax.jit(impl)


@lru_cache(maxsize=None)
def _batch_c1_jit(nfac: int, field: FieldConfig):
    def impl(tables):
        prod = tables[0]
        for t in tables[1:]:
            prod = prod * t
        return prod.sum(axis=1)

    return jax.jit(impl)


class BatchedProductPoly:
    """B same-shape instances of a single-block k-factor product."""

    def __init__(self, tables: Sequence[FArray], degree: Optional[int] = None):
        self.tables = tuple(tables)  # each [B, 2^n]
        self.batch = self.tables[0].shape[0]
        self._degree = len(self.tables) if degree is None else degree

    @classmethod
    def stack(cls, instances: Sequence[Sequence[FArray]]) -> "BatchedProductPoly":
        """Stack B per-instance 1-D factor-table lists into batch form."""
        import jax.numpy as jnp

        nfac = len(instances[0])
        field = instances[0][0].field
        tables = []
        for k in range(nfac):
            limbs = tuple(
                jnp.stack([inst[k].limbs[li] for inst in instances])
                for li in range(field.num_limbs)
            )
            tables.append(FArray(limbs, field))
        return cls(tables)

    @property
    def field(self) -> FieldConfig:
        return self.tables[0].field

    def num_vars(self) -> int:
        return self.tables[0].shape[1].bit_length() - 1

    def c_1(self) -> List[Felt]:
        fn = _batch_c1_jit(len(self.tables), self.field)
        return fn(self.tables).to_felts()

    def round_batch(
        self, r_prev: Optional[Sequence[Felt]]
    ) -> Tuple[List[UniPoly], "BatchedProductPoly"]:
        """One round for all B instances; r_prev is the per-instance
        challenge list (None for round 0)."""
        do_fold = r_prev is not None
        fn = _batch_round_jit(do_fold, self._degree, len(self.tables), self.field)
        if do_fold:
            r = FArray.from_felts(list(r_prev), self.field)
        else:
            r = FArray.zeros((self.batch,), self.field)
        sums, tables = fn(self.tables, r)
        ints = sums.to_ints()  # [B, degree+1]
        unis = [
            interpolate_at_small_points(
                [Felt(int(v), self.field) for v in row], self.field
            )
            for row in ints
        ]
        return unis, BatchedProductPoly(tables, self._degree)


def generate_transcripts_batch(poly: BatchedProductPoly, field: FieldConfig, dst: bytes = b""):
    """Fiat-Shamir transcripts for all B instances. Fast path: the fused
    whole-proof kernel vmapped over the batch — ALL rounds of ALL B proofs
    in ONE device dispatch (ops/fs_kernel.fs_prove_device_batch). An
    instance whose serialized coefficients hit a zero (value-dependent
    message lengths; rare) is re-proven ALONE on the exact host loop —
    the rest of the batch keeps the fused result. Falls back to one device
    program per round (each instance keeping its own host hash chain) when
    the fused kernel does not apply at all. Byte-identical to per-instance
    ``generate_transcript`` runs either way."""
    from ..fiat_shamir.hash_to_field import DefaultFieldHasher
    from ..fiat_shamir.serialize import serialize_c1_and_poly, serialize_unipoly
    from ..fiat_shamir.transcript import (
        FiatShamirTranscript,
        SumcheckInteractiveProver,
        generate_transcript,
    )
    from ..ops.fs_kernel import fs_prove_device_batch
    from ..ops.round_kernel import PolySpec
    from ..sumcheck import Prover
    from .factor_poly import ProductPoly

    n_fused = poly.num_vars()
    spec = PolySpec(
        block_sizes=(n_fused,),
        table_blocks=tuple((0,) for _ in poly.tables),
        terms=(tuple(range(len(poly.tables))),),
    )
    if poly._degree == len(poly.tables):
        fused = fs_prove_device_batch(spec, poly.tables, dst)
        if fused is not None:
            out = []
            for i, msgs in enumerate(fused):
                if msgs is None:  # per-instance zero-coefficient fallback
                    inst = ProductPoly(
                        spec, tuple(t[i] for t in poly.tables)
                    )
                    out.append(
                        generate_transcript(
                            SumcheckInteractiveProver(Prover(inst)),
                            field,
                            dst,
                        )
                    )
                else:
                    out.append(FiatShamirTranscript(msgs))
            return out

    hasher = DefaultFieldHasher(field, dst)
    n = poly.num_vars()
    b = poly.batch
    c1s = poly.c_1()
    unis, poly = poly.round_batch(None)
    msgs = [[serialize_c1_and_poly(c1s[i], unis[i])] for i in range(b)]
    hash_inputs = [bytearray(msgs[i][0]) for i in range(b)]
    for _ in range(1, n):
        rs = [
            hasher.hash_to_field(bytes(hash_inputs[i]), 1)[0] for i in range(b)
        ]
        unis, poly = poly.round_batch(rs)
        for i in range(b):
            m = serialize_unipoly(unis[i])
            msgs[i].append(m)
            hash_inputs[i].extend(m)
    return [FiatShamirTranscript(m) for m in msgs]
