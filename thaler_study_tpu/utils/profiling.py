"""Profiling: per-round timing + jax.profiler trace capture.

The reference's only instrumentation is criterion wall-clock
(matrix-multiplication/benches/mm_benchmark.rs). Here: a lightweight
round-timer that any prover loop can wrap, and a context manager around
``jax.profiler.trace`` for XLA-level traces viewable in TensorBoard/Perfetto
(SURVEY.md section 5: 'jax.profiler traces + per-round field-ops counters').
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

from .counters import COUNTS


class RoundTimer:
    """Collects (label, seconds, field_ops) per protocol round."""

    def __init__(self):
        self.records: List[Dict] = []

    @contextlib.contextmanager
    def round(self, label: str):
        muls0, adds0 = COUNTS.field_muls, COUNTS.field_adds
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.records.append(
            {
                "label": label,
                "seconds": dt,
                "field_muls": COUNTS.field_muls - muls0,
                "field_adds": COUNTS.field_adds - adds0,
            }
        )

    def summary(self) -> Dict:
        total = sum(r["seconds"] for r in self.records)
        muls = sum(r["field_muls"] for r in self.records)
        adds = sum(r["field_adds"] for r in self.records)
        return {
            "rounds": len(self.records),
            "total_s": total,
            "field_muls": muls,
            "field_adds": adds,
            "field_ops_per_s": (muls + adds) / total if total else 0.0,
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace (open with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
