"""Framework configuration.

The reference has no config system — every parameter is a function argument
or a const-generic field type (SURVEY.md section 5). The TPU build needs a
small amount of deployment configuration: which field backend, how the mesh
is laid out, kernel thresholds. One frozen dataclass, overridable per call
and via THALER_* environment variables.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

from ..fields import BABYBEAR, F5, F389, F1572869, GOLDILOCKS, FieldConfig

_FIELDS = {
    "f5": F5,
    "f389": F389,
    "f1572869": F1572869,
    "goldilocks": GOLDILOCKS,
    "babybear": BABYBEAR,
}


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    """Global knobs for the prover runtime."""

    # field for protocols that do not receive one explicitly
    field_name: str = "goldilocks"
    # mesh axis name + how many hypercube variables to shard (None = auto:
    # log2 of the device count)
    mesh_axis: str = "hypercube"
    shard_vars: Optional[int] = None
    # kernel selection
    use_pallas: bool = True  # lane-reduction kernel beats XLA (~1.3x @ 2^23)
    pallas_min_vars: int = 12
    # GKR bookkeeping (LibraW phase tables + circuit forward pass) on device
    # (gkr/device_tables.py) instead of the host C++ runtime
    gkr_device_tables: bool = True
    # How phase-table scatter-adds are formulated (gkr/device_tables):
    #   "scan":    host-sorted gather + exact modular associative_scan +
    #              boundary differences — no scatter op at all. DEFAULT:
    #              the only formulation verified correct on the real TPU
    #              at every layer size (see below).
    #   "segment": one packed jax.ops.segment_sum (8/16-bit lanes).
    #              WARNING — measured MISCOMPILE on real TPU (2026-08-19):
    #              when the segment_sum fuses with the modular lane
    #              recombination inside one jitted program, small-shape
    #              scatters (observed at g = 2^4 gates; 2^20 verified
    #              fine) return values short by exactly one unit in each
    #              ">> 16" lane — silently wrong phase tables. Eager
    #              (unfused) execution and CPU are exact. Kept for
    #              large-layer perf studies only.
    #   "plan":    dense [2^k, max_fanin] gathers over a host plan.
    #              Measured 3.5x SLOWER than segment at 2^24 gates (synced
    #              phase-1 23.9 s vs 6.8 s; whole prover 53.4 s vs 16.5 s —
    #              bench_logs/r3/gkr24_plan{0,1}.log); kept for skew-free
    #              hardware studies only
    # All three produce bit-identical tables on CPU (differential-tested).
    gkr_scatter_mode: str = "scan"
    # PCS Merkle build: batched device SHA-256 (ops/merkle_kernel.py) above
    # this leaf count; below it (or when 0 disables it) per-node hashlib
    merkle_device_min_leaves: int = 64
    # persistent compilation cache directory ("" disables)
    compile_cache_dir: str = ".jax_cache"

    @property
    def field(self) -> FieldConfig:
        return _FIELDS[self.field_name]

    @classmethod
    def from_env(cls) -> "FrameworkConfig":
        """Environment overrides: THALER_FIELD, THALER_SHARD_VARS,
        THALER_PALLAS, THALER_CACHE_DIR."""
        kw = {}
        if os.environ.get("THALER_FIELD"):
            kw["field_name"] = os.environ["THALER_FIELD"].lower()
        if os.environ.get("THALER_SHARD_VARS"):
            kw["shard_vars"] = int(os.environ["THALER_SHARD_VARS"])
        if os.environ.get("THALER_PALLAS"):
            kw["use_pallas"] = os.environ["THALER_PALLAS"] == "1"
        if os.environ.get("THALER_GKR_DEVICE"):
            kw["gkr_device_tables"] = os.environ["THALER_GKR_DEVICE"] == "1"
        if os.environ.get("THALER_GKR_SCATTER"):
            kw["gkr_scatter_mode"] = os.environ["THALER_GKR_SCATTER"]
        elif os.environ.get("THALER_GKR_PLAN"):
            kw["gkr_scatter_mode"] = (
                "plan" if os.environ["THALER_GKR_PLAN"] == "1" else "segment"
            )
        if os.environ.get("THALER_MERKLE_DEVICE_MIN"):
            kw["merkle_device_min_leaves"] = int(
                os.environ["THALER_MERKLE_DEVICE_MIN"]
            )
        if os.environ.get("THALER_CACHE_DIR") is not None:
            kw["compile_cache_dir"] = os.environ.get(
                "THALER_CACHE_DIR", cls.compile_cache_dir
            )
        return cls(**kw)

    def apply_jax_config(self) -> None:
        """Install the persistent compilation cache (idempotent)."""
        if self.compile_cache_dir:
            import jax

            jax.config.update(
                "jax_compilation_cache_dir", self.compile_cache_dir
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0
            )


DEFAULT = FrameworkConfig()

# ---------------------------------------------------------------------------
# Active config: the single source of truth the kernels consult.
# Initialized from the environment once at import; changed explicitly via
# set_config()/use_config(). Kernels must NOT read THALER_* directly.
# ---------------------------------------------------------------------------

_active: FrameworkConfig = FrameworkConfig.from_env()


def get_config() -> FrameworkConfig:
    """The currently active framework configuration."""
    return _active


def set_config(cfg: FrameworkConfig) -> FrameworkConfig:
    """Install ``cfg`` as the active configuration; returns the previous one."""
    global _active
    prev = _active
    _active = cfg
    return prev


class use_config:
    """Context manager scoping an active-config override.

    >>> with use_config(FrameworkConfig(use_pallas=True)):
    ...     ...  # round kernels take the Pallas path here
    """

    def __init__(self, cfg: FrameworkConfig):
        self.cfg = cfg
        self._prev: Optional[FrameworkConfig] = None

    def __enter__(self) -> FrameworkConfig:
        self._prev = set_config(self.cfg)
        return self.cfg

    def __exit__(self, *exc) -> None:
        assert self._prev is not None
        set_config(self._prev)
