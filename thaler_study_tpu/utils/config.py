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
    # phase-table builds as dense gathers over a host-precomputed plan
    # instead of segment_sum scatters (gkr/device_tables.gather_plan);
    # automatic fallback to scatter above MAX_PLAN_FANIN either way
    gkr_gather_plan: bool = True
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
        if os.environ.get("THALER_GKR_PLAN"):
            kw["gkr_gather_plan"] = os.environ["THALER_GKR_PLAN"] == "1"
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
