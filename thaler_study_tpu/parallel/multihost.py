"""Multi-host proving: jax.distributed init + 2-axis (ICI x DCN) meshes.

The reference is a single process (SURVEY.md section 5: distributed backend
"none"); the TPU framework's multi-host story is pure SPMD:

- every host runs the SAME protocol driver (the state machines in
  sumcheck/gkr are deterministic and tiny — O(rounds) scalar work), so the
  transcript is identical on every host by construction;
- the 2^n evaluation tables are sharded over a 2-axis mesh
  ``('dcn', 'ici')``: the trailing shard variables split with the highest
  bits on the DCN (inter-host) axis and the lower bits on the ICI
  (intra-host) axis. Fold order is local bits -> ICI bits -> DCN bits, so
  every fold is communication-free and the per-round all-reduce of the
  (degree+1) round sums is hierarchical (ICI first, then DCN) — exactly the
  layout recipe of SURVEY.md section 5 (long-context slot);
- collectives are inserted by GSPMD from the shardings; there is no
  hand-written NCCL/MPI analogue to port.

Hardware caveat (BASELINE.md): this container exposes ONE real TPU chip, so
the >=80%-at-4-hosts scaling target cannot be *measured* here; what this
module provides is the complete code path (init, mesh, layout, launch
script scripts/multihost_launch.py) validated for transcript identity on
virtual meshes of every shape (tests/test_multihost.py: 1x8, 2x4, 8x1).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host run (idempotent).

    With no arguments JAX discovers the topology from the TPU runtime /
    cluster environment (GKE, Cloud TPU); explicit values support manual
    bring-up (see scripts/multihost_launch.py).
    """
    if jax.process_count() > 1 or getattr(
        jax.distributed.global_state, "client", None
    ):
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh_2d(
    devices: Optional[Sequence] = None,
    dcn_size: Optional[int] = None,
) -> Mesh:
    """A 2-axis ('dcn', 'ici') mesh.

    ``dcn_size`` defaults to the number of processes (hosts): each host's
    local devices form one ICI group. On a single host (or a virtual CPU
    mesh) pass ``dcn_size`` explicitly to emulate host boundaries.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if dcn_size is None:
        dcn_size = max(jax.process_count(), 1)
    total = len(devices)
    if total % dcn_size != 0:
        raise ValueError(
            f"{total} devices do not split into {dcn_size} DCN groups"
        )
    arr = np.array(devices).reshape(dcn_size, total // dcn_size)
    return Mesh(arr, (DCN_AXIS, ICI_AXIS))


def mesh_axis_spec(mesh: Mesh) -> Tuple[str, ...]:
    """The axis tuple to shard the hypercube dimension over: all mesh axes,
    outermost (DCN) first — highest shard bits land on the slowest links."""
    return tuple(mesh.axis_names)
