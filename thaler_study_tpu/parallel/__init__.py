"""Mesh-parallel proving over the sharded hypercube.

The reference has no parallelism (single-threaded Rust; SURVEY.md section 2
'Parallelism strategies: none'). Its TPU-native equivalents here:

- data parallel / sequence parallel: the 2^n evaluation table sharded over
  the mesh (``ShardedProductPoly``); local-variable folds touch no
  interconnect, round sums all-reduce (d+1) scalars per round;
- the distributed backend: ``jax.sharding`` + GSPMD-inserted collectives
  (psum / all-gather) over ICI, replacing the reference's in-process
  message passing;
- challenge broadcast: replicated host scalars.

TP/PP/EP have no analogue in the reference's behavior (SURVEY.md section 2);
the multi-block protocols shard via ``ShardedBlockPoly`` (trailing variables
of the last block: Z for the triangle IP, c for the dense-W GKR polynomial),
keeping every early fold local and all-reducing only the round sums.
"""

from .multihost import (
    DCN_AXIS,
    ICI_AXIS,
    init_distributed,
    make_mesh_2d,
    mesh_axis_spec,
)
from .sharded import (
    AXIS,
    ShardedBlockPoly,
    ShardedProductPoly,
    make_mesh,
    shard_factor,
)

__all__ = [
    "AXIS",
    "DCN_AXIS",
    "ICI_AXIS",
    "ShardedBlockPoly",
    "ShardedProductPoly",
    "init_distributed",
    "make_mesh",
    "make_mesh_2d",
    "mesh_axis_spec",
    "shard_factor",
]
