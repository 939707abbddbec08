#!/usr/bin/env python3
"""Multi-host prover launch script.

Run the SAME command on every host of a TPU pod slice (e.g. via
`gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`):

    python scripts/multihost_launch.py                 # auto-discovery
    python scripts/multihost_launch.py \
        --coordinator 10.0.0.2:8476 --num-processes 4 --process-id $WORKER

Every host executes the identical SPMD program: tables are sharded over the
('dcn', 'ici') mesh (highest shard bits across hosts, lower bits across a
host's chips), the per-round all-reduce rides ICI then DCN, and each host
derives the identical Fiat-Shamir transcript (printed as a SHA-256 digest —
compare across workers to confirm bit-identity).

On this development container only one chip is visible; the script then
degenerates to a 1x1 mesh and still runs end-to-end. The >=80%-at-4-hosts
scaling target (BASELINE.md) can only be measured on a real pod slice —
benches/scaling_benchmark.py measures the virtual-mesh proxy.
"""

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--n-vars", type=int, default=20)
    ap.add_argument("--factors", type=int, default=2)
    args = ap.parse_args()

    from thaler_study_tpu.parallel import init_distributed, make_mesh_2d

    if args.coordinator or args.num_processes:
        init_distributed(args.coordinator, args.num_processes, args.process_id)
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        init_distributed()

    mesh = make_mesh_2d()
    print(
        f"process {jax.process_index()}/{jax.process_count()} "
        f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
        f"devices={len(jax.devices())}",
        flush=True,
    )

    import random

    import numpy as np

    from thaler_study_tpu.fields import GOLDILOCKS
    from thaler_study_tpu.fiat_shamir import (
        SumcheckInteractiveProver,
        generate_transcript,
    )
    from thaler_study_tpu.mle.dense import DenseMLE
    from thaler_study_tpu.ops.round_kernel import PolySpec
    from thaler_study_tpu.parallel import ShardedBlockPoly
    from thaler_study_tpu.sumcheck import Prover

    field = GOLDILOCKS
    n = args.n_vars
    rng = random.Random(1234)  # same seed on every host -> same tables
    spec = PolySpec(
        block_sizes=(n,),
        table_blocks=tuple((0,) for _ in range(args.factors)),
        terms=(tuple(range(args.factors)),),
    )
    tables = [
        DenseMLE.from_evals_lsb(
            np.array(
                [rng.randrange(field.p) for _ in range(1 << n)],
                dtype=np.uint64,
            ),
            n,
            field,
        ).evals
        for _ in range(args.factors)
    ]
    n_shard = (mesh.devices.size - 1).bit_length()
    poly = ShardedBlockPoly.from_internal_tables(
        spec, tables, mesh, n_shard=n_shard
    )
    t0 = time.perf_counter()
    transcript = generate_transcript(
        SumcheckInteractiveProver(Prover(poly)), field
    )
    elapsed = time.perf_counter() - t0
    digest = hashlib.sha256(transcript.to_bytes()).hexdigest()
    print(
        f"process {jax.process_index()}: {n}-var proof in {elapsed:.2f}s  "
        f"transcript sha256={digest}",
        flush=True,
    )


if __name__ == "__main__":
    main()
