"""Scaling-efficiency harness: sharded sumcheck prover across mesh sizes.

BASELINE north-star: >=80% scaling efficiency from 1 to 4 hosts. Real
multi-host ICI is not reachable from this container (one chip behind a
tunnel), so by default this harness runs on the virtual CPU mesh
(xla_force_host_platform_device_count) to exercise the sharded code path
and the harness itself; on a real pod slice the same script measures true
scaling (run one process per host with jax.distributed initialized).

For each mesh size D in --devices: shard a 2-factor product over D
devices, run the full FS prover twice (second run warm), report wall time
and efficiency vs the single-device run. The default path is the
PRODUCTION one — the fused whole-proof GSPMD kernel
(ops/fs_kernel.fs_prove_device_sharded); ``--per-round`` measures the
legacy per-round ShardedProductPoly loop instead.

``--gspmd-overhead``: time the fused kernel unsharded vs sharded over a
1-DEVICE mesh (identical math, GSPMD partitioning on) — bounds the pure
GSPMD program overhead without needing more than one chip (VERDICT r3
#4); runs on the real TPU by default (SCALING_REAL=1 semantics).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vars", type=int, default=18)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument(
        "--virtual-cpu",
        action="store_true",
        default=os.environ.get("SCALING_REAL") != "1",
        help="force a virtual CPU mesh (default unless SCALING_REAL=1)",
    )
    ap.add_argument(
        "--mesh-2d",
        action="store_true",
        help="sweep 2-D (dcn x ici) mesh shapes instead of 1-D sizes",
    )
    ap.add_argument(
        "--per-round",
        action="store_true",
        help="measure the legacy per-round ShardedProductPoly loop "
        "instead of the fused whole-proof GSPMD kernel",
    )
    ap.add_argument(
        "--gspmd-overhead",
        action="store_true",
        help="time fused unsharded vs fused sharded over a 1-device mesh "
        "(pure GSPMD overhead; runs on the default platform, i.e. the "
        "real TPU when available)",
    )
    args = ap.parse_args()

    if args.gspmd_overhead:
        args.virtual_cpu = False
    if args.virtual_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()

    import jax

    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from thaler_study_tpu.fields import GOLDILOCKS as F
    from thaler_study_tpu.fiat_shamir import (
        SumcheckInteractiveProver,
        generate_transcript,
    )
    from thaler_study_tpu.mle.dense import DenseMLE
    from thaler_study_tpu.ops.round_kernel import PolySpec
    from thaler_study_tpu.parallel import ShardedProductPoly, make_mesh
    from thaler_study_tpu.protocols import ProductPoly
    from thaler_study_tpu.sumcheck import Prover

    n = args.vars
    rng = np.random.default_rng(0)
    tables = [
        DenseMLE.from_evals_lsb(
            rng.integers(0, 1 << 62, 1 << n), n, F
        ).evals
        for _ in range(2)
    ]
    spec = PolySpec(
        block_sizes=(n,), table_blocks=((0,), (0,)), terms=((0, 1),)
    )

    if args.gspmd_overhead:
        from thaler_study_tpu.parallel import make_mesh
        from thaler_study_tpu.ops.fs_kernel import (
            fs_prove_device,
            fs_prove_device_sharded,
        )
        from thaler_study_tpu.utils.config import get_config

        get_config().apply_jax_config()
        mesh = make_mesh(jax.devices()[:1])
        for run in range(2):
            t0 = time.perf_counter()
            plain = fs_prove_device(spec, tables)
            plain_s = time.perf_counter() - t0
        for run in range(2):
            t0 = time.perf_counter()
            # n_shard=3: the same [2^3, 2^(n-3)] program layout a real
            # 8-chip mesh would run, partitioned onto one device
            sharded = fs_prove_device_sharded(spec, tables, mesh, n_shard=3)
            sharded_s = time.perf_counter() - t0
        assert plain is not None and sharded == plain, "diverged"
        print(
            json.dumps(
                {
                    "bench": "fused_sharded_gspmd_overhead",
                    "hypercube_points": 1 << n,
                    "fused_unsharded_s_warm": round(plain_s, 4),
                    "fused_sharded_1dev_s_warm": round(sharded_s, 4),
                    "overhead_pct": round(
                        100.0 * (sharded_s - plain_s) / plain_s, 1
                    ),
                    "transcript_identical": True,
                    "platform": str(jax.devices()[0].platform),
                }
            ),
            flush=True,
        )
        return

    base_time = None
    base_bytes = None
    # 2-D (dcn x ici) mesh shapes: emulate host boundaries on the virtual
    # mesh — every shape must yield identical bytes (and on a real pod,
    # the dcn axis rides the inter-host network)
    if args.mesh_2d:
        from thaler_study_tpu.parallel import ShardedBlockPoly, make_mesh_2d

        total = max(args.devices)
        local_t = time.perf_counter()
        t_ref = generate_transcript(
            SumcheckInteractiveProver(Prover(ProductPoly(spec, tables))), F
        )
        local_s = time.perf_counter() - local_t
        ref_bytes = t_ref.to_bytes()
        dcn = 1
        while dcn <= total:
            for run in range(2):
                mesh = make_mesh_2d(jax.devices()[:total], dcn_size=dcn)
                poly = ShardedBlockPoly.from_internal_tables(
                    spec, tables, mesh, n_shard=(total - 1).bit_length()
                )
                t0 = time.perf_counter()
                transcript = generate_transcript(
                    SumcheckInteractiveProver(Prover(poly)), F
                )
                elapsed = time.perf_counter() - t0
            assert transcript.to_bytes() == ref_bytes, "2-D mesh diverged"
            print(
                json.dumps(
                    {
                        "bench": "sharded_sumcheck_scaling_2d",
                        "mesh": f"{dcn}x{total // dcn}",
                        "hypercube_points": 1 << n,
                        "prove_s_warm": round(elapsed, 4),
                        "speedup_vs_local": round(local_s / elapsed, 3),
                        "transcript_identical": True,
                    }
                ),
                flush=True,
            )
            dcn *= 2
        return

    from thaler_study_tpu.ops.fs_kernel import (
        fs_prove_device,
        fs_prove_device_sharded,
    )

    for d in args.devices:
        devices = jax.devices()[:d]
        if len(devices) < d:
            print(json.dumps({"devices": d, "skipped": "not enough devices"}))
            continue
        for run in range(2):
            if args.per_round:
                # legacy path: one host round-trip per round
                if d == 1:
                    poly = ProductPoly(spec, tables)
                else:
                    mesh = make_mesh(devices)
                    poly = ShardedProductPoly.from_internal_tables(
                        tables, mesh, n_shard=(d - 1).bit_length()
                    )
                t0 = time.perf_counter()
                transcript = generate_transcript(
                    SumcheckInteractiveProver(Prover(poly)), F
                )
                elapsed = time.perf_counter() - t0
                blob = transcript.to_bytes()
            else:
                # production path: the fused whole-proof GSPMD kernel
                t0 = time.perf_counter()
                if d == 1:
                    msgs = fs_prove_device(spec, tables)
                else:
                    mesh = make_mesh(devices)
                    msgs = fs_prove_device_sharded(
                        spec, tables, mesh, n_shard=(d - 1).bit_length()
                    )
                elapsed = time.perf_counter() - t0
                assert msgs is not None
                blob = b"".join(msgs)
        if base_time is None:
            base_time = elapsed
            base_bytes = blob
        assert blob == base_bytes, "sharded transcript diverged"
        print(
            json.dumps(
                {
                    "bench": "sharded_sumcheck_scaling",
                    "path": "per_round" if args.per_round else "fused",
                    "devices": d,
                    "hypercube_points": 1 << n,
                    "prove_s_warm": round(elapsed, 4),
                    "speedup_vs_1dev": round(base_time / elapsed, 3),
                    "transcript_identical": True,
                    "platform": str(jax.devices()[0].platform),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
