#!/bin/bash
# Round-4 fourth queue: the round-kernel op-diet A/Bs (VERDICT r3 #3).
# Waits for the r4c queue, re-gates on tunnel health, then measures the
# 2^23 fused round on: final defaults (fused fold, tile 2^13), the larger
# Pallas tile, the composed-fold control, and the VPU throughput probes
# that anchor the compute roofline. Run under nohup, poll $OUT/status.
set -u
cd /root/repo
OUT=${OUT:-/tmp/r4dm}
PREV=${PREV:-/tmp/r4cm}
mkdir -p "$OUT"
status() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }

status "waiting for the r4c queue"
while ! grep -q "ALL DONE" "$PREV/status" 2>/dev/null; do sleep 60; done

status "waiting for tunnel health"
python - <<'EOF'
import time, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
streak = 0
while streak < 3:
    t0 = time.time()
    try:
        jax.device_get(jax.jit(lambda a: a + 1)(jnp.float32(1.0)))
        dt = time.time() - t0
        streak = streak + 1 if dt < 0.3 else 0
        print(f"{time.strftime('%H:%M:%S')} sync {dt:.3f}s streak={streak}",
              flush=True)
    except Exception as e:
        streak = 0
        print(f"{time.strftime('%H:%M:%S')} err {e}", flush=True)
    if streak < 3:
        time.sleep(90)
print("TUNNEL_HEALTHY", flush=True)
EOF
status "tunnel healthy; starting queue"

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 t=$2; shift 2
  status "START $name"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  status "DONE  $name rc=$?"
}

# 2^23 fused round, final defaults (fused fold, tile 2^13)
run round_default  3600 python benches/roofline.py
# tile-size sweep: fewer grid steps vs more VMEM
run round_tile15   3600 python benches/roofline.py --tile-log 15
run round_tile14   3600 python benches/roofline.py --tile-log 14
# composed-fold control (the r3-era formulation)
run round_nofuse   3600 python benches/roofline.py --no-fused-fold
# arithmetic-mask fixup control (archives the selects-default evidence
# cited in fields/goldilocks.py — the earlier logs were not committed)
run round_masks    3600 python benches/roofline.py --masks
# VPU latency + THROUGHPUT probes (compute-roofline anchor)
run mulcost        3600 python benches/roofline.py --mulcost
status "ALL DONE"
