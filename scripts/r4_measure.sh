#!/bin/bash
# Round-4 measurement queue (VERDICT r3 #1/#2/#4). Waits for the remote
# TPU tunnel to be healthy (3 consecutive sub-300ms syncs), then runs the
# queued measurements sequentially with generous timeouts, logging to $OUT.
# Run under nohup and poll $OUT/status. NOTE: generous timeouts on purpose
# — a client killed mid-device-call wedges the device claim ~45 min.
set -u
cd /root/repo
OUT=${OUT:-/tmp/r4m}
mkdir -p "$OUT"
status() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }

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

# tunnel-health control first (known-cached program)
run roofline     2400 python benches/roofline.py
# flagship: GKR 2^24 on the restored segment_sum default, prove + verify
run gkr24_full   7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
# synced breakdown on the default path
run gkr24_bd     7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused --breakdown --skip-verify
# headline for the r4 row
run headline     3600 python bench.py
# GSPMD overhead of the sharded fused kernel on a 1-device mesh (r3 #4)
run gspmd_ovh    3600 python benches/scaling_benchmark.py --gspmd-overhead --vars 20
status "ALL DONE"
