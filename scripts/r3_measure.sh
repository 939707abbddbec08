#!/bin/bash
# Round-3 measurement queue (ROADMAP "Remaining #1"). Waits for the remote
# TPU tunnel to be healthy (3 consecutive sub-300ms syncs), then runs every
# queued perf measurement sequentially with generous timeouts, logging to
# $OUT. Run it under nohup and poll $OUT/status.
set -u
cd /root/repo
OUT=${OUT:-/tmp/r3m}
mkdir -p "$OUT"
status() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }

status "waiting for tunnel health"
python - <<'EOF'
import time, jax, sys
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

run mulcost     2400 python benches/roofline.py --mulcost
run roofline_k0 2400 python benches/roofline.py
run roofline_k1 2400 python benches/roofline.py --karatsuba 1
run roofline_k2 2400 python benches/roofline.py --karatsuba 2
run headline    3600 python bench.py
run gkr24_full  7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
THALER_GKR_PLAN=1 run gkr24_plan1 7200 python benches/gkr_benchmark.py \
  --depth 16 --width-log 20 --fused --breakdown --skip-verify
THALER_GKR_PLAN=0 run gkr24_plan0 7200 python benches/gkr_benchmark.py \
  --depth 16 --width-log 20 --fused --breakdown --skip-verify
status "ALL DONE"
