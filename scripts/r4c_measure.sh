#!/bin/bash
# Round-4 third queue: flagship numbers on the final defaults — scan-mode
# phase builds (the TPU-correct formulation), select fixups, circuit-level
# wiring cache — plus the segment comparison and the selects roofline.
set -u
cd /root/repo
OUT=${OUT:-/tmp/r4cm}
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

# roofline first: quick, doubles as a tunnel-perf control, and gives the
# round-kernel baseline the hand-scheduled Pallas work compares against
run roofline 3600 python benches/roofline.py
# flagship on the final defaults (scan + selects + circuit wiring cache)
run gkr24_scan     7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
run gkr24_scan_bd  7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused --breakdown --skip-verify
# segment comparison with the same cache fix (large layers only — the
# small-shape miscompile does not apply at 2^20)
run gkr24_seg 7200 env THALER_GKR_SCATTER=segment \
  python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused --skip-verify
# headline on final defaults
run headline 3600 python bench.py
status "ALL DONE"
