#!/bin/bash
# Round-4 follow-up queue: waits for the r4 queue to finish, re-gates on
# tunnel health, then measures (1) the fixup-style A/B on the 2^23 fused
# round, (2) claim-shortcut roofline, (3) the scan-mode phase builds at
# the 2^24 flagship (VERDICT r3 #5). Run under nohup, poll $OUT/status.
set -u
cd /root/repo
OUT=${OUT:-/tmp/r4bm}
PREV=${PREV:-/tmp/r4m}
mkdir -p "$OUT"
status() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }

status "waiting for the r4 queue"
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

# fixup-style A/B + claim roofline at 2^23 (fresh processes per style)
run roofline_masks   3600 python benches/roofline.py
run roofline_selects 3600 python benches/roofline.py --selects
# scan-mode phase builds at the flagship (prove + verify, then breakdown)
THALER_GKR_SCATTER=scan run gkr24_scan 7200 \
  python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
THALER_GKR_SCATTER=scan run gkr24_scan_bd 7200 \
  python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused \
  --breakdown --skip-verify
status "ALL DONE"
