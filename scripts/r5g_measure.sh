#!/bin/bash
# Round-5 seventh queue: measure HEAD. The row-gather scatter core +
# cached-wiring commit (cbdc4c8, 15:51) landed AFTER the last flagship
# run (gkr24_pf, 14:50-14:55) — the committed 10.30 s predates the 15x
# phase-build improvement, so HEAD's flagship number is unknown.
# Measures, in value order: the 2^24 flagship wall + verify, its synced
# breakdown, a headline9 sample for the median-of-N protocol, and the
# per-part attribution on the new scatter core.
# Same discipline as r5a-f: health-gated, generous SIGINT timeouts,
# logs committed in bench_logs/r5/.
set -u
cd /root/repo
OUT=${OUT:-/root/repo/bench_logs/r5}
mkdir -p "$OUT"
status() { echo "$(date +%H:%M:%S) $*" >> "$OUT/status"; }
run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 t=$2; shift 2
  status "START $name"
  timeout -s INT -k 120 "$t" "$@" > "$OUT/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "r5g starting"
status "r5g waiting for tunnel health"
python - >> "$OUT/health.log" 2>&1 <<'EOF'
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
        print(f"{time.strftime('%H:%M:%S')} r5g sync {dt:.3f}s streak={streak}",
              flush=True)
    except Exception as e:
        streak = 0
        print(f"{time.strftime('%H:%M:%S')} r5g err {e}", flush=True)
    if streak < 3:
        time.sleep(45)
print("TUNNEL_HEALTHY", flush=True)
EOF
status "r5g tunnel healthy; starting queue"
run gkr24_g    9000 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused
run gkr24_g_bd 7200 python benches/gkr_benchmark.py --depth 16 --width-log 20 --fused --breakdown --skip-verify
run headline9  2400 python bench.py
run parts_g    7200 python benches/gkr_parts.py --k 20 --mode scan --reps 5
status "r5g ALL DONE"
