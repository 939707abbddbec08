#!/bin/bash
# Round-5 first queue (VERDICT r4 #8: measure FIRST). Gates on tunnel
# health, then measures, in value order:
#   1. per-part attribution of one fused GKR layer (scan mode, k=20) —
#      the instrument for the phase-2 attack (VERDICT r4 #3),
#   2. headline bench.py x3 spaced runs — the variance-controlled
#      median-of-N protocol (VERDICT r4 #5),
#   3. Karatsuba A/B re-judge on the CURRENT kernel (fused fold + claim
#      shortcut) — the throughput probes say mul:add = 3.06x, past the
#      ~2.5x flip threshold BENCHMARKS.md names (VERDICT r4 #4),
#   4. segment-mode attribution control.
# Logs land in bench_logs/r5/ (committed, never /tmp-stranded).
# Timeouts are GENEROUS (>=4x expected) and send SIGINT first so Python
# unwinds instead of dying mid-device-call (the documented 45-min-wedge
# hazard; bench_logs/r4e/status shows the rc=143 this replaces).
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
status "queue start"
status "waiting for tunnel health"
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
run parts_scan 7200 python benches/gkr_parts.py --k 20 --mode scan --reps 5
run headline1  2400 python bench.py
run round_ctrl 2400 python benches/roofline.py
run karat1     4800 python benches/roofline.py --karatsuba 1
run headline2  2400 python bench.py
run karat2     4800 python benches/roofline.py --karatsuba 2
run parts_seg  7200 python benches/gkr_parts.py --k 20 --mode segment --reps 5
run headline3  2400 python bench.py
status "ALL DONE"
