"""Verify drive: fused-fold exactness on the real TPU.

The r4 op-diet routes every sumcheck fold through fields/goldilocks.fold
(one 128-bit reduction instead of mul + modular add). CPU tests prove it
bit-identical; this drive re-proves it on the REAL chip (the r3 segment_sum
episode showed TPU-only miscompiles are possible) through three layers:

1. FArray.fold at 2^16 incl. boundary values vs python bigints,
2. the XLA and Pallas round kernels (fold + round sums) vs bigints and
   vs each other, with and without the claim shortcut,
3. one end-to-end matmul-IP Fiat-Shamir transcript (prove on TPU through
   the fused kernel, verify on host; then tamper and assert rejection).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from thaler_study_tpu.fields import GOLDILOCKS, FArray  # noqa: E402

P = GOLDILOCKS.p
t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


log(f"device: {jax.devices()[0].device_kind}")

# --- 1. FArray.fold vs bigints at 2^16 ---------------------------------
rng = np.random.default_rng(42)
n = 1 << 16
edge = [0, 1, P - 1, P - 2, 1 << 32, (1 << 32) - 1, (1 << 63)]
lo_i = [int(x) % P for x in rng.integers(0, P, size=n - len(edge), dtype=np.uint64)] + edge
hi_i = edge + [int(x) % P for x in rng.integers(0, P, size=n - len(edge), dtype=np.uint64)]
r_i = 0xDEADBEEF12345678 % P

lo = FArray.from_ints(np.array(lo_i, dtype=object), GOLDILOCKS)
hi = FArray.from_ints(np.array(hi_i, dtype=object), GOLDILOCKS)
r = FArray.from_ints([r_i], GOLDILOCKS).reshape(())

fold_jit = jax.jit(FArray.fold)
got = [int(v) for v in fold_jit(lo, hi, r).to_ints()]
want = [(l + r_i * ((h - l) % P)) % P for l, h in zip(lo_i, hi_i)]
assert got == want, "FArray.fold mismatch on TPU"
log("1. FArray.fold exact vs bigints (2^16, boundary cases): OK")

# --- 2. XLA + Pallas round kernels --------------------------------------
from thaler_study_tpu.ops.round_kernel import PolySpec, round_step  # noqa: E402
from thaler_study_tpu.ops import pallas_round  # noqa: E402

nv = 16
spec = PolySpec(
    block_sizes=(nv,),
    table_blocks=((0,), (0,)),
    terms=((0, 1),),
)
t1_i = [int(x) % P for x in rng.integers(0, P, size=1 << nv, dtype=np.uint64)]
t2_i = [int(x) % P for x in rng.integers(0, P, size=1 << nv, dtype=np.uint64)]
tables = (
    FArray.from_ints(np.array(t1_i, dtype=object), GOLDILOCKS),
    FArray.from_ints(np.array(t2_i, dtype=object), GOLDILOCKS),
)

# oracle: fold both tables at r, then sums at t = 0..2
half = 1 << (nv - 1)


def fold_host(t, rv):
    return [(t[i] + rv * ((t[i + half] - t[i]) % P)) % P for i in range(half)]


f1, f2 = fold_host(t1_i, r_i), fold_host(t2_i, r_i)
q = half // 2
sums_want = []
for tt in range(3):
    s = 0
    for i in range(q):
        v1 = (f1[i] + tt * ((f1[i + q] - f1[i]) % P)) % P
        v2 = (f2[i] + tt * ((f2[i + q] - f2[i]) % P)) % P
        s = (s + v1 * v2) % P
    sums_want.append(s)

import dataclasses  # noqa: E402

from thaler_study_tpu.utils import config as cfgmod  # noqa: E402

with cfgmod.use_config(
    dataclasses.replace(cfgmod.get_config(), use_pallas=False)
):
    sums, folded = round_step(spec, tables, r)
got_sums = [int(v) for v in sums.to_ints()]
assert got_sums == sums_want, ("XLA round sums mismatch", got_sums, sums_want)
assert [int(v) for v in folded[0].to_ints()] == f1
log("2a. XLA round kernel (fold + sums) exact: OK")

assert pallas_round.supports(spec, GOLDILOCKS, 1 << nv)
psums, pfolded = pallas_round.pallas_round_step(spec, tables, r)
assert [int(v) for v in psums.to_ints()] == sums_want, "pallas sums mismatch"
assert [int(v) for v in pfolded[0].to_ints()] == f1, "pallas folded mismatch"
assert [int(v) for v in pfolded[1].to_ints()] == f2
log("2b. Pallas round kernel exact + matches XLA: OK")

claim = FArray.from_ints([(sums_want[0] + sums_want[1]) % P], GOLDILOCKS).reshape(())
csums, _ = pallas_round.pallas_round_step(spec, tables, r, claim=claim)
assert [int(v) for v in csums.to_ints()] == sums_want, "claim-shortcut mismatch"
log("2c. Pallas claim shortcut bit-identical: OK")

# --- 3. end-to-end FS transcript (device prover, host verifier) ---------
from thaler_study_tpu.protocols.matmul import MatMulG  # noqa: E402
from thaler_study_tpu.sumcheck import Prover, Verifier  # noqa: E402
from thaler_study_tpu.fiat_shamir import (  # noqa: E402
    FiatShamirTranscript,
    SumcheckInteractiveProver,
    SumcheckInteractiveVerifier,
    generate_transcript,
    verify_transcript,
)

n_mm = 4  # 16 x 16 matrices
size = 1 << n_mm
a = [int(x) for x in rng.integers(0, P, size=size * size, dtype=np.uint64)]
b = [int(x) for x in rng.integers(0, P, size=size * size, dtype=np.uint64)]
point = [GOLDILOCKS.felt(int(x)) for x in rng.integers(0, P, size=2 * n_mm, dtype=np.uint64)]
g = MatMulG.new(n_mm, a, b, point, GOLDILOCKS)
tr = generate_transcript(SumcheckInteractiveProver(Prover(g)), GOLDILOCKS)
assert verify_transcript(
    tr, SumcheckInteractiveVerifier(Verifier(n_mm, g), GOLDILOCKS), GOLDILOCKS
)
log("3a. matmul-IP FS transcript proves + verifies: OK")

bad = [bytes(m) for m in tr.g]
tam = bytearray(bad[0])
tam[0] ^= 1
bad[0] = bytes(tam)
ok = True
try:
    ok = verify_transcript(
        FiatShamirTranscript(bad),
        SumcheckInteractiveVerifier(Verifier(n_mm, g), GOLDILOCKS),
        GOLDILOCKS,
    )
except Exception:
    ok = False
assert not ok, "tampered transcript accepted!"
log("3b. tampered transcript rejected: OK")

log("ALL FOLD VERIFY CHECKS PASSED on the real TPU")
