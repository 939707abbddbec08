"""Native C++ host runtime (ctypes-loaded), with pure-python fallback.

Builds ``native.cpp`` with g++ on first import (cached as a .so next to the
source). Provides exact u64 field kernels for the host-side O(gates)/O(2^n)
work: eq tables, wiring scatters, circuit forward evaluation, MLE folds.
Everything falls back to numpy/python automatically when the toolchain is
unavailable, so the framework never hard-depends on the extension.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_thaler_native.so")

_lib = None


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-march=native",
                    "-shared",
                    "-fPIC",
                    "-o",
                    _SO,
                    _SRC,
                ],
                check=True,
                capture_output=True,
            )
        return True
    except Exception as e:  # pragma: no cover
        print(f"[thaler_study_tpu.runtime] native build failed: {e}", file=sys.stderr)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ts_eq_table.argtypes = [u64p, ctypes.c_int32, u64p, ctypes.c_uint64]
    lib.ts_wiring_scatter.argtypes = [
        i32p, i32p, u8p, u64p, ctypes.c_int64, ctypes.c_int32, u64p,
        ctypes.c_uint64,
    ]
    lib.ts_circuit_layer.argtypes = [
        u64p, i32p, i32p, u8p, ctypes.c_int64, u64p, ctypes.c_uint64
    ]
    lib.ts_mle_fold.argtypes = [
        u64p, ctypes.c_int64, ctypes.c_uint64, u64p, ctypes.c_uint64
    ]
    lib.ts_mle_eval.argtypes = [
        u64p, ctypes.c_int64, u64p, ctypes.c_int32, u64p, ctypes.c_uint64
    ]
    lib.ts_mle_eval.restype = ctypes.c_uint64
    lib.ts_summod_arr.argtypes = [u64p, ctypes.c_int64, ctypes.c_uint64]
    lib.ts_summod_arr.restype = ctypes.c_uint64
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ts_scatter_add.argtypes = [
        i64p, u64p, ctypes.c_int64, u64p, ctypes.c_uint64
    ]
    lib.ts_gather_mulmod.argtypes = [
        u64p, i32p, ctypes.c_int64, u64p, u64p, ctypes.c_uint64
    ]
    lib.ts_wiring_eval_sparse.argtypes = [
        u64p, u64p, u64p, i32p, i32p, u8p, ctypes.c_int64, ctypes.c_uint64
    ]
    lib.ts_wiring_eval_sparse.restype = ctypes.c_uint64
    lib.ts_sha256_blocks.argtypes = [
        u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32)
    ]
    for name in ("ts_addmod_arr", "ts_submod_arr", "ts_mulmod_arr"):
        getattr(lib, name).argtypes = [
            u64p, u64p, u64p, ctypes.c_int64, ctypes.c_uint64
        ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint64)


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


_U64P = ctypes.POINTER(ctypes.c_uint64)
_I32P = ctypes.POINTER(ctypes.c_int32)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def eq_table(r, p: int) -> np.ndarray:
    """eq weights over little-endian indices; exact for p < 2^64."""
    lib = _load()
    r = _u64(r)
    n = len(r)
    out = np.empty(1 << n, dtype=np.uint64)
    if lib is None:
        out[0] = 1 % p
        size = 1
        for j in reversed(range(n)):
            rj = int(r[j]) % p
            for i in range(size - 1, -1, -1):
                w = int(out[i])
                hi = w * rj % p
                out[2 * i + 1] = hi
                out[2 * i] = (w - hi) % p
            size <<= 1
        return out
    lib.ts_eq_table(_ptr(r, _U64P), n, _ptr(out, _U64P), p)
    return out


def wiring_scatter(b_idx, c_idx, sel, eq_w, k_next: int, p: int) -> np.ndarray:
    lib = _load()
    b_idx = np.ascontiguousarray(b_idx, dtype=np.int32)
    c_idx = np.ascontiguousarray(c_idx, dtype=np.int32)
    sel = np.ascontiguousarray(sel, dtype=np.uint8)
    eq_w = _u64(eq_w)
    grid = np.zeros(1 << (2 * k_next), dtype=np.uint64)
    if lib is None:
        for g in np.nonzero(sel)[0]:
            pos = (int(c_idx[g]) << k_next) | int(b_idx[g])
            grid[pos] = (int(grid[pos]) + int(eq_w[g])) % p
        return grid
    lib.ts_wiring_scatter(
        _ptr(b_idx, _I32P),
        _ptr(c_idx, _I32P),
        _ptr(sel, _U8P),
        _ptr(eq_w, _U64P),
        len(b_idx),
        k_next,
        _ptr(grid, _U64P),
        p,
    )
    return grid


def circuit_layer(cur, b_idx, c_idx, is_mul, p: int) -> np.ndarray:
    lib = _load()
    cur = _u64(cur)
    b_idx = np.ascontiguousarray(b_idx, dtype=np.int32)
    c_idx = np.ascontiguousarray(c_idx, dtype=np.int32)
    is_mul = np.ascontiguousarray(is_mul, dtype=np.uint8)
    out = np.empty(len(b_idx), dtype=np.uint64)
    if lib is None:
        for g in range(len(b_idx)):
            l, r_ = int(cur[b_idx[g]]), int(cur[c_idx[g]])
            out[g] = (l * r_ % p) if is_mul[g] else ((l + r_) % p)
        return out
    lib.ts_circuit_layer(
        _ptr(cur, _U64P),
        _ptr(b_idx, _I32P),
        _ptr(c_idx, _I32P),
        _ptr(is_mul, _U8P),
        len(b_idx),
        _ptr(out, _U64P),
        p,
    )
    return out


_I64P = ctypes.POINTER(ctypes.c_int64)


def scatter_add(pos, vals, grid_size: int, p: int) -> np.ndarray:
    """grid[pos[g]] += vals[g] mod p over a fresh zero grid."""
    lib = _load()
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    vals = _u64(vals)
    grid = np.zeros(grid_size, dtype=np.uint64)
    if lib is None:
        for g in range(len(pos)):
            grid[pos[g]] = (int(grid[pos[g]]) + int(vals[g])) % p
        return grid
    lib.ts_scatter_add(
        _ptr(pos, _I64P), _ptr(vals, _U64P), len(pos), _ptr(grid, _U64P), p
    )
    return grid


def gather_mulmod(table, idx, scale, p: int) -> np.ndarray:
    """out[g] = table[idx[g]] * scale[g] mod p."""
    lib = _load()
    table = _u64(table)
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    scale = _u64(scale)
    out = np.empty(len(idx), dtype=np.uint64)
    if lib is None:
        for g in range(len(idx)):
            out[g] = int(table[idx[g]]) * int(scale[g]) % p
        return out
    lib.ts_gather_mulmod(
        _ptr(table, _U64P), _ptr(idx, _I32P), len(idx), _ptr(scale, _U64P),
        _ptr(out, _U64P), p,
    )
    return out


def wiring_eval_sparse(eq_r, eq_b, eq_c, b_idx, c_idx, sel, p: int) -> int:
    """Sparse add~/mul~ evaluation at a full (r, b, c) point. O(gates)."""
    lib = _load()
    eq_r = _u64(eq_r)
    eq_b = _u64(eq_b)
    eq_c = _u64(eq_c)
    b_idx = np.ascontiguousarray(b_idx, dtype=np.int32)
    c_idx = np.ascontiguousarray(c_idx, dtype=np.int32)
    sel = np.ascontiguousarray(sel, dtype=np.uint8)
    if lib is None:
        acc = 0
        for g in np.nonzero(sel)[0]:
            acc = (
                acc
                + int(eq_r[g]) * int(eq_b[b_idx[g]]) % p * int(eq_c[c_idx[g]])
            ) % p
        return acc
    return int(
        lib.ts_wiring_eval_sparse(
            _ptr(eq_r, _U64P), _ptr(eq_b, _U64P), _ptr(eq_c, _U64P),
            _ptr(b_idx, _I32P), _ptr(c_idx, _I32P), _ptr(sel, _U8P),
            len(b_idx), p,
        )
    )


def sha256_midstate(data: bytes, state=None) -> np.ndarray:
    """Advance a SHA-256 midstate over full 64-byte blocks of ``data``
    (len(data) % 64 == 0). Seeds with H0 when ``state`` is None. Returns the
    new [8] uint32 state. Used to absorb large Fiat-Shamir transcript
    prefixes once instead of re-hashing them per challenge draw."""
    assert len(data) % 64 == 0
    if state is None:
        state = np.array(
            [
                0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
                0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
            ],
            dtype=np.uint32,
        )
    out = np.array(state, dtype=np.uint32).copy()
    if not len(data):
        return out
    lib = _load()
    if lib is None:
        from ..ops.sha256 import _py_compress

        for off in range(0, len(data), 64):
            _py_compress(out, data[off : off + 64])
        return out
    buf = np.frombuffer(data, dtype=np.uint8)
    lib.ts_sha256_blocks(
        _ptr(np.ascontiguousarray(buf), _U8P),
        len(data) // 64,
        _ptr(out, ctypes.POINTER(ctypes.c_uint32)),
    )
    return out


def mle_eval(evals, point, p: int) -> int:
    """Exact MLE evaluation (little-endian variable order) on host."""
    lib = _load()
    evals = _u64(evals)
    point = _u64(point)
    if lib is None:
        cur = [int(v) % p for v in evals]
        for r in point:
            r = int(r)
            cur = [
                (cur[2 * i] + r * (cur[2 * i + 1] - cur[2 * i])) % p
                for i in range(len(cur) // 2)
            ]
        return cur[0]
    scratch = np.empty(max(len(evals) // 2, 1), dtype=np.uint64)
    return int(
        lib.ts_mle_eval(
            _ptr(evals, _U64P),
            len(evals),
            _ptr(point, _U64P),
            len(point),
            _ptr(scratch, _U64P),
            p,
        )
    )
