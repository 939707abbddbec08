// Native host runtime for thaler_study_tpu.
//
// The reference's "native" substrate is arkworks' Rust field arithmetic
// (SURVEY.md section 2, native components). The TPU build keeps the device
// compute path in JAX/XLA/Pallas; this library is the *host* runtime around
// it: exact u64 field arithmetic (128-bit intermediates), circuit forward
// evaluation, and the GKR wiring-predicate scatter — the pieces that are
// O(gates) host work and would otherwise be python loops at 2^24 scale.
//
// Plain C ABI (loaded via ctypes); arrays are caller-allocated numpy
// buffers. All values are canonical residues < p < 2^64.

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

extern "C" {

static inline u64 addmod(u64 a, u64 b, u64 p) {
    // a, b < p < 2^64: detect wrap via comparison
    u64 s = a + b;
    if (s < a || s >= p) s -= p;
    return s;
}

static inline u64 submod(u64 a, u64 b, u64 p) {
    return a >= b ? a - b : a + (p - b);
}

static inline u64 mulmod(u64 a, u64 b, u64 p) {
    return (u64)(((u128)a * (u128)b) % p);
}

void ts_addmod_arr(const u64* a, const u64* b, u64* out, int64_t n, u64 p) {
    for (int64_t i = 0; i < n; ++i) out[i] = addmod(a[i], b[i], p);
}

void ts_submod_arr(const u64* a, const u64* b, u64* out, int64_t n, u64 p) {
    for (int64_t i = 0; i < n; ++i) out[i] = submod(a[i], b[i], p);
}

void ts_mulmod_arr(const u64* a, const u64* b, u64* out, int64_t n, u64 p) {
    for (int64_t i = 0; i < n; ++i) out[i] = mulmod(a[i], b[i], p);
}

u64 ts_summod_arr(const u64* a, int64_t n, u64 p) {
    u64 acc = 0;
    for (int64_t i = 0; i < n; ++i) acc = addmod(acc, a[i] % p, p);
    return acc;
}

// eq-weight table over n variables at point r (little-endian index order):
// out[idx] = prod_j (r[j] if bit_j(idx) else 1 - r[j]).  O(2^n) by the
// doubling construction (ref multilinear-extensions/src/lib.rs:7-18).
void ts_eq_table(const u64* r, int32_t n, u64* out, u64 p) {
    out[0] = 1 % p;
    int64_t size = 1;
    // the pair-doubling step parks the expanded variable at bit 0 and
    // shifts the others up, so expand from the last variable to the first
    // to land variable j at index bit j (little-endian)
    for (int32_t j = n - 1; j >= 0; --j) {
        u64 rj = r[j] % p;
        for (int64_t i = size - 1; i >= 0; --i) {
            u64 w = out[i];
            u64 hi = mulmod(w, rj, p);
            out[2 * i + 1] = hi;
            out[2 * i] = submod(w, hi, p);
        }
        size <<= 1;
    }
}

// GKR wiring scatter: grid[(c_idx[g] << k_next) | b_idx[g]] += eq_w[g]
// for every gate g with sel[g] != 0. grid has 2^(2*k_next) entries and
// must be zero-initialized by the caller.
void ts_wiring_scatter(const int32_t* b_idx, const int32_t* c_idx,
                       const uint8_t* sel, const u64* eq_w, int64_t n_gates,
                       int32_t k_next, u64* grid, u64 p) {
    for (int64_t g = 0; g < n_gates; ++g) {
        if (!sel[g]) continue;
        int64_t pos = ((int64_t)c_idx[g] << k_next) | (int64_t)b_idx[g];
        grid[pos] = addmod(grid[pos], eq_w[g] % p, p);
    }
}

// Generic modular scatter-add: grid[pos[g]] += vals[g].
void ts_scatter_add(const int64_t* pos, const u64* vals, int64_t n,
                    u64* grid, u64 p) {
    for (int64_t g = 0; g < n; ++g)
        grid[pos[g]] = addmod(grid[pos[g]], vals[g] % p, p);
}

// out[g] = table[idx[g]] * scale[g] mod p (gather + multiply).
void ts_gather_mulmod(const u64* table, const int32_t* idx, int64_t n,
                      const u64* scale, u64* out, u64 p) {
    for (int64_t g = 0; g < n; ++g)
        out[g] = mulmod(table[idx[g]] % p, scale[g] % p, p);
}

// Sparse wiring-predicate evaluation at a full point:
//   sum over selected gates g of eq_r[g] * eq_b[b_idx[g]] * eq_c[c_idx[g]]
// (gate label a == position g in the layer). O(gates), the verifier-side
// replacement for materializing the dense 2^(2k) table.
u64 ts_wiring_eval_sparse(const u64* eq_r, const u64* eq_b, const u64* eq_c,
                          const int32_t* b_idx, const int32_t* c_idx,
                          const uint8_t* sel, int64_t n_gates, u64 p) {
    u64 acc = 0;
    for (int64_t g = 0; g < n_gates; ++g) {
        if (!sel[g]) continue;
        u64 t = mulmod(eq_r[g] % p, eq_b[b_idx[g]] % p, p);
        acc = addmod(acc, mulmod(t, eq_c[c_idx[g]] % p, p), p);
    }
    return acc;
}

// SHA-256 compression over full 64-byte blocks starting from the given
// state (caller seeds with H0 or a previous midstate). Used to maintain
// the Fiat-Shamir running-hash midstate over large transcript prefixes
// (e.g. the 8 MB GKR Begin message) so draws never re-hash the prefix.
static const uint32_t SHA256_K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline uint32_t rotr32(uint32_t x, int n) {
    return (x >> n) | (x << (32 - n));
}

void ts_sha256_blocks(const uint8_t* data, int64_t n_blocks, uint32_t* state) {
    for (int64_t blk = 0; blk < n_blocks; ++blk) {
        const uint8_t* b = data + 64 * blk;
        uint32_t w[64];
        for (int i = 0; i < 16; ++i)
            w[i] = ((uint32_t)b[4 * i] << 24) | ((uint32_t)b[4 * i + 1] << 16) |
                   ((uint32_t)b[4 * i + 2] << 8) | (uint32_t)b[4 * i + 3];
        for (int i = 16; i < 64; ++i) {
            uint32_t s0 = rotr32(w[i - 15], 7) ^ rotr32(w[i - 15], 18) ^
                          (w[i - 15] >> 3);
            uint32_t s1 = rotr32(w[i - 2], 17) ^ rotr32(w[i - 2], 19) ^
                          (w[i - 2] >> 10);
            w[i] = w[i - 16] + s0 + w[i - 7] + s1;
        }
        uint32_t a = state[0], bb = state[1], c = state[2], d = state[3];
        uint32_t e = state[4], f = state[5], g = state[6], h = state[7];
        for (int i = 0; i < 64; ++i) {
            uint32_t s1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25);
            uint32_t ch = (e & f) ^ (~e & g);
            uint32_t t1 = h + s1 + ch + SHA256_K[i] + w[i];
            uint32_t s0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22);
            uint32_t maj = (a & bb) ^ (a & c) ^ (bb & c);
            uint32_t t2 = s0 + maj;
            h = g; g = f; f = e; e = d + t1;
            d = c; c = bb; bb = a; a = t1 + t2;
        }
        state[0] += a; state[1] += bb; state[2] += c; state[3] += d;
        state[4] += e; state[5] += f; state[6] += g; state[7] += h;
    }
}

// One circuit layer forward step: out[g] = cur[b[g]] (op) cur[c[g]].
void ts_circuit_layer(const u64* cur, const int32_t* b_idx,
                      const int32_t* c_idx, const uint8_t* is_mul,
                      int64_t n_gates, u64* out, u64 p) {
    for (int64_t g = 0; g < n_gates; ++g) {
        u64 lhs = cur[b_idx[g]], rhs = cur[c_idx[g]];
        out[g] = is_mul[g] ? mulmod(lhs, rhs, p) : addmod(lhs, rhs, p);
    }
}

// MLE fold-in-half (arkworks fix_variables semantics, little-endian pairs):
// out[i] = e[2i] + r*(e[2i+1] - e[2i]).
void ts_mle_fold(const u64* evals, int64_t n, u64 r, u64* out, u64 p) {
    for (int64_t i = 0; i < n / 2; ++i) {
        u64 lo = evals[2 * i] % p, hi = evals[2 * i + 1] % p;
        out[i] = addmod(lo, mulmod(submod(hi, lo, p), r % p, p), p);
    }
}

// Streaming MLE evaluation at a point (little-endian variable order):
// repeated fold without allocating per-step (scratch provided by caller,
// size n/2).
u64 ts_mle_eval(const u64* evals, int64_t n, const u64* point, int32_t nvars,
                u64* scratch, u64 p) {
    const u64* src = evals;
    int64_t size = n;
    for (int32_t j = 0; j < nvars; ++j) {
        ts_mle_fold(src, size, point[j], scratch, p);
        src = scratch;
        size /= 2;
    }
    return size == 1 ? src[0] % p : 0;
}

}  // extern "C"
