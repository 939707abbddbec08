"""Derive tests/data/pedersen_golden.json from first principles.

Independent re-derivation of the arkworks Pedersen-over-JubJub stack the
reference instantiates its relaxed-PCS Merkle tree with
(relaxed-pcs/src/lib.rs:231-284): NOTHING from thaler_study_tpu is
imported — only python ints — so the golden constants pin the framework
implementation (thaler_study_tpu/pcs/pedersen.py) from outside, the same
way derive_fs_golden.py pins the Fiat-Shamir transcripts.

Semantics follow the arkworks 0.4 sources: ark_std::test_rng (StdRng =
ChaCha12, seed = u32 LE [1, 23, 456, 7890]), ark-ff Fp::rand (limbs are
the Montgomery repr; top-bit shave; rejection), ark-ec twisted-Edwards
Projective::rand (y sample + sign-bit bool + cofactor clear),
ark-crypto-primitives pedersen with Window4x256, and ark 0.4
CanonicalSerialize for twisted-Edwards points. No Rust toolchain exists
in this container, so these are source-derived vectors: any future live
arkworks run can confirm or falsify them against the exact constants
recorded here.

Run:  python tests/data/derive_pedersen_golden.py
"""

import json
import os

M32 = 0xFFFFFFFF
Q = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
A = Q - 1
D = (-10240 * pow(10241, -1, Q)) % Q
RINV = pow((1 << 256) % Q, Q - 2, Q)


def chacha12_words(seed32, need):
    """The raw ChaCha12 keystream as u32 words (rand_chacha layout)."""
    key = [int.from_bytes(seed32[4 * i : 4 * i + 4], "little") for i in range(8)]
    out = []
    ctr = 0
    while len(out) < need:
        st = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574, *key,
              ctr & M32, (ctr >> 32) & M32, 0, 0]
        x = list(st)

        def q(a, b, c, d):
            x[a] = (x[a] + x[b]) & M32
            x[d] = ((x[d] ^ x[a]) << 16 | (x[d] ^ x[a]) >> 16) & M32
            x[c] = (x[c] + x[d]) & M32
            x[b] = ((x[b] ^ x[c]) << 12 | (x[b] ^ x[c]) >> 20) & M32
            x[a] = (x[a] + x[b]) & M32
            x[d] = ((x[d] ^ x[a]) << 8 | (x[d] ^ x[a]) >> 24) & M32
            x[c] = (x[c] + x[d]) & M32
            x[b] = ((x[b] ^ x[c]) << 7 | (x[b] ^ x[c]) >> 25) & M32

        for _ in range(6):
            q(0, 4, 8, 12); q(1, 5, 9, 13); q(2, 6, 10, 14); q(3, 7, 11, 15)
            q(0, 5, 10, 15); q(1, 6, 11, 12); q(2, 7, 8, 13); q(3, 4, 9, 14)
        out.extend((a + b) & M32 for a, b in zip(x, st))
        ctr += 1
    return out


class Rng:
    def __init__(self):
        seed = b"".join(v.to_bytes(4, "little") for v in (1, 23, 456, 7890))
        self.seed = seed + bytes(16)
        self.buf = []
        self.used = 0

    def u32(self):
        if self.used >= len(self.buf):
            self.buf = chacha12_words(self.seed, len(self.buf) + 1024)
        v = self.buf[self.used]
        self.used += 1
        return v

    def u64(self):
        lo = self.u32()
        return lo | (self.u32() << 32)


def fq_rand(rng):
    while True:
        limbs = [rng.u64() for _ in range(4)]
        limbs[3] &= (1 << 63) - 1
        v = sum(l << (64 * i) for i, l in enumerate(limbs))
        if v < Q:
            return v * RINV % Q


def sqrt_q(a):
    if a == 0:
        return 0
    if pow(a, (Q - 1) // 2, Q) != 1:
        return None
    q, s = Q - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (Q - 1) // 2, Q) != Q - 1:
        z += 1
    m, c, t, r = s, pow(z, q, Q), pow(a, q, Q), pow(a, (q + 1) // 2, Q)
    while t != 1:
        t2, i = t, 0
        while t2 != 1:
            t2 = t2 * t2 % Q
            i += 1
        b = pow(c, 1 << (m - i - 1), Q)
        m, c = i, b * b % Q
        t, r = t * c % Q, r * b % Q
    return r


def padd(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    k = D * x1 * x2 % Q * y1 * y2 % Q
    return (
        (x1 * y2 + y1 * x2) * pow(1 + k, Q - 2, Q) % Q,
        (y1 * y2 - A * x1 * x2) * pow((1 - k) % Q, Q - 2, Q) % Q,
    )


def pmul(p, k):
    acc = (0, 1)
    while k:
        if k & 1:
            acc = padd(acc, p)
        p = padd(p, p)
        k >>= 1
    return acc


def point_rand(rng):
    while True:
        y = fq_rand(rng)
        greatest = rng.u32() >> 31 == 1
        num, den = (y * y - 1) % Q, (D * y * y - A) % Q
        if den == 0:
            continue
        x = sqrt_q(num * pow(den, Q - 2, Q) % Q)
        if x is None:
            continue
        neg = (Q - x) % Q
        lo, hi = (x, neg) if x <= neg else (neg, x)
        return pmul((hi if greatest else lo, y), 8)


def gens(rng, windows=256, size=4):
    out = []
    for _ in range(windows):
        base = point_rand(rng)
        row = []
        for _ in range(size):
            row.append(base)
            base = padd(base, base)
        out.append(row)
    return out


def phash(g, data):
    data = data + bytes(128 - len(data))
    acc = (0, 1)
    for w in range(256):
        for i in range(4):
            bit = w * 4 + i
            if (data[bit >> 3] >> (bit & 7)) & 1:
                acc = padd(acc, g[w][i])
    return acc


def ser_unc(p):
    return p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little")


def ser_comp(p):
    out = bytearray(p[1].to_bytes(32, "little"))
    if p[0] > (Q - p[0]) % Q:
        out[-1] |= 0x80
    return bytes(out)


def main():
    rng = Rng()
    first_words = [rng.u32() for _ in range(8)]
    rng = Rng()
    leaf_g = gens(rng)
    node_g = gens(rng)

    # 4-leaf F5 tree over leaves [3, 1, 4, 1]; F5 serializes as 1 byte
    leaves = [phash(leaf_g, bytes([v])) for v in (3, 1, 4, 1)]
    n01 = phash(node_g, ser_unc(leaves[0]) + ser_unc(leaves[1]))
    n23 = phash(node_g, ser_unc(leaves[2]) + ser_unc(leaves[3]))
    root = phash(node_g, ser_unc(n01) + ser_unc(n23))

    golden = {
        "comment": "arkworks-semantics Pedersen/JubJub golden vectors; "
        "see derive_pedersen_golden.py (independent of the framework)",
        "test_rng_first_u32": [hex(w) for w in first_words],
        "first_leaf_generator": [hex(leaf_g[0][0][0]), hex(leaf_g[0][0][1])],
        "first_node_generator": [hex(node_g[0][0][0]), hex(node_g[0][0][1])],
        "leaf_crh_of_byte_03": ser_comp(leaves[0]).hex(),
        "tree_f5_3141_root": ser_comp(root).hex(),
        "tree_f5_3141_level1": [ser_comp(n01).hex(), ser_comp(n23).hex()],
    }
    out = os.path.join(os.path.dirname(__file__), "pedersen_golden.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1)
    print(json.dumps(golden, indent=1))


if __name__ == "__main__":
    main()
