"""Device SHA-256 vs hashlib across lengths and block boundaries."""

import hashlib

from thaler_study_tpu.ops.sha256 import sha256_device


def test_sha256_exact():
    # a few lengths spanning 1-3 blocks (each distinct block count is a
    # separate compile; keep the matrix small)
    cases = [b"abc", b"a" * 56, b"a" * 64, bytes(range(130))]
    for msg in cases:
        assert sha256_device(msg) == hashlib.sha256(msg).digest(), len(msg)
