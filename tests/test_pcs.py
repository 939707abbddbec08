"""Relaxed PCS tests (mirrors relaxed-pcs/src/lib.rs:309-339)."""

import pytest

from thaler_study_tpu.fields import F5
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.pcs import (
    DegreeMismatch,
    EvalMismatch,
    Prover,
    Verifier,
    all_field_values,
    all_multidimensional_values,
)
from thaler_study_tpu.sumcheck import SeededRng, UniPoly


def test_all_values():
    assert [v.v for v in all_field_values(F5)] == [0, 1, 2, 3, 4]
    grid = all_multidimensional_values(F5, 2)
    assert len(grid) == 25
    assert grid[0] == (F5.felt(0), F5.felt(0))
    assert grid[-1] == (F5.felt(4), F5.felt(4))


def test_it_works(rng):
    """Full commit / line-restriction / open flow (ref it_works :309-339)."""
    num_vars, degree = 2, 1
    evals = [F5.felt(rng.randrange(5)) for _ in range(1 << num_vars)]
    poly = DenseMLE.from_evals_lsb(evals, num_vars, F5)

    prover = Prover(poly)
    verifier = Verifier(num_vars, degree, prover.merkle_root())

    srng = SeededRng(0)
    b, c = verifier.random_line(srng, F5)
    restriction = prover.poly_restriction_to_line(b, c)
    point = verifier.challenge_prover(srng, F5)
    proof, value = prover.challenge(point)
    verifier.commited_univariate(restriction)
    verifier.verify_prover_reply(proof, value)  # raises on failure


def test_degree_check(rng):
    num_vars, degree = 2, 1
    evals = [F5.felt(rng.randrange(5)) for _ in range(4)]
    poly = DenseMLE.from_evals_lsb(evals, num_vars, F5)
    prover = Prover(poly)
    verifier = Verifier(num_vars, degree, prover.merkle_root())
    srng = SeededRng(1)
    verifier.random_line(srng, F5)
    with pytest.raises(DegreeMismatch):
        verifier.commited_univariate(UniPoly([(5, F5.one())], F5))


def test_cheating_prover_rejected(rng):
    num_vars, degree = 2, 1
    evals = [F5.felt((rng.randrange(1, 5))) for _ in range(4)]
    poly = DenseMLE.from_evals_lsb(evals, num_vars, F5)
    prover = Prover(poly)
    verifier = Verifier(num_vars, degree, prover.merkle_root())
    srng = SeededRng(2)
    b, c = verifier.random_line(srng, F5)
    # prover lies about the restriction by shifting it
    restriction = prover.poly_restriction_to_line(b, c) + UniPoly(
        [(0, F5.one())], F5
    )
    point = verifier.challenge_prover(srng, F5)
    proof, value = prover.challenge(point)
    try:
        verifier.commited_univariate(restriction)
    except DegreeMismatch:
        return  # shifted poly may trip the degree check first — also a reject
    with pytest.raises(EvalMismatch):
        verifier.verify_prover_reply(proof, value)


def test_device_merkle_matches_host(rng):
    """The batched device SHA-256 tree build (ops/merkle_kernel.py) is
    byte-identical to the per-node hashlib build at every level, across
    field element widths (1-byte F5, 8-byte goldilocks)."""
    import dataclasses

    from thaler_study_tpu.fields import GOLDILOCKS
    from thaler_study_tpu.pcs.merkle import MerkleTree
    from thaler_study_tpu.utils.config import get_config, use_config

    for field, n in ((F5, 64), (GOLDILOCKS, 128), (GOLDILOCKS, 64)):
        values = [field.felt(rng.randrange(field.p)) for _ in range(n)]
        with use_config(
            dataclasses.replace(get_config(), merkle_device_min_leaves=0)
        ):
            host = MerkleTree(values)
        with use_config(
            dataclasses.replace(get_config(), merkle_device_min_leaves=2)
        ):
            dev = MerkleTree(values)
        assert dev.levels == host.levels
        assert dev.root() == host.root()
        path = dev.generate_proof(5)
        assert path.verify(host.root(), values[5])


def test_merkle_multiproof(rng):
    """Deduplicated batch openings verify, are smaller than k separate
    paths, and reject tampering."""
    from thaler_study_tpu.fields import GOLDILOCKS
    from thaler_study_tpu.pcs.merkle import MerkleTree

    n = 64
    values = [GOLDILOCKS.felt(rng.randrange(GOLDILOCKS.p)) for _ in range(n)]
    tree = MerkleTree(values)
    height = len(tree.levels) - 1
    for idxs in ([0], [5], [6, 7], [0, 1, 2, 3], [3, 17, 16, 60], list(range(n))):
        multi = tree.generate_multi_proof(idxs)
        leaves = [values[i] for i in multi.indices]
        assert multi.verify(tree.root(), leaves)
        assert len(multi.siblings) <= height * len(set(idxs))
        # tamper: wrong leaf value
        bad = list(leaves)
        bad[0] = bad[0] + GOLDILOCKS.one()
        assert not multi.verify(tree.root(), bad)
    # full-tree opening needs no siblings at all
    assert tree.generate_multi_proof(list(range(n))).siblings == []
    # truncated / extended sibling streams rejected
    multi = tree.generate_multi_proof([3, 17])
    leaves = [values[3], values[17]]
    import copy

    short = copy.copy(multi)
    short.siblings = multi.siblings[:-1]
    assert not short.verify(tree.root(), leaves)
    long = copy.copy(multi)
    long.siblings = multi.siblings + [multi.siblings[0]]
    assert not long.verify(tree.root(), leaves)


def test_pcs_multi_opening(rng):
    """Multi-opening flow: several agreement points on the random line are
    checked against ONE batched Merkle multiproof."""
    from thaler_study_tpu.pcs import Prover as PCSProver
    from thaler_study_tpu.pcs import Verifier as PCSVerifier

    num_vars, degree = 2, 1
    evals = [F5.felt(rng.randrange(5)) for _ in range(1 << num_vars)]
    poly = DenseMLE.from_evals_lsb(evals, num_vars, F5)
    prover = PCSProver(poly)
    verifier = PCSVerifier(num_vars, degree, prover.merkle_root())
    srng = SeededRng(3)
    b, c = verifier.random_line(srng, F5)
    verifier.commited_univariate(prover.poly_restriction_to_line(b, c))
    points = verifier.challenge_prover_many(srng, F5, 3)
    multi, leaves = prover.challenge_many(points)
    verifier.verify_prover_reply_many(multi, leaves)  # accepts

    # cheating prover: restriction shifted by 1 fails some agreement point
    verifier2 = PCSVerifier(num_vars, degree, prover.merkle_root())
    srng2 = SeededRng(3)
    b2, c2 = verifier2.random_line(srng2, F5)
    shifted = prover.poly_restriction_to_line(b2, c2) + UniPoly(
        [(0, F5.one())], F5
    )
    try:
        verifier2.commited_univariate(shifted)
    except DegreeMismatch:
        return
    points2 = verifier2.challenge_prover_many(srng2, F5, 3)
    multi2, leaves2 = prover.challenge_many(points2)
    with pytest.raises(EvalMismatch):
        verifier2.verify_prover_reply_many(multi2, leaves2)


def test_merkle_golden_anchor():
    """Spec-derived golden constants (VERDICT r2 next-round #8): the tree's
    byte layout is leaf = SHA256(b"leaf:" || 8-byte-LE canonical element),
    node = SHA256(b"node:" || left || right). The hex constants below were
    derived EXTERNALLY from that spec with hashlib alone (no library code);
    any drift in serialization, domain tags, or tree shape breaks them —
    the PCS analogue of tests/data/fs_golden.json."""
    from thaler_study_tpu.fields import GOLDILOCKS
    from thaler_study_tpu.pcs.merkle import MerkleTree

    leaves = [0, 1, 2**32 - 1, GOLDILOCKS.p - 1, 123456789, 2**63, 42, 7]
    tree = MerkleTree(GOLDILOCKS.felts(leaves))
    assert tree.levels[0][0].hex() == (
        "21aaa5d3dd60803febac1b63a09bef9adb5ebe92855c5b0ec47e5e2307579248"
    )
    assert tree.root().hex() == (
        "ffa7f0ea170ff2e563cd8c4a67fdad96a9b72bcd1ce69e7b662d2a74b4cef650"
    )
    tree4 = MerkleTree(GOLDILOCKS.felts(leaves[:4]))
    assert tree4.root().hex() == (
        "2707427a9f95c040960146e40b5734a943bd57ea78c6159e5d64da3d00d90fb1"
    )
    # openings against the pinned root verify
    proof = tree.generate_proof(3)
    assert proof.verify(tree.root(), GOLDILOCKS.felt(leaves[3]))
