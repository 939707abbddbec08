"""Pedersen-CRH-over-JubJub Merkle commitments vs external golden vectors.

The reference's relaxed PCS instantiates its tree with arkworks'
``pedersen::CRH<JubJub, Window4x256>`` (relaxed-pcs/src/lib.rs:231-284);
tests/data/pedersen_golden.json pins an INDEPENDENT pure-int derivation of
those semantics (derive_pedersen_golden.py imports nothing from the
framework), so pcs/pedersen.py is cross-checked from outside the repo's
own code — the same anchoring scheme as the Fiat-Shamir golden
transcripts (tests/data/fs_golden.json).
"""

import json
import os

import pytest

from thaler_study_tpu.fields import F5
from thaler_study_tpu.mle.dense import DenseMLE
from thaler_study_tpu.pcs import pedersen as P
from thaler_study_tpu.pcs.relaxed import PCSError, Prover, Verifier
from thaler_study_tpu.sumcheck import SeededRng

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "data", "pedersen_golden.json"))
)


def test_test_rng_stream_matches_golden():
    rng = P.ark_test_rng()
    got = [hex(rng.next_u32()) for _ in range(8)]
    assert got == GOLDEN["test_rng_first_u32"]


def test_generators_match_golden():
    params = P.default_params()
    leaf0 = params.leaf_generators[0][0]
    node0 = params.node_generators[0][0]
    assert [hex(leaf0[0]), hex(leaf0[1])] == GOLDEN["first_leaf_generator"]
    assert [hex(node0[0]), hex(node0[1])] == GOLDEN["first_node_generator"]
    # window structure: powers are successive doublings, on the curve
    g = params.leaf_generators[0]
    assert g[1] == P.edwards_double(g[0])
    x, y = g[0]
    lhs = (P.COEFF_A * x * x + y * y) % P.FQ
    rhs = (1 + P.COEFF_D * x * x % P.FQ * y * y) % P.FQ
    assert lhs == rhs


def test_leaf_crh_matches_golden():
    params = P.default_params()
    digest = P.pedersen_hash(params.leaf_generators, bytes([3]))
    assert P.te_serialize_compressed(digest).hex() == GOLDEN["leaf_crh_of_byte_03"]


def test_tree_root_matches_golden():
    tree = P.PedersenMerkleTree([F5.felt(v) for v in (3, 1, 4, 1)])
    assert tree.root().hex() == GOLDEN["tree_f5_3141_root"]
    lvl1 = [P.te_serialize_compressed(p) for p in tree.levels[1]]
    assert [d.hex() for d in lvl1] == GOLDEN["tree_f5_3141_level1"]


def test_paths_verify_and_reject():
    tree = P.PedersenMerkleTree([F5.felt(v) for v in (3, 1, 4, 1)])
    root = tree.root()
    for i, v in enumerate((3, 1, 4, 1)):
        assert tree.generate_proof(i).verify(root, F5.felt(v))
    assert not tree.generate_proof(0).verify(root, F5.felt(2))
    bad = bytearray(root)
    bad[0] ^= 1
    assert not tree.generate_proof(0).verify(bytes(bad), F5.felt(3))


def test_relaxed_pcs_with_pedersen_family(rng):
    """The full commit / line-restriction / open flow (ref it_works
    :309-339) through the Pedersen hash family."""
    num_vars, degree = 2, 1
    evals = [F5.felt(rng.randrange(5)) for _ in range(1 << num_vars)]
    poly = DenseMLE.from_evals_lsb(evals, num_vars, F5)

    prover = Prover(poly, hash_family="pedersen")
    verifier = Verifier(num_vars, degree, prover.merkle_root())

    srng = SeededRng(0)
    b, c = verifier.random_line(srng, F5)
    restriction = prover.poly_restriction_to_line(b, c)
    point = verifier.challenge_prover(srng, F5)
    proof, value = prover.challenge(point)
    verifier.commited_univariate(restriction)
    verifier.verify_prover_reply(proof, value)  # raises on failure

    # tampered leaf value must be rejected by the path check
    with pytest.raises(PCSError):
        verifier.verify_prover_reply(proof, value + F5.one())


def test_point_compression_roundtrip():
    rng = P.ark_test_rng()
    for _ in range(6):
        pt = P.projective_rand(rng)
        assert P.te_deserialize_compressed(P.te_serialize_compressed(pt)) == pt


def test_multiproof_verifies_and_rejects():
    values = [F5.felt(v) for v in (3, 1, 4, 1, 0, 2, 3, 4)]
    tree = P.PedersenMerkleTree(values)
    root = tree.root()
    multi = tree.generate_multi_proof([1, 4, 5])
    opened = [values[i] for i in multi.indices]
    assert multi.verify(root, opened)
    bad = list(opened)
    bad[0] = bad[0] + F5.one()
    assert not multi.verify(root, bad)
