"""BLS12-381 Groth16 end-to-end + byte-compatible serialization.

Ports the reference's `serialization` integration test
(bellman/src/groth16/mod.rs:489-570): MySillyCircuit (a*b=c), Parameters
round-trip with the pinned 2,136-byte size, 192-byte proofs, verify-accept
and verify-reject.
"""

import random

import pytest

from bellman_mpc_tpu.fields.bls12_381 import R
from bellman_mpc_tpu.groth16 import (
    create_random_proof,
    generate_random_parameters,
    prepare_verifying_key,
    verify_proof,
)
from bellman_mpc_tpu.groth16.bls12 import BLS12_381
from bellman_mpc_tpu.groth16.serialize import (
    g1_from_compressed,
    g1_from_uncompressed,
    g1_to_compressed,
    g1_to_uncompressed,
    g2_from_compressed,
    g2_from_uncompressed,
    g2_to_compressed,
    g2_to_uncompressed,
    params_from_bytes,
    params_to_bytes,
    proof_from_bytes,
    proof_to_bytes,
    vk_from_bytes,
    vk_to_bytes,
)
from bellman_mpc_tpu.r1cs import (
    AssignmentMissing,
    Circuit,
    InvalidProof,
    IoError,
)


class MySillyCircuit(Circuit):
    """mod.rs:491-518: c = a * b with c public."""

    def __init__(self, a=None, b=None):
        self.a, self.b = a, b

    def synthesize(self, cs):
        def need(v):
            if v is None:
                raise AssignmentMissing()
            return v

        a = cs.alloc("a", lambda: need(self.a))
        b = cs.alloc("b", lambda: need(self.b))
        c = cs.alloc_input("c", lambda: need(self.a) * need(self.b) % R)
        cs.enforce("a*b=c", lambda lc: lc + a, lambda lc: lc + b, lambda lc: lc + c)


def test_point_codec_roundtrip():
    from bellman_mpc_tpu.curves.host import G1, G2

    rng = random.Random(1)
    for g, to_c, from_c, to_u, from_u in [
        (G1, g1_to_compressed, g1_from_compressed, g1_to_uncompressed, g1_from_uncompressed),
        (G2, g2_to_compressed, g2_from_compressed, g2_to_uncompressed, g2_from_uncompressed),
    ]:
        pts = [g.mul(g.generator, rng.randrange(1, R)) for _ in range(4)] + [None]
        for p in pts:
            assert from_c(to_c(p)) == p or (p is None and from_c(to_c(p)) is None)
            got = from_u(to_u(p))
            assert (got is None and p is None) or g.eq(got, p)
    # generator encodings have the right sizes
    assert len(g1_to_compressed(G1.generator)) == 48
    assert len(g2_to_compressed(G2.generator)) == 96


def test_codec_rejects_garbage():
    with pytest.raises(IoError):
        g1_from_compressed(b"\x00" * 48)  # compression flag missing
    with pytest.raises(IoError):
        g1_from_compressed(bytes([0xC0]) + b"\x01" * 47)  # dirty infinity
    with pytest.raises(IoError):
        # x >= p
        g1_from_compressed(bytes([0x9F]) + b"\xff" * 47)


def test_serialization_and_proofs():
    """Port of mod.rs:489-570 (1 deterministic round instead of 100 random)."""
    params = generate_random_parameters(BLS12_381, MySillyCircuit())

    data = params_to_bytes(params)
    assert len(data) == 2136  # pinned at mod.rs:532

    de_checked = params_from_bytes(data, checked=True)
    assert params == de_checked
    de_unchecked = params_from_bytes(data, checked=False)
    assert params == de_unchecked

    vk_data = vk_to_bytes(params.vk)
    assert vk_from_bytes(vk_data) == params.vk

    pvk = prepare_verifying_key(BLS12_381, params.vk)

    a, b = 1234567, 89101112
    c = a * b % R
    proof = create_random_proof(BLS12_381, MySillyCircuit(a, b), params)

    raw = proof_to_bytes(proof)
    assert len(raw) == 192  # pinned at mod.rs:562
    assert proof_from_bytes(raw) == proof

    verify_proof(BLS12_381, pvk, proof, [c])
    with pytest.raises(InvalidProof):
        verify_proof(BLS12_381, pvk, proof, [a])
