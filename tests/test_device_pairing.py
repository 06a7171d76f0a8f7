"""Device batched pairing vs the exact host oracle.

Skipped on the CPU test backend by default: the pairing program's XLA *CPU*
compile takes many minutes (the TPU toolchain handles it; set
BMT_TEST_TPU=1 to run this module on the real chip, and the /verify drive
covers it there).
"""

import os
import random

import numpy as np
import pytest

if not os.environ.get("BMT_TEST_TPU") and not os.environ.get("BMT_SLOW_TESTS"):
    pytest.skip(
        "pairing programs compile too slowly on CPU XLA; run with "
        "BMT_TEST_TPU=1 (real chip) or BMT_SLOW_TESTS=1",
        allow_module_level=True,
    )

from bellman_mpc_tpu.curves import pairing_host as ph
from bellman_mpc_tpu.curves.host import G1, G2
from bellman_mpc_tpu.fields.bls12_381 import R
from bellman_mpc_tpu.fields.tower import fp12_eq, fp12_pow
from bellman_mpc_tpu.ops.pairing import pairing_batch, pairing_eq_batch


def test_pairing_matches_host_oracle():
    rng = random.Random(42)
    scal1 = [1, 2, rng.randrange(1, R)]
    scal2 = [1, 3, rng.randrange(1, R)]
    g1s = [G1.mul(G1.generator, s) for s in scal1] + [None]
    g2s = [G2.mul(G2.generator, s) for s in scal2] + [G2.generator]
    got = pairing_batch(g1s, g2s)
    for p, q, g in zip(g1s, g2s, got):
        want = ph.pairing(p, q)
        assert fp12_eq(g, want), "device pairing != host oracle"


def test_pairing_bilinearity_device():
    e = pairing_batch([G1.generator], [G2.generator])[0]
    e35 = pairing_batch([G1.mul(G1.generator, 3)], [G2.mul(G2.generator, 5)])[0]
    assert fp12_eq(e35, fp12_pow(e, 15))


def test_final_exp_eq_chain_consistency():
    """x-chain (3d) equality semantics agree with the exact-d final exp."""
    import jax
    import jax.numpy as jnp

    from bellman_mpc_tpu.ops import tower as tw
    from bellman_mpc_tpu.ops.pairing import (
        _encode_g1,
        _encode_g2,
        final_exp_batch,
        final_exp_eq_batch,
        miller_loop_batch,
    )
    from bellman_mpc_tpu.fields.tower import fp12_pow

    g1s = [G1.mul(G1.generator, 5), G1.mul(G1.generator, 3)]
    g2s = [G2.mul(G2.generator, 7), G2.mul(G2.generator, 11)]
    px, py, v1 = _encode_g1(g1s)
    qx, qy, v2 = _encode_g2(g2s)
    mask = jnp.asarray(v1 & v2)
    ml = jax.jit(miller_loop_batch)(px, py, qx, qy, mask)
    exact = tw.fp12_decode(jax.jit(final_exp_batch)(ml))
    chain = tw.fp12_decode(jax.jit(final_exp_eq_batch)(ml))
    from bellman_mpc_tpu.fields.tower import fp12_eq

    for e, c in zip(exact, chain):
        assert fp12_eq(fp12_pow(e, 3), c), "chain must equal exact^3"


def test_bls_batch_verifier_device_path():
    """BatchVerifier over BLS12-381 exercising the device multi-Miller loop."""
    from bellman_mpc_tpu.groth16 import (
        create_random_proof,
        generate_random_parameters,
    )
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.groth16.verifier_batch import BatchVerifier
    from bellman_mpc_tpu.r1cs import InvalidProof
    from tests.test_groth16_bls import MySillyCircuit

    params = generate_random_parameters(BLS12_381, MySillyCircuit())
    rng = random.Random(31)
    bv = BatchVerifier()
    proofs = []
    for _ in range(3):
        a, b = rng.randrange(R), rng.randrange(R)
        proof = create_random_proof(BLS12_381, MySillyCircuit(a, b), params)
        proofs.append((proof, [a * b % R]))
        bv.queue((proof, [a * b % R]))
    bv.verify(BLS12_381, params.vk, random.Random(32))

    bad = BatchVerifier()
    for p, i in proofs[:2]:
        bad.queue((p, i))
    bad.queue((proofs[2][0], [123456]))  # wrong input
    with pytest.raises(InvalidProof):
        bad.verify(BLS12_381, params.vk, random.Random(33))


def test_single_proof_device_verify():
    """verify_proof's n=3(+alpha) case through the fused device pairing
    product (Engine.pairing_product_is_one; verifier.rs:23-62 parity —
    valid proof accepted, wrong public input rejected)."""
    import jax

    from bellman_mpc_tpu.groth16 import (
        create_random_proof,
        generate_random_parameters,
        prepare_verifying_key,
        verify_proof,
    )
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.r1cs import InvalidProof
    from tests.test_groth16_bls import MySillyCircuit

    if jax.default_backend() == "cpu":
        pytest.skip("device verify path requires the real chip")

    params = generate_random_parameters(BLS12_381, MySillyCircuit())
    pvk = prepare_verifying_key(BLS12_381, params.vk)
    assert pvk.neg_alpha_g1 is not None
    rng = random.Random(5)
    a, b = rng.randrange(R), rng.randrange(R)
    proof = create_random_proof(BLS12_381, MySillyCircuit(a, b), params)
    verify_proof(BLS12_381, pvk, proof, [a * b % R])
    with pytest.raises(InvalidProof):
        verify_proof(BLS12_381, pvk, proof, [a * b % R + 1])


def test_pairing_product_is_one_kernel():
    """ops.pairing.pairing_product_is_one: e(aG,bG2) e(-abG,G2) == 1."""
    from bellman_mpc_tpu.ops.pairing import pairing_product_is_one

    a = G1.mul(G1.generator, 9)
    b = G2.mul(G2.generator, 13)
    ok = pairing_product_is_one(
        [a, G1.neg(G1.mul(G1.generator, 117))], [b, G2.generator]
    )
    bad = pairing_product_is_one(
        [a, G1.neg(G1.mul(G1.generator, 116))], [b, G2.generator]
    )
    assert ok is True and bad is False


def test_pairing_eq_batch():
    a = G1.mul(G1.generator, 7)
    b = G2.mul(G2.generator, 11)
    # e(7G1, 11G2) == e(77G1, G2) ; e(7G1, 11G2) != e(5G1, G2)
    eqs = pairing_eq_batch(
        [a, a, None],
        [b, b, b],
        [G1.mul(G1.generator, 77), G1.mul(G1.generator, 5), None],
        [G2.generator, G2.generator, b],
    )
    assert list(eqs) == [True, False, True]
