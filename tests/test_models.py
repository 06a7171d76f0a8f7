"""Demo circuits + batch verifier (mock engine for speed, BLS smoke).

Ports: MiMC prove/verify (mimc.rs:51-131), AndDemo (and.rs:25-98),
RangeDemo (and.rs:101-169), batch verification (mimc.rs:134-235 /
batch.rs criterion sweep shape).
"""

import random

import pytest

from bellman_mpc_tpu.groth16 import (
    DUMMY,
    create_proof,
    create_random_proof,
    generate_random_parameters,
    prepare_verifying_key,
    verify_proof,
)
from bellman_mpc_tpu.groth16.verifier_batch import BatchVerifier, Item
from bellman_mpc_tpu.models import AndDemo, MiMCDemo, RangeDemo, mimc, mimc_constants
from bellman_mpc_tpu.r1cs import InvalidProof, TestConstraintSystem


def test_mimc_constraint_shape():
    from bellman_mpc_tpu.fields.mock import mock_host

    constants = mimc_constants(mock_host, 1)
    cs = TestConstraintSystem(mock_host)
    circuit = MiMCDemo(constants, 3, 4)
    circuit.synthesize(cs)
    # 2 constraints per round (mimc_mod.rs:81-117)
    assert cs.num_constraints() == 2 * 322
    assert cs.is_satisfied()
    assert cs.get_input(1, "round 321/image") == mimc(mock_host, 3, 4, constants)


def test_mimc_prove_verify_mock():
    from bellman_mpc_tpu.fields.mock import mock_host

    constants = mimc_constants(mock_host, 2, rounds=100)
    params = generate_random_parameters(DUMMY, MiMCDemo(constants))
    pvk = prepare_verifying_key(DUMMY, params.vk)
    rng = random.Random(3)
    for _ in range(3):
        xl, xr = rng.randrange(mock_host.p), rng.randrange(mock_host.p)
        image = mimc(mock_host, xl, xr, constants)
        proof = create_random_proof(DUMMY, MiMCDemo(constants, xl, xr), params)
        verify_proof(DUMMY, pvk, proof, [image])
        with pytest.raises(InvalidProof):
            verify_proof(DUMMY, pvk, proof, [(image + 1) % mock_host.p])


def test_anddemo_mock():
    params = generate_random_parameters(DUMMY, AndDemo())
    pvk = prepare_verifying_key(DUMMY, params.vk)
    proof = create_proof(DUMMY, AndDemo(True, False), params, 27134, 17146)
    verify_proof(DUMMY, pvk, proof, [0])


def test_rangedemo_mock():
    """Port of test_rangedemo_bls12 (and.rs:101-169) values."""
    setup_circuit = RangeDemo(
        a=1, b=2, n=4, w=9, wArray=[0, 0, 0, 0],
        less_or_equal=1, less=1, not_all_zeros=1,
    )
    params = generate_random_parameters(DUMMY, setup_circuit)
    pvk = prepare_verifying_key(DUMMY, params.vk)
    proof_circuit = RangeDemo(
        a=1, b=2, n=4, w=9, wArray=[1, 0, 0, 1],
        less_or_equal=1, less=1, not_all_zeros=1,
    )
    proof = create_proof(DUMMY, proof_circuit, params, 27134, 17146)
    verify_proof(DUMMY, pvk, proof, [2])


def test_batch_verifier_mock():
    from bellman_mpc_tpu.fields.mock import mock_host

    constants = mimc_constants(mock_host, 5, rounds=100)
    params = generate_random_parameters(DUMMY, MiMCDemo(constants))
    pvk = prepare_verifying_key(DUMMY, params.vk)
    rng = random.Random(7)

    batch = BatchVerifier()
    items = []
    for _ in range(8):
        xl, xr = rng.randrange(mock_host.p), rng.randrange(mock_host.p)
        image = mimc(mock_host, xl, xr, constants)
        proof = create_random_proof(DUMMY, MiMCDemo(constants, xl, xr), params)
        items.append(Item(proof, [image]))
        batch.queue((proof, [image]))
    batch.verify(DUMMY, params.vk, random.Random(11))

    # single-item fallback works
    items[0].verify_single(DUMMY, pvk)

    # corrupt one proof: whole batch fails
    bad = BatchVerifier()
    for it in items:
        bad.queue(it)
    bad_proof = items[3].proof
    bad.items[3] = Item(
        type(bad_proof)(a=bad_proof.a, b=bad_proof.b, c=(bad_proof.c + 1) % mock_host.p),
        items[3].inputs,
    )
    with pytest.raises(InvalidProof):
        bad.verify(DUMMY, params.vk, random.Random(13))
