"""Batched device prover vs the sequential prover (identical proofs)."""

import random

from bellman_mpc_tpu.groth16 import (
    create_random_proof,
    generate_random_parameters,
    prepare_verifying_key,
    verify_proof,
)
from bellman_mpc_tpu.groth16.bls12 import BLS12_381
from bellman_mpc_tpu.models import MiMCDemo, mimc, mimc_constants
from bellman_mpc_tpu.parallel import BatchProver

ROUNDS = 8  # small MiMC variant: domain 32, fast CPU compile


def test_batch_prover_matches_sequential():
    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=9, rounds=ROUNDS)
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    pvk = prepare_verifying_key(BLS12_381, params.vk)

    bp = BatchProver(BLS12_381, params, MiMCDemo(constants, 0, 0))

    rng = random.Random(1)
    B = 4
    witnesses = [
        (rng.randrange(host.p), rng.randrange(host.p)) for _ in range(B)
    ]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in witnesses]
    proofs = bp.prove_batch(circuits)

    for (xl, xr), proof in zip(witnesses, proofs):
        image = mimc(host, xl, xr, constants)
        verify_proof(BLS12_381, pvk, proof, [image])
        # deterministic blinding => must equal the sequential prover's proof
        seq = create_random_proof(
            BLS12_381, MiMCDemo(constants, xl, xr), params
        )
        assert proof == seq


def test_batch_prover_flatpip_matches_sequential():
    """flatpip MSM strategy produces bit-identical proofs."""
    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=9, rounds=ROUNDS)
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    pvk = prepare_verifying_key(BLS12_381, params.vk)

    bp = BatchProver(
        BLS12_381,
        params,
        MiMCDemo(constants, 0, 0),
        msm_strategy="flatpip",
        pippenger_c=4,
    )

    rng = random.Random(2)
    witnesses = [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(2)]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in witnesses]
    proofs = bp.prove_batch(circuits)
    for (xl, xr), proof in zip(witnesses, proofs):
        image = mimc(host, xl, xr, constants)
        verify_proof(BLS12_381, pvk, proof, [image])
        seq = create_random_proof(
            BLS12_381, MiMCDemo(constants, xl, xr), params
        )
        assert proof == seq


def test_batch_prover_table_matches_sequential():
    """table MSM strategy produces bit-identical proofs."""
    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=9, rounds=ROUNDS)
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    pvk = prepare_verifying_key(BLS12_381, params.vk)

    bp = BatchProver(
        BLS12_381,
        params,
        MiMCDemo(constants, 0, 0),
        msm_strategy="table",
        pippenger_c=4,
    )

    rng = random.Random(3)
    witnesses = [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(2)]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in witnesses]
    proofs = bp.prove_batch(circuits)
    for (xl, xr), proof in zip(witnesses, proofs):
        image = mimc(host, xl, xr, constants)
        verify_proof(BLS12_381, pvk, proof, [image])
        seq = create_random_proof(
            BLS12_381, MiMCDemo(constants, xl, xr), params
        )
        assert proof == seq
