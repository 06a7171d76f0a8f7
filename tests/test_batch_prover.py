"""Batched device prover vs the sequential prover (identical proofs)."""

import random

import pytest

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


@pytest.fixture(scope="module")
def setup():
    """One CRS shared by every strategy test (CRS generation dominates)."""
    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=9, rounds=ROUNDS)
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    pvk = prepare_verifying_key(BLS12_381, params.vk)
    return host, constants, params, pvk


def _check(host, constants, params, pvk, bp, seed, B):
    rng = random.Random(seed)
    witnesses = [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(B)]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in witnesses]
    proofs = bp.prove_batch(circuits)
    for (xl, xr), proof in zip(witnesses, proofs):
        image = mimc(host, xl, xr, constants)
        verify_proof(BLS12_381, pvk, proof, [image])
        # deterministic blinding => must equal the sequential prover's proof
        seq = create_random_proof(BLS12_381, MiMCDemo(constants, xl, xr), params)
        assert proof == seq


def test_batch_prover_matches_sequential(setup):
    host, constants, params, pvk = setup
    bp = BatchProver(BLS12_381, params, MiMCDemo(constants, 0, 0))
    _check(host, constants, params, pvk, bp, seed=1, B=4)


def test_batch_prover_flatpip_matches_sequential(setup):
    """flatpip MSM strategy produces bit-identical proofs."""
    host, constants, params, pvk = setup
    bp = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0),
        msm_strategy="flatpip", pippenger_c=4,
    )
    _check(host, constants, params, pvk, bp, seed=2, B=2)


def test_batch_prover_table_matches_sequential(setup):
    """table MSM strategy (signed affine default) — bit-identical proofs."""
    host, constants, params, pvk = setup
    bp = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0),
        msm_strategy="table", pippenger_c=4,
    )
    _check(host, constants, params, pvk, bp, seed=3, B=2)


def test_batch_prover_rns_matches_sequential(setup, monkeypatch):
    """RNS/MXU MSM strategy (per-MSM folds default) — bit-identical proofs."""
    monkeypatch.delenv("BMT_MERGE_G1", raising=False)
    host, constants, params, pvk = setup
    bp = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0),
        msm_strategy="rns",
    )
    assert not bp._merge_g1  # default: the chip-verified per-MSM folds
    assert not bp._glv  # work-bound fold: the GLV split is opt-in
    _check(host, constants, params, pvk, bp, seed=4, B=2)


def test_batch_prover_rns_glv_matches_sequential(setup, monkeypatch):
    """RNS strategy with the GLV-2/GLS-4 endomorphism split (BMT_GLV=1):
    bit-identical proofs (the split computes the same group elements)."""
    monkeypatch.delenv("BMT_MERGE_G1", raising=False)
    monkeypatch.setenv("BMT_GLV", "1")
    host, constants, params, pvk = setup
    bp = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0),
        msm_strategy="rns",
    )
    assert bp._glv
    _check(host, constants, params, pvk, bp, seed=6, B=2)


def test_batch_prover_rns_merged_matches_sequential(setup, monkeypatch):
    """RNS strategy with the opt-in merged segmented G1 fold (BMT_MERGE_G1=1)."""
    monkeypatch.setenv("BMT_MERGE_G1", "1")
    host, constants, params, pvk = setup
    bp = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0),
        msm_strategy="rns",
    )
    assert bp._merge_g1
    _check(host, constants, params, pvk, bp, seed=5, B=2)
