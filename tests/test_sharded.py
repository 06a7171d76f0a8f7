"""Mesh-sharded kernels on the 8-virtual-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import pytest

from bellman_mpc_tpu.curves import host as chost
from bellman_mpc_tpu.curves.device import g1_device, scalars_to_bits
from bellman_mpc_tpu.fields.bls12_381 import R, fr, fr_host
from bellman_mpc_tpu.fields.mock import mock, mock_host
from bellman_mpc_tpu.ops.domain import EvaluationDomain
from bellman_mpc_tpu.parallel.mesh import make_mesh
from bellman_mpc_tpu.parallel.sharded import sharded_msm, sharded_ntt

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the 8-virtual-device CPU mesh"
)


@needs_devices
def test_sharded_ntt_matches_local():
    rng = random.Random(1)
    n = 64
    coeffs = [rng.randrange(mock_host.p) for _ in range(n)]
    d = EvaluationDomain.from_coeffs(mock, mock_host, coeffs)
    d.fft()
    want = d.into_coeffs()

    mesh = make_mesh(8, shape=(2, 4))
    x = mock.encode(coeffs)
    with mesh:
        out = sharded_ntt(mesh, mock, mock_host, x)
    assert mock.decode(out) == want


@needs_devices
def test_sharded_intt_roundtrip():
    rng = random.Random(2)
    n = 32
    coeffs = [rng.randrange(mock_host.p) for _ in range(n)]
    mesh = make_mesh(8, shape=(2, 4))
    x = mock.encode(coeffs)
    with mesh:
        fwd = sharded_ntt(mesh, mock, mock_host, x)
        back = sharded_ntt(mesh, mock, mock_host, fwd, inverse=True)
    assert mock.decode(back) == coeffs


@needs_devices
def test_sharded_msm_matches_host():
    rng = random.Random(3)
    n = 16
    bases = [chost.G1.mul(chost.G1.generator, k + 3) for k in range(n)]
    scalars = [[rng.randrange(R) for _ in range(n)] for _ in range(2)]
    pts = g1_device.encode_points(bases)
    bits = jnp.stack([scalars_to_bits(s, 255) for s in scalars], axis=1)
    mesh = make_mesh(8, shape=(2, 4))
    with mesh:
        out = sharded_msm(mesh, g1_device.ops, pts, bits)
    got = g1_device.decode_points(tuple(x[..., 0] for x in out))
    for b in range(2):
        assert chost.G1.eq(got[b], chost.G1.msm(bases, scalars[b]))


@needs_devices
def test_sharded_table_affine_msm_matches_host():
    """Mesh-sharded SIGNED-affine gather-table MSM (the shipping strategy)."""
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        signed_digits,
        window_tables_affine,
    )
    from bellman_mpc_tpu.parallel.sharded import sharded_msm_table_affine

    rng = random.Random(6)
    n, B, c = 16, 2, 4
    bases = [chost.G1.mul(chost.G1.generator, k + 9) for k in range(n)]
    scalars = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
    pts = g1_device.encode_points(bases)
    bits = jnp.stack([scalars_to_bits(s, 255) for s in scalars], axis=1)
    tables = jax.jit(lambda p: window_tables_affine(g1_device.ops, p, c))(pts)
    sd = signed_digits(digits_from_bits(bits, c), c)
    mesh = make_mesh(8, shape=(2, 4))
    with mesh:
        out = sharded_msm_table_affine(mesh, g1_device.ops, tables, sd)
    got = g1_device.decode_points(tuple(x[..., 0] for x in out))
    for b in range(B):
        assert chost.G1.eq(got[b], chost.G1.msm(bases, scalars[b]))


@needs_devices
def test_mesh_batch_prover_bit_identical():
    """BatchProver(mesh=...) sharded table-strategy proofs == single-device
    proofs, bit for bit (deterministic blinding)."""
    from bellman_mpc_tpu.groth16 import generate_random_parameters
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.models import MiMCDemo, mimc_constants
    from bellman_mpc_tpu.parallel import BatchProver
    from bellman_mpc_tpu.parallel.sharded import shard_batch_inputs

    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=11, rounds=8)
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    mesh = make_mesh(8, shape=(4, 2))
    wits = [(101 + i, 202 + i) for i in range(4)]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in wits]

    bp_mesh = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0), mesh=mesh
    )
    assert bp_mesh.msm_strategy == "table"
    provers = [bp_mesh.compiled.prove_assignment(c) for c in circuits]
    args = shard_batch_inputs(mesh, bp_mesh.encode_witness(provers), batch_axis=0)
    with mesh:
        out = jax.jit(bp_mesh._step_fn)(*args, bp_mesh._table_args)
        jax.block_until_ready(out)
    from bellman_mpc_tpu.curves.device import g2_device
    from bellman_mpc_tpu.groth16.types import Proof

    g_a, g_b, g_c = out
    pa = g1_device.decode_points(tuple(x[..., 0] for x in g_a))
    pb = g2_device.decode_points(tuple(x[..., 0] for x in g_b))
    pc = g1_device.decode_points(tuple(x[..., 0] for x in g_c))
    mesh_proofs = [Proof(a=a, b=b, c=c) for a, b, c in zip(pa, pb, pc)]

    bp_single = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0), msm_strategy="table"
    )
    single_proofs = bp_single.prove_batch(circuits)
    assert mesh_proofs == single_proofs


@needs_devices
def test_mesh_prover_sharded_ntt_bit_identical(monkeypatch):
    """With BMT_SHARD_NTT_EXP forced to 0, the mesh prover runs every NTT
    through the distributed 4-step pipeline — proofs must stay bit-identical
    to the single-device prover."""
    monkeypatch.setenv("BMT_SHARD_NTT_EXP", "0")
    from bellman_mpc_tpu.groth16 import generate_random_parameters
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.models import MiMCDemo, mimc_constants
    from bellman_mpc_tpu.parallel import BatchProver
    from bellman_mpc_tpu.parallel.sharded import shard_batch_inputs

    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=13, rounds=8)
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    mesh = make_mesh(8, shape=(2, 4))
    wits = [(55 + i, 66 + i) for i in range(2)]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in wits]

    bp_mesh = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0), mesh=mesh
    )
    provers = [bp_mesh.compiled.prove_assignment(c) for c in circuits]
    args = shard_batch_inputs(mesh, bp_mesh.encode_witness(provers), batch_axis=0)
    with mesh:
        out = jax.jit(bp_mesh._step_fn)(*args, bp_mesh._table_args)
        jax.block_until_ready(out)
    from bellman_mpc_tpu.curves.device import g2_device
    from bellman_mpc_tpu.groth16.types import Proof

    g_a, g_b, g_c = out
    pa = g1_device.decode_points(tuple(x[..., 0] for x in g_a))
    pb = g2_device.decode_points(tuple(x[..., 0] for x in g_b))
    pc = g1_device.decode_points(tuple(x[..., 0] for x in g_c))
    mesh_proofs = [Proof(a=a, b=b, c=c) for a, b, c in zip(pa, pb, pc)]

    monkeypatch.delenv("BMT_SHARD_NTT_EXP")
    bp_single = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0), msm_strategy="table"
    )
    assert mesh_proofs == bp_single.prove_batch(circuits)


@needs_devices
def test_sharded_table_msm_matches_host():
    """Mesh-sharded gather-table MSM (the TPU-default strategy, sharded)."""
    from bellman_mpc_tpu.ops.msm import digits_from_bits, window_tables
    from bellman_mpc_tpu.parallel.sharded import sharded_msm_table

    rng = random.Random(5)
    n, B, c = 16, 2, 4
    bases = [chost.G1.mul(chost.G1.generator, k + 5) for k in range(n)]
    scalars = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
    pts = g1_device.encode_points(bases)
    bits = jnp.stack([scalars_to_bits(s, 255) for s in scalars], axis=1)
    tables = jax.jit(lambda p: window_tables(g1_device.ops, p, c))(pts)
    digits = digits_from_bits(bits, c)
    mesh = make_mesh(8, shape=(2, 4))
    with mesh:
        out = sharded_msm_table(mesh, g1_device.ops, tables, digits)
    got = g1_device.decode_points(tuple(x[..., 0] for x in out))
    for b in range(B):
        assert chost.G1.eq(got[b], chost.G1.msm(bases, scalars[b]))
