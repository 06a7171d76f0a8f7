"""Pallas Montgomery-multiply kernel vs the XLA path (interpret mode on CPU)."""

import random

from bellman_mpc_tpu.fields.bls12_381 import fp, fp_host
from bellman_mpc_tpu.fields.mock import mock, mock_host
from bellman_mpc_tpu.ops.pallas_kernels import mont_mul_pallas


def test_pallas_mont_mul_matches_field_mul():
    rng = random.Random(2)
    for f, host in [(mock, mock_host), (fp, fp_host)]:
        vals_a = [rng.randrange(host.p) for _ in range(16)]
        vals_b = [rng.randrange(host.p) for _ in range(16)]
        a, b = f.encode(vals_a), f.encode(vals_b)
        got = f.decode(mont_mul_pallas(f, a, b))
        assert got == [x * y % host.p for x, y in zip(vals_a, vals_b)]


def test_pallas_blocking():
    rng = random.Random(3)
    vals = [rng.randrange(fp_host.p) for _ in range(512)]
    a = fp.encode(vals)
    got = fp.decode(mont_mul_pallas(fp, a, a, block=128))
    assert got == [v * v % fp_host.p for v in vals]


def test_pallas_h_pipeline_matches_default(monkeypatch):
    """BMT_PALLAS=1 pipeline output == default pipeline (interpret mode)."""
    import random

    import jax

    from bellman_mpc_tpu.fields.bls12_381 import fr, fr_host
    from bellman_mpc_tpu.groth16 import prover as pv

    rng = random.Random(3)
    exp = 4
    n = 1 << exp
    coeffs = [
        [rng.randrange(fr_host.p) for _ in range(n)] for _ in range(3)
    ]
    enc = [fr.encode(c) for c in coeffs]

    pv._h_pipeline.cache_clear()
    want = jax.block_until_ready(pv._h_pipeline(fr, fr_host, exp)(*enc))

    monkeypatch.setenv("BMT_PALLAS", "1")
    pv._h_pipeline.cache_clear()
    got = jax.block_until_ready(pv._h_pipeline(fr, fr_host, exp)(*enc))
    pv._h_pipeline.cache_clear()  # do not leak the flagged pipeline

    assert fr.decode(got) == fr.decode(want)


def test_pallas_rns_mul_matches_mul_many():
    """VMEM-tiled RNS multiply (interpret mode) == RnsField.mul_many."""
    import random

    import jax
    import numpy as np

    from bellman_mpc_tpu.curves.rns_point import default_rns_field
    from bellman_mpc_tpu.ops.pallas_kernels import rns_mul_many_pallas

    f = default_rns_field()
    rng = random.Random(7)
    a = f.encode([rng.randrange(f.p) for _ in range(64)])
    b = f.encode([rng.randrange(f.p) for _ in range(64)])
    want = f.mul_many([(a, b)])[0]
    got = jax.jit(lambda x, y: rns_mul_many_pallas(f, x, y))(a.res, b.res)
    assert (np.asarray(got) == np.asarray(want.res)).all()


def test_pallas_fold_msm_matches_oracle():
    """Padded-table Pallas fold (G1 + G2) vs the host MSM oracle."""
    import random

    import jax
    import jax.numpy as jnp

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves.device import (
        g1_device,
        g2_device,
        scalars_to_bits,
    )
    from bellman_mpc_tpu.curves.rns_point import (
        default_rns_field,
        rns_g1_ops,
        rns_g2_ops,
    )
    from bellman_mpc_tpu.fields import bls12_381 as bc
    from bellman_mpc_tpu.fields.bls12_381 import R
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        msm_table_affine_rns,
        signed_digits,
        tables_to_rns,
        window_tables_affine,
    )
    from bellman_mpc_tpu.ops.pallas_kernels import pad_rns_table

    rng = random.Random(5)
    for hostg, dev, rops in (
        (chost.G1, g1_device, rns_g1_ops()),
        (chost.G2, g2_device, rns_g2_ops()),
    ):
        n, B, c = 4, 2, 4
        bases = [
            hostg.mul(hostg.generator, rng.randrange(2, 500))
            for _ in range(n)
        ]
        pts = dev.encode_points(bases)
        tab = jax.jit(
            lambda p_, d=dev: window_tables_affine(d.ops, p_, c)
        )(pts)
        rt, bound = tables_to_rns(rops, bc.fp, tab)
        rtp = pad_rns_table(default_rns_field(), rt)
        scal = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
        bits = jnp.stack([scalars_to_bits(s, 255) for s in scal], axis=1)
        sd = signed_digits(digits_from_bits(bits, c), c)
        out = jax.jit(
            lambda t_, d_, r_=rops: msm_table_affine_rns(
                r_, bc.fp, t_, d_, bound
            )
        )(rtp, sd)
        got = dev.decode_points(tuple(x[..., 0] for x in out))
        for b in range(B):
            assert hostg.eq(got[b], hostg.msm(bases, scal[b]))
