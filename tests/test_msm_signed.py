"""Signed-digit affine-table MSM: recoding, mixed addition, end-to-end.

The signed/affine path is the TPU default for the batched prover; these
tests pin it against the host bigint oracle (multiexp.rs:285-327 parity,
same as tests/test_msm.py for the other strategies).
"""

import random

import jax
import jax.numpy as jnp

from bellman_mpc_tpu.curves import host as chost
from bellman_mpc_tpu.curves.device import (
    g1_device,
    g2_device,
    point_add_mixed,
    scalars_to_bits,
)
from bellman_mpc_tpu.fields.bls12_381 import R
from bellman_mpc_tpu.ops.msm import (
    digits_from_bits,
    msm_table_affine,
    pick_table_c,
    signed_digits,
    window_tables_affine,
)


def test_signed_digits_recompose():
    rng = random.Random(11)
    for c in (4, 7, 8, 13):
        ks = [0, 1, R - 1, (1 << 255) - 1] + [rng.randrange(R) for _ in range(4)]
        bits = scalars_to_bits(ks, 255)[:, :, None]  # (255, B, 1)
        d = digits_from_bits(bits, c)
        s = jax.jit(lambda d_: signed_digits(d_, c))(d)
        s_host = jax.device_get(s)
        half = 1 << (c - 1)
        assert s_host.min() >= -half and s_host.max() <= half
        for b, k in enumerate(ks):
            val = sum(
                int(s_host[w, b, 0]) << (c * w) for w in range(s_host.shape[0])
            )
            assert val == k, (c, k)


def test_point_add_mixed_matches_host():
    """Complete mixed addition vs host, incl. every exceptional case."""
    rng = random.Random(12)
    G = chost.G1.generator
    p_rand = chost.G1.mul(G, rng.randrange(2, R))
    q_rand = chost.G1.mul(G, rng.randrange(2, R))
    cases = [
        (p_rand, q_rand),  # generic
        (None, q_rand),  # P = identity
        (q_rand, q_rand),  # doubling
        (chost.G1.neg(q_rand), q_rand),  # P = -Q  => identity
        (G, q_rand),
    ]
    P = g1_device.encode_points([p for p, _ in cases])
    qx = g1_device.ops.encode([q[0] for _, q in cases])
    qy = g1_device.ops.encode([q[1] for _, q in cases])
    out = jax.jit(lambda a, x, y: point_add_mixed(g1_device.ops, a, (x, y)))(
        P, qx, qy
    )
    got = g1_device.decode_points(out)
    for (p, q), g in zip(cases, got):
        want = chost.G1.add(p, q)
        assert chost.G1.eq(g, want)


def test_point_add_mixed_g2():
    rng = random.Random(13)
    G = chost.G2.generator
    cases = [
        (chost.G2.mul(G, rng.randrange(2, R)), chost.G2.mul(G, 7)),
        (None, chost.G2.mul(G, 5)),
        (chost.G2.mul(G, 9), chost.G2.mul(G, 9)),
    ]
    P = g2_device.encode_points([p for p, _ in cases])
    qx = g2_device.ops.encode([q[0] for _, q in cases])
    qy = g2_device.ops.encode([q[1] for _, q in cases])
    out = jax.jit(lambda a, x, y: point_add_mixed(g2_device.ops, a, (x, y)))(
        P, qx, qy
    )
    got = g2_device.decode_points(out)
    for (p, q), g in zip(cases, got):
        assert chost.G2.eq(g, chost.G2.add(p, q))


def _run_affine_msm(group, hostg, bases, scalar_sets, c):
    pts = group.encode_points(bases)
    tables = jax.jit(
        lambda p: window_tables_affine(group.ops, p, c)
    )(pts)
    bits = jnp.stack([scalars_to_bits(s, 255) for s in scalar_sets], axis=1)
    sd = signed_digits(digits_from_bits(bits, c), c)
    out = jax.jit(lambda t, d: msm_table_affine(group.ops, t, d))(tables, sd)
    return group.decode_points(tuple(x[..., 0] for x in out))


def test_msm_table_affine_matches_host():
    rng = random.Random(14)
    n, B, c = 8, 2, 4
    bases = [
        chost.G1.mul(chost.G1.generator, rng.randrange(1, R)) for _ in range(n)
    ]
    bases[3] = None  # padded identity base must be skipped at every bucket
    scalar_sets = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
    scalar_sets[0][0] = 0
    scalar_sets[0][1] = 1
    scalar_sets[1][2] = R - 1
    got = _run_affine_msm(g1_device, chost.G1, bases, scalar_sets, c)
    for b in range(B):
        want = chost.G1.msm(
            [p for p in bases if p is not None],
            [s for p, s in zip(bases, scalar_sets[b]) if p is not None],
        )
        assert chost.G1.eq(got[b], want)


def test_msm_table_affine_g2():
    rng = random.Random(15)
    n, B, c = 4, 2, 5
    bases = [chost.G2.mul(chost.G2.generator, k + 2) for k in range(n)]
    scalar_sets = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
    got = _run_affine_msm(g2_device, chost.G2, bases, scalar_sets, c)
    for b in range(B):
        want = chost.G2.msm(bases, scalar_sets[b])
        assert chost.G2.eq(got[b], want)


def test_pick_table_c():
    assert pick_table_c(1, g2=False) >= 12
    assert pick_table_c(1024, g2=False) == 8  # 33*129*1024 pts = 1.26 GB
    assert pick_table_c(1024, g2=True) == 7
    # monotone non-increasing in n
    cs = [pick_table_c(n, g2=False) for n in (1, 16, 256, 1024, 4096)]
    assert cs == sorted(cs, reverse=True)
