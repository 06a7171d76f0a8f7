"""Group-element NTT: point iFFT of power-basis CRS vs the scalar oracle.

The defining property (the sound Lagrange-transform of a powers-of-tau
ceremony): iNTT([tau^i * G]_i) == [lambda_j * G]_j where lambda_j are the
scalar iNTT outputs of [tau^i]_i — i.e. Lagrange-coefficient points —
without anyone multiplying by tau on the curve.
"""

import random

import jax

from bellman_mpc_tpu.curves import host as chost
from bellman_mpc_tpu.curves.device import g1_device, g2_device
from bellman_mpc_tpu.fields import bls12_381 as bc
from bellman_mpc_tpu.ops.group_ntt import group_ntt


def _scalar_intt_oracle(host, vals):
    """Host O(n^2) inverse DFT (matches ops/domain.py ntt inverse=True)."""
    n = len(vals)
    exp = n.bit_length() - 1
    omega_inv = host.inv(host.nth_root_of_unity(exp))
    n_inv = host.inv(n)
    return [
        sum(v * pow(omega_inv, i * j, host.p) for j, v in enumerate(vals))
        * n_inv
        % host.p
        for i in range(n)
    ]


def test_group_intt_matches_scalar_oracle_g1():
    host = bc.fr_host
    rng = random.Random(21)
    n = 8
    tau = rng.randrange(2, host.p)
    powers = [pow(tau, i, host.p) for i in range(n)]
    pts = [chost.G1.mul(chost.G1.generator, k) for k in powers]

    enc = g1_device.encode_points(pts)
    out = jax.jit(
        lambda p: group_ntt(g1_device.ops, host, p, inverse=True)
    )(enc)
    got = g1_device.decode_points(out)

    lam = _scalar_intt_oracle(host, powers)
    for g, l in zip(got, lam):
        want = chost.G1.mul(chost.G1.generator, l)
        assert chost.G1.eq(g, want)


def test_group_ntt_roundtrip_g2():
    host = bc.fr_host
    rng = random.Random(22)
    n = 4
    pts = [chost.G2.mul(chost.G2.generator, rng.randrange(1, host.p)) for _ in range(n)]
    enc = g2_device.encode_points(pts)
    fwd = jax.jit(lambda p: group_ntt(g2_device.ops, host, p))(enc)
    back = jax.jit(
        lambda p: group_ntt(g2_device.ops, host, p, inverse=True)
    )(fwd)
    got = g2_device.decode_points(back)
    for g, want in zip(got, pts):
        assert chost.G2.eq(g, want)
