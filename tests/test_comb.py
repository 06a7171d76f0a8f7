"""Fixed-base comb multiplication vs host scalar multiplication."""

import random

from bellman_mpc_tpu.curves import host as chost
from bellman_mpc_tpu.curves.device import g1_device, g2_device
from bellman_mpc_tpu.fields.bls12_381 import R
from bellman_mpc_tpu.ops.msm import batch_mul_comb_host as batch_mul_host


def test_comb_batch_mul_g1():
    rng = random.Random(21)
    base = chost.G1.mul(chost.G1.generator, 12345)
    exps = [0, 1, 2, R - 1, rng.randrange(R), rng.randrange(R), 7]
    got = batch_mul_host(g1_device, base, exps)
    for e, g in zip(exps, got):
        want = chost.G1.mul(base, e)
        assert (g is None and want is None) or chost.G1.eq(g, want)


def test_comb_batch_mul_g2():
    rng = random.Random(22)
    base = chost.G2.mul(chost.G2.generator, 999)
    exps = [1, rng.randrange(R), 2, 0]
    got = batch_mul_host(g2_device, base, exps)
    for e, g in zip(exps, got):
        want = chost.G2.mul(base, e)
        assert (g is None and want is None) or chost.G2.eq(g, want)
