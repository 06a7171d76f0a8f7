"""MSM kernels: Pippenger vs ladder vs host oracle (multiexp.rs:285-327 port)."""

import random

import pytest

from bellman_mpc_tpu.curves import host as chost
from bellman_mpc_tpu.curves.device import g1_device
from bellman_mpc_tpu.fields.bls12_381 import R
from bellman_mpc_tpu.ops.msm import msm_host, msm_pippenger_host


def test_pippenger_matches_naive():
    rng = random.Random(4)
    n = 32
    bases = [chost.G1.mul(chost.G1.generator, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    # include edge scalars
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1

    want = chost.G1.msm(bases, scalars)
    got_ladder = msm_host(g1_device, bases, scalars)
    got_pip = msm_pippenger_host(g1_device, bases, scalars, c=8)
    assert chost.G1.eq(got_ladder, want)
    assert chost.G1.eq(got_pip, want)


def test_pippenger_duplicate_digits():
    """Many equal scalars stress the segmented-scan bucket path."""
    rng = random.Random(5)
    n = 16
    bases = [chost.G1.mul(chost.G1.generator, k + 1) for k in range(n)]
    scalars = [7] * 8 + [255] * 4 + [rng.randrange(R)] * 4
    want = chost.G1.msm(bases, scalars)
    got = msm_pippenger_host(g1_device, bases, scalars, c=8)
    assert chost.G1.eq(got, want)
