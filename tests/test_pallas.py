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
