"""Device projective curve kernels vs the exact host oracle."""

import random

import jax
import numpy as np
import pytest

from bellman_mpc_tpu.curves import host as chost
from bellman_mpc_tpu.curves import device as dev
from bellman_mpc_tpu.fields.bls12_381 import R

GROUPS = [(dev.g1_device, chost.G1), (dev.g2_device, chost.G2)]
IDS = ["G1", "G2"]


def host_points(g, seed, n):
    rng = random.Random(seed)
    return [g.mul(g.generator, rng.randrange(1, R)) for _ in range(n)]


@pytest.mark.parametrize("dg,hg", GROUPS, ids=IDS)
def test_add_double_vs_host(dg, hg):
    pts = host_points(hg, 1, 4) + [None]  # include identity
    qts = host_points(hg, 2, 4) + [hg.generator]
    P = dg.encode_points(pts)
    Q = dg.encode_points(qts)
    got = dg.decode_points(jax.jit(lambda a, b: dev.point_add(dg.ops, a, b))(P, Q))
    want = [hg.add(p, q) for p, q in zip(pts, qts)]
    for g, w in zip(got, want):
        assert (g is None and w is None) or hg.eq(g, w)

    got_dbl = dg.decode_points(jax.jit(lambda a: dev.point_double(dg.ops, a))(P))
    want_dbl = [hg.double(p) for p in pts]
    for g, w in zip(got_dbl, want_dbl):
        assert (g is None and w is None) or hg.eq(g, w)


@pytest.mark.parametrize("dg,hg", GROUPS, ids=IDS)
def test_complete_formula_edge_cases(dg, hg):
    """P + (-P) = identity; P + identity = P; identity + identity = identity."""
    p = host_points(hg, 3, 1)[0]
    neg = hg.neg(p)
    P = dg.encode_points([p, p, None, None])
    Q = dg.encode_points([neg, None, p, None])
    got = dg.decode_points(jax.jit(lambda a, b: dev.point_add(dg.ops, a, b))(P, Q))
    assert got[0] is None
    assert hg.eq(got[1], p)
    assert hg.eq(got[2], p)
    assert got[3] is None


@pytest.mark.parametrize("dg,hg", GROUPS, ids=IDS)
def test_scalar_mul_vs_host(dg, hg):
    rng = random.Random(5)
    scalars = [0, 1, 2, R - 1, rng.randrange(R), rng.randrange(R), 7, R]
    base = dg.encode_points([hg.generator])
    bits = dev.scalars_to_bits(scalars, R.bit_length())
    out = jax.jit(lambda b, bb: dev.scalar_mul_bits(dg.ops, b, bb))(base, bits)
    got = dg.decode_points(out)
    for s, g in zip(scalars, got):
        w = hg.mul(hg.generator, s)
        assert (g is None and w is None) or hg.eq(g, w)


@pytest.mark.parametrize("dg,hg", GROUPS, ids=IDS)
def test_tree_reduce(dg, hg):
    pts = host_points(hg, 7, 8)
    P = dg.encode_points(pts)
    out = jax.jit(lambda p: dev.tree_reduce(dg.ops, p))(P)
    got = dg.decode_points(out)[0]
    want = None
    for p in pts:
        want = hg.add(want, p)
    assert hg.eq(got, want)
