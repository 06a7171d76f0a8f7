"""RNS curve kernel tests (CPU, vs the host bigint curve groups).

curves/rns_point.py is the MXU substrate for the MSM fold; these tests
check the complete RCB15 formulas over RNS against curves/host.py for G1
and G2, the bound fixpoints, and the limb <-> RNS bridges.
"""

import random
from fractions import Fraction

import jax.numpy as jnp
import numpy as np
import pytest

from bellman_mpc_tpu.curves import host as chost
from bellman_mpc_tpu.curves import rns_point as rp
from bellman_mpc_tpu.fields import bls12_381 as bc
from bellman_mpc_tpu.fields.rns import RnsField, RnsVal

P = bc.P
rng = random.Random(77)


@pytest.fixture(scope="module")
def f():
    return RnsField(P)


@pytest.fixture(scope="module")
def g1ops(f):
    return rp.RnsG1Ops(f, 3 * bc.B_G1)


@pytest.fixture(scope="module")
def g2ops(f):
    return rp.RnsG2Ops(f, 12)


def _rand_pts(group, n):
    return [group.mul(group.generator, rng.randrange(1, 1 << 64)) for _ in range(n)]


def _enc_g1(ops, pts, z=None):
    """Host projective/affine points -> RnsVal coords (batch = (n,))."""
    f = ops.f
    xs = f.encode([p[0] for p in pts])
    ys = f.encode([p[1] for p in pts])
    if z is None:
        return xs, ys
    zs = f.encode(z)
    return xs, ys, zs


def _enc_g2(ops, pts, z=None):
    f = ops.f

    def enc2(vals):
        c0 = f.encode([v[0] for v in vals])
        c1 = f.encode([v[1] for v in vals])
        return RnsVal(f, jnp.stack([c0.res, c1.res], axis=1), Fraction(1))

    xs = enc2([p[0] for p in pts])
    ys = enc2([p[1] for p in pts])
    if z is None:
        return xs, ys
    return xs, ys, enc2(z)


def _dec_g1(ops, pt):
    f = ops.f
    X, Y, Z = (f.decode(v) for v in pt)
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, P)
            out.append((x * zi % P, y * zi % P))
    return out


def _dec_g2(ops, pt):
    f = ops.f

    def dec2(v):
        c0 = f.decode(RnsVal(f, v.res[:, 0], v.a))
        c1 = f.decode(RnsVal(f, v.res[:, 1], v.a))
        return list(zip(c0, c1))

    X, Y, Z = (dec2(v) for v in pt)
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == (0, 0):
            out.append(None)
        else:
            zi = chost.FP2_OPS.inv(z)
            out.append((chost.FP2_OPS.mul(x, zi), chost.FP2_OPS.mul(y, zi)))
    return out


def test_g1_mixed_add_vs_host(f, g1ops):
    n = 4
    ps = _rand_pts(chost.G1, n)
    qs = _rand_pts(chost.G1, n)
    X, Y, Z = _enc_g1(g1ops, ps, z=[1] * n)
    qx, qy = _enc_g1(g1ops, qs)
    out = rp.point_add_mixed(g1ops, (X, Y, Z), (qx, qy))
    got = _dec_g1(g1ops, out)
    want = [chost.G1.add(p, q) for p, q in zip(ps, qs)]
    assert got == want


def test_g1_mixed_add_identity_acc(f, g1ops):
    """Accumulator = identity (0:1:0): complete formula must return q."""
    qs = _rand_pts(chost.G1, 3)
    ident = rp.point_identity(g1ops, (3,))
    qx, qy = _enc_g1(g1ops, qs)
    got = _dec_g1(g1ops, rp.point_add_mixed(g1ops, ident, (qx, qy)))
    assert got == qs


def test_g1_mixed_add_doubling_case(f, g1ops):
    """P + P through the COMPLETE mixed formula must equal 2P."""
    ps = _rand_pts(chost.G1, 3)
    X, Y, Z = _enc_g1(g1ops, ps, z=[1] * 3)
    qx, qy = _enc_g1(g1ops, ps)
    got = _dec_g1(g1ops, rp.point_add_mixed(g1ops, (X, Y, Z), (qx, qy)))
    assert got == [chost.G1.double(p) for p in ps]


def test_g1_full_add_and_double(f, g1ops):
    ps = _rand_pts(chost.G1, 4)
    qs = _rand_pts(chost.G1, 4)
    p_dev = _enc_g1(g1ops, ps, z=[1] * 4)
    q_dev = _enc_g1(g1ops, qs, z=[1] * 4)
    got = _dec_g1(g1ops, rp.point_add(g1ops, p_dev, q_dev))
    assert got == [chost.G1.add(p, q) for p, q in zip(ps, qs)]
    got2 = _dec_g1(g1ops, rp.point_double(g1ops, p_dev))
    assert got2 == [chost.G1.double(p) for p in ps]
    # identity + identity and P + identity
    ident = rp.point_identity(g1ops, (4,))
    assert _dec_g1(g1ops, rp.point_add(g1ops, ident, ident)) == [None] * 4
    assert _dec_g1(g1ops, rp.point_add(g1ops, p_dev, ident)) == ps


def test_g1_neg_gathered_y(f, g1ops):
    """P + (-Q) via y negation (the signed-digit fold's sign path)."""
    ps = _rand_pts(chost.G1, 3)
    qs = _rand_pts(chost.G1, 3)
    X, Y, Z = _enc_g1(g1ops, ps, z=[1] * 3)
    qx, qy = _enc_g1(g1ops, qs)
    got = _dec_g1(
        g1ops, rp.point_add_mixed(g1ops, (X, Y, Z), (qx, qy.neg()))
    )
    assert got == [chost.G1.add(p, chost.G1.neg(q)) for p, q in zip(ps, qs)]


def test_g1_tree_reduce(f, g1ops):
    n = 8
    ps = _rand_pts(chost.G1, n)
    X, Y, Z = _enc_g1(g1ops, ps, z=[1] * n)
    cap = Fraction(512)
    got = _dec_g1(g1ops, rp.tree_reduce(g1ops, (X, Y, Z), cap))
    want = ps[0]
    for q in ps[1:]:
        want = chost.G1.add(want, q)
    assert got == [want]


def test_g2_mixed_and_full(f, g2ops):
    n = 3
    ps = _rand_pts(chost.G2, n)
    qs = _rand_pts(chost.G2, n)
    one = [(1, 0)] * n
    X, Y, Z = _enc_g2(g2ops, ps, z=one)
    qx, qy = _enc_g2(g2ops, qs)
    got = _dec_g2(g2ops, rp.point_add_mixed(g2ops, (X, Y, Z), (qx, qy)))
    assert got == [chost.G2.add(p, q) for p, q in zip(ps, qs)]
    # doubling case through the complete mixed formula
    got2 = _dec_g2(
        g2ops, rp.point_add_mixed(g2ops, (X, Y, Z), _enc_g2(g2ops, ps))
    )
    assert got2 == [chost.G2.double(p) for p in ps]
    # full add + identity handling
    ident = rp.point_identity(g2ops, (n,))
    assert _dec_g2(g2ops, rp.point_add_mixed(g2ops, ident, (qx, qy))) == qs
    q_dev = _enc_g2(g2ops, qs, z=one)
    got3 = _dec_g2(g2ops, rp.point_add(g2ops, (X, Y, Z), q_dev))
    assert got3 == [chost.G2.add(p, q) for p, q in zip(ps, qs)]
    got4 = _dec_g2(g2ops, rp.point_double(g2ops, q_dev))
    assert got4 == [chost.G2.double(q) for q in qs]


def test_g2_tree_reduce(f, g2ops):
    n = 4
    ps = _rand_pts(chost.G2, n)
    X, Y, Z = _enc_g2(g2ops, ps, z=[(1, 0)] * n)
    got = _dec_g2(g2ops, rp.tree_reduce(g2ops, (X, Y, Z), Fraction(512)))
    want = ps[0]
    for q in ps[1:]:
        want = chost.G2.add(want, q)
    assert got == [want]


def test_fixpoints(f, g1ops, g2ops):
    """The fold's bound discipline: mixed add maps (A_ACC, A_TAB) inside
    A_ACC; full add maps A_ACC inside A_ACC (for the tree reduce)."""
    a_tab = Fraction(2) * f.p / f.M + (f.k + 1)  # limb->RNS converted table
    rp.mixed_add_fixpoint(g1ops, Fraction(128), a_tab)
    rp.add_fixpoint(g1ops, Fraction(512))
    rp.mixed_add_fixpoint(g2ops, Fraction(256), a_tab)
    rp.add_fixpoint(g2ops, Fraction(512))


def test_long_fold_chain_bounds(f, g1ops):
    """33 sequential mixed adds (the c=8 fold length) stay exact."""
    acc_h = None
    ps = _rand_pts(chost.G1, 2)
    acc = rp.point_identity(g1ops, (2,))
    cap = Fraction(128)
    qx, qy = _enc_g1(g1ops, ps)
    for i in range(33):
        out = rp.point_add_mixed(g1ops, acc, (qx, qy))
        assert max(v.a for v in out) <= cap
        acc = tuple(g1ops.wrap(v.res, cap) for v in out)
        acc_h = ps if acc_h is None else [
            chost.G1.add(a, p) for a, p in zip(acc_h, ps)
        ]
    assert _dec_g1(g1ops, acc) == acc_h


def test_limb_rns_bridge_roundtrip(f, g1ops):
    """limb Montgomery -> RNS M-residue -> limb Montgomery is identity."""
    lf = bc.fp
    xs = [rng.randrange(P) for _ in range(6)] + [0, 1]
    limb = lf.encode(xs)
    v = rp.limb_coord_to_rns(f, lf, limb)
    assert f.decode(v) == xs
    # exact-zero limbs -> exact-zero residues (identity sentinel survival)
    zero_in = lf.zeros((2,))
    vz = rp.limb_coord_to_rns(f, lf, zero_in)
    assert bool(jnp.all(vz.res == 0))
    back = f.to_limb_mont(v, lf)
    assert lf.decode(back) == xs


def test_rns_point_to_limb(f, g1ops, g2ops):
    from bellman_mpc_tpu.curves.device import g1_device, g2_device

    ps = _rand_pts(chost.G1, 2)
    X, Y, Z = _enc_g1(g1ops, ps, z=[1] * 2)
    limb_pt = rp.rns_point_to_limb(g1ops, f, bc.fp, (X, Y, Z))
    assert g1_device.decode_points(limb_pt) == ps

    qs = _rand_pts(chost.G2, 2)
    X2, Y2, Z2 = _enc_g2(g2ops, qs, z=[(1, 0)] * 2)
    limb_pt2 = rp.rns_point_to_limb(g2ops, f, bc.fp, (X2, Y2, Z2))
    assert g2_device.decode_points(limb_pt2) == qs
