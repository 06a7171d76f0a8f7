"""RNS field engine correctness tests (CPU, vs exact Python bigints).

The RNS engine (fields/rns.py) is the MXU path for the Fp arithmetic under
the MSM window fold — the TPU-native form of the field ops beneath the
reference's Pippenger multiexp (bellman/src/multiexp.rs:159-281).  Every
operation here is checked against host bigint arithmetic.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from bellman_mpc_tpu.fields import bls12_381 as bc
from bellman_mpc_tpu.fields.rns import RnsField, RnsVal

P = bc.P
rng = random.Random(1234)


@pytest.fixture(scope="module")
def f():
    return RnsField(P)


def _vals(n):
    return [rng.randrange(P) for _ in range(n)]


def test_base_sanity(f):
    assert len(set(f.moduli)) == f.C, "moduli must be distinct (coprime)"
    assert f.M > 4 * f.k * P and f.Mp > 4 * f.k * P
    assert f.mr > f.k + 1
    assert all(m < (1 << 12) for m in f.moduli)


def test_encode_decode_roundtrip(f):
    xs = _vals(8) + [0, 1, P - 1]
    for mont in (True, False):
        a = f.encode(xs, mont=mont)
        assert f.decode(a, mont=mont) == xs


def test_add_sub_neg(f):
    xs, ys = _vals(6), _vals(6)
    a, b = f.encode(xs), f.encode(ys)
    assert f.decode(a + b) == [(x + y) % P for x, y in zip(xs, ys)]
    assert f.decode(a - b) == [(x - y) % P for x, y in zip(xs, ys)]
    assert f.decode(b.neg()) == [(-y) % P for y in ys]
    assert f.decode(a.double()) == [2 * x % P for x in xs]


def test_scale(f):
    xs = _vals(5)
    a = f.encode(xs)
    assert f.decode(a.scale(12)) == [12 * x % P for x in xs]


def test_mul_single(f):
    xs, ys = _vals(8), _vals(8)
    a, b = f.encode(xs), f.encode(ys)
    got = f.decode(f.mul(a, b))
    assert got == [x * y % P for x, y in zip(xs, ys)]


def test_mul_edge_values(f):
    xs = [0, 1, P - 1, P - 1, 0]
    ys = [5, P - 1, P - 1, 0, 0]
    got = f.decode(f.mul(f.encode(xs), f.encode(ys)))
    assert got == [x * y % P for x, y in zip(xs, ys)]


def test_mul_many_stacked(f):
    pairs_h = [(_vals(4), _vals(4)) for _ in range(6)]
    pairs_d = [(f.encode(xs), f.encode(ys)) for xs, ys in pairs_h]
    outs = f.mul_many(pairs_d)
    for (xs, ys), o in zip(pairs_h, outs):
        assert f.decode(o) == [x * y % P for x, y in zip(xs, ys)]


def test_mul_of_unreduced_sums(f):
    """Multiply inputs that carry grown bounds (sums of products)."""
    xs, ys, zs, ws = _vals(4), _vals(4), _vals(4), _vals(4)
    a = f.encode(xs) + f.encode(ys)  # bound 2
    b = f.encode(zs) - f.encode(ws)  # bound 1 + ceil(1) = 2
    got = f.decode(f.mul(a, b))
    assert got == [
        (x + y) * (z - w) % P for x, y, z, w in zip(xs, ys, zs, ws)
    ]


def test_mul_chain_bound_fixpoint(f):
    """Long chains of (sum of two products) -> product must keep bounds at
    the fixpoint and stay exact (the MSM fold's steady-state shape)."""
    xs, ys = _vals(2), _vals(2)
    a, b = f.encode(xs), f.encode(ys)
    hx, hy = list(xs), list(ys)
    for _ in range(20):
        p1, p2 = f.mul_many([(a, b), (a, a)])
        a, b = p1 + p2, p1 - p2
        h1 = [x * y % P for x, y in zip(hx, hy)]
        h2 = [x * x % P for x in hx]
        hx = [(u + v) % P for u, v in zip(h1, h2)]
        hy = [(u - v) % P for u, v in zip(h1, h2)]
        assert a.a * f.p < f.Mmin and b.a * f.p < f.Mmin
    assert f.decode(a) == hx
    assert f.decode(b) == hy


def test_select_and_is_zero(f):
    xs, ys = _vals(4), _vals(4)
    a, b = f.encode(xs), f.encode(ys)
    cond = jnp.asarray([True, False, True, False])
    got = f.decode(f.select(cond[None], a, b))
    assert got == [x if c else y for x, y, c in zip(xs, ys, [1, 0, 1, 0])]

    z = f.encode([0, 5, 0, P - 1])
    assert list(np.asarray(f.is_zero_exact(z))) == [True, False, True, False]


def test_mul_const(f):
    xs = _vals(4)
    a = f.encode(xs)
    c = rng.randrange(P)
    # mul_const multiplies by an encode_raw'd plain constant with weight
    # M^{-1}; to multiply an M-residue by c preserving form, pass c*M.
    got = f.decode(f.mul_const(a, c * f.M % P))
    assert got == [x * c % P for x in xs]


def test_from_digits_plain(f):
    """11-bit limb digits of an integer -> RNS residues of that integer."""
    limb_bits = 11
    D = 36
    vals = _vals(5)
    digs = np.zeros((D, 5), np.int32)
    for j, v in enumerate(vals):
        for d in range(D):
            digs[d, j] = (v >> (limb_bits * d)) & ((1 << limb_bits) - 1)
    r = f.from_digits(jnp.asarray(digs), bound=1, limb_bits=limb_bits)
    # residues are of the PLAIN integer: decode without the M^-1 weight
    assert f.decode(r, mont=False) == vals


def test_from_digits_limb_montgomery_to_rns_mont(f):
    """Full limb->RNS conversion: limb Montgomery form (x * 2^396) in 11-bit
    digits -> RNS M-residue of x, via one rns mul by M^2 * Rlimb^{-1}."""
    limb_bits, L = 11, 36
    Rlimb = 1 << (limb_bits * L)
    vals = _vals(5)
    digs = np.zeros((L, 5), np.int32)
    for j, v in enumerate(vals):
        m = v * Rlimb % P
        for d in range(L):
            digs[d, j] = (m >> (limb_bits * d)) & ((1 << limb_bits) - 1)
    u = f.from_digits(jnp.asarray(digs), bound=1, limb_bits=limb_bits)
    cconst = f.M * f.M % P * pow(Rlimb, -1, P) % P
    c = RnsVal(f, f.encode_raw(cconst, like=u.res), 1)
    got = f.mul(u, c)  # x*Rlimb * (M^2/Rlimb) * M^{-1} = x*M
    assert f.decode(got) == vals
