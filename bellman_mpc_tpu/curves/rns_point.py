"""RNS curve kernels — the MXU path for the MSM window fold.

Same complete Renes–Costello–Batina formulas (eprint 2015/1060, Algs 7-9,
a = 0) as curves/device.py, evaluated over the RNS field engine
(fields/rns.py) instead of limb Montgomery arithmetic.  Why a second point
layer exists: the MSM fold is ~82% of the batched prove step and the limb
point add already sits at the VPU roofline (carry chains cost as much as the
multiply MACs), while the RNS multiply's reduction work is two CONSTANT int8
matmuls that run on the MXU — the ~35x-faster unit the limb path cannot use.

Coordinates are RnsVal wrappers over (C, *batch) int32 residues (G1) or
(C, 2, *batch) (G2, axis 1 = Fp2 component).  Every value carries an exact
trace-time bound (value < a*p as a host Fraction); the fold loop pins the
accumulator to the fixpoint bound A_ACC and the formulas below are proven
(assertion-checked at trace time) to map A_ACC-bounded inputs back inside
A_ACC.

This is the TPU-native substrate under the reference's Pippenger multiexp
(bellman/src/multiexp.rs:159-281); table layout and fold structure live in
ops/msm.py.
"""

from __future__ import annotations

import functools
from fractions import Fraction
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..fields.rns import RnsField, RnsVal

RPoint = Tuple[RnsVal, RnsVal, RnsVal]


class RnsG1Ops:
    """Fp coordinate ops over RnsVal (residues (C, *batch))."""

    fp2 = False

    def __init__(self, f: RnsField, b3: int):
        self.f = f
        self.b3 = b3

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def neg(self, a):
        return a.neg()

    def mul_b3(self, a):
        return a.scale(self.b3)

    def scale3(self, a):
        return a.scale(3)

    def mul_many(self, pairs):
        return self.f.mul_many(pairs)

    def zero(self, batch) -> RnsVal:
        return RnsVal(
            self.f, jnp.zeros((self.f.C,) + tuple(batch), jnp.int32), Fraction(1)
        )

    def one(self, batch) -> RnsVal:
        # M-residue of 1 is M mod p
        r = self.f.encode_raw(self.f.M % self.f.p)
        return RnsVal(
            self.f,
            jnp.broadcast_to(
                r.reshape((self.f.C,) + (1,) * len(batch)),
                (self.f.C,) + tuple(batch),
            ),
            Fraction(1),
        )

    def select(self, cond, a: RnsVal, b: RnsVal) -> RnsVal:
        return RnsVal(
            self.f, jnp.where(cond[None], a.res, b.res), max(a.a, b.a)
        )

    def is_stored_zero(self, a: RnsVal):
        """All-base-channels-zero — detects the EXACT integer 0 (the stored
        identity sentinel), not merely 0 mod p."""
        return jnp.all(a.res[: self.f.k] == 0, axis=0)

    def wrap(self, res: jnp.ndarray, a) -> RnsVal:
        return RnsVal(self.f, res, a)


class RnsG2Ops:
    """Fp2 = Fp[u]/(u^2+1) coordinate ops over RnsVal (residues
    (C, 2, *batch)); Karatsuba sub-products stack through ONE RNS multiply
    pipeline (3 lanes per product — same trick as curves/device.DevFp2)."""

    fp2 = True

    def __init__(self, f: RnsField, b3c: int):
        # b3 = b3c * (1 + u) (BLS12-381 G2: 12 + 12u)
        self.f = f
        self.b3c = b3c

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def neg(self, a):
        return a.neg()

    def _c(self, a: RnsVal, i: int) -> RnsVal:
        return RnsVal(self.f, a.res[:, i], a.a)

    def _join(self, c0: RnsVal, c1: RnsVal) -> RnsVal:
        return RnsVal(
            self.f, jnp.stack([c0.res, c1.res], axis=1), max(c0.a, c1.a)
        )

    def mul_b3(self, a):
        # (c0 + c1 u)(b3c + b3c u) = b3c(c0 - c1) + b3c(c0 + c1) u
        c0, c1 = self._c(a, 0), self._c(a, 1)
        return self._join(
            (c0 - c1).scale(self.b3c), (c0 + c1).scale(self.b3c)
        )

    def scale3(self, a):
        return a.scale(3)

    def mul_many(self, pairs):
        f = self.f
        sub = []
        for a, b in pairs:
            a0, a1 = self._c(a, 0), self._c(a, 1)
            b0, b1 = self._c(b, 0), self._c(b, 1)
            sub += [(a0, b0), (a1, b1), (a0 + a1, b0 + b1)]
        prods = f.mul_many(sub)
        out = []
        for i in range(len(pairs)):
            t0, t1, t2 = prods[3 * i : 3 * i + 3]
            out.append(self._join(t0 - t1, t2 - t0 - t1))
        return out

    def zero(self, batch) -> RnsVal:
        return RnsVal(
            self.f,
            jnp.zeros((self.f.C, 2) + tuple(batch), jnp.int32),
            Fraction(1),
        )

    def one(self, batch) -> RnsVal:
        r = self.f.encode_raw(self.f.M % self.f.p)
        c0 = jnp.broadcast_to(
            r.reshape((self.f.C,) + (1,) * len(batch)),
            (self.f.C,) + tuple(batch),
        )
        return RnsVal(
            self.f,
            jnp.stack([c0, jnp.zeros_like(c0)], axis=1),
            Fraction(1),
        )

    def select(self, cond, a: RnsVal, b: RnsVal) -> RnsVal:
        return RnsVal(
            self.f, jnp.where(cond[None, None], a.res, b.res), max(a.a, b.a)
        )

    def is_stored_zero(self, a: RnsVal):
        return jnp.all(a.res[: self.f.k] == 0, axis=(0, 1))

    def wrap(self, res: jnp.ndarray, a) -> RnsVal:
        return RnsVal(self.f, res, a)


# ---------------------------------------------------------- point arithmetic


def point_identity(ops, batch) -> RPoint:
    return (ops.zero(batch), ops.one(batch), ops.zero(batch))


def point_select(ops, cond, p: RPoint, q: RPoint) -> RPoint:
    return tuple(ops.select(cond, a, b) for a, b in zip(p, q))


def point_add(ops, p: RPoint, q: RPoint) -> RPoint:
    """Complete addition, RCB15 Algorithm 7 (a=0)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0, t1, t2, m_xy, m_yz, m_xz = ops.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (ops.add(X1, Y1), ops.add(X2, Y2)),
            (ops.add(Y1, Z1), ops.add(Y2, Z2)),
            (ops.add(X1, Z1), ops.add(X2, Z2)),
        ]
    )
    t3 = ops.sub(ops.sub(m_xy, t0), t1)
    t4 = ops.sub(ops.sub(m_yz, t1), t2)
    y3b = ops.mul_b3(ops.sub(ops.sub(m_xz, t0), t2))
    t0_3 = ops.scale3(t0)
    t2b = ops.mul_b3(t2)
    Z3m = ops.add(t1, t2b)
    t1m = ops.sub(t1, t2b)
    p1, p2, p3, p4, p5, p6 = ops.mul_many(
        [
            (t4, y3b),
            (t3, t1m),
            (y3b, t0_3),
            (t1m, Z3m),
            (t0_3, t3),
            (Z3m, t4),
        ]
    )
    return (ops.sub(p2, p1), ops.add(p4, p3), ops.add(p6, p5))


def point_add_mixed(ops, p: RPoint, q: Tuple[RnsVal, RnsVal]) -> RPoint:
    """Complete mixed addition P + (x2, y2), RCB15 Algorithm 8 (a=0).

    `q` must not be the identity (callers select around the stored (0,0)
    sentinel, see ops/msm.py); `p` may be ANY projective point."""
    X1, Y1, Z1 = p
    X2, Y2 = q
    t0, t1, t3p, t4p, y3p = ops.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (ops.add(X1, Y1), ops.add(X2, Y2)),
            (Y2, Z1),
            (X2, Z1),
        ]
    )
    t3 = ops.sub(ops.sub(t3p, t0), t1)
    t4 = ops.add(t4p, Y1)
    y3b = ops.mul_b3(ops.add(y3p, X1))
    t0_3 = ops.scale3(t0)
    t2 = ops.mul_b3(Z1)
    Z3m = ops.add(t1, t2)
    t1m = ops.sub(t1, t2)
    q1, q2, q3, q4, q5, q6 = ops.mul_many(
        [
            (t3, t1m),
            (t4, y3b),
            (y3b, t0_3),
            (t1m, Z3m),
            (Z3m, t4),
            (t0_3, t3),
        ]
    )
    return (ops.sub(q1, q2), ops.add(q3, q4), ops.add(q5, q6))


def point_double(ops, p: RPoint) -> RPoint:
    """Doubling, RCB15 Algorithm 9 (a=0)."""
    X, Y, Z = p
    t0, t1, t2r, txy = ops.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
    t2 = ops.mul_b3(t2r)
    z8 = t0.scale(8)
    y3m = ops.add(t0, t2)
    t0a = ops.sub(t0, t2.scale(3))
    p1, p2, p3, p4 = ops.mul_many(
        [(t2, z8), (t1, z8), (t0a, y3m), (t0a, txy)]
    )
    return (p4.scale(2), ops.add(p1, p3), p2)


def tree_reduce(ops, p: RPoint, cap) -> RPoint:
    """Sum points along the LAST batch axis (a power of two), re-pinning
    the coordinate bound to `cap` after every halving (sound: point_add's
    output bounds are <= cap whenever its input bounds are — asserted).

    The halving is reshape (..., n) -> (..., 2, m) + index, NOT strided
    :m / m: slicing: the slice form compiled STANDALONE miscompiles on
    XLA:TPU at N>=128 (the round-4 layout-assignment bug; the reshape
    form is exact at every probed shape — scripts/probe_fix_variants.py).
    Both compute the identical first-half + second-half pairing."""
    X, Y, Z = p
    n = X.res.shape[-1]
    assert n & (n - 1) == 0

    def halves(v: RnsVal):
        m = v.res.shape[-1] // 2
        r2 = v.res.reshape(v.res.shape[:-1] + (2, m))
        return ops.wrap(r2[..., 0, :], v.a), ops.wrap(r2[..., 1, :], v.a)

    while n > 1:
        hx, hy, hz = halves(X), halves(Y), halves(Z)
        X, Y, Z = point_add(
            ops, (hx[0], hy[0], hz[0]), (hx[1], hy[1], hz[1])
        )
        assert max(X.a, Y.a, Z.a) <= cap, "tree_reduce bound escape"
        X, Y, Z = (ops.wrap(v.res, cap) for v in (X, Y, Z))
        n //= 2
    return (X, Y, Z)


# ----------------------------------------------------- fixpoint verification


def mixed_add_fixpoint(ops, acc_bound: Fraction, table_bound: Fraction):
    """Trace-time proof that `point_add_mixed` maps accumulator coordinates
    bounded by acc_bound (+ table coords bounded by table_bound) back inside
    acc_bound, and that every intermediate respects the RNS range asserts
    (RnsVal's constructor checks a*p < min(M, M') on each op).  Runs the
    real formula on 1-lane dummies under an abstract trace."""

    def chk(acc_a, tab_a):
        batch = (1,)
        mk = lambda a: ops.wrap(ops.zero(batch).res, Fraction(a))
        p = (mk(acc_a), mk(acc_a), mk(acc_a))
        q = (mk(tab_a), mk(tab_a))
        X3, Y3, Z3 = point_add_mixed(ops, p, q)
        return max(X3.a, Y3.a, Z3.a)

    got = chk(acc_bound, table_bound)
    assert got <= acc_bound, (
        f"mixed-add bound fixpoint fails: {acc_bound} -> {got}"
    )
    return got


def add_fixpoint(ops, cap: Fraction):
    def mk(a):
        return ops.wrap(ops.zero((1,)).res, Fraction(a))

    p = (mk(cap), mk(cap), mk(cap))
    X3, Y3, Z3 = point_add(ops, p, p)
    got = max(X3.a, Y3.a, Z3.a)
    assert got <= cap, f"add bound fixpoint fails: {cap} -> {got}"
    return got


# -------------------------------------------------------- limb <-> RNS bridge


def limb_coord_to_rns(
    f: RnsField, lf, arr: jnp.ndarray, limb_bits: int = 11
) -> RnsVal:
    """Canonical limb Montgomery coordinate (x*Rlimb mod p, lazy < 2p) ->
    RNS M-residue of x (value bound 2*p/M + k + 1).  EXACT-zero limbs map
    to exact-zero residues (the mul pipeline preserves integer 0), so the
    (0,0) affine identity sentinel survives the conversion."""
    u = f.from_digits(arr, bound=2, limb_bits=limb_bits)
    c = (f.M * f.M % f.p) * pow(lf.R, -1, f.p) % f.p
    cv = RnsVal(f, f.encode_raw(c, like=u.res), Fraction(1))
    return f.mul(u, cv)


@functools.lru_cache(maxsize=None)
def default_rns_field() -> RnsField:
    from ..fields import bls12_381 as bc

    return RnsField(bc.P)


@functools.lru_cache(maxsize=None)
def rns_g1_ops() -> RnsG1Ops:
    from ..fields import bls12_381 as bc

    return RnsG1Ops(default_rns_field(), 3 * bc.B_G1)


@functools.lru_cache(maxsize=None)
def rns_g2_ops() -> RnsG2Ops:
    return RnsG2Ops(default_rns_field(), 12)


def rns_point_to_limb(ops, f: RnsField, lf, p: RPoint):
    """RNS projective point -> limb projective Point (device.py layout)."""
    outs = []
    for v in p:
        if ops.fp2:
            c0 = f.to_limb_mont(RnsVal(f, v.res[:, 0], v.a), lf)
            c1 = f.to_limb_mont(RnsVal(f, v.res[:, 1], v.a), lf)
            outs.append(jnp.stack([c0, c1], axis=1))
        else:
            outs.append(f.to_limb_mont(v, lf))
    return tuple(outs)
