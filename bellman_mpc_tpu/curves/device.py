"""TPU projective curve kernels for G1 (over Fp) and G2 (over Fp2).

Design: points live in homogeneous projective coordinates (X : Y : Z) with
identity (0 : 1 : 0), and ALL group operations use the Renes–Costello–Batina
complete addition law for a = 0 short-Weierstrass curves (public formulas,
eprint 2015/1060, Algs 7 & 9).  Complete formulas are branch-free — identity,
doubling and generic addition take the same instruction path — which is
exactly what a traced/vectorized TPU program needs (no data-dependent control
flow, cf. the reference's branchy Jacobian arithmetic inside the `group`
crate it depends on).

Coordinates are limb arrays: G1 coordinate = (L, *batch); G2 coordinate =
(L, 2, *batch) with axis 1 the Fp2 component (so Fp2 mul's three Karatsuba
sub-products batch through ONE Montgomery multiply on the lane axis).

This module replaces the reference's per-element wNAF scalar multiplication
(bellman/src/groth16/generator.rs:311-328) and is the substrate for the MSM
kernel (ops/msm.py), replacing bellman/src/multiexp.rs.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bls12_381 as bc
from ..fields.limb import LazyCols, LazyFp2, LimbField
from . import host as chost


# ------------------------------------------------------------- coordinate ops
class DevFp:
    """Fp coordinate ops — thin veneer over LimbField (shape (L, *B))."""

    def __init__(self, field: LimbField, b3: int):
        self.f = field
        self.b3 = b3 % field.p

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def mul(self, a, b):
        return self.f.mul(a, b)

    def mul_many(self, pairs):
        """k independent products through ONE stacked Montgomery multiply."""
        lhs = jnp.stack([a for a, _ in pairs], axis=1)
        rhs = jnp.stack([b for _, b in pairs], axis=1)
        t = self.f.mul(lhs, rhs)
        return [t[:, i] for i in range(len(pairs))]

    def b3_element(self, like):
        """b3 as a multiplicand for mul_many groups."""
        return jnp.broadcast_to(
            self.f._bc(
                jnp.asarray(
                    self.f._int_to_limbs(self.b3 * self.f.R % self.f.p), jnp.int32
                ),
                like,
            ),
            like.shape,
        )

    def neg(self, a):
        return self.f.neg(a)

    def mul_b3(self, a):
        return self.f.mul_const(a, self.b3)

    def zero(self, batch):
        return self.f.zeros(batch)

    def one(self, batch):
        return self.f.const(1, batch)

    def select(self, cond, a, b):
        return jnp.where(jnp.asarray(cond)[None], a, b)

    def is_zero(self, a):
        return self.f.is_zero(a)

    def eq(self, a, b):
        return self.f.eq(a, b)

    def batch_shape(self, a):
        return a.shape[1:]

    def inv(self, a):
        return self.f.inv(a)

    # -- lazy-column interface (Aranha-style deferred reduction) -------------
    # Operands are (array, dvec): dvec is the exact per-limb digit bound
    # (tuple of host ints), so raw digit-wise operand sums need no carry
    # pass — LazyCols proves int32 safety at trace time from these bounds.
    def lop(self, arr):
        return (arr, self.f._dmax_lazy)

    def ldsum(self, a, b):
        dm = self.f._dmax_lazy
        return (a + b, tuple(2 * d for d in dm))

    def lmul_many(self, pairs):
        return self.f.lazy_mul_many(
            [(a, b) for (a, _), (b, _) in pairs],
            [(da, db) for (_, da), (_, db) in pairs],
        )

    def lreduce_many(self, lcs, wide: bool = False):
        return self.f.lazy_reduce_many(lcs, wide=wide)

    def llift(self, a) -> LazyCols:
        """Zero-cost lift of a reduced element into LazyCols: placing the
        limbs at columns [L, 2L) represents value a·R, so one Montgomery
        reduction returns the element itself.  Value bound 2p·R exceeds the
        normal p·R REDC budget — accumulate with products and reduce with
        wide=True (one extra conditional subtraction)."""
        f = self.f
        return LazyCols(
            f,
            jnp.concatenate([jnp.zeros_like(a), a], axis=0),
            (0,) * f.L + f._dmax_lazy,
        )

    def lb3(self, lc: LazyCols) -> LazyCols:
        """Multiply unreduced columns by the small integer b3 (Montgomery
        form is linear, so an integer column scale IS the b3 multiply)."""
        return lc.fold().scale(self.b3)

    # host <-> device
    def encode(self, vals: Sequence[int]):
        return self.f.encode(list(vals))

    def decode(self, arr) -> List[int]:
        return self.f.decode(arr)


class DevFp2:
    """Fp2 = Fp[u]/(u^2+1) coordinate ops on (L, 2, *B) arrays.

    Karatsuba multiply: the three Fp sub-products are stacked on a single
    batch axis and go through one Montgomery multiply (3x lane utilization).
    """

    def __init__(self, field: LimbField, b3c0: int, b3c1: int):
        self.f = field
        self.b3c0 = b3c0 % field.p
        self.b3c1 = b3c1 % field.p

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def neg(self, a):
        return self.f.neg(a)

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def mul_many(self, pairs):
        """k independent Fp2 products via ONE (L, 3k, *B) limb multiply."""
        f = self.f
        lhs, rhs = [], []
        for a, b in pairs:
            a0, a1 = a[:, 0], a[:, 1]
            b0, b1 = b[:, 0], b[:, 1]
            lhs += [a0, a1, f.add(a0, a1)]
            rhs += [b0, b1, f.add(b0, b1)]
        prod = f.mul(jnp.stack(lhs, axis=1), jnp.stack(rhs, axis=1))
        out = []
        for i in range(len(pairs)):
            t0, t1, t2 = prod[:, 3 * i], prod[:, 3 * i + 1], prod[:, 3 * i + 2]
            out.append(
                jnp.stack([f.sub(t0, t1), f.sub(t2, f.add(t0, t1))], axis=1)
            )
        return out

    def b3_element(self, like):
        f = self.f
        c0 = jnp.broadcast_to(
            f._bc(
                jnp.asarray(f._int_to_limbs(self.b3c0 * f.R % f.p), jnp.int32),
                like[:, 0],
            ),
            like[:, 0].shape,
        )
        c1 = jnp.broadcast_to(
            f._bc(
                jnp.asarray(f._int_to_limbs(self.b3c1 * f.R % f.p), jnp.int32),
                like[:, 0],
            ),
            like[:, 0].shape,
        )
        return jnp.stack([c0, c1], axis=1)

    def mul_b3(self, a):
        # (c0 + c1 u) * (b3c0 + b3c1 u)
        f = self.f
        a0, a1 = a[:, 0], a[:, 1]
        re = f.sub(f.mul_const(a0, self.b3c0), f.mul_const(a1, self.b3c1))
        im = f.add(f.mul_const(a0, self.b3c1), f.mul_const(a1, self.b3c0))
        return jnp.stack([re, im], axis=1)

    def zero(self, batch):
        return self.f.zeros((2,) + tuple(batch))

    def one(self, batch):
        one = self.f.const(1, batch)
        return jnp.stack([one, self.f.zeros(tuple(batch))], axis=1)

    def select(self, cond, a, b):
        return jnp.where(jnp.asarray(cond)[None, None], a, b)

    def is_zero(self, a):
        return jnp.logical_and(self.f.is_zero(a[:, 0]), self.f.is_zero(a[:, 1]))

    def eq(self, a, b):
        return jnp.logical_and(
            self.f.eq(a[:, 0], b[:, 0]), self.f.eq(a[:, 1], b[:, 1])
        )

    def batch_shape(self, a):
        return a.shape[2:]

    def inv(self, a):
        # (a0 - a1 u) / (a0^2 + a1^2)
        f = self.f
        a0, a1 = a[:, 0], a[:, 1]
        sq = f.mul(jnp.stack([a0, a1], axis=1), jnp.stack([a0, a1], axis=1))
        d = f.add(sq[:, 0], sq[:, 1])
        dinv = f.inv(d)
        return jnp.stack([f.mul(a0, dinv), f.mul(f.neg(a1), dinv)], axis=1)

    # -- lazy-column interface (see DevFp; values here are LazyFp2) ----------
    # Operand digit bounds (dvec) apply to BOTH Fp components.
    def lop(self, arr):
        return (arr, self.f._dmax_lazy)

    def ldsum(self, a, b):
        # fold once so the Karatsuba sum lane (digits 2x again) stays small
        dm = self.f._dmax_lazy
        arr, dvec = self.f.fold_digits(a + b, tuple(2 * d for d in dm))
        return (arr, dvec)

    def lmul_many(self, pairs):
        """k unreduced Fp2 Karatsuba products via ONE (3k-lane) product loop."""
        f = self.f
        arrs, dmaxes = [], []
        for (a, da), (b, db) in pairs:
            a0, a1 = a[:, 0], a[:, 1]
            b0, b1 = b[:, 0], b[:, 1]
            da2 = tuple(2 * x for x in da)
            db2 = tuple(2 * x for x in db)
            arrs += [(a0, b0), (a1, b1), (a0 + a1, b0 + b1)]
            dmaxes += [(da, db), (da, db), (da2, db2)]
        prods = f.lazy_mul_many(arrs, dmaxes)
        out = []
        for i in range(len(pairs)):
            t0, t1, t2 = prods[3 * i : 3 * i + 3]
            out.append(LazyFp2(t0 - t1, t2 - t0 - t1))
        return out

    def lreduce_many(self, lfp2s, wide: bool = False):
        flat = []
        for l in lfp2s:
            flat += [l.re, l.im]
        red = self.f.lazy_reduce_many(flat, wide=wide)
        return [
            jnp.stack([red[2 * i], red[2 * i + 1]], axis=1)
            for i in range(len(lfp2s))
        ]

    def llift(self, a) -> LazyFp2:
        """Component-wise zero-cost lift (see DevFp.llift)."""
        f = self.f

        def lift1(x):
            return LazyCols(
                f,
                jnp.concatenate([jnp.zeros_like(x), x], axis=0),
                (0,) * f.L + f._dmax_lazy,
            )

        return LazyFp2(lift1(a[:, 0]), lift1(a[:, 1]))

    def lb3(self, l: LazyFp2) -> LazyFp2:
        """Multiply unreduced Fp2 columns by b3 = c*(1+u): an integer
        xi-style combine, no Montgomery multiply needed."""
        assert self.b3c0 == self.b3c1, "lazy b3 assumes b3 = c*(1+u)"
        c = self.b3c0
        re, im = l.re.fold(), l.im.fold()
        return LazyFp2((re - im).scale(c), (re + im).scale(c))

    def encode(self, vals: Sequence[Tuple[int, int]]):
        c0 = self.f.encode([v[0] for v in vals])
        c1 = self.f.encode([v[1] for v in vals])
        return jnp.stack([c0, c1], axis=1)

    def decode(self, arr) -> List[Tuple[int, int]]:
        c0 = self.f.decode(arr[:, 0])
        c1 = self.f.decode(arr[:, 1])
        return list(zip(c0, c1))


# ---------------------------------------------------------- point arithmetic
Point = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z)


def point_identity(ops, batch) -> Point:
    return (ops.zero(batch), ops.one(batch), ops.zero(batch))


def point_add(ops, p: Point, q: Point) -> Point:
    """Complete addition, RCB15 Algorithm 7 (a=0), with lazy reduction.

    The formula is evaluated as TWO stacked product loops (6 + 6 lanes) and
    TWO stacked Montgomery reductions (6 + 3 lanes).  Every +/- and both
    b3-multiplies happen at the unreduced-column level (plain int32 tensor
    adds — b3 is a small integer, and Montgomery form is linear, so b3·x is
    a column scale).  Zero standalone carry-normalization passes; all bounds
    proven at trace time by LazyCols.
    """
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    el = ops.lop
    t0, t1, t2, m_xy, m_yz, m_xz = ops.lmul_many(
        [
            (el(X1), el(X2)),
            (el(Y1), el(Y2)),
            (el(Z1), el(Z2)),
            (ops.ldsum(X1, Y1), ops.ldsum(X2, Y2)),
            (ops.ldsum(Y1, Z1), ops.ldsum(Y2, Z2)),
            (ops.ldsum(X1, Z1), ops.ldsum(X2, Z2)),
        ]
    )
    t2b = ops.lb3(t2)
    t3, t4, y3b, t0_3, Z3m, t1m = ops.lreduce_many(
        [
            m_xy - t0 - t1,
            m_yz - t1 - t2,
            ops.lb3(m_xz - t0 - t2),
            3 * t0,
            t1 + t2b,
            t1 - t2b,
        ]
    )
    p1, p2, p3, p4, p5, p6 = ops.lmul_many(
        [
            (el(t4), el(y3b)),
            (el(t3), el(t1m)),
            (el(y3b), el(t0_3)),
            (el(t1m), el(Z3m)),
            (el(t0_3), el(t3)),
            (el(Z3m), el(t4)),
        ]
    )
    X3, Y3, Z3 = ops.lreduce_many([p2 - p1, p4 + p3, p6 + p5])
    return (X3, Y3, Z3)


def point_add_mixed(ops, p: Point, q) -> Point:
    """Complete mixed addition P + (x2, y2), RCB15 Algorithm 8 (a=0).

    `q` is an affine pair (X2, Y2) that must NOT be the identity (callers
    select around it, see ops/msm.py msm_table_affine); `p` may be ANY
    projective point including the identity (0:1:0).

    Lazy-column structure: the reference algorithm's three element-plus-
    product sums are handled without extra multiplies —
      * t2 = b3·Z1 becomes a product against the constant b3 element;
      * t4 = Y2·Z1 + Y1 and Y3raw = X2·Z1 + X1 take zero-cost column
        LIFTS of Y1/X1 (value < 2pR), paid by one stacked conditional
        subtraction in a wide reduction;
      * the algorithm's b3·Y3raw scale is deferred to the second product
        stage's outputs, where it is a free integer column scale.
    Same stacked-lane count as the full addition (6+6 products, 6+3
    reductions) but only two affine coordinates are read — tables shrink
    to 2/3 and the bucket gathers move a third less HBM traffic.
    """
    X1, Y1, Z1 = p
    X2, Y2 = q
    el = ops.lop
    t0, t1, t3p, t4p, y3p, t2 = ops.lmul_many(
        [
            (el(X1), el(X2)),
            (el(Y1), el(Y2)),
            (ops.ldsum(X1, Y1), ops.ldsum(X2, Y2)),
            (el(Y2), el(Z1)),
            (el(X2), el(Z1)),
            (el(Z1), el(ops.b3_element(Z1))),
        ]
    )
    t3, t0_3, Z3m, t1m, t4, y3raw = ops.lreduce_many(
        [
            t3p - t0 - t1,
            3 * t0,
            t1 + t2,
            t1 - t2,
            t4p + ops.llift(Y1),
            y3p + ops.llift(X1),
        ],
        wide=True,
    )
    q1, q2, q3, q4, q5, q6 = ops.lmul_many(
        [
            (el(t3), el(t1m)),
            (el(t4), el(y3raw)),
            (el(y3raw), el(t0_3)),
            (el(t1m), el(Z3m)),
            (el(Z3m), el(t4)),
            (el(t0_3), el(t3)),
        ]
    )
    X3, Y3, Z3 = ops.lreduce_many(
        [q1 - ops.lb3(q2), ops.lb3(q3) + q4, q5 + q6]
    )
    return (X3, Y3, Z3)


def point_double(ops, p: Point) -> Point:
    """Doubling, RCB15 Algorithm 9 (a=0), with lazy reduction (two stacked
    product loops of 4 lanes, two stacked reductions of 6 + 3 lanes)."""
    X, Y, Z = p
    el = ops.lop
    t0, t1, t2r, txy = ops.lmul_many(
        [(el(Y), el(Y)), (el(Y), el(Z)), (el(Z), el(Z)), (el(X), el(Y))]
    )
    t2 = ops.lb3(t2r)
    z3_8y2, y3_mid, t0_adj, t1e, txye, t2re = ops.lreduce_many(
        [8 * t0, t0 + t2, t0 - 3 * t2, t1, txy, t2r]
    )
    x3p_raw, z3p, y3p, x3q = ops.lmul_many(
        [
            (el(t2re), el(z3_8y2)),
            (el(t1e), el(z3_8y2)),
            (el(t0_adj), el(y3_mid)),
            (el(t0_adj), el(txye)),
        ]
    )
    # x3p = b3 * (t2r * 8Y^2): fold the b3 scale into the product columns.
    X3, Y3, Z3 = ops.lreduce_many(
        [2 * x3q, ops.lb3(x3p_raw) + y3p, z3p]
    )
    return (X3, Y3, Z3)


def point_select(ops, cond, p: Point, q: Point) -> Point:
    return (
        ops.select(cond, p[0], q[0]),
        ops.select(cond, p[1], q[1]),
        ops.select(cond, p[2], q[2]),
    )


def point_is_identity(ops, p: Point):
    return ops.is_zero(p[2])


def scalar_mul_bits(ops, p: Point, bits: jnp.ndarray) -> Point:
    """Branchless left-to-right double-and-add.

    `bits` is (nbits, *batch) int32, MSB first; `p` broadcasts over batch.
    Replaces per-scalar wNAF (generator.rs:311-328) with a vectorized ladder.
    """
    nbits = bits.shape[0]
    batch = bits.shape[1:]
    acc = point_identity(ops, batch)

    def body(i, acc):
        acc = point_double(ops, acc)
        added = point_add(ops, acc, p)
        return point_select(ops, bits[i] == 1, added, acc)

    return jax.lax.fori_loop(0, nbits, body, acc)


def scalar_mul_const(ops, p: Point, k: int) -> Point:
    """Double-and-add for a HOST-constant scalar: unrolled, select-free.

    For the prover's fixed blinding scalars (r=27134, s=17146,
    prover.rs:169-172) this is ~2x fewer point ops than the branchless
    ladder (no identity-select lanes, adds only at set bits)."""
    if k == 0:
        return point_identity(ops, ops.batch_shape(p[0]))
    acc = p
    for b in bin(k)[3:]:  # MSB already consumed by acc = p
        acc = point_double(ops, acc)
        if b == "1":
            acc = point_add(ops, acc, p)
    return acc


def tree_reduce(ops, p: Point) -> Point:
    """Sum all points along the LAST batch axis (must be a power of two).

    The halving is expressed as reshape (..., n) -> (..., 2, m) + index on
    the new axis rather than strided :m / m: slicing: the slice form of this
    exact loop triggers an XLA:TPU layout-assignment miscompile at N>=128
    when compiled standalone (round-4/5 bisection, DESIGN-NOTES.md;
    scripts/probe_fix_variants.py — slice MISMATCH 16/16, reshape exact).
    Both forms compute the identical first-half + second-half pairing.
    """
    X, Y, Z = p
    n = X.shape[-1]
    assert n & (n - 1) == 0
    while n > 1:
        half = n // 2

        def _halves(t):
            t2 = t.reshape(t.shape[:-1] + (2, half))
            return t2[..., 0, :], t2[..., 1, :]

        hx, hy, hz = _halves(X), _halves(Y), _halves(Z)
        X, Y, Z = point_add(
            ops, (hx[0], hy[0], hz[0]), (hx[1], hy[1], hz[1])
        )
        n = half
    return (X, Y, Z)


def to_affine(ops, p: Point) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(x, y, is_infinity) with batched Fermat inversion of Z."""
    X, Y, Z = p
    inf = point_is_identity(ops, p)
    zsafe = ops.select(inf, ops.one(ops.batch_shape(Z)), Z)
    zinv = ops.inv(zsafe)
    return ops.mul(X, zinv), ops.mul(Y, zinv), inf


# ----------------------------------------------------------- group instances
fp_ops = DevFp(bc.fp, 3 * bc.B_G1)  # b3 = 12
fp2_ops = DevFp2(bc.fp, 12, 12)  # b3 = 12(1+u)


class DeviceGroup:
    """Bundles coordinate ops + host mirror group + codecs for one of G1/G2."""

    def __init__(self, ops, host_group: chost.CurveGroup, name: str):
        self.ops = ops
        self.host = host_group
        self.name = name

    # -- host <-> device point codecs ---------------------------------------
    def encode_points(self, pts: Sequence[Optional[tuple]]) -> Point:
        """Host affine points (None = identity) -> projective limb arrays."""
        if self.name == "G1":
            xs = [p[0] if p else 0 for p in pts]
            ys = [p[1] if p else 1 for p in pts]
        else:
            xs = [p[0] if p else (0, 0) for p in pts]
            ys = [p[1] if p else (1, 0) for p in pts]
        zs_host = [0 if p is None else 1 for p in pts]
        X = self.ops.encode(xs)
        Y = self.ops.encode(ys)
        if self.name == "G1":
            Z = bc.fp.encode(zs_host)
        else:
            Z = self.ops.encode([(z, 0) for z in zs_host])
        return (X, Y, Z)

    def decode_points(self, p: Point) -> List[Optional[tuple]]:
        """Projective limb arrays -> host affine points (batched z-inversion)."""
        x, y, inf = _jit_to_affine(self)(p)
        xs = self.ops.decode(x)
        ys = self.ops.decode(y)
        infs = np.asarray(inf).reshape(-1)
        return [None if i else (xv, yv) for xv, yv, i in zip(xs, ys, infs)]


@functools.lru_cache(maxsize=None)
def _jit_to_affine(group: DeviceGroup):
    return jax.jit(lambda p: to_affine(group.ops, p))


g1_device = DeviceGroup(fp_ops, chost.G1, "G1")
g2_device = DeviceGroup(fp2_ops, chost.G2, "G2")


def scalars_to_bits(scalars: Sequence[int], nbits: int) -> jnp.ndarray:
    """Host ints -> (nbits, N) int32 bit matrix, MSB first."""
    n = len(scalars)
    out = np.zeros((nbits, n), np.int32)
    for j, s in enumerate(scalars):
        for i in range(nbits):
            out[nbits - 1 - i, j] = (s >> i) & 1
    return jnp.asarray(out)
