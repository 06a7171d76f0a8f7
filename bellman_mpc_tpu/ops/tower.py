"""Device (batched limb-array) Fp2/Fp6/Fp12 tower arithmetic.

Same tower as fields/tower.py (Fp2 = Fp[u]/(u^2+1), Fp6 = Fp2[v]/(v^3-xi)
with xi = 1+u, Fp12 = Fp6[w]/(w^2-v)) but over (L, *batch) limb arrays, all
ops pure-traced for jit.  Elements are nested tuples (pytrees):

    Fp2  = (c0, c1)                      each (L, *B)
    Fp6  = (a0, a1, a2)                  each Fp2
    Fp12 = (b0, b1)                      each Fp6

Frobenius maps use host-precomputed gamma constants (powers of xi), computed
exactly at import time.  This backs the batched pairing kernel
(ops/pairing.py) which replaces the reference's `pairing` crate usage
(bellman/src/groth16/verifier.rs, mpc.rs pairing checks).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import tower as ht
from ..fields.bls12_381 import P, fp

F = fp  # device base field


# ------------------------------------------------------------------------ Fp2
def fp2_add(a, b):
    return (F.add(a[0], b[0]), F.add(a[1], b[1]))


def fp2_sub(a, b):
    return (F.sub(a[0], b[0]), F.sub(a[1], b[1]))


def fp2_neg(a):
    return (F.neg(a[0]), F.neg(a[1]))


def fp2_conj(a):
    return (a[0], F.neg(a[1]))


def fp2_mul_many(pairs):
    """Multiply many independent Fp2 pairs through ONE Montgomery multiply.

    Each Fp2 product is 3 Karatsuba Fp sub-products; stacking every pair's
    sub-products on one batch axis turns k Fp2 multiplies into a single
    (L, 3k, *B) limb multiply — the key lever for both XLA compile time
    (one `while` chain instead of 3k) and TPU lane utilization.
    """
    k = len(pairs)
    lhs = jnp.stack(
        [x for (a, b) in pairs for x in (a[0], a[1], F.add(a[0], a[1]))], axis=1
    )
    rhs = jnp.stack(
        [x for (a, b) in pairs for x in (b[0], b[1], F.add(b[0], b[1]))], axis=1
    )
    t = F.mul(lhs, rhs)
    out = []
    for i in range(k):
        t0, t1, t2 = t[:, 3 * i], t[:, 3 * i + 1], t[:, 3 * i + 2]
        out.append((F.sub(t0, t1), F.sub(t2, F.add(t0, t1))))
    return out


def fp2_mul(a, b):
    return fp2_mul_many([(a, b)])[0]


def fp2_square(a):
    return fp2_mul(a, a)


def fp2_mul_fp(a, s):
    """Multiply by an Fp element (s broadcasts over components)."""
    return (F.mul(a[0], s), F.mul(a[1], s))


def fp2_mul_const(a, c0: int, c1: int):
    """Multiply by the host constant c0 + c1*u."""
    if c1 == 0:
        return (F.mul_const(a[0], c0), F.mul_const(a[1], c0))
    re = F.sub(F.mul_const(a[0], c0), F.mul_const(a[1], c1))
    im = F.add(F.mul_const(a[0], c1), F.mul_const(a[1], c0))
    return (re, im)


def fp2_mul_by_xi(a):
    """Multiply by xi = 1 + u."""
    return (F.sub(a[0], a[1]), F.add(a[0], a[1]))


def fp2_inv(a):
    d = F.add(F.mul(a[0], a[0]), F.mul(a[1], a[1]))
    dinv = F.inv(d)
    return (F.mul(a[0], dinv), F.mul(F.neg(a[1]), dinv))


def fp2_zero(batch):
    return (F.zeros(batch), F.zeros(batch))


def fp2_one(batch):
    return (F.const(1, batch), F.zeros(batch))


def fp2_select(cond, a, b):
    return (F.select(cond, a[0], b[0]), F.select(cond, a[1], b[1]))


def fp2_is_zero(a):
    return jnp.logical_and(F.is_zero(a[0]), F.is_zero(a[1]))


def fp2_eq(a, b):
    return jnp.logical_and(F.eq(a[0], b[0]), F.eq(a[1], b[1]))


def fp2_encode(vals):
    return (F.encode([v[0] for v in vals]), F.encode([v[1] for v in vals]))


def fp2_decode(a):
    return list(zip(F.decode(a[0]), F.decode(a[1])))


# ------------------------------------------------------------------------ Fp6
def fp6_add(a, b):
    return tuple(fp2_add(x, y) for x, y in zip(a, b))


def fp6_sub(a, b):
    return tuple(fp2_sub(x, y) for x, y in zip(a, b))


def fp6_neg(a):
    return tuple(fp2_neg(x) for x in a)


def _fp6_mul_pairs(a, b):
    """The 6 Karatsuba Fp2 sub-products of one Fp6 multiply."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    return [
        (a0, b0),
        (a1, b1),
        (a2, b2),
        (fp2_add(a1, a2), fp2_add(b1, b2)),
        (fp2_add(a0, a1), fp2_add(b0, b1)),
        (fp2_add(a0, a2), fp2_add(b0, b2)),
    ]


def _fp6_mul_combine(products):
    t0, t1, t2, m12, m01, m02 = products
    c0 = fp2_add(t0, fp2_mul_by_xi(fp2_sub(m12, fp2_add(t1, t2))))
    c1 = fp2_add(fp2_sub(m01, fp2_add(t0, t1)), fp2_mul_by_xi(t2))
    c2 = fp2_add(fp2_sub(m02, fp2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fp6_mul(a, b):
    return _fp6_mul_combine(fp2_mul_many(_fp6_mul_pairs(a, b)))


def fp6_mul_by_v(a):
    return (fp2_mul_by_xi(a[2]), a[0], a[1])


def fp6_inv(a):
    a0, a1, a2 = a
    s00, s12, s22, s01, s11, s02 = fp2_mul_many(
        [(a0, a0), (a1, a2), (a2, a2), (a0, a1), (a1, a1), (a0, a2)]
    )
    c0 = fp2_sub(s00, fp2_mul_by_xi(s12))
    c1 = fp2_sub(fp2_mul_by_xi(s22), s01)
    c2 = fp2_sub(s11, s02)
    p0, p1, p2 = fp2_mul_many([(a0, c0), (a1, c2), (a2, c1)])
    t = fp2_add(p0, fp2_mul_by_xi(fp2_add(p1, p2)))
    tinv = fp2_inv(t)
    return tuple(fp2_mul_many([(c0, tinv), (c1, tinv), (c2, tinv)]))


def fp6_zero(batch):
    return (fp2_zero(batch), fp2_zero(batch), fp2_zero(batch))


def fp6_one(batch):
    return (fp2_one(batch), fp2_zero(batch), fp2_zero(batch))


# ----------------------------------------------------------------------- Fp12
def fp12_add(a, b):
    return (fp6_add(a[0], b[0]), fp6_add(a[1], b[1]))


def fp12_mul(a, b):
    """Full Fp12 multiply as ONE stacked Montgomery multiply (54 products)."""
    pairs = (
        _fp6_mul_pairs(a[0], b[0])
        + _fp6_mul_pairs(a[1], b[1])
        + _fp6_mul_pairs(fp6_add(a[0], a[1]), fp6_add(b[0], b[1]))
    )
    prods = fp2_mul_many(pairs)
    t0 = _fp6_mul_combine(prods[0:6])
    t1 = _fp6_mul_combine(prods[6:12])
    m = _fp6_mul_combine(prods[12:18])
    c0 = fp6_add(t0, fp6_mul_by_v(t1))
    c1 = fp6_sub(m, fp6_add(t0, t1))
    return (c0, c1)


def fp12_square(a):
    return fp12_mul(a, a)


def fp12_conj(a):
    return (a[0], fp6_neg(a[1]))


def fp12_inv(a):
    sq = fp2_mul_many(_fp6_mul_pairs(a[0], a[0]) + _fp6_mul_pairs(a[1], a[1]))
    a0sq = _fp6_mul_combine(sq[0:6])
    a1sq = _fp6_mul_combine(sq[6:12])
    t = fp6_inv(fp6_sub(a0sq, fp6_mul_by_v(a1sq)))
    pr = fp2_mul_many(_fp6_mul_pairs(a[0], t) + _fp6_mul_pairs(a[1], t))
    return (_fp6_mul_combine(pr[0:6]), fp6_neg(_fp6_mul_combine(pr[6:12])))


def fp12_one(batch):
    return (fp6_one(batch), fp6_zero(batch))


def fp12_select(cond, a, b):
    import jax

    return jax.tree_util.tree_map(lambda x, y: F.select(cond, x, y), a, b)


def fp12_is_one(a):
    one = fp12_one(a[0][0][0].shape[1:])
    flags = []
    for i in range(2):
        for j in range(3):
            for k in range(2):
                flags.append(F.eq(a[i][j][k], one[i][j][k]))
    acc = flags[0]
    for f_ in flags[1:]:
        acc = jnp.logical_and(acc, f_)
    return acc


def fp12_encode(vals):
    """Host Fp12T tuples -> device pytree."""
    return tuple(
        tuple(
            fp2_encode([v[i][j] for v in vals]) for j in range(3)
        )
        for i in range(2)
    )


def fp12_decode(a):
    c = [[fp2_decode(a[i][j]) for j in range(3)] for i in range(2)]
    n = len(c[0][0])
    return [
        (
            (c[0][0][k], c[0][1][k], c[0][2][k]),
            (c[1][0][k], c[1][1][k], c[1][2][k]),
        )
        for k in range(n)
    ]


# ------------------------------------------------------------- Frobenius maps
# gamma constants: xi^(k(p-1)/6) in Fp2, computed exactly on the host.
_XI = (1, 1)
_G = [ht.fp2_pow(_XI, k * (P - 1) // 6) for k in range(6)]


def _const_fp2(c, like):
    """A host Fp2 constant as a broadcast device element (for mul_many)."""
    def enc(v):
        return jnp.broadcast_to(
            F._bc(
                jnp.asarray(F._int_to_limbs(v % P * F.R % P), jnp.int32), like
            ),
            like.shape,
        )

    return (enc(c[0]), enc(c[1]))


_FROB1_CONSTS = [
    _G[2],
    _G[4],
    _G[1],
    ht.fp2_mul(_G[1], _G[2]),
    ht.fp2_mul(_G[1], _G[4]),
]
_G2C = [ht.fp2_pow(_XI, k * (P * P - 1) // 6) for k in range(6)]
_FROB2_CONSTS = [
    _G2C[2],
    _G2C[4],
    _G2C[1],
    ht.fp2_mul(_G2C[1], _G2C[2]),
    ht.fp2_mul(_G2C[1], _G2C[4]),
]


def fp12_frobenius(a):
    """x -> x^p: conjugate coefficients, scale by gamma constants —
    one stacked multiply for all five scaled coefficients."""
    (a0, a1, a2), (b0, b1, b2) = a
    like = a0[0]
    elems = [fp2_conj(x) for x in (a1, a2, b0, b1, b2)]
    prods = fp2_mul_many(
        [(e, _const_fp2(c, like)) for e, c in zip(elems, _FROB1_CONSTS)]
    )
    return ((fp2_conj(a0), prods[0], prods[1]), (prods[2], prods[3], prods[4]))


def fp12_frobenius2(a):
    """x -> x^(p^2): real constants, no conjugation."""
    (a0, a1, a2), (b0, b1, b2) = a
    like = a0[0]
    prods = fp2_mul_many(
        [
            (e, _const_fp2(c, like))
            for e, c in zip((a1, a2, b0, b1, b2), _FROB2_CONSTS)
        ]
    )
    return ((a0, prods[0], prods[1]), (prods[2], prods[3], prods[4]))
