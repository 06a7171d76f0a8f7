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


def fp2_mul(a, b):
    # Karatsuba over one stacked Montgomery multiply (3x lane batching).
    a0, a1 = a
    b0, b1 = b
    lhs = jnp.stack([a0, a1, F.add(a0, a1)], axis=1)
    rhs = jnp.stack([b0, b1, F.add(b0, b1)], axis=1)
    t = F.mul(lhs, rhs)
    t0, t1, t2 = t[:, 0], t[:, 1], t[:, 2]
    return (F.sub(t0, t1), F.sub(t2, F.add(t0, t1)))


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


def fp6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fp2_mul(a0, b0)
    t1 = fp2_mul(a1, b1)
    t2 = fp2_mul(a2, b2)
    c0 = fp2_add(
        t0,
        fp2_mul_by_xi(
            fp2_sub(fp2_mul(fp2_add(a1, a2), fp2_add(b1, b2)), fp2_add(t1, t2))
        ),
    )
    c1 = fp2_add(
        fp2_sub(fp2_mul(fp2_add(a0, a1), fp2_add(b0, b1)), fp2_add(t0, t1)),
        fp2_mul_by_xi(t2),
    )
    c2 = fp2_add(
        fp2_sub(fp2_mul(fp2_add(a0, a2), fp2_add(b0, b2)), fp2_add(t0, t2)), t1
    )
    return (c0, c1, c2)


def fp6_mul_by_v(a):
    return (fp2_mul_by_xi(a[2]), a[0], a[1])


def fp6_inv(a):
    a0, a1, a2 = a
    c0 = fp2_sub(fp2_square(a0), fp2_mul_by_xi(fp2_mul(a1, a2)))
    c1 = fp2_sub(fp2_mul_by_xi(fp2_square(a2)), fp2_mul(a0, a1))
    c2 = fp2_sub(fp2_square(a1), fp2_mul(a0, a2))
    t = fp2_add(
        fp2_mul(a0, c0),
        fp2_mul_by_xi(fp2_add(fp2_mul(a1, c2), fp2_mul(a2, c1))),
    )
    tinv = fp2_inv(t)
    return (fp2_mul(c0, tinv), fp2_mul(c1, tinv), fp2_mul(c2, tinv))


def fp6_zero(batch):
    return (fp2_zero(batch), fp2_zero(batch), fp2_zero(batch))


def fp6_one(batch):
    return (fp2_one(batch), fp2_zero(batch), fp2_zero(batch))


# ----------------------------------------------------------------------- Fp12
def fp12_add(a, b):
    return (fp6_add(a[0], b[0]), fp6_add(a[1], b[1]))


def fp12_mul(a, b):
    t0 = fp6_mul(a[0], b[0])
    t1 = fp6_mul(a[1], b[1])
    c0 = fp6_add(t0, fp6_mul_by_v(t1))
    c1 = fp6_sub(
        fp6_mul(fp6_add(a[0], a[1]), fp6_add(b[0], b[1])), fp6_add(t0, t1)
    )
    return (c0, c1)


def fp12_square(a):
    return fp12_mul(a, a)


def fp12_conj(a):
    return (a[0], fp6_neg(a[1]))


def fp12_inv(a):
    t = fp6_inv(fp6_sub(fp6_mul(a[0], a[0]), fp6_mul_by_v(fp6_mul(a[1], a[1]))))
    return (fp6_mul(a[0], t), fp6_neg(fp6_mul(a[1], t)))


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


def _frob_fp2(a, const):
    """conj(a) * const for a host Fp2 constant."""
    return fp2_mul_const(fp2_conj(a), const[0], const[1])


def fp12_frobenius(a):
    """x -> x^p."""
    (a0, a1, a2), (b0, b1, b2) = a
    na = (
        fp2_conj(a0),
        _frob_fp2(a1, _G[2]),
        _frob_fp2(a2, _G[4]),
    )
    nb = (
        _frob_fp2(b0, _G[1]),
        _frob_fp2(b1, ht.fp2_mul(_G[1], _G[2])),
        _frob_fp2(b2, ht.fp2_mul(_G[1], _G[4])),
    )
    return (na, nb)


def fp12_frobenius2(a):
    """x -> x^(p^2): coefficients scaled by real constants (no conjugation)."""
    g = [ht.fp2_pow(_XI, k * (P * P - 1) // 6) for k in range(6)]
    (a0, a1, a2), (b0, b1, b2) = a
    na = (
        a0,
        fp2_mul_const(a1, g[2][0], g[2][1]),
        fp2_mul_const(a2, g[4][0], g[4][1]),
    )
    nb = (
        fp2_mul_const(b0, g[1][0], g[1][1]),
        fp2_mul_const(b1, ht.fp2_mul(g[1], g[2])[0], ht.fp2_mul(g[1], g[2])[1]),
        fp2_mul_const(b2, ht.fp2_mul(g[1], g[4])[0], ht.fp2_mul(g[1], g[4])[1]),
    )
    return (na, nb)
