"""Device (lazy-column) tower arithmetic vs the exact host tower.

CPU-fast correctness tests for the LazyCols-based Fp2/Fp6/Fp12 multiply
paths (ops/tower.py) — the substrate of the batched pairing, which itself is
TPU-gated (test_device_pairing.py).  Mirrors how the reference trusts the
`bls12_381` crate's tower tests (bellman/Cargo.toml:22).
"""

import random

import jax
import pytest

from bellman_mpc_tpu.fields import tower as ht
from bellman_mpc_tpu.fields.bls12_381 import P
from bellman_mpc_tpu.ops import tower as dt

N = 4  # batch


def _rand_fp2(rng):
    return (rng.randrange(P), rng.randrange(P))


def _rand_fp6(rng):
    return tuple(_rand_fp2(rng) for _ in range(3))


def _rand_fp12(rng):
    return (_rand_fp6(rng), _rand_fp6(rng))


def _enc12(vals):
    return dt.fp12_encode(vals)


def test_fp2_mul_many_lazy():
    rng = random.Random(101)
    pairs = [(_rand_fp2(rng), _rand_fp2(rng)) for _ in range(N)]
    # edge cases
    pairs[0] = ((0, 0), pairs[0][1])
    pairs[1] = ((P - 1, P - 1), (P - 1, P - 1))
    a = dt.fp2_encode([p[0] for p in pairs])
    b = dt.fp2_encode([p[1] for p in pairs])
    outs = jax.jit(lambda x, y: dt.fp2_mul_many([(x, y)]))(a, b)[0]
    got = dt.fp2_decode(outs)
    want = [ht.fp2_mul(x, y) for x, y in pairs]
    assert got == want


def test_fp6_mul_lazy():
    rng = random.Random(102)
    xs = [_rand_fp6(rng) for _ in range(N)]
    ys = [_rand_fp6(rng) for _ in range(N)]
    a = tuple(dt.fp2_encode([x[j] for x in xs]) for j in range(3))
    b = tuple(dt.fp2_encode([y[j] for y in ys]) for j in range(3))
    out = jax.jit(dt.fp6_mul)(a, b)
    got = [dt.fp2_decode(c) for c in out]  # per-coeff lists
    for i in range(N):
        want = ht.fp6_mul(xs[i], ys[i])
        assert tuple(got[j][i] for j in range(3)) == want


def test_fp12_mul_and_square_lazy():
    rng = random.Random(103)
    xs = [_rand_fp12(rng) for _ in range(N)]
    ys = [_rand_fp12(rng) for _ in range(N)]
    a, b = _enc12(xs), _enc12(ys)
    got = dt.fp12_decode(jax.jit(dt.fp12_mul)(a, b))
    for i in range(N):
        assert got[i] == ht.fp12_mul(xs[i], ys[i])
    got_sq = dt.fp12_decode(jax.jit(dt.fp12_square)(a))
    for i in range(N):
        assert got_sq[i] == ht.fp12_mul(xs[i], xs[i])


def test_fp12_mul_chain_stays_in_range():
    """Repeated multiplication through the lazy path (lazy-range reuse)."""
    rng = random.Random(104)
    xs = [_rand_fp12(rng) for _ in range(N)]
    a = _enc12(xs)

    @jax.jit
    def chain(x):
        y = dt.fp12_mul(x, x)
        y = dt.fp12_mul(y, x)
        return dt.fp12_square(y)

    got = dt.fp12_decode(chain(a))
    for i in range(N):
        w = ht.fp12_mul(xs[i], xs[i])
        w = ht.fp12_mul(w, xs[i])
        w = ht.fp12_mul(w, w)
        assert got[i] == w


_ONE12 = (((1, 0), (0, 0), (0, 0)), ((0, 0), (0, 0), (0, 0)))


def test_fp12_inv_and_frobenius_lazy_substrate():
    rng = random.Random(105)
    xs = [_rand_fp12(rng) for _ in range(N)]
    a = _enc12(xs)
    inv = dt.fp12_decode(jax.jit(dt.fp12_inv)(a))
    for i in range(N):
        assert ht.fp12_mul(xs[i], inv[i]) == _ONE12
    fr = dt.fp12_decode(jax.jit(dt.fp12_frobenius)(a))
    for i in range(N):
        assert fr[i] == ht.fp12_pow(xs[i], P)


def test_fp12_cyclotomic_square():
    """GS squaring == generic squaring on cyclotomic-subgroup elements."""
    rng = random.Random(106)
    xs = [_rand_fp12(rng) for _ in range(N)]
    # easy part on the host: f^((p^6-1)(p^2+1)) lands in G_{Phi6(p^2)}
    cyc = []
    for x in xs:
        f1 = ht.fp12_mul(ht.fp12_conj(x), ht.fp12_inv(x))
        cyc.append(ht.fp12_mul(ht.fp12_pow(f1, P * P), f1))
    a = _enc12(cyc)
    got = dt.fp12_decode(jax.jit(dt.fp12_cyclotomic_square)(a))
    for i in range(N):
        assert got[i] == ht.fp12_mul(cyc[i], cyc[i]), i


def test_fp12_mul_by_0bc_sparse():
    """Sparse line multiply == generic multiply by (A,0,0),(0,B,C)."""
    rng = random.Random(107)
    fs = [_rand_fp12(rng) for _ in range(N)]
    abcs = [tuple(_rand_fp2(rng) for _ in range(3)) for _ in range(N)]
    f = _enc12(fs)
    A = dt.fp2_encode([x[0] for x in abcs])
    B = dt.fp2_encode([x[1] for x in abcs])
    C = dt.fp2_encode([x[2] for x in abcs])
    got = dt.fp12_decode(jax.jit(dt.fp12_mul_by_0bc)(f, A, B, C))
    for i in range(N):
        a, b, c = abcs[i]
        sparse = ((a, (0, 0), (0, 0)), ((0, 0), b, c))
        assert got[i] == ht.fp12_mul(fs[i], sparse), i
