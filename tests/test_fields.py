"""Limb-engine field arithmetic vs exact host bigints.

The device substrate is validated against pure-Python modular arithmetic for
every instantiated field (mock 64513, BLS12-381 Fr and Fp), mirroring how the
reference trusts `ff`'s test-suite for its field layer.
"""

import random

import numpy as np
import pytest

from bellman_mpc_tpu.fields.bls12_381 import fp, fp_host, fr, fr_host
from bellman_mpc_tpu.fields.mock import mock, mock_host

FIELDS = [(mock, mock_host), (fr, fr_host), (fp, fp_host)]
IDS = ["mock64513", "fr255", "fp381"]


@pytest.fixture(params=FIELDS, ids=IDS)
def field_pair(request):
    return request.param


def rand_elems(p, n, seed):
    rng = random.Random(seed)
    # include edge cases 0, 1, p-1
    base = [0, 1, p - 1, p // 2]
    return base + [rng.randrange(p) for _ in range(n - len(base))]


def test_codec_roundtrip(field_pair):
    f, host = field_pair
    vals = rand_elems(host.p, 32, 1)
    arr = f.encode(vals, mont=True)
    assert arr.shape == (f.L, len(vals))
    back = f.decode(arr, mont=True)
    assert back == [v % host.p for v in vals]


def test_add_sub_neg(field_pair):
    f, host = field_pair
    a_vals = rand_elems(host.p, 64, 2)
    b_vals = rand_elems(host.p, 64, 3)
    a = f.encode(a_vals)
    b = f.encode(b_vals)
    assert f.decode(f.add(a, b)) == [(x + y) % host.p for x, y in zip(a_vals, b_vals)]
    assert f.decode(f.sub(a, b)) == [(x - y) % host.p for x, y in zip(a_vals, b_vals)]
    assert f.decode(f.neg(a)) == [(-x) % host.p for x in a_vals]


def test_mul(field_pair):
    f, host = field_pair
    a_vals = rand_elems(host.p, 64, 4)
    b_vals = rand_elems(host.p, 64, 5)
    a = f.encode(a_vals)
    b = f.encode(b_vals)
    assert f.decode(f.mul(a, b)) == [(x * y) % host.p for x, y in zip(a_vals, b_vals)]


def test_mul_chain_stays_in_range(field_pair):
    """Repeated lazy-range ops never corrupt values (range invariant)."""
    f, host = field_pair
    vals = rand_elems(host.p, 16, 6)
    a = f.encode(vals)
    acc = a
    expect = list(vals)
    for i in range(5):
        acc = f.mul(f.add(acc, a), acc)
        expect = [((e + v) * e) % host.p for e, v in zip(expect, vals)]
    assert f.decode(acc) == expect


def test_pow_inv(field_pair):
    f, host = field_pair
    vals = [v for v in rand_elems(host.p, 20, 7) if v % host.p != 0]
    a = f.encode(vals)
    e = 12345
    assert f.decode(f.pow_const(a, e)) == [pow(v, e, host.p) for v in vals]
    assert f.decode(f.inv(a)) == [pow(v, host.p - 2, host.p) for v in vals]


def test_eq_iszero_select(field_pair):
    f, host = field_pair
    a = f.encode([0, 5, host.p - 1, 7])
    b = f.encode([0, 5, 3, 9])
    assert list(np.asarray(f.eq(a, b))) == [True, True, False, False]
    assert list(np.asarray(f.is_zero(a))) == [True, False, False, False]
    sel = f.select(np.asarray([True, False, True, False]), a, b)
    assert f.decode(sel) == [0, 5, host.p - 1, 9]


def test_mul_const_and_conversions(field_pair):
    f, host = field_pair
    vals = rand_elems(host.p, 16, 8)
    a = f.encode(vals)
    assert f.decode(f.mul_const(a, 12)) == [v * 12 % host.p for v in vals]
    std = f.encode(vals, mont=False)
    assert f.decode(f.to_mont(std), mont=True) == [v % host.p for v in vals]


def test_batch_shapes(field_pair):
    """Ops broadcast over arbitrary trailing batch shapes."""
    f, host = field_pair
    vals = rand_elems(host.p, 12, 9)
    a = f.encode(vals).reshape(f.L, 3, 4)
    b = f.encode(vals[::-1]).reshape(f.L, 3, 4)
    out = f.mul(a, b)
    assert out.shape == (f.L, 3, 4)
    got = f.decode(out.reshape(f.L, 12))
    want = [x * y % host.p for x, y in zip(vals, vals[::-1])]
    assert got == want


# ------------------------------------------------------------ lazy columns
def test_lazy_mul_single(field_pair):
    """One lazy product + reduce == the fused Montgomery multiply."""
    f, host = field_pair
    xs = rand_elems(host.p, 16, 7)
    ys = rand_elems(host.p, 16, 8)
    a = f.encode(xs)
    b = f.encode(ys)
    (lc,) = f.lazy_mul_many([(a, b)])
    got = f.decode(lc.reduce())
    assert got == [x * y % host.p for x, y in zip(xs, ys)]


def test_lazy_accumulate_products(field_pair):
    """sum of k products reduced ONCE == host algebra, k up to headroom."""
    f, host = field_pair
    p = host.p
    rng = random.Random(11)
    for k in (2, 4, 8):
        xs = [[rng.randrange(p) for _ in range(8)] for _ in range(k)]
        ys = [[rng.randrange(p) for _ in range(8)] for _ in range(k)]
        prods = f.lazy_mul_many(
            [(f.encode(x), f.encode(y)) for x, y in zip(xs, ys)]
        )
        acc = prods[0]
        for t in prods[1:]:
            acc = acc + t
        got = f.decode(acc.reduce())
        want = [
            sum(x[i] * y[i] for x, y in zip(xs, ys)) % p for i in range(8)
        ]
        assert got == want


def test_lazy_subtraction_chain(field_pair):
    """a*b - c*d - e*g  (Karatsuba-shaped combine) reduced once."""
    f, host = field_pair
    p = host.p
    rng = random.Random(13)
    vals = [[rng.randrange(p) for _ in range(8)] for _ in range(6)]
    ta, tb, tc = f.lazy_mul_many(
        [
            (f.encode(vals[0]), f.encode(vals[1])),
            (f.encode(vals[2]), f.encode(vals[3])),
            (f.encode(vals[4]), f.encode(vals[5])),
        ]
    )
    got = f.decode((ta - tb - tc).reduce())
    want = [
        (vals[0][i] * vals[1][i] - vals[2][i] * vals[3][i]
         - vals[4][i] * vals[5][i]) % p
        for i in range(8)
    ]
    assert got == want


def test_lazy_digit_sum_operands(field_pair):
    """Raw digit-wise operand sums (no carry pass) with declared bounds."""
    f, host = field_pair
    p = host.p
    rng = random.Random(17)
    x0 = [rng.randrange(p) for _ in range(8)]
    x1 = [rng.randrange(p) for _ in range(8)]
    y = [rng.randrange(p) for _ in range(8)]
    a0, a1, b = f.encode(x0), f.encode(x1), f.encode(y)
    d2 = tuple(2 * d for d in f._dmax_lazy)
    (lc,) = f.lazy_mul_many([(a0 + a1, b)], [(d2, f._dmax_lazy)])
    got = f.decode(lc.reduce())
    want = [(x0[i] + x1[i]) * y[i] % p for i in range(8)]
    assert got == want


def test_lazy_scale_and_reduce_many(field_pair):
    """3*(a*b) + c*d via scale; stacked reduction of several outputs."""
    f, host = field_pair
    p = host.p
    rng = random.Random(19)
    vals = [[rng.randrange(p) for _ in range(8)] for _ in range(4)]
    t0, t1 = f.lazy_mul_many(
        [
            (f.encode(vals[0]), f.encode(vals[1])),
            (f.encode(vals[2]), f.encode(vals[3])),
        ]
    )
    outs = f.lazy_reduce_many([3 * t0 + t1, t1 - t0])
    got0, got1 = f.decode(outs[0]), f.decode(outs[1])
    assert got0 == [
        (3 * vals[0][i] * vals[1][i] + vals[2][i] * vals[3][i]) % p
        for i in range(8)
    ]
    assert got1 == [
        (vals[2][i] * vals[3][i] - vals[0][i] * vals[1][i]) % p
        for i in range(8)
    ]
