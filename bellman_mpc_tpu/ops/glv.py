"""GLV/GLS scalar decomposition for the BLS12-381 MSM kernels.

The MSM window fold is the batched prover's dominant cost and is
per-window-dispatch bound on TPU (DESIGN-NOTES.md), so the number of
sequential windows IS the cost model.  Endomorphism decompositions shrink
the scalar bit-length — and therefore the window count — at the price of
more (parallel, free) base lanes:

  * G1 (GLV-2): phi(x, y) = (beta*x, y) with eigenvalue
    lam = z^2 - 1 (lam^2 + lam + 1 == 0 mod r).  k = k1 + k2*lam with
    |k1|, |k2| < 2^128: windows 33 -> 18 at c=8, bases N -> 2N.
  * G2 (GLS-4): psi = untwist-Frobenius-twist with eigenvalue z
    (psi^4 - psi^2 + 1 == 0 on G2).  k = k0 + k1 z + k2 z^2 + k3 z^3 with
    |ki| <~ 2^66: windows 33 -> 11 at c=7, bases N -> 4N.

Because phi/psi are group homomorphisms, the window bucket tables of the
extended base sets are DERIVED from the original tables by coordinate maps
(one constant Fp multiply / Fp2 conjugate-multiply per entry) — no extra
bucket-chain builds.

The reference has no analog (its Pippenger is thread-parallel over full
255-bit scalars, bellman/src/multiexp.rs:159-250); this is TPU-native
redesign territory.  Decomposition correctness is pinned against the
host-oracle tests in tests/test_glv.py.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import bls12_381 as bc

P, R, Z = bc.P, bc.R, bc.X  # base-field mod, scalar-field mod, BLS parameter

Z2 = Z * Z
LAMBDA = (Z2 - 1) % R  # phi eigenvalue on G1
assert (LAMBDA * LAMBDA + LAMBDA + 1) % R == 0

# Barrett shift for the floor-variant rounding (46 * 11 — digit-aligned so
# the device decomposition can reuse the same constants).
GLV_S = 506
MU1 = (1 << GLV_S) * Z2 // R
MU2 = (1 << GLV_S) // R

# |k1|, |k2| < 2^128 for the floor variant (validated over the full carry
# range in tests); the signed-digit recode adds its own top window.
GLV_BITS = 128


def decompose_glv2(k: int) -> Tuple[int, int]:
    """k (mod r) -> (k1, k2) signed, k == k1 + k2*LAMBDA (mod r),
    |ki| < 2^128.  Floor-Barrett Babai rounding on the lattice basis
    v1 = (z^2-1, -1), v2 = (1, z^2); matches the device decomposition
    bit-for-bit (same mu/shift)."""
    k %= R
    c1 = (k * MU1) >> GLV_S
    c2 = (k * MU2) >> GLV_S
    k1 = k - c1 * (Z2 - 1) - c2
    k2 = c1 - c2 * Z2
    return k1, k2


# ------------------------------------------------------------------- G2 GLS-4
# psi eigenvalue on the r-torsion is p === z (mod r); z^4 - z^2 + 1 = r == 0.
assert (Z ** 4 - Z ** 2 + 1) == R
ABS_Z = -Z  # z < 0 for BLS12-381

# Babai basis for the rank-4 lattice {(a,b,c,d): a + bz + cz^2 + dz^3 == 0
# mod r}: rows v1..v4 (integer, norms ~|z|).
_GLS_BASIS = np.array(
    [
        [Z, -1, 0, 0],
        [0, Z, -1, 0],
        [0, 0, Z, -1],
        [1, 0, -1, Z],
    ],
    dtype=object,
)
# adjugate / r gives B^{-1}; precompute adj rows exactly with bigints.
def _adjugate4(M):
    import itertools

    n = 4
    C = [[0] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            rows = [r_ for r_ in range(n) if r_ != i]
            cols = [c_ for c_ in range(n) if c_ != j]
            m = [[M[r_][c_] for c_ in cols] for r_ in rows]
            det3 = (
                m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
            )
            C[i][j] = (-1) ** (i + j) * det3
    # adj = C^T
    return [[C[j][i] for j in range(n)] for i in range(n)]


_GLS_ADJ = _adjugate4([[int(x) for x in row] for row in _GLS_BASIS])
_GLS_DET = (
    _GLS_BASIS[0][0] * _GLS_ADJ[0][0]
    + _GLS_BASIS[0][1] * _GLS_ADJ[1][0]
    + _GLS_BASIS[0][2] * _GLS_ADJ[2][0]
    + _GLS_BASIS[0][3] * _GLS_ADJ[3][0]
)
assert abs(int(_GLS_DET)) == R, "GLS lattice determinant must be +-r"

GLS_BITS = 67  # |ki| < 2^67 (validated in tests; |z| ~ 2^63.9, Babai slack)


def decompose_gls4(k: int) -> Tuple[int, int, int, int]:
    """k (mod r) -> (k0, k1, k2, k3) signed with
    k == k0 + k1*z + k2*z^2 + k3*z^3 (mod r) and |ki| < 2^GLS_BITS."""
    k %= R
    det = int(_GLS_DET)
    # target vector (k, 0, 0, 0); c = round((k,0,0,0) @ B^{-1})
    cs = []
    for j in range(4):
        num = k * _GLS_ADJ[0][j]
        # round(num / det) with signed det
        if det < 0:
            num, d = -num, -det
        else:
            d = det
        cs.append((num + (d // 2)) // d)
    out = [k, 0, 0, 0]
    for j in range(4):
        for t in range(4):
            out[t] -= cs[j] * int(_GLS_BASIS[j][t])
    return tuple(out)


def gls4_eigen_check(k: int) -> bool:
    k0, k1, k2, k3 = decompose_gls4(k)
    return (k0 + k1 * Z + k2 * Z * Z + k3 * Z ** 3 - k) % R == 0


# -------------------------------------------------------- endomorphism consts
@functools.lru_cache(maxsize=None)
def beta_g1() -> int:
    """Cube root of unity in Fp with (beta*x, y) == [LAMBDA](x, y) on G1."""
    from ..curves import host as chost

    g = chost.G1.generator
    target = chost.G1.mul(g, LAMBDA)
    for base in range(2, 12):
        b = pow(base, (P - 1) // 3, P)
        if b == 1:
            continue
        for cand in (b, b * b % P):
            if chost.G1.eq((cand * g[0] % P, g[1]), target):
                return cand
    raise AssertionError("no beta matches lambda")


@functools.lru_cache(maxsize=None)
def psi_constants() -> Tuple[tuple, tuple]:
    """(c_x, c_y) in Fp2 with psi(x, y) = (c_x * conj(x), c_y * conj(y))
    on the twist, where psi has eigenvalue z on G2's r-torsion.

    c_x = 1 / xi^((p-1)/3), c_y = 1 / xi^((p-1)/2) for the twist
    y^2 = x^3 + 4*xi with xi = 1 + u; conj is the Fp2 Frobenius.  The pair
    is validated against [z]G2 at import of the table layer (tests)."""
    from ..fields import tower as ht

    xi = (1, 1)
    cx = ht.fp2_inv(ht.fp2_pow(xi, (P - 1) // 3))
    cy = ht.fp2_inv(ht.fp2_pow(xi, (P - 1) // 2))
    return cx, cy


def psi_host(pt):
    """psi on a host affine G2 point ((x0,x1),(y0,y1)) (None passes)."""
    if pt is None:
        return None
    from ..fields import tower as ht

    cx, cy = psi_constants()
    (x, y) = pt
    xbar = (x[0], P - x[1] if x[1] else 0)
    ybar = (y[0], P - y[1] if y[1] else 0)
    return (ht.fp2_mul(cx, xbar), ht.fp2_mul(cy, ybar))


def phi_host(pt):
    """phi on a host affine G1 point (x, y) (None passes)."""
    if pt is None:
        return None
    b = beta_g1()
    return (b * pt[0] % P, pt[1])


# ----------------------------------------------------- device decomposition
# The h-query scalars are computed ON DEVICE (the NTT pipeline) and never
# visit the host, so the GLV split runs on device too: exact integer digit
# arithmetic on the same 11-bit limb vectors the field engine uses.

GLV_NBITS = 130  # mag bits fed to the window digitizer (|ki| < 2^128)
_DIGIT_BITS = 11
_DIGIT_MASK = (1 << _DIGIT_BITS) - 1
_S_DIG = GLV_S // _DIGIT_BITS  # 46 (GLV_S is digit-aligned)
_MAG_DIGS = 13  # 13 * 11 = 143 bits >= GLV_NBITS
_OFF_DIG = _MAG_DIGS  # OFF = 2^(11*13) = 2^143 > 2^129 >= |ki| + slack


def _const_digits(c: int) -> List[int]:
    out = []
    while c:
        out.append(c & _DIGIT_MASK)
        c >>= _DIGIT_BITS
    return out or [0]


@functools.lru_cache(maxsize=None)
def _digit_mul_matrix(const: int, n_in: int):
    """(n_out, n_in) int32 W with W[i+j, i] = digit_j(const): cols = W @ k
    are the (unnormalized) product columns of k * const.  Column bound:
    n_in * 2^22 < 2^27 — int32-exact."""
    import jax.numpy as jnp

    digs = _const_digits(const)
    n_out = n_in + len(digs)
    W = np.zeros((n_out, n_in), np.int32)
    for i in range(n_in):
        for j, dv in enumerate(digs):
            W[i + j, i] = dv
    # cached as NUMPY: a first call inside a jit trace must not cache a
    # traced device constant (same gotcha as fields/rns.kp_table)
    return W, n_out


def _mul_const_digits(digits, const: int):
    """(D, *B) canonical digits -> (D + len(const digits), *B) product
    columns of value * const (ONE constant int32 matmul)."""
    import jax

    W, n_out = _digit_mul_matrix(const, digits.shape[0])
    flat = digits.reshape(digits.shape[0], -1)
    cols = jax.lax.dot_general(
        jnp.asarray(W), flat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return cols.reshape((n_out,) + digits.shape[1:])


def _normalize_digits(cols):
    """Exact carry normalization of signed int32 columns to canonical
    11-bit digits (one lax.scan over the digit axis; arithmetic >> gives
    floor division so negative columns borrow correctly).  The represented
    value must be non-negative and fit the column count."""
    import jax

    def body(carry, c):
        v = c + carry
        return v >> _DIGIT_BITS, v & _DIGIT_MASK

    carry, digs = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols)
    return digs


def _pad_digits(d, n):
    if d.shape[0] >= n:
        return d[:n]
    return jnp.concatenate(
        [d, jnp.zeros((n - d.shape[0],) + d.shape[1:], d.dtype)], axis=0
    )


def decompose_glv2_device(std_digits):
    """(L, *B) canonical 11-bit digits of k (< r, standard form) ->
    (neg1, mag1, neg2, mag2): neg* bool (*B); mag* (13, *B) digits of |ki|.

    Mirrors `decompose_glv2` exactly (same floor-Barrett constants), so
    host and device decompositions agree bit-for-bit."""
    batch = std_digits.shape[1:]

    # c1 = (k * MU1) >> 2^506 ; c2 = (k * MU2) >> 2^506 (c2 in {0, 1})
    d1 = _normalize_digits(_mul_const_digits(std_digits, MU1))
    c1 = d1[_S_DIG : _S_DIG + _MAG_DIGS]  # (13, *B)
    d2 = _normalize_digits(_mul_const_digits(std_digits, MU2))
    c2 = d2[_S_DIG]  # (*B) in {0, 1}

    # t = c1 * (Z2 - 1) + c2 ; k1 = k - t  (signed, |k1| < 2^128)
    t_cols = _mul_const_digits(c1, Z2 - 1)
    t_cols = t_cols.at[0].add(c2)
    n_d = max(std_digits.shape[0], t_cols.shape[0]) + 2
    acc = _pad_digits(std_digits, n_d) - _pad_digits(t_cols, n_d)
    acc = acc.at[_OFF_DIG].add(1)  # + OFF = 2^143
    k1d = _normalize_digits(acc)  # value = OFF + k1 in (OFF-2^128, OFF+2^128)

    # k2 = c1 - c2 * Z2
    z2d = _const_digits(Z2)
    t2 = c2[None] * jnp.asarray(z2d, jnp.int32).reshape(
        (len(z2d),) + (1,) * len(batch)
    )
    acc2 = _pad_digits(c1, n_d) - _pad_digits(t2, n_d)
    acc2 = acc2.at[_OFF_DIG].add(1)
    k2d = _normalize_digits(acc2)

    def split(kd):
        pos = kd[_OFF_DIG] == 1  # OFF survived => value >= OFF => ki >= 0
        mag_pos = kd[:_MAG_DIGS]
        # |ki| = OFF - v when negative: normalize(OFF_digits - v_digits)
        negcols = -kd
        negcols = negcols.at[_OFF_DIG].add(1)
        mag_neg = _normalize_digits(negcols)[:_MAG_DIGS]
        mag = jnp.where(pos[None], mag_pos, mag_neg)
        return jnp.logical_not(pos), mag

    neg1, mag1 = split(k1d)
    neg2, mag2 = split(k2d)
    return neg1, mag1, neg2, mag2


def digits_to_bits_msb(mag, nbits: int = GLV_NBITS):
    """(D, *B) 11-bit digits -> (nbits, *B) bits, MSB first."""
    shifts = jnp.arange(_DIGIT_BITS, dtype=jnp.int32).reshape(
        (1, _DIGIT_BITS) + (1,) * (mag.ndim - 1)
    )
    bits = (mag[:, None] >> shifts) & 1
    flat = bits.reshape((mag.shape[0] * _DIGIT_BITS,) + mag.shape[1:])
    return flat[nbits - 1 :: -1]


# ------------------------------------------------------- GLS-4 device (G2)
GLS_NBITS = 66  # |ki| < 2^64 for the floor variant (validated in tests)
_GLS_MAG_DIGS = 7  # 7 * 11 = 77 bits
_GLS_OFF_DIG = _GLS_MAG_DIGS  # OFF = 2^77 > 2^64 + slack

# floor-Barrett constants: c_j = sgn_j * ((k * MU_j) >> GLV_S)
_GLS_MUS = tuple(
    ((1 << GLV_S) * abs(int(_GLS_ADJ[0][j]))) // R for j in range(4)
)
_GLS_SGN = tuple(1 if int(_GLS_ADJ[0][j]) >= 0 else -1 for j in range(4))
# c_j magnitude digit counts: |c_j| <= k * |adj0_j| / r < 2^(|adj0_j| bits)
_GLS_C_DIGS = tuple(
    -(-(abs(int(_GLS_ADJ[0][j])).bit_length() + 1) // _DIGIT_BITS)
    for j in range(4)
)


def decompose_gls4_device(std_digits):
    """(L, *B) canonical digits of k (< r) -> (neg, mag): neg bool
    (4, *B); mag (4, 7, *B) digits of |ki| with
    k == sum_j ki * z^j (mod r), |ki| < 2^64.

    Floor-Barrett Babai on the quartic psi-lattice (same constants as the
    host floor variant validated in tests/test_glv.py)."""
    batch = std_digits.shape[1:]
    basis = [[int(x) for x in row] for row in _GLS_BASIS]

    cs = []  # (digits, sign) per j; c_j >= 0 digits, global sign applied
    for j in range(4):
        if _GLS_MUS[j] == 0:
            cs.append(None)
            continue
        d = _normalize_digits(_mul_const_digits(std_digits, _GLS_MUS[j]))
        cs.append(d[_S_DIG : _S_DIG + _GLS_C_DIGS[j]])

    n_d = std_digits.shape[0] + max(_GLS_C_DIGS) + 8
    negs, mags = [], []
    for t in range(4):
        acc = _pad_digits(
            std_digits if t == 0 else jnp.zeros_like(std_digits), n_d
        )
        for j in range(4):
            b_jt = basis[j][t]
            if b_jt == 0 or cs[j] is None:
                continue
            # out_t -= c_j * b_jt  with c_j = sgn_j * cs[j]
            term = _mul_const_digits(cs[j], abs(b_jt))
            sign = -_GLS_SGN[j] * (1 if b_jt >= 0 else -1)
            acc = acc + sign * _pad_digits(term, n_d)
        acc = acc.at[_GLS_OFF_DIG].add(1)  # + OFF = 2^77
        kd = _normalize_digits(acc)
        pos = kd[_GLS_OFF_DIG] == 1
        mag_pos = kd[:_GLS_MAG_DIGS]
        negcols = -kd
        negcols = negcols.at[_GLS_OFF_DIG].add(1)
        mag_neg = _normalize_digits(negcols)[:_GLS_MAG_DIGS]
        mags.append(jnp.where(pos[None], mag_pos, mag_neg))
        negs.append(jnp.logical_not(pos))
    return jnp.stack(negs, axis=0), jnp.stack(mags, axis=0)
