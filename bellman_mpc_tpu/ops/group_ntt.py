"""Radix-2 NTT over GROUP ELEMENTS (curve points).

The reference's EvaluationDomain is generic over a `Group` trait with both
Scalar and Point instances (bellman/src/domain.rs:192-259) — upstream uses
the Point instance nowhere, but a SOUND trusted-setup ceremony needs it:
converting the phase-1 power-basis points {tau^i * G} into Lagrange-basis
points {L_j(tau) * G} is a group iFFT, the transform the real Groth16
generator performs on scalars (generator.rs:400-402) lifted to the curve
because nobody may know tau itself.

Butterflies are the scalar NTT's (ops/domain.py:ntt) with point add/sub and
a per-position twiddle scalar multiplication: each stage runs ONE branchless
double-and-add ladder at n/2 lanes (the twiddle bit matrix is a host-side
constant, so dead high bits cost nothing — ladder length = the stage's
maximal twiddle bit length).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..curves.device import Point, point_add, scalar_mul_bits
from ..fields.host import PrimeField
from .domain import _bitrev_indices


def point_neg(ops, p: Point) -> Point:
    return (p[0], ops.neg(p[1]), p[2])


def point_sub(ops, p: Point, q: Point) -> Point:
    return point_add(ops, p, point_neg(ops, q))


@functools.lru_cache(maxsize=None)
def _stage_twiddle_bits(host: PrimeField, exp: int, inverse: bool):
    """Host-constant twiddle bit matrices per stage: (nbits_s, half_s)."""
    n = 1 << exp
    omega = host.nth_root_of_unity(exp)
    if inverse:
        omega = host.inv(omega)
    stages = []
    for s in range(1, exp + 1):
        half = 1 << (s - 1)
        step = n >> s
        tws = [pow(omega, step * j, host.p) for j in range(half)]
        nbits = max(max(t.bit_length() for t in tws), 1)
        bits = np.zeros((nbits, half), np.int32)
        for j, t in enumerate(tws):
            for b in range(nbits):
                bits[b, j] = (t >> (nbits - 1 - b)) & 1  # MSB first
        stages.append(jnp.asarray(bits))
    return tuple(stages)


def group_ntt(
    ops, host: PrimeField, p: Point, inverse: bool = False
) -> Point:
    """NTT over the trailing axis of an (L, [2,] n) point tuple.

    Pure traced function — call inside jit.  `inverse` applies omega^{-1}
    twiddles and the final 1/n point scaling (ifft semantics).
    """
    n = p[0].shape[-1]
    exp = n.bit_length() - 1
    assert 1 << exp == n
    if n == 1:
        return p
    rev = jnp.asarray(_bitrev_indices(n))
    p = tuple(jnp.take(x, rev, axis=-1) for x in p)
    tws = _stage_twiddle_bits(host, exp, inverse)
    for s in range(1, exp + 1):
        m = 1 << s
        half = m >> 1
        xr = tuple(x.reshape(x.shape[:-1] + (n // m, m)) for x in p)
        u = tuple(x[..., :half] for x in xr)
        v = tuple(x[..., half:] for x in xr)
        bits = jnp.broadcast_to(
            tws[s - 1][:, None, :], (tws[s - 1].shape[0], n // m, half)
        )
        tv = scalar_mul_bits(ops, v, bits)
        hi = point_add(ops, u, tv)
        lo = point_sub(ops, u, tv)
        p = tuple(
            jnp.concatenate([a, b], axis=-1).reshape(a.shape[:-2] + (n,))
            for a, b in zip(hi, lo)
        )
    if inverse:
        n_inv = host.inv(n)
        nbits = n_inv.bit_length()
        bits = np.asarray(
            [(n_inv >> (nbits - 1 - b)) & 1 for b in range(nbits)], np.int32
        )
        inv_bits = jnp.broadcast_to(jnp.asarray(bits)[:, None], (nbits, n))
        p = scalar_mul_bits(ops, p, inv_bits)
    return p
