"""Pallas TPU kernels (explicit VMEM tiling for the hot field ops).

XLA already fuses the limb arithmetic well; these kernels exist to (a) pin
memory behavior explicitly for the largest batched ops (one HBM->VMEM round
trip per block instead of trusting fusion across op boundaries) and (b)
host the round-2 kernel work (lazy column reduction, NTT butterfly stages —
DESIGN-NOTES.md).

`mont_mul_pallas(field, a, b)` is bit-identical to `field.mul` (tested in
interpret mode on CPU and against the XLA path).  Opt-in: callers choose it
explicitly; BMT_PALLAS=1 routes the NTT pointwise multiplies through it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..fields.limb import LIMB_BITS, LIMB_MASK, LimbField


def _mont_mul_block(field: LimbField, a, b, p_limbs):
    """CIOS Montgomery multiply on a (L, BLOCK) tile (same math as
    LimbField.mul, restated here so the kernel is self-contained).
    `p_limbs` is the (L, 1) modulus-limb tensor passed as a kernel input
    (pallas forbids capturing device constants)."""
    L = field.L
    batch = a.shape[1:]
    t0 = jnp.zeros((2 * L,) + batch, jnp.int32)

    def prod_body(i, t):
        ai = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
        cur = jax.lax.dynamic_slice_in_dim(t, i, L, 0)
        return jax.lax.dynamic_update_slice_in_dim(t, cur + ai * b, i, 0)

    t = jax.lax.fori_loop(0, L, prod_body, t0)
    p_rest = p_limbs[1:]

    def red_body(i, state):
        carry, t = state
        ti = jax.lax.dynamic_index_in_dim(t, i, 0, keepdims=False) + carry
        m = (ti * field.n0inv) & LIMB_MASK
        carry = (ti + m * field.p0) >> LIMB_BITS
        cur = jax.lax.dynamic_slice_in_dim(t, i + 1, L - 1, 0)
        t = jax.lax.dynamic_update_slice_in_dim(t, cur + m * p_rest, i + 1, 0)
        return carry, t

    carry, t = jax.lax.fori_loop(0, L, red_body, (jnp.zeros(batch, jnp.int32), t))
    r = t[L:].at[0].add(carry)
    # flat carry folding + normalization (no data-dependent control flow)
    zero_head = jnp.zeros_like(r[:1])
    for _ in range(4):
        c = r >> LIMB_BITS
        r = (r & LIMB_MASK) + jnp.concatenate([zero_head, c[:-1]], axis=0)
    g = r >= (1 << LIMB_BITS)
    p_ = r == LIMB_MASK
    shift = 1
    while shift < L:
        pad_g = jnp.zeros_like(g[:shift])
        pad_p = jnp.ones_like(p_[:shift])
        g = g | (p_ & jnp.concatenate([pad_g, g[:-shift]], axis=0))
        p_ = p_ & jnp.concatenate([pad_p, p_[:-shift]], axis=0)
        shift *= 2
    carry_in = jnp.concatenate(
        [jnp.zeros_like(g[:1]), g[:-1]], axis=0
    ).astype(jnp.int32)
    return (r + carry_in) & LIMB_MASK


@functools.lru_cache(maxsize=None)
def _jit_mont_mul_pallas(field: LimbField, n: int, block: int, interpret: bool):
    L = field.L

    def kernel(a_ref, b_ref, p_ref, o_ref):
        o_ref[:, :] = _mont_mul_block(
            field, a_ref[:, :], b_ref[:, :], p_ref[:, :]
        )

    grid = (n // block,)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, block), lambda i: (0, i)),
            pl.BlockSpec((L, block), lambda i: (0, i)),
            pl.BlockSpec((L, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((L, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(call)


def mont_mul_pallas(field: LimbField, a, b, block: int = 256):
    """Montgomery product on (L, N) arrays via a VMEM-blocked Pallas kernel.

    Falls back to interpret mode off-TPU (keeps CPU tests meaningful).
    """
    n = a.shape[1]
    if n % block != 0:
        block = n  # single block for small/odd sizes
    interpret = jax.default_backend() == "cpu"
    p_arr = field.p_limbs.reshape(field.L, 1)
    return _jit_mont_mul_pallas(field, n, block, interpret)(a, b, p_arr)
