"""Pallas TPU kernels (explicit VMEM tiling for the hot field ops).

XLA already fuses the limb arithmetic well; these kernels exist to (a) pin
memory behavior explicitly for the largest batched ops (one HBM->VMEM round
trip per block instead of trusting fusion across op boundaries) and (b)
host the round-2 kernel work (lazy column reduction, NTT butterfly stages —
DESIGN-NOTES.md).

`mont_mul_pallas(field, a, b)` is bit-identical to `field.mul` (tested in
interpret mode on CPU and against the XLA path).  Opt-in: callers choose it
explicitly; BMT_PALLAS=1 routes the h-pipeline's coset pointwise product
(the largest single multiply of the prover's NTT pipeline) through it —
see groth16/prover._h_pipeline.  The flag is read when the pipeline is
first built (a process-level config, like the carry-strategy selection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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


_RNS_PAD_B = 40   # B channels at padded rows [0, 40) (35 real + 5 pad)
_RNS_PAD_C = 80   # Hi = B' + m_r at padded rows [40, 80) (36 real + 4 pad)


@functools.lru_cache(maxsize=None)
def _rns_pallas_consts(f):
    """Aligned-layout constants for the Pallas RNS multiply.

    Mosaic only lowers sublane slices at 8-aligned offsets, so the kernel
    works in a PADDED channel layout: B channels at rows [0,35)+pad to 40,
    B' at [40,75), m_r at 75, pad to 80 — every block slice is [0:40] /
    [40:80].  Padded rows carry modulus 1 (their residues stay 0 through
    every stage).  Returns numpy arrays only (safe to build inside jit)."""
    import numpy as np

    k = f.k  # 35
    n_tg = k + 1  # 36
    PB, PC = _RNS_PAD_B, _RNS_PAD_C
    rows = np.concatenate(
        [np.arange(k), PB + np.arange(k + 1)]
    )  # orig channel -> padded row

    def pad_rows(vals, where):
        out = np.zeros((PC,), np.int64)
        out[where] = vals
        return out

    m_pad = np.ones((PC,), np.int64)
    m_pad[rows] = np.asarray(f.moduli, np.int64)
    inv_pad = (1.0 / m_pad.astype(np.float64)).astype(np.float32)
    kappa_pad = pad_rows(np.asarray(f.kappa_np[:k], np.int64), np.arange(k))
    # Hi-local (40-row) constants: B' at 0..34, m_r at 35
    minv_hi = np.zeros((PB,), np.int64)
    minv_hi[:k] = np.asarray(f.minv_np[k : 2 * k], np.int64)
    minv_hi[k] = f.minv_np[2 * k]
    ifac2_hi = np.zeros((PB,), np.int64)
    ifac2_hi[:k] = np.asarray(f.ifac2_np[k : 2 * k], np.int64)
    mp_mod_b = np.zeros((PB,), np.int64)
    mp_mod_b[:k] = np.asarray(f.mp_mod_np[:k], np.int64)
    m_hi = m_pad[PB:]
    inv_hi = inv_pad[PB:]
    m_b = m_pad[:PB]
    inv_b = inv_pad[:PB]
    # ext2's target block is [B (35), m_r, pad...]: row 35 reduces mod m_r
    m_e2 = m_b.copy()
    m_e2[k] = f.mr
    inv_e2 = (1.0 / m_e2.astype(np.float64)).astype(np.float32)

    def blocks(Wl, Wh, src_rows, n_src_dim):
        """(3*PB, 2*n_src_dim) int8 block matrix in the padded layout."""
        W = np.zeros((3 * PB, 2 * n_src_dim), np.int8)
        for t in range(Wl.shape[0]):
            for i in range(Wl.shape[1]):
                src = src_rows[i]
                W[t, src] = Wl[t, i]
                W[PB + t, src] = Wh[t, i]
                W[PB + t, n_src_dim + src] = Wl[t, i]
                W[2 * PB + t, n_src_dim + src] = Wh[t, i]
        return W

    W1l = np.asarray(f.W1_np[:n_tg, :k])
    W1h = np.asarray(f.W1_np[n_tg : 2 * n_tg, :k])
    # ext1 sources: xi rows = padded B rows [0..35)
    W1p = blocks(W1l, W1h, np.arange(k), PC)
    W2l = np.asarray(f.W2_np[:n_tg, :k])
    W2h = np.asarray(f.W2_np[n_tg : 2 * n_tg, :k])
    # ext2 sources: xi2 rows = Hi-local rows [0..35) of a 40-row block
    W2p = blocks(W2l, W2h, np.arange(k), PB)
    onehot_mr = np.zeros((PB,), np.int64)
    onehot_mr[k] = 1  # m_r at Hi-local row 35

    def col(a, dt=np.int32):
        return np.asarray(a, dt).reshape(-1, 1)

    return (
        col(m_pad), inv_pad.reshape(-1, 1), col(kappa_pad),
        col(minv_hi), col(ifac2_hi), col(mp_mod_b),
        col(m_hi), inv_hi.reshape(-1, 1), col(m_b), inv_b.reshape(-1, 1),
        col(m_e2), inv_e2.reshape(-1, 1),
        col(onehot_mr), W1p, W2p,
        rows.astype(np.int32),
    )


def _rns_mul_block(f, x, y, consts):
    """One RNS Montgomery multiply on a padded (80, T) tile — the same math
    as RnsField.mul_many restated tile-locally so every barrett stage stays
    in VMEM (the XLA form materializes ~0.5 GB of intermediates per fold
    window at bench shapes — the round-5 fold profile's bottleneck).

    The channelwise arithmetic runs in f32: residues are < 2^12 and every
    product/recombination stays < 2^24, so f32 FMA (the VPU's native fast
    path) is EXACT, while int32 multiplies are multi-pass emulations.
    Integers appear only at the int8 matmul boundary and the output."""
    (m_pad, inv_pad, kappa, minv_hi, ifac2_hi, mp_mod_b,
     m_hi, inv_hi, m_b, inv_b, m_e2, inv_e2, onehot_mr, W1p, W2p) = consts
    PB = _RNS_PAD_B

    def fbar(t, mm, ii):
        # exact for 0 <= t < 2^24 (f32-representable, reciprocal error < 1)
        q = jnp.floor(t * ii)
        r = t - q * mm
        r = jnp.where(r < 0, r + mm, r)
        return jnp.where(r >= mm, r - mm, r)

    mf = m_pad.astype(jnp.float32)
    mf_hi = m_hi.astype(jnp.float32)
    mf_b = m_b.astype(jnp.float32)
    mf_e2 = m_e2.astype(jnp.float32)

    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    t = fbar(xf * yf, mf, inv_pad)
    xi = fbar(t * kappa.astype(jnp.float32), mf, inv_pad)

    def ext(src_f, W8, mmf, ii):
        src = src_f.astype(jnp.int32)
        lo = (src & 63).astype(jnp.int8)
        hi = (src >> 6).astype(jnp.int8)
        x2 = jnp.concatenate([lo, hi], axis=0)
        out = jax.lax.dot_general(
            W8, x2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (3*PB, T); block sums < 2^18.2
        ll = out[:PB].astype(jnp.float32)
        mid = out[PB : 2 * PB].astype(jnp.float32)
        hh = out[2 * PB :].astype(jnp.float32)
        h = fbar(hh * 64.0 + mid, mmf, ii)
        return fbar(h * 64.0 + ll, mmf, ii)

    qp = ext(xi, W1p, mf_hi, inv_hi)  # (40, T) Hi-local layout
    t_hi = t[PB:]
    sv = t_hi + qp
    sv = jnp.where(sv >= mf_hi, sv - mf_hi, sv)
    rp = fbar(sv * minv_hi.astype(jnp.float32), mf_hi, inv_hi)
    xi2 = fbar(rp * ifac2_hi.astype(jnp.float32), mf_hi, inv_hi)
    ext2 = ext(xi2, W2p, mf_e2, inv_e2)  # (40, T) B-local + m_r at row 35
    d = jnp.sum(onehot_mr.astype(jnp.float32) * (ext2 - rp), axis=0,
                keepdims=True)
    d = jnp.where(d < 0, d + np.float32(f.mr), d)
    mr_m = jnp.full((1, 1), np.float32(f.mr), jnp.float32)
    mr_i = jnp.full((1, 1), np.float32(1.0 / np.float64(f.mr)), jnp.float32)
    alpha = fbar(d * np.float32(f.mpinv_mr), mr_m, mr_i)  # (1, T)
    corr = fbar(alpha * mp_mod_b.astype(jnp.float32), mf_b, inv_b)
    rB = ext2 - corr
    rB = jnp.where(rB < 0, rB + mf_b, rB)
    rB = jnp.where(onehot_mr == 1, 0.0, rB)
    return jnp.concatenate([rB, rp], axis=0).astype(jnp.int32)  # (80, T)


@functools.lru_cache(maxsize=None)
def _jit_rns_mul_pallas(f, n: int, block: int, interpret: bool):
    consts_np = _rns_pallas_consts(f)
    row_map = consts_np[-1]
    kernel_consts = consts_np[:-1]
    PC = _RNS_PAD_C

    def kernel(x_ref, y_ref, *rest):
        o_ref = rest[-1]
        consts = tuple(r[:, :] for r in rest[:-1])
        o_ref[:, :] = _rns_mul_block(f, x_ref[:, :], y_ref[:, :], consts)

    grid = (n // block,)
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0, 0)) for c in kernel_consts
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((PC, block), lambda i: (0, i)),
            pl.BlockSpec((PC, block), lambda i: (0, i)),
        ] + const_specs,
        out_specs=pl.BlockSpec((PC, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((PC, n), jnp.int32),
        interpret=interpret,
    )

    def run(xf, yf):
        # pad to the aligned layout outside the kernel (cheap XLA scatter)
        rm = jnp.asarray(row_map)
        xp = jnp.zeros((PC, xf.shape[1]), jnp.int32).at[rm].set(xf)
        yp = jnp.zeros((PC, yf.shape[1]), jnp.int32).at[rm].set(yf)
        out = call(xp, yp, *kernel_consts)
        return out[rm]

    return run


def rns_mul_many_pallas(f, xs, ys, block: int = 512):
    """Stacked RNS Montgomery multiply via a VMEM-tiled Pallas kernel.

    xs, ys: (C, *S) canonical int32 residues (any batch shape; flattened to
    lanes internally).  Bit-identical to RnsField.mul_many's residue math
    (same barrett formulation; validated in tests/test_pallas.py and on
    chip).  Lane counts not divisible by `block` fall back to one block.
    """
    shape = xs.shape
    n = 1
    for s in shape[1:]:
        n *= s
    xf = xs.reshape(f.C, n)
    yf = ys.reshape(f.C, n)
    if n % block != 0:
        block = n
    interpret = jax.default_backend() == "cpu"
    out = _jit_rns_mul_pallas(f, n, block, interpret)(xf, yf)
    return out.reshape(shape)


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


# ------------------------------------------------- whole-mixed-add kernel
# The fold profile (round 5, in-program): one window's complete RNS mixed
# addition costs ~1.44 ms at (B=16, N=1024) — bandwidth-bound on ~0.5 GB of
# XLA-materialized intermediates, while the essential traffic (accumulator
# in/out + gathered table points) is ~40 MB.  This kernel runs the ENTIRE
# point_add_mixed (sign select, 11 RNS multiplies, bound-checked adds/subs,
# identity select) on VMEM tiles: the intermediates never touch HBM.

from fractions import Fraction as _Fr


class _PadShimField:
    """RnsField facade over the 80-row aligned layout, usable both inside a
    Pallas kernel (refs) and in plain XLA (arrays).  Implements exactly the
    surface RnsVal + the point formulas touch; K*p residues are computed
    in-kernel from (p mod m) instead of the host kp_table (K*(p mod m) <
    2^24 for every bound the fold produces, so one barrett is exact)."""

    C = _RNS_PAD_C

    def __init__(self, real, m2, inv2, pmod2, mulconsts):
        self.real = real
        self.p = real.p
        self.Mmin = real.Mmin
        self.M = real.M
        self.k = real.k
        self.mr = real.mr
        self.mpinv_mr = real.mpinv_mr
        self._m2 = m2
        self._inv2 = inv2
        self._pmod2 = pmod2
        self._mc = mulconsts

    def m_bc(self, like):
        return self._m2

    def barrett(self, t, chans=None):
        q = jnp.floor(t.astype(jnp.float32) * self._inv2).astype(jnp.int32)
        r = t - q * self._m2
        r = jnp.where(r < 0, r + self._m2, r)
        return jnp.where(r >= self._m2, r - self._m2, r)

    def kp_table(self, K: int):
        # K * (p mod m) must stay < 2^24 for the exact f32 barrett; larger
        # K (the G2 formulas reach ~2^13) split as K_hi*64 + K_lo with a
        # two-stage reduction (every intermediate < 2^19).
        if K < (1 << 12):
            return self.barrett(K * self._pmod2)
        K_hi, K_lo = K >> 6, K & 63
        assert K_hi < (1 << 12), "K*p residue exceeds exact barrett range"
        hi = self.barrett(K_hi * self._pmod2)
        return self.barrett(hi * 64 + K_lo * self._pmod2)

    def mul_many(self, pairs):
        from ..fields.rns import RnsVal

        T = pairs[0][0].res.shape[-1]
        xs = jnp.concatenate([a.res for a, _ in pairs], axis=-1)
        ys = jnp.concatenate([b.res for _, b in pairs], axis=-1)
        res = _rns_mul_block(self.real, xs, ys, self._mc)
        outs = []
        for i, (a, b) in enumerate(pairs):
            bound = a.a * b.a * _Fr(self.p, self.M) + (self.k + 1)
            if bound.denominator != 1:
                bound = _Fr(bound.numerator // bound.denominator + 1)
            outs.append(
                RnsVal(self, res[..., i * T : (i + 1) * T], bound)
            )
        return outs


@functools.lru_cache(maxsize=None)
def _mixed_add_consts(f):
    """_rns_pallas_consts plus (p mod m) and the B-row mask, padded."""
    import numpy as np

    base = _rns_pallas_consts(f)
    rows = base[-1]
    k = f.k
    PC = _RNS_PAD_C
    m_list = [1] * PC
    for i, r in enumerate(rows):
        m_list[int(r)] = f.moduli[i]
    pmod = np.asarray([f.p % m for m in m_list], np.int64)
    bmask = np.zeros((PC,), np.int64)
    bmask[:k] = 1
    return base, np.asarray(pmod, np.int32).reshape(-1, 1), np.asarray(
        bmask, np.int32
    ).reshape(-1, 1)


@functools.lru_cache(maxsize=None)
def _jit_mixed_add_pallas(
    f, b3: int, lanes: int, block: int, tab_a_num: int, cap_num: int,
    interpret: bool,
):
    """Kernel factory: one complete signed mixed addition on padded tiles.

    tab_a_num / cap_num are the integer bounds (Fractions with denominator
    1) of the gathered table points and the pinned accumulator."""
    from ..curves import rns_point as rpt
    from ..curves.rns_point import RnsG1Ops
    from ..fields.rns import RnsVal

    base, pmod_np, bmask_np = _mixed_add_consts(f)
    kernel_consts = base[:-1] + (pmod_np, bmask_np)
    PC = _RNS_PAD_C
    tab_a = _Fr(tab_a_num)
    cap = _Fr(cap_num)

    def kernel(ax, ay, az, qx, qy, sg, *rest):
        outs = rest[-3:]
        consts = tuple(r[:, :] for r in rest[:-3])
        mc = consts[:-2]
        pmod2, bmask = consts[-2], consts[-1]
        m2, inv2 = mc[0], mc[1]
        shim = _PadShimField(f, m2, inv2, pmod2, mc)
        ops = RnsG1Ops(shim, b3)
        acc = tuple(
            RnsVal(shim, r[:, :], cap) for r in (ax, ay, az)
        )
        qxr, qyr = qx[:, :], qy[:, :]
        qxv = RnsVal(shim, qxr, tab_a)
        qyv0 = RnsVal(shim, qyr, tab_a)
        # identity sentinel: all B rows of both coords exactly zero
        infx = jnp.min(
            jnp.where(bmask == 1, (qxr == 0).astype(jnp.int32), 1), axis=0
        )
        infy = jnp.min(
            jnp.where(bmask == 1, (qyr == 0).astype(jnp.int32), 1), axis=0
        )
        inf = (infx * infy) == 1  # (T,)
        sgb = sg[0, :] == 1
        qyv = ops.select(sgb, qyv0.neg(), qyv0)
        added = rpt.point_add_mixed(ops, acc, (qxv, qyv))
        assert max(v.a for v in added) <= cap, "pallas fold bound escape"
        for o_ref, a_in, v in zip(outs, (ax, ay, az), added):
            o_ref[:, :] = jnp.where(inf[None], a_in[:, :], v.res)

    grid = (lanes // block,)
    lane_spec = pl.BlockSpec((PC, block), lambda i: (0, i))
    sg_spec = pl.BlockSpec((1, block), lambda i: (0, i))
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0, 0)) for c in kernel_consts
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[lane_spec] * 5 + [sg_spec] + const_specs,
        out_specs=[lane_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((PC, lanes), jnp.int32) for _ in range(3)
        ],
        interpret=interpret,
    )

    def run(accs, qx, qy, sg):
        return call(*accs, qx, qy, sg, *kernel_consts)

    return run


def rns_pad_rows(f, x):
    """(71, *B) residues -> (80, *B) aligned padded layout."""
    rows = jnp.asarray(_rns_pallas_consts(f)[-1])
    shape = (_RNS_PAD_C,) + x.shape[1:]
    return jnp.zeros(shape, x.dtype).at[rows].set(x)


def rns_unpad_rows(f, x):
    rows = jnp.asarray(_rns_pallas_consts(f)[-1])
    return x[rows]


def rns_fold_window_pallas(
    f, b3, acc_res, q, sgn, tab_bound, cap, block: int = 0
):
    """One fold window: acc (+)= sign * table-point, fully in VMEM.

    acc_res: 3-tuple of (80, *batch) int32 padded residues (the pinned
    accumulator); q: (qx, qy) padded residues of the gathered affine
    points; sgn: (*batch) bool.  Returns the updated 3-tuple.  Semantics
    identical to the XLA body of msm_table_affine_rns (same bound
    discipline, same identity handling)."""
    import os

    if not block:
        block = int(os.environ.get("BMT_PALLAS_BLOCK", "512"))
    shape = acc_res[0].shape
    lanes = 1
    for s in shape[1:]:
        lanes *= s
    if lanes % block != 0:
        block = lanes
    flat = [r.reshape(_RNS_PAD_C, lanes) for r in acc_res]
    qf = [r.reshape(_RNS_PAD_C, lanes) for r in q]
    sgf = sgn.reshape(1, lanes).astype(jnp.int32)
    tab_n = int(tab_bound) if tab_bound == int(tab_bound) else int(tab_bound) + 1
    interpret = jax.default_backend() == "cpu"
    run = _jit_mixed_add_pallas(
        f, b3, lanes, block, tab_n, int(cap), interpret
    )
    outs = run(flat, qf[0], qf[1], sgf)
    return tuple(o.reshape(shape) for o in outs)


def pad_rns_table(f, tab):
    """RNS affine tables (x, y) with leading channel axis 71 -> the 80-row
    aligned layout the Pallas fold kernel consumes (zero pad rows; the
    (0,0) identity sentinel is preserved)."""
    return tuple(rns_pad_rows(f, t) for t in tab)


class _ShimG2Ops:
    """Fp2 coordinate ops over PAIRS of per-component RnsVals (c0, c1) —
    the kernel-side analog of curves.rns_point.RnsG2Ops without the stacked
    component axis (Mosaic wants flat 2-D tiles).  Same Karatsuba grouping:
    every sub-product of an operation goes through ONE shim mul pipeline."""

    fp2 = True

    def __init__(self, f, b3c: int):
        self.f = f
        self.b3c = b3c

    def add(self, a, b):
        return (a[0] + b[0], a[1] + b[1])

    def sub(self, a, b):
        return (a[0] - b[0], a[1] - b[1])

    def neg(self, a):
        return (a[0].neg(), a[1].neg())

    def mul_b3(self, a):
        return (
            (a[0] - a[1]).scale(self.b3c),
            (a[0] + a[1]).scale(self.b3c),
        )

    def scale3(self, a):
        return (a[0].scale(3), a[1].scale(3))

    def mul_many(self, pairs):
        sub = []
        for a, b in pairs:
            a0, a1 = a
            b0, b1 = b
            sub += [(a0, b0), (a1, b1), (a0 + a1, b0 + b1)]
        prods = self.f.mul_many(sub)
        out = []
        for i in range(len(pairs)):
            t0, t1, t2 = prods[3 * i : 3 * i + 3]
            out.append((t0 - t1, t2 - t0 - t1))
        return out

    def select(self, cond, a, b):
        from ..fields.rns import RnsVal

        return tuple(
            RnsVal(self.f, jnp.where(cond[None], x.res, y.res), max(x.a, y.a))
            for x, y in zip(a, b)
        )


@functools.lru_cache(maxsize=None)
def _jit_mixed_add_pallas_g2(
    f, b3c: int, lanes: int, block: int, tab_a_num: int, cap_num: int,
    interpret: bool,
):
    """G2 variant: one complete signed mixed addition on the twist, Fp2
    coordinates as per-component (80, T) tiles (12 inputs, 6 outputs)."""
    from ..curves import rns_point as rpt
    from ..fields.rns import RnsVal

    base, pmod_np, bmask_np = _mixed_add_consts(f)
    kernel_consts = base[:-1] + (pmod_np, bmask_np)
    PC = _RNS_PAD_C
    tab_a = _Fr(tab_a_num)
    cap = _Fr(cap_num)

    def kernel(*refs):
        ins = refs[: 10]
        sg = refs[10]
        consts = tuple(r[:, :] for r in refs[11:-6])
        outs = refs[-6:]
        mc = consts[:-2]
        pmod2, bmask = consts[-2], consts[-1]
        shim = _PadShimField(f, mc[0], mc[1], pmod2, mc)
        ops = _ShimG2Ops(shim, b3c)
        acc = tuple(
            (
                RnsVal(shim, ins[2 * i][:, :], cap),
                RnsVal(shim, ins[2 * i + 1][:, :], cap),
            )
            for i in range(3)
        )
        q = tuple(
            (
                RnsVal(shim, ins[6 + 2 * i][:, :], tab_a),
                RnsVal(shim, ins[6 + 2 * i + 1][:, :], tab_a),
            )
            for i in range(2)
        )
        # identity sentinel: every component of both affine coords zero
        flags = []
        for r in ins[6:10]:
            flags.append(
                jnp.min(
                    jnp.where(
                        bmask == 1, (r[:, :] == 0).astype(jnp.int32), 1
                    ),
                    axis=0,
                )
            )
        inf = (flags[0] * flags[1] * flags[2] * flags[3]) == 1
        sgb = sg[0, :] == 1
        qx, qy0 = q
        qy = ops.select(sgb, ops.neg(qy0), qy0)
        added = rpt.point_add_mixed(ops, acc, (qx, qy))
        assert max(c.a for v in added for c in v) <= cap, "g2 bound escape"
        flat_in = [ins[2 * i] for i in range(3)], [
            ins[2 * i + 1] for i in range(3)
        ]
        for i in range(3):
            for c in range(2):
                o_ref = outs[2 * i + c]
                a_in = ins[2 * i + c]
                o_ref[:, :] = jnp.where(
                    inf[None], a_in[:, :], added[i][c].res
                )

    grid = (lanes // block,)
    lane_spec = pl.BlockSpec((PC, block), lambda i: (0, i))
    sg_spec = pl.BlockSpec((1, block), lambda i: (0, i))
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0, 0)) for c in kernel_consts
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[lane_spec] * 10 + [sg_spec] + const_specs,
        out_specs=[lane_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((PC, lanes), jnp.int32) for _ in range(6)
        ],
        interpret=interpret,
    )

    def run(flat_ins, sg):
        return call(*flat_ins, sg, *kernel_consts)

    return run


def rns_fold_window_pallas_g2(
    f, b3c, acc_res, q, sgn, tab_bound, cap, block: int = 0
):
    """G2 fold window: acc_res / q are tuples of (80, 2, *batch) padded
    residue arrays (component axis 1); sgn (*batch) bool."""
    import os

    if not block:
        block = int(os.environ.get("BMT_PALLAS_BLOCK", "512"))
    shape = acc_res[0].shape  # (80, 2, *batch)
    lanes = 1
    for s in shape[2:]:
        lanes *= s
    if lanes % block != 0:
        block = lanes
    flat = []
    for r in acc_res:
        flat += [r[:, 0].reshape(_RNS_PAD_C, lanes),
                 r[:, 1].reshape(_RNS_PAD_C, lanes)]
    for r in q:
        flat += [r[:, 0].reshape(_RNS_PAD_C, lanes),
                 r[:, 1].reshape(_RNS_PAD_C, lanes)]
    sgf = sgn.reshape(1, lanes).astype(jnp.int32)
    tab_n = int(tab_bound) if tab_bound == int(tab_bound) else int(tab_bound) + 1
    interpret = jax.default_backend() == "cpu"
    run = _jit_mixed_add_pallas_g2(
        f, b3c, lanes, block, tab_n, int(cap), interpret
    )
    outs = run(flat, sgf)
    coords = []
    for i in range(3):
        c0 = outs[2 * i].reshape((_RNS_PAD_C, 1) + shape[2:])
        c1 = outs[2 * i + 1].reshape((_RNS_PAD_C, 1) + shape[2:])
        coords.append(jnp.concatenate([c0, c1], axis=1))
    return tuple(coords)
