"""Multi-scalar multiplication (MSM) kernels.

TPU-native replacement for the reference's Pippenger multiexp
(bellman/src/multiexp.rs:159-281).  Two strategies:

  * `msm_ladder` — every point gets a branchless double-and-add ladder
    (vectorized across the whole point set), then a log-depth tree reduction.
    Simple, fully parallel, used as the correctness baseline and for small
    sets.
  * `msm_pippenger` — the bucket method recast for a vector machine: window
    digits, sort-by-digit (on-device argsort), bucket sums via a segmented
    associative scan (the associative combine is the complete addition
    formula), weighted bucket fold via suffix scans, and the final window
    fold with c doublings — exactly the summation-by-parts structure of
    multiexp.rs:229-249, but every stage is data-parallel instead of
    thread-parallel.

Scalars arrive as host ints; density semantics (multiexp.rs:88-157) are
applied by the caller (see groth16/bls12.py).
"""

from __future__ import annotations

import functools
from fractions import Fraction
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.device import (
    DeviceGroup,
    Point,
    point_add,
    point_add_mixed,
    point_double,
    point_identity,
    point_select,
    scalar_mul_bits,
    scalars_to_bits,
    tree_reduce,
)


def _pad_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def msm_ladder(ops, points: Point, bits: jnp.ndarray) -> Point:
    """Per-point ladders + tree reduction. bits: (nbits, N), N a power of 2."""
    per_point = scalar_mul_bits(ops, points, bits)
    return tree_reduce(ops, per_point)


@functools.lru_cache(maxsize=None)
def _jit_msm_ladder(group: DeviceGroup, n: int, nbits: int):
    return jax.jit(lambda pts, bits: msm_ladder(group.ops, pts, bits))


def msm_host(group: DeviceGroup, bases: Sequence, scalars: Sequence[int]) -> object:
    """Host-facing MSM: affine host points + int scalars -> host point.

    Pads to a power of two with identities.  One-shot MSMs use the ladder:
    on the real chip the sorted-scan Pippenger measured slower than plain
    ladders (DESIGN-NOTES.md "Measured TPU performance model"), and the
    gather-table kernel only pays off when the base set is reused (the
    batched prover precomputes tables per CRS).  BMT_MSM_STRATEGY=pippenger
    opts back in for experiments.
    """
    n = len(bases)
    if n == 0:
        return None
    import os as _os

    if n >= 64 and _os.environ.get("BMT_MSM_STRATEGY") == "pippenger":
        return msm_pippenger_host(group, bases, scalars, c=8)
    nbits = max(s.bit_length() for s in scalars) if scalars else 1
    nbits = max(nbits, 1)
    m = _pad_pow2(n)
    pts = list(bases) + [None] * (m - n)
    sc = list(scalars) + [0] * (m - n)
    P = group.encode_points(pts)
    bits = scalars_to_bits(sc, nbits)
    out = _jit_msm_ladder(group, m, nbits)(P, bits)
    return group.decode_points(out)[0]


# --------------------------------------------------------------- Pippenger
def msm_pippenger(ops, points: Point, digits: jnp.ndarray, c: int) -> Point:
    """Bucket-method MSM recast for a vector machine.

    points: coord tuple, each (L, [2,] N); digits: (W, N) int32 window digits
    (LSB window first), each in [0, 2^c).  Mirrors the structure of
    bellman/src/multiexp.rs:159-250 — per-window buckets, summation by
    parts, fold with c doublings — but every stage is data-parallel:

      * per window: sort points by digit (argsort + gather), bucket sums via
        a SEGMENTED associative scan whose combine is the complete addition
        formula, last-of-segment extraction via scatter-max,
      * weighted bucket fold sum_b b*S_b as a suffix associative scan plus a
        log-depth reduction (the summation-by-parts identity),
      * final window fold with c doublings per window.
    """
    W, N = digits.shape
    n_buckets = 1 << c

    perm = jnp.argsort(digits, axis=1)  # (W, N) stable sort per window
    sorted_digits = jnp.take_along_axis(digits, perm, axis=1)
    idx = jnp.arange(N, dtype=jnp.int32)

    def window_sum(w):
        """Bucket-weighted sum for one window (traced once inside fori)."""
        pw = perm[w]
        dw = sorted_digits[w]
        pts = tuple(x[..., pw] for x in points)
        seg_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), dw[1:] != dw[:-1]]
        )
        # associative_scan needs equal-rank leaves: lift flags to coord rank.
        seg_start = seg_start.reshape((1,) * (points[0].ndim - 1) + (N,))

        def combine(a, b):
            (ax, ay, az, astart) = a
            (bx, by, bz, bstart) = b
            summed = point_add(ops, (ax, ay, az), (bx, by, bz))
            x = jnp.where(bstart, bx, summed[0])
            y = jnp.where(bstart, by, summed[1])
            z = jnp.where(bstart, bz, summed[2])
            return (x, y, z, astart | bstart)

        scan_axis = points[0].ndim - 1
        sx, sy, sz, _ = jax.lax.associative_scan(
            combine, (pts[0], pts[1], pts[2], seg_start), axis=scan_axis
        )

        # last element of each digit's run -> bucket sums S_b
        last_idx = jnp.zeros(n_buckets, jnp.int32).at[dw].max(idx)
        present = jnp.zeros(n_buckets, jnp.bool_).at[dw].max(
            jnp.ones((N,), jnp.bool_)
        )
        bucket = (sx[..., last_idx], sy[..., last_idx], sz[..., last_idx])
        bucket = point_select(
            ops, present, bucket, point_identity(ops, (n_buckets,))
        )

        # summation by parts: sum_b b*S_b = (sum_b suffix_b) - suffix_0
        suffix = jax.lax.associative_scan(
            lambda a, b: point_add(ops, a, b), bucket, axis=scan_axis, reverse=True
        )
        total = tree_reduce(ops, suffix)  # (.., 1): sum_j (j+1) S_j
        suffix0 = tuple(x[..., :1] for x in suffix)
        neg_s0 = (suffix0[0], ops.neg(suffix0[1]), suffix0[2])
        return point_add(ops, total, neg_s0)

    def horner_body(i, res):
        w = W - 1 - i  # MSB window first
        for _ in range(c):
            res = point_double(ops, res)
        return point_add(ops, res, window_sum(w))

    res0 = point_identity(ops, (1,))
    return jax.lax.fori_loop(0, W, horner_body, res0)


def msm_pippenger_batched(ops, points: Point, digits: jnp.ndarray, c: int) -> Point:
    """Pippenger over a batch of scalar sets sharing one base set.

    points: coord tuple, each (L, [2,] N); digits: (W, B, N).  Used by the
    batched prover: the CRS bases are shared across the proof batch, each
    proof brings its own scalars.  Returns (L, [2,] B, 1) points.
    """
    W, B, N = digits.shape
    n_buckets = 1 << c
    coord_rank = points[0].ndim  # 2 (G1) or 3 (G2)

    perm = jnp.argsort(digits, axis=-1)  # (W, B, N)
    sorted_digits = jnp.take_along_axis(digits, perm, axis=-1)
    idx = jnp.arange(N, dtype=jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)

    def window_sum(w):
        pw = perm[w]  # (B, N)
        dw = sorted_digits[w]  # (B, N)
        pts = tuple(x[..., pw] for x in points)  # (L, [2,] B, N)
        seg_start = jnp.concatenate(
            [jnp.ones((B, 1), jnp.bool_), dw[:, 1:] != dw[:, :-1]], axis=1
        ).reshape((1,) * (coord_rank - 1) + (B, N))

        def combine(a, b):
            (ax, ay, az, astart) = a
            (bx, by, bz, bstart) = b
            summed = point_add(ops, (ax, ay, az), (bx, by, bz))
            x = jnp.where(bstart, bx, summed[0])
            y = jnp.where(bstart, by, summed[1])
            z = jnp.where(bstart, bz, summed[2])
            return (x, y, z, astart | bstart)

        scan_axis = coord_rank  # trailing N axis of (L, [2,] B, N)
        sx, sy, sz, _ = jax.lax.associative_scan(
            combine, (pts[0], pts[1], pts[2], seg_start), axis=scan_axis
        )

        last_idx = (
            jnp.zeros((B, n_buckets), jnp.int32)
            .at[rows[:, None], dw]
            .max(idx[None, :])
        )
        present = (
            jnp.zeros((B, n_buckets), jnp.bool_)
            .at[rows[:, None], dw]
            .max(jnp.ones((B, N), jnp.bool_))
        )

        def gather_buckets(x):
            ind = jnp.broadcast_to(
                last_idx.reshape((1,) * (coord_rank - 1) + (B, n_buckets)),
                x.shape[:-1] + (n_buckets,),
            )
            return jnp.take_along_axis(x, ind, axis=-1)

        bucket = (gather_buckets(sx), gather_buckets(sy), gather_buckets(sz))
        bucket = point_select(
            ops, present, bucket, point_identity(ops, (B, n_buckets))
        )

        suffix = jax.lax.associative_scan(
            lambda a, b: point_add(ops, a, b), bucket, axis=scan_axis, reverse=True
        )
        total = tree_reduce(ops, suffix)  # (L, [2,] B, 1)
        suffix0 = tuple(x[..., :1] for x in suffix)
        neg_s0 = (suffix0[0], ops.neg(suffix0[1]), suffix0[2])
        return point_add(ops, total, neg_s0)

    def horner_body(i, res):
        w = W - 1 - i
        for _ in range(c):
            res = point_double(ops, res)
        return point_add(ops, res, window_sum(w))

    return jax.lax.fori_loop(0, W, horner_body, point_identity(ops, (B, 1)))


def shifted_bases(ops, points: Point, c: int, nbits: int = 255) -> Point:
    """(L, [2,] N) bases -> (L, [2,] W*N) with block w holding 2^(c*w) * P_i.

    Precomputed once per fixed base set (the prover's CRS tensors), this
    removes every Horner doubling from the MSM and lets ALL windows run in
    one flat bucket pass (msm_flat_pippenger).  Cost: (W-1)*c sequential
    doublings on N-wide lanes, done once at build time.
    """
    W = -(-nbits // c)
    N = points[0].shape[-1]

    def body(w, carry):
        acc, cur = carry
        acc = jax.tree_util.tree_map(
            lambda a, x: jax.lax.dynamic_update_index_in_dim(
                a, x, w, a.ndim - 2
            ),
            acc,
            cur,
        )
        for _ in range(c):
            cur = point_double(ops, cur)
        return acc, cur

    acc0 = tuple(
        jnp.zeros(x.shape[:-1] + (W, N), jnp.int32) for x in points
    )
    acc, _ = jax.lax.fori_loop(0, W, body, (acc0, points))
    return tuple(x.reshape(x.shape[:-2] + (W * N,)) for x in acc)


def msm_flat_pippenger(ops, sbases: Point, digits: jnp.ndarray, c: int) -> Point:
    """Bucket-method MSM over PRE-SHIFTED bases: one sort, ONE segmented
    scan, one bucket fold — no per-window loops, no doublings.

    sbases: coord tuple (L, [2,] W*N) from `shifted_bases`; digits:
    (W, B, N) int32 window digits (LSB window first).  Returns (L, [2,] B, 1).

    Rationale (measured): the per-window formulation (msm_pippenger_batched)
    pays 32 sequential rounds of sort+scan overhead and was 2.5x slower than
    plain ladders on TPU; flattening the window axis into the point axis
    turns the whole MSM into a handful of wide data-parallel passes:
      sum_i s_i P_i = sum_{w,i} d_{w,i} (2^{cw} P_i)
    i.e. ONE tiny-scalar MSM over W*N points, where bucket keys are
    (window << c) | digit and the weighted fold uses summation-by-parts
    per window segment (multiexp.rs:229-249 parity).
    """
    W, B, N = digits.shape
    M = W * N
    nb = 1 << c
    coord_rank = sbases[0].ndim  # 2 (G1) or 3 (G2)

    keys = (
        jnp.arange(W, dtype=jnp.int32)[:, None, None] * nb + digits
    )  # (W, B, N)
    keys = keys.transpose(1, 0, 2).reshape(B, M)
    perm = jnp.argsort(keys, axis=-1)  # (B, M); base w*N+i matches layout
    skeys = jnp.take_along_axis(keys, perm, axis=-1)
    pts = tuple(x[..., perm] for x in sbases)  # (L, [2,] B, M)

    seg_start = jnp.concatenate(
        [jnp.ones((B, 1), jnp.bool_), skeys[:, 1:] != skeys[:, :-1]], axis=1
    ).reshape((1,) * (coord_rank - 1) + (B, M))

    def combine(a, b):
        (ax, ay, az, astart) = a
        (bx, by, bz, bstart) = b
        summed = point_add(ops, (ax, ay, az), (bx, by, bz))
        x = jnp.where(bstart, bx, summed[0])
        y = jnp.where(bstart, by, summed[1])
        z = jnp.where(bstart, bz, summed[2])
        return (x, y, z, astart | bstart)

    scan_axis = coord_rank  # trailing M axis of (L, [2,] B, M)
    sx, sy, sz, _ = jax.lax.associative_scan(
        combine, (pts[0], pts[1], pts[2], seg_start), axis=scan_axis
    )

    idx = jnp.arange(M, dtype=jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)
    n_keys = W * nb
    last_idx = (
        jnp.zeros((B, n_keys), jnp.int32)
        .at[rows[:, None], skeys]
        .max(idx[None, :])
    )
    present = (
        jnp.zeros((B, n_keys), jnp.bool_)
        .at[rows[:, None], skeys]
        .max(jnp.ones((B, M), jnp.bool_))
    )

    def gather_buckets(x):
        ind = jnp.broadcast_to(
            last_idx.reshape((1,) * (coord_rank - 1) + (B, n_keys)),
            x.shape[:-1] + (n_keys,),
        )
        return jnp.take_along_axis(x, ind, axis=-1)

    bucket = (gather_buckets(sx), gather_buckets(sy), gather_buckets(sz))
    bucket = point_select(
        ops, present, bucket, point_identity(ops, (B, n_keys))
    )

    # summation by parts per window segment: suffix_{w,j} = sum_{b>=j} S_{w,b}
    # via a SEGMENTED reverse scan (segments = windows of nb buckets; in
    # reverse order a segment "starts" at the window's LAST bucket), then
    # sum_w sum_b b*S_{w,b} = tree(all suffixes) - tree(per-window suffix_0).
    wend = (jnp.arange(n_keys, dtype=jnp.int32) % nb) == nb - 1
    wend_f = jnp.broadcast_to(
        wend.reshape((1,) * (coord_rank - 1) + (1, n_keys)),
        seg_start.shape[:-2] + (B, n_keys),
    )
    fx, fy, fz, _ = jax.lax.associative_scan(
        combine,
        (bucket[0], bucket[1], bucket[2], wend_f),
        axis=scan_axis,
        reverse=True,
    )
    suffix = (fx, fy, fz)
    total = tree_reduce(ops, suffix)  # (L, [2,] B, 1): sum of ALL suffixes
    # subtract per-window suffix_0 (indices w*nb): sum_j suffix_j - suffix_0
    s0_idx = jnp.arange(W, dtype=jnp.int32) * nb
    s0 = tuple(x[..., s0_idx] for x in suffix)  # (L, [2,] B, W)
    Wp = _pad_pow2(W)
    if Wp != W:
        ident = point_identity(ops, (B, Wp - W))
        s0 = tuple(
            jnp.concatenate([x, i_], axis=-1) for x, i_ in zip(s0, ident)
        )
    s0_total = tree_reduce(ops, s0)
    neg_s0 = (s0_total[0], ops.neg(s0_total[1]), s0_total[2])
    return point_add(ops, total, neg_s0)


def window_tables(ops, points: Point, c: int, nbits: int = 255) -> Point:
    """Per-base window bucket tables T[w, b, i] = b * 2^(c*w) * P_i.

    coords (L, [2,] W, 2^c, N).  Precomputed once per fixed base set (the
    prover's CRS); the runtime MSM (msm_table) is then a pure gather +
    log-depth adds: no doublings, no sorts, no scans — the shapes TPUs like.
    Memory: W * 2^c * N points; c=4 keeps a 2048-point G1 set under 1 GB.
    """
    W = -(-nbits // c)
    N = points[0].shape[-1]
    sb = shifted_bases(ops, points, c, nbits)  # (L, [2,] W*N)
    sb = tuple(x.reshape(x.shape[:-1] + (W, N)) for x in sb)
    nb = 1 << c

    # T[w, b] = b * sb[w]: running adds over b on (W, N) lanes.
    def bucket_step(b, carry):
        table, running = carry
        running = point_add(ops, running, sb)
        table = jax.tree_util.tree_map(
            lambda acc, x: jax.lax.dynamic_update_index_in_dim(
                acc, x, b + 1, acc.ndim - 3
            ),
            table,
            running,
        )
        return table, running

    table0 = tuple(
        jnp.zeros(x.shape[:-1] + (nb, W, N), jnp.int32) for x in points
    )
    # bucket 0 = identity (0 : 1 : 0)
    table0 = (
        table0[0],
        table0[1].at[..., 0, :, :].set(ops.one((W, N))),
        table0[2],
    )
    ident = point_identity(ops, (W, N))
    table, _ = jax.lax.fori_loop(0, nb - 1, bucket_step, (table0, ident))
    # layout (L, [2,] W, nb, N)
    return tuple(jnp.swapaxes(x, -3, -2) for x in table)


def msm_table(ops, tables: Point, digits: jnp.ndarray) -> Point:
    """MSM from precomputed window tables: per-window gather + accumulate.

    tables: (L, [2,] W, 2^c, N) from `window_tables`; digits: (W, B, N).
    Returns (L, [2,] B, 1).  Work: B*N*W + B*(N-1) point additions — ~4x
    fewer group ops than the 255-step ladder at c=4 and zero doublings.

    The window fold runs SEQUENTIALLY at (B, N) lane width: one point
    addition per window inside a fori_loop.  Measured on TPU v5e, wide
    point ops (e.g. a (W/2, B, N)-lane tree level) spill the loop-carried
    limb accumulators out of VMEM and run ~15x below the VPU's roofline,
    while (B, N)-wide ops stay VMEM-resident — sequential-narrow beats
    parallel-wide here.
    """
    W, B, N = digits.shape
    coord_rank = tables[0].ndim  # 4 (G1) or 5 (G2)
    idx = digits.reshape((1,) * (coord_rank - 3) + (W, B, N))
    ind = idx[..., None, :]  # (1, [1,] W, B, 1, N)

    def body(w, acc):
        tab_w = tuple(
            jax.lax.dynamic_index_in_dim(x, w, x.ndim - 3, keepdims=False)
            for x in tables
        )  # (L, [2,] nb, N)
        ind_w = jax.lax.dynamic_index_in_dim(
            ind, w, ind.ndim - 4, keepdims=False
        )  # (1, [1,] B, 1, N)
        picked = tuple(
            jnp.take_along_axis(x[..., None, :], ind_w, axis=-3)[..., 0, :]
            for x in tab_w
        )  # (L, [2,] B, N)
        return point_add(ops, acc, picked)

    acc = jax.lax.fori_loop(0, W, body, point_identity(ops, (B, N)))
    return tree_reduce(ops, acc)


def signed_digits(digits: jnp.ndarray, c: int) -> jnp.ndarray:
    """(W, *S) unsigned base-2^c digits (LSB-window first) -> (W+1, *S)
    signed digits in [-2^(c-1), 2^(c-1)-1] representing the same value.

    Any digit >= 2^(c-1) becomes digit - 2^c with a +1 carry into the next
    window (one lax.scan over the W axis; the final carry is the extra
    digit, always 0 or 1).  Halves the bucket-table magnitude range of the
    gather MSM: |digit| <= 2^(c-1), sign applied by negating the gathered
    y coordinate (negation is free on short-Weierstrass points)."""
    half = 1 << (c - 1)
    full = 1 << c

    def body(carry, d):
        t = d + carry
        cout = (t >= half).astype(d.dtype)
        return cout, t - cout * full

    carry, s = jax.lax.scan(body, jnp.zeros_like(digits[0]), digits)
    return jnp.concatenate([s, carry[None]], axis=0)


def window_tables_affine(
    ops, points: Point, c: int, nbits: int = 255, signed: bool = True
) -> Tuple:
    """Affine window bucket tables for the signed-digit gather MSM.

    T[w, b, i] = b * 2^(c*w) * P_i stored as AFFINE pairs (x, y), coords
    (L, [2,] W, nb, N) — 2/3 the memory and gather traffic of the
    projective tables.  The identity (bucket 0, and every bucket of a
    padded identity base) is stored as (0, 0), which is not on the curve
    y^2 = x^3 + 4 so the runtime MSM can detect it with two is-zero tests.

    signed=True sizes the table for magnitude buckets [0, 2^(c-1)] and
    W = ceil(nbits/c) + 1 windows (the +1 absorbs the recoding carry).
    """
    if signed:
        W = -(-nbits // c) + 1
        nb = (1 << (c - 1)) + 1
    else:
        W = -(-nbits // c)
        nb = 1 << c
    N = points[0].shape[-1]
    sb = shifted_bases(ops, points, c, W * c)  # (L, [2,] W*N)
    sb = tuple(x.reshape(x.shape[:-1] + (W, N)) for x in sb)

    def bucket_step(b, carry):
        table, running = carry
        running = point_add(ops, running, sb)
        table = jax.tree_util.tree_map(
            lambda acc, x: jax.lax.dynamic_update_index_in_dim(
                acc, x, b + 1, acc.ndim - 3
            ),
            table,
            running,
        )
        return table, running

    table0 = tuple(
        jnp.zeros(x.shape[:-1] + (nb, W, N), jnp.int32) for x in points
    )
    table0 = (
        table0[0],
        table0[1].at[..., 0, :, :].set(ops.one((W, N))),
        table0[2],
    )
    ident = point_identity(ops, (W, N))
    table, _ = jax.lax.fori_loop(0, nb - 1, bucket_step, (table0, ident))
    # bucket axis LEADING for the inversion scans: (L, [2,] nb, W, N)
    X, Y, Z = table

    # Affine conversion via Montgomery's batch-inversion trick along the
    # bucket axis: ONE Fermat inversion at (W, N) lanes + 2 multiplies per
    # bucket, instead of either a full-width inversion (4.4M-lane multiply
    # temps of ~1.3 GB crash the TPU worker at c=8/N=1024) or a per-bucket
    # inversion (128 x ~0.9 s of per-op overhead floor, measured 138 s per
    # table build).
    inf = ops.is_zero(Z)
    zero_wn = ops.zero((W, N))
    one_wn = ops.one((W, N))
    zs = ops.select(inf, ops.one(ops.batch_shape(Z)), Z)
    b_axis = zs.ndim - 3

    def zslice(t, b):
        return jax.lax.dynamic_index_in_dim(t, b, b_axis, keepdims=False)

    def fwd(b, carry):
        # prefix[b] = z_0 * ... * z_{b-1}  (exclusive prefix: no edge cond)
        prefix, running = carry
        prefix = jax.lax.dynamic_update_index_in_dim(
            prefix, running, b, b_axis
        )
        running = ops.mul(running, zslice(zs, b))
        return prefix, running

    prefix, total = jax.lax.fori_loop(
        0, nb, fwd, (jnp.zeros_like(zs), one_wn)
    )
    total_inv = ops.inv(total)  # ONE pow at (W, N) lanes

    def bwd(i, carry):
        # zinv_b = inv_run * prefix[b]; fold the coordinate multiplies in
        # so no full-width zinv tensor is ever materialized.
        inv_run, xt, yt = carry
        b = nb - 1 - i
        zinv_b, inv_next = ops.mul_many(
            [(inv_run, zslice(prefix, b)), (inv_run, zslice(zs, b))]
        )
        xb, yb = ops.mul_many(
            [(zslice(X, b), zinv_b), (zslice(Y, b), zinv_b)]
        )
        inf_b = jax.lax.dynamic_index_in_dim(inf, b, inf.ndim - 3, False)
        xb = ops.select(inf_b, zero_wn, xb)
        yb = ops.select(inf_b, zero_wn, yb)
        xt = jax.lax.dynamic_update_index_in_dim(xt, xb, b, b_axis)
        yt = jax.lax.dynamic_update_index_in_dim(yt, yb, b, b_axis)
        return inv_next, xt, yt

    _, x, y = jax.lax.fori_loop(
        0, nb, bwd, (total_inv, jnp.zeros_like(X), jnp.zeros_like(Y))
    )
    # layout (L, [2,] W, nb, N)
    return tuple(jnp.swapaxes(t, -3, -2) for t in (x, y))


def msm_table_affine(ops, tables, sdigits: jnp.ndarray) -> Point:
    """MSM from affine window tables + signed digits: the default TPU path.

    tables: (x, y) from `window_tables_affine`, coords (L, [2,] W, nb, N);
    sdigits: (W, B, N) signed digits from `signed_digits` (|d| < nb).
    Returns (L, [2,] B, 1).

    Per window (sequential at (B, N) lane width — see msm_table for the
    VMEM-residency rationale): gather the |digit| bucket, negate y where
    the digit is negative, and fold with ONE complete mixed addition; a
    select skips gathered identities (stored as the off-curve pair (0,0)).
    Work: (ceil(255/c)+1) * B * N mixed adds + the final tree reduction —
    at c=8 that is 33 window adds vs the unsigned c=4 path's 64.
    """
    W, B, N = sdigits.shape
    xs, ys = tables
    coord_rank = xs.ndim  # 4 (G1) or 5 (G2)
    mag = jnp.abs(sdigits).reshape((1,) * (coord_rank - 3) + (W, B, N))
    ind = mag[..., None, :]  # (1, [1,] W, B, 1, N)
    sgn = sdigits < 0

    def body(w, acc):
        def pick(t):
            t_w = jax.lax.dynamic_index_in_dim(
                t, w, t.ndim - 3, keepdims=False
            )  # (L, [2,] nb, N)
            i_w = jax.lax.dynamic_index_in_dim(
                ind, w, ind.ndim - 4, keepdims=False
            )  # (1, [1,] B, 1, N)
            return jnp.take_along_axis(t_w[..., None, :], i_w, axis=-3)[
                ..., 0, :
            ]  # (L, [2,] B, N)

        qx, qy = pick(xs), pick(ys)
        sg = jax.lax.dynamic_index_in_dim(sgn, w, 0, keepdims=False)
        qy = ops.select(sg, ops.neg(qy), qy)
        inf = jnp.logical_and(ops.is_zero(qx), ops.is_zero(qy))
        added = point_add_mixed(ops, acc, (qx, qy))
        return point_select(ops, inf, acc, added)

    acc = jax.lax.fori_loop(0, W, body, point_identity(ops, (B, N)))
    return tree_reduce(ops, acc)


# --------------------------------------------------------- RNS (MXU) strategy


def tables_to_rns(rops, lf, tables):
    """Affine limb window tables -> RNS M-residue tables (int16).

    tables: (x, y) from `window_tables_affine`, coords (L, [2,] W, nb, N)
    canonical limb Montgomery.  Output: same layout with the limb axis
    replaced by the RNS channel axis C, stored int16 (residues < 2^12), so
    table HBM and gather traffic match the limb tables (C*2 ~ L*4 bytes).
    The (0,0) identity sentinel survives exactly (integer 0 maps to
    all-zero residues through the conversion multiply).

    One-time device work per CRS: a lax.map over the window axis keeps the
    conversion's matmul+mul working set VMEM-sized.  Returns
    ((x_res, y_res), table_bound)."""
    from ..curves.rns_point import limb_coord_to_rns

    f = rops.f
    w_axis = tables[0].ndim - 3

    def conv(xy_w):
        x_w, y_w = xy_w  # (L, [2,] nb, N)
        vx = limb_coord_to_rns(f, lf, x_w)
        vy = limb_coord_to_rns(f, lf, y_w)
        return vx.res.astype(jnp.int16), vy.res.astype(jnp.int16)

    moved = tuple(jnp.moveaxis(t, w_axis, 0) for t in tables)
    rx, ry = jax.lax.map(conv, moved)
    bound = limb_coord_to_rns(f, lf, lf.zeros((1,))).a
    # C replaces L at axis 0, so W returns to the SAME axis index
    return (
        (jnp.moveaxis(rx, 0, w_axis), jnp.moveaxis(ry, 0, w_axis)),
        bound,
    )


def msm_table_affine_rns(
    rops, lf, tables, sdigits: jnp.ndarray, tab_bound, seg_sizes=None
):
    """The RNS/MXU window fold: same gather structure as msm_table_affine,
    with the complete mixed addition evaluated over the RNS field engine
    (curves/rns_point.py) — the reduction matmuls of every field multiply
    run on the MXU instead of the VPU's carry chains.

    tables: int16 RNS residues from `tables_to_rns`, (C, [2,] W, nb, N);
    sdigits: (W, B, N) signed digits.  Returns a LIMB Point (L, [2,] B, 1)
    (the bridge back to the limb pipeline runs at B lanes, negligible).

    seg_sizes=(n_0, ..., n_{S-1}) runs S independent MSMs as ONE fold: the
    base axis holds S concatenated base sets (N = sum(n_s), each n_s a
    power of two, disjoint supports), the window fold runs at full (B, N)
    lane width, and the tree reduction sums within each segment only
    (consecutive equal-width segments share one reduction program).
    Returns (L, [2,] B, S) with one result point per segment.  This
    amortizes the per-window dispatch overhead (the measured per-add floor
    ~1.6 ms at 16k lanes is overhead, not compute — DESIGN-NOTES round-2
    profile) across all S sets; the prove step uses it to fold its four
    large G1 MSMs (h, l, a, b1) in one pass.

    Bound discipline: accumulator coordinates are pinned to the fixpoint
    cap (128*p for G1, 256*p for G2); every iteration's output bounds are
    asserted <= cap at TRACE time (the RnsVal Fraction bookkeeping runs
    during tracing), so the compiled loop carries a machine-checked
    exactness proof."""
    from ..curves import rns_point as rpt

    W, B, N = sdigits.shape
    xs, ys = tables
    coord_rank = xs.ndim  # 4 (G1) or 5 (G2)
    cap = Fraction(256 if rops.fp2 else 128)
    mag = jnp.abs(sdigits).reshape((1,) * (coord_rank - 3) + (W, B, N))
    ind = mag[..., None, :]
    sgn = sdigits < 0

    from .pallas_kernels import _RNS_PAD_C

    if rops.fp2 and xs.shape[0] == _RNS_PAD_C:
        # G2 variant of the Pallas fold (per-component Fp2 tiles).
        from .pallas_kernels import (
            rns_fold_window_pallas_g2,
            rns_pad_rows,
            rns_unpad_rows,
        )

        def body_pallas_g2(w, acc_res):
            def pick(t):
                t_w = jax.lax.dynamic_index_in_dim(
                    t, w, t.ndim - 3, keepdims=False
                )  # (80, 2, nb, N)
                i_w = jax.lax.dynamic_index_in_dim(
                    ind, w, ind.ndim - 4, keepdims=False
                )
                return jnp.take_along_axis(t_w[..., None, :], i_w, axis=-3)[
                    ..., 0, :
                ].astype(jnp.int32)  # (80, 2, B, N)

            qx, qy = pick(xs), pick(ys)
            sg = jax.lax.dynamic_index_in_dim(sgn, w, 0, keepdims=False)
            return rns_fold_window_pallas_g2(
                rops.f, rops.b3c, acc_res, (qx, qy), sg, tab_bound, cap
            )

        acc0 = rpt.point_identity(rops, (B, N))
        acc0_res = tuple(rns_pad_rows(rops.f, v.res) for v in acc0)
        acc_res_pad = jax.lax.fori_loop(0, W, body_pallas_g2, acc0_res)
        acc = tuple(
            rops.wrap(rns_unpad_rows(rops.f, r), cap) for r in acc_res_pad
        )
        return _rns_fold_reduce(rops, lf, acc, cap, seg_sizes, N)

    if not rops.fp2 and xs.shape[0] == _RNS_PAD_C:
        # Tables arrive in the 80-row aligned padded layout (see
        # pallas_kernels.pad_rns_table): run the window fold through the
        # whole-mixed-add Pallas kernel — the complete addition's
        # intermediates stay in VMEM instead of costing ~0.5 GB of HBM
        # round trips per window (the round-5 fold profile).
        from .pallas_kernels import (
            rns_fold_window_pallas,
            rns_pad_rows,
            rns_unpad_rows,
        )

        def body_pallas(w, acc_res):
            def pick(t):
                t_w = jax.lax.dynamic_index_in_dim(
                    t, w, t.ndim - 3, keepdims=False
                )  # (80, nb, N)
                i_w = jax.lax.dynamic_index_in_dim(
                    ind, w, ind.ndim - 4, keepdims=False
                )
                return jnp.take_along_axis(t_w[..., None, :], i_w, axis=-3)[
                    ..., 0, :
                ].astype(jnp.int32)  # (80, B, N)

            qx, qy = pick(xs), pick(ys)
            sg = jax.lax.dynamic_index_in_dim(sgn, w, 0, keepdims=False)
            return rns_fold_window_pallas(
                rops.f, rops.b3, acc_res, (qx, qy), sg, tab_bound, cap
            )

        acc0 = rpt.point_identity(rops, (B, N))
        acc0_res = tuple(rns_pad_rows(rops.f, v.res) for v in acc0)
        acc_res_pad = jax.lax.fori_loop(0, W, body_pallas, acc0_res)
        acc = tuple(
            rops.wrap(rns_unpad_rows(rops.f, r), cap) for r in acc_res_pad
        )
        return _rns_fold_reduce(rops, lf, acc, cap, seg_sizes, N)

    def body(w, acc_res):
        acc = tuple(rpt.RnsVal(rops.f, r, cap) for r in acc_res)

        def pick(t):
            t_w = jax.lax.dynamic_index_in_dim(
                t, w, t.ndim - 3, keepdims=False
            )  # (C, [2,] nb, N)
            i_w = jax.lax.dynamic_index_in_dim(
                ind, w, ind.ndim - 4, keepdims=False
            )  # (1, [1,] B, 1, N)
            return jnp.take_along_axis(t_w[..., None, :], i_w, axis=-3)[
                ..., 0, :
            ].astype(jnp.int32)  # (C, [2,] B, N)

        qx = rops.wrap(pick(xs), tab_bound)
        qy = rops.wrap(pick(ys), tab_bound)
        # identity test BEFORE the sign flip: neg() adds K*p to the exact-0
        # sentinel, which is 0 mod p but no longer stored-zero.
        inf = jnp.logical_and(
            rops.is_stored_zero(qx), rops.is_stored_zero(qy)
        )
        sg = jax.lax.dynamic_index_in_dim(sgn, w, 0, keepdims=False)
        qy = rops.select(sg, qy.neg(), qy)
        added = rpt.point_add_mixed(rops, acc, (qx, qy))
        assert max(v.a for v in added) <= cap, "RNS fold bound escape"
        out = rpt.point_select(
            rops, inf, acc, tuple(rops.wrap(v.res, cap) for v in added)
        )
        return tuple(v.res for v in out)

    acc0 = rpt.point_identity(rops, (B, N))
    acc_res = jax.lax.fori_loop(0, W, body, tuple(v.res for v in acc0))
    acc = tuple(rops.wrap(r, cap) for r in acc_res)
    return _rns_fold_reduce(rops, lf, acc, cap, seg_sizes, N)


def _rns_fold_reduce(rops, lf, acc, cap, seg_sizes, N):
    """Shared tail of msm_table_affine_rns: tree/segment reduction of the
    folded accumulator + the bridge back to limb form."""
    from ..curves import rns_point as rpt

    if seg_sizes is None:
        red = rpt.tree_reduce(rops, acc, cap)
        return rpt.rns_point_to_limb(rops, rops.f, lf, red)
    assert sum(seg_sizes) == N
    # group consecutive equal-width segments into one reduction program
    groups = []
    for n_s in seg_sizes:
        if groups and groups[-1][0] == n_s:
            groups[-1][1] += 1
        else:
            groups.append([n_s, 1])
    parts, off = [], 0
    for n_s, count in groups:
        chunk = tuple(
            rops.wrap(
                v.res[..., off : off + n_s * count].reshape(
                    v.res.shape[:-1] + (count, n_s)
                ),
                v.a,
            )
            for v in acc
        )
        red = rpt.tree_reduce(rops, chunk, cap)  # (..., count, 1)
        parts.append(tuple(rops.wrap(v.res[..., 0], v.a) for v in red))
        off += n_s * count
    red = tuple(
        rops.wrap(
            jnp.concatenate([p[k].res for p in parts], axis=-1),
            max(p[k].a for p in parts),
        )
        for k in range(3)
    )
    return rpt.rns_point_to_limb(rops, rops.f, lf, red)


def pick_table_c(n: int, g2: bool, budget_mb: int = 1536, nbits: int = 255) -> int:
    """Largest signed window width c whose affine table fits the budget.

    Table memory = (ceil(nbits/c)+1) * (2^(c-1)+1) * n points, 288 B per G1
    point (two 36-limb int32 coords) or 576 B per G2 point.  Small base
    sets get wider windows (n<=4: up to c=12 -> 23 window adds vs 64)
    while big CRS sets settle around c=8 (33 adds).  The cap keeps the
    build-time bucket chain (2^(c-1) sequential point adds) proportionate.
    `nbits` < 255 models GLV-decomposed scalars (ops/glv.py): fewer windows
    for the same base count.
    """
    bytes_per = 576 if g2 else 288
    cap = 12 if n <= 4 else 8
    best = 4
    for c in range(4, cap + 1):
        W = -(-nbits // c) + 1
        nb = (1 << (c - 1)) + 1
        if W * nb * n * bytes_per <= budget_mb * (1 << 20):
            best = c
    return best


def psi_extend_affine_tables_g2(field, tables):
    """GLS-4 base extension of affine limb G2 tables: coords
    (L, 2, W, nb, N) -> (L, 2, W, nb, 4N); block m holds psi^m(T[w,b,i]).

    psi(x, y) = (c_x * conj(x), c_y * conj(y)) with the Frobenius conjugate
    folded into the constant multiply:
    c * conj(a) = (c0*a0 + c1*a1) + (c0*a1... see ops/glv.psi_constants.
    The (0,0) identity sentinel is re-imposed with an explicit mask (the
    lazy field ops do not preserve stored-zero through sub)."""
    from .glv import psi_constants

    x, y = tables
    inf = jnp.all(x == 0, axis=(0, 1)) & jnp.all(y == 0, axis=(0, 1))

    def psi_coord(a, c):
        # c * conj(a) for a = a0 + a1 u: (c0 a0 + c1 a1) + (c1 a0 - c0 a1) u
        a0, a1 = a[:, 0], a[:, 1]
        c0, c1 = c
        n0 = field.add(field.mul_const(a0, c0), field.mul_const(a1, c1))
        n1 = field.sub(field.mul_const(a0, c1), field.mul_const(a1, c0))
        out = jnp.stack([n0, n1], axis=1)
        return jnp.where(inf[None, None], jnp.zeros_like(out), out)

    cx, cy = psi_constants()
    xs, ys = [x], [y]
    for _ in range(3):
        xs.append(psi_coord(xs[-1], cx))
        ys.append(psi_coord(ys[-1], cy))
    return (
        jnp.concatenate(xs, axis=-1),
        jnp.concatenate(ys, axis=-1),
    )


def phi_extend_affine_tables(field, tables):
    """GLV base extension of affine limb G1 tables: (x, y) coords
    (L, W, nb, N) -> (L, W, nb, 2N) where the second half holds
    phi(T[w,b,i]) = (beta * x, y).

    Sound because phi is a group homomorphism: the bucket table of the
    phi-mapped bases IS the phi-map of the bucket table — one constant
    field multiply instead of a second bucket-chain build (ops/glv.py).
    The (0, 0) identity sentinel survives (0 * beta stays exact 0)."""
    from .glv import beta_g1

    x, y = tables
    x2 = field.mul_const(x, beta_g1())
    return (
        jnp.concatenate([x, x2], axis=-1),
        jnp.concatenate([y, y], axis=-1),
    )


def digits_from_bits(bits: jnp.ndarray, c: int) -> jnp.ndarray:
    """(NBITS, B, N) MSB-first bits -> (W, B, N) LSB-window-first digits."""
    nbits = bits.shape[0]
    W = -(-nbits // c)
    pad = W * c - nbits
    lsb_first = bits[::-1]
    if pad:
        lsb_first = jnp.concatenate(
            [lsb_first, jnp.zeros((pad,) + bits.shape[1:], bits.dtype)], axis=0
        )
    weights = (1 << jnp.arange(c, dtype=jnp.int32)).reshape(
        (1, c) + (1,) * (bits.ndim - 1)
    )
    return jnp.sum(
        lsb_first.reshape((W, c) + bits.shape[1:]) * weights, axis=1
    ).astype(jnp.int32)


def msm_pippenger_host(
    group: DeviceGroup, bases: Sequence, scalars: Sequence[int], c: int = 8
) -> object:
    """Host-facing Pippenger MSM (pads to powers of two)."""
    n = len(bases)
    if n == 0:
        return None
    m = _pad_pow2(n)
    pts = group.encode_points(list(bases) + [None] * (m - n))
    W = (255 + c - 1) // c
    digits = np.zeros((W, m), np.int32)
    for i, s in enumerate(scalars):
        s = int(s)
        for w in range(W):
            digits[w, i] = (s >> (w * c)) & ((1 << c) - 1)
    out = _jit_msm_pippenger(group, m, W, c)(pts, jnp.asarray(digits))
    return group.decode_points(out)[0]


@functools.lru_cache(maxsize=None)
def _jit_msm_pippenger(group: DeviceGroup, n: int, w: int, c: int):
    return jax.jit(
        lambda pts, digits: msm_pippenger(group.ops, pts, digits, c)
    )


@functools.lru_cache(maxsize=None)
def _jit_batch_mul(group: DeviceGroup, n: int, nbits: int):
    return jax.jit(
        lambda base, bits: scalar_mul_bits(group.ops, base, bits)
    )


def fixed_base_tables(ops, base: Point, c: int, nbits: int = 255) -> Point:
    """Comb tables T[w, b] = b * 2^(c*w) * base  (coords (L, [2,] W, 2^c)).

    The TPU replacement for the reference's wNAF window tables
    (generator.rs:311-328): built once per base on device, then every
    fixed-base multiplication is W table lookups + a log-depth fold —
    no doublings at all.
    """
    W = -(-nbits // c)
    n_buckets = 1 << c

    # base_w = 2^(c*w) * base for each window (sequential c*W doublings,
    # but each is a single point op on one lane — negligible).
    def shift_body(w, carry):
        bases, cur = carry
        bases = jax.tree_util.tree_map(
            lambda acc, x: jax.lax.dynamic_update_index_in_dim(acc, x, w, -1),
            bases,
            cur,
        )
        for _ in range(c):
            cur = point_double(ops, cur)
        return bases, cur

    bases0 = point_identity(ops, (W,))
    bases, _ = jax.lax.fori_loop(0, W, shift_body, (bases0, base))

    # T[w, b] = b * base_w: running adds over b (2^c sequential steps on W
    # lanes); b = 0 entries stay the identity.
    table0 = point_identity(ops, (W, n_buckets))
    running0 = point_identity(ops, (W,))

    def bucket_step(i, carry):
        table, running = carry
        running = point_add(ops, running, bases)
        table = jax.tree_util.tree_map(
            lambda acc, x: jax.lax.dynamic_update_slice_in_dim(
                acc, x[..., None], i + 1, -1
            ),
            table,
            running,
        )
        return table, running

    table, _ = jax.lax.fori_loop(0, n_buckets - 1, bucket_step, (table0, running0))
    return table


def batch_mul_comb(ops, table: Point, digits: jnp.ndarray, c: int) -> Point:
    """Fixed-base multiply via comb tables: digits (W, N) -> points (L, [2,] N)."""
    W, N = digits.shape
    w_idx = jnp.arange(W, dtype=jnp.int32)

    def gather(x):
        # x: (L, [2,] W, 2^c); pick [w, digits[w, i]] for each (w, i)
        return x[..., w_idx[:, None], digits]  # (L, [2,] W, N)

    picked = tuple(gather(x) for x in table)
    # fold the W axis (power-of-two padded) with a log-depth add tree
    Wp = _pad_pow2(W)
    if Wp != W:
        ident = point_identity(ops, (Wp - W, N))
        picked = tuple(
            jnp.concatenate([x, i_], axis=-2) for x, i_ in zip(picked, ident)
        )
    X, Y, Z = picked
    n = Wp
    while n > 1:
        half = n // 2
        left = (X[..., :half, :], Y[..., :half, :], Z[..., :half, :])
        right = (X[..., half:, :], Y[..., half:, :], Z[..., half:, :])
        X, Y, Z = point_add(ops, left, right)
        n = half
    return (X[..., 0, :], Y[..., 0, :], Z[..., 0, :])


@functools.lru_cache(maxsize=None)
def _jit_fixed_base_tables(group: DeviceGroup, c: int):
    return jax.jit(lambda base: fixed_base_tables(group.ops, base, c))


@functools.lru_cache(maxsize=None)
def _jit_batch_mul_comb(group: DeviceGroup, n: int, w: int, c: int):
    return jax.jit(
        lambda table, digits: batch_mul_comb(group.ops, table, digits, c)
    )


_COMB_C = 8


def batch_mul_comb_host(group: DeviceGroup, base, exps: Sequence[int]) -> List:
    """[base * e for e in exps] via device comb tables (wNAF-table analog)."""
    n = len(exps)
    if n == 0:
        return []
    m = _pad_pow2(n)
    sc = list(exps) + [0] * (m - n)
    c = _COMB_C
    W = -(-255 // c)
    digits = np.zeros((W, m), np.int32)
    for i, s in enumerate(sc):
        s = int(s)
        for w in range(W):
            digits[w, i] = (s >> (w * c)) & ((1 << c) - 1)
    base_dev = tuple(x[..., 0] for x in group.encode_points([base]))
    table = _jit_fixed_base_tables(group, c)(base_dev)
    out = _jit_batch_mul_comb(group, m, W, c)(table, jnp.asarray(digits))
    return group.decode_points(out)[:n]


def batch_mul_host(group: DeviceGroup, base, exps: Sequence[int]) -> List:
    """[base * e for e in exps] on device.

    Replaces the reference's wNAF table path (generator.rs:311-328).
    Strategy: BMT_FIXED_BASE=comb opts into the comb-table kernel (fewer
    group ops); the default ladder has predictable compile times on the TPU
    toolchain.
    """
    import os

    if os.environ.get("BMT_FIXED_BASE") == "comb":
        return batch_mul_comb_host(group, base, exps)
    n = len(exps)
    if n == 0:
        return []
    nbits = max(max(e.bit_length() for e in exps), 1)
    m = _pad_pow2(n)
    sc = list(exps) + [0] * (m - n)
    B = group.encode_points([base])
    bits = scalars_to_bits(sc, nbits)
    out = _jit_batch_mul(group, m, nbits)(B, bits)
    return group.decode_points(out)[:n]
