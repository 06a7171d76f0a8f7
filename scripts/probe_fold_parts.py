"""Decompose the RNS window fold's per-window cost on the real chip.

The round-5 config sweep showed the fold is NOT dispatch-bound (merging
windows into wider folds made it slower), so this probe isolates where a
window's ~2 ms actually goes at the bench shape (B=16, N=1024, c=8):

  full      — the shipping msm_table_affine_rns fold loop
  add-only  — same loop with the table gather replaced by a static slice
              (bucket-1 row): pure mixed-add + select cost
  gather    — gathers only, summed as int32 (no point math)
  gather-mm — gather reformulated as a one-hot int8 matmul over the bucket
              axis (batched over bases, contraction on the MXU)

Usage: probe_fold_parts.py [N] [B] [c]
"""

import os
import random
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    log(f"devices: {jax.devices()}")

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves import rns_point as rpt
    from bellman_mpc_tpu.curves.device import g1_device, scalars_to_bits
    from bellman_mpc_tpu.curves.rns_point import rns_g1_ops
    from bellman_mpc_tpu.fields import bls12_381 as bc
    from bellman_mpc_tpu.fields.bls12_381 import R
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        msm_table_affine_rns,
        signed_digits,
        tables_to_rns,
        window_tables_affine,
    )

    hostg = chost.G1
    rng = random.Random(0)
    rops = rns_g1_ops()
    cap = Fraction(128)

    p0 = hostg.mul(hostg.generator, 7)
    bases = []
    for _ in range(min(N, 64)):
        bases.append(p0)
        p0 = hostg.double(p0)
    while len(bases) < N:
        bases.append(bases[len(bases) % 64])

    pts = g1_device.encode_points(bases)
    tab = jax.jit(lambda p_: window_tables_affine(g1_device.ops, p_, c))(pts)
    rt, bound = tables_to_rns(rops, bc.fp, tab)
    rt = jax.block_until_ready(rt)
    del tab
    scal = [[rng.randrange(R) for _ in range(N)] for _ in range(B)]
    bits = jnp.stack([scalars_to_bits(s, 255) for s in scal], axis=1)
    sd = signed_digits(digits_from_bits(bits, c), c)
    W = sd.shape[0]
    xs, ys = rt
    nb = xs.shape[-2]
    C = xs.shape[0]

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    # ---- full fold ----
    f_full = jax.jit(
        lambda t_, d_: msm_table_affine_rns(rops, bc.fp, t_, d_, bound)
    )
    t_full = timeit(f_full, rt, sd)
    log(f"full fold           {t_full*1e3:8.1f} ms ({t_full*1e3/W:.2f} ms/window)")

    # ---- add-only: static bucket-1 row instead of the gather ----
    def fold_addonly(tables, sdigits):
        xs_, ys_ = tables
        sgn = sdigits < 0

        def body(w, acc_res):
            acc = tuple(rpt.RnsVal(rops.f, r, cap) for r in acc_res)
            t_x = jax.lax.dynamic_index_in_dim(xs_, w, xs_.ndim - 3, False)
            t_y = jax.lax.dynamic_index_in_dim(ys_, w, ys_.ndim - 3, False)
            qx_r = jnp.broadcast_to(
                t_x[..., 1, :][:, None, :], (C, B, N)
            ).astype(jnp.int32)
            qy_r = jnp.broadcast_to(
                t_y[..., 1, :][:, None, :], (C, B, N)
            ).astype(jnp.int32)
            qx = rops.wrap(qx_r, bound)
            qy = rops.wrap(qy_r, bound)
            inf = jnp.logical_and(
                rops.is_stored_zero(qx), rops.is_stored_zero(qy)
            )
            sg = jax.lax.dynamic_index_in_dim(sgn, w, 0, keepdims=False)
            qy = rops.select(sg, qy.neg(), qy)
            added = rpt.point_add_mixed(rops, acc, (qx, qy))
            out = rpt.point_select(
                rops, inf, acc, tuple(rops.wrap(v.res, cap) for v in added)
            )
            return tuple(v.res for v in out)

        acc0 = rpt.point_identity(rops, (B, N))
        return jax.lax.fori_loop(0, W, body, tuple(v.res for v in acc0))

    t_add = timeit(jax.jit(fold_addonly), rt, sd)
    log(f"add-only fold       {t_add*1e3:8.1f} ms ({t_add*1e3/W:.2f} ms/window)")

    # ---- gather-only ----
    def gathers_only(tables, sdigits):
        xs_, ys_ = tables
        mag = jnp.abs(sdigits).reshape((1, W, B, N))
        ind = mag[..., None, :]

        def body(w, acc):
            def pick(t):
                t_w = jax.lax.dynamic_index_in_dim(t, w, t.ndim - 3, False)
                i_w = jax.lax.dynamic_index_in_dim(ind, w, 1, keepdims=False)
                return jnp.take_along_axis(t_w[..., None, :], i_w, axis=-3)[
                    ..., 0, :
                ].astype(jnp.int32)

            return acc + pick(xs_) + pick(ys_)

        return jax.lax.fori_loop(
            0, W, body, jnp.zeros((C, B, N), jnp.int32)
        )

    t_gather = timeit(jax.jit(gathers_only), rt, sd)
    log(f"gather-only         {t_gather*1e3:8.1f} ms ({t_gather*1e3/W:.2f} ms/window)")

    # ---- one-hot matmul gather ----
    def gathers_mm(tables, sdigits):
        xs_, ys_ = tables  # (C, W, nb, N) int16
        mag = jnp.abs(sdigits)  # (W, B, N)

        def body(w, acc):
            oh = (
                jax.lax.dynamic_index_in_dim(mag, w, 0, False)[None]
                == jnp.arange(nb, dtype=jnp.int32)[:, None, None]
            ).astype(jnp.int8)  # (nb, B, N)

            def pick(t):
                t_w = jax.lax.dynamic_index_in_dim(t, w, 1, False)  # (C,nb,N)
                lo = (t_w & 63).astype(jnp.int8)
                hi = (t_w >> 6).astype(jnp.int8)
                # batched over N: (N, C, nb) x (N, nb, B) -> (N, C, B)
                def bmm(a8):
                    return jax.lax.dot_general(
                        jnp.transpose(a8, (2, 0, 1)),
                        jnp.transpose(oh, (2, 0, 1)),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )  # (N, C, B)

                v = bmm(lo) + (bmm(hi) << 6)
                return jnp.transpose(v, (1, 2, 0))  # (C, B, N)

            return acc + pick(xs_) + pick(ys_)

        return jax.lax.fori_loop(
            0, W, body, jnp.zeros((C, B, N), jnp.int32)
        )

    t_mm = timeit(jax.jit(gathers_mm), rt, sd)
    log(f"one-hot mm gather   {t_mm*1e3:8.1f} ms ({t_mm*1e3/W:.2f} ms/window)")


if __name__ == "__main__":
    main()
