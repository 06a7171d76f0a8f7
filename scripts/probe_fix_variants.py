"""Try tree_reduce reformulations to dodge the XLA:TPU layout miscompile.

Round-4 bisection (DESIGN-NOTES.md): the STANDALONE rns fold+reduce program
is wrong at N>=128 (B=16, c=8); returning every tree level as a program
output heals it => layout-assignment bug.  This probe runs the same
fold+reduce with different reduction formulations in ONE process and checks
each against the host oracle:

  slice     — current shipping code (v.res[..., :m] / [..., m:])
  reshape2m — reshape (..., n) -> (..., 2, m); halves via index on new axis
  reshapem2 — reshape (..., n) -> (..., m, 2); even/odd pairwise adds
  moveaxis  — transpose the lane axis to front, reduce on leading axis

Usage: probe_fix_variants.py [N] [B] [c] [variants csv]
"""

import os
import random
import sys
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    variants = (
        sys.argv[4].split(",")
        if len(sys.argv) > 4
        else ["slice", "reshape2m", "reshapem2", "moveaxis"]
    )

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("devices:", jax.devices(), flush=True)

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves import rns_point as rpt
    from bellman_mpc_tpu.curves.device import g1_device, scalars_to_bits
    from bellman_mpc_tpu.curves.rns_point import rns_g1_ops
    from bellman_mpc_tpu.fields import bls12_381 as bc
    from bellman_mpc_tpu.fields.bls12_381 import R
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
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

    def fold(tables, sdigits):
        """The window fold (identical to msm_table_affine_rns's loop)."""
        W, B_, N_ = sdigits.shape
        xs, ys = tables
        coord_rank = xs.ndim
        mag = jnp.abs(sdigits).reshape((1,) * (coord_rank - 3) + (W, B_, N_))
        ind = mag[..., None, :]
        sgn = sdigits < 0

        def body(w, acc_res):
            acc = tuple(rpt.RnsVal(rops.f, r, cap) for r in acc_res)

            def pick(t):
                t_w = jax.lax.dynamic_index_in_dim(t, w, t.ndim - 3, keepdims=False)
                i_w = jax.lax.dynamic_index_in_dim(ind, w, ind.ndim - 4, keepdims=False)
                return jnp.take_along_axis(t_w[..., None, :], i_w, axis=-3)[
                    ..., 0, :
                ].astype(jnp.int32)

            qx = rops.wrap(pick(xs), bound)
            qy = rops.wrap(pick(ys), bound)
            inf = jnp.logical_and(rops.is_stored_zero(qx), rops.is_stored_zero(qy))
            sg = jax.lax.dynamic_index_in_dim(sgn, w, 0, keepdims=False)
            qy = rops.select(sg, qy.neg(), qy)
            added = rpt.point_add_mixed(rops, acc, (qx, qy))
            out = rpt.point_select(
                rops, inf, acc, tuple(rops.wrap(v.res, cap) for v in added)
            )
            return tuple(v.res for v in out)

        acc0 = rpt.point_identity(rops, (B_, N_))
        return jax.lax.fori_loop(0, W, body, tuple(v.res for v in acc0))

    def reduce_slice(acc_res):
        X, Y, Z = (rops.wrap(r, cap) for r in acc_res)
        n = X.res.shape[-1]
        while n > 1:
            m = n // 2
            left = tuple(rops.wrap(v.res[..., :m], v.a) for v in (X, Y, Z))
            right = tuple(rops.wrap(v.res[..., m:], v.a) for v in (X, Y, Z))
            X, Y, Z = rpt.point_add(rops, left, right)
            X, Y, Z = (rops.wrap(v.res, cap) for v in (X, Y, Z))
            n = m
        return tuple(v.res for v in (X, Y, Z))

    def reduce_reshape2m(acc_res):
        X, Y, Z = (rops.wrap(r, cap) for r in acc_res)
        n = X.res.shape[-1]
        while n > 1:
            m = n // 2

            def halves(v):
                r2 = v.res.reshape(v.res.shape[:-1] + (2, m))
                return (
                    rops.wrap(r2[..., 0, :], v.a),
                    rops.wrap(r2[..., 1, :], v.a),
                )

            hs = [halves(v) for v in (X, Y, Z)]
            X, Y, Z = rpt.point_add(
                rops, tuple(h[0] for h in hs), tuple(h[1] for h in hs)
            )
            X, Y, Z = (rops.wrap(v.res, cap) for v in (X, Y, Z))
            n = m
        return tuple(v.res for v in (X, Y, Z))

    def reduce_reshapem2(acc_res):
        X, Y, Z = (rops.wrap(r, cap) for r in acc_res)
        n = X.res.shape[-1]
        while n > 1:
            m = n // 2

            def halves(v):
                r2 = v.res.reshape(v.res.shape[:-1] + (m, 2))
                return (
                    rops.wrap(r2[..., 0], v.a),
                    rops.wrap(r2[..., 1], v.a),
                )

            hs = [halves(v) for v in (X, Y, Z)]
            X, Y, Z = rpt.point_add(
                rops, tuple(h[0] for h in hs), tuple(h[1] for h in hs)
            )
            X, Y, Z = (rops.wrap(v.res, cap) for v in (X, Y, Z))
            n = m
        return tuple(v.res for v in (X, Y, Z))

    def reduce_moveaxis(acc_res):
        # lane axis to FRONT, reduce on the leading axis
        res = tuple(jnp.moveaxis(r, -1, 0) for r in acc_res)  # (N, C, B)
        X, Y, Z = (rops.wrap(r, cap) for r in res)
        n = X.res.shape[0]
        while n > 1:
            m = n // 2
            left = tuple(rops.wrap(v.res[:m], v.a) for v in (X, Y, Z))
            right = tuple(rops.wrap(v.res[m:], v.a) for v in (X, Y, Z))
            X, Y, Z = rpt.point_add(rops, left, right)
            X, Y, Z = (rops.wrap(v.res, cap) for v in (X, Y, Z))
            n = m
        return tuple(jnp.moveaxis(v.res, 0, -1) for v in (X, Y, Z))

    reducers = {
        "slice": reduce_slice,
        "reshape2m": reduce_reshape2m,
        "reshapem2": reduce_reshapem2,
        "moveaxis": reduce_moveaxis,
    }

    wants = [hostg.msm(bases, scal[b]) for b in range(B)]

    import time

    for name in variants:
        red = reducers[name]

        @jax.jit
        def prog(tables, sdigits, red=red):
            acc_res = fold(tables, sdigits)
            out_res = red(acc_res)
            out = tuple(rops.wrap(r, cap) for r in out_res)
            return rpt.rns_point_to_limb(rops, rops.f, bc.fp, out)

        t0 = time.time()
        out = jax.block_until_ready(prog(rt, sd))
        dt = time.time() - t0
        got = g1_device.decode_points(tuple(x[..., 0] for x in out))
        bad = sum(0 if hostg.eq(got[b], wants[b]) else 1 for b in range(B))
        print(
            f"variant {name}: {'OK' if bad == 0 else f'MISMATCH {bad}/{B}'}"
            f" (compile+run {dt:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
