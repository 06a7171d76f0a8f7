"""Multi-output probe of the failing standalone RNS MSM program.

ONE jit computes fold accumulator + every tree level + bridge and outputs
ALL of them; host checks each transition independently:
  - acc lane (b,n) == k[b,n] * P[n]
  - level_j lane == level_{j-1} lane pair sum (checked in RNS decode space)
This localizes the in-context divergence stage.  Usage: probe_stages.py [N] [B] [c]
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

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves import rns_point as rpt
    from bellman_mpc_tpu.curves.device import g1_device, scalars_to_bits
    from bellman_mpc_tpu.curves.rns_point import rns_g1_ops
    from bellman_mpc_tpu.fields import bls12_381 as bc
    from bellman_mpc_tpu.fields.bls12_381 import R
    from bellman_mpc_tpu.fields.rns import RnsVal
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        signed_digits,
        tables_to_rns,
        window_tables_affine,
    )

    hostg = chost.G1
    rng = random.Random(0)
    rops = rns_g1_ops()
    f = rops.f
    p = f.p
    Minv = pow(f.M, -1, p)

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

    cap = Fraction(256 if rops.fp2 else 128)

    @jax.jit
    def staged(tables, sdigits):
        W, B_, N_ = sdigits.shape
        xs, ys = tables
        coord_rank = xs.ndim
        mag = jnp.abs(sdigits).reshape((1,) * (coord_rank - 3) + (W, B_, N_))
        ind = mag[..., None, :]
        sgn = sdigits < 0

        def body(w, acc_res):
            acc = tuple(rpt.RnsVal(f, r, cap) for r in acc_res)

            def pick(t):
                t_w = jax.lax.dynamic_index_in_dim(t, w, t.ndim - 3, keepdims=False)
                i_w = jax.lax.dynamic_index_in_dim(ind, w, ind.ndim - 4, keepdims=False)
                return jnp.take_along_axis(t_w[..., None, :], i_w, axis=-3)[
                    ..., 0, :
                ].astype(jnp.int32)

            qx = rops.wrap(pick(xs), bound)
            qy = rops.wrap(pick(ys), bound)
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

        acc0 = rpt.point_identity(rops, (B_, N_))
        acc_res = jax.lax.fori_loop(0, W, body, tuple(v.res for v in acc0))
        levels = [acc_res]
        X, Y, Z = (rops.wrap(r, cap) for r in acc_res)
        n = N_
        while n > 1:
            m = n // 2
            left = tuple(rops.wrap(v.res[..., :m], v.a) for v in (X, Y, Z))
            right = tuple(rops.wrap(v.res[..., m:], v.a) for v in (X, Y, Z))
            X, Y, Z = rpt.point_add(rops, left, right)
            X, Y, Z = (rops.wrap(v.res, cap) for v in (X, Y, Z))
            levels.append((X.res, Y.res, Z.res))
            n = m
        return levels

    levels = staged(rt, sd)
    levels = jax.block_until_ready(levels)

    def decode_level(lv):
        # (C, B, w) residues -> host ints per lane per coord
        out = []
        for r in lv:
            arr = np.asarray(r)
            w = arr.shape[-1]
            vals = f.decode(RnsVal(f, jnp.asarray(arr), cap), mont=False)
            out.append(np.asarray(vals, dtype=object).reshape(B, w))
        return out  # [X, Y, Z] each (B, w) of ints (M-residue removed? no: raw)

    # raw decode returns integer value mod p of the stored residues
    # (mont=False: value as-is).  Stored values are x*M mod p (M-residues).
    def to_proj(vals_xyz, b, j):
        X = vals_xyz[0][b][j] * Minv % p
        Y = vals_xyz[1][b][j] * Minv % p
        Z = vals_xyz[2][b][j] * Minv % p
        return (X, Y, Z)

    def proj_eq(pt, aff):
        X, Y, Z = pt
        if aff is None:
            return Z == 0
        if Z == 0:
            return False
        zi = pow(Z, -1, p)
        return (X * zi % p) == aff[0] and (Y * zi % p) == aff[1]

    def proj_add_host(p1, p2):
        # convert to affine via host and add (both may be multiples of G)
        def to_aff(pt):
            X, Y, Z = pt
            if Z == 0:
                return None
            zi = pow(Z, -1, p)
            return (X * zi % p, Y * zi % p)

        a1, a2 = to_aff(p1), to_aff(p2)
        if a1 is None:
            return a2
        if a2 is None:
            return a1
        return hostg.add(a1, a2)

    # stage 0: acc vs k*P
    lv0 = decode_level(levels[0])
    bad0 = 0
    for b in range(B):
        for n_ in range(N):
            want = hostg.mul(bases[n_], scal[b][n_])
            if not proj_eq(to_proj(lv0, b, n_), want):
                bad0 += 1
    print(f"stage acc: bad {bad0}/{B*N}", flush=True)

    prev = lv0
    w = N
    for li in range(1, len(levels)):
        w //= 2
        cur = decode_level(levels[li])
        bad = 0
        for b in range(B):
            for j in range(w):
                want = proj_add_host(
                    to_proj(prev, b, j), to_proj(prev, b, j + w)
                )
                if not proj_eq(to_proj(cur, b, j), want):
                    bad += 1
        print(f"level {li} (width {w}): bad {bad}/{B*w}", flush=True)
        prev = cur


if __name__ == "__main__":
    main()
