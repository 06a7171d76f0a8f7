"""Lane-level error pattern of the standalone RNS fold on chip.

Runs the msm_table_affine_rns window fold WITHOUT the tree reduction and
checks each accumulator lane against k[b,n] * P[n] on the host.  The spatial
pattern of bad lanes (all? specific n tiles? specific b?) identifies the
miscompiled operation.  Usage: probe_lane_pattern.py [N] [B] [c]
"""

import os
import random
import sys
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves.device import g1_device, scalars_to_bits
    from bellman_mpc_tpu.curves import rns_point as rpt
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
    f = rops.f

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

    cap = Fraction(128)

    @jax.jit
    def fold_only(tables, sdigits):
        # replicate msm_table_affine_rns's fold, return raw accumulator
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
        acc_res = jax.lax.fori_loop(
            0, sdigits.shape[0], body, tuple(v.res for v in acc0)
        )
        acc = tuple(rops.wrap(r, cap) for r in acc_res)
        return rpt.rns_point_to_limb(rops, f, bc.fp, acc)

    out = fold_only(rt, sd)  # limb projective (L, B, N)
    pts_out = g1_device.decode_points(tuple(x.reshape(x.shape[0], -1) for x in out))
    # pts_out: B*N affine points, b-major
    bad = []
    for b in range(B):
        for n in range(N):
            want = hostg.mul(bases[n], scal[b][n])
            got = pts_out[b * N + n]
            if not hostg.eq(got, want):
                bad.append((b, n))
    print(f"bad lanes: {len(bad)} / {B*N}", flush=True)
    from collections import Counter

    bcount = Counter(b for b, _ in bad)
    ncount = Counter(n for _, n in bad)
    print("per-b bad counts:", dict(sorted(bcount.items())), flush=True)
    ns = sorted(ncount)
    print(f"bad n range: {ns[:10]} ... {ns[-10:]}" if ns else "no bad n", flush=True)
    print("bad n mod 128 histogram:", Counter(n % 128 for _, n in bad), flush=True)


if __name__ == "__main__":
    main()
