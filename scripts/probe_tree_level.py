"""Bisect the RNS tree_reduce failure: which level / op / width breaks?

Part A: pure rpt.point_add on canonical-encoded random points at several
(B, width) shapes, every lane checked against the host add.
Part B: same for point_add_mixed (q affine, z=1).
Usage: probe_tree_level.py
"""

import os
import random
import sys
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves import rns_point as rpt
    from bellman_mpc_tpu.curves.device import g1_device
    from bellman_mpc_tpu.curves.rns_point import rns_g1_ops
    from bellman_mpc_tpu.fields import bls12_381 as bc
    from bellman_mpc_tpu.fields.rns import RnsVal

    rops = rns_g1_ops()
    f = rops.f
    hostg = chost.G1
    rng = random.Random(5)
    M = f.M

    def encode_res(vals, shape):
        out = np.zeros((f.C, len(vals)), np.int32)
        for j, v in enumerate(vals):
            for i, m in enumerate(f.moduli):
                out[i, j] = v % m
        return jnp.asarray(out).reshape((f.C,) + tuple(shape))

    cap = Fraction(128)

    for B, N in [(4, 16), (4, 64), (4, 128), (16, 512)]:
        n = B * N
        P = [hostg.mul(hostg.generator, rng.randrange(1, 2**60)) for _ in range(n)]
        Q = [hostg.mul(hostg.generator, rng.randrange(1, 2**60)) for _ in range(n)]

        def enc_pt(pts):
            xs = encode_res([pt[0] * M % f.p for pt in pts], (B, N))
            ys = encode_res([pt[1] * M % f.p for pt in pts], (B, N))
            zs = encode_res([M % f.p] * n, (B, N))
            return xs, ys, zs

        Px, Py, Pz = enc_pt(P)
        Qx, Qy, Qz = enc_pt(Q)

        @jax.jit
        def run_add(px, py, pz, qx, qy, qz):
            p_ = tuple(RnsVal(f, r, cap) for r in (px, py, pz))
            q_ = tuple(RnsVal(f, r, cap) for r in (qx, qy, qz))
            out = rpt.point_add(rops, p_, q_)
            return rpt.rns_point_to_limb(rops, f, bc.fp, out)

        @jax.jit
        def run_mixed(px, py, pz, qx, qy):
            p_ = tuple(RnsVal(f, r, cap) for r in (px, py, pz))
            q_ = tuple(RnsVal(f, r, Fraction(2)) for r in (qx, qy))
            out = rpt.point_add_mixed(rops, p_, q_)
            return rpt.rns_point_to_limb(rops, f, bc.fp, out)

        for name, out in (
            ("add  ", run_add(Px, Py, Pz, Qx, Qy, Qz)),
            ("mixed", run_mixed(Px, Py, Pz, Qx, Qy)),
        ):
            pts_out = g1_device.decode_points(
                tuple(x.reshape(x.shape[0], -1) for x in out)
            )
            bad = 0
            for i in range(n):
                want = hostg.add(P[i], Q[i])
                if not hostg.eq(pts_out[i], want):
                    bad += 1
            print(f"(B={B},N={N}) {name}: bad {bad}/{n}", flush=True)


if __name__ == "__main__":
    main()
