"""Bisect: how many tree_reduce halving levels does the miscompile need?

Feeds canonically-encoded random points at (B, N) and runs k halving
levels (point_add of slice halves) + bridge in ONE jit, k = 1..log2(N),
checking every output lane against host sums.  probe_tree_level showed a
single standalone point_add is exact; the full tree_reduce is not.
Usage: probe_tree_depth.py [B] [N] [kmax]
"""

import os
import random
import sys
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    kmax = int(sys.argv[3]) if len(sys.argv) > 3 else 3

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
    n = B * N
    P = [hostg.mul(hostg.generator, rng.randrange(1, 2**60)) for _ in range(n)]
    Px = encode_res([pt[0] * M % f.p for pt in P], (B, N))
    Py = encode_res([pt[1] * M % f.p for pt in P], (B, N))
    Pz = encode_res([M % f.p] * n, (B, N))

    # host: after k levels, lane (b, j) = sum over i of P[b, j + i*N/2^k]
    import functools

    for k in range(1, kmax + 1):

        @functools.partial(jax.jit, static_argnums=())
        def run_k(px, py, pz, k=k):
            X, Y, Z = (RnsVal(f, r, cap) for r in (px, py, pz))
            m = px.shape[-1]
            for _ in range(k):
                m //= 2
                left = tuple(
                    rpt.RnsVal(f, v.res[..., :m], v.a) for v in (X, Y, Z)
                )
                right = tuple(
                    rpt.RnsVal(f, v.res[..., m:], v.a) for v in (X, Y, Z)
                )
                X, Y, Z = rpt.point_add(rops, left, right)
                X, Y, Z = (rops.wrap(v.res, cap) for v in (X, Y, Z))
            return rpt.rns_point_to_limb(rops, f, bc.fp, (X, Y, Z))

        out = run_k(Px, Py, Pz)
        width = N >> k
        pts_out = g1_device.decode_points(
            tuple(x.reshape(x.shape[0], -1) for x in out)
        )
        bad = 0
        for b in range(B):
            for j in range(width):
                want = None
                for i in range(1 << k):
                    want_pt = P[b * N + j + i * width]
                    want = want_pt if want is None else hostg.add(want, want_pt)
                if not hostg.eq(pts_out[b * width + j], want):
                    bad += 1
        print(f"k={k} width={width}: bad {bad}/{B*width}", flush=True)


if __name__ == "__main__":
    main()
