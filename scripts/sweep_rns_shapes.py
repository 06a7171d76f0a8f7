"""Map the RNS gather-fold pass/fail boundary over table width N on chip.

Round-4 debugging: msm_table_affine_rns returns wrong results at some base
widths (N=128/256 observed) while others (N=8/32/64/896, and the bench's
512/1024) verify.  This sweep pins the boundary so the shipping path can
guard against bad shapes.  Usage: python scripts/sweep_rns_shapes.py [Ns csv]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    Ns = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "128,256,512,1024").split(",")]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bellman_mpc_tpu.curves import host as chost
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

    def make_bases(n, start):
        p = hostg.mul(hostg.generator, start)
        out = []
        for _ in range(min(n, 64)):
            out.append(p)
            p = hostg.double(p)
        while len(out) < n:
            out.append(out[len(out) % 64])
        return out

    for N in Ns:
        bs = make_bases(N, 7)
        pts = g1_device.encode_points(bs)
        t0 = time.time()
        tab = jax.jit(lambda p_: window_tables_affine(g1_device.ops, p_, c))(pts)
        rt, bound = tables_to_rns(rops, bc.fp, tab)
        rt = jax.block_until_ready(rt)
        del tab
        t_build = time.time() - t0
        scal = [[rng.randrange(R) for _ in range(N)] for _ in range(B)]
        bits = jnp.stack([scalars_to_bits(s, 255) for s in scal], axis=1)
        sd = signed_digits(digits_from_bits(bits, c), c)
        t0 = time.time()
        out = jax.jit(
            lambda t_, d_: msm_table_affine_rns(rops, bc.fp, t_, d_, bound)
        )(rt, sd)
        got = g1_device.decode_points(tuple(x[..., 0] for x in out))
        t_fold = time.time() - t0
        oks = []
        for b in range(2):
            want = hostg.msm(bs, scal[b])
            oks.append(hostg.eq(got[b], want))
        print(
            f"N={N} B={B} c={c}: {'OK' if all(oks) else 'MISMATCH'} "
            f"(build {t_build:.0f}s fold {t_fold:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
