"""Test whether the standalone RNS MSM miscompile is in the program's
output tail: same failing config (N=128, B=16, c=8 fold+reduce+bridge),
with different tails after the bridge:

  base : return bridged (L, B, 1) directly          [known MISMATCH]
  aff  : continue into limb to_affine inside the jit [mimics the bench]
  dup  : return width-2 concat of the bridge output
  bar  : optimization_barrier on the output tuple

Usage: probe_output_tail.py [N] [B] [c]
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves.device import (
        g1_device,
        scalars_to_bits,
        to_affine,
    )
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

    want = [hostg.msm(bases, scal[b]) for b in range(2)]

    def check(name, pts_got):
        bad = sum(
            0 if hostg.eq(pts_got[b], want[b]) else 1 for b in range(2)
        )
        print(f"{name}: {'OK' if bad == 0 else f'MISMATCH ({bad}/2)'}", flush=True)

    @jax.jit
    def f_base(t_, d_):
        return msm_table_affine_rns(rops, bc.fp, t_, d_, bound)

    @jax.jit
    def f_aff(t_, d_):
        out = msm_table_affine_rns(rops, bc.fp, t_, d_, bound)
        return to_affine(g1_device.ops, out)

    @jax.jit
    def f_dup(t_, d_):
        out = msm_table_affine_rns(rops, bc.fp, t_, d_, bound)
        return tuple(jnp.concatenate([x, x], axis=-1) for x in out)

    @jax.jit
    def f_bar(t_, d_):
        out = msm_table_affine_rns(rops, bc.fp, t_, d_, bound)
        return jax.lax.optimization_barrier(out)

    out = f_base(rt, sd)
    check("base", g1_device.decode_points(tuple(x[..., 0] for x in out)))

    x, y, inf = f_aff(rt, sd)
    import numpy as np

    xs = g1_device.ops.decode(x)
    ys = g1_device.ops.decode(y)
    infs = np.asarray(inf).reshape(-1)
    pts_aff = [
        None if i else (xv, yv) for xv, yv, i in zip(xs, ys, infs)
    ]
    check("aff ", pts_aff)

    out = f_dup(rt, sd)
    check("dup ", g1_device.decode_points(tuple(x[..., 0] for x in out)))

    out = f_bar(rt, sd)
    check("bar ", g1_device.decode_points(tuple(x[..., 0] for x in out)))


if __name__ == "__main__":
    main()
