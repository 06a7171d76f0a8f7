"""Bisect the merged segmented RNS G1 fold on the real chip.

BENCH_r03 failed with the merged fold at seg_sizes=(1024,1024,1024,512),
c=8, B=16 while the unmerged per-MSM folds verify.  This script builds the
exact same structure standalone and compares, per segment:

    merged msm_table_affine_rns(seg_sizes=...)   vs
    unmerged msm_table_affine_rns per set        vs
    host oracle MSM

Usage: python scripts/repro_seg_rns.py [seg_sizes csv] [B] [c]
       e.g. python scripts/repro_seg_rns.py 1024,1024,1024,512 16 8

Hypothesis being tested: the concatenated int16 RNS table at bench shape is
~2.17 GB per coordinate (71ch * 33W * 129nb * 3584N * 2B = 1.08e9 elements),
crossing the 2^31-byte line where TPU gather offset arithmetic can go wrong;
smaller merged shapes should pass, bench shape should fail.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    segs = tuple(
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1024,1024,1024,512").split(",")
    )
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    print("devices:", jax.devices(), flush=True)

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

    # distinct cheap bases per set: doubling chains from k*G starts
    def make_bases(n, start):
        p = hostg.mul(hostg.generator, start)
        out = []
        for _ in range(min(n, 64)):
            out.append(p)
            p = hostg.double(p)
        while len(out) < n:
            out.append(out[len(out) % 64])
        return out

    base_sets = [make_bases(n, 3 + 5 * i) for i, n in enumerate(segs)]

    rns_tabs, bound = [], None
    t0 = time.time()
    for bs in base_sets:
        pts = g1_device.encode_points(bs)
        tab = jax.jit(lambda p_: window_tables_affine(g1_device.ops, p_, c))(pts)
        rt, bound = tables_to_rns(rops, bc.fp, tab)
        rt = jax.block_until_ready(rt)
        del tab
        rns_tabs.append(rt)
    merged = tuple(
        jnp.concatenate([t[k] for t in rns_tabs], axis=-1) for k in range(2)
    )
    per_coord_gb = merged[0].size * 2 / 1e9
    print(
        f"tables built {time.time()-t0:.1f}s; merged coord {per_coord_gb:.2f} GB "
        f"({merged[0].size:.3e} elems)",
        flush=True,
    )

    # scalars per set
    scal_sets = [
        [[rng.randrange(R) for _ in range(n)] for _ in range(B)] for n in segs
    ]
    bits_sets = [
        jnp.stack([scalars_to_bits(s, 255) for s in ss], axis=1)
        for ss in scal_sets
    ]

    sd_sets = [signed_digits(digits_from_bits(b, c), c) for b in bits_sets]
    bits_merged = jnp.concatenate(bits_sets, axis=-1)
    sd_merged = signed_digits(digits_from_bits(bits_merged, c), c)

    # --- unmerged folds (reference device answer) ---
    f_un = jax.jit(
        lambda t_, d_: msm_table_affine_rns(rops, bc.fp, t_, d_, bound)
    )
    un_results = []
    for rt, sd in zip(rns_tabs, sd_sets):
        out = f_un(rt, sd)
        jax.block_until_ready(out)
        un_results.append(g1_device.decode_points(tuple(x[..., 0] for x in out)))
    print("unmerged folds done", flush=True)

    # --- merged segmented fold ---
    f_m = jax.jit(
        lambda t_, d_: msm_table_affine_rns(
            rops, bc.fp, t_, d_, bound, seg_sizes=segs
        )
    )
    t0 = time.time()
    out_m = f_m(merged, sd_merged)
    jax.block_until_ready(out_m)
    print(f"merged fold compile+run {time.time()-t0:.1f}s", flush=True)
    merged_pts = [
        g1_device.decode_points(tuple(x[..., s] for x in out_m))
        for s in range(len(segs))
    ]

    fail = False
    for s, n in enumerate(segs):
        for b in range(min(B, 2)):
            want = hostg.msm(base_sets[s], scal_sets[s][b])
            ok_un = hostg.eq(un_results[s][b], want)
            ok_m = hostg.eq(merged_pts[s][b], want)
            print(
                f"seg[{s}] N={n} b={b}: unmerged {'OK' if ok_un else 'MISMATCH'} "
                f"merged {'OK' if ok_m else 'MISMATCH'}",
                flush=True,
            )
            fail |= not (ok_un and ok_m)
    print("RESULT:", "FAIL" if fail else "ALL OK", flush=True)
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
