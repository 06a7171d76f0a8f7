"""Bisect the signed-affine MSM on the real chip at bench scale.

Builds ONE affine table + runs ONE msm_table_affine at (B, N) and checks
the result against the host oracle.  Args: N B c group(g1|g2).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    gname = sys.argv[4] if len(sys.argv) > 4 else "g1"

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    print("devices:", jax.devices(), flush=True)

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves.device import g1_device, g2_device, scalars_to_bits
    from bellman_mpc_tpu.fields.bls12_381 import R
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        msm_table_affine,
        signed_digits,
        window_tables_affine,
    )

    group = g1_device if gname == "g1" else g2_device
    hostg = chost.G1 if gname == "g1" else chost.G2

    rng = random.Random(0)
    # cheap base generation: repeated doubling chain from the generator
    bases = []
    p = hostg.generator
    for _ in range(min(N, 64)):
        bases.append(p)
        p = hostg.double(p)
    while len(bases) < N:
        bases.append(bases[len(bases) % 64])
    t0 = time.time()
    pts = group.encode_points(bases)
    print(f"encode {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    tables = jax.jit(lambda p_: window_tables_affine(group.ops, p_, c))(pts)
    jax.block_until_ready(tables)
    W = tables[0].shape[-3]
    nb = tables[0].shape[-2]
    mb = sum(x.size * 4 for x in tables) / 1e6
    print(f"table build {time.time()-t0:.1f}s W={W} nb={nb} {mb:.0f} MB", flush=True)

    scalar_sets = [[rng.randrange(R) for _ in range(N)] for _ in range(B)]
    bits = jnp.stack([scalars_to_bits(s, 255) for s in scalar_sets], axis=1)
    sd = signed_digits(digits_from_bits(bits, c), c)

    f = jax.jit(lambda t_, d_: msm_table_affine(group.ops, t_, d_))
    t0 = time.time()
    out = f(tables, sd)
    jax.block_until_ready(out)
    print(f"msm compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(3):
        out = f(tables, sd)
    jax.block_until_ready(out)
    print(f"msm steady {1e3*(time.time()-t0)/3:.1f} ms", flush=True)

    got = group.decode_points(tuple(x[..., 0] for x in out))
    for b in range(min(B, 2)):
        want = hostg.msm(bases, scalar_sets[b])
        ok = hostg.eq(got[b], want)
        print(f"check[{b}]: {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            sys.exit(1)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
