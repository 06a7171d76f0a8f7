"""Chip probe: Pallas RNS multiply vs the XLA mul_many at fold shapes.

Checks exactness on random canonical residues and times both at the
bench fold shape (S stacked pairs x B x N lanes).

Usage: probe_pallas_rns.py [S] [B] [N] [block]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    block = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    log(f"devices: {jax.devices()}")

    from bellman_mpc_tpu.curves.rns_point import default_rns_field
    from bellman_mpc_tpu.fields.rns import RnsVal
    from bellman_mpc_tpu.ops.pallas_kernels import rns_mul_many_pallas

    f = default_rns_field()
    rng = np.random.default_rng(5)
    # random canonical residues (any residue vector is a valid input)
    mvec = np.asarray(f.m_np, np.int64).reshape(f.C, 1, 1, 1)
    xs = (rng.integers(0, 1 << 30, (f.C, S, B, N)) % mvec).astype(np.int32)
    ys = (rng.integers(0, 1 << 30, (f.C, S, B, N)) % mvec).astype(np.int32)
    xs_d, ys_d = jnp.asarray(xs), jnp.asarray(ys)

    from fractions import Fraction

    def xla_mul(x, y):
        a = RnsVal(f, x, Fraction(f.Mmin // f.p // 2))
        b = RnsVal(f, y, Fraction(1))
        pairs = [
            (RnsVal(f, x[:, i], a.a), RnsVal(f, y[:, i], b.a))
            for i in range(S)
        ]
        outs = f.mul_many(pairs)
        return jnp.stack([o.res for o in outs], axis=1)

    f_xla = jax.jit(xla_mul)
    f_pal = jax.jit(lambda x, y: rns_mul_many_pallas(f, x, y, block=block))

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return out, (time.time() - t0) / iters

    out_x, t_x = timeit(f_xla, xs_d, ys_d)
    out_p, t_p = timeit(f_pal, xs_d, ys_d)
    same = bool((np.asarray(out_x) == np.asarray(out_p)).all())
    lanes = S * B * N
    log(
        f"shape (C,{S},{B},{N}) = {lanes} lanes block={block}: "
        f"XLA {t_x*1e3:.2f} ms, Pallas {t_p*1e3:.2f} ms "
        f"({t_x/t_p:.2f}x), exact={same}"
    )
    print({"xla_ms": round(t_x * 1e3, 2), "pallas_ms": round(t_p * 1e3, 2), "exact": same}, flush=True)


if __name__ == "__main__":
    main()
