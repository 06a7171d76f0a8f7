"""Is the RNS fold VPU-bound on EMULATED int32 multiplies?

Residues < 2^12 and channel products < 2^24 are exactly representable in
f32, where the VPU's FMA is the native fast path.  Compare at fold shape:

  int32 ops:  t = barrett(x * y)            (the shipping formulation)
  f32 ops:    same math with x, y, t in f32 (exact by range)
  int32 mul only / f32 mul only             (raw multiply cost)

Usage: probe_f32_rns.py [lanes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 6 * 16 * 1024

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    log(f"devices: {jax.devices()}")

    from bellman_mpc_tpu.curves.rns_point import default_rns_field

    f = default_rns_field()
    C = f.C
    rng = np.random.default_rng(3)
    m64 = np.asarray(f.m_np, np.int64).reshape(C, 1)
    x = (rng.integers(0, 1 << 30, (C, lanes)) % m64).astype(np.int32)
    y = (rng.integers(0, 1 << 30, (C, lanes)) % m64).astype(np.int32)
    xi = jnp.asarray(x)
    yi = jnp.asarray(y)
    xf = jnp.asarray(x.astype(np.float32))
    yf = jnp.asarray(y.astype(np.float32))
    m_i = jnp.asarray(f.m_np.reshape(C, 1))
    m_f = jnp.asarray(f.m_np.astype(np.float32).reshape(C, 1))
    inv_f = jnp.asarray((1.0 / f.m_np.astype(np.float64)).astype(np.float32).reshape(C, 1))

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return out, (time.time() - t0) / iters

    @jax.jit
    def bar_i32(a, b):
        t = a * b
        q = jnp.floor(t.astype(jnp.float32) * inv_f).astype(jnp.int32)
        r = t - q * m_i
        r = jnp.where(r < 0, r + m_i, r)
        return jnp.where(r >= m_i, r - m_i, r)

    @jax.jit
    def bar_f32(a, b):
        t = a * b  # exact: < 2^24
        q = jnp.floor(t * inv_f)
        r = t - q * m_f
        r = jnp.where(r < 0, r + m_f, r)
        return jnp.where(r >= m_f, r - m_f, r)

    @jax.jit
    def mul_i32(a, b):
        return a * b

    @jax.jit
    def mul_f32(a, b):
        return a * b

    o1, t1 = timeit(bar_i32, xi, yi)
    o2, t2 = timeit(bar_f32, xf, yf)
    _, t3 = timeit(mul_i32, xi, yi)
    _, t4 = timeit(mul_f32, xf, yf)
    same = bool(
        (np.asarray(o1) == np.asarray(o2).astype(np.int32)).all()
    )
    log(f"barrett(x*y) int32: {t1*1e3:.3f} ms | f32: {t2*1e3:.3f} ms ({t1/t2:.2f}x) exact_match={same}")
    log(f"raw mul     int32: {t3*1e3:.3f} ms | f32: {t4*1e3:.3f} ms ({t3/t4:.2f}x)")


if __name__ == "__main__":
    main()
