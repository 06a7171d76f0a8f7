"""Reference-scale randomized kernel tests (TPU-gated).

The reference validates Pippenger against the naive MSM at 2^14 random
points (bellman/src/multiexp.rs:285-327) and the FFT at comparable sizes
(bellman/src/domain.rs:378-425).  The CPU suite's MSM oracle tests top out
at N<=32/c=4 — which is exactly why a strategy bug that only manifests at
bench scale (N=1024, c=8, B=16; BENCH_r03) survived to the bench.  These
tests run the SHIPPING strategies at bench scale and beyond on the real
chip; enable with BMT_TEST_TPU=1 (they build multi-GB tables and take
minutes each).
"""

import os
import random

import pytest

needs_tpu = pytest.mark.skipif(
    not os.environ.get("BMT_TEST_TPU"),
    reason="bench-scale kernel tests need the real chip (BMT_TEST_TPU=1)",
)


@pytest.fixture(scope="module")
def chip_setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return jax


def _bases(hostg, n, start=7):
    """n distinct-ish bases from a doubling chain (cheap on host)."""
    p = hostg.mul(hostg.generator, start)
    out = []
    for _ in range(min(n, 64)):
        out.append(p)
        p = hostg.double(p)
    while len(out) < n:
        out.append(out[len(out) % 64])
    return out


def _oracle_msm(hostg, bases, scal):
    """Host MSM exploiting _bases' 64-periodicity: fold scalars per
    distinct base first (sum_i k_i P_(i mod 64) = sum_j (sum k) P_j), so
    the oracle costs 64 scalar-muls instead of n — the naive per-point
    oracle at 2^14 points costs ~an hour of pure Python."""
    from bellman_mpc_tpu.fields.bls12_381 import R

    n = len(bases)
    m = min(n, 64)
    sums = [0] * m
    for i, s in enumerate(scal):
        sums[i % m] += s
    acc = None
    for j in range(m):
        acc = hostg.add(acc, hostg.mul(bases[j], sums[j] % R))
    return acc


def _check_msm(strategy, n, B, c, budget_mb=6144):
    import jax
    import jax.numpy as jnp

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves.device import g1_device, scalars_to_bits
    from bellman_mpc_tpu.fields import bls12_381 as bc
    from bellman_mpc_tpu.fields.bls12_381 import R
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        msm_table_affine,
        msm_table_affine_rns,
        signed_digits,
        tables_to_rns,
        window_tables_affine,
    )

    hostg = chost.G1
    rng = random.Random(1234 + n)
    bases = _bases(hostg, n)
    pts = g1_device.encode_points(bases)
    tab = jax.jit(lambda p_: window_tables_affine(g1_device.ops, p_, c))(pts)
    scal = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
    bits = jnp.stack([scalars_to_bits(s, 255) for s in scal], axis=1)
    sd = signed_digits(digits_from_bits(bits, c), c)
    if strategy in ("rns", "rns-pallas"):
        from bellman_mpc_tpu.curves.rns_point import (
            default_rns_field,
            rns_g1_ops,
        )

        rops = rns_g1_ops()
        rt, bound = tables_to_rns(rops, bc.fp, tab)
        del tab
        if strategy == "rns-pallas":
            from bellman_mpc_tpu.ops.pallas_kernels import pad_rns_table

            rt = jax.jit(
                lambda t: pad_rns_table(default_rns_field(), t)
            )(rt)
        out = jax.jit(
            lambda t_, d_: msm_table_affine_rns(rops, bc.fp, t_, d_, bound)
        )(rt, sd)
    else:
        out = jax.jit(lambda t_, d_: msm_table_affine(g1_device.ops, t_, d_))(
            tab, sd
        )
    got = g1_device.decode_points(tuple(x[..., 0] for x in out))
    for b in range(min(B, 2)):
        want = _oracle_msm(hostg, bases, scal[b])
        assert hostg.eq(got[b], want), f"{strategy} N={n} c={c} b={b}"


@needs_tpu
def test_msm_table_affine_bench_scale(chip_setup):
    """Signed-affine limb table MSM at the bench CRS shape (N=1024,c=8,B=16)."""
    _check_msm("table", 1024, 16, 8)


@needs_tpu
def test_msm_table_affine_2e14(chip_setup):
    """multiexp.rs:285-327 parity: 2^14 random points vs the host oracle."""
    _check_msm("table", 1 << 14, 2, 4)


@needs_tpu
def test_msm_rns_bench_scale(chip_setup):
    """RNS/MXU MSM at the bench CRS shapes, incl. the b1 width (N=512).

    Was an xfail through round 4: the slice-based tree_reduce triggered an
    XLA:TPU layout-assignment miscompile when this program was compiled
    STANDALONE (wrong at N>=128, correct inside the full prove step).
    Round 5 reformulated the halving as reshape-based pairwise adds
    (curves/rns_point.tree_reduce), which is exact standalone at every
    probed shape (scripts/probe_fix_variants.py)."""
    _check_msm("rns", 1024, 16, 8)
    _check_msm("rns", 512, 16, 8)


@needs_tpu
def test_msm_rns_pallas_bench_scale(chip_setup):
    """The SHIPPING fold path — padded tables through the Pallas
    whole-mixed-add kernel — at the bench CRS shape, vs the host oracle
    (multiexp.rs:285-327 parity for the round-5 default)."""
    _check_msm("rns-pallas", 1024, 16, 8)


@needs_tpu
def test_ntt_2e14(chip_setup):
    """domain.rs:378-425-class size: device NTT vs host NTT at 2^14."""
    import jax

    from bellman_mpc_tpu.fields.bls12_381 import fr, fr_host
    from bellman_mpc_tpu.ops.domain import ntt, warm_twiddles

    n = 1 << 14
    rng = random.Random(99)
    coeffs = [rng.randrange(fr_host.p) for _ in range(n)]
    warm_twiddles(fr, fr_host, 14)
    x = fr.encode(coeffs)
    out = jax.jit(lambda y: ntt(fr, fr_host, y))(x)
    got = fr.decode(out)

    # host oracle: iterative radix-2 NTT over Python ints
    p = fr_host.p
    omega = fr_host.nth_root_of_unity(14)
    vals = list(coeffs)
    # bit-reversal
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            vals[i], vals[j] = vals[j], vals[i]
    size = 2
    while size <= n:
        wlen = pow(omega, n // size, p)
        for i in range(0, n, size):
            w = 1
            for k in range(i, i + size // 2):
                u, v = vals[k], vals[k + size // 2] * w % p
                vals[k] = (u + v) % p
                vals[k + size // 2] = (u - v) % p
                w = w * wlen % p
        size *= 2
    assert got == vals
