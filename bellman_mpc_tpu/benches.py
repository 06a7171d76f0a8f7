"""Criterion-style micro-benchmark suite.

Ports the reference's bench harnesses:
  * `bench_batch_verify` — batched vs unbatched verification sweep over
    n in {8, 16, ..., 64} (bellman/src/batch.rs:15-94),
  * `bench_parts` — G1 multiexp at 2^16 points (bellman/src/slow.rs:14-44),
plus TPU-specific kernel benches (NTT, batched pairing).

Run: python -m bellman_mpc_tpu.benches [--quick]
Results print as JSON lines to stdout (one per bench).
"""

from __future__ import annotations

import json
import random
import sys
import time


def _emit(name: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"bench": name, "value": round(value, 4), "unit": unit, **extra}), flush=True)


def bench_batch_verify(quick: bool = False) -> None:
    """batch.rs:15-94: amortized verify cost, batched vs unbatched."""
    from .groth16 import (
        create_random_proof,
        generate_random_parameters,
        prepare_verifying_key,
        verify_proof,
    )
    from .groth16.bls12 import BLS12_381
    from .groth16.verifier_batch import BatchVerifier
    from .models import MiMCDemo, mimc, mimc_constants

    host = BLS12_381.fr_host
    rounds = 20 if quick else 322
    constants = mimc_constants(host, seed=1, rounds=rounds)
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    pvk = prepare_verifying_key(BLS12_381, params.vk)

    rng = random.Random(2)
    sizes = [8] if quick else [8, 16, 32, 64]
    max_n = max(sizes)
    items = []
    for _ in range(max_n):
        xl, xr = rng.randrange(host.p), rng.randrange(host.p)
        proof = create_random_proof(BLS12_381, MiMCDemo(constants, xl, xr), params)
        items.append((proof, [mimc(host, xl, xr, constants)]))

    t0 = time.perf_counter()
    verify_proof(BLS12_381, pvk, items[0][0], items[0][1])
    _emit("verify_single", time.perf_counter() - t0, "s/proof")

    for n in sizes:
        bv = BatchVerifier()
        for it in items[:n]:
            bv.queue(it)
        t0 = time.perf_counter()
        bv.verify(BLS12_381, params.vk, random.Random(3))
        dt = time.perf_counter() - t0
        _emit("batch_verify", dt / n, "s/proof", n=n, total_s=round(dt, 3))


def bench_multiexp(quick: bool = False) -> None:
    """slow.rs:14-44: G1 multiexp throughput."""
    from .curves import host as chost
    from .curves.device import g1_device
    from .fields.bls12_381 import R
    from .ops.msm import msm_pippenger_host

    rng = random.Random(4)
    log_n = 10 if quick else 16
    n = 1 << log_n
    base = chost.G1.generator
    # distinct small multiples are enough for a throughput bench
    bases = [chost.G1.mul(base, k + 1) for k in range(64)] * (n // 64)
    scalars = [rng.randrange(R) for _ in range(n)]

    t0 = time.perf_counter()
    msm_pippenger_host(g1_device, bases, scalars, c=8)
    dt = time.perf_counter() - t0
    _emit("multiexp_g1", n / dt, "points/s", n=n, total_s=round(dt, 3))


def bench_ntt(quick: bool = False) -> None:
    from .fields.bls12_381 import fr, fr_host
    from .ops.domain import EvaluationDomain
    import jax

    rng = random.Random(5)
    log_n = 10 if quick else 18
    n = 1 << log_n
    d = EvaluationDomain.from_coeffs(
        fr, fr_host, [rng.randrange(fr_host.p) for _ in range(n)]
    )
    d.fft()  # compile + warm
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        d.fft()
    jax.block_until_ready(d.coeffs)
    dt = (time.perf_counter() - t0) / iters
    _emit("ntt_fr", n * log_n / 2 / dt, "butterflies/s", n=n, total_s=round(dt, 4))


def bench_pairing(quick: bool = False) -> None:
    from .curves import host as chost
    from .ops.pairing import pairing_batch
    import jax

    n = 8 if quick else 128
    g1s = [chost.G1.mul(chost.G1.generator, k + 1) for k in range(n)]
    g2s = [chost.G2.mul(chost.G2.generator, k + 2) for k in range(n)]
    pairing_batch(g1s[:n], g2s[:n])  # compile + warm
    t0 = time.perf_counter()
    pairing_batch(g1s, g2s)
    dt = time.perf_counter() - t0
    _emit("pairing_batch", n / dt, "pairings/s", n=n, total_s=round(dt, 3))


def bench_scaling(quick: bool = False) -> None:
    """WEAK-scaling of the sharded table MSM over mesh sizes (SURVEY §2.6).

    Weak scaling: the per-device base count n_per is FIXED and the problem
    grows with the mesh (total N = d * n_per), so ideal scaling is constant
    wall time; efficiency = t(1 device) / t(d devices).  The kernel is the
    SHIPPING signed-affine gather-table strategy sharded over the "model"
    axis (parallel/sharded.sharded_msm_table_affine — ICI all_gather +
    add-tree combine), the mesh analog of the reference's window-parallel
    Pippenger decomposition (bellman/src/multiexp.rs:238-249).

    On a multi-chip slice this measures ICI scaling; on the CPU test backend
    it validates the harness on virtual devices (BASELINE.md target >=80%).
    """
    import jax
    import jax.numpy as jnp

    from .curves import host as chost
    from .curves.device import g1_device, scalars_to_bits
    from .fields.bls12_381 import R
    from .ops.msm import (
        digits_from_bits,
        signed_digits,
        window_tables_affine,
    )
    from .parallel.mesh import make_mesh
    from .parallel.sharded import sharded_msm_table_affine

    rng = random.Random(7)
    n_dev = len(jax.devices())
    n_per = 64 if quick else 128  # bases PER DEVICE (weak scaling)
    c = 4
    B = 2
    sizes = [d for d in (1, 2, 4, 8) if d <= n_dev]
    n_max = n_per * max(sizes)
    bases = [chost.G1.mul(chost.G1.generator, k + 1) for k in range(64)] * (
        n_max // 64
    )
    pts_all = g1_device.encode_points(bases)
    tables_all = jax.jit(
        lambda p: window_tables_affine(g1_device.ops, p, c)
    )(pts_all)
    scalars = [[rng.randrange(R) for _ in range(n_max)] for _ in range(B)]
    bits_all = jnp.stack([scalars_to_bits(s, 255) for s in scalars], axis=1)
    sd_all = signed_digits(digits_from_bits(bits_all, c), c)

    t1 = None
    rate1 = None
    for d in sizes:
        n = n_per * d
        tables = tuple(t[..., :n] for t in tables_all)
        sd = sd_all[..., :n]
        mesh = make_mesh(d, shape=(1, d))
        fn = jax.jit(
            lambda t_, s_, m=mesh: sharded_msm_table_affine(
                m, g1_device.ops, t_, s_
            )
        )
        t0 = time.perf_counter()
        out = fn(tables, sd)
        jax.block_until_ready(out)
        warm = time.perf_counter() - t0
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(tables, sd)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        rate = B * n / dt
        if t1 is None:
            t1, rate1 = dt, rate
        # Weak scaling: ideal = flat wall time as N grows with d
        # (efficiency_time = t1/td).  On the shared-core CPU emulation the
        # d virtual devices compete for the same host cores, so the honest
        # ideal there is flat POINTS/S (efficiency_rate = rate_d/rate_1);
        # on a real slice each shard runs on its own chip and the two
        # metrics coincide.
        _emit(
            "sharded_table_msm_weak_scaling", rate, "points/s",
            devices=d, n_total=n, n_per_device=n_per,
            time_s=round(dt, 4), efficiency_time=round(t1 / dt, 3),
            efficiency_rate=round(rate / rate1, 3),
            compile_s=round(warm, 2),
        )


def main() -> None:
    quick = "--quick" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    benches = {
        "batch_verify": bench_batch_verify,
        "multiexp": bench_multiexp,
        "ntt": bench_ntt,
        "pairing": bench_pairing,
        "scaling": bench_scaling,
    }
    for name, fn in benches.items():
        if only and name not in only:
            continue
        print(f"# {name}", file=sys.stderr, flush=True)
        fn(quick)


if __name__ == "__main__":
    main()
