"""Benchmark harness — batched MiMC-322 Groth16 proving on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "proofs/sec/chip", "vs_baseline": N}

The canonical benchmark circuit is MiMC LongsightF322p3 (322 rounds, ~1.3k
constraints) — the same circuit the reference times in its 50-sample
prove/verify loop (bellman/src/mimc.rs:51-131).  The reference publishes no
numbers (BASELINE.md); the baseline denominator below is the documented CPU
estimate for the Rust reference's single-process MiMC-322 proving
(BASELINE.md "Targets": ~10 proofs/sec on a multicore host CPU).

Progress/diagnostics go to stderr; stdout carries exactly the JSON line.
"""

import json
import sys
import time

BASELINE_PROOFS_PER_SEC = 10.0  # documented CPU-reference denominator


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.time()
    import jax

    try:  # persistent XLA cache: repeat bench runs skip the big compiles
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # pragma: no cover - older jax
        log(f"compilation cache unavailable: {e}")

    log(f"devices: {jax.devices()}")

    from bellman_mpc_tpu.groth16 import generate_random_parameters
    from bellman_mpc_tpu.groth16 import prepare_verifying_key, verify_proof
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.groth16.prover import synthesize_witness
    from bellman_mpc_tpu.models import MiMCDemo, mimc, mimc_constants
    from bellman_mpc_tpu.parallel import BatchProver

    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=42)

    log("setup: generating MiMC-322 CRS on device ...")
    t0 = time.time()
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    t_setup = time.time() - t0
    log(f"setup done in {t_setup:.1f}s")

    import os

    strategy = os.environ.get("BMT_MSM_STRATEGY", "auto")
    t0 = time.time()
    bp = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0), msm_strategy=strategy
    )
    t_build = time.time() - t0
    log(f"batch prover built in {t_build:.1f}s (msm={strategy})")

    B = int(os.environ.get("BMT_BENCH_B", "16"))
    import random

    rng = random.Random(0)
    witnesses = [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(B)]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in witnesses]

    # Host synthesis + encode (timed separately; compiled fast path).
    t0 = time.time()
    provers = [bp.compiled.prove_assignment(c) for c in circuits]
    t_synth = time.time() - t0
    t0 = time.time()
    args = bp.encode_witness(provers)
    t_encode = time.time() - t0
    log(f"synthesis {t_synth:.2f}s encode {t_encode:.2f}s for B={B}")

    # Compile + warm up.
    t0 = time.time()
    out = bp.run_step(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    log(f"device step compile+first-run {t_compile:.1f}s")

    # Steady-state device throughput.
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = bp.run_step(*args)
    jax.block_until_ready(out)
    t_device = (time.time() - t0) / iters
    log(f"device step steady-state {t_device:.3f}s for B={B}")

    # Sustained pipelined throughput: host synthesis/encode of batch k+1
    # overlaps the device step of batch k (JAX async dispatch) — the real
    # serving shape.
    n_batches = 4
    batch_wit = [
        [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(B)]
        for _ in range(n_batches)
    ]
    t0 = time.time()
    outs = []
    for wits in batch_wit:
        # fused host path: witness synthesis + native C LC eval straight to
        # wire bytes (encode_circuits), overlapped with the device step
        args_k = bp.encode_circuits(
            [MiMCDemo(constants, xl, xr) for xl, xr in wits]
        )
        outs.append(bp.run_step(*args_k))
    jax.block_until_ready(outs)
    t_sustained = (time.time() - t0) / n_batches
    log(f"pipelined sustained {t_sustained:.3f}s/batch for B={B}")

    # p50 single-proof latency: full host+device round trip at B=1
    # (synthesis -> encode -> device step -> decode), BASELINE.md "Targets".
    import statistics

    p50_ms = None
    if os.environ.get("BMT_BENCH_P50", "1") == "1":
        lat_wits = [
            (rng.randrange(host.p), rng.randrange(host.p)) for _ in range(6)
        ]
        bp.prove_batch([MiMCDemo(constants, *lat_wits[0])])  # compile B=1
        lats = []
        for xl, xr in lat_wits[1:]:
            t0 = time.time()
            bp.prove_batch([MiMCDemo(constants, xl, xr)])
            lats.append(time.time() - t0)
        p50_ms = statistics.median(lats) * 1e3
        log(f"p50 single-proof latency {p50_ms:.1f} ms (B=1, n=5)")

    # Decode + verify EVERY proof of the batch on device (single-proof
    # verification runs the fused pairing-product program on TPU).
    from bellman_mpc_tpu.curves.device import g1_device, g2_device
    from bellman_mpc_tpu.groth16.types import Proof

    g_a, g_b, g_c = out
    pa = g1_device.decode_points(tuple(x[..., 0] for x in g_a))
    pb = g2_device.decode_points(tuple(x[..., 0] for x in g_b))
    pc = g1_device.decode_points(tuple(x[..., 0] for x in g_c))
    pvk = prepare_verifying_key(BLS12_381, params.vk)
    # warm the verify program (one compile), then time all B verifications
    verify_proof(
        BLS12_381,
        pvk,
        Proof(a=pa[0], b=pb[0], c=pc[0]),
        [mimc(host, *witnesses[0], constants)],
    )
    t0 = time.time()
    for i in range(B):
        image = mimc(host, *witnesses[i], constants)
        verify_proof(BLS12_381, pvk, Proof(a=pa[i], b=pb[i], c=pc[i]), [image])
    t_verify = time.time() - t0
    log(f"proof verification: OK ({B}/{B} verified in {t_verify:.2f}s)")

    # End-to-end throughput: pipelined host+device (sustained), with the
    # serial sum as a cross-check lower bound.
    serial_throughput = B / (t_synth + t_encode + t_device)
    throughput = B / t_sustained
    log(
        f"e2e sustained {throughput:.2f} proofs/s (serial {serial_throughput:.2f}, "
        f"device-only {B / t_device:.2f}); total bench wall {time.time() - t_start:.0f}s"
    )

    result = {
        "metric": "mimc322_batched_proving_throughput",
        "value": round(throughput, 3),
        "unit": "proofs/sec/chip",
        "vs_baseline": round(throughput / BASELINE_PROOFS_PER_SEC, 3),
        "baseline_note": "denominator 10 proofs/s is a documented CPU "
        "estimate; the reference publishes no numbers (BASELINE.md)",
        # cross-round observability (VERDICT r4 Weak #8): setup/compile
        # regressions must be visible in the record, not just stderr.
        "setup_s": round(t_setup, 1),
        "prover_build_s": round(t_build, 1),
        "step_compile_s": round(t_compile, 1),
        "step_device_s": round(t_device, 3),
        "synth_s": round(t_synth, 3),
        "encode_s": round(t_encode, 3),
        "verify_all_s": round(t_verify, 3),
    }
    if p50_ms is not None:
        result["p50_single_proof_ms"] = round(p50_ms, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
