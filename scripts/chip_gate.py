"""Bench-scale chip regression gate — run before every end-of-round commit.

Round 3 ended with the shipping default producing InvalidProof at bench
scale while every CPU test was green (BENCH_r03): CPU suites exercise the
MSM strategies at N<=32 where scale bugs are invisible.  This gate runs ONE
bench-scale batch (MiMC-322, B=16, domain 1024) through each MSM strategy
on the REAL chip and verifies every proof in the batch, plus a bit-identical
check against the sequential host-verified prover.

Usage:
    python scripts/chip_gate.py                # default strategies: auto,table
    python scripts/chip_gate.py auto,table,rns-merged,ladder

Exit code 0 = all green.  Any InvalidProof / mismatch exits 1 and names the
strategy.  Correctness semantics match bellman/src/multiexp.rs:159-250 and
prover.rs:176-350 (every created proof verifies).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    strategies = (sys.argv[1] if len(sys.argv) > 1 else "auto,table").split(",")
    B = int(os.environ.get("BMT_GATE_B", "16"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    log(f"devices: {jax.devices()}")

    import random

    from bellman_mpc_tpu.groth16 import (
        create_random_proof,
        generate_random_parameters,
        prepare_verifying_key,
        verify_proof,
    )
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.models import MiMCDemo, mimc, mimc_constants
    from bellman_mpc_tpu.parallel import BatchProver
    from bellman_mpc_tpu.r1cs.core import InvalidProof

    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=42)
    log("gate: generating MiMC-322 CRS ...")
    t0 = time.time()
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    pvk = prepare_verifying_key(BLS12_381, params.vk)
    log(f"gate: CRS in {time.time() - t0:.0f}s")

    rng = random.Random(7)
    wits = [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(B)]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in wits]
    # one sequential-prover reference proof (deterministic blinding)
    seq_proof = create_random_proof(
        BLS12_381, MiMCDemo(constants, *wits[0]), params
    )

    failures = []
    for strat in strategies:
        env_merge = None
        name = strat
        if strat == "rns-merged":
            strat, env_merge = "rns", "1"
        if env_merge is not None:
            os.environ["BMT_MERGE_G1"] = env_merge
        else:
            os.environ.pop("BMT_MERGE_G1", None)
        log(f"gate[{name}]: building prover ...")
        t0 = time.time()
        try:
            bp = BatchProver(
                BLS12_381, params, MiMCDemo(constants, 0, 0), msm_strategy=strat
            )
            log(f"gate[{name}]: built in {time.time() - t0:.0f}s; proving ...")
            t0 = time.time()
            proofs = bp.prove_batch(circuits)
            log(f"gate[{name}]: batch in {time.time() - t0:.0f}s; verifying ...")
            bad = 0
            for (xl, xr), proof in zip(wits, proofs):
                image = mimc(host, xl, xr, constants)
                try:
                    verify_proof(BLS12_381, pvk, proof, [image])
                except InvalidProof:
                    bad += 1
            if proofs[0] != seq_proof:
                log(f"gate[{name}]: FAIL (not bit-identical to sequential)")
                failures.append(name)
            elif bad:
                log(f"gate[{name}]: FAIL ({bad}/{B} proofs invalid)")
                failures.append(name)
            else:
                log(f"gate[{name}]: OK ({B}/{B} proofs verify, bit-identical)")
        except Exception as e:  # noqa: BLE001 - gate must report, not crash
            log(f"gate[{name}]: FAIL (exception: {type(e).__name__}: {e})")
            failures.append(name)

    # Second circuit shape (VERDICT r4 #9): the round-4 miscompile was
    # compilation-context-dependent, so the gate needs a second context.
    # RangeDemo has a tiny domain (2^5) and tiny CRS sets, which drives the
    # adaptive window picker to completely different table/fold shapes.
    if os.environ.get("BMT_GATE_RANGE", "1") == "1":
        from bellman_mpc_tpu.models import RangeDemo

        os.environ.pop("BMT_MERGE_G1", None)
        log("gate[range/auto]: building prover ...")
        try:
            setup = RangeDemo(
                a=1, b=2, n=4, w=9, wArray=[0, 0, 0, 0],
                less_or_equal=1, less=1, not_all_zeros=1,
            )
            r_params = generate_random_parameters(BLS12_381, setup)
            r_pvk = prepare_verifying_key(BLS12_381, r_params.vk)

            def range_circ(d):
                w = 8 + d
                bits = [(w >> i) & 1 for i in range(4)]
                return RangeDemo(
                    a=1, b=1 + d, n=4, w=w, wArray=bits,
                    less_or_equal=1, less=1, not_all_zeros=1,
                )

            ds = [1 + (i % 7) for i in range(B)]
            bp = BatchProver(
                BLS12_381, r_params, range_circ(1), msm_strategy="auto"
            )
            t0 = time.time()
            proofs = bp.prove_batch([range_circ(d) for d in ds])
            log(f"gate[range/auto]: batch in {time.time() - t0:.0f}s; verifying ...")
            seq = create_random_proof(BLS12_381, range_circ(ds[0]), r_params)
            bad = 0
            for d, proof in zip(ds, proofs):
                try:
                    verify_proof(BLS12_381, r_pvk, proof, [1 + d])
                except InvalidProof:
                    bad += 1
            if proofs[0] != seq:
                log("gate[range/auto]: FAIL (not bit-identical to sequential)")
                failures.append("range/auto")
            elif bad:
                log(f"gate[range/auto]: FAIL ({bad}/{B} proofs invalid)")
                failures.append("range/auto")
            else:
                log(f"gate[range/auto]: OK ({B}/{B} proofs verify, bit-identical)")
        except Exception as e:  # noqa: BLE001
            log(f"gate[range/auto]: FAIL (exception: {type(e).__name__}: {e})")
            failures.append("range/auto")

    if failures:
        print(f"CHIP GATE FAIL: {failures}", flush=True)
        sys.exit(1)
    print("CHIP GATE OK", flush=True)


if __name__ == "__main__":
    main()
