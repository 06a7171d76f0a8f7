"""Chip sweep of prover configs: merge x GLV x batch size.

Builds the MiMC-322 CRS once, then for each config builds a BatchProver
and measures the steady-state device step.  One process = one axon warmup;
provers are freed between configs to keep HBM headroom.

Usage: python scripts/sweep_configs.py [configs]
  configs: comma list of merge,glv pairs like "00,10,01,11" (default all),
  then a B sweep (16,32,64) on the fastest.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfgs = (sys.argv[1] if len(sys.argv) > 1 else "00,10,01,11").split(",")
    Bs = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "16").split("+")]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    log(f"devices: {jax.devices()}")

    os.environ.setdefault("BMT_TABLE_MEM_MB", "6144")

    import random

    from bellman_mpc_tpu.groth16 import generate_random_parameters
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.models import MiMCDemo, mimc_constants
    from bellman_mpc_tpu.parallel import BatchProver

    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=42)
    t0 = time.time()
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    log(f"CRS in {time.time()-t0:.0f}s")

    rng = random.Random(0)
    results = {}
    for cfg in cfgs:
        merge, glvf = cfg[0], cfg[1]
        os.environ["BMT_MERGE_G1"] = merge
        os.environ["BMT_GLV"] = glvf
        name = f"merge={merge} glv={glvf}"
        for B in Bs:
            wits = [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(B)]
            t0 = time.time()
            try:
                bp = BatchProver(
                    BLS12_381, params, MiMCDemo(constants, 0, 0),
                    msm_strategy="rns",
                )
                t_build = time.time() - t0
                args = bp.encode_circuits(
                    [MiMCDemo(constants, xl, xr) for xl, xr in wits]
                )
                t0 = time.time()
                out = bp.run_step(*args)
                jax.block_until_ready(out)
                t_compile = time.time() - t0
                iters = 3
                t0 = time.time()
                for _ in range(iters):
                    out = bp.run_step(*args)
                jax.block_until_ready(out)
                dt = (time.time() - t0) / iters
                log(
                    f"[{name} B={B}] build {t_build:.0f}s compile {t_compile:.0f}s "
                    f"step {dt*1e3:.1f} ms -> {B/dt:.1f} proofs/s device-only"
                )
                results[f"{cfg}/B{B}"] = round(dt * 1e3, 1)
                del bp, out, args
                gc.collect()
            except Exception as e:  # noqa: BLE001
                log(f"[{name} B={B}] FAILED: {type(e).__name__}: {e}")
                results[f"{cfg}/B{B}"] = None
                gc.collect()
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
