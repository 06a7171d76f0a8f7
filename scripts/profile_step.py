"""Phase-level profiling of the batched prove step on the real TPU chip.

Times each sub-piece of BatchProver._build_step separately (h pipeline,
bit extraction, each MSM, assembly) plus a batch-size sweep of the full
step, so optimization effort goes where the milliseconds are.

Usage:  python scripts/profile_step.py [B ...]    (default: 16)
Output: human-readable table on stderr, one JSON summary line on stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    Bs = [int(x) for x in sys.argv[1:]] or [16]
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    from bellman_mpc_tpu.groth16 import generate_random_parameters
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.models import MiMCDemo, mimc_constants
    from bellman_mpc_tpu.parallel import BatchProver
    from bellman_mpc_tpu.parallel.batch_prover import (
        bits_from_mont,
        bits_from_std,
    )
    from bellman_mpc_tpu.curves.device import g1_device, g2_device
    from bellman_mpc_tpu.ops.msm import digits_from_bits, msm_table

    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=42)
    log("generating CRS ...")
    t0 = time.time()
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    log(f"CRS in {time.time() - t0:.1f}s")

    bp = BatchProver(BLS12_381, params, MiMCDemo(constants, 0, 0))
    log(
        f"m={bp.m} h_n={bp.h_n} n_in={bp.num_inputs} n_aux={bp.num_aux} "
        f"a_aux={len(bp.a_aux_idx)} b_in={len(bp.b_in_idx)} "
        f"b_aux={len(bp.b_aux_idx)} strategy={bp.msm_strategy} "
        f"c={getattr(bp, '_table_c', None)}"
    )

    import random

    rng = random.Random(0)
    fr = bp.fr
    results = {}

    for B in Bs:
        wits = [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(B)]
        provers = [
            bp.compiled.prove_assignment(MiMCDemo(constants, xl, xr))
            for xl, xr in wits
        ]
        args = bp.encode_witness(provers)

        t_full = timeit(lambda *a: bp.run_step(*a), *args)
        log(f"B={B}: full step {t_full * 1e3:.1f} ms "
            f"({B / t_full:.1f} proofs/s device-only)")
        results[B] = {"full_ms": round(t_full * 1e3, 1)}

        if B != Bs[0]:
            continue  # phase breakdown only for the first B

        # --- phase: unpack + to_mont + h pipeline ------------------------
        from bellman_mpc_tpu.groth16.prover import _h_pipeline

        pipeline = _h_pipeline(fr, host, bp.exp)

        def unpack(x8):
            B_, k, nb = x8.shape
            limbs = fr.unpack_device(x8.reshape(B_ * k, nb))
            return limbs.reshape(fr.L, B_, k)

        @jax.jit
        def phase_unpack(a8, b8, c8):
            abc = fr.to_mont(
                jnp.stack([unpack(a8), unpack(b8), unpack(c8)], axis=1)
            )
            return abc

        @jax.jit
        def phase_h(abc):
            a, b, c = abc[:, 0], abc[:, 1], abc[:, 2]
            h = jax.vmap(pipeline, in_axes=1, out_axes=1)(a, b, c)
            return h[:, :, : bp.m - 1]

        @jax.jit
        def phase_bits_h(h):
            return bits_from_mont(fr, h)

        a8, b8, c8, wi8, wa8 = args
        abc = phase_unpack(a8, b8, c8)
        jax.block_until_ready(abc)
        t = timeit(phase_unpack, a8, b8, c8)
        log(f"  unpack+to_mont      {t * 1e3:8.1f} ms")
        results[B]["unpack_ms"] = round(t * 1e3, 1)

        t = timeit(phase_h, abc)
        log(f"  h pipeline (7 NTT)  {t * 1e3:8.1f} ms")
        results[B]["h_ntt_ms"] = round(t * 1e3, 1)

        h = phase_h(abc)
        t = timeit(phase_bits_h, h)
        log(f"  bits_from_mont(h)   {t * 1e3:8.1f} ms")
        results[B]["bits_h_ms"] = round(t * 1e3, 1)

        # --- phase: each MSM ---------------------------------------------
        if bp.msm_strategy == "rns" and not bp._merge_g1:
            from bellman_mpc_tpu.curves.rns_point import rns_g1_ops, rns_g2_ops
            from bellman_mpc_tpu.fields import bls12_381 as bc
            from bellman_mpc_tpu.ops.msm import (
                msm_table_affine_rns,
                signed_digits,
            )

            bits_h = jnp.pad(
                bits_from_mont(fr, h), ((0, 0), (0, 0), (0, bp.h_n - (bp.m - 1)))
            )
            names = [
                ("h", bp.crs_h, g1_device),
                ("l", bp.crs_l, g1_device),
                ("a", bp.crs_a, g1_device),
                ("b1", bp.crs_b1, g1_device),
                ("b2", bp.crs_b2, g2_device),
            ]
            msm_total = 0.0
            for nm, crs, grp in names:
                N = crs[0].shape[-1]
                idx, c_tab = bp._table_idx[id(crs)]
                tab = bp._table_args[idx]
                bound = bp._rns_bounds[id(crs)]
                rops = rns_g2_ops() if grp is g2_device else rns_g1_ops()
                digits_h = digits_from_bits(bits_h, c_tab)
                dg = jnp.zeros((digits_h.shape[0], B, N), jnp.int32) + (
                    digits_h[:, :, :N] if N <= digits_h.shape[-1] else 0
                )
                f = jax.jit(
                    lambda t_, d_, r_=rops, b_=bound, c=c_tab: msm_table_affine_rns(
                        r_, bc.fp, t_, signed_digits(d_, c), b_
                    )
                )
                t = timeit(f, tab, dg)
                msm_total += t
                log(f"  msm[{nm:3s}] N={N:5d} c={c_tab:2d} {t * 1e3:8.1f} ms")
                results[B][f"msm_{nm}_ms"] = round(t * 1e3, 1)
            log(f"  msm total           {msm_total * 1e3:8.1f} ms")
            results[B]["msm_total_ms"] = round(msm_total * 1e3, 1)

        if bp.msm_strategy == "table":
            from bellman_mpc_tpu.ops.msm import msm_table_affine, signed_digits

            bits_h = jnp.pad(
                bits_from_mont(fr, h), ((0, 0), (0, 0), (0, bp.h_n - (bp.m - 1)))
            )
            names = [
                ("h", bp.crs_h, g1_device),
                ("l", bp.crs_l, g1_device),
                ("a", bp.crs_a, g1_device),
                ("b1", bp.crs_b1, g1_device),
                ("b2", bp.crs_b2, g2_device),
            ]
            msm_total = 0.0
            for nm, crs, grp in names:
                N = crs[0].shape[-1]
                idx, c_tab = bp._table_idx[id(crs)]
                tab = bp._table_args[idx]
                digits_h = digits_from_bits(bits_h, c_tab)
                dg = jnp.zeros((digits_h.shape[0], B, N), jnp.int32) + (
                    digits_h[:, :, :N] if N <= digits_h.shape[-1] else 0
                )
                if bp._table_signed:
                    f = jax.jit(
                        lambda t_, d_, ops=grp.ops, c=c_tab: msm_table_affine(
                            ops, t_, signed_digits(d_, c)
                        )
                    )
                else:
                    f = jax.jit(
                        lambda t_, d_, ops=grp.ops: msm_table(ops, t_, d_)
                    )
                t = timeit(f, tab, dg)
                msm_total += t
                log(f"  msm[{nm:3s}] N={N:5d} c={c_tab:2d} {t * 1e3:8.1f} ms")
                results[B][f"msm_{nm}_ms"] = round(t * 1e3, 1)
            log(f"  msm total           {msm_total * 1e3:8.1f} ms")
            results[B]["msm_total_ms"] = round(msm_total * 1e3, 1)

    print(json.dumps({"profile": results}))


if __name__ == "__main__":
    main()
