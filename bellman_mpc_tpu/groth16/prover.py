"""Groth16 prover.

Port of bellman/src/groth16/prover.rs:
  * `create_random_proof` (:158-173) — the fork pins blinding r=27134,
    s=17146 (deterministic proofs); preserved here.
  * `create_proof` (:176-350): witness synthesis into ProvingAssignment,
    per-input dummy constraints (:202-204), the h(x) pipeline — 3x(iFFT then
    coset-FFT), pointwise a*b-c, divide-by-Z-on-coset, icoset-FFT, truncate
    (:210-231) — six multi-scalar multiplications (:233-307), the
    CRS-subversion delta != identity guard (:309-313), and final assembly
    A = alpha + A(tau) + r*delta, B = beta + B(tau) + s*delta,
    C = ... + A*s + B1*r - rs*delta + h + l (:315-349).

TPU-native shape: the entire h pipeline (7 NTT passes + pointwise ops) is ONE
jitted XLA program over (L, m) limb arrays — the reference's Waiter-future
concurrency (multicore.rs) is replaced by XLA's async dispatch, and the six
MSMs run as device kernels for the BLS engine.
"""

from __future__ import annotations

import functools
from typing import List

import jax

from ..fields.host import PrimeField
from ..fields.limb import LimbField
from ..ops.domain import distribute_powers, domain_size_for, ntt
from ..r1cs.core import INPUT, Circuit, UnexpectedIdentity, Variable
from .assembly import ProvingAssignment
from .engine import Engine
from .types import Parameters, Proof

# Fork-pinned deterministic blinding (prover.rs:169-170).
DETERMINISTIC_R = 27134
DETERMINISTIC_S = 17146


@functools.lru_cache(maxsize=None)
def _h_pipeline(field: LimbField, host: PrimeField, exp: int):
    """Fused jitted h(x) pipeline (prover.rs:210-231) for a 2^exp domain."""
    gen = host.generator
    geninv = host.inv(gen)
    m = 1 << exp
    zinv = host.inv((pow(gen, m, host.p) - 1) % host.p)

    from ..ops.domain import warm_twiddles

    warm_twiddles(field, host, exp)

    def coset_values(x):
        x = ntt(field, host, x, inverse=True)  # ifft
        x = distribute_powers(field, host, x, gen)
        return ntt(field, host, x, inverse=False)  # coset_fft

    import os

    use_pallas = os.environ.get("BMT_PALLAS") == "1"

    def pointwise_mul(a, b):
        # BMT_PALLAS=1 routes the coset pointwise product (the largest
        # single multiply of the pipeline, domain.rs:154-170 analog)
        # through the VMEM-blocked Pallas Montgomery kernel; default is
        # XLA's fused limb code.  Bit-identical either way (tested).
        if use_pallas:
            from ..ops.pallas_kernels import mont_mul_pallas

            flat = a.reshape(a.shape[0], -1)
            out = mont_mul_pallas(field, flat, b.reshape(flat.shape))
            return out.reshape(a.shape)
        return field.mul(a, b)

    @jax.jit
    def pipeline(a, b, c):
        a = coset_values(a)
        b = coset_values(b)
        c = coset_values(c)
        h = field.sub(pointwise_mul(a, b), c)
        h = field.mul_const(h, zinv)  # divide_by_z_on_coset
        h = ntt(field, host, h, inverse=True)  # icoset_fft part 1
        h = distribute_powers(field, host, h, geninv)
        return h

    return pipeline


def _h_pipeline_sharded(field: LimbField, host: PrimeField, exp: int, mesh):
    """h(x) pipeline with every NTT distributed over the mesh "model" axis
    via the 4-step decomposition (parallel/sharded.sharded_ntt) — the
    mesh-level form of the reference's parallel FFT (domain.rs:316-372).

    Used for domains too large for one chip's memory (BatchProver picks it
    when exp >= BMT_SHARD_NTT_EXP and a mesh is present); the pointwise
    coset scalings/multiplies between NTT passes shard trivially by
    propagation.  Semantics identical to `_h_pipeline`."""
    from ..parallel.sharded import sharded_ntt

    gen = host.generator
    geninv = host.inv(gen)
    m = 1 << exp
    zinv = host.inv((pow(gen, m, host.p) - 1) % host.p)

    from ..ops.domain import warm_twiddles

    warm_twiddles(field, host, exp)

    def coset_values(x):
        x = sharded_ntt(mesh, field, host, x, inverse=True)
        x = distribute_powers(field, host, x, gen)
        return sharded_ntt(mesh, field, host, x, inverse=False)

    def pipeline(a, b, c):
        a = coset_values(a)
        b = coset_values(b)
        c = coset_values(c)
        h = field.sub(field.mul(a, b), c)
        h = field.mul_const(h, zinv)
        h = sharded_ntt(mesh, field, host, h, inverse=True)
        h = distribute_powers(field, host, h, geninv)
        return h

    return pipeline


def synthesize_witness(engine: Engine, circuit: Circuit) -> ProvingAssignment:
    prover = ProvingAssignment(engine.fr_host)
    prover.alloc_input("", lambda: 1)  # prover.rs:198
    circuit.synthesize(prover)
    for i in range(len(prover.input_assignment)):  # prover.rs:202-204
        v = Variable(INPUT, i)
        prover.enforce("", lambda lc, v=v: lc + v, lambda lc: lc, lambda lc: lc)
    return prover


def h_coefficients(engine: Engine, prover: ProvingAssignment) -> List[int]:
    """Quotient-polynomial coefficients (device pipeline + truncation)."""
    fr_host = engine.fr_host
    m, exp = domain_size_for(len(prover.a), fr_host)
    pad = m - len(prover.a)
    a = engine.fr.encode(prover.a + [0] * pad)
    b = engine.fr.encode(prover.b + [0] * pad)
    c = engine.fr.encode(prover.c + [0] * pad)
    h = _h_pipeline(engine.fr, fr_host, exp)(a, b, c)
    return engine.fr.decode(h)[: m - 1]  # truncate (prover.rs:228-230)


def create_proof(
    engine: Engine, circuit: Circuit, params: Parameters, r: int, s: int
) -> Proof:
    fr = engine.fr_host
    G1, G2 = engine.g1, engine.g2

    prover = synthesize_witness(engine, circuit)
    vk = params.get_vk(len(prover.input_assignment))

    h_scalars = h_coefficients(engine, prover)
    h = G1.msm(params.get_h(len(h_scalars)), h_scalars)

    input_assignment = prover.input_assignment
    aux_assignment = prover.aux_assignment

    l = G1.msm(params.get_l(len(aux_assignment)), aux_assignment)

    a_inputs_src, a_aux_src = params.get_a(
        len(input_assignment), prover.a_aux_density.get_total_density()
    )
    a_inputs = G1.msm(a_inputs_src, input_assignment)
    a_aux = G1.msm(a_aux_src, aux_assignment, density=prover.a_aux_density.bv)

    b_input_density = prover.b_input_density.bv
    b_aux_density = prover.b_aux_density.bv
    b_in_total = prover.b_input_density.get_total_density()
    b_aux_total = prover.b_aux_density.get_total_density()

    b_g1_in_src, b_g1_aux_src = params.get_b_g1(b_in_total, b_aux_total)
    b_g1_inputs = G1.msm(b_g1_in_src, input_assignment, density=b_input_density)
    b_g1_aux = G1.msm(b_g1_aux_src, aux_assignment, density=b_aux_density)

    b_g2_in_src, b_g2_aux_src = params.get_b_g2(b_in_total, b_aux_total)
    b_g2_inputs = G2.msm(b_g2_in_src, input_assignment, density=b_input_density)
    b_g2_aux = G2.msm(b_g2_aux_src, aux_assignment, density=b_aux_density)

    # CRS subversion guard (prover.rs:309-313).
    if G1.is_identity(vk.delta_g1) or G2.is_identity(vk.delta_g2):
        raise UnexpectedIdentity("subversion-CRS attack: delta is the identity")

    r = r % fr.p
    s = s % fr.p

    g_a = G1.add(G1.mul(vk.delta_g1, r), vk.alpha_g1)
    g_b = G2.add(G2.mul(vk.delta_g2, s), vk.beta_g2)
    g_c = G1.add(
        G1.mul(vk.delta_g1, r * s % fr.p),
        G1.add(G1.mul(vk.alpha_g1, s), G1.mul(vk.beta_g1, r)),
    )

    a_answer = G1.add(a_inputs, a_aux)
    g_a = G1.add(g_a, a_answer)
    g_c = G1.add(g_c, G1.mul(a_answer, s))

    b1_answer = G1.add(b_g1_inputs, b_g1_aux)
    b2_answer = G2.add(b_g2_inputs, b_g2_aux)
    g_b = G2.add(g_b, b2_answer)
    g_c = G1.add(g_c, G1.mul(b1_answer, r))
    g_c = G1.add(g_c, h)
    g_c = G1.add(g_c, l)

    return Proof(a=g_a, b=g_b, c=g_c)


def create_random_proof(engine: Engine, circuit: Circuit, params: Parameters, rng=None) -> Proof:
    """Deterministic-blinding proof (prover.rs:158-173 ignores the RNG)."""
    return create_proof(engine, circuit, params, DETERMINISTIC_R, DETERMINISTIC_S)
