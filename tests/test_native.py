"""Native C evaluator + compiled-circuit path vs full Python synthesis."""

import random

import pytest

from bellman_mpc_tpu import native
from bellman_mpc_tpu.groth16 import DUMMY
from bellman_mpc_tpu.groth16.bls12 import BLS12_381
from bellman_mpc_tpu.groth16.compiled import CompiledCircuit
from bellman_mpc_tpu.groth16.prover import synthesize_witness
from bellman_mpc_tpu.models import MiMCDemo, mimc_constants


def test_native_builds():
    assert native.available(), "cc toolchain present; native lib must build"


def test_native_lc_eval_matches_python():
    p = BLS12_381.fr_host.p
    rng = random.Random(3)
    table = native.PackedLcTable(
        [
            [(0, 0, 1), (1, 0, rng.randrange(p))],
            [],
            [(1, 1, p - 1), (1, 0, 7), (0, 1, rng.randrange(p))],
        ]
    )
    inputs = [1, rng.randrange(p)]
    aux = [rng.randrange(p), rng.randrange(p)]
    got = native.lc_eval(table, inputs, aux, p)

    terms = [
        [(0, 0, 1), (1, 0, int(table.coeffs[1, 0]) | int(table.coeffs[1, 1]) << 64 | int(table.coeffs[1, 2]) << 128 | int(table.coeffs[1, 3]) << 192)],
    ]
    # independent recomputation
    def val(kind, idx):
        return inputs[idx] if kind == 0 else aux[idx]

    for c in range(table.n_cons):
        acc = 0
        for t in range(table.offsets[c], table.offsets[c + 1]):
            coeff = (
                int(table.coeffs[t, 0])
                | int(table.coeffs[t, 1]) << 64
                | int(table.coeffs[t, 2]) << 128
                | int(table.coeffs[t, 3]) << 192
            )
            acc += val(table.kinds[t], table.indices[t]) * coeff
        assert got[c] == acc % p


def test_native_lc_eval_bytes_matches_lc_eval():
    """The C-side reduction + byte packing equals lc_eval % p + pack_std."""
    p = BLS12_381.fr_host.p
    nb = BLS12_381.fr.nbytes
    rng = random.Random(17)
    # adversarial coefficients/values near p maximize the 576-bit accumulator
    rows = []
    for _ in range(50):
        n_terms = rng.randrange(0, 8)
        rows.append(
            [
                (rng.randrange(2), rng.randrange(2), rng.choice(
                    [p - 1, p - 2, rng.randrange(p), 1]
                ))
                for _ in range(n_terms)
            ]
        )
    table = native.PackedLcTable(rows)
    inputs = [1, p - 1]
    aux = [p - 1, rng.randrange(p)]
    want = native.lc_eval(table, inputs, aux, p)
    got = native.lc_eval_bytes(
        table,
        native.vals_to_limbs(inputs),
        native.vals_to_limbs(aux),
        p,
        nb,
    )
    want_bytes = BLS12_381.fr.pack_std(want)
    assert (got == want_bytes).all()


def test_batch_prover_encode_circuits_matches_assignment_path():
    """encode_circuits (native bytes path) == encode_witness (bigint path)."""
    from bellman_mpc_tpu.groth16 import generate_random_parameters
    from bellman_mpc_tpu.parallel import BatchProver

    host = BLS12_381.fr_host
    constants = mimc_constants(host, seed=5, rounds=6)
    params = generate_random_parameters(BLS12_381, MiMCDemo(constants))
    bp = BatchProver(
        BLS12_381, params, MiMCDemo(constants, 0, 0), msm_strategy="ladder"
    )
    rng = random.Random(21)
    wits = [(rng.randrange(host.p), rng.randrange(host.p)) for _ in range(3)]
    circuits = [MiMCDemo(constants, xl, xr) for xl, xr in wits]
    provers = [bp.compiled.prove_assignment(c) for c in circuits]
    want = bp.encode_witness(provers)
    got = bp.encode_circuits(circuits)
    import numpy as np

    for g, w in zip(got, want):
        assert (np.asarray(g) == np.asarray(w)).all()


@pytest.mark.parametrize("engine", [DUMMY, BLS12_381], ids=["mock", "bls"])
def test_compiled_circuit_matches_full_synthesis(engine):
    host = engine.fr_host
    constants = mimc_constants(host, seed=5, rounds=20)
    template = MiMCDemo(constants)
    cc = CompiledCircuit(engine, template)

    rng = random.Random(9)
    xl, xr = rng.randrange(host.p), rng.randrange(host.p)
    circuit = MiMCDemo(constants, xl, xr)

    full = synthesize_witness(engine, circuit)
    fast = cc.prove_assignment(circuit)

    assert fast.input_assignment == full.input_assignment
    assert fast.aux_assignment == full.aux_assignment
    assert fast.a == full.a
    assert fast.b == full.b
    assert fast.c == full.c
    assert fast.a_aux_density.bv == full.a_aux_density.bv
    assert fast.b_input_density.bv == full.b_input_density.bv
    assert fast.b_aux_density.bv == full.b_aux_density.bv
