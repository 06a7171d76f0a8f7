"""MPC trusted-setup ceremony tests.

Ports of bellman/src/groth16/mpc_test.rs over the mock engine (exact
closed-form checks: `common_works` :72-140, `uncommonn_works` :152-269,
`all_test` :9-61), plus adversarial-contribution rejection
(mpc.rs:130-154) and the generator cross-check the reference hard-wires
into generate_parameters (generator.rs:573-611) for a circuit whose
constraint count actually fits the ceremony tables.
"""

import pytest

from bellman_mpc_tpu.groth16 import DUMMY
from bellman_mpc_tpu.groth16 import mpc
from bellman_mpc_tpu.groth16.mpc import (
    CeremonyError,
    CommonParamterMatrix,
    initial_common_paramters,
    initial_uncommon_paramters,
    init_parameter_list,
    matrix_storage,
    mpc_bad_paramters_custom,
    mpc_common_paramters_custom_generator,
    mpc_common_paramters_generator,
    mpc_uncommon_paramters_generator,
    mpc_common_paramters_custom_all,
    mpc_uncommon_paramters_custom_all,
    paramter_list_excute,
    verify_common_paramter,
    verify_mpc_g1,
    verify_uncommon_paramter,
)

P = DUMMY.fr_host.p
inv = lambda x: pow(x, P - 2, P)


def test_common_works_closed_form():
    """Port of common_works (mpc_test.rs:72-140) — players (1,2,3),(2,3,4),(3,4,5)."""
    st = initial_common_paramters(DUMMY, 8)
    for secrets in [(1, 2, 3), (2, 3, 4), (3, 4, 5)]:
        contribution = mpc_common_paramters_generator(DUMMY, st, secrets)
        st = verify_common_paramter(DUMMY, st, contribution)

    # cumulative trapdoor: alpha = 6, beta = 24, tau = 60 (mpc_test.rs:102-124)
    assert st.alpha_g1 == 6 and st.alpha_g2 == 6
    assert st.beta_g1 == 24 and st.beta_g2 == 24
    assert len(st.tau_g1) == 8
    assert st.tau_g1[0] == 1 and st.tau_g1[1] == 60 and st.tau_g1[2] == 3600 % P
    assert st.alpha_mul_tau_g1[0] == 6
    assert st.alpha_mul_tau_g1[1] == 60 * 6 % P
    assert st.alpha_mul_tau_g1[2] == 3600 * 6 % P
    assert st.beta_mul_tau_g1[0] == 24
    assert st.beta_mul_tau_g1[1] == 60 * 24 % P

    # matrix projection closed form (mpc_test.rs:126-139): the 'front' slot
    # gets matrix1 as A, matrix2 as B, matrix3 as C.
    matrix1 = [[(1, 0), (1, 1)], []]
    matrix2 = [[(1, 0)], [(1, 1)]]
    matrix3 = [[], []]
    m = matrix_storage(st, DUMMY, matrix1, matrix2, matrix3, [], [], [], 4)
    assert m.matrixed_g1_front[0] == (24 * 61 + 6) % P
    assert m.matrixed_g1_front[1] == 6 * 60 % P
    # H basis: tau^{4+i} - tau^i
    for i in range(4):
        assert m.matrixed_h_g1[i] == (pow(60, 4 + i, P) - pow(60, i, P)) % P


def test_uncommon_works_closed_form():
    """Port of uncommonn_works (mpc_test.rs:152-269)."""
    g1 = 1
    m = CommonParamterMatrix(
        matrixed_g1_front=[6, 12],
        matrixed_g2_front=[6, 12],
        matrixed_g1_back=[24, 48],
        matrixed_g2_back=[24, 48],
        matrixed_h_g1=[2, 4, 6, 8],
        matrixed_h_g2=[2, 4, 6, 8],
    )
    st = initial_uncommon_paramters(DUMMY, m)
    p1 = mpc_uncommon_paramters_generator(DUMMY, st, (1, 2))
    st = verify_uncommon_paramter(DUMMY, m, st, p1)
    assert st.gamma_g2 == 1  # mpc_test.rs:192

    p2 = mpc_uncommon_paramters_generator(DUMMY, st, (2, 3))
    assert p2.delta.g2_result == 6  # mpc_test.rs:203-206
    assert p2.gamma.g2_mine == 2  # mpc_test.rs:208
    st = verify_uncommon_paramter(DUMMY, m, st, p2)
    p3 = mpc_uncommon_paramters_generator(DUMMY, st, (3, 4))
    st = verify_uncommon_paramter(DUMMY, m, st, p3)

    # cumulative gamma = 6, delta = 24 (mpc_test.rs:226-229)
    assert st.gamma_g1 == 6 and st.gamma_g2 == 6
    assert st.delta_g1 == 24 and st.delta_g2 == 24
    gi, di = inv(6), inv(24)
    assert st.kin_g1 == [6 * gi % P, 12 * gi % P]  # mpc_test.rs:232-239
    assert st.kout_g1 == [24 * di % P, 48 * di % P]  # :241-248
    assert st.h_g1 == [x * di % P for x in [2, 4, 6, 8]]  # :250-265


def test_all_test_full_ceremony():
    """Port of all_test (mpc_test.rs:9-61): full 2-phase ceremony."""
    st = initial_common_paramters(DUMMY, 8)
    for secrets in [(1, 2, 3), (2, 3, 4), (3, 4, 5)]:
        st = verify_common_paramter(
            DUMMY, st, mpc_common_paramters_generator(DUMMY, st, secrets)
        )
    at_aux = [[(1, 0), (2, 1)], []]
    bt_aux = [[(1, 0), (2, 1)], [(3, 0), (4, 1)]]
    ct_aux = [[], []]
    m = matrix_storage(st, DUMMY, [], [], [], at_aux, bt_aux, ct_aux, 4)
    ust = initial_uncommon_paramters(DUMMY, m)
    for secrets in [(1, 2), (2, 3), (3, 4)]:
        ust = verify_uncommon_paramter(
            DUMMY, m, ust, mpc_uncommon_paramters_generator(DUMMY, ust, secrets)
        )
    assert ust.gamma_g2 == 6 and ust.delta_g2 == 24


def test_canned_ceremony_matches_deterministic_trapdoor():
    """mpc_common_paramters_custom_all secrets multiply to alpha=6, beta=24,
    tau=2 — the deterministic trapdoor (generator.rs:573-577 asserts)."""
    st = mpc_common_paramters_custom_all(DUMMY, 8)
    assert st.alpha_g1 == 6
    assert st.beta_g1 == 24
    assert st.tau_g1[1] == 2
    assert st.tau_g1[2] == 4
    assert st.alpha_mul_tau_g1[0] == 6
    assert st.alpha_mul_tau_g1[1] == 12
    assert st.beta_mul_tau_g1[0] == 24
    assert st.beta_mul_tau_g1[1] == 48


def test_generator_ceremony_cross_check():
    """The generate_parameters <-> ceremony consistency asserts
    (generator.rs:573-611), on a circuit with a power-of-two constraint
    count so the H-basis identity h_i = tau^i t(tau)/delta holds exactly."""
    from bellman_mpc_tpu.groth16 import generate_parameters
    from bellman_mpc_tpu.groth16.generator import synthesize_keypair
    from tests.test_groth16_mock import AndDemo

    # AndDemo: 2 circuit constraints + 2 input dummies = 4 = 2^2
    params = generate_parameters(DUMMY, AndDemo(None, None), 1, 1, 6, 24, 6, 24, 2)
    assembly = synthesize_keypair(DUMMY, AndDemo(None, None))
    assert assembly.num_constraints == 4

    cp = mpc_common_paramters_custom_all(DUMMY, 8)
    m = matrix_storage(
        cp, DUMMY,
        assembly.at_inputs, assembly.bt_inputs, assembly.ct_inputs,
        assembly.at_aux, assembly.bt_aux, assembly.ct_aux,
        assembly.num_constraints,
    )
    ucp = mpc_uncommon_paramters_custom_all(DUMMY, m)

    # vk consistency (generator.rs:606-611)
    assert params.vk.alpha_g1 == cp.alpha_g1
    assert params.vk.beta_g1 == cp.beta_g1
    assert params.vk.beta_g2 == cp.beta_g2
    assert params.vk.gamma_g2 == ucp.gamma_g2
    assert params.vk.delta_g1 == ucp.delta_g1
    assert params.vk.delta_g2 == ucp.delta_g2
    # H query consistency (generator.rs:592-593): m == num_constraints here
    assert params.h[0] == ucp.h_g1[0]
    assert params.h[1] == ucp.h_g1[1]
    # tau table consistency (generator.rs:573-577)
    assert cp.tau_g1[1] == 2
    assert cp.alpha_mul_tau_g1[0] == 6
    assert cp.alpha_mul_tau_g1[1] == 12
    assert cp.beta_mul_tau_g1[0] == 24
    assert cp.beta_mul_tau_g1[1] == 48


def test_bad_contribution_rejected():
    """mpc_bad_paramters_custom must fail verification (mpc.rs:130-154)."""
    lst = init_parameter_list(DUMMY)
    good = mpc_common_paramters_custom_generator(DUMMY, lst[-1], 5)
    lst = paramter_list_excute(DUMMY, lst, good)
    bad = mpc_bad_paramters_custom(DUMMY, lst[-1], 7)
    assert not verify_mpc_g1(DUMMY, bad, lst)
    with pytest.raises(CeremonyError):
        paramter_list_excute(DUMMY, lst, bad)
    # honest follow-up still accepted
    good2 = mpc_common_paramters_custom_generator(DUMMY, lst[-1], 7)
    assert verify_mpc_g1(DUMMY, good2, lst)


def test_tampered_phase1_rejected():
    st = initial_common_paramters(DUMMY, 4)
    c = mpc_common_paramters_generator(DUMMY, st, (3, 4, 5))
    c.alpha.g1_result = (c.alpha.g1_result + 1) % P  # tamper
    with pytest.raises(CeremonyError):
        verify_common_paramter(DUMMY, st, c)


def test_generate_parameters_mpc_structure():
    """Ceremony-only setup (generator.rs:163-237) with completed A/B."""
    from bellman_mpc_tpu.groth16.mpc import generate_parameters_mpc
    from tests.test_groth16_mock import AndDemo

    params = generate_parameters_mpc(DUMMY, AndDemo(None, None))
    assert params.vk.gamma_g2 == 6 and params.vk.delta_g2 == 24
    assert len(params.vk.ic) == 2  # inputs: ONE + c
    assert len(params.l) == 2  # aux: a, b
    assert len(params.h) == 4
    # completed A/B queries are non-empty (unlike the reference's stub)
    assert len(params.a) > 0 and len(params.b_g1) > 0
    assert len(params.b_g1) == len(params.b_g2)


def test_generate_parameters_mpc_lagrange_equals_generator():
    """SOUND ceremony setup: basis="lagrange" reproduces generate_parameters.

    The canned ceremony secrets total exactly the deterministic trapdoor
    (alpha=6, beta=24, tau=2, gamma=6, delta=24 — generator.rs:32-39), so a
    sound Lagrange-basis projection must yield the very same CRS the direct
    generator computes — the cross-check generator.rs:573-611 hard-wires,
    done on the COMPLETE parameter set.
    """
    from bellman_mpc_tpu.groth16 import (
        create_random_proof,
        generate_parameters,
        prepare_verifying_key,
        verify_proof,
    )
    from bellman_mpc_tpu.groth16.generator import DETERMINISTIC_TRAPDOOR
    from bellman_mpc_tpu.groth16.mpc import generate_parameters_mpc
    from tests.test_groth16_mock import AndDemo

    t = DETERMINISTIC_TRAPDOOR
    direct = generate_parameters(
        DUMMY,
        AndDemo(None, None),
        DUMMY.g1.generator(),
        DUMMY.g2.generator(),
        t["alpha"],
        t["beta"],
        t["gamma"],
        t["delta"],
        t["tau"],
    )
    ceremony = generate_parameters_mpc(DUMMY, AndDemo(None, None), basis="lagrange")

    assert ceremony.vk.alpha_g1 == direct.vk.alpha_g1
    assert ceremony.vk.beta_g2 == direct.vk.beta_g2
    assert ceremony.vk.gamma_g2 == direct.vk.gamma_g2
    assert ceremony.vk.delta_g2 == direct.vk.delta_g2
    assert ceremony.vk.ic == direct.vk.ic
    assert ceremony.l == direct.l
    assert ceremony.h == direct.h
    assert ceremony.a == direct.a
    assert ceremony.b_g1 == direct.b_g1
    assert ceremony.b_g2 == direct.b_g2

    # proofs from the ceremony CRS verify under the direct generator's key
    proof = create_random_proof(DUMMY, AndDemo(True, True), ceremony)
    pvk = prepare_verifying_key(DUMMY, direct.vk)
    verify_proof(DUMMY, pvk, proof, [1])


def test_generate_parameters_mpc_lagrange_bls():
    """Sound ceremony on the real curve: CRS equality + e2e prove/verify."""
    from bellman_mpc_tpu.groth16 import (
        create_random_proof,
        generate_parameters,
        prepare_verifying_key,
        verify_proof,
    )
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.groth16.generator import DETERMINISTIC_TRAPDOOR
    from bellman_mpc_tpu.groth16.mpc import generate_parameters_mpc
    from bellman_mpc_tpu.models.and_range import AndDemo

    t = DETERMINISTIC_TRAPDOOR
    direct = generate_parameters(
        BLS12_381,
        AndDemo(None, None),
        BLS12_381.g1.generator(),
        BLS12_381.g2.generator(),
        t["alpha"],
        t["beta"],
        t["gamma"],
        t["delta"],
        t["tau"],
    )
    ceremony = generate_parameters_mpc(
        BLS12_381, AndDemo(None, None), basis="lagrange"
    )
    assert ceremony.vk.ic == direct.vk.ic
    assert ceremony.l == direct.l
    assert ceremony.h == direct.h
    assert ceremony.a == direct.a
    assert ceremony.b_g1 == direct.b_g1
    assert ceremony.b_g2 == direct.b_g2

    proof = create_random_proof(BLS12_381, AndDemo(True, True), ceremony)
    pvk = prepare_verifying_key(BLS12_381, direct.vk)
    verify_proof(BLS12_381, pvk, proof, [1])
