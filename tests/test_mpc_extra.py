"""Standalone tau-list protocol (mpc.rs:182-355) + ceremony checkpointing.

BLS ceremony-state serialization uses the real curve; the tau-list protocol
runs on the mock engine (pairing checks exact)."""

import pytest

from bellman_mpc_tpu.groth16 import DUMMY
from bellman_mpc_tpu.groth16.mpc import (
    CeremonyError,
    init_tau_parameter_list,
    mpc_common_tauparamters_custom_generator,
    tau_paramter_list_excute,
    verify_mpc_x,
    verify_x_pow,
)

P = DUMMY.fr_host.p


def test_tau_list_protocol():
    """x^1-based standalone tau vectors (mpc.rs:230-355)."""
    n = 4
    lst = init_tau_parameter_list(DUMMY, n)
    # player 1 contributes x=3: my_x = [3, 9, 27, 81]
    x = 3
    my_x = [pow(x, i + 1, P) for i in range(n)]
    c1 = mpc_common_tauparamters_custom_generator(DUMMY, lst[-1], my_x)
    assert verify_x_pow(DUMMY, c1)
    lst = tau_paramter_list_excute(DUMMY, lst, c1)
    assert [p.g1_result for p in lst[-1].list] == [3, 9, 27, 81]

    # player 2 contributes x=5 on top
    y = 5
    my_y = [pow(y, i + 1, P) for i in range(n)]
    c2 = mpc_common_tauparamters_custom_generator(DUMMY, lst[-1], my_y)
    lst = tau_paramter_list_excute(DUMMY, lst, c2)
    assert [p.g1_result for p in lst[-1].list] == [
        pow(15, i + 1, P) for i in range(n)
    ]

    # inconsistent powers are rejected
    bad = mpc_common_tauparamters_custom_generator(DUMMY, lst[-1], [2, 4, 8, 17])
    assert not verify_x_pow(DUMMY, bad)
    with pytest.raises(CeremonyError):
        tau_paramter_list_excute(DUMMY, lst, bad)


def test_ceremony_state_serialization_roundtrip():
    from bellman_mpc_tpu.groth16.bls12 import BLS12_381
    from bellman_mpc_tpu.groth16.mpc import (
        initial_common_paramters,
        initial_uncommon_paramters,
        matrix_storage,
        mpc_common_paramters_generator,
    )
    from bellman_mpc_tpu.groth16.mpc_serialize import (
        common_storage_from_bytes,
        common_storage_to_bytes,
        uncommon_storage_from_bytes,
        uncommon_storage_to_bytes,
    )

    st = initial_common_paramters(BLS12_381, 4)
    # one (unverified) contribution to make the points non-trivial
    c = mpc_common_paramters_generator(BLS12_381, st, (2, 3, 5))
    st = c.to_storage_format()

    raw = common_storage_to_bytes(st)
    back = common_storage_from_bytes(raw)
    assert back == st

    m = matrix_storage(
        st, BLS12_381, [[(1, 0)]], [[(1, 1)]], [[]], [], [], [], 2
    )
    ust = initial_uncommon_paramters(BLS12_381, m)
    raw2 = uncommon_storage_to_bytes(ust)
    assert uncommon_storage_from_bytes(raw2) == ust
