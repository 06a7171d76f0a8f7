"""Constraint-system front-end tests (port of gadgets/test/mod.rs:428-469 test_cs)."""

import pytest

from bellman_mpc_tpu.fields.bls12_381 import fr_host
from bellman_mpc_tpu.r1cs import TestConstraintSystem


def test_cs():
    """Port of the reference's test_cs (gadgets/test/mod.rs:428-469)."""
    cs = TestConstraintSystem(fr_host)
    assert cs.is_satisfied()
    assert cs.num_constraints() == 0
    with cs.namespace("a"):
        a = cs.alloc("var", lambda: 10)
    with cs.namespace("b"):
        b = cs.alloc("var", lambda: 4)
    c = cs.alloc("product", lambda: 40)

    cs.enforce("mult", lambda lc: lc + a, lambda lc: lc + b, lambda lc: lc + c)
    assert cs.is_satisfied()
    assert cs.num_constraints() == 1

    cs.set("a/var", 4)

    one = TestConstraintSystem.one()
    cs.enforce("eq", lambda lc: lc + a, lambda lc: lc + one, lambda lc: lc + b)

    assert not cs.is_satisfied()
    assert cs.which_is_unsatisfied() == "mult"

    assert cs.get("product") == 40

    cs.set("product", 16)
    assert cs.is_satisfied()

    with cs.namespace("test1"):
        with cs.namespace("test2"):
            cs.alloc("hehe", lambda: 1)

    assert cs.get("test1/test2/hehe") == 1


def test_lc_operators():
    from bellman_mpc_tpu.r1cs import LinearCombination, Variable, INPUT, AUX

    f = fr_host
    a = Variable(AUX, 0)
    b = Variable(AUX, 1)
    lc = LinearCombination.zero(f) + a + (3, b)
    lc2 = LinearCombination.zero(f) + (2, lc) - a
    # lc2 = 2a + 6b - a = a + 6b
    assert lc2.eval([], [5, 7]) == (5 + 42) % f.p
    lc3 = lc - lc2  # (a + 3b) - (a + 6b) = -3b
    assert lc3.eval([], [5, 7]) == (-21) % f.p


def test_namespace_errors():
    cs = TestConstraintSystem(fr_host)
    with pytest.raises(ValueError):
        cs.alloc("has/slash", lambda: 1)
    cs.alloc("x", lambda: 1)
    with pytest.raises(ValueError):
        cs.alloc("x", lambda: 2)  # duplicate path
    with pytest.raises(KeyError):
        cs.get("nonexistent")


def test_hash_stability():
    """Structural hash changes with structure, not assignments."""
    def build(val):
        cs = TestConstraintSystem(fr_host)
        a = cs.alloc("a", lambda: val)
        cs.enforce("sq", lambda lc: lc + a, lambda lc: lc + a, lambda lc: lc + a)
        return cs

    h1 = build(1).hash()
    h2 = build(999).hash()
    assert h1 == h2
    cs3 = build(1)
    cs3.enforce("extra", lambda lc: lc, lambda lc: lc, lambda lc: lc)
    assert cs3.hash() != h1
    assert len(h1) == 64
