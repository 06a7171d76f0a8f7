"""Host curve + pairing oracle self-checks (group laws, subgroup, bilinearity)."""

import random

import pytest

from bellman_mpc_tpu.curves.host import G1, G2
from bellman_mpc_tpu.fields.bls12_381 import R


@pytest.mark.parametrize("g", [G1, G2], ids=["G1", "G2"])
def test_group_laws(g):
    gen = g.generator
    assert g.is_on_curve(gen)
    assert g.in_subgroup(gen)
    p2 = g.add(gen, gen)
    assert g.is_on_curve(p2)
    assert g.eq(g.mul(gen, 2), p2)
    p5 = g.mul(gen, 5)
    assert g.eq(g.add(p2, g.mul(gen, 3)), p5)
    # identity / inverse
    assert g.eq(g.add(p5, g.neg(p5)), g.identity)
    assert g.eq(g.add(p5, g.identity), p5)
    # order
    assert g.mul(gen, R) is None
    assert g.eq(g.mul(gen, R + 7), g.mul(gen, 7))


def test_msm_matches_sum():
    rng = random.Random(1)
    pts = [G1.mul(G1.generator, rng.randrange(1, 1000)) for _ in range(8)]
    scalars = [rng.randrange(R) for _ in range(8)]
    acc = None
    for p, s in zip(pts, scalars):
        acc = G1.add(acc, G1.mul(p, s))
    assert G1.eq(G1.msm(pts, scalars), acc)


def test_pairing_bilinearity():
    from bellman_mpc_tpu.curves import pairing_host as ph
    from bellman_mpc_tpu.fields.tower import FP12_ONE, fp12_eq, fp12_mul, fp12_pow

    P1 = G1.generator
    Q1 = G2.generator
    e = ph.pairing(P1, Q1)
    assert not fp12_eq(e, FP12_ONE), "pairing must be non-degenerate"
    # e(aP, Q) == e(P, Q)^a  and  e(P, bQ) == e(P, Q)^b
    a, b = 5, 7
    assert fp12_eq(ph.pairing(G1.mul(P1, a), Q1), fp12_pow(e, a))
    assert fp12_eq(ph.pairing(P1, G2.mul(Q1, b)), fp12_pow(e, b))
    assert fp12_eq(ph.pairing(G1.mul(P1, a), G2.mul(Q1, b)), fp12_pow(e, a * b))
    # identity edges
    assert fp12_eq(ph.pairing(None, Q1), FP12_ONE)
    # multi_miller_loop product structure:
    # e(P,Q)*e(2P,Q) == e(3P,Q)
    mm = ph.final_exponentiation(
        ph.multi_miller_loop([(P1, Q1), (G1.mul(P1, 2), Q1)])
    )
    assert fp12_eq(mm, ph.pairing(G1.mul(P1, 3), Q1))
