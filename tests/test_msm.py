"""MSM kernels: Pippenger vs ladder vs host oracle (multiexp.rs:285-327 port)."""

import random

import pytest

from bellman_mpc_tpu.curves import host as chost
from bellman_mpc_tpu.curves.device import g1_device
from bellman_mpc_tpu.fields.bls12_381 import R
from bellman_mpc_tpu.ops.msm import msm_host, msm_pippenger_host


def test_pippenger_matches_naive():
    rng = random.Random(4)
    n = 32
    bases = [chost.G1.mul(chost.G1.generator, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    # include edge scalars
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R - 1

    want = chost.G1.msm(bases, scalars)
    got_ladder = msm_host(g1_device, bases, scalars)
    got_pip = msm_pippenger_host(g1_device, bases, scalars, c=8)
    assert chost.G1.eq(got_ladder, want)
    assert chost.G1.eq(got_pip, want)


def test_pippenger_batched_matches_per_item():
    """Shared-base batched Pippenger (the batched-prover path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        msm_pippenger_batched,
    )
    from bellman_mpc_tpu.curves.device import scalars_to_bits

    rng = random.Random(6)
    n, B, c = 16, 3, 4
    bases = [chost.G1.mul(chost.G1.generator, rng.randrange(1, R)) for _ in range(n)]
    scalar_sets = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
    scalar_sets[0][0] = 0

    pts = g1_device.encode_points(bases)
    bits = jnp.stack(
        [scalars_to_bits(s, 255) for s in scalar_sets], axis=1
    )  # (255, B, n)
    digits = digits_from_bits(bits, c)
    out = jax.jit(
        lambda p, d: msm_pippenger_batched(g1_device.ops, p, d, c)
    )(pts, digits)
    got = g1_device.decode_points(tuple(x[..., 0] for x in out))
    for b in range(B):
        want = chost.G1.msm(bases, scalar_sets[b])
        assert chost.G1.eq(got[b], want)


def test_pippenger_batched_g2():
    """The G2 (rank-3 coordinate) batched Pippenger path."""
    import jax
    import jax.numpy as jnp

    from bellman_mpc_tpu.curves.device import g2_device, scalars_to_bits
    from bellman_mpc_tpu.ops.msm import digits_from_bits, msm_pippenger_batched

    rng = random.Random(8)
    n, B, c = 8, 2, 4
    bases = [chost.G2.mul(chost.G2.generator, k + 2) for k in range(n)]
    scalar_sets = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
    pts = g2_device.encode_points(bases)
    bits = jnp.stack([scalars_to_bits(s, 255) for s in scalar_sets], axis=1)
    digits = digits_from_bits(bits, c)
    out = jax.jit(
        lambda p, d: msm_pippenger_batched(g2_device.ops, p, d, c)
    )(pts, digits)
    got = g2_device.decode_points(tuple(x[..., 0] for x in out))
    for b in range(B):
        want = chost.G2.msm(bases, scalar_sets[b])
        assert chost.G2.eq(got[b], want)


def test_pippenger_duplicate_digits():
    """Many equal scalars stress the segmented-scan bucket path."""
    rng = random.Random(5)
    n = 16
    bases = [chost.G1.mul(chost.G1.generator, k + 1) for k in range(n)]
    scalars = [7] * 8 + [255] * 4 + [rng.randrange(R)] * 4
    want = chost.G1.msm(bases, scalars)
    got = msm_pippenger_host(g1_device, bases, scalars, c=8)
    assert chost.G1.eq(got, want)


def test_flat_pippenger_matches_per_item():
    """Flat single-scan Pippenger over pre-shifted bases (G1 and G2)."""
    import jax
    import jax.numpy as jnp

    from bellman_mpc_tpu.curves.device import g2_device, scalars_to_bits
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        msm_flat_pippenger,
        shifted_bases,
    )

    rng = random.Random(8)
    n, B, c = 8, 2, 4
    for group in (g1_device, g2_device):
        bases = [
            group.host.mul(group.host.generator, rng.randrange(1, R))
            for _ in range(n)
        ]
        bases[-1] = None  # identity padding lane
        scalar_sets = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
        scalar_sets[0][0] = 0
        scalar_sets[1][1] = R - 1

        pts = group.encode_points(bases)
        bits = jnp.stack(
            [scalars_to_bits(s, 255) for s in scalar_sets], axis=1
        )  # (255, B, n)

        def run(p, bt):
            sb = shifted_bases(group.ops, p, c)
            return msm_flat_pippenger(
                group.ops, sb, digits_from_bits(bt, c), c
            )

        out = jax.jit(run)(pts, bits)
        got = group.decode_points(tuple(x[..., 0] for x in out))
        for bi in range(B):
            want = group.host.msm(
                [p for p in bases if p is not None],
                [s for p, s in zip(bases, scalar_sets[bi]) if p is not None],
            )
            if want is None:
                assert got[bi] is None
            else:
                assert group.host.eq(got[bi], want), (group.name, bi)


def test_table_msm_matches_per_item():
    """Gather-table MSM (precomputed window bucket tables), G1 and G2."""
    import jax
    import jax.numpy as jnp

    from bellman_mpc_tpu.curves.device import g2_device, scalars_to_bits
    from bellman_mpc_tpu.ops.msm import (
        digits_from_bits,
        msm_table,
        window_tables,
    )

    rng = random.Random(9)
    n, B, c = 8, 2, 4
    for group in (g1_device, g2_device):
        bases = [
            group.host.mul(group.host.generator, rng.randrange(1, R))
            for _ in range(n)
        ]
        bases[2] = None  # identity padding lane
        scalar_sets = [[rng.randrange(R) for _ in range(n)] for _ in range(B)]
        scalar_sets[0][0] = 0
        scalar_sets[1][1] = R - 1

        pts = group.encode_points(bases)
        bits = jnp.stack(
            [scalars_to_bits(s, 255) for s in scalar_sets], axis=1
        )

        def run(p, bt):
            tab = window_tables(group.ops, p, c)
            return msm_table(group.ops, tab, digits_from_bits(bt, c))

        out = jax.jit(run)(pts, bits)
        got = group.decode_points(tuple(x[..., 0] for x in out))
        for bi in range(B):
            want = group.host.msm(
                [p for p in bases if p is not None],
                [s for p, s in zip(bases, scalar_sets[bi]) if p is not None],
            )
            if want is None:
                assert got[bi] is None
            else:
                assert group.host.eq(got[bi], want), (group.name, bi)


def test_msm_table_affine_rns_vs_host():
    """RNS/MXU window fold vs host oracle — G1 and G2, identity padding,
    negative signed digits exercising the pre-negation identity test."""
    import random

    import jax.numpy as jnp

    from bellman_mpc_tpu.curves import host as chost
    from bellman_mpc_tpu.curves.device import (
        g1_device,
        g2_device,
        scalars_to_bits,
    )
    from bellman_mpc_tpu.curves.rns_point import rns_g1_ops, rns_g2_ops
    from bellman_mpc_tpu.fields import bls12_381 as bc
    from bellman_mpc_tpu.ops import msm as M

    rng = random.Random(5)
    for grp, rops, dev in (
        (chost.G1, rns_g1_ops(), g1_device),
        (chost.G2, rns_g2_ops(), g2_device),
    ):
        N, B, c = 8, 2, 4
        pts = [
            grp.mul(grp.generator, rng.randrange(1, 1 << 64))
            for _ in range(N - 1)
        ] + [None]
        scalars = [[rng.randrange(bc.R) for _ in range(N)] for _ in range(B)]
        enc = dev.encode_points(pts)
        tab = M.window_tables_affine(dev.ops, enc, c)
        rtab, bound = M.tables_to_rns(rops, bc.fp, tab)
        bits = jnp.stack([scalars_to_bits(s, 255) for s in scalars], axis=1)
        sd = M.signed_digits(M.digits_from_bits(bits, c), c)
        out = M.msm_table_affine_rns(rops, bc.fp, rtab, sd, bound)
        got = dev.decode_points(tuple(x[..., 0] for x in out))
        assert got == [grp.msm(pts, s) for s in scalars], grp.name
