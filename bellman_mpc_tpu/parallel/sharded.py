"""Mesh-sharded kernels: multi-chip MSM and batched proving.

Scaling dimensions (SURVEY.md §2.6 / §5): circuit size (NTT domain, MSM base
count) and batch-of-proofs.  Mapping:

  * "data" mesh axis  — batch of proofs (embarrassingly parallel DP axis)
  * "model" mesh axis — MSM base-set sharding: each device reduces its shard
    of the CRS bases, partial sums combine with a log-depth ppermute
    butterfly over ICI (group addition is not psum-able).

This is the TPU-native replacement for the reference's intra-process
parallel decompositions (window-parallel Pippenger multiexp.rs:238-249 and
the 2-level parallel FFT domain.rs:316-372, whose shared-memory interleave
becomes the ICI collective here).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.device import (
    point_add,
    scalar_mul_bits,
    tree_reduce,
)


def _butterfly_combine(ops, part, axis: str, n_devices: int):
    """All-reduce of group-point partials over a mesh axis in log2(D) steps.

    Group addition is not psum-able, so the combine is a recursive-doubling
    butterfly: at step s every device exchanges its running partial with the
    device whose axis index differs in bit s (one `ppermute` over ICI) and
    adds it — after log2(D) steps every device holds the full sum.  Each
    device performs exactly log2(D) point additions at local width, versus
    the O(D) fully-replicated sequential adds of an all_gather + loop (the
    scalable form of the reference's window fold, multiexp.rs:238-249).
    """
    step = 1
    while step < n_devices:
        perm = [(i, i ^ step) for i in range(n_devices)]
        other = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis, perm), part
        )
        part = point_add(ops, part, other)
        step *= 2
    return part


def sharded_msm(mesh: Mesh, ops, points, bits):
    """MSM with bases sharded over the "model" axis, proofs over "data".

    points: coord tuple, each (L, [2,] N); bits: (NBITS, B, N).
    Returns fully-reduced (L, [2,] B, 1) points, replicated over "model".
    """
    n_model = mesh.shape["model"]

    coord_rank = points[0].ndim  # 2 for G1 coords, 3 for G2
    base_spec = P(*([None] * (coord_rank - 1) + ["model"]))
    bits_spec = P(None, "data", "model")
    out_spec = P(*([None] * (coord_rank - 1) + ["data", None]))

    def local(px, py, pz, bits):
        per = scalar_mul_bits(ops, (px[..., None, :], py[..., None, :], pz[..., None, :]), bits)
        part = tree_reduce(ops, per)  # local partial (L, [2,] B_loc, 1)
        # Combine partials across the model axis: log-depth butterfly.
        return _butterfly_combine(ops, part, "model", n_model)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(base_spec, base_spec, base_spec, bits_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(points[0], points[1], points[2], bits)


def sharded_msm_table(mesh: Mesh, ops, tables, digits):
    """Gather-table MSM (ops.msm.msm_table) with the base axis sharded over
    the "model" mesh axis and proofs over "data".

    tables: coord tuple (L, [2,] W, 2^c, N) from `window_tables` (the N axis
    is sharded); digits: (W, B, N).  Each device folds its base shard with
    the single-chip kernel, then partials combine with a log-depth
    recursive-doubling butterfly over ICI (_butterfly_combine).
    """
    from ..ops.msm import msm_table

    n_model = mesh.shape["model"]
    coord_rank = tables[0].ndim  # 4 (G1) or 5 (G2)
    base_spec = P(*([None] * (coord_rank - 1) + ["model"]))
    digit_spec = P(None, "data", "model")
    out_spec = P(*([None] * (coord_rank - 3) + ["data", None]))

    def local(tx, ty, tz, dig):
        part = msm_table(ops, (tx, ty, tz), dig)  # (L, [2,] B_loc, 1)
        return _butterfly_combine(ops, part, "model", n_model)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(base_spec, base_spec, base_spec, digit_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(tables[0], tables[1], tables[2], digits)


def sharded_msm_table_affine(mesh: Mesh, ops, tables, sdigits):
    """Signed-affine gather-table MSM (ops.msm.msm_table_affine — the
    shipping single-chip "table" strategy) with the CRS base axis sharded
    over the "model" mesh axis and the proof batch over "data".

    tables: (x, y) coord tuple (L, [2,] W, nb, N) from `window_tables_affine`
    (N sharded over "model"); sdigits: (W, B, N) signed digits (B sharded
    over "data", N over "model").  Each device runs the unmodified
    single-chip fold on its base shard — the (0,0) identity sentinel and
    complete mixed addition make shards independent — and the per-shard
    partial sums combine with a log-depth recursive-doubling ppermute
    butterfly over ICI (_butterfly_combine).  This is the
    mesh-level form of the reference's window-parallel Pippenger
    decomposition (bellman/src/multiexp.rs:238-249), applied to the base
    axis instead (SURVEY.md §2.6)."""
    from ..ops.msm import msm_table_affine

    n_model = mesh.shape["model"]
    coord_rank = tables[0].ndim  # 4 (G1) or 5 (G2)
    base_spec = P(*([None] * (coord_rank - 1) + ["model"]))
    digit_spec = P(None, "data", "model")
    out_spec = P(*([None] * (coord_rank - 3) + ["data", None]))

    def local(tx, ty, dig):
        part = msm_table_affine(ops, (tx, ty), dig)  # (L, [2,] B_loc, 1)
        return _butterfly_combine(ops, part, "model", n_model)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(base_spec, base_spec, digit_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(tables[0], tables[1], sdigits)


def sharded_ntt(mesh: Mesh, field, host, x, inverse: bool = False):
    """Distributed radix-2 NTT via the 4-step (N1 x N2) decomposition.

    This is the mesh-level form of the reference's 2-level parallel FFT
    (bellman/src/domain.rs:316-372): per-device sub-NTTs over the matrix
    axes with the shared-memory interleave replaced by an ICI all-to-all
    reshard between the column and row passes.

    x: (L, N) limb array (natural order); returns the same-order transform
    as ops.domain.ntt.  N1 = number of "model" devices; N2 = N / N1.
    """
    import numpy as np

    from ..ops.domain import ntt as local_ntt, warm_twiddles

    D = mesh.shape["model"]
    L, N = x.shape
    if D == 1:
        import jax as _jax

        return _jax.jit(
            lambda y: local_ntt(field, host, y, inverse=inverse)
        )(x)
    assert N % D == 0
    N1, N2 = D, N // D
    assert N1 & (N1 - 1) == 0 and N2 & (N2 - 1) == 0
    warm_twiddles(field, host, N2.bit_length() - 1)
    p = host.p
    logN = N.bit_length() - 1
    omega = host.nth_root_of_unity(logN)
    if inverse:
        omega = host.inv(omega)

    # Roots for the two sub-transforms.
    w_n1 = pow(omega, N2, p)  # primitive N1-th root
    w_n2 = pow(omega, N1, p)  # primitive N2-th root

    # Full twiddle matrix T[k1, n2] = omega^(k1*n2) (host-built, Montgomery).
    tw = field.encode(
        [pow(omega, k1 * n2, p) for k1 in range(N1) for n2 in range(N2)]
    ).reshape(L, N1, N2)

    # Small-N1 DFT matrix W[k1, n1] = w_n1^(k1*n1) (N1 = device count, tiny).
    dft1 = field.encode(
        [pow(w_n1, k1 * n1, p) for k1 in range(N1) for n1 in range(N1)]
    ).reshape(L, N1, N1)

    # The local row pass applies local_ntt(inverse=...), which already scales
    # by 1/N2 when inverting; the remaining 1/N1 factor is applied here.
    minv1 = field.encode([host.inv(N1)])[:, 0] if inverse else None

    def local(xl, twl, dft1l):
        # xl: (L, N1, N2loc) — the n2 axis sharded across "model".
        # Step 1: size-N1 DFT over n1 (N1 = device count, so an explicit
        # small matrix-vector product): A[k1, j] = sum_n1 W[k1, n1] x[n1, j].
        prod = field.mul(dft1l[:, :, :, None], xl[:, None, :, :])
        a = prod[:, :, 0, :]
        for n1 in range(1, N1):
            a = field.add(a, prod[:, :, n1, :])
        # Step 2: twiddle by omega^(k1*n2).
        b = field.mul(a, twl)
        # Step 3: ICI all-to-all — reshard from n2-sharded to k1-sharded
        # (the reference's shared-memory interleave, domain.rs:358-371).
        bt = jax.lax.all_to_all(
            b, "model", split_axis=1, concat_axis=2, tiled=True
        )  # local (L, N1/D, N2)
        # Step 4: size-N2 NTT over each local row; omega^N1 is exactly the
        # canonical size-N2 root, so the cached local twiddles apply.
        c = jax.vmap(
            lambda r: local_ntt(field, host, r, inverse=inverse),
            in_axes=1,
            out_axes=1,
        )(bt)
        if inverse:
            c = field.mul(c, minv1[:, None, None])
        return c

    # NOTE on step 4: local_ntt applies the standard omega for size N2 — we
    # need root w_n2; ops.domain caches twiddles per (field, size) from the
    # field's canonical root, and w_n2 IS the canonical size-N2 root when
    # omega is canonical for size N (omega^N1 has order N2, and equals the
    # canonical 2^log(N2) root since both are root_of_unity^(2^(S-logN)*N1)).
    in_spec = P(None, None, "model")
    out_spec = P(None, "model", None)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec, in_spec, P(None, None, None)),
        out_specs=out_spec,
        check_vma=False,
    )
    xm = x.reshape(L, N1, N2)
    c = fn(xm, tw, dft1)  # (L, N1, N2), k1 on axis 1
    # X[k1 + N1*k2] = C[k1, k2] -> transpose to (k2-major) natural order
    return jnp.transpose(c, (0, 2, 1)).reshape(L, N)


def shard_batch_inputs(mesh: Mesh, arrays: Tuple[jnp.ndarray, ...], batch_axis: int = 1):
    """Place per-proof tensors with the proof axis sharded over "data"."""
    out = []
    for a in arrays:
        spec = [None] * a.ndim
        spec[batch_axis] = "data"
        out.append(jax.device_put(a, NamedSharding(mesh, P(*spec))))
    return tuple(out)
