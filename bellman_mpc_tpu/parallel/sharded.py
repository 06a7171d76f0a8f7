"""Mesh-sharded kernels: multi-chip MSM and batched proving.

Scaling dimensions (SURVEY.md §2.6 / §5): circuit size (NTT domain, MSM base
count) and batch-of-proofs.  Mapping:

  * "data" mesh axis  — batch of proofs (embarrassingly parallel DP axis)
  * "model" mesh axis — MSM base-set sharding: each device reduces its shard
    of the CRS bases, partial sums combine with an all_gather over ICI plus a
    log-depth on-device group-add tree (group addition is not psum-able).

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
        # Combine partials across the model axis: gather + add tree.
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, "model"), part
        )  # each coord: (n_model, L, [2,] B_loc, 1)
        acc = jax.tree_util.tree_map(lambda x: x[0], gathered)
        for k in range(1, n_model):
            nxt = jax.tree_util.tree_map(lambda x, k=k: x[k], gathered)
            acc = point_add(ops, acc, nxt)
        return acc

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(base_spec, base_spec, base_spec, bits_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(points[0], points[1], points[2], bits)


def shard_batch_inputs(mesh: Mesh, arrays: Tuple[jnp.ndarray, ...], batch_axis: int = 1):
    """Place per-proof tensors with the proof axis sharded over "data"."""
    out = []
    for a in arrays:
        spec = [None] * a.ndim
        spec[batch_axis] = "data"
        out.append(jax.device_put(a, NamedSharding(mesh, P(*spec))))
    return tuple(out)
