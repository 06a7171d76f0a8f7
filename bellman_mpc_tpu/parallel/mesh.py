"""Device-mesh construction and sharding helpers.

The reference is single-process (rayon threads + crossbeam channels,
bellman/src/multicore.rs); its parallelism inventory (SURVEY.md §2.6) maps
here to:

  * data-parallel chunking (Worker::scope)         -> vmap / batch axes
  * task futures (Worker::compute -> Waiter)       -> XLA async dispatch
  * window-parallel Pippenger / parallel FFT       -> lane-parallel kernels
  * NO distributed backend                         -> jax.sharding.Mesh with
    ICI collectives: the batch-of-proofs axis is the DP ("data") axis and
    the CRS/MSM base axis is the model-parallel ("model") axis; partial MSM
    results combine via all_gather + on-device group-add tree (group addition
    is not a psum-able monoid over limb tensors).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """A ("data", "model") mesh over the first n devices.

    `shape` fixes (data, model) extents; default puts everything on "data"
    (pure DP) unless n_devices is even and > 2, in which case model=2.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.array(devices[:n])
    if shape is None:
        if n % 2 == 0 and n > 2:
            shape = (n // 2, 2)
        else:
            shape = (n, 1)
    assert shape[0] * shape[1] == n
    return Mesh(devices.reshape(shape), ("data", "model"))


def proof_batch_spec() -> P:
    """Sharding for (L, B, ...) per-proof tensors: shard the proof axis."""
    return P(None, "data")


def base_shard_spec() -> P:
    """Sharding for (L, N) CRS base tensors: shard the base axis."""
    return P(None, "model")
