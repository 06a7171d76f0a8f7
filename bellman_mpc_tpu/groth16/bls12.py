"""The BLS12-381 pairing engine: host group mirror + TPU batch kernels.

Mirrors the role of the `bls12_381::Bls12` engine the reference plugs into
its generic Groth16 code (bellman/Cargo.toml:22; used with
`generate_parameters::<Bls12,_>` etc.).  Group elements at the protocol layer
are host affine points (tuples / None), but every bulk operation —
`batch_mul` (CRS generation ladders) and `msm` (prover queries) — routes
through the device kernels in ops/msm.py.  The pairing currently used for
*verification orchestration* is the exact host oracle
(curves/pairing_host.py); the batched device pairing (ops/pairing.py) backs
the vectorized paths (batch verifier, ceremony checks).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from ..curves import host as chost
from ..curves import pairing_host as ph
from ..curves.device import DeviceGroup, g1_device, g2_device
from ..fields import bls12_381 as bc
from ..fields.tower import FP12_ONE, fp12_eq, fp12_mul
from ..ops.msm import batch_mul_host, msm_host
from .engine import Engine, GroupAPI

_MSM_DEVICE_THRESHOLD = 4  # below this a host loop beats kernel dispatch


class _BlsGroup(GroupAPI):
    def __init__(self, device: DeviceGroup, name: str):
        self.device = device
        self.hostg = device.host
        self.name = name

    def identity(self):
        return None

    def generator(self):
        return self.hostg.generator

    def is_identity(self, p) -> bool:
        return p is None

    def add(self, p, q):
        return self.hostg.add(p, q)

    def neg(self, p):
        return self.hostg.neg(p)

    def mul(self, p, k: int):
        return self.hostg.mul(p, k)

    def eq(self, p, q) -> bool:
        return self.hostg.eq(p, q)

    def batch_mul(self, base, exps: Sequence[int]) -> List:
        if base is None:
            return [None] * len(exps)
        if len(exps) < _MSM_DEVICE_THRESHOLD:
            return [self.mul(base, e) for e in exps]
        return batch_mul_host(self.device, base, [e % bc.R for e in exps])

    def intt(self, points, host):
        """Group iNTT on device (ops/group_ntt.py) for ceremony-scale lists."""
        if len(points) <= 4:  # host butterflies beat a device dispatch
            return super().intt(points, host)
        import jax

        from ..ops.group_ntt import group_ntt

        enc = self.device.encode_points(list(points))
        out = jax.jit(
            lambda p: group_ntt(self.device.ops, host, p, inverse=True)
        )(enc)
        return self.device.decode_points(out)

    def msm(self, bases, scalars, density: Optional[Sequence[bool]] = None):
        # density contract of multiexp.rs:88-157 (see GroupAPI.msm)
        dense_bases, dense_scalars = [], []
        j = 0
        for i, s in enumerate(scalars):
            if density is not None and not density[i]:
                continue
            b = bases[j]
            j += 1
            s = s % bc.R
            if s == 0:
                continue
            dense_bases.append(b)
            dense_scalars.append(s)
        if not dense_bases:
            return None
        if len(dense_bases) < _MSM_DEVICE_THRESHOLD:
            acc = None
            for b, s in zip(dense_bases, dense_scalars):
                acc = self.add(acc, self.mul(b, s))
            return acc
        return msm_host(self.device, dense_bases, dense_scalars)


class Bls12Engine(Engine):
    name = "bls12_381"

    def __init__(self):
        self.fr_host = bc.fr_host
        self.fr = bc.fr
        self.g1 = _BlsGroup(g1_device, "G1")
        self.g2 = _BlsGroup(g2_device, "G2")

    def multi_miller_loop(self, terms):
        terms = [(p, q) for p, q in terms if p is not None and q is not None]
        if len(terms) >= _MSM_DEVICE_THRESHOLD:
            # Device batch: all Miller loops at once, product on host.
            from ..ops.pairing import miller_loop_batch, _encode_g1, _encode_g2, _bucket, _pad
            from ..ops import tower as dtw
            import jax
            import jax.numpy as jnp

            m = _bucket(len(terms))
            px, py, v1 = _encode_g1(_pad([t[0] for t in terms], m))
            qx, qy, v2 = _encode_g2(_pad([t[1] for t in terms], m))
            out = jax.jit(miller_loop_batch)(px, py, qx, qy, jnp.asarray(v1 & v2))
            vals = dtw.fp12_decode(out)[: len(terms)]
            acc = FP12_ONE
            for v in vals:
                acc = fp12_mul(acc, v)
            return acc
        acc = FP12_ONE
        for p, q in terms:
            acc = fp12_mul(acc, ph.miller_loop(p, q))
        return acc

    def final_exponentiation(self, ml):
        return ph.final_exponentiation(ml)

    def pairing_product_is_one(self, terms) -> bool:
        """Device-fused pairing-product check (verifier.rs:49-56 shape).

        On TPU the whole equation — batched Miller loops, Fp12 product
        tree, Granger–Scott x-chain final exponentiation — is ONE jitted
        program (ops/pairing.pairing_product_is_one).  On the CPU backend
        the generic path keeps test compile times bounded (host Miller
        loops for small term counts; the n>=4 device batch as today)."""
        terms = [(p, q) for p, q in terms if p is not None and q is not None]
        if not terms:
            return True
        import jax

        if jax.default_backend() == "cpu":
            # host oracle loop: CPU XLA pairing compiles cost minutes and
            # the CPU suite only ever checks small verify calls
            acc = FP12_ONE
            for p, q in terms:
                acc = fp12_mul(acc, ph.miller_loop(p, q))
            return self.gt_is_one(ph.final_exponentiation(acc))
        from ..ops.pairing import pairing_product_is_one as _dev

        return _dev([t[0] for t in terms], [t[1] for t in terms])

    def gt_eq(self, a, b) -> bool:
        return fp12_eq(a, b)

    def gt_is_one(self, a) -> bool:
        from ..fields.tower import fp12_is_one

        return fp12_is_one(a)


BLS12_381 = Bls12Engine()
