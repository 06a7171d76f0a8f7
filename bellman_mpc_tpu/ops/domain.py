"""Polynomial evaluation domains with radix-2 NTT on device.

TPU-native redesign of the reference's `EvaluationDomain`
(bellman/src/domain.rs:21-190): `from_coeffs` pads to 2^k and derives omega
(domain.rs:47-79), `fft`/`ifft` (:81-99), `distribute_powers` (:101-113),
`coset_fft`/`icoset_fft` (:115-125), the vanishing polynomial z(tau)=tau^m-1
(:129-134), `divide_by_z_on_coset` (:139-151) and pointwise
`mul_assign`/`sub_assign` (:154-190).

Instead of the reference's thread-pool butterfly loops
(serial: domain.rs:272-314, parallel: :316-372), the transform here is an
iterative Cooley-Tukey network expressed as reshape + batched Montgomery
multiply over ``(L, n)`` limb arrays: each stage is ONE vectorized field
multiply of n/2 elements (lane-parallel on the VPU) plus adds — the whole
k-stage network traces into a single XLA program, fused end-to-end with the
surrounding h-poly pipeline (see groth16/prover.py).  The reference's
parallel-FFT decomposition re-appears at the mesh level in
parallel/sharding.py, with the shared-memory interleave replaced by ICI
collectives.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import PrimeField
from ..fields.limb import LimbField
from ..r1cs.core import PolynomialDegreeTooLarge


def domain_size_for(n_coeffs: int, host_field: PrimeField) -> Tuple[int, int]:
    """(m, exp) of the smallest 2^exp >= n_coeffs; errors past two-adicity.

    Mirrors from_coeffs' growth loop including its exp >= S bound
    (domain.rs:47-60): the largest representable domain is 2^(S-1).
    """
    m, exp = 1, 0
    while m < n_coeffs:
        m *= 2
        exp += 1
        if exp >= host_field.S:
            raise PolynomialDegreeTooLarge(
                f"domain 2^{exp} exceeds field two-adicity {host_field.S}"
            )
    return m, exp


def _bitrev_indices(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for _ in range(k):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(field: LimbField, host: PrimeField, exp: int, inverse: bool):
    """Per-stage twiddle tables (Montgomery form), cached per (field, size)."""
    n = 1 << exp
    omega = host.nth_root_of_unity(exp)
    if inverse:
        omega = host.inv(omega)
    tws = []
    for s in range(1, exp + 1):
        half = 1 << (s - 1)
        step = n >> s
        tws.append(field.encode([pow(omega, step * j, host.p) for j in range(half)]))
    return tuple(tws)


def ntt(field: LimbField, host: PrimeField, x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order radix-2 NTT over the trailing axis of an (L, n) limb array.

    Pure traced function — call inside jit.  `inverse` applies omega^{-1} and
    the final 1/n scaling (ifft semantics, domain.rs:85-99).
    """
    L, n = x.shape
    exp = n.bit_length() - 1
    assert 1 << exp == n
    if n == 1:
        return x
    rev = jnp.asarray(_bitrev_indices(n))
    x = x[:, rev]
    tws = _stage_twiddles(field, host, exp, inverse)
    for s in range(1, exp + 1):
        m = 1 << s
        half = m >> 1
        xr = x.reshape(L, n // m, m)
        u = xr[:, :, :half]
        v = field.mul(xr[:, :, half:], tws[s - 1][:, None, :])
        x = jnp.concatenate([field.add(u, v), field.sub(u, v)], axis=2).reshape(L, n)
    if inverse:
        x = field.mul_const(x, host.inv(n))
    return x


def distribute_powers(field: LimbField, host: PrimeField, x: jnp.ndarray, g: int) -> jnp.ndarray:
    """coeff_i *= g^i (domain.rs:101-113), with the power table built by
    device-side length doubling (log n multiplies) instead of a host loop."""
    L, n = x.shape
    pows = field.mont_one((1,))
    g_pow = field.const(g, (1,))  # g^(2^i) ladder
    while pows.shape[1] < n:
        pows = jnp.concatenate([pows, field.mul(pows, g_pow)], axis=1)
        g_pow = field.square(g_pow)
    return field.mul(x, pows[:, :n])


class EvaluationDomain:
    """Host orchestrator mirroring the reference EvaluationDomain API.

    Holds device coefficients (Montgomery limb array) plus host constants.
    Methods dispatch jitted device transforms; the Groth16 prover fuses the
    whole h-pipeline in one jit instead (groth16/prover.py).
    """

    def __init__(self, field: LimbField, host: PrimeField, coeffs: jnp.ndarray, exp: int):
        self.field = field
        self.host = host
        self.coeffs = coeffs
        self.exp = exp

    @classmethod
    def from_coeffs(cls, field: LimbField, host: PrimeField, values: List[int]) -> "EvaluationDomain":
        m, exp = domain_size_for(len(values), host)
        padded = list(values) + [0] * (m - len(values))
        return cls(field, host, field.encode(padded), exp)

    @classmethod
    def from_device(cls, field: LimbField, host: PrimeField, arr: jnp.ndarray) -> "EvaluationDomain":
        n = arr.shape[1]
        m, exp = domain_size_for(n, host)
        if m != n:
            arr = jnp.concatenate([arr, field.zeros((m - n,))], axis=1)
        return cls(field, host, arr, exp)

    def __len__(self) -> int:
        return self.coeffs.shape[1]

    def into_coeffs(self) -> List[int]:
        return self.field.decode(self.coeffs)

    def fft(self) -> None:
        self.coeffs = _jit_ntt(self.field, self.host, False)(self.coeffs)

    def ifft(self) -> None:
        self.coeffs = _jit_ntt(self.field, self.host, True)(self.coeffs)

    def distribute_powers(self, g: int) -> None:
        self.coeffs = _jit_distribute(self.field, self.host, g % self.host.p)(self.coeffs)

    def coset_fft(self) -> None:
        self.distribute_powers(self.host.generator)
        self.fft()

    def icoset_fft(self) -> None:
        self.ifft()
        self.distribute_powers(self.host.inv(self.host.generator))

    def z(self, tau: int) -> int:
        return (pow(tau, len(self), self.host.p) - 1) % self.host.p

    def divide_by_z_on_coset(self) -> None:
        zinv = self.host.inv(self.z(self.host.generator))
        self.coeffs = _jit_mul_const(self.field, zinv)(self.coeffs)

    def mul_assign(self, other: "EvaluationDomain") -> None:
        assert len(self) == len(other)
        self.coeffs = self.field.mul(self.coeffs, other.coeffs)

    def sub_assign(self, other: "EvaluationDomain") -> None:
        assert len(self) == len(other)
        self.coeffs = self.field.sub(self.coeffs, other.coeffs)


def warm_twiddles(field: LimbField, host: PrimeField, exp: int) -> None:
    """Build twiddle caches outside any jit trace (avoids tracer leaks)."""
    if exp >= 1:
        _stage_twiddles(field, host, exp, False)
        _stage_twiddles(field, host, exp, True)


@functools.lru_cache(maxsize=None)
def _jit_ntt(field: LimbField, host: PrimeField, inverse: bool):
    def run(x):
        warm_twiddles(field, host, x.shape[1].bit_length() - 1)
        return jax.jit(lambda y: ntt(field, host, y, inverse))(x)

    return run


@functools.lru_cache(maxsize=None)
def _jit_distribute(field: LimbField, host: PrimeField, g: int):
    return jax.jit(lambda x: distribute_powers(field, host, x, g))


@functools.lru_cache(maxsize=None)
def _jit_mul_const(field: LimbField, c: int):
    return jax.jit(lambda x: field.mul_const(x, c))
