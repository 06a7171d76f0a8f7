"""Pairing-engine abstraction for the Groth16 protocol stack.

Plays the role of the `pairing::Engine` / `MultiMillerLoop` traits the
reference is generic over (used throughout bellman/src/groth16/).  Two
implementations:

  * `DummyEngine` — the mock engine over GF(64513) with G1 = G2 = Gt = Fr and
    pairing = field multiplication / multi-miller-loop = sum of products
    (port of bellman/src/groth16/tests/dummy_engine.rs:331-374).  Lets the
    whole protocol be validated in exact closed form.
  * `Bls12Engine` (groth16/bls12.py) — the real curve, with batched group
    kernels on TPU.

Group elements are opaque host objects; vectorized hot paths (batch fixed-
base multiplication, multi-scalar multiplication) are methods on the group
object so each engine routes them to its device kernels.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from ..fields.host import PrimeField
from ..fields.limb import LimbField
from ..fields.mock import mock, mock_host


class GroupAPI:
    """Group operation surface the protocol code is written against."""

    name: str

    def identity(self):
        raise NotImplementedError

    def generator(self):
        raise NotImplementedError

    def is_identity(self, p) -> bool:
        raise NotImplementedError

    def add(self, p, q):
        raise NotImplementedError

    def neg(self, p):
        raise NotImplementedError

    def mul(self, p, k: int):
        raise NotImplementedError

    def eq(self, p, q) -> bool:
        raise NotImplementedError

    # -- vectorized paths (device kernels for the real curve) ---------------
    def batch_mul(self, base, exps: Sequence[int]) -> List:
        """[base * e for e in exps] — generator-side fixed-base batch.

        Replaces the reference's wNAF window tables
        (bellman/src/groth16/generator.rs:311-328).
        """
        return [self.mul(base, e) for e in exps]

    def msm(
        self,
        bases: Sequence,
        scalars: Sequence[int],
        density: Optional[Sequence[bool]] = None,
    ):
        """Multi-scalar multiplication with the reference's density contract
        (bellman/src/multiexp.rs:88-157, 254-281): `density[i]` False means
        scalar i was never used and its base is *absent* from `bases`;
        zero scalars consume their base but contribute nothing.
        """
        acc = self.identity()
        j = 0
        for i, s in enumerate(scalars):
            if density is not None and not density[i]:
                continue
            base = bases[j]
            j += 1
            if s == 0:
                continue
            acc = self.add(acc, self.mul(base, s))
        return acc

    def intt(self, points: Sequence, host: PrimeField) -> List:
        """Inverse NTT over GROUP elements (radix-2, length a power of two).

        The Lagrange transform of a powers-of-tau ceremony:
        intt([tau^i * G]) == [L_j(tau) * G] without anyone knowing tau —
        the group instance of the reference's EvaluationDomain Group trait
        (bellman/src/domain.rs:192-259).  Host Cooley-Tukey by default;
        the BLS12-381 groups override with the device kernel
        (ops/group_ntt.py).
        """
        n = len(points)
        exp = n.bit_length() - 1
        assert 1 << exp == n, "group iNTT length must be a power of two"
        if n == 1:
            return list(points)
        omega = host.inv(host.nth_root_of_unity(exp))
        rev = _bitrev_list(n)
        x = [points[r] for r in rev]
        for s in range(1, exp + 1):
            m = 1 << s
            half = m >> 1
            step = n >> s
            for base in range(0, n, m):
                for j in range(half):
                    w = pow(omega, step * j, host.p)
                    u = x[base + j]
                    v = self.mul(x[base + j + half], w)
                    x[base + j] = self.add(u, v)
                    x[base + j + half] = self.add(u, self.neg(v))
        n_inv = host.inv(n)
        return [self.mul(p, n_inv) for p in x]


def _bitrev_list(n: int) -> List[int]:
    k = n.bit_length() - 1
    out = []
    for i in range(n):
        r = 0
        for b in range(k):
            r = (r << 1) | ((i >> b) & 1)
        out.append(r)
    return out


class Engine:
    """A pairing engine: scalar field + two source groups + pairing."""

    name: str
    fr_host: PrimeField
    fr: LimbField
    g1: GroupAPI
    g2: GroupAPI

    def pairing(self, p, q):
        return self.final_exponentiation(self.multi_miller_loop([(p, q)]))

    def multi_miller_loop(self, terms: Sequence[Tuple[object, object]]):
        raise NotImplementedError

    def final_exponentiation(self, ml):
        raise NotImplementedError

    def gt_eq(self, a, b) -> bool:
        raise NotImplementedError

    def gt_is_one(self, a) -> bool:
        """Is `a` the identity of Gt (mirrors E::Gt::identity())."""
        raise NotImplementedError

    def pairing_product_is_one(self, terms: Sequence[Tuple[object, object]]) -> bool:
        """prod_i e(p_i, q_i) == 1 — the pairing-equation shape both
        verifiers reduce to (verifier.rs:49-56, verifier/batch.rs:164-168).
        Engines may override with a fused device kernel (the BLS engine
        runs Miller loops + product + an equality-preserving final
        exponentiation in one program)."""
        return self.gt_is_one(self.final_exponentiation(self.multi_miller_loop(terms)))

    def prepare_g2(self, q):
        """Hook mirroring G2Prepared (identity transform by default)."""
        return q


# ----------------------------------------------------------------- DummyEngine
class _DummyGroup(GroupAPI):
    """G = (Fr, +) with 'scalar mul' = field mul (dummy_engine.rs:376-418)."""

    def __init__(self, host: PrimeField, name: str):
        self.host = host
        self.name = name

    def identity(self):
        return 0

    def generator(self):
        return 1

    def is_identity(self, p) -> bool:
        return p % self.host.p == 0

    def add(self, p, q):
        return (p + q) % self.host.p

    def neg(self, p):
        return (-p) % self.host.p

    def mul(self, p, k: int):
        return p * (k % self.host.p) % self.host.p

    def eq(self, p, q) -> bool:
        return (p - q) % self.host.p == 0


class DummyEngine(Engine):
    """Mock engine over GF(64513); pairing(a, b) = a*b (dummy_engine.rs:344-365)."""

    name = "dummy"

    def __init__(self):
        self.fr_host = mock_host
        self.fr = mock
        self.g1 = _DummyGroup(mock_host, "G1")
        self.g2 = _DummyGroup(mock_host, "G2")

    def multi_miller_loop(self, terms):
        p = self.fr_host.p
        return sum(a * b for a, b in terms) % p

    def final_exponentiation(self, ml):
        return ml

    def gt_eq(self, a, b) -> bool:
        return (a - b) % self.fr_host.p == 0

    def gt_is_one(self, a) -> bool:
        # Dummy Gt is (Fr, +): identity is 0 (dummy_engine.rs Group impl).
        return a % self.fr_host.p == 0


DUMMY = DummyEngine()
