"""RNS (residue number system) field engine — the MXU path for Fp.

Why this exists: the MSM window fold is ~82% of the batched prove step, and
its limb-based point additions already run at the VPU's roofline (carry
propagation costs as much as the multiply MACs; DESIGN-NOTES.md round-3
profile).  Field multiplies have no lane-shared operand, so the MXU (the
chip's ~100x-bigger compute unit) can only enter through a representation
whose reduction step multiplies by CONSTANTS.  RNS Montgomery multiplication
(Bajard et al.) is exactly that:

  * a value x < ~40p is held as residues  x mod m_c  for 67 coprime ~12-bit
    primes, split into two bases B (33), B' (33) plus one redundant channel
    m_r (Shenoy-Kumaresan);
  * add/sub/neg are 1-2 vector ops per channel — NO carry chains at all;
  * mul is: channelwise products + f32-reciprocal Barrett (loop-free), one
    base extension B -> B' ∪ {m_r} and one exact extension B' -> B, each a
    (102, 66) x (66, lanes) CONSTANT int8 matmul on the MXU.

Algebra (RNS Montgomery with M-residues x~ = x*M mod p):

    t   = x*y                 channelwise, all 67 channels
    xi_i = t_i * kappa_i      (i in B), kappa_i = (-p^{-1} (M/m_i)^{-1}) mod m_i
    q^p = sum_i xi_i * ((M/m_i) p)   extended to B' ∪ {m_r} by matmul
          (q^ = q + alpha*M for some 0 <= alpha < 33 -- harmless: it is
           multiplied by p, so r below is unchanged mod p)
    r'  = (t + q^p) * M^{-1}  channelwise on B' ∪ {m_r}; r = (t + q^p)/M
          exactly, r ≡ x y M^{-1} (mod p), r < (A_x A_y p/M + 33) p
    xi'_j = r'_j * (M'/m'_j)^{-1}    (j in B')
    alpha' = (sum_j xi'_j (M'/m'_j) - r) M'^{-1}  mod m_r   [exact: r < M']
    r_i = sum_j xi'_j (M'/m'_j) - alpha' M'   mod m_i       (i in B)

Every value carries a trace-time bound A (value < A*p, exact host rational
bookkeeping) proving r < M' (exact second extension), channel inputs < 2^24
(f32-Barrett exactness), and int8-split matmul accumulations < 2^31.

This replaces no reference component one-for-one: it is the TPU-native form
of the Fp arithmetic underneath the reference's Pippenger multiexp
(bellman/src/multiexp.rs:159-281) and group ops, re-designed for the MXU.
"""

from __future__ import annotations

from fractions import Fraction
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------- host primes


def _primes_desc(below: int, count: int) -> List[int]:
    """The `count` largest primes < below (host sieve)."""
    sieve = np.ones(below, dtype=bool)
    sieve[:2] = False
    for i in range(2, int(below ** 0.5) + 1):
        if sieve[i]:
            sieve[i * i :: i] = False
    primes = np.nonzero(sieve)[0][::-1]
    assert len(primes) >= count, "not enough primes below bound"
    return [int(x) for x in primes[:count]]


class RnsVal:
    """A device RNS value: (C, *batch) int32 canonical channel residues plus
    the trace-time integer bound `a` (value < a * p, tracked exactly)."""

    __slots__ = ("f", "res", "a")

    def __init__(self, f: "RnsField", res: jnp.ndarray, a: Fraction):
        self.f = f
        self.res = res
        self.a = Fraction(a)
        # value < min(M, M'): base-B CRT determines it AND the exact
        # second extension (which needs r < M') stays valid.
        assert self.a * f.p < f.Mmin, "RNS value bound exceeds base range"

    # ----------------------------------------------------------- arithmetic
    def __add__(self, o: "RnsVal") -> "RnsVal":
        f = self.f
        s = self.res + o.res
        s = jnp.where(s >= f.m_bc(s), s - f.m_bc(s), s)
        return RnsVal(f, s, self.a + o.a)

    def __sub__(self, o: "RnsVal") -> "RnsVal":
        """self - o + K*p for the smallest integer K with K >= o.a."""
        f = self.f
        K = int(-(-o.a.numerator // o.a.denominator))  # ceil(o.a)
        kp = f.kp_table(K)  # (C,) residues of K*p
        s = self.res - o.res + kp.reshape((f.C,) + (1,) * (self.res.ndim - 1))
        s = jnp.where(s >= f.m_bc(s), s - f.m_bc(s), s)
        s = jnp.where(s < 0, s + f.m_bc(s), s)
        return RnsVal(f, s, self.a + K)

    def neg(self) -> "RnsVal":
        f = self.f
        K = int(-(-self.a.numerator // self.a.denominator))
        kp = f.kp_table(K)
        s = kp.reshape((f.C,) + (1,) * (self.res.ndim - 1)) - self.res
        s = jnp.where(s >= f.m_bc(s), s - f.m_bc(s), s)
        # keep residues CANONICAL: kp < m and res < m make s > -m possible;
        # without this fixup, negative residues chain through later adds and
        # push products past the f32-exact 2^24 window the Pallas fold's
        # float pipeline relies on (int32 XLA merely tolerated them).
        s = jnp.where(s < 0, s + f.m_bc(s), s)
        return RnsVal(f, s, Fraction(K))

    def scale(self, k: int) -> "RnsVal":
        """Multiply by a small non-negative host integer (e.g. curve b3)."""
        f = self.f
        assert 0 <= k < (1 << 12)
        return RnsVal(f, f.barrett(self.res * k), self.a * k)

    def double(self) -> "RnsVal":
        return self + self


class RnsField:
    """RNS context for GF(p) with two 33-prime 12-bit bases + one redundant
    channel; channel layout [B (33) | B' (33) | m_r] on a leading axis."""

    def __init__(self, p: int, k: int = 35, name: str = "Fp"):
        # k=35 (C=71) rather than the minimal 33: min(M, M')/p jumps from
        # ~4e3 to ~5e10, buying bound headroom for FREE small-integer
        # scales (b3 = 12 in the curve formulas) and for the G2 Karatsuba
        # operand sums (whose bound products reach ~1.6e8 at the point-add
        # fixpoint — see curves/rns_point.py), at +6% channelwise cost (the
        # extension matmuls pad to the same 128-wide MXU tile either way).
        self.p = p
        self.name = name
        self.k = k
        primes = _primes_desc(1 << 12, 2 * k + 1)
        # interleave so both bases get comparable products
        self.mB = primes[0::2][:k]
        self.mBp = primes[1::2][:k]
        self.mr = primes[2 * k]
        self.C = 2 * k + 1
        self.moduli = self.mB + self.mBp + [self.mr]
        M = 1
        for m in self.mB:
            M *= m
        Mp = 1
        for m in self.mBp:
            Mp *= m
        self.M, self.Mp = M, Mp
        self.Mmin = min(M, Mp)
        # Bound discipline: mul output < (Ax*Ay*p/M + k + 1) p; the exact
        # second extension needs r < M'.  Both hold with huge margin:
        assert M > (4 * k) * p and Mp > (4 * k) * p
        assert self.mr > k + 1

        # ---------------- channelwise constants -----------------------------
        mods = np.asarray(self.moduli, np.int32)
        self.m_np = mods
        self.m_dev = jnp.asarray(mods)
        # f32 reciprocals: exact-floor Barrett for t < 2^24 (see barrett()).
        self.inv_m_dev = jnp.asarray((1.0 / mods.astype(np.float64)), jnp.float32)

        # kappa_i = (-p^{-1} * (M/m_i)^{-1}) mod m_i on B; 0 elsewhere
        kappa = [0] * self.C
        for i, m in enumerate(self.mB):
            Mi = M // m
            kappa[i] = (-pow(p, -1, m) * pow(Mi, -1, m)) % m
        self.kappa_np = np.asarray(kappa, np.int32)
        self.kappa_dev = jnp.asarray(self.kappa_np)

        # M^{-1} mod m on B' ∪ {m_r}; 0 on B
        minv = [0] * self.C
        for j, m in enumerate(self.mBp):
            minv[k + j] = pow(M, -1, m)
        minv[2 * k] = pow(M, -1, self.mr)
        self.minv_np = np.asarray(minv, np.int32)
        self.minv_dev = jnp.asarray(self.minv_np)

        # (M'/m'_j)^{-1} mod m'_j on B'; 0 elsewhere
        ifac2 = [0] * self.C
        for j, m in enumerate(self.mBp):
            ifac2[k + j] = pow(Mp // m, -1, m)
        self.ifac2_np = np.asarray(ifac2, np.int32)
        self.ifac2_dev = jnp.asarray(self.ifac2_np)

        self.mpinv_mr = int(pow(Mp, -1, self.mr))  # M'^{-1} mod m_r
        # M' mod m_i on B (for the alpha' correction); 0 elsewhere
        mp_mod = [0] * self.C
        for i, m in enumerate(self.mB):
            mp_mod[i] = Mp % m
        self.mp_mod_np = np.asarray(mp_mod, np.int32)
        self.mp_mod_dev = jnp.asarray(self.mp_mod_np)

        # ---------------- extension matmul matrices -------------------------
        # ext1: targets B' ∪ {m_r} (34 rows), entries ((M/m_i) * p) mod target
        tg1 = self.mBp + [self.mr]
        W1 = np.zeros((k + 1, k), np.int64)
        for i, mi in enumerate(self.mB):
            v = (M // mi) * p
            for jt, mt in enumerate(tg1):
                W1[jt, i] = v % mt
        self.W1_np = self._int8_blocks(W1)
        self.W1_dev, self.n_tg1 = jnp.asarray(self.W1_np), k + 1

        # ext2: targets B ∪ {m_r} (34 rows), entries (M'/m'_j) mod target
        tg2 = self.mB + [self.mr]
        W2 = np.zeros((k + 1, k), np.int64)
        for j, mj in enumerate(self.mBp):
            v = Mp // mj
            for it, mt in enumerate(tg2):
                W2[it, j] = v % mt
        self.W2_np = self._int8_blocks(W2)
        self.W2_dev, self.n_tg2 = jnp.asarray(self.W2_np), k + 1

        # digit -> RNS conversion: targets ALL channels, sources 11-bit
        # limb digits (up to 2L = 72 of them; callers pass n_dig).
        self._digit_W = {}

        # ------------- CRT constants for RNS -> limb extraction -------------
        # ifac1_i = (M/m_i)^{-1} mod m_i on B (the CRT coefficients); the
        # redundant-channel row (M/m_i mod m_r) and M mod m_r drive the exact
        # Shenoy-Kumaresan alpha count; the digit matrix maps xi -> 11-bit
        # columns of sum_i xi_i * (M/m_i)  (value = V + alpha*M).
        ifac1 = [0] * self.C
        for i, m in enumerate(self.mB):
            ifac1[i] = pow(M // m, -1, m)
        self.ifac1_dev = jnp.asarray(ifac1, jnp.int32)
        self.mfac_mod_mr = jnp.asarray(
            [(M // m) % self.mr for m in self.mB], jnp.int32
        )  # (k,)
        self.m_mod_mr_inv = int(pow(M % self.mr, -1, self.mr))
        # columns of M itself (for the + (k - alpha) * M de-negation trick)
        self._crt_digit_W = {}  # limb_bits -> (int8 blocks, n_cols)
        self._m_digits = {}  # limb_bits -> (n_cols,) int32 digits of M

        # K*p residue tables (host-lazy, device-cached)
        self._kp_cache = {}

        # Montgomery-form conversion constants (RNS M-residue): values are
        # stored as x*M mod p.
        self.to_mont_const = (M * M) % p  # mul_const by M^2 gives x*M
        # from limb-Montgomery (x * 2^396 mod p) to RNS M-residue:
        #   rns_mul(u, M^2 * R_limb^{-1} mod p) = x*M
        self._from_limb_const = {}

        self._tg1_rows = jnp.asarray(
            [0] * 0, jnp.int32
        )  # placeholder (unused)

    # ------------------------------------------------------------ utilities
    def m_bc(self, like: jnp.ndarray) -> jnp.ndarray:
        return self.m_dev.reshape((self.C,) + (1,) * (like.ndim - 1))

    def _bc(self, const_1d: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
        return const_1d.reshape((const_1d.shape[0],) + (1,) * (like.ndim - 1))

    def kp_table(self, K: int) -> np.ndarray:
        # cached as NUMPY: may first be requested inside a trace (a cached
        # traced constant would leak the tracer); np constants embed fine.
        if K not in self._kp_cache:
            v = K * self.p
            self._kp_cache[K] = np.asarray(
                [v % m for m in self.moduli], np.int32
            )
        return self._kp_cache[K]

    @staticmethod
    def _int8_blocks(W: np.ndarray) -> np.ndarray:
        """(T, S) matrix with entries < 2^12 -> (3T, 2S) int8 block matrix
        [[Wl, 0], [Wh, Wl], [0, Wh]] so that ONE int8 matmul against
        [xl; xh] yields the three partials ll, (lh+hl), hh.

        Returned as NUMPY (cached matrices may first be requested inside a
        trace — caching a traced device constant would leak the tracer)."""
        T, S = W.shape
        assert W.max() < (1 << 12) and W.min() >= 0
        Wl = (W & 63).astype(np.int8)
        Wh = (W >> 6).astype(np.int8)
        out = np.zeros((3 * T, 2 * S), np.int8)
        out[:T, :S] = Wl
        out[T : 2 * T, :S] = Wh
        out[T : 2 * T, S:] = Wl
        out[2 * T :, S:] = Wh
        return out

    # ---------------------------------------------------------- device math
    def barrett(self, t: jnp.ndarray, chans: Optional[slice] = None) -> jnp.ndarray:
        """Channelwise t mod m via f32 reciprocal.  EXACT for 0 <= t < 2^24:
        t is f32-exact, |fl(t*fl(1/m)) - t/m| < 2^-10, so floor is off by at
        most 1 -- fixed by the two conditional corrections."""
        m = self.m_dev[chans] if chans is not None else self.m_dev
        inv = self.inv_m_dev[chans] if chans is not None else self.inv_m_dev
        m = m.reshape((m.shape[0],) + (1,) * (t.ndim - 1))
        inv = inv.reshape((inv.shape[0],) + (1,) * (t.ndim - 1))
        q = jnp.floor(t.astype(jnp.float32) * inv).astype(jnp.int32)
        r = t - q * m
        r = jnp.where(r < 0, r + m, r)
        return jnp.where(r >= m, r - m, r)

    def _ext_matmul(self, x: jnp.ndarray, W8: jnp.ndarray, n_tg: int) -> jnp.ndarray:
        """x: (k, *batch) canonical residues (< 2^12) -> (n_tg, *batch)
        values of sum_i x_i * W[t, i] mod m_target, via ONE int8 matmul.

        The matmul output blocks are ll, lh+hl, hh with <= k terms of
        6x6-bit products each (< 33*63*63 < 2^18); the recombination
        barretts keep every intermediate < 2^24 (f32-exact)."""
        k = x.shape[0]
        batch = x.shape[1:]
        xl = (x & 63).astype(jnp.int8).reshape(k, -1)
        xh = (x >> 6).astype(jnp.int8).reshape(k, -1)
        x2 = jnp.concatenate([xl, xh], axis=0)  # (2k, lanes)
        out = jax.lax.dot_general(
            W8, x2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (3*n_tg, lanes)
        out = out.reshape((3 * n_tg,) + batch)
        ll = out[:n_tg]
        mid = out[n_tg : 2 * n_tg]
        hh = out[2 * n_tg :]
        # value = ll + 64*mid + 4096*hh; two-stage exact reduction:
        #   hi = 64*hh + mid < 2^18.2*64 + 2^18.2 < 2^24  -> barrett -> < 2^12
        #   s  = 64*hi' + ll < 2^18 + 2^18 < 2^24         -> barrett
        chans = self._tg_slice(n_tg, W8)
        hi = self.barrett((hh << 6) + mid, chans)
        return self.barrett((hi << 6) + ll, chans)

    def _tg_slice(self, n_tg: int, W8: jnp.ndarray) -> slice:
        # ext1 targets channels [k : 2k+1] (B' ∪ m_r); ext2 targets
        # [0 : k] ∪ {m_r}.  Encoded by which matrix was passed.
        if W8 is self.W1_dev:
            return slice(self.k, 2 * self.k + 1)
        return None  # ext2 handled with explicit gather in mul_many

    # ------------------------------------------------------------- multiply
    def mul_many(self, pairs: Sequence[Tuple[RnsVal, RnsVal]]) -> List[RnsVal]:
        """Stacked RNS Montgomery multiply: k pairs through ONE pipeline.

        Stacking widens the matmul lane axis (MXU utilization) and fuses the
        channelwise passes.  Output value bound: Ax*Ay*p/M + k + 1."""
        f = self
        k = self.k
        C = self.C
        xs = jnp.stack([a.res for a, _ in pairs], axis=1)  # (C, S, *batch)
        ys = jnp.stack([b.res for _, b in pairs], axis=1)
        t = self.barrett(xs * ys)  # channel products; < m^2 < 2^24 in
        xi = self.barrett(
            t[:k] * self._bc(self.kappa_dev[:k], t[:k]), slice(0, k)
        )

        qp = self._ext_matmul(xi, self.W1_dev, self.n_tg1)  # (k+1, S, *b)
        # r' = (t + q^p) * M^{-1} on B' ∪ m_r
        t_hi = t[k:]  # (k+1, S, *b) channels B' ∪ m_r
        s = t_hi + qp
        m_hi = self.m_bc(t)[k:]
        s = jnp.where(s >= m_hi, s - m_hi, s)
        rp = self.barrett(
            s * self._bc(self.minv_dev[k:], s), slice(k, C)
        )  # (k+1, S, *b): canonical r mod (B' ∪ m_r)

        xi2 = self.barrett(
            rp[:-1] * self._bc(self.ifac2_dev[k : 2 * k], rp[:-1]),
            slice(k, 2 * k),
        )  # (k, S, *b)

        ext2 = self._ext2(xi2)  # (k+1, S, *b): targets B ∪ m_r, canonical
        # alpha' = (ext2[m_r] - r'_mr) * M'^{-1} mod m_r   (exact SK count)
        d = ext2[-1] - rp[-1]
        d = jnp.where(d < 0, d + self.mr, d)
        alpha = self.barrett(
            (d * self.mpinv_mr)[None], slice(2 * k, C)
        )[0]  # < m_r; true alpha' < k+1
        # r_i = ext2_i - alpha' * (M' mod m_i) mod m_i   on B
        corr = self.barrett(
            alpha[None] * self._bc(self.mp_mod_dev[:k], ext2[:k]),
            slice(0, k),
        )
        rB = ext2[:k] - corr
        mB = self.m_bc(t)[:k]
        rB = jnp.where(rB < 0, rB + mB, rB)

        res = jnp.concatenate([rB, rp], axis=0)  # (C, S, *batch)
        outs = []
        for i, (a, b) in enumerate(pairs):
            bound = a.a * b.a * Fraction(self.p, self.M) + (self.k + 1)
            # ceil to an integer: keeps the host bound bookkeeping O(1) per
            # op (exact Fractions of chained muls otherwise compound 380-bit
            # numerators exponentially) at a negligible loss of headroom.
            if bound.denominator != 1:
                bound = Fraction(
                    bound.numerator // bound.denominator + 1
                )
            outs.append(RnsVal(self, res[:, i], bound))
        return outs

    def _ext2(self, xi2: jnp.ndarray) -> jnp.ndarray:
        """Second extension matmul; targets B ∪ {m_r} -> per-channel
        canonical values (explicit channel indices for the barretts)."""
        k = self.k
        n_tg = self.n_tg2
        batch = xi2.shape[1:]
        xl = (xi2 & 63).astype(jnp.int8).reshape(k, -1)
        xh = (xi2 >> 6).astype(jnp.int8).reshape(k, -1)
        x2 = jnp.concatenate([xl, xh], axis=0)
        out = jax.lax.dot_general(
            self.W2_dev, x2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape((3 * n_tg,) + batch)
        ll, mid, hh = out[:n_tg], out[n_tg : 2 * n_tg], out[2 * n_tg :]
        # target moduli = B ∪ {m_r} = channels [0:k] + [2k]
        m = jnp.concatenate([self.m_dev[:k], self.m_dev[2 * k :]])
        inv = jnp.concatenate([self.inv_m_dev[:k], self.inv_m_dev[2 * k :]])

        def bar(t):
            mm = m.reshape((n_tg,) + (1,) * (t.ndim - 1))
            ii = inv.reshape((n_tg,) + (1,) * (t.ndim - 1))
            q = jnp.floor(t.astype(jnp.float32) * ii).astype(jnp.int32)
            r = t - q * mm
            r = jnp.where(r < 0, r + mm, r)
            return jnp.where(r >= mm, r - mm, r)

        hi = bar((hh << 6) + mid)
        return bar((hi << 6) + ll)

    def mul(self, a: RnsVal, b: RnsVal) -> RnsVal:
        return self.mul_many([(a, b)])[0]

    def mul_const(self, a: RnsVal, c: int) -> RnsVal:
        """Multiply by a host constant (weight M^{-1} like any RNS mul —
        pass c pre-multiplied by M mod p to preserve M-residue form)."""
        cv = self.encode_raw(c % self.p, like=a.res)
        return self.mul(a, RnsVal(self, cv, Fraction(1)))

    # ------------------------------------------------------- select / tests
    def select(self, cond: jnp.ndarray, a: RnsVal, b: RnsVal) -> RnsVal:
        return RnsVal(
            self, jnp.where(cond, a.res, b.res), max(a.a, b.a)
        )

    def is_zero_exact(self, a: RnsVal) -> jnp.ndarray:
        """True iff the represented INTEGER is exactly 0 (value < M makes
        all-B-channels-zero equivalent to zero)."""
        return jnp.all(a.res[: self.k] == 0, axis=0)

    # --------------------------------------------------------- encode/decode
    def encode_raw(self, v: int, like: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Residues of the integer v (host), broadcast to `like`'s batch."""
        r = jnp.asarray([v % m for m in self.moduli], jnp.int32)
        if like is None:
            return r
        return jnp.broadcast_to(
            r.reshape((self.C,) + (1,) * (like.ndim - 1)),
            (self.C,) + like.shape[1:],
        )

    def encode(self, values: Sequence[int], mont: bool = True) -> RnsVal:
        """Host ints -> (C, N) device residues in RNS M-residue form."""
        out = np.zeros((self.C, len(values)), np.int32)
        for j, v in enumerate(values):
            v = (v * self.M % self.p) if mont else (v % self.p)
            for i, m in enumerate(self.moduli):
                out[i, j] = v % m
        return RnsVal(self, jnp.asarray(out), Fraction(1))

    def decode(self, a: RnsVal, mont: bool = True) -> List[int]:
        """Device residues -> host ints (CRT over base B; value < M)."""
        res = np.asarray(a.res)
        flat = res.reshape(self.C, -1)
        out = []
        minv = pow(self.M, -1, self.p) if mont else 1
        for j in range(flat.shape[1]):
            v = 0
            for i, m in enumerate(self.mB):
                Mi = self.M // m
                v += int(flat[i, j]) * pow(Mi, -1, m) % m * Mi
            v %= self.M
            out.append(v * minv % self.p)
        return out

    # ------------------------------------------------- limb-form conversion
    def digit_matrix(self, n_dig: int, limb_bits: int = 11) -> jnp.ndarray:
        key = (n_dig, limb_bits)
        if key not in self._digit_W:
            W = np.zeros((self.C, n_dig), np.int64)
            for c, m in enumerate(self.moduli):
                for d in range(n_dig):
                    W[c, d] = pow(2, limb_bits * d, m)
            self._digit_W[key] = self._int8_blocks(W)
        return self._digit_W[key]

    def from_digits(
        self, digits: jnp.ndarray, bound: int, limb_bits: int = 11
    ) -> RnsVal:
        """(D, *batch) canonical limb digits (< 2^11) of a value < bound*p
        -> RNS residues of the SAME integer.

        One constant int8 matmul: res_c = sum_d digits_d * (2^(11 d) mod m_c).
        Digits must be < 2^12 (split lo6/hi6)."""
        D = digits.shape[0]
        W8 = self.digit_matrix(D, limb_bits)
        batch = digits.shape[1:]
        xl = (digits & 63).astype(jnp.int8).reshape(D, -1)
        xh = (digits >> 6).astype(jnp.int8).reshape(D, -1)
        x2 = jnp.concatenate([xl, xh], axis=0)
        out = jax.lax.dot_general(
            W8, x2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape((3 * self.C,) + batch)
        ll, mid, hh = out[: self.C], out[self.C : 2 * self.C], out[2 * self.C :]
        # accumulations: up to 72 terms of 6x6-bit products < 72*63*63 < 2^18.2
        hi = self.barrett((hh << 6) + mid)
        res = self.barrett((hi << 6) + ll)
        return RnsVal(self, res, Fraction(bound))

    # ------------------------------------------------- RNS -> limb conversion
    def crt_digit_matrix(self, limb_bits: int = 11):
        """Constant matrices for exact CRT digit extraction (see
        to_digit_cols): int8 blocks of digits(M/m_i) plus digits of M."""
        key = limb_bits
        if key not in self._crt_digit_W:
            k = self.k
            mask = (1 << limb_bits) - 1
            top = (k + 1) * self.M  # max extracted value V + k*M
            n_cols = -(-top.bit_length() // limb_bits)
            W = np.zeros((n_cols, k), np.int64)
            for i, m in enumerate(self.mB):
                v = self.M // m
                for d in range(n_cols):
                    W[d, i] = (v >> (limb_bits * d)) & mask
            mdig = [
                (self.M >> (limb_bits * d)) & mask for d in range(n_cols)
            ]
            self._crt_digit_W[key] = (self._int8_blocks(W), n_cols)
            self._m_digits[key] = np.asarray(mdig, np.int32)
        return self._crt_digit_W[key], self._m_digits[key]

    def to_digit_cols(
        self, a: RnsVal, limb_bits: int = 11
    ) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
        """EXACT CRT extraction: RNS residues of the integer V (< a.a * p)
        -> ((n_cols, *batch) int32 digit columns, per-column bounds) whose
        column value is V + k*M (the constant k*M offset keeps every column
        non-negative regardless of the data-dependent CRT count alpha).

        Mechanics: xi_i = V_i * (M/m_i)^{-1} mod m_i gives
        sum_i xi_i * (M/m_i) = V + alpha*M with alpha < k exactly; alpha is
        recovered exactly from the redundant channel (Shenoy-Kumaresan,
        alpha = (s_r - V_r) * M^{-1} mod m_r); the digit columns are ONE
        constant int8 matmul of xi against digits(M/m_i), plus
        (k - alpha) * digits(M)."""
        k = self.k
        xi = self.barrett(
            a.res[:k] * self._bc(self.ifac1_dev[:k], a.res[:k]), slice(0, k)
        )
        # exact alpha via the redundant channel
        w = self.mfac_mod_mr.reshape((k,) + (1,) * (xi.ndim - 1))
        s_r = jnp.sum(xi * w, axis=0)  # < k * 2^24 < 2^29.2
        s_r = self.barrett(s_r[None], slice(2 * k, self.C))[0]
        d = s_r - a.res[2 * k]
        d = jnp.where(d < 0, d + self.mr, d)
        alpha = self.barrett(
            (d * self.m_mod_mr_inv)[None], slice(2 * k, self.C)
        )[0]
        (W8, n_cols), mdig = self.crt_digit_matrix(limb_bits)
        batch = xi.shape[1:]
        xl = (xi & 63).astype(jnp.int8).reshape(k, -1)
        xh = (xi >> 6).astype(jnp.int8).reshape(k, -1)
        x2 = jnp.concatenate([xl, xh], axis=0)
        out = jax.lax.dot_general(
            W8, x2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape((3 * n_cols,) + batch)
        ll, mid, hh = out[:n_cols], out[n_cols : 2 * n_cols], out[2 * n_cols :]
        # value = ll + 64*mid + 4096*hh; per-block sums <= k*63*63 < 2^17.2
        cols = ll + (mid << 6) + (hh << 12)
        delta = (k - alpha)[None]  # 0 < delta <= k
        cols = cols + delta * mdig.reshape((n_cols,) + (1,) * len(batch))
        blk = k * 63 * 63
        bound = blk + (blk << 6) + (blk << 12) + k * ((1 << limb_bits) - 1)
        assert bound < (1 << 31)
        return cols, (bound,) * n_cols

    def to_limb_mont(self, a: RnsVal, lf) -> jnp.ndarray:
        """RNS M-residue of x -> limb Montgomery form (x * Rlimb mod p),
        canonical-digit lazy (<2p) — the bridge back to the limb pipeline.

        One RNS mul by the raw constant Rlimb^2 makes the represented
        integer V ≡ x*Rlimb^2 (mod p); the CRT digit columns of V + k*M go
        through ONE limb Montgomery reduction (divide by Rlimb), leaving
        x*Rlimb + k*M/Rlimb whose constant tail is removed by one limb sub."""
        from .limb import LazyCols

        c = RnsVal(
            self, self.encode_raw(lf.R * lf.R % self.p, like=a.res), Fraction(1)
        )
        u = self.mul(a, c)
        cols, colhi = self.to_digit_cols(u)
        pad = 2 * lf.L - cols.shape[0]
        assert pad >= 0, "CRT columns exceed the limb REDC width"
        cols = jnp.concatenate(
            [cols, jnp.zeros((pad,) + cols.shape[1:], jnp.int32)], axis=0
        )
        r = LazyCols(lf, cols, colhi + (0,) * pad).reduce()
        corr = (self.k * self.M * pow(lf.R, -1, self.p)) % self.p
        return lf.sub(r, lf.const(corr, r.shape[1:], mont=False))

    def __repr__(self) -> str:
        return f"RnsField({self.name}, k={self.k}, C={self.C})"
