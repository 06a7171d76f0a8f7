"""TPU limb-decomposed Montgomery field arithmetic (the device substrate).

TPUs have no native 64-bit integer multiplier, so every field op in this
framework runs over a limb decomposition: a field element is a vector of
``L`` 11-bit limbs held in int32 lanes, and a *batch* of elements is an array
of shape ``(L, *batch)`` — limbs-first, so the (large) batch axis lands on the
TPU's 128-wide vector lanes and the tiny limb axis on sublanes.  All
arithmetic is branch-free and shape-static, so entire protocol pipelines
(NTT -> MSM -> pairing) trace into a single XLA program.

Representation invariants:
  * limbs are canonical:   0 <= limb < 2^11   (int32 storage)
  * values are "lazy":     0 <= value < 2*p   (classic lazy Montgomery range;
    requires 4p < R = 2^(11*L), which holds for every field we instantiate)
  * unless stated otherwise values are in Montgomery form  x*R mod p.

Why 11-bit limbs: schoolbook column sums of L<=36 products of 11-bit limbs
stay below 2^27.2, so MULTIPLE unreduced products can be accumulated at the
column level before ONE Montgomery reduction (Aranha-style lazy reduction,
the `LazyCols` API below) while the interleaved reduction still peaks below
2^31 — everything fits signed int32 with no carry splitting, one
multiply-add per partial product on the VPU.  We size L so that R >= 64*p,
which guarantees at least ~8 accumulated products keep the REDC output in
the lazy range (see `LazyCols.reduce` for the exact trace-time proof).

This module is the TPU-native replacement for the reference's `ff`-crate
64-bit-limb Montgomery arithmetic (the reference's field layer is the
`ff`/`bls12_381` dependency, bellman/Cargo.toml:15-32; its hand-written
Montgomery reduction appears at bellman/src/gt_bytes.rs:76-151).
"""

from __future__ import annotations

import functools
from typing import Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 11
LIMB_MASK = (1 << LIMB_BITS) - 1


@functools.lru_cache(maxsize=1)
def _flat_carries() -> bool:
    """True when the default backend prefers the loop-free carry strategy.

    BMT_CARRIES=scan|flat overrides the per-backend default (useful when a
    program with very large traced bodies — e.g. the pairing — hits compiler
    pathologies with one strategy on a given toolchain).
    """
    import os as _os

    override = _os.environ.get("BMT_CARRIES")
    if override == "scan":
        return False
    if override == "flat":
        return True
    import jax as _jax

    return _jax.default_backend() != "cpu"


def _jit_method(*static_argnums):
    """jit a method with `self` (and listed extra argnums) static.

    LimbField instances are singletons, so hashing by identity is sound and
    every public op compiles once per (field, shape) and is cached thereafter.
    """
    def deco(fn):
        return functools.partial(jax.jit, static_argnums=(0,) + tuple(static_argnums))(fn)
    return deco


class LimbField:
    """Montgomery arithmetic over GF(p) on ``(L, *batch)`` int32 limb arrays."""

    def __init__(self, modulus: int, name: str = "F"):
        self.p = modulus
        self.name = name
        b = LIMB_BITS
        # Enough limbs that R = 2^(bL) >= 64p: the lazy range needs 4p < R,
        # and the LazyCols accumulation headroom (k products of lazy inputs
        # reduce to < 2p iff k*8p <= R) wants the extra bits.
        L = -(-(modulus.bit_length() + 6) // b)
        self.L = L
        self.nbytes = (b * L + 7) // 8
        self.R = 1 << (b * L)
        assert 64 * modulus <= self.R
        self.n0inv = (-pow(modulus, -1, 1 << b)) % (1 << b)
        self.r2 = (self.R * self.R) % modulus
        # Codec tables: limb i occupies bits [b*i, b*i + b) of the
        # little-endian byte string; it is read from / written into the three
        # bytes starting at byte b*i // 8 with shift b*i % 8.
        self._byte_idx = np.asarray([(b * i) // 8 for i in range(L)])
        self._bit_shift = np.asarray([(b * i) % 8 for i in range(L)])
        # Per-column digit bound for any canonical-digit value < 2p (used by
        # LazyCols trace-time bound tracking).
        self._dmax_lazy = tuple(
            min(LIMB_MASK, (2 * modulus - 1) >> (b * i)) for i in range(L)
        )

        self._p_list = self._int_to_limbs(modulus)
        self._2p_list = self._int_to_limbs(2 * modulus)
        self.p_limbs = jnp.asarray(self._p_list, jnp.int32)
        self.two_p_limbs = jnp.asarray(self._2p_list, jnp.int32)
        self.p_rest = jnp.asarray(self._p_list[1:], jnp.int32)  # (L-1,)
        self.p0 = int(self._p_list[0])
        # Montgomery form of one (= R mod p), and plain one, as (L,) consts.
        self.mont_one_limbs = jnp.asarray(
            self._int_to_limbs(self.R % modulus), jnp.int32
        )
        self.one_limbs = jnp.asarray(self._int_to_limbs(1), jnp.int32)

    # ------------------------------------------------------------------ utils
    def _int_to_limbs(self, v: int) -> List[int]:
        return [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(self.L)]

    def _bc(self, const_1d: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
        """Broadcast an (L,)-shaped constant against an (L, *batch) array."""
        return const_1d.reshape((const_1d.shape[0],) + (1,) * (like.ndim - 1))

    def zeros(self, batch_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        return jnp.zeros((self.L,) + tuple(batch_shape), jnp.int32)

    def const(self, value: int, batch_shape: Tuple[int, ...] = (), mont: bool = True) -> jnp.ndarray:
        """Broadcast a host integer constant to an (L, *batch) device array."""
        v = value % self.p
        if mont:
            v = v * self.R % self.p
        c = jnp.asarray(self._int_to_limbs(v), jnp.int32)
        return jnp.broadcast_to(
            c.reshape((self.L,) + (1,) * len(batch_shape)),
            (self.L,) + tuple(batch_shape),
        )

    def mont_one(self, batch_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        return self.const(1, batch_shape, mont=True)

    # ------------------------------------------------------- carry management
    # Two interchangeable carry/borrow strategies:
    #
    #  * FLAT (TPU): static carry folding + log-depth Hillis-Steele carry
    #    lookahead — zero control flow, vector-unit friendly, compiles and
    #    runs well on the TPU toolchain.
    #  * SCAN (CPU): one tiny lax.scan per chain.  Chosen on the CPU test
    #    backend because CPU XLA's fusion planner goes superlinear on the
    #    concatenate-heavy flat graphs (a 20-add chain took 80+ s to
    #    compile), while small `while` loops stay ~60 ms each.
    #
    # The strategy is picked once per process from the default backend.

    def propagate(self, t: jnp.ndarray) -> jnp.ndarray:
        """Sequential carry propagation along the limb axis (one lax.scan).

        Accepts limbs in (-2^31, 2^31); arithmetic right-shift makes this
        correct for negative intermediates.  The represented value must fit
        in the limb count (guaranteed by callers).
        """

        def body(carry, limb):
            v = limb + carry
            return v >> LIMB_BITS, v & LIMB_MASK

        _, limbs = jax.lax.scan(body, jnp.zeros(t.shape[1:], jnp.int32), t)
        return limbs

    def _fold(self, t: jnp.ndarray, steps: int = 4) -> jnp.ndarray:
        """Static carry folding: non-negative column sums < 2^30 become
        digits <= 4096 in `steps` rounds (4 suffices from 2^30; 2 from 2^13).
        The top carry is provably zero (value fits the limb count)."""
        zero_head = jnp.zeros_like(t[:1])
        for _ in range(steps):
            carry = t >> LIMB_BITS
            t = (t & LIMB_MASK) + jnp.concatenate(
                [zero_head, carry[:-1]], axis=0
            )
        return t

    def _carry_scan(self, g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """Inclusive prefix of the carry/borrow monoid along the limb axis.

        g = "generates", p = "propagates"; returns per-limb carry-out flags.
        log2(L) flat shift-combine steps (no data-dependent control flow).
        """
        n = g.shape[0]
        shift = 1
        while shift < n:
            pad_g = jnp.zeros_like(g[:shift])
            pad_p = jnp.ones_like(p[:shift])
            g_lo = jnp.concatenate([pad_g, g[:-shift]], axis=0)
            p_lo = jnp.concatenate([pad_p, p[:-shift]], axis=0)
            g = g | (p & g_lo)
            p = p & p_lo
            shift *= 2
        return g

    def _normalize(self, t: jnp.ndarray) -> jnp.ndarray:
        """Digits <= 4096 -> canonical digits < 4096 (same value)."""
        g = t >= (1 << LIMB_BITS)
        p = t == LIMB_MASK
        carry_out = self._carry_scan(g, p)
        carry_in = jnp.concatenate(
            [jnp.zeros_like(carry_out[:1]), carry_out[:-1]], axis=0
        ).astype(jnp.int32)
        return (t + carry_in) & LIMB_MASK

    def _sub_flat(self, x: jnp.ndarray, m: jnp.ndarray):
        """x - m with borrow lookahead; returns (diff digits, total_borrow).

        Expects canonical digits on both sides; diff is only meaningful when
        total_borrow is false.
        """
        if m.ndim == 1:
            m = jnp.broadcast_to(self._bc(m, x), x.shape)
        d = x - m
        g = d < 0
        p = d == 0
        borrow_out = self._carry_scan(g, p)
        borrow_in = jnp.concatenate(
            [jnp.zeros_like(borrow_out[:1]), borrow_out[:-1]], axis=0
        ).astype(jnp.int32)
        return (d - borrow_in) & LIMB_MASK, borrow_out[-1]

    def _sub_scan(self, x: jnp.ndarray, m: jnp.ndarray):
        """Scan-based x - m with borrow chain (CPU strategy)."""
        if m.ndim == 1:
            m = jnp.broadcast_to(self._bc(m, x), x.shape)

        def body(carry, xs):
            xi, mi = xs
            v = xi - mi + carry
            return v >> LIMB_BITS, v & LIMB_MASK

        borrow, d = jax.lax.scan(
            body, jnp.zeros(x.shape[1:], jnp.int32), (x, m)
        )
        return d, borrow != 0

    def _cond_sub(self, x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
        """Subtract the (L,) constant m when x >= m (branch-free)."""
        sub = self._sub_flat if _flat_carries() else self._sub_scan
        d, borrow = sub(x, m)
        return jnp.where(borrow, x, d)

    # ------------------------------------------------------------- arithmetic
    def _scan_reduce2(self, t: jnp.ndarray) -> jnp.ndarray:
        """ONE fused scan computing both t and t-2p with carries; selects
        t-2p when non-negative.  Halves the `while` count of the scan
        strategy's add/sub (2 scans -> 1)."""
        m = jnp.broadcast_to(self._bc(self.two_p_limbs, t), t.shape)

        def body(carry, xs):
            ti, mi = xs
            c1, c2 = carry
            v1 = ti + c1
            v2 = ti - mi + c2
            return (v1 >> LIMB_BITS, v2 >> LIMB_BITS), (
                v1 & LIMB_MASK,
                v2 & LIMB_MASK,
            )

        zero = jnp.zeros(t.shape[1:], jnp.int32)
        (c1, c2), (d1, d2) = jax.lax.scan(body, (zero, zero), (t, m))
        return jnp.where(c2 == 0, d2, d1)

    @_jit_method()
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if _flat_carries():
            t = self._normalize(self._fold(a + b, steps=1))
            return self._cond_sub(t, self.two_p_limbs)
        return self._scan_reduce2(a + b)

    @_jit_method()
    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if _flat_carries():
            # a + (2p - b); b < 2p so the inner subtraction never borrows.
            twop = jnp.broadcast_to(self._bc(self.two_p_limbs, b), b.shape)
            nb, _ = self._sub_flat(twop, b)
            return self.add(a, nb)
        t = a - b + self._bc(self.two_p_limbs, a)
        return self._scan_reduce2(t)

    @_jit_method()
    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        if _flat_carries():
            twop = jnp.broadcast_to(self._bc(self.two_p_limbs, a), a.shape)
            t, _ = self._sub_flat(twop, a)
            return self._cond_sub(t, self.two_p_limbs)
        t = self._bc(self.two_p_limbs, a) - a
        return self._scan_reduce2(t)

    @_jit_method()
    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def mul_cols(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Schoolbook product columns of a*b: (L, *B) x2 -> (2L, *B) int32.

        No reduction: columns satisfy cols[c] = sum_{i+j=c} a_i * b_j, each
        bounded by L * (2^11-1)^2 < 2^27.2 — small enough that several
        products can be accumulated before one Montgomery reduction (the
        LazyCols API tracks exact bounds).
        """
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        batch = a.shape[1:]
        t0 = jnp.zeros((2 * L,) + batch, jnp.int32)

        def prod_body(i, t):
            ai = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
            cur = jax.lax.dynamic_slice_in_dim(t, i, L, 0)
            return jax.lax.dynamic_update_slice_in_dim(t, cur + ai * b, i, 0)

        return jax.lax.fori_loop(0, L, prod_body, t0)

    def redc_cols(self, t: jnp.ndarray, fold_steps: int = 4) -> jnp.ndarray:
        """Word-by-word Montgomery reduction of (2L, *B) non-negative columns.

        Returns canonical-digit limbs of value (T + m*p)/R < T/R + p; callers
        (LazyCols.reduce / mul) guarantee T < p*R so the output is lazy (<2p).
        `fold_steps` must flatten the post-reduction column bound to <= 4096
        (4 suffices from 2^30; LazyCols computes it exactly).
        """
        L = self.L
        batch = t.shape[1:]
        p_rest = self._bc(self.p_rest, t)

        def red_body(i, state):
            carry, t = state
            ti = jax.lax.dynamic_index_in_dim(t, i, 0, keepdims=False) + carry
            m = (ti * self.n0inv) & LIMB_MASK
            carry = (ti + m * self.p0) >> LIMB_BITS
            cur = jax.lax.dynamic_slice_in_dim(t, i + 1, L - 1, 0)
            t = jax.lax.dynamic_update_slice_in_dim(t, cur + m * p_rest, i + 1, 0)
            return carry, t

        carry, t = jax.lax.fori_loop(
            0, L, red_body, (jnp.zeros(batch, jnp.int32), t)
        )
        r = t[L:].at[0].add(carry)
        # Output is provably < 2p, so no conditional subtraction — just
        # flatten the carries into canonical digits.
        if _flat_carries():
            return self._normalize(self._fold(r, steps=fold_steps))
        return self.propagate(r)

    @_jit_method()
    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^{-1} mod p (lazy range in, lazy range out).

        Schoolbook column products then interleaved word-by-word Montgomery
        reduction; both phases are `fori_loop`s over the (tiny) limb axis so
        tracing cost stays O(L) while the batch axes ride the vector lanes.
        """
        return self.redc_cols(self.mul_cols(a, b))

    @_jit_method()
    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    @_jit_method(2)
    def mul_const(self, a: jnp.ndarray, c: int) -> jnp.ndarray:
        """Multiply by a host integer constant (Montgomery-encoded on the fly)."""
        return self.mul(a, self._bc(jnp.asarray(
            self._int_to_limbs(c % self.p * self.R % self.p), jnp.int32), a))

    @_jit_method(2)
    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a host integer exponent (left-to-right binary ladder)."""
        if e == 0:
            return self.mont_one(a.shape[1:])
        bits_arr = jnp.asarray([int(c) for c in bin(e)[2:]], jnp.int32)

        def body(i, r):
            r = self.mul(r, r)
            return jnp.where(bits_arr[i] == 1, self.mul(r, a), r)

        return jax.lax.fori_loop(0, bits_arr.shape[0], body, self.mont_one(a.shape[1:]))

    @_jit_method()
    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batched Fermat inversion a^(p-2); maps 0 -> 0 (caller checks)."""
        return self.pow_const(a, self.p - 2)

    # ------------------------------------------------------------ comparisons
    @_jit_method()
    def canon(self, a: jnp.ndarray) -> jnp.ndarray:
        """Reduce from lazy [0,2p) to canonical [0,p)."""
        return self._cond_sub(a, self.p_limbs)

    @_jit_method()
    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(self.canon(a) == self.canon(b), axis=0)

    @_jit_method()
    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(self.canon(a) == 0, axis=0)

    @_jit_method()
    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """cond ? a : b with cond shaped like the batch (broadcast over limbs)."""
        return jnp.where(jnp.asarray(cond)[None], a, b)

    # ------------------------------------------------- Montgomery conversions
    @_jit_method()
    def to_mont(self, a_std: jnp.ndarray) -> jnp.ndarray:
        r2 = self._bc(jnp.asarray(self._int_to_limbs(self.r2), jnp.int32), a_std)
        return self.mul(a_std, r2)

    @_jit_method()
    def from_mont(self, a_mont: jnp.ndarray) -> jnp.ndarray:
        one = self._bc(self.one_limbs, a_mont)
        return self.canon(self.mul(a_mont, one))

    # ----------------------------------------------------------- host codecs
    def encode(self, values: Sequence[int], mont: bool = True) -> jnp.ndarray:
        """Host ints -> (L, N) int32 device array (vectorized bit extraction)."""
        p = self.p
        if mont:
            R = self.R
            values = [v % p * R % p for v in values]
        else:
            values = [v % p for v in values]
        n = len(values)
        raw = b"".join(v.to_bytes(self.nbytes, "little") for v in values)
        u = np.frombuffer(raw, np.uint8).reshape(n, self.nbytes)
        u = np.concatenate([u, np.zeros((n, 2), np.uint8)], axis=1)
        j = self._byte_idx  # gather narrow u8 columns, then widen (fast path)
        chunk = (
            u[:, j].astype(np.int32)
            + (u[:, j + 1].astype(np.int32) << 8)
            + (u[:, j + 2].astype(np.int32) << 16)
        )  # (N, L)
        limbs = (chunk >> self._bit_shift) & LIMB_MASK
        return jnp.asarray(limbs.T.astype(np.int32))

    def decode(self, arr, mont: bool = True) -> List[int]:
        """(L, *batch) device array -> list of host ints (canonical, std form)."""
        a = jnp.asarray(arr)
        if mont:
            a = self.from_mont(a)
        else:
            a = self.canon(a)
        flat = np.asarray(a.reshape(self.L, -1)).T.astype(np.int64)  # (N, L)
        n = flat.shape[0]
        # Scatter each limb's 11 bits into its three bytes.  Distinct limbs
        # occupy disjoint bit ranges, so plain addition never carries.
        buf = np.zeros((n, self.nbytes + 2), np.int64)
        for i in range(self.L):
            v = flat[:, i] << int(self._bit_shift[i])  # <= 18 bits
            j = int(self._byte_idx[i])
            buf[:, j] += v & 0xFF
            buf[:, j + 1] += (v >> 8) & 0xFF
            buf[:, j + 2] += v >> 16
        raw = buf[:, : self.nbytes].astype(np.uint8).tobytes()
        nb = self.nbytes
        return [
            int.from_bytes(raw[i * nb : (i + 1) * nb], "little") for i in range(n)
        ]

    def decode_one(self, arr, mont: bool = True) -> int:
        return self.decode(arr.reshape(self.L, 1), mont=mont)[0]

    def pack_std(self, values: Sequence[int]) -> np.ndarray:
        """Host ints -> (N, nbytes) uint8 (standard form, minimal wire size).

        Pairs with `unpack_device`: the byte->limb fan-out runs on device, so
        host->device transfers move 8*nbytes bits per element instead of
        32*L (a ~3.4x cut — significant when the device link is a tunnel).
        """
        p = self.p
        raw = b"".join((v % p).to_bytes(self.nbytes, "little") for v in values)
        return np.frombuffer(raw, np.uint8).reshape(len(values), self.nbytes)

    def unpack_device(self, u8: jnp.ndarray) -> jnp.ndarray:
        """(N, nbytes) uint8 device array -> (L, N) canonical std-form limbs."""
        u = jnp.pad(u8, ((0, 0), (0, 2))).astype(jnp.int32)
        j = jnp.asarray(self._byte_idx, jnp.int32)
        chunk = u[:, j] | (u[:, j + 1] << 8) | (u[:, j + 2] << 16)  # (N, L)
        shifts = jnp.asarray(self._bit_shift, jnp.int32)
        return ((chunk >> shifts) & LIMB_MASK).T

    def __repr__(self) -> str:
        return f"LimbField({self.name}, L={self.L}, bits={self.p.bit_length()})"

    # -------------------------------------------------- lazy column reduction
    # Aranha-style lazy reduction adapted to vectorized 11-bit limbs: keep
    # products as unreduced (2L, *B) column tensors, combine them with plain
    # int32 adds/subs, and run ONE Montgomery reduction per final output.
    # Every bound is tracked EXACTLY at trace time (Python bigints), so each
    # call site carries a machine-checked int32/overflow proof.

    def lazy_mul_many(
        self,
        pairs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
        dmax_pairs: Sequence[Tuple[Tuple[int, ...], Tuple[int, ...]]] = None,
    ) -> List["LazyCols"]:
        """k unreduced products through ONE stacked product loop.

        Each pair (a, b) is limb arrays of matching batch shape; optional
        per-operand digit bounds (defaults: canonical digits of a lazy <2p
        element).  Operands MAY be raw digit-wise sums of elements (digits
        above 2^11) as long as the supplied bounds say so — that is the
        whole point: Karatsuba-style operand adds need no carry pass.
        """
        k = len(pairs)
        if dmax_pairs is None:
            dmax_pairs = [(self._dmax_lazy, self._dmax_lazy)] * k
        lhs = jnp.stack([a for a, _ in pairs], axis=1)
        rhs = jnp.stack([b for _, b in pairs], axis=1)
        cols = self.mul_cols(lhs, rhs)  # (2L, k, *B)
        out = []
        for i, (da, db) in enumerate(dmax_pairs):
            hi = tuple(int(x) for x in np.convolve(
                np.asarray(da, object), np.asarray(db, object)
            )) + (0,)  # conv gives 2L-1 columns; top column is empty
            assert max(hi) < (1 << 31), "product columns overflow int32"
            out.append(LazyCols(self, cols[:, i], hi))
        return out

    def lazy_mul(self, a, b, da=None, db=None) -> "LazyCols":
        d = self._dmax_lazy
        return self.lazy_mul_many(
            [(a, b)], [(da or d, db or d)]
        )[0]

    def lazy_reduce_many(
        self, lcs: Sequence["LazyCols"], wide: bool = False
    ) -> List[jnp.ndarray]:
        """Reduce k LazyCols through ONE stacked Montgomery reduction.

        wide=True relaxes the value bound to T < 3pR (for column LIFTS of
        reduced elements, see LazyCols.reduce) at the cost of one stacked
        conditional subtraction over all k lanes."""
        cols = jnp.stack([lc.cols for lc in lcs], axis=1)
        hi = tuple(max(lc.hi[i] for lc in lcs) for i in range(2 * self.L))
        r = LazyCols(self, cols, hi).reduce(wide=wide)
        return [r[:, i] for i in range(len(lcs))]

    def fold_digits(
        self, arr: jnp.ndarray, dvec: Tuple[int, ...]
    ) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
        """One value-preserving carry fold of an (L, *B) digit array (e.g. a
        raw digit-wise operand sum): digits shrink to ~MASK + dvec/2^11 in a
        single cheap vector pass (no carry-lookahead normalization).  The
        top carry is provably zero (value must fit L limbs — asserted)."""
        b = LIMB_BITS
        assert sum(d << (b * i) for i, d in enumerate(dvec)) < self.R
        carry = arr >> b
        arr = (arr & LIMB_MASK) + jnp.concatenate(
            [jnp.zeros_like(arr[:1]), carry[:-1]], axis=0
        )
        out = tuple(
            min(dvec[i], LIMB_MASK) + (dvec[i - 1] >> b if i else 0)
            for i in range(len(dvec))
        )
        return arr, out


def _digit_sum_bound(*dmaxes):
    """Digit-bound vector of a raw digit-wise sum of operands."""
    return tuple(sum(ds) for ds in zip(*dmaxes))


class LazyFp2:
    """Unreduced Fp2 value: a pair of LazyCols (Karatsuba re/im columns).

    Works for any quadratic extension Fp[u]/(u^2+1); the xi = 1+u multiply
    is the integer column combine (re - im, re + im)."""

    __slots__ = ("re", "im")

    def __init__(self, re: "LazyCols", im: "LazyCols"):
        self.re = re
        self.im = im

    def __add__(self, o: "LazyFp2") -> "LazyFp2":
        return LazyFp2(self.re + o.re, self.im + o.im)

    def __sub__(self, o: "LazyFp2") -> "LazyFp2":
        return LazyFp2(self.re - o.re, self.im - o.im)

    def scale(self, k: int) -> "LazyFp2":
        return LazyFp2(self.re.scale(k), self.im.scale(k))

    def __rmul__(self, k: int) -> "LazyFp2":
        return self.scale(k)

    def mul_by_xi(self) -> "LazyFp2":
        return LazyFp2(self.re - self.im, self.re + self.im)


class LazyCols:
    """Unreduced Montgomery product columns with trace-time bound proofs.

    Represents the integer  T = sum_i cols[i] * 2^(11 i)  with
    0 <= cols[i] <= hi[i] (hi tracked exactly on the host).  T is congruent
    to (x*y)*R^2... i.e. one Montgomery reduction away from the Montgomery
    form of the represented product-sum.  Subtraction adds an offset
    multiple of p whose column vector dominates the subtrahend's bounds, so
    columns never go negative and the flat carry machinery stays valid.
    """

    __slots__ = ("f", "cols", "hi")

    def __init__(self, f: LimbField, cols: jnp.ndarray, hi: Tuple[int, ...]):
        self.f = f
        self.cols = cols
        self.hi = hi

    # ------------------------------------------------------------- combining
    def fold(self, steps: int = 1) -> "LazyCols":
        """Value-preserving carry fold: shrinks column bounds to roughly
        MASK + hi/2^11 per step (one cheap vector pass).  The top column's
        carry is provably zero because the represented value fits 2L limbs
        (asserted from the tracked bounds)."""
        b = LIMB_BITS
        n = len(self.hi)
        assert sum(h << (b * i) for i, h in enumerate(self.hi)) < 1 << (b * n)
        cols, hi = self.cols, list(self.hi)
        zero_head = jnp.zeros_like(cols[:1])
        for _ in range(steps):
            carry = cols >> b
            cols = (cols & LIMB_MASK) + jnp.concatenate(
                [zero_head, carry[:-1]], axis=0
            )
            hi = [
                min(hi[i], LIMB_MASK) + (hi[i - 1] >> b if i else 0)
                for i in range(n)
            ]
        return LazyCols(self.f, cols, tuple(hi))

    def _folded_to(self, limit: int) -> "LazyCols":
        out = self
        while max(out.hi) > limit:
            out = out.fold()
        return out

    def __add__(self, other: "LazyCols") -> "LazyCols":
        a, b = self, other
        if max(x + y for x, y in zip(a.hi, b.hi)) >= (1 << 31):
            a = a._folded_to(1 << 29)
            b = b._folded_to(1 << 29)
        return LazyCols(
            a.f,
            a.cols + b.cols,
            tuple(x + y for x, y in zip(a.hi, b.hi)),
        )

    def __sub__(self, other: "LazyCols") -> "LazyCols":
        f = self.f
        b = LIMB_BITS
        me, oth = self, other
        if max(x + 2 * y for x, y in zip(me.hi, oth.hi)) >= (1 << 31) - (
            1 << 12
        ):
            me = me._folded_to(1 << 28)
            oth = oth._folded_to(1 << 28)
        # Offset Q ≡ 0 (mod p) whose columns dominate oth.hi: take the
        # bound vector itself plus the canonical digits of (-value) mod p.
        v = sum(h << (b * i) for i, h in enumerate(oth.hi))
        corr = (-v) % f.p
        q = list(oth.hi)
        for i in range(f.L):
            q[i] += (corr >> (b * i)) & LIMB_MASK
        qa = jnp.asarray(q, jnp.int32).reshape(
            (2 * f.L,) + (1,) * (me.cols.ndim - 1)
        )
        return LazyCols(
            f,
            me.cols - oth.cols + qa,
            tuple(a + qi for a, qi in zip(me.hi, q)),
        )

    def scale(self, k: int) -> "LazyCols":
        assert k >= 0
        out = self if k == 0 else self._folded_to(((1 << 31) - 1) // k)
        return LazyCols(out.f, out.cols * k, tuple(h * k for h in out.hi))

    def __rmul__(self, k: int) -> "LazyCols":
        return self.scale(k)

    # -------------------------------------------------------------- reducing
    def reduce(self, wide: bool = False) -> jnp.ndarray:
        """ONE Montgomery reduction -> lazy element (<2p, canonical digits).

        Trace-time proof obligations, checked here exactly:
          * value bound  T < p*R   (=> REDC output < 2p, the lazy range);
          * int32 bound: every intermediate of the REDC recurrence
            ti = t[i]+carry; t[j] += m*p[j-i]; carry=(ti+m*p0)>>11 stays
            below 2^31 under the tracked per-column maxima;
          * fold schedule: enough carry-fold rounds that digits reach the
            <=4094 range required by the carry-lookahead normalizer.

        wide=True relaxes the value bound to T < 3pR — needed when a column
        LIFT of a reduced element (value < 2p·R, see curves.device llift)
        was accumulated — giving REDC output < 4p, restored to the lazy
        <2p range by one conditional subtraction of 2p.
        """
        f = self.f
        b = LIMB_BITS
        L = f.L
        T = sum(h << (b * i) for i, h in enumerate(self.hi))
        limit = 3 * f.p * f.R if wide else f.p * f.R
        assert T < limit, "lazy accumulation exceeds the REDC value bound"

        def _simulate(hi):
            # worst-case REDC growth; None on int32 overflow
            w = list(hi)
            carry = 0
            for i in range(L):
                ti = w[i] + carry
                peak = ti + LIMB_MASK * f.p0
                if peak >= (1 << 31):
                    return None
                carry = peak >> b
                for j in range(1, L):
                    w[i + j] += LIMB_MASK * f._p_list[j]
                    if w[i + j] >= (1 << 31):
                        return None
            r_hi = w[L:] + [0]
            r_hi[0] += carry
            return r_hi

        lc = self
        r_hi = _simulate(lc.hi)
        while r_hi is None:  # auto-fold until the REDC provably fits int32
            lc = lc.fold()
            r_hi = _simulate(lc.hi)
        h = max(r_hi)
        steps = 0
        while h > 4094:
            h = LIMB_MASK + (h >> b)
            steps += 1
        return f.redc_cols(lc.cols, fold_steps=max(steps, 1))
