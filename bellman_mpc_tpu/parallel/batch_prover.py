"""Batched Groth16 proving: the entire hot path in ONE jitted device program.

The reference prover runs, per proof, 7 FFT passes and 6 Pippenger MSMs on a
thread pool (bellman/src/groth16/prover.rs:210-343).  Here the same pipeline
is a single XLA program over a *batch axis of proofs* B:

    (a, b, c) per-constraint evaluations  (L, B, m)   [Montgomery limbs]
      -> vmapped h(x) coset pipeline      (7 NTTs, fused)
      -> on-device bit decomposition of h and witness scalars
      -> 5 MSMs against baked CRS limb tensors (bases broadcast over B;
         the input-wire queries ride the aux queries' pow2 padding)
      -> proof assembly A = alpha + A(tau) + r*delta, ... (RCB point ops)
      -> batched to-affine

Density bookkeeping (multiexp.rs:88-157) is resolved at build time from a
template synthesis: the CRS slices are gathered into dense base tensors and
witness-index maps once per (circuit, params), so the runtime step is pure
static-shape tensor code.  Sharding: the B axis is the data-parallel axis;
the MSM base axis N can additionally be sharded over the "model" mesh axis
(see parallel/sharded.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.device import (
    DeviceGroup,
    g1_device,
    g2_device,
    point_add,
    point_select,
    point_identity,
    scalar_mul_bits,
    scalar_mul_const,
    scalars_to_bits,
    tree_reduce,
)
from ..fields import bls12_381 as bc
from ..fields.limb import LIMB_BITS, LimbField
from ..groth16.prover import DETERMINISTIC_R, DETERMINISTIC_S, _h_pipeline
from ..groth16.types import Parameters, Proof
from ..ops.domain import domain_size_for, warm_twiddles
from ..r1cs.core import Circuit

NBITS = 255  # Fr scalar bits fed to ladders


def bits_from_std(field: LimbField, std: jnp.ndarray) -> jnp.ndarray:
    """(L, *S) canonical std-form limbs -> (NBITS, *S) bits, MSB first."""
    shifts = jnp.arange(LIMB_BITS, dtype=jnp.int32).reshape(
        (1, LIMB_BITS) + (1,) * (std.ndim - 1)
    )
    bits = (std[:, None] >> shifts) & 1  # (L, b, *S) LSB-first per limb
    flat = bits.reshape((field.L * LIMB_BITS,) + std.shape[1:])
    return flat[NBITS - 1 :: -1]  # restrict to NBITS and flip to MSB-first


def std_from_mont(field: LimbField, x: jnp.ndarray) -> jnp.ndarray:
    """(L, *S) Montgomery limbs -> canonical std-form digits, on device."""
    return field.canon(field.mul(x, field._bc(field.one_limbs, x)))


def bits_from_mont(field: LimbField, x: jnp.ndarray) -> jnp.ndarray:
    """(L, *S) Montgomery limbs -> (NBITS, *S) bits, MSB first, on device."""
    return bits_from_std(field, std_from_mont(field, x))


def _pad_pow2_int(n: int) -> int:
    m = 1
    while m < max(n, 1):
        m *= 2
    return m


class BatchProver:
    """Per-(circuit, params) compiled batched prover."""

    def __init__(
        self,
        engine,
        params: Parameters,
        circuit_template: Circuit,
        msm_strategy: str = "auto",
        pippenger_c: int = 8,
        mesh=None,
    ):
        from ..groth16.prover import synthesize_witness

        assert engine.name == "bls12_381"
        self.engine = engine
        self.fr = engine.fr
        self.params = params
        # Multi-chip: a jax.sharding.Mesh with ("data", "model") axes shards
        # the proof batch over "data" and the table-MSM base axis over
        # "model" (ICI all_gather + add-tree combine; parallel/sharded.py).
        self.mesh = mesh
        if mesh is not None:
            assert msm_strategy in ("table", "auto"), (
                "mesh sharding is wired for the table strategy"
            )
            msm_strategy = "table"
        if msm_strategy == "auto":
            # The RNS/MXU gather-table MSM is the measured-fastest strategy
            # on TPU (DESIGN-NOTES.md round-3: 0.381 s/step vs the limb
            # table fold's 0.444 s at B=16, before the merged-G1 fold);
            # the ladder keeps CPU tests fast to compile.
            import jax as _jax

            msm_strategy = "rns" if _jax.default_backend() != "cpu" else "ladder"
        self.msm_strategy = msm_strategy
        self.pippenger_c = pippenger_c
        # One vmapped body for the 4 large G1 MSMs: ~4x cheaper to compile
        # but measured 2.2x slower at runtime (VMEM spill); opt-in only.
        import os as _os

        self.stack_msms = _os.environ.get("BMT_STACK_MSMS") == "1"

        # Template synthesis fixes sizes, density maps and domain shape.
        tpl = synthesize_witness(engine, circuit_template)
        self.num_inputs = len(tpl.input_assignment)
        self.num_aux = len(tpl.aux_assignment)
        self.num_constraints = len(tpl.a)
        self.m, self.exp = domain_size_for(self.num_constraints, engine.fr_host)
        self.a_aux_density = list(tpl.a_aux_density.bv)
        self.b_input_density = list(tpl.b_input_density.bv)
        self.b_aux_density = list(tpl.b_aux_density.bv)

        # Dense scalar index maps (positions into [inputs..., aux...]).
        self.a_aux_idx = [i for i, d in enumerate(self.a_aux_density) if d]
        self.b_in_idx = [i for i, d in enumerate(self.b_input_density) if d]
        self.b_aux_idx = [i for i, d in enumerate(self.b_aux_density) if d]

        # Baked CRS tensors, padded to powers of two with identities.
        def bake(group: DeviceGroup, pts, n_logical):
            n = _pad_pow2_int(n_logical)
            return group.encode_points(list(pts) + [None] * (n - len(pts)))

        # The step only ever consumes a_in + a_aux (and likewise b1/b2), so
        # the input-wire queries are MERGED into the aux query's pow2
        # padding instead of paying their own window folds: the round-1
        # profile showed the N=1 G2 "b2_in" MSM alone cost 278 ms of a
        # 1033 ms step.  8 MSMs collapse to 5 large ones for free.
        self.h_n = _pad_pow2_int(self.m - 1)
        self.crs_h = bake(g1_device, params.h, self.m - 1)
        self.crs_l = bake(g1_device, params.l, self.num_aux)
        a_in, a_aux = params.get_a(self.num_inputs)
        b1_in, b1_aux = params.get_b_g1(len(self.b_in_idx))
        b2_in, b2_aux = params.get_b_g2(len(self.b_in_idx))
        a_all = list(a_in) + list(a_aux)
        b1_all = list(b1_in) + list(b1_aux)
        b2_all = list(b2_in) + list(b2_aux)
        self.crs_a = bake(g1_device, a_all, len(a_all))
        self.crs_b1 = bake(g1_device, b1_all, len(b1_all))
        self.crs_b2 = bake(g2_device, b2_all, len(b2_all))

        # vk points + deterministic-blinding precomputations (host points).
        vk = params.vk
        hostg1, hostg2 = g1_device.host, g2_device.host
        r, s = DETERMINISTIC_R, DETERMINISTIC_S
        self.r, self.s = r, s
        self.ga_const = g1_device.encode_points(
            [hostg1.add(hostg1.mul(vk.delta_g1, r), vk.alpha_g1)]
        )
        self.gb_const = g2_device.encode_points(
            [hostg2.add(hostg2.mul(vk.delta_g2, s), vk.beta_g2)]
        )
        gc = hostg1.add(
            hostg1.mul(vk.delta_g1, r * s % bc.R),
            hostg1.add(hostg1.mul(vk.alpha_g1, s), hostg1.mul(vk.beta_g1, r)),
        )
        self.gc_const = g1_device.encode_points([gc])

        warm_twiddles(self.fr, engine.fr_host, self.exp)
        from ..groth16.compiled import CompiledCircuit

        self.compiled = CompiledCircuit(engine, circuit_template)
        self._step = self._build_step()

    # ------------------------------------------------------------------ step
    def _build_step(self):
        import os as _os

        fr = self.fr
        host = self.engine.fr_host
        # Domains beyond one chip's memory: distribute the 7 NTT passes
        # over the mesh "model" axis (4-step decomposition + ICI
        # all-to-all; groth16/prover._h_pipeline_sharded).  Threshold 2^18
        # ~= the largest domain whose 3x (L, B, m) working set plus tables
        # comfortably fits a single v5e HBM at B=16; below it the local
        # fused pipeline wins (no collective latency).
        shard_exp = int(_os.environ.get("BMT_SHARD_NTT_EXP", "18"))
        if self.mesh is not None and self.exp >= shard_exp:
            from ..groth16.prover import _h_pipeline_sharded

            pipeline = _h_pipeline_sharded(fr, host, self.exp, self.mesh)
        else:
            pipeline = _h_pipeline(fr, host, self.exp)
        g1o, g2o = g1_device.ops, g2_device.ops

        def pad_scalars(bits, n):
            # bits: (NBITS, B, k) -> pad k to n with zeros
            k = bits.shape[-1]
            if k == n:
                return bits
            return jnp.pad(bits, ((0, 0), (0, 0), (0, n - k)))

        from ..ops.msm import (
            digits_from_bits,
            msm_flat_pippenger,
            msm_pippenger_batched,
            msm_table,
            msm_table_affine,
            msm_table_affine_rns,
            pick_table_c,
            shifted_bases,
            signed_digits,
            tables_to_rns,
            window_tables,
            window_tables_affine,
        )

        strategy = self.msm_strategy
        c_win = self.pippenger_c
        crs_g1 = (self.crs_h, self.crs_l, self.crs_a, self.crs_b1)
        crs_g2 = (self.crs_b2,)

        if strategy in ("table", "rns"):
            # Precompute bucket tables per CRS base set (build-time device
            # work; HBM-resident).  Default: SIGNED digits + AFFINE tables —
            # |digit| <= 2^(c-1) buckets gathered as (x, y) pairs, folded
            # with complete mixed additions (curves/device.point_add_mixed),
            # 33 window adds at c=8 vs the unsigned projective path's 64.
            # The window width adapts per base set: tiny sets (the merged
            # queries keep N tiny only for degenerate circuits) get very
            # wide windows since table memory scales with N.
            # The tables are passed to the jitted step as ARGUMENTS (several
            # GB of embedded constants breaks program serialization).
            import os as _os

            self._table_signed = (
                strategy == "rns"
                or _os.environ.get("BMT_TABLE_SIGNED", "1") == "1"
            )
            # GLV-2/GLS-4 endomorphism split (ops/glv.py): fewer windows
            # at proportionally wider lanes.  Default OFF: the round-5 chip
            # sweep measured the fold WORK-bound, not window-bound (GLV-on
            # step 678 ms vs 378 ms at B=16) — the split only pays off in a
            # dispatch-bound regime.  Kept as a validated opt-in.
            self._glv = (
                strategy == "rns"
                and _os.environ.get("BMT_GLV", "0") == "1"
            )
            # Route the G1 window folds through the whole-mixed-add Pallas
            # kernel (ops/pallas_kernels.rns_fold_window_pallas): tables
            # are stored in the 80-row aligned layout and
            # msm_table_affine_rns auto-detects it.  TPU only (the CPU
            # interpret path is for correctness tests).
            self._pallas_fold = (
                strategy == "rns"
                and jax.default_backend() != "cpu"
                and _os.environ.get("BMT_PALLAS_FOLD", "1") == "1"
            )
            budget = int(_os.environ.get("BMT_TABLE_MEM_MB", "1536"))
            c_env = int(_os.environ.get("BMT_TABLE_C", "0"))
            table_idx = {}
            table_args = []
            self._rns_bounds = {}
            # Merged G1 fold (rns strategy): the four large G1 MSMs
            # (h, l, a, b1) become ONE window fold over a concatenated,
            # equal-segment base axis.  OFF by default: the round-3 bench
            # measured it both slower (0.637 s vs 0.380 s/step at B=16) and
            # wrong at bench scale (InvalidProof with segments
            # (1024,1024,1024,512), c=8, B=16 — BENCH_r03), while the
            # per-MSM folds verify at 37.7 proofs/s.  Opt-in for repro.
            self._merge_g1 = (
                strategy == "rns"
                and _os.environ.get("BMT_MERGE_G1", "0") == "1"
            )
            if self._merge_g1:
                # Build per-set limb tables (HBM peak stays at ONE set's
                # build — a single 4x-wide build OOMs the chip), convert
                # each to compact int16 RNS residues, then concatenate the
                # RNS tables on the base axis.  Segment widths stay native
                # (no identity padding): the segmented reduction in
                # msm_table_affine_rns handles unequal power-of-two widths.
                # The window width is budgeted against the SUM of segment
                # widths — the merged table holds all segments at once, so
                # sizing it off one set's width would overshoot HBM ~4x.
                from ..ops.glv import GLV_NBITS

                self._g1_logical_sizes = tuple(
                    crs[0].shape[-1] for crs in crs_g1
                )
                glv_mul = 2 if self._glv else 1
                nbits_tab = GLV_NBITS if self._glv else 255
                self._g1_seg_sizes = tuple(
                    glv_mul * n for n in self._g1_logical_sizes
                )
                n_sum = sum(self._g1_seg_sizes)
                c_tab = c_env or (
                    4
                    if jax.default_backend() == "cpu"
                    else pick_table_c(
                        n_sum, g2=False, budget_mb=budget, nbits=nbits_tab
                    )
                )
                from ..curves.rns_point import rns_g1_ops
                from ..ops.msm import phi_extend_affine_tables

                rns_tabs, bound = [], None
                rns_by_id = {}
                for crs in crs_g1:
                    if id(crs) in rns_by_id:  # aliased CRS sets share a table
                        rns_tabs.append(rns_by_id[id(crs)])
                        continue
                    tab = jax.jit(
                        lambda pts, c=c_tab: window_tables_affine(
                            g1_device.ops, pts, c, nbits=nbits_tab
                        )
                    )(crs)
                    if self._glv:
                        tab = jax.jit(
                            lambda t: phi_extend_affine_tables(bc.fp, t)
                        )(tab)
                    rt, bound = tables_to_rns(rns_g1_ops(), bc.fp, tab)
                    rt = jax.block_until_ready(rt)
                    del tab  # free the limb table before the next build
                    rns_by_id[id(crs)] = rt
                    rns_tabs.append(rt)
                merged_tab = tuple(
                    jnp.concatenate([t[k] for t in rns_tabs], axis=-1)
                    for k in range(2)
                )
                del rns_tabs, rns_by_id
                if self._pallas_fold:
                    from ..curves.rns_point import default_rns_field
                    from ..ops.pallas_kernels import pad_rns_table

                    merged_tab = jax.jit(
                        lambda t: pad_rns_table(default_rns_field(), t)
                    )(merged_tab)
                self._g1_merged = (len(table_args), c_tab, bound)
                table_args.append(merged_tab)
            remaining = (() if self._merge_g1 else crs_g1) + crs_g2
            for crs in remaining:
                if id(crs) in table_idx:
                    continue
                grp = g2_device if any(crs is c2 for c2 in crs_g2) else g1_device
                n = crs[0].shape[-1]
                glv_set = self._glv
                if glv_set and grp is g1_device:
                    from ..ops.glv import GLV_NBITS as _GN

                    nbits_tab, n_eff = _GN, 2 * n
                elif glv_set:
                    from ..ops.glv import GLS_NBITS as _GSN

                    nbits_tab, n_eff = _GSN, 4 * n
                else:
                    nbits_tab, n_eff = 255, n
                on_cpu = jax.default_backend() == "cpu"
                c_tab = c_env or (
                    pick_table_c(
                        n_eff,
                        g2=grp is g2_device,
                        budget_mb=budget,
                        nbits=nbits_tab,
                    )
                    if self._table_signed and not on_cpu
                    else 4
                )
                if self._table_signed:
                    tab = jax.jit(
                        lambda pts, ops=grp.ops, c=c_tab, nb=nbits_tab: window_tables_affine(
                            ops, pts, c, nbits=nb
                        )
                    )(crs)
                    if glv_set:
                        from ..ops.msm import (
                            phi_extend_affine_tables,
                            psi_extend_affine_tables_g2,
                        )

                        ext = (
                            psi_extend_affine_tables_g2
                            if grp is g2_device
                            else phi_extend_affine_tables
                        )
                        tab = jax.jit(
                            lambda t, e=ext: e(bc.fp, t)
                        )(tab)
                else:
                    tab = jax.jit(
                        lambda pts, ops=grp.ops, c=c_tab: window_tables(
                            ops, pts, c
                        )
                    )(crs)
                if strategy == "rns":
                    # convert to RNS M-residue int16 tables; the limb tables
                    # are dropped (HBM parity with the limb strategy).
                    from ..curves.rns_point import rns_g1_ops, rns_g2_ops

                    rops = rns_g2_ops() if grp is g2_device else rns_g1_ops()
                    tab, bound = tables_to_rns(rops, bc.fp, tab)
                    self._rns_bounds[id(crs)] = bound
                    if self._pallas_fold:
                        from ..curves.rns_point import default_rns_field
                        from ..ops.pallas_kernels import pad_rns_table

                        tab = jax.jit(
                            lambda t: pad_rns_table(default_rns_field(), t)
                        )(tab)
                table_idx[id(crs)] = (len(table_args), c_tab)
                table_args.append(tab)
            self._table_idx = table_idx
            self._table_args = tuple(table_args)
        else:
            self._table_idx = {}
            self._table_args = ()
            self._table_signed = False
            self._merge_g1 = False
            self._glv = False
            self._pallas_fold = False
        table_idx = self._table_idx
        merge_g1 = self._merge_g1

        if strategy == "flatpip":
            # Pre-shift every CRS base set once (device, build time): the
            # runtime MSM then has no doublings and no per-window loops.
            self._sbases = {}
            for crs in crs_g1 + crs_g2:
                grp = g2_device if any(crs is c2 for c2 in crs_g2) else g1_device
                if crs[0].shape[-1] >= 16:
                    self._sbases[id(crs)] = jax.jit(
                        lambda pts, ops=grp.ops: shifted_bases(ops, pts, c_win)
                    )(crs)
        else:
            self._sbases = {}
        sbases = self._sbases
        table_signed = self._table_signed

        glv = self._glv

        def glv_signed_digits(scal, c_tab, logical_sizes=None):
            """(L, B, N) std digits -> GLV signed window digits (W', B, 2N).

            One device decomposition (ops/glv.py), |k1|/|k2| bit vectors
            concatenated on the base axis to match the phi-extended tables;
            per-lane signs fold into the signed digits (negating every
            digit of a scalar negates its value).  With `logical_sizes`,
            the k1/k2 halves are interleaved PER SEGMENT to match the
            merged [P_s || phi(P_s)] table layout."""
            from ..ops.glv import decompose_glv2_device, digits_to_bits_msb

            n1, m1, n2, m2 = decompose_glv2_device(scal)
            b1, b2 = digits_to_bits_msb(m1), digits_to_bits_msb(m2)
            if logical_sizes is None:
                bits = jnp.concatenate([b1, b2], axis=-1)
                neg = jnp.concatenate([n1, n2], axis=-1)
            else:
                pb, pn, off = [], [], 0
                for s_ in logical_sizes:
                    pb += [b1[..., off : off + s_], b2[..., off : off + s_]]
                    pn += [n1[..., off : off + s_], n2[..., off : off + s_]]
                    off += s_
                bits = jnp.concatenate(pb, axis=-1)
                neg = jnp.concatenate(pn, axis=-1)
            sd = signed_digits(digits_from_bits(bits, c_tab), c_tab)
            return jnp.where(neg[None], -sd, sd)

        def gls_signed_digits(scal, c_tab):
            """(L, B, N) std digits -> GLS-4 signed window digits
            (W', B, 4N) matching the psi-extended G2 tables."""
            from ..ops.glv import (
                GLS_NBITS,
                decompose_gls4_device,
                digits_to_bits_msb,
            )

            neg, mag = decompose_gls4_device(scal)
            bits = jnp.concatenate(
                [digits_to_bits_msb(mag[t], GLS_NBITS) for t in range(4)],
                axis=-1,
            )
            negs = jnp.concatenate([neg[t] for t in range(4)], axis=-1)
            sd = signed_digits(digits_from_bits(bits, c_tab), c_tab)
            return jnp.where(negs[None], -sd, sd)

        def msm(ops, bases, scal, tables=()):
            # bases: coord arrays (L, [2,] N); scal: (NBITS, B, N) bits —
            # or (L, B, N) std-form digits when the GLV path is on.
            if strategy == "rns":
                from ..curves.rns_point import rns_g1_ops, rns_g2_ops

                idx, c_tab = table_idx[id(bases)]
                rops = rns_g2_ops() if ops is g2o else rns_g1_ops()
                if glv:
                    sd = (
                        gls_signed_digits(scal, c_tab)
                        if ops is g2o
                        else glv_signed_digits(scal, c_tab)
                    )
                    return msm_table_affine_rns(
                        rops, bc.fp, tables[idx], sd,
                        self._rns_bounds[id(bases)],
                    )
                bits = bits_from_std(fr, scal) if glv else scal
                digits = digits_from_bits(bits, c_tab)
                return msm_table_affine_rns(
                    rops,
                    bc.fp,
                    tables[idx],
                    signed_digits(digits, c_tab),
                    self._rns_bounds[id(bases)],
                )
            if strategy == "table":
                idx, c_tab = table_idx[id(bases)]
                digits = digits_from_bits(scal, c_tab)
                if self.mesh is not None:
                    from .sharded import (
                        sharded_msm_table,
                        sharded_msm_table_affine,
                    )

                    if table_signed:
                        return sharded_msm_table_affine(
                            self.mesh,
                            ops,
                            tables[idx],
                            signed_digits(digits, c_tab),
                        )
                    return sharded_msm_table(
                        self.mesh, ops, tables[idx], digits
                    )
                if table_signed:
                    return msm_table_affine(
                        ops, tables[idx], signed_digits(digits, c_tab)
                    )
                return msm_table(ops, tables[idx], digits)
            if strategy == "flatpip" and bases[0].shape[-1] >= 16:
                digits = digits_from_bits(scal, c_win)
                return msm_flat_pippenger(
                    ops, sbases[id(bases)], digits, c_win
                )
            if strategy == "pippenger" and bases[0].shape[-1] >= 16:
                digits = digits_from_bits(scal, c_win)
                return msm_pippenger_batched(ops, bases, digits, c_win)
            P = tuple(c[..., None, :] for c in bases)  # broadcast over B
            per = scalar_mul_bits(ops, P, scal)
            return tree_reduce(ops, per)  # (L, [2,] B, 1)

        def msm_merged_g1(scal_list, tables):
            """One RNS window fold for all large G1 MSMs (h, l, a, b1).

            scal_list entries (already padded to their CRS widths; bits, or
            std digits under GLV) are concatenated on the base axis;
            msm_table_affine_rns(seg_sizes) folds all S MSMs in one pass
            and segment-reduces.  Under GLV each segment holds
            [P_s || phi(P_s)] with scalars [k1_s || k2_s], so the segment
            reduction itself recombines k1*P + k2*phi(P) = k*P.  Returns S
            limb points (L, B, 1)."""
            from ..curves.rns_point import rns_g1_ops

            idx, c_tab, bound = self._g1_merged
            scal = jnp.concatenate(scal_list, axis=-1)
            if glv:
                sd = glv_signed_digits(
                    scal, c_tab, logical_sizes=self._g1_logical_sizes
                )
            else:
                sd = signed_digits(
                    digits_from_bits(scal, c_tab), c_tab
                )
            pts = msm_table_affine_rns(
                rns_g1_ops(),
                bc.fp,
                tables[idx],
                sd,
                bound,
                seg_sizes=self._g1_seg_sizes,
            )  # (L, B, S)
            return [
                tuple(x[..., s : s + 1] for x in pts)
                for s in range(len(scal_list))
            ]

        def msm_stacked(ops, base_list, bits_list):
            """Run k same-shaped G1 MSMs as ONE vmapped program.

            The prove step's large G1 MSMs (h, l, a_aux, b1_aux) are padded
            to a common base count and stacked on a leading axis, so XLA
            compiles a single MSM body instead of four.
            """
            n_max = max(b[0].shape[-1] for b in base_list)

            def pad_base(bs):
                pad = n_max - bs[0].shape[-1]
                if pad == 0:
                    return bs
                ident = point_identity(ops, (pad,))
                return tuple(
                    jnp.concatenate([x, i_], axis=-1)
                    for x, i_ in zip(bs, ident)
                )

            def pad_bits(bits):
                pad = n_max - bits.shape[-1]
                if pad == 0:
                    return bits
                return jnp.pad(bits, ((0, 0), (0, 0), (0, pad)))

            stacked_bases = tuple(
                jnp.stack([pad_base(b)[coord] for b in base_list], axis=0)
                for coord in range(3)
            )
            stacked_bits = jnp.stack([pad_bits(b) for b in bits_list], axis=0)
            outs = jax.vmap(lambda bs, bt: msm(ops, bs, bt), in_axes=0)(
                stacked_bases, stacked_bits
            )
            return [
                tuple(x[i] for x in outs) for i in range(len(base_list))
            ]

        def step(a8, b8, c8, wit_in8, wit_aux8, tables=()):
            # inputs arrive as PACKED std-form bytes (B, k, nbytes) — the
            # byte->limb fan-out and Montgomery conversion run on device so
            # the host->device link moves ~3.4x fewer bytes.
            B = a8.shape[0]

            def unpack(x8):
                B_, k, nb = x8.shape
                limbs = fr.unpack_device(x8.reshape(B_ * k, nb))
                return limbs.reshape(fr.L, B_, k)

            abc = fr.to_mont(
                jnp.stack([unpack(a8), unpack(b8), unpack(c8)], axis=1)
            )  # (L, 3, B, m) Montgomery
            a, b, c = abc[:, 0], abc[:, 1], abc[:, 2]
            wit_in = unpack(wit_in8)  # std form: bits extract directly
            wit_aux = unpack(wit_aux8)
            h = jax.vmap(pipeline, in_axes=1, out_axes=1)(a, b, c)
            h = h[:, :, : self.m - 1]

            if glv:
                # GLV path: keep std-form digit tensors; the per-MSM
                # decomposition happens inside msm()/msm_merged_g1.
                bits_h = pad_scalars(std_from_mont(fr, h), self.h_n)
                bits_aux = wit_aux
                bits_in = wit_in
            else:
                bits_h = pad_scalars(bits_from_mont(fr, h), self.h_n)
                bits_aux = bits_from_std(fr, wit_aux)
                bits_in = bits_from_std(fr, wit_in)

            def sel(bits, idx):
                if not idx:
                    return bits[:, :, :0]
                return bits[:, :, jnp.asarray(idx, jnp.int32)]

            # Merged scalar vectors matching the merged CRS base sets: the
            # a-query takes every input wire then the dense aux wires; the
            # b-queries share one (dense-input, dense-aux) vector.
            bits_a = pad_scalars(
                jnp.concatenate(
                    [bits_in, sel(bits_aux, self.a_aux_idx)], axis=-1
                ),
                self.crs_a[0].shape[-1],
            )
            bits_b = pad_scalars(
                jnp.concatenate(
                    [sel(bits_in, self.b_in_idx), sel(bits_aux, self.b_aux_idx)],
                    axis=-1,
                ),
                self.crs_b1[0].shape[-1],
            )
            bits_l = pad_scalars(bits_aux, self.crs_l[0].shape[-1])

            # Separate MSM programs: stacking the large G1 MSMs into one
            # vmapped body was measured 2.2x SLOWER at runtime on TPU (the
            # wider fused multiplies spill VMEM), so each runs on its own.
            if merge_g1:
                h_pt, l_pt, a_answer, b1_answer = msm_merged_g1(
                    [bits_h, bits_l, bits_a, bits_b], tables
                )
            elif self.stack_msms:
                h_pt, l_pt, a_answer, b1_answer = msm_stacked(
                    g1o,
                    [self.crs_h, self.crs_l, self.crs_a, self.crs_b1],
                    [bits_h, bits_l, bits_a, bits_b],
                )
            else:
                h_pt = msm(g1o, self.crs_h, bits_h, tables)
                l_pt = msm(g1o, self.crs_l, bits_l, tables)
                a_answer = msm(g1o, self.crs_a, bits_a, tables)
                b1_answer = msm(g1o, self.crs_b1, bits_b, tables)
            b2_answer = msm(g2o, self.crs_b2, bits_b, tables)

            # broadcast the constant points over the proof batch
            def bconst(pt):
                return tuple(
                    jnp.broadcast_to(c[..., None, :], c.shape[:-1] + (B, 1))
                    for c in pt
                )

            g_a = point_add(g1o, bconst(self.ga_const), a_answer)
            g_b = point_add(g2o, bconst(self.gb_const), b2_answer)

            a_s = scalar_mul_const(g1o, a_answer, self.s)
            b1_r = scalar_mul_const(g1o, b1_answer, self.r)
            g_c = point_add(g1o, bconst(self.gc_const), a_s)
            g_c = point_add(g1o, g_c, b1_r)
            g_c = point_add(g1o, g_c, h_pt)
            g_c = point_add(g1o, g_c, l_pt)

            return g_a, g_b, g_c

        self._step_fn = step
        return jax.jit(step)

    # ------------------------------------------------------------- host APIs
    def encode_witness(self, provers) -> Tuple[jnp.ndarray, ...]:
        """Host ProvingAssignments -> packed std-form byte tensors.

        Wire format (B, k, nbytes) uint8; the device step unpacks to limbs
        and Montgomery-converts on device (minimal host->device traffic)."""
        fr = self.fr
        m = self.m

        def enc(rows: List[List[int]], width: int) -> jnp.ndarray:
            flat = []
            for row in rows:
                flat.extend(list(row) + [0] * (width - len(row)))
            u8 = fr.pack_std(flat)  # (B*width, nbytes)
            return jnp.asarray(u8.reshape(len(rows), width, fr.nbytes))

        a = enc([p.a for p in provers], m)
        b = enc([p.b for p in provers], m)
        c = enc([p.c for p in provers], m)
        wit_in = enc([p.input_assignment for p in provers], self.num_inputs)
        wit_aux = enc([p.aux_assignment for p in provers], self.num_aux)
        return a, b, c, wit_in, wit_aux

    def encode_circuits(self, circuits: Sequence[Circuit]):
        """Fused synthesis+encode: witness -> native C LC eval -> packed
        wire bytes, no Python-bigint round trip for the a/b/c rows
        (groth16/compiled.prove_bytes).  Falls back to the assignment path
        when the native library is unavailable."""
        from .. import native

        if not native.available():
            provers = [self.compiled.prove_assignment(c) for c in circuits]
            return self.encode_witness(provers)
        fr = self.fr
        B = len(circuits)
        m = self.m
        nb = fr.nbytes
        a8 = np.zeros((B, m, nb), np.uint8)
        b8 = np.zeros((B, m, nb), np.uint8)
        c8 = np.zeros((B, m, nb), np.uint8)
        wi = np.zeros((B, self.num_inputs, nb), np.uint8)
        wa = np.zeros((B, self.num_aux, nb), np.uint8)
        n_cons = self.num_constraints
        for i, circ in enumerate(circuits):
            in_arr, aux_arr, ra, rb, rc = self.compiled.prove_bytes(circ, nb)
            a8[i, :n_cons] = ra
            b8[i, :n_cons] = rb
            c8[i, :n_cons] = rc
            wi[i] = native.limbs_to_bytes(in_arr, nb)
            if self.num_aux:
                wa[i] = native.limbs_to_bytes(aux_arr, nb)
        return tuple(jnp.asarray(x) for x in (a8, b8, c8, wi, wa))

    def prove_batch(self, circuits: Sequence[Circuit]) -> List[Proof]:
        """Host synthesis per circuit + one device step + decode.

        Witness synthesis uses the compiled-circuit fast path (native C
        LC evaluation straight to wire bytes; groth16/compiled.py)."""
        a, b, c, wit_in, wit_aux = self.encode_circuits(circuits)
        g_a, g_b, g_c = self._step(a, b, c, wit_in, wit_aux, self._table_args)
        pa = g1_device.decode_points(tuple(x[..., 0] for x in g_a))
        pb = g2_device.decode_points(tuple(x[..., 0] for x in g_b))
        pc = g1_device.decode_points(tuple(x[..., 0] for x in g_c))
        return [Proof(a=x, b=y, c=z) for x, y, z in zip(pa, pb, pc)]

    def run_step(self, *device_args):
        """Raw jitted step (for benchmarking device-only throughput)."""
        return self._step(*device_args, self._table_args)
