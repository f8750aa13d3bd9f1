"""Mega-batched fully-resident fused Pallas SGD epoch kernel.

Third-generation single-chip MF kernel (after ops/pallas_sgd.py, blocked
user tiles, and ops/pallas_sgd_packed.py, lane-packed small-rank rows).
Built to amortize what an empty-body ablation read as a ~10us/grid-step
floor; measurement then showed that floor is DMA already overlapped with
compute (mega == packed at identical settings, PERF_NOTES.md), so the real
win of this kernel is its pack=1 RESIDENT mode: small tiles (256-384) for
mid ranks without per-step blocked-theta round trips — the best measured
rank-64 config (tile 384: +14% over the blocked base kernel) and the
production path for dim 63..126 when both tables fit VMEM. Two mechanisms:

* **Both tables fully VMEM-resident.** theta AND phi are DMA'd from HBM
  once at step 0 and live in resident out refs for the whole epoch (the
  base kernel streams theta tiles through blocked refs every step). No
  per-step table DMA, no gu-ordered tile runs, no blocked-ref round trips.
  Eligibility is a VMEM budget check (mega_eligible) — ML-10M at rank 64
  (36 MB theta) fits; Netflix at rank 128 does not and keeps the blocked
  kernel.
* **MEGA batches per grid step.** The id/rating streams are blocked
  (MEGA, B/8, 8) and a lax.fori_loop walks MEGA batches inside one grid
  step, so the fixed per-step cost (grid bookkeeping, stream DMA issue,
  resident-ref accounting) is paid once per MEGA batches.

The math is identical to the packed kernel (which degenerates to the base
kernel at pack=1): one-hot gather/scatter matmuls on the MXU over packed
rows, fused [factors | bias | count] lanes, geometric per-occurrence decay
(1-eta*lam)^k via count lanes (ops/common.py semantics), static delta-class
lane rolls for slot alignment, adaptive theta/phi grouping with deferred
item apply. pack=1 covers dim <= 126 (reference default dim=128 uses the
256-lane blocked kernel; reference cost model src/mf.h:94-109).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.mf import MFParams
from tpu_mf.ops.pallas_sgd import (
    check_smem_plan,
    LANES,
    UV_BASE,
    UV_SHIFT,
    _apply_flags,
    _dup_stats,
    warn_window_envelope,
    cdiv,
)
from tpu_mf.ops.pallas_sgd_packed import (
    PackedPlan,
    prepare_cells_packed,
    pack_params,
    unpack_params,
)


def mega_packing_factor(dim: int) -> int:
    """Rows per 128-lane register row; 1 for 62 < dim <= 125 (the pack=1
    homogeneous rows need [fac | bias | one | cnt] = dim+3 lanes)."""
    if dim + 2 <= 16:
        return 8
    if dim + 2 <= 32:
        return 4
    if dim + 2 <= 64:
        return 2
    if dim + 3 <= LANES:
        return 1
    return 0  # needs the 256-lane blocked kernel


def _pad_plan_nb(plan: PackedPlan, mega: int) -> PackedPlan:
    """Pad the batch axis to a multiple of mega with all-sentinel batches
    (zero one-hots => zero deltas; gu/gv 0 and ap 1 are harmless)."""
    nb = plan.u.shape[0]
    pad = (-nb) % mega
    if pad == 0:
        return plan
    sub = plan.u.shape[1]

    def padb(a, fill):
        ext = np.full((pad,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, ext], axis=0)

    return plan._replace(
        u=padb(plan.u, plan.tile_u),
        v=padb(plan.v, plan.tile_v),
        r=padb(plan.r, 0),
        w=padb(plan.w, 0),
        gu=padb(plan.gu, 0),
        gv=padb(plan.gv, 0),
        gd=np.broadcast_to(
            np.arange(8, dtype=np.int32) % plan.pack, (nb + pad, 8)
        ).copy(),
    )


def _mega_kernel(
    # scalar prefetch
    gu_ref, gv_ref, ap_ref, hyper_ref,
    # blocked inputs: MEGA batches of packed ids / transposed ids / ratings
    uv_ref, uvt_ref, r_ref,
    # HBM-resident inputs (aliased with the resident outputs)
    theta_hbm, phi_hbm,
    # outputs (whole tables, VMEM-resident for the entire epoch)
    theta_out, phi_out,
    # scratch
    acc, sem_t, sem_p,
    *, tile_u: int, tile_v: int, batch: int, dim: int, pack: int, mega: int,
    mxu_dtype, theta_groups: int, phi_groups: int, scatter_dg: bool = False,
    mxu_pred: bool = False, saturate: bool = False,
):
    P = pack
    m = LANES // P
    lgP = P.bit_length() - 1
    rows_u = tile_u // P
    rows_v = tile_v // P
    eta = hyper_ref[0]
    lam = hyper_ref[1]
    gb = hyper_ref[2]
    if saturate:
        cap = hyper_ref[3]

    def sat(d, k):
        """Per-row window-step saturation (pallas_sgd.sat_scale)."""
        if not saturate:
            return d
        return d * jnp.minimum(1.0, cap / jnp.maximum(k, 1.0))

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cpt = pltpu.make_async_copy(theta_hbm, theta_out, sem_t)
        cpp = pltpu.make_async_copy(phi_hbm, phi_out, sem_p)
        cpt.start()
        cpp.start()
        cpt.wait()
        cpp.wait()
        if phi_groups < 8:
            acc[:] = jnp.zeros_like(acc)

    sub = batch // 8
    # Lane-role masks. P>1: packed [factors | bias | count | pad] slots.
    # P=1: homogeneous rows [fac | bu | 1 | cnt] / [fac | 1 | bv | cnt]
    # (see ops/pallas_sgd.py — identical layout and mid-chain).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    slot_lane = lane >> (m.bit_length() - 1)  # lane // m
    inslot = lane - slot_lane * m
    m_fac = (inslot < dim).astype(jnp.float32)
    m_bias = (inslot == dim).astype(jnp.float32)
    cnt_lane = dim + 2 if P == 1 else dim + 1
    m_cnt = (inslot == cnt_lane).astype(jnp.float32)
    if P == 1:
        # Homogeneous rows: per-lane decay exponent (zero on the one/cnt
        # lanes) so the 1 survives exp() on its own — same op count as the
        # packed apply.
        m_keep_u = (lane <= dim).astype(jnp.float32)
        m_keep_v = ((lane < dim) | (lane == dim + 1)).astype(jnp.float32)
    else:
        m_keep = m_fac + m_bias
    # Count-broadcast one-hot: (d @ CB)[:, l] == d[:, slot(l)*m + cnt_lane].
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    CB = (c_iota == slot_lane * m + cnt_lane).astype(jnp.float32)
    if mxu_pred:
        assert P == 1, "mxu_pred needs homogeneous (pack=1) rows"
        ones_mx = jnp.ones((LANES, LANES), mxu_dtype)

    def apply_u(tab, kc, d):
        d = sat(d, kc)
        if P == 1:
            return tab * jnp.exp(kc * (ln_lameta * m_keep_u)) + d * m_keep_u
        return tab * jnp.exp(kc * ln_lameta) + d * m_keep

    def apply_v(tab, kc, d):
        d = sat(d, kc)
        if P == 1:
            return tab * jnp.exp(kc * (ln_lameta * m_keep_v)) + d * m_keep_v
        return tab * jnp.exp(kc * ln_lameta) + d * m_keep
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_u), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_v), 1)
    iota_ut = jax.lax.broadcasted_iota(jnp.int32, (rows_u, sub), 0)
    iota_vt = jax.lax.broadcasted_iota(jnp.int32, (rows_v, sub), 0)
    lameta = 1.0 - eta * lam
    ln_lameta = jnp.log(lameta)
    tg_w = 8 // theta_groups
    pg_w = 8 // phi_groups

    def body(g, carry):
        b = i * mega + g
        off_u = pl.multiple_of(gu_ref[b] * rows_u, rows_u)
        theta = theta_out[pl.ds(off_u, rows_u), :]
        uv3 = uv_ref[g]    # (sub, 8)
        uvt3 = uvt_ref[g]  # (8, sub)
        u3 = uv3 >> UV_SHIFT
        v3 = uv3 & (UV_BASE - 1)
        ut3 = uvt3 >> UV_SHIFT
        vt3 = uvt3 & (UV_BASE - 1)
        r3 = r_ref[g]
        w3 = (uv3 != tile_u * UV_BASE + tile_v).astype(jnp.float32)

        theta_mx = None
        d_theta_g = None
        pending = []
        for k in range(8):
            if k % tg_w == 0:
                theta_mx = theta.astype(mxu_dtype)
                d_theta_g = jnp.zeros((rows_u, LANES), jnp.float32)

            off = pl.multiple_of(gv_ref[8 * b + k] * rows_v, rows_v)
            delta = k % P  # static by plan construction (delta-classed cols)
            phi = phi_out[pl.ds(off, rows_v), :]
            phi_mx = phi.astype(mxu_dtype)
            uk = u3[:, k : k + 1]
            oh_u = (iota_u == (uk >> lgP)).astype(mxu_dtype)
            oh_v = (iota_v == (v3[:, k : k + 1] >> lgP)).astype(mxu_dtype)
            if not scatter_dg:
                oht_u = (iota_ut == (ut3[k : k + 1, :] >> lgP)).astype(
                    mxu_dtype
                )
                oht_v = (iota_vt == (vt3[k : k + 1, :] >> lgP)).astype(
                    mxu_dtype
                )

            t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
            p0 = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
            p = pltpu.roll(p0, ((P - delta) % P) * m, 1) if delta else p0

            wk = w3[:, k : k + 1]
            if P > 1:
                msk = (slot_lane == (uk & (P - 1))).astype(jnp.float32)
                q = (p * m_fac + m_bias) * msk
                pred = (
                    jnp.sum(t * q + p * (m_bias * msk), axis=1, keepdims=True)
                    + gb
                )
                err = (eta * wk) * (r3[:, k : k + 1] - pred)
                cnt = wk * (m_cnt * msk)
                rhs_u = (err * q + cnt).astype(mxu_dtype)
                rhs_v0 = err * ((t * m_fac + m_bias) * msk) + cnt
            else:
                # Homogeneous rows: one fused multiply, no lane masks
                # (ops/pallas_sgd.py mid-chain). mxu_pred: rowsum via
                # ones-matmul, result pre-broadcast (ablate_wide64 widemxu,
                # -21%/step at rank 64).
                if mxu_pred:
                    pred = jnp.dot(
                        (t * p).astype(mxu_dtype), ones_mx,
                        preferred_element_type=jnp.float32,
                    ) + gb
                else:
                    pred = jnp.sum(t * p, axis=1, keepdims=True) + gb
                err = (eta * wk) * (r3[:, k : k + 1] - pred)
                rhs_u = (err * p + wk * m_cnt).astype(mxu_dtype)
                rhs_v0 = err * t + wk * m_cnt
            rhs_v = (
                pltpu.roll(rhs_v0, delta * m, 1) if delta else rhs_v0
            ).astype(mxu_dtype)
            if scatter_dg:
                # Contract the sublane axis of the GATHER one-hots directly:
                # no transposed one-hot construction (halves the one-hot
                # build cost — the measured rank-64 wall alongside the
                # mid-chain).
                dg = (((0,), (0,)), ((), ()))
                d_theta_g += jax.lax.dot_general(
                    oh_u, rhs_u, dg, preferred_element_type=jnp.float32
                )
                d_phi = jax.lax.dot_general(
                    oh_v, rhs_v, dg, preferred_element_type=jnp.float32
                )
            else:
                d_theta_g += jnp.dot(
                    oht_u, rhs_u, preferred_element_type=jnp.float32
                )
                d_phi = jnp.dot(
                    oht_v, rhs_v, preferred_element_type=jnp.float32
                )

            if phi_groups == 8:
                k_v = jnp.dot(d_phi, CB, preferred_element_type=jnp.float32)
                phi_out[pl.ds(off, rows_v), :] = apply_v(phi, k_v, d_phi)
            else:
                pending.append((k, off, phi, d_phi))
                if k % pg_w == pg_w - 1:
                    for kk, off_, phi_, dphi_ in pending:
                        acc[pl.ds(off_, rows_v), :] += dphi_

                        @pl.when(ap_ref[8 * b + kk] == 1)
                        def _(off_=off_, phi_=phi_):
                            a = acc[pl.ds(off_, rows_v), :]
                            k_v = jnp.dot(
                                a, CB, preferred_element_type=jnp.float32
                            )
                            phi_out[pl.ds(off_, rows_v), :] = apply_v(
                                phi_, k_v, a
                            )
                            acc[pl.ds(off_, rows_v), :] = jnp.zeros_like(a)

                    pending = []

            if k % tg_w == tg_w - 1:
                k_u = jnp.dot(
                    d_theta_g, CB, preferred_element_type=jnp.float32
                )
                theta = apply_u(theta, k_u, d_theta_g)

        theta_out[pl.ds(off_u, rows_u), :] = theta
        return carry

    jax.lax.fori_loop(0, mega, body, 0)


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "batch", "dim", "pack", "mega", "n_gu", "n_gv",
        "mxu", "interpret", "theta_groups", "phi_groups", "scatter_dg",
        "mxu_pred", "saturate",
    ),
)
def _run_mega_epoch(
    theta_p, phi_p,
    gu, gv, ap, uv, uvt, r, hyper,
    *, tile_u, tile_v, batch, dim, pack, mega, n_gu, n_gv, mxu="bfloat16",
    interpret=False, theta_groups=8, phi_groups=8, scatter_dg=False,
    mxu_pred=False, saturate=False,
):
    assert theta_groups in (1, 2, 4, 8), theta_groups
    assert phi_groups in (1, 2, 4, 8), phi_groups
    nb = uv.shape[0]
    check_smem_plan(nb)
    assert nb % mega == 0, (nb, mega)
    gv = gv.reshape(-1)
    ap = ap.reshape(-1)
    rows_u = tile_u // pack
    rows_v = tile_v // pack
    kernel = functools.partial(
        _mega_kernel,
        tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim, pack=pack,
        mega=mega, mxu_dtype=jnp.dtype(mxu), theta_groups=theta_groups,
        phi_groups=phi_groups, scatter_dg=scatter_dg, mxu_pred=mxu_pred,
        saturate=saturate,
    )
    sub = batch // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # gu, gv, ap, hyper
        grid=(nb // mega,),
        in_specs=[
            pl.BlockSpec((mega, sub, 8), lambda i, gu, gv, ap, h: (i, 0, 0)),
            pl.BlockSpec((mega, 8, sub), lambda i, gu, gv, ap, h: (i, 0, 0)),
            pl.BlockSpec((mega, sub, 8), lambda i, gu, gv, ap, h: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # theta (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # phi (HBM)
        ],
        out_specs=[
            pl.BlockSpec(
                (n_gu * rows_u, LANES), lambda i, gu, gv, ap, h: (0, 0)
            ),
            pl.BlockSpec(
                (n_gv * rows_v, LANES), lambda i, gu, gv, ap, h: (0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_gv * rows_v, LANES), jnp.float32),  # deferred acc
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    theta_p, phi_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_gu * rows_u, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_gv * rows_v, LANES), jnp.float32),
        ],
        # operand indices include the 4 scalar-prefetch args: theta=7,
        # phi=8 -> outputs 0, 1.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(gu, gv, ap, hyper, uv, uvt, r, theta_p, phi_p)
    return theta_p, phi_p


class MegaEpochRunner:
    """Holds padded PackedPlans on device and runs mega-resident epochs.

    Drop-in counterpart of PallasEpochRunner / PackedEpochRunner for
    dim <= 126 when both tables fit VMEM (mega_eligible)."""

    def __init__(
        self,
        ds: RatingsCOO,
        tile_u: int | None = None,
        tile_v: int | None = None,
        batch: int = 8192,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        theta_groups=None,
        phi_groups=None,
        n_plans: int = 1,
        dim: int | None = None,
        pack: int | None = None,
        mega: int | None = None,
        scatter_dg: bool = False,
        mxu_pred: bool | None = None,
        saturate: bool = False,
    ):
        self.saturate = saturate
        self.scatter_dg = scatter_dg
        if pack is None:
            assert dim is not None, "pass dim= or pack="
            pack = mega_packing_factor(dim)
        assert pack in (1, 2, 4, 8), f"mega kernel needs dim <= 126, got pack={pack}"
        self.pack = pack
        # MXU-side pred for homogeneous (pack=1) rows; see PallasEpochRunner.
        self.mxu_pred = (pack == 1) if mxu_pred is None else mxu_pred
        default_tile = min(128 * pack, 1024) if pack > 1 else 512
        tile_u = tile_u or default_tile
        tile_v = tile_v or default_tile
        assert max(tile_u, tile_v) < UV_BASE
        batch = cdiv(batch, 8) * 8
        plans = [
            prepare_cells_packed(ds, tile_u, tile_v, batch, seed + 7919 * p, pack)
            for p in range(max(1, n_plans))
        ]
        nb_min = min(p.u.shape[0] for p in plans)
        if mega is None:
            mega = max(1, min(8, nb_min))
        self.mega = mega
        self.plans = [_pad_plan_nb(p, mega) for p in plans]
        self.plan = self.plans[0]
        self.nu, self.nv = ds.nu, ds.nv
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        self.mxu = mxu
        self.interpret = interpret
        if theta_groups is not None:
            assert theta_groups in (1, 2, 4, 8), theta_groups
        if phi_groups is not None:
            assert phi_groups in (1, 2, 4, 8), phi_groups
        self.theta_groups = theta_groups
        self.phi_groups = phi_groups
        self._warned = set()
        self._dup_max = None
        self._vdup_max = None
        if theta_groups is None:
            stats = [_dup_stats(p.u, p.tile_u) for p in self.plans]
            self._dup_max = {g: max(s[g] for s in stats) for g in (1, 2, 4, 8)}
        if phi_groups is None:
            stats = [_dup_stats(p.v, p.tile_v) for p in self.plans]
            self._vdup_max = {g: max(s[g] for s in stats) for g in (1, 2, 4, 8)}
        self.devs = []
        self.flags = []
        for plan in self.plans:
            uv = plan.u * UV_BASE + plan.v
            self.devs.append((
                jnp.asarray(plan.gu),
                jnp.asarray(plan.gv),
                jnp.asarray(uv),
                jnp.asarray(np.swapaxes(uv, 1, 2).copy()),
                jnp.asarray(plan.r),
            ))
            self.flags.append({
                g: jnp.asarray(_apply_flags(plan.gv, g)) for g in (1, 2, 4)
            } | {8: jnp.ones_like(jnp.asarray(plan.gv))})
        self.dev = self.devs[0]

    @property
    def n_slots(self) -> int:
        return int(self.plan.u.size)

    def pick_theta_groups(self, eta: float) -> int:
        """See pallas_sgd.PallasEpochRunner.pick_theta_groups."""
        if self.theta_groups is not None:
            return self.theta_groups
        for g in (1, 2, 4, 8):
            if eta * self._dup_max[g] <= 0.2:
                return g
        if not getattr(self, 'saturate', False):
            warn_window_envelope("mega", "theta", eta, self._dup_max[8],
                             self._warned)
        return 8

    def pick_phi_groups(self, eta: float) -> int:
        """See pallas_sgd_packed.PackedEpochRunner.pick_phi_groups."""
        if self.phi_groups is not None:
            return self.phi_groups
        for g in (1, 2, 4, 8):
            if eta * self._vdup_max[g] <= 0.2:
                return g
        if not getattr(self, 'saturate', False):
            warn_window_envelope("mega", "phi", eta, self._vdup_max[8],
                             self._warned)
        return 8

    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0):
        cap = max(1.0, 0.2 / max(eta, 1e-9))
        hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
        plan_i = epoch_idx % len(self.plans)
        pg = self.pick_phi_groups(eta)
        gu, gv, uv, uvt, r = self.devs[plan_i]
        return _run_mega_epoch(
            tables[0], tables[1], gu, gv, self.flags[plan_i][pg],
            uv, uvt, r, hyper,
            tile_u=self.tile_u, tile_v=self.tile_v, batch=self.batch,
            dim=self.dim, pack=self.pack, mega=self.mega,
            n_gu=self.plan.n_gu, n_gv=self.plan.n_gv,
            mxu=self.mxu, interpret=self.interpret,
            theta_groups=self.pick_theta_groups(eta),
            phi_groups=pg, scatter_dg=self.scatter_dg,
            mxu_pred=self.mxu_pred, saturate=self.saturate,
        )

    def pad(self, params: MFParams):
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        if self.pack == 1:
            # pack=1 uses the homogeneous rows of the base kernel.
            from tpu_mf.ops.pallas_sgd import fuse_rows

            return (
                fuse_rows(params.theta, params.bu,
                          self.plan.n_gu * self.tile_u, LANES, "u"),
                fuse_rows(params.phi, params.bv,
                          self.plan.n_gv * self.tile_v, LANES, "v"),
            )
        return pack_params(params, self.plan)

    def trim(self, tables, dim: int | None = None) -> MFParams:
        if self.pack == 1:
            from tpu_mf.ops.pallas_sgd import split_params

            return split_params(
                tables[0], tables[1], self.nu, self.nv, dim or self.dim,
                self.gb,
            )
        return unpack_params(
            tables[0], tables[1], self.nu, self.nv, dim or self.dim,
            self.gb, self.pack,
        )


def mega_eligible(params: MFParams, batch_size: int = 8192) -> bool:
    """Needs dim <= 126 and BOTH packed tables (+ the phi-sized deferred
    scratch and double-buffered stream blocks) inside the VMEM budget."""
    dim = params.theta.shape[1]
    pack = mega_packing_factor(dim)
    if pack < 1:
        return False
    nu, nv = params.theta.shape[0], params.phi.shape[0]
    tile = min(128 * pack, 1024) if pack > 1 else 512
    vm_theta = cdiv(nu, tile) * tile // pack * LANES * 4
    vm_phi = cdiv(nv, tile) * tile // pack * LANES * 4
    sub = max(8, batch_size // 8)
    vm_streams = 2 * 2 * 8 * sub * LANES * 4  # uv+r, double-buffered, mega<=8
    return vm_theta + 2 * vm_phi + vm_streams <= 90 * 1024 * 1024
