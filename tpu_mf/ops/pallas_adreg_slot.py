"""Slot-major fused AdaptReg epoch kernel (small rank).

Round-2 VERDICT #2: the gen-1 fused AdaptReg kernel (ops/pallas_adreg.py)
runs at 29M updates/s — 1-rating-per-sublane-row VPU waste plus per-segment
orchestration. This kernel applies the slot-major homogeneous layout
(ops/pallas_sgd_slot.py: P ratings per sublane row, theta [fac|bu|1|cnt],
phi [fac|1|bv|cnt]) to the AdaptRegMF semantics (reference: src/admf.h:52-86):

* the four learned regularizers enter as SLOT-REPLICATED per-lane decay
  vectors (lam_u on factor lanes, lam_bu on the bias lane, 0 on one/cnt
  lanes — the homogeneous one-lane survives powk on its own);
* geometric per-occurrence decay via count lanes, sign-aware powk;
* the per-user hypergradient (admf.h:82-83, model.h:86-102) runs between
  S kernel segments, fused into the same jit as the segment (round-2
  lesson: eager per-segment orchestration costs ~12 tunnel round trips);
  pre/post rows are gathered straight from the slot-major tables.

Adaptive theta/phi grouping and the deferred item apply mirror the slot
SGD kernel (AdaptReg uses SGD-scale etas, so the staleness envelope binds
exactly the same way).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.admf import AdaptRegState
from tpu_mf.models.mf import MFParams
from tpu_mf.ops.pallas_sgd import LANES, UV_BASE, UV_SHIFT, _apply_flags, _dup_stats, cdiv
from tpu_mf.ops.pallas_sgd_slot import (
    SlotPlan,
    _slot_bucket_counts,
    pack_params_slot,
    pick_sub,
    prepare_cells_slot,
    slot_col_ids,
    slot_packing_factor,
    unpack_params_slot,
)


def _slot_adreg_kernel(
    # scalar prefetch
    gu_ref, gv_ref, ap_ref, hyper_ref,
    # blocked inputs
    uv_ref, uvt_ref, r_ref, theta_ref, lam_ref,
    # HBM-resident input (aliased with the resident output)
    phi_hbm,
    # outputs
    theta_out, phi_out,
    # scratch
    acc, sem,
    *, tile_u: int, tile_v: int, sub: int, dim: int, pack: int,
    mxu_dtype, theta_groups: int, phi_groups: int, loss: int,
    striped: bool = False,
):
    P = pack
    m = LANES // P
    rows_u = tile_u // P
    rows_v = tile_v // P
    eta = hyper_ref[0]
    gb = hyper_ref[1]

    i = pl.program_id(0)
    prev = jnp.maximum(i - 1, 0)
    new_gu = (i == 0) | (gu_ref[i] != gu_ref[prev])

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(phi_hbm, phi_out, sem)
        cp.start()
        cp.wait()
        if phi_groups < 8:
            acc[:] = jnp.zeros_like(acc)

    @pl.when(new_gu)
    def _():
        theta_out[:] = theta_ref[:]

    uv3 = uv_ref[0]
    uvt3 = uvt_ref[0]
    r3 = r_ref[0]
    theta = theta_out[:]
    lam_u = lam_ref[0:1, :]   # slot-replicated per-lane rates
    lam_v = lam_ref[1:2, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    slot_lane = lane >> (m.bit_length() - 1)
    inslot = lane - slot_lane * m
    m_fac = (inslot < dim).astype(jnp.float32)
    m_bias_u = (inslot == dim).astype(jnp.float32)
    m_bias_v = (inslot == dim + 1).astype(jnp.float32)
    m_cnt = (inslot == dim + 2).astype(jnp.float32)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    CB = (c_iota == slot_lane * m + (dim + 2)).astype(jnp.float32)
    SS = (slot_lane == (c_iota >> (m.bit_length() - 1))).astype(jnp.float32)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, LANES), 0)
    E = (p_iota == slot_lane).astype(jnp.float32)
    iota_ru = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_u), 1)
    iota_rv = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_v), 1)
    iota_rut = jax.lax.broadcasted_iota(jnp.int32, (rows_u, sub), 0)
    iota_rvt = jax.lax.broadcasted_iota(jnp.int32, (rows_v, sub), 0)
    rseg_u = jax.lax.broadcasted_iota(jnp.int32, (tile_u, 1), 0) // rows_u
    mkd_u = (rseg_u == slot_lane).astype(jnp.float32)
    MK_u = mkd_u * (m_fac + m_bias_u)
    MC_u = mkd_u * m_cnt
    rseg_v = jax.lax.broadcasted_iota(jnp.int32, (tile_v, 1), 0) // rows_v
    mkd_v = (rseg_v == slot_lane).astype(jnp.float32)
    MK_v = mkd_v * (m_fac + m_bias_v)
    MS_v = mkd_v * (m_fac + m_bias_v + m_cnt)

    # Per-lane decay bases from the learned lambdas; one/cnt lanes have
    # rate 0 -> base 1 -> powk == 1 (the homogeneous one-lane keeps itself).
    base_u = 1.0 - eta * lam_u
    base_v = 1.0 - eta * lam_v
    ln_u = jnp.log(jnp.maximum(jnp.abs(base_u), 1e-30))
    ln_v = jnp.log(jnp.maximum(jnp.abs(base_v), 1e-30))
    neg_u = base_u < 0
    neg_v = base_v < 0

    def powk(ln_mag, neg, k):
        sign = jnp.where(neg & (jnp.mod(k, 2.0) == 1.0), -1.0, 1.0)
        return jnp.where(k == 0, 1.0, sign * jnp.exp(k * ln_mag))

    seg = sub // P

    def roll_segs(x, to_user_slots: bool):
        """Striped columns (pallas_sgd_slot.prepare_cells_stripe): sublane
        segment s carries delta class s — roll per segment with static
        shifts instead of per column."""
        parts = []
        for si in range(P):
            sh = ((P - si) % P if to_user_slots else si) * m
            blk = x[si * seg : (si + 1) * seg]
            parts.append(pltpu.roll(blk, sh, 1) if sh else blk)
        return jnp.concatenate(parts, axis=0)

    tg_w = 8 // theta_groups
    pg_w = 8 // phi_groups
    theta_mx = None
    d_theta_g = None
    pending = []
    for k in range(8):
        if k % tg_w == 0:
            theta_mx = theta.astype(mxu_dtype)
            d_theta_g = jnp.zeros((tile_u, LANES), jnp.float32)

        off = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        delta = k % P
        phi = phi_out[pl.ds(off, tile_v), :]
        phi_mx = phi.astype(mxu_dtype)

        uc = uv3[:, k * P : (k + 1) * P]
        ut = uvt3[k * P : (k + 1) * P, :]
        u_i = uc >> UV_SHIFT
        v_i = uc & (UV_BASE - 1)
        ut_i = ut >> UV_SHIFT
        vt_i = ut & (UV_BASE - 1)

        oh_u = jnp.concatenate(
            [(iota_ru == u_i[:, j : j + 1]).astype(mxu_dtype)
             for j in range(P)], axis=1)
        # Striped plans arrange v ids by their OWN slot (pallas_sgd_slot).
        oh_v = jnp.concatenate(
            [(iota_rv
              == v_i[:, sv : sv + 1] if striped
              else iota_rv
              == v_i[:, (sv - delta) % P : (sv - delta) % P + 1]
              ).astype(mxu_dtype) for sv in range(P)], axis=1)
        oht_u = jnp.concatenate(
            [(iota_rut == ut_i[j : j + 1, :]).astype(mxu_dtype)
             for j in range(P)], axis=0)
        oht_v = jnp.concatenate(
            [(iota_rvt
              == vt_i[sv : sv + 1, :] if striped
              else iota_rvt
              == vt_i[(sv - delta) % P : (sv - delta) % P + 1, :]
              ).astype(mxu_dtype) for sv in range(P)], axis=0)

        t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
        p0 = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
        if striped:
            p = roll_segs(p0, to_user_slots=True)
        else:
            p = pltpu.roll(p0, ((P - delta) % P) * m, 1) if delta else p0

        r_b = jnp.dot(r3[:, k * P : (k + 1) * P], E,
                      preferred_element_type=jnp.float32)
        score = jnp.dot(t * p, SS, preferred_element_type=jnp.float32) + gb
        pred = jax.nn.sigmoid(score) if loss == 1 else score
        err = eta * (r_b - pred)

        rhs_u = (err * p + m_cnt).astype(mxu_dtype)
        rhs_v0 = err * t + m_cnt
        if striped:
            rhs_v = roll_segs(rhs_v0, to_user_slots=False).astype(mxu_dtype)
        else:
            rhs_v = (pltpu.roll(rhs_v0, delta * m, 1) if delta else rhs_v0
                     ).astype(mxu_dtype)
        d_theta_g += jnp.dot(oht_u, rhs_u, preferred_element_type=jnp.float32)
        d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)

        if phi_groups == 8:
            k_v = jnp.dot(d_phi * MS_v, CB, preferred_element_type=jnp.float32)
            phi_out[pl.ds(off, tile_v), :] = (
                phi * powk(ln_v, neg_v, k_v) + d_phi * MK_v
            )
        else:
            pending.append((k, off, phi, d_phi))
            if k % pg_w == pg_w - 1:
                for kk, off_, phi_, dphi_ in pending:
                    acc[pl.ds(off_, tile_v), :] += dphi_ * MS_v

                    @pl.when(ap_ref[8 * i + kk] == 1)
                    def _(off_=off_, phi_=phi_):
                        a = acc[pl.ds(off_, tile_v), :]
                        k_v = jnp.dot(a, CB, preferred_element_type=jnp.float32)
                        phi_out[pl.ds(off_, tile_v), :] = (
                            phi_ * powk(ln_v, neg_v, k_v) + a * MK_v
                        )
                        acc[pl.ds(off_, tile_v), :] = jnp.zeros_like(a)

                pending = []

        if k % tg_w == tg_w - 1:
            k_u = jnp.dot(d_theta_g * MC_u, CB,
                          preferred_element_type=jnp.float32)
            theta = theta * powk(ln_u, neg_u, k_u) + d_theta_g * MK_u

    theta_out[:] = theta


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "sub", "dim", "pack", "n_gu", "n_gv", "mxu",
        "interpret", "theta_groups", "phi_groups", "loss", "striped",
    ),
)
def _run_slot_adreg_segment(
    theta_s, phi_s, gu, gv, ap, hyper, lamvec, uv, uvt, r,
    *, tile_u, tile_v, sub, dim, pack, n_gu, n_gv, mxu="bfloat16",
    interpret=False, theta_groups=8, phi_groups=8, loss=0, striped=False,
):
    nb = uv.shape[0]
    gv = gv.reshape(-1)
    ap = ap.reshape(-1)
    kernel = functools.partial(
        _slot_adreg_kernel,
        tile_u=tile_u, tile_v=tile_v, sub=sub, dim=dim, pack=pack,
        mxu_dtype=jnp.dtype(mxu), theta_groups=theta_groups,
        phi_groups=phi_groups, loss=loss, striped=striped,
    )
    lanes8 = 8 * pack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # gu, gv, ap, hyper
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, lanes8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, lanes8, sub), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, sub, lanes8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((tile_u, LANES), lambda i, gu, *_: (gu[i], 0)),
            pl.BlockSpec((2, LANES), lambda i, *_: (0, 0)),   # lamvec
            pl.BlockSpec(memory_space=pl.ANY),                # phi (HBM)
        ],
        out_specs=[
            pl.BlockSpec((tile_u, LANES), lambda i, gu, *_: (gu[i], 0)),
            pl.BlockSpec((n_gv * tile_v, LANES), lambda i, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_gv * tile_v, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    theta_s, phi_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_gu * tile_u, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_gv * tile_v, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        # operands incl. 4 scalar-prefetch args: uv=4..., theta=7, phi=9
        input_output_aliases={7: 0, 9: 1},
        interpret=interpret,
    )(gu, gv, ap, hyper, uv, uvt, r, theta_s, lamvec, phi_s)
    return theta_s, phi_s


def _gather_slot_rows(tab, ids, tile: int, pack: int):
    """(K, m) fused slot rows for global ids from a slot-major table (XLA
    side — dynamic gathers are fine outside Mosaic)."""
    P = pack
    m = LANES // P
    rows = tile // P
    phys = (ids // tile) * tile + (ids % P) * rows + (ids % tile) // P
    slot = ids % P
    t3 = tab.reshape(-1, P, m)
    return t3[phys, slot]


@functools.partial(jax.jit, static_argnames=("dim", "tile_u", "tile_v",
                                             "pack", "loss"))
def _slot_hypergrad(
    theta_s, phi_s, old_t, old_p, su, sv, sr, lams,
    eta, eta_reg, visits, gb,
    dim: int, tile_u: int, tile_v: int, pack: int, loss: int = 0,
):
    """Hypergradient step on the 4 lambdas from K sampled validation rows
    of the slot-major tables (model.h:86-102)."""
    new_t = _gather_slot_rows(theta_s, su, tile_u, pack)
    new_p = _gather_slot_rows(phi_s, sv, tile_v, pack)
    tf, tb = new_t[:, :dim], new_t[:, dim]
    pf, pb = new_p[:, :dim], new_p[:, dim + 1]
    score = jnp.sum(tf * pf, axis=1) + tb + pb + gb
    pred = jax.nn.sigmoid(score) if loss == 1 else score
    grad = sr - pred
    inner_u = jnp.sum(old_t[:, :dim] * pf, axis=1)
    inner_v = jnp.sum(tf * old_p[:, :dim], axis=1)
    scale = (eta_reg * eta) * visits / sr.shape[0]
    steps = jnp.stack([
        jnp.sum(grad * inner_u),
        jnp.sum(grad * inner_v),
        jnp.sum(grad * old_t[:, dim]),
        jnp.sum(grad * old_p[:, dim + 1]),
    ])
    return jnp.maximum(0.0, lams - scale * steps)


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "sub", "dim", "pack", "n_gu", "n_gv", "mxu",
        "interpret", "theta_groups", "phi_groups", "loss", "n_samples",
        "striped",
    ),
)
def _run_slot_adreg_seg_step(
    theta_s, phi_s, lams, key, seg_idx, uvv, vvv, rvv,
    gu, gv, ap, uv, uvt, r, hyper, eta, eta_reg, visits_all,
    *, tile_u, tile_v, sub, dim, pack, n_gu, n_gv, mxu="bfloat16",
    interpret=False, theta_groups=8, phi_groups=8, loss=0, n_samples=64,
    striped=False,
):
    """One segment FUSED into a single dispatch: validation sampling, old-row
    snapshot gathers, the pallas segment, and the lambda hypergradient
    (round-2 lesson: eager per-segment orchestration costs ~12 tunnel round
    trips; the round-3 slot runner initially repeated the mistake with eager
    slot-row gathers and measured 14M/s vs the kernel's hundreds)."""
    visits = visits_all[seg_idx]
    kseg = jax.random.fold_in(key, seg_idx)
    ksel = jax.random.randint(kseg, (n_samples,), 0, uvv.shape[0])
    su, sv, sr = uvv[ksel], vvv[ksel], rvv[ksel]
    old_t = _gather_slot_rows(theta_s, su, tile_u, pack)
    old_p = _gather_slot_rows(phi_s, sv, tile_v, pack)
    m = LANES // pack
    lu = jnp.zeros((m,), jnp.float32)
    lu = lu.at[:dim].set(lams[0]).at[dim].set(lams[2])
    lv = jnp.zeros((m,), jnp.float32)
    lv = lv.at[:dim].set(lams[1]).at[dim + 1].set(lams[3])
    lamvec = jnp.stack([jnp.tile(lu, pack), jnp.tile(lv, pack)])
    theta_s, phi_s = _run_slot_adreg_segment(
        theta_s, phi_s, gu, gv, ap, hyper, lamvec, uv, uvt, r,
        tile_u=tile_u, tile_v=tile_v, sub=sub, dim=dim, pack=pack,
        n_gu=n_gu, n_gv=n_gv, mxu=mxu, interpret=interpret,
        theta_groups=theta_groups, phi_groups=phi_groups, loss=loss,
        striped=striped,
    )
    new_t = _gather_slot_rows(theta_s, su, tile_u, pack)
    new_p = _gather_slot_rows(phi_s, sv, tile_v, pack)
    tf, tb = new_t[:, :dim], new_t[:, dim]
    pf, pb = new_p[:, :dim], new_p[:, dim + 1]
    score = jnp.sum(tf * pf, axis=1) + tb + pb + hyper[1]
    pred = jax.nn.sigmoid(score) if loss == 1 else score
    grad = sr - pred
    inner_u = jnp.sum(old_t[:, :dim] * pf, axis=1)
    inner_v = jnp.sum(tf * old_p[:, :dim], axis=1)
    scale = (eta_reg * eta) * visits / sr.shape[0]
    steps = jnp.stack([
        jnp.sum(grad * inner_u),
        jnp.sum(grad * inner_v),
        jnp.sum(grad * old_t[:, dim]),
        jnp.sum(grad * old_p[:, dim + 1]),
    ])
    lams = jnp.maximum(0.0, lams - scale * steps)
    return theta_s, phi_s, lams


class SlotAdRegRunner:
    """Slot-major fused AdaptReg epochs: S segments with fused lambda
    hypergradient steps between them. Interface-compatible with
    PallasAdRegRunner (pad/epoch/trim/state)."""

    def __init__(
        self,
        train_ds: RatingsCOO,
        valid_ds: RatingsCOO,
        sub: int | None = None,
        segments: int = 4,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        loss: int = 0,
        n_reg_samples: int = 64,
        n_plans: int = 1,
        dim: int | None = None,
        tile: int | None = None,
        theta_groups=None,
        phi_groups=None,
        balance: bool = False,
        striped: bool = False,
    ):
        self.striped = striped
        assert dim is not None, "pass dim="
        pack = slot_packing_factor(dim)
        assert pack in (2, 4, 8), (
            f"slot AdaptReg needs dim <= 61 (got {dim}); use PallasAdRegRunner"
        )
        self.pack = pack
        tile = tile or 128 * pack
        self.tile_u = self.tile_v = tile
        self.nu, self.nv = train_ds.nu, train_ds.nv
        self._map_u = self._map_v = None
        if balance:
            from tpu_mf.ops.pallas_sgd_slot import balance_dataset

            # Cross-tile serpentine + slot LPT relabeling: validation ids
            # must ride the same maps — the fused hypergradient step
            # gathers validation rows from the RELABELED tables.
            train_ds, self._map_u, self._map_v = balance_dataset(
                train_ds, tile, tile, pack, cross_tile=True
            )
            valid_ds = dataclasses.replace(
                valid_ds, u=self._map_u[valid_ds.u], v=self._map_v[valid_ds.v],
                nu=train_ds.nu, nv=train_ds.nv,
            )
        if sub is None:
            bc = _slot_bucket_counts(train_ds, tile, tile, pack)
            if striped:
                from tpu_mf.ops.pallas_sgd_slot import pick_sub_stripe

                sub = pick_sub_stripe(bc, pack, cdiv(train_ds.nv, tile))
            else:
                sub = pick_sub(bc, pack)
        self.sub = sub
        if striped:
            assert sub % pack == 0, (sub, pack)
        self.mxu, self.interpret, self.loss = mxu, interpret, loss
        self.n_reg_samples = n_reg_samples
        self.theta_groups, self.phi_groups = theta_groups, phi_groups
        from tpu_mf.ops.common import distinct_counts

        from tpu_mf.ops.pallas_sgd_slot import prepare_cells_stripe

        builder = prepare_cells_stripe if striped else prepare_cells_slot
        self.plans = [
            builder(train_ds, tile, tile, sub, seed + 7919 * p, pack)
            for p in range(max(1, n_plans))
        ]
        self.plan = self.plans[0]
        self._dup_max = {g: 0 for g in (1, 2, 4, 8)}
        self._vdup_max = {g: 0 for g in (1, 2, 4, 8)}
        self.bundles = []
        rows_u = tile // pack
        for plan in self.plans:
            nb = plan.u.shape[0]
            segs = min(segments, nb)
            seg_len = cdiv(nb, segs)
            nb_pad = seg_len * segs
            pad = nb_pad - nb

            def padb(x, fill):
                extra = np.full((pad,) + x.shape[1:], fill, x.dtype)
                return np.concatenate([x, extra])

            gu = padb(plan.gu, plan.gu[-1] if nb else 0)
            gv = padb(plan.gv, 0)
            u = padb(plan.u, rows_u)
            v = padb(plan.v, tile // pack)
            r = padb(plan.r, 0)
            ids_u = slot_col_ids(u, pack)
            ids_v = slot_col_ids(v, pack)
            su_ = _dup_stats(ids_u, tile)
            sv_ = _dup_stats(ids_v, tile)
            for g in (1, 2, 4, 8):
                self._dup_max[g] = max(self._dup_max[g], su_[g])
                self._vdup_max[g] = max(self._vdup_max[g], sv_[g])
            # distinct real users per batch -> hypergradient visit scaling
            real = ids_u < tile
            full_u = ids_u + (gu[:, None, None] * tile)
            visits = distinct_counts(
                full_u.reshape(nb_pad, -1), real.reshape(nb_pad, -1)
            )
            uv = u * UV_BASE + v
            uvt = np.swapaxes(uv, 1, 2).copy()

            def seg(x, segs=segs, seg_len=seg_len):
                return [jnp.asarray(x[s * seg_len : (s + 1) * seg_len])
                        for s in range(segs)]

            self.bundles.append(dict(
                segments=segs, seg_len=seg_len,
                n_gu=plan.n_gu, n_gv=plan.n_gv,
                visits_per_seg=visits.reshape(segs, -1).sum(1).astype(
                    np.float32),
                gu=seg(gu), gv=seg(gv), uv=seg(uv), uvt=seg(uvt), r=seg(r),
                flags={
                    g: seg(_apply_flags(gv, g)) for g in (1, 2, 4)
                } | {8: seg(np.ones_like(gv))},
            ))
        self.segments = self.bundles[0]["segments"]
        self.valid = (
            jnp.asarray(valid_ds.u.astype(np.int32)),
            jnp.asarray(valid_ds.v.astype(np.int32)),
            jnp.asarray(valid_ds.r),
        )

    def _pick(self, stats, fixed, eta):
        if fixed is not None:
            return fixed
        for g in (1, 2, 4, 8):
            if eta * stats[g] <= 0.2:
                return g
        return 8

    def pad(self, state: AdaptRegState):
        self.dim = state.params.theta.shape[1]
        self.gb = float(state.params.gb)
        self.lams = jnp.stack(
            [state.lam_u, state.lam_v, state.lam_bu, state.lam_bv]
        ).astype(jnp.float32)
        return pack_params_slot(
            state.params, self.plan, self._map_u, self._map_v
        )

    def epoch(self, tables, eta: float, eta_reg: float, key: jax.Array,
              epoch_idx: int = 0):
        hyper = jnp.asarray([eta, self.gb], jnp.float32)
        b = self.bundles[epoch_idx % len(self.bundles)]
        uv_, vv_, rv_ = self.valid
        tg = self._pick(self._dup_max, self.theta_groups, eta)
        pg = self._pick(self._vdup_max, self.phi_groups, eta)
        eta_d = jnp.float32(eta)
        eta_reg_d = jnp.float32(eta_reg)
        visits_d = jnp.asarray(b["visits_per_seg"])
        seg_ids = np.arange(b["segments"], dtype=np.int32)
        for s in range(b["segments"]):
            t0, t1, self.lams = _run_slot_adreg_seg_step(
                tables[0], tables[1], self.lams, key, seg_ids[s],
                uv_, vv_, rv_,
                b["gu"][s], b["gv"][s], b["flags"][pg][s],
                b["uv"][s], b["uvt"][s], b["r"][s],
                hyper, eta_d, eta_reg_d, visits_d,
                tile_u=self.tile_u, tile_v=self.tile_v, sub=self.sub,
                dim=self.dim, pack=self.pack,
                n_gu=b["n_gu"], n_gv=b["n_gv"],
                mxu=self.mxu, interpret=self.interpret,
                theta_groups=tg, phi_groups=pg, loss=self.loss,
                n_samples=self.n_reg_samples, striped=self.striped,
            )
            tables = (t0, t1)
        return tables

    def trim(self, tables) -> MFParams:
        return unpack_params_slot(
            tables[0], tables[1], self.nu, self.nv, self.dim, self.gb,
            self.tile_u, self.tile_v, self.pack,
            self._map_u, self._map_v,
        )

    def state(self, tables, template: AdaptRegState) -> AdaptRegState:
        params = self.trim(tables)
        return template._replace(
            params=params,
            theta_old=jnp.copy(params.theta),
            phi_old=jnp.copy(params.phi),
            bu_old=jnp.copy(params.bu),
            bv_old=jnp.copy(params.bv),
            lam_u=self.lams[0], lam_v=self.lams[1],
            lam_bu=self.lams[2], lam_bv=self.lams[3],
        )


def adreg_slot_eligible(state: AdaptRegState, batch_size: int = 8192) -> bool:
    dim = state.params.theta.shape[1]
    pack = slot_packing_factor(dim)
    if pack < 2:
        return False
    nv = state.params.phi.shape[0]
    tile = 128 * pack
    vmem_phi = cdiv(nv, tile) * tile * LANES * 4
    return 2 * vmem_phi <= 64 * 1024 * 1024
