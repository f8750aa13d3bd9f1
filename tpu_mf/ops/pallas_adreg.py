"""Fused Pallas TPU kernel for adaptive-regularization MF epochs.

The SGD fused kernel (ops/pallas_sgd.py — read that first) extended with the
AdaptRegMF semantics of ops/adreg.py (reference: src/admf.h:52-86):

* the four learned regularizers enter as per-lane decay vectors
  lamvec_u = [lam_u x dim | lam_bu], lamvec_v = [lam_v x dim | lam_bv], so
  factor lanes and the bias lane decay with their own learned rates inside
  the same geometric per-occurrence factor;
* optional logistic activation on the prediction (reference loss selector,
  util.h:90-95);
* the per-user hypergradient step on the lambdas (reference: admf.h:82-83,
  model.h:86-102) runs BETWEEN kernel segments: an epoch is split into S
  pallas_call segments, and after each one a vectorized XLA hypergradient
  against a validation sample moves the lambdas, scaled by the number of
  user-visits the segment processed. The reference's "old" (pre-update)
  factor snapshot is approximated by the segment-start tables — identical
  for rows the segment did not touch and one segment staler for rows it did,
  which vanishes at the eta_reg*eta scale of the hypergradient.
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
from tpu_mf.models.admf import AdaptRegState
from tpu_mf.models.mf import MFParams
from tpu_mf.ops.pallas_sgd import (
    CellPlan,
    cdiv,
    pad_params,
    prepare_cells,
    row_lanes,
    split_params,
)


def _adreg_kernel(
    # scalar prefetch
    gu_ref, gv_ref, hyper_ref,
    # blocked inputs
    u_ref, v_ref, ut_ref, vt_ref, r_ref, w_ref, theta_ref, lam_ref,
    # HBM-resident input (aliased with the resident output)
    phi_hbm,
    # outputs
    theta_out, phi_out,
    # scratch
    sem,
    *, tile_u, tile_v, batch, dim, lanes, mxu_dtype, loss,
):
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

    @pl.when(new_gu)
    def _():
        theta_out[:] = theta_ref[:]

    sub = batch // 8
    u3 = u_ref[0]
    v3 = v_ref[0]
    ut3 = ut_ref[0]
    vt3 = vt_ref[0]
    r3 = r_ref[0]
    w3 = w_ref[0]
    lam_u = lam_ref[0:1, :]  # (1, lanes): [lam_u x dim | lam_bu | 0...]
    lam_v = lam_ref[1:2, :]

    theta = theta_out[:]

    # Homogeneous rows (ops/pallas_sgd.py): theta = [fac | bu | 1], phi =
    # [fac | 1 | bv]. The one-lanes survive the per-lane decay on their own
    # (their lamvec entry is 0 -> base 1 -> powk == 1), so only the scatter
    # garbage needs masking at apply.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    m_keep_u = (lane <= dim).astype(jnp.float32)
    m_keep_v = ((lane < dim) | (lane == dim + 1)).astype(jnp.float32)

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_u), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_v), 1)
    iota_ut = jax.lax.broadcasted_iota(jnp.int32, (tile_u, sub), 0)
    iota_vt = jax.lax.broadcasted_iota(jnp.int32, (tile_v, sub), 0)

    # Per-lane geometric decay bases from the learned lambdas; bookkeeping
    # lanes have lamvec 0 -> base 1 -> never decay. Sign-aware power so a
    # learned lambda with eta*lam > 1 oscillates/diverges like the XLA path
    # and the sequential reference instead of silently zeroing rows.
    base_u = 1.0 - eta * lam_u  # (1, lanes)
    base_v = 1.0 - eta * lam_v
    ln_u = jnp.log(jnp.maximum(jnp.abs(base_u), 1e-30))
    ln_v = jnp.log(jnp.maximum(jnp.abs(base_v), 1e-30))
    neg_u = base_u < 0
    neg_v = base_v < 0

    def powk(ln_mag, neg, k):
        sign = jnp.where(neg & (jnp.mod(k, 2.0) == 1.0), -1.0, 1.0)
        return jnp.where(k == 0, 1.0, sign * jnp.exp(k * ln_mag))

    for k in range(8):
        off = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        phi = phi_out[pl.ds(off, tile_v), :]
        theta_mx = theta.astype(mxu_dtype)
        phi_mx = phi.astype(mxu_dtype)
        oh_u = (iota_u == u3[:, k : k + 1]).astype(mxu_dtype)
        oh_v = (iota_v == v3[:, k : k + 1]).astype(mxu_dtype)
        oht_u = (iota_ut == ut3[k : k + 1, :]).astype(mxu_dtype)
        oht_v = (iota_vt == vt3[k : k + 1, :]).astype(mxu_dtype)

        t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
        p = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
        # Homogeneous rows: rowsum(t*p) = t.p + bu + bv, no masks.
        score = jnp.sum(t * p, axis=1, keepdims=True) + gb
        pred = jax.nn.sigmoid(score) if loss == 1 else score
        wk = w3[:, k : k + 1]
        err = (eta * wk) * (r3[:, k : k + 1] - pred)

        d_theta = jnp.dot(
            oht_u, (err * p).astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )
        d_phi = jnp.dot(
            oht_v, (err * t).astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )
        wk_mx = wk.astype(mxu_dtype)
        k_u = jnp.dot(oht_u, wk_mx, preferred_element_type=jnp.float32)
        k_v = jnp.dot(oht_v, wk_mx, preferred_element_type=jnp.float32)
        theta = theta * powk(ln_u, neg_u, k_u) + d_theta * m_keep_u
        phi_out[pl.ds(off, tile_v), :] = (
            phi * powk(ln_v, neg_v, k_v) + d_phi * m_keep_v
        )

    theta_out[:] = theta


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "batch", "dim", "n_gu", "n_gv", "mxu",
        "interpret", "loss",
    ),
)
def _run_adreg_segment(
    theta_ext, phi_ext,
    gu, gv, u, v, ut, vt, r, w, hyper, lamvec,
    *, tile_u, tile_v, batch, dim, n_gu, n_gv,
    mxu="bfloat16", interpret=False, loss=0,
):
    nb = u.shape[0]
    gv = gv.reshape(-1)  # (nb*8,) per-column item-tile indices
    lanes = row_lanes(dim)
    kernel = functools.partial(
        _adreg_kernel,
        tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim, lanes=lanes,
        mxu_dtype=jnp.dtype(mxu), loss=loss,
    )
    sub = batch // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),   # u
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),   # v
            pl.BlockSpec((1, 8, sub), lambda i, *_: (i, 0, 0)),   # ut
            pl.BlockSpec((1, 8, sub), lambda i, *_: (i, 0, 0)),   # vt
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),   # r
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),   # w
            pl.BlockSpec((tile_u, lanes), lambda i, gu, *_: (gu[i], 0)),
            pl.BlockSpec((2, lanes), lambda i, *_: (0, 0)),       # lamvec
            pl.BlockSpec(memory_space=pl.ANY),                    # phi (HBM)
        ],
        out_specs=[
            pl.BlockSpec((tile_u, lanes), lambda i, gu, *_: (gu[i], 0)),
            pl.BlockSpec((n_gv * tile_v, lanes), lambda i, *_: (0, 0)),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    theta_ext, phi_ext = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_gu * tile_u, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_gv * tile_v, lanes), jnp.float32),
        ],
        # operands incl. 3 scalar-prefetch args: theta=9, phi=11 -> outs 0,1
        # v5e has 128 MB of VMEM; the compiler's default 16 MB scoped limit
        # is too tight for the resident item table + unrolled temporaries.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        input_output_aliases={9: 0, 11: 1},
        interpret=interpret,
    )(gu, gv, hyper, u, v, ut, vt, r, w, theta_ext, lamvec, phi_ext)
    return theta_ext, phi_ext


@functools.partial(jax.jit, static_argnames=("dim", "loss"))
def hypergrad_ext_rows(
    new_t, new_p,            # (K, lanes) post-segment fused rows
    old_t, old_p,            # (K, lanes) pre-segment fused rows
    sr: jax.Array,           # (K,) validation ratings
    lams: jax.Array,         # (4,) [lam_u, lam_v, lam_bu, lam_bv]
    eta: jax.Array,
    eta_reg: jax.Array,
    n_visits: jax.Array,     # user-visits this segment processed
    gb: jax.Array,
    dim: int,
    loss: int = 0,
) -> jax.Array:
    """Hypergradient step on the four lambdas from K sampled fused-layout
    rows (model.h:86-102): factors in lanes [:dim], bias in lane dim.

    Shared by the single-chip segment runner and the sharded substep runner
    (parallel/adreg_sharded.py)."""
    tf, tb = new_t[:, :dim], new_t[:, dim]
    pf, pb = new_p[:, :dim], new_p[:, dim + 1]  # phi rows: [fac | 1 | bias]
    score = jnp.sum(tf * pf, axis=1) + tb + pb + gb
    pred = jax.nn.sigmoid(score) if loss == 1 else score
    grad = sr - pred
    inner_u = jnp.sum(old_t[:, :dim] * pf, axis=1)
    inner_v = jnp.sum(tf * old_p[:, :dim], axis=1)
    scale = (eta_reg * eta) * n_visits / sr.shape[0]
    steps = jnp.stack(
        [
            jnp.sum(grad * inner_u),
            jnp.sum(grad * inner_v),
            jnp.sum(grad * old_t[:, dim]),
            jnp.sum(grad * old_p[:, dim + 1]),
        ]
    )
    return jnp.maximum(0.0, lams - scale * steps)


def build_adreg_lamvec(dim: int, lams) -> jax.Array:
    """(2, lanes) per-lane decay rates for the homogeneous rows: lamvec_u =
    [lam_u x dim | lam_bu | 0..], lamvec_v = [lam_v x dim | 0 | lam_bv | 0..]
    — zeros on the one-lanes and bookkeeping lanes so they never decay."""
    lanes = row_lanes(dim)
    lu = jnp.zeros((lanes,), jnp.float32)
    lu = lu.at[:dim].set(lams[0]).at[dim].set(lams[2])
    lv = jnp.zeros((lanes,), jnp.float32)
    lv = lv.at[:dim].set(lams[1]).at[dim + 1].set(lams[3])
    return jnp.stack([lu, lv])


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "batch", "dim", "n_gu", "n_gv", "mxu",
        "interpret", "loss", "n_samples",
    ),
)
def _run_adreg_seg_step(
    theta_ext, phi_ext, lams, key, seg_idx, uvv, vvv, rvv,
    gu, gv, u, v, ut, vt, r, w, hyper, eta, eta_reg, visits_all,
    *, tile_u, tile_v, batch, dim, n_gu, n_gv, mxu="bfloat16",
    interpret=False, loss=0, n_samples=64,
):
    """One segment FUSED into a single dispatch: validation-row sampling,
    old-row snapshot gathers, the pallas segment, and the lambda
    hypergradient. The previous eager orchestration cost ~12 dispatches per
    segment — ~80 ms through this environment's tunneled chip, 8x the
    kernel time itself."""
    visits = visits_all[seg_idx]
    kseg = jax.random.fold_in(key, seg_idx)
    ksel = jax.random.randint(kseg, (n_samples,), 0, uvv.shape[0])
    su, sv, sr = uvv[ksel], vvv[ksel], rvv[ksel]
    old_t = theta_ext[su]
    old_p = phi_ext[sv]
    lamvec = build_adreg_lamvec(dim, lams)
    theta_ext, phi_ext = _run_adreg_segment(
        theta_ext, phi_ext, gu, gv, u, v, ut, vt, r, w, hyper, lamvec,
        tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim,
        n_gu=n_gu, n_gv=n_gv, mxu=mxu, interpret=interpret, loss=loss,
    )
    lams = hypergrad_ext_rows(
        theta_ext[su], phi_ext[sv], old_t, old_p, sr, lams,
        eta, eta_reg, visits, hyper[1], dim, loss,
    )
    return theta_ext, phi_ext, lams


class PallasAdRegRunner:
    """Fused AdaptReg epochs: S kernel segments with lambda hypergradient
    updates (and shadow-snapshot refresh) between them."""

    def __init__(
        self,
        train_ds: RatingsCOO,
        valid_ds: RatingsCOO,
        tile_u: int = 512,
        tile_v: int = 512,
        batch: int = 4096,
        segments: int = 8,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        loss: int = 0,
        n_reg_samples: int = 64,
        n_plans: int = 1,
    ):
        batch = cdiv(batch, 8) * 8
        # n_plans > 1 rotates independently-shuffled cell plans between
        # epochs (between-epoch reshuffling; the reference replays one fixed
        # file order per epoch, admf.h:6-46).
        self.plans = [
            prepare_cells(train_ds, tile_u, tile_v, batch, seed + 7919 * p)
            for p in range(max(1, n_plans))
        ]
        self.plan = self.plans[0]
        self.nu, self.nv = train_ds.nu, train_ds.nv
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        self.mxu, self.interpret, self.loss = mxu, interpret, loss
        self.n_reg_samples = n_reg_samples
        from tpu_mf.ops.common import distinct_counts

        self.bundles = []
        for plan in self.plans:
            # Pad the batch list to a multiple of `segments` with no-op
            # batches (w=0, sentinel ids, tile 0).
            nb = plan.u.shape[0]
            segs = min(segments, nb)
            nb_pad = cdiv(nb, segs) * segs
            pad = nb_pad - nb

            def padb(x, fill):
                extra = np.full((pad,) + x.shape[1:], fill, x.dtype)
                return np.concatenate([x, extra])

            # Pad batches keep the last real gu: a gu change would reload the
            # theta tile from the aliased HBM buffer, which does not see the
            # store made earlier in the same pallas_call (stale clobber).
            gu = padb(plan.gu, plan.gu[-1] if nb else 0)
            gv = padb(plan.gv, 0)
            u = padb(plan.u, tile_u)
            v = padb(plan.v, tile_v)
            r = padb(plan.r, 0)
            w = padb(plan.w, 0)
            seg_len = nb_pad // segs

            # user-visits per segment: distinct real users per batch, summed
            # (vectorized — Python np.unique loops take minutes at Netflix
            # scale).
            visits = np.zeros(nb_pad, np.float32)
            visits[:nb] = distinct_counts(
                plan.u.reshape(nb, -1), plan.w.reshape(nb, -1) > 0
            )

            def seg(x, segs=segs, seg_len=seg_len):
                return [
                    jnp.asarray(x[s * seg_len : (s + 1) * seg_len])
                    for s in range(segs)
                ]

            self.bundles.append(dict(
                segments=segs, seg_len=seg_len, n_gu=plan.n_gu,
                n_gv=plan.n_gv,
                visits_per_seg=visits.reshape(segs, -1).sum(1).astype(
                    np.float32),
                gu=seg(gu), gv=seg(gv), u=seg(u), v=seg(v),
                ut=seg(np.swapaxes(u, 1, 2).copy()),
                vt=seg(np.swapaxes(v, 1, 2).copy()),
                r=seg(r), w=seg(w),
            ))
        b0 = self.bundles[0]
        self.segments, self.seg_len = b0["segments"], b0["seg_len"]
        self.visits_per_seg = b0["visits_per_seg"]
        self.dev = {k: b0[k] for k in
                    ("gu", "gv", "u", "v", "ut", "vt", "r", "w")}
        self.valid = (
            jnp.asarray(valid_ds.u),
            jnp.asarray(valid_ds.v),
            jnp.asarray(valid_ds.r),
        )

    def pad(self, state: AdaptRegState):
        self.dim = state.params.theta.shape[1]
        self.gb = float(state.params.gb)
        self.lams = jnp.stack(
            [state.lam_u, state.lam_v, state.lam_bu, state.lam_bv]
        ).astype(jnp.float32)
        return pad_params(state.params, self.plan)

    def _lamvec(self) -> jax.Array:
        return build_adreg_lamvec(self.dim, self.lams)

    def epoch(self, tables, eta: float, eta_reg: float, key: jax.Array,
              epoch_idx: int = 0):
        """epoch_idx rotates between the shuffled plans when n_plans > 1."""
        hyper = jnp.asarray([eta, self.gb], jnp.float32)
        uv, vv, rv = self.valid
        b = self.bundles[epoch_idx % len(self.bundles)]
        # one device transfer per epoch for all per-segment scalars (each
        # eager device_put costs a full tunnel round trip here)
        eta_d = jnp.float32(eta)
        eta_reg_d = jnp.float32(eta_reg)
        visits_d = jnp.asarray(b["visits_per_seg"])
        seg_ids = np.arange(b["segments"], dtype=np.int32)
        for s in range(b["segments"]):
            t0, t1, self.lams = _run_adreg_seg_step(
                tables[0], tables[1], self.lams, key,
                seg_ids[s], uv, vv, rv,
                b["gu"][s], b["gv"][s],
                b["u"][s], b["v"][s],
                b["ut"][s], b["vt"][s],
                b["r"][s], b["w"][s],
                hyper, eta_d, eta_reg_d,
                visits_d,
                tile_u=self.tile_u, tile_v=self.tile_v, batch=self.batch,
                dim=self.dim, n_gu=b["n_gu"], n_gv=b["n_gv"],
                mxu=self.mxu, interpret=self.interpret, loss=self.loss,
                n_samples=self.n_reg_samples,
            )
            tables = (t0, t1)
        return tables

    def trim(self, tables) -> MFParams:
        return split_params(
            tables[0], tables[1], self.nu, self.nv, self.dim, self.gb
        )

    def state(self, tables, template: AdaptRegState) -> AdaptRegState:
        params = self.trim(tables)
        # Distinct buffers: downstream XLA epochs donate the state, and
        # aliased theta/theta_old leaves would be donated twice.
        return template._replace(
            params=params,
            theta_old=jnp.copy(params.theta),
            phi_old=jnp.copy(params.phi),
            bu_old=jnp.copy(params.bu),
            bv_old=jnp.copy(params.bv),
            lam_u=self.lams[0], lam_v=self.lams[1],
            lam_bu=self.lams[2], lam_bv=self.lams[3],
        )


def adreg_pallas_eligible(state: AdaptRegState, batch_size: int) -> bool:
    from tpu_mf.ops.pallas_sgd import MAX_DIM

    dim = state.params.theta.shape[1]
    nv = state.params.phi.shape[0]
    vmem_phi = cdiv(nv, 512) * 512 * row_lanes(min(dim, MAX_DIM)) * 4
    return dim <= MAX_DIM and vmem_phi <= 64 * 1024 * 1024
