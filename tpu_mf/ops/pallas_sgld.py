"""Fused Pallas TPU kernel for the DP-SGLD epoch (one round).

The BASELINE north star calls for "SGLD Langevin noise ... fused into the
Pallas update kernel using on-chip PRNG". This kernel extends the fused SGD
epoch kernel (ops/pallas_sgd.py — read that first) with the DPMF semantics of
ops/sgld.py (reference: src/dpmf.h:37-92):

* **Row layout** (1-2 lane groups, like ops/pallas_sgd.row_lanes):
  [factor_0..D-1 | bias | cnt scratch | gcount_lo | invfreq | gcount_hi] in
  128 lanes for dim <= 123, 256 lanes for dim <= 251 (covers the reference
  default dim=128, main.cc:97) — the lazy-noise last-touch counter and the
  inverse-frequency regularization weight travel WITH their row through the
  tile pipeline.
* **Lazy Langevin noise**: per batch, rows touched for the first time since
  their last update receive one Gaussian of variance temp*eta*(global
  updates elapsed), computed from the gcount lane against a scalar-prefetched
  cumulative real-rating counter; normals come from the on-chip PRNG
  (pltpu.prng_random_bits + Box-Muller) instead of the reference's
  pregenerated lookup table (model.cc:229-231) — fresh i.i.d. noise.
* **Privacy-scaled gradient**: err = eta*ntrain*bound*lambda_r * residual,
  with per-dimension precision decay (1 - eta*bound*invfreq*lambda)^k
  applied geometrically per touch count; the lambda vector input carries
  lambda_u in factor lanes and lambda_ub in the bias lane, zeros elsewhere
  (so bookkeeping lanes never decay).

Counter exactness: the last-touch counter is SPLIT across two f32 lanes
(lo = count mod 2^22, hi = count >> 22) so stamping telescopes exactly for
counts below 2^46; the surrounding DPMFState keeps int32 counters (zeroed
every round by finish_noise, ops/sgld.py:179-181), so the effective bound is
2^31-1 ratings per round — Yahoo-scale rounds included. finish_noise
(round-end flush) stays in the XLA path — it is O(rows), once per round.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_mf.models.dpmf import DPMFState
from tpu_mf.ops.pallas_sgd import LANES, CellPlan, cdiv, prepare_cells

# Row = [dim factors | bias | cnt | gc_lo | invfreq | gc_hi] in 1-2 lane groups.
MAX_DIM_SGLD = 2 * LANES - 5
# Split-counter radix: lo holds count mod 2^22, hi holds count >> 22. Both
# lanes stay exact below 2^24 as long as counts stay below 2^46; the int32
# DPMFState counters bound a round at 2^31-1 ratings in practice.
LO_BITS = 22
LO_BASE = 1 << LO_BITS
MAX_EXACT_COUNT = (1 << 31) - 1  # per-round bound (int32 state counters)


def sgld_row_lanes(dim: int) -> int:
    """Lane width of a fused SGLD row: 128 for dim <= 123, else 256."""
    assert dim <= MAX_DIM_SGLD, (
        f"fused SGLD supports dim <= {MAX_DIM_SGLD}, got {dim}"
    )
    return LANES if dim + 5 <= LANES else 2 * LANES


def split_count(c):
    """(lo, hi) f32 lane pair of a non-negative integer count array."""
    c = np.asarray(c, np.int64)
    hi = c >> LO_BITS
    lo = c - (hi << LO_BITS)
    return lo.astype(np.float32), hi.astype(np.float32)


def bits_to_normals(b1, b2):
    """Box-Muller transform of two uint32 bit arrays to standard normals.

    Pure jnp so it is unit-testable outside the kernel; uses the 24 high
    bits as uniforms in (0, 1), offset by 2^-25 to avoid log(0).
    """
    # >>8 leaves 24 bits, so the int32 round trip is lossless (Mosaic has no
    # direct uint32 -> float32 cast).
    u1 = (b1 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24)) + (
        1.0 / (1 << 25)
    )
    u2 = (b2 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * np.pi) * u2)


def bits_to_normals_pair(b1, b2):
    """Both Box-Muller halves: r*cos AND r*sin of one (u1, u2) pair — two
    independent standard normals for one log+sqrt and two PRNG words."""
    u1 = (b1 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24)) + (
        1.0 / (1 << 25)
    )
    u2 = (b2 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    a = (2.0 * np.pi) * u2
    return r * jnp.cos(a), r * jnp.sin(a)


def _normals(shape):
    """Standard normals from the on-chip PRNG (prng_seed must be called).

    Uses BOTH Box-Muller halves (noise generation measured 34% of the slot
    SGLD step when the cos-only variant ran per apply): bits for shape[0]/2
    sublanes, sin/cos halves stacked — 1 PRNG word, half a log/sqrt, one
    cos-or-sin per normal."""
    rows = shape[0]
    if rows % 2:
        b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return bits_to_normals(b1, b2)
    half = (rows // 2,) + tuple(shape[1:])
    b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    nc, ns = bits_to_normals_pair(b1, b2)
    return jnp.concatenate([nc, ns], axis=0)


def _sgld_kernel(
    # scalar prefetch
    gu_ref, gv_ref, cum_lo_ref, cum_hi_ref, seed_ref, hyper_ref,
    # blocked inputs
    u_ref, v_ref, ut_ref, vt_ref, r_ref, w_ref, theta_ref, lam_ref,
    # HBM-resident input (aliased with the resident output)
    phi_hbm,
    # outputs
    theta_out, phi_out,
    # scratch
    sem,
    *, tile_u: int, tile_v: int, batch: int, dim: int, lanes: int, mxu_dtype,
    dma_seed: bool = True,
):
    eta = hyper_ref[0]
    temp = hyper_ref[1]
    bound = hyper_ref[2]
    scal = hyper_ref[3]   # eta * ntrain * bound * lambda_r (dpmf.h:50)
    gb = hyper_ref[4]

    i = pl.program_id(0)
    prev = jnp.maximum(i - 1, 0)
    new_gu = (i == 0) | (gu_ref[i] != gu_ref[prev])

    @pl.when(i == 0)
    def _():
        if dma_seed:  # compiled path: phi input stays in HBM, DMA once
            cp = pltpu.make_async_copy(phi_hbm, phi_out, sem)
            cp.start()
            cp.wait()
        else:  # interpreter path: phi input arrives as a VMEM block
            phi_out[:] = phi_hbm[:]

    @pl.when(new_gu)
    def _():
        theta_out[:] = theta_ref[:]

    pltpu.prng_seed(seed_ref[0] + i)

    sub = batch // 8
    u3 = u_ref[0]
    v3 = v_ref[0]
    ut3 = ut_ref[0]
    vt3 = vt_ref[0]
    r3 = r_ref[0]
    w3 = w_ref[0]
    lam_u = lam_ref[0:1, :]   # (1, lanes): [lambda_u | lambda_ub | 0 0 0..]
    lam_v = lam_ref[1:2, :]

    theta = theta_out[:]

    # Lane-role masks for [factors | bias | cnt | gc_lo | invfreq | gc_hi].
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    m_fac = (lane < dim).astype(jnp.float32)
    m_bias = (lane == dim).astype(jnp.float32)
    m_keep = m_fac + m_bias
    m_gcl = (lane == dim + 2).astype(jnp.float32)
    m_inv = (lane == dim + 3).astype(jnp.float32)
    m_gch = (lane == dim + 4).astype(jnp.float32)

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_u), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_v), 1)
    iota_ut = jax.lax.broadcasted_iota(jnp.int32, (tile_u, sub), 0)
    iota_vt = jax.lax.broadcasted_iota(jnp.int32, (tile_v, sub), 0)

    def powk(ln_mag, neg, k):
        # |base|^k * (-1)^(k odd & base<0): matches jnp.power for integer k
        # and degrades like the sequential reference when base < 0
        # (oscillating divergence) instead of NaN-ing through log(negative).
        sign = jnp.where(neg & (jnp.mod(k, 2.0) == 1.0), -1.0, 1.0)
        return jnp.where(k == 0, 1.0, sign * jnp.exp(k * ln_mag))

    # --- u-side total touch counts (for batch-granular noise). One-hots are
    # rebuilt on the fly in the gradient loop rather than stored: 8 stored
    # (TILE, B/8) pairs would cost ~8 MB of VMEM at the default tiles. ---
    k_u = jnp.zeros((tile_u, 1), jnp.float32)
    for k in range(8):
        oht_u_k = (iota_ut == ut3[k : k + 1, :]).astype(mxu_dtype)
        wk = w3[:, k : k + 1].astype(mxu_dtype)
        k_u += jnp.dot(oht_u_k, wk, preferred_element_type=jnp.float32)

    # --- lazy Langevin noise, u side (reference: dpmf.h:61-70). The global
    # update counter is split across two lanes (lo = mod 2^22, hi = >> 22) so
    # the stamp telescopes exactly for rounds far beyond the 2^24 f32 integer
    # bound; the elapsed-count DIFFERENCE recombines in f32 (its ~2^-24
    # relative error only perturbs a noise variance). ---
    end_lo = cum_lo_ref[i].astype(jnp.float32)  # ratings through this batch
    end_hi = cum_hi_ref[i].astype(jnp.float32)
    touched_u = (k_u > 0).astype(jnp.float32)
    lo_u = jnp.sum(theta * m_gcl, axis=1, keepdims=True)  # (TILE_U, 1)
    hi_u = jnp.sum(theta * m_gch, axis=1, keepdims=True)
    dlo_u = end_lo - lo_u
    dhi_u = end_hi - hi_u
    std_u = jnp.sqrt(
        jnp.maximum(temp * eta * (dhi_u * LO_BASE + dlo_u), 0.0)
    ) * touched_u
    theta = (
        theta
        + std_u * _normals((tile_u, lanes)) * m_keep
        + touched_u * (dlo_u * m_gcl + dhi_u * m_gch)  # stamp count lanes
    )

    # Per-dimension decay base for the (batch-constant) theta tile.
    inv_u = jnp.sum(theta * m_inv, axis=1, keepdims=True)
    base_u = 1.0 - (eta * bound) * inv_u * lam_u
    ln_u = jnp.log(jnp.maximum(jnp.abs(base_u), 1e-30))
    neg_u = base_u < 0

    # --- per-sub-batch: slice this column's item tile, inject its lazy
    # noise (gcount-lane stamping telescopes exactly even when columns share
    # a tile), take the privacy-scaled gradient (dpmf.h:72-88), decay, and
    # write the tile back. Sub-batches are SEQUENTIAL: each gathers from the
    # state the previous one produced.
    for k in range(8):
        off = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        phi = phi_out[pl.ds(off, tile_v), :]

        oh_u_k = (iota_u == u3[:, k : k + 1]).astype(mxu_dtype)
        oht_u_k = (iota_ut == ut3[k : k + 1, :]).astype(mxu_dtype)
        oh_v = (iota_v == v3[:, k : k + 1]).astype(mxu_dtype)
        oht_v = (iota_vt == vt3[k : k + 1, :]).astype(mxu_dtype)
        wk = w3[:, k : k + 1]
        k_v = jnp.dot(
            oht_v, wk.astype(mxu_dtype), preferred_element_type=jnp.float32
        )
        touched_v = (k_v > 0).astype(jnp.float32)
        lo_v = jnp.sum(phi * m_gcl, axis=1, keepdims=True)
        hi_v = jnp.sum(phi * m_gch, axis=1, keepdims=True)
        dlo_v = end_lo - lo_v
        dhi_v = end_hi - hi_v
        std_v = jnp.sqrt(
            jnp.maximum(temp * eta * (dhi_v * LO_BASE + dlo_v), 0.0)
        ) * touched_v
        phi = (
            phi
            + std_v * _normals((tile_v, lanes)) * m_keep
            + touched_v * (dlo_v * m_gcl + dhi_v * m_gch)
        )

        theta_mx = theta.astype(mxu_dtype)
        phi_mx = phi.astype(mxu_dtype)
        t = jnp.dot(oh_u_k, theta_mx, preferred_element_type=jnp.float32)
        p = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
        q = p * m_fac + m_bias
        pred = (
            jnp.sum(t * q, axis=1, keepdims=True)
            + jnp.sum(p * m_bias, axis=1, keepdims=True)
            + gb
        )
        err = (scal * wk) * (r3[:, k : k + 1] - pred)
        d_theta = jnp.dot(
            oht_u_k, (err * q).astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )
        d_phi = jnp.dot(
            oht_v, (err * (t * m_fac + m_bias)).astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )
        k_u_k = jnp.dot(
            oht_u_k, wk.astype(mxu_dtype), preferred_element_type=jnp.float32
        )
        theta = theta * powk(ln_u, neg_u, k_u_k) + d_theta * m_keep

        inv_v = jnp.sum(phi * m_inv, axis=1, keepdims=True)
        base_v = 1.0 - (eta * bound) * inv_v * lam_v
        ln_v = jnp.log(jnp.maximum(jnp.abs(base_v), 1e-30))
        phi_out[pl.ds(off, tile_v), :] = (
            phi * powk(ln_v, base_v < 0, k_v) + d_phi * m_keep
        )

    theta_out[:] = theta


def pad_sgld(state: DPMFState, plan: CellPlan) -> Tuple[jax.Array, jax.Array]:
    """Fused SGLD layout: rows [factors | bias | 0 | gc_lo | invfreq | gc_hi]."""
    params = state.params
    dim = params.theta.shape[1]
    lanes = sgld_row_lanes(dim)
    pu = plan.n_gu * plan.tile_u
    pv = plan.n_gv * plan.tile_v

    def fuse(fac, bias, gcount, invfreq, rows):
        n = fac.shape[0]
        lo, hi = split_count(np.asarray(gcount[:n]))
        ext = jnp.concatenate(
            [
                fac.astype(jnp.float32),
                bias[:, None].astype(jnp.float32),
                jnp.zeros((n, 1), jnp.float32),
                jnp.asarray(lo)[:, None],
                invfreq[:, None].astype(jnp.float32),
                jnp.asarray(hi)[:, None],
            ],
            axis=1,
        )
        return jnp.pad(ext, ((0, rows - n), (0, lanes - ext.shape[1])))

    return (
        fuse(params.theta, params.bu, state.gcountu, state.ur, pu),
        fuse(params.phi, params.bv, state.gcountv, state.vr, pv),
    )


def unpack_sgld(state: DPMFState, theta_ext, phi_ext, n_processed) -> DPMFState:
    """Back to DPMFState after fused epochs (counters round-trip exactly)."""
    nu, dim = state.params.theta.shape
    nv = state.params.phi.shape[0]
    params = state.params._replace(
        theta=theta_ext[:nu, :dim],
        phi=phi_ext[:nv, :dim],
        bu=theta_ext[:nu, dim],
        bv=phi_ext[:nv, dim],
    )

    def recount(ext, n):
        # lo + (hi << 22); both lanes hold exact integers, the recombined
        # per-round count fits int32 (MAX_EXACT_COUNT).
        lo = ext[:n, dim + 2].astype(jnp.int32)
        hi = ext[:n, dim + 4].astype(jnp.int32)
        return lo + (hi << LO_BITS)

    gcountu = jnp.concatenate([recount(theta_ext, nu), state.gcountu[nu:]])
    gcountv = jnp.concatenate([recount(phi_ext, nv), state.gcountv[nv:]])
    return state._replace(
        params=params,
        gcountu=gcountu,
        gcountv=gcountv,
        gcount=state.gcount + jnp.int32(n_processed),
    )


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "batch", "dim", "n_gu", "n_gv", "mxu", "interpret"
    ),
)
def _run_sgld_epoch(
    theta_ext, phi_ext,
    gu, gv, cum_lo, cum_hi, seed, hyper, lamvec,
    u, v, ut, vt, r, w,
    *, tile_u, tile_v, batch, dim, n_gu, n_gv, mxu="bfloat16", interpret=False,
):
    nb = u.shape[0]
    gv = gv.reshape(-1)  # (nb*8,) per-column item-tile indices
    lanes = sgld_row_lanes(dim)
    kernel = functools.partial(
        _sgld_kernel,
        tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim, lanes=lanes,
        mxu_dtype=jnp.dtype(mxu), dma_seed=not interpret,
    )
    sub = batch // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,  # gu, gv, cum_lo, cum_hi, seed, hyper
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),   # u
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),   # v
            pl.BlockSpec((1, 8, sub), lambda i, *_: (i, 0, 0)),   # ut
            pl.BlockSpec((1, 8, sub), lambda i, *_: (i, 0, 0)),   # vt
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),   # r
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),   # w
            pl.BlockSpec((tile_u, lanes), lambda i, gu, *_: (gu[i], 0)),  # theta
            pl.BlockSpec((2, lanes), lambda i, *_: (0, 0)),       # lambda vecs
            (
                # The Mosaic interpreter cannot DMA from an ANY-space input;
                # give it a whole-array VMEM block instead.
                pl.BlockSpec((n_gv * tile_v, lanes), lambda i, *_: (0, 0))
                if interpret
                else pl.BlockSpec(memory_space=pl.ANY)             # phi (HBM)
            ),
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
        # operands incl. 6 scalar-prefetch args: theta=12, phi=14 -> outs 0,1
        # v5e has 128 MB of VMEM; the compiler's default 16 MB scoped limit
        # is too tight for the resident item table + unrolled temporaries.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        input_output_aliases={12: 0, 14: 1},
        # The Mosaic TPU interpreter emulates pltpu.prng_* on CPU; the plain
        # HLO interpreter does not.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(gu, gv, cum_lo, cum_hi, seed, hyper, u, v, ut, vt, r, w,
      theta_ext, lamvec, phi_ext)
    return theta_ext, phi_ext


class PallasSgldRunner:
    """Fused SGLD rounds over a static CellPlan."""

    def __init__(
        self,
        train_ds,
        tile_u: int = 256,
        tile_v: int = 256,
        batch: int = 1024,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        n_plans: int = 1,
    ):
        batch = cdiv(batch, 8) * 8
        # n_plans > 1 rotates independently-shuffled cell plans between
        # rounds (same between-epoch reshuffling the MF runner gained in
        # pallas_sgd.PallasEpochRunner; the reference replays one fixed file
        # order per round, dpmf.h:6-34).
        self.plans = [
            prepare_cells(train_ds, tile_u, tile_v, batch, seed + 7919 * p)
            for p in range(max(1, n_plans))
        ]
        self.plan = self.plans[0]
        self.nb = max(p.u.shape[0] for p in self.plans)
        # distinct prng seeds per round must be spaced by at least this
        self.seed_stride = self.nb + 1
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        self.mxu = mxu
        self.interpret = interpret
        self.devs = []
        self.cum_bases = []
        for plan in self.plans:
            u, v = plan.u, plan.v
            # cumulative REAL rating count per batch: the global update
            # counter value after each batch (exact lazy-noise accounting;
            # int64 so the lo/hi lane split stays exact far beyond 2^24).
            real_per_batch = plan.w.reshape(plan.w.shape[0], -1).sum(1)
            self.cum_bases.append(np.cumsum(real_per_batch).astype(np.int64))
            self.devs.append((
                jnp.asarray(plan.gu),
                jnp.asarray(plan.gv),
                jnp.asarray(u),
                jnp.asarray(v),
                jnp.asarray(np.swapaxes(u, 1, 2).copy()),
                jnp.asarray(np.swapaxes(v, 1, 2).copy()),
                jnp.asarray(plan.r),
                jnp.asarray(plan.w),
            ))
        self.dev = self.devs[0]
        self.cum_base = self.cum_bases[0]
        self.n_real = int(self.plan.n_real)

    def epoch(self, tables, state_gcount: int, hyper, noise_seed: int,
              epoch_idx: int = 0):
        """hyper = (eta, temp, bound, scal, gb) floats; epoch_idx rotates
        between the shuffled plans when n_plans > 1."""
        plan_i = epoch_idx % len(self.plans)
        plan = self.plans[plan_i]
        gu, gv, u, v, ut, vt, r, w = self.devs[plan_i]
        lo, hi = split_count(self.cum_bases[plan_i] + np.int64(state_gcount))
        cum_lo = jnp.asarray(lo.astype(np.int32))
        cum_hi = jnp.asarray(hi.astype(np.int32))
        seed = jnp.asarray([noise_seed], jnp.int32)
        hyper_v = jnp.asarray(list(hyper), jnp.float32)
        return _run_sgld_epoch(
            tables[0], tables[1],
            gu, gv, cum_lo, cum_hi, seed, hyper_v, self.lamvec,
            u, v, ut, vt, r, w,
            tile_u=self.tile_u, tile_v=self.tile_v, batch=self.batch,
            dim=self.dim, n_gu=plan.n_gu, n_gv=plan.n_gv,
            mxu=self.mxu, interpret=self.interpret,
        )

    def pad(self, state: DPMFState):
        self.dim = state.params.theta.shape[1]
        self.set_lambdas(state)
        return pad_sgld(state, self.plan)

    def set_lambdas(self, state: DPMFState) -> None:
        """(Re)build the lambda lane vectors after Gibbs resampling."""
        self.lamvec = build_lamvec(state)

    def unpack(self, state: DPMFState, tables) -> DPMFState:
        return unpack_sgld(state, tables[0], tables[1], self.n_real)


def build_lamvec(state: DPMFState) -> jax.Array:
    """(2, row_lanes) lambda lane vectors: [lambda_u.. | lambda_ub | 0..]."""
    dim = state.params.theta.shape[1]
    lanes = sgld_row_lanes(dim)
    lu = jnp.zeros((lanes,), jnp.float32)
    lu = lu.at[:dim].set(state.lambda_u).at[dim].set(state.lambda_ub)
    lv = jnp.zeros((lanes,), jnp.float32)
    lv = lv.at[:dim].set(state.lambda_v).at[dim].set(state.lambda_vb)
    return jnp.stack([lu, lv])


def sgld_pallas_eligible(state: DPMFState, ntrain: int) -> bool:
    dim = state.params.theta.shape[1]
    if dim > MAX_DIM_SGLD:
        return False
    nv = state.params.phi.shape[0]
    vmem_phi = cdiv(nv, 256) * 256 * sgld_row_lanes(dim) * 4
    return vmem_phi <= 64 * 1024 * 1024 and ntrain < MAX_EXACT_COUNT
