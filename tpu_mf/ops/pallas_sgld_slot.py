"""Slot-major fused DP-SGLD epoch kernel (small rank).

Round-2 VERDICT #2: the gen-1 fused SGLD kernel (ops/pallas_sgld.py) runs
5-12x slower than its SGD siblings because every one of its 8 sequential
sub-batch columns pays tile-sized noise, stamp, and per-lane exp-decay work.
This kernel applies the slot-major layout (ops/pallas_sgd_slot.py: P
ratings per sublane row, slot-major stacked tables) to the DPMF semantics
(reference: src/dpmf.h:37-92) with one structural change:

**Noise, decay, and counter stamping ride the deferred per-tile APPLY**, not
the per-column path. Columns only gather/scatter (identical hot loop to the
slot SGD kernel, m_pred-masked pred); at each tile's last touching column of
the batch the accumulated deltas flush once: geometric per-occurrence decay
(1 - eta*bound*invfreq*lambda)^k from the count lanes, and — every
``noise_every``-th batch (ap flag 2; per-apply Box-Muller over full tiles
measured 34% of the step) — lazy Langevin noise sqrt(temp*eta*elapsed) for
touched rows from the split gcount lanes against the batch-START clock, and
the stamp. SGLD's stability envelope
(eta*ntrain*bound*lambda_r << 1, CLAUDE.md) makes batch-granular application
trajectory-neutral — the same argument that set the gen-1 batch default to
8192 — and the noise lands one batch later than the reference's
touch-time injection (dpmf.h:61-70), which finish_noise's round-end flush
absorbs (the telescoping stays exact).

Slot layout (homogeneous rows, dim+6 <= m = 128/P):
  theta slot: [fac(dim) | bu | 1 | cnt | gc_lo | invf | gc_hi]
  phi   slot: [fac(dim) | 1 | bv | cnt | gc_lo | invf | gc_hi]
P=8 covers dim <= 10, P=4 dim <= 26, P=2 dim <= 58.
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
from tpu_mf.ops.pallas_sgd import LANES, UV_BASE, UV_SHIFT, _apply_flags, cdiv
from tpu_mf.ops.pallas_sgld import LO_BASE, _normals, split_count
from tpu_mf.ops.pallas_sgd_slot import SlotPlan, prepare_cells_slot


def sgld_slot_pack(dim: int) -> int:
    """Rows per 128-lane row; slot = [fac|bias|one|cnt|gclo|invf|gchi]."""
    if dim + 6 <= 16:
        return 8
    if dim + 6 <= 32:
        return 4
    if dim + 6 <= 64:
        return 2
    return 1


def _slot_sgld_kernel(
    # scalar prefetch
    gu_ref, gv_ref, ap_ref, cum_lo_ref, cum_hi_ref, seed_ref, hyper_ref,
    # blocked inputs
    uv_ref, uvt_ref, r_ref, theta_ref, lam_ref, ring_ref,
    # HBM-resident input (aliased with the resident output)
    phi_hbm,
    # outputs
    theta_out, phi_out,
    # scratch
    acc, sem,
    *, tile_u: int, tile_v: int, sub: int, dim: int, pack: int,
    mxu_dtype, dma_seed: bool = True, saturate: bool = False,
    noise_every: int = 1, striped: bool = False, noise_ring: bool = True,
):
    P = pack
    m = LANES // P
    rows_u = tile_u // P
    rows_v = tile_v // P
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
        if dma_seed:
            cp = pltpu.make_async_copy(phi_hbm, phi_out, sem)
            cp.start()
            cp.wait()
        else:  # interpreter: phi arrives as a VMEM block
            phi_out[:] = phi_hbm[:]
        acc[:] = jnp.zeros_like(acc)

    @pl.when(new_gu)
    def _():
        theta_out[:] = theta_ref[:]

    if not noise_ring:
        pltpu.prng_seed(seed_ref[0] + i)

    uv3 = uv_ref[0]
    uvt3 = uvt_ref[0]
    r3 = r_ref[0]
    theta = theta_out[:]
    lam_u = lam_ref[0:1, :]   # slot-replicated [lambda_u.. | lambda_ub | 0..]
    lam_v = lam_ref[1:2, :]

    # Lane roles (per slot).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    slot_lane = lane >> (m.bit_length() - 1)
    inslot = lane - slot_lane * m
    m_fac = (inslot < dim).astype(jnp.float32)
    m_pred = (inslot <= dim + 1).astype(jnp.float32)  # fac+bias+one
    m_cnt = (inslot == dim + 2).astype(jnp.float32)
    m_gcl = (inslot == dim + 3).astype(jnp.float32)
    m_inv = (inslot == dim + 4).astype(jnp.float32)
    m_gch = (inslot == dim + 5).astype(jnp.float32)
    # Broadcast matmuls: (d @ B)[:, l] = d[:, slot(l)*m + src_lane].
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    CB = (c_iota == slot_lane * m + (dim + 2)).astype(jnp.float32)   # cnt
    GL = (c_iota == slot_lane * m + (dim + 3)).astype(jnp.float32)   # gc_lo
    IB = (c_iota == slot_lane * m + (dim + 4)).astype(jnp.float32)   # invf
    GH = (c_iota == slot_lane * m + (dim + 5)).astype(jnp.float32)   # gc_hi
    # Slot-sum broadcast for pred.
    SS = (slot_lane == (c_iota >> (m.bit_length() - 1))).astype(jnp.float32)
    # Per-slot scalar broadcast for ratings.
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, LANES), 0)
    E = (p_iota == slot_lane).astype(jnp.float32)
    iota_ru = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_u), 1)
    iota_rv = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_v), 1)
    iota_rut = jax.lax.broadcasted_iota(jnp.int32, (rows_u, sub), 0)
    iota_rvt = jax.lax.broadcasted_iota(jnp.int32, (rows_v, sub), 0)
    # Scatter-garbage erasers per physical-row block.
    rseg_u = jax.lax.broadcasted_iota(jnp.int32, (tile_u, 1), 0) // rows_u
    rseg_v = jax.lax.broadcasted_iota(jnp.int32, (tile_v, 1), 0) // rows_v
    m_keep = m_fac + (inslot == dim).astype(jnp.float32) + (
        inslot == dim + 1
    ).astype(jnp.float32)
    # theta: persist fac+bias, re-pin one; phi symmetric (one/bias swap is
    # inside the slot, positions dim / dim+1).
    m_bias_u = (inslot == dim).astype(jnp.float32)
    m_one_u = (inslot == dim + 1).astype(jnp.float32)
    m_bias_v = m_one_u
    m_one_v = m_bias_u
    m_gc3 = m_gcl + m_inv + m_gch
    MKD_u = (rseg_u == slot_lane).astype(jnp.float32)  # own-slot mask (u)
    MKD_v = (rseg_v == slot_lane).astype(jnp.float32)
    MC_u = MKD_u * (m_cnt + m_fac + m_bias_u)  # delta lanes that matter (u)
    MC_v = MKD_v * (m_cnt + m_fac + m_bias_v)
    # No one-lane restore op is needed: the per-lane decay base is 1 on the
    # one/cnt/gc lanes (their lamvec entries are 0), so stored values ride
    # through dec untouched and delta garbage dies in the m_kept mask.

    end_lo = cum_lo_ref[i].astype(jnp.float32)  # clock at batch START
    end_hi = cum_hi_ref[i].astype(jnp.float32)

    def apply_tile(tab, a, lamv, m_bias_t, rows, with_noise, site=0):
        """Decay + delta (+ noise + stamp) for one tile from accumulated a.

        with_noise is a PYTHON bool: noise generation (Box-Muller PRNG over
        the whole tile) measured 34% of the step when run at every apply, so
        plain applies skip it entirely — injection opportunities come every
        ``noise_every`` batches (ap flag 2 / the theta batch predicate). The
        split-lane stamps make the lagged injection exact: std covers
        clock - stamp whenever noise IS drawn, so the per-row variance
        telescopes to temp*eta*elapsed regardless of injection schedule —
        the same lazy-noise argument as the reference's inject-at-next-touch
        (dpmf.h:61-70); finish_noise absorbs any round-end remainder.

        noise_ring: pl.when branch VALUES execute unconditionally in this
        Mosaic version, so the Box-Muller chain ran at EVERY apply no matter
        the cadence (measured: ne=inf == ne=8 ~= 242M/s vs 321 with noise
        stubbed). The ring replaces in-kernel PRNG+transcendentals with one
        dynamic slice of a per-epoch standard-normal table (regenerated from
        noise_seed each epoch on the XLA side) — the TPU analog of the
        reference's pre-generated noise ring (src/model.cc:229-231), with
        the slice offset mixed per (batch, tile, seed). ``site`` is the
        per-call-site scalar (tile base row) decorrelating same-batch
        applies."""
        k_b = jnp.dot(a, CB, preferred_element_type=jnp.float32)  # counts
        if saturate:
            # Per-(row, slot) window-step saturation (pallas_sgd.sat_scale):
            # the apply window here is the WHOLE batch, and the cell layout
            # concentrates a head row's ratings, so k can reach the hundreds
            # on zipfy marginals — scal*k >> 1 diverges. Scale the
            # accumulated delta by min(1, cap/k), cap = 0.2/scal
            # (hyper_ref[5], host-computed): exact for k <= cap, a bounded
            # averaged step for heads. Decay/noise/stamps stay exact.
            a = a * jnp.minimum(1.0, hyper_ref[5] / jnp.maximum(k_b, 1.0))
        inv_b = jnp.dot(tab * m_inv, IB, preferred_element_type=jnp.float32)
        base = 1.0 - (eta * bound) * inv_b * lamv
        ln = jnp.log(jnp.maximum(jnp.abs(base), 1e-30))
        sign = jnp.where((base < 0) & (jnp.mod(k_b, 2.0) == 1.0), -1.0, 1.0)
        dec = jnp.where(k_b == 0, 1.0, sign * jnp.exp(k_b * ln))
        m_kept = m_fac + m_bias_t
        out = tab * dec + a * m_kept
        if not with_noise:
            return out
        touched = (k_b > 0).astype(jnp.float32)
        lo = jnp.dot(tab * m_gcl, GL, preferred_element_type=jnp.float32)
        hi = jnp.dot(tab * m_gch, GH, preferred_element_type=jnp.float32)
        dlo = end_lo - lo
        dhi = end_hi - hi
        std = jnp.sqrt(
            jnp.maximum(temp * eta * (dhi * LO_BASE + dlo), 0.0)
        ) * touched
        if noise_ring:
            nq = 1 << (((ring_ref.shape[0] - rows) // 8).bit_length() - 1)
            v = i * jnp.int32(40503) + site * jnp.int32(25253) + seed_ref[0]
            q = (v ^ (v >> 7)) & jnp.int32(nq - 1)
            nz = ring_ref[pl.ds(pl.multiple_of(q * 8, 8), rows), :]
        else:
            nz = _normals((rows, LANES))
        noise = std * nz * m_kept
        stamp = touched * (dlo * m_gcl + dhi * m_gch)
        return out + noise + stamp

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

    theta_acc = jnp.zeros((tile_u, LANES), jnp.float32)
    for k in range(8):
        off = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        delta = k % P
        phi = phi_out[pl.ds(off, tile_v), :]
        theta_mx = theta.astype(mxu_dtype)
        phi_mx = phi.astype(mxu_dtype)

        uc = uv3[:, k * P : (k + 1) * P]
        ut = uvt3[k * P : (k + 1) * P, :]
        u_i = uc >> UV_SHIFT
        v_i = uc & (UV_BASE - 1)
        ut_i = ut >> UV_SHIFT
        vt_i = ut & (UV_BASE - 1)

        oh_u = jnp.concatenate(
            [(iota_ru == u_i[:, j : j + 1]).astype(mxu_dtype)
             for j in range(P)],
            axis=1,
        )
        # Striped plans arrange v ids by their OWN slot, so the item
        # one-hots index like the user side (see pallas_sgd_slot).
        oh_v = jnp.concatenate(
            [(iota_rv
              == v_i[:, sv : sv + 1] if striped
              else iota_rv
              == v_i[:, (sv - delta) % P : (sv - delta) % P + 1]
              ).astype(mxu_dtype)
             for sv in range(P)],
            axis=1,
        )
        oht_u = jnp.concatenate(
            [(iota_rut == ut_i[j : j + 1, :]).astype(mxu_dtype)
             for j in range(P)],
            axis=0,
        )
        oht_v = jnp.concatenate(
            [(iota_rvt
              == vt_i[sv : sv + 1, :] if striped
              else iota_rvt
              == vt_i[(sv - delta) % P : (sv - delta) % P + 1, :]
              ).astype(mxu_dtype)
             for sv in range(P)],
            axis=0,
        )

        t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
        p0 = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
        if striped:
            p = roll_segs(p0, to_user_slots=True)
        else:
            p = pltpu.roll(p0, ((P - delta) % P) * m, 1) if delta else p0

        r_b = jnp.dot(
            r3[:, k * P : (k + 1) * P], E, preferred_element_type=jnp.float32
        )
        pm = p * m_pred
        tm = t * m_pred
        S = t * pm
        pred = jnp.dot(S, SS, preferred_element_type=jnp.float32) + gb
        err = scal * (r_b - pred)

        rhs_u = (err * pm + m_cnt).astype(mxu_dtype)
        rhs_v0 = err * tm + m_cnt
        if striped:
            rhs_v = roll_segs(rhs_v0, to_user_slots=False).astype(mxu_dtype)
        else:
            rhs_v = (
                pltpu.roll(rhs_v0, delta * m, 1) if delta else rhs_v0
            ).astype(mxu_dtype)
        theta_acc += jnp.dot(
            oht_u, rhs_u, preferred_element_type=jnp.float32
        )
        d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)

        acc[pl.ds(off, tile_v), :] += d_phi * MC_v

        # ap encodes the deferred-apply schedule: 1 = plain apply (decay +
        # delta), 2 = apply + noise/stamp injection (every noise_every-th
        # batch — see apply_tile).
        av = ap_ref[8 * i + k]

        @pl.when(av == 1)
        def _(off=off, phi=phi):
            a = acc[pl.ds(off, tile_v), :]
            phi_out[pl.ds(off, tile_v), :] = apply_tile(
                phi, a, lam_v, m_bias_v, tile_v, False
            )
            acc[pl.ds(off, tile_v), :] = jnp.zeros_like(a)

        @pl.when(av == 2)
        def _(off=off, phi=phi):
            a = acc[pl.ds(off, tile_v), :]
            phi_out[pl.ds(off, tile_v), :] = apply_tile(
                phi, a, lam_v, m_bias_v, tile_v, True, site=off
            )
            acc[pl.ds(off, tile_v), :] = jnp.zeros_like(a)

    site_u = gu_ref[i] * tile_u + 1
    if noise_every == 1:
        theta_out[:] = apply_tile(
            theta, theta_acc * MC_u, lam_u, m_bias_u, tile_u, True,
            site=site_u,
        )
    else:
        nzb = jnp.mod(i, noise_every) == noise_every - 1

        @pl.when(nzb)
        def _():
            theta_out[:] = apply_tile(
                theta, theta_acc * MC_u, lam_u, m_bias_u, tile_u, True,
                site=site_u,
            )

        @pl.when(jnp.logical_not(nzb))
        def _():
            theta_out[:] = apply_tile(
                theta, theta_acc * MC_u, lam_u, m_bias_u, tile_u, False
            )


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "sub", "dim", "pack", "n_gu", "n_gv", "mxu",
        "interpret", "saturate", "noise_every", "striped", "noise_ring",
    ),
)
def _run_slot_sgld_epoch(
    theta_s, phi_s,
    gu, gv, ap, cum_lo, cum_hi, seed, hyper, lamvec, uv, uvt, r,
    *, tile_u, tile_v, sub, dim, pack, n_gu, n_gv, mxu="bfloat16",
    interpret=False, saturate=False, noise_every=1, striped=False,
    noise_ring=True,
):
    nb = uv.shape[0]
    gv = gv.reshape(-1)
    ap = ap.reshape(-1)
    # gu + 8gv + 8ap + cum_lo + cum_hi int32 per batch vs the ~1 MB SMEM.
    assert nb * 19 * 4 <= 900_000, (
        f"slot SGLD plan metadata ({nb} batches) exceeds SMEM; raise sub or "
        "shard the epoch (--mesh/--stream)"
    )
    if noise_ring:
        # Per-epoch standard-normal ring, VMEM-resident (2 MB at tile
        # 1024): replaces in-kernel Box-Muller (see apply_tile docstring;
        # reference analog src/model.cc:229-231). Fresh table every epoch
        # from noise_seed; in-kernel slice offsets mix (batch, tile, seed).
        n_ring = 4 * max(tile_u, tile_v)
        ring = jax.random.normal(
            jax.random.PRNGKey(seed[0]), (n_ring, LANES), jnp.float32
        )
    else:
        ring = jnp.zeros((8, LANES), jnp.float32)
    kernel = functools.partial(
        _slot_sgld_kernel,
        tile_u=tile_u, tile_v=tile_v, sub=sub, dim=dim, pack=pack,
        mxu_dtype=jnp.dtype(mxu), dma_seed=not interpret, saturate=saturate,
        noise_every=noise_every, striped=striped, noise_ring=noise_ring,
    )
    lanes8 = 8 * pack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,  # gu, gv, ap, cum_lo, cum_hi, seed, hyper
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, lanes8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, lanes8, sub), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, sub, lanes8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((tile_u, LANES), lambda i, gu, *_: (gu[i], 0)),
            pl.BlockSpec((2, LANES), lambda i, *_: (0, 0)),   # lambda vecs
            pl.BlockSpec(                                     # noise ring
                (ring.shape[0], LANES), lambda i, *_: (0, 0)
            ),
            (
                pl.BlockSpec((n_gv * tile_v, LANES), lambda i, *_: (0, 0))
                if interpret
                else pl.BlockSpec(memory_space=pl.ANY)         # phi (HBM)
            ),
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
        # operands incl. 7 scalar-prefetch args: uv=7..., theta=10, ring=12,
        # phi=13
        input_output_aliases={10: 0, 13: 1},
        interpret=pltpu.InterpretParams() if interpret else False,
    )(gu, gv, ap, cum_lo, cum_hi, seed, hyper, uv, uvt, r,
      theta_s, lamvec, ring, phi_s)
    return theta_s, phi_s


def pack_sgld_slot(
    state: DPMFState, plan: SlotPlan,
    map_u: np.ndarray | None = None, map_v: np.ndarray | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Slot-major SGLD tables (see module docstring for the slot layout).
    ``map_u/map_v``: optional balance_dataset relabelings (new-of-old)."""
    P = plan.pack
    m = LANES // P
    params = state.params
    dim = params.theta.shape[1]
    assert dim + 6 <= m

    def pack(fac, bias, gcount, invfreq, tile, total_rows, one_first,
             idmap):
        n = fac.shape[0]
        lo, hi = split_count(np.asarray(gcount[:n]))
        one = jnp.ones((n, 1), jnp.float32)
        b = bias[:, None].astype(jnp.float32)
        head = [fac.astype(jnp.float32), b, one] if not one_first else [
            fac.astype(jnp.float32), one, b
        ]
        fused = jnp.concatenate(
            head + [
                jnp.zeros((n, 1), jnp.float32),      # cnt scratch
                jnp.asarray(lo)[:, None],
                invfreq[:, None].astype(jnp.float32),
                jnp.asarray(hi)[:, None],
            ],
            axis=1,
        )
        fused = jnp.pad(fused, ((0, 0), (0, m - fused.shape[1])))
        ids = np.arange(n) if idmap is None else idmap.astype(np.int64)
        rows = tile // P
        phys = (ids // tile) * tile + (ids % P) * rows + (ids % tile) // P
        slot = ids % P
        out = jnp.zeros((total_rows, P, m), jnp.float32)
        out = out.at[phys, slot].set(fused)
        return out.reshape(total_rows, LANES)

    return (
        pack(params.theta, params.bu, state.gcountu, state.ur,
             plan.tile_u, plan.n_gu * plan.tile_u, False, map_u),
        pack(params.phi, params.bv, state.gcountv, state.vr,
             plan.tile_v, plan.n_gv * plan.tile_v, True, map_v),
    )


def unpack_sgld_slot(
    state: DPMFState, theta_s, phi_s, plan: SlotPlan, n_processed: int,
    map_u: np.ndarray | None = None, map_v: np.ndarray | None = None,
) -> DPMFState:
    P = plan.pack
    m = LANES // P
    nu, dim = state.params.theta.shape
    nv = state.params.phi.shape[0]

    def unpack(tab, n, tile, idmap):
        ids = np.arange(n) if idmap is None else idmap.astype(np.int64)
        rows = tile // P
        phys = (ids // tile) * tile + (ids % P) * rows + (ids % tile) // P
        slot = ids % P
        t3 = jnp.asarray(np.asarray(tab)).reshape(-1, P, m)
        return t3[phys, slot]

    tu = unpack(theta_s, nu, plan.tile_u, map_u)
    pv = unpack(phi_s, nv, plan.tile_v, map_v)
    params = state.params._replace(
        theta=tu[:, :dim], phi=pv[:, :dim],
        bu=tu[:, dim], bv=pv[:, dim + 1],
    )

    def recount(fused):
        from tpu_mf.ops.pallas_sgld import LO_BITS

        lo = fused[:, dim + 3].astype(jnp.int32)
        hi = fused[:, dim + 5].astype(jnp.int32)
        return lo + (hi << LO_BITS)

    gcountu = jnp.concatenate([recount(tu), state.gcountu[nu:]])
    gcountv = jnp.concatenate([recount(pv), state.gcountv[nv:]])
    return state._replace(
        params=params, gcountu=gcountu, gcountv=gcountv,
        gcount=state.gcount + jnp.int32(n_processed),
    )


class SlotSgldRunner:
    """Slot-major fused SGLD rounds over SlotPlans.

    Interface-compatible with pallas_sgld.PallasSgldRunner (pad/set_lambdas/
    epoch/unpack)."""

    def __init__(
        self,
        train_ds,
        sub: int | None = None,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        n_plans: int = 1,
        dim: int | None = None,
        tile: int | None = None,
        balance: bool = False,
        saturate: bool = False,
        noise_every: int = 8,
        striped: bool = False,
        noise_ring: bool = True,
    ):
        # Per-(row, slot) window-step saturation (see _slot_sgld_kernel):
        # bounds head-row steps so the batch-granular apply stays stable at
        # any duplicate count — production always enables it.
        self.saturate = saturate
        # Per-epoch VMEM noise ring vs in-kernel Box-Muller (see
        # _slot_sgld_kernel.apply_tile). False = the PRNG path (on-chip
        # moment tests target it; TPU-only — interpret-mode prng_random_bits
        # returns zeros, while the ring works under interpretation too).
        self.noise_ring = noise_ring
        # Noise-injection cadence in batches (see apply_tile): per-apply
        # Box-Muller over full tiles measured 34% of the step; stamps keep
        # the lagged variance telescoping exact. 1 = reference-granular
        # (inject at every apply), used by the stamp-freshness tests.
        self.noise_every = max(1, int(noise_every))
        self.striped = striped
        assert dim is not None, "pass dim="
        pack = sgld_slot_pack(dim)
        assert pack in (2, 4, 8), (
            f"slot SGLD needs dim <= 58 (got {dim}); use PallasSgldRunner"
        )
        self.pack = pack
        tile = tile or 128 * pack
        self.tile_u = self.tile_v = tile
        self._map_u = self._map_v = None
        if balance:
            from tpu_mf.ops.pallas_sgd_slot import balance_dataset

            # Cross-tile serpentine + slot LPT relabeling: recovers plan
            # fill on zipfy marginals (see pallas_sgd_slot._balance_map*).
            train_ds, self._map_u, self._map_v = balance_dataset(
                train_ds, tile, tile, pack, cross_tile=True
            )
        if sub is None:
            from tpu_mf.ops.pallas_sgd_slot import (
                _slot_bucket_counts,
                pick_sub,
                pick_sub_stripe,
            )

            bc = _slot_bucket_counts(train_ds, tile, tile, pack)
            if striped:
                # Striped columns: the stripe cost model already rewards
                # tall columns (flat matmul share); no extra scaling.
                sub = pick_sub_stripe(bc, pack, cdiv(train_ds.nv, tile))
            else:
                # SGLD's per-tile apply (stamps + per-lane decay, noise
                # every noise_every batches) is heavier than SGD's, so
                # taller columns amortize better — but less so since the
                # paired-Box-Muller + cadence cut: calibrated ML-10M rank 8
                # @ ne=8 measured sub 256 -> 219M/s, 288 -> 247, 320 ->
                # **257**, 352 -> 247, 384 -> 238 (old cos-only per-apply
                # noise: 384 -> 213). Scale the SGD-tuned pick by 1.25
                # (rounded to 8).
                base = pick_sub(bc, pack)
                sub = max(8, int(base * 1.25) // 8 * 8)
        self.sub = sub
        if striped:
            assert sub % pack == 0, (sub, pack)
        from tpu_mf.ops.pallas_sgd_slot import prepare_cells_stripe

        builder = prepare_cells_stripe if striped else prepare_cells_slot
        self.plans = [
            builder(train_ds, tile, tile, sub, seed + 7919 * p, pack)
            for p in range(max(1, n_plans))
        ]
        self.plan = self.plans[0]
        self.nb = max(p.u.shape[0] for p in self.plans)
        self.seed_stride = self.nb + 1
        self.mxu, self.interpret = mxu, interpret
        self.n_real = len(train_ds)
        # Whole-batch duplicate maximum (the apply window here is the full
        # batch): g=1 in _dup_stats spans all 8 columns. Drives envelope_ok.
        from tpu_mf.ops.pallas_sgd import _dup_stats
        from tpu_mf.ops.pallas_sgd_slot import slot_col_ids

        self.batch_dup_max = max(
            max(
                _dup_stats(slot_col_ids(p.u, pack), self.tile_u)[1],
                _dup_stats(slot_col_ids(p.v, pack), self.tile_v)[1],
            )
            for p in self.plans
        )
        self.devs = []
        self.cum_bases = []
        self.flags = []
        rows_u = tile // pack
        for plan in self.plans:
            uv = plan.u * UV_BASE + plan.v
            self.devs.append((
                jnp.asarray(plan.gu),
                jnp.asarray(plan.gv),
                jnp.asarray(uv),
                jnp.asarray(np.swapaxes(uv, 1, 2).copy()),
                jnp.asarray(plan.r),
            ))
            # Deferred apply at each tile's LAST touching column (always on
            # for SGLD: groups=1 over the whole batch). Flag 2 marks noise-
            # injection applies (every noise_every-th batch).
            fl = np.asarray(_apply_flags(plan.gv, 1)).astype(np.int32)
            nz = (np.arange(fl.shape[0]) % self.noise_every
                  == self.noise_every - 1)
            self.flags.append(jnp.asarray(fl + fl * nz[:, None]))
            # Batch-START clock: real slots per batch, exclusive cumsum.
            real = (plan.u != rows_u).reshape(plan.u.shape[0], -1).sum(1)
            self.cum_bases.append(
                np.concatenate([[0], np.cumsum(real)[:-1]]).astype(np.int64)
            )

    def envelope_ok(self, scal: float) -> bool:
        """True while the batch-granular apply stays in the staleness
        envelope: a row hit k times in one batch takes k stale gradients of
        scale ~scal each (scal = eta*ntrain*bound*lambda_r — GROWS with the
        Gibbs lambda_r, so callers re-check every round). With saturation on
        the kernel caps each row's window delta at 0.2/scal itself, so the
        envelope holds for any duplicate count."""
        if self.saturate:
            return True
        return scal * self.batch_dup_max <= 0.2

    def pad(self, state: DPMFState):
        self.dim = state.params.theta.shape[1]
        self.set_lambdas(state)
        return pack_sgld_slot(state, self.plan, self._map_u, self._map_v)

    def set_lambdas(self, state: DPMFState) -> None:
        """Slot-replicated lambda lane vectors (rebuilt after Gibbs)."""
        dim = state.params.theta.shape[1]
        P = self.pack
        m = LANES // P
        lu = np.zeros(m, np.float32)
        lu[:dim] = np.asarray(state.lambda_u)
        lu[dim] = float(state.lambda_ub)
        lv = np.zeros(m, np.float32)
        lv[:dim] = np.asarray(state.lambda_v)
        lv[dim + 1] = float(state.lambda_vb)
        self.lamvec = jnp.asarray(
            np.stack([np.tile(lu, P), np.tile(lv, P)])
        )

    def epoch(self, tables, state_gcount: int, hyper, noise_seed: int,
              epoch_idx: int = 0):
        """hyper = (eta, temp, bound, scal, gb) floats."""
        plan_i = epoch_idx % len(self.plans)
        plan = self.plans[plan_i]
        gu, gv, uv, uvt, r = self.devs[plan_i]
        lo, hi = split_count(self.cum_bases[plan_i] + np.int64(state_gcount))
        # hyper[5] = saturation cap 0.2/scal (unused when saturate is off).
        cap = max(1.0, 0.2 / max(float(hyper[3]), 1e-12))
        return _run_slot_sgld_epoch(
            tables[0], tables[1],
            gu, gv, self.flags[plan_i],
            jnp.asarray(lo.astype(np.int32)),
            jnp.asarray(hi.astype(np.int32)),
            jnp.asarray([noise_seed], jnp.int32),
            jnp.asarray(list(hyper) + [cap], jnp.float32),
            self.lamvec, uv, uvt, r,
            tile_u=self.tile_u, tile_v=self.tile_v, sub=self.sub,
            dim=self.dim, pack=self.pack,
            n_gu=plan.n_gu, n_gv=plan.n_gv,
            mxu=self.mxu, interpret=self.interpret, saturate=self.saturate,
            noise_every=self.noise_every, striped=self.striped,
            noise_ring=self.noise_ring,
        )

    def unpack(self, state: DPMFState, tables) -> DPMFState:
        return unpack_sgld_slot(
            state, tables[0], tables[1], self.plan, self.n_real,
            self._map_u, self._map_v,
        )


def sgld_slot_eligible(state: DPMFState, ntrain: int) -> bool:
    from tpu_mf.ops.pallas_sgld import MAX_EXACT_COUNT

    dim = state.params.theta.shape[1]
    pack = sgld_slot_pack(dim)
    if pack < 2:
        return False
    nv = state.params.phi.shape[0]
    tile = 128 * pack
    vmem_phi = cdiv(nv, tile) * tile * LANES * 4
    return 2 * vmem_phi <= 64 * 1024 * 1024 and ntrain < MAX_EXACT_COUNT
