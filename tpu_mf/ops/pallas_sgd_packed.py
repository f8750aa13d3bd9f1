"""Lane-packed fused Pallas SGD epoch kernel for small ranks (dim <= 62).

The base fused kernel (ops/pallas_sgd.py) gives every table row a full
128-lane register row, so at small rank almost all of the per-rating cost —
one-hot construction, gather/scatter matmul MACs, and table decay traffic —
is spent on empty lanes. Here a fused row [d factors | bias | count | pad]
occupies a SLOT of m = 128/P lanes and P rows pack into one physical row:

* one-hot compares shrink from S x TILE to S x TILE/P,
* gather/scatter matmuls contract over TILE/P instead of TILE,
* tables (and their decay/update element ops) are TILE/P x 128.

The packing factor: P=8 for dim <= 14, P=4 for dim <= 30, P=2 for dim <= 62
(beyond that the base kernel applies, reference default dim=128 included —
reference cost model: src/mf.h:94-109, ~10*dim flops + 4 row accesses per
rating on CPU).

Slot alignment: a rating (u, v) gathers the user's packed row (u's data in
slot su = u mod P) and the item's packed row (slot sv = v mod P). The host
plan buckets ratings by (user tile, item tile, delta = (sv - su) mod P) and
assigns each bucket's sub-batches ONLY to lane columns k with k mod P ==
delta, so the alignment roll is a compile-time constant per column — zero
runtime branching (a circular roll by delta*m maps slot j -> j-delta mod P
consistently for every rating in the column; measured: a lax.switch over P
rolls costs ~18% of the whole step, the static roll is free).

Everything else — resident item table, out-ref user-tile state, 8 sequential
item sub-batches with grouped user application, geometric per-occurrence
decay via count lanes — matches ops/pallas_sgd.py; the per-(row, slot) decay
counts are broadcast to their slot's lanes with one small f32 matmul against
a static count-broadcast one-hot (CB) instead of a row-sum.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

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


def packing_factor(dim: int) -> int:
    """Rows per 128-lane register row: slot = [dim factors | bias | count]."""
    if dim + 2 <= 16:
        return 8
    if dim + 2 <= 32:
        return 4
    if dim + 2 <= 64:
        return 2
    return 1


class PackedPlan(NamedTuple):
    """Epoch layout for the packed kernel; superset of CellPlan's fields so
    plan statistics helpers (e.g. _user_dup_stats) apply unchanged."""

    u: np.ndarray    # (NB, B/8, 8) int32 tile-local user ids; TILE_U = pad
    v: np.ndarray    # (NB, B/8, 8) int32 tile-local item ids; TILE_V = pad
    r: np.ndarray    # (NB, B/8, 8) float32
    w: np.ndarray    # (NB, B/8, 8) float32 {0,1}
    gu: np.ndarray   # (NB,) int32 user-tile index per batch
    gv: np.ndarray   # (NB, 8) int32 item-tile index per sub-batch column
    gd: np.ndarray   # (NB, 8) int32 slot delta per column; ALWAYS col % P
                     # (columns are delta-classed so the kernel's roll is
                     # static; kept for validation/debug)
    tile_u: int
    tile_v: int
    n_gu: int
    n_gv: int
    n_real: int
    pack: int        # P


def prepare_cells_packed(
    ds: RatingsCOO,
    tile_u: int,
    tile_v: int,
    batch_size: int,
    seed: int,
    pack: int,
) -> PackedPlan:
    """Disk-cached plan build (ops/plan_cache.py)."""
    from tpu_mf.ops.plan_cache import cached_build

    return cached_build(
        "packed", PackedPlan, ds, seed, (tile_u, tile_v, batch_size, pack),
        lambda: _prepare_cells_packed_impl(
            ds, tile_u, tile_v, batch_size, seed, pack
        ),
    )


def _prepare_cells_packed_impl(
    ds: RatingsCOO,
    tile_u: int,
    tile_v: int,
    batch_size: int,
    seed: int,
    pack: int,
) -> PackedPlan:
    """Bin shuffled ratings into (user-tile, item-tile, delta) buckets, pad
    each bucket to whole sub-batches of B/8, pack 8 sub-batches per batch
    within each user-tile group, and order batches by gu."""
    P = pack
    assert batch_size % 8 == 0 and tile_u % P == 0 and tile_v % P == 0
    sub = batch_size // 8
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ds))
    u, v, r = ds.u[perm], ds.v[perm], ds.r[perm]

    gu = u // tile_u
    gv = v // tile_v
    gd = (v - u) % P  # == (v%P - u%P) % P since tiles are P-aligned
    # bucket key ordered (gu, delta, gv) so one cursor walks a delta class
    cell = ((gu * P + gd) * n_gv + gv).astype(np.int64)
    order = np.argsort(cell, kind="stable")
    u, v, r, cell = u[order], v[order], r[order], cell[order]
    counts = np.bincount(cell, minlength=n_gu * n_gv * P)
    sb_per_cell = np.ceil(counts / sub).astype(np.int64)
    # Column k takes delta class k % P only (static kernel rolls), so a
    # group's batch count is driven by its LARGEST delta class.
    cpc = 8 // P  # columns per delta class
    sb_per_class = sb_per_cell.reshape(n_gu, P, n_gv).sum(2)
    nb_per_group = np.maximum(
        1, np.ceil(sb_per_class / cpc).max(1)
    ).astype(np.int64)
    nb_total = int(nb_per_group.sum())

    U = np.full((nb_total, sub, 8), tile_u, np.int32)  # sentinel = padded
    V = np.full((nb_total, sub, 8), tile_v, np.int32)
    R = np.zeros((nb_total, sub, 8), np.float32)
    W = np.zeros((nb_total, sub, 8), np.float32)
    GU = np.zeros(nb_total, np.int32)
    GV = np.zeros((nb_total, 8), np.int32)
    GD = np.broadcast_to(np.arange(8, dtype=np.int32) % P, (nb_total, 8)).copy()

    # Fully vectorized destination computation (see prepare_cells): each
    # rating's (batch, row, column) slot follows from cumsum arithmetic over
    # the (group, delta-class, item-tile) bucket sizes; one flat scatter
    # fills the plan.
    src = np.concatenate([[0], np.cumsum(counts)])
    sb_cs = np.concatenate([[0], np.cumsum(sb_per_cell)])
    base = np.concatenate([[0], np.cumsum(nb_per_group)])
    GU[:] = np.repeat(
        np.arange(n_gu, dtype=np.int32), nb_per_group.astype(np.int64)
    )

    l = np.arange(len(u), dtype=np.int64) - src[cell]   # index within bucket
    cls = cell // n_gv                                   # (group, delta) class
    g = cls // P
    d = (cls % P).astype(np.int64)
    sbc = (sb_cs[cell] - sb_cs[cls * n_gv]) + l // sub   # sb within class
    b = base[g] + sbc // cpc
    col = d + (sbc % cpc) * P
    pos = l % sub
    flat = (b * sub + pos) * 8 + col
    U.reshape(-1)[flat] = (u % tile_u).astype(np.int32)
    V.reshape(-1)[flat] = (v % tile_v).astype(np.int32)
    R.reshape(-1)[flat] = r
    W.reshape(-1)[flat] = 1.0
    GV.reshape(-1)[b * 8 + col] = (cell % n_gv).astype(np.int32)
    return PackedPlan(
        u=U, v=V, r=R, w=W, gu=GU, gv=GV, gd=GD,
        tile_u=tile_u, tile_v=tile_v, n_gu=n_gu, n_gv=n_gv,
        n_real=len(ds), pack=P,
    )


def pack_params(params: MFParams, plan: PackedPlan) -> Tuple[jax.Array, jax.Array]:
    """Packed fused-layout tables: P rows of [factors | bias | cnt | pad] per
    128-lane physical row; physical row k holds table rows k*P .. k*P+P-1."""
    P = plan.pack
    m = LANES // P
    dim = params.theta.shape[1]
    assert dim + 2 <= m
    pu = plan.n_gu * plan.tile_u
    pv = plan.n_gv * plan.tile_v

    def fuse(fac, bias, rows):
        ext = jnp.concatenate([fac, bias[:, None]], axis=1)
        ext = jnp.pad(
            ext, ((0, rows - ext.shape[0]), (0, m - ext.shape[1]))
        ).astype(jnp.float32)
        return ext.reshape(rows // P, LANES)

    return (
        fuse(params.theta, params.bu, pu),
        fuse(params.phi, params.bv, pv),
    )


def unpack_params(
    theta_p: jax.Array, phi_p: jax.Array, nu: int, nv: int, dim: int, gb, pack: int
) -> MFParams:
    m = LANES // pack
    te = theta_p.reshape(-1, m)
    pe = phi_p.reshape(-1, m)
    return MFParams(
        theta=te[:nu, :dim],
        phi=pe[:nv, :dim],
        bu=te[:nu, dim],
        bv=pe[:nv, dim],
        gb=jnp.asarray(gb, jnp.float32),
    )


def _packed_epoch_kernel(
    # scalar prefetch
    gu_ref, gv_ref, ap_ref, hyper_ref,
    # blocked inputs (uv = u*2048+v packed ids; uvt = host-transposed copy)
    uv_ref, uvt_ref, r_ref, theta_ref,
    # HBM-resident input (aliased with the resident output)
    phi_hbm,
    # outputs
    theta_out, phi_out,
    # scratch
    acc, sem,
    *, tile_u: int, tile_v: int, batch: int, dim: int, pack: int,
    mxu_dtype, theta_groups: int = 8, phi_groups: int = 8,
    saturate: bool = False,
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
        """Per-row window-step saturation (see pallas_sgd.sat_scale): the
        accumulated window delta is capped at cap*eta*grad per (row, slot)
        via the count lanes already computed for the geometric decay."""
        if not saturate:
            return d
        return d * jnp.minimum(1.0, cap / jnp.maximum(k, 1.0))

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

    sub = batch // 8
    # Packed ids: u in bits 11+, v in bits 0-10 (tiles <= 1024 < 2048, the
    # sentinel included). One int32 stream instead of four id streams and a
    # weight stream: the (sub, 8)-minor blocks DMA strided (8 -> 128 lane
    # padding), so stream COUNT dominates the per-step floor (measured
    # ~0.5us/stream at B=4096).
    uv3 = uv_ref[0]   # (sub, 8)
    uvt3 = uvt_ref[0]  # (8, sub)
    u3 = uv3 >> UV_SHIFT
    v3 = uv3 & (UV_BASE - 1)
    ut3 = uvt3 >> UV_SHIFT
    vt3 = uvt3 & (UV_BASE - 1)
    r3 = r_ref[0]
    w3 = (uv3 != tile_u * UV_BASE + tile_v).astype(jnp.float32)
    theta = theta_out[:]  # (rows_u, 128) fp32 state

    # Slot-role lane masks, identical across the P slots.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    slot_lane = lane >> (m.bit_length() - 1)        # lane // m
    inslot = lane - slot_lane * m
    m_fac = (inslot < dim).astype(jnp.float32)
    m_bias = (inslot == dim).astype(jnp.float32)
    m_cnt = (inslot == dim + 1).astype(jnp.float32)
    m_keep = m_fac + m_bias

    # Count-broadcast one-hot: (d @ CB)[:, l] == d[:, slot(l)*m + dim + 1],
    # i.e. every lane of a slot sees that slot's touch count (f32-exact).
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    CB = (c_iota == slot_lane * m + (dim + 1)).astype(jnp.float32)

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_u), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_v), 1)
    iota_ut = jax.lax.broadcasted_iota(jnp.int32, (rows_u, sub), 0)
    iota_vt = jax.lax.broadcasted_iota(jnp.int32, (rows_v, sub), 0)
    lameta = 1.0 - eta * lam
    ln_lameta = jnp.log(lameta)

    tg_w = 8 // theta_groups  # columns per user-side group
    pg_w = 8 // phi_groups    # columns per item-side (deferred-apply) group
    theta_mx = None
    d_theta_g = None
    pending = []  # deferred (k, off, phi, d_phi) awaiting group flush
    for k in range(8):
        if k % tg_w == 0:
            # user-side group start: refresh the gather view, reset deltas
            theta_mx = theta.astype(mxu_dtype)
            d_theta_g = jnp.zeros((rows_u, LANES), jnp.float32)

        off = pl.multiple_of(gv_ref[8 * i + k] * rows_v, rows_v)
        # Column k carries delta class k % P by plan construction, so the
        # alignment rolls below are compile-time static.
        delta = k % P
        phi = phi_out[pl.ds(off, rows_v), :]
        phi_mx = phi.astype(mxu_dtype)
        uk = u3[:, k : k + 1]
        # One-hots over PACKED rows (id >> lgP); padded slots carry the
        # tile_u/tile_v sentinel whose packed row is out of iota range.
        oh_u = (iota_u == (uk >> lgP)).astype(mxu_dtype)
        oh_v = (iota_v == (v3[:, k : k + 1] >> lgP)).astype(mxu_dtype)
        oht_u = (iota_ut == (ut3[k : k + 1, :] >> lgP)).astype(mxu_dtype)
        oht_v = (iota_vt == (vt3[k : k + 1, :] >> lgP)).astype(mxu_dtype)

        t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
        p0 = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
        # align item slot sv onto user slot su: roll by -delta*m lanes
        p = pltpu.roll(p0, ((P - delta) % P) * m, 1) if delta else p0

        # Select the user's slot; other slots hold other rows' data.
        msk = (slot_lane == (uk & (P - 1))).astype(jnp.float32)
        q = (p * m_fac + m_bias) * msk
        pred = (
            jnp.sum(t * q + p * (m_bias * msk), axis=1, keepdims=True) + gb
        )
        wk = w3[:, k : k + 1]
        err = (eta * wk) * (r3[:, k : k + 1] - pred)

        cnt = wk * (m_cnt * msk)
        rhs_u = (err * q + cnt).astype(mxu_dtype)
        rhs_v0 = err * ((t * m_fac + m_bias) * msk) + cnt
        rhs_v = (
            pltpu.roll(rhs_v0, delta * m, 1) if delta else rhs_v0
        ).astype(mxu_dtype)
        d_theta_g += jnp.dot(oht_u, rhs_u, preferred_element_type=jnp.float32)
        d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)

        if phi_groups == 8:
            # Fully sequential item side: apply NOW so the next column sees
            # this one's updates. Geometric per-occurrence decay per
            # (row, slot); counts broadcast to their slot's lanes via CB
            # (ops/common.py semantics).
            k_v = jnp.dot(d_phi, CB, preferred_element_type=jnp.float32)
            phi_out[pl.ds(off, rows_v), :] = (
                phi * jnp.exp(k_v * ln_lameta) + sat(d_phi, k_v) * m_keep
            )
        else:
            # Deferred item apply: all columns of a phi group gather from
            # STABLE phi state and their heavy work (one-hots, matmuls,
            # elementwise) is fully independent — the serializing accesses
            # (scratch accumulate, decay+apply at each tile's LAST touching
            # column, flagged host-side) are hoisted into a short flush loop
            # at the group boundary. The runner picks phi_groups from the
            # plan's item-duplicate statistics so accumulated staleness stays
            # within the same envelope the user side already uses.
            pending.append((k, off, phi, d_phi))
            if k % pg_w == pg_w - 1:
                for kk, off_, phi_, dphi_ in pending:
                    acc[pl.ds(off_, rows_v), :] += dphi_

                    @pl.when(ap_ref[8 * i + kk] == 1)
                    def _(off_=off_, phi_=phi_):
                        a = acc[pl.ds(off_, rows_v), :]
                        k_v = jnp.dot(
                            a, CB, preferred_element_type=jnp.float32
                        )
                        phi_out[pl.ds(off_, rows_v), :] = (
                            phi_ * jnp.exp(k_v * ln_lameta)
                            + sat(a, k_v) * m_keep
                        )
                        acc[pl.ds(off_, rows_v), :] = jnp.zeros_like(a)

                pending = []

        if k % tg_w == tg_w - 1:
            k_u = jnp.dot(d_theta_g, CB, preferred_element_type=jnp.float32)
            theta = (theta * jnp.exp(k_u * ln_lameta)
                     + sat(d_theta_g, k_u) * m_keep)

    theta_out[:] = theta


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "batch", "dim", "pack", "n_gu", "n_gv", "mxu",
        "interpret", "theta_groups", "phi_groups", "saturate",
    ),
)
def _run_packed_epoch(
    theta_p, phi_p,
    gu, gv, ap, uv, uvt, r, hyper,
    *, tile_u, tile_v, batch, dim, pack, n_gu, n_gv, mxu="bfloat16",
    interpret=False, theta_groups=8, phi_groups=8, saturate=False,
):
    assert theta_groups in (1, 2, 4, 8), theta_groups
    assert phi_groups in (1, 2, 4, 8), phi_groups
    nb = uv.shape[0]
    check_smem_plan(nb)
    gv = gv.reshape(-1)
    ap = ap.reshape(-1)
    rows_u = tile_u // pack
    rows_v = tile_v // pack
    kernel = functools.partial(
        _packed_epoch_kernel,
        tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim, pack=pack,
        mxu_dtype=jnp.dtype(mxu), theta_groups=theta_groups,
        saturate=saturate,
        phi_groups=phi_groups,
    )
    sub = batch // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # gu, gv, ap, hyper
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, 8), lambda i, gu, gv, ap, h: (i, 0, 0)),  # uv
            pl.BlockSpec((1, 8, sub), lambda i, gu, gv, ap, h: (i, 0, 0)),  # uvt
            pl.BlockSpec((1, sub, 8), lambda i, gu, gv, ap, h: (i, 0, 0)),  # r
            pl.BlockSpec(
                (rows_u, LANES), lambda i, gu, gv, ap, h: (gu[i], 0)
            ),                                                              # theta
            pl.BlockSpec(memory_space=pl.ANY),                              # phi
        ],
        out_specs=[
            pl.BlockSpec((rows_u, LANES), lambda i, gu, gv, ap, h: (gu[i], 0)),
            pl.BlockSpec(
                (n_gv * rows_v, LANES), lambda i, gu, gv, ap, h: (0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_gv * rows_v, LANES), jnp.float32),  # acc
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
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(gu, gv, ap, hyper, uv, uvt, r, theta_p, phi_p)
    return theta_p, phi_p


class PackedEpochRunner:
    """Holds PackedPlans on device and runs packed fused epochs over them.

    Drop-in counterpart of pallas_sgd.PallasEpochRunner for dim <= 62; tiles
    default larger than the base kernel's because packed rows shrink both the
    VMEM footprint and the matmul contraction (tile/P >= 128 keeps the MXU's
    contraction dimension full).
    """

    def __init__(
        self,
        ds: RatingsCOO,
        tile_u: int | None = None,
        tile_v: int | None = None,
        batch: int = 4096,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        theta_groups=None,
        phi_groups=None,
        n_plans: int = 1,
        dim: int | None = None,
        pack: int | None = None,
        saturate: bool = False,
    ):
        # Per-row window-step saturation (pallas_sgd.sat_scale semantics).
        self.saturate = saturate
        if pack is None:
            assert dim is not None, "pass dim= or pack="
            pack = packing_factor(dim)
        assert pack in (2, 4, 8), (
            f"packed kernel needs pack in 2/4/8 (dim <= 62), got {pack}"
        )
        self.pack = pack
        tile_u = tile_u or 128 * pack
        tile_v = tile_v or 128 * pack
        assert max(tile_u, tile_v) < UV_BASE, (
            f"packed ids need tiles < {UV_BASE}, got {tile_u}/{tile_v}"
        )
        batch = cdiv(batch, 8) * 8
        self.plans = [
            prepare_cells_packed(ds, tile_u, tile_v, batch, seed + 7919 * p, pack)
            for p in range(max(1, n_plans))
        ]
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
        self.flags = []  # per plan: {phi_groups: (NB, 8) apply flags}
        for plan in self.plans:
            uv = plan.u * UV_BASE + plan.v  # one id stream (see kernel doc)
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
            warn_window_envelope("packed", "theta", eta, self._dup_max[8],
                             self._warned)
        return 8

    def pick_phi_groups(self, eta: float) -> int:
        """Most parallel item-side grouping whose staleness stays safe.

        Same envelope as the user side: an item row hit k times inside one
        deferred-apply window accumulates k stale gradients ~ k*eta*|t|^2;
        require eta * max_dups(window) <= 0.2. Items carry the popularity
        skew, so this usually picks sequential (8) at warm-start etas and
        relaxes as eta decays — and is fully parallel for SGLD/AdaptReg-scale
        etas.
        """
        if self.phi_groups is not None:
            return self.phi_groups
        for g in (1, 2, 4, 8):
            if eta * self._vdup_max[g] <= 0.2:
                return g
        if not getattr(self, 'saturate', False):
            warn_window_envelope("packed", "phi", eta, self._vdup_max[8],
                             self._warned)
        return 8

    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0):
        cap = max(1.0, 0.2 / max(eta, 1e-9))
        hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
        plan_i = epoch_idx % len(self.plans)
        pg = self.pick_phi_groups(eta)
        gu, gv, uv, uvt, r = self.devs[plan_i]
        return _run_packed_epoch(
            tables[0], tables[1], gu, gv, self.flags[plan_i][pg],
            uv, uvt, r, hyper,
            tile_u=self.tile_u, tile_v=self.tile_v, batch=self.batch,
            dim=self.dim, pack=self.pack,
            n_gu=self.plan.n_gu, n_gv=self.plan.n_gv,
            mxu=self.mxu, interpret=self.interpret,
            theta_groups=self.pick_theta_groups(eta),
            phi_groups=pg,
            saturate=self.saturate,
        )

    def pad(self, params: MFParams):
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        return pack_params(params, self.plan)

    def trim(self, tables, dim: int | None = None) -> MFParams:
        return unpack_params(
            tables[0], tables[1], self.nu, self.nv, dim or self.dim,
            self.gb, self.pack,
        )


def packed_eligible(params: MFParams, batch_size: int) -> bool:
    """Packed kernel needs dim <= 62 and the packed item table (plus its
    same-sized deferred-apply scratch) resident in VMEM."""
    dim = params.theta.shape[1]
    pack = packing_factor(dim)
    if pack < 2:
        return False
    nv = params.phi.shape[0]
    tile_v = 128 * pack
    vmem_phi = cdiv(nv, tile_v) * tile_v // pack * LANES * 4
    return 2 * vmem_phi <= 64 * 1024 * 1024
