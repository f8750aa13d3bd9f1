"""Free-column fused SGD epochs: BOTH tables VMEM-resident, per-column tiles.

The gen-1 kernel (ops/pallas_sgd.py) streams theta through a blocked ref, so
all 8 lane columns of a batch must share one user tile and the one-hot
gather/scatter matmuls pay width tile_u + tile_v per rating — and with
MXU-side pred the rank-64 step is MATMUL-bound (PERF_NOTES round-3 late:
cost ~ tile width; t256 at the roofline for its geometry). Tiles could not
shrink further because per-(user-tile x item-tile) cells fragment: at t128
the gen-1 fill collapsed to 0.20 (sub was pinned large by the batch
structure).

This kernel removes the coupling (the round-3 "free-column" roadmap item):

* BOTH tables are VMEM-resident for the whole epoch (the item table already
  was; the user table joins it — DMA'd in at step 0, aliased out). Eligible
  when the resident tables + deferred-apply scratch fit VMEM, i.e. the
  ML-10M-class single-chip shapes the headline bench runs; larger user axes
  keep the gen-1/slot kernels (Netflix) or the item-sharded runner (Yahoo).
* Every lane column carries its OWN (user-tile, item-tile) pair via
  scalar-prefetched per-column offsets and dynamic-slice views of the
  resident tables — the mechanism the gen-1 kernel already used for its
  phi side, now symmetric. Cells pad to ONE sub-block granularity and
  batches assemble from any 8 sub-blocks, so fill stays at the per-cell
  ceil-to-sub level at ANY tile size.
* With free columns the tiles shrink to the 128-lane floor (t128/t128):
  the per-rating matmul work drops ~2x vs the gen-1 production geometry
  (2*(tu+tv)*lanes MACs gather+scatter), which is exactly the term the
  rank-64 roofline is bound by.
* Each side applies its column delta either immediately (sequential
  semantics per column) or deferred into a same-size VMEM scratch with
  host-computed last-touch flags (the gen-1 phi mechanism, both sides) —
  chosen per epoch by the staleness envelope, with per-row window-step
  saturation as the unconditional safety net.

Semantics: identical update math to ops/sgd.py / the sequential reference
loop (reference src/mf.h:94-109) — geometric per-occurrence decay, fused
homogeneous rows, one-hot MXU gather/scatter; parity is gated by
tests/test_pallas_free.py in interpret mode.
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
    UV_BASE,
    _apply_flags,
    _dup_stats,
    balance_cells,
    cdiv,
    decode_planes,
    pad_params,
    row_lanes,
    split_params,
    stream_planes,
    warn_window_envelope,
)


class FreePlan(NamedTuple):
    """Epoch layout for the free-column kernel: every lane column carries
    its own (user-tile, item-tile) pair; cells pad to sub granularity."""

    u: np.ndarray    # (NB, B/8, 8) int32 tile-local user ids; TILE_U = pad
    v: np.ndarray    # (NB, B/8, 8) int32 tile-local item ids; TILE_V = pad
    r: np.ndarray    # (NB, B/8, 8) float32
    w: np.ndarray    # (NB, B/8, 8) float32 {0,1}
    gu: np.ndarray   # (NB, 8) int32 user-tile index per column
    gv: np.ndarray   # (NB, 8) int32 item-tile index per column
    tile_u: int
    tile_v: int
    n_gu: int
    n_gv: int
    n_real: int


def prepare_cells_free(
    ds: RatingsCOO,
    tile_u: int = 128,
    tile_v: int = 128,
    batch_size: int = 2048,
    seed: int = 0,
) -> FreePlan:
    from tpu_mf.ops.plan_cache import cached_build

    return cached_build(
        "freecell", FreePlan, ds, seed, (tile_u, tile_v, batch_size),
        lambda: _prepare_cells_free_impl(ds, tile_u, tile_v, batch_size,
                                         seed),
    )


def _prepare_cells_free_impl(
    ds: RatingsCOO, tile_u: int, tile_v: int, batch_size: int, seed: int
) -> FreePlan:
    """Vectorized free-column plan: bin shuffled ratings into (user-tile,
    item-tile) cells, pad each cell to whole sub-blocks (B/8), and deal the
    global sub-block list into (batch, column) slots in order. No grouping
    constraint: per-column gu AND gv."""
    assert batch_size % 8 == 0
    sub = batch_size // 8
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ds))
    u, v, r = ds.u[perm], ds.v[perm], ds.r[perm]

    gu = u // tile_u
    gv = v // tile_v
    cell = (gu * n_gv + gv).astype(np.int64)
    order = np.argsort(cell, kind="stable")
    u, v, r, cell = u[order], v[order], r[order], cell[order]
    counts = np.bincount(cell, minlength=n_gu * n_gv)
    sb_per_cell = np.ceil(counts / sub).astype(np.int64)
    sb_total = int(sb_per_cell.sum())
    nb = max(1, cdiv(sb_total, 8))

    U = np.full((nb, sub, 8), tile_u, np.int32)  # sentinel = padded
    V = np.full((nb, sub, 8), tile_v, np.int32)
    R = np.zeros((nb, sub, 8), np.float32)
    W = np.zeros((nb, sub, 8), np.float32)
    GU = np.zeros((nb, 8), np.int32)
    GV = np.zeros((nb, 8), np.int32)

    src = np.concatenate([[0], np.cumsum(counts)])        # per-cell start
    sb_cs = np.concatenate([[0], np.cumsum(sb_per_cell)])  # per-cell sb base

    # per-sub-block cell index (which cell each global sub-block serves)
    sb_cell = np.repeat(
        np.arange(n_gu * n_gv, dtype=np.int64), sb_per_cell
    )
    GU.reshape(-1)[: sb_total] = (sb_cell // n_gv).astype(np.int32)
    GV.reshape(-1)[: sb_total] = (sb_cell % n_gv).astype(np.int32)

    # destination of each (sorted) rating
    l = np.arange(len(u), dtype=np.int64) - src[cell]      # index in cell
    sb = sb_cs[cell] + l // sub                            # global sub-block
    b = sb // 8
    col = sb % 8
    pos = l % sub
    flat = (b * sub + pos) * 8 + col
    U.reshape(-1)[flat] = (u % tile_u).astype(np.int32)
    V.reshape(-1)[flat] = (v % tile_v).astype(np.int32)
    R.reshape(-1)[flat] = r
    W.reshape(-1)[flat] = 1.0
    return FreePlan(
        u=U, v=V, r=R, w=W, gu=GU, gv=GV,
        tile_u=tile_u, tile_v=tile_v, n_gu=n_gu, n_gv=n_gv, n_real=len(ds),
    )


def pick_free_geometry(
    ds: RatingsCOO, tile_u: int = 128, tile_v: int = 128
) -> Tuple[int, int, int]:
    """(tile_u, tile_v, batch) for the free-column plan.

    Tiles sit at the 128-lane floor (a narrower one-hot pads back to 128
    lanes); sub balances per-cell ceil-to-sub fill (cells concentrate at
    c = n/(n_gu*n_gv) under balance_cells) against the per-column fixed
    cost, scored as fill/(1 + 94/sub) like pick_cell_geometry."""
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    c = len(ds) / (n_gu * n_gv)
    best, best_score = 256, -1.0
    for sub in (128, 256, 384, 512, 640, 768, 896, 1024):
        blocks = max(1, cdiv(int(c * 1.12), sub))
        fill = c / (blocks * sub)
        score = fill / (1.0 + 94.0 / sub)
        if score > best_score:
            best_score, best = score, sub
    return tile_u, tile_v, 8 * best


def _free_kernel(
    # scalar prefetch
    gu_ref, gv_ref, ap_ref, hyper_ref,
    # blocked input: byte-plane stream (see pallas_sgd.stream_planes)
    pb_ref,
    # HBM-resident inputs (aliased with the resident outputs)
    theta_hbm, phi_hbm,
    # outputs (whole tables, VMEM-resident for the epoch)
    theta_out, phi_out,
    # scratch
    acc_u, acc_v, sem_u, sem_v,
    *, tile_u: int, tile_v: int, batch: int, dim: int, lanes: int,
    mxu_dtype, defer_u: bool, defer_v: bool, saturate: bool,
    mxu_pred: bool = True, win_u: int = 8, win_v: int = 8,
    ablate: str = "",
):
    eta = hyper_ref[0]
    lam = hyper_ref[1]
    gb = hyper_ref[2]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cu = pltpu.make_async_copy(theta_hbm, theta_out, sem_u)
        cv = pltpu.make_async_copy(phi_hbm, phi_out, sem_v)
        cu.start()
        cv.start()
        cu.wait()
        cv.wait()
        if defer_u:
            acc_u[:] = jnp.zeros_like(acc_u)
        if defer_v:
            acc_v[:] = jnp.zeros_like(acc_v)

    sub = batch // 8
    pb = pb_ref[0]
    u3, v3, ut3, vt3, r3, w3 = decode_planes(pb, tile_u, tile_v, mxu_dtype)

    # Homogeneous-row lane roles (pallas_sgd module docstring).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    m_cnt = (lane == dim + 2).astype(jnp.float32)
    m_keep_u = (lane <= dim).astype(jnp.float32)
    m_keep_v = ((lane < dim) | (lane == dim + 1)).astype(jnp.float32)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_u), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_v), 1)
    iota_ut = jax.lax.broadcasted_iota(jnp.int32, (tile_u, sub), 0)
    iota_vt = jax.lax.broadcasted_iota(jnp.int32, (tile_v, sub), 0)
    ln_lameta = jnp.log(1.0 - eta * lam)

    def decay_mul(cur, k, m_keep):
        """exp on the (tile, 1) count column only (pallas_sgd.decay_mul):
        identical math, 1/lanes the transcendental work in the per-column
        apply chain."""
        dec = jnp.exp(k * ln_lameta)
        return cur * (1.0 + m_keep * (dec - 1.0))
    if mxu_pred:
        ones_mx = jnp.ones((lanes, lanes), mxu_dtype)
    if saturate:
        cap = hyper_ref[3]

    def sat_scale(k):
        """min(1, cap/k) per-row window-step saturation (pallas_sgd
        sat_scale): exact for k <= cap, bounded averaged step for heads."""
        return jnp.minimum(1.0, cap / jnp.maximum(k, 1.0))

    def cnt(d):
        return jnp.sum(d * m_cnt, axis=1, keepdims=True)

    def apply_now(out_ref, off, tile, cur, d, m_keep):
        """Immediate (sequential-per-column) apply."""
        k = cnt(d)
        if saturate:
            d = d * sat_scale(k)
        out_ref[pl.ds(off, tile), :] = (
            decay_mul(cur, k, m_keep) + d * m_keep
        )

    def flush(out_ref, acc, tile, m_keep, pend):
        """Deferred applies, flushed at the WINDOW boundary: moving every
        table store after the window's column bodies removes the
        store->load ordering between consecutive columns, so Mosaic can
        overlap column k+1's one-hot/mid VPU work with column k's matmuls
        (inline per-column applies serialize the whole body chain —
        measured ~0.7us/column fixed at small tiles)."""
        for off, flag, cur in pend:
            @pl.when(flag == 1)
            def _(off=off, cur=cur):
                a = acc[pl.ds(off, tile), :]
                k = cnt(a)
                if saturate:
                    a = a * sat_scale(k)
                out_ref[pl.ds(off, tile), :] = (
                    decay_mul(cur, k, m_keep) + a * m_keep
                )
                acc[pl.ds(off, tile), :] = jnp.zeros_like(a)
        pend.clear()

    pend_u, pend_v = [], []
    for k in range(8):
        off_u = pl.multiple_of(gu_ref[8 * i + k] * tile_u, tile_u)
        off_v = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        ap = ap_ref[8 * i + k]
        theta = theta_out[pl.ds(off_u, tile_u), :]
        phi = phi_out[pl.ds(off_v, tile_v), :]
        theta_mx = theta.astype(mxu_dtype)
        phi_mx = phi.astype(mxu_dtype)

        if ablate == "noonehot":  # timing only: constant one-hots
            oh_u = jnp.full((sub, tile_u), 0.01, mxu_dtype)
            oh_v = jnp.full((sub, tile_v), 0.01, mxu_dtype)
            oht_u = jnp.full((tile_u, sub), 0.01, mxu_dtype)
            oht_v = jnp.full((tile_v, sub), 0.01, mxu_dtype)
        else:
            oh_u = (iota_u == u3[:, k: k + 1]).astype(mxu_dtype)
            oh_v = (iota_v == v3[:, k: k + 1]).astype(mxu_dtype)
            oht_u = (iota_ut == ut3[k: k + 1, :]).astype(mxu_dtype)
            oht_v = (iota_vt == vt3[k: k + 1, :]).astype(mxu_dtype)

        if ablate == "nogather":  # timing only: broadcast replaces matmul
            t = jnp.broadcast_to(theta[0:1, :], (sub, lanes))
            p = jnp.broadcast_to(phi[0:1, :], (sub, lanes))
        else:
            t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
            p = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)

        wk = w3[:, k: k + 1]
        if ablate == "nomid":  # timing only: skip pred/err chain
            err = wk * 1e-3
        elif mxu_pred:
            pred = jnp.dot(
                (t * p).astype(mxu_dtype), ones_mx,
                preferred_element_type=jnp.float32,
            ) + gb
            err = (eta * wk) * (r3[:, k: k + 1] - pred)
        else:
            pred = jnp.sum(t * p, axis=1, keepdims=True) + gb
            err = (eta * wk) * (r3[:, k: k + 1] - pred)

        rhs_u = (err * p + wk * m_cnt).astype(mxu_dtype)
        rhs_v = (err * t + wk * m_cnt).astype(mxu_dtype)
        if ablate == "noscatter":  # timing only
            d_theta = jnp.zeros((tile_u, lanes), jnp.float32)
            d_phi = jnp.zeros((tile_v, lanes), jnp.float32)
        else:
            d_theta = jnp.dot(
                oht_u, rhs_u, preferred_element_type=jnp.float32
            )
            d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)

        if ablate != "noapply":
            if defer_u:
                acc_u[pl.ds(off_u, tile_u), :] += d_theta
                pend_u.append((off_u, ap & 1, theta))
            else:
                apply_now(theta_out, off_u, tile_u, theta, d_theta, m_keep_u)
            if defer_v:
                acc_v[pl.ds(off_v, tile_v), :] += d_phi
                pend_v.append((off_v, (ap >> 1) & 1, phi))
            else:
                apply_now(phi_out, off_v, tile_v, phi, d_phi, m_keep_v)
        if k % win_u == win_u - 1:
            flush(theta_out, acc_u, tile_u, m_keep_u, pend_u)
        if k % win_v == win_v - 1:
            flush(phi_out, acc_v, tile_v, m_keep_v, pend_v)


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "batch", "dim", "n_gu", "n_gv", "mxu",
        "interpret", "defer_u", "defer_v", "saturate", "mxu_pred",
        "win_u", "win_v", "ablate",
    ),
)
def _run_free_epoch(
    theta_ext, phi_ext, gu, gv, ap, pb, hyper,
    *, tile_u, tile_v, batch, dim, n_gu, n_gv, mxu="bfloat16",
    interpret=False, defer_u=True, defer_v=True, saturate=True,
    mxu_pred=True, win_u=8, win_v=8, ablate="",
):
    assert tile_v < UV_BASE and tile_u * UV_BASE + tile_v < (1 << 24)
    nb = pb.shape[0]
    check_smem_plan_free(nb)
    lanes = row_lanes(dim)
    sub = batch // 8
    kernel = functools.partial(
        _free_kernel,
        tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim, lanes=lanes,
        mxu_dtype=jnp.dtype(mxu), defer_u=defer_u, defer_v=defer_v,
        saturate=saturate, mxu_pred=mxu_pred, win_u=win_u, win_v=win_v,
        ablate=ablate,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # gu, gv, ap, hyper
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 56, sub), lambda i, gu, gv, ap, h: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # theta (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # phi (HBM)
        ],
        out_specs=[
            pl.BlockSpec(
                (n_gu * tile_u, lanes), lambda i, gu, gv, ap, h: (0, 0)
            ),
            pl.BlockSpec(
                (n_gv * tile_v, lanes), lambda i, gu, gv, ap, h: (0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (n_gu * tile_u if defer_u else 8, lanes), jnp.float32
            ),
            pltpu.VMEM(
                (n_gv * tile_v if defer_v else 8, lanes), jnp.float32
            ),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    theta_ext, phi_ext = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_gu * tile_u, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_gv * tile_v, lanes), jnp.float32),
        ],
        # operand indices include the 4 scalar-prefetch args: pb=4,
        # theta=5, phi=6 -> outputs 0, 1.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(gu, gv, ap, hyper, pb, theta_ext, phi_ext)
    return theta_ext, phi_ext


def check_smem_plan_free(nb: int) -> None:
    """gu + gv + ap = 24 int32s per batch in the core's ~1 MB SMEM."""
    if nb * 24 * 4 > 900_000:
        raise ValueError(
            f"free-column plan has {nb} batches; its scalar-prefetch "
            f"metadata (~{nb * 24 * 4 // 1024} KiB) exceeds the ~1 MiB TPU "
            "SMEM. Use a larger batch size or the blocked gen-1 kernel."
        )


def free_eligible(nu: int, nv: int, dim: int,
                  budget: int = 90 * 1024 * 1024) -> bool:
    """Both resident tables + both deferred-apply scratches must fit VMEM
    (the immediate-apply variants halve this, but eligibility gates on the
    fully-deferred worst case so the epoch never recompiles into an OOM)."""
    if dim > 253:
        return False
    lanes = row_lanes(dim)
    rows = cdiv(nu, 128) * 128 + cdiv(nv, 128) * 128
    return 2 * rows * lanes * 4 <= budget


def _global_dup_stats(ids: np.ndarray, g: np.ndarray, tile: int,
                      n_tiles: int) -> dict:
    """Window duplicate stats on GLOBAL row ids (per-column tiles mean
    tile-local ids collide across columns; key by g*tile + id)."""
    gl = g[:, None, :].astype(np.int64) * tile + ids
    gl = np.where(ids >= tile, n_tiles * tile, gl)  # sentinel stays unique
    return _dup_stats(gl, n_tiles * tile)


class FreeEpochRunner:
    """PallasEpochRunner-compatible runner for the free-column kernel."""

    def __init__(
        self,
        ds: RatingsCOO,
        tile_u: int = 128,
        tile_v: int = 128,
        batch: int | None = None,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        n_plans: int = 1,
        balance: bool = True,
        saturate: bool = True,
        groups_u: int | None = None,
        groups_v: int | None = None,
        mxu_pred: bool = True,
        ablate: str = "",
    ):
        self.ablate = ablate
        if batch is None:
            _, _, batch = pick_free_geometry(ds, tile_u, tile_v)
        batch = cdiv(batch, 8) * 8
        self.saturate = saturate
        self.mxu_pred = mxu_pred
        self.nu, self.nv = ds.nu, ds.nv
        self._map_u = self._map_v = None
        if balance:
            ds, self._map_u, self._map_v = balance_cells(ds, tile_u, tile_v)
        self.plans = [
            prepare_cells_free(ds, tile_u, tile_v, batch, seed + 7919 * p)
            for p in range(max(1, n_plans))
        ]
        self.plan = self.plans[0]
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        self.mxu, self.interpret = mxu, interpret
        self.groups_u, self.groups_v = groups_u, groups_v
        self._warned = set()
        self._dup_u = self._dup_v = None
        if groups_u is None:
            stats = [
                _global_dup_stats(p.u, p.gu, tile_u, p.n_gu)
                for p in self.plans
            ]
            self._dup_u = {g: max(s[g] for s in stats) for g in (1, 2, 4, 8)}
        if groups_v is None:
            stats = [
                _global_dup_stats(p.v, p.gv, tile_v, p.n_gv)
                for p in self.plans
            ]
            self._dup_v = {g: max(s[g] for s in stats) for g in (1, 2, 4, 8)}
        self.devs = []
        self.flags_u = []  # per plan: {groups: (NB, 8) last-touch flags}
        self.flags_v = []
        for plan in self.plans:
            uv = plan.u * UV_BASE + plan.v
            self.devs.append((
                jnp.asarray(plan.gu.reshape(-1)),
                jnp.asarray(plan.gv.reshape(-1)),
                stream_planes(jnp.asarray(uv), jnp.asarray(plan.r)),
            ))
            # sentinel (all-pad) columns never apply
            real_col = (plan.w.sum(axis=1) > 0).astype(np.int32)  # (NB, 8)
            self.flags_u.append({
                g: _apply_flags(plan.gu, g) * real_col for g in (1, 2, 4)
            } | {8: real_col})
            self.flags_v.append({
                g: _apply_flags(plan.gv, g) * real_col for g in (1, 2, 4)
            } | {8: real_col})
        self._ap_cache = {}
        self.dev = self.devs[0]

    @property
    def n_slots(self) -> int:
        return int(self.plan.u.size)

    def _pick(self, eta: float, dups: dict | None, fixed: int | None,
              side: str) -> int:
        if fixed is not None:
            return fixed
        for g in (1, 2, 4, 8):
            if eta * dups[g] <= 0.2:
                return g
        if not self.saturate:
            warn_window_envelope("free", side, eta, dups[8], self._warned)
        return 8

    def _ap(self, plan_i: int, gu_g: int, gv_g: int):
        key = (plan_i, gu_g, gv_g)
        if key not in self._ap_cache:
            self._ap_cache[key] = jnp.asarray(
                (self.flags_u[plan_i][gu_g]
                 + 2 * self.flags_v[plan_i][gv_g]).reshape(-1)
            )
        return self._ap_cache[key]

    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0):
        cap = max(1.0, 0.2 / max(eta, 1e-9))
        hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
        plan_i = epoch_idx % len(self.plans)
        gu_g = self._pick(eta, self._dup_u, self.groups_u, "theta")
        gv_g = self._pick(eta, self._dup_v, self.groups_v, "phi")
        gu, gv, pb = self.devs[plan_i]
        return _run_free_epoch(
            tables[0], tables[1], gu, gv, self._ap(plan_i, gu_g, gv_g), pb,
            hyper,
            tile_u=self.tile_u, tile_v=self.tile_v, batch=self.batch,
            dim=self.dim, n_gu=self.plan.n_gu, n_gv=self.plan.n_gv,
            mxu=self.mxu, interpret=self.interpret,
            defer_u=gu_g < 8, defer_v=gv_g < 8, saturate=self.saturate,
            mxu_pred=self.mxu_pred, win_u=8 // gu_g, win_v=8 // gv_g,
            ablate=self.ablate,
        )

    def pad(self, params: MFParams):
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        return pad_params(params, self.plan, self._map_u, self._map_v)

    def trim(self, tables, dim: int | None = None) -> MFParams:
        return split_params(
            tables[0], tables[1], self.nu, self.nv, dim or self.dim,
            self.gb, self._map_u, self._map_v,
        )
