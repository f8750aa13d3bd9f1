"""Fused Pallas TPU kernel for the biased-MF SGD epoch.

This is the perf north star (SURVEY §7 step 3): the reference's hot loop is
~10*dim flops + 2 row reads + 2 row writes per rating through cblas
(reference: src/mf.h:94-109, memory-bound on CPU). On TPU the same math is
reformulated to run almost entirely on the MXU:

* Ratings are binned host-side into a (Gu x Gv) grid of cells by
  (user-tile, item-tile); each cell's ratings are padded to whole batches of
  B (prepare_cells).
* One pallas_call runs the whole epoch: grid = (num_batches,), with
  scalar-prefetched per-batch tile indices driving the BlockSpec index maps.
  The user table streams through (TILE_U, 128) blocked in/out refs (each
  tile's batches are consecutive, so a tile makes exactly one HBM round trip
  per epoch); the item table is small and stays fully VMEM-resident for the
  whole epoch (DMA'd in at step 0, stored once at the end).
* Gather/scatter of B arbitrary rows becomes one-hot matmuls on the MXU
  (bf16 operands — exact for one-hots — with fp32 accumulation).
* **Column fusion, homogeneous coordinates**: a theta row is laid out as
  [factor_0..D-1 | bu | 1 | (count scratch)] and a phi row as
  [factor_0..D-1 | 1 | bv | (count scratch)] inside the lane row. The
  constant one-lanes make the prediction a single fused multiply:
  rowsum(t * p) = theta.phi + bu*1 + 1*bv, so the mid-chain needs NO lane
  masks (measured round 2: the rank-64 step is mid-chain-bound; the old
  masked form spent ~11 VPU ops per rating against 5 here). The scatter rhs
  is simply err*p (+ w in the count lane): its bias lane lands err on bu,
  and the garbage it writes into the one-lane is erased once per tile at
  apply time. Counts drive the geometric per-occurrence decay
  (1 - eta*lambda)^k (same semantics as ops/sgd.py / ops/common.py).

Rows occupy one 128-lane group for dim <= 125 and two for dim <= 253
(row_lanes) — the reference default dim=128 (main.cc:98) runs fused in two
lane groups; beyond that the XLA path takes over.
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

LANES = 128           # base lane width; rows use ceil((dim+3)/128) groups
# The reference's parameter sweep runs to dim=2048 (src/run.py:13); rows
# are [dim factors | bias | one | count] in however many 128-lane groups
# that takes (17 at dim 2048). Above ~2 groups the MXU-pred rowsum's
# lanes^2 cost dominates, so the runner auto-disables mxu_pred there.
MAX_DIM = 2048


def row_lanes(dim: int) -> int:
    """Lane width of a fused table row: ceil((dim+3)/128) 128-lane groups
    (128 for dim <= 125, 256 for <= 253, ... 2176 at the dim-2048 cap)."""
    assert dim <= MAX_DIM, f"fused kernels support dim <= {MAX_DIM}, got {dim}"
    return ((dim + 3 + LANES - 1) // LANES) * LANES


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class CellPlan(NamedTuple):
    """Epoch data layout for the fused kernels (host-side product).

    A batch holds 8 lane-column sub-batches of B/8 ratings. All sub-batches
    of one batch share the user tile (gu per batch), but each carries its OWN
    item tile (gv per column): cells pad to B/8 granularity instead of B,
    which cuts padding ~4x on real shard sizes.
    """

    u: np.ndarray    # (NB, B/8, 8) int32 tile-local user ids; TILE_U = pad
    v: np.ndarray    # (NB, B/8, 8) int32 tile-local item ids; TILE_V = pad
    r: np.ndarray    # (NB, B/8, 8) float32
    w: np.ndarray    # (NB, B/8, 8) float32 {0,1}
    gu: np.ndarray   # (NB,) int32 user-tile index per batch
    gv: np.ndarray   # (NB, 8) int32 item-tile index per sub-batch column
    tile_u: int
    tile_v: int
    n_gu: int
    n_gv: int
    n_real: int


def prepare_cells(
    ds: RatingsCOO,
    tile_u: int = 512,
    tile_v: int = 512,
    batch_size: int = 2048,
    seed: int = 0,
) -> CellPlan:
    """Disk-cached plan build (ops/plan_cache.py): Netflix-scale argsorts
    cost ~145 s on a 1-core host; a second run loads in seconds."""
    from tpu_mf.ops.plan_cache import cached_build

    return cached_build(
        "cell", CellPlan, ds, seed, (tile_u, tile_v, batch_size),
        lambda: _prepare_cells_impl(ds, tile_u, tile_v, batch_size, seed),
    )


def _prepare_cells_impl(
    ds: RatingsCOO,
    tile_u: int,
    tile_v: int,
    batch_size: int,
    seed: int,
) -> CellPlan:
    """Bin shuffled ratings into (user-tile, item-tile) cells, pad each cell
    to whole SUB-batches (B/8), pack 8 sub-batches per batch within each
    user-tile group, and order batches by gu so theta-tile visits are
    consecutive.

    Fully vectorized (no per-cell Python loop): each rating's destination
    (batch, row, column) slot is computed with cumsum arithmetic and the
    plan arrays are filled with one flat scatter — 100M-rating plans build
    in tens of seconds (argsort-bound) instead of minutes.
    """
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
    sb_per_cell = np.ceil(counts / sub).astype(np.int64)  # sub-blocks
    sb_per_group = sb_per_cell.reshape(n_gu, n_gv).sum(1)
    nb_per_group = np.maximum(1, np.ceil(sb_per_group / 8)).astype(np.int64)
    nb_total = int(nb_per_group.sum())

    U = np.full((nb_total, sub, 8), tile_u, np.int32)  # sentinel = padded
    V = np.full((nb_total, sub, 8), tile_v, np.int32)
    R = np.zeros((nb_total, sub, 8), np.float32)
    W = np.zeros((nb_total, sub, 8), np.float32)
    GU = np.zeros(nb_total, np.int32)
    GV = np.zeros((nb_total, 8), np.int32)

    src = np.concatenate([[0], np.cumsum(counts)])          # per-cell start
    sb_cs = np.concatenate([[0], np.cumsum(sb_per_cell)])   # per-cell sb base
    base = np.concatenate([[0], np.cumsum(nb_per_group)])   # per-group batch
    GU[:] = np.repeat(
        np.arange(n_gu, dtype=np.int32), nb_per_group.astype(np.int64)
    )

    # destination of each (sorted) rating
    l = np.arange(len(u), dtype=np.int64) - src[cell]        # index in cell
    g = cell // n_gv                                         # user-tile group
    sb_w = (sb_cs[cell] - sb_cs[g * n_gv]) + l // sub        # sb within group
    b = base[g] + sb_w // 8
    col = sb_w % 8
    pos = l % sub
    flat = (b * sub + pos) * 8 + col
    U.reshape(-1)[flat] = (u % tile_u).astype(np.int32)
    V.reshape(-1)[flat] = (v % tile_v).astype(np.int32)
    R.reshape(-1)[flat] = r
    W.reshape(-1)[flat] = 1.0
    GV.reshape(-1)[b * 8 + col] = (cell % n_gv).astype(np.int32)
    return CellPlan(
        u=U, v=V, r=R, w=W, gu=GU, gv=GV,
        tile_u=tile_u, tile_v=tile_v, n_gu=n_gu, n_gv=n_gv, n_real=len(ds),
    )


def pad_plan_nb(plan: CellPlan, nb: int) -> CellPlan:
    """Pad a cell plan to ``nb`` batches with all-sentinel batches (w=0,
    sentinel ids) pinned to the LAST real user tile — appending a lower gu
    would revisit a stored theta block, which blocked refs must never do.
    Sentinel batches are no-ops in the kernel (zero one-hots, zero counts)
    and cost only the per-step floor; the item-sharded runner uses this to
    round every shard's batch count to a common multiple so all shards
    share one Mosaic compilation."""
    cur = plan.u.shape[0]
    if cur >= nb:
        return plan

    e = nb - cur

    def pad3(a, fill):
        return np.concatenate([a, np.full((e,) + a.shape[1:], fill, a.dtype)])

    return plan._replace(
        u=pad3(plan.u, plan.tile_u),
        v=pad3(plan.v, plan.tile_v),
        r=pad3(plan.r, 0),
        w=pad3(plan.w, 0),
        gu=np.concatenate(
            [plan.gu, np.full(e, plan.gu[-1] if cur else 0, plan.gu.dtype)]
        ),
        gv=np.concatenate([plan.gv, np.zeros((e, 8), plan.gv.dtype)]),
    )


def _tile_balance_map(counts: np.ndarray, tile: int) -> np.ndarray:
    """``new_of_old`` id relabeling equalizing per-TILE rating loads.

    Serpentine deal: rows sorted heaviest-first are dealt across the tiles
    in snake order (0..T-1, T-1..0, ...), so every tile receives the same
    number of rows and near-identical total load even under zipfy
    marginals. With both axes balanced, (user-tile x item-tile) cell sizes
    concentrate near their mean, which is what the cell plan's
    ceil(count/sub) padding responds to (calibrated ML-10M at tile 256:
    fill 0.64 -> ~0.74, the uniform-marginal level). Analogous to the slot
    kernel's within-tile LPT (pallas_sgd_slot._balance_map) but across
    tiles; fully vectorized so Netflix-scale maps build in milliseconds."""
    n = counts.size
    n_tiles = cdiv(n, tile)
    order = np.argsort(-counts, kind="stable")
    idx = np.arange(n, dtype=np.int64)
    rnd, c = divmod(idx, n_tiles)
    tile_of = np.where(rnd % 2 == 0, c, n_tiles - 1 - c)
    out = np.empty(n, np.int64)
    out[order] = tile_of * tile + rnd
    return out.astype(np.int32)


def balance_cells(
    ds: RatingsCOO, tile_u: int, tile_v: int
) -> Tuple[RatingsCOO, np.ndarray, np.ndarray]:
    """Relabel user/item ids to balance per-tile loads on both axes (see
    _tile_balance_map). Returns (relabeled ds, map_u, map_v); training on
    the relabeled ids is exact — the same updates hit the same rows at
    different physical positions — and the runner's pad/trim invert the
    maps at the table boundary. The relabeled ds is padded to whole
    tiles."""
    mu = _tile_balance_map(np.bincount(ds.u, minlength=ds.nu), tile_u)
    mv = _tile_balance_map(np.bincount(ds.v, minlength=ds.nv), tile_v)
    ds2 = RatingsCOO(
        u=mu[ds.u], v=mv[ds.v], r=ds.r,
        nu=cdiv(ds.nu, tile_u) * tile_u, nv=cdiv(ds.nv, tile_v) * tile_v,
    )
    return ds2, mu, mv


def pick_cell_geometry(
    ds: RatingsCOO, tile_u: int = 256
) -> Tuple[int, int, int]:
    """(tile_u, tile_v, batch) for the balanced gen-1 cell plan.

    With balance_cells equalizing per-tile loads, cell sizes concentrate at
    c = n / (n_gu * n_gv), so fill is governed by three geometry terms the
    chooser scores directly (validated on the calibrated ML-10M sweep,
    PERF_NOTES round-3):
      * per-cell ceil-to-sub padding — want sub ~ 1.12c (margin for the
        residual cell-size spread; tighter margins measured net-negative
        from spilled cells);
      * 8-column group rounding — want 8 | n_gv (tv=224 on ML-10M: 48
        columns/group exactly; the 0.875 rounding loss at tv=256 is gone);
      * per-column fixed cost — amortized as 1/(1 + 94/sub) (the slot
        kernel's refit constant), and sub must sit on the 128-sublane grid
        (off-grid heights measured 13-16% slower, pick_sub).
    Measured: (256, 224, 7168) 322.5M/s vs the pre-chooser (256, 256,
    8192) 299.5M/s at rank 64 calibrated."""
    n_gu = cdiv(ds.nu, tile_u)
    n = len(ds)
    best = (tile_u, 256, 8192)
    best_score = -1.0
    for tv in range(128, 385, 8):
        n_gv = cdiv(ds.nv, tv)
        gloss = n_gv / (cdiv(n_gv, 8) * 8)
        c = n / (n_gu * n_gv)
        for sub in (512, 640, 768, 896, 1024):
            blocks = max(1, cdiv(int(c * 1.12), sub))
            fill = c / (blocks * sub) * gloss
            score = fill / (1.0 + 94.0 / sub)
            if score > best_score:
                best_score = score
                best = (tile_u, tv, 8 * sub)
    return best


def fuse_rows(fac, bias, rows: int, lanes: int, side: str,
              idmap: np.ndarray | None = None) -> jax.Array:
    """Homogeneous fused rows. side="u": [fac | bias | 1 | 0...];
    side="v": [fac | 1 | bias | 0...]. Pad rows keep one=1 harmlessly=0:
    they are never gathered (sentinel one-hots are all-zero). ``idmap``
    (new-id-of-old-id, from balance_cells) scatters row i to table row
    idmap[i] instead of i."""
    n = fac.shape[0]
    one = jnp.ones((n, 1), fac.dtype)
    cols = [fac, bias[:, None], one] if side == "u" else [fac, one, bias[:, None]]
    ext = jnp.concatenate(cols, axis=1).astype(jnp.float32)
    ext = jnp.pad(ext, ((0, 0), (0, lanes - ext.shape[1])))
    if idmap is None:
        return jnp.pad(ext, ((0, rows - n), (0, 0)))
    return jnp.zeros((rows, lanes), jnp.float32).at[idmap].set(ext)


def pad_params(
    params: MFParams, plan: CellPlan,
    map_u: np.ndarray | None = None, map_v: np.ndarray | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-layout tables (homogeneous rows, see module docstring)."""
    dim = params.theta.shape[1]
    lanes = row_lanes(dim)
    return (
        fuse_rows(params.theta, params.bu, plan.n_gu * plan.tile_u, lanes,
                  "u", map_u),
        fuse_rows(params.phi, params.bv, plan.n_gv * plan.tile_v, lanes,
                  "v", map_v),
    )


def split_params(
    theta_ext: jax.Array, phi_ext: jax.Array, nu: int, nv: int, dim: int, gb,
    map_u: np.ndarray | None = None, map_v: np.ndarray | None = None,
) -> MFParams:
    th = theta_ext if map_u is None else theta_ext[map_u]
    ph = phi_ext if map_v is None else phi_ext[map_v]
    return MFParams(
        theta=th[:nu, :dim],
        phi=ph[:nv, :dim],
        bu=th[:nu, dim],
        bv=ph[:nv, dim + 1],  # phi rows are [fac | 1 | bias]
        gb=jnp.asarray(gb, jnp.float32),
    )


UV_SHIFT = 11          # packed id stream: u << 11 | v; tiles must be <= 1024
UV_BASE = 1 << UV_SHIFT


def stream_planes(uv, r):
    """(nb, sub, 8) uv/r -> ONE dense bf16 byte-plane stream (nb, 56, sub).

    The kernel's (sub, 8)-minor stream blocks pad 8 -> 128 lanes, so their
    strided DMA dominated the per-step floor (benchmarks/probe_floor.py:
    1.7us of 3.9us at t256/B7168). Mosaic has no sublane<->lane transpose
    and a single f32 transpose-matmul is bf16x3-decomposed (drops integer
    bits above ~2^16), so the streams ship TRANSPOSED as 7 byte planes —
    3 for the 22-bit packed ids, 4 for the rating f32 BIT PATTERN — each
    0..255 and therefore bf16-exact. One in-kernel matmul against a
    {1, 256, 65536}-weighted block-diagonal constant rebuilds (sub, 8)
    integer views whose every value is < 2^22, exact regardless of MXU
    accumulation order; the rating bits then reassemble with two shifts
    and a bitcast. Runs as XLA ops so stream paths can build planes on
    device from the compact int32/f32 uploads."""
    import jax
    import jax.numpy as jnp

    uvt = jnp.swapaxes(uv, 1, 2)
    rt = jnp.swapaxes(jax.lax.bitcast_convert_type(r, jnp.int32), 1, 2)
    planes = [(uvt >> s) & 255 for s in (0, 8, 16)]
    planes += [(rt >> s) & 255 for s in (0, 8, 16, 24)]
    return jnp.concatenate(
        [p.astype(jnp.bfloat16) for p in planes], axis=1
    )


def decode_planes(pb, tile_u: int, tile_v: int, mxu_dtype):
    """In-kernel inverse of stream_planes for ONE batch's plane block.

    pb is the (56, B/8) bf16 plane block; returns the (B/8, 8) id/rating
    views the mid-chain wants (u3, v3, r3, w3) plus the (8, B/8)
    transposed ids (ut3, vt3) the pre-transposed scatter one-hots build
    from. See stream_planes for the exactness argument."""
    sub = pb.shape[-1]
    uvt3 = (
        pb[0:8].astype(jnp.float32)
        + pb[8:16].astype(jnp.float32) * 256.0
        + pb[16:24].astype(jnp.float32) * 65536.0
    ).astype(jnp.int32)  # (8, B/8) transposed packed ids
    pi = jax.lax.broadcasted_iota(jnp.int32, (56, 24), 0)
    pj = jax.lax.broadcasted_iota(jnp.int32, (56, 24), 1)
    ppl, prow = pi // 8, pi % 8
    # cols 0-7: uv = plane0 + 256*plane1 + 65536*plane2
    # cols 8-15: r lo16 = plane3 + 256*plane4
    # cols 16-23: r hi16 = plane5 + 256*plane6
    w_uv = ((pj < 8) & (prow == pj) & (ppl <= 2)).astype(jnp.float32) * (
        (1 << (8 * jnp.minimum(ppl, 2))).astype(jnp.float32)
    )
    w_lo = (((pj >= 8) & (pj < 16)) & (prow == pj - 8)
            & ((ppl == 3) | (ppl == 4))).astype(jnp.float32) * (
        (1 << (8 * jnp.clip(ppl - 3, 0, 1))).astype(jnp.float32)
    )
    w_hi = ((pj >= 16) & (prow == pj - 16)
            & ((ppl == 5) | (ppl == 6))).astype(jnp.float32) * (
        (1 << (8 * jnp.clip(ppl - 5, 0, 1))).astype(jnp.float32)
    )
    W = (w_uv + w_lo + w_hi).astype(mxu_dtype)
    dec = jax.lax.dot_general(
        pb.astype(mxu_dtype), W, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B/8, 24): [uv | r_lo16 | r_hi16]
    del sub
    uv3 = dec[:, 0:8].astype(jnp.int32)
    r3 = pltpu.bitcast(
        dec[:, 8:16].astype(jnp.int32)
        | (dec[:, 16:24].astype(jnp.int32) << 16),
        jnp.float32,
    )
    u3 = uv3 >> UV_SHIFT
    v3 = uv3 & (UV_BASE - 1)
    ut3 = uvt3 >> UV_SHIFT
    vt3 = uvt3 & (UV_BASE - 1)
    w3 = (uv3 != tile_u * UV_BASE + tile_v).astype(jnp.float32)
    return u3, v3, ut3, vt3, r3, w3


def _epoch_kernel(
    # scalar prefetch
    gu_ref, gv_ref, ap_ref, hyper_ref,
    # blocked input: ONE dense bf16 byte-plane stream (56, B/8) carrying
    # the transposed packed ids and rating bits (see stream_planes).
    pb_ref, theta_ref,
    # HBM-resident input (aliased with the resident output)
    phi_hbm,
    # outputs
    theta_out, phi_out,
    # scratch
    acc, sem,
    *, tile_u: int, tile_v: int, batch: int, dim: int, lanes: int, mxu_dtype,
    theta_groups: int = 8, phi_groups: int = 8, scatter_dg: bool = False,
    mxu_pred: bool = False, mxu_apply: bool = False, saturate: bool = False,
    batch_theta: bool = False, ablate: int = 4,
):
    # ablate: roofline ablation level (benchmarks/roofline64.py — VERDICT
    # r4 #1; timing-only, never a production path). 4 = full kernel;
    # 3 = scatter matmuls but NO table applies; 2 = decode + one-hots +
    # gather matmuls + pred/err only; 1 = id/rating decode only; 0 = empty
    # grid walk (block DMA + resident-table floor). Levels < 4 fold a
    # data-dependent sink into an 8-row store so Mosaic cannot dead-code
    # the measured stage. Level deltas attribute ns/rating per stage.
    eta = hyper_ref[0]
    lam = hyper_ref[1]
    gb = hyper_ref[2]

    i = pl.program_id(0)
    prev = jnp.maximum(i - 1, 0)
    new_gu = (i == 0) | (gu_ref[i] != gu_ref[prev])

    # Item table: fully VMEM-resident for the epoch (see module docstring).
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(phi_hbm, phi_out, sem)
        cp.start()
        cp.wait()
        if phi_groups < 8:
            acc[:] = jnp.zeros_like(acc)

    # User table: state lives in the out ref (persists across same-index
    # steps); seeded from the in ref at each tile-run start. A tile is never
    # reloaded after its store, so there is no stale-read hazard.
    @pl.when(new_gu)
    def _():
        theta_out[:] = theta_ref[:]

    sub = batch // 8
    # Packed ids: u in bits 11+, v in bits 0-10 (tile-local, sentinel = tile
    # size). Decode the byte-plane stream (stream_planes): the transposed
    # (8, sub) id views rebuild with two cheap FMAs; the (sub, 8) views the
    # mid-chain wants come from ONE matmul against a block-diagonal
    # {1,256,65536} weight constant — every output is an integer < 2^22,
    # exact in f32 regardless of MXU accumulation order (unlike a plain f32
    # transpose matmul, which is bf16x3-decomposed and corrupted the ids).
    pb = pb_ref[0]     # (56, B/8) bf16: planes 0-2 uv bytes, 3-6 r bits

    def _sink(s):
        # Data-dependent no-op store: keeps the ablated stage alive at
        # negligible cost (one 8-row read-modify-write per grid step).
        theta_out[0:8, :] = theta_out[0:8, :] + s * 1e-30

    if ablate == 0:
        _sink(jnp.sum(pb.astype(jnp.float32)))
        return
    u3, v3, ut3, vt3, r3, w3 = decode_planes(pb, tile_u, tile_v, mxu_dtype)
    if ablate == 1:
        _sink(jnp.sum(r3 * w3)
              + (jnp.sum(u3 + v3) + jnp.sum(ut3 + vt3))
              .astype(jnp.float32))
        return

    theta = theta_out[:]                   # (TILE_U, lanes) fp32 state

    # Lane roles for the homogeneous rows (module docstring): theta =
    # [fac | bu | 1 | cnt], phi = [fac | 1 | bv | cnt]. The mid-chain uses
    # NO masks; these only shape the per-tile apply. The decay exponent is
    # PER-LANE (zero on the one/cnt lanes) so the homogeneous 1 survives
    # exp() on its own — the apply stays at the pre-homog 3 ops.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    m_cnt = (lane == dim + 2).astype(jnp.float32)   # count scratch lane
    m_keep_u = (lane <= dim).astype(jnp.float32)    # fac + bu persist
    m_keep_v = ((lane < dim) | (lane == dim + 1)).astype(jnp.float32)

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_u), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_v), 1)
    iota_ut = jax.lax.broadcasted_iota(jnp.int32, (tile_u, sub), 0)
    iota_vt = jax.lax.broadcasted_iota(jnp.int32, (tile_v, sub), 0)
    lameta = 1.0 - eta * lam
    ln_lameta = jnp.log(lameta)  # lameta > 0 for any sane config

    def decay_mul(cur, k, m_keep):
        """cur * exp(k * ln_lameta * m_keep) with the transcendental on the
        (tile, 1) count column only: lanes with zero decay exponent
        (one/cnt) multiply by exactly exp(0) = 1, so the full-width factor
        is 1 + m_keep*(dec-1) — algebraically identical at 1/lanes the
        exp work (the apply is the per-column serial-chain fixed cost the
        small-tile geometries are bound by)."""
        if k.shape[-1] != 1:  # mxu_apply pre-broadcast counts
            return cur * jnp.exp(k * (ln_lameta * m_keep))
        dec = jnp.exp(k * ln_lameta)                     # (tile, 1)
        return cur * (1.0 + m_keep * (dec - 1.0))
    if mxu_pred:
        # pred on the MXU: rowsum(t*p) as (t*p) @ ones — the result arrives
        # PRE-BROADCAST across all lanes, killing both the VPU log-reduction
        # and the pred lane-broadcast (measured 24% of the rank-64 step,
        # ablate_wide64.py widemxu).
        ones_mx = jnp.ones((lanes, lanes), mxu_dtype)
    if mxu_apply:
        # Count-pick one-hot: (d @ CB)[:, l] == d[:, dim+2] — the decay
        # exponent arrives pre-broadcast (f32 matmul: counts stay exact).
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
        CB = (c_iota == dim + 2).astype(jnp.float32)

    # BOTH sides apply in adaptive groups, each gated by the plan's measured
    # within-window duplicate statistics and eta (staleness of k accumulated
    # gradients on one row ~ k*eta*|row|^2; see pick_theta_groups /
    # pick_phi_groups). The USER side accumulates per theta group in
    # registers; the ITEM side (popularity-skewed, tiles vary per column)
    # defers into a phi-shaped VMEM scratch and applies each tile at its
    # LAST touching column of the phi group (host-computed ap flag) — so the
    # heavy per-column work is independent within a group instead of
    # serialized through the phi read-update-write chain.
    tg_w = 8 // theta_groups
    pg_w = 8 // phi_groups

    def cnt_bcast(d):
        """Per-row update count (the decay exponent), broadcast-ready."""
        if mxu_apply:
            return jnp.dot(d, CB, preferred_element_type=jnp.float32)
        return jnp.sum(d * m_cnt, axis=1, keepdims=True)

    if saturate:
        cap = hyper_ref[3]

    def sat_scale(k):
        """Per-row window-step saturation: a row hit k times inside one
        deferred-apply window accumulates k gradients computed at the SAME
        stale point — the k*eta overshoot is what diverges on zipfy heads
        (eta*k > ~2, CLAUDE.md staleness envelope). Scaling the window's
        accumulated delta by min(1, cap/k) caps the per-row step at
        cap*eta*grad — exact for k <= cap (non-head rows), a bounded
        averaged step for heads. cap = 0.2/eta arrives via hyper[3] so it
        relaxes automatically as eta decays; the reference's sequential
        per-rating loop (src/mf.h:94-109) has no such window, so this is
        the batched kernel's substitute for its implicit stability."""
        return jnp.minimum(1.0, cap / jnp.maximum(k, 1.0))

    theta_mx = None
    d_theta_g = None
    pending = []
    tt = None
    ohtu_list = []
    rhsu_list = []
    sink = jnp.float32(0.0)  # ablate < 4 liveness accumulator
    if batch_theta:
        # theta_groups == 1: every column gathers from the SAME batch-start
        # snapshot and the deltas apply once at batch end, so the 8 per-
        # column gather/scatter matmuls are batchable into ONE (8sub, tile)
        # gather and ONE (tile, 8sub) scatter — same flops, 1/8 the MXU
        # dispatches, and the scatter's K order (column-major) matches the
        # sequential accumulation order bit-for-bit.
        theta_mx = theta.astype(mxu_dtype)
        ohu_all = jnp.concatenate(
            [(iota_u == u3[:, k : k + 1]).astype(mxu_dtype)
             for k in range(8)],
            axis=0,
        )                                        # (8*sub, TILE_U)
        tt = jnp.dot(ohu_all, theta_mx, preferred_element_type=jnp.float32)
    for k in range(8):
        if k % tg_w == 0 and not batch_theta:
            theta_mx = theta.astype(mxu_dtype)
            d_theta_g = jnp.zeros((tile_u, lanes), jnp.float32)

        off = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        phi = phi_out[pl.ds(off, tile_v), :]   # (TILE_V, lanes) view
        phi_mx = phi.astype(mxu_dtype)
        # One-hot encodings (exact in bf16: entries are 0/1). Gather side
        # is (B/8, TILE); scatter side is built pre-transposed as
        # (TILE, B/8) from the host-transposed ids, so every matmul
        # contracts over the lhs lane axis — Mosaic never transposes a
        # one-hot.
        if not batch_theta:
            oh_u = (iota_u == u3[:, k : k + 1]).astype(mxu_dtype)
        oh_v = (iota_v == v3[:, k : k + 1]).astype(mxu_dtype)
        if not scatter_dg:
            oht_u = (iota_ut == ut3[k : k + 1, :]).astype(mxu_dtype)
            oht_v = (iota_vt == vt3[k : k + 1, :]).astype(mxu_dtype)

        # Fused gathers: factors, bias, and the homogeneous 1 in one MXU
        # pass per side.
        if batch_theta:
            t = tt[k * sub : (k + 1) * sub, :]
        else:
            t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
        p = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)

        # Homogeneous rows: rowsum(t*p) = t.p + bu*1 + 1*bv — no masks.
        wk = w3[:, k : k + 1]
        if mxu_pred:
            pred = jnp.dot(
                (t * p).astype(mxu_dtype), ones_mx,
                preferred_element_type=jnp.float32,
            ) + gb                                        # (B/8, lanes)
        else:
            pred = jnp.sum(t * p, axis=1, keepdims=True) + gb
        err = (eta * wk) * (r3[:, k : k + 1] - pred)  # (B/8, 1 | lanes)

        if ablate == 2:  # gather + pred only: no scatter, no applies
            sink += jnp.sum(err[:, :1])
            continue

        # Fused scatters: err*p delivers factor deltas AND (via phi's
        # one-lane) the bias delta; w in the count lane. The garbage this
        # writes into the opposite one-lane dies at the tile apply.
        rhs_u = (err * p + wk * m_cnt).astype(mxu_dtype)
        rhs_v = (err * t + wk * m_cnt).astype(mxu_dtype)
        if batch_theta:
            ohtu_list.append(oht_u)
            rhsu_list.append(rhs_u)
            d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)
        elif scatter_dg:
            # Contract the sublane axis of the GATHER one-hots: no
            # transposed one-hot construction (halves the one-hot build).
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
            d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)

        if ablate == 3:  # scatter matmuls live, table applies skipped
            sink += jnp.sum(d_phi[0:8, :])
        elif phi_groups == 8:
            # Fully sequential item side: geometric per-occurrence decay
            # (ops/common.py semantics; counts came through the scratch
            # lane) applied NOW so the next column sees this one's updates.
            # The keep/one masks also re-pin the homogeneous lane to 1 and
            # clear the count scratch + scatter garbage.
            k_v = cnt_bcast(d_phi)
            if saturate:
                d_phi = d_phi * sat_scale(k_v)
            phi_out[pl.ds(off, tile_v), :] = (
                decay_mul(phi, k_v, m_keep_v) + d_phi * m_keep_v
            )
        else:
            pending.append((k, off, phi, d_phi))
            if k % pg_w == pg_w - 1:
                for kk, off_, phi_, dphi_ in pending:
                    acc[pl.ds(off_, tile_v), :] += dphi_

                    @pl.when(ap_ref[8 * i + kk] == 1)
                    def _(off_=off_, phi_=phi_):
                        a = acc[pl.ds(off_, tile_v), :]
                        k_v = cnt_bcast(a)
                        if saturate:
                            a = a * sat_scale(k_v)
                        phi_out[pl.ds(off_, tile_v), :] = (
                            decay_mul(phi_, k_v, m_keep_v) + a * m_keep_v
                        )
                        acc[pl.ds(off_, tile_v), :] = jnp.zeros_like(a)

                pending = []

        if k % tg_w == tg_w - 1 and not batch_theta:
            if ablate == 3:
                sink += jnp.sum(d_theta_g[0:8, :])
                continue
            # User tile: apply the group's accumulated deltas and decay.
            k_u = cnt_bcast(d_theta_g)
            if saturate:
                d_theta_g = d_theta_g * sat_scale(k_u)
            theta = decay_mul(theta, k_u, m_keep_u) + d_theta_g * m_keep_u

    if batch_theta:
        # One batched scatter for the whole batch's user-side deltas.
        ohtu_all = jnp.concatenate(ohtu_list, axis=1)   # (TILE_U, 8*sub)
        rhsu_all = jnp.concatenate(rhsu_list, axis=0)   # (8*sub, lanes)
        d_theta_g = jnp.dot(
            ohtu_all, rhsu_all, preferred_element_type=jnp.float32
        )
        k_u = cnt_bcast(d_theta_g)
        if saturate:
            d_theta_g = d_theta_g * sat_scale(k_u)
        theta = decay_mul(theta, k_u, m_keep_u) + d_theta_g * m_keep_u

    if ablate < 4:
        _sink(sink)
        return
    theta_out[:] = theta


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "batch", "dim", "n_gu", "n_gv", "mxu",
        "interpret", "theta_groups", "phi_groups", "scatter_dg",
        "mxu_pred", "mxu_apply", "saturate", "batch_theta", "ablate",
    ),
)
def _run_epoch(
    theta_ext, phi_ext,
    gu, gv, pb, hyper, ap=None,
    *, tile_u, tile_v, batch, dim, n_gu, n_gv, mxu="bfloat16", interpret=False,
    theta_groups=8, phi_groups=8, scatter_dg=False,
    mxu_pred=False, mxu_apply=False, saturate=False, batch_theta=False,
    ablate=4,
):
    assert ablate == 4 or not (batch_theta or scatter_dg), (
        "roofline ablation levels are defined on the standard kernel path"
    )
    assert theta_groups in (1, 2, 4, 8), (
        f"theta_groups must divide the 8 lane columns, got {theta_groups}"
    )
    assert phi_groups in (1, 2, 4, 8), phi_groups
    assert not (batch_theta and (theta_groups != 1 or scatter_dg)), (
        "batch_theta requires theta_groups=1 and transposed one-hots"
    )
    # Packed-id capacity: v rides bits 0-10 (sentinel tile_v must fit 11
    # bits) and u bits 11+; the 3-byte-plane decode is exact below 2^24, so
    # u's sentinel may use up to 13 bits — big ITEM tiles cap at 2047 but
    # user tiles may reach 8191 (the large-catalog geometries use this).
    assert tile_v < UV_BASE and tile_u * UV_BASE + tile_v < (1 << 24), (
        f"packed id streams need tile_v < {UV_BASE} and tile_u <= "
        f"{(1 << 24) // UV_BASE - 1}, got {tile_u}/{tile_v}"
    )
    nb = pb.shape[0]
    check_smem_plan(nb)
    gv = gv.reshape(-1)  # (nb*8,) per-column item-tile indices
    if ap is None:  # apply flags unused when phi_groups == 8
        ap = jnp.ones((nb * 8,), jnp.int32)
    ap = ap.reshape(-1)
    lanes = row_lanes(dim)
    kernel = functools.partial(
        _epoch_kernel,
        tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim, lanes=lanes,
        mxu_dtype=jnp.dtype(mxu), theta_groups=theta_groups,
        phi_groups=phi_groups, scatter_dg=scatter_dg,
        mxu_pred=mxu_pred, mxu_apply=mxu_apply, saturate=saturate,
        batch_theta=batch_theta, ablate=ablate,
    )
    sub = batch // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # gu, gv, ap, hyper
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 56, sub), lambda i, gu, gv, ap, h: (i, 0, 0)),  # planes
            pl.BlockSpec(
                (tile_u, lanes), lambda i, gu, gv, ap, h: (gu[i], 0)
            ),                                                              # theta
            pl.BlockSpec(memory_space=pl.ANY),                              # phi (HBM)
        ],
        out_specs=[
            pl.BlockSpec((tile_u, lanes), lambda i, gu, gv, ap, h: (gu[i], 0)),
            pl.BlockSpec(
                (n_gv * tile_v, lanes), lambda i, gu, gv, ap, h: (0, 0)
            ),
        ],
        scratch_shapes=[
            # deferred-apply accumulator; at phi_groups == 8 (fully
            # sequential item side) the kernel never touches it, so shrink
            # to one sublane block and reclaim half the VMEM budget (lets
            # the item-sharded runner carry ~2x larger phi shards).
            pltpu.VMEM(
                (n_gv * tile_v if phi_groups < 8 else 8, lanes), jnp.float32
            ),
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
        # operand indices include the 4 scalar-prefetch args: theta=5,
        # phi=6 -> outputs 0, 1.
        # v5e has 128 MB of VMEM; the compiler's default 16 MB scoped limit
        # is too tight for the resident item table + unrolled temporaries.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(gu, gv, ap, hyper, pb, theta_ext, phi_ext)
    return theta_ext, phi_ext


def check_smem_plan(nb: int, ints_per_batch: int = 17) -> None:
    """Scalar-prefetch arrays live in the core's ~1 MB SMEM; a plan with
    per-batch gu + 8 gv + 8 ap int32s overflows it around nb ~ 13k (hit at
    Netflix-scale single-chip runs: 100M ratings / B=4096). The slot-major
    kernel streams gv/ap through VMEM instead and has no such limit; other
    paths should shard (--mesh) or stream (--stream) the epoch."""
    if nb * ints_per_batch * 4 > 900_000:
        raise ValueError(
            f"epoch plan has {nb} batches; its scalar-prefetch metadata "
            f"(~{nb * ints_per_batch * 4 // 1024} KiB) exceeds the ~1 MiB "
            "TPU SMEM. Use a larger batch size, the slot-major kernel "
            "(dim <= 61), --mesh sharding, or --stream."
        )


def _apply_flags(gv: np.ndarray, groups: int) -> np.ndarray:
    """1 where column k is the LAST column of its phi group touching its
    item tile (the deferred-apply point in the kernel); (NB, 8) int32."""
    w = 8 // groups
    flags = np.ones_like(gv, np.int32)
    for g0 in range(groups):
        cols = gv[:, g0 * w : (g0 + 1) * w]
        for j in range(w - 1):
            later = (cols[:, j + 1 :] == cols[:, j : j + 1]).any(1)
            flags[:, g0 * w + j] = (~later).astype(np.int32)
    return flags


class PallasEpochRunner:
    """Holds a CellPlan on device and runs fused epochs over it."""

    def __init__(
        self,
        ds: RatingsCOO,
        tile_u: int = 512,
        tile_v: int = 512,
        batch: int = 2048,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        theta_groups=None,
        phi_groups=None,
        n_plans: int = 1,
        scatter_dg: bool = False,
        mxu_pred: bool = True,
        mxu_apply: bool = False,
        balance: bool = False,
        saturate: bool = False,
        nb_round: int = 1,
    ):
        # saturate: per-row window-step cap min(1, (0.2/eta)/k) at apply —
        # makes the fused kernel stable at warm etas on zipfy heads where
        # the staleness envelope (eta * window dups <= 0.2) cannot hold.
        self.saturate = saturate
        self.scatter_dg = scatter_dg
        # balance: serpentine per-tile load equalization (balance_cells) —
        # recovers cell-plan fill on zipfy marginals; exact (pad/trim
        # invert the maps).
        self.nu, self.nv = ds.nu, ds.nv  # pre-relabel row counts for trim
        self._map_u = self._map_v = None
        if balance:
            ds, self._map_u, self._map_v = balance_cells(ds, tile_u, tile_v)
        # MXU-side pred rowsum+broadcast: measured -21%/step at rank 64
        # (ablate_wide64.py widemxu); exact in interpret/f32 mode, one extra
        # bf16 rounding of t*p otherwise (tables are already bf16 on MXU).
        # Above 2 lane groups (dim > 253) the ones_mx matmul costs
        # lanes^2/slot and dominates: auto-disable there (resolved at
        # pad(), when dim is known).
        self.mxu_pred = mxu_pred
        self.mxu_apply = mxu_apply
        batch = cdiv(batch, 8) * 8
        # n_plans > 1 rotates between independently-shuffled cell plans per
        # epoch, restoring between-epoch reshuffling (the reference replays
        # one fixed file order, mf.h:37-44; rotation strictly improves on it
        # at the cost of n_plans x device-resident batch arrays).
        self.plans = [
            prepare_cells(ds, tile_u, tile_v, batch, seed + 7919 * p)
            for p in range(max(1, n_plans))
        ]
        if nb_round > 1:
            # common-multiple batch counts (see pad_plan_nb): near-equal
            # plans/shards collapse onto one compiled kernel
            nbmax = cdiv(
                max(p.u.shape[0] for p in self.plans), nb_round
            ) * nb_round
            self.plans = [pad_plan_nb(p, nbmax) for p in self.plans]
        self.plan = self.plans[0]
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        self.mxu = mxu
        self.interpret = interpret
        # None = adaptive per epoch from duplicate statistics; int = fixed.
        if theta_groups is not None:
            assert theta_groups in (1, 2, 4, 8), (
                f"theta_groups must divide the 8 lane columns, got {theta_groups}"
            )
        if phi_groups is not None:
            assert phi_groups in (1, 2, 4, 8), phi_groups
        self.theta_groups = theta_groups
        self.phi_groups = phi_groups
        self._warned = set()
        # Elementwise max over ALL plans: epoch() rotates plans, and each
        # independent shuffle has its own within-window duplicate profile —
        # the staleness guard must hold for every plan it can pick.
        self._dup_max = None
        self._vdup_max = None
        if theta_groups is None:
            stats = [_dup_stats(p.u, p.tile_u) for p in self.plans]
            self._dup_max = {
                g: max(s[g] for s in stats) for g in (1, 2, 4, 8)
            }
        if phi_groups is None:
            stats = [_dup_stats(p.v, p.tile_v) for p in self.plans]
            self._vdup_max = {
                g: max(s[g] for s in stats) for g in (1, 2, 4, 8)
            }
        self.devs = []
        self.flags = []  # per plan: {phi_groups: (NB, 8) apply flags}
        for plan in self.plans:
            uv = plan.u * UV_BASE + plan.v  # one id stream (see kernel doc)
            # ONE dense bf16 byte-plane stream per plan (stream_planes):
            # no 8->128 lane-pad DMA (probe_floor.py: -1.7us/step) and 1/4
            # the device-resident plan bytes. Built on device (XLA ops).
            self.devs.append((
                jnp.asarray(plan.gu),
                jnp.asarray(plan.gv),
                stream_planes(jnp.asarray(uv), jnp.asarray(plan.r)),
            ))
            self.flags.append({
                g: jnp.asarray(_apply_flags(plan.gv, g)) for g in (1, 2, 4)
            } | {8: jnp.ones_like(jnp.asarray(plan.gv))})
        self.dev = self.devs[0]

    @property
    def n_slots(self) -> int:
        return int(self.plan.u.size)

    def pick_theta_groups(self, eta: float) -> int:
        """Most parallel user-side grouping whose staleness stays safe.

        A user row hit k times in one gather window accumulates k stale
        gradients ~ k*eta*|phi|^2; require eta * max_dups(window) <= 0.2
        (|phi|^2 rarely exceeds ~2.5 for rating-scale data).
        """
        if self.theta_groups is not None:
            return self.theta_groups
        for g in (1, 2, 4, 8):
            if eta * self._dup_max[g] <= 0.2:
                return g
        if not getattr(self, 'saturate', False):
            warn_window_envelope("blocked", "theta", eta, self._dup_max[8],
                             self._warned)
        return 8

    def pick_phi_groups(self, eta: float) -> int:
        """Item-side analogue of pick_theta_groups (deferred-apply window)."""
        if self.phi_groups is not None:
            return self.phi_groups
        for g in (1, 2, 4, 8):
            if eta * self._vdup_max[g] <= 0.2:
                return g
        if not getattr(self, 'saturate', False):
            warn_window_envelope("blocked", "phi", eta, self._vdup_max[8],
                             self._warned)
        return 8

    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0, ablate: int = 4):
        """tables = (theta_ext, phi_ext) in the fused layout; epoch_idx
        rotates between the shuffled plans when n_plans > 1. ablate < 4
        runs a roofline ablation level (timing-only — tables are NOT
        meaningfully updated; see _epoch_kernel)."""
        cap = max(1.0, 0.2 / max(eta, 1e-9))  # window-step cap (sat_scale)
        hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
        plan_i = epoch_idx % len(self.plans)
        pg = self.pick_phi_groups(eta)
        # plans share tile geometry, so n_gu/n_gv/NB may differ only in NB —
        # each distinct NB compiles once and is cached thereafter.
        return _run_epoch(
            tables[0], tables[1], *self.devs[plan_i], hyper,
            self.flags[plan_i][pg],
            tile_u=self.tile_u, tile_v=self.tile_v, batch=self.batch,
            dim=self.dim, n_gu=self.plan.n_gu, n_gv=self.plan.n_gv,
            mxu=self.mxu, interpret=self.interpret,
            theta_groups=self.pick_theta_groups(eta),
            phi_groups=pg, scatter_dg=self.scatter_dg,
            mxu_pred=self.mxu_pred, mxu_apply=self.mxu_apply,
            saturate=self.saturate, ablate=ablate,
        )

    def pad(self, params: MFParams):
        self.dim = params.theta.shape[1]
        if row_lanes(self.dim) > 2 * LANES and self.mxu_pred:
            self.mxu_pred = False  # lanes^2 pred dominates past 2 groups
        self.gb = float(params.gb)
        return pad_params(params, self.plan, self._map_u, self._map_v)

    def trim(self, tables, dim: int | None = None) -> MFParams:
        return split_params(
            tables[0], tables[1], self.nu, self.nv, dim or self.dim, self.gb,
            self._map_u, self._map_v,
        )


def warn_window_envelope(
    kind: str, side: str, eta: float, dups: int, warned: set
) -> None:
    """Once-per-runner-per-side warning when even the most sequential
    grouping (g=8) breaks the deferred-apply staleness envelope
    (eta * max window duplicates > 0.2) — the run proceeds at g=8, but
    on duplicate-heavy (zipfy) data it can diverge SILENTLY (nan tRMSE,
    bias terms first), so say so up front."""
    if side in warned:
        return
    warned.add(side)
    import warnings

    warnings.warn(
        f"{kind} kernel {side}-side staleness envelope exceeded even at "
        f"the most sequential grouping: eta={eta:g} x max window "
        f"duplicates {dups} = {eta * dups:.2f} > 0.2. A row hit that "
        "often inside one deferred-apply window accumulates that many "
        "gradients computed at the same stale point and can diverge "
        "(bias terms first; watch for nan tRMSE). Reduce eta, raise gam "
        "so eta decays faster, or shrink the batch.",
        stacklevel=4,
    )


def _user_dup_stats(plan: CellPlan) -> dict:
    """max within-window user duplicate count, per theta_groups choice."""
    return _dup_stats(plan.u, plan.tile_u)


def _dup_stats(ids: np.ndarray, sentinel: int) -> dict:
    """max within-window duplicate count of any id, per group choice g.

    ids is (NB, B/8, 8) with padded slots carrying ``sentinel``; the window
    for groups=g spans 8//g lane columns of B/8 slots each. Drives the
    adaptive staleness guards (theta_groups / phi_groups). Vectorized (one
    keyed bincount per batch chunk) so plan build stays seconds at
    Netflix/Yahoo scale; chunked over batches to bound memory.
    """
    nb, sub, _ = ids.shape
    out = {g: 0 for g in (1, 2, 4, 8)}
    chunk = max(1, (1 << 23) // (8 * sentinel))  # ~64 MB of int64 counts
    for s0 in range(0, nb, chunk):
        u = ids[s0 : s0 + chunk]
        cb = u.shape[0]
        c_idx = np.broadcast_to(np.arange(8, dtype=np.int64), u.shape)
        b_idx = np.broadcast_to(
            np.arange(cb, dtype=np.int64)[:, None, None], u.shape
        )
        real = u < sentinel  # padded slots carry the tile_u sentinel
        key = ((b_idx * 8 + c_idx) * sentinel + u)[real]
        counts = np.bincount(key, minlength=cb * 8 * sentinel).reshape(
            cb, 8, sentinel
        )
        for g in (1, 2, 4, 8):
            w = 8 // g
            # column c belongs to window c // w: reshape(g, w) groups
            # consecutive columns, matching the kernel's k-loop ranges.
            m = counts.reshape(cb, g, w, sentinel).sum(2).max(initial=0)
            out[g] = max(out[g], int(m))
    return out


def pallas_eligible(params: MFParams, batch_size: int) -> bool:
    """The fused kernel needs dim <= MAX_DIM (253: two 128-lane groups per
    row, row_lanes) and an item table that fits VMEM. Larger catalogs run
    via the item-sharded wrapper (ops/phi_shard.py); larger dims fall back
    to the XLA path (train loop logs the fallback)."""
    dim = params.theta.shape[1]
    nv = params.phi.shape[0]
    vmem_phi = cdiv(nv, 512) * 512 * row_lanes(dim) * 4
    return dim <= MAX_DIM and vmem_phi <= 64 * 1024 * 1024
