"""Dense-cell fused SGD epochs: the rating matrix as tiles, not streams.

Round-5 roofline finding (PERF_NOTES, benchmarks/roofline64.py): the gen-1
one-hot dataflow moves 2*2*(tu+tv)*lanes MXU flops per rating slot — 278k
at the production rank-64 geometry against ~640 useful flops — and its
analytic MXU speed-of-light (1.66 ns/rating) already sits above the 1e9
updates/s gate. No micro-optimization of one-hot gathers can close that.

This kernel replaces gathers/scatters entirely. At plan-build time every
(user-tile x item-tile) CELL of the rating matrix is materialized densely
as two small matrices:

    S[cell][i, j] = sum of ratings of (user i, item j) inside the cell
    W[cell][i, j] = count of those ratings (0 = no rating = mask)

Then one epoch is, per cell, four plain tile matmuls (reference math:
src/mf.h:94-109, batched over the cell window):

    pred  = theta_tile @ phi_tile^T + gb      (homogeneous rows fold the
                                               biases in: pallas_sgd layout)
    E     = S - W * pred                       (one FMA; W doubles as mask
                                               AND multiplicity — duplicate
                                               (u,v) pairs sum exactly as k
                                               sequential grads at one
                                               stale point would)
    d_theta, k_u = [E; W] @ phi_tile           (M-concat: counts ride the
                                               phi one-lane, flat-in-M MXU)
    ... and the transposed S_T/W_T pair for the phi side.

MXU flops per rating: 2 * 6 * tu * tv * lanes / ratings_per_cell =
12*lanes*(nu*nv)/n — DENSITY-driven, tile- and rank-independent below
lanes ~ 256 (ML-10M: ~115k incl. the count concat, vs one-hot's 328k).
Measured probe (benchmarks/probe_dense.py): 1.21 ns/rating at ML-10M
density vs the full one-hot kernel's 3.25.

Applicability gate (dense_eligible): the 4 offset-encoded matrices must
fit HBM — bytes = 4 * padded(nu) * padded(nv) * itemsize (3.0 GB at
ML-10M bf16; Netflix 100M would need 34 GB -> ineligible, stays on the
one-hot kernels; Yahoo likewise).

Staleness window = one cell: a user's ratings within one item tile are
applied from one stale point, the same window one gen-1 plan column holds
(a column IS a cell chunk), with the identical geometric per-occurrence
decay (ops/common.py) and per-row window-step saturation. No shuffle is
needed or used: within a cell, order cannot matter (one stale point);
between cells the visit order is fixed, like the reference's fixed
file-order replay (src/mf.h:37-44).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.mf import MFParams
from tpu_mf.ops.pallas_sgd import (
    cdiv,
    pad_params,
    row_lanes,
    split_params,
)

# HBM the 4 dense matrices may take (device_put'd once per runner).
DENSE_BUDGET = 8 * 1024 ** 3


class DensePlan(NamedTuple):
    flat: np.ndarray  # int32 (n,) flattened (gu, gv, u%tu, v%tv) cell index
    r: np.ndarray     # float32 (n,) ratings
    tile_u: int
    tile_v: int
    n_gu: int
    n_gv: int        # real item tiles (n_gvp = n_gvc * K >= n_gv)
    n_gvp: int
    k_cells: int     # cells per grid step (unroll)
    n_real: int
    max_ku: int      # max per-cell per-user-row count (envelope)
    max_kv: int
    mean_ku: float   # mean count over OCCUPIED (row, cell) pairs
    mean_kv: float
    max_w: int       # max (u, v) pair multiplicity (int8 W eligibility)
    wless: bool      # counts derivable on-chip: unique pairs, no 0 rating

    def host_matrices(self, dtype=np.float32):
        """(s, w, st, wt) as numpy — tests/small shapes only; the runner
        builds them ON DEVICE (the 4 matrices are ~99% zeros at real
        densities, so shipping them through the tunnel is ~100x slower
        than scattering the 8-byte-per-rating COO device-side: 556 s
        upload vs ~0.15 s warm scatter + ~1 s compile at ML-10M shape —
        benchmarks/probe_densify2.py; the tunnel's cold-start minutes
        dominate either way on the first transfer of a process)."""
        shape = (self.n_gu, self.n_gvp, self.tile_u, self.tile_v)
        s = np.zeros(int(np.prod(shape)), np.float32)
        w = np.zeros_like(s)
        np.add.at(s, self.flat, self.r)
        np.add.at(w, self.flat, 1.0)
        s, w = s.reshape(shape).astype(dtype), w.reshape(shape).astype(dtype)
        return s, w, np.swapaxes(s, 2, 3), np.swapaxes(w, 2, 3)


def pick_dense_tiles(nu: int, nv: int) -> tuple[int, int]:
    """Cell tile sizes. 256x256 at ML-10M scale and above; smaller tables
    shrink the tiles so the grid keeps >= ~8 cells per axis — on a 500x300
    table a 256-tile grid is 2x2 and each cell window holds a quarter of
    the dataset, which flat-lined the /verify convergence drive (tRMSE
    0.504 vs 0.46; 2026-08-20). tu can drop to 64 (sublane-aligned); tv
    stays >= 128 (it is the lane axis of the S blocks)."""
    def up(x, q):
        return cdiv(x, q) * q

    tu = min(256, max(64, up(cdiv(nu, 8), 8)))
    tv = min(256, max(128, up(cdiv(nv, 8), 128)))
    return tu, tv


def pick_k_cells(n_gv: int, dim: int) -> int:
    """Cells per grid step. Measured at ML-10M (benchmarks/bench_dense.py):
    128-lane rows want the whole item-tile row per step (k=42: 651-659M/s
    vs 588-607 at k<=21 — fewer grid steps win); 256-lane rows flip (k=7:
    445M/s vs 425 at k=42 — the unroll's VMEM pressure bites first). Cap
    the unroll at 48 cells (compile time) and pick the k that pads n_gv
    least within the target."""
    target = 48 if row_lanes(dim) <= 128 else 8
    chunks = cdiv(n_gv, target)
    return cdiv(n_gv, chunks)


def dense_engage_epoch(eta_at, iters, dim, plan, start=0):
    """First epoch whose eta clears the dense window bound, or None.

    The dense window is one cell: a row hit k times takes k gradients from
    one stale point (saturation caps the step, but cannot recover the lost
    sequential progress — the striped-SGD lesson, PERF_NOTES round 5).
    Calibrated by 15-epoch RMSE-trajectory A/Bs on calibrated ML-10M
    (benchmarks/ab_dense.py, 2026-08-20): at dim>=16 epoch 1 is
    parity-safe at eta*max_k = 5.3 (dim 64: final delta +1.6e-5; dim 128:
    +1.7e-4), at dim 8 epoch 1 breaks (+1.5e-2) and epoch 3 holds
    (+3.4e-4, eta*max_k = 1.77). Thresholds 5.5 / 1.8 round those
    measured operating points.

    Second condition, eta*mean_k <= 0.25: the saturation cap (0.2/eta
    total step per row per cell) must not bind on the TYPICAL row, only
    on zipf heads — when it binds broadly, training stalls rather than
    diverges (the /verify 500x300 drive: eta*mean_k = 1.35 flat-lined at
    tRMSE 0.503 vs 0.46; every parity-clean ML-10M point sits at
    <= 0.068)."""
    bound = 5.5 if dim >= 16 else 1.8
    max_k = max(plan.max_ku, plan.max_kv)
    mean_k = max(plan.mean_ku, plan.mean_kv)
    for it in range(start + 1, iters + 1):
        if eta_at(it) * max_k <= bound and eta_at(it) * mean_k <= 0.25:
            return it
    return None


def prepare_dense(
    ds: RatingsCOO,
    tile_u: int = 256,
    tile_v: int = 256,
    k_cells: int = 8,
    dtype=None,  # kept for interface compat; densification is on-device
) -> DensePlan:
    """Flatten the COO into per-cell indices + envelope stats (host side is
    O(n) bincounts only; the dense matrices themselves are built on device
    by DenseEpochRunner.materialize)."""
    del dtype
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    n_gvp = cdiv(n_gv, k_cells) * k_cells
    total = n_gu * n_gvp * tile_u * tile_v
    assert total < 2 ** 31, total  # int32 flat index (dense_eligible caps)
    u = ds.u.astype(np.int64)
    v = ds.v.astype(np.int64)
    gu, ul = u // tile_u, u % tile_u
    gv, vl = v // tile_v, v % tile_v
    flat = ((gu * n_gvp + gv) * tile_u + ul) * tile_v + vl
    # sorted COO: the XLA scatter-add takes indices_are_sorted (measured
    # 13.3 s -> 1.2 s first call at 10M, benchmarks/probe_densify2.py),
    # and the host argsort is ~1.5 s once per plan
    order = np.argsort(flat, kind="stable")
    flat = flat[order]
    r = ds.r[order]
    # envelope stats: per-cell per-row rating counts via compound keys
    ku = np.bincount(u * n_gv + gv, minlength=1)
    kv = np.bincount(v * n_gu + gu, minlength=1)
    # max (u, v) pair multiplicity = longest run in the sorted flat index
    if len(flat) > 1:
        bnd = np.flatnonzero(np.diff(flat))
        runs = np.diff(np.concatenate([[-1], bnd, [len(flat) - 1]]))
        max_w = int(runs.max())
    else:
        max_w = len(flat)
    return DensePlan(
        flat=flat.astype(np.int32), r=r.astype(np.float32),
        tile_u=tile_u, tile_v=tile_v,
        n_gu=n_gu, n_gv=n_gv, n_gvp=n_gvp, k_cells=k_cells, n_real=len(ds),
        max_ku=int(ku.max()), max_kv=int(kv.max()),
        mean_ku=float(len(ds) / max(1, (ku > 0).sum())),
        mean_kv=float(len(ds) / max(1, (kv > 0).sum())),
        max_w=max_w,
        # real rating datasets (ML/Netflix/Yahoo) have unique (u, v) pairs
        # and no 0.0 ratings: W == (S != 0) can be derived ON CHIP, so the
        # W/WT streams (1/3 of the epoch's HBM traffic) need not exist
        wless=bool(max_w == 1 and np.all(r != 0.0)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_gu", "n_gvp", "tile_u", "tile_v", "out_dtype"),
)
def _densify_pair(flat, vals, *, n_gu, n_gvp, tile_u, tile_v, out_dtype):
    """Scatter-add the COO into one (n_gu, n_gvp, tu, tv) matrix + its
    in-cell transpose, f32 accumulate -> out_dtype. Runs where the arrays
    will live (TPU HBM; CPU under tests)."""
    total = n_gu * n_gvp * tile_u * tile_v
    x = jnp.zeros((total,), jnp.float32).at[flat].add(
        vals, indices_are_sorted=True)
    x4 = x.reshape(n_gu, n_gvp, tile_u, tile_v)
    return x4.astype(out_dtype), jnp.swapaxes(x4, 2, 3).astype(out_dtype)


def _as_f32(x):
    """int8 counts -> f32 via int32 (uint/int8 -> f32 direct casts do not
    lower in this Mosaic version); everything else casts directly."""
    if x.dtype == jnp.int8:
        return x.astype(jnp.int32).astype(jnp.float32)
    return x.astype(jnp.float32)


def _dense_kernel(
    hyper_ref,
    *refs,
    tile_u: int, tile_v: int, k_cells: int, dim: int, lanes: int,
    mxu_dtype, saturate: bool, ablate: int = 0, wless: bool = False,
):
    if wless:
        # unique pairs + nonzero ratings: counts are the S != 0 mask
        (s_ref, st_ref, theta_ref, phi_hbm,
         theta_out, phi_out, sem) = refs
        w_ref = wt_ref = None
    else:
        (s_ref, w_ref, st_ref, wt_ref, theta_ref, phi_hbm,
         theta_out, phi_out, sem) = refs
    eta = hyper_ref[0]
    lam = hyper_ref[1]
    gb = hyper_ref[2]
    cap = hyper_ref[3]

    i = pl.program_id(0)          # user tile
    j = pl.program_id(1)          # item-tile chunk of k_cells cells

    @pl.when((i == 0) & (j == 0))
    def _():
        cp = pltpu.make_async_copy(phi_hbm, phi_out, sem)
        cp.start()
        cp.wait()

    # theta state lives in the out ref across the j-steps of one tile run
    # (same persistence rule the gen-1 kernel relies on).
    @pl.when(j == 0)
    def _():
        theta_out[:] = theta_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    m_keep_u = (lane <= dim).astype(jnp.float32)
    m_keep_v = ((lane < dim) | (lane == dim + 1)).astype(jnp.float32)
    lameta = 1.0 - eta * lam
    ln_lameta = jnp.log(lameta)

    def decay(cur, k, m_keep):
        dec = jnp.exp(k * ln_lameta)                 # (tile, 1)
        return cur * (1.0 + m_keep * (dec - 1.0))

    def sat(k):
        return jnp.minimum(1.0, cap / jnp.maximum(k, 1.0))

    if ablate == 2:
        # DMA-only grid walk: touch every stream, no matmuls/applies —
        # separates the S/W stream bandwidth from compute (overlap probe).
        acc = jnp.zeros((1, lanes), jnp.float32)
        for k in range(k_cells):
            acc += jnp.sum(_as_f32(s_ref[0, k])) + jnp.sum(
                _as_f32(st_ref[0, k]))
            if not wless:
                acc += jnp.sum(_as_f32(w_ref[0, k])) + jnp.sum(
                    _as_f32(wt_ref[0, k]))
        theta_out[:] = theta_ref[:] + 1e-30 * acc
        return

    theta = theta_out[:]
    for k in range(k_cells):
        off = pl.multiple_of((j * k_cells + k) * tile_v, tile_v)
        phi_t = phi_out[pl.ds(off, tile_v), :]
        tb = theta.astype(mxu_dtype)
        pb = phi_t.astype(mxu_dtype)
        dn = (((1,), (1,)), ((), ()))               # contract lane axes

        # user side. Per-row update counts are plain W row-sums on the
        # VPU — the round-4 design pushed them through a [E; W] M-concat
        # matmul, which DOUBLED the gather-side MXU flops (12 -> 8 tile
        # matmul units per cell once both sides drop the concat).
        pred = jax.lax.dot_general(
            tb, pb, dn, preferred_element_type=jnp.float32) + gb
        sm = _as_f32(s_ref[0, k])                   # (tu, tv)
        wm = ((sm != 0.0).astype(jnp.float32) if wless
              else _as_f32(w_ref[0, k]))
        e = (sm - wm * pred).astype(mxu_dtype)
        d_th = jnp.dot(e, pb, preferred_element_type=jnp.float32)
        k_u = jnp.sum(wm, axis=1, keepdims=True)

        # item side (transposed copies; old theta, like the gen-1
        # column's rhs_v = err * t_old)
        predt = jax.lax.dot_general(
            pb, tb, dn, preferred_element_type=jnp.float32) + gb
        smt = _as_f32(st_ref[0, k])                 # (tv, tu)
        wmt = ((smt != 0.0).astype(jnp.float32) if wless
               else _as_f32(wt_ref[0, k]))
        et = (smt - wmt * predt).astype(mxu_dtype)
        d_ph = jnp.dot(et, tb, preferred_element_type=jnp.float32)
        k_v = jnp.sum(wmt, axis=1, keepdims=True)

        d_th = d_th * eta
        d_ph = d_ph * eta
        if saturate:
            d_th = d_th * sat(k_u)
            d_ph = d_ph * sat(k_v)
        theta = decay(theta, k_u, m_keep_u) + d_th * m_keep_u
        phi_out[pl.ds(off, tile_v), :] = (
            decay(phi_t, k_v, m_keep_v) + d_ph * m_keep_v
        )
    theta_out[:] = theta


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "k_cells", "dim", "n_gu", "n_gvp", "mxu",
        "interpret", "saturate", "ablate",
    ),
)
def _run_dense_epoch(
    theta_ext, phi_ext, s, w, st, wt, hyper,
    *, tile_u, tile_v, k_cells, dim, n_gu, n_gvp,
    mxu="bfloat16", interpret=False, saturate=True, ablate=0,
):
    lanes = row_lanes(dim)
    n_gvc = n_gvp // k_cells
    wless = w is None
    kernel = functools.partial(
        _dense_kernel,
        tile_u=tile_u, tile_v=tile_v, k_cells=k_cells, dim=dim,
        lanes=lanes, mxu_dtype=jnp.dtype(mxu), saturate=saturate,
        ablate=ablate, wless=wless,
    )
    # 4D (n_gu, n_gvp, t, t) arrays blocked (1, k_cells, t, t): k_cells is
    # purely a grid-step unroll knob — no reshape of the device arrays (a
    # jnp.reshape materializes a 1.5GB copy per variant; three variants
    # OOMed the chip).
    cell_u = pl.BlockSpec((1, k_cells, tile_u, tile_v),
                          lambda i, j, h: (i, j, 0, 0))
    cell_v = pl.BlockSpec((1, k_cells, tile_v, tile_u),
                          lambda i, j, h: (i, j, 0, 0))
    in_specs = [cell_u] + ([] if wless else [cell_u]) + [cell_v] + (
        [] if wless else [cell_v]) + [
        pl.BlockSpec((tile_u, lanes), lambda i, j, h: (i, 0)),
        pl.BlockSpec(memory_space=pl.ANY),      # phi (HBM)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # hyper
        grid=(n_gu, n_gvc),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_u, lanes), lambda i, j, h: (i, 0)),
            pl.BlockSpec((n_gvp * tile_v, lanes), lambda i, j, h: (0, 0)),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    # operands after the scalar-prefetch arg:
    #   s=1 w=2 st=3 wt=4 theta=5 phi=6   (wless: s=1 st=2 theta=3 phi=4)
    operands = ((hyper, s, st, theta_ext, phi_ext) if wless
                else (hyper, s, w, st, wt, theta_ext, phi_ext))
    alias_base = 3 if wless else 5
    theta_ext, phi_ext = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_gu * tile_u, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_gvp * tile_v, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        input_output_aliases={alias_base: 0, alias_base + 1: 1},
        interpret=interpret,
    )(*operands)
    return theta_ext, phi_ext


class DenseEpochRunner:
    """Holds the dense cell matrices on device and runs fused epochs.

    Drop-in counterpart of PallasEpochRunner (pad/epoch/trim, same fused
    table layout) for datasets whose dense matrices fit HBM
    (dense_eligible). No n_plans: the cell window makes within-cell order
    irrelevant and the cell partition is data-determined, so there is
    nothing a reshuffle could change."""

    def __init__(
        self,
        ds: RatingsCOO,
        tile_u: int | None = None,    # None -> pick_dense_tiles
        tile_v: int | None = None,
        k_cells: int | None = None,   # None -> pick_k_cells (needs dim)
        seed: int = 0,          # accepted for interface parity; unused
        mxu: str = "bfloat16",
        interpret: bool = False,
        saturate: bool = True,
        dtype=None,
        dim: int | None = None,
        wless: bool = False,
    ):
        # wless (drop the W/WT streams, derive counts from S != 0 on chip)
        # measured NEGATIVE at ML-10M density (761 vs 807 M/s at d8,
        # benchmarks/bench_dense.py --unique, 2026-08-20): the streamed-W
        # kernel hides ALL compute under its 12.3 ms DMA walk, while the
        # mask compute pushes the W-less kernel 2.7 ms past its 10.5 ms
        # walk. Kept as an option for bandwidth-starved variants.
        self.use_wless = wless
        del seed
        if tile_u is None or tile_v is None:
            pu, pv = pick_dense_tiles(ds.nu, ds.nv)
            tile_u, tile_v = tile_u or pu, tile_v or pv
        if k_cells is None:
            k_cells = pick_k_cells(cdiv(ds.nv, tile_v), dim or 8)
        self.saturate = saturate
        self.nu, self.nv = ds.nu, ds.nv
        self.mxu = mxu
        self.interpret = interpret
        if dtype is None:
            # parity/interpret runs keep ratings exact; production trades
            # ~1e-2 rating quantization for half the HBM/DMA
            dtype = np.float32 if mxu == "float32" else ml_dtypes.bfloat16
        self.dtype = dtype
        self.plan = prepare_dense(ds, tile_u, tile_v, k_cells)
        self.tile_u, self.tile_v = tile_u, tile_v
        self.k_cells = k_cells
        self._dev = None
        self._warned = set()

    # --- envelope -------------------------------------------------------
    def envelope_ok(self, eta: float) -> bool:
        """Window = one cell. With saturation the per-row step is capped
        in-kernel exactly like the slot SGLD treatment; without it the
        plain eta * max-cell-count bound applies."""
        if self.saturate:
            return True
        return eta * max(self.plan.max_ku, self.plan.max_kv) <= 0.2

    @property
    def n_slots(self) -> int:
        return int(self.plan.n_gu * self.plan.n_gvp
                   * self.plan.tile_u * self.plan.tile_v)

    def materialize(self):
        """Scatter the COO into the dense S/W/ST/WT matrices ON DEVICE.

        Uploads only the 8-byte-per-rating COO; the ~99%-zero matrices are
        built by two XLA scatter-adds + in-cell transposes (sorted-index
        scatter: ~1.2 s first call, ~0.15 s warm at ML-10M shape —
        benchmarks/probe_densify2.py)."""
        if self._dev is None:
            p = self.plan
            flat = jnp.asarray(p.flat)
            kw = dict(n_gu=p.n_gu, n_gvp=p.n_gvp, tile_u=p.tile_u,
                      tile_v=p.tile_v, out_dtype=jnp.dtype(self.dtype))
            s, st = _densify_pair(flat, jnp.asarray(p.r), **kw)
            if p.wless and self.use_wless:
                # unique pairs, no zero ratings: W == (S != 0) in-kernel;
                # the W/WT streams (1/3 of epoch HBM traffic) don't exist
                w = wt = None
            else:
                # counts are small exact ints: int8 streams halve the
                # W-side HBM traffic vs bf16 (exact <= 127 dups per pair)
                if p.max_w <= 127:
                    kw["out_dtype"] = jnp.int8
                w, wt = _densify_pair(flat, jnp.ones_like(p.r), **kw)
            self._dev = (s, w, st, wt)
        return self

    @property
    def dev(self):
        return self.materialize()._dev

    # --- training -------------------------------------------------------
    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0):
        del epoch_idx  # single static plan (see class docstring)
        cap = max(1.0, 0.2 / max(eta, 1e-9))
        hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
        s, w, st, wt = self.dev
        return _run_dense_epoch(
            tables[0], tables[1], s, w, st, wt, hyper,
            tile_u=self.tile_u, tile_v=self.tile_v,
            k_cells=self.k_cells, dim=self.dim,
            n_gu=self.plan.n_gu, n_gvp=self.plan.n_gvp,
            mxu=self.mxu, interpret=self.interpret,
            saturate=self.saturate,
        )

    def pad(self, params: MFParams):
        self.materialize()
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        # pad_params sizes tables from a plan view: n_gu/tile_u and
        # n_gv/tile_v attrs are all it reads.
        view = _DensePlanView(self.plan)
        return pad_params(params, view)

    def trim(self, tables, dim: int | None = None) -> MFParams:
        return split_params(
            tables[0], tables[1], self.nu, self.nv, dim or self.dim,
            self.gb,
        )


class _DensePlanView:
    """Adapter: pad_params reads n_gu/tile_u/n_gv/tile_v off a CellPlan."""

    def __init__(self, plan: DensePlan):
        self.n_gu, self.tile_u = plan.n_gu, plan.tile_u
        self.n_gv, self.tile_v = plan.n_gvp, plan.tile_v


def dense_eligible(
    params: MFParams, ds: RatingsCOO, budget: int = DENSE_BUDGET,
    tile_u: int | None = None, tile_v: int | None = None,
) -> bool:
    """True when the 4 dense matrices fit the HBM budget and the fused row
    width fits VMEM residency for phi (same check as pallas_eligible)."""
    if tile_u is None or tile_v is None:
        pu_, pv_ = pick_dense_tiles(ds.nu, ds.nv)
        tile_u, tile_v = tile_u or pu_, tile_v or pv_
    dim = params.theta.shape[1]
    try:
        lanes = row_lanes(dim)
    except AssertionError:
        return False
    pu = cdiv(ds.nu, tile_u) * tile_u
    pv = cdiv(ds.nv, tile_v) * tile_v
    dense_bytes = 4 * pu * pv * 2  # S/W/ST/WT bf16
    vmem_phi = pv * lanes * 4
    return dense_bytes <= budget and vmem_phi <= 64 * 1024 * 1024
