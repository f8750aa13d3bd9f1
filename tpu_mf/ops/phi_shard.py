"""Item-sharded fused SGD epochs for catalogs larger than VMEM.

Every fused kernel generation keeps its padded item table VMEM-resident for
the whole epoch (ops/pallas_sgd.py module docstring), so `pallas_eligible`
gates on the table fitting ~tens of MB — and the reference's own Yahoo
workload (nu=1,000,990, nv=624,961; reference src/run.py:6-9) was ineligible
at EVERY dim, silently falling to the ~7 M updates/s XLA path. This module
removes the assumption at the dispatch level instead of inside the kernel:

* The item axis is relabeled with the same serpentine per-tile load balance
  the single-call path uses (pallas_sgd.balance_cells) and split into K
  contiguous shards whose padded tables each fit a VMEM budget. Because the
  balance map equalizes EVERY tile's load, contiguous tile ranges are
  load-equal too — shards get the same work without any extra machinery.
* An epoch runs K fused sub-epochs back to back, chaining the (donated)
  user table through. Sequential semantics are preserved: shard k's theta
  updates are visible to shard k+1, and each shard's items see exactly the
  single-call within-shard schedule. Theta makes K HBM round trips per
  epoch instead of one (~2*K*nu*lanes*4 bytes — tens of ms at Yahoo scale)
  plus K-1 extra dispatches; both are noise against 100M+ ratings of
  compute.
* Yahoo-scale catalogs are also SPARSE per (user-tile x item-tile) cell
  (~50 ratings per 256x512 cell at 250M ratings), which would collapse the
  cell plan's fill. pick_cell_geometry_large therefore opens the tile
  domain up to (8191, 2040) — the byte-plane id stream carries 24 exact
  bits, 11 for v and 13 for u (pallas_sgd.stream_planes) — trading one-hot
  matmul width (cost ~ tile_u + tile_v per rating) for cell density, and
  scores fill/cost directly.
* Per-shard batch counts are rounded up to a common multiple (sentinel
  batches: all-pad columns on the last real user tile), so every shard
  reuses ONE Mosaic compilation.

Interface matches PallasEpochRunner (pad/epoch/trim); tables are
(theta_ext, [phi_shard_0, ..., phi_shard_{K-1}]).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.mf import MFParams
from tpu_mf.ops.pallas_sgd import (
    PallasEpochRunner,
    _tile_balance_map,
    cdiv,
    fuse_rows,
    row_lanes,
    split_params,
)

# Per-shard resident phi bytes. The kernel's VMEM high-water mark is the
# resident shard + (at phi_groups < 8) a same-size deferred-apply scratch +
# one-hot temporaries; 36 MB keeps the worst case under the 100 MB limit.
PHI_SHARD_BUDGET = 36 * 1024 * 1024


def pick_cell_geometry_large(
    ds: RatingsCOO, lanes: int = 128
) -> Tuple[int, int, int]:
    """(tile_u, tile_v, batch) for low-density (large-catalog) cell plans.

    pick_cell_geometry's fill terms, extended with the matmul cost the
    dense chooser could ignore (its tiles were fixed small): per rating the
    kernel pays ~4*lanes*(tile_u + tile_v) one-hot-matmul flops, so score =
    fill / cost with cost = (tu + tv)/768 * (1 + 94/sub) (the 768
    normalizes to the validated dense geometry tu256+tv512; 94/sub is the
    measured per-column fixed-work constant, pallas_sgd_slot.pick_sub).
    Tile domain: tu <= 4096, tv <= 2040 (byte-plane id capacity), with
    one-hot temporaries bounded so the biggest geometries stay in VMEM."""
    n = len(ds)
    best = (1024, 1024, 8 * 512)
    best_score = -1.0
    for tu in (512, 1024, 2048, 4096):
        n_gu = cdiv(ds.nu, tu)
        for tv in (256, 512, 1024, 1536, 2040):
            n_gv = cdiv(ds.nv, tv)
            gloss = n_gv / (cdiv(n_gv, 8) * 8)
            c = n / (n_gu * n_gv)
            for sub in (512, 768, 1024):
                # one-hot temporaries: gather+scatter per side, bf16
                if 4 * sub * (tu + tv) * 2 > 48 * 1024 * 1024:
                    continue
                blocks = max(1, cdiv(int(c * 1.12), sub))
                fill = c / (blocks * sub) * gloss
                cost = (tu + tv) / 768.0 * (1.0 + 94.0 / sub)
                score = fill / cost
                if score > best_score:
                    best_score = score
                    best = (tu, tv, 8 * sub)
    return best


def phi_shard_tiles(nv_pad: int, tile_v: int, dim: int,
                    budget: int = PHI_SHARD_BUDGET) -> Tuple[int, int]:
    """(tiles per shard, shard count) so each shard's padded fused table
    fits ``budget`` bytes of VMEM."""
    lanes = row_lanes(dim)
    tiles_total = nv_pad // tile_v
    rows_budget = max(tile_v, budget // (lanes * 4))
    tiles_fit = max(1, rows_budget // tile_v)
    n_shards = cdiv(tiles_total, tiles_fit)
    tiles_per = cdiv(tiles_total, n_shards)  # equalize instead of maxing
    return tiles_per, cdiv(tiles_total, tiles_per)


class PhiShardedRunner:
    """PallasEpochRunner-compatible runner for item tables beyond VMEM.

    Tables are (theta_ext, [phi_shard_k]); see the module docstring for the
    schedule and cost model. ``dim`` must be <= pallas_sgd.MAX_DIM."""

    def __init__(
        self,
        ds: RatingsCOO,
        dim: int,
        tile_u: int | None = None,
        tile_v: int | None = None,
        batch: int | None = None,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        n_plans: int = 1,
        saturate: bool = True,
        budget: int = PHI_SHARD_BUDGET,
        theta_groups=None,
        phi_groups=None,
        nb_round: int = 256,
    ):
        lanes = row_lanes(dim)
        if tile_u is None or tile_v is None or batch is None:
            tile_u, tile_v, batch = pick_cell_geometry_large(ds, lanes)
        self.nu, self.nv = ds.nu, ds.nv
        self.nu_pad = cdiv(ds.nu, tile_u) * tile_u
        nv_pad = cdiv(ds.nv, tile_v) * tile_v
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        tiles_per, self.n_shards = phi_shard_tiles(
            nv_pad, tile_v, dim, budget
        )
        self.shard_rows = tiles_per * tile_v
        self.nv_pad = self.n_shards * self.shard_rows

        # Global serpentine balance on both axes (exact training: the maps
        # relocate rows; pad/trim invert them). Shards = contiguous tile
        # ranges of the balanced item axis -> load-equal by construction.
        self._map_u = _tile_balance_map(
            np.bincount(ds.u, minlength=ds.nu), tile_u
        )
        self._map_v = _tile_balance_map(
            np.bincount(ds.v, minlength=ds.nv), tile_v
        )
        ub = self._map_u[ds.u]
        vb = self._map_v[ds.v]
        self.inners = []
        for k in range(self.n_shards):
            m = (vb >= k * self.shard_rows) & (
                vb < (k + 1) * self.shard_rows
            )
            ds_k = RatingsCOO(
                u=ub[m], v=(vb[m] - k * self.shard_rows), r=ds.r[m],
                nu=self.nu_pad, nv=self.shard_rows,
            )
            self.inners.append(PallasEpochRunner(
                ds_k, tile_u=tile_u, tile_v=tile_v, batch=batch,
                seed=seed + 101 * k, mxu=mxu, interpret=interpret,
                n_plans=n_plans, balance=False, saturate=saturate,
                theta_groups=theta_groups, phi_groups=phi_groups,
                nb_round=nb_round,
            ))

    @property
    def n_slots(self) -> int:
        return sum(r.n_slots for r in self.inners)

    def pad(self, params: MFParams):
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        lanes = row_lanes(self.dim)
        for inner in self.inners:
            inner.dim, inner.gb = self.dim, self.gb
        theta = fuse_rows(
            params.theta, params.bu, self.nu_pad, lanes, "u", self._map_u
        )
        phi = fuse_rows(
            params.phi, params.bv, self.nv_pad, lanes, "v", self._map_v
        )
        S = self.shard_rows
        return theta, [phi[k * S:(k + 1) * S] for k in range(self.n_shards)]

    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0):
        theta, phis = tables
        out = []
        for k, inner in enumerate(self.inners):
            theta, phi_k = inner.epoch(
                (theta, phis[k]), eta, lam, gb, epoch_idx=epoch_idx
            )
            out.append(phi_k)
        return theta, out

    def trim(self, tables, dim: int | None = None) -> MFParams:
        theta, phis = tables
        return split_params(
            theta, jnp.concatenate(phis, axis=0), self.nu, self.nv,
            dim or self.dim, self.gb, self._map_u, self._map_v,
        )
