"""Multi-chip adaptive-regularization MF on the SLOT-MAJOR fused kernel.

Gen-2 mesh path for admf (round-3 VERDICT #3): the round-2/3 mesh pinned
every device to the gen-1 AdaptReg kernel (parallel/adreg_sharded.py, ~29M/s
class single-chip), so scaling out multiplied the slowest kernel generation.
Here each device runs the slot-major AdaptReg kernel
(ops/pallas_adreg_slot.py — measured ~10x the gen-1 kernel at rank 8) over
its (device, substep) diagonal block, with slot-major item shards riding the
ppermute ring.

The lambda hypergradient (reference: src/admf.h:82-83, model.h:86-102) runs
BETWEEN substeps on the global sharded tables with plain jitted gathers, as
in the gen-1 sharded runner — but position mapping must compose the ring
rotation with the slot-major physical layout: global item id j at rotation
state s lives at table-local id ((j // chunk_v - s) mod P) * chunk_v +
j % chunk_v, and _gather_slot_rows maps THAT id through the slot layout
(chunk_v is a multiple of both tile and pack, so id % tile and id % P are
rotation-invariant).
"""

from __future__ import annotations

from functools import lru_cache

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.admf import AdaptRegState
from tpu_mf.models.mf import MFParams
from tpu_mf.ops import pallas_adreg_slot
from tpu_mf.ops.pallas_adreg_slot import _gather_slot_rows, _slot_hypergrad
from tpu_mf.ops.pallas_sgd import LANES, UV_BASE, _apply_flags, cdiv
from tpu_mf.ops.pallas_sgd_slot import (
    pack_params_slot,
    slot_packing_factor,
    unpack_params_slot,
)
from tpu_mf.parallel.mesh import AXIS, row_sharding
from tpu_mf.parallel.slot_common import (
    SlotPlanView,
    diagonal_dup_stats,
    partition_slot_diagonal,
)


@lru_cache(maxsize=None)
def _substep_fn(
    mesh: Mesh, n_dev: int, tile: int, sub: int, dim: int, pack: int,
    n_gu: int, n_gv: int, mxu: str, interpret: bool,
    theta_groups: int, phi_groups: int, loss: int, striped: bool = False,
):
    spec_rows = PartitionSpec(AXIS)
    spec_data = PartitionSpec(AXIS)
    spec_repl = PartitionSpec()
    perm = [((i + 1) % n_dev, i) for i in range(n_dev)]

    def substep(theta_s, phi_s, gu, gv, ap, hyper, lamvec, uv, uvt, r):
        theta_s, phi_s = pallas_adreg_slot._run_slot_adreg_segment(
            theta_s, phi_s, gu[0], gv[0], ap[0], hyper, lamvec,
            uv[0], uvt[0], r[0],
            tile_u=tile, tile_v=tile, sub=sub, dim=dim, pack=pack,
            n_gu=n_gu, n_gv=n_gv, mxu=mxu, interpret=interpret,
            theta_groups=theta_groups, phi_groups=phi_groups, loss=loss,
            striped=striped,
        )
        phi_s = jax.lax.ppermute(phi_s, AXIS, perm)
        return theta_s, phi_s

    return jax.jit(
        jax.shard_map(
            substep,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows) + (spec_data,) * 3
            + (spec_repl, spec_repl) + (spec_data,) * 3,
            out_specs=(spec_rows, spec_rows),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


class ShardedSlotAdRegRunner:
    """Multi-chip slot-major fused AdaptReg epochs: P diagonal substeps per
    epoch, lambda hypergradient between substeps. Interface-compatible with
    ShardedAdRegRunner (pad/epoch/trim/state)."""

    def __init__(
        self,
        train_ds: RatingsCOO,
        valid_ds: RatingsCOO,
        mesh: Mesh,
        dim: int,
        sub: int | None = None,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        loss: int = 0,
        n_reg_samples: int = 64,
        tile: int | None = None,
        balance: bool = False,
        theta_groups=None,
        phi_groups=None,
        striped: bool = False,
    ):
        self.striped = striped
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        P = self.n_dev
        pack = slot_packing_factor(dim)
        assert pack in (2, 4, 8), (
            f"slot AdaptReg needs dim <= 61, got {dim}"
        )
        self.pack = pack
        tile = tile or 128 * pack
        self.tile = tile
        self.nu, self.nv = train_ds.nu, train_ds.nv
        self.mxu, self.interpret, self.loss = mxu, interpret, loss
        self.n_reg_samples = n_reg_samples
        self.theta_groups, self.phi_groups = theta_groups, phi_groups
        self._map_u = self._map_v = None
        if balance:
            from tpu_mf.ops.pallas_sgd_slot import balance_dataset

            # within-tile LPT only (cross-tile would cross device shards);
            # validation ids ride the same maps — hypergradient gathers hit
            # the RELABELED tables
            train_ds, self._map_u, self._map_v = balance_dataset(
                train_ds, tile, tile, pack, cross_tile=False
            )
            valid_ds = dataclasses.replace(
                valid_ds, u=self._map_u[valid_ds.u],
                v=self._map_v[valid_ds.v],
                nu=train_ds.nu, nv=train_ds.nv,
            )
        self.diag = partition_slot_diagonal(
            train_ds, P, tile, pack, sub, seed, striped=striped
        )
        self.sub = self.diag.sub
        self._dup_max, self._vdup_max = diagonal_dup_stats(
            self.diag, pack, tile
        )
        rows = tile // pack
        shard = row_sharding(mesh)
        self.dev = []
        self.flags = []
        from tpu_mf.ops.common import distinct_counts
        from tpu_mf.ops.pallas_sgd_slot import slot_col_ids

        visits = np.zeros(P, np.float32)
        for s in range(P):
            u, v, r = self.diag.u[s], self.diag.v[s], self.diag.r[s]
            gv = self.diag.gv[s]
            gu = self.diag.gu[s]
            uv = u * UV_BASE + v
            self.dev.append(tuple(
                jax.device_put(jnp.asarray(x), shard)
                for x in (gu, gv, uv, np.swapaxes(uv, 2, 3).copy(), r)
            ))
            self.flags.append({
                g: jax.device_put(
                    jnp.asarray(np.stack([
                        _apply_flags(np.asarray(gv[p]), g) for p in range(P)
                    ])),
                    shard,
                )
                for g in (1, 2, 4)
            } | {8: jax.device_put(jnp.ones_like(jnp.asarray(gv)), shard)})
            # distinct users per (device, batch) -> per-substep visit count
            # (scales the hypergradient like the reference's per-user cadence)
            nb = self.diag.nb[s]
            for p in range(P):
                ids = slot_col_ids(u[p], pack)
                real = ids < tile
                full = ids + gu[p][:, None, None] * tile
                visits[s] += float(distinct_counts(
                    full.reshape(nb, -1), real.reshape(nb, -1)
                ).sum())
        self.visits_per_substep = visits
        self.valid = (
            jnp.asarray(valid_ds.u.astype(np.int32)),
            jnp.asarray(valid_ds.v.astype(np.int32)),
            jnp.asarray(valid_ds.r),
        )
        self.chunk_v = self.diag.chunk_v

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
        view = SlotPlanView(
            self.tile, self.n_dev, self.diag.n_gu, self.diag.n_gv, self.pack
        )
        theta_s, phi_s = pack_params_slot(
            state.params, view, self._map_u, self._map_v
        )
        shard = row_sharding(self.mesh)
        return jax.device_put(theta_s, shard), jax.device_put(phi_s, shard)

    def _rot_item_id(self, j: jax.Array, s: int) -> jax.Array:
        """Table-local id of global item j in the rotated phi at state s."""
        g = j // self.chunk_v
        return ((g - s) % self.n_dev) * self.chunk_v + j % self.chunk_v

    def _lamvec(self):
        m = LANES // self.pack
        lu = jnp.zeros((m,), jnp.float32)
        lu = lu.at[: self.dim].set(self.lams[0]).at[self.dim].set(
            self.lams[2]
        )
        lv = jnp.zeros((m,), jnp.float32)
        lv = lv.at[: self.dim].set(self.lams[1]).at[self.dim + 1].set(
            self.lams[3]
        )
        return jnp.stack([jnp.tile(lu, self.pack), jnp.tile(lv, self.pack)])

    def epoch(self, tables, eta: float, eta_reg: float, key: jax.Array):
        hyper = jnp.asarray([eta, self.gb], jnp.float32)
        uv, vv, rv = self.valid
        tg = self._pick(self._dup_max, self.theta_groups, eta)
        pg = self._pick(self._vdup_max, self.phi_groups, eta)
        for s in range(self.n_dev):
            fn = _substep_fn(
                self.mesh, self.n_dev, self.tile, self.sub, self.dim,
                self.pack, self.diag.n_gu, self.diag.n_gv, self.mxu,
                self.interpret, tg, pg, self.loss, self.striped,
            )
            ks = jax.random.fold_in(key, s)
            sel = jax.random.randint(
                ks, (self.n_reg_samples,), 0, uv.shape[0]
            )
            su, sv_, sr = uv[sel], vv[sel], rv[sel]
            old_t = _gather_slot_rows(tables[0], su, self.tile, self.pack)
            old_p = _gather_slot_rows(
                tables[1], self._rot_item_id(sv_, s), self.tile, self.pack
            )
            gu, gv, uvd, uvt, r = self.dev[s]
            tables = fn(
                tables[0], tables[1], gu, gv, self.flags[s][pg],
                hyper, self._lamvec(), uvd, uvt, r,
            )
            self.lams = _slot_hypergrad(
                tables[0], tables[1], old_t, old_p,
                su, self._rot_item_id(sv_, s + 1), sr, self.lams,
                jnp.float32(eta), jnp.float32(eta_reg),
                jnp.float32(self.visits_per_substep[s]),
                jnp.float32(self.gb),
                dim=self.dim, tile_u=self.tile, tile_v=self.tile,
                pack=self.pack, loss=self.loss,
            )
        return tables

    def trim(self, tables) -> MFParams:
        return unpack_params_slot(
            jnp.asarray(np.asarray(tables[0])),
            jnp.asarray(np.asarray(tables[1])),
            self.nu, self.nv, self.dim, self.gb,
            self.tile, self.tile, self.pack,
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


def sharded_adreg_slot_eligible(state: AdaptRegState, n_dev: int) -> bool:
    """Per-device slot AdaptReg needs dim <= 61 and the PER-DEVICE
    slot-major item chunk (+ deferred scratch) resident in VMEM."""
    dim = state.params.theta.shape[1]
    pack = slot_packing_factor(dim)
    if pack < 2:
        return False
    nv = state.params.phi.shape[0]
    tile = 128 * pack
    chunk_v = cdiv(cdiv(nv, n_dev), tile) * tile
    return 2 * chunk_v * LANES * 4 <= 64 * 1024 * 1024
