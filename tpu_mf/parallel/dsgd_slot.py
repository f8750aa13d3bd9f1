"""Multi-chip diagonal-block DSGD on the SLOT-MAJOR fused kernel.

Second-generation mesh path (VERDICT round 2 #4): the round-1 sharded runner
(parallel/dsgd_pallas.py) pins every device to the gen-1 blocked kernel, so
scaling out multiplied the SLOWEST kernel generation. Here each device runs
the fastest small-rank kernel (ops/pallas_sgd_slot.py — P ratings per
sublane row, slot-major stacked tables, measured ~2x the gen-1 kernel at
rank 8) over its (device, substep) diagonal block, with the slot-major item
shards riding the ppermute ring between substeps (slot-major rows move like
any rows — the layout is position-independent within a chunk because chunks
are tile multiples).

Uniform SPMD: per substep, every device's slot plan is padded to a common
batch count (sentinel columns are no-ops: their one-hot columns are all
zero). ``sub`` is chosen ONCE from the summed bucket counts of all blocks so
the jitted program is identical across devices and substeps.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.mf import MFParams
from tpu_mf.ops import pallas_sgd_slot
from tpu_mf.ops.pallas_sgd import UV_BASE, _apply_flags, _dup_stats, cdiv
from tpu_mf.ops.pallas_sgd_slot import (
    _slot_bucket_counts,
    balance_dataset,
    pack_params_slot,
    pick_sub,
    pick_sub_stripe,
    prepare_cells_slot,
    prepare_cells_stripe,
    slot_col_ids,
    slot_packing_factor,
    unpack_params_slot,
)
from tpu_mf.parallel.mesh import AXIS, row_sharding


class _PackView(NamedTuple):
    """Geometry view for pack/unpack over the FULL mesh-padded tables."""

    tile_u: int
    tile_v: int
    n_gu: int
    n_gv: int


@lru_cache(maxsize=None)
def _slot_substep_fn(
    mesh: Mesh, n_dev: int, tile_u: int, tile_v: int, sub: int, dim: int,
    pack: int, n_gu: int, n_gv: int, mxu: str, interpret: bool,
    theta_groups: int, phi_groups: int, scatter_dg: bool,
    striped: bool = False,
):
    spec_rows = PartitionSpec(AXIS)
    spec_data = PartitionSpec(AXIS)
    spec_repl = PartitionSpec()
    perm = [((i + 1) % n_dev, i) for i in range(n_dev)]

    def substep(theta_s, phi_s, gu, gv, ap, uv, uvt, r, hyper):
        theta_s, phi_s = pallas_sgd_slot._run_slot_epoch(
            theta_s, phi_s, gu[0], gv[0], ap[0], uv[0], uvt[0], r[0], hyper,
            tile_u=tile_u, tile_v=tile_v, sub=sub, dim=dim, pack=pack,
            n_gu=n_gu, n_gv=n_gv, mxu=mxu, interpret=interpret,
            theta_groups=theta_groups, phi_groups=phi_groups,
            scatter_dg=scatter_dg, striped=striped,
        )
        phi_s = jax.lax.ppermute(phi_s, AXIS, perm)
        return theta_s, phi_s

    return jax.jit(
        jax.shard_map(
            substep,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows) + (spec_data,) * 6 + (spec_repl,),
            out_specs=(spec_rows, spec_rows),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


class ShardedSlotRunner:
    """Multi-chip slot-major fused epochs over a static sharded plan.

    Interface-compatible with ShardedPallasRunner (pad/epoch/trim);
    additionally exposes envelope_ok + adaptive theta/phi grouping like the
    single-chip SlotEpochRunner.
    """

    def __init__(
        self,
        ds: RatingsCOO,
        mesh: Mesh,
        dim: int,
        sub: int | None = None,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        theta_groups=None,
        phi_groups=None,
        scatter_dg: bool = False,
        tile: int | None = None,
        balance: bool = False,
        striped: bool = False,
    ):
        # Delta-striped per-block plans: striping reorganizes columns
        # WITHIN a (user-tile, item-tile) pair, so chunk (device-shard)
        # membership and diagonal disjointness are untouched.
        self.striped = striped
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        P = self.n_dev
        pack = slot_packing_factor(dim)
        assert pack in (2, 4, 8), f"slot kernel needs dim <= 61, got {dim}"
        self.pack = pack
        tile = tile or 128 * pack
        self.tile_u = self.tile_v = tile
        self.nu, self.nv = ds.nu, ds.nv
        self._map_u = self._map_v = None
        if balance:
            # LPT slot relabeling preserves tile membership, hence also
            # chunk (device-shard) membership — the diagonal-block plan
            # below is unchanged structurally (pallas_sgd_slot._balance_map).
            # NOTE: must stay cross_tile=False here — the serpentine map
            # moves ids across tiles, which would move them across device
            # shards and break the diagonal-block disjointness.
            ds, self._map_u, self._map_v = balance_dataset(
                ds, tile, tile, pack
            )
        self.mxu, self.interpret = mxu, interpret
        self.scatter_dg = scatter_dg
        self.theta_groups, self.phi_groups = theta_groups, phi_groups
        self.chunk_u = cdiv(cdiv(ds.nu, P), tile) * tile
        self.chunk_v = cdiv(cdiv(ds.nv, P), tile) * tile
        self.n_gu = self.chunk_u // tile
        self.n_gv = self.chunk_v // tile

        shard_u = ds.u // self.chunk_u
        substep = (ds.v // self.chunk_v - shard_u) % P

        # One global sub: summed bucket counts over all diagonal blocks
        # (every block shares the chunk-local tile geometry).
        counts = None
        locals_ = {}
        for p in range(P):
            for s in range(P):
                sel = (shard_u == p) & (substep == s)
                local = RatingsCOO(
                    (ds.u[sel] % self.chunk_u).astype(np.int32),
                    (ds.v[sel] % self.chunk_v).astype(np.int32),
                    ds.r[sel].astype(np.float32),
                    nu=self.chunk_u, nv=self.chunk_v,
                )
                locals_[(p, s)] = local
                c = _slot_bucket_counts(local, tile, tile, pack)
                counts = c if counts is None else counts + c
        if sub:
            self.sub = sub
        elif striped:
            self.sub = pick_sub_stripe(counts, pack, self.n_gv)
        else:
            self.sub = pick_sub(counts, pack)
        builder = prepare_cells_stripe if striped else prepare_cells_slot

        plans = {
            k: builder(
                v, tile, tile, self.sub, seed * 7919 + k[0] * P + k[1], pack
            )
            for k, v in locals_.items()
        }
        rows_u = tile // pack
        rows_v = tile // pack
        sub_ = self.sub
        self.nb = [
            max(plans[(p, s)].u.shape[0] for p in range(P)) for s in range(P)
        ]
        self._host = []  # per-substep (GU, GV, uv, uvt, R) host arrays
        du, dv = {g: 0 for g in (1, 2, 4, 8)}, {g: 0 for g in (1, 2, 4, 8)}
        for s in range(P):
            nb = self.nb[s]
            GU = np.zeros((P, nb), np.int32)
            GV = np.zeros((P, nb, 8), np.int32)
            U = np.full((P, nb, sub_, 8 * pack), rows_u, np.int32)
            V = np.full((P, nb, sub_, 8 * pack), rows_v, np.int32)
            R = np.zeros((P, nb, sub_, 8 * pack), np.float32)
            for p in range(P):
                plan = plans[(p, s)]
                nbp = plan.u.shape[0]
                GU[p, :nbp] = plan.gu
                # pad batches keep the last real gu (aliased-ref rule,
                # parallel/dsgd_pallas.py)
                GU[p, nbp:] = plan.gu[-1] if nbp else 0
                GV[p, :nbp] = plan.gv
                U[p, :nbp] = plan.u
                V[p, :nbp] = plan.v
                R[p, :nbp] = plan.r
                # window-duplicate stats for the staleness envelope /
                # adaptive grouping (max over all blocks)
                ids_u = slot_col_ids(plan.u, pack)
                ids_v = slot_col_ids(plan.v, pack)
                su = _dup_stats(ids_u, self.tile_u)
                sv = _dup_stats(ids_v, self.tile_v)
                for g in (1, 2, 4, 8):
                    du[g] = max(du[g], su[g])
                    dv[g] = max(dv[g], sv[g])
            uv = U * UV_BASE + V
            self._host.append(
                (GU, GV, uv, np.swapaxes(uv, 2, 3).copy(), R)
            )
        self._dup_max, self._vdup_max = du, dv
        self.n_real = len(ds)
        # Device staging is LAZY (round-4 ADVICE #1): the mesh schedule
        # probes candidate runners for envelope stats only — P^2 padded
        # plan arrays are device_put only for the winner (via pad()).
        self._dev = None
        self._flags = None

    def materialize(self):
        """device_put the per-substep plan stacks (idempotent)."""
        if self._dev is not None:
            return self
        shard = row_sharding(self.mesh)
        self._dev = [
            tuple(jax.device_put(jnp.asarray(x), shard) for x in host)
            for host in self._host
        ]
        self._flags = [
            {
                g: jax.device_put(
                    jnp.asarray(
                        np.stack([
                            _apply_flags(np.asarray(GV[p]), g)
                            for p in range(self.n_dev)
                        ])
                    ),
                    shard,
                )
                for g in (1, 2, 4)
            } | {8: jax.device_put(jnp.ones_like(jnp.asarray(GV)), shard)}
            for (_, GV, *_rest) in self._host
        ]
        return self

    @property
    def dev(self):
        return self.materialize()._dev

    @property
    def flags(self):
        return self.materialize()._flags

    def envelope_ok(self, eta: float) -> bool:
        return eta * max(self._dup_max[8], self._vdup_max[8]) <= 0.2

    def _pick(self, stats, fixed, eta):
        if fixed is not None:
            return fixed
        for g in (1, 2, 4, 8):
            if eta * stats[g] <= 0.2:
                return g
        return 8

    def pad(self, params: MFParams):
        self.materialize()
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        view = _PackView(
            tile_u=self.tile_u, tile_v=self.tile_v,
            n_gu=self.n_dev * self.n_gu, n_gv=self.n_dev * self.n_gv,
        )
        theta_s, phi_s = pack_params_slot(
            params, _SlotPlanView(view, self.pack),
            self._map_u, self._map_v,
        )
        shard = row_sharding(self.mesh)
        return jax.device_put(theta_s, shard), jax.device_put(phi_s, shard)

    def epoch(self, tables, eta: float, lam: float):
        hyper = jnp.asarray([eta, lam, self.gb], jnp.float32)
        tg = self._pick(self._dup_max, self.theta_groups, eta)
        pg = self._pick(self._vdup_max, self.phi_groups, eta)
        for s in range(self.n_dev):
            fn = _slot_substep_fn(
                self.mesh, self.n_dev, self.tile_u, self.tile_v, self.sub,
                self.dim, self.pack, self.n_gu, self.n_gv, self.mxu,
                self.interpret, tg, pg, self.scatter_dg, self.striped,
            )
            gu, gv, uv, uvt, r = self.dev[s]
            tables = fn(
                tables[0], tables[1], gu, gv, self.flags[s][pg],
                uv, uvt, r, hyper,
            )
        return tables

    def trim(self, tables) -> MFParams:
        return unpack_params_slot(
            jnp.asarray(np.asarray(tables[0])),
            jnp.asarray(np.asarray(tables[1])),
            self.nu, self.nv, self.dim, self.gb,
            self.tile_u, self.tile_v, self.pack,
            self._map_u, self._map_v,
        )


class _SlotPlanView:
    """Adapter exposing the SlotPlan fields pack/unpack helpers read."""

    def __init__(self, view: _PackView, pack: int):
        self.tile_u = view.tile_u
        self.tile_v = view.tile_v
        self.n_gu = view.n_gu
        self.n_gv = view.n_gv
        self.pack = pack


def sharded_slot_eligible(params: MFParams, n_dev: int) -> bool:
    """Per-device slot kernel needs dim <= 61 and the PER-DEVICE slot-major
    item chunk (+ deferred scratch) resident in VMEM."""
    from tpu_mf.ops.pallas_sgd import LANES

    dim = params.theta.shape[1]
    pack = slot_packing_factor(dim)
    if pack < 2:
        return False
    nv = params.phi.shape[0]
    tile = 128 * pack
    chunk_v = cdiv(cdiv(nv, n_dev), tile) * tile
    return 2 * chunk_v * LANES * 4 <= 64 * 1024 * 1024
