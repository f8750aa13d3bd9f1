"""Multi-chip adaptive-regularization MF (BASELINE config: "Netflix-scale
adaptive-regularizer MF sharded over v5e mesh").

Layers the AdaptReg fused kernel (ops/pallas_adreg.py) onto the diagonal-
block DSGD schedule (parallel/dsgd_pallas.py — read both first):

* Each of the P substeps is one jitted shard_map: every device runs the
  fused AdaptReg segment kernel over its (device, substep) block, then the
  item shards hop around the ring with ppermute.
* The lambda hypergradient runs BETWEEN substeps on the global (sharded)
  tables with plain jitted gathers — XLA inserts the cross-shard
  collectives. The reference's pre-update snapshot is realized with zero
  copies: the K validation rows for substep s are sampled BEFORE the substep
  and their (old) rows gathered then; post-substep rows are gathered after.
* Because phi rides the ring, a global item row j sits at position
  ((j // chunk_v - s) mod P) * chunk_v + j % chunk_v at rotation state s —
  `_phi_pos` maps ids for the between-substep gathers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.admf import AdaptRegState
from tpu_mf.models.mf import MFParams
from tpu_mf.ops import pallas_adreg
from tpu_mf.ops.pallas_adreg import build_adreg_lamvec, hypergrad_ext_rows
from tpu_mf.ops.pallas_sgd import cdiv
from tpu_mf.parallel.dsgd_pallas import (
    pad_sharded,
    partition_pallas,
    unpack_sharded,
)
from tpu_mf.parallel.mesh import AXIS, row_sharding


from functools import lru_cache


@lru_cache(maxsize=None)
def _substep_fn(
    mesh: Mesh, n_dev: int, tile_u: int, tile_v: int, batch: int,
    n_gu: int, n_gv: int, dim: int, mxu: str, interpret: bool, loss: int,
):
    spec_rows = PartitionSpec(AXIS)
    spec_data = PartitionSpec(AXIS)
    spec_repl = PartitionSpec()
    perm = [((i + 1) % n_dev, i) for i in range(n_dev)]

    def substep(theta_ext, phi_ext, gu, gv, u, v, ut, vt, r, w, hyper, lamvec):
        theta_ext, phi_ext = pallas_adreg._run_adreg_segment(
            theta_ext, phi_ext,
            gu[0], gv[0], u[0], v[0], ut[0], vt[0], r[0], w[0],
            hyper, lamvec,
            tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim,
            n_gu=n_gu, n_gv=n_gv, mxu=mxu, interpret=interpret, loss=loss,
        )
        phi_ext = jax.lax.ppermute(phi_ext, AXIS, perm)
        return theta_ext, phi_ext

    return jax.jit(
        jax.shard_map(
            substep,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows) + (spec_data,) * 8
            + (spec_repl, spec_repl),
            out_specs=(spec_rows, spec_rows),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


class ShardedAdRegRunner:
    """Multi-chip fused AdaptReg epochs: P diagonal substeps per epoch with a
    lambda hypergradient between substeps."""

    def __init__(
        self,
        train_ds: RatingsCOO,
        valid_ds: RatingsCOO,
        mesh: Mesh,
        tile_u: int = 512,
        tile_v: int = 512,
        batch: int = 4096,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        loss: int = 0,
        n_reg_samples: int = 64,
    ):
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        self.nu, self.nv = train_ds.nu, train_ds.nv
        self.mxu, self.interpret, self.loss = mxu, interpret, loss
        self.n_reg_samples = n_reg_samples
        batch = cdiv(batch, 8) * 8
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        self.splan = partition_pallas(
            train_ds, self.n_dev, tile_u, tile_v, batch, seed
        )
        shard = row_sharding(mesh)
        self.dev = tuple(
            jax.device_put(x, shard)
            for x in (
                self.splan.gu, self.splan.gv, self.splan.u, self.splan.v,
                self.splan.ut, self.splan.vt, self.splan.r, self.splan.w,
            )
        )
        self.valid = (
            jnp.asarray(valid_ds.u),
            jnp.asarray(valid_ds.v),
            jnp.asarray(valid_ds.r),
        )
        # user-visits per substep (sums over devices): scales the
        # hypergradient like the reference's one-update-per-user cadence.
        # Vectorized distinct-count per (device, substep, batch), then summed
        # over devices and batches for each substep.
        from tpu_mf.ops.common import distinct_counts

        w = self.splan.w
        u = self.splan.u
        P, S, NB = u.shape[:3]
        per_batch = distinct_counts(
            u.reshape(P, S, NB, -1), w.reshape(P, S, NB, -1) > 0
        )
        self.visits_per_substep = per_batch.sum(axis=(0, 2)).astype(np.float32)

    def pad(self, state: AdaptRegState):
        self.dim = state.params.theta.shape[1]
        self.gb = float(state.params.gb)
        self.lams = jnp.stack(
            [state.lam_u, state.lam_v, state.lam_bu, state.lam_bv]
        ).astype(jnp.float32)
        return pad_sharded(state.params, self.splan, self.mesh)

    def _lamvec(self) -> jax.Array:
        return build_adreg_lamvec(self.dim, self.lams)

    def _phi_pos(self, j: jax.Array, s: int) -> jax.Array:
        """Row position of global item id j in the rotated phi_ext at state s."""
        chunk = self.splan.chunk_v
        g = j // chunk
        return ((g - s) % self.n_dev) * chunk + j % chunk

    def epoch(self, tables, eta: float, eta_reg: float, key: jax.Array):
        hyper = jnp.asarray([eta, self.gb], jnp.float32)
        fn = _substep_fn(
            self.mesh, self.n_dev, self.tile_u, self.tile_v, self.batch,
            self.splan.chunk_u // self.tile_u,
            self.splan.chunk_v // self.tile_v,
            self.dim, self.mxu, self.interpret, self.loss,
        )
        uv, vv, rv = self.valid
        gu, gv, u, v, ut, vt, r, w = self.dev
        for s in range(self.n_dev):
            ks = jax.random.fold_in(key, s)
            sel = jax.random.randint(ks, (self.n_reg_samples,), 0, uv.shape[0])
            su, sv_, sr = uv[sel], vv[sel], rv[sel]
            # pre-substep ("old") rows: zero-copy snapshot of just K rows
            old_t = tables[0][su]
            old_p = tables[1][self._phi_pos(sv_, s)]

            tables = fn(
                tables[0], tables[1],
                gu[:, s], gv[:, s], u[:, s], v[:, s],
                ut[:, s], vt[:, s], r[:, s], w[:, s],
                hyper, self._lamvec(),
            )

            new_t = tables[0][su]
            new_p = tables[1][self._phi_pos(sv_, s + 1)]
            self.lams = hypergrad_ext_rows(
                new_t, new_p, old_t, old_p, sr, self.lams,
                jnp.float32(eta), jnp.float32(eta_reg),
                jnp.float32(self.visits_per_substep[s]),
                jnp.float32(self.gb), self.dim, self.loss,
            )
        return tables

    def trim(self, tables) -> MFParams:
        return unpack_sharded(
            tables[0], tables[1], self.nu, self.nv, self.dim, self.gb
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
