"""Multi-chip DP-SGLD over a device mesh.

Layers the fused SGLD kernel (ops/pallas_sgld.py) onto the diagonal-block
DSGD schedule (parallel/dsgd_pallas.py): P substeps per round, each a jitted
shard_map running the kernel per device on its (device, substep) block, with
the item shards — INCLUDING their gcount/invfreq bookkeeping lanes — riding
the ppermute ring between substeps.

Global-clock convention: the reference's lazy-noise count is "updates since
this row was last touched" under a nondeterministic Hogwild interleaving
(dpmf.h:61-66). Here the clock is deterministic: ratings of earlier substeps
(all devices) have fully elapsed, and within a substep the P devices are
modeled as round-robin interleaved, so device-local batch b sits at
global time = before_substep + n_dev * local_cum[b]. Every row lives on
exactly one device at any substep (diagonal blocks are disjoint), so the
per-row telescoping stays exact.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.dpmf import DPMFState
from tpu_mf.ops import pallas_sgld
from tpu_mf.ops.pallas_sgld import cdiv
from tpu_mf.parallel.dsgd_pallas import partition_pallas
from tpu_mf.parallel.mesh import AXIS, row_sharding


@lru_cache(maxsize=None)
def _substep_fn(
    mesh: Mesh, n_dev: int, tile_u: int, tile_v: int, batch: int,
    n_gu: int, n_gv: int, dim: int, mxu: str, interpret: bool,
):
    spec_rows = PartitionSpec(AXIS)
    spec_data = PartitionSpec(AXIS)
    spec_repl = PartitionSpec()
    perm = [((i + 1) % n_dev, i) for i in range(n_dev)]

    def substep(theta_ext, phi_ext, gu, gv, cum_lo, cum_hi, seed, hyper,
                lamvec, u, v, ut, vt, r, w):
        theta_ext, phi_ext = pallas_sgld._run_sgld_epoch(
            theta_ext, phi_ext,
            gu[0], gv[0], cum_lo[0], cum_hi[0], seed, hyper, lamvec,
            u[0], v[0], ut[0], vt[0], r[0], w[0],
            tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim,
            n_gu=n_gu, n_gv=n_gv, mxu=mxu, interpret=interpret,
        )
        phi_ext = jax.lax.ppermute(phi_ext, AXIS, perm)
        return theta_ext, phi_ext

    return jax.jit(
        jax.shard_map(
            substep,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows, spec_data, spec_data, spec_data,
                      spec_data, spec_data, spec_repl, spec_repl)
            + (spec_data,) * 6,
            out_specs=(spec_rows, spec_rows),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


class ShardedSgldRunner:
    """Multi-chip fused SGLD rounds over a static sharded plan."""

    def __init__(
        self,
        train_ds: RatingsCOO,
        mesh: Mesh,
        tile_u: int = 512,
        tile_v: int = 512,
        batch: int = 4096,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
    ):
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        self.nu, self.nv = train_ds.nu, train_ds.nv
        self.mxu, self.interpret = mxu, interpret
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
        # Deterministic global clock (see module docstring): per-device local
        # cum within each substep, dilated by n_dev, offset per substep.
        w = self.splan.w
        nb = w.shape[2]
        real = w.reshape(self.n_dev, self.n_dev, nb, -1).sum(-1)  # (P, S, NB)
        local_cum = np.cumsum(real, axis=2)
        per_substep = real.sum(axis=(0, 2))                       # (S,)
        before = np.concatenate([[0], np.cumsum(per_substep)[:-1]])
        self.cum = (
            before[None, :, None] + self.n_dev * local_cum
        ).astype(np.int64)
        # clamp to the substep's end so the clock never overshoots it
        substep_end = (before + per_substep)[None, :, None]
        self.cum = np.minimum(self.cum, substep_end).astype(np.int64)
        self.nb = nb
        self.n_real = int(self.splan.n_real)
        # per-round seed stride: (substep, device) pairs each consume nb+1
        self.seed_stride = self.n_dev * self.n_dev * (nb + 1) + 1

    def pad(self, state: DPMFState):
        self.dim = state.params.theta.shape[1]
        self.set_lambdas(state)
        theta_ext, phi_ext = pallas_sgld.pad_sgld(state, _PlanView(self.splan))
        shard = row_sharding(self.mesh)
        return (
            jax.device_put(theta_ext, shard),
            jax.device_put(phi_ext, shard),
        )

    def set_lambdas(self, state: DPMFState) -> None:
        self.lamvec = pallas_sgld.build_lamvec(state)

    def epoch(self, tables, state_gcount: int, hyper, noise_seed: int,
              epoch_idx: int = 0):
        """One round (pass over the data): P substeps. hyper = (eta, temp,
        bound, scal, gb).

        epoch_idx is accepted for interface parity with PallasSgldRunner
        (train_dpmf passes it unconditionally); the sharded plan is static
        (no plan rotation yet), so it is currently unused.
        """
        del epoch_idx
        fn = _substep_fn(
            self.mesh, self.n_dev, self.tile_u, self.tile_v, self.batch,
            self.splan.chunk_u // self.tile_u,
            self.splan.chunk_v // self.tile_v,
            self.dim, self.mxu, self.interpret,
        )
        hyper_v = jnp.asarray(list(hyper), jnp.float32)
        gu, gv, u, v, ut, vt, r, w = self.dev
        shard = row_sharding(self.mesh)
        for s in range(self.n_dev):
            lo, hi = pallas_sgld.split_count(
                self.cum[:, s] + np.int64(state_gcount)
            )
            cum_lo = jax.device_put(jnp.asarray(lo.astype(np.int32)), shard)
            cum_hi = jax.device_put(jnp.asarray(hi.astype(np.int32)), shard)
            # distinct seed per (round, substep, device): the kernel adds the
            # batch index, so space (substep, device) pairs by nb+1
            seeds = jax.device_put(
                jnp.asarray(
                    noise_seed
                    + (s * self.n_dev + np.arange(self.n_dev, dtype=np.int32))
                    * (self.nb + 1),
                    jnp.int32,
                ),
                shard,
            )
            tables = fn(
                tables[0], tables[1],
                gu[:, s], gv[:, s], cum_lo, cum_hi, seeds, hyper_v,
                self.lamvec,
                u[:, s], v[:, s], ut[:, s], vt[:, s], r[:, s], w[:, s],
            )
        return tables

    def unpack(self, state: DPMFState, tables) -> DPMFState:
        return pallas_sgld.unpack_sgld(
            state,
            jnp.asarray(np.asarray(tables[0])),
            jnp.asarray(np.asarray(tables[1])),
            self.n_real,
        )


class _PlanView:
    """Adapter: pad_sgld only needs n_gu/n_gv/tile_u/tile_v, here covering
    the FULL mesh-padded tables (n_dev * per-device tiles)."""

    def __init__(self, splan):
        n_dev = splan.gu.shape[0]
        self.n_gu = n_dev * (splan.chunk_u // splan.tile_u)
        self.n_gv = n_dev * (splan.chunk_v // splan.tile_v)
        self.tile_u = splan.tile_u
        self.tile_v = splan.tile_v
