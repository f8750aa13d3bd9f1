"""Out-of-core MULTI-CHIP MF training: the fused DSGD schedule fed from disk.

Composes the two previously-exclusive capabilities (reference: the TBB
pipeline feeds its shared-memory parallel updaters from disk by
construction, src/mf.h:6-70; here the "parallel updaters" are a device
mesh):

* One scatter pass re-shards the on-disk rating stream into P*P chunk
  files keyed by (user shard p = u // chunk_u, substep s = (v // chunk_v -
  p) mod P) — exactly the diagonal-block partition of
  parallel/dsgd_pallas.partition_pallas, but on disk.
* Each epoch walks the P substeps: a background thread loads the NEXT
  substep's P per-device chunks, shuffles them (fresh shuffle per epoch),
  cell-plans each device's block, pads the plans to a common batch count,
  and stages the stacked (P, NB, ...) arrays to the mesh while the current
  substep's jitted shard_map (fused kernel per device + ppermute ring hop
  for the item shards) runs.
* Host memory stays bounded by ~2 substeps of plan arrays (~2/P of the
  dataset), vs. the whole dataset for the in-memory mesh path.

Plans are cached on disk per (substep, shuffle variant) with a geometry
fingerprint, like io/stream_fused.py.
"""

from __future__ import annotations

import os
import tempfile
from functools import lru_cache
from typing import Iterator, Optional

import ml_dtypes
import numpy as np

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.data.streamfmt import iter_ratings, scan_stats
from tpu_mf.models.mf import MFParams
from tpu_mf.ops.pallas_sgd import UV_BASE, cdiv, prepare_cells

ml_bf16 = ml_dtypes.bfloat16

REC = np.dtype([("u", "<i4"), ("v", "<i4"), ("r", "<f4")])


@lru_cache(maxsize=None)
def _substep_fn(
    mesh, n_dev: int, tile_u: int, tile_v: int, batch: int,
    n_gu: int, n_gv: int, dim: int, mxu: str, interpret: bool,
):
    import jax
    from jax.sharding import PartitionSpec

    from tpu_mf.ops import pallas_sgd
    from tpu_mf.parallel.mesh import AXIS

    spec_rows = PartitionSpec(AXIS)
    spec_data = PartitionSpec(AXIS)
    spec_repl = PartitionSpec()
    perm = [((i + 1) % n_dev, i) for i in range(n_dev)]

    def substep(theta_ext, phi_ext, gu, gv, pb, hyper):
        theta_ext, phi_ext = pallas_sgd._run_epoch(
            theta_ext, phi_ext, gu[0], gv[0], pb[0], hyper,
            tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim,
            n_gu=n_gu, n_gv=n_gv, mxu=mxu, interpret=interpret,
            mxu_pred=True,
        )
        phi_ext = jax.lax.ppermute(phi_ext, AXIS, perm)
        return theta_ext, phi_ext

    return jax.jit(
        jax.shard_map(
            substep,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows) + (spec_data,) * 3 + (spec_repl,),
            out_specs=(spec_rows, spec_rows),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


class DiagonalShardStore:
    """On-disk re-shard of a rating stream into P*P diagonal-block chunks."""

    def __init__(
        self,
        path: str,
        n_dev: int,
        chunk_u: int,
        chunk_v: int,
        workdir: Optional[str] = None,
        read_chunk: int = 1 << 18,
    ):
        self.n_dev = n_dev
        self.chunk_u, self.chunk_v = chunk_u, chunk_v
        self._own = workdir is None
        self.workdir = workdir or tempfile.mkdtemp(prefix="tpumf_dshards_")
        os.makedirs(self.workdir, exist_ok=True)
        self.paths = {
            (p, s): os.path.join(self.workdir, f"block.{p:03d}.{s:03d}.rec")
            for p in range(n_dev)
            for s in range(n_dev)
        }
        files = {k: open(v, "wb") for k, v in self.paths.items()}
        self.n = 0
        try:
            for u, v, r in iter_ratings(path, chunk=read_chunk):
                self.n += len(u)
                rec = np.empty(len(u), REC)
                rec["u"], rec["v"], rec["r"] = u, v, r
                p = u // chunk_u
                s = (v // chunk_v - p) % n_dev
                key = p * n_dev + s
                for k in np.unique(key):
                    files[(k // n_dev, k % n_dev)].write(
                        rec[key == k].tobytes()
                    )
        finally:
            for f in files.values():
                f.close()

    def load(self, p: int, s: int, seed: int) -> np.ndarray:
        rec = np.fromfile(self.paths[(p, s)], REC)
        rng = np.random.default_rng(seed)
        rng.shuffle(rec)
        return rec

    def close(self) -> None:
        if self._own:
            for name in os.listdir(self.workdir):
                try:
                    os.remove(os.path.join(self.workdir, name))
                except OSError:
                    pass
            try:
                os.rmdir(self.workdir)
            except OSError:
                pass


class ShardedStreamTrainer:
    """Out-of-core fused-DSGD epochs over a DiagonalShardStore.

    Counterpart of parallel/dsgd_pallas.ShardedPallasRunner whose plans
    stream from disk per substep instead of living on device whole-epoch.
    """

    def __init__(
        self,
        path: str,
        mesh,
        tile_u: int = 512,
        tile_v: int = 512,
        batch: int = 4096,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        workdir: Optional[str] = None,
        plan_cache: int = 2,
        nb_mult: int = 64,
    ):
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        self.nu, self.nv, self.n = scan_stats(path)
        batch = cdiv(batch, 8) * 8
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        self.chunk_u = cdiv(cdiv(self.nu, self.n_dev), tile_u) * tile_u
        self.chunk_v = cdiv(cdiv(self.nv, self.n_dev), tile_v) * tile_v
        self.n_gu = self.chunk_u // tile_u
        self.n_gv = self.chunk_v // tile_v
        self.seed = seed
        self.mxu, self.interpret = mxu, interpret
        self.plan_cache = plan_cache
        self.nb_mult = nb_mult
        self.store = DiagonalShardStore(
            path, self.n_dev, self.chunk_u, self.chunk_v, workdir=workdir
        )

    def _fingerprint(self) -> np.ndarray:
        return np.asarray(
            [self.seed, self.batch, self.tile_u, self.tile_v,
             self.nu, self.nv, self.n, self.n_dev],
            np.int64,
        )

    def _build_substep(self, s: int, variant: int):
        """Stacked per-device plan arrays for substep s (uniform NB)."""
        plans = []
        for p in range(self.n_dev):
            rec = self.store.load(
                p, s, seed=self.seed + 104729 * (variant * self.n_dev + s) + p
            )
            local = RatingsCOO(
                (rec["u"] % self.chunk_u).astype(np.int32),
                (rec["v"] % self.chunk_v).astype(np.int32),
                rec["r"].astype(np.float32),
                nu=self.chunk_u,
                nv=self.chunk_v,
            )
            plans.append(prepare_cells(
                local, self.tile_u, self.tile_v, self.batch,
                seed=self.seed ^ (variant * 65537 + s * self.n_dev + p),
            ))
        nb = max(p.u.shape[0] for p in plans)
        nb = max(self.nb_mult, cdiv(nb, self.nb_mult) * self.nb_mult)
        sub = self.batch // 8
        P = self.n_dev
        GU = np.zeros((P, nb), np.int32)
        GV = np.zeros((P, nb, 8), np.int32)
        UV = np.full(
            (P, nb, sub, 8), self.tile_u * UV_BASE + self.tile_v, np.int32
        )
        R = np.zeros((P, nb, sub, 8), np.float32)
        for p, plan in enumerate(plans):
            nbp = plan.u.shape[0]
            GU[p, :nbp] = plan.gu
            # Pad batches keep the last real gu (dsgd_pallas note: a gu
            # change would reload the aliased theta tile after its store).
            GU[p, nbp:] = plan.gu[-1] if nbp else 0
            GV[p, :nbp] = plan.gv
            UV[p, :nbp] = plan.u * UV_BASE + plan.v
            R[p, :nbp] = plan.r
        return GU, GV, UV, R

    def _substeps(self, epoch_idx: int) -> Iterator[tuple]:
        import jax.numpy as jnp

        names = ("gu", "gv", "uv", "r")
        fp = self._fingerprint()
        for s in range(self.n_dev):
            arrs = None
            if self.plan_cache > 0:
                variant = epoch_idx % self.plan_cache
                cpath = os.path.join(
                    self.store.workdir, f"plan.{s:03d}.{variant}.npz"
                )
                if os.path.exists(cpath):
                    z = np.load(cpath)
                    if "fp" in z and np.array_equal(z["fp"], fp):
                        arrs = tuple(z[k] for k in names)
                if arrs is None:
                    arrs = self._build_substep(s, variant)
                    np.savez(cpath, fp=fp, **dict(zip(names, arrs)))
            else:
                arrs = self._build_substep(s, epoch_idx)
            gu, gv, uv, r = arrs
            from tpu_mf.parallel.mesh import row_sharding

            shard = row_sharding(self.mesh)
            import jax

            # The kernel consumes one bf16 byte-plane stream per batch
            # (pallas_sgd.stream_planes); build per-device planes on HOST
            # (vectorized numpy bit ops) so each device receives only its
            # own shard's bytes.
            P, NB, subb, _ = uv.shape
            rb = r.view(np.int32)
            planes = [(uv >> s) & 255 for s in (0, 8, 16)]
            planes += [(rb >> s) & 255 for s in (0, 8, 16, 24)]
            pb = np.concatenate(
                [np.swapaxes(p, 2, 3).astype(ml_bf16) for p in planes],
                axis=2,
            )  # (P, NB, 56, sub)
            yield (
                jax.device_put(jnp.asarray(gu), shard),
                jax.device_put(jnp.asarray(gv), shard),
                jax.device_put(jnp.asarray(pb), shard),
            )

    def pad(self, params: MFParams):
        from tpu_mf.parallel.dsgd_pallas import pad_sharded

        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        view = _ChunkView(self.chunk_u, self.chunk_v)
        return pad_sharded(params, view, self.mesh)

    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0, fly: int = 2):
        import jax.numpy as jnp

        from tpu_mf.io.stream import Prefetcher

        from tpu_mf.parallel.mesh import row_sharding

        hyper = jnp.asarray([eta, lam, gb], jnp.float32)
        fn = _substep_fn(
            self.mesh, self.n_dev, self.tile_u, self.tile_v, self.batch,
            self.n_gu, self.n_gv, self.dim, self.mxu, self.interpret,
        )
        # The prefetcher's staging target is the mesh sharding (all plan
        # arrays shard their leading device axis), not a single device.
        pf = Prefetcher(
            self._substeps(epoch_idx), fly=fly,
            device=row_sharding(self.mesh),
        )
        try:
            for dev in pf:
                tables = fn(tables[0], tables[1], *dev, hyper)
        finally:
            pf.close()
        return tables

    def trim(self, tables) -> MFParams:
        from tpu_mf.parallel.dsgd_pallas import unpack_sharded

        return unpack_sharded(
            tables[0], tables[1], self.nu, self.nv, self.dim, self.gb
        )

    def close(self) -> None:
        self.store.close()


class _ChunkView:
    """Adapter giving pad_sharded the chunk sizes it reads from a
    ShardedPlan."""

    def __init__(self, chunk_u: int, chunk_v: int):
        self.chunk_u = chunk_u
        self.chunk_v = chunk_v
