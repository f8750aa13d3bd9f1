"""Out-of-core training on the FUSED epoch kernel (streaming v2).

The v1 streaming path (io/stream.py) dispatches one XLA gather/scatter step
per batch — correct but ~25x slower than the fused Pallas kernel. Here the
fused kernel runs out-of-core at near in-memory speed:

* One scatter pass re-shards the on-disk stream into per-user-tile-range
  chunk files (12-byte packed records, any input format — data/streamfmt).
* Each epoch walks the shards in user-tile order: a background thread loads
  the next shard, reshuffles it (a NEW shuffle every epoch — better than the
  reference, which replays one fixed file order, src/mf.h:37-44), builds its
  cell plan, and stages it to the device while the fused kernel runs the
  current shard. Host memory stays bounded by ~2 shards of plan arrays.
* The full packed factor tables live in device HBM across shard calls (the
  tables are nu x 128 floats — device memory is not the scarce resource the
  host's is); each shard's pallas_call updates them in place via donation.

Shard batch counts are padded to a coarse grid so the jitted epoch compiles
a handful of times, not once per shard.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator, Optional

import numpy as np

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.data.streamfmt import iter_ratings, scan_stats
from tpu_mf.models.mf import MFParams
from tpu_mf.ops.pallas_sgd import (
    CellPlan,
    _run_epoch,
    cdiv,
    pad_params,
    prepare_cells,
    split_params,
    stream_planes,
)

REC = np.dtype([("u", "<i4"), ("v", "<i4"), ("r", "<f4")])


def _jit_planes(uv, r):
    """Device-side byte-plane build (jitted once per shape)."""
    import jax

    global _PLANES_FN
    try:
        return _PLANES_FN(uv, r)
    except NameError:
        _PLANES_FN = jax.jit(stream_planes)
        return _PLANES_FN(uv, r)


class ShardStore:
    """On-disk re-shard of a rating stream by user-tile range."""

    def __init__(
        self,
        path: str,
        tile_u: int = 512,
        mem_limit: int = 20_000_000,
        workdir: Optional[str] = None,
    ):
        self.nu, self.nv, self.n = scan_stats(path)
        n_gu = cdiv(self.nu, tile_u)
        n_shards = min(n_gu, max(1, cdiv(self.n, mem_limit)))
        self.tiles_per_shard = cdiv(n_gu, n_shards)
        self.n_shards = cdiv(n_gu, self.tiles_per_shard)
        self.tile_u = tile_u
        self._own = workdir is None
        self.workdir = workdir or tempfile.mkdtemp(prefix="tpumf_shards_")
        os.makedirs(self.workdir, exist_ok=True)
        self.paths = [
            os.path.join(self.workdir, f"shard.{s:04d}.rec")
            for s in range(self.n_shards)
        ]
        span = tile_u * self.tiles_per_shard
        files = [open(p, "wb") for p in self.paths]
        try:
            for u, v, r in iter_ratings(path, chunk=min(1 << 18, mem_limit)):
                rec = np.empty(len(u), REC)
                rec["u"], rec["v"], rec["r"] = u, v, r
                dest = u // span
                for s in np.unique(dest):
                    rec[dest == s].tofile(files[s])
        finally:
            for f in files:
                f.close()

    def load(self, shard: int, seed: int) -> RatingsCOO:
        """Load one shard, reshuffled with the given seed (global ids)."""
        rec = np.fromfile(self.paths[shard], REC)
        rng = np.random.default_rng(seed)
        rng.shuffle(rec)
        return RatingsCOO(
            rec["u"].astype(np.int32), rec["v"].astype(np.int32),
            rec["r"].astype(np.float32), self.nu, self.nv,
        )

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


def _pad_plan_nb(plan: CellPlan, mult: int = 64) -> CellPlan:
    """Pad a plan's batch count to a coarse grid (few compile shapes).

    Pad batches keep the last real gu (a gu change would reload the aliased
    theta tile after its store — see ops/pallas_adreg.py's padb note); their
    slots carry the sentinel and weight 0, so they update nothing.
    """
    nb = plan.u.shape[0]
    target = max(mult, cdiv(nb, mult) * mult)
    if target == nb:
        return plan
    pad = target - nb

    def padb(x, fill):
        extra = np.full((pad,) + x.shape[1:], fill, x.dtype)
        return np.concatenate([x, extra])

    return plan._replace(
        u=padb(plan.u, plan.tile_u),
        v=padb(plan.v, plan.tile_v),
        r=padb(plan.r, np.float32(0)),
        w=padb(plan.w, np.float32(0)),
        gu=padb(plan.gu, plan.gu[-1] if nb else 0),
        gv=padb(plan.gv, 0),
    )


class FusedStreamTrainer:
    """Out-of-core MF epochs on the fused kernel over a ShardStore."""

    def __init__(
        self,
        path: str,
        tile_u: int = 512,
        tile_v: int = 512,
        batch: int = 4096,
        mem_limit: int = 20_000_000,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        workdir: Optional[str] = None,
        plan_cache: int = 2,
    ):
        """``plan_cache`` = number of shuffled plan variants cached on disk
        per shard (epochs rotate through them). Building a cell plan is
        argsort-bound (seconds per 10M-rating shard), so rebuilding every
        epoch dominated streamed epochs ~300x; cached device-ready plan
        arrays load at disk speed instead. Costs ~1.3x the raw data size
        per variant in the workdir. Two rotating shuffles still beat the
        reference, which replays ONE fixed file order every epoch
        (src/mf.h:37-44). plan_cache=0 disables (rebuild every epoch, a
        fresh shuffle each time)."""
        self.store = ShardStore(
            path, tile_u=tile_u, mem_limit=mem_limit, workdir=workdir
        )
        self.nu, self.nv = self.store.nu, self.store.nv
        self.n = self.store.n
        self.tile_u, self.tile_v = tile_u, tile_v
        self.batch = cdiv(batch, 8) * 8
        self.seed = seed
        self.mxu, self.interpret = mxu, interpret
        self.n_gu = cdiv(self.nu, tile_u)
        self.n_gv = cdiv(self.nv, tile_v)
        self.plan_cache = plan_cache

    def _build_plan(self, s: int, seed_load: int, seed_plan: int):
        ds = self.store.load(s, seed=seed_load)
        if len(ds) == 0:
            return None
        plan = prepare_cells(
            ds, self.tile_u, self.tile_v, self.batch, seed=seed_plan
        )
        plan = _pad_plan_nb(plan)
        from tpu_mf.ops.pallas_sgd import UV_BASE

        uv = plan.u * UV_BASE + plan.v
        return (plan.gu, plan.gv, uv, plan.r)

    def _fingerprint(self) -> np.ndarray:
        """Identity of the plan geometry: a cached plan built under any other
        (seed, batch, tiles, dataset shape) must not be silently reused —
        user-supplied workdirs persist across runs (ShardStore._own=False)."""
        return np.asarray(
            [self.seed, self.batch, self.tile_u, self.tile_v,
             self.nu, self.nv, self.n],
            np.int64,
        )

    def _plans(self, epoch_idx: int) -> Iterator[tuple]:
        import jax.numpy as jnp

        names = ("gu", "gv", "uv", "r")
        fp = self._fingerprint()
        for s in range(self.store.n_shards):
            if self.plan_cache > 0:
                variant = epoch_idx % self.plan_cache
                cpath = os.path.join(
                    self.store.workdir, f"plan.{s:04d}.{variant}.npz"
                )
                arrs = None
                if os.path.exists(cpath):
                    z = np.load(cpath)
                    if "fp" in z and np.array_equal(z["fp"], fp):
                        arrs = tuple(z[k] for k in names)
                if arrs is None:
                    built = self._build_plan(
                        s,
                        seed_load=self.seed + 7919 * variant + 104729 * s,
                        seed_plan=self.seed ^ (variant * 65537 + s),
                    )
                    arrs = built if built is not None else tuple(
                        np.empty(0) for _ in names
                    )
                    np.savez(cpath, fp=fp, **dict(zip(names, arrs)))
                if arrs[0].size == 0:
                    continue
            else:
                built = self._build_plan(
                    s,
                    seed_load=self.seed + 7919 * epoch_idx + 104729 * s,
                    seed_plan=self.seed ^ (epoch_idx * 65537 + s),
                )
                if built is None:
                    continue
                arrs = built
            gu, gv, uv, r = arrs
            # The kernel consumes ONE bf16 byte-plane stream; build it ON
            # DEVICE (XLA ops) so host->device bytes stay at the compact
            # int32/f32 uploads (h2d is the streamed path's bottleneck).
            yield (
                jnp.asarray(gu), jnp.asarray(gv),
                _jit_planes(jnp.asarray(uv), jnp.asarray(r)),
            )

    def pad(self, params: MFParams):
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        fake = CellPlan(
            u=None, v=None, r=None, w=None, gu=None, gv=None,
            tile_u=self.tile_u, tile_v=self.tile_v,
            n_gu=self.n_gu, n_gv=self.n_gv, n_real=self.n,
        )
        return pad_params(params, fake)

    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0, fly: int = 2):
        """One out-of-core pass: shards stream through the fused kernel while
        the next shard's plan builds on a background thread."""
        import jax.numpy as jnp

        from tpu_mf.io.stream import Prefetcher

        hyper = jnp.asarray([eta, lam, gb], jnp.float32)
        pf = Prefetcher(self._plans(epoch_idx), fly=fly)
        try:
            for dev in pf:
                tables = _run_epoch(
                    tables[0], tables[1], *dev, hyper,
                    tile_u=self.tile_u, tile_v=self.tile_v, batch=self.batch,
                    dim=self.dim, n_gu=self.n_gu, n_gv=self.n_gv,
                    mxu=self.mxu, interpret=self.interpret,
                    # streamed shards reshuffle every epoch; the plan-level
                    # duplicate statistics are not available without an extra
                    # pass, so stay fully sequential (the safe default).
                    theta_groups=8, mxu_pred=True,
                )
        finally:
            pf.close()
        return tables

    def trim(self, tables) -> MFParams:
        return split_params(
            tables[0], tables[1], self.nu, self.nv, self.dim, self.gb
        )

    def close(self) -> None:
        self.store.close()
