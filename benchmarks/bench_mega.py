"""Mega-resident kernel throughput at ML-10M / ML-100K scales.

Usage: bench_mega.py [DIM] [BATCH] [MEGA] [TILE] [PG] [TG] [CONFIG]
CONFIG: ml10m (default) | ml100k | ml1m
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd_mega import MegaEpochRunner

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
MEGA = sys.argv[3] if len(sys.argv) > 3 else "None"
TILE = sys.argv[4] if len(sys.argv) > 4 else "None"
PG = sys.argv[5] if len(sys.argv) > 5 else "None"
TG = sys.argv[6] if len(sys.argv) > 6 else "None"
CONFIG = sys.argv[7] if len(sys.argv) > 7 else "ml10m"
mega = None if MEGA == "None" else int(MEGA)
tile = None if TILE == "None" else int(TILE)
pg = None if PG == "None" else int(PG)
tg = None if TG == "None" else int(TG)

shapes = {
    "ml10m": (69_878, 10_677, 10_000_000),
    "ml1m": (6_040, 3_706, 1_000_000),
    "ml100k": (943, 1_682, 100_000),
}
nu, nv, n = shapes[CONFIG]
ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)
params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
runner = MegaEpochRunner(ds, batch=BATCH, seed=1, dim=DIM, mega=mega,
                         tile_u=tile, tile_v=tile,
                         phi_groups=pg, theta_groups=tg)
tables = runner.pad(params)
gb = float(params.gb)
tables = runner.epoch(tables, 0.02, 5e-3, gb)
_ = float(jnp.sum(tables[0]))
t0 = time.perf_counter(); reps = 10
for _ in range(reps):
    tables = runner.epoch(tables, 0.02, 5e-3, gb)
_ = float(jnp.sum(tables[0]))
dt = (time.perf_counter() - t0) / reps
nb = runner.plan.u.shape[0]
print(f"{CONFIG} dim={DIM} P={runner.pack} B={BATCH} G={runner.mega} "
      f"tile={runner.tile_u}/{runner.tile_v} pg={PG} tg={TG}: "
      f"{runner.plan.n_real/dt/1e6:7.1f}M/s  {dt*1e6/nb:6.2f}us/batch  "
      f"nb={nb} slots/real={runner.n_slots/runner.plan.n_real:.3f}")
