"""Base (unpacked) kernel throughput at ML-10M rank-64."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd import PallasEpochRunner

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
PG = sys.argv[3] if len(sys.argv) > 3 else "None"
TG = sys.argv[4] if len(sys.argv) > 4 else "None"
ETA = float(sys.argv[5]) if len(sys.argv) > 5 else 0.02
TILE = int(sys.argv[6]) if len(sys.argv) > 6 else 512
pg = None if PG == "None" else int(PG)
tg = None if TG == "None" else int(TG)
nu, nv, n = 69_878, 10_677, 10_000_000
ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)
params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
runner = PallasEpochRunner(ds, tile_u=TILE, tile_v=TILE, batch=BATCH, seed=1,
                           phi_groups=pg, theta_groups=tg)
tables = runner.pad(params)
gb = float(params.gb)
tables = runner.epoch(tables, ETA, 5e-3, gb)
_ = float(jnp.sum(tables[0]))
t0 = time.perf_counter(); reps = 5
for _ in range(reps):
    tables = runner.epoch(tables, ETA, 5e-3, gb)
_ = float(jnp.sum(tables[0]))
dt = (time.perf_counter() - t0) / reps
nb = runner.plan.u.shape[0]
print(f"dim={DIM} B={BATCH} pg={PG} tg={TG} eta={ETA}: "
      f"{runner.plan.n_real/dt/1e6:7.1f}M/s  {dt*1e6/nb:6.2f}us/step  "
      f"slots/real={runner.n_slots/runner.plan.n_real:.3f}")
