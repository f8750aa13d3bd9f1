"""Quick packed-kernel throughput at ML-10M scale."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd_packed import PackedEpochRunner

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
nu, nv, n = 69_878, 10_677, 10_000_000
ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)
params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
runner = PackedEpochRunner(ds, batch=BATCH, seed=1, dim=DIM)
tables = runner.pad(params)
gb = float(params.gb)
tables = runner.epoch(tables, 0.02, 5e-3, gb)
_ = float(jnp.sum(tables[0]))
t0 = time.perf_counter(); reps = 5
for _ in range(reps):
    tables = runner.epoch(tables, 0.02, 5e-3, gb)
_ = float(jnp.sum(tables[0]))
dt = (time.perf_counter() - t0) / reps
nb = runner.plan.u.shape[0]
print(f"dim={DIM} P={runner.pack} B={BATCH}: {runner.plan.n_real/dt/1e6:7.1f}M/s  "
      f"{dt*1e6/nb:6.2f}us/step  slots/real={runner.n_slots/runner.plan.n_real:.3f}")
