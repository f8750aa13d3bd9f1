"""A/B sweep: packed vs mega kernel across configs, one TPU job.

Builds the dataset once; times each (runner, dim, batch, mega, tile, pg, tg)
config for REPS epochs. Usage: sweep_mega.py [CONFIG] (ml10m|ml1m|ml100k)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd_packed import PackedEpochRunner
from tpu_mf.ops.pallas_sgd_mega import MegaEpochRunner

CONFIG = sys.argv[1] if len(sys.argv) > 1 else "ml10m"
shapes = {
    "ml10m": (69_878, 10_677, 10_000_000),
    "ml1m": (6_040, 3_706, 1_000_000),
    "ml100k": (943, 1_682, 100_000),
}
nu, nv, n = shapes[CONFIG]
ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)

# (label, runner_cls, kwargs)
CASES = [
    ("packed d8 B8192", PackedEpochRunner, dict(dim=8, batch=8192)),
    ("mega d8 B8192 G8", MegaEpochRunner, dict(dim=8, batch=8192)),
    ("mega d8 B8192 G16", MegaEpochRunner, dict(dim=8, batch=8192, mega=16)),
    ("mega d8 B16384 G8", MegaEpochRunner, dict(dim=8, batch=16384)),
    ("mega d8 B8192 G8 seq", MegaEpochRunner,
     dict(dim=8, batch=8192, phi_groups=8, theta_groups=8)),
    ("mega d8 B8192 G8 par", MegaEpochRunner,
     dict(dim=8, batch=8192, phi_groups=1, theta_groups=1)),
]

for label, cls, kw in CASES:
    try:
        params = init_mf(jax.random.PRNGKey(0), nu, nv, kw["dim"],
                         gb=ds.mean_rating())
        t_build = time.perf_counter()
        runner = cls(ds, seed=1, **kw)
        t_build = time.perf_counter() - t_build
        tables = runner.pad(params)
        gb = float(params.gb)
        tables = runner.epoch(tables, 0.02, 5e-3, gb)
        _ = float(jnp.sum(tables[0]))
        t0 = time.perf_counter(); reps = 8
        for _ in range(reps):
            tables = runner.epoch(tables, 0.02, 5e-3, gb)
        _ = float(jnp.sum(tables[0]))
        dt = (time.perf_counter() - t0) / reps
        nb = runner.plan.u.shape[0]
        print(f"{label:24s}: {runner.plan.n_real/dt/1e6:7.1f}M/s  "
              f"{dt*1e6/nb:6.2f}us/batch nb={nb} "
              f"fill={runner.plan.n_real/runner.n_slots:.3f} "
              f"build={t_build:.0f}s", flush=True)
        del runner, tables
    except Exception as e:
        print(f"{label:24s}: FAILED {type(e).__name__}: {e}", flush=True)
