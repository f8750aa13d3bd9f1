"""TPU sweep: slot-major kernel + rank-64 mega tile variants.

Usage: sweep_slot.py [CONFIG] [WHICH]
CONFIG: ml10m | ml1m | ml100k ; WHICH: slot | r64 | all
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd_mega import MegaEpochRunner
from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner

CONFIG = sys.argv[1] if len(sys.argv) > 1 else "ml10m"
WHICH = sys.argv[2] if len(sys.argv) > 2 else "all"
shapes = {
    "ml10m": (69_878, 10_677, 10_000_000),
    "ml1m": (6_040, 3_706, 1_000_000),
    "ml100k": (943, 1_682, 100_000),
}
nu, nv, n = shapes[CONFIG]
ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)

SLOT = [
    ("slot d8 tu1024/tv512 s128", SlotEpochRunner,
     dict(dim=8, tile_u=1024, tile_v=512, sub=128)),
    ("slot d8 tu1024/tv512 s128 par", SlotEpochRunner,
     dict(dim=8, tile_u=1024, tile_v=512, sub=128,
          phi_groups=1, theta_groups=1)),
    ("slot d8 t1024 s128 par", SlotEpochRunner,
     dict(dim=8, tile_u=1024, tile_v=1024, sub=128,
          phi_groups=1, theta_groups=1)),
    ("slot d8 tu1024/tv512 s96 par", SlotEpochRunner,
     dict(dim=8, tile_u=1024, tile_v=512, sub=96,
          phi_groups=1, theta_groups=1)),
    ("slot d8 tu512/tv512 s128 par", SlotEpochRunner,
     dict(dim=8, tile_u=512, tile_v=512, sub=128,
          phi_groups=1, theta_groups=1)),
]
R64 = [
    ("mega d64 t512 B8192", MegaEpochRunner,
     dict(dim=64, tile_u=512, tile_v=512, batch=8192)),
    ("mega d64 t256 B8192", MegaEpochRunner,
     dict(dim=64, tile_u=256, tile_v=256, batch=8192)),
    ("mega d64 t256 B16384", MegaEpochRunner,
     dict(dim=64, tile_u=256, tile_v=256, batch=16384)),
    ("mega d64 t384 B8192", MegaEpochRunner,
     dict(dim=64, tile_u=384, tile_v=384, batch=8192)),
]
CASES = {"slot": SLOT, "r64": R64, "all": SLOT + R64}[WHICH]

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
        print(f"{label:26s}: {runner.plan.n_real/dt/1e6:7.1f}M/s  "
              f"{dt*1e6/nb:7.2f}us/batch nb={nb} "
              f"fill={runner.plan.n_real/runner.n_slots:.3f} "
              f"build={t_build:.0f}s", flush=True)
        del runner, tables
    except Exception as e:
        import traceback; traceback.print_exc()
        print(f"{label:26s}: FAILED {type(e).__name__}: {e}", flush=True)
