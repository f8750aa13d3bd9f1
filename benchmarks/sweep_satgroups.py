"""Parallel apply-groups under saturation (calibrated zipf, rank 64).

At eta0=0.02 on the zipfy stand-in the envelope picker forces
theta/phi_groups=8 (fully serial per-column apply chain) — the slowest
regime. Window-step saturation caps the very overshoot that rule guards
against, so parallel groups may now be safe. Measure speed by group
forcing; convergence is validated separately by converge_ml10m.
"""
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd import PallasEpochRunner

N = 10_000_000


def bench(runner, params, eta=0.02, lam=5e-3, reps=5):
    tables = runner.pad(params)
    gb = float(params.gb)
    tables = runner.epoch(tables, eta, lam, gb)
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        tables = runner.epoch(tables, eta, lam, gb, epoch_idx=i % 2)
    _ = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / reps
    fin = bool(jnp.isfinite(jnp.sum(tables[0])))
    return runner.plan.n_real / dt, fin


def main():
    nu, nv = 69_878, 10_677
    ds = synthetic_ratings(
        nu, nv, N, rank=8, seed=0, noise=0.76, signal=1.0, bias_std=0.38,
        zipf=1.0, zipf_q=50.0, zipf_u=1.0, zipf_uq=250.0)
    dim = 64
    params = init_mf(jax.random.PRNGKey(0), nu, nv, dim, gb=ds.mean_rating())

    for tg, pg in [(8, 8), (8, 4), (8, 2), (4, 4), (2, 2), (1, 1), (8, 1)]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = PallasEpochRunner(ds, tile_u=256, tile_v=224, batch=7168,
                                  seed=1, n_plans=2, balance=True,
                                  saturate=True,
                                  theta_groups=tg, phi_groups=pg)
            ups, fin = bench(r, params)
        print(f"tg={tg} pg={pg}: {ups/1e6:7.1f}M/s finite={fin}", flush=True)


if __name__ == "__main__":
    main()
