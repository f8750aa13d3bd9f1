"""Focused follow-up: smaller tiles + calibrated-zipf production shapes.
Usage: sweep_mxupred3.py  (runs a fixed config list)"""
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
        tables = runner.epoch(tables, eta, lam, gb, epoch_idx=0)
    _ = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / reps
    return runner.plan.n_real / dt, dt


def main():
    nu, nv = 69_878, 10_677
    uni = synthetic_ratings(nu, nv, N, rank=8, noise=0.1, seed=0)
    zipf = synthetic_ratings(
        nu, nv, N, rank=8, seed=0, noise=0.76, signal=1.0, bias_std=0.38,
        zipf=1.0, zipf_q=50.0, zipf_u=1.0, zipf_uq=250.0)

    cfgs = [
        ("uni ", uni, 64, 128, 8192),
        ("uni ", uni, 64, 192, 8192),
        ("uni ", uni, 64, 256, 4096),
        ("zipf", zipf, 64, 256, 8192),
        ("zipf", zipf, 64, 192, 8192),
        ("zipf", zipf, 128, 256, 8192),
    ]
    for tag, ds, dim, t, b in cfgs:
        params = init_mf(jax.random.PRNGKey(0), nu, nv, dim,
                         gb=ds.mean_rating())
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = PallasEpochRunner(ds, tile_u=t, tile_v=t, batch=b,
                                  seed=1, mxu_pred=True)
            ups, dt = bench(r, params)
        nb = r.plan.u.shape[0]
        fill = r.plan.n_real / (nb * b)
        print(f"{tag} gen1-mxupred dim={dim:3d} t={t} B={b}: "
              f"{ups/1e6:7.1f}M/s  {dt*1e6/nb:6.2f}us/batch fill={fill:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
