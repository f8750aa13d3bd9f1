"""Tile sweep for the MXU-pred gen-1 kernel at dim 64 and the reference
default dim 128 (256-lane rows). Usage: sweep_mxupred2.py [zipf]"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd import PallasEpochRunner

ZIPF = len(sys.argv) > 1 and sys.argv[1] == "zipf"
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
    if ZIPF:
        ds = synthetic_ratings(
            nu, nv, N, rank=8, seed=0, noise=0.76, signal=1.0, bias_std=0.38,
            zipf=1.0, zipf_q=50.0, zipf_u=1.0, zipf_uq=250.0)
    else:
        ds = synthetic_ratings(nu, nv, N, rank=8, noise=0.1, seed=0)

    for dim, tiles, batches in ((64, (256, 384, 512), (8192, 16384)),
                                (128, (192, 256, 384), (8192,))):
        params = init_mf(jax.random.PRNGKey(0), nu, nv, dim,
                         gb=ds.mean_rating())
        for t in tiles:
            for b in batches:
                import warnings
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    r = PallasEpochRunner(ds, tile_u=t, tile_v=t, batch=b,
                                          seed=1, mxu_pred=True)
                    ups, dt = bench(r, params)
                nb = r.plan.u.shape[0]
                print(f"gen1-mxupred dim={dim:3d} t={t} B={b}: "
                      f"{ups/1e6:7.1f}M/s  {dt*1e6/nb:6.2f}us/batch",
                      flush=True)


if __name__ == "__main__":
    main()
