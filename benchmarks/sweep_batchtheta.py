"""Batched theta gather/scatter (theta_groups=1) vs the serial tg=8 chain.

With one batch-start snapshot, the 8 per-column theta matmuls fuse into one
(8sub, tile) gather and one (tile, 8sub) scatter — same flops, 1/8 the MXU
dispatches, bit-identical accumulation order. Saturation bounds the wider
staleness window. Sweep pg to see if the deferred phi chain composes.
"""
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.ops import pallas_sgd
from tpu_mf.ops.pallas_sgd import PallasEpochRunner

N = 10_000_000


def bench(runner, params, bt, eta=0.02, lam=5e-3, reps=5):
    tables = runner.pad(params)
    gb = float(params.gb)

    def ep(tables, i):
        pg = runner.pick_phi_groups(eta)
        gu, gv, pb = runner.devs[i % 2]
        cap = max(1.0, 0.2 / eta)
        hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
        return pallas_sgd._run_epoch(
            tables[0], tables[1], gu, gv, pb, hyper,
            runner.flags[i % 2][pg],
            tile_u=runner.tile_u, tile_v=runner.tile_v, batch=runner.batch,
            dim=runner.dim, n_gu=runner.plan.n_gu, n_gv=runner.plan.n_gv,
            theta_groups=runner.pick_theta_groups(eta), phi_groups=pg,
            mxu_pred=True, saturate=True, batch_theta=bt,
        )

    tables = ep(tables, 0)
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter()
    for i in range(5):
        tables = ep(tables, i)
    _ = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / 5
    tr = float(rmse(runner.trim(tables), runner._ds_ref))
    return runner.plan.n_real / dt, tr


def main():
    nu, nv = 69_878, 10_677
    ds = synthetic_ratings(
        nu, nv, N, rank=8, seed=0, noise=0.76, signal=1.0, bias_std=0.38,
        zipf=1.0, zipf_q=50.0, zipf_u=1.0, zipf_uq=250.0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, 64, gb=ds.mean_rating())

    for tg, pg, bt in [(8, 8, False), (1, 8, True), (1, 4, True),
                       (1, 2, True), (1, 1, True)]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = PallasEpochRunner(ds, tile_u=256, tile_v=224, batch=7168,
                                  seed=1, n_plans=2, balance=True,
                                  saturate=True, theta_groups=tg,
                                  phi_groups=pg)
            r.pad(params)
            r._ds_ref = ds
            ups, tr = bench(r, params, bt)
        print(f"tg={tg} pg={pg} bt={int(bt)}: {ups/1e6:7.1f}M/s "
              f"trainRMSE@6ep={tr:.4f}", flush=True)


if __name__ == "__main__":
    main()
