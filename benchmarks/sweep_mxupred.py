"""Measure the MXU-pred (and MXU-apply) variants on the production rank-64
runners (gen-1 blocked and mega-resident, homogeneous rows).

Baselines being attacked (PERF_NOTES round-3): gen-1 homog t384 B8192
uniform-10M = 30.77us/step (237M/s); ablate_wide64 widemxu measured the
MXU pred saving 6us/step in the resident harness.

Usage: sweep_mxupred.py [DIM] [N] [zipf]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd import PallasEpochRunner
from tpu_mf.ops.pallas_sgd_mega import MegaEpochRunner

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
ZIPF = len(sys.argv) > 3 and sys.argv[3] == "zipf"


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
    out = runner.trim(tables)
    ok = bool(jnp.isfinite(out.theta).all())
    return runner.plan.n_real / dt, dt, ok


def main():
    nu, nv = 69_878, 10_677
    if ZIPF:
        ds = synthetic_ratings(
            nu, nv, N, rank=8, seed=0, noise=0.76, signal=1.0, bias_std=0.38,
            zipf=1.0, zipf_q=50.0, zipf_u=1.0, zipf_uq=250.0)
    else:
        ds = synthetic_ratings(nu, nv, N, rank=8, noise=0.1, seed=0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())

    cfgs = [
        ("gen1-t384 base      ", dict(cls=PallasEpochRunner, tile=384,
                                      mxu_pred=False, mxu_apply=False)),
        ("gen1-t384 mxupred   ", dict(cls=PallasEpochRunner, tile=384,
                                      mxu_pred=True, mxu_apply=False)),
        ("gen1-t384 pred+apply", dict(cls=PallasEpochRunner, tile=384,
                                      mxu_pred=True, mxu_apply=True)),
        ("mega-t384 base      ", dict(cls=MegaEpochRunner, tile=384,
                                      mxu_pred=False)),
        ("mega-t384 mxupred   ", dict(cls=MegaEpochRunner, tile=384,
                                      mxu_pred=True)),
    ]
    for name, c in cfgs:
        kw = dict(tile_u=c["tile"], tile_v=c["tile"], batch=8192, seed=1)
        if c["cls"] is MegaEpochRunner:
            kw["dim"] = DIM
            kw["mxu_pred"] = c["mxu_pred"]
        else:
            kw["mxu_pred"] = c["mxu_pred"]
            kw["mxu_apply"] = c["mxu_apply"]
        r = c["cls"](ds, **kw)
        ups, dt, ok = bench(r, params)
        nb = r.plan.u.shape[0] if hasattr(r.plan, "u") else 0
        print(f"{name} dim={DIM}: {ups/1e6:7.1f}M/s  "
              f"{dt*1e6/nb:6.2f}us/batch  finite={ok}", flush=True)


if __name__ == "__main__":
    main()
