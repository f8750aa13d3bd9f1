"""Yahoo-shape single-chip benchmark: the catalog the VMEM-resident kernels
could not hold (nu=1,000,990, nv=624,961; reference src/run.py:6-9).

Through round 3 this workload silently fell to the ~7M updates/s XLA path on
one chip at every dim. The item-sharded runner (ops/phi_shard.py) runs it
fused; this script measures steady-state updates/s and checks training is
finite and fitting, on calibrated Zipf-Mandelbrot marginals (the ML-10M
stand-in calibration, CLAUDE.md).

Usage: python benchmarks/bench_yahoo.py [--n 100000000] [--dim 8]
       [--epochs 4] [--eta 0.02]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--dim", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--eta", type=float, default=0.02)
    ap.add_argument("--lam", type=float, default=5e-3)
    ap.add_argument("--tile_u", type=int, default=None)
    ap.add_argument("--tile_v", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--budget_mb", type=int, default=None)
    args = ap.parse_args()

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import calibrated_ds

    from tpu_mf.models.mf import init_mf, calc_mse
    from tpu_mf.ops.phi_shard import PHI_SHARD_BUDGET, PhiShardedRunner

    t0 = time.perf_counter()
    # Disk-cached calibrated Zipf-Mandelbrot marginals (bench.calibrated_ds,
    # the gate-matched ML-10M calibration) at the reference's Yahoo table
    # shape (src/run.py:6-9).
    ds = calibrated_ds(1000990, 624961, args.n, seed=11)
    print(f"synth: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    runner = PhiShardedRunner(
        ds, dim=args.dim, tile_u=args.tile_u, tile_v=args.tile_v,
        batch=args.batch, seed=3, n_plans=1, saturate=True,
        budget=(args.budget_mb * 1024 * 1024 if args.budget_mb
                else PHI_SHARD_BUDGET),
    )
    nbs = [i.plans[0].u.shape[0] for i in runner.inners]
    slots = runner.n_slots
    print(f"plans: {time.perf_counter()-t0:.1f}s shards={runner.n_shards} "
          f"tiles={runner.tile_u}x{runner.tile_v} batch={runner.batch} "
          f"NB={nbs} fill={len(ds)/slots:.3f}", flush=True)

    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, args.dim,
                     gb=ds.mean_rating())
    tables = runner.pad(params)
    t0 = time.perf_counter()
    tables = runner.epoch(tables, args.eta, args.lam, float(params.gb))
    jax.block_until_ready(tables[0])
    print(f"compile+ep1: {time.perf_counter()-t0:.1f}s", flush=True)

    best = 0.0
    for it in range(2, args.epochs + 1):
        t0 = time.perf_counter()
        tables = runner.epoch(
            tables, args.eta / it, args.lam, float(params.gb), epoch_idx=it
        )
        jax.block_until_ready(tables[0])
        dt = time.perf_counter() - t0
        ups = len(ds) / dt
        best = max(best, ups)
        out = runner.trim(tables)
        # train RMSE on a fixed 2M-rating sample (full pass is slow on host)
        k = min(2_000_000, len(ds))
        mse = float(calc_mse(out, ds.u[:k], ds.v[:k], ds.r[:k]))
        print(f"ep{it}: {dt:.2f}s {ups/1e6:.1f}M/s "
              f"trainRMSE~{np.sqrt(mse):.4f}", flush=True)
    print(f"BEST {best/1e6:.1f}M updates/s dim={args.dim} n={args.n}")


if __name__ == "__main__":
    main()
