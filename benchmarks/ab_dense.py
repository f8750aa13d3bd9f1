"""RMSE-trajectory A/B: dense-cell kernel vs the production schedule.

Same protocol as ab_striped_sgd.py (15 epochs, calibrated ML-10M, 90/10
split, reference defaults): arm "dense<dim>" runs DenseEpochRunner
(saturated, window = one cell) from epoch 1; compare its final tRMSE with
the schedule arm recorded by ab_striped_sgd (dim 8) or a gen-1 fixed arm
(dim 64) against the 1e-3 parity bar.

Usage: python benchmarks/ab_dense.py [--dims 8,64] [--iters 15] [--gen1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrated_ml10m  # noqa: E402


def run_fixed(runner, cfg, train, test, gb, label):
    import jax

    from tpu_mf.models.mf import init_mf, rmse

    params = init_mf(jax.random.PRNGKey(0), train.nu, train.nv, cfg.dim,
                     gb=gb)
    tables = runner.pad(params)
    curve = []
    for it in range(1, cfg.iters + 1):
        t0 = time.perf_counter()
        tables = runner.epoch(tables, cfg.eta_at(it), cfg.lam, gb,
                              epoch_idx=it)
        jax.block_until_ready(tables[0])
        dt = time.perf_counter() - t0
        t_rmse = float(rmse(runner.trim(tables), test))
        curve.append(t_rmse)
        print(json.dumps({"arm": label, "epoch": it,
                          "tRMSE": round(t_rmse, 6), "sec": round(dt, 4)}),
              flush=True)
    return curve


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="8,64")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--gen1", action="store_true",
                    help="also run the gen-1 fixed arm per dim")
    args = ap.parse_args()

    from tpu_mf.config import TrainConfig
    from tpu_mf.ops.pallas_sgd_dense import DenseEpochRunner

    ds = calibrated_ml10m()
    train, test = ds.split(0.1, seed=11)
    gb = float(train.mean_rating())

    summary = {}
    for dim in (int(x) for x in args.dims.split(",")):
        cfg = TrainConfig(dim=dim, iters=args.iters, eta=2e-2, lam=5e-3,
                          gb=gb)
        r = DenseEpochRunner(train, saturate=True)
        c = run_fixed(r, cfg, train, test, gb, f"dense{dim}")
        summary[f"dense{dim}"] = round(c[-1], 6)
        if args.gen1:
            from tpu_mf.ops.pallas_sgd import (
                PallasEpochRunner,
                pick_cell_geometry,
            )

            tu, tv, b = pick_cell_geometry(train)
            g = PallasEpochRunner(train, tile_u=tu, tile_v=tv, batch=b,
                                  seed=cfg.seed, n_plans=2, balance=True,
                                  saturate=True)
            cg = run_fixed(g, cfg, train, test, gb, f"gen1_{dim}")
            summary[f"gen1_{dim}"] = round(cg[-1], 6)
            summary[f"dense{dim}_delta_vs_gen1"] = round(c[-1] - cg[-1], 6)
    print(json.dumps({"summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
