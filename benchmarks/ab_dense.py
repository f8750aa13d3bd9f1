"""RMSE-trajectory A/B: dense-cell kernel vs the production schedule.

Same protocol as ab_striped_sgd.py (15 epochs, calibrated ML-10M, 90/10
split, reference defaults): arm "dense<dim>" runs DenseEpochRunner
(saturated, window = one cell) from epoch 1; compare its final tRMSE with
the schedule arm recorded by ab_striped_sgd (dim 8) or a gen-1 fixed arm
(dim 64) against the 1e-3 parity bar.

`--engage E1,E2,...` adds hybrid arms per dim: the PRODUCTION schedule
(_mf_runner_schedule) serves epochs < E, the dense runner takes over at E
(tables handed over exactly as train.loop does, trim -> pad). E=1 is the
fixed dense arm. The earliest E whose final tRMSE stays within 1e-3 of the
schedule arm becomes the dense engagement epoch.

Usage: python benchmarks/ab_dense.py [--dims 8,64] [--iters 15] [--gen1]
       [--engage 1,4,7]
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


def run_sched_then_dense(dense_r, engage, cfg, train, test, gb, label):
    """Production schedule for epochs < engage, dense runner from engage on
    (handover = trim -> pad, exactly train.loop._train_mf_pallas)."""
    import jax

    from tpu_mf.models.mf import init_mf, rmse
    from tpu_mf.train.loop import _mf_runner_schedule

    params = init_mf(jax.random.PRNGKey(0), train.nu, train.nv, cfg.dim,
                     gb=gb)
    sched = [(ep, r) for ep, r in
             _mf_runner_schedule(cfg, train, params, lambda *_: None)
             if ep < engage] or None
    upcoming = list(sched[1:]) + [(engage, dense_r)] if sched else [(1, dense_r)]
    runner = sched[0][1] if sched else upcoming.pop(0)[1]
    tables = runner.pad(params)
    curve = []
    for it in range(1, cfg.iters + 1):
        while upcoming and it >= upcoming[0][0]:
            nxt = upcoming.pop(0)[1]
            tables = nxt.pad(runner.trim(tables))
            runner = nxt
        t0 = time.perf_counter()
        tables = runner.epoch(tables, cfg.eta_at(it), cfg.lam, gb,
                              epoch_idx=it)
        jax.block_until_ready(tables[0])
        dt = time.perf_counter() - t0
        t_rmse = float(rmse(runner.trim(tables), test))
        curve.append(t_rmse)
        print(json.dumps({"arm": label, "epoch": it,
                          "kernel": type(runner).__name__,
                          "tRMSE": round(t_rmse, 6), "sec": round(dt, 4)}),
              flush=True)
    return curve


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="8,64")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--gen1", action="store_true",
                    help="also run the gen-1 fixed arm per dim")
    ap.add_argument("--engage", default="",
                    help="comma list of dense engagement epochs (hybrid arms)")
    ap.add_argument("--sched", action="store_true",
                    help="also run the pure production-schedule arm per dim")
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
        if args.engage:
            for e in (int(x) for x in args.engage.split(",")):
                c = run_sched_then_dense(r, e, cfg, train, test, gb,
                                         f"dense{dim}@{e}")
                summary[f"dense{dim}@{e}"] = round(c[-1], 6)
        else:
            c = run_fixed(r, cfg, train, test, gb, f"dense{dim}")
            summary[f"dense{dim}"] = round(c[-1], 6)
        if args.sched:
            cs = run_sched_then_dense(r, cfg.iters + 1, cfg, train, test,
                                      gb, f"sched{dim}")
            summary[f"sched{dim}"] = round(cs[-1], 6)
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
