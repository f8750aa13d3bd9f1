"""A/B: saturated delta-striped slot SGD from epoch 1 vs the production schedule.

Round-4 VERDICT weak #2: the fastest SGD kernel in the repo (striped slot,
520M/s in sweeps) never engages in a default 15-epoch production run because
its staleness envelope (eta * max window duplicates <= 0.2) only clears at
epoch ~11 of the eta0/round decay. Slot SGLD already engages
unconditionally because per-row window-step saturation (scale each row's
accumulated window delta by min(1, cap/k), cap = 0.2/eta) bounds exactly
the quantity the envelope bounds. Nobody has established with an RMSE
trajectory whether the same holds for striped SGD.

This harness answers it: full 15-epoch test-RMSE trajectories on the
calibrated ML-10M stand-in (90/10 split), reference default hypers
(eta=2e-2, lam=5e-3, gam=1 — main.cc:97-105), comparing

  A "schedule"  — the current production path (_train_mf_pallas: packed ->
                  small-sub slot -> plain slot -> striped per envelope)
  B "striped1"  — saturated striped slot from epoch 1 (the SGLD treatment)
  C "plain1"    — saturated plain slot from epoch 1 (locates any breakage:
                  striping vs the slot window itself)

Gate: |final RMSE(B) - final RMSE(A)| <= 1e-3 (the BASELINE parity bar).
If B fails, the per-epoch deltas identify the earliest safe engage epoch.

Usage: python benchmarks/ab_striped_sgd.py [--iters N] [--dim D] [--arms A,B,C]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrated_ml10m  # noqa: E402


def run_fixed(runner, cfg, train, test, gb, label):
    """15 epochs on one fixed runner, per-epoch test RMSE."""
    import jax

    from tpu_mf.models.mf import init_mf, rmse

    params = init_mf(jax.random.PRNGKey(0), train.nu, train.nv, cfg.dim, gb=gb)
    tables = runner.pad(params)
    curve = []
    for it in range(1, cfg.iters + 1):
        t0 = time.perf_counter()
        tables = runner.epoch(tables, cfg.eta_at(it), cfg.lam, gb, epoch_idx=it)
        jax.block_until_ready(tables[0])
        dt = time.perf_counter() - t0
        t_rmse = float(rmse(runner.trim(tables), test))
        curve.append(t_rmse)
        print(json.dumps({"arm": label, "epoch": it, "tRMSE": round(t_rmse, 6),
                          "sec": round(dt, 4)}), flush=True)
    return curve


def run_hybrid(cfg, train, test, gb, engage_epoch, sub=None):
    """Production schedule prefix, then striped slot from `engage_epoch`.

    Quantifies the earliest SAFE striped engage epoch (round-4 VERDICT #2):
    the envelope heuristic (eta * window_dups <= 0.2) is sufficient but the
    A/B showed saturation alone does not preserve the trajectory from
    epoch 1 — this measures where the trajectory actually tolerates the
    striped window."""
    import jax

    from tpu_mf.models.mf import init_mf, rmse
    from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner
    from tpu_mf.train.loop import _mf_runner_schedule

    label = f"E{engage_epoch}" + (f"s{sub}" if sub else "")
    striped = SlotEpochRunner(train, seed=cfg.seed, n_plans=2, dim=cfg.dim,
                              balance=True, saturate=True, striped=True,
                              sub=sub)
    sched = [(e, r) for e, r in
             _mf_runner_schedule(cfg, train, cfg_params(cfg, train, gb),
                                 lambda *_: None)
             if e < engage_epoch]
    sched.append((engage_epoch, striped))

    params = init_mf(jax.random.PRNGKey(0), train.nu, train.nv, cfg.dim,
                     gb=gb)
    runner = sched[0][1]
    upcoming = list(sched[1:])
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
                          "tRMSE": round(t_rmse, 6), "sec": round(dt, 4),
                          "kernel": type(runner).__name__
                          + (" striped" if getattr(runner, "striped", False)
                             else "")}), flush=True)
    return curve


def cfg_params(cfg, train, gb):
    import jax

    from tpu_mf.models.mf import init_mf

    return init_mf(jax.random.PRNGKey(0), train.nu, train.nv, cfg.dim, gb=gb)


def run_schedule(cfg, train, test, gb):
    """The production path itself (train.loop._train_mf_pallas)."""
    import jax

    from tpu_mf.models.mf import init_mf, rmse
    from tpu_mf.train.loop import _train_mf_pallas

    curve = []

    class Obs:
        def epoch_done(self, it, params_fn=None, tRMSE=None, **kw):
            curve.append(tRMSE)
            print(json.dumps({"arm": "schedule", "epoch": it,
                              "tRMSE": round(tRMSE, 6)}), flush=True)

    params = init_mf(jax.random.PRNGKey(0), train.nu, train.nv, cfg.dim, gb=gb)
    _train_mf_pallas(cfg, train, test, params, lambda m: print(m, flush=True),
                     Obs())
    return curve


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--dim", type=int, default=8)
    ap.add_argument("--arms", default="A,B,C")
    args = ap.parse_args()

    import warnings

    import jax  # noqa: F401

    from tpu_mf.config import TrainConfig
    from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner

    ds = calibrated_ml10m()
    train, test = ds.split(0.1, seed=11)
    gb = float(train.mean_rating())
    cfg = TrainConfig(dim=args.dim, iters=args.iters, eta=2e-2, lam=5e-3,
                      gb=gb)
    arms = set(args.arms.split(","))
    curves = {}
    with warnings.catch_warnings():
        # Arms B/C deliberately run outside the envelope; saturation is the
        # mechanism under test.
        warnings.simplefilter("ignore")
        if "B" in arms:
            r = SlotEpochRunner(train, seed=cfg.seed, n_plans=2, dim=cfg.dim,
                                balance=True, saturate=True, striped=True)
            curves["striped1"] = run_fixed(r, cfg, train, test, gb, "striped1")
        if "C" in arms:
            r = SlotEpochRunner(train, seed=cfg.seed, n_plans=2, dim=cfg.dim,
                                balance=True, saturate=True)
            curves["plain1"] = run_fixed(r, cfg, train, test, gb, "plain1")
        if "A" in arms:
            curves["schedule"] = run_schedule(cfg, train, test, gb)
        for arm in sorted(arms):
            # Hybrid arms: "E<epoch>" or "E<epoch>s<sub>" — production
            # schedule until <epoch>, striped slot (at <sub>) from there.
            if arm.startswith("E"):
                spec = arm[1:].split("s")
                e = int(spec[0])
                sub = int(spec[1]) if len(spec) > 1 else None
                curves[arm] = run_hybrid(cfg, train, test, gb, e, sub=sub)

    summary = {k: round(v[-1], 6) for k, v in curves.items()}
    if "schedule" in curves:
        a = curves["schedule"]
        for k in curves:
            if k != "schedule":
                summary[f"{k}_final_delta"] = round(curves[k][-1] - a[-1], 6)
                summary[f"{k}_max_epoch_delta"] = round(
                    max(abs(x - y) for x, y in zip(curves[k], a)), 6)
    print(json.dumps({"summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
