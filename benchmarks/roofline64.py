"""Rank-64 roofline: measured ns/rating decomposition of the gen-1 kernel.

Round-4 VERDICT #1: two rounds of guess-build-measure-negative at rank 64
(free-column kernel, homog mid-chain, one-hot width) — the dominant cost is
unknown. This harness measures it directly with staged kernel ablations
(ops/pallas_sgd._epoch_kernel `ablate` levels) on the PRODUCTION rank-64
config (the exact runner _mf_runner_schedule builds for calibrated ML-10M
at dim 64):

  L0  empty grid walk      block DMA + resident-table floor
  L1  + id/rating decode   stream_planes decode matmul + FMAs
  L2  + gathers + pred     one-hot builds, 2 gather matmuls, MXU pred, err
  L3  + scatter matmuls    rhs builds + 2 scatter matmuls (no applies)
  L4  full kernel          + per-group decay/saturate table applies

Deltas L(n) - L(n-1) attribute ns/rating per stage.  The analytic MXU
speed-of-light for the one-hot dataflow is printed alongside: per rating the
kernel moves 2*(tile_u + tile_v)*lanes MACs of gather/scatter one-hot work
plus *lanes^2 / 1* of pred — at t256/tv224/lanes128 that is ~272k flops per
8-flop-useful rating, so the MXU bound itself is the design's wall, not any
VPU mid-chain (this is the "hardware math written down" the 1e9 gate
re-derivation needs).

Usage: python benchmarks/roofline64.py [--dim 64] [--rounds 3] [--reps 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _Task, _run_tasks, calibrated_ml10m  # noqa: E402

V5E_BF16_TFLOPS = 197.0  # MXU peak, TPU v5e (public spec)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--eta", type=float, default=2e-2)
    args = ap.parse_args()

    import jax

    from tpu_mf.config import TrainConfig
    from tpu_mf.models.mf import init_mf
    from tpu_mf.ops.pallas_sgd import PallasEpochRunner, row_lanes
    from tpu_mf.train.loop import _mf_runner_schedule

    ds = calibrated_ml10m()
    gb = float(ds.mean_rating())
    eta, lam = args.eta, 5e-3
    cfg = TrainConfig(dim=args.dim, iters=15, eta=eta, lam=lam, gb=gb)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, args.dim, gb=gb)
    sched = _mf_runner_schedule(cfg, ds, params, lambda *_: None)
    runner = sched[-1][1]
    assert isinstance(runner, PallasEpochRunner), type(runner).__name__
    print(json.dumps({
        "config": {
            "dim": args.dim, "tile_u": runner.tile_u,
            "tile_v": runner.tile_v, "batch": runner.batch,
            "nb": int(runner.plan.u.shape[0]),
            "n_real": int(runner.plan.n_real),
            "fill": round(runner.plan.n_real
                          / float(runner.plan.u.size), 4),
            "theta_groups": runner.pick_theta_groups(eta),
            "phi_groups": runner.pick_phi_groups(eta),
            "eta": eta,
        }
    }), flush=True)

    def step_fn(level):
        def step(tables, i):
            return runner.epoch(tables, eta, lam, gb, epoch_idx=i,
                                ablate=level)
        return step

    tables0 = runner.pad(params)
    tasks = [
        _Task(f"L{lvl}", step_fn(lvl), runner.pad(params)
              if lvl else tables0, runner.plan.n_real)
        for lvl in (0, 1, 2, 3, 4)
    ]
    rates = _run_tasks(tasks, rounds=args.rounds, reps=args.reps)

    n = runner.plan.n_real
    ns = {lbl: 1e9 / rate for lbl, rate in rates.items()}  # ns/rating
    stages = {
        "floor+dma": ns["L0"],
        "decode": ns["L1"] - ns["L0"],
        "gather+pred": ns["L2"] - ns["L1"],
        "scatter_mm": ns["L3"] - ns["L2"],
        "apply": ns["L4"] - ns["L3"],
    }

    # Analytic MXU speed-of-light for the one-hot dataflow at this geometry.
    lanes = row_lanes(args.dim)
    slots = runner.plan.u.size  # padded slots actually pay MXU time
    per_slot_flops = (
        2 * 2 * (runner.tile_u + runner.tile_v) * lanes  # gathers+scatters
        + 2 * lanes * lanes                              # MXU pred rowsum
    )
    mxu_sol_ns = per_slot_flops / (V5E_BF16_TFLOPS * 1e3)  # ns per slot
    fill = n / float(slots)
    out = {
        "updates_per_s": {k: round(v) for k, v in rates.items()},
        "ns_per_rating": {k: round(v, 3) for k, v in ns.items()},
        "stage_ns_per_rating": {k: round(v, 3) for k, v in stages.items()},
        "mxu_analysis": {
            "lanes": lanes,
            "per_slot_onehot_flops": per_slot_flops,
            "mxu_speed_of_light_ns_per_slot": round(mxu_sol_ns, 3),
            "mxu_speed_of_light_ns_per_rating": round(mxu_sol_ns / fill, 3),
            "implied_max_updates_per_s": round(fill / mxu_sol_ns * 1e9),
            "measured_matmul_ns_per_rating": round(
                stages["gather+pred"] + stages["scatter_mm"], 3),
            "mxu_efficiency_vs_sol": round(
                (mxu_sol_ns / fill)
                / max(stages["gather+pred"] + stages["scatter_mm"], 1e-9),
                3),
        },
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
