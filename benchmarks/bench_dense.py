"""Dense-cell kernel timing at the production ML-10M shape.

One on-device densify serves every task: the S/W cell matrices are
dim-independent (tables carry the rank) and k_cells is a pure BlockSpec
unroll knob over the same 4D device arrays (no per-k copies — reshape
variants OOMed the 16GB chip when they were real buffers).

Tasks: dims {8, 64, 128} x k_cells {42, 21, 14, 7} (n_gvp = 42 at tv=256),
timed with the interleaved-rewarm protocol (bench._run_tasks).

Usage: python benchmarks/bench_dense.py [--dims 8,64,128] [--ks 42,21,14,7]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    _Task,
    _run_tasks,
    _spread,
    calibrated_ml10m,
    calibrated_unique,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="8,64,128")
    ap.add_argument("--ks", default="42,21,14,7")
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--ablate", default="0",
                    help="comma list of ablate levels per task "
                         "(0 full, 2 DMA-only stream walk)")
    ap.add_argument("--unique", action="store_true",
                    help="use the unique-pairs calibrated stand-in "
                         "(bench.calibrated_unique): the W-less plan")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_mf.models.mf import init_mf, rmse
    from tpu_mf.ops.pallas_sgd_dense import DenseEpochRunner, _run_dense_epoch

    ds = calibrated_unique() if args.unique else calibrated_ml10m()
    gb = float(ds.mean_rating())
    eta, lam = 2e-2, 5e-3
    ks = [int(x) for x in args.ks.split(",")]

    t0 = time.perf_counter()
    runner = DenseEpochRunner(ds, args.tile, args.tile, k_cells=ks[0])
    plan = runner.plan
    print(json.dumps({
        "plan_s": round(time.perf_counter() - t0, 1),
        "n_gu": plan.n_gu, "n_gvp": plan.n_gvp,
        "max_ku": plan.max_ku, "max_kv": plan.max_kv,
    }), flush=True)
    t0 = time.perf_counter()
    dev = runner.dev
    probe = dev[1] if dev[1] is not None else dev[0]
    _ = float(jnp.sum(probe[0, 0, :8].astype(jnp.float32)))
    print(json.dumps({"densify_s": round(time.perf_counter() - t0, 1),
                      "wless": dev[1] is None}), flush=True)

    tasks = []
    protos = {}
    for dim in (int(x) for x in args.dims.split(",")):
        params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim, gb=gb)
        runner.dim = dim  # pad() sets it; set explicitly for the raw calls
        tables0 = runner.pad(params)
        protos[dim] = runner
        for k in ks:
            if plan.n_gvp % k:
                continue
            for abl in (int(x) for x in args.ablate.split(",")):
                def step(tables, i, k=k, dim=dim, abl=abl):
                    cap = max(1.0, 0.2 / eta)
                    hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
                    return _run_dense_epoch(
                        tables[0], tables[1], *dev, hyper,
                        tile_u=args.tile, tile_v=args.tile, k_cells=k,
                        dim=dim, n_gu=plan.n_gu, n_gvp=plan.n_gvp,
                        mxu="bfloat16", interpret=False, saturate=True,
                        ablate=abl,
                    )
                suffix = f"a{abl}" if abl else ""
                tasks.append(_Task(
                    f"d{dim}k{k}{suffix}", step,
                    tuple(x + 0.0 for x in tables0), plan.n_real))

    rates = _run_tasks(tasks)
    out = {lbl: round(r) for lbl, r in sorted(rates.items())}
    # quick sanity: 3 more epochs on the best rank-64 task -> finite RMSE
    full64 = [t for t in tasks
              if t.label.startswith("d64") and "a" not in t.label]
    best64 = max(full64 or tasks, key=lambda t: rates[t.label])
    tb = best64.tables
    for i in range(3):
        tb = best64.step(tb, i)
    proto = protos.get(64) or next(iter(protos.values()))
    proto.dim = 64 if 64 in protos else next(iter(protos))
    val = float(rmse(proto.trim(tb), ds))
    out["sanity_trainRMSE"] = round(val, 4)
    out["timing"] = _spread(tasks)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
