"""Dense-cell kernel timing at the production ML-10M shape.

One plan upload serves every task: the S/W cell matrices are
dim-independent (tables carry the rank) and the k_cells unroll variants
are contiguous leading-axis reshapes of the same device arrays.

Tasks: dims {8, 64, 128} x k_cells {42, 21, 14} (n_gv = 42 at tv=256),
timed with the interleaved-rewarm protocol (bench._run_tasks).

Usage: python benchmarks/bench_dense.py [--dims 8,64,128] [--ks 42,21,14]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _Task, _run_tasks, calibrated_ml10m  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="8,64,128")
    ap.add_argument("--ks", default="42,21,14")
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_mf.models.mf import init_mf, rmse
    from tpu_mf.ops.pallas_sgd_dense import (
        DenseEpochRunner,
        _run_dense_epoch,
        prepare_dense,
    )

    ds = calibrated_ml10m()
    gb = float(ds.mean_rating())
    eta, lam = 2e-2, 5e-3
    t0 = time.perf_counter()
    ks = [int(x) for x in args.ks.split(",")]
    kmax = max(ks)
    plan = prepare_dense(ds, args.tile, args.tile, kmax)
    print(json.dumps({
        "plan_s": round(time.perf_counter() - t0, 1),
        "n_gu": plan.n_gu, "n_gvp": plan.n_gvp,
        "max_ku": plan.max_ku, "max_kv": plan.max_kv,
        "gb_device": round(4 * plan.s.nbytes / 1e9, 2),
    }), flush=True)

    t0 = time.perf_counter()
    n_gvc0 = plan.n_gvp // kmax
    base = tuple(
        jnp.asarray(x.reshape(plan.n_gu, n_gvc0, kmax,
                              x.shape[2], x.shape[3]))
        for x in (plan.s, plan.w, plan.st, plan.wt)
    )
    _ = float(jnp.sum(base[1][0, 0, 0, :8].astype(jnp.float32)))
    print(json.dumps({"upload_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    def mk_dev(k):
        assert plan.n_gvp % k == 0, (plan.n_gvp, k)
        n_gvc = plan.n_gvp // k
        return tuple(
            x.reshape(plan.n_gu, n_gvc, k, x.shape[3], x.shape[4])
            for x in base
        )

    tasks = []
    curves = {}
    for dim in (int(x) for x in args.dims.split(",")):
        params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim, gb=gb)
        # one throwaway runner provides pad/trim for this dim
        proto = DenseEpochRunner.__new__(DenseEpochRunner)
        proto.plan, proto.saturate = plan, True
        proto.nu, proto.nv = ds.nu, ds.nv
        proto.tile_u = proto.tile_v = args.tile
        proto.mxu, proto.interpret = "bfloat16", False
        proto._dev = base
        proto.k_cells = kmax
        tables0 = proto.pad(params)
        for k in ks:
            dev = mk_dev(k)

            def step(tables, i, dev=dev, k=k, dim=dim):
                cap = max(1.0, 0.2 / eta)
                hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
                return _run_dense_epoch(
                    tables[0], tables[1], *dev, hyper,
                    tile_u=args.tile, tile_v=args.tile, k_cells=k,
                    dim=dim, n_gu=plan.n_gu, n_gvp=plan.n_gvp,
                    mxu="bfloat16", interpret=False, saturate=True,
                )
            tasks.append(_Task(
                f"d{dim}k{k}", step,
                tuple(x + 0.0 for x in tables0), plan.n_real))
        curves[dim] = proto

    rates = _run_tasks(tasks)
    out = {lbl: round(r) for lbl, r in sorted(rates.items())}
    # quick sanity: 3 more epochs on the best rank-64 task -> finite RMSE
    best64 = max((t for t in tasks if t.label.startswith("d64")),
                 key=lambda t: rates[t.label])
    tb = best64.tables
    for i in range(3):
        tb = best64.step(tb, i)
    proto = curves[64] if 64 in curves else list(curves.values())[0]
    proto.dim = 64 if 64 in curves else list(curves)[0]
    val = float(rmse(proto.trim(tb), ds))
    out["sanity_trainRMSE"] = round(val, 4)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
