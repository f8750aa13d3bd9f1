"""TPU sweep: free-column kernel vs the gen-1 production geometry (rank 64).

The rank-64 step is MATMUL-bound with MXU-side pred (PERF_NOTES round-3
late): cost ~ one-hot width = tile_u + tile_v per rating. The free-column
kernel (ops/pallas_sgd_free.py) holds BOTH tables VMEM-resident with
per-column dynamic tiles, so tiles shrink to the 128-lane floor without the
gen-1 fill collapse — ~2x less MXU work per rating at the same fill.

Protocol: build + warm EVERY case first, then ROUNDS interleaved timing
rounds (2 untimed epochs after each kernel switch), report each case's best.

Usage: sweep_free.py [DIM] [CASES...]
  CASE = "gen1" (production geometry) or "tu:tv:sub[:gu:gv]" for the free
  kernel (gu/gv = groups 1|2|4|8, default adaptive).
"""
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd import PallasEpochRunner, pick_cell_geometry
from tpu_mf.ops.pallas_sgd_free import FreeEpochRunner

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 64
CASES = sys.argv[2:] or ["gen1", "128:128:256", "128:128:384", "128:256:512"]
ETA, LAM = 2e-2, 5e-3
ROUNDS, REPS = 3, 4


def main():
    from bench import calibrated_ml10m

    ds = calibrated_ml10m()
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, DIM,
                     gb=ds.mean_rating())
    gb = float(params.gb)

    runners = []
    for c in CASES:
        t_build = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            if c.startswith("gen1"):
                if c == "gen1":
                    tu, tv, b = pick_cell_geometry(ds)
                else:
                    _, tu, tv, sub = c.split(":")
                    tu, tv, b = int(tu), int(tv), 8 * int(sub)
                r = PallasEpochRunner(
                    ds, tile_u=tu, tile_v=tv, batch=b, seed=1,
                    balance=True, saturate=True, mxu_pred=True,
                )
                name = f"gen1 t{tu}/{tv} B{b}"
            else:
                c, _, ablate = c.partition("@")
                parts = c.split(":")
                tu, tv, sub = int(parts[0]), int(parts[1]), int(parts[2])
                gu = int(parts[3]) if len(parts) > 3 else None
                gv = int(parts[4]) if len(parts) > 4 else None
                r = FreeEpochRunner(
                    ds, tile_u=tu, tile_v=tv, batch=8 * sub, seed=1,
                    balance=True, saturate=True,
                    groups_u=gu, groups_v=gv, ablate=ablate,
                )
                name = (f"free t{tu}/{tv} s{sub} g{gu or 'a'}/{gv or 'a'}"
                        + (f" @{ablate}" if ablate else ""))
        t_build = time.perf_counter() - t_build
        tables = r.epoch(r.pad(params), ETA, LAM, gb)  # compile + warm
        _ = float(jnp.sum(tables[0]))
        nb = r.plan.u.shape[0]
        fill = r.plan.n_real / r.n_slots
        print(f"built {name}: nb={nb} fill={fill:.3f} ({t_build:.0f}s)",
              flush=True)
        runners.append(dict(name=name, r=r, tables=tables,
                            best=float("inf")))

    for _rnd in range(ROUNDS):
        for case in runners:
            r, tables = case["r"], case["tables"]
            for i in range(2):
                tables = r.epoch(tables, ETA, LAM, gb, epoch_idx=i)
            _ = float(jnp.sum(tables[0]))
            t0 = time.perf_counter()
            for i in range(REPS):
                tables = r.epoch(tables, ETA, LAM, gb, epoch_idx=i)
            _ = float(jnp.sum(tables[0]))
            case["best"] = min(case["best"],
                               (time.perf_counter() - t0) / REPS)
            case["tables"] = tables

    for case in runners:
        r, dt = case["r"], case["best"]
        fin = bool(jnp.isfinite(jnp.sum(case["tables"][0])))
        nb = r.plan.u.shape[0]
        print(f"{case['name']:30s}: {r.plan.n_real/dt/1e6:7.1f}M/s  "
              f"{dt*1e6/nb:7.2f}us/batch nb={nb} "
              f"fill={r.plan.n_real/r.n_slots:.3f} finite={fin}",
              flush=True)


if __name__ == "__main__":
    main()
