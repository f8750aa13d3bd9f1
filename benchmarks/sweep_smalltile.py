"""Round-3: can smaller (asymmetric) tiles beat (256,224,7168) at rank 64?

Per-rating MXU work in the gen-1 kernel is ~4*lanes*(tile_u+tile_v) flops
(two gather + two scatter one-hot matmuls per column) + 2*lanes^2 (MXU
pred), so shrinking tu+tv cuts the matmul bill linearly. The round-3 early
sweep that condemned t192/t128 (197/101M/s) kept B=8192 FIXED, so cell
fill collapsed (.48/.20); this sweep shrinks sub along with the cells
(sub ~ 1.12*c on the 128-sublane grid, the pick_cell_geometry margin) so
fill stays at the balanced plateau and the smaller matmuls can show up.
Counterweights measured elsewhere: the per-column fixed cost amortizes as
1/(1+94/sub) (worse at small sub) and the per-step grid floor grows with
nb. Usage: sweep_smalltile.py [--uni]
"""
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd import PallasEpochRunner, cdiv

N = 10_000_000


def bench(runner, params, eta=0.02, lam=5e-3, reps=5):
    tables = runner.pad(params)
    gb = float(params.gb)
    tables = runner.epoch(tables, eta, lam, gb)
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        tables = runner.epoch(tables, eta, lam, gb, epoch_idx=i % 2)
    _ = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / reps
    return runner.plan.n_real / dt, dt


def pick_sub(c: float, margin: float = 1.12) -> int:
    want = int(c * margin)
    return max(256, cdiv(want, 128) * 128)


def main():
    nu, nv = 69_878, 10_677
    if "--uni" in sys.argv:
        ds = synthetic_ratings(nu, nv, N, rank=8, noise=0.1, seed=0)
        tag = "uni "
    else:
        ds = synthetic_ratings(
            nu, nv, N, rank=8, seed=0, noise=0.76, signal=1.0, bias_std=0.38,
            zipf=1.0, zipf_q=50.0, zipf_u=1.0, zipf_uq=250.0)
        tag = "zipf"
    dim = 64
    params = init_mf(jax.random.PRNGKey(0), nu, nv, dim, gb=ds.mean_rating())

    tiles = [
        (256, 224),            # production chooser pick (control)
        (192, 168), (192, 336),
        (128, 168), (128, 336),
        (128, 112), (96, 168),
        (256, 112),
    ]
    for tu, tv in tiles:
        n_gu, n_gv = cdiv(nu, tu), cdiv(nv, tv)
        c = N / (n_gu * n_gv)
        sub = pick_sub(c)
        b = 8 * sub
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = PallasEpochRunner(ds, tile_u=tu, tile_v=tv, batch=b,
                                  seed=1, n_plans=2, balance=True,
                                  saturate=True)
            ups, dt = bench(r, params)
        nb = r.plan.u.shape[0]
        fill = r.plan.n_real / (nb * b)
        print(f"{tag} t=({tu:3d},{tv:3d}) B={b:5d} sub={sub:4d} "
              f"n_gv={n_gv:3d} c={c:6.0f}: {ups/1e6:7.1f}M/s "
              f"{dt*1e6/nb:6.2f}us/batch fill={fill:.3f} nb={nb}",
              flush=True)


if __name__ == "__main__":
    main()
