"""TPU sweep: delta-striped slot columns vs the plain slot kernel.

The striped plan (prepare_cells_stripe) packs all P delta classes of a
(user-tile, item-tile) pair into shared columns (one sublane segment per
class), breaking the nb >= n_gu*n_gv floor and letting sub grow into the
MXU's flat-in-M regime (probe_segmm). This sweep measures both kernels on
the CALIBRATED Zipf-Mandelbrot marginals at ML-10M or Netflix shape.

Usage: sweep_stripe.py [CONFIG] [CASES...]   (CONFIG: ml10m | netflix)
Each CASE is "sub" or "sub:tile" (tile defaults 1024) or "plain" (the
un-striped slot kernel at auto sub, tile 1024) — striped-only by default
since the plain Netflix number is recorded (PERF_NOTES round 3: 558.5M/s).
"""
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner

CONFIG = sys.argv[1] if len(sys.argv) > 1 else "ml10m"
CASES = sys.argv[2:]
shapes = {
    "ml10m": (69_878, 10_677, 10_000_000),
    "netflix": (480_189, 17_770, 100_000_000),
}
DIM = 8
ETA, LAM = 2e-2, 5e-3


def bench(runner, params, reps=5):
    tables = runner.pad(params)
    gb = float(params.gb)
    tables = runner.epoch(tables, ETA, LAM, gb)
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        tables = runner.epoch(tables, ETA, LAM, gb, epoch_idx=i)
    tot = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / reps
    import math
    return dt, math.isfinite(tot)


def main():
    from bench import calibrated_ds

    nu, nv, n = shapes[CONFIG]
    ds = calibrated_ds(nu, nv, n)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())

    cases = []
    # First measured case in a fresh process runs ~3x slow through the
    # tunnel (time-based warmup); sacrifice a copy of the first case.
    todo = list(CASES or ["plain", "256", "512"])
    todo = todo[:1] + todo
    for c in todo:
        if c == "plain":
            cases.append(("slot ", 1024, dict(striped=False, sub=None)))
            continue
        sub, _, tile = c.partition(":")
        cases.append((f"strip", int(tile or 1024),
                      dict(striped=True, sub=int(sub))))
    cases[0] = ("WARM ", cases[0][1], cases[0][2])
    for name, tile, kw in cases:
        t_build = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = SlotEpochRunner(
                ds, tile_u=tile, tile_v=tile, seed=1, dim=DIM,
                balance=True, saturate=True, theta_groups=1, phi_groups=1,
                **kw)
        t_build = time.perf_counter() - t_build
        dt, fin = bench(r, params)
        nb = r.plan.u.shape[0]
        print(f"{name} t{tile} sub={r.sub:4d}: {r.plan.n_real/dt/1e6:7.1f}M/s  "
              f"{dt*1e6/nb:7.2f}us/batch nb={nb} "
              f"fill={r.plan.n_real/r.n_slots:.3f} finite={fin} "
              f"build={t_build:.0f}s", flush=True)
        del r


if __name__ == "__main__":
    main()
