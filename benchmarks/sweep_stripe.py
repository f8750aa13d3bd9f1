"""TPU sweep: delta-striped slot columns vs the plain slot kernel (SGD).

The striped plan (prepare_cells_stripe) packs all P delta classes of a
(user-tile, item-tile) pair into shared columns (one sublane segment per
class), breaking the nb >= n_gu*n_gv floor and letting sub grow into the
MXU's flat-in-M regime (probe_segmm). This sweep measures both kernels on
the CALIBRATED Zipf-Mandelbrot marginals at ML-10M or Netflix shape.

Measurement protocol: the tunnel runs slow for the first MINUTES of a
process, so build + warm EVERY case first, then run ROUNDS timing rounds
over all cases and report the best per case.

Usage: sweep_stripe.py [CONFIG] [CASES...]   (CONFIG: ml10m | netflix)
Each CASE is "sub" or "sub:tile" (tile defaults 1024) or "plain[:tile]"
(the un-striped slot kernel at auto sub).
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
ROUNDS, REPS = 3, 4


def main():
    from bench import calibrated_ds

    nu, nv, n = shapes[CONFIG]
    ds = calibrated_ds(nu, nv, n)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
    gb = float(params.gb)

    cases = []
    for c in (CASES or ["plain", "384", "512"]):
        base, _, tile = c.partition(":")
        if base == "plain":
            cases.append(("slot ", int(tile or 1024),
                          dict(striped=False, sub=None)))
        else:
            cases.append(("strip", int(tile or 1024),
                          dict(striped=True, sub=int(base))))

    runners = []
    for name, tile, kw in cases:
        t_build = time.perf_counter()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = SlotEpochRunner(
                ds, tile_u=tile, tile_v=tile, seed=1, dim=DIM,
                balance=True, saturate=True, theta_groups=1, phi_groups=1,
                **kw)
        t_build = time.perf_counter() - t_build
        tables = r.epoch(r.pad(params), ETA, LAM, gb)  # compile + warm
        _ = float(jnp.sum(tables[0]))
        print(f"built {name} t{tile} sub={r.sub} ({t_build:.0f}s)",
              flush=True)
        # epoch() donates its table operands: keep live buffers in a dict.
        runners.append(dict(name=name, tile=tile, r=r, tables=tables,
                            best=float("inf")))

    for rnd in range(ROUNDS):
        for c in runners:
            r, tables = c["r"], c["tables"]
            # 2 untimed epochs: consecutive same-kernel epochs are the
            # production shape; the first epochs after a kernel switch
            # measure the switch, not the kernel.
            for i in range(2):
                tables = r.epoch(tables, ETA, LAM, gb, epoch_idx=i)
            _ = float(jnp.sum(tables[0]))
            t0 = time.perf_counter()
            for i in range(REPS):
                tables = r.epoch(tables, ETA, LAM, gb, epoch_idx=i)
            _ = float(jnp.sum(tables[0]))
            c["best"] = min(c["best"], (time.perf_counter() - t0) / REPS)
            c["tables"] = tables

    for c in runners:
        r = c["r"]
        fin = bool(jnp.isfinite(jnp.sum(c["tables"][0])))
        nb = r.plan.u.shape[0]
        dt = c["best"]
        print(f"{c['name']} t{c['tile']} sub={r.sub:4d}: "
              f"{r.plan.n_real/dt/1e6:7.1f}M/s  {dt*1e6/nb:7.2f}us/batch "
              f"nb={nb} fill={r.plan.n_real/r.n_slots:.3f} finite={fin}",
              flush=True)


if __name__ == "__main__":
    main()
